package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Shared parquet-directory machinery for prebuilt ANN index stores — the
  * offline half of the production architecture (build once, search many).
  * Tables swap in atomically ([[TableStore]]'s write-temp + two-rename
  * discipline, crash-recoverable); the build fingerprint (`_meta`) lands
  * LAST, so a freshness probe can only see it once every byte it vouches
  * for is durable. */
private[sources] abstract class IndexStore(spark: SparkSession,
                                           root: String) {

  protected def path(table: String) = s"$root/$table"
  protected def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** [[TableStore.recoverSwap]]'s contract, restated for the index dirs:
    * a kill between the two renames leaves the table absent with the
    * complete pre-swap copy in `.old-*` — restore it; leftover tmp/old
    * dirs from post-swap crashes are garbage — swept. */
  protected def recoverSwap(table: String): Unit = {
    val glob = fs.globStatus(new Path(path(table) + ".{old,tmp}-*"))
    if (glob == null || glob.isEmpty) return
    if (!fs.exists(new Path(path(table)))) {
      val olds = glob.filter(_.getPath.getName.contains(".old-"))
      if (olds.nonEmpty)
        require(fs.rename(olds.head.getPath, new Path(path(table))),
          s"recoverSwap($table): restoring ${olds.head.getPath} failed")
    }
    fs.globStatus(new Path(path(table) + ".{old,tmp}-*"))
      .foreach(st => fs.delete(st.getPath, true))
  }

  protected def swapIn(table: String, df: DataFrame,
                       schema: StructType): Unit = {
    val dest = new Path(path(table))
    val tmp = new Path(path(table) + ".tmp-" + java.util.UUID.randomUUID())
    df.select(schema.fields.map(f => col(f.name).cast(f.dataType)): _*)
      .write.mode("errorifexists").parquet(tmp.toString)
    val old = new Path(path(table) + ".old-" + java.util.UUID.randomUUID())
    // Hadoop rename reports failure by returning false — unchecked, a
    // failed rename silently drops the new index version
    if (fs.exists(dest)) require(fs.rename(dest, old),
      s"swapIn($table): rename $dest -> $old failed")
    require(fs.rename(tmp, dest),
      s"swapIn($table): rename $tmp -> $dest failed — pre-swap in $old")
    fs.delete(old, true)
  }

  protected def read(table: String, schema: StructType): DataFrame = {
    recoverSwap(table)
    require(fs.exists(new Path(path(table))),
      s"index table $table missing under $root — build the index first")
    spark.read.schema(schema).parquet(path(table))
  }

  /** True iff a complete index built under exactly `meta` is present —
    * the online path's freshness gate (corpus changed, params changed, or
    * build crashed pre-fingerprint → false). */
  def isFresh(meta: String): Boolean = {
    val m = new Path(path("_meta"))
    fs.exists(m) && {
      val in = fs.open(m)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) == meta
      finally in.close()
    }
  }

  protected def clearMeta(): Unit =
    fs.delete(new Path(path("_meta")), false)

  protected def publishMeta(meta: String): Unit = {
    val tmp = new Path(path("_meta.tmp-" + java.util.UUID.randomUUID()))
    val outS = fs.create(tmp, true)
    try outS.write(meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally outS.close()
    require(fs.rename(tmp, new Path(path("_meta"))),
      "publishMeta: publishing fingerprint failed")
  }
}

/** Stored IVF index — see [[graft.operators.Similarity.ivfBuildStored]].
  *
  * Layout under `root/`:
  *   - `centroids/`  (cid, cv array<double>, cn) — K rows, broadcast-sized.
  *   - `postings/`   (cid, id, v array<double>, nrm) — the inverted lists:
  *     each cell's member vectors stored WITH the cell id, repartitioned
  *     and sorted by cid so a probe of p cells row-group-prunes to ~p/K of
  *     the file bytes (at 100 TB this layout would be bucketed by cid; the
  *     parquet min/max sort gives the same pruning single-node).
  */
final class VectorIndex(spark: SparkSession, root: String)
    extends IndexStore(spark, root) {

  private val centroidSchema = StructType.fromDDL(
    "cid BIGINT, cv ARRAY<DOUBLE>, cn DOUBLE")
  private val postingSchema = StructType.fromDDL(
    "cid BIGINT, id BIGINT, v ARRAY<DOUBLE>, nrm DOUBLE")

  def readCentroids(): DataFrame = read("centroids", centroidSchema)
  def readPostings(): DataFrame = read("postings", postingSchema)

  /** Persist a full build: both tables swap in first, the fingerprint
    * lands last. */
  def writeIndex(centroids: DataFrame, postings: DataFrame,
                 meta: String): Unit = {
    clearMeta()
    swapIn("centroids", centroids, centroidSchema)
    // one sorted file per shuffle partition: cid min/max stats per row
    // group make a p-of-K probe skip the other cells' bytes
    swapIn("postings",
      postings.repartition(col("cid")).sortWithinPartitions(col("cid")),
      postingSchema)
    publishMeta(meta)
  }

  /** Incremental maintenance: upsert `incoming` (cid, id, v, nrm) rows
    * into the posting lists keyed on id — new vectors land in their
    * assigned cells, re-ingested ids replace their old rows (an id whose
    * vector changed may MOVE cells; the anti-join evicts the stale row
    * wherever it lived). The fingerprint is untouched: it vouches for the
    * BASE build, and [[isFresh]] deliberately keeps answering true — the
    * extension is additive, not staleness. */
  def upsertPostings(incoming: DataFrame): Unit = {
    val kept = readPostings()
      .join(incoming.select(col("id")).distinct(), Seq("id"), "left_anti")
      .select(col("cid"), col("id"), col("v"), col("nrm"))
    swapIn("postings",
      kept.unionByName(incoming.select(col("cid"), col("id"), col("v"),
          col("nrm")))
        .repartition(col("cid")).sortWithinPartitions(col("cid")),
      postingSchema)
  }

  /** Remove `ids` (one column, `id`) from the posting lists — the
    * right-to-be-forgotten path: subsequent searches can never return a
    * deleted id because its vector is physically gone from the inverted
    * lists (not tombstoned). Centroids are untouched (they are summaries,
    * not member data — exactly how production IVF handles deletes between
    * rebuilds); absent ids are a no-op, so the call is idempotent. The
    * fingerprint stays, like [[upsertPostings]]: the base build it
    * vouches for is still the index's lineage. */
  def deletePostings(ids: DataFrame): Unit =
    swapIn("postings",
      readPostings()
        .join(ids.select(col("id")).distinct(), Seq("id"), "left_anti")
        .repartition(col("cid")).sortWithinPartitions(col("cid")),
      postingSchema)
}

/** Stored inverted text index — see
  * [[graft.operators.TfIdf.sparseBuildStored]]. The sparse-retrieval
  * counterpart of the dense stores: the tokenize → tf → df → weight
  * pipeline (the inline path's localCheckpoint apex) runs once offline
  * and persists; online searches join the prebuilt relations and never
  * touch document text.
  *
  * Layout under `root/`:
  *   - `postings/` (term, id, df, w) — the weighted inverted lists,
  *     repartitioned on the term and sorted within partitions so a
  *     narrow-term-set probe row-group-prunes; df rides each row (the
  *     search-time rare-band filter is a scan-level predicate, not a
  *     join).
  *   - `norms/` (id, n2 decimal(38,0)) — per-doc squared weight norms.
  */
final class TextIndex(spark: SparkSession, root: String)
    extends IndexStore(spark, root) {

  private val postingSchema = StructType.fromDDL(
    "term STRING, id BIGINT, df BIGINT, w BIGINT")
  private val normSchema = StructType.fromDDL(
    "id BIGINT, n2 DECIMAL(38,0)")

  def readPostings(): DataFrame = read("postings", postingSchema)
  def readNorms(): DataFrame = read("norms", normSchema)

  def writeIndex(postings: DataFrame, norms: DataFrame,
                 meta: String): Unit = {
    clearMeta()
    swapIn("postings",
      postings.repartition(col("term")).sortWithinPartitions(col("term")),
      postingSchema)
    swapIn("norms", norms, normSchema)
    publishMeta(meta)
  }

  /** Keyed ingest: replace-or-add `postings` rows and `norms` rows by doc
    * id (a re-ingested doc's old posting rows are evicted from every term
    * list they lived in). Like [[VectorIndex.upsertPostings]], the build
    * fingerprint is untouched — it vouches for the base build the
    * extension rides on. */
  def upsert(postings: DataFrame, norms: DataFrame): Unit = {
    val ids = postings.select(col("id")).distinct()
    // norms swap FIRST: an incoming norms plan typically derives from the
    // postings (stale-df weights) — swapping postings first would leave
    // that plan re-reading just-deleted part files when the norms swap
    // executes it. The reverse dependency (postings derived from norms)
    // does not occur.
    swapIn("norms",
      readNorms().join(norms.select(col("id")).distinct(),
          Seq("id"), "left_anti")
        .unionByName(norms.select(col("id"), col("n2"))),
      normSchema)
    swapIn("postings",
      readPostings().join(ids, Seq("id"), "left_anti")
        .select(col("term"), col("id"), col("df"), col("w"))
        .unionByName(postings.select(col("term"), col("id"), col("df"),
          col("w")))
        .repartition(col("term")).sortWithinPartitions(col("term")),
      postingSchema)
  }
}

/** Stored IVF-PQ index — see
  * [[graft.operators.Similarity.ivfPqBuildStored]]. The compressed
  * production layout: raw vectors never leave the corpus; the index holds
  * the integer cell grid, the per-subspace codebooks (both
  * broadcast-sized), and the m-byte-shaped code rows clustered by cell so
  * an nProbe-cell search row-group-prunes the code scan.
  *
  * Layout under `root/`:
  *   - `cells/`     (cid, cv array<bigint>) — fixed-point cell centers.
  *   - `codebooks/` (s, ccid, csub array<bigint>) — m × kCodes sub-vectors.
  *   - `codes/`     (cid, id, s, code) — one row per (vector, subspace),
  *     repartitioned + sorted by cid.
  */
final class PqIndex(spark: SparkSession, root: String)
    extends IndexStore(spark, root) {

  private val cellSchema = StructType.fromDDL(
    "cid BIGINT, cv ARRAY<BIGINT>")
  private val codebookSchema = StructType.fromDDL(
    "s INT, ccid BIGINT, csub ARRAY<BIGINT>")
  private val codeSchema = StructType.fromDDL(
    "cid BIGINT, id BIGINT, s INT, code BIGINT")

  def readCells(): DataFrame = read("cells", cellSchema)
  def readCodebooks(): DataFrame = read("codebooks", codebookSchema)
  def readCodes(): DataFrame = read("codes", codeSchema)

  def writeIndex(cells: DataFrame, codebooks: DataFrame, codes: DataFrame,
                 meta: String): Unit = {
    clearMeta()
    swapIn("cells", cells, cellSchema)
    swapIn("codebooks", codebooks, codebookSchema)
    swapIn("codes",
      codes.repartition(col("cid")).sortWithinPartitions(col("cid")),
      codeSchema)
    publishMeta(meta)
  }
}
