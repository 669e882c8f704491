package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Parquet-directory store for a prebuilt IVF vector index — the offline
  * half of the production ANN architecture (build once, search many): the
  * index-build pipeline (seed/refine centroids + assign every corpus
  * vector to its cell) runs as a batch job and persists here; the online
  * search path reads these structures and never replays k-means.
  *
  * Layout under `root/`:
  *   - `centroids/`  (cid, cv array<double>, cn) — K rows, broadcast-sized.
  *   - `postings/`   (cid, id, v array<double>, nrm) — the inverted lists:
  *     each cell's member vectors stored WITH the cell id, repartitioned
  *     and sorted by cid so a probe of p cells row-group-prunes to ~p/K of
  *     the file bytes (at 100 TB this layout would be bucketed by cid; the
  *     parquet min/max sort gives the same pruning single-node).
  *   - `_meta` — one-line build fingerprint (corpus count + id checksum +
  *     build params). Written LAST, atomically: a crash anywhere in the
  *     build leaves a missing/stale fingerprint, and [[isFresh]] reports
  *     the index unusable rather than serving half-written lists.
  *
  * Writes follow the [[TableStore]] swap discipline (write `.tmp-*`,
  * rename dest aside, rename tmp in) so a reader never sees a partially
  * rewritten table and a crashed swap is recoverable from the `.old-*`.
  */
final class VectorIndex(spark: SparkSession, root: String) {

  private val centroidSchema = StructType.fromDDL(
    "cid BIGINT, cv ARRAY<DOUBLE>, cn DOUBLE")
  private val postingSchema = StructType.fromDDL(
    "cid BIGINT, id BIGINT, v ARRAY<DOUBLE>, nrm DOUBLE")

  private def path(table: String) = s"$root/$table"
  private def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** [[TableStore.recoverSwap]]'s contract, restated for the index dirs:
    * a kill between the two renames leaves the table absent with the
    * complete pre-swap copy in `.old-*` — restore it; leftover tmp/old
    * dirs from post-swap crashes are garbage — swept. */
  private def recoverSwap(table: String): Unit = {
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

  private def swapIn(table: String, df: DataFrame,
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

  private def read(table: String, schema: StructType): DataFrame = {
    recoverSwap(table)
    require(fs.exists(new Path(path(table))),
      s"index table $table missing under $root — build the index first")
    spark.read.schema(schema).parquet(path(table))
  }

  def readCentroids(): DataFrame = read("centroids", centroidSchema)
  def readPostings(): DataFrame = read("postings", postingSchema)

  /** True iff a complete index built under exactly `meta` is present —
    * the online path's freshness gate (corpus changed, params changed, or
    * build crashed before the fingerprint landed → false). */
  def isFresh(meta: String): Boolean = {
    val m = new Path(path("_meta"))
    fs.exists(m) && {
      val in = fs.open(m)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) == meta
      finally in.close()
    }
  }

  /** Persist a full build: both tables swap in first, the fingerprint
    * lands last (atomic create-new + rename), so [[isFresh]] can only see
    * `meta` once every byte it vouches for is durable. */
  def writeIndex(centroids: DataFrame, postings: DataFrame,
                 meta: String): Unit = {
    fs.delete(new Path(path("_meta")), false)
    swapIn("centroids", centroids, centroidSchema)
    // one sorted file per shuffle partition: cid min/max stats per row
    // group make a p-of-K probe skip the other cells' bytes
    swapIn("postings",
      postings.repartition(col("cid")).sortWithinPartitions(col("cid")),
      postingSchema)
    val tmp = new Path(path("_meta.tmp-" + java.util.UUID.randomUUID()))
    val outS = fs.create(tmp, true)
    try outS.write(meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally outS.close()
    require(fs.rename(tmp, new Path(path("_meta"))),
      s"writeIndex: publishing fingerprint failed")
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
}
