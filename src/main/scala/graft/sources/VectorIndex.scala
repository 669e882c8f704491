package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Shared parquet-directory machinery for prebuilt ANN index stores — the
  * offline half of the production architecture (build once, search many).
  * Tables swap in atomically ([[TableStore]]'s write-temp + two-rename
  * discipline, crash-recoverable); the build fingerprint (`_meta`) lands
  * LAST, so a freshness probe can only see it once every byte it vouches
  * for is durable.
  *
  * Large tables are PHYSICALLY PARTITIONED (`<table>/<col>=<n>/` dirs) so
  * incremental maintenance rewrites only the partitions a batch touches —
  * the production layout: an ingest/delete over a 100 TB index must cost
  * ∝ touched cells, not ∝ corpus. Partition maintenance writes every
  * replacement partition in ONE job into a dot-prefixed temp dir
  * (invisible to Spark's file listing), then swaps each partition with
  * the same two-rename discipline; a crash mid-swap leaves `.old-*`
  * markers that [[recoverPartitions]] restores, and every maintenance op
  * is keyed + idempotent, so a retry after a partial swap converges. */
private[sources] abstract class IndexStore(spark: SparkSession,
                                           root: String) {

  protected def path(table: String) = s"$root/$table"
  protected def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Partition count NEW layouts of this store are written with. */
  protected def configuredBands: Int

  /** The band/bucket count an EXISTING partitioned table was built with,
    * read from its `_layout` marker ([[swapIn]] writes the marker into
    * the temp dir, so it rides the same atomic rename as the data).
    * Maintenance ops derive their partition arithmetic from THIS value,
    * never the compile-time constant: raising the constant for a bigger
    * deployment must not silently fragment an index built at the old
    * count — new BUILDS pick up the new constant; existing layouts keep
    * their own until rebuilt. Pre-marker indexes fall back to the
    * configured constant (their fingerprints rebuild-gate them anyway
    * on the next ensure). */
  protected def liveBands(table: String): Int = {
    val m = new Path(s"${path(table)}/_layout")
    if (!fs.exists(m)) configuredBands
    else {
      val in = fs.open(m)
      val s = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      require(s.startsWith("bands="),
        s"unreadable layout marker $m: '$s'")
      s.stripPrefix("bands=").trim.toInt
    }
  }

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

  protected def swapIn(table: String, df: DataFrame, schema: StructType,
                       partitionBy: Option[String] = None): Unit = {
    val dest = new Path(path(table))
    val tmp = new Path(path(table) + ".tmp-" + java.util.UUID.randomUUID())
    val w = df.select(schema.fields.map(f => col(f.name).cast(f.dataType)): _*)
      .write.mode("errorifexists")
    partitionBy.fold(w)(w.partitionBy(_)).parquet(tmp.toString)
    // the layout marker rides the data's atomic rename, so _layout can
    // never disagree with the dirs beside it (underscore names are
    // invisible to Spark's file listing)
    if (partitionBy.isDefined) {
      val outS = fs.create(new Path(tmp, "_layout"), true)
      try outS.write(s"bands=$configuredBands".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally outS.close()
    }
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
    recoverCommits()
    recoverSwap(table)
    require(fs.exists(new Path(path(table))),
      s"index table $table missing under $root — build the index first")
    spark.read.schema(schema).parquet(path(table))
  }

  // ------------------------------------------------------------------
  // physically-partitioned tables

  protected def withPart(schema: StructType, partCol: String): StructType =
    StructType(schema.fields :+ StructField(partCol, IntegerType))

  /** Read a whole partitioned table; the returned frame carries `partCol`
    * from the directory names (callers filtering on it get partition
    * pruning — only the named dirs' files are listed and read). */
  protected def readPartitioned(table: String, partCol: String,
                                schema: StructType): DataFrame = {
    recoverCommits()
    recoverSwap(table)
    recoverPartitions(table, partCol)
    require(fs.exists(new Path(path(table))),
      s"index table $table missing under $root — build the index first")
    spark.read.schema(withPart(schema, partCol)).parquet(path(table))
  }

  /** Per-partition crash recovery: a kill between a partition's two
    * renames leaves `<table>/.old-<uuid>-<partCol>=<n>` with the live dir
    * absent — restore it; any other `.old-*`/`.tmp-*` leftovers are
    * post-swap garbage — swept. (Dot-prefixed names are invisible to
    * Spark's file listing, so even unswept leftovers can't pollute a
    * read.) */
  protected def recoverPartitions(table: String, partCol: String): Unit = {
    val glob = fs.globStatus(new Path(path(table) + "/.{old,tmp}-*"))
    if (glob == null) return
    glob.foreach { st =>
      val nm = st.getPath.getName
      val marker = nm.indexOf(s"-$partCol=")
      if (nm.startsWith(".old-") && marker > 0) {
        val live = new Path(path(table) + "/" + nm.substring(marker + 1))
        if (!fs.exists(live))
          require(fs.rename(st.getPath, live),
            s"recoverPartitions($table): restoring $nm failed")
        else fs.delete(st.getPath, true)
      } else fs.delete(st.getPath, true)
    }
  }

  /** Partition-clustered, row-balanced shuffle for a partitioned-table
    * write: RANGE-partition on (partCol, sortKey, spreadKey) — every
    * task gets a contiguous, row-balanced slice, so full cluster
    * parallelism with zero hash-collision skew — then sort
    * (partCol, sortKey) within tasks. Three write layouts lost A/Bs to
    * this one: `repartition(dataKey)` scatters every dir across every
    * task (tasks-per-dir small files the next maintenance read pays
    * for); `repartition(partCol)` collapses to nParts tasks (the 1000×
    * text build tripled); hash on a partCol×subs composite throws ~256
    * balls into 256 bins — a third of the tasks empty, the loaded ones
    * 2–3×. The spread key (member id / term) gives ranges a
    * high-cardinality tiebreak so even a single hot partition value
    * splits across tasks; each dir still receives ~tasks/nParts
    * contiguous key-sorted files, and the leading partCol sort
    * satisfies the dynamic-partition writer's ordering requirement —
    * no extra (unstable) sort node to break the key run lengths. */
  protected def clusteredFor(df: DataFrame, partCol: String,
                             sortKey: Column,
                             spreadKey: Column): DataFrame =
    df.repartitionByRange(col(partCol), sortKey, spreadKey)
      .sortWithinPartitions(col(partCol), sortKey)

  // ------------------------------------------------------------------
  // atomic multi-table append: staged files + single commit marker
  //
  // The LSM/segment discipline (batch files land INSIDE live partition
  // dirs, no existing byte read or rewritten) made ATOMIC: the batch is
  // written under a dot-stage dir (invisible to Spark's listing), then a
  // single `_commit-<uuid>` marker — carrying every file move AND the
  // post-append token verbatim — publishes with one atomic rename.
  // Before the marker lands, nothing happened (the stage is unreferenced
  // garbage, swept by the next writer); once it lands, the append is
  // guaranteed to complete — [[recoverCommits]] rolls the marker forward
  // from every read and maintenance entry point, so a crash between any
  // two file moves, or between the moves and the token publish, heals
  // into the COMMITTED state with zero self-healing rebuilds (the
  // pre-round-17 design folded the token after non-atomic moves, leaving
  // a crash window where the token fell permanently behind and the next
  // token-gated search paid a full rebuild). The caller-side retry
  // contract is O(1): pass the pre-batch corpus token as `expectToken` —
  // if the crashed attempt actually committed, the stored token moved on
  // and the retry is a no-op; no per-append id-presence scan over the
  // index is needed (appends are for genuinely-new ids; a re-ingest
  // goes through the keyed upsert).

  private def markerName(uuid: String) = s"_commit-$uuid"

  /** Append `tables`' batches (each (table, partCol, rows, schema)) and
    * fold `added` into the covered-corpus token, atomically: one commit
    * marker covers every table's file moves and the token, so a crash
    * can never land one table's rows without the other's (the old
    * two-append text-store window) or the rows without the token. */
  protected def atomicAppend(
      tables: Seq[(String, String, DataFrame, StructType)],
      added: (Long, BigInt, BigInt)): Unit = {
    recoverCommits(sweepStages = true)
    tables.foreach { case (t, pc, _, _) => recoverPartitions(t, pc) }
    val uuid = java.util.UUID.randomUUID().toString
    val stageRel = s".stage-$uuid"
    val stage = new Path(root, stageRel)
    // staged table writes overlapped on driver threads (guide §2.6):
    // each table stages under its own subdir and every input frame is
    // checkpointed batch rows, so the writes share nothing; `moves`
    // keeps the tables' declared order (the marker's move list is
    // ordered, and replay depends only on per-move idempotence)
    val staged = tables.map { case (table, partCol, df, schema) =>
      Overlap.future {
        val full = withPart(schema, partCol)
        val tdir = new Path(stage, table)
        df.select(full.fields.map(f => col(f.name).cast(f.dataType)): _*)
          .write.mode("errorifexists").partitionBy(partCol)
          .parquet(tdir.toString)
        val parts = fs.globStatus(new Path(tdir, s"$partCol=*"))
        (if (parts == null) Array[org.apache.hadoop.fs.FileStatus]()
         else parts).toSeq.flatMap { p =>
          fs.listStatus(p.getPath).toSeq
            .filterNot { f =>
              val n = f.getPath.getName
              n.startsWith("_") || n.startsWith(".")
            }
            .map { f =>
              (s"$stageRel/$table/${p.getPath.getName}/${f.getPath.getName}",
                s"$table/${p.getPath.getName}/${f.getPath.getName}")
            }
        }
      }
    }
    // join EVERY staging future before propagating a failure (ADVICE
    // r17): a sequential flatMap would rethrow the first table's error
    // while later tables' daemon threads were still writing into the
    // stage dir — withLease would then release the maintenance lease with
    // writes in flight, racing the next holder's sweepStages. Joining all
    // keeps the single-writer contract on the failure path; `moves` stays
    // in declared table order.
    val joined = staged.map(f =>
      try Right(f()) catch { case e: Throwable => Left(e) })
    joined.collect { case Left(e) => e } match {
      case Seq() =>
      case errs =>
        errs.tail.foreach(errs.head.addSuppressed)
        throw errs.head
    }
    val moves = joined.collect { case Right(ms) => ms }.flatten
    IndexStore.maybeCrash("staged")
    // the post-append token is computed BEFORE the marker and recorded
    // in it VERBATIM, so recovery republishes — never re-folds (a redo
    // that re-folded would double-count the batch)
    val target = storedToken().map(foldedOf(_, added,
      (0L, BigInt(0), BigInt(0))))
    writeAtomic(markerName(uuid),
      ("graft-commit-v1" +:
        s"stage=$stageRel" +:
        s"token=${target.getOrElse("-")}" +:
        moves.map { case (s, d) => s"$s\t$d" }).mkString("\n"))
    IndexStore.maybeCrash("marker")
    replayCommit(new Path(path(markerName(uuid))))
  }

  /** Roll a commit marker forward: redo its file moves (each idempotent
    * — a move whose src is gone and dest present already happened),
    * publish the recorded token, then drop the marker and its stage dir.
    * Serialized per store root within the process; cross-process
    * replayers racing on the same marker are tolerated by re-checking
    * the destination after a failed rename. */
  private def replayCommit(marker: Path): Unit =
    IndexStore.lockFor(root).synchronized {
      if (!fs.exists(marker)) return // a racing replayer finished it
      val in = fs.open(marker)
      val text = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val lines = text.split("\n").toSeq
      require(lines.headOption.contains("graft-commit-v1"),
        s"unreadable commit marker $marker")
      val stageRel = lines.collectFirst {
        case l if l.startsWith("stage=") => l.stripPrefix("stage=") }.get
      val token = lines.collectFirst {
        case l if l.startsWith("token=") => l.stripPrefix("token=") }.get
      val moves = lines.drop(3).filter(_.nonEmpty).map { l =>
        val i = l.indexOf('\t')
        (l.substring(0, i), l.substring(i + 1))
      }
      moves.zipWithIndex.foreach { case ((src, dest), i) =>
        val s = new Path(root, src)
        val d = new Path(root, dest)
        if (fs.exists(s)) {
          if (!fs.exists(d.getParent)) fs.mkdirs(d.getParent)
          if (!fs.rename(s, d))
            // a cross-process replayer can win the rename between our
            // exists check and here; the move is done iff dest holds it
            require(fs.exists(d) && !fs.exists(s),
              s"replayCommit: moving $s -> $d failed")
        } else require(fs.exists(d),
          s"replayCommit: $src gone and $dest absent — staged file lost")
        IndexStore.maybeCrash(s"move-$i")
      }
      if (token != "-") publishToken(token)
      IndexStore.maybeCrash("token")
      fs.delete(marker, false)
      fs.delete(new Path(root, stageRel), true)
    }

  /** Roll forward any committed-but-unfinished appends (called from
    * every read and maintenance entry point — the [[recoverSwap]]
    * discipline for the append path). `sweepStages` additionally deletes
    * UNREFERENCED stage dirs — crashed pre-commit appends that never
    * happened; only the single writer may sweep (a reader must not
    * delete a stage an in-flight append is still writing). */
  protected def recoverCommits(sweepStages: Boolean = false): Unit = {
    val glob = fs.globStatus(new Path(root, "_commit-*"))
    val all = if (glob == null) Array[org.apache.hadoop.fs.FileStatus]()
      else glob
    all.filterNot(_.getPath.getName.contains(".tmp-"))
      .foreach(st => replayCommit(st.getPath))
    if (sweepStages) {
      // writeAtomic leftovers of a crashed marker publish, then stage
      // dirs no surviving marker references — pre-commit garbage
      all.filter(_.getPath.getName.contains(".tmp-"))
        .foreach(st => fs.delete(st.getPath, false))
      val stages = fs.globStatus(new Path(root, ".stage-*"))
      (if (stages == null) Array[org.apache.hadoop.fs.FileStatus]()
       else stages).foreach(st => fs.delete(st.getPath, true))
    }
  }

  /** Partition values currently present on disk — one directory listing,
    * no data read. Lets a maintenance op skip the prior-rows lookup scan
    * entirely when the batch's own partitions already cover every live
    * one (any evicted row necessarily lives in a covered partition). */
  protected def existingParts(table: String, partCol: String): Set[Int] = {
    val glob = fs.globStatus(new Path(s"${path(table)}/$partCol=*"))
    if (glob == null) Set.empty
    else glob.map(_.getPath.getName.substring(partCol.length + 1).toInt).toSet
  }

  /** Partitions holding at least `minFiles` data files — the targeted-
    * compaction candidate set. File METADATA only (one listing per live
    * dir, no data read): at production scale appends fragment only the
    * partitions their batches touched, and a compaction that rewrites
    * every partition to fold a few is a whole-table job for O(touched)
    * work. `minFiles <= 1` degenerates to every live partition (the
    * full-fold rebuild-cadence form). */
  protected def fragmentedParts(table: String, partCol: String,
                                minFiles: Int): Seq[Int] = {
    // recover FIRST even on the full-fold path: a partition sitting in a
    // crashed-swap .old-* state has no live dir and would be invisible
    // to the listing — the fold would silently skip it this round
    recoverPartitions(table, partCol)
    if (minFiles <= 1) return existingParts(table, partCol).toSeq.sorted
    val dirs = fs.globStatus(new Path(s"${path(table)}/$partCol=*"))
    (if (dirs == null) Array[org.apache.hadoop.fs.FileStatus]() else dirs)
      .filter { d =>
        // a dir can vanish between the glob and this listing (a
        // concurrent delete emptied the partition) — treat it as 0
        // files (not fragmented this round) instead of aborting the op
        val files =
          try fs.listStatus(d.getPath)
          catch {
            case _: java.io.FileNotFoundException =>
              Array.empty[org.apache.hadoop.fs.FileStatus]
          }
        files.count { f =>
          val n = f.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        } >= minFiles
      }
      .map(_.getPath.getName.substring(partCol.length + 1).toInt)
      .sorted.toSeq
  }

  /** Replace ONLY the listed partitions of a partitioned table. `content`
    * must hold the full replacement rows for exactly those partitions
    * (including `partCol`); it may read the live partitions — the single
    * write job executes the plan before any rename. A partition with no
    * content rows is removed (its rows were all evicted). Maintenance
    * cost is ∝ touched partitions: one job over their bytes + O(touched)
    * renames — never a whole-table rewrite.
    *
    * Split into [[swapStage]] (the write job) + [[swapCommit]] (the
    * renames) so a maintenance op can overlap OTHER pre-swap reads (the
    * eviction token delta) with the staged write (guide §2.6) — both
    * read the same live, pre-swap state; nothing moves until commit. */
  protected def swapPartitions(table: String, partCol: String,
                               parts: Seq[Int], schema: StructType,
                               content: DataFrame): Unit = {
    if (parts.isEmpty) { recoverPartitions(table, partCol); return }
    swapCommit(table, partCol, parts,
      swapStage(table, partCol, schema, content))
  }

  /** Phase 1 of [[swapPartitions]]: heal crashed swaps, then execute the
    * content plan into the table's `.tmp-<uuid>` stage dir. The plan may
    * read the live partitions, and so may any concurrent pre-swap read
    * job — no live byte moves until [[swapCommit]]. Every overlapped
    * read MUST be joined before commit is called. */
  protected def swapStage(table: String, partCol: String,
                          schema: StructType, content: DataFrame): Path = {
    recoverPartitions(table, partCol)
    val tmp = new Path(s"${path(table)}/.tmp-${java.util.UUID.randomUUID()}")
    val full = withPart(schema, partCol)
    content.select(full.fields.map(f => col(f.name).cast(f.dataType)): _*)
      .write.mode("errorifexists").partitionBy(partCol).parquet(tmp.toString)
    tmp
  }

  /** Phase 2 of [[swapPartitions]]: the per-partition renames (identical
    * crash windows to the pre-split form — recoverPartitions heals
    * .old-* remnants) and the stage-dir cleanup. */
  protected def swapCommit(table: String, partCol: String,
                           parts: Seq[Int], tmp: Path): Unit = {
    val uuid = tmp.getName.stripPrefix(".tmp-")
    parts.foreach { b =>
      val src = new Path(tmp, s"$partCol=$b")
      val dest = new Path(s"${path(table)}/$partCol=$b")
      if (fs.exists(src)) {
        val old = new Path(s"${path(table)}/.old-$uuid-$partCol=$b")
        if (fs.exists(dest)) require(fs.rename(dest, old),
          s"swapPartitions($table): rename $dest -> $old failed")
        require(fs.rename(src, dest),
          s"swapPartitions($table): rename $src -> $dest failed — " +
            s"pre-swap in $old")
        fs.delete(old, true)
      } else {
        // no src dir: every row of this partition was evicted. Delete the
        // live dir DIRECTLY — routing it through a rename-to-.old would
        // open a crash window where recoverPartitions RESTORES it,
        // resurrecting forgotten (right-to-be-forgotten) rows; a crash
        // mid-delete instead leaves a remnant that a retry of the same
        // idempotent op deletes for good.
        fs.delete(dest, true)
      }
    }
    fs.delete(tmp, true)
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

  protected def clearMeta(): Unit = {
    fs.delete(new Path(path("_meta")), false)
    fs.delete(new Path(path("_token")), false)
    // a full build supersedes any pending append: a commit marker
    // replayed AFTER the rebuilt tables swap in would inject a stale
    // batch's files into the fresh layout — purge markers and stages
    // instead of rolling them forward (rebuild-with-carryover paths
    // read the index first, which already rolled them forward)
    Seq("_commit-*", ".stage-*").foreach { pat =>
      val glob = fs.globStatus(new Path(root, pat))
      (if (glob == null) Array[org.apache.hadoop.fs.FileStatus]()
       else glob).foreach(st => fs.delete(st.getPath, true))
    }
  }

  private def writeAtomic(name: String, content: String): Unit = {
    val tmp = new Path(path(s"$name.tmp-" + java.util.UUID.randomUUID()))
    val outS = fs.create(tmp, true)
    try outS.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally outS.close()
    // Hadoop rename refuses an existing destination — delete first. A
    // crash inside the delete→rename window leaves the marker ABSENT,
    // which every reader treats as stale/unknown: the conservative
    // direction (a rebuild, never a silently-served wrong version).
    fs.delete(new Path(path(name)), false)
    require(fs.rename(tmp, new Path(path(name))),
      s"writeAtomic: publishing $name failed")
  }

  protected def publishMeta(meta: String): Unit = writeAtomic("_meta", meta)

  // ------------------------------------------------------------------
  // covered-corpus version token
  //
  // `_meta` vouches for the BASE build and is untouched by maintenance
  // (isFresh keeps answering true for the base corpus — extensions are
  // additive, not staleness). `_token` is the COVERED-CORPUS version:
  // initialized to the build fingerprint and kept equal to what a fresh
  // fingerprint scan over the corpus-as-maintained WOULD compute, by
  // folding each maintenance batch's delta into the commutative terms
  // (n, Σid, Σhash). A caller that maintains its corpus version token
  // (every ingestion pipeline does — it is the thing writing the corpus)
  // gets an O(1) freshness check on the serving path: compare tokens,
  // no corpus scan.

  /** The covered-corpus version token, or None when absent (legacy index,
    * build crashed pre-fingerprint, or a maintenance op crashed between
    * its table swap and its token fold — all conservative: a token-gated
    * search treats None as stale). */
  def storedToken(): Option[String] = {
    // roll any committed-but-unfinished append forward FIRST: the token
    // gate must answer for the committed state, not a crash's leftovers
    // (one root listing — still corpus-independent)
    recoverCommits()
    val t = new Path(path("_token"))
    if (!fs.exists(t)) None
    else {
      val in = fs.open(t)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** O(1) freshness: does this index cover exactly the corpus version the
    * caller holds? One small file read; no job over any table. */
  def isCurrent(token: String): Boolean = storedToken().contains(token)

  protected def publishToken(token: String): Unit =
    writeAtomic("_token", token)

  /** (rows, Σid, Σhash) of a maintenance delta — the commutative terms
    * [[foldToken]] adds/subtracts. `hash` must be the same per-row hash
    * the family's fingerprint scan uses. */
  protected def deltaOf(df: DataFrame,
                        hash: Column): (Long, BigInt, BigInt) =
    CorpusToken.terms(df, col("id"), hash)

  private val tokenRe =
    """^([^|]+)\|n=(-?\d+)\|sumid=(-?\d+)\|chk=(-?\d+)\|(.*)$""".r

  /** Pure token fold: n/Σid/Σhash move by (added − removed); the params
    * suffix is untouched. */
  private def foldedOf(cur: String, added: (Long, BigInt, BigInt),
                       removed: (Long, BigInt, BigInt)): String =
    cur match {
      case tokenRe(tag, n, sumid, chk, rest) =>
        s"$tag|n=${n.toLong + added._1 - removed._1}" +
          s"|sumid=${BigInt(sumid) + added._2 - removed._2}" +
          s"|chk=${BigInt(chk) + added._3 - removed._3}|$rest"
      case other =>
        throw new IllegalStateException(s"unparseable _token: '$other'")
    }

  /** Fold a maintenance delta into the stored token. Called AFTER a
    * table swap — a crash between swap and fold leaves the token BEHIND
    * the data, which is the conservative direction (a token-gated search
    * sees a mismatch and self-heals with a rebuild; it can never serve a
    * corpus version the index does not actually cover), and a full retry
    * of a SWAP-based op re-runs against the already-swapped state, so
    * its added and removed terms cancel and the fold nets zero — the
    * token converges. The APPEND paths do not use this: their fold rides
    * the [[atomicAppend]] commit marker, so token and data move
    * together. An absent token stays absent. */
  protected def foldToken(added: (Long, BigInt, BigInt),
                          removed: (Long, BigInt, BigInt)): Unit =
    storedToken().foreach(t => publishToken(foldedOf(t, added, removed)))

  // ------------------------------------------------------------------
  // single-writer lease
  //
  // The swap-write + commit-marker protocols assume ONE maintainer per
  // index at a time (two concurrent upserts could interleave their
  // partition swaps and token folds). The lease makes that contract
  // enforced instead of assumed: every mutating op runs under
  // `_lease` — acquired with an atomic create-if-absent, so two
  // maintainers racing on the same store get one winner and one
  // actionable error, never interleaved writes. A maintainer that DIED
  // holding the lease (no finally ran) is healed by the TTL: the next
  // acquirer breaks an expired lease. Readers never touch the lease —
  // searches stay lock-free on the swapped-in state.

  /** Run `body` holding this store's maintenance lease. Throws (does not
    * wait) when another live maintainer holds it: maintenance is batch
    * work — the caller's scheduler owns queueing, not a file lock. */
  protected def withLease[T](op: String)(body: => T): T = {
    val lease = new Path(path("_lease"))
    val me = java.util.UUID.randomUUID().toString
    def readLease(): Option[String] =
      if (!fs.exists(lease)) None
      else
        try {
          val in = fs.open(lease)
          try Some(new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8))
          finally in.close()
        } catch { case _: java.io.FileNotFoundException => None }
    def tryAcquire(): Boolean =
      try {
        // overwrite = false: atomic create-if-absent — the lock
        val out = fs.create(lease, false)
        try out.write(
          s"$me|${System.currentTimeMillis() + IndexStore.LeaseTtlMs}"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    def acquire(attempt: Int): Unit =
      if (!tryAcquire()) {
        val cur = readLease()
        val expired = cur.forall { s =>
          val i = s.lastIndexOf('|')
          i < 0 || scala.util.Try(s.substring(i + 1).trim.toLong)
            .toOption.forall(_ < System.currentTimeMillis())
        }
        if (expired && attempt < 3) {
          cur.foreach(_ => fs.delete(lease, false)) // break a dead lease
          acquire(attempt + 1)
        } else throw new IllegalStateException(
          s"$op: index at $root is being maintained by another writer " +
            s"(lease ${cur.getOrElse("vanished mid-check")}); retry after " +
            "it finishes or its lease expires " +
            s"(TTL ${IndexStore.LeaseTtlMs / 60000} min)")
      }
    acquire(0)
    try body
    finally {
      // release only OUR lease: an expiry-breaker may have replaced it
      if (readLease().exists(_.startsWith(me + "|")))
        fs.delete(lease, false)
    }
  }
}

private[graft] object IndexStore {
  /** Maintenance-lease TTL — how long a DEAD maintainer (crashed without
    * running its release) blocks the next one. */
  private[graft] val LeaseTtlMs: Long = 15L * 60 * 1000

  /** Test-only failpoint: [[atomicAppend]]/[[replayCommit]] call
    * `maybeCrash(step)` at every publish step ("staged", "marker",
    * "move-<i>", "token"); a spec sets this predicate to kill the append
    * at an exact step and then proves recovery rolls the commit forward.
    * Always false outside specs. */
  @volatile private[graft] var crashAt: String => Boolean = _ => false

  private[graft] final class InjectedCrash(step: String)
      extends RuntimeException(s"injected crash at $step")

  private[sources] def maybeCrash(step: String): Unit =
    if (crashAt(step)) throw new InjectedCrash(step)

  private val rootLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Per-root monitor serializing commit replay within the process (two
    * threads — a reader's recovery and the writer — must not interleave
    * one marker's moves; cross-process races are tolerated by the
    * idempotent move handling). */
  private[sources] def lockFor(root: String): Object =
    rootLocks.computeIfAbsent(root, _ => new Object)
}

object VectorIndex {
  /** Physical posting partitions (`cid_band = cid mod PostingBands`).
    * Sized so single-node tests keep per-band files non-trivial; a
    * 1000-executor deployment raises it (bands are independent, so the
    * constant only trades maintenance granularity against file count).
    * The count an index was BUILT with is persisted in its `_layout`
    * marker and governs all maintenance on it — raising this default
    * affects new builds only. */
  val PostingBands = 16
}

/** Stored IVF index — see [[graft.operators.Similarity.ivfBuildStored]].
  *
  * Layout under `root/`:
  *   - `centroids/`  (cid, cv array<double>, cn) — K rows, broadcast-sized.
  *   - `postings/cid_band=N/`  (cid, id, v array<double>, nrm, fp) — the
  *     inverted lists, directory-partitioned on cid mod
  *     [[VectorIndex.PostingBands]] and cid-sorted within files, so a
  *     probe of p cells row-group-prunes to ~p/K of the bytes AND an
  *     ingest/delete batch rewrites only the bands holding its cells —
  *     maintenance ∝ touched cells, not corpus (the q149/q152 lesson:
  *     the round-14 flat layout measured corpus-linear at the 1000×
  *     decade).
  */
final class VectorIndex(spark: SparkSession, root: String,
                        val nBands: Int = VectorIndex.PostingBands)
    extends IndexStore(spark, root) {
  override protected def configuredBands: Int = nBands

  private val centroidSchema = StructType.fromDDL(
    "cid BIGINT, cv ARRAY<DOUBLE>, cn DOUBLE")
  private val postingSchema = StructType.fromDDL(
    "cid BIGINT, id BIGINT, v ARRAY<DOUBLE>, nrm DOUBLE, fp BIGINT")

  private def band(c: Column, n: Int): Column =
    pmod(c, lit(n.toLong)).cast("int")

  /** Per-row content hash, identical to the fingerprint scan's term
    * (the scan hashes (id, toDouble(vec)); v IS toDouble(vec)) — stored
    * on every posting row so maintenance deltas and rebuilds read an
    * 8-byte column instead of re-hashing vectors. */
  private def fpOf(df: DataFrame): DataFrame =
    df.withColumn("fp", xxhash64(col("id"), col("v")))

  def readCentroids(): DataFrame = read("centroids", centroidSchema)
  def readPostings(): DataFrame = postingsWithBand().drop("cid_band")

  private def postingsWithBand(): DataFrame =
    readPartitioned("postings", "cid_band", postingSchema)

  /** Persist a full build: both tables swap in first, the fingerprint
    * lands last. Postings hash-partition on cid (whole cells per task)
    * and sort by (band, cid) within tasks — the band sort satisfies the
    * dynamic-partition writer's ordering requirement (no extra sort node,
    * which would be unstable and break the cid run lengths) and each
    * band dir's files keep tight cid min/max row-group stats. */
  def writeIndex(centroids: DataFrame, postings: DataFrame,
                 meta: => String): Unit = withLease("writeIndex") {
    clearMeta()
    // Overlapped independent jobs (guide §2.6): the two table swaps write
    // different directories, and `meta` (by-name: the builds pass the
    // token fold over their already-checkpointed posting frame) reads no
    // index table — the K-row centroid swap and the fingerprint aggregate
    // back-fill the corpus-sized postings write's tail instead of
    // serializing after it. Crash safety is unchanged: _meta/_token were
    // cleared first and land only after EVERY swap finished, so any
    // partial combination reads as stale and rebuild-gates.
    val tok = Overlap.future(meta)
    // joining: the fold must not outlive the lease if a swap fails
    val m = Overlap.joining(tok)(Overlap.jobs(
      () => swapIn("postings",
        fpOf(postings)
          .withColumn("cid_band", band(col("cid"), configuredBands))
          .transform(clusteredFor(_, "cid_band", col("cid"), col("id"))),
        withPart(postingSchema, "cid_band"),
        partitionBy = Some("cid_band")),
      () => swapIn("centroids", centroids, centroidSchema)))
    publishToken(m)
    publishMeta(m)
  }

  /** Incremental maintenance: upsert `incoming` (cid, id, v, nrm) rows
    * into the posting lists keyed on id — new vectors land in their
    * assigned cells, re-ingested ids replace their old rows (an id whose
    * vector changed may MOVE cells; the eviction finds the stale row
    * wherever it lived). Touched partitions = the batch's own bands ∪ the
    * bands holding prior rows of its ids (found by an (id, band)-only
    * column scan — parquet prunes every other column); ONLY those bands
    * are rewritten. `_meta` is untouched: it vouches for the BASE build,
    * and [[isFresh]] deliberately keeps answering true — the extension
    * is additive, not staleness. The covered-corpus `_token` IS folded
    * (added batch terms in, evicted rows' terms out — the latter read
    * from the stored fp column, band-pruned), so [[isCurrent]] keeps
    * tracking exactly what the index covers. */
  def upsertPostings(incoming: DataFrame): Unit =
    withLease("upsertPostings") {
    // batch-sized; materialized once because the plan below reads it for
    // the band census, the eviction keys, and the union content
    val inc = fpOf(incoming
        .select(col("cid"), col("id"), col("v"), col("nrm")))
      .withColumn("cid_band", band(col("cid"), liveBands("postings")))
      .localCheckpoint(true)
    val ids = inc.select(col("id")).distinct()
    val pb = postingsWithBand()
    val newBands = inc.select(col("cid_band")).distinct()
      .collect().map(_.getInt(0))
    // prior rows of re-ingested ids may live in OTHER bands (a moved
    // vector) — found by an (id, band)-only column scan, skipped when the
    // batch's own bands already cover every live one
    val oldBands =
      if (existingParts("postings", "cid_band").subsetOf(newBands.toSet))
        Array.empty[Int]
      else pb.select(col("cid_band"), col("id"))
        .join(ids, Seq("id"), "left_semi")
        .select(col("cid_band")).distinct().collect().map(_.getInt(0))
    val touched = (newBands ++ oldBands).distinct.sorted
    // Token deltas overlapped with the staged write (r18, guide §2.6 —
    // the swapStage/swapCommit split): the eviction delta reads the SAME
    // live pre-swap bands the content plan reads (read-read, safe), the
    // batch delta reads only the checkpointed inc — both are joined
    // strictly BEFORE any rename, so no read can see a half-swapped
    // table, and the fold still runs after the swap (crash leaves the
    // token behind the data, the conservative direction, unchanged).
    val removedT = Overlap.future(deltaOf(
      pb.where(col("cid_band").isin(touched.map(Integer.valueOf): _*))
        .join(ids, Seq("id"), "left_semi"), col("fp")))
    val addedT = Overlap.future(deltaOf(inc, col("fp")))
    if (touched.nonEmpty) {
      val tmp = Overlap.guarding(removedT, addedT)(
        swapStage("postings", "cid_band", postingSchema,
          pb.where(col("cid_band").isin(touched.map(Integer.valueOf): _*))
            .join(ids, Seq("id"), "left_anti")
            .unionByName(inc)
            .transform(clusteredFor(_, "cid_band", col("cid"), col("id")))))
      val (removed, added) = (removedT(), addedT())
      swapCommit("postings", "cid_band", touched.toIndexedSeq, tmp)
      foldToken(added, removed)
    } else foldToken(addedT(), removedT())
  }

  /** O(batch) ingest for GENUINELY-NEW ids — the LSM/segment-style
    * append: the batch's posting files land INSIDE their cid bands
    * without reading or rewriting ANY existing byte
    * ([[upsertPostings]]' kept-side rewrite exists to EVICT re-ingested
    * ids; when there is nothing to evict, the rewrite is pure waste).
    * Files and token publish under ONE commit marker
    * ([[IndexStore.atomicAppend]]): the append either fully happened
    * (token folded) or not at all, so the retry discipline is the O(1)
    * token check (`expectToken` on the operator entry points) — no
    * per-append id-presence scan over the index. The caller owns the
    * new-ids guarantee (its corpus versioning already knows); a CHANGED
    * vector under an existing id must go through [[upsertPostings]].
    * Appends accumulate small files per band; [[compactPostings]] folds
    * them back on the rebuild cadence. */
  def appendPostings(incoming: DataFrame): Unit =
    withLease("appendPostings") {
      // batch-sized; materialized once — consumed by the staged file
      // write AND the token delta
      val inc = fpOf(incoming
          .select(col("cid"), col("id"), col("v"), col("nrm")))
        .withColumn("cid_band", band(col("cid"), liveBands("postings")))
        .localCheckpoint(true)
      atomicAppend(
        Seq(("postings", "cid_band",
          clusteredFor(inc, "cid_band", col("cid"), col("id")),
          postingSchema)),
        deltaOf(inc, col("fp")))
    }

  /** Fold append-accumulated files back into the clustered layout — one
    * [[swapPartitions]] pass over the selected bands. The default
    * (`minFiles = 1`) folds every live band — the rebuild-cadence
    * whole-table form; `minFiles >= 2` folds only bands whose file count
    * reached the threshold ([[IndexStore.fragmentedParts]], file metadata
    * only), so steady-state compaction cost is ∝ the bands appends
    * actually fragmented, never the whole table. Rows and censuses are
    * unchanged either way; untouched bands' files are not rewritten. */
  def compactPostings(minFiles: Int = 1): Unit =
    withLease("compactPostings") {
    val parts = fragmentedParts("postings", "cid_band", minFiles)
    if (parts.isEmpty) return
    swapPartitions("postings", "cid_band", parts.toIndexedSeq,
      postingSchema,
      clusteredFor(
        postingsWithBand()
          .where(col("cid_band").isin(parts.map(Integer.valueOf): _*)),
        "cid_band", col("cid"), col("id")))
  }

  /** Remove `ids` (one column, `id`) from the posting lists — the
    * right-to-be-forgotten path: subsequent searches can never return a
    * deleted id because its vector is physically gone from the inverted
    * lists (not tombstoned). Centroids are untouched (they are summaries,
    * not member data — exactly how production IVF handles deletes between
    * rebuilds); absent ids are a no-op, so the call is idempotent. Only
    * the bands holding doomed rows (one (id, band) column scan) are
    * rewritten. `_meta` stays, like [[upsertPostings]]: the base build
    * it vouches for is still the index's lineage; the covered-corpus
    * `_token` drops the forgotten rows' terms. */
  def deletePostings(ids0: DataFrame): Unit =
    withLease("deletePostings") {
    val ids = ids0.select(col("id")).distinct().localCheckpoint(true)
    val pb = postingsWithBand()
    val touched = pb.select(col("cid_band"), col("id"))
      .join(ids, Seq("id"), "left_semi")
      .select(col("cid_band")).distinct().collect().map(_.getInt(0)).sorted
    // doomed rows' token terms, read band-pruned — overlapped with the
    // staged write (both read pre-swap state; joined before any rename)
    val removedT = Overlap.future(deltaOf(
      pb.where(col("cid_band").isin(touched.map(Integer.valueOf): _*))
        .join(ids, Seq("id"), "left_semi"), col("fp")))
    if (touched.nonEmpty) {
      val tmp = Overlap.guarding(removedT)(
        swapStage("postings", "cid_band", postingSchema,
          pb.where(col("cid_band").isin(touched.map(Integer.valueOf): _*))
            .join(ids, Seq("id"), "left_anti")
            .transform(clusteredFor(_, "cid_band", col("cid"), col("id")))))
      val removed = removedT()
      swapCommit("postings", "cid_band", touched.toIndexedSeq, tmp)
      foldToken((0L, BigInt(0), BigInt(0)), removed)
    } else foldToken((0L, BigInt(0), BigInt(0)), removedT())
  }
}

object TextIndex {
  /** Physical posting partitions (`term_bucket = xxhash64(term) mod
    * TermBuckets`) and norm partitions (`id_bucket = id mod TermBuckets`).
    * Internal layout only — bucket values never reach query output, so
    * the Spark-specific hash is fine. */
  val TermBuckets = 16
}

/** Stored inverted text index — see
  * [[graft.operators.TfIdf.sparseBuildStored]]. The sparse-retrieval
  * counterpart of the dense stores: the tokenize → tf → df → weight
  * pipeline (the inline path's localCheckpoint apex) runs once offline
  * and persists; online searches join the prebuilt relations and never
  * touch document text.
  *
  * Layout under `root/`:
  *   - `postings/term_bucket=N/` (term, id, df, w) — the weighted
  *     inverted lists, directory-partitioned on the term hash and
  *     term-sorted within files, so a narrow-term-set probe
  *     row-group-prunes and an ingest/delete rewrites only the buckets
  *     holding its terms; df rides each row (the search-time rare-band
  *     filter is a scan-level predicate, not a join).
  *   - `norms/id_bucket=N/` (id, n2 decimal(38,0)) — per-doc squared
  *     weight norms, partitioned on the doc id so keyed maintenance
  *     touches ~|batch| buckets.
  */
final class TextIndex(spark: SparkSession, root: String,
                      val nBuckets: Int = TextIndex.TermBuckets)
    extends IndexStore(spark, root) {
  override protected def configuredBands: Int = nBuckets

  // tf rides every posting row so a stats-refresh rebuild can recompute
  // weights under fresh df without the corpus (w alone is lossy: terms
  // with df > idfScale weigh 0)
  private val postingSchema = StructType.fromDDL(
    "term STRING, id BIGINT, df BIGINT, tf BIGINT, w BIGINT")
  // norms are the per-doc LEDGER: one row per ingested doc (n2 = 0 for a
  // term-less doc) carrying fp = xxhash64(id, text) — the fingerprint
  // term token folds and rebuilds reconstruct without re-reading text
  private val normSchema = StructType.fromDDL(
    "id BIGINT, n2 DECIMAL(38,0), fp BIGINT")

  private def tBucket(t: Column, n: Int): Column =
    pmod(xxhash64(t), lit(n.toLong)).cast("int")
  private def nBucket(i: Column, n: Int): Column =
    pmod(i, lit(n.toLong)).cast("int")

  def readPostings(): DataFrame = postingsWithBucket().drop("term_bucket")
  def readNorms(): DataFrame = normsWithBucket().drop("id_bucket")

  private def postingsWithBucket(): DataFrame =
    readPartitioned("postings", "term_bucket", postingSchema)
  private def normsWithBucket(): DataFrame =
    readPartitioned("norms", "id_bucket", normSchema)

  def writeIndex(postings: DataFrame, norms: DataFrame,
                 meta: => String): Unit = withLease("writeIndex") {
    clearMeta()
    // Overlapped independent jobs (guide §2.6; the
    // [[VectorIndex.writeIndex]] rationale): the postings and norms swaps
    // write different directories — the build paths hand in frames that
    // read only checkpointed batch/corpus rows, never these tables — and
    // the by-name `meta` fold reads no index table. _meta/_token still
    // land only after every swap finished, so crash combinations read as
    // stale exactly as before.
    val tok = Overlap.future(meta)
    // joining: the fold must not outlive the lease if a swap fails
    val m = Overlap.joining(tok)(Overlap.jobs(
      () => swapIn("postings",
        postings.withColumn("term_bucket",
            tBucket(col("term"), configuredBands))
          .transform(clusteredFor(_, "term_bucket", col("term"), col("id"))),
        withPart(postingSchema, "term_bucket"),
        partitionBy = Some("term_bucket")),
      () => swapIn("norms",
        norms.withColumn("id_bucket", nBucket(col("id"), configuredBands))
          .transform(clusteredFor(_, "id_bucket", col("id"), col("id"))),
        withPart(normSchema, "id_bucket"), partitionBy = Some("id_bucket"))))
    publishToken(m)
    publishMeta(m)
  }

  /** Keyed ingest: replace-or-add `postings` rows and `norms` rows by doc
    * id (a re-ingested doc's old posting rows are evicted from every term
    * list they lived in). Both incoming frames are materialized
    * batch-sized BEFORE any swap, so a plan deriving the batch weights
    * from this store's own postings (the stale-IDF contract) can never
    * re-read a just-replaced directory. Touched posting buckets = the
    * batch terms' buckets ∪ buckets holding prior rows of its ids (an
    * (id, bucket)-only column scan); touched norm buckets are the batch
    * ids' own. Like [[VectorIndex.upsertPostings]], `_meta` is untouched
    * — it vouches for the base build the extension rides on — while the
    * covered-corpus `_token` folds the batch in and the evicted docs'
    * ledger terms out. */
  def upsert(postings: DataFrame, norms: DataFrame,
             evictIds: Option[DataFrame] = None): Unit =
    withLease("upsert") {
    val incP = postings
      .select(col("term"), col("id"), col("df"), col("tf"), col("w"))
      .withColumn("term_bucket",
        tBucket(col("term"), liveBands("postings")))
      .localCheckpoint(true)
    val incN = norms.select(col("id"), col("n2"), col("fp"))
      .withColumn("id_bucket", nBucket(col("id"), liveBands("norms")))
      .localCheckpoint(true)
    // the EVICTION set: the batch's doc ids, which may be WIDER than the
    // ledger rows — a doc re-posted with NULL text yields no norm row
    // (it leaves the covered corpus) but its old posting + ledger rows
    // must still be evicted and their token terms folded out. A caller's
    // evictIds is UNIONED with the batch's own ids, never trusted alone:
    // this set drives the touched-bucket arithmetic, and an evictIds
    // narrower than the batch would leave incN rows in buckets outside
    // nTouched — silently dropped by the swap while deltaOf(incN) still
    // folds their terms in, putting the token AHEAD of the data (the
    // one direction the foldToken contract forbids)
    val batchIds = incN.select(col("id")).distinct()
    val ids = evictIds
      .map(_.select(col("id")).unionByName(batchIds).distinct()
        .localCheckpoint(true))
      .getOrElse(batchIds)

    val added = deltaOf(incN, col("fp"))
    // Overlapped independent jobs (guide §2.6): the norms side (touched
    // buckets, evicted-ledger delta, swap) and the postings side (touched
    // buckets, swap) read and replace DIFFERENT tables; both batch frames
    // and `ids` are checkpointed above, so neither side's plan can see
    // the other's swap. The eviction delta still runs strictly before the
    // norms swap (same thread); the token fold still runs after BOTH
    // swaps — `Overlap.jobs` joins every thread before returning, and a
    // crash mid-either-swap leaves the token behind the data, the same
    // conservative direction the sequential order had.
    var removed: (Long, BigInt, BigInt) = null
    Overlap.jobs(
      () => {
        val pbk = postingsWithBucket()
        val newB = incP.select(col("term_bucket")).distinct()
          .collect().map(_.getInt(0))
        // a broad-vocabulary batch (e.g. whole re-posted documents)
        // touches every bucket by construction — the covered-partitions
        // check makes that case pay zero lookup cost; the scan only runs
        // for term-narrow batches, where it is also what makes the
        // rewrite narrow
        val oldB =
          if (existingParts("postings", "term_bucket").subsetOf(newB.toSet))
            Array.empty[Int]
          else pbk.select(col("term_bucket"), col("id"))
            .join(ids, Seq("id"), "left_semi")
            .select(col("term_bucket")).distinct().collect()
            .map(_.getInt(0))
        val pTouched = (newB ++ oldB).distinct.sorted
        swapPartitions("postings", "term_bucket", pTouched.toIndexedSeq,
          postingSchema,
          pbk.where(col("term_bucket").isin(pTouched.map(Integer.valueOf): _*))
            .join(ids, Seq("id"), "left_anti")
            .unionByName(incP)
            .transform(clusteredFor(_, "term_bucket", col("term"),
              col("id"))))
      },
      () => {
        val nTouched = ids
          .select(nBucket(col("id"), liveBands("norms")).as("id_bucket"))
          .distinct().collect().map(_.getInt(0)).sorted
        val nb = normsWithBucket()
        // evicted docs' token terms from the norm ledger, bucket-pruned —
        // overlapped with this side's staged write (r18: both read the
        // same pre-swap buckets; joined before any rename)
        val removedT = Overlap.future(deltaOf(
          nb.where(col("id_bucket").isin(nTouched.map(Integer.valueOf): _*))
            .join(ids, Seq("id"), "left_semi"), col("fp")))
        if (nTouched.nonEmpty) {
          val tmp = Overlap.guarding(removedT)(
            swapStage("norms", "id_bucket", normSchema,
              nb.where(col("id_bucket")
                  .isin(nTouched.map(Integer.valueOf): _*))
                .join(ids, Seq("id"), "left_anti")
                .unionByName(incN)
                .transform(clusteredFor(_, "id_bucket", col("id"),
                  col("id")))))
          removed = removedT()
          swapCommit("norms", "id_bucket", nTouched.toIndexedSeq, tmp)
        } else removed = removedT()
      })
    foldToken(added, removed)
  }

  /** O(batch) ingest for GENUINELY-NEW doc ids ([[VectorIndex.
    * appendPostings]]' contract for the text store — and the store where
    * it matters most: a broad-vocabulary batch touches every term
    * bucket, so the keyed [[upsert]] degenerates to a full rewrite by
    * construction, while this append writes exactly the batch's rows).
    * BOTH tables' files and the token publish under ONE commit marker
    * ([[IndexStore.atomicAppend]]) — a crash can never land the norms
    * without the postings (the pre-round-17 two-append window), or a
    * prefix of a doc's posting files, or the rows without the token; the
    * retry discipline is the caller's O(1) token check, with no
    * presence anti-join over either table. Re-posted docs must go
    * through [[upsert]] for eviction. */
  def appendDocs(postings: DataFrame, norms: DataFrame): Unit =
    withLease("appendDocs") {
      val incP = postings
        .select(col("term"), col("id"), col("df"), col("tf"), col("w"))
        .withColumn("term_bucket",
          tBucket(col("term"), liveBands("postings")))
        .localCheckpoint(true)
      val incN = norms.select(col("id"), col("n2"), col("fp"))
        .withColumn("id_bucket", nBucket(col("id"), liveBands("norms")))
        .localCheckpoint(true)
      atomicAppend(
        Seq(
          ("norms", "id_bucket",
            clusteredFor(incN, "id_bucket", col("id"), col("id")),
            normSchema),
          ("postings", "term_bucket",
            clusteredFor(incP, "term_bucket", col("term"), col("id")),
            postingSchema)),
        deltaOf(incN, col("fp")))
    }

  /** [[VectorIndex.compactPostings]] for the text store: fold
    * append-accumulated files in BOTH tables back into the clustered
    * layout — every live bucket by default, only buckets at the
    * `minFiles` fragmentation threshold when given. */
  def compact(minFiles: Int = 1): Unit = withLease("compact") {
    // Overlapped independent jobs (guide §2.6): the two folds read and
    // swap DIFFERENT tables (each side's content plan reads only its own
    // table), so they share no state beyond the lease held here.
    Overlap.jobs(
      () => {
        val pParts = fragmentedParts("postings", "term_bucket", minFiles)
        if (pParts.nonEmpty)
          swapPartitions("postings", "term_bucket", pParts.toIndexedSeq,
            postingSchema,
            clusteredFor(
              postingsWithBucket()
                .where(col("term_bucket")
                  .isin(pParts.map(Integer.valueOf): _*)),
              "term_bucket", col("term"), col("id")))
      },
      () => {
        val nParts = fragmentedParts("norms", "id_bucket", minFiles)
        if (nParts.nonEmpty)
          swapPartitions("norms", "id_bucket", nParts.toIndexedSeq,
            normSchema,
            clusteredFor(
              normsWithBucket()
                .where(col("id_bucket").isin(nParts.map(Integer.valueOf): _*)),
              "id_bucket", col("id"), col("id")))
      })
  }

  /** Remove documents from the index — the text-side forget path: drop
    * every posting row of `ids` (wherever their terms hashed — found by
    * an (id, bucket)-only column scan) and their norm rows (buckets
    * derived from the ids directly). Physically gone, not tombstoned: a
    * forgotten doc can never be a search candidate. Per-term df values on
    * SURVIVING rows keep their build-time counts (the stale-df contract,
    * same as ingest — df drift is absorbed at the next full rebuild).
    * Absent ids are a no-op, so the call is idempotent. */
  def delete(ids0: DataFrame): Unit = withLease("delete") {
    val ids = ids0.select(col("id")).distinct().localCheckpoint(true)
    // Overlapped independent jobs (guide §2.6; the [[upsert]] rationale):
    // postings side and norms side touch different tables; the ledger
    // delta still runs strictly before the norms swap, the token fold
    // after both sides joined.
    var removed: (Long, BigInt, BigInt) = null
    Overlap.jobs(
      () => {
        val pbk = postingsWithBucket()
        val pTouched = pbk.select(col("term_bucket"), col("id"))
          .join(ids, Seq("id"), "left_semi")
          .select(col("term_bucket")).distinct().collect()
          .map(_.getInt(0)).sorted
        swapPartitions("postings", "term_bucket", pTouched.toIndexedSeq,
          postingSchema,
          pbk.where(col("term_bucket").isin(pTouched.map(Integer.valueOf): _*))
            .join(ids, Seq("id"), "left_anti")
            .transform(clusteredFor(_, "term_bucket", col("term"),
              col("id"))))
      },
      () => {
        val nTouched = ids
          .select(nBucket(col("id"), liveBands("norms")).as("id_bucket"))
          .distinct().collect().map(_.getInt(0)).sorted
        val nb = normsWithBucket()
        // forgotten docs' token terms from the ledger — overlapped with
        // this side's staged write, joined before any rename (r18)
        val removedT = Overlap.future(deltaOf(
          nb.where(col("id_bucket").isin(nTouched.map(Integer.valueOf): _*))
            .join(ids, Seq("id"), "left_semi"), col("fp")))
        if (nTouched.nonEmpty) {
          val tmp = Overlap.guarding(removedT)(
            swapStage("norms", "id_bucket", normSchema,
              nb.where(col("id_bucket")
                  .isin(nTouched.map(Integer.valueOf): _*))
                .join(ids, Seq("id"), "left_anti")
                .transform(clusteredFor(_, "id_bucket", col("id"),
                  col("id")))))
          removed = removedT()
          swapCommit("norms", "id_bucket", nTouched.toIndexedSeq, tmp)
        } else removed = removedT()
      })
    foldToken((0L, BigInt(0), BigInt(0)), removed)
  }
}

object PqIndex {
  /** Physical code partitions (`cid_band = cid mod CodeBands`) — the
    * [[VectorIndex.PostingBands]] discipline for the compressed store. */
  val CodeBands = 16
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
  *   - `codes/cid_band=N/` (cid, id, s, code) — one row per
  *     (vector, subspace), directory-partitioned on cid mod
  *     [[PqIndex.CodeBands]] and cid-sorted within files, so searches
  *     prune to probed cells and keyed maintenance rewrites only touched
  *     bands.
  */
final class PqIndex(spark: SparkSession, root: String,
                    val nBands: Int = PqIndex.CodeBands)
    extends IndexStore(spark, root) {
  override protected def configuredBands: Int = nBands

  private val cellSchema = StructType.fromDDL(
    "cid BIGINT, cv ARRAY<BIGINT>")
  private val codebookSchema = StructType.fromDDL(
    "s INT, ccid BIGINT, csub ARRAY<BIGINT>")
  // fp = xxhash64(id, raw vector), set ONLY on the s = 0 row of each id
  // (null elsewhere — RLE-cheap): the per-VECTOR fingerprint term the
  // covered-corpus token folds; raw vectors never enter this store, so
  // the hash must be computed at encode time and ride the codes
  private val codeSchema = StructType.fromDDL(
    "cid BIGINT, id BIGINT, s INT, code BIGINT, fp BIGINT")

  private def band(c: Column, n: Int): Column =
    pmod(c, lit(n.toLong)).cast("int")

  def readCells(): DataFrame = read("cells", cellSchema)
  def readCodebooks(): DataFrame = read("codebooks", codebookSchema)
  def readCodes(): DataFrame = codesWithBand().drop("cid_band")

  private def codesWithBand(): DataFrame =
    readPartitioned("codes", "cid_band", codeSchema)

  def writeIndex(cells: DataFrame, codebooks: DataFrame, codes: DataFrame,
                 meta: => String): Unit = withLease("writeIndex") {
    clearMeta()
    // Overlapped independent jobs (guide §2.6; the
    // [[VectorIndex.writeIndex]] rationale): three different directories,
    // inputs checkpointed by the build, token fold reads no table;
    // _meta/_token land only after every swap finished.
    val tok = Overlap.future(meta)
    // joining: the fold must not outlive the lease if a swap fails
    val m = Overlap.joining(tok)(Overlap.jobs(
      () => swapIn("codes",
        codes.withColumn("cid_band", band(col("cid"), configuredBands))
          .transform(clusteredFor(_, "cid_band", col("cid"), col("id"))),
        withPart(codeSchema, "cid_band"), partitionBy = Some("cid_band")),
      () => swapIn("cells", cells, cellSchema),
      () => swapIn("codebooks", codebooks, codebookSchema)))
    publishToken(m)
    publishMeta(m)
  }

  /** Keyed code ingest: upsert `incoming` (cid, id, s, code) rows by
    * vector id — a re-ingested id's old code rows are evicted wherever
    * they lived (its vector may have moved cells). The
    * [[VectorIndex.upsertPostings]] discipline: only the batch's bands ∪
    * the bands holding prior rows of its ids are rewritten. `_meta`
    * untouched — additive extension over the base build's grid and
    * codebooks — while the covered-corpus `_token` folds the per-vector
    * terms riding the s = 0 code rows. */
  def upsertCodes(incoming: DataFrame): Unit =
    withLease("upsertCodes") {
    val inc = incoming
      .select(col("cid"), col("id"), col("s"), col("code"), col("fp"))
      .withColumn("cid_band", band(col("cid"), liveBands("codes")))
      .localCheckpoint(true)
    val ids = inc.select(col("id")).distinct()
    val cb = codesWithBand()
    val newBands = inc.select(col("cid_band")).distinct()
      .collect().map(_.getInt(0))
    val oldBands =
      if (existingParts("codes", "cid_band").subsetOf(newBands.toSet))
        Array.empty[Int]
      else cb.select(col("cid_band"), col("id"))
        .join(ids, Seq("id"), "left_semi")
        .select(col("cid_band")).distinct().collect().map(_.getInt(0))
    val touched = (newBands ++ oldBands).distinct.sorted
    // per-VECTOR token terms live on the s = 0 rows. Deltas overlapped
    // with the staged write (r18 — the upsertPostings rationale: all
    // three jobs read pre-swap state; joined before any rename).
    val removedT = Overlap.future(deltaOf(
      cb.where(col("cid_band").isin(touched.map(Integer.valueOf): _*))
        .where(col("s") === 0)
        .join(ids, Seq("id"), "left_semi"), col("fp")))
    val addedT = Overlap.future(
      deltaOf(inc.where(col("s") === 0), col("fp")))
    if (touched.nonEmpty) {
      val tmp = Overlap.guarding(removedT, addedT)(
        swapStage("codes", "cid_band", codeSchema,
          cb.where(col("cid_band").isin(touched.map(Integer.valueOf): _*))
            .join(ids, Seq("id"), "left_anti")
            .unionByName(inc)
            .transform(clusteredFor(_, "cid_band", col("cid"), col("id")))))
      val (removed, added) = (removedT(), addedT())
      swapCommit("codes", "cid_band", touched.toIndexedSeq, tmp)
      foldToken(added, removed)
    } else foldToken(addedT(), removedT())
  }

  /** O(batch) code ingest for GENUINELY-NEW ids ([[VectorIndex.
    * appendPostings]]' contract for the compressed store); re-encoded
    * existing ids must go through [[upsertCodes]] for eviction. Files
    * and token publish under ONE commit marker ([[IndexStore.
    * atomicAppend]]): an id's m subspace rows can straddle a writer
    * file boundary, and the marker's roll-forward is what guarantees a
    * crash can never strand a prefix of them — the retry discipline is
    * the caller's O(1) token check, with no (id, s) presence scan over
    * the code rows. */
  def appendCodes(incoming: DataFrame): Unit =
    withLease("appendCodes") {
      // materialized: consumed by the staged file write AND the delta
      val inc = incoming
        .select(col("cid"), col("id"), col("s"), col("code"), col("fp"))
        .withColumn("cid_band", band(col("cid"), liveBands("codes")))
        .localCheckpoint(true)
      atomicAppend(
        Seq(("codes", "cid_band",
          clusteredFor(inc, "cid_band", col("cid"), col("id")),
          codeSchema)),
        deltaOf(inc.where(col("s") === 0), col("fp")))
    }

  /** [[VectorIndex.compactPostings]] for the code rows. */
  def compactCodes(minFiles: Int = 1): Unit =
    withLease("compactCodes") {
    val parts = fragmentedParts("codes", "cid_band", minFiles)
    if (parts.isEmpty) return
    swapPartitions("codes", "cid_band", parts.toIndexedSeq, codeSchema,
      clusteredFor(
        codesWithBand()
          .where(col("cid_band").isin(parts.map(Integer.valueOf): _*)),
        "cid_band", col("cid"), col("id")))
  }

  /** Remove `ids` from the stored code rows — the PQ forget path. No
    * re-encode: codes are per-vector, so dropping a vector's m rows is
    * complete removal (cells and codebooks are summaries, untouched
    * between rebuilds). Only bands holding doomed rows are rewritten;
    * absent ids are a no-op, so the call is idempotent. */
  def deleteCodes(ids0: DataFrame): Unit =
    withLease("deleteCodes") {
    val ids = ids0.select(col("id")).distinct().localCheckpoint(true)
    val cb = codesWithBand()
    val touched = cb.select(col("cid_band"), col("id"))
      .join(ids, Seq("id"), "left_semi")
      .select(col("cid_band")).distinct().collect().map(_.getInt(0)).sorted
    // doomed rows' terms overlapped with the staged write (pre-swap
    // read-read; joined before any rename — the deletePostings shape)
    val removedT = Overlap.future(deltaOf(
      cb.where(col("cid_band").isin(touched.map(Integer.valueOf): _*))
        .where(col("s") === 0)
        .join(ids, Seq("id"), "left_semi"), col("fp")))
    if (touched.nonEmpty) {
      val tmp = Overlap.guarding(removedT)(
        swapStage("codes", "cid_band", codeSchema,
          cb.where(col("cid_band").isin(touched.map(Integer.valueOf): _*))
            .join(ids, Seq("id"), "left_anti")
            .transform(clusteredFor(_, "cid_band", col("cid"), col("id")))))
      val removed = removedT()
      swapCommit("codes", "cid_band", touched.toIndexedSeq, tmp)
      foldToken((0L, BigInt(0), BigInt(0)), removed)
    } else foldToken((0L, BigInt(0), BigInt(0)), removedT())
  }
}
