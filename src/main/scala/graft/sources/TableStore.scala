package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.model.Schemas

/** Parquet-directory table catalog — the engine's replacement for the
  * reference's SQLite file (reference tasks.py:39-128 SQLiteExecuteMany,
  * sql.py DDL).
  *
  * Layout: `<root>/<TableName>/` parquet dirs, one per Schemas.tables entry.
  * Semantics implemented here (SURVEY §2.9):
  *   - M5 `CREATE TABLE IF NOT EXISTS` → [[init]] (no-op when dir exists)
  *   - M1/M2 `INSERT OR REPLACE` keyed upsert → [[upsert]] (left_anti on the
  *     PK ∪ new, then atomic directory swap — the one genuinely custom
  *     physical piece, SURVEY §4.3)
  *   - M3 child-table reload → [[replaceDays]] (delete-matching-(userid,date)
  *     then insert: the reference's *intent*; its literal append-on-rerun
  *     duplicates child rows — documented divergence, SURVEY §7.5 item 5)
  *   - M4 FK ON DELETE CASCADE → [[cascadeDelete]] (anti-join of every child
  *     against the deleted parent keys; opt-in like PRAGMA foreign_keys)
  *
  * At scale: upsert rewrites only the table it targets; with a
  * date-partitioned layout the anti-join prunes to touched partitions
  * (dynamic partition overwrite is the production variant of the same plan).
  */
final class TableStore(spark: SparkSession, root: String,
                       partitionByDate: Boolean = false) {

  private def path(table: String) = s"$root/$table"

  /** Hive-style partition spec: every table carries (userid, date); laying
    * the directory out by date turns the reference's point lookups
    * (`WHERE userid=? AND date=?`, S4/S5) and the report's date-range scan
    * into partition-pruned reads — the difference between touching a few
    * directories and scanning the table at 100 TB. Off by default so tiny
    * fixtures don't pay per-day directory overhead. */
  private def partitionCols(table: String): Seq[String] =
    if (partitionByDate) Seq("date") else Seq.empty

  private def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(table: String) = fs.exists(new Path(path(table)))

  /** Idempotent create of every declared table (M5). Also sweeps staging
    * leftovers — a run killed between [[stage]] and its cleanup orphans a
    * `_staging/<uuid>` diff copy that nothing would ever delete — and
    * recovers interrupted swaps (single writer per store — the same
    * assumption [[swapIn]] makes). */
  def init(): Unit = {
    fs.delete(new Path(s"$root/_staging"), true)
    Schemas.tables.keys.foreach(initTable)
  }

  /** Crash recovery for [[swapIn]]'s two-rename window: a kill between
    * `dest→old` and `tmp→dest` leaves the table ABSENT with a complete
    * `.old-*` beside it — without recovery, `read()` would silently return
    * an empty table and the next diff would treat every row as new. The
    * `.tmp-*` (new data, possibly incomplete) is discarded: the swap never
    * completed, so the pre-swap state is the durable truth. Leftover tmp/old
    * dirs from crashes AFTER a completed swap are plain garbage — swept. */
  private def recoverSwap(table: String): Unit = {
    val glob = fs.globStatus(new Path(path(table) + ".{old,tmp}-*"))
    if (glob == null || glob.isEmpty) return
    if (!exists(table)) {
      val olds = glob.filter(_.getPath.getName.contains(".old-"))
      if (olds.nonEmpty) {
        // at most one .old can exist (single writer, deleted per swap);
        // rename failure returns false — surface it, the .old is the only
        // durable copy of the table
        require(fs.rename(olds.head.getPath, new Path(path(table))),
          s"recoverSwap($table): restoring ${olds.head.getPath} failed")
      }
    }
    fs.globStatus(new Path(path(table) + ".{old,tmp}-*"))
      .foreach(st => fs.delete(st.getPath, true))
  }

  def initTable(table: String): Unit = {
    require(Schemas.tables.contains(table), s"unknown table $table")
    recoverSwap(table)
    if (!exists(table)) {
      val (schema, _) = Schemas.tables(table)
      val empty = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      write(table, empty, mode = "errorifexists", dest = path(table))
    }
  }

  /** Read a table; empty (typed) result when uninitialized. Recovery runs
    * first: without it, a read (or the upsert/replaceDays built on it)
    * issued after a crashed swap would see an absent table, treat it as
    * empty, and the next sweep would discard the stranded .old copy —
    * turning a recoverable crash into permanent loss. */
  def read(table: String): DataFrame = {
    val (schema, _) = Schemas.tables(table)
    recoverSwap(table)
    if (exists(table)) spark.read.schema(schema).parquet(path(table))
    else spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
  }

  /** S4 literal point-lookup API (reference tasks.py:657-680
    * `mfp_select_raw_days`): for `username` and an explicit date list,
    * exactly one row PER REQUESTED DATE in list order — (userid, date,
    * rawdaydata), with NULL rawdaydata where the store has no row (the
    * reference appends `(username, date, None)` for a missing fetchone).
    * Duplicate dates in the request yield duplicate rows, like the
    * reference's per-date loop.
    *
    * Shape: the reference runs one SELECT per date; here the date list is
    * a literal relation left-outer-joined over ONE scan. The userid
    * predicate pushes into the parquet scan, and with the date-partitioned
    * layout the tiny preserved side prunes the null-producing fact side's
    * partitions (DPP — Catalyst's canPruneRight covers LeftOuter — or the
    * planner's static pruning; PartitionedStoreSpec pins that the scan
    * does not read all partitions), so the lookup touches only the
    * requested days at 100 TB — the same left-outer + null-for-missing
    * semantics q05 oracle-checks. */
  def selectRawDays(username: String,
                    dates: Seq[java.time.LocalDate]): DataFrame = {
    import spark.implicits._
    val want = dates.map(java.sql.Date.valueOf)
      .zipWithIndex.toDF("date", "ord")
    val have = read("RawDayData").where(col("userid") === username)
    want.join(have, Seq("date"), "left_outer")
      .orderBy(col("ord"))
      .select(org.apache.spark.sql.functions.lit(username).as("userid"),
        col("date"), col("rawdaydata"))
  }

  /** Plain append (reference M3 literal semantics). */
  def append(table: String, df: DataFrame): Unit = {
    initTable(table)
    write(table, align(table, df), mode = "append", dest = path(table))
  }

  private def write(table: String, df: DataFrame, mode: String,
                    dest: String): Unit = {
    val w = df.write.mode(mode)
    val parts = partitionCols(table)
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(dest)
  }

  /** Keyed upsert (M1/M2): rows matching an incoming PK are replaced, all
    * others survive. Write-new + atomic swap so readers never see a partial
    * table. Duplicate PKs WITHIN `incoming` collapse to one row (which one
    * is not defined — a DataFrame has no row order for SQLite's
    * last-INSERT-wins to refer to); without the collapse the left_anti
    * only removes OLD rows and both duplicates would land in the table,
    * breaking the one-row-per-PK invariant every read/diff relies on. */
  def upsert(table: String, incoming: DataFrame): Unit = {
    val keys = Schemas.tables(table)._2
    require(keys.nonEmpty, s"$table has no PK; use append/replaceDays")
    val deduped = incoming.dropDuplicates(keys)
    val kept = read(table).join(
      deduped.select(keys.map(col): _*), keys, "left_anti")
    swapIn(table, kept.unionByName(align(table, deduped)))
  }

  /** Delete-then-insert by (userid, date) — the intent-faithful child-table
    * reload (M3): re-running a changed day replaces its rows instead of
    * appending duplicates. */
  def replaceDays(table: String, incoming: DataFrame): Unit = {
    val dayKeys = Seq("userid", "date")
    val kept = read(table).join(
      incoming.select(dayKeys.map(col): _*).distinct(), dayKeys, "left_anti")
    swapIn(table, kept.unionByName(align(table, incoming)))
  }

  /** Cascade delete (M4): remove the parent rows and every child row whose
    * (userid, date) matches — explicit version of SQLite's FK cascade,
    * applied only when enforce=true (mirrors PRAGMA foreign_keys). */
  def cascadeDelete(parentKeys: DataFrame, enforce: Boolean = true): Unit = {
    val keys = Seq("userid", "date")
    // STAGED, not lazy: the natural call passes keys derived from the
    // store (read("RawDayData").where(...)), and the first swapIn deletes
    // the directory that frame reads — each child join would then
    // re-evaluate the victims against the post-delete parent, find
    // nothing, and silently leave every orphan in place
    val (victims, cleanup) =
      stage(parentKeys.select(keys.map(col): _*).distinct())
    try {
      swapIn("RawDayData", read("RawDayData").join(victims, keys, "left_anti"))
      if (enforce) {
        Schemas.tables.keys.filter(_ != "RawDayData").foreach { child =>
          swapIn(child, read(child).join(victims, keys, "left_anti"))
        }
      }
    } finally cleanup()
  }

  /** Durably materialize `df` into a staging parquet dir under the store
    * root and hand back (re-read frame, cleanup). Required before mutating a
    * table the frame derives from: [[upsert]]'s atomic swap DELETES the source
    * directory, so a merely `persist()`ed frame whose cache is evicted would
    * recompute against the already-mutated store — an empty diff and silently
    * missing child rows (reference semantics: flows.py:66-74 re-parses the
    * in-memory diff, never the DB). The staged copy has no lineage back to
    * the store and, unlike localCheckpoint, survives executor loss. */
  def stage(df: DataFrame): (DataFrame, () => Unit) = {
    val dir = new Path(s"$root/_staging/${java.util.UUID.randomUUID()}")
    df.write.mode("errorifexists").parquet(dir.toString)
    val staged = spark.read.schema(df.schema).parquet(dir.toString)
    (staged, () => { fs.delete(dir, true); () })
  }

  /** Small-file compaction: rewrite the table into `targetPartitions`
    * output files (incremental upserts accumulate per-batch files; compacted
    * scans restore full parquet row-group efficiency). Same atomic-swap
    * path as upsert, so readers never see a partial table. */
  def compact(table: String, targetPartitions: Int = 1): Unit =
    swapIn(table, read(table).repartition(targetPartitions))

  /** Project/cast an incoming frame onto the declared schema (column order
    * and types pinned by the DDL port). */
  private def align(table: String, df: DataFrame): DataFrame = {
    val (schema, _) = Schemas.tables(table)
    df.select(schema.fields.map(f => col(f.name).cast(f.dataType)): _*)
  }

  /** Materialize `df` into a fresh dir, then swap it in (write-temp +
    * rename; rename is atomic on HDFS-like filesystems). */
  private def swapIn(table: String, df: DataFrame): Unit = {
    val dest = new Path(path(table))
    val tmp = new Path(path(table) + ".tmp-" + java.util.UUID.randomUUID())
    write(table, align(table, df), mode = "errorifexists", dest = tmp.toString)
    val old = new Path(path(table) + ".old-" + java.util.UUID.randomUUID())
    // Hadoop rename reports failure by RETURNING FALSE, not throwing — an
    // unchecked failed rename here would silently no-op the upsert and the
    // next recoverSwap would garbage-collect the .tmp holding the only
    // copy of the new state
    if (fs.exists(dest)) require(fs.rename(dest, old),
      s"swapIn($table): rename $dest -> $old failed")
    require(fs.rename(tmp, dest),
      s"swapIn($table): rename $tmp -> $dest failed — pre-swap state is in $old")
    fs.delete(old, true)
  }
}
