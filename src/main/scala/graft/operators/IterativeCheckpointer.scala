package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage and lineage manager for iterative DataFrame algorithms — the
  * shared machinery behind [[Dedup.connectedComponents]] and [[Graphs.bfs]]
  * (extracted round 12 so BFS gets CC's reliable mode instead of a private
  * re-implementation).
  *
  * Two concerns, one seam:
  *
  *   - '''Lineage.''' Every round's frame materializes through an EAGER
  *     `localCheckpoint`, truncating the plan to a LogicalRDD leaf.
  *     `persist()` alone is NOT enough for a loop: the analyzer and AQE
  *     re-optimization still walk the full lineage, which grows
  *     ~(references/round)^rounds — q119's 5-references/round × 4 rounds
  *     OOM'd an 8 GiB driver during ANALYSIS on 15k rows (NOTES_r10).
  *   - '''Durability.''' localCheckpoint blocks live in executor storage;
  *     losing an executor between rounds kills the job (no lineage left to
  *     recompute from). In reliable mode (`checkpointDir` set) every
  *     `reliableInterval`-th [[materialize]] — and every [[promote]]d seed
  *     frame — is re-written through `Dataset.checkpoint` onto the
  *     checkpoint dir (HDFS/S3 on a cluster), so recovery replays from the
  *     last reliable round.
  *
  * Both checkpoint calls follow the LOCAL-FIRST discipline: a direct
  * `Dataset.checkpoint(eager)` on an unpersisted plan computes it TWICE
  * (count job + checkpoint-write job) and would double-fire any `observe`
  * metrics riding the plan; materializing locally first makes the reliable
  * write a cheap re-read of already-persisted blocks.
  *
  * [[free]] reclaims a superseded frame's blocks AND its reliable
  * checkpoint files — Spark's ContextCleaner does not (cleanCheckpoints
  * defaults off), and leaving one frame copy per reliable round on
  * cluster storage is exactly the leak the local path avoids.
  */
private[graft] final class IterativeCheckpointer(
    spark: SparkSession,
    val checkpointDir: Option[String],
    reliableInterval: Int) {

  require(reliableInterval >= 1, s"reliableInterval $reliableInterval < 1")

  def isReliableRound(r: Int): Boolean =
    checkpointDir.isDefined && r % reliableInterval == 0

  /** The persisted RDD behind a (local)checkpointed Dataset. */
  private def persistedRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  /** Reclaim a frame produced by [[materialize]]/[[promote]]/[[stage]]:
    * unpersist its blocks and delete its reliable checkpoint files. */
  def free(df: DataFrame): Unit = persistedRdd(df).foreach { rdd =>
    rdd.unpersist(blocking = false)
    rdd.getCheckpointFile.foreach { f =>
      val path = new org.apache.hadoop.fs.Path(f)
      path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(path, true)
    }
  }

  /** Materialize round `round`'s frame: eager localCheckpoint (the ONE
    * action any `observe` metrics ride on), then on reliable rounds a
    * durable re-write of the already-persisted copy. */
  def materialize(df: DataFrame, round: Int): DataFrame = {
    val local = df.localCheckpoint(eager = true)
    if (isReliableRound(round)) {
      val reliable = local.checkpoint(eager = true)
      free(local) // data now lives in the checkpoint dir
      reliable
    } else local
  }

  /** Durably promote an already-localCheckpointed frame (no-op outside
    * reliable mode). For long-lived seed frames: in reliable mode EVERY
    * frame the loop re-reads must be file-backed, or storage loss kills
    * the loop through its seeds rather than its rounds. */
  def promote(local: DataFrame): DataFrame =
    if (checkpointDir.isDefined) {
      val reliable = local.checkpoint(eager = true)
      free(local)
      reliable
    } else local

  /** localCheckpoint + [[promote]]: one call for seed/long-lived frames. */
  def stage(df: DataFrame): DataFrame = promote(df.localCheckpoint(eager = true))
}

private[graft] object IterativeCheckpointer {

  /** Run `body` with the SparkContext checkpoint dir set to `dir`,
    * restoring the caller's dir on every exit — setCheckpointDir mutates
    * SESSION-GLOBAL state, and an unrelated `Dataset.checkpoint` elsewhere
    * in the application must not silently land under (and get swept with)
    * an operator's directory. When no prior dir existed the new dir stays
    * set (Spark has no public unset); concurrent runs with different dirs
    * on one SparkContext still race — use one dir. */
  def withCheckpointDir[A](spark: SparkSession, dir: Option[String])(body: => A): A = {
    val sc = spark.sparkContext
    val prev = sc.getCheckpointDir
    dir.foreach(sc.setCheckpointDir)
    try body
    finally if (dir.isDefined) prev.foreach(sc.setCheckpointDir)
  }
}
