package graft

import org.apache.spark.sql.functions._

import graft.operators.Graphs

/** [[Graphs.bfs]] — correctness vs hand-computed distances, the delta-only
  * checkpoint plan shape, early exhaustion, and reliable-mode durability
  * (the CC eviction-injection contract applied to BFS). */
class GraphsSpec extends SparkSpec {
  import sqlImplicits._

  // path 0-1-2-3-4-5 plus a triangle 10-11-12 and an unreachable pair
  private def pathGraph = (
    (0L until 5L).map(i => (i, i + 1)) ++
      Seq((10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
  ).toDF("id1", "id2")

  private def distances(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("bfs: first-reach depths from multiple seeds, unreached absent") {
    val got = distances(Graphs.bfs(pathGraph, Seq(0L, 10L).toDF("id"), 3))
    assert(got == Map(
      0L -> 0, 10L -> 0,            // seeds
      1L -> 1, 11L -> 1, 12L -> 1,  // hop 1 (12 via the triangle chord)
      2L -> 2,
      3L -> 3))                     // 4, 5 beyond maxHops; 20, 21 unreachable
  }

  test("bfs: result plan is a union of per-round delta leaves only") {
    // maxHops rounds all produce nodes here, so the returned frame must be
    // exactly maxHops+1 LogicalRDD leaves — a full-visited-set
    // re-checkpoint per round (the round-11 q129 shape) would collapse it
    // to one leaf and waste O(V·rounds) materialization
    val out = Graphs.bfs(pathGraph, Seq(0L).toDF("id"), 3)
    val leaves = out.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr
    }
    assert(leaves.size == 4, s"expected 4 delta leaves, got ${leaves.size}")
    assert(distances(out) == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3))
  }

  test("bfs: exhausted frontier exits early without empty deltas") {
    val out = Graphs.bfs(pathGraph, Seq(20L).toDF("id"), 10)
    assert(distances(out) == Map(20L -> 0, 21L -> 1))
    val leaves = out.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr
    }
    assert(leaves.size == 2, "empty rounds must not append delta leaves")
  }

  test("bfsReleasable: release() reclaims every reliable delta file after use") {
    // ADVICE r12: repeated reliable-mode invocations against one dir must
    // not accumulate per-invocation delta files for the app's lifetime —
    // the release handle deletes every rdd-* checkpoint dir once the
    // caller has consumed the lazy union
    val dir = tmpDir("bfs-rel")
    def rddDirs: Seq[java.nio.file.Path] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("rdd-")).toSeq
    }
    val (out, release) = Graphs.bfsReleasable(
      pathGraph, Seq(0L).toDF("id"), 3, checkpointDir = Some(dir))
    assert(distances(out) == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3))
    assert(rddDirs.nonEmpty, "deltas must be file-backed while the result is live")
    release()
    assert(rddDirs.isEmpty,
      s"release() left checkpoint files: ${rddDirs.mkString(", ")}")
  }

  test("bfs: reliable mode survives loss of every executor-local block") {
    // unpersist(blocking) on a lineage-truncated localCheckpoint IS block
    // loss; in reliable mode every delta and the adjacency are file-backed,
    // so the traversal and its result must survive anyway
    val evict = (_: Int) => spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val got = Graphs.bfs(pathGraph, Seq(0L, 10L).toDF("id"), 3,
      checkpointDir = Some(tmpDir("bfs-ckpt")), onRoundEnd = evict)
    assert(distances(got) == Map(
      0L -> 0, 10L -> 0, 1L -> 1, 11L -> 1, 12L -> 1, 2L -> 2, 3L -> 3))

    // contrast: the local-only path cannot recover from the same loss
    intercept[org.apache.spark.SparkException] {
      Graphs.bfs(pathGraph, Seq(0L).toDF("id"), 3, onRoundEnd = evict)
        .collect()
    }
  }
}
