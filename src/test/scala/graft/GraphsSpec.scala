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

  test("labelPropagation: round-r labels are r-hop neighborhood minima") {
    val nodes = Seq(0L, 1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 20L, 21L, 30L)
      .toDF("id") // 30 is isolated: in the node set, no edges
    def labels(rounds: Int): Map[Long, Long] =
      Graphs.labelPropagation(pathGraph, nodes, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(2) == Map(
      0L -> 0, 1L -> 0, 2L -> 0, 3L -> 1, 4L -> 2, 5L -> 3, // path: min in 2 hops
      10L -> 10, 11L -> 10, 12L -> 10,                      // triangle collapses
      20L -> 20, 21L -> 20,
      30L -> 30))                                           // isolated keeps own
    // 5 rounds: the whole path reaches 0 — bounded LP at convergence IS CC
    assert(labels(5).view.filterKeys(_ <= 5L).toMap ==
      (0L to 5L).map(_ -> 0L).toMap)
  }

  test("randomWalks: trajectories chain along edges, deterministically") {
    val seeds = Seq(0L, 20L, 30L).toDF("id")
    def run() = Graphs.randomWalks(pathGraph, seeds, steps = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val got = run()
    // deterministic: identical trajectories on a re-run
    assert(got.toSeq == run().toSeq)
    // step 0 is exactly the seed set; isolated seed 30 ends there
    assert(got.filter(_._2 == 0).map(_._3).toSet == Set(0L, 20L, 30L))
    assert(got.filter(_._1 == 30L).toSeq == Seq((30L, 0, 30L)))
    // walk 20 has one neighbor each way: must oscillate 20,21,20,21
    assert(got.filter(_._1 == 20L).map(_._3).toSeq == Seq(20L, 21L, 20L, 21L))
    // every consecutive step pair is a real edge of the symmetrized graph
    val sym = pathGraph.collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet
    got.groupBy(_._1).values.foreach { t =>
      val path = t.sortBy(_._2).map(_._3)
      path.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(sym((a, b)), s"non-edge hop $a -> $b")
      }
    }
  }

  test("labelPropagation/randomWalks: reliable mode survives block loss") {
    // the CC/BFS eviction-injection contract applied to the round-13
    // iterative operators: file-backed rounds survive losing every
    // executor-local block between operations; checkpointDir is threaded
    // through the same IterativeCheckpointer, so one spec per operator
    // keeps the property from silently regressing
    val evictAll = () => spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val nodes = Seq(0L, 1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 20L, 21L).toDF("id")
    val lp = Graphs.labelPropagation(pathGraph, nodes, rounds = 2,
      checkpointDir = Some(tmpDir("lp-ckpt")))
    evictAll()
    assert(lp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      .view.filterKeys(_ <= 5L).toMap ==
      Map(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 1, 4L -> 2, 5L -> 3))

    val walks = Graphs.randomWalks(pathGraph, Seq(0L, 20L).toDF("id"),
      steps = 3, checkpointDir = Some(tmpDir("rw-ckpt")))
    evictAll()
    val got = walks.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    assert(got.filter(_._1 == 20L).map(_._3).toSeq == Seq(20L, 21L, 20L, 21L))
    assert(got.count(_._1 == 0L) == 4)
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
