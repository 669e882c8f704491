package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Binned range join: must agree pair-for-pair with the O(n·m) definition
  * (inclusive bounds, negatives, empty intervals), be invariant to the bin
  * width, and plan as an equi-join — never BroadcastNestedLoop. */
class RangeJoinSpec extends SparkSpec {
  import sqlImplicits._

  test("≡ brute force on random inputs, any bin width") {
    val rnd = new scala.util.Random(17)
    val points = (1 to 200).map(i =>
      (i.toLong, rnd.nextInt(400).toLong - 200L))
    val ranges = (1 to 60).map { i =>
      val lo = rnd.nextInt(400).toLong - 200L
      (i.toLong, lo, lo + rnd.nextInt(40).toLong - 5L) // ~1/8 empty (hi<lo)
    }
    val want = (for {
      (pid, d) <- points
      (rid, lo, hi) <- ranges
      if d >= lo && d <= hi
    } yield (pid, rid)).sorted
    val pDf = points.toDF("pid", "d")
    val rDf = ranges.toDF("rid", "lo", "hi")
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.pointsInRanges(pDf, rDf, "d", "lo", "hi", w)
        .select($"pid", $"rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == want, s"binWidth=$w")
    }
  }

  test("bounds are inclusive on both ends; empty interval matches nothing") {
    val p = Seq((1L, 10L), (2L, 20L), (3L, 15L)).toDF("pid", "d")
    val r = Seq((1L, 10L, 20L), (2L, 16L, 14L)).toDF("rid", "lo", "hi")
    val got = RangeJoin.pointsInRanges(p, r, "d", "lo", "hi", 5L)
      .select($"pid", $"rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted
    assert(got.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("interval overlaps ≡ brute force, duplicate-free, any bin width") {
    val rnd = new scala.util.Random(19)
    def mk(n: Int, seedShift: Int) = (1 to n).map { i =>
      val lo = rnd.nextInt(300).toLong - 150L
      (i.toLong + seedShift, lo, lo + rnd.nextInt(30).toLong)
    }
    val a = mk(80, 0)
    val b = mk(80, 1000)
    val want = (for {
      (id1, lo1, hi1) <- a
      (id2, lo2, hi2) <- b
      if lo1 <= hi2 && lo2 <= hi1
    } yield (id1, id2)).sorted
    val aDf = a.toDF("id1", "lo1", "hi1")
    val bDf = b.toDF("id2", "lo2", "hi2")
    for (w <- Seq(1L, 9L, 100L)) {
      val got = RangeJoin
        .intervalOverlaps(aDf, bDf, "lo1", "hi1", "lo2", "hi2", w)
        .select($"id1", $"id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == want, s"binWidth=$w")
      assert(got.distinct.length == got.length, s"dups at binWidth=$w")
    }
  }

  test("plans as an equi-join on the bin — no nested loop, no cartesian") {
    val p = (1 to 500).map(i => (i.toLong, i.toLong % 97)).toDF("pid", "d")
    val r = (1 to 50).map(i => (i.toLong, i.toLong, i.toLong + 10))
      .toDF("rid", "lo", "hi")
    val df = RangeJoin.pointsInRanges(p, r, "d", "lo", "hi", 8L)
    df.write.mode("overwrite").format("noop").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }
}
