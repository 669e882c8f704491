package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** As-of join semantics: backward/forward direction, equal-time ties match
  * in both directions, tolerance nulls far matches but keeps the row. */
class AsOfSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // left rows (key 1): t = 100, 4000; right rows: t = 90, 100, 105, 5000
  private def left = Seq((1L, ts(100), 10L), (1L, ts(4000), 11L))
    .toDF("k", "t", "lid").withColumn("tb", $"lid")
  private def right = Seq((1L, ts(90), 90L), (1L, ts(100), 91L),
    (1L, ts(105), 92L), (1L, ts(5000), 93L))
    .toDF("k", "t", "rid").withColumn("tb", $"rid")

  private def run(direction: String, gap: Option[Long]): Map[Long, Any] =
    AsOf.asofJoin(left, right, "k", "t", "t", Seq("rid"), "tb",
        direction = direction, maxGapSeconds = gap)
      .select($"lid", $"asof_rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1)))
      .toMap

  test("NULL value on the matched right row stays NULL — no fall-through to older rows") {
    // merge_asof returns the NEAREST row's values as-is; a per-column
    // ignoreNulls carry would instead leak v=5 from t=1 (and, with a
    // 1-second tolerance, from outside the tolerance window). All carried
    // columns must come from the same matched row.
    val l = Seq((1L, ts(3), 30L)).toDF("k", "t", "lid").withColumn("tb", $"lid")
    val r = Seq((1L, ts(1), 1L, Some(5L)), (1L, ts(2), 2L, None))
      .toDF("k", "t", "rid", "v").withColumn("tb", $"rid")
    val row = AsOf.asofJoin(l, r, "k", "t", "t", Seq("rid", "v"), "tb")
      .select($"asof_rid", $"asof_v").collect().head
    assert(row.getLong(0) == 2L, "nearest row is t=2")
    assert(row.isNullAt(1), s"matched row's NULL must survive, got $row")

    val tol = AsOf.asofJoin(l, r, "k", "t", "t", Seq("rid", "v"), "tb",
        maxGapSeconds = Some(1L))
      .select($"asof_rid", $"asof_v").collect().head
    assert(tol.getLong(0) == 2L && tol.isNullAt(1))
  }

  test("backward: most recent at-or-before; equal time matches") {
    // t=100 ties with right 91 (not 90); t=4000 reaches back to 92
    assert(run("backward", None) == Map(10L -> 91L, 11L -> 92L))
  }

  test("forward: earliest at-or-after; equal time matches") {
    // t=100 ties with right 91 (not 105); t=4000 reaches forward to 93
    assert(run("forward", None) == Map(10L -> 91L, 11L -> 93L))
  }

  test("backward tiebreak: largest tiebreak wins among equal-time rights") {
    // pandas merge_asof backward keeps the LAST equal-time duplicate
    val l = Seq((1L, ts(250), 10L)).toDF("k", "t", "lid")
      .withColumn("tb", $"lid")
    val r = Seq((1L, ts(200), 51L), (1L, ts(200), 50L))
      .toDF("k", "t", "rid").withColumn("tb", $"rid")
    val got = AsOf.asofJoin(l, r, "k", "t", "t", Seq("rid"), "tb")
      .select($"asof_rid").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(51L))
  }

  test("forward tiebreak: smallest tiebreak wins among equal-time rights") {
    // the reversed-sort O(n) frame must preserve the ascending-path rule
    val l = Seq((1L, ts(150), 10L)).toDF("k", "t", "lid")
      .withColumn("tb", $"lid")
    val r = Seq((1L, ts(200), 51L), (1L, ts(200), 50L))
      .toDF("k", "t", "rid").withColumn("tb", $"rid")
    val got = AsOf.asofJoin(l, r, "k", "t", "t", Seq("rid"), "tb",
        direction = "forward")
      .select($"asof_rid").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(50L))
  }

  test("tolerance nulls far matches and keeps the left row") {
    // backward: 4000 - 105 = 3895 > 600 → null; 100 - 100 = 0 → match
    assert(run("backward", Some(600L)) == Map(10L -> 91L, 11L -> null))
    // forward: 5000 - 4000 = 1000 > 600 → null
    assert(run("forward", Some(600L)) == Map(10L -> 91L, 11L -> null))
  }

  test("tolerance compares at sub-second precision, not floored seconds") {
    // right row 10.5 s after the left one: a 10 s tolerance must null it —
    // unix_timestamp-based comparison floored both sides to whole seconds
    // (diff 10) and let it pass
    def tms(ms: Long) = new Timestamp(ms)
    val l = Seq((1L, tms(100000L), 10L)).toDF("k", "t", "lid")
      .withColumn("tb", $"lid")
    val r = Seq((1L, tms(110500L), 90L)).toDF("k", "t", "rid")
      .withColumn("tb", $"rid")
    def got(gap: Long): Any = {
      val row = AsOf.asofJoin(l, r, "k", "t", "t", Seq("rid"), "tb",
        direction = "forward", maxGapSeconds = Some(gap)).collect().head
      if (row.isNullAt(row.fieldIndex("asof_rid"))) null
      else row.getLong(row.fieldIndex("asof_rid"))
    }
    assert(got(10L) == null, "10.5 s gap must fail a 10 s tolerance")
    assert(got(11L) == 90L, "10.5 s gap must pass an 11 s tolerance")
  }

  test("property: both directions ≡ brute-force scan on random inputs") {
    // the union-sort-carry mechanism (and its reversed-sort forward twin)
    // against the O(n·m) definition: per left row, the nearest right row in
    // direction, smallest tiebreak on time ties, tolerance nulling far hits
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val nKeys = 3
      // a SMALL time domain (40 draws from 60 instants) plants plenty of
      // equal-time ties — including equal-time right duplicates, which the
      // two directions break differently; a sparse domain would leave the
      // duplicate-handling branch untested
      val l = (1 to 40).map { i =>
        (rnd.nextInt(nKeys).toLong, ts(rnd.nextInt(60).toLong), i.toLong) }
      val r = (1 to 40).map { i =>
        (rnd.nextInt(nKeys).toLong, ts(rnd.nextInt(60).toLong),
          (100 + i).toLong) }
      val gap = if (trial % 2 == 0) Some(15L) else None
      for (dir <- Seq("backward", "forward")) {
        def brute(k: Long, t: Timestamp): Option[Long] = {
          val cand = r.filter(x => x._1 == k &&
            (if (dir == "backward") !x._2.after(t) else !x._2.before(t)))
          if (cand.isEmpty) None
          else {
            // nearest time first; among equal-time duplicates pandas
            // merge_asof keeps the row nearest in scan order: backward →
            // LAST in (time, tiebreak) order (largest rid), forward →
            // FIRST (smallest rid)
            val best =
              if (dir == "backward")
                cand.minBy(x =>
                  (math.abs(x._2.getTime - t.getTime), -x._3))
              else
                cand.minBy(x =>
                  (math.abs(x._2.getTime - t.getTime), x._3))
            val far = gap.exists(g =>
              math.abs(best._2.getTime - t.getTime) > g * 1000L)
            if (far) None else Some(best._3)
          }
        }
        val lDf = l.toDF("k", "t", "lid").withColumn("tb", $"lid")
        val rDf = r.toDF("k", "t", "rid").withColumn("tb", $"rid")
        val got = AsOf.asofJoin(lDf, rDf, "k", "t", "t", Seq("rid"), "tb",
            direction = dir, maxGapSeconds = gap)
          .select($"k", $"t", $"lid", $"asof_rid").collect()
          .map(row => row.getLong(2) ->
            (if (row.isNullAt(3)) None else Some(row.getLong(3)))).toMap
        assert(got.size == l.size, s"$dir trial $trial: row count")
        l.foreach { case (k, t, lid) =>
          assert(got(lid) == brute(k, t),
            s"$dir trial $trial lid=$lid k=$k t=$t: " +
              s"got ${got(lid)}, want ${brute(k, t)}")
        }
      }
    }
  }

  test("no matching right row yields null, row kept (outer semantics)") {
    val lonely = Seq((7L, ts(50), 20L)).toDF("k", "t", "lid")
      .withColumn("tb", $"lid")
    val got = AsOf.asofJoin(lonely, right, "k", "t", "t", Seq("rid"), "tb")
      .select($"lid", $"asof_rid").collect()
    assert(got.length == 1 && got.head.isNullAt(1))
  }
}
