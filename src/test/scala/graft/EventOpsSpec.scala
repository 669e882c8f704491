package graft

import java.sql.Timestamp

import graft.queries.Analytics

/** Event-telemetry operators: the rolling integer z-test (q96) on crafted
  * series with hand-computed windows. */
class EventOpsSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(sec: Int) = new Timestamp(sec * 1000L)

  test("rolling anomaly: spike flags, steady series and warmup don't") {
    // user 1: eight 10.00 readings then a 100.00 spike, then back to 10.00
    val rows = (1 to 8).map(i => (i.toLong, ts(i), 1L, 10.0)) ++
      Seq((9L, ts(9), 1L, 100.0), (10L, ts(10), 1L, 10.0)) ++
      // user 2: only 3 preceding rows at the 4th event — below min window
      (11 to 14).map(i => (i.toLong, ts(i), 2L, if (i == 14) 900.0 else 5.0))
    val got = Analytics.rollingAnomaly(
        rows.toDF("event_id", "ts", "user_id", "value"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // warmup: events 1-4 have fewer than 4 preceding rows
    (1L to 4L).foreach(id => assert(!got(id)._3, s"event $id"))
    // steady state: window all-10.00, value 10.00 → dev = 0, not anomalous
    (5L to 8L).foreach(id => assert(!got(id)._3, s"event $id"))
    assert(got(8L)._1 == 7L && got(8L)._2 == 7000L)
    // the spike against a zero-variance window: dev² > 0 = 9·var → flagged
    // (a zero-variance history makes ANY deviation infinite-z by design)
    assert(got(9L)._3)
    // recovery reading: window now contains the spike → variance huge
    assert(!got(10L)._3)
    // user 2's spike has only 3 preceding rows → below the n ≥ 4 floor
    assert(!got(14L)._3 && got(14L)._1 == 3L)
  }

  test("retention cohorts: triangle cells count distinct users once") {
    def t(day: Int, hour: Int = 0) =
      new Timestamp(java.sql.Timestamp.valueOf(
        f"2024-01-${day}%02d ${hour}%02d:00:00").getTime)
    // user 1: cohort week 0, active weeks 0 and 2 (twice in one day —
    // must count once); user 2: cohort week 0, week 0 only;
    // user 3: cohort week 1, active weeks 0 and 1 relative to ITS start
    val rows = Seq(
      (1L, 1L, t(1)), (2L, 1L, t(1, 5)), (3L, 1L, t(15)), (4L, 1L, t(15, 9)),
      (5L, 2L, t(3)),
      (6L, 3L, t(8)), (7L, 3L, t(16))
    ).map { case (e, u, ts) => (e, ts, u, "view", 1.0, "{}") }
    val dir = java.nio.file.Files.createTempDirectory("reten").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.q100RetentionCohorts(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (0, 0) -> 2L,  // users 1 and 2 in their first week
      (0, 2) -> 1L,  // user 1 returns two weeks later
      (1, 0) -> 1L,  // user 3 starts in calendar week 1
      (1, 1) -> 1L)) // and returns the next week
  }

  test("ab test: planted arm separation flags, balanced arms don't") {
    // "lift": arm A (even users) converts 18/20, arm B 2/20 → z² ≈ 25.6
    // → significant; "flat": both arms 10/20 → z = 0 → not significant
    val rows =
      (0 until 40).map { i =>
        val conv = if (i % 2 == 0) i < 36 else i >= 36  // A: 18/20, B: 2/20
        (i.toLong, ts(i + 1), i.toLong, "lift",
          if (conv) 300.0 else 100.0, "{}")
      } ++
      (0 until 40).map { i =>
        (100L + i, ts(i + 1), i.toLong, "flat",
          if ((i / 2) % 2 == 0) 300.0 else 100.0, "{}")  // 10/20 each arm
      }
    val dir = java.nio.file.Files.createTempDirectory("abtest").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.q104AbTest(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5))).toMap
    assert(got("lift") == (20L, 18L, 20L, 2L, true))
    assert(got("flat") == (20L, 10L, 20L, 10L, false))
  }

  test("rolling anomaly: trailing frame excludes the current row") {
    // if the frame included the current row, dev = n·v − S would shrink
    // by exactly v and event 5's flag would flip on this series
    val rows = (1 to 4).map(i => (i.toLong, ts(i), 1L, 20.0)) :+
      (5L, ts(5), 1L, 20.6)
    val got = Analytics.rollingAnomaly(
        rows.toDF("event_id", "ts", "user_id", "value"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3)))
      .toMap
    assert(got(5L)._1 == 4L) // 4 preceding rows, not 5
    assert(got(5L)._2)       // 60-cent dev off a zero-variance window
  }
}
