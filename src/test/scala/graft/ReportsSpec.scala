package graft

import java.sql.Date

import org.apache.spark.sql.Row

import graft.model.Schemas
import graft.reports.{NutritionReport, ProgressReport}

/** Golden tests for the two report queries — the most complex logic in the
  * reference and completely untested there (SURVEY §5.1). Goldens are
  * hand-computed from the SQL semantics at sql.py:196-235 / 237-267,
  * including the NULL-propagation drop (A4), truncating casts (F4), and
  * half-up rounding of the running total (F5).
  */
class ReportsSpec extends SparkSpec {

  private val u = "user@example.com"
  private def d(s: String) = Date.valueOf(s)

  private def df(schema: org.apache.spark.sql.types.StructType, rows: Row*) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  // Weight 80.3 → RMR = 1.2·(803 + 6.25·182 − 170 + 5) = 2130.6
  private lazy val measurements = df(Schemas.measurements,
    Row(u, d("2021-02-01"), "Weight", 99.0), // older — must lose to latest
    Row(u, d("2021-02-20"), "Weight", 80.3),
    Row(u, d("2021-02-20"), "Waist", 85.0)) // different measure — ignored

  private lazy val goals = df(Schemas.goals,
    Seq("2021-03-01", "2021-03-02", "2021-03-03", "2021-03-04")
      .map(dt => Row(u, d(dt), 2000: Integer, null, null, null, null, null)): _*)

  private lazy val cardio = df(Schemas.cardioExercises,
    Row(1L, u, d("2021-03-01"), "run", 30.0, 300.0),
    Row(2L, u, d("2021-03-03"), "run", 10.0, 100.0),
    Row(3L, u, d("2021-03-03"), "row", 5.0, 50.0))

  private def meal(dt: String, name: String, cal: Int) =
    Row(u, d(dt), name, cal: Integer, null, null, null, null, null)

  private lazy val meals = df(Schemas.meals,
    meal("2021-03-01", "breakfast", 1000), meal("2021-03-01", "dinner", 800),
    meal("2021-03-02", "lunch", 1200), meal("2021-03-02", "dinner", 1300),
    // 2021-03-03: NO meals → deficit_actual NULL → row drops (A4/F9)
    meal("2021-03-04", "dinner", 2100))

  test("progress report golden: truncation, NULL drop, renumbering, running total") {
    val got = ProgressReport.query(measurements, goals, cardio, meals,
      u, "2021-03-01", 150000L)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5)))
    // deficit_target = RMR − goal + cardio (trunc); deficit_actual adds
    // (goal − eaten); accumulated = round(prefix sum) — NULL day skipped,
    // day_number renumbers the survivors.
    assert(got.toSeq == Seq(
      (1, "01-Mar-2021", 2000, 430, 630, 631),   // 430.6 / 630.6 / round 630.6
      (2, "02-Mar-2021", 2000, 130, -369, 261),  // trunc(-369.4) → -369
      (3, "04-Mar-2021", 2000, 130, 30, 292)))   // day 3 dropped, renumbered
  }

  test("SQL twin with correlated subqueries matches the DataFrame plan") {
    val df = ProgressReport.query(measurements, goals, cardio, meals,
      u, "2021-03-01", 150000L).collect().map(_.toSeq)
    val sql = ProgressReport.sqlQuery(measurements, goals, cardio, meals,
      u, "2021-03-01")(spark).collect().map(_.toSeq)
    assert(df.toSeq == sql.toSeq)

    // a quoted username is DATA in both twins — the SQL twin interpolates
    // into single-quoted literals, so an unescaped o'brien would be a
    // parse error (or injected SQL) while the === twin just matches rows
    val quoted = "o'brien"
    val dfQ = ProgressReport.query(measurements, goals, cardio, meals,
      quoted, "2021-03-01", 150000L).collect()
    val sqlQ = ProgressReport.sqlQuery(measurements, goals, cardio, meals,
      quoted, "2021-03-01")(spark).collect()
    assert(dfQ.map(_.toSeq).toSeq == sqlQ.map(_.toSeq).toSeq)
  }

  test("progress report: day with no goals row simply absent") {
    val g2 = df(Schemas.goals,
      Row(u, d("2021-03-01"), 2000: Integer, null, null, null, null, null))
    val got = ProgressReport.query(measurements, g2, cardio, meals,
      u, "2021-03-01", 150000L).collect()
    assert(got.length == 1)
  }

  test("q19 analog: day_number renumbers after the NULL-actual drop (no gaps)") {
    // Reference semantics (sql.py:208,234): the WHERE that drops NULL-actual
    // days is evaluated before ROW_NUMBER, so surviving days are numbered
    // 1..n contiguously per user — the pre-fix analog numbered first and
    // left gaps where dropped days sat.
    val rows = graft.queries.Relational
      .q19ProgressReport(spark, "/root/testdata/sf0.001")
      .select("o_custkey", "day_number").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.nonEmpty)
    val gaps = rows.groupBy(_._1).filter { case (_, g) =>
      g.map(_._2).sorted.toSeq != (1 to g.length).toSeq
    }
    assert(gaps.isEmpty, s"non-contiguous day_number for users ${gaps.keys.take(5)}")
  }

  test("nutrition report golden: sums, goals join, day-of-week, order") {
    val nmeal = Row(u, d("2021-03-01"), "breakfast",
      1000: Integer, 100: Integer, 30: Integer, 50: Integer,
      2000: Integer, 40: Integer)
    val nmeal2 = Row(u, d("2021-03-01"), "dinner",
      800: Integer, 90: Integer, 25: Integer, 40: Integer,
      1500: Integer, 30: Integer)
    val nmeal3 = Row(u, d("2021-03-02"), "lunch",
      2500: Integer, 300: Integer, 80: Integer, 110: Integer,
      2300: Integer, 95: Integer)
    val nmeals = df(Schemas.meals, nmeal, nmeal2, nmeal3)
    val ngoals = df(Schemas.goals,
      Row(u, d("2021-03-01"), 2000: Integer, 250: Integer, 70: Integer,
        100: Integer, 2300: Integer, 90: Integer),
      Row(u, d("2021-03-02"), 2000: Integer, 250: Integer, 70: Integer,
        100: Integer, 2300: Integer, 90: Integer))

    val got = NutritionReport.query(nmeals, ngoals, u,
      "2021-03-01", "2021-03-07").collect()
    assert(got.length == 2)
    val r1 = got(0)
    assert(r1.getDate(1).toString == "2021-03-01")
    assert(r1.getString(2) == "Mon") // 2021-03-01 was a Monday
    assert(r1.getLong(3) == 1800L) // calories_actual = 1000 + 800
    assert(r1.getInt(4) == 2000)   // calories_goal
    assert(r1.getLong(5) == 190L)  // carbs_actual
    val r2 = got(1)
    assert(r2.getDate(1).toString == "2021-03-02")
    assert(r2.getString(2) == "Tue")
    assert(r2.getLong(3) == 2500L)
  }

  test("nutrition report U1 header variant") {
    val nmeals = df(Schemas.meals,
      Row(u, d("2021-03-01"), "breakfast", 1000: Integer, null, null, null, null, null))
    val ngoals = df(Schemas.goals,
      Row(u, d("2021-03-01"), 2000: Integer, null, null, null, null, null))
    val rows = NutritionReport.query(nmeals, ngoals, u, "2021-03-01", "2021-03-02")
    val withH = NutritionReport.withHeader(rows)(spark).collect()
    assert(withH.length == 2)
    assert(withH(0).getString(0) == "username")
    assert(withH(0).getString(2) == "day of week")
    assert(withH(1).getString(0) == u) // data stringified underneath
  }
}
