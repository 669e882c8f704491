package graft.reports

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TableStore

/** The reference's nutrition-report query (sql.py:237-267): per-day Meals
  * nutrient sums (A1) joined to Goals on (userid, date) (J2), day-of-week
  * label (F2's SUBSTR weekday trick → `EEE`), BETWEEN date filter (F7/F8),
  * final ascending date sort (O3).
  *
  * The reference's leading 15-constant header row (U1) relies on SQLite
  * typelessness to union strings with numbers; [[withHeader]] reproduces it
  * bit-faithfully by casting every column to string — [[query]] returns the
  * typed rows (header belongs out-of-band in a typed engine).
  *
  * Note the reference groups by `date` alone while selecting `userid` —
  * legal in SQLite only because the WHERE pins one user; here we group by
  * both (identical results, shuffle-parallel across users).
  */
object NutritionReport {

  def fromStore(store: TableStore, username: String, dateFrom: String,
                dateTo: String)(implicit spark: SparkSession): DataFrame =
    query(store.read("Meals"), store.read("Goals"), username, dateFrom, dateTo)

  def query(meals: DataFrame, goals: DataFrame, username: String,
            dateFrom: String, dateTo: String): DataFrame = {
    val nutrients = graft.model.Schemas.nutrientCols
    val sums = nutrients.map(n => sum(col(n)).as(s"${n}_actual"))
    val actual = meals
      .where(col("userid") === username &&
        col("date").between(to_date(lit(dateFrom)), to_date(lit(dateTo))))
      .groupBy(col("userid"), col("date")) // A1 (both keys — see scaladoc)
      .agg(sums.head, sums.tail: _*)

    actual.as("a")
      .join(goals.as("g"), Seq("userid", "date")) // J2 composite key
      .select(Seq(
        col("userid"), col("date"),
        date_format(col("date"), "EEE").as("day_of_week")) ++
        nutrients.flatMap(n => Seq(col(s"${n}_actual"), col(s"g.$n").as(s"${n}_goal"))): _*)
      .orderBy(col("date").asc) // O3
  }

  /** U1: header row UNION ALL data rows, everything stringified. */
  def withHeader(rows: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val headers = Seq("username", "date", "day of week",
      "calories (actual)", "calories (goal)", "carbs (actual)", "carbs (goal)",
      "fat (actual)", "fat (goal)", "protein (actual)", "protein (goal)",
      "sodium (actual)", "sodium (goal)", "sugar (actual)", "sugar (goal)")
    val cols = rows.columns
    val header = spark.range(1)
      .select(headers.zip(cols).map { case (h, c) => lit(h).as(c) }: _*)
    header.unionAll(rows.select(cols.map(c => col(c).cast("string").as(c)): _*))
  }
}
