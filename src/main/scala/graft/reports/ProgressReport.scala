package graft.reports

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.TableStore

/** The reference's progress-report query (sql.py:196-235), faithfully
  * re-planned on DataFrames:
  *
  *   params → userstats CTE (A2 latest weight → A5 Mifflin-St Jeor RMR with
  *   hardcoded height 182 / age 34) → Goals ⋈ userstats (J1, broadcast — one
  *   row per user) → date ≥ start filter → correlated scalar sums rewritten
  *   as pre-aggregate + left join (A3 cardio with COALESCE 0, A4 meals with
  *   load-bearing NULL) → deficit arithmetic with truncating CAST (F4) →
  *   running total over date (W2: SUM ignores NULL rows, ROUND, COALESCE,
  *   CAST) → row_number day numbering (W1) → dd-MMM-yyyy label (F2) → final
  *   IS NOT NULL filter (F9: days without logged meals drop out).
  *
  * Engine-side deviation (SURVEY §4.3): windows are partitioned by userid —
  * the reference's are unpartitioned but its WHERE pins one user, so results
  * are identical while the plan stays shuffle-parallel across users.
  */
object ProgressReport {

  def fromStore(store: TableStore, username: String, startingDate: String,
                endGoal: Long)(implicit spark: SparkSession): DataFrame =
    query(store.read("Measurements"), store.read("Goals"),
      store.read("CardioExercises"), store.read("Meals"),
      username, startingDate, endGoal)

  /** `spark.sql` twin of [[query]], kept structurally close to the
    * reference SQL (sql.py:196-235): the correlated scalar subqueries are
    * written as actual subqueries and Catalyst's
    * RewriteCorrelatedScalarSubquery decorrelates them into the same
    * aggregate-and-join plan the DataFrame version declares explicitly
    * (SURVEY §4.2). Asserted equal to [[query]] in ReportsSpec.
    */
  def sqlQuery(measurements: DataFrame, goals: DataFrame, cardio: DataFrame,
               meals: DataFrame, username0: String, startingDate0: String)
              (implicit spark: SparkSession): DataFrame = {
    // the parameters ride inside single-quoted SQL literals: escape
    // embedded quotes so a username like o'brien is data, not a parse
    // error (or injected SQL) — the DataFrame twin's === literals handle
    // these values natively, and the twin-equality spec only holds if
    // this path does too
    val username = username0.replace("'", "''")
    val startingDate = startingDate0.replace("'", "''")
    measurements.createOrReplaceTempView("mfp_measurements")
    goals.createOrReplaceTempView("mfp_goals")
    cardio.createOrReplaceTempView("mfp_cardio")
    meals.createOrReplaceTempView("mfp_meals")
    spark.sql(
      s"""WITH userstats AS (
         |  SELECT CAST('$username' AS STRING) AS userid,
         |    1.2 * (10 * (SELECT max_by(value, date) FROM mfp_measurements
         |                 WHERE userid = '$username'
         |                   AND measure_name = 'Weight')
         |           + 6.25 * 182 - 5 * 34 + 5) AS rmr
         |),
         |per_day AS (
         |  SELECT g.date, g.calories,
         |    u.rmr - g.calories
         |      + (SELECT COALESCE(SUM(calories_burned), 0) FROM mfp_cardio c
         |         WHERE c.userid = u.userid AND c.date = g.date) AS d_target,
         |    u.rmr - g.calories
         |      + (SELECT COALESCE(SUM(calories_burned), 0) FROM mfp_cardio c
         |         WHERE c.userid = u.userid AND c.date = g.date)
         |      + (g.calories - (SELECT SUM(calories) FROM mfp_meals m
         |                       WHERE m.userid = u.userid AND m.date = g.date))
         |      AS d_actual
         |  FROM mfp_goals g JOIN userstats u ON g.userid = u.userid
         |  WHERE g.date >= DATE('$startingDate')
         |),
         |windowed AS (
         |  SELECT date, calories,
         |    CAST(d_target AS INT) AS deficit_target,
         |    CAST(d_actual AS INT) AS deficit_actual,
         |    CAST(COALESCE(ROUND(SUM(d_actual) OVER (ORDER BY date
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0), 0) AS INT)
         |      AS deficit_accumulated
         |  FROM per_day
         |)
         |SELECT
         |  ROW_NUMBER() OVER (ORDER BY date) AS day_number,
         |  DATE_FORMAT(date, 'dd-MMM-yyyy') AS date,
         |  calories AS calories_target,
         |  deficit_target, deficit_actual, deficit_accumulated
         |FROM windowed
         |WHERE deficit_actual IS NOT NULL
         |ORDER BY day_number""".stripMargin)
  }

  def query(measurements: DataFrame, goals: DataFrame, cardio: DataFrame,
            meals: DataFrame, username: String, startingDate: String,
            endGoal: Long): DataFrame = {

    // A2: latest Weight per user (ORDER BY date DESC LIMIT 1).
    val latestW = Window.partitionBy(col("userid")).orderBy(col("date").desc)
    val userstats = measurements
      .where(col("measure_name") === "Weight")
      .withColumn("rn", row_number().over(latestW))
      .where(col("rn") === 1)
      // A5: RMR — constants straight from sql.py:201.
      .select(col("userid"),
        (lit(1.2) * (lit(10) * col("value") + lit(6.25) * 182 - lit(5) * 34 + 5))
          .as("rmr"))

    // A3: correlated SUM(calories_burned) → pre-aggregate, COALESCE(…, 0).
    val cardioSum = cardio
      .groupBy(col("userid").as("c_userid"), col("date").as("c_date"))
      .agg(sum(col("calories_burned")).as("burned"))

    // A4: correlated SUM(calories) with NO default — NULL propagates.
    val mealSum = meals
      .groupBy(col("userid").as("m_userid"), col("date").as("m_date"))
      .agg(sum(col("calories")).as("eaten"))

    val base = goals
      .where(col("userid") === username &&
        col("date") >= to_date(lit(startingDate)))
      .join(broadcast(userstats), "userid") // J1
      .join(cardioSum,
        col("userid") === col("c_userid") && col("date") === col("c_date"),
        "left_outer")
      .join(mealSum,
        col("userid") === col("m_userid") && col("date") === col("m_date"),
        "left_outer")
      .select(col("userid"), col("date"), col("rmr"),
        col("calories").as("calories_target"),
        coalesce(col("burned"), lit(0.0)).as("burned"),
        col("eaten"))

    val deficitTarget = col("rmr") - col("calories_target") + col("burned")
    // NULL eaten ⇒ NULL deficit_actual ⇒ row filtered at the end (F9).
    val deficitActual =
      deficitTarget + (col("calories_target") - col("eaten"))

    val ordered = Window.partitionBy(col("userid")).orderBy(col("date"))
    val running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // F9 first: in the reference's outer query the WHERE is evaluated before
    // its ROW_NUMBER, so day numbering skips the dropped days. The running
    // total is unaffected (SQL SUM ignores the NULL deficits either way).
    base
      .where(deficitActual.isNotNull)
      .select(
        row_number().over(ordered).as("day_number"), // W1
        date_format(col("date"), "dd-MMM-yyyy").as("date"), // F2
        col("calories_target"),
        deficitTarget.cast("int").as("deficit_target"), // F4 truncation
        deficitActual.cast("int").as("deficit_actual"),
        // W2: ROUND half-up over the prefix sum; COALESCE; truncating CAST.
        coalesce(round(sum(deficitActual).over(running), 0), lit(0.0))
          .cast("int").as("deficit_accumulated"))
      .orderBy(col("day_number"))
  }
}
