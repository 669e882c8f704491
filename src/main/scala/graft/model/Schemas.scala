package graft.model

import org.apache.spark.sql.types._

/** The in-flight nested day document — Scala port of the reference's
  * `MaterializedDay` (reference types.py:14-27, FIXTURES.md §A4).
  *
  * `exercises` keeps the reference's load-bearing positional contract:
  * index 0 = cardio, index 1 = strength (reference tasks.py:600,628).
  */
case class MealEntry(
    short_name: String,
    quantity: Option[Double],
    unit: Option[String],
    totals: Map[String, Double])

case class Meal(
    name: String,
    totals: Map[String, Double],
    entries: Seq[MealEntry])

case class Exercise(
    name: String,
    nutrition_information: Map[String, Double])

case class MaterializedDay(
    username: String,
    date: java.sql.Date,
    meals: Seq[Meal],
    exercises: Seq[Seq[Exercise]],
    goals: Map[String, Double],
    notes: Map[String, String],
    water: Double,
    measurements: Map[String, Double])

/** Fixed relational schemas for the 9 tables (reference sql.py:7-145 DDL;
  * SURVEY §1.4 type mapping: TEXT→String, INTEGER→Int (nullable — NULL
  * nutrients are pervasive), REAL→Double, date TEXT→DateType).
  */
object Schemas {

  val nutrientCols: Seq[String] =
    Seq("calories", "carbs", "fat", "protein", "sodium", "sugar")

  /** Map keys used by the in-flight document for nutrient totals
    * (reference tasks.py:486-491 — note `carbohydrates`, not `carbs`). */
  val nutrientKeys: Seq[String] =
    Seq("calories", "carbohydrates", "fat", "protein", "sodium", "sugar")

  private def key(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) })

  private def nutrients: Seq[StructField] =
    nutrientCols.map(StructField(_, IntegerType, nullable = true))

  val rawDayData: StructType = StructType(Seq(
    StructField("userid", StringType, true),
    StructField("date", DateType, true),
    StructField("rawdaydata", StringType, true)))

  val meals: StructType = StructType(Seq(
    StructField("userid", StringType, true),
    StructField("date", DateType, true),
    StructField("name", StringType, true)) ++ nutrients)

  val mealEntries: StructType = StructType(Seq(
    StructField("id", LongType, true),
    StructField("userid", StringType, true),
    StructField("date", DateType, true),
    StructField("meal_name", StringType, true),
    StructField("short_name", StringType, true),
    StructField("quantity", DoubleType, true),
    StructField("unit", StringType, true)) ++ nutrients)

  val goals: StructType = StructType(Seq(
    StructField("userid", StringType, true),
    StructField("date", DateType, true)) ++ nutrients)

  val cardioExercises: StructType = StructType(Seq(
    StructField("id", LongType, true),
    StructField("userid", StringType, true),
    StructField("date", DateType, true),
    StructField("exercise_name", StringType, true),
    StructField("minutes", DoubleType, true),
    StructField("calories_burned", DoubleType, true)))

  val strengthExercises: StructType = StructType(Seq(
    StructField("id", LongType, true),
    StructField("userid", StringType, true),
    StructField("date", DateType, true),
    StructField("exercise_name", StringType, true),
    StructField("sets", DoubleType, true),
    StructField("reps", DoubleType, true),
    StructField("weight", DoubleType, true)))

  val notes: StructType = StructType(Seq(
    StructField("userid", StringType, true),
    StructField("date", DateType, true),
    StructField("type", StringType, true),
    StructField("body", StringType, true)))

  val water: StructType = StructType(Seq(
    StructField("userid", StringType, true),
    StructField("date", DateType, true),
    StructField("quantity", DoubleType, true)))

  val measurements: StructType = StructType(Seq(
    StructField("userid", StringType, true),
    StructField("date", DateType, true),
    StructField("measure_name", StringType, true),
    StructField("value", DoubleType, true)))

  /** table name → (schema, primary-key columns; empty = id-keyed append
    * table). Mirrors the DDL PKs (sql.py:12,27,67,...). */
  val tables: Map[String, (StructType, Seq[String])] = Map(
    "RawDayData" -> (rawDayData, Seq("userid", "date")),
    "Meals" -> (meals, Seq("userid", "date", "name")),
    "MealEntries" -> (mealEntries, Seq.empty),
    "Goals" -> (goals, Seq("userid", "date")),
    "CardioExercises" -> (cardioExercises, Seq.empty),
    "StrengthExercises" -> (strengthExercises, Seq.empty),
    "Notes" -> (notes, Seq("userid", "date")),
    "Water" -> (water, Seq("userid", "date")),
    "Measurements" -> (measurements, Seq("userid", "date", "measure_name")))
}
