package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** The reference's per-table extract operators D1–D12 (reference
  * tasks.py:365-653), re-expressed as declarative `select`/`explode`
  * lineage over one day-document DataFrame — Catalyst prunes the wide day
  * struct down to each branch's columns, where the reference re-walks the
  * whole deserialized object per table.
  *
  * Input frames carry the [[graft.model.MaterializedDay]] schema
  * (username, date, meals, exercises, goals, notes, water, measurements).
  */
object Extractors {

  private val parent = Seq(col("username").as("userid"), col("date"))
  // after a first select the parent keys are already renamed
  private val parentOut = Seq(col("userid"), col("date"))

  /** D1: (userid, date, canonical JSON of the whole day). Field order is
    * fixed by the struct, so string equality is a valid change signal
    * (replaces the reference's accidental jsonpickle canonicalization,
    * tasks.py:378-380; SURVEY §7.5 item 3). */
  def serializeDays(days: DataFrame): DataFrame =
    days.select(parent :+ to_json(struct(
      col("username"), col("date"), col("meals"), col("exercises"),
      col("goals"), col("notes"), col("water"), col("measurements")))
      .as("rawdaydata"): _*)

  /** D2: change-detection anti-join on the FULL serialized record — new and
    * changed days survive, identical days drop (tasks.py:383-405). */
  def changedDays(extracted: DataFrame, stored: DataFrame): DataFrame =
    extracted.join(stored, Seq("userid", "date", "rawdaydata"), "left_anti")

  /** D3: parse the JSON day back to the nested shape (tasks.py:408-428). */
  def deserializeDays(raw: DataFrame): DataFrame = {
    val daySchema = org.apache.spark.sql.catalyst.ScalaReflection
      .schemaFor[graft.model.MaterializedDay].dataType
    raw.select(from_json(col("rawdaydata"), daySchema.asInstanceOf[org.apache.spark.sql.types.StructType]).as("d"))
      .select(col("d.*"))
  }

  /** D4: notes — empty-body days are dropped (truthiness filter,
    * tasks.py:451; pinned by reference test_tasks.py:381-395). */
  def extractNotes(days: DataFrame): DataFrame =
    days.select(parent ++ Seq(
      element_at(col("notes"), "type").as("type"),
      element_at(col("notes"), "body").as("body")): _*)
      .where(col("body").isNotNull && length(col("body")) > 0)

  /** D5: water (keeps 0.0 rows — tasks.py:455-467). */
  def extractWater(days: DataFrame): DataFrame =
    days.select(parent :+ col("water").as("quantity"): _*)

  /** D6: goals — 6 nutrients looked up by key, absent → NULL
    * (`element_at` ≡ dict.get(k, None), tasks.py:486-492). */
  def extractGoals(days: DataFrame): DataFrame =
    days.select(parent ++ nutrientLookups(col("goals")): _*)

  /** D7: flatten days → meals; falsy meals dropped, parent keys stamped
    * (tasks.py:497-516). */
  def mealsFlat(days: DataFrame): DataFrame =
    days.select(parent :+ explode(col("meals")).as("meal"): _*)
      .where(col("meal").isNotNull)

  /** D8: meal rows — name + nutrient totals (tasks.py:519-544). */
  def extractMeals(days: DataFrame): DataFrame =
    mealsFlat(days).select(
      parentOut ++ (col("meal.name").as("name") +: nutrientLookups(col("meal.totals"))): _*)

  /** D9: double flatten days → meals → entries (tasks.py:547-576). */
  def extractMealEntries(days: DataFrame): DataFrame =
    mealsFlat(days)
      .select(parentOut ++ Seq(col("meal.name").as("meal_name"),
        explode(col("meal.entries")).as("entry")): _*)
      .select(
        monotonically_increasing_id().as("id") +:
          (parentOut ++ Seq(
            col("meal_name"),
            col("entry.short_name").as("short_name"),
            col("entry.quantity").as("quantity"),
            col("entry.unit").as("unit")) ++
            nutrientLookups(col("entry.totals"))): _*)

  /** D10: cardio = exercises[0] flattened; note the `"calories burned"` map
    * key with a space (tasks.py:579-601). */
  def extractCardio(days: DataFrame): DataFrame =
    // get(), not (0): ANSI array indexing throws INVALID_ARRAY_INDEX on a
    // schema-valid day whose exercises array is short (no strength list,
    // or empty) — get() returns NULL out of bounds and explode drops it,
    // which is the reference's missing-section behavior
    days.select(parent :+ explode(get(col("exercises"), lit(0))).as("ex"): _*)
      .select(
        monotonically_increasing_id().as("id") +:
          (parentOut ++ Seq(
            col("ex.name").as("exercise_name"),
            element_at(col("ex.nutrition_information"), "minutes").as("minutes"),
            element_at(col("ex.nutrition_information"), "calories burned")
              .as("calories_burned"))): _*)

  /** D11: strength = exercises[1]; keys sets / reps\/set / weight\/set
    * (tasks.py:604-629). */
  def extractStrength(days: DataFrame): DataFrame =
    days.select(parent :+ explode(get(col("exercises"), lit(1))).as("ex"): _*)
      .select(
        monotonically_increasing_id().as("id") +:
          (parentOut ++ Seq(
            col("ex.name").as("exercise_name"),
            element_at(col("ex.nutrition_information"), "sets").as("sets"),
            element_at(col("ex.nutrition_information"), "reps/set").as("reps"),
            element_at(col("ex.nutrition_information"), "weight/set").as("weight"))): _*)

  /** D12: measurements map → rows; empty maps contribute nothing
    * (tasks.py:632-653; pinned by test_tasks.py:414-429). */
  def extractMeasurements(days: DataFrame): DataFrame =
    days.select(parent :+
      explode(col("measurements")).as(Seq("measure_name", "value")): _*)

  /** Six nutrient lookups with the reference's in-flight key names mapped to
    * the DDL column names (`carbohydrates` key → `carbs` column). */
  private def nutrientLookups(m: Column): Seq[Column] =
    Schemas.nutrientCols.zip(Schemas.nutrientKeys).map { case (colName, key) =>
      element_at(m, key).cast("int").as(colName)
    }
}
