package graft

import graft.operators.Extractors

/** Ports of the reference's extractor unit tests (test_tasks.py:350-429)
  * plus nested-path coverage the reference lacks.
  */
class ExtractorsSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val days = spark.createDataset(Fixtures.fakeDays).toDF()
  private lazy val full = spark.createDataset(Seq(Fixtures.fullDay)).toDF()

  test("D4 notes: empty-body day dropped (test_tasks.py:381-395)") {
    val rows = Extractors.extractNotes(days)
      .select("date", "type", "body").collect().map(r => (r.getDate(0).toString, r.getString(1), r.getString(2))).sorted
    assert(rows.toSeq == Seq(
      ("2021-01-01", "food", "notable"),
      ("2021-01-03", "food", "noted")))
  }

  test("D5 water: keeps 0.0 rows (test_tasks.py:397-412)") {
    val rows = Extractors.extractWater(days)
      .select("date", "quantity").collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1))).sorted
    assert(rows.toSeq == Seq(
      ("2021-01-01", 0.0), ("2021-01-02", 2160.0), ("2021-01-03", 1500.0)))
  }

  test("D12 measurements: map explode, empty map → no rows (test_tasks.py:414-429)") {
    val rows = Extractors.extractMeasurements(days)
      .select("date", "measure_name", "value").collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getDouble(2))).sorted
    assert(rows.toSeq == Seq(
      ("2021-01-01", "Mood", 5.0),
      ("2021-01-01", "Weight", 88.8),
      ("2021-01-03", "Weight", 88.0)))
  }

  test("D6 goals: absent keys → NULL nutrients") {
    val r = Extractors.extractGoals(full).collect().head
    assert(r.getAs[Int]("calories") == 2000)
    assert(r.getAs[Int]("carbs") == 250) // carbohydrates key → carbs column
    assert(r.isNullAt(r.fieldIndex("sodium")))
    assert(r.isNullAt(r.fieldIndex("sugar")))
  }

  test("D7/D8 meals: flatten with parent keys; missing totals → NULL") {
    val rows = Extractors.extractMeals(full).collect()
      .map(r => (r.getAs[String]("name"), r.getAs[Any]("calories"),
        r.getAs[Any]("carbs"))).sortBy(_._1.toString)
    assert(rows.toSeq == Seq(("breakfast", 500, 60), ("lunch", 700, null)))
  }

  test("D9 meal entries: double flatten") {
    val rows = Extractors.extractMealEntries(full).collect()
      .map(r => (r.getAs[String]("meal_name"), r.getAs[String]("short_name"),
        r.getAs[Any]("calories"))).sortBy(_._2.toString)
    assert(rows.toSeq == Seq(
      ("breakfast", "eggs", 180), ("breakfast", "toast", 320)))
  }

  test("D10/D11 exercises: positional cardio/strength contract") {
    val cardio = Extractors.extractCardio(full).collect().head
    assert(cardio.getAs[String]("exercise_name") == "running")
    assert(cardio.getAs[Double]("minutes") == 30.0)
    assert(cardio.getAs[Double]("calories_burned") == 350.0)
    val strength = Extractors.extractStrength(full).collect().head
    assert(strength.getAs[String]("exercise_name") == "bench press")
    assert(strength.getAs[Double]("sets") == 3.0)
    assert(strength.getAs[Double]("reps") == 10.0)
    assert(strength.getAs[Double]("weight") == 60.0)

    // a short exercises array (no strength section, or empty) is
    // schema-valid input: under ANSI, raw (0)/(1) indexing would throw
    // INVALID_ARRAY_INDEX and kill the ETL — the missing section must
    // simply contribute no rows
    val short = spark.createDataset(Seq(
      Fixtures.fullDay.copy(exercises =
        Seq(Fixtures.fullDay.exercises.head)), // cardio only
      Fixtures.fullDay.copy(date = java.sql.Date.valueOf("2021-02-02"),
        exercises = Seq.empty))).toDF()
    assert(Extractors.extractCardio(short).count() == 1)
    assert(Extractors.extractStrength(short).count() == 0)
  }

  test("D1/D3 serialize→deserialize round trip; D2 diff detects change") {
    val all = spark.createDataset(Fixtures.fakeDays :+ Fixtures.fullDay).toDF()
    val ser = Extractors.serializeDays(all)
    val back = Extractors.deserializeDays(ser)
    assert(back.count() == 4)
    // round trip preserves nested content
    val w = Extractors.extractWater(back).select("quantity")
      .collect().map(_.getDouble(0)).sorted
    assert(w.toSeq == Seq(0.0, 1500.0, 1800.0, 2160.0))

    // D2: identical → empty diff; changed water → exactly that day surfaces
    assert(Extractors.changedDays(ser, ser).count() == 0)
    val changedDay = Fixtures.fakeDays.head.copy(water = 999.0)
    val ser2 = Extractors.serializeDays(
      spark.createDataset(changedDay +: Fixtures.fakeDays.tail :+ Fixtures.fullDay).toDF())
    val diff = Extractors.changedDays(ser2, ser)
    assert(diff.select("date").collect().map(_.getDate(0).toString).toSeq ==
      Seq("2021-01-01"))
  }
}
