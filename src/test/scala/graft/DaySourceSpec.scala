package graft

import graft.sources.DaySource

/** Staged JSON-lines ingest: write side ↔ read side round trip with the
  * full nested day document. */
class DaySourceSpec extends SparkSpec {
  import sqlImplicits._

  test("jsonl round trip preserves the nested day document") {
    val dir = tmpDir("days") + "/staged"
    val days = Fixtures.fakeDays :+ Fixtures.fullDay
    DaySource.writeJsonl(spark.createDataset(days), dir)
    val back = DaySource.readJsonl(spark, dir).collect()
    assert(back.length == 4)
    val full = back.find(_.date.toString == "2021-02-01").get
    assert(full.meals.map(_.name).toSet == Set("breakfast", "lunch"))
    assert(full.meals.find(_.name == "breakfast").get.entries.length == 2)
    assert(full.exercises(0).head.name == "running")
    assert(full.exercises(1).head.nutrition_information("reps/set") == 10.0)
    assert(full.measurements == Map("Weight" -> 87.5))
  }

  test("malformed line fails fast by default") {
    val dir = tmpDir("badjson")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-00000.json"),
      "{\"username\": \"x\", \"date\": NOT_JSON}\n")
    intercept[Exception] {
      DaySource.readJsonl(spark, dir).collect()
    }
  }
}
