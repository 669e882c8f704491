package graft

import graft.operators.EtlPipeline
import graft.sources.TableStore

/** End-to-end ETL flow (SURVEY §3.1): diff → upsert → 8 extract branches,
  * including incremental-rerun semantics the reference implements via D2.
  */
class EtlPipelineSpec extends SparkSpec {
  import sqlImplicits._

  test("full run, incremental no-op rerun, changed-day replacement") {
    val store = new TableStore(spark, tmpDir("etl"))
    val days = Fixtures.fakeDays :+ Fixtures.fullDay

    // first run: everything is new
    val n1 = EtlPipeline.run(store, spark.createDataset(days))
    assert(n1 == 4)
    assert(store.read("RawDayData").count() == 4)
    assert(store.read("Water").count() == 4)
    assert(store.read("Notes").count() == 3) // empty-body day dropped
    assert(store.read("Meals").count() == 2)
    assert(store.read("MealEntries").count() == 2)
    assert(store.read("CardioExercises").count() == 1)
    assert(store.read("StrengthExercises").count() == 1)
    assert(store.read("Goals").count() == 4)
    assert(store.read("Measurements").count() == 4)

    // rerun unchanged: D2 diff empty, nothing rewritten
    val n2 = EtlPipeline.run(store, spark.createDataset(days))
    assert(n2 == 0)
    assert(store.read("Water").count() == 4)

    // change one day's water: exactly that day is replaced, not duplicated
    val changed = Fixtures.fakeDays.head.copy(water = 777.0)
    val n3 = EtlPipeline.run(store,
      spark.createDataset(changed +: days.tail))
    assert(n3 == 1)
    assert(store.read("Water").count() == 4)
    val w = store.read("Water")
      .where($"date" === java.sql.Date.valueOf("2021-01-01"))
      .collect().map(_.getDouble(2))
    assert(w.toSeq == Seq(777.0))
  }

  test("crash before the RawDayData commit retries to a complete, duplicate-free store") {
    // RawDayData is upserted LAST as the commit marker: a crash after the
    // child loads leaves the parent untouched, so the retry recomputes the
    // SAME non-empty diff and re-runs the idempotent child loads. The old
    // parent-first ordering made the retry's diff empty — children stale
    // forever with no error.
    val store = new TableStore(spark, tmpDir("etl-crash"))
    val days = Fixtures.fakeDays
    val boom: () => Unit = () => throw new RuntimeException("injected crash")
    intercept[RuntimeException](
      EtlPipeline.run(store, spark.createDataset(days), boom))
    assert(store.read("RawDayData").count() == 0, "commit marker not written")
    assert(store.read("Water").count() == 3, "children were loaded pre-crash")

    val n = EtlPipeline.run(store, spark.createDataset(days))
    assert(n == 3, "retry must see the full diff")
    assert(store.read("RawDayData").count() == 3)
    assert(store.read("Water").count() == 3)
    assert(store.read("Measurements").count() == 3)
  }

  test("diff survives cache eviction between upsert and child loads") {
    // The hazard: upsert atomically swaps away RawDayData — the directory the
    // diff's lineage reads. If the diff were only persist()ed, evicting it
    // here would recompute an empty diff (new store state == incoming) and
    // the child tables would silently miss the changed days. The staged diff
    // has no lineage back to the store, so a full cache wipe must not matter.
    val store = new TableStore(spark, tmpDir("etl-evict"))
    val days = Fixtures.fakeDays :+ Fixtures.fullDay
    val wipeCaches = () => {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    val n = EtlPipeline.run(store, spark.createDataset(days), wipeCaches)
    assert(n == 4)
    assert(store.read("Water").count() == 4)
    assert(store.read("Meals").count() == 2)
    assert(store.read("Measurements").count() == 4)

    // changed-day rerun under the same eviction pressure
    val changed = Fixtures.fakeDays.head.copy(water = 888.0)
    val n2 = EtlPipeline.run(store,
      spark.createDataset(changed +: days.tail), wipeCaches)
    assert(n2 == 1)
    val w = store.read("Water")
      .where($"date" === java.sql.Date.valueOf("2021-01-01"))
      .collect().map(_.getDouble(2))
    assert(w.toSeq == Seq(888.0))
  }
}
