package graft

import graft.sources.{DaySource, TableStore}
import graft.streaming.DayStream

/** Streaming ETL: files arriving in the staging dir flow through the same
  * diff → upsert → extract path as batch, incrementally. */
class DayStreamSpec extends SparkSpec {
  import sqlImplicits._

  test("availableNow ingest loads, re-delivery no-ops, changed file updates") {
    val staging = tmpDir("day-staging")
    val store = new TableStore(spark, tmpDir("day-store"))
    val ckpt = tmpDir("day-ckpt")

    // wave 1: three days arrive
    DaySource.writeJsonl(spark.createDataset(Fixtures.fakeDays),
      s"$staging/wave1")
    DayStream.run(spark, s"$staging/wave1", store, s"$ckpt/1")
    assert(store.read("RawDayData").count() == 3)
    assert(store.read("Water").count() == 3)

    // wave 2 (fresh checkpoint/dir): same days re-delivered + one changed
    val changed = Fixtures.fakeDays.head.copy(water = 555.0)
    DaySource.writeJsonl(
      spark.createDataset(changed +: Fixtures.fakeDays.tail),
      s"$staging/wave2")
    DayStream.run(spark, s"$staging/wave2", store, s"$ckpt/2")
    assert(store.read("RawDayData").count() == 3) // upsert, no dup
    val w = store.read("Water")
      .where($"date" === java.sql.Date.valueOf("2021-01-01"))
      .collect().map(_.getDouble(2))
    assert(w.toSeq == Seq(555.0))
  }
}
