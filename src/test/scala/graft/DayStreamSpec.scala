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

  test("retry after a crash mid-children converges; malformed lines are quarantined") {
    // RawDayData is the batch's COMMIT MARKER (upserted last): a crash
    // after some child loads leaves the parent untouched, so the retry
    // recomputes a NON-empty diff and re-runs every (idempotent per-day)
    // child load. Parent-first ordering would recompute an empty diff and
    // permanently skip the remaining children.
    val staging = tmpDir("day-retry-staging")
    val store = new TableStore(spark, tmpDir("day-retry-store"))
    store.init()
    DaySource.writeJsonl(spark.createDataset(Fixtures.fakeDays), staging)

    // simulate the crashed first attempt: two children loaded, parent not
    val parsed = graft.operators.Extractors.deserializeDays(
      graft.operators.Extractors.serializeDays(
        spark.createDataset(Fixtures.fakeDays).toDF()))
    store.replaceDays("Notes", graft.operators.Extractors.extractNotes(parsed))
    store.replaceDays("Water", graft.operators.Extractors.extractWater(parsed))
    assert(store.read("RawDayData").count() == 0 &&
      store.read("Water").count() == 3)

    // plus a poison line that PERMISSIVE parses to all-null — it must be
    // dropped loudly, not upserted as a null-PK row
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(staging, "poison.jsonl"), "{not json}\n")

    DayStream.run(spark, staging, store, tmpDir("day-retry-ckpt"))
    assert(store.read("RawDayData").count() == 3, "all days committed")
    assert(store.read("Water").count() == 3, "children re-loaded, not doubled")
    assert(store.read("RawDayData")
      .where($"userid".isNull || $"date".isNull).count() == 0,
      "no null-PK garbage from the poison line")
    // fakeDays carry 3 measurement entries; Measurements was NOT loaded by
    // the crashed attempt, so only the retry can have populated it
    assert(store.read("Measurements").count() == 3,
      "skipped child loaded on retry")
  }

  test("multi-batch catch-up: sequential micro-batches stage diffs cleanly") {
    val staging = tmpDir("day-staging-mb")
    val root = tmpDir("day-store-mb")
    val store = new TableStore(spark, root)
    // several files, one per micro-batch: each batch runs the full
    // diff-stage-upsert-extract path against the store state the previous
    // batch left behind
    DaySource.writeJsonl(spark.createDataset(Seq(Fixtures.fakeDays.head)),
      s"$staging/f1")
    DaySource.writeJsonl(spark.createDataset(Fixtures.fakeDays.tail),
      s"$staging/f2")
    DaySource.writeJsonl(spark.createDataset(Seq(Fixtures.fullDay)),
      s"$staging/f3")
    // flatten the jsonl part files into one source dir (a wave may span
    // multiple part files; keep them all)
    val src = tmpDir("day-src-mb")
    for (d <- Seq("f1", "f2", "f3")) {
      scala.util.Using.resource(
        java.nio.file.Files.list(java.nio.file.Paths.get(staging, d))) { s =>
        var i = 0
        s.filter(p => p.toString.endsWith(".json")).forEachOrdered { part =>
          java.nio.file.Files.copy(part,
            java.nio.file.Paths.get(src, s"$d-$i.json"))
          i += 1
        }
      }
    }
    DayStream.run(spark, src, store, tmpDir("day-ckpt-mb"),
      maxFilesPerTrigger = Some(1))
    assert(store.read("RawDayData").count() == 4)
    assert(store.read("Water").count() == 4)
    assert(store.read("Meals").count() == 2) // fullDay's extraction ran
    // every batch's staged diff was cleaned up
    assert(!new java.io.File(s"$root/_staging").exists() ||
      new java.io.File(s"$root/_staging").list().isEmpty)
  }
}
