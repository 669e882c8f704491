package graft

import java.sql.Date
import java.time.LocalDate

import graft.api.Api
import graft.model._

/** The composed reference surface — ETL → reports → backup
  * (`api/Api.scala` ≡ reference flows.py:17-189) — driven end-to-end at
  * stress scale (round-7 verdict item 3). The per-query catalog is
  * hash-validated to 100×/300×, but the composed flow had specs only at
  * fixture scale (4 days); this suite runs it over a generated
  * 36,500-day corpus (100 users × 365 days — ~100× the reference's
  * O(hundreds of rows/user) design point) and asserts the invariants
  * that matter for an incremental pipeline:
  *
  *   - initial load counts every day exactly once;
  *   - re-running on identical input converges to ZERO changed days
  *     (D2's canonical-JSON diff is stable across serialize → store →
  *     re-read round trips at scale — the invariant that keeps a daily
  *     scheduled flow from rewriting the world);
  *   - a sparse mutation re-loads exactly the mutated days, and the
  *     child tables reflect the new values (upsert convergence);
  *   - both report flows return the expected row sets over the loaded
  *     store;
  *   - backup snapshots the store.
  *
  * Stage timings are printed via info() — recorded in NOTES_r08.
  */
class FlowStressSpec extends SparkSpec {
  import sqlImplicits._

  private val nUsers = 100
  private val nDays = 365
  private val start = LocalDate.of(2021, 1, 1)

  /** Deterministic day document for (user u, day i) — every day carries
    * goals AND meals (so it is a progress-report row), plus entries,
    * both exercise kinds, notes, water, and a measurement, exercising
    * all eight extract branches on every row. */
  private def day(u: Int, i: Int, waterBump: Double = 0.0): MaterializedDay = {
    val date = Date.valueOf(start.plusDays(i.toLong))
    val cal = 400.0 + (u * 7 + i * 3) % 300
    MaterializedDay(
      username = s"user$u@stress.test",
      date = date,
      meals = Seq(
        Meal("breakfast",
          Map("calories" -> cal, "carbohydrates" -> 60.0, "fat" -> 20.0,
            "protein" -> 25.0, "sodium" -> 800.0, "sugar" -> 15.0),
          Seq(
            MealEntry("eggs", Some(2.0), Some("unit"),
              Map("calories" -> (cal / 2), "protein" -> 12.0)),
            MealEntry("toast", Some(1.0), Some("slice"),
              Map("calories" -> (cal / 2), "carbohydrates" -> 60.0)))),
        Meal("dinner", Map("calories" -> (cal + 100.0)), Seq.empty)),
      exercises = Seq(
        Seq(Exercise("running",
          Map("minutes" -> 30.0, "calories burned" -> (200.0 + i % 50)))),
        Seq(Exercise("bench press",
          Map("sets" -> 3.0, "reps/set" -> 10.0, "weight/set" -> 60.0)))),
      goals = Map("calories" -> (2000.0 + u), "carbohydrates" -> 250.0,
        "fat" -> 70.0, "protein" -> 100.0),
      notes = Map("type" -> "food", "body" -> s"day $i"),
      water = 1500.0 + (i % 10) * 100 + waterBump,
      measurements = Map("Weight" -> (90.0 - i * 0.01)))
  }

  private def timed[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    info(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  test("etl -> reports -> backup over a 36,500-day corpus") {
    val api = new Api(tmpDir("flowstress-store"))
    val corpus = for { u <- 0 until nUsers; i <- 0 until nDays }
      yield day(u, i)

    val loaded = timed("etl initial (36,500 days)") {
      api.runEtl(spark.createDataset(corpus))
    }
    assert(loaded == nUsers.toLong * nDays)

    // convergence: identical input → the D2 diff is empty, nothing moves
    val noop = timed("etl re-run, identical input") {
      api.runEtl(spark.createDataset(corpus))
    }
    assert(noop == 0L)

    // sparse incremental: bump water on every 37th (u, i) slot — the flow
    // must re-load EXACTLY those days, and the Water table must show the
    // new values while untouched days keep the old ones
    val mutated = corpus.zipWithIndex.map { case (d0, idx) =>
      if (idx % 37 == 0) {
        val u = idx / nDays; val i = idx % nDays
        day(u, i, waterBump = 250.0)
      } else d0
    }
    val expectedChanged = (0 until nUsers * nDays).count(_ % 37 == 0)
    val changed = timed(s"etl incremental ($expectedChanged mutated days)") {
      api.runEtl(spark.createDataset(mutated))
    }
    assert(changed == expectedChanged.toLong)

    val store = api.store
    assert(store.read("RawDayData").count() == nUsers.toLong * nDays)
    import org.apache.spark.sql.functions._
    // every mutated day's water is bumped, every untouched day's is not:
    // the per-day delta vs the pre-mutation formula is 250 exactly on the
    // mutated slots and 0 elsewhere
    val bumped = store.read("Water")
      .where(col("quantity") % 100 =!= 0) // base water is a multiple of 100
      .count()
    assert(bumped == expectedChanged.toLong)

    val progress = timed("progress report (user 42, full year)") {
      api.runProgressReport("user42@stress.test", "2021-01-01").collect()
    }
    assert(progress.length == nDays) // every day has goals AND meals
    assert(progress.forall(_.getAs[Int]("calories_target") == 2042))

    val nutrition = timed("nutrition report (user 7, full year)") {
      api.runNutritionReport("user7@stress.test",
        "2021-01-01", "2021-12-31").count()
    }
    assert(nutrition == nDays.toLong)

    val backups = tmpDir("flowstress-backups")
    timed("backup snapshot") {
      api.runBackup(backups, today = LocalDate.of(2021, 12, 31))
    }
    assert(new java.io.File(backups).list().toSeq ==
      Seq("mfp_db_backup_2021-12-31"))
  }
}
