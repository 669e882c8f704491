package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.model.MaterializedDay
import graft.sources.TableStore

/** The ETL flow (reference flows.py:17-124, SURVEY §3.1) as one Spark job:
  *
  *   Dataset[MaterializedDay] → D1 canonical JSON → D2 change-detection
  *   anti-join vs stored RawDayData → cache the (small) diff → M1 upsert raw
  *   → D3 re-parse → 8 extract branches (D4–D12) each loaded with
  *   intent-faithful replace-days semantics (M3) / keyed upsert (M2).
  *
  * Lineage replaces the Prefect DAG; the only shuffles are the anti-join
  * (J3) and the per-table upsert joins. The diff is STAGED (written to
  * parquet and re-read, [[TableStore.stage]]), not merely persisted: the M1
  * upsert atomically swaps away the very directory the diff's lineage reads,
  * so a cache eviction between upsert and the eight child branches would
  * recompute an empty diff and silently skip the changed days. The reference
  * has the same invariant by construction — it re-parses the in-memory diff,
  * never the DB (flows.py:66-74).
  */
object EtlPipeline {

  def run(store: TableStore, days: Dataset[MaterializedDay],
          afterUpsert: () => Unit = () => ())
         (implicit spark: SparkSession): Long = {
    store.init()
    val serialized = Extractors.serializeDays(days.toDF())
    val (diff, dropStaged) = store.stage(
      Extractors.changedDays(serialized, store.read("RawDayData")))
    try {
      val nChanged = diff.count()
      if (nChanged > 0) {
        // children FIRST, RawDayData LAST as the commit marker (same
        // reasoning as DayStream): the diff keys on RawDayData content,
        // so committing the parent before the children means a crash in
        // any extract leaves the re-run's diff EMPTY and the children
        // permanently stale. With the parent last, a re-run recomputes
        // the same diff and repeats the idempotent per-day child loads.
        val parsed = Extractors.deserializeDays(diff)
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          store.replaceDays("Notes", Extractors.extractNotes(parsed))
          store.replaceDays("Water", Extractors.extractWater(parsed))
          store.replaceDays("Goals", Extractors.extractGoals(parsed))
          store.replaceDays("Meals", Extractors.extractMeals(parsed))
          store.replaceDays("MealEntries", Extractors.extractMealEntries(parsed))
          store.replaceDays("CardioExercises", Extractors.extractCardio(parsed))
          store.replaceDays("StrengthExercises", Extractors.extractStrength(parsed))
          store.upsert("Measurements", Extractors.extractMeasurements(parsed)) // M2
        } finally parsed.unpersist()
        afterUpsert() // test seam: simulate eviction between loads and M1
        store.upsert("RawDayData", diff) // M1 — the commit marker
      }
      nChanged
    } finally dropStaged()
  }
}
