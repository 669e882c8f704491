package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Extractors
import graft.sources.{DaySource, TableStore}

/** The Structured-Streaming upgrade of the ETL flow (SURVEY §2.10: an
  * extension, not a reference semantic): fetched day documents land as
  * JSON-lines files in a staging dir; this job ingests whatever has arrived
  * (`Trigger.AvailableNow`), dedups per micro-batch on the day key, and
  * applies the SAME diff → upsert → extract-branch load the batch pipeline
  * uses, via foreachBatch — one code path for batch and streaming.
  *
  * Change detection (D2) happens inside the batch function against the
  * current store state, so re-delivered or unchanged days are no-ops —
  * exactly the incremental semantics the reference implements by hand.
  */
object DayStream {

  def run(spark: SparkSession, stagingDir: String,
          store: TableStore, checkpointDir: String,
          maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    store.init()
    val reader = spark.readStream
      .schema(DaySource.daySchema)
      .option("mode", "PERMISSIVE") // a poison file must not kill the stream
    val days = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .json(stagingDir)

    val q = days.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // within-batch dedup on the PK (last file wins is not meaningful for
        // identical re-deliveries; for conflicting ones the diff still keys
        // on full record equality)
        val deduped = batch.dropDuplicates("username", "date")
        val serialized = Extractors.serializeDays(deduped)
        // staged, not persisted: upsert swaps away the diff's source dir, so
        // eviction+recompute would silently lose the batch (see EtlPipeline)
        val (diff, dropStaged) = store.stage(
          Extractors.changedDays(serialized, store.read("RawDayData")))
        try {
          if (diff.count() > 0) {
            store.upsert("RawDayData", diff)
            val parsed = Extractors.deserializeDays(diff)
            store.replaceDays("Notes", Extractors.extractNotes(parsed))
            store.replaceDays("Water", Extractors.extractWater(parsed))
            store.replaceDays("Goals", Extractors.extractGoals(parsed))
            store.replaceDays("Meals", Extractors.extractMeals(parsed))
            store.replaceDays("MealEntries", Extractors.extractMealEntries(parsed))
            store.replaceDays("CardioExercises", Extractors.extractCardio(parsed))
            store.replaceDays("StrengthExercises", Extractors.extractStrength(parsed))
            store.upsert("Measurements", Extractors.extractMeasurements(parsed))
          }
        } finally dropStaged()
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
