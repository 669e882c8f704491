package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming upgrade of the reference's incremental batch ingest
  * (SURVEY §2.10 — an extension, not a reference semantic): file-source
  * events → event-time watermark → exactly-once-per-key dedup within the
  * watermark → tumbling-window aggregation → parquet sink, driven by
  * `Trigger.AvailableNow` so the same job serves both continuous and
  * catch-up batch operation.
  *
  * State stays bounded at scale: the watermark evicts both dedup state and
  * closed windows; parallelism is the shuffle partitioning on
  * (window, event_type) — no per-record driver work anywhere.
  */
object EventsStream {

  /** events.parquet physical schema (ts is TIMESTAMP(NANOS) → read as long
    * via nanosAsLong, converted to micros exactly with integer div). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Source → cleaned, watermarked, deduplicated event frame. */
  def readEvents(spark: SparkSession, srcPath: String,
                 watermark: String = "1 hour"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .parquet(srcPath)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
  }

  /** Tumbling-window rollup per event type. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total"))

  /** Run the ingest to a parquet sink and block until the available data is
    * fully processed (append mode: only watermark-finalized windows emit —
    * the trailing open window stays in state, exactly the semantics a
    * continuously-running job needs). */
  def runAvailableNow(spark: SparkSession, srcPath: String, outDir: String,
                      checkpointDir: String): StreamingQuery = {
    val q = hourlyRollup(readEvents(spark, srcPath))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
