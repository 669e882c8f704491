package graft

import graft.streaming.EventsStream

/** Streaming ingest against the real events table: watermarked windows must
  * match the batch computation for every window the watermark finalized. */
class EventsStreamSpec extends SparkSpec {

  test("availableNow ingest emits watermark-finalized hourly windows matching batch") {
    val out = tmpDir("stream-out")
    val ckpt = tmpDir("stream-ckpt")
    // file source needs a directory — stage the table as an arriving file
    val src = tmpDir("stream-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(src, "events.parquet"))
    EventsStream.runAvailableNow(spark, src, out, ckpt)

    val streamed = spark.read.parquet(out)
    assert(streamed.count() > 0)

    // batch twin over the same data
    import org.apache.spark.sql.functions._
    val batch = graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

    // every emitted (finalized) window must agree exactly with batch
    val joined = streamed.as("s").join(batch.as("b"),
      Seq("hour_start", "event_type"))
    assert(joined.count() == streamed.count())
    val mismatches = joined
      .where(col("s.n") =!= col("b.n") ||
        abs(col("s.total") - col("b.total")) > 1e-9).count()
    assert(mismatches == 0)

    // the trailing open window (within the 1h watermark) must NOT emit
    val maxBatchHour = batch.agg(max(col("hour_start"))).collect().head.getTimestamp(0)
    val maxStreamed = streamed.agg(max(col("hour_start"))).collect().head.getTimestamp(0)
    assert(maxStreamed.before(maxBatchHour))
  }
}
