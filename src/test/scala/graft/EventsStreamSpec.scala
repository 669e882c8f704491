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

  test("stream-stream interval join matches the batch interval join") {
    import org.apache.spark.sql.functions._
    val src = tmpDir("ss-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(src, "events.parquet"))
    val out = tmpDir("ss-out")

    val streamEvents = EventsStream.readEventsNoDedup(spark, src)
    val q = EventsStream.purchaseAttribution(streamEvents)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmpDir("ss-ckpt"))
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(out)
      .select("purchase_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed.nonEmpty)

    // batch twin over the same data
    val ev = graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("event_id").as("pid"))
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts").as("vts"), col("event_id").as("vid"))
    val batchPairs = p.join(v,
      col("pu") === col("vu") &&
        col("vts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
        col("vts") <= col("pts"))
      .select(col("pid"), col("vid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // streamed results must be a subset (watermark may hold back the tail)
    assert(streamed.subsetOf(batchPairs))
    // and cover most of the batch result on this bounded dataset
    assert(streamed.size * 10 >= batchPairs.size * 5)
  }
}
