package graft

import graft.streaming.EventsStream

/** Streaming ingest against the real events table: watermarked windows must
  * match the batch computation for every window the watermark finalized. */
class EventsStreamSpec extends SparkSpec {

  /** Write `df` as a single parquet file named `name` inside `dir`, with a
    * controlled modification time so the file source's per-trigger order
    * (sorted by mtime) is deterministic. */
  private def stageFile(df: org.apache.spark.sql.DataFrame, dir: String,
                        name: String, mtimeMs: Long): Unit = {
    val tmp = tmpDir(s"stage-$name")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    val dest = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.copy(part, dest)
    java.nio.file.Files.setLastModifiedTime(dest,
      java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
  }

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

  test("sessionize: laggy user in multi-batch catch-up does not kill the query") {
    import sqlImplicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ts(minOffset: Long) = new java.sql.Timestamp(t0 + minOffset * 60000L)
    def rows(xs: (Long, java.sql.Timestamp, Long, String, Double, String)*) =
      xs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    // batch 1: user 7 opens a session at t=0; user 9 is 10h ahead in event
    // time, so the watermark after this batch is far past user 7's state
    val src = tmpDir("lag-src")
    stageFile(rows((1L, ts(0), 7L, "view", 1.0, "{}"),
                   (2L, ts(600), 9L, "view", 1.0, "{}")), src, "b1.parquet", 1000000L)
    // batch 2: user 7's next event is hundreds of minutes behind the global
    // watermark — the unclamped setTimeoutTimestamp(lastTs + gap) here threw
    // "Timeout timestamp cannot be earlier than the current watermark"
    stageFile(rows((3L, ts(20), 7L, "view", 2.0, "{}"),
                   (4L, ts(610), 9L, "view", 1.0, "{}")), src, "b2.parquet", 2000000L)

    val out = tmpDir("lag-out")
    val schema = rows().schema
    val q = EventsStream.sessionize(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .withWatermark("ts", "10 minutes"), gapMinutes = 30)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmpDir("lag-ckpt"))
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination() // throws StreamingQueryException on the old code
    val sessions = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    assert(sessions.exists(s => s._1 == 7L && s._2 == ts(0)),
      s"user 7's first session missing from ${sessions.mkString(", ")}")
  }

  test("sessionize: a late in-session event cannot regress the session end") {
    import sqlImplicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ts(minOffset: Long) = new java.sql.Timestamp(t0 + minOffset * 60000L)
    def rows(xs: (Long, java.sql.Timestamp, Long, String, Double, String)*) =
      xs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    // gap 30 min, watermark 30 min. b1 opens user 7's session (t=0, 25);
    // b2 delivers a LATE event t=5 (above watermark, inside the session);
    // b3's t=45 is 20 min after the true session end (25) — overwriting
    // lastTs with the late 5 would make this look like a 40-min silence
    // and falsely split the session; b4's user-9 event pushes the
    // watermark past the timeout so the session emits
    val src = tmpDir("late-src")
    stageFile(rows((1L, ts(0), 7L, "view", 1.0, "{}"),
                   (2L, ts(25), 7L, "view", 1.0, "{}")),
      src, "b1.parquet", 1000000L)
    stageFile(rows((3L, ts(5), 7L, "view", 1.0, "{}")),
      src, "b2.parquet", 2000000L)
    stageFile(rows((4L, ts(45), 7L, "view", 1.0, "{}")),
      src, "b3.parquet", 3000000L)
    stageFile(rows((5L, ts(120), 9L, "view", 1.0, "{}")),
      src, "b4.parquet", 4000000L)

    val out = tmpDir("late-out")
    val schema = rows().schema
    val q = EventsStream.sessionize(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .withWatermark("ts", "30 minutes"), gapMinutes = 30)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmpDir("late-ckpt"))
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val u7 = spark.read.parquet(out).collect()
      .filter(_.getLong(0) == 7L)
      .map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(u7.toSeq == Seq((ts(0), ts(45), 4L)),
      s"expected ONE unsplit session (0..45, n=4), got ${u7.mkString(", ")}")
  }

  test("transitions: multi-batch stream pairs equal the batch q130 matrix") {
    import sqlImplicits._
    import org.apache.spark.sql.functions._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ts(minOffset: Long) = new java.sql.Timestamp(t0 + minOffset * 60000L)
    def rows(xs: (Long, java.sql.Timestamp, Long, String, Double, String)*) =
      xs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    // user 7's chain is SPLIT mid-user across triggers (view→click in b1,
    // click→purchase bridged by carried state into b2); user 9 interleaves
    // a same-timestamp pair in b2 so the (ts, event_id) tie-break is
    // exercised on both sides
    val b1 = rows((1L, ts(0), 7L, "view", 1.0, "{}"),
      (2L, ts(5), 7L, "click", 1.0, "{}"),
      (3L, ts(1), 9L, "view", 1.0, "{}"))
    val b2 = rows((4L, ts(10), 7L, "purchase", 1.0, "{}"),
      (5L, ts(20), 9L, "click", 1.0, "{}"),
      (6L, ts(20), 9L, "error", 1.0, "{}"))
    val src = tmpDir("trans-src")
    stageFile(b1, src, "b1.parquet", 1000000L)
    stageFile(b2, src, "b2.parquet", 2000000L)

    val out = tmpDir("trans-out")
    val schema = rows().schema
    val q = EventsStream.transitions(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(src))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmpDir("trans-ckpt"))
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.read.parquet(out)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sorted

    // batch twin on the SAME rows through the real catalog query
    val dir = tmpDir("trans-batch")
    b1.unionAll(b2).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.queries.Curation.q130MarkovTransitions(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sorted
    assert(streamed.toSeq == batch.toSeq,
      s"stream ${streamed.mkString(",")} != batch ${batch.mkString(",")}")
  }

  test("attribution: multi-batch stream rollup equals the batch q131") {
    import sqlImplicits._
    import org.apache.spark.sql.functions._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ts(minOffset: Long) = new java.sql.Timestamp(t0 + minOffset * 60000L)
    def rows(
        xs: (Long, java.sql.Timestamp, Long, String, java.lang.Double,
          String)*) =
      xs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    // user 7: touch chain split across triggers (view, click in b1;
    // purchase in b2 attributes to the CARRIED click); user 8's touch is
    // stale (> 3600 s) -> none; user 9 purchases with no touch -> none;
    // user 10's view and purchase share one timestamp, event_id order
    // makes the view a valid preceding touch; user 11's purchase carries a
    // NULL value — it must still attribute (value_c null, sums skip it),
    // not kill the stream with a null-in-non-nullable decode error
    val b1 = rows(
      (1L, ts(0), 7L, "view", 1.0, "{}"),
      (2L, ts(5), 7L, "click", 1.0, "{}"),
      (3L, ts(0), 8L, "click", 1.0, "{}"))
    val b2 = rows(
      (4L, ts(10), 7L, "purchase", 10.005, "{}"),
      (5L, ts(70), 8L, "purchase", 5.5, "{}"),
      (6L, ts(15), 9L, "purchase", 2.25, "{}"),
      (7L, ts(20), 10L, "view", 1.0, "{}"),
      (8L, ts(20), 10L, "purchase", 1.0, "{}"),
      (9L, ts(25), 11L, "view", 1.0, "{}"),
      (10L, ts(30), 11L, "purchase", null, "{}"))
    val src = tmpDir("attr-src")
    stageFile(b1, src, "b1.parquet", 1000000L)
    stageFile(b2, src, "b2.parquet", 2000000L)

    val out = tmpDir("attr-out")
    val q = EventsStream.attribution(
        spark.readStream.schema(rows().schema)
          .option("maxFilesPerTrigger", 1).parquet(src))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmpDir("attr-ckpt"))
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.read.parquet(out)
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n"), sum(col("value_c")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted
    // the fixture must land one row in each attribution arm
    assert(streamed.map(_._1).toSeq == Seq("click", "none", "view"))

    val dir = tmpDir("attr-batch")
    b1.unionAll(b2).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.queries.Curation.q131Attribution(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted
    assert(streamed.toSeq == batch.toSeq,
      s"stream ${streamed.mkString(",")} != batch ${batch.mkString(",")}")
  }

  test("transitions: same-millisecond microsecond ordering matches batch") {
    // ADVICE r12: the stream sort keyed on Timestamp.getTime (millis) while
    // the batch q130 window orders by the FULL microsecond instant — two
    // events inside one millisecond whose event_id order OPPOSES their
    // microsecond order would pair backwards stream-vs-batch. Pin the
    // adversarial case: id 1 at .0019, id 2 at .0011 (millis tie, id order
    // inverted vs micro order), then a .0020 closer.
    import sqlImplicits._
    import org.apache.spark.sql.functions._
    def rows(xs: (Long, java.sql.Timestamp, Long, String, Double, String)*) =
      xs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val b1 = rows(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00.0019"), 7L, "view", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00.0011"), 7L, "click", 1.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00.002"), 7L, "purchase", 1.0, "{}"))
    val src = tmpDir("trans-us-src")
    stageFile(b1, src, "b1.parquet", 1000000L)

    val out = tmpDir("trans-us-out")
    val q = EventsStream.transitions(
        spark.readStream.schema(rows().schema).parquet(src))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmpDir("trans-us-ckpt"))
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.read.parquet(out)
      .select(col("from_type"), col("to_type"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    // batch truth: click(.0011) -> view(.0019) -> purchase(.0020); the
    // old millis sort produced view->click instead
    assert(streamed == Seq(("click", "view"), ("view", "purchase")),
      s"stream paired $streamed")

    val dir = tmpDir("trans-us-batch")
    b1.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.queries.Curation.q130MarkovTransitions(spark, dir)
      .select(col("from_type"), col("to_type"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(streamed == batch, s"stream $streamed != batch $batch")
  }

  test("coalesceIntervals: late bridge merges, touch merges, open stays") {
    import sqlImplicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ts(m: Long) = new java.sql.Timestamp(t0 + m * 60000L)
    def rows(xs: (Long, java.sql.Timestamp, java.sql.Timestamp)*) =
      xs.toDF("k", "st_ts", "en_ts")

    // key 7: [0,10) and [20,30) arrive first; the BRIDGE [10,20) arrives a
    // batch later (touching both → one segment of 3). key 8: point-touch
    // pair [0,5)+[5,8) plus a disjoint [50,60) → two segments. key 9's
    // far-future interval pushes the watermark so everything closes via
    // the event-time timeout, and itself stays open (never emitted).
    val src = tmpDir("coal-src")
    stageFile(rows((7L, ts(0), ts(10)), (7L, ts(20), ts(30)),
      (8L, ts(0), ts(5)), (8L, ts(5), ts(8)), (8L, ts(50), ts(60))),
      src, "b1.parquet", 1000000L)
    stageFile(rows((7L, ts(10), ts(20))), src, "b2.parquet", 2000000L)
    stageFile(rows((9L, ts(5000), ts(5010))), src, "b3.parquet", 3000000L)

    val out = tmpDir("coal-out")
    val schema = rows().schema
    val q = EventsStream.coalesceIntervals(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
          .withWatermark("st_ts", "10 minutes"))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmpDir("coal-ckpt"))
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).sortBy(t => (t._1, t._2.getTime))
    assert(got.toSeq == Seq(
      (7L, ts(0), ts(30), 3L),   // bridge fused all three
      (8L, ts(0), ts(8), 2L),    // point-touch merged (q124's st > pmax rule)
      (8L, ts(50), ts(60), 1L)), // disjoint; key 9 stays open, unemitted
      s"got ${got.mkString(", ")}")

    // batch twin: q124's running-max-end sweep over the same rows yields
    // the same (closed) segments
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val all = rows((7L, ts(0), ts(10)), (7L, ts(20), ts(30)),
      (8L, ts(0), ts(5)), (8L, ts(5), ts(8)), (8L, ts(50), ts(60)),
      (7L, ts(10), ts(20)))
    val ord = Window.partitionBy($"k").orderBy($"st_ts", $"en_ts")
    val batch = all
      .withColumn("pmax", max($"en_ts").over(
        ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("opens",
        when($"pmax".isNull || $"st_ts" > $"pmax", 1L).otherwise(0L))
      .withColumn("seg", sum($"opens").over(
        ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"k", $"seg")
      .agg(min($"st_ts").as("s0"), max($"en_ts").as("e1"),
        count(lit(1)).as("n"))
      .where($"k" =!= 9L) // the open key-9 segment is the only difference
      .select($"k", $"s0", $"e1", $"n")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3))).sortBy(t => (t._1, t._2.getTime))
    assert(got.toSeq == batch.toSeq)
  }

  test("attribution window longer than 1h keeps views the old fixed delay dropped") {
    import sqlImplicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def nanos(minOffset: Long) = (t0 + minOffset * 60000L) * 1000000L
    def rows(xs: (Long, Long, Long, String, Double, String)*) =
      xs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    // Views are evicted from join state once the watermark passes
    // v_ts + window; the watermark itself is maxEventTime − delay. With the
    // old hardcoded 1h delay a view was only retained for window+1h behind
    // the newest event; deriving the delay from the window buys window+window.
    // Fixture: user 5's view at t=30 must still be in state when their
    // purchase at t=130 (in the 2h window) arrives in a later batch, with
    // event time already at t=240. Old: wm=180 → view evicted end of b3,
    // purchase late → pair silently lost. Derived: wm=120 → view retained.
    val src = tmpDir("attr-src")
    stageFile(rows((1L, nanos(180), 9L, "view", 1.0, "{}"),
                   (2L, nanos(180), 9L, "purchase", 2.0, "{}")),
      src, "b1.parquet", 1000000L)
    stageFile(rows((3L, nanos(30), 5L, "view", 1.0, "{}")),
      src, "b2.parquet", 2000000L)
    stageFile(rows((4L, nanos(240), 9L, "view", 1.0, "{}"),
                   (5L, nanos(240), 9L, "purchase", 2.0, "{}")),
      src, "b3.parquet", 3000000L)
    // spacer batch: state eviction runs with the watermark the b3 data
    // produced (watermark updates lag a batch)
    stageFile(rows((7L, nanos(240), 9L, "view", 1.0, "{}")),
      src, "b4.parquet", 4000000L)
    stageFile(rows((6L, nanos(130), 5L, "purchase", 9.0, "{}")),
      src, "b5.parquet", 5000000L)

    val out = tmpDir("attr-out")
    val q = EventsStream.purchaseAttribution(
        spark.readStream.schema(EventsStream.rawSchema)
          .option("maxFilesPerTrigger", 1).parquet(src)
          .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000"))),
        attributionWindow = "2 hours")
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmpDir("attr-ckpt"))
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val pairs = spark.read.parquet(out)
      .select("purchase_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((6L, 3L)),
      s"in-window pair dropped by watermark eviction: $pairs")
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
