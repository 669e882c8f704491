package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Keyed session accumulator for [[EventsStream.sessionize]]. */
case class SessionState(start: Long, lastTs: Long, n: Long, total: Double)

/** Carried last event per user for [[EventsStream.transitions]]. */
case class LastEvent(ts: Long, eventId: Long, eventType: String)

/** Open merged segments per key for [[EventsStream.coalesceIntervals]]
  * (millis, sorted, non-overlapping). */
case class SegmentsState(segs: List[(Long, Long, Long)])

/** One emitted closed segment: merged cover [seg_start, seg_end) built
  * from n_intervals source intervals. */
case class Segment(k: Long, seg_start: java.sql.Timestamp,
                   seg_end: java.sql.Timestamp, n_intervals: Long)

/** One emitted adjacent-pair transition. */
case class Transition(user_id: Long, from_type: String, to_type: String)

/** Carried last non-purchase touch per user for
  * [[EventsStream.attribution]] (floor-second event time + type). */
case class LastTouch(sec: Long, touchType: String)

/** One emitted attributed conversion. */
// value_c is Option: the batch twin's `cents(value)` maps a NULL purchase
// value to NULL (downstream sums skip it) — a non-nullable Long here would
// instead kill the stream with a null-in-non-nullable-field decode error
// on the first null-valued purchase, diverging from batch.
case class Attributed(event_id: Long, touch_type: String,
                      value_c: Option[Long])

/** Emitted closed session. */
case class Session(user_id: Long, session_start: java.sql.Timestamp,
                   session_end: java.sql.Timestamp, n_events: Long,
                   total_value: Double)

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

  /** events.parquet physical schema in its OLDER vintage (ts is
    * TIMESTAMP(NANOS) → read as long via nanosAsLong, converted to micros
    * exactly with integer div). Kept public for fixtures that stage raw
    * nanos-long files; [[readEventsNoDedup]] probes the actual on-disk ts
    * type and substitutes it here, so both data vintages stream. */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Source → cleaned, watermarked, deduplicated event frame. */
  def readEvents(spark: SparkSession, srcPath: String,
                 watermark: String = "1 hour"): DataFrame =
    readEventsNoDedup(spark, srcPath)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Source without the watermark/dedup stage (stream–stream joins attach
    * their own per-side watermarks). */
  def readEventsNoDedup(spark: SparkSession, srcPath: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Streaming sources need an explicit schema; a one-time batch footer
    // probe yields the physical ts type (nanos LONG vs TIMESTAMP_NTZ micros
    // — see Tables.normalizeTs) so the schema matches whichever vintage of
    // generator wrote the files. Driver cost: one footer read at plan time.
    val tsType = spark.read.parquet(srcPath).schema("ts").dataType
    val schema = StructType(rawSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
    graft.sources.Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(srcPath))
  }

  /** Tumbling-window rollup per event type. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total"))

  /** Per-user gap-based sessionization via `flatMapGroupsWithState` —
    * custom keyed state the built-in windowed aggregates can't express.
    * A session closes when the next event arrives more than `gapMinutes`
    * later (emitted immediately) or when event time moves past the gap
    * (state timeout). State per key is one small struct; the watermark
    * bounds it. */
  def sessionize(events: DataFrame, gapMinutes: Int): Dataset[Session] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def update(uid: Long, it: Iterator[(Long, java.sql.Timestamp, Double)],
               state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(Session(uid, new java.sql.Timestamp(s.start),
          new java.sql.Timestamp(s.lastTs), s.n, s.total))
      } else {
        val evs = it.toSeq.sortBy(_._2.getTime)
        var cur = state.getOption
        val closed = Seq.newBuilder[Session]
        evs.foreach { case (_, ts, v) =>
          val t = ts.getTime
          cur match {
            // late arrival (above the watermark, delivered a batch behind)
            // more than a gap BEFORE the open session: a session of its
            // own in the past, already closed — merging would stretch the
            // session across a silence longer than the gap
            case Some(s) if t < s.start - gapMs =>
              closed += Session(uid, ts, ts, 1, v)
            case Some(s) if t - s.lastTs <= gapMs =>
              // min/max, not (start, t): a late event inside the session
              // must not REGRESS lastTs — that re-arms the timeout from
              // the older time and a following event can falsely split
              // the session (end would also rewind below observed events)
              cur = Some(SessionState(math.min(s.start, t),
                math.max(s.lastTs, t), s.n + 1, s.total + v))
            case Some(s) =>
              closed += Session(uid, new java.sql.Timestamp(s.start),
                new java.sql.Timestamp(s.lastTs), s.n, s.total)
              cur = Some(SessionState(t, t, 1, v))
            case None =>
              cur = Some(SessionState(t, t, 1, v))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // A user whose latest event lags the global watermark by more than
          // the gap (multi-batch catch-up) would set a timeout in the past —
          // Spark throws "Timeout timestamp cannot be earlier than the
          // current watermark" and kills the query. The session is already
          // closeable, so clamp forward to the next watermark tick.
          state.setTimeoutTimestamp(
            math.max(s.lastTs + gapMs, state.getCurrentWatermarkMs() + 1))
        }
        closed.result().iterator
      }
    }

    events.select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming twin of q130's transition matrix (the round-11 batch
    * operator): per-user adjacent-pair extraction via
    * `flatMapGroupsWithState`. State per key is ONE carried (ts, event_id,
    * event_type); each arriving event emits a (from, to) pair against it
    * and replaces it. Within a batch the group's events sort by
    * (ts, event_id) — the identical total order q130's lead() window uses
    * — so for any batch split that respects per-user event-time order the
    * emitted pair multiset equals the batch window's exactly (pinned in
    * EventsStreamSpec against Curation.q130MarkovTransitions on the same
    * rows, split mid-user across triggers). A genuinely late event would
    * pair against the carried state rather than its true predecessor —
    * production fronts this with the watermark + ordering buffer the
    * sessionizer documents; counts downstream are a streaming aggregate.
    * State never exceeds one small struct per active user. */
  def transitions(events: DataFrame): Dataset[Transition] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._

    def update(uid: Long,
               it: Iterator[(Long, java.sql.Timestamp, Long, String)],
               state: GroupState[LastEvent]): Iterator[Transition] = {
      // sort by the FULL instant (epoch-millis alone truncates the
      // microsecond component a TimestampType carries, so two events in
      // the same millisecond could pair in the opposite order from q130's
      // lead() window, which orders by the complete timestamp): getTime
      // gives the integral millis, getNanos the sub-second refinement
      val evs = it.toSeq.sortBy { e =>
        val i = e._2.toInstant; (i.getEpochSecond, i.getNano, e._3)
      }
      var last = state.getOption
      val out = Seq.newBuilder[Transition]
      evs.foreach { case (_, ts, eid, et) =>
        last.foreach(l => out += Transition(uid, l.eventType, et))
        last = Some(LastEvent(ts.getTime, eid, et))
      }
      last.foreach(state.update)
      out.result().iterator
    }

    events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Streaming twin of q131's last-touch attribution: per-user carried
    * (floor-second, type) of the most recent NON-purchase event via
    * `flatMapGroupsWithState`; each purchase emits its attributed touch —
    * the carried type if it lies within 3600 s, else 'none' — and value
    * cents (HALF_UP on the double, exactly the batch `cents` recipe).
    * Within a batch the group's events sort by the full microsecond
    * instant then event_id — the identical total order q131's window
    * uses — so for any batch split respecting per-user event-time order
    * the emitted conversion multiset equals the batch twin's (pinned in
    * EventsStreamSpec against Curation.q131Attribution on the same rows,
    * split mid-user across triggers). State is ONE small struct per
    * active user; the per-touch-type rollup downstream is an ordinary
    * streaming aggregate. */
  def attribution(events: DataFrame): Dataset[Attributed] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._

    def update(uid: Long,
               it: Iterator[(Long, java.sql.Timestamp, Long, String,
                 Option[Double])],
               state: GroupState[LastTouch]): Iterator[Attributed] = {
      val evs = it.toSeq.sortBy { e =>
        val i = e._2.toInstant; (i.getEpochSecond, i.getNano, e._3)
      }
      var touch = state.getOption
      val out = Seq.newBuilder[Attributed]
      evs.foreach { case (_, ts, eid, et, v) =>
        val sec = ts.toInstant.getEpochSecond
        if (et == "purchase") {
          // Option decode + Option cents: a null-valued purchase still
          // ATTRIBUTES (the touch lookup is value-independent) but carries
          // value_c = null, exactly the batch cents(null) behaviour
          val vc = v.map(d => java.math.BigDecimal.valueOf(d * 100)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue)
          val t = touch match {
            case Some(lt) if sec - lt.sec <= 3600L => lt.touchType
            case _ => "none"
          }
          out += Attributed(eid, t, vc)
        } else touch = Some(LastTouch(sec, et))
      }
      touch.foreach(state.update)
      out.result().iterator
    }

    events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, String, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Streaming twin of q124's interval coalescing: per-key merge of
    * overlapping [st, en) validity windows via `flatMapGroupsWithState`.
    * State per key is the sorted list of OPEN merged segments; each batch
    * folds its intervals in (merge-on-insert, so state is bounded by the
    * number of disjoint open segments, not by interval count). A segment
    * closes — and emits — once the event-time watermark passes its end:
    * the watermark guarantees no future interval starts before it, and an
    * extender would need `start ≤ seg_end < watermark`, which the
    * watermark filter drops. Same adjacency convention as q124's batch
    * sweep: intervals touching at a point (st == seg_end) MERGE (the
    * running-max-end sweep opens a new segment only on `st > pmax`).
    * EventTimeTimeout flushes closeable segments even when a key receives
    * no further rows (timeout clamped past the watermark, the sessionize
    * lesson). EventsStreamSpec pins multi-batch emitted segments —
    * including a bridge interval that arrives AFTER its two neighbours —
    * against the batch sweep's merge of the same rows. */
  def coalesceIntervals(iv: DataFrame): Dataset[Segment] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = iv.sparkSession
    import spark.implicits._

    def fold(segs: List[(Long, Long, Long)],
             x: (Long, Long)): List[(Long, Long, Long)] = {
      // absorb every segment overlapping-or-touching [st, en)
      val (touch, rest) = segs.partition { case (s, e, _) =>
        x._1 <= e && s <= x._2
      }
      val merged = (
        (x._1 +: touch.map(_._1)).min,
        (x._2 +: touch.map(_._2)).max,
        1L + touch.map(_._3).sum)
      (merged +: rest).sortBy(_._1)
    }

    def update(k: Long, it: Iterator[(Long, java.sql.Timestamp, java.sql.Timestamp)],
               state: GroupState[SegmentsState]): Iterator[Segment] = {
      val wm = state.getCurrentWatermarkMs()
      var segs = state.getOption.map(_.segs).getOrElse(Nil)
      it.foreach(r => segs = fold(segs, (r._2.getTime, r._3.getTime)))
      val (closed, open) = segs.partition(_._2 < wm)
      if (open.isEmpty) state.remove()
      else {
        state.update(SegmentsState(open))
        // earliest open end decides when the next segment can close;
        // clamp past the watermark (a past-due timeout kills the query)
        state.setTimeoutTimestamp(math.max(open.map(_._2).min + 1, wm + 1))
      }
      closed.sortBy(_._1).map { case (s, e, n) =>
        Segment(k, new java.sql.Timestamp(s), new java.sql.Timestamp(e), n)
      }.iterator
    }

    iv.select(col("k"), col("st_ts"), col("en_ts"))
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Parse the simple "N unit" interval strings this module accepts, for
    * comparing durations (not a general INTERVAL parser). */
  private[streaming] def intervalMs(s: String): Long = {
    val Array(n, unit) = s.trim.toLowerCase.split("\\s+")
    val base = unit.stripSuffix("s") match {
      case "second" => 1000L
      case "minute" => 60000L
      case "hour" => 3600000L
      case "day" => 86400000L
      case u => throw new IllegalArgumentException(s"unsupported unit $u in '$s'")
    }
    n.toLong * base
  }

  /** Stream–stream interval join: attribute each purchase to the views by
    * the same user in the preceding `attributionWindow`. Both sides carry
    * watermarks delayed by max(window, lateness): the window component keeps
    * view state alive for the full attribution range (a fixed 1-hour delay
    * silently evicted state inside a longer window), while `lateness` keeps
    * the out-of-order tolerance independent of the window (deriving the
    * delay from the window ALONE would shrink tolerance for short windows).
    * The join condition bounds the time range, so state for either side is
    * evicted once the watermark passes the interval — the canonical
    * bounded-state stream join. */
  def purchaseAttribution(events: DataFrame,
                          attributionWindow: String = "1 hour",
                          lateness: String = "1 hour"): DataFrame = {
    val delay =
      if (intervalMs(attributionWindow) >= intervalMs(lateness)) attributionWindow
      else lateness
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", delay)
    val views = events.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", delay)
    purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $attributionWindow") &&
        col("v_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"))
  }

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
