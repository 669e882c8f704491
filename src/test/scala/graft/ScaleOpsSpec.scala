package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, Skew}
import graft.streaming.EventsStream

/** Scale-path operators: top-k aggregator ≡ window ranking, salted join ≡
  * plain join, gap sessionization semantics. */
class ScaleOpsSpec extends SparkSpec {
  import sqlImplicits._

  test("TopKAggregator path produces exactly the window-ranking result") {
    val emb = (0L until 60L).map { i =>
      (i, Seq.tabulate(12)(j => math.sin(i * 2.3 + j * 0.7).toFloat))
    }.toDF("vec_id", "embedding")
    val win = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      col("id") < 4, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).sorted
    val agg = Similarity.bruteForceTopKAgg(emb, "vec_id", "embedding",
      col("id") < 4, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).sorted
    assert(win.toSeq == agg.toSeq)

    // NaN scores must rank exactly as the window path ranks them: Spark
    // sorts NaN as the LARGEST double, so it takes rank 1 — and it must
    // not poison the aggregator's admission check (a raw `>` is false
    // against NaN, which would freeze a full buffer and drop genuinely
    // better candidates arriving after it)
    val pairs = Seq(
      (0L, 1L, 0.9), (0L, 2L, Double.NaN), (0L, 3L, 0.8),
      (0L, 4L, 0.95), (0L, 5L, 0.1), (0L, 6L, 0.99))
      .toDF("qid", "nid", "sim")
    val winN = pairs
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid")
          .orderBy($"sim".desc, $"nid")))
      .where($"rank" <= 3).select($"qid", $"rank", $"nid")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    val aggN = Similarity.rankTopKAgg(pairs, 3)
      .select($"qid", $"rank", $"nid")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(winN.toSeq == aggN.toSeq,
      s"NaN handling diverged: win=${winN.toSeq} agg=${aggN.toSeq}")
    assert(winN.map(_._3).toSet == Set(2L, 4L, 6L),
      "NaN ranks first; 0.99 and 0.95 follow")
  }

  test("salted join ≡ plain join on a skewed key distribution") {
    val big = (0 until 5000).map(i =>
      (if (i % 10 == 0) 1L else (i % 50).toLong, i.toLong)).toDF("k", "payload")
    val small = (0L until 50L).map(k => (k, s"dim-$k")).toDF("k", "name")
    val plain = big.join(small, "k").groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"payload").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val salted = Skew.saltedJoin(big, small, "k", 8).groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"payload").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(plain.toSeq == salted.toSeq)
  }

  test("salting bounds the hot key's per-task input") {
    // 10% of a 5000-row fact side lands on one key: the per-(key, salt)
    // group — what one task ingests after the salted shuffle — must shrink
    // by ~salts× vs the unsalted hot partition. This is the property the
    // operator exists for; the equal-results property is pinned above.
    val big = (0 until 5000).map(i =>
      (if (i % 10 == 0) 1L else (i % 50).toLong, i.toLong)).toDF("k", "payload")
    val hotMax = big.groupBy($"k").count()
      .agg(max($"count")).first().getLong(0)
    val saltedMax = Skew.saltBig(big, 8).groupBy($"k", $"_salt").count()
      .agg(max($"count")).first().getLong(0)
    assert(hotMax >= 500, s"fixture lost its skew ($hotMax)")
    assert(saltedMax <= hotMax / 4,
      s"salting left a $saltedMax-row group from a $hotMax-row hot key")
  }

  test("sequence packing: offsets invariant to bucket count; buckets scale with cluster") {
    val docs = (0L until 400L)
      .map(i => (i, Seq.fill((i % 7 + 1).toInt)(s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    def packed(nBuckets: Long): Seq[(Long, Int, Int, Int)] =
      graft.queries.Analytics.sequencePack(docs, 64, nBuckets).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    // the bucketing is internal plumbing: global offsets must not change
    // with the bucket count, which is what lets q56 derive it from the
    // cluster's parallelism without touching the oracle hash
    val small = packed(3)
    assert(packed(29) == small)
    assert(packed(997) == small) // more buckets than docs: empties collapse
    // q56's derived count scales with the executors (×4, floor 8) — the
    // within-bucket running sum is the only serial-per-bucket stage. Pin
    // the PRODUCTION derivation at controlled inputs: hardcoding 8 again
    // (the round-3 verdict's scale ceiling) fails the 64-core case.
    assert(graft.queries.Analytics.packBuckets(1) == 8L)
    assert(graft.queries.Analytics.packBuckets(2) == 8L)
    assert(graft.queries.Analytics.packBuckets(64) == 256L)
    assert(graft.queries.Analytics.packBuckets(1000) == 4000L)
  }

  test("sessionize: gap closes a session with correct bounds and totals") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ts(minOffset: Long) = new java.sql.Timestamp(t0 + minOffset * 60000L)
    // user 7: 3 events within 10 min, then a 2h gap, then 2 more;
    // user 9's late event pushes processing along
    val rows = Seq(
      (1L, ts(0), 7L, "view", 1.0, "{}"),
      (2L, ts(5), 7L, "view", 2.0, "{}"),
      (3L, ts(10), 7L, "click", 3.0, "{}"),
      (4L, ts(130), 7L, "view", 4.0, "{}"),
      (5L, ts(135), 7L, "purchase", 5.0, "{}"),
      (6L, ts(300), 9L, "view", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val src = tmpDir("sess-src")
    rows.write.mode("overwrite").parquet(src)
    val out = tmpDir("sess-out")
    val q = EventsStream.sessionize(
      spark.readStream.schema(rows.schema).parquet(src)
        .withWatermark("ts", "10 minutes"), gapMinutes = 30)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmpDir("sess-ckpt"))
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val sessions = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4)))
    // the first user-7 session must be closed by the in-batch gap
    val s1 = sessions.find(s => s._1 == 7L && s._2 == ts(0))
    assert(s1.isDefined, s"missing first session in ${sessions.mkString(", ")}")
    assert(s1.get._3 == ts(10) && s1.get._4 == 3L && s1.get._5 == 6.0)
  }
}
