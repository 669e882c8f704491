package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.BloomPrune
import graft.queries.Analytics

/** Round-9 validation/pruning operators: the quality-audit ledger's
  * violation detectors, Bloom-prune exactness and bit-level properties,
  * bigram-rarity model determinism, and mixture-plan capping. */
class ValidationOpsSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("q89 audit detects every planted violation class exactly once") {
    val dir = tmpDir("audit")
    Seq(
      (1L, 1, 10.0, 0.00, "A", Option(ts("1995-01-01"))),
      (1L, 2, 46.0, 0.00, "N", Option(ts("1995-01-02"))), // qty_over_45
      (2L, 1, 0.5, 0.09, "R", Option(ts("1995-01-03"))), // range + discount
      (2L, 1, 5.0, 0.00, "X", Option.empty[Timestamp]), // dup pair + flag + null
      (99L, 1, 40.0, 0.00, "A", Option(ts("1995-01-04")))) // orphan order
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_returnflag", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq(1L, 2L).toDF("o_orderkey").write.parquet(s"$dir/orders.parquet")
    val got = Analytics.q89QualityAudit(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "row_count" -> 5L, "null_shipdate" -> 1L, "null_returnflag" -> 0L,
      "flag_domain_viol" -> 1L, "qty_range_viol" -> 1L, "qty_over_45" -> 1L,
      "discount_over_8pct" -> 1L, "min_quantity" -> 0L, "max_quantity" -> 46L,
      "distinct_orderkey" -> 3L, "distinct_line_pairs" -> 4L,
      "orphan_orderkeys" -> 1L))
  }

  test("bloom mask: no false negatives, bounded words, tiny fp rate") {
    val keys = spark.range(0, 1000).select($"id".as("k"))
    val mask = BloomPrune.build(keys, "k")
    assert(mask.words.length == 2048) // 2^17 bits / 64 — 16 KB, corpus-size-free
    // EVERY inserted key must test positive — the property that makes the
    // prune safe to compose with an exact join
    assert(keys.where(!mask.mightContain($"k")).count() == 0)
    // false-positive rate on a disjoint key range: with 3k bits set of
    // 131072 the expected rate is ~1e-5; assert an order of magnitude slack
    val fp = spark.range(1000000, 1010000).select($"id".as("k"))
      .where(mask.mightContain($"k")).count()
    assert(fp < 100, s"fp rate too high: $fp / 10000")
  }

  test("buildSized scales bits with build cardinality and respects the caps") {
    // 1000 keys × 16 bits/key = 16000 → 2^14 floor applies
    val small = BloomPrune.buildSized(
      spark.range(0, 1000).select($"id".as("k")), "k")
    assert(small.nBits == (1L << 14))
    // 40k keys × 16 = 640k → 2^20; the fixed default (2^17) would sit at
    // ~1 set bit per word here — the saturation cliff buildSized exists for
    val big = BloomPrune.buildSized(
      spark.range(0, 40000).select($"id".as("k")), "k")
    assert(big.nBits == (1L << 20))
    val fp = spark.range(1000000, 1010000).select($"id".as("k"))
      .where(big.mightContain($"k")).count()
    assert(fp < 300, s"sized mask fp rate too high: $fp / 10000")
  }

  test("bloom prune + exact rejoin is bit-identical to the unpruned semi join") {
    val fact = spark.range(0, 5000)
      .select(($"id" % 700).as("k"), ($"id" * 3 % 101).as("v"))
    val dim = spark.range(0, 40).select(($"id" * 17 % 700).as("k")).distinct()
    val mask = BloomPrune.build(dim, "k")
    val pruned = fact.where(mask.mightContain($"k"))
      .join(dim, Seq("k"), "left_semi")
      .groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("sv"))
    val plain = fact.join(dim, Seq("k"), "left_semi")
      .groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("sv"))
    assert(pruned.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(pruned).count() == 0)
  }

  test("q91 engine ranks equal the full-window twin; OOV and gate behave") {
    // >256 distinct bigrams so the OOV regime actually exercises: one doc
    // of a single repeated bigram (rank 1) and one doc of 300 unique tokens
    val common = (1 to 50).map(_ => "a b").mkString(" ") // "b a" bridges too
    val rare = (1 to 300).map(i => s"tok$i").mkString(" ")
    val dir = tmpDir("rarity")
    Seq((1L, common), (2L, rare)).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = Analytics.q91BigramRarity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getBoolean(5)))
    val Seq(d1, d2) = got.toSeq.sortBy(_._1)
    assert(d1._6, "all-common doc must pass the gate")
    assert(d1._5 <= 200, s"common doc centirank should be ~rank 1-2: $d1")
    assert(!d2._6, "all-rare doc must fail the gate")
    assert(d2._3 > 0, "rare doc must have OOV bigrams")
    // determinism twin: the driver-ranked top-256 model must equal the
    // window-ranked model computed wholly in Spark
    val bigrams = Seq((1L, common), (2L, rare)).toDF("doc_id", "text")
      .select($"doc_id", split($"text", " ").as("a"))
      .where(size($"a") >= 2)
      .select($"doc_id", explode(transform(sequence(lit(0), size($"a") - 2),
        i => concat_ws(" ", element_at($"a", i + 1),
          element_at($"a", i + 2)))).as("bg"))
    import org.apache.spark.sql.expressions.Window
    val twinVocab = bigrams.groupBy($"bg").agg(count(lit(1)).as("c"))
      .withColumn("rank",
        row_number().over(Window.orderBy($"c".desc, $"bg")))
      .where($"rank" <= 256)
    val twin = bigrams.join(twinVocab.select($"bg", $"rank"), Seq("bg"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when($"rank".isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(coalesce($"rank", lit(512)).cast("long")).as("sum_rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSet == twin)
  }

  test("q93 removes >=3-doc chunks, keeps rarer ones, rebuilds in order") {
    def chunk(p: String) = (1 to 8).map(i => s"$p$i").mkString(" ")
    val (x, y) = (chunk("x"), chunk("y"))
    // ids chosen to dodge the %4/%10 banner plant — the fixture plants its
    // own boilerplate (x appears in 4 distinct docs; y in only 2)
    val docs = Seq(
      (1L, s"$x $y ${chunk("a")}"),
      (2L, s"$y $x ${chunk("b")}"),
      (3L, s"$x ${chunk("c")}"),
      (5L, x)) // all-boilerplate doc: rebuilt empty
      .toDF("doc_id", "text")
    val dir = tmpDir("boiler")
    docs.write.parquet(s"$dir/documents.parquet")
    val got = Analytics.q93Boilerplate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    def m(t: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(t)
    assert(got.toSeq == Seq(
      (1L, 3, 2, m(s"$y ${chunk("a")}")), // x cut, order y-then-a preserved
      (2L, 3, 2, m(s"$y ${chunk("b")}")), // middle chunk cut, ends rejoin
      (3L, 2, 1, m(chunk("c"))),
      (5L, 1, 0, m(""))))
  }

  test("q94 containment is asymmetric: short-in-long fires one direction") {
    val short = (1 to 10).map(i => s"x$i").mkString(" ")
    val long = short + " " + (1 to 40).map(i => s"y$i").mkString(" ")
    val dir = tmpDir("contain")
    Seq((1L, short), (2L, long), (3L, "unrelated words entirely here now"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = Analytics.q94Containment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // doc 1 has 8 trigram shingles, all in doc 2 → C(1,2) = 1.0;
    // doc 2 has 48, only 8 shared → C(2,1) = 1/6 < 0.5 — not emitted
    assert(got.toSeq == Seq((1L, 2L, 8L, 1000000)))
  }

  test("q92 mixture plan caps low-resource languages at 1.0 and bills exactly") {
    val tok10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val dir = tmpDir("mixture")
    ((1 to 8).map(i => (i.toLong, "en", tok10)) :+ (9L, "de", tok10))
      .toDF("doc_id", "lang", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = Analytics.q92MixturePlan(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getInt(5), r.getLong(6))).toMap
    // tot = 90, target = 90 div 4 = 22 per language
    assert(got("en") == ((8L, 80L, 888888, 22L, 275000, 22L)))
    // de has 10 < 22 target tokens: capped at 1.0, shortfall visible
    assert(got("de") == ((1L, 10L, 111111, 22L, 1000000, 10L)))
  }
}
