package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

/** Misra-Gries heavy hitters: exact top-k whenever the k-th frequency
  * clears the N/(m+1) guarantee, pinned in the regime where the sketch is
  * GENUINELY lossy (capacity far below the cardinality), plus the local
  * sketch's retention theorem on a single stream. */
class HeavyHittersSpec extends SparkSpec {
  import sqlImplicits._

  test("local sketch retains every item with frequency > N/(m+1)") {
    // 10k-item stream: one item at 6% + uniform junk; m = 31 → threshold
    // N/(m+1) ≈ 3.1% — the sketch must keep the 6% item through ~300
    // decrement storms caused by 9400 near-unique junk items
    val rnd = new scala.util.Random(23)
    val stream = new scala.util.Random(29).shuffle(
      (Seq.fill(600)("HOT") ++ (1 to 9400).map(_ => s"junk${rnd.nextInt(5000)}"))
        .toList)
    val (cands, decremented) = HeavyHitters.misraGries(stream.iterator, 31)
    val kept = cands.toSet
    assert(kept.contains("HOT"))
    assert(kept.size <= 31)
    assert(decremented, "5000-distinct stream at m=31 must have decremented")
  }

  test("lossless sketch skips the frequency guard: low-cardinality corpus is exact at any N") {
    // 26 distinct items at m=64: no partition ever decrements, so the
    // candidate set is exhaustive and counts exact — yet the 3rd count (1)
    // is far below N/(m+1) = 8024/65. The sufficient-but-not-necessary
    // frequency guard must be SKIPPED here, not raise on a provably exact
    // result (a regression an earlier guard version had).
    val data = Seq.fill(5000)("a") ++ Seq.fill(3000)("b") ++
      ('c' to 'z').map(_.toString)
    val ds = data.toDF("item").repartition(4).select($"item").as[String]
    val got = HeavyHitters.topK(ds, k = 3, m = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 5000L), ("b", 3000L), ("c", 1L)))
  }

  test("exact top-k on skewed data while the sketch is lossy; ≡ brute force") {
    // 8 planted heavy items over ~4k-distinct uniform noise, split across
    // 8 partitions; m = 64 « 4k distinct, so per-partition sketches churn
    // constantly. Every planted count must CLEAR the guarantee, not rest
    // on partition-layout luck: N = 7600 + 20000 = 27600, threshold
    // N/(m+1) = 27600/65 ≈ 425, and the smallest plant is 600 (2.2%,
    // 1.4× the threshold; the largest is 1300 ≈ 4.7%) — the averaging
    // argument then guarantees nomination whatever the row layout.
    val rnd = new scala.util.Random(31)
    val hot = (1 to 8).map(i => Seq.fill(500 + 100 * i)(s"hot$i")).flatten
    val noise = (1 to 20000).map(_ => s"n${rnd.nextInt(4000)}")
    val data = new scala.util.Random(37).shuffle((hot ++ noise).toList)
    val want = data.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (item, n) => (-n, item) }.take(8)
    val ds = data.toDF("item").repartition(8).select($"item").as[String]
    val got = HeavyHitters.topK(ds, k = 8, m = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("unguaranteed result raises instead of silently missing heavy items") {
    // uniform data: every count is far below N/(m+1), so the top-k is
    // partition-layout luck — the guard must turn that into a loud failure
    val data = (1 to 1000).map(i => s"u${i % 100}") // 100 items × 10 each
    val ds = data.toDF("item").repartition(4).select($"item").as[String]
    val e = intercept[Exception] {
      HeavyHitters.topK(ds, k = 3, m = 4).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("not guaranteed exact")),
      s"wrong failure: $e")
  }

  test("adaptive capacity jumps past the guard in ONE resize and matches brute force") {
    // 100 uniform items × 10 at m0=4: the first attempt fails the guard
    // (counts of 10 never clear 1000/5) but MEASURES minCnt=10, so the
    // resize jumps straight to m = 1000/10 + 1 = 101 > 100 distinct —
    // lossless, guard cleared. maxAttempts=2 pins that a single resize
    // suffices: pure doubling (4→8→…→128) would need 6 attempts and
    // raise here. Result must equal the brute-force top-k.
    val data = (1 to 1000).map(i => s"u${i % 100}")
    val want = data.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (item, n) => (-n, item) }.take(3)
    val ds = data.toDF("item").repartition(4).select($"item").as[String]
    val got = HeavyHitters.topKAdaptive(ds, k = 3, m0 = 4, maxAttempts = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)

    // exhausted attempts surface the guard instead of looping forever:
    // a single attempt at the undersized m0 must raise, not return the
    // partition-layout-luck top-k
    val e = intercept[Exception] {
      HeavyHitters.topKAdaptive(ds, k = 3, m0 = 4, maxAttempts = 1)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("not guaranteed exact")),
      s"wrong failure: $e")
  }

  test("ties rank deterministically by item") {
    val ds = Seq("b", "a", "b", "a", "c").toDF("item").select($"item").as[String]
    val got = HeavyHitters.topK(ds, k = 3, m = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }
}
