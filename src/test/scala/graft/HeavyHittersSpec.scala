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

  test("flat corpus: a failed guard falls back to ONE exact groupBy, even at maxAttempts=1") {
    // 100 uniform items × 10 at m0=4: the first attempt fails the guard
    // (counts of 10 never clear 1000/5) and measures minCnt=10, so the
    // required capacity is 1000/10 + 1 = 101 — within 2× of the ~100-item
    // vocabulary the piggybacked HLL reports. Sketching again would just
    // rebuild the vocabulary map with extra passes, so the operator must
    // pick the exact-groupBy fallback, which is exact by construction and
    // therefore legitimate even when no sketch attempts remain.
    val data = (1 to 1000).map(i => s"u${i % 100}")
    val want = data.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (item, n) => (-n, item) }.take(3)
    val ds = data.toDF("item").repartition(4).select($"item").as[String]
    val (df, strategy) =
      HeavyHitters.topKAdaptiveImpl(ds, k = 3, m0 = 4, maxAttempts = 1)
    assert(strategy == "exact-fallback")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq == want)
  }

  test("skewed corpus with undersized m0: ONE measured resize clears the guard") {
    // 3 plants × 500 over 5000-distinct junk (N ≈ 10k): at m0=16 the
    // guard needs counts > 588, so the first attempt fails — but the
    // plants survive the sketch (seeded data, fixed partitioning), so the
    // measured k-th count is a true plant count and the retry sizes at
    // ~N/500 ≈ 21, far below the vocabulary even through the
    // partitions-aware margin (2 · 4 · 21 ≪ ~3900) — the SKETCH path is
    // kept (not the fallback) and the second attempt clears by
    // construction. maxAttempts=1 must still raise: the sketch path has
    // no exact result in hand and no attempts left.
    val rnd = new scala.util.Random(41)
    val plants = (1 to 3).flatMap(i => Seq.fill(500)(s"plant$i"))
    val junk = (1 to 8500).map(_ => s"j${rnd.nextInt(5000)}")
    val data = new scala.util.Random(43).shuffle((plants ++ junk).toList)
    val want = data.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (item, n) => (-n, item) }.take(3)
    val ds = data.toDF("item").repartition(4).select($"item").as[String]
    val (df, strategy) =
      HeavyHitters.topKAdaptiveImpl(ds, k = 3, m0 = 16, maxAttempts = 2)
    assert(strategy == "jump", s"expected the resized-sketch path, got $strategy")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq == want)

    // exhausted attempts surface the guard instead of looping forever
    val e = intercept[Exception] {
      HeavyHitters.topKAdaptiveImpl(ds, k = 3, m0 = 16, maxAttempts = 1)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("not guaranteed exact")),
      s"wrong failure: $e")
  }

  test("piggybacked HLL estimates cardinality within 5% and merges by register max") {
    val a = HeavyHitters.Hll.empty()
    val b = HeavyHitters.Hll.empty()
    (1 to 30000).foreach(i => HeavyHitters.Hll.add(a, s"item$i"))
    (20001 to 50000).foreach(i => HeavyHitters.Hll.add(b, s"item$i"))
    HeavyHitters.Hll.mergeInto(a, b) // union is exactly 50k distinct
    val est = HeavyHitters.Hll.estimate(a)
    assert(math.abs(est - 50000) < 2500, s"estimate $est off >5% from 50000")
    // small-range regime: exact-ish via linear counting
    val c = HeavyHitters.Hll.empty()
    (1 to 40).foreach(i => HeavyHitters.Hll.add(c, s"x$i"))
    val small = HeavyHitters.Hll.estimate(c)
    assert(math.abs(small - 40) <= 2, s"small-range estimate $small vs 40")
  }

  test("decrement-emptied sketch fails the guard loudly instead of returning empty-labeled-exact") {
    // all-distinct stream whose length is a multiple of m+1, one partition:
    // every (m+1)-th arrival decrements ALL counters to zero, so the final
    // candidate set is EMPTY while decremented=true. The in-plan per-row
    // count guard can only evaluate on rows that exist — before the
    // completeness check, topK returned an empty frame silently and
    // topKAdaptive returned it labeled exact (vacuous forall). Lossy at
    // m ≥ k proves the true top-k has k rows, so both must treat the
    // short result as a failed guard.
    val data = (1 to 10).map(i => s"d$i") // 10 = 2 × (m+1) at m=4
    val ds = spark.sparkContext.parallelize(data, 1).toDS()
    val (cands, decremented) = HeavyHitters.misraGries(data.iterator, 4)
    assert(decremented && cands.isEmpty,
      "precondition: the engineered stream must empty the sketch")

    val e = intercept[Exception] { HeavyHitters.topK(ds, k = 3, m = 4) }
    assert(Option(e.getMessage).exists(_.contains("not guaranteed exact")),
      s"wrong failure: $e")

    // the adaptive path must fall THROUGH the failed guard: doubling floor
    // (no measured jump exists for an empty result), then the HLL sees the
    // required capacity rival the ~10-word vocabulary -> exact fallback
    val (df, strategy) =
      HeavyHitters.topKAdaptiveImpl(ds, k = 3, m0 = 4, maxAttempts = 6)
    assert(strategy == "exact-fallback", s"got $strategy")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("d1", 1L), ("d10", 1L), ("d2", 1L)))
  }

  test("short-but-all-passing result fails the completeness guard (incomplete top-k)") {
    // two heavies + 15 distinct junk, one partition, m=4: MG's decrement
    // storms strip every junk candidate, leaving TWO candidates whose
    // counts both clear N/(m+1) — so rows.forall alone passes on a 2-row
    // result for k=3, silently dropping the true 3rd item. The
    // completeness conjunct must reject it and converge to the exact
    // fallback (the measured jump is unavailable below k rows; the junk
    // vocabulary is tiny, so the HLL decision lands on exact).
    val data = Seq.fill(50)("a") ++ Seq.fill(50)("b") ++
      (1 to 15).map(i => f"j$i%02d")
    val (cands, decremented) = HeavyHitters.misraGries(data.iterator, 4)
    assert(decremented && cands.size < 3,
      s"precondition: sketch must end below k candidates, got ${cands.size}")
    val ds = spark.sparkContext.parallelize(data, 1).toDS()
    val (df, strategy) =
      HeavyHitters.topKAdaptiveImpl(ds, k = 3, m0 = 4, maxAttempts = 6)
    assert(strategy == "exact-fallback", s"got $strategy")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 50L), ("b", 50L), ("j01", 1L)))
  }

  test("q80's near-unique catalog corpus forces the exact-fallback strategy at every attempt budget") {
    // every (orderkey, linenumber) key is unique, so no capacity below the
    // vocabulary clears N/(m+1) and the measured jump is N+1 — the HLL
    // decision must land on the exact groupBy, making the catalog entry
    // exact by construction (this is what gives q80's green oracle entry
    // its meaning as a pin of the FALLBACK regime, not sketch luck)
    val keys = graft.queries.Analytics.q80Keys(spark, "/root/testdata/sf0.001")
    val (df, strategy) =
      HeavyHitters.topKAdaptiveImpl(keys, k = 20, m0 = 64, maxAttempts = 6)
    assert(strategy == "exact-fallback", s"got $strategy")
    val want = keys.toDF("item").groupBy($"item")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"item").limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq == want)
  }

  test("full-scan exact top-k ≡ groupBy twin on ties, nulls, and k > distinct") {
    // the sort-RLE plan must be bit-identical to GROUP BY / ORDER BY /
    // LIMIT in every ordering corner: count ties break by item asc with
    // null first (Spark's asc default), and k larger than the vocabulary
    // returns every group exactly once
    val data: Seq[String] =
      Seq("b", "a", "b", "a", "c", null, null, "d", "a", null)
    val ds = data.toDF("item").select($"item").as[String]
    for (k <- Seq(2, 3, 5, 10)) {
      val want = ds.toDF("item").groupBy($"item")
        .agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"item").limit(k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val got = HeavyHitters.exactTopKFullScan(ds, k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == want, s"k=$k: $got != $want")
    }
  }

  test("ties rank deterministically by item") {
    val ds = Seq("b", "a", "b", "a", "c").toDF("item").select($"item").as[String]
    val got = HeavyHitters.topK(ds, k = 3, m = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }
}
