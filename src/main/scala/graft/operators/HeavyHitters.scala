package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact top-k frequent items at unbounded cardinality via a bounded-memory
  * sketch: per-partition Misra-Gries summaries nominate candidates, then one
  * filtered exact count ranks them. The composition is the same
  * candidates-then-verify shape as the LSH dedup stack — the sketch may
  * over-nominate but the emitted counts are EXACT, so results are
  * oracle-checkable (a plain GROUP BY / ORDER BY / LIMIT twin).
  *
  * Why not a straight groupBy + top-k? That is exact too — but its hash
  * aggregate keys on every distinct item, so a 100 TB corpus of
  * near-unique n-grams builds a distinct-cardinality-sized hash table and
  * shuffles it. Here the only full-cardinality structure is m counters per
  * partition, the shuffle carries candidate items only (≤ partitions × m,
  * and the broadcast side is just the deduped candidates), and the second
  * pass aggregates a corpus filtered down to those candidates.
  *
  * Correctness bound (textbook Misra-Gries + an averaging argument): MG
  * with capacity m retains every item whose partition frequency exceeds
  * N_p/(m+1); if an item's GLOBAL frequency exceeds N/(m+1) then some
  * partition has f_p > N_p/(m+1) (otherwise summing the per-partition
  * bounds contradicts the global one), so the candidate union contains
  * every item with global share > 1/(m+1). The top-k result is therefore
  * exact whenever the true k-th frequency exceeds N/(m+1) — size m ≳
  * N/f_k with margin, and the HeavyHittersSpec pins this boundary on
  * crafted data where the sketch is genuinely lossy.
  */
object HeavyHitters {

  /** Misra-Gries summary of one partition's stream: at most `m` counters;
    * an arrival of an untracked item at capacity decrements every counter
    * (dropping zeros) instead of evicting one — the classic amortized-O(1)
    * frequent-items sketch. Returns the surviving (candidate) items and
    * whether any decrement happened: a never-decremented sketch held EVERY
    * distinct item of the stream (the capacity was never exceeded), which
    * [[topK]] uses to recognize provably-exact results the frequency
    * bound alone cannot certify. */
  private[graft] def misraGries(it: Iterator[String],
                                m: Int): (Iterator[String], Boolean) = {
    // counter cells are mutated in place (long[1]) — a Long value would
    // box on every update, per-row garbage on the pass the sketch exists
    // to make cheap
    val counts = new java.util.HashMap[String, Array[Long]](m * 2)
    var decremented = false
    while (it.hasNext) {
      val x = it.next()
      val cell = counts.get(x)
      if (cell != null) cell(0) += 1L
      else if (counts.size < m) counts.put(x, Array(1L))
      else {
        decremented = true
        val entries = counts.entrySet().iterator()
        while (entries.hasNext) {
          val e = entries.next()
          val v = e.getValue
          if (v(0) == 1L) entries.remove() else v(0) -= 1L
        }
      }
    }
    import scala.jdk.CollectionConverters._
    (counts.keySet().iterator().asScala, decremented)
  }

  /** Exact top-`k` of `items` by count (ties broken by item, so the result
    * is deterministic and cross-engine comparable), with per-partition
    * sketch capacity `m`. Two passes over `items`: one mapPartitions
    * sketch pass (the textbook per-partition-imperative case), one
    * candidate-filtered count pass.
    *
    * The exactness guarantee is ENFORCED, not just documented: the sketch
    * pass also counts N (a zero-cost sentinel row per partition riding the
    * same job), and every emitted count is guarded by
    * `cnt · (m+1) > N` — integer arithmetic, no division — so a result the
    * guarantee does not cover raises at execution instead of silently
    * omitting true heavy hitters. Callers that want best-effort candidates
    * below the bound use the sketch directly.
    *
    * The frequency bound is sufficient, not necessary: when NO partition
    * ever decremented (global distinct cardinality ≤ per-partition m), the
    * sketches held every distinct item, the candidate set is exhaustive,
    * and the exact count pass covers the whole corpus — so the guard is
    * skipped in that regime (a low-cardinality corpus of any N is exact at
    * any m ≥ its distinct count; the sentinel rows carry the flag).
    *
    * The candidate join carries NO broadcast hint: candidates are bounded
    * by partitions × m, which is tiny for sane configs but can reach 10⁸⁺
    * on a 100 TB corpus of near-unique items at large m — a forced
    * broadcast would hard-fail exactly there, while AQE already broadcasts
    * whenever the runtime size is actually small and falls back to a
    * shuffled join when it is not. */
  def topK(items: Dataset[String], k: Int, m: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(m >= k, s"sketch capacity $m < k=$k")
    val (candidates, n, anyLossy, _) = sketchPass(items, m)
    // Completeness check, driver-side over the checkpointed sketch (tiny —
    // ≤ partitions × m rows, no corpus re-scan): the in-plan count guard
    // below can only fire on rows that EXIST, so a lossy sketch whose
    // decrement storms emptied (or shrank below k) the candidate set would
    // return a short frame with every present row passing — silently
    // dropping true heavy hitters. Lossy ⇒ some partition saw > m ≥ k
    // distinct items ⇒ the true top-k has exactly k rows, so fewer than k
    // candidates under a lossy sketch is PROVABLY incomplete, never a
    // small-corpus answer. (k or more candidates ⇒ the join returns ≥ k
    // rows and the per-row guard covers the rest.)
    if (anyLossy && candidates.count() < k)
      throw new IllegalStateException(
        s"heavy-hitters top-$k not guaranteed exact: the lossy sketch " +
          s"(capacity m=$m) retained fewer than $k candidates, so the " +
          "result would be incomplete — increase m")
    // guard rides IN the output column so pruning can't drop it: the
    // k-th (smallest) returned count clearing N/(m+1) proves every
    // non-candidate item ranks strictly below the returned set. Skipped
    // when no partition decremented — the candidates are then ALL
    // distinct items and the counts exact regardless of N/(m+1).
    val checkedCnt =
      if (!anyLossy) col("cnt")
      else when(col("cnt") * (m + 1) > n, col("cnt"))
        .otherwise(raise_error(format_string(
          s"heavy-hitters top-$k not guaranteed exact: count %s of item '%s' " +
            s"does not clear N/(m+1) = $n/${m + 1} — increase m",
          col("cnt"), col("item"))))
    exactTopK(items, candidates, k)
      .select(col("item"), checkedCnt.as("cnt"))
  }

  /** Sketch job shared by both entry points: candidates + a
    * (null, partitionCount, decremented, hllRegisters) sentinel per
    * partition. Eager localCheckpoint — the frame is ≤ partitions×(m+1)
    * rows, and the candidate set, (N, anyLossy), and a vocabulary
    * estimate all derive from it without re-running the corpus scan: the
    * HLL registers ride the same row iteration the MG counters already
    * pay for, so strategy selection after a failed guard costs no extra
    * pass. Sentinels are merged on the driver (partitions × 2 KB). */
  private def sketchPass(items: Dataset[String],
                         m: Int): (DataFrame, Long, Boolean, Long) = {
    import items.sparkSession.implicits._
    val sketch = items.mapPartitions { it =>
      var n = 0L
      val reg = Hll.empty()
      val counted = it.map { x => n += 1; Hll.add(reg, x); x }
      // misraGries exhausts its input before returning, so n, the
      // decrement flag, and the registers are final
      val (cands, decremented) = misraGries(counted, m)
      cands.map(c => (c, 0L, false, null: Array[Byte])) ++
        Iterator((null: String, n, decremented, reg))
    }.toDF("item", "pn", "lossy", "reg").localCheckpoint()
    val sentinels = sketch.where(col("item").isNull)
      .select(col("pn"), col("lossy"), col("reg")).collect()
    val merged = Hll.empty()
    sentinels.foreach(r => Hll.mergeInto(merged, r.getAs[Array[Byte]](2)))
    val candidates = sketch.where(col("item").isNotNull)
      .select(col("item")).distinct()
    (candidates, sentinels.map(_.getLong(0)).sum,
      sentinels.exists(_.getBoolean(1)), Hll.estimate(merged))
  }

  /** Minimal HyperLogLog (p=11, 2048 byte registers, 64-bit xxhash —
    * standard error ≈ 2.3%, no large-range correction needed at 64 bits)
    * used only to size the sketch-vs-exact decision; never surfaced as a
    * result. Kept local instead of `approx_count_distinct` because the
    * estimate must come from the SAME pass as the MG sketch — a separate
    * aggregation would re-scan the corpus exactly when the operator is
    * trying not to. */
  private[graft] object Hll {
    private val P = 11
    private val M = 1 << P
    private val Alpha = 0.7213 / (1.0 + 1.079 / M)
    def empty(): Array[Byte] = new Array[Byte](M)
    def add(reg: Array[Byte], s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          b.length, 42L)
      val idx = (h >>> (64 - P)).toInt
      val w = h << P
      val rank = (if (w == 0L) 64 - P
                  else java.lang.Long.numberOfLeadingZeros(w)) + 1
      if (rank > reg(idx)) reg(idx) = rank.toByte // rank ≤ 54, fits a byte
    }
    def mergeInto(acc: Array[Byte], other: Array[Byte]): Unit = {
      var i = 0
      while (i < M) { if (other(i) > acc(i)) acc(i) = other(i); i += 1 }
    }
    def estimate(reg: Array[Byte]): Long = {
      var sum = 0.0
      var zeros = 0
      var i = 0
      while (i < M) {
        sum += 1.0 / (1L << reg(i))
        if (reg(i) == 0) zeros += 1
        i += 1
      }
      val raw = Alpha * M * M / sum
      val e = if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
              else raw
      math.round(e)
    }
  }

  /** Exact top-k over the WHOLE corpus without a hash aggregate, for the
    * regime where grouping cardinality rivals corpus size: `groupBy(item)
    * .count` keys a hash table on every distinct item on BOTH sides of
    * the exchange — on a near-unique corpus the map-side partial reduces
    * nothing (it builds, spills, and ships a distinct-sized map for zero
    * compression) and the final side builds it again (measured 24 s vs
    * 5.9 s for this plan at the 100× stress dir's 60M unique keys).
    * Instead: one hash repartition of the RAW keys (the same bytes the
    * partial aggregate would have shipped anyway at compression ~1),
    * sort within partitions, and a streaming run-length count feeding a
    * bounded k-entry heap — per-partition state is O(k), not O(distinct),
    * and only partitions × k rows reach the final global top-k. Ordering
    * matches the groupBy twin exactly: count desc, then item asc with
    * nulls first (Spark's asc default), applied both in the per-partition
    * heap and the final sort, so the result is bit-identical to the
    * `GROUP BY / ORDER BY / LIMIT` oracle. */
  private[graft] def exactTopKFullScan(items: Dataset[String],
                                       k: Int): DataFrame = {
    import items.sparkSession.implicits._
    // worst-first ordering: PriorityQueue dequeues its maximum, so "max"
    // must mean "first to evict" — smaller count, then larger item
    // (null smallest, mirroring asc_nulls_first on the item tie-break)
    val worstFirst = new Ordering[(Long, String)] {
      def compare(a: (Long, String), b: (Long, String)): Int = {
        val byCnt = java.lang.Long.compare(b._1, a._1)
        if (byCnt != 0) byCnt
        else if (a._2 == null) if (b._2 == null) 0 else -1
        else if (b._2 == null) 1
        else a._2.compareTo(b._2)
      }
    }
    val perPartition = items.toDF("item")
      .repartition(col("item"))
      .sortWithinPartitions(col("item"))
      .as[String]
      .mapPartitions { it =>
        val heap =
          new scala.collection.mutable.PriorityQueue[(Long, String)]()(
            worstFirst)
        var cur: String = null
        var cnt = 0L
        var started = false
        def flush(): Unit = if (started) {
          heap.enqueue((cnt, cur))
          if (heap.size > k) heap.dequeue()
        }
        while (it.hasNext) {
          val s = it.next()
          if (started && java.util.Objects.equals(s, cur)) cnt += 1L
          else { flush(); cur = s; cnt = 1L; started = true }
        }
        flush()
        heap.iterator.map { case (c, i) => (i, c) }
      }
      .toDF("item", "cnt")
    perPartition.orderBy(col("cnt").desc, col("item")).limit(k)
  }

  /** The exact second pass: candidate-filtered count, deterministic
    * (count desc, item) order, limit k. Unguarded — each caller applies
    * its own exactness check. */
  private def exactTopK(items: Dataset[String], candidates: DataFrame,
                        k: Int): DataFrame =
    items.toDF("item")
      .join(candidates, "item")
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item"))
      .limit(k)

  /** [[topK]] with the sketch capacity sized by MEASUREMENT instead of a
    * priori: the right capacity depends on N/f_k — the corpus size over
    * the k-th frequency — which no caller of a fresh corpus can know in
    * advance; a fixed m either wastes sketch memory on easy data or
    * hard-fails on flat data (the round-6 10× stress run did exactly
    * that).
    *
    * Each attempt collects its k rows anyway (bounded driver collection,
    * like the CC small-graph fast path — it also keeps the caller's own
    * action from re-running both corpus passes), so the guard is checked
    * driver-side and a failed attempt sizes the NEXT one directly:
    * the guarantee needs cnt_k·(m+1) > N, and the observed k-th count is
    * a lower bound on the true k-th frequency (candidates only grow with
    * m, so the observed top-k can only rank at-or-below the true one) —
    * m' = N/cnt_k + 1 is therefore sufficient, and because the k-th count
    * at m' is ≥ the one measured, the SECOND attempt clears the guard by
    * construction. Pure doubling needed O(log(N/(f_k·m0))) attempts at
    * two corpus passes each — on a frequency-flat corpus 100× the sketch
    * design point, that made the adaptive path the only superlinear query
    * in the scaling study. Doubling remains the floor so capacity still
    * ratchets when a degenerate attempt returns no usable count.
    *
    * The sketch pass also carries a 2 KB HyperLogLog per partition, so a
    * failed attempt knows the vocabulary size for free — and when the
    * required capacity rivals it ([[sketchWorthwhile]]), the operator
    * stops sketching: MG counters at m ≈ distinct ARE a full vocabulary
    * hash map, so a plain exact groupBy top-k (no guard needed — exact
    * by construction) does strictly less work. At the 100 TB skewed
    * design point (near-unique items, heavy k-th frequency) the estimate
    * is huge, the jump small, and the sketch path is kept.
    * Deterministic: every attempt computes the same
    * candidates-superset-then-exact-count result, so the first attempt
    * whose guard clears returns the same rows any larger m would.
    *
    * NOTE the returned frame is a DRIVER-MATERIALIZED local relation:
    * each attempt collects its k rows to check the guard, and the winning
    * attempt's rows are re-wrapped via `createDataFrame` so the caller's
    * own action doesn't re-run both corpus passes. Bounded at k rows —
    * but callers composing it into larger plans should know the result
    * has no lineage to the corpus (it re-broadcasts from the driver, and
    * plan audits see a LocalTableScan, not the sketch/count jobs — see
    * [[graft.queries.Analytics.q69Grams]] for the sweepable pipeline). */
  def topKAdaptive(items: Dataset[String], k: Int, m0: Int,
                   maxAttempts: Int = 6): DataFrame =
    topKAdaptiveImpl(items, k, m0, maxAttempts)._1

  /** True when a sketch of capacity `jump` still pays for its two extra
    * corpus passes. The quantity the sketch must keep small is the
    * CANDIDATE UNION the second pass joins against — bounded by
    * partitions × jump, not jump alone: a jump near vocab/partitions
    * yields per-partition lossless sketches whose union IS the
    * vocabulary, and the "candidate-filtered" count degenerates into a
    * full-vocabulary join that does strictly more work than one exact
    * pass (measured on the 100× stress corpus after a data regeneration
    * gave q80's keys multiplicity ≤ 6: jump = N/3 + 1 = 20M against a
    * 45.7M vocabulary passed the old `2·jump < est` test, and the
    * resulting 20M-counter "sketch" + 45.7M-candidate join ran 99 s where
    * the exact fallback runs in one N-row shuffle). The exact fallback
    * ([[exactTopKFullScan]]) holds O(k) state per partition, so leaning
    * exact is safe — the sketch only earns its passes when the candidate
    * bound sits well below the vocabulary (margin 2, mirroring the old
    * rule's intent at the new bound). At the 100 TB skewed design point
    * (near-unique corpus, heavy k-th frequency) jump ≈ N/f_k is tiny,
    * partitions × jump ≪ vocabulary, and the sketch path is kept. */
  private[graft] def sketchWorthwhile(jump: Long, estDistinct: Long,
                                      partitions: Int): Boolean =
    2L * partitions * jump < estDistinct

  /** Implementation of [[topKAdaptive]] that also reports which strategy
    * produced the result — "first-try", "jump" (resized sketch), or
    * "exact-fallback" — so specs can pin the regime selection, not just
    * the rows. */
  private[graft] def topKAdaptiveImpl(items: Dataset[String], k: Int, m0: Int,
                                      maxAttempts: Int): (DataFrame, String) = {
    require(maxAttempts >= 1, s"maxAttempts $maxAttempts < 1")
    require(k >= 1, s"k must be positive, got $k")
    // the completeness guard's "lossy ⇒ true top-k has k rows" argument
    // needs every partition's capacity to be at least k
    require(m0 >= k, s"initial sketch capacity $m0 < k=$k")
    // phase timings to stderr when GRAFT_HH_DEBUG is set — driver-side
    // only, zero cost otherwise (strategy tuning on stress corpora needs
    // to know which pass dominates; see NOTES_r09)
    val debug = sys.env.contains("GRAFT_HH_DEBUG")
    def timed[T](label: String)(f: => T): T =
      if (!debug) f
      else {
        val t0 = System.nanoTime()
        val r = f
        System.err.println(
          f"[hh] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
    var m = m0
    var attempt = 1
    while (true) {
      val (candidates, n, anyLossy, estDistinct) =
        timed(s"sketchPass m=$m")(sketchPass(items, m))
      val result = exactTopK(items, candidates, k)
      val rows = timed("exactTopK collect")(result.collect())
      // Driver-side guard, Long arithmetic (the in-plan column guard of
      // topK serves callers that never materialize on the driver). The
      // completeness conjunct mirrors topK's candidate check: lossy ⇒ some
      // partition saw > m ≥ k distinct items ⇒ the true top-k has exactly
      // k rows, so a SHORT result under a lossy sketch means MG's
      // decrement storms dropped real candidates (e.g. a flat stream whose
      // per-partition length is a multiple of m+1 empties every counter) —
      // rows.forall alone would pass vacuously on the very rows that are
      // missing and return an incomplete result labeled exact.
      val exact = !anyLossy ||
        (rows.length >= k && rows.forall(_.getLong(1) * (m + 1L) > n))
      if (exact)
        return (items.sparkSession.createDataFrame(
          java.util.Arrays.asList(rows: _*), result.schema),
          if (attempt == 1) "first-try" else "jump")
      // the guarantee needs cnt_k·(m+1) > N, and with a FULL k-row result
      // the observed k-th count lower-bounds the true k-th frequency
      // (candidates only grow with m), so that capacity clears the guard
      // on the next attempt by construction. A short result carries no
      // such bound (its smallest count can exceed the true f_k), so the
      // measured jump only applies at rows.length ≥ k; the doubling floor
      // still ratchets capacity for degenerate short/empty attempts.
      val minCnt = if (rows.isEmpty) 0L else rows.map(_.getLong(1)).min
      val jump = math.max(2L * m,
        if (minCnt > 0 && rows.length >= k) n / minCnt + 1L else 0L)
      if (!sketchWorthwhile(jump, estDistinct,
            items.rdd.getNumPartitions)) {
        // flat-corpus regime (the required capacity rivals the
        // vocabulary): an exact count is the better plan and needs no
        // guard — never raise when the exact answer is one pass away,
        // regardless of attempts left
        val fallback = exactTopKFullScan(items, k)
        val frows = timed("fallback collect")(fallback.collect())
        return (items.sparkSession.createDataFrame(
          java.util.Arrays.asList(frows: _*), fallback.schema),
          "exact-fallback")
      }
      if (attempt >= maxAttempts)
        throw new IllegalStateException(
          s"heavy-hitters top-$k not guaranteed exact after $attempt attempts " +
            s"(m=$m, N=$n): smallest returned count $minCnt does not clear " +
            s"N/(m+1) = ${n / (m + 1L)} — raise m0 or maxAttempts")
      m = math.min(jump, Int.MaxValue.toLong).toInt
      attempt += 1
    }
    sys.error("unreachable") // while(true) exits only via return/throw
  }
}
