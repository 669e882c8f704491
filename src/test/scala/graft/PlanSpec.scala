package graft

import graft.queries.Relational
import graft.sources.Tables

/** Physical-plan assertions: the properties that matter at 100 TB must be
  * visible in the plan, not assumed — broadcast of the per-user dim side,
  * filter pushdown into the parquet scan, and no shuffle on the corpus side
  * of the broadcast top-k join.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** AQE- and SUBQUERY-aware plan traversal: descends into finalized
    * adaptive plans, materialized query stages, and subquery plans (a
    * Window inside a scalar subquery must not escape the sweeps). One
    * shared copy — plan-walking tests must not each grow their own. */
  private def walkPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val extra = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => Seq.empty
    }
    p +: (p.children ++ extra ++ p.subqueries).flatMap(walkPlan)
  }

  /** Every catalog query's executed plan, built ONCE — both whole-catalog
    * sweeps assert over this list (re-planning 69 queries per sweep would
    * also re-fire the eager stats jobs some constructors run). */
  private lazy val catalogPlans: Seq[(String, org.apache.spark.sql.execution.SparkPlan)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, dir).queryExecution.executedPlan
    } :+ {
      // q69's catalog entry collects the winning adaptive attempt into a
      // k-row local relation, so its own plan is a LocalTableScan; sweep
      // the DISTRIBUTED pipeline underneath via the raw fixed-m topK so a
      // regression there (BNLJ candidate join, global window) can't hide
      "q69_heavy_hitters.topK" ->
        graft.operators.HeavyHitters
          .topK(graft.queries.Analytics.q69Grams(spark, dir), 20, 1024)
          .queryExecution.executedPlan
    }

  test("q19 flagship: userstats join is broadcast, date filter pushed to scan") {
    val p = plan(Relational.q19ProgressReport(spark, dir))
    assert(p.contains("BroadcastHashJoin"), "userstats should broadcast")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), " +
      "GreaterThanOrEqual(o_orderdate"),
      s"date filter should reach the parquet scan:\n$p")
  }

  test("q02: small dim join is broadcast, not shuffled") {
    val p = plan(Relational.q02BroadcastJoin(spark, dir))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q05: column pruning — scan reads only the joined/aggregated columns") {
    val p = plan(Relational.q05LeftOuterCoalesce(spark, dir))
    // orders scan must not read o_orderdate/o_orderstatus/o_orderpriority
    val ordersScan = p.linesIterator.filter(_.contains("orders.parquet"))
      .mkString("\n")
    assert(!ordersScan.contains("o_orderdate"), s"pruning failed:\n$ordersScan")
  }

  test("q01: partial aggregation before the shuffle (map-side combine)") {
    val p = plan(Relational.q01GroupedSum(spark, dir))
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_sum") || p.contains("partial"),
      s"expected partial aggregate:\n$p")
  }

  test("kNN rankings k-bound the shuffle: Partial WindowGroupLimit pre-exchange") {
    // The rank<=k window is only scale-safe because Spark inserts
    // WindowGroupLimit(Partial) BELOW the exchange — each map partition
    // ships its top k per query, not every candidate pair. Pin it so a
    // Spark upgrade or plan change that loses the property fails loudly.
    for (q <- Seq(graft.queries.Analytics.q24KnnBruteForce _,
                  graft.queries.Analytics.q25KnnLsh _,
                  graft.queries.Analytics.q39KnnIvf _,
                  graft.queries.Analytics.q88PqAdc _)) {
      val p = plan(q(spark, dir))
      assert(p.linesIterator.exists(l =>
        l.contains("WindowGroupLimit") && l.contains("Partial")),
        s"no map-side WindowGroupLimit in plan:\n$p")
    }
    // q39's corpus-sized centroid assignment must be the decimal-packed
    // HashAggregate argmax (double_sort_key) — not a per-id window, and
    // not the max_by(struct) form whose immutable buffer silently plans
    // SortAggregateExec over all n·K assignment rows
    val p39 = plan(graft.queries.Analytics.q39KnnIvf(spark, dir))
    assert(p39.contains("double_sort_key"),
      s"expected double_sort_key packed assignment:\n$p39")
    assert(!p39.contains("SortAggregate"),
      s"SortAggregate crept back into the assignment:\n$p39")
  }

  test("q144 stored-index search: plan reads the prebuilt index, no build stages") {
    // The offline/online ANN split's whole point: the search plan must
    // scan the persisted centroid grid + posting lists and touch the raw
    // corpus ONLY for the query vectors — no seed draw, no corpus-wide
    // assignment, no k-means anywhere in the executed plan.
    val p = graft.queries.Analytics.q144IvfSearchStored(spark, dir)
      .queryExecution.executedPlan
    val scans = walkPlan(p).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        (s.relation.location.rootPaths.mkString(","),
          s.metadata.getOrElse("PushedFilters", ""))
    }
    assert(scans.count(_._1.contains("graft_vindex")) >= 2,
      s"expected stored centroid + posting scans, got: $scans")
    // the corpus appears exactly twice, BOTH times as the pred-pushed
    // query side (probe ranks ids-only, vectors rejoin by qid — the
    // ids-only shuffle discipline): never an unfiltered corpus-wide scan,
    // which would mean a build stage leaked into the online plan
    val corpus = scans.filter(_._1.contains("embeddings"))
    assert(corpus.size == 2 &&
      corpus.forall(_._2.contains("GreaterThanOrEqual(vec_id,8)")),
      s"corpus scans must all be the pushed-pred query side, got: $scans")
  }

  test("q147 stored-PQ search: plan reads prebuilt structures, no encode") {
    // the offline/online PQ split: cells, codebooks, and cid-clustered
    // codes come from the store; the ONLY corpus work is the query
    // vectors and the k-bounded exact rerank. The build's signature — the
    // md5 seed draw — must be absent from the online plan entirely.
    val p = graft.queries.Curation.q147IvfPqSearchStored(spark, dir)
      .queryExecution.executedPlan
    val scans = walkPlan(p).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.rootPaths.mkString(",")
    }
    assert(scans.count(_.contains("graft_vindex")) >= 3,
      s"expected stored cells + codebooks + codes scans, got: $scans")
    assert(!p.toString.contains("md5("),
      "md5 seed draw (a build stage) leaked into the online search plan")
  }

  test("q151 stored sparse search: index scans only, document text untouched") {
    // the inverted-index split's whole point: candidacy, rescore, and
    // norms all come from the persisted relations — the plan must contain
    // ZERO scans of the documents table and no tokenize/term-count stages
    val p = graft.queries.Curation.q151SparseSearchStored(spark, dir)
      .queryExecution.executedPlan
    val scans = walkPlan(p).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.rootPaths.mkString(",")
    }
    assert(scans.count(_.contains("graft_vindex")) >= 2,
      s"expected stored postings + norms scans, got: $scans")
    assert(!scans.exists(_.contains("documents")),
      s"document text leaked into the online sparse plan: $scans")
    assert(!p.toString.contains("token_counts"),
      "tokenize stage leaked into the online sparse plan")
  }

  test("q158 stored hybrid: BOTH arms are index scans — no build stage") {
    // the production serving shape: the dense arm reads the stored
    // centroid grid + posting lists, the sparse arm the stored posting +
    // norm relations; document TEXT is never scanned, no k-means seed
    // draw and no tokenize stage anywhere in the fused online plan
    val p = graft.queries.Curation.q158HybridStoredRrf(spark, dir)
      .queryExecution.executedPlan
    val scans = walkPlan(p).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.rootPaths.mkString(",")
    }
    assert(scans.count(_.contains("graft_vindex")) >= 4,
      s"expected centroid+posting and posting+norm index scans: $scans")
    assert(!scans.exists(_.contains("documents")),
      s"document text leaked into the stored hybrid plan: $scans")
    assert(!p.toString.contains("token_counts"),
      "tokenize stage leaked into the stored hybrid plan")
    assert(!p.toString.contains("md5("),
      "md5 seed draw (a dense build stage) leaked into the hybrid plan")
  }

  test("no catalog query plans a CartesianProduct; BNLJ only where intended") {
    // The 100 TB safety sweep: a cartesian product anywhere means a join
    // lost its equi-condition; a BroadcastNestedLoopJoin is only acceptable
    // where the build side is the deliberately-tiny broadcast query/grid
    // side of a kNN scan.
    val bnljAllowed = Set(
      "q24_knn_brute", // broadcast query side vs corpus — by design
      "q35_tfidf", // broadcast single-row corpus-size scalar
      "q81_bm25", // broadcast single-row corpus-stats scalar (tot_tok, n_docs)
      "q39_knn_ivf", // broadcast-K centroid grid (K = nCentroids)
      "q73_knn_ivf_refined", // broadcast-K centroid grid (K = nCentroids)
      "q79_kmeans_step", // broadcast-K centroid grid (K = nCentroids)
      "q51_gapfill", // broadcast calendar grid (users × bounded date range)
      "q92_mixture_plan", // broadcast single-row totals scalar (tot_tok, n_langs)
      "q95_semantic_dedup", // broadcast-K seed grid (K = max(minK, ⌈N/64⌉))
      "q125_knn_ivf_pq", // broadcast-K cell grid (K = nCells, routing)
      "q138_hybrid_rrf", // q39's broadcast-K centroid grid inside the dense branch
      "q139_hard_negatives", // the same broadcast-K centroid grid (assignment + top-5 branches)
      "q127_curation_pass", // semanticDedup's broadcast seed/super grids
      "q103_pagerank", // broadcast single-row max-id scalar (link synthesis)
      "q140_personalized_pagerank", // the same link-synthesis max-id scalar
      "q143_ivf_build_stored", // broadcast-K centroid grid (assignment)
      "q144_ivf_search_stored", // broadcast-K STORED centroid grid (probe)
      "q169_ivf_token_search",  // q144's probe at the token-gated entry
      "q145_ivf_extend_stored", // broadcast-K stored grid (batch assignment)
      "q146_ivf_pq_build_stored", // broadcast-K cell grid (routing/encode)
      "q147_ivf_pq_search_stored", // broadcast-K STORED cell grid (probe)
      "q171_ivf_pq_token_search", // q147's probe at the token-gated entry
      "q158_hybrid_stored_rrf", // q144's broadcast-K STORED centroid probe (dense arm)
      "q105_cooccur_pmi", // broadcast single-row token-total scalar
      "q109_triangles", // broadcast single-row max-id + edge-count scalars
      "q115_tv_drift", // broadcast single-row token-totals + tvd scalars
      "q119_kcore", // broadcast single-row max-id + per-round count scalars
      "q120_decay" // broadcast single-row max-date anchor scalar
    )
    val offenders = catalogPlans.flatMap { case (name, plan) =>
      val p = plan.toString
      val cart = p.contains("CartesianProduct")
      val bnlj = p.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name)
      if (cart) Some(s"$name: CartesianProduct")
      else if (bnlj) Some(s"$name: unexpected BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("no catalog query plans an unexpected SortAggregate") {
    // The q95/q79/q88/q39 bug class: min_by/max_by/min(struct) buffers are
    // immutable, so Spark silently swaps HashAggregate for
    // SortAggregateExec — which SORTS the aggregate's whole input — while
    // every result-level spec stays green. The argmin/argmax family is
    // decimal-packed (see Similarity/q53); this sweep pins that the class
    // cannot creep back in. Allowlisted residuals are each adjudicated:
    val sortAggAllowed = Set(
      // min/max over STRING — the buffer is a UTF8String, inherently
      // immutable; the value itself is the result, so no packing exists
      "q43_null_suite", "q116_profile",
      // CdcMerge's winner carries the FULL ROW: the packed argmax can't
      // hold a row, and the join-back alternative costs two extra
      // full-feed exchanges + an at-least-once dedup (see its scaladoc);
      // the partial max_by still bounds the exchange to 1 row/key/side
      "q101_cdc_merge")
    val offenders = catalogPlans.collect {
      case (name, plan) if plan.toString.contains("SortAggregate") &&
        !sortAggAllowed(name) => name
    }
    assert(offenders.isEmpty,
      s"SortAggregate crept into: ${offenders.mkString(", ")}")
  }

  test("no catalog query plans an unpartitioned Window over data rows") {
    // The other 100 TB chokepoint class: a Window with an empty
    // PARTITION BY drags every row through ONE task. The engine's designs
    // route around it everywhere (q56's driver-side bucket-offset scan,
    // q09/q40's per-user partitions, q10's keyed header union) — the sweep
    // currently holds with NO exceptions; if a future query needs an
    // unpartitioned window over a provably tiny frame, allowlist it here
    // with the size argument.
    import org.apache.spark.sql.execution.window.WindowExec
    val allowed = Map(
      // the running vocabulary total runs over the DECILE ROLLUP — at
      // most 10 rows by construction, after the per-term aggregation
      "q154_vocab_growth" -> "cumulative sum over the <=10-row decile rollup",
      // the hashed twin shares q154's rollup shape exactly
      "q159_vocab_growth_hashed" -> "cumulative sum over the <=10-row decile rollup")
    val offenders = catalogPlans.flatMap {
      case (name, plan) if !allowed.contains(name) =>
        walkPlan(plan).collectFirst {
          case w: WindowExec if w.partitionSpec.isEmpty =>
            s"$name: unpartitioned Window(${w.windowExpression.take(1)})"
        }
      case _ => None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("q25: LSH band join shuffles ids only — no vector payload") {
    // The banded candidate join must carry (id|qid, tbl, bucket) per row;
    // vectors rejoin BY ID after candidate dedup. A regression that bands
    // with `v`/`nrm` riding along shuffles `tables` copies of every
    // embedding — invisible in results, fatal at 100 TB.
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val df = graft.queries.Analytics.q25KnnLsh(spark, dir)
    df.collect() // finalize the adaptive plan
    val bandJoins = walkPlan(df.queryExecution.executedPlan).collect {
      case j: BaseJoinExec
          if j.leftKeys.map(_.toString).exists(_.contains("tbl")) => j
    }
    assert(bandJoins.nonEmpty, "no (tbl, bucket) band join found in the plan")
    val heavy = Set("v", "nrm", "qv", "qn", "embedding", "sig")
    for (j <- bandJoins; side <- Seq(j.left, j.right)) {
      val carried = side.output.map(_.name).filter(heavy)
      assert(carried.isEmpty,
        s"band join input carries vector payload ${carried.mkString(",")}:\n$j")
    }
  }

  test("whole-stage codegen covers the date-formatting projection") {
    val df = Relational.q11DateParts(spark, dir)
    df.collect() // finalize the adaptive plan
    // `*(n)` prefixes mark WholeStageCodegen stages in the plan string
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), s"no codegen span:\n$p")
  }

  test("runtime bloom-filter injection fires on a selective shuffled join") {
    // At production scale Spark injects a bloom filter from a selective
    // build side into the probe side's scan (InjectRuntimeFilter, on by
    // default) — but only when the probe scan exceeds
    // applicationSideScanSizeThreshold (10 GB), so test-scale plans never
    // show it. Pin the behavior with the thresholds floored: the big side
    // of a shuffled join must carry BloomFilterMightContain, proving the
    // engine's joins are eligible for the filter where it matters.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force the shuffle path
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables(spark, dir, "lineitem")
      val dim = Tables(spark, dir, "part")
        .where(org.apache.spark.sql.functions.col("p_partkey") < 50)
      val joined = li.join(dim,
        li("l_partkey") === dim("p_partkey"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter") || p.contains("BloomFilter"),
        s"no bloom filter injected:\n${p.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed unsalted join once partition sizes cross the thresholds") {
    // q58's salted join pre-flattens its hot key, so its final plan shows
    // no skew=true markers (NOTES_r06) — the engine's DEFAULT unsalted
    // joins are what rely on AQE's OptimizeSkewedJoin at 100 TB. The
    // 256 MB production threshold never trips at test scale, so pin the
    // behavior with the thresholds floored, same discipline as the bloom
    // pin above: a q58-shaped hot key through a plain shuffled join must
    // come out of execution with skew=true splits in the final plan.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      // tiny sf0.001 partitions otherwise coalesce BELOW the skew
      // threshold and the splitter never sees a skewed one
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // at the session default of 4 the hot key shares its partition with
      // ~24 others and hot/median never clears the factor
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // keep the SMJ
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      // q58's hot-key shape, sized so the hot shuffle partition (~10% of
      // 200k rows, one long + one double) clears 4KB compressed while the
      // median ~2k-row partitions stay well under 2× smaller
      val big = spark.range(0, 200000).select(
        when(col("id") % 10 === 0, 0L).otherwise(col("id") % 97).as("k"),
        (col("id") * 7 % 1000).cast("double").as("v"))
      val small = spark.range(0, 97).select(col("id").as("k"),
        concat(lit("name-"), col("id")).as("name"))
      val joined = big.join(small, "k")
      joined.queryExecution.toRdd.count() // AQE decides during execution
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"no skew split in the final adaptive plan:\n${p.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
