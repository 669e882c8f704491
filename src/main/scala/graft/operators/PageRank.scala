package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank — the link-graph centrality pass a crawl corpus is
  * prioritized by, in pure integer arithmetic so every iteration is
  * cross-engine bit-reproducible (the same design move as the q79 k-means
  * anchor: floats make iterated means engine-specific; scaled longs with
  * floor division don't).
  *
  * Recurrence (scale 1e6, damping d%):
  *   r₀(v)    = scale
  *   r₊(v)    = (100−d)·scale/100 + (d · Σ_{u→v} ⌊r(u)/out(u)⌋) / 100
  * with both divisions integral (floor) — deterministic in Spark (`div`)
  * and DuckDB (`//`) alike.
  *
  * Scale shape per iteration: one equi-join of the rank vector onto the
  * edge list (both hash-partitioned on src — co-partitioned across
  * iterations since the key never changes), one map-side-combining sum to
  * dst, one left join back onto the node set for dangling-in-degree nodes.
  * All state is node- or edge-cardinality; iterations compose the plan —
  * no driver-side collects. Production runs tens of iterations with the
  * rank vector checkpointed every few rounds (the q46 connected-components
  * lineage lesson); the catalog entry runs 3 to keep the oracle's chained
  * CTEs honest. */
object PageRank {

  /** `edges`: (src, dst) long pairs, self-loops allowed (they just feed
    * rank back); `nodes`: one `id` column holding every vertex. */
  def iterate(edges: DataFrame, nodes: DataFrame, iters: Int,
              dampingPct: Int, scale: Long): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val base = (100L - dampingPct) * scale / 100L
    val out = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ranked0 = nodes.select(col("id"), lit(scale).as("r"))
    (1 to iters).foldLeft(ranked0) { (ranks, _) =>
      val contrib = edges
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(out, Seq("src"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      nodes.join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(base) +
            expr(s"$dampingPct * coalesce(s, 0L) div 100").cast("long"))
            .as("r"))
    }
  }

  /** Personalized PageRank (seed-restart): identical integer recurrence,
    * but rank mass restarts ONLY to `seeds(id)` — r₀(v) = scale for seeds
    * else 0, and the per-iteration base term lands on seeds only. The
    * proximity-to-seed-set score graph-based data selection runs (rank a
    * crawl by closeness to a trusted seed set); at convergence it's the
    * random-walk-with-restart stationary mass. Same per-iteration scale
    * shape as [[iterate]]: one co-partitioned rank⋈edges join, one
    * map-side-combining sum to dst, one left join back — the seed flag
    * rides the node set, so personalization adds NO extra shuffle. */
  def personalized(edges: DataFrame, nodes: DataFrame, seeds: DataFrame,
                   iters: Int, dampingPct: Int, scale: Long): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val base = (100L - dampingPct) * scale / 100L
    val out = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // distinct: a duplicated seed id would fan out the node set through
    // this left join, duplicating rank rows and double-counting that
    // node's contributions every iteration. The operator is public — it
    // cannot assume callers pre-deduplicate the way q140 happens to.
    val seeded = nodes
      .join(seeds.select(col("id")).distinct()
        .select(col("id"), lit(1).as("is_seed")), Seq("id"), "left")
      .select(col("id"), coalesce(col("is_seed"), lit(0)).as("is_seed"))
    val baseCol = when(col("is_seed") === 1, lit(base)).otherwise(lit(0L))
    val ranked0 = seeded.select(col("id"), col("is_seed"),
      when(col("is_seed") === 1, lit(scale)).otherwise(lit(0L)).as("r"))
    (1 to iters).foldLeft(ranked0) { (ranks, _) =>
      val contrib = edges
        .join(ranks.select(col("id").as("src"), col("r")), Seq("src"))
        .join(out, Seq("src"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      seeded.join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"), col("is_seed"),
          (baseCol +
            expr(s"$dampingPct * coalesce(s, 0L) div 100").cast("long"))
            .as("r"))
    }.select(col("id"), col("r"))
  }
}
