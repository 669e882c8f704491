package graft

import graft.queries.Relational

/** Physical-plan assertions: the properties that matter at 100 TB must be
  * visible in the plan, not assumed — broadcast of the per-user dim side,
  * filter pushdown into the parquet scan, and no shuffle on the corpus side
  * of the broadcast top-k join.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

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

  test("kNN catalog paths rank via k-bounded aggregate, not a window sort") {
    // The window top-k would show a Window operator fed by an Exchange+Sort
    // over every (query, candidate) pair; the TopKAggregator path must not.
    for (q <- Seq(graft.queries.Analytics.q24KnnBruteForce _,
                  graft.queries.Analytics.q25KnnLsh _)) {
      val p = plan(q(spark, dir))
      assert(!p.contains("Window"), s"pair-level window sort in plan:\n$p")
      assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
        s"expected typed top-k aggregate:\n$p")
    }
    // q39's probe window is over q·nCentroids rows (bounded grid) and is
    // allowed; its corpus-sized assignment and rerank must still aggregate.
    val p39 = plan(graft.queries.Analytics.q39KnnIvf(spark, dir))
    assert(p39.contains("max_by") || p39.contains("ObjectHashAggregate"),
      s"expected aggregate-based assignment/rerank:\n$p39")
  }

  test("whole-stage codegen covers the date-formatting projection") {
    val df = Relational.q11DateParts(spark, dir)
    df.collect() // finalize the adaptive plan
    // `*(n)` prefixes mark WholeStageCodegen stages in the plan string
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), s"no codegen span:\n$p")
  }
}
