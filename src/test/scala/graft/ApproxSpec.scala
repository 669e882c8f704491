package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates (no cross-engine oracle — sketch internals are
  * engine-specific): accuracy properties against exact computation on the
  * real tables instead. */
class ApproxSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct within configured rsd of exact, per group") {
    val li = graft.sources.Tables(spark, dir, "lineitem")
    val both = li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact"),
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx"))
      .collect()
    both.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("approx_percentile brackets the exact percentile") {
    val li = graft.sources.Tables(spark, dir, "lineitem")
    val r = li.agg(
      expr("percentile(l_quantity, 0.5)").as("exact_p50"),
      expr("approx_percentile(l_quantity, 0.5, 10000)").as("approx_p50"))
      .collect().head
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 1.0)
  }
}
