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

  test("q70 catalog query: every approximate column within its configured error of the q78 exact twin") {
    // the driver sees q70 rows-only (sketches are engine-specific), so THIS
    // is its correctness gate — and the exact side is the q78 CATALOG query
    // (hash-matched against DuckDB), so the bound chains q70's sketches to
    // a driver-verified anchor rather than a spec-local recomputation.
    // q78's percentiles carry a 2dp round; the ±1.0 bound dwarfs it.
    val got = graft.queries.Analytics.q70ApproxAgg(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Seq(r.getDouble(3), r.getDouble(4)),
          r.getLong(5))).toMap
    val exact = graft.queries.Analytics.q78ExactDistinctPct(spark, dir)
      .collect()
    assert(exact.nonEmpty && exact.length == got.size)
    exact.foreach { r =>
      val flag = r.getString(0)
      val (aOrders, aParts, aPcts, aN) = got(flag)
      // HLL++ rsd 0.02 → 5 sigma would be wild; 5% is a generous pin
      assert(math.abs(aOrders - r.getLong(1)).toDouble / r.getLong(1) < 0.05,
        s"$flag orders: $aOrders vs ${r.getLong(1)}")
      assert(math.abs(aParts - r.getLong(2)).toDouble / r.getLong(2) < 0.05,
        s"$flag parts: $aParts vs ${r.getLong(2)}")
      val ePcts = Seq(r.getDouble(3), r.getDouble(4))
      aPcts.zip(ePcts).zipWithIndex.foreach { case ((a, e), i) =>
        assert(math.abs(a - e) <= 1.0, s"$flag p$i: $a vs $e")
      }
      assert(aN == r.getLong(5), s"$flag count must be exact")
    }
  }
}
