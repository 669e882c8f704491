package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Co-located bucketed joins: the write-once-shuffle-never layout. */
class BucketingSpec extends SparkSpec {

  test("same-bucketed tables sort-merge join with no exchange and no sort") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    try {
      // bucketed join must not shuffle either side — the property that
      // matters at 100 TB (the remaining within-partition Sort of
      // already-sorted buckets is cheap and shuffle-free)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.coLocatedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(p.contains("Bucketed: true"), s"scan not bucketed:\n$p")
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")

      // with the one-file-per-bucket layout, opting into ordered bucketed
      // scans elides even the Sort (off by default since Spark 3.0 —
      // SPARK-28632 — because multi-file buckets would need merge reads)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val pOrdered = Bucketing.coLocatedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey").queryExecution.executedPlan.toString
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      assert(!pOrdered.contains("Sort ["),
        s"ordered bucketed join still sorts:\n$pOrdered")
      assert(!pOrdered.contains("Exchange"))

      // and produces exactly the plain join's result
      val got = joined.groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      val plain = orders.join(lineitem, "o_orderkey").groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      assert(got.toSeq == plain.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
