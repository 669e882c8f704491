package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.model.Schemas
import graft.sources.TableStore

/** Date-partitioned layout: same semantics as the flat store, plus the
  * point-lookup pattern must hit PartitionFilters, not a full scan. */
class PartitionedStoreSpec extends SparkSpec {

  private val u = Fixtures.user

  private def waterRows(rows: (String, Double)*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (d, q) =>
        Row(u, Date.valueOf(d), q)
      }: _*),
      Schemas.water)

  test("upsert/read round trip and pruning under partitionByDate") {
    val s = new TableStore(spark, tmpDir("pstore"), partitionByDate = true)
    s.append("Water", waterRows(("2021-01-01", 1.0), ("2021-01-02", 2.0),
      ("2021-01-03", 3.0)))
    s.upsert("Water", waterRows(("2021-01-02", 99.0)))
    val got = s.read("Water").collect()
      .map(r => (r.getAs[Date]("date").toString, r.getAs[Double]("quantity"))).sorted
    assert(got.toSeq == Seq(("2021-01-01", 1.0), ("2021-01-02", 99.0),
      ("2021-01-03", 3.0)))

    // the reference's point lookup (S4) must prune to one partition
    val lookup = s.read("Water")
      .where(col("date") === Date.valueOf("2021-01-02"))
    val scan = lookup.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan")).mkString("\n")
    assert(scan.contains("PartitionFilters: [isnotnull(date"),
      s"expected partition filter in:\n$scan")
    assert(lookup.collect().map(_.getAs[Double]("quantity")).toSeq == Seq(99.0))
  }

  test("selectRawDays on the partitioned layout prunes the date-list join") {
    val s = new TableStore(spark, tmpDir("pstore-s4"), partitionByDate = true)
    val rows = (1 to 28).map(d => Row(u, Date.valueOf(f"2021-01-$d%02d"), s"[$d]"))
    s.upsert("RawDayData", spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), Schemas.rawDayData))
    val df = s.selectRawDays(u,
      Seq("2021-01-03", "2021-01-07", "2021-02-01").map(java.time.LocalDate.parse))
    assert(df.collect().map(r => Option(r.getString(2))).toSeq ==
      Seq(Some("[3]"), Some("[7]"), None))
    // the tiny literal date side must reach the partitioned scan — either
    // as a DPP filter or (post-AQE) a pruned partition count ≤ requested
    // dates — instead of a 28-partition full scan
    val planStr = df.queryExecution.executedPlan.toString
    val pruned = planStr.contains("dynamicpruning") ||
      planStr.linesIterator.exists(l =>
        l.contains("FileScan") && !l.contains("PartitionFilters: []"))
    assert(pruned, s"no partition pruning evidence in:\n$planStr")
  }
}
