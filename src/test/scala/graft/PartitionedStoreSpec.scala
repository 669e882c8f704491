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
}
