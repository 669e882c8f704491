package graft

/** The driver's smoke contract: entry() on sf0.001 must return rows, and
  * every catalog query must have matching column names with its oracle's
  * projection (the driver's compare sorts columns by name before hashing —
  * a silent rename would zero a query's score). */
class EntrySpec extends SparkSpec {

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; every query runs at sf0.001") {
    val qs = SparkEntry.queries
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(qs.contains(k), s"oracle $k has no query")
    }
    qs.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.limit(1).count() >= 0) // analyzes + executes the plan head
    }
  }
}
