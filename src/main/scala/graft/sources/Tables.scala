package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog over the driver-provided parquet tables (TESTDATA.md / FIXTURES.md §B).
  *
  * One parquet file per table. Reads are lazy `DataFrame`s so Catalyst can push
  * predicates and prune columns into the vectorized parquet scan; at 100 TB each
  * of these becomes a partitioned directory scan and nothing here changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
      // rejects; read it as a nanos long and convert to micros exactly
      // (integer `div`, not double division — 1.7e18 ns overflows a double's
      // 53-bit mantissa). DuckDB truncates ns→µs identically on read.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
