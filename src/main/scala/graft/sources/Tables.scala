package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Normalize `events.ts` to the session-zone TIMESTAMP whatever vintage of
    * driver data wrote it. The column has shipped in two physical forms:
    *   - parquet TIMESTAMP(NANOS) (older generator) — Spark's vectorized
    *     reader rejects it, so it arrives as a nanos LONG via `nanosAsLong`
    *     and is truncated to micros with integer `div` (not double division:
    *     1.7e18 ns overflows a double's 53-bit mantissa). DuckDB truncates
    *     ns→µs identically on read.
    *   - parquet TIMESTAMP(MICROS), not UTC-adjusted (current generator) —
    *     Spark infers TIMESTAMP_NTZ; under the UTC session zone every query
    *     and oracle runs in, the cast to TIMESTAMP is value-preserving and
    *     DuckDB reads the same micros directly.
    * Branching on the OBSERVED type (not a config) is what keeps one binary
    * working across driver data regenerations — round 8 lost all 12
    * events-backed queries to a hardcoded nanos assumption.
    */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
