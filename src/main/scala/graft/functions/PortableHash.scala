package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column twin of [[graft.plans.PortableHashKernel]] — a 60-bit hash every
  * engine can compute (DuckDB: `('0x' || substr(md5(c), 1, 15))::BIGINT`).
  * Pure built-ins (md5 → substring → conv), so it stays inside whole-stage
  * codegen like everything else in this package.
  */
object PortableHash {

  /** Value of the first 15 hex chars of md5(c) as a non-negative long.
    * `c` must be STRING or BINARY (Spark's md5 casts strings to their
    * UTF-8 bytes — same bytes DuckDB's md5(VARCHAR) digests). */
  def md5Head60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
}
