package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view refresh move
  * every lakehouse rollup table lives by: keep a compact per-key partial
  * state (count + sums are self-mergeable), fold ONLY the day's delta into
  * it, and never rescan the base fact. At 100 TB the base is the corpus and
  * the delta is a day's partition; the refresh cost is O(delta + |state|),
  * not O(base).
  *
  * State contract: every column besides the keys must be a distributive
  * aggregate (SUM/COUNT here — MIN/MAX merge the same way). AVG is NOT
  * state — it's derived (sum div count) at read time; storing it would make
  * states non-mergeable. That split (mergeable state vs derived readout) is
  * the whole design.
  */
object IncrAgg {

  /** Partial state for one slice of the fact: per-key counts and sums.
    * `sums` maps output column name -> input column to sum (as longs —
    * callers pre-convert money to cents; float state would make merge
    * order observable). */
  def state(slice: DataFrame, keys: Seq[String],
            sums: Map[String, org.apache.spark.sql.Column]): DataFrame = {
    val aggs = count(lit(1)).as("st_cnt") +:
      sums.toSeq.sortBy(_._1).map { case (n, c) => sum(c).as(n) }
    slice.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge any number of partial states: one keyed hash aggregate over
    * frames that are each already key-cardinality — map-side combine makes
    * the shuffle |keys|-sized regardless of how many slices merged. */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty)
    val u = states.reduce(_ unionByName _)
    val valueCols = u.columns.filterNot(keys.contains)
    val aggs = valueCols.map(c => sum(col(c)).as(c))
    u.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
