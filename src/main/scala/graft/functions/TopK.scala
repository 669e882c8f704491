package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k by score as a typed [[Aggregator]] (SURVEY §7.5's "custom
  * aggregate" candidate).
  *
  * The window-function top-k (`row_number` over score) must shuffle and sort
  * every candidate row per partition key; this aggregator keeps a k-bounded
  * buffer instead, so partial (map-side) aggregation caps the shuffle at k
  * rows per partition per key — the difference between shuffling the corpus
  * and shuffling k·queries at 100 TB.
  *
  * Ordering: score descending, id ascending on ties (matches the
  * deterministic ordering the window path uses).
  */
case class Scored(id: Long, score: Double)

class TopKAggregator(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  // Spark's sort order treats NaN as the LARGEST double (rank 1 under
  // score DESC) — java.lang.Double.compare has the same total order. A
  // raw `>` admission check is false for every NaN comparison, so one NaN
  // in a full buffer would block all further admissions and silently
  // diverge from the window path this aggregator must match exactly.
  private val ord: Ordering[Scored] = new Ordering[Scored] {
    def compare(x: Scored, y: Scored): Int = {
      val c = java.lang.Double.compare(y.score, x.score) // descending
      if (c != 0) c else java.lang.Long.compare(x.id, y.id)
    }
  }

  private def prune(xs: Seq[Scored]): Seq[Scored] = xs.sorted(ord).take(k)

  override def zero: Seq[Scored] = Seq.empty
  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    // cheap admission check before the O(k log k) prune
    if (buf.length < k || ord.compare(a, buf.last) < 0) prune(buf :+ a)
    else buf
  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    prune(a ++ b)
  override def finish(r: Seq[Scored]): Seq[Scored] = r // pruned = sorted

  override def bufferEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
}
