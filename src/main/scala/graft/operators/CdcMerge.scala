package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Last-writer-wins CDC apply — the MERGE a change-data-capture consumer
  * runs to roll a change feed into a snapshot (the Delta/Hudi/Iceberg
  * upsert shape, expressed as one keyed aggregation).
  *
  * Contract: `base` is the current snapshot; `feed` carries the same
  * payload columns plus a monotonically increasing `seqCol` and an `opCol`
  * of `I`/`U`/`D`. Base rows enter the race at seq 0 as implicit inserts;
  * per key the highest (seq, op) wins — the op in the tiebreak makes equal-
  * seq collisions deterministic (`U` > `I` > `D` lexicographically) instead
  * of shuffle-order-dependent; a winning `D` erases the key.
  *
  * Scale shape: ONE keyed aggregation with a `max_by` partial — map-side
  * combine keeps a single candidate row per key per partition, so the
  * exchange carries ≤ one row per (key, partition) regardless of how many
  * times a hot key churns in the feed. Plan honesty: max_by's ROW-typed
  * buffer is immutable, so Spark plans SortAggregateExec — a
  * partition-local sort of each side's input by the key, NOT the
  * hash-agg the rest of the argmin family runs. That is the right
  * trade here: the decimal-packed argmax can't carry a whole row, and
  * the join-back alternative (hash-agg the winning (seq, op), rejoin for
  * the payload) costs two extra full-feed exchanges plus an explicit
  * dedup for at-least-once feeds — strictly worse than one local sort
  * with the same bounded-exchange guarantee. (PlanSpec allowlists this
  * SortAggregate explicitly.) Still no window and no join, and the
  * row_number formulation's partial WindowGroupLimit would sort the same
  * rows with a longer key. */
object CdcMerge {

  def merge(base: DataFrame, feed: DataFrame, keyCol: String,
            seqCol: String, opCol: String): DataFrame = {
    val payload = base.columns.filterNot(c => c == keyCol).toSeq
    require(payload.forall(feed.columns.contains),
      s"feed must carry the base payload columns: ${payload.mkString(",")}")
    val seeded = base
      .withColumn(seqCol, lit(0L))
      .withColumn(opCol, lit("I"))
    val all = seeded.unionByName(
      feed.select(seeded.columns.map(col).toSeq: _*))
    val row = struct((payload :+ opCol).map(col): _*)
    all.groupBy(col(keyCol))
      .agg(max_by(row, struct(col(seqCol), col(opCol))).as("w"))
      .where(col(s"w.$opCol") =!= "D")
      .select(col(keyCol) +: payload.map(c => col(s"w.$c").as(c)): _*)
  }
}
