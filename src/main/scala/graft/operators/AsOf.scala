package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (most recent right row at or before each left row's time) —
  * an operator the reference lacks (SURVEY §2.3: "no as-of joins anywhere")
  * but a staple of event/feature pipelines.
  *
  * Implemented as union–sort–carry rather than a range join: tag both
  * streams, union, and carry the last right-side values forward with
  * `last(_, ignoreNulls)` over (key ORDER BY time, side, tiebreak). One
  * shuffle on the key, no quadratic candidate space — at 100 TB this is the
  * difference between a merge pass and an exploding interval join. Ties: a
  * right row at exactly the left row's time DOES match (right sorts first
  * at equal time); `tiebreakCol` (present in both frames) makes the carry
  * deterministic when right rows share a timestamp.
  */
object AsOf {

  /** @param rightVals right-side columns to carry onto each left row (become
    *                   `asof_<name>`, NULL when no prior right row exists) */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightVals: Seq[String], tiebreakCol: String): DataFrame = {
    val leftCols = left.columns
    val taggedLeft = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_tb", col(tiebreakCol))
      .select(Seq(col(key), col("_t"), col("_side"), col("_tb")) ++
        leftCols.filter(_ != key).map(col) ++
        rightVals.map(v =>
          lit(null).cast(right.schema(v).dataType).as(s"_rv_$v")): _*)
    val taggedRight = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_tb", col(tiebreakCol))
      .select(Seq(col(key), col("_t"), col("_side"), col("_tb")) ++
        leftCols.filter(_ != key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(v => col(v).as(s"_rv_$v")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(taggedLeft.unionByName(taggedRight)) {
      (df, v) =>
        df.withColumn(s"asof_$v",
          last(col(s"_rv_$v"), ignoreNulls = true).over(w))
    }
    carried
      .where(col("_side") === 1)
      .select(leftCols.map(col) ++ rightVals.map(v => col(s"asof_$v")): _*)
  }
}
