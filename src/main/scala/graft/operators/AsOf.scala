package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (nearest right row at-or-before — or, with
  * `direction = "forward"`, at-or-after — each left row's time), an operator
  * the reference lacks (SURVEY §2.3: "no as-of joins anywhere") but a staple
  * of event/feature pipelines.
  *
  * Implemented as union–sort–carry rather than a range join: tag both
  * streams, union, and carry the right-side values with
  * `last(_, ignoreNulls)` over a running (unboundedPreceding, currentRow)
  * frame — ordered ascending for backward, DESCENDING for forward, so both
  * directions use Spark's O(n) sliding frame (a (currentRow,
  * unboundedFollowing) shrinking frame re-aggregates from scratch per row —
  * O(n²) per key). One shuffle on the key, no quadratic candidate space —
  * at 100 TB this is the difference between a merge pass and an exploding
  * interval join. Ties: a right row at exactly the left row's time DOES
  * match in both directions (the side ordering puts right on the visible
  * side of the frame at equal time); `tiebreakCol` (present in both frames)
  * makes the carry deterministic when right rows share a timestamp. Which
  * duplicate wins follows pandas `merge_asof`: backward takes the LAST
  * right row in (time, tiebreak) order among the nearest (largest tiebreak
  * wins), forward takes the FIRST (smallest tiebreak wins) — each
  * direction keeps the row nearest to it in scan order.
  */
object AsOf {

  /** @param rightVals right-side columns to carry onto each left row (become
    *                   `asof_<name>`, NULL when no matching right row exists)
    * @param direction  "backward" (most recent right at or before the left
    *                   time — the default, the q38 semantics) or "forward"
    *                   (earliest right at or after it); ties at equal time
    *                   match in both directions
    * @param maxGapSeconds when set, a match farther than this from the left
    *                   time is nulled out (the left row is kept — pandas
    *                   merge_asof tolerance semantics). Compared at
    *                   microsecond precision: a right row 3600.9 s away
    *                   fails a 3600 s tolerance. Requires TIMESTAMP
    *                   time columns. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightVals: Seq[String], tiebreakCol: String,
               direction: String = "backward",
               maxGapSeconds: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val back = direction == "backward"
    // at equal time the right row must be visible from the left row's frame:
    // backward carries over (preceding..current) so right sorts FIRST;
    // forward carries over (current..following) so right sorts LAST
    val (leftSide, rightSide) = if (back) (1, 0) else (0, 1)
    // the tolerance needs the matched right TIME carried alongside. All
    // carried values ride in ONE struct (null on left rows, the whole row's
    // values on right rows): carrying each column independently with
    // last(ignoreNulls) would let a column whose matched value is NULL fall
    // through to an OLDER right row — mixing fields across rows, returning
    // stale values where merge_asof returns the matched row's NULL, and
    // leaking values from beyond the tolerance (gapOk checks the matched
    // row's time, which per-column carries don't share).
    val carryVals = (rightVals ++
      (if (maxGapSeconds.isDefined) Seq(rightTime) else Nil)).distinct
    val rvType = org.apache.spark.sql.types.StructType(carryVals.map(v =>
      org.apache.spark.sql.types.StructField(v, right.schema(v).dataType)))
    val leftCols = left.columns
    val taggedLeft = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(leftSide))
      .withColumn("_tb", col(tiebreakCol))
      .select(Seq(col(key), col("_t"), col("_side"), col("_tb")) ++
        leftCols.filter(_ != key).map(col) :+
        lit(null).cast(rvType).as("_rv"): _*)
    val taggedRight = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(rightSide))
      .withColumn("_tb", col(tiebreakCol))
      .select(Seq(col(key), col("_t"), col("_side"), col("_tb")) ++
        leftCols.filter(_ != key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(carryVals.map(v => col(v).as(v)): _*).as("_rv"): _*)
    // both directions run over the O(n) growing frame: forward reverses the
    // sort instead of using a shrinking (current..following) frame, which
    // Spark re-aggregates from scratch per row (quadratic in the key group).
    // Under the reversed order, right (side=1) still precedes left (side=0)
    // at equal time, and `_tb` DESC preserves the ascending-path forward
    // semantics (FIRST equal-time right in (time, tiebreak) order wins —
    // it is the row nearest the left one in the reversed scan). Backward's
    // ascending `_tb` symmetrically makes the LAST equal-time right win —
    // both match pandas merge_asof's duplicate handling.
    val ord =
      if (back) Window.partitionBy(col(key))
        .orderBy(col("_t"), col("_side"), col("_tb"))
      else Window.partitionBy(col(key))
        .orderBy(col("_t").desc, col("_side").desc, col("_tb").desc)
    val w = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedLeft.unionByName(taggedRight)
      .withColumn("_asof", last(col("_rv"), ignoreNulls = true).over(w))
    // native (microsecond) precision: unix_timestamp would truncate both
    // sides to whole seconds, quietly letting a match up to (g + 0.999...) s
    // away pass a g-second tolerance
    val gapOk: Column = maxGapSeconds match {
      case Some(g) =>
        val rt = unix_micros(col("_asof").getField(rightTime))
        val lt = unix_micros(col("_t"))
        (if (back) lt - rt else rt - lt) <= g * 1000000L
      case None => lit(true)
    }
    carried
      .where(col("_side") === leftSide)
      .select(leftCols.map(col) ++
        rightVals.map(v =>
          when(gapOk, col("_asof").getField(v)).as(s"asof_$v")): _*)
  }
}
