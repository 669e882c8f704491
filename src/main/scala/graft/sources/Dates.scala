package graft.sources

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-window planning (reference D13/D14: tasks.py:236-307,
  * _utils.py:19-40) — driver-side parameter logic plus a distributed
  * inclusive date-range generator.
  */
object Dates {

  // STRICT resolution (with `uuuu`, the era-free year STRICT requires):
  // the default SMART resolver silently clamps invalid calendar dates —
  // "2026-02-31" would parse as Feb 28 and quietly shift the fetch window,
  // where the reference's strptime (_utils.py:33-40) raises on the typo
  private val formats = Seq("uuuu-MM-dd", "dd.MM.uuuu").map(f =>
    DateTimeFormatter.ofPattern(f)
      .withResolverStyle(java.time.format.ResolverStyle.STRICT))

  /** Multi-format parse (F10): ISO first, then `dd.MM.yyyy`
    * (_utils.py:33-40). Invalid calendar dates REJECT, like strptime. */
  def parseDate(s: String): LocalDate = {
    formats.view.flatMap { f =>
      try Some(LocalDate.parse(s, f))
      catch { case _: Exception => None }
    }.headOption.getOrElse(
      throw new IllegalArgumentException(s"unparseable date: $s"))
  }

  /** D14: both-or-neither validation with (today−6, today−1) defaults
    * (tasks.py:260-262) and from≤to check. */
  def prepareWindow(from: Option[String], to: Option[String],
                    today: LocalDate = LocalDate.now()): (LocalDate, LocalDate) = {
    (from, to) match {
      case (None, None) => (today.minusDays(6), today.minusDays(1))
      case (Some(f), Some(t)) =>
        val (pf, pt) = (parseDate(f), parseDate(t))
        require(!pf.isAfter(pt), s"from_date $pf is after to_date $pt")
        (pf, pt)
      case _ => throw new IllegalArgumentException(
        "provide both from_date and to_date, or neither")
    }
  }

  /** D13: inclusive date sequence as a DataFrame(date DATE). Errors on
    * from>to like the reference (tasks.py:283-307) — Spark's `sequence`
    * would silently count down. */
  def dateRange(spark: SparkSession, from: LocalDate, to: LocalDate): DataFrame = {
    require(!from.isAfter(to), s"from_date $from is after to_date $to")
    spark.range(1).select(explode(sequence(
      lit(java.sql.Date.valueOf(from)),
      lit(java.sql.Date.valueOf(to)))).as("date"))
  }
}
