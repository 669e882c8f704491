package graft.reports

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import java.util.Locale

/** Driver-side report assembly (reference types.py:55-201): the engine
  * delivers the collected report rows; this layer applies the tail-N window
  * guard (D16), derives the progress-bar segments (D17), and renders the
  * HTML shell (S6). All O(report-rows) — never distributed, mirroring the
  * reference.
  */
object ReportRender {

  /** One collected progress-report row (ProgressReport.query output order). */
  case class ReportRow(dayNumber: Int, date: String, caloriesTarget: Int,
                       deficitTarget: Int, deficitActual: Option[Int],
                       deficitAccumulated: Int)

  private val fmt = DateTimeFormatter.ofPattern("dd-MMM-yyyy", Locale.US)

  /** D16 (types.py:192-201): drop NULL-deficit rows, require the last row to
    * be yesterday (stale data ⇒ empty report), keep the last `numRows`. */
  def prepareNutritionTable(rows: Seq[ReportRow], numRows: Int = 7,
                            today: LocalDate = LocalDate.now()): Seq[ReportRow] = {
    val yesterday = today.minusDays(1).format(fmt)
    val window = rows.filter(_.deficitActual.isDefined)
    if (window.isEmpty || window.last.date != yesterday) Seq.empty
    else window.takeRight(numRows)
  }

  /** D17 (types.py:129-170): split yesterday's standing into three stacked
    * bar segments (done-before-yesterday, yesterday, remaining) with the
    * warning palette when yesterday's deficit was negative; returns the
    * segments plus their cumulative offsets (the numpy cumsum). */
  case class ProgressBar(segments: (Long, Long, Long), offsets: (Long, Long, Long),
                         color: String)

  def progressBarData(table: Seq[ReportRow], endGoal: Long): Option[ProgressBar] =
    table.lastOption.map { y =>
      val actual = y.deficitActual.get.toLong
      val acc = y.deficitAccumulated.toLong
      val (segments, color) =
        if (actual < 0) {
          val remaining = endGoal - acc + math.abs(actual)
          ((acc - math.abs(actual), math.abs(actual), remaining + actual),
            "warning")
        } else {
          ((acc - actual, actual, endGoal - acc - actual), "accent0")
        }
      val c1 = segments._1
      val c2 = c1 + segments._2
      val c3 = c2 + segments._3
      ProgressBar(segments, (c1, c2, c3), color)
    }

  /** S6: minimal HTML shell standing in for the jinja2 template
    * (templates/mfp_progress_report.jinja2) — same table columns, same
    * title shape. */
  def renderHtml(user: String, table: Seq[ReportRow], bar: Option[ProgressBar],
                 today: LocalDate = LocalDate.now()): String = {
    val day = table.lastOption.map(_.dayNumber).getOrElse(0)
    val header = Seq("day", "date", "cal target", "deficit target",
      "deficit actual", "running deficit")
    val rowsHtml = table.map { r =>
      s"<tr><td>${r.dayNumber}</td><td>${r.date}</td><td>${r.caloriesTarget}</td>" +
        s"<td>${r.deficitTarget}</td><td>${r.deficitActual.getOrElse("")}</td>" +
        s"<td>${r.deficitAccumulated}</td></tr>"
    }.mkString("\n")
    val barHtml = bar.map { b =>
      s"""<div class="bar ${b.color}" data-segments="${b.segments}" data-offsets="${b.offsets}"></div>"""
    }.getOrElse("")
    s"""<html><head><title>MyFitnessPaw Progress Report (Day $day)</title></head>
       |<body><h1>MyFitnessPaw Progress Report (Day $day)</h1>
       |<p>${user.capitalize} — ${today.format(DateTimeFormatter.ofPattern("dd MMM yyyy", Locale.US))}</p>
       |$barHtml
       |<table><tr>${header.map(h => s"<th>$h</th>").mkString}</tr>
       |$rowsHtml
       |</table></body></html>""".stripMargin
  }

  /** S7: save the rendered report locally (tasks.py:746-750). */
  def saveLocally(html: String, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), html)
}
