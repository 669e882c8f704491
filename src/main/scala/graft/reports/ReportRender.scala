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

  /** Color palette (reference styles.py:1-38 COLOR_PALETTES). */
  case class Palette(bg0: String, bg1: String, bg2: String,
                     fg0: String, fg1: String, fg2: String,
                     text0: String, text1: String, text2: String,
                     accent0: String, accent1: String,
                     gray0: String, gray1: String,
                     warning: String, error: String)

  object Palettes {
    val lisk: Palette = Palette(
      bg0 = "#FEF1E2", bg1 = "#FEDBAB", bg2 = "#FEC478",
      fg0 = "#FE9923", fg1 = "#FE8821", fg2 = "#E5741A",
      text0 = "#827F85", text1 = "#57555C", text2 = "#3C3A41",
      accent0 = "#21D8FF", accent1 = "#185B66",
      gray0 = "#DCC09B", gray1 = "#9E8E7D",
      warning = "#FF3D14", error = "#FF0000")
    val solarized: Palette = Palette(
      bg0 = "#FDF6E3", bg1 = "#EEE8D5", bg2 = "#DBD3BB",
      fg0 = "#C2BBA5", fg1 = "#A8A28F", fg2 = "#8F8979",
      text0 = "#586E75", text1 = "#073642", text2 = "#002B36",
      accent0 = "#268BD2", accent1 = "#2AA198",
      gray0 = "#93A1A1", gray1 = "#657B83",
      warning = "#CB4B16", error = "#DC322F")
    val default: Palette = lisk
  }

  /** Shared S11 geometry: the three stacked segments as (color, x, width)
    * in pixel space, scaled so the third cumulative offset fills `width`.
    * Category colors [gray1, warning|accent0, gray0] per types.py:162-166.
    * Single source of truth for both chart renderers — a divergence here
    * would silently ship a PNG attachment disagreeing with the inline SVG
    * of the same report. */
  private def chartSegments(bar: ProgressBar, style: Palette,
                            width: Int): Seq[(String, Double, Double)] = {
    val total = math.max(bar.offsets._3, 1L).toDouble
    val mid = if (bar.color == "warning") style.warning else style.accent0
    val colors = Seq(style.gray1, mid, style.gray0)
    val segs = Seq(bar.segments._1, bar.segments._2, bar.segments._3)
    val lefts = Seq(0L, bar.offsets._1, bar.offsets._2)
    colors.lazyZip(segs).lazyZip(lefts).map { (c, w, l) =>
      (c, l / total * width, math.max(w, 0L) / total * width)
    }
  }

  /** S11: the stacked progress-bar chart (reference types.py:129-190 renders
    * it through matplotlib to a PNG attachment) as inline SVG — same three
    * segments laid left-to-right from the cumulative offsets, transparent
    * background. SVG keeps the render deterministic and dependency-free;
    * [[renderChartPng]] consumes the same geometry. */
  def renderChartSvg(bar: ProgressBar, style: Palette = Palettes.default,
                     width: Int = 550, height: Int = 70): String = {
    val rects = chartSegments(bar, style, width).map { case (c, x, rw) =>
      f"""<rect x="$x%.1f" y="20" width="$rw%.1f" height="30" fill="$c"/>"""
    }.mkString("\n  ")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height">
       |  $rects
       |</svg>""".stripMargin
  }

  /** S11, PNG variant (reference types.py:129-190 matplotlib barh →
    * `tmp/temp.png`): the same stacked horizontal bar rasterized through the
    * JDK's own imaging (headless BufferedImage + ImageIO PNG encoder — no
    * external deps). Same geometry as [[renderChartSvg]]: three segments at
    * the cumulative offsets, category colors [gray1, warning|accent0,
    * gray0], transparent background, figure 550×70 as the reference's
    * 5.5×0.7 in @100 dpi. Returns the PNG bytes for the email attachment
    * (Content-ID `test.png@lisko.id`, tasks.py:217). */
  def renderChartPng(bar: ProgressBar, style: Palette = Palettes.default,
                     width: Int = 550, height: Int = 70): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_ARGB)
    val g = img.createGraphics()
    try {
      chartSegments(bar, style, width).foreach { case (c, x, rw) =>
        g.setColor(java.awt.Color.decode(c))
        g.fillRect(x.round.toInt, 20, rw.round.toInt, 30)
      }
    } finally g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** S6: the progress-report HTML (templates/mfp_progress_report.jinja2:1-111
    * extending lisko_report_base.jinja2, style dict from types.py:113-126) —
    * same row structure (header band / title row / article with intro, chart
    * and details table / footer), same style mapping (title bg = fg1, table
    * header bg = bg2, footer bg = text2, ...), same per-CELL alternation of
    * the two table background colors (the reference's `loop.cycle` sits in
    * the cell loop, so colors alternate by column, not by row — ported
    * faithfully). `generatedTs` is injectable for golden tests. */
  def renderHtml(user: String, table: Seq[ReportRow], bar: Option[ProgressBar],
                 today: LocalDate = LocalDate.now(),
                 style: Palette = Palettes.default,
                 generatedTs: Option[String] = None): String = {
    val day = table.lastOption.map(_.dayNumber).getOrElse(0)
    val title = s"MyFitnessPaw Progress Report (Day $day)"
    val todayStr = today.format(DateTimeFormatter.ofPattern("dd MMM yyyy", Locale.US))
    val ts = generatedTs.getOrElse(
      java.time.LocalDateTime.now().format(
        DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")))

    val headerCells = Seq("day", "date", "cal target", "deficit target",
      "deficit actual", "running deficit").map { h =>
      s"""<th style="background-color: ${style.bg2}; color: ${style.text2}; font-family: 'Roboto Condensed', sans-serif; text-align: center; font-size: 13px; line-height: 13px; padding: 4px 0 4px 0; border-bottom: 2px solid ${style.fg1}">$h</th>"""
    }.mkString("\n              ")

    def dataRow(r: ReportRow): String = {
      val cells = Seq(r.dayNumber.toString, r.date, r.caloriesTarget.toString,
        r.deficitTarget.toString, r.deficitActual.map(_.toString).getOrElse(""),
        r.deficitAccumulated.toString)
      val tds = cells.zipWithIndex.map { case (c, i) =>
        val bg = if (i % 2 == 0) style.bg1 else style.bg2 // loop.cycle per cell
        s"""<td style="background-color: $bg; color: ${style.text2}; font-family: 'Roboto Condensed', sans-serif; text-align: right; font-size: 13px; line-height: 13px; padding: 4px 5px 4px 0; border-bottom: 1px solid ${style.fg1};">$c</td>"""
      }.mkString("\n                ")
      s"<tr>\n                $tds\n              </tr>"
    }
    val rowsHtml = table.map(dataRow).mkString("\n            ")
    val chartHtml = bar.map(b => renderChartSvg(b, style)).getOrElse("")
    val sectionTitle = (label: String) =>
      s"""<td colspan="6" style="background-color: ${style.fg1}; color: ${style.text2}; font-family: 'Roboto Condensed', sans-serif; font-size: 18px; line-height: 20px; padding: 10px 5px 10px 5px;">$label</td>"""

    s"""<!DOCTYPE html>
       |<html>
       |<head>
       |  <meta http-equiv="Content-Type" content="text/html; charset=UTF-8" />
       |  <title>$title</title>
       |  <meta name="viewport" content="width=device-width, initial-scale=1.0"/>
       |  <style type="text/css">a[x-apple-data-detectors] {color: inherit !important;}</style>
       |</head>
       |<body style="margin: 0; padding: 0;">
       |<table class="outer-container" role="presentation" border="0" cellpadding="0" cellspacing="0" width="100%">
       |<tr><td style="padding: 0;">
       |<table class="main-container" border="0" cellpadding="0" cellspacing="0" style="width: 600px; border-collapse: collapse; border: none;">
       |  <tr class="header-row">
       |    <td style="padding-top: 20px;">
       |      <table class="header-table" width="100%" border="0" cellpadding="0" cellspacing="0" style="border-collapse: collapse; border: none;">
       |        <tr><td colspan="3" style="height: 30px; width: 100%; background-color: ${style.text2.toLowerCase};"></td></tr>
       |      </table>
       |    </td>
       |  </tr>
       |  <tr class="title-row">
       |    <td bgcolor="${style.fg1}" padding="0" margin="0">
       |      <table border="0" cellpadding="0" cellspacing="0" width="100%" style="border-collapse: collapse;">
       |        <tr>
       |          <td style="text-align: left; font-weight: bold; color: ${style.text2}; font-family: Roboto Slab, serif; font-size: 22px; line-height: 24px; padding: 15px 20px 10px 20px;">
       |            <p style="margin: 0;"> $title </p>
       |          </td>
       |        </tr>
       |      </table>
       |    </td>
       |  </tr>
       |  <tr class="article-row">
       |    <td style="background-color: ${style.bg0}; padding: 20px;">
       |      <table border="0" cellpadding="0" cellspacing="0" width="100%" style="border-collapse: collapse;">
       |        <tr>
       |          <td style="vertical-align: top; font-family: Roboto, sans-serif; font-size: 14px; line-height: 22px; padding: 10px 0 0 0;">
       |            <p style="margin: 0; display: block;"> Hello, ${user.capitalize}!</p>
       |            <p style="margin: 0; display: block;"> This is your daily MyFitnessPaw progress report for <strong>$todayStr</strong>.
       |          </td>
       |        </tr>
       |        <tr>
       |          <td style="padding: 10px 0 0 0;">
       |          <table width="100%" style="border-collapse: collapse;">
       |            <tr>${sectionTitle("Progress chart:")}</tr>
       |            <tr><td colspan="6">$chartHtml</td></tr>
       |            <tr>${sectionTitle("Progress details:")}</tr>
       |            <tr>
       |              $headerCells
       |            </tr>
       |            $rowsHtml
       |          </table>
       |          </td>
       |        </tr>
       |      </table>
       |    </td>
       |  </tr>
       |  <tr class="footer-row">
       |    <td style="background-color: ${style.text2}; color: ${style.text0}; font-family: 'Roboto Condensed', serif; font-weight: bold; font-size: 12px; line-height: 14px; padding: 0 20px 0 20px;">
       |      <table border="0" cellpadding="0" cellspacing="0" width="100%" style="border-collapse: collapse;">
       |        <tr><td width="80%"><p style="margin: 0; padding-top: 10px;">Generated on $ts</p></td></tr>
       |        <tr><td><p style="margin: 0; padding: 4px 0 10px 0;"><a href="#" style="color: ${style.accent0};">MyFitnessPaw</a></p></td></tr>
       |      </table>
       |    </td>
       |  </tr>
       |</table>
       |</td></tr>
       |</table>
       |</body>
       |</html>""".stripMargin
  }

  /** S7: save the rendered report locally (tasks.py:746-750). */
  def saveLocally(html: String, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), html)
}
