package graft

import java.time.LocalDate

import graft.reports.ReportRender
import graft.reports.ReportRender.ReportRow

/** Driver-side report assembly (D16/D17/S6) against the reference's
  * types.py:129-201 semantics. */
class ReportRenderSpec extends SparkSpec {

  private val today = LocalDate.of(2021, 3, 10)
  private def row(day: Int, date: String, actual: Option[Int], acc: Int) =
    ReportRow(day, date, 2000, 100, actual, acc)

  test("D16: null rows dropped, stale last row empties the report, tail-N kept") {
    val rows = (1 to 10).map { i =>
      row(i, f"${i}%02d-Mar-2021",
        if (i == 4) None else Some(10 * i), 100 * i)
    }
    // last non-null row is 09-Mar = yesterday → keep last 7 non-null rows
    val ok = ReportRender.prepareNutritionTable(
      rows.filter(_.dayNumber <= 9), numRows = 7, today = today)
    assert(ok.length == 7)
    assert(ok.head.dayNumber == 2) // 8 non-null rows (1..9 minus day 4) → tail 7
    assert(ok.last.date == "09-Mar-2021")

    // stale: last row is 10-Mar ≠ yesterday? (10-Mar IS today, not yesterday)
    val stale = ReportRender.prepareNutritionTable(rows, 7, today)
    assert(stale.isEmpty)
    assert(ReportRender.prepareNutritionTable(Seq.empty, 7, today).isEmpty)
  }

  test("D17: positive deficit → accent segments (sum = goal − actual, per reference)") {
    val tbl = Seq(row(9, "09-Mar-2021", Some(300), 2500))
    val bar = ReportRender.progressBarData(tbl, endGoal = 150000).get
    assert(bar.color == "accent0")
    assert(bar.segments == ((2200L, 300L, 147200L)))
    // types.py:151: remaining = goal − acc − actual ⇒ segments total goal − actual
    assert(bar.segments._1 + bar.segments._2 + bar.segments._3 == 149700L)
    assert(bar.offsets == ((2200L, 2500L, 149700L)))
  }

  test("D17: negative deficit → warning variant (types.py:135-147 arithmetic)") {
    val tbl = Seq(row(9, "09-Mar-2021", Some(-400), 2500))
    val bar = ReportRender.progressBarData(tbl, endGoal = 150000).get
    assert(bar.color == "warning")
    // (acc-|a|, |a|, (goal-acc+|a|)+a) per the reference
    assert(bar.segments == ((2100L, 400L, 147500L)))
  }

  test("S6/S7: template-faithful HTML, lisk palette, per-cell striping; saves locally") {
    val tbl = Seq(row(8, "08-Mar-2021", Some(10), 100),
      row(9, "09-Mar-2021", Some(20), 120))
    val html = ReportRender.renderHtml("user@example.com", tbl,
      ReportRender.progressBarData(tbl, 150000), today,
      generatedTs = Some("2021-03-10 08:00:00"))
    // title shape (types.py:90) in <title>, title row, intro
    assert(html.contains("<title>MyFitnessPaw Progress Report (Day 9)</title>"))
    assert(html.contains("Hello, User@example.com!"))
    assert(html.contains("progress report for <strong>10 Mar 2021</strong>"))
    // style dict mapping (types.py:113-126) with the lisk palette:
    // title bg = fg1, table header bg = bg2, footer bg = text2 / text = text0
    assert(html.contains("""bgcolor="#FE8821""""))
    assert(html.contains("border-bottom: 2px solid #FE8821"))
    assert(html.contains("background-color: #FEC478; color: #3C3A41"))
    assert(html.contains("background-color: #3C3A41; color: #827F85"))
    // per-CELL color alternation (jinja loop.cycle in the cell loop):
    // column 0 gets bg1, column 1 gets bg2, on every row
    assert(html.contains("background-color: #FEDBAB") &&
      html.contains(">09-Mar-2021</td>"))
    val cells = "background-color: (#FEDBAB|#FEC478); color: #3C3A41[^>]*>([^<]*)</td>".r
      .findAllMatchIn(html).map(m => (m.group(1), m.group(2))).toSeq
    assert(cells.take(6).map(_._1) == Seq("#FEDBAB", "#FEC478", "#FEDBAB",
      "#FEC478", "#FEDBAB", "#FEC478"))
    assert(html.contains("Generated on 2021-03-10 08:00:00"))

    // solarized palette swaps cleanly
    val sol = ReportRender.renderHtml("u", tbl, None, today,
      style = ReportRender.Palettes.solarized,
      generatedTs = Some("x"))
    assert(sol.contains("""bgcolor="#A8A28F"""") && !sol.contains("#FE8821"))

    val path = tmpDir("report") + "/report.html"
    ReportRender.saveLocally(html, path)
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(path)) == html)
  }

  test("S11: chart SVG — three segments at cumulative offsets, warning color") {
    val accent = ReportRender.renderChartSvg(
      ReportRender.progressBarData(
        Seq(row(9, "09-Mar-2021", Some(300), 2500)), 150000).get)
    // category colors [gray1, accent0, gray0] (types.py:162-166, lisk)
    assert(accent.contains("""fill="#9E8E7D""""))
    assert(accent.contains("""fill="#21D8FF""""))
    assert(accent.contains("""fill="#DCC09B""""))
    // widths proportional to (2200, 300, 147200) of 149700 over 550px
    assert(accent.contains("""<rect x="0.0" y="20" width="8.1""""))

    val warning = ReportRender.renderChartSvg(
      ReportRender.progressBarData(
        Seq(row(9, "09-Mar-2021", Some(-400), 2500)), 150000).get)
    assert(warning.contains("""fill="#FF3D14"""") &&
      !warning.contains("#21D8FF"))
  }

  test("S11: chart PNG — decodable, right pixels at segment positions") {
    val bar = ReportRender.progressBarData(
      Seq(row(9, "09-Mar-2021", Some(300), 2500)), 150000).get
    val png = ReportRender.renderChartPng(bar)
    assert(png.take(8).toSeq ==
      Seq(0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n').map(_.toByte.toInt.toByte))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 550 && img.getHeight == 70)
    def rgb(x: Int, y: Int) = img.getRGB(x, y) & 0xFFFFFF
    // segment 1 (0..2200 of 149700 → ~8px) is gray1; far right is gray0
    assert(rgb(3, 35) == 0x9E8E7D)
    assert(rgb(540, 35) == 0xDCC09B)
    // above/below the bar band is transparent
    assert((img.getRGB(300, 5) >>> 24) == 0)
    // warning variant colors the middle segment with the warning hex
    val wbar = ReportRender.progressBarData(
      Seq(row(9, "09-Mar-2021", Some(-400), 2500)), 150000).get
    val wimg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ReportRender.renderChartPng(wbar)))
    // middle segment (|actual|=400 at offset 2100 of 150100 → ~px 7.7-9.2)
    val midX = ((wbar.offsets._1 + wbar.segments._2 / 2.0) /
      wbar.offsets._3 * 550).toInt
    assert((wimg.getRGB(midX, 35) & 0xFFFFFF) == 0xFF3D14)
  }
}
