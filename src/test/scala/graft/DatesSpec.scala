package graft

import java.time.LocalDate

import graft.sources.Dates

/** Port of the reference's date-window tests (test_tasks.py:269-348,
  * FIXTURES.md §A3). */
class DatesSpec extends SparkSpec {

  test("defaults: (today-6, today-1)") {
    val today = LocalDate.of(2021, 6, 15)
    assert(Dates.prepareWindow(None, None, today) ==
      (LocalDate.of(2021, 6, 9), LocalDate.of(2021, 6, 14)))
  }

  test("dd.MM.yyyy parses (_utils.py:33)") {
    assert(Dates.prepareWindow(Some("01.01.2021"), Some("02.01.2021")) ==
      (LocalDate.of(2021, 1, 1), LocalDate.of(2021, 1, 2)))
  }

  test("ISO parses") {
    assert(Dates.parseDate("2021-03-04") == LocalDate.of(2021, 3, 4))
  }

  test("invalid calendar dates reject instead of clamping (strptime parity)") {
    // SMART resolution would silently read Feb 31 as Feb 28 and shift the
    // fetch window; the reference's strptime raises
    intercept[IllegalArgumentException](Dates.parseDate("2026-02-31"))
    intercept[IllegalArgumentException](Dates.parseDate("31.02.2026"))
    intercept[IllegalArgumentException](Dates.parseDate("2025-02-29"))
    assert(Dates.parseDate("2024-02-29") == LocalDate.of(2024, 2, 29)) // leap
  }

  test("exactly one date → error") {
    intercept[IllegalArgumentException] {
      Dates.prepareWindow(Some("2021-01-01"), None)
    }
  }

  test("from > to → error") {
    intercept[IllegalArgumentException] {
      Dates.prepareWindow(Some("2021-01-05"), Some("2021-01-01"))
    }
  }

  test("D13 sequence: 5 consecutive dates inclusive") {
    val got = Dates.dateRange(spark,
      LocalDate.of(2021, 1, 1), LocalDate.of(2021, 1, 5))
      .collect().map(_.getDate(0).toString)
    assert(got.toSeq == Seq("2021-01-01", "2021-01-02", "2021-01-03",
      "2021-01-04", "2021-01-05"))
    intercept[IllegalArgumentException] {
      Dates.dateRange(spark, LocalDate.of(2021, 1, 5), LocalDate.of(2021, 1, 1))
    }
  }
}
