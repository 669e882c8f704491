package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression machinery's parsing contract (no Spark needed). */
class BenchBaselineSpec extends AnyFunSuite {

  private def write(content: String): String = {
    val f = java.nio.file.Files.createTempFile("baseline", ".json")
    java.nio.file.Files.writeString(f, content)
    f.toString
  }

  test("parseBaseline reads plain and scientific-notation times plus sf") {
    val path = write(
      """{"queries":{"q01_grouped_sum":1.909201647,""" +
        """"q18_topk":8.53E-4,"q41_string_suite":2.8E2},""" +
        """"sf":"/root/testdata/sf0.1"}""")
    val Some((sf, qs)) = Bench.parseBaseline(path)
    assert(sf == "/root/testdata/sf0.1")
    assert(qs("q01_grouped_sum") == 1.909201647)
    assert(qs("q18_topk") == 8.53e-4) // regex must not stop at the mantissa
    assert(qs("q41_string_suite") == 280.0)
  }

  test("parseBaseline: missing file is None; sf absent means no baseline") {
    assert(Bench.parseBaseline("/nonexistent/baseline.json").isEmpty)
    // a file without an sf marker must not produce a comparable baseline
    assert(Bench.parseBaseline(write("""{"queries":{"q01":1.0}}""")).isEmpty)
  }
}
