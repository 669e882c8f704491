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

  test("parseBaseline: missing file is None; committed baseline parses") {
    assert(Bench.parseBaseline("/nonexistent/baseline.json").isEmpty)
    val Some((sf, qs)) = Bench.parseBaseline("bench_baseline.json")
    assert(sf.endsWith("sf0.1"))
    assert(qs.size >= 50 && qs.values.forall(v => v > 0 && v < 1000))
  }
}
