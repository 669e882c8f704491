package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.model.Schemas
import graft.sources.TableStore

/** int8 quantization round-trip accuracy and store compaction. */
class QuantizeCompactSpec extends SparkSpec {
  import sqlImplicits._

  test("int8 quantize/dequantize: bounded error, cosine preserved") {
    val df = (0 until 40).map { i =>
      (i.toLong, Seq.tabulate(32)(j => math.sin(i * 1.1 + j * 0.3)))
    }.toDF("id", "v")
    val q = df.select(col("id"), col("v"),
      VectorFunctions.dequantizeInt8(
        VectorFunctions.quantizeInt8(col("v"))).as("vq"))
    val checked = q.select(col("id"),
      VectorFunctions.cosine(col("v"), col("vq")).as("cos"),
      array_max(transform(zip_with(col("v"), col("vq"), (a, b) => abs(a - b)),
        x => x)).as("max_err"))
      .collect()
    checked.foreach { r =>
      assert(r.getDouble(1) > 0.999, s"cosine degraded: ${r.getDouble(1)}")
      assert(r.getDouble(2) <= 1.0 / 127 + 1e-9) // |x|≤1 here ⇒ scale≤1
    }
  }

  test("compact merges incremental upsert files without changing data") {
    val s = new TableStore(spark, tmpDir("compact"))
    def rows(d: String, q: Double) = spark.createDataFrame(
      java.util.Arrays.asList(Row(Fixtures.user, Date.valueOf(d), q)),
      Schemas.water)
    (1 to 6).foreach(i => s.append("Water", rows(f"2021-01-0$i", i * 10.0)))
    val before = s.read("Water").collect()
      .map(r => (r.getDate(1).toString, r.getDouble(2))).sorted.toSeq
    val filesBefore = s.read("Water").inputFiles.length
    s.compact("Water", targetPartitions = 1)
    val after = s.read("Water").collect()
      .map(r => (r.getDate(1).toString, r.getDouble(2))).sorted.toSeq
    assert(after == before)
    assert(s.read("Water").inputFiles.length < filesBefore)
    assert(s.read("Water").inputFiles.length == 1)
  }
}
