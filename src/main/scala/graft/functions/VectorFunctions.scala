package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `ARRAY<FLOAT|DOUBLE>` embeddings.
  *
  * Pure built-in composition (`zip_with` / `aggregate` / `transform`) — stays
  * in codegen, no UDF serialization, scales per-partition.
  */
object VectorFunctions {

  /** Element-wise cast to double — do this once at the scan edge so all
    * downstream arithmetic is double-precision (matches oracle engines). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Unit-normalize, so downstream cosine is a plain dot product (compute
    * norms once per vector, not once per pair — the O(n·k) win in any
    * all-pairs or top-k join). Catalyst has no let-binding, so a norm
    * referenced inside a `transform` lambda is RE-AGGREGATED per element
    * (O(dim²) per row — the hazard minhashSignature's scaladoc documents);
    * `array_repeat` evaluates the norm once and the lambda reads elements. */
  def normalize(v: Column): Column =
    zip_with(v, array_repeat(l2Norm(v), size(v)), (x, n) => x / n)

  /** Scalar int8 quantization for embedding storage (4× smaller than
    * float32, 8× smaller than the double working set — at 100 TB of
    * embeddings this is the difference between one scan tier and four).
    * Returns struct(scale, q ARRAY<TINYINT>); [[dequantizeInt8]] inverts
    * with max relative error scale/127 per component. */
  def quantizeInt8(v: Column): Column = {
    val scale = greatest(array_max(transform(v, x => abs(x))), lit(1e-12))
    struct(
      scale.as("scale"),
      // same let-binding trick as normalize: `scale` is itself an array
      // aggregate, so referencing it inside the lambda would recompute
      // the max per element
      zip_with(v, array_repeat(scale, size(v)),
        (x, s) => round(x / s * 127, 0).cast("tinyint")).as("q"))
  }

  def dequantizeInt8(qv: Column): Column =
    transform(qv.getField("q"),
      b => b.cast("double") * qv.getField("scale") / 127.0)

  /** Deterministic random-hyperplane LSH signature (`nbits` sign bits packed
    * into a long). Plane weights are derived from xxhash64(plane, dim) — no
    * RNG state, so signatures are reproducible across runs and executors.
    * Backed by the codegen [[graft.plans.HyperplaneSig]] expression with
    * the weights precomputed at plan construction; the interpreted HOF
    * composition ([[hyperplaneSignatureComposed]], the spec reference)
    * re-derived every weight per row. */
  def hyperplaneSignature(v: Column, dim: Int, nbits: Int,
                          portable: Boolean = false): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.plans.HyperplaneSig(
        org.apache.spark.sql.graft.ColumnShim.expression(v), dim, nbits,
        portable))

  /** The pre-codegen composition — spec reference for
    * [[hyperplaneSignature]] parity. Per-plane weight arrays are generated
    * with a lambda (compact plan tree: unrolling dim×nbits element_at terms
    * makes a 2000+-node expression the optimizer re-traverses for seconds
    * per query). */
  private[graft] def hyperplaneSignatureComposed(v: Column, dim: Int,
                                                 nbits: Int): Column = {
    val bits = (0 until nbits).map { p =>
      val warr = transform(sequence(lit(0), lit(dim - 1)),
        d => (xxhash64(lit(p), d) % lit(1000003L)).cast("double") / lit(1000003.0))
      val proj = aggregate(zip_with(v, warr, (x, w) => x * w),
        lit(0.0), (a, x) => a + x)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }
}
