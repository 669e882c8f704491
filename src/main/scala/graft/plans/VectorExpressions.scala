package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for the dense-vector hot loop.
  *
  * `zip_with`/`aggregate` lambda composition is evaluated interpreted —
  * fine at the edges, but the inner loop of a k-NN or all-pairs join runs
  * per candidate pair. These expressions generate a tight primitive `for`
  * loop inside whole-stage codegen (`doGenCode`), the preference order the
  * build calls for: native Expression > composition > UDF.
  *
  * Inputs are `ARRAY<DOUBLE>` (cast floats once at the scan edge —
  * [[graft.functions.VectorFunctions.toDouble]]); elements are assumed
  * non-null (embedding vectors). Summation order matches the sequential
  * `aggregate(zip_with(...))` composition, so swapping implementations does
  * not move results even at the last ulp.
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
}

/** Σ aᵢ·bᵢ over the common prefix of the two arrays. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Single-pass cosine similarity; NULL when either vector has zero norm. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "cosine_sim"
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = $a.getDouble($i);
         |  double y = $b.getDouble($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($denom == 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $dot / $denom; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Long-typed folds for the fixed-point (integer-exact) vector paths —
  * [[graft.operators.Similarity.semanticDedup]]'s cell assignment and
  * intra-cell cosine test run per candidate pair, and the interpreted
  * `aggregate(zip_with(...))` lambdas measured ~4× the kernel cost there.
  * Long addition is associative and exact, so swapping the composition
  * for the kernel cannot move a single bit of any result. */
abstract class LongVectorFold extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
}

/** Σ aᵢ·bᵢ over the common prefix, exact long arithmetic. */
case class LongDotProduct(left: Expression, right: Expression)
    extends LongVectorFold {
  override def prettyName: String = "long_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var i = 0
    while (i < n) { dot += a.getLong(i) * b.getLong(i); i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long ${ev.value}_acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² over the common prefix, exact long arithmetic. */
case class LongSquaredDistance(left: Expression, right: Expression)
    extends LongVectorFold {
  override def prettyName: String = "long_sq_dist"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i); acc += d * d; i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long ${ev.value}_acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  ${ev.value}_acc += $d * $d;
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd random-hyperplane LSH signature with the hash-derived plane
  * weights PRECOMPUTED once at plan construction (nbits×dim doubles in a
  * reference object) — the lambda composition in
  * [[graft.functions.VectorFunctions.hyperplaneSignatureComposed]]
  * re-derived every weight with two xxhash calls per (plane, element) per
  * ROW on the interpreted HOF path, measured ~1.9 s over the sf0.1
  * embeddings and the dominant cost of the LSH ANN query. Weight recipe and
  * summation order match the composition exactly (xxhash64(p, d) =
  * hashInt(d, hashInt(p, 42)); % 1000003 → /1000003.0; sequential
  * multiply-add); a vector whose length differs from `dim` or carries a
  * null element yields signature 0 exactly as the composition's null-padded
  * zip_with does, and a NaN projection sets the bit (Spark's NaN > 0 is
  * true). One DELIBERATE divergence: a NULL input vector yields NULL (the
  * composition produced 0, silently landing null-embedding rows in bucket
  * 0 of every LSH table as candidates — NULL drops them from the band
  * equi-join instead). Parity + divergences pinned in
  * VectorExpressionsSpec. */
case class HyperplaneSig(child: Expression, dim: Int, nbits: Int,
                         portable: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(dim >= 1, s"dim $dim < 1")
  require(nbits >= 1 && nbits <= 64, s"nbits $nbits outside [1, 64]")

  override def prettyName: String =
    if (portable) "hyperplane_sig_portable" else "hyperplane_sig"
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE>, got ${other.simpleString}")
  }

  // default: identical derivation to (xxhash64(lit(p), d) % 1000003L)
  //          / 1000003.0 (the composed spec reference).
  // portable: md5-derived, signed-recentered ([[PortableHashKernel]]) so a
  //          DuckDB oracle can regenerate the SAME plane grid from
  //          md5('hp:p:d') — weights in (-1, 1) either way. Only the plane
  //          grid changes; projection loop and bit rule are shared.
  private lazy val weights: Array[Double] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val w = new Array[Double](nbits * dim)
    var p = 0
    while (p < nbits) {
      val hp = if (portable) 0L else XXH64.hashInt(p, 42L)
      var d = 0
      while (d < dim) {
        w(p * dim + d) =
          if (portable)
            PortableHashKernel.md5Signed(s"hp:$p:$d").toDouble / 1000003.0
          else (XXH64.hashInt(d, hp) % 1000003L).toDouble / 1000003.0
        d += 1
      }
      p += 1
    }
    w
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    // composition parity: wrong length OR any null element nulls the
    // zip_with products → every proj null → all bits 0
    if (arr.numElements() != dim) return 0L
    var d = 0
    while (d < dim) {
      if (arr.isNullAt(d)) return 0L
      d += 1
    }
    var out = 0L
    var p = 0
    while (p < nbits) {
      var acc = 0.0
      var i = 0
      while (i < dim) {
        acc += arr.getDouble(i) * weights(p * dim + i)
        i += 1
      }
      // Spark SQL comparison: NaN > 0 is TRUE (NaN sorts greatest)
      if (acc > 0 || java.lang.Double.isNaN(acc)) out |= 1L << p
      p += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val w = ctx.addReferenceObj("hyperplaneWeights", weights, "double[]")
      val out = ctx.freshName("out")
      val ok = ctx.freshName("ok")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |long $out = 0L;
         |boolean $ok = $a.numElements() == $dim;
         |for (int $d = 0; $ok && $d < $dim; $d++) {
         |  if ($a.isNullAt($d)) $ok = false;
         |}
         |if ($ok) {
         |  for (int $p = 0; $p < $nbits; $p++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $acc += $a.getDouble($d) * $w[$p * $dim + $d];
         |    }
         |    if ($acc > 0 || java.lang.Double.isNaN($acc)) $out |= 1L << $p;
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Order-preserving 64-bit key for a DOUBLE: `key(a) < key(b) ⟺ a
  * orders before b` under Spark's double ordering (NaN greatest). The
  * IEEE-754 bit trick — `bits ^ ((bits >> 63) & 0x7fff…fL)` on
  * `doubleToLongBits` (Lucene's doubleToSortableLong) — flips everything
  * BUT the sign bit for negatives and leaves non-negatives alone, making
  * the numeric order a SIGNED-long order (the `| Long.MinValue` variant
  * of the trick maps to the unsigned-comparison domain instead — wrong
  * under the decimal packing below, which compares signed; caught by the
  * q39 hash gate on first presentation). The canonical NaN encoding
  * lands above +Infinity, matching Spark's NaN-greatest comparator.
  *
  * Purpose: float orderings (a cosine similarity) can't ride the
  * decimal-packed argmin/argmax HashAggregate directly — this key makes
  * them packable, so `min/max(key·M + tiebreak)` replaces a
  * `min_by/max_by(payload, struct(...))` whose immutable struct buffer
  * silently plans SortAggregateExec (the q95/q79/q88 lesson; q39's
  * N·K assignment with vectors riding the sort was the last one).
  * Divergence from Spark struct ordering: −0.0 keys below 0.0 where
  * Spark compares them equal — an argmin tie between −0.0 and 0.0 of the
  * same quantity is the only observable case, unreachable for the cosine
  * inputs this serves (pinned in VectorExpressionsSpec). */
case class DoubleSortKey(child: Expression) extends UnaryExpression {
  override def prettyName: String = "double_sort_key"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DOUBLE, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bits = java.lang.Double.doubleToLongBits(input.asInstanceOf[Double])
    bits ^ ((bits >> 63) & 0x7fffffffffffffffL)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => {
      val bits = ctx.freshName("bits")
      s"""
         |long $bits = java.lang.Double.doubleToLongBits($d);
         |${ev.value} = $bits ^ (($bits >> 63) & 0x7fffffffffffffffL);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Registration: idempotent per-session helper plus a
  * `spark.sql.extensions`-loadable class. */
object VectorExpressions {
  private def entries = Seq(
    (new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    (new FunctionIdentifier("long_dot"),
      new ExpressionInfo(classOf[LongDotProduct].getName, "long_dot"),
      (args: Seq[Expression]) => LongDotProduct(args(0), args(1))),
    (new FunctionIdentifier("long_sq_dist"),
      new ExpressionInfo(classOf[LongSquaredDistance].getName, "long_sq_dist"),
      (args: Seq[Expression]) => LongSquaredDistance(args(0), args(1))),
    (new FunctionIdentifier("double_sort_key"),
      new ExpressionInfo(classOf[DoubleSortKey].getName, "double_sort_key"),
      (args: Seq[Expression]) => DoubleSortKey(args(0))))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    entries.foreach { case (id, info, builder) =>
      // idempotent: operators call register() defensively per query; blind
      // re-registration spams "replaced a previously registered function"
      if (!spark.sessionState.functionRegistry.functionExists(id))
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `--conf spark.sql.extensions=graft.plans.GraftExtensions` entry point. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (new FunctionIdentifier("dot_product"),
        new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
        (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction(
      (new FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
        (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
  }
}
