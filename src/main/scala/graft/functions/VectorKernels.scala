package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Compiled single-pass kernels for the dense-vector math in
  * [[VectorFunctions]] — the hot loop of the whole similarity-search
  * family (every ANN candidate pair evaluates a cosine; brute force
  * evaluates |Q|·N of them). The composed spelling
  * (`aggregate(zip_with(...))`) walks an interpreted expression tree
  * per ELEMENT; these kernels run one compiled loop per VECTOR while
  * reproducing the composition's semantics exactly:
  *
  *   - strict left-to-right accumulation in double (each accumulator
  *     sees the same addition sequence as its separate fold, so
  *     results are BIT-identical — the property the DuckDB oracles
  *     check 20+ queries deep),
  *   - per-element promotion float → double (Java widening, same as
  *     `cast("double")`),
  *   - `null` when the lengths differ (zip_with pads the shorter side
  *     with null, nulling the fold) or any element is null,
  *   - empty inputs fold to the 0.0 init.
  *
  * Division is deliberately NOT fused ([[VectorFunctions.cosineSim]]
  * composes the kernels with a Spark `Divide`): under ANSI mode a
  * zero divisor raises DIVIDE_BY_ZERO, and the kernels must not
  * change that contract.
  *
  * Inside higher-order lambdas (the IVF/PQ codebook folds) Spark
  * evaluates expressions interpreted; the kernels still help there —
  * one JVM call per vector instead of an expression-tree walk per
  * element.
  */
object VectorUtil {

  /** Σ a_i·b_i, or null on length mismatch / null element. */
  def dot(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  /** Σ a_i², or null on null element. */
  def normSq(a: ArrayData, af: Boolean): java.lang.Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      s += x * x
      i += 1
    }
    s
  }

  /** Σ q_i · ((c_i·amax)/127): dot product against an int8
    * scalar-quantized vector, reconstructing each element on the fly
    * from its byte code — the G9 score loop reading BYTES, not a
    * materialized double array. Element arithmetic is the exact
    * sequence of the composed spelling (`transform` reconstruction
    * then [[dot]]): widen byte → double, one multiply, one divide by
    * 127.0, then the q_i product — so results are BIT-identical to
    * the HOF composition (spec-pinned), just without the interpreted
    * per-element lambda. Null on length mismatch / null element.
    */
  def sqDot(q: ArrayData, codes: ArrayData, amax: Double,
            qf: Boolean): java.lang.Double = {
    val n = q.numElements()
    if (codes.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (q.isNullAt(i) || codes.isNullAt(i)) return null
      val x = if (qf) q.getFloat(i).toDouble else q.getDouble(i)
      val r = (codes.getByte(i).toDouble * amax) / 127.0
      s += x * r
      i += 1
    }
    s
  }

  /** Σ ((c_i·amax)/127)² — squared norm of the reconstruction,
    * byte-reading companion of [[sqDot]] (same element arithmetic as
    * `transform` + [[normSq]], bit-identical).
    */
  def sqNormSq(codes: ArrayData, amax: Double): java.lang.Double = {
    val n = codes.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (codes.isNullAt(i)) return null
      val r = (codes.getByte(i).toDouble * amax) / 127.0
      s += r * r
      i += 1
    }
    s
  }

  /** Σ (a_i − b_i)², or null on length mismatch / null element. */
  def l2Sq(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      s += (x - y) * (x - y)
      i += 1
    }
    s
  }

  /** 64-bit sign code: bit i set iff v_i > 0. Null elements give a 0
    * bit; dims past 64 ignored (see [[SignCode64]]).
    */
  def signCode(a: ArrayData, af: Boolean): Long = {
    val n = math.min(a.numElements(), 64)
    var code = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
        if (x > 0) code |= (1L << i)
      }
      i += 1
    }
    code
  }

}

/** Compiled argmin-by-l2 over a candidate array — the inner loop of
  * k-means assignment and PQ encoding as ONE kernel call per row.
  * Reproduces the `aggregate`-fold spelling exactly:
  *
  *   aggregate(sequence(0, k-1), struct(-1, +Inf),
  *     (acc, j) => { val d = l2Sq(v, cands[j+1])
  *                   when(d < acc.d, struct(j, d)).otherwise(acc) })
  *
  * i.e. strict `<` keeps the FIRST minimal index on exact ties; a
  * null distance (null candidate, length mismatch, null element)
  * leaves the accumulator untouched (`when(null, ...)` takes the
  * otherwise branch); no candidates → (-1, +Infinity).
  */
object ArgminL2Util {
  def argminL2(v: ArrayData, cands: ArrayData, vf: Boolean,
               cf: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    var bj = -1
    var bd = Double.PositiveInfinity
    val k = cands.numElements()
    var j = 0
    while (j < k) {
      if (!cands.isNullAt(j)) {
        val d = VectorUtil.l2Sq(v, cands.getArray(j), vf, cf)
        if (d != null && d.doubleValue() < bd) {
          bd = d.doubleValue()
          bj = j
        }
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bj, bd))
  }
}

/** Compiled argmax of dot(v, cand_j)/norm_j over a candidate array —
  * the IVF cell-assignment loop ([[VectorFunctions.ivfCellFold]]) as
  * one kernel call per corpus row. Fold semantics preserved: strict
  * `>` keeps the FIRST maximal index on exact ties, a null score
  * (length mismatch / null element) leaves the accumulator
  * untouched, no candidates → (-1, -Infinity).
  *
  * Divergence from the SQL fold, by design: a candidate with a
  * non-positive or NaN norm is SKIPPED outright (the SQL `Divide`
  * would raise DIVIDE_BY_ZERO under ANSI for norm==0), and a NaN
  * score loses the Java `>` comparison (Spark SQL's comparator
  * treats NaN as greater-than-all). Both cases require a degenerate
  * codebook — a zero/NaN-norm centroid — which trained and literal
  * codebooks never contain; skipping keeps the kernel total and
  * deterministic instead of propagating Inf/NaN winners.
  */
object ArgmaxDotNormUtil {
  def argmaxDotNorm(v: ArrayData, cands: ArrayData, norms: ArrayData,
                    vf: Boolean, cf: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    var bi = -1
    var bs = Double.NegativeInfinity
    val k = cands.numElements()
    var i = 0
    while (i < k) {
      if (!cands.isNullAt(i) && !norms.isNullAt(i) && norms.getDouble(i) > 0.0) {
        val d = VectorUtil.dot(v, cands.getArray(i), vf, cf)
        if (d != null) {
          val s = d.doubleValue() / norms.getDouble(i)
          if (s > bs) { bs = s; bi = i }
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bi, bs))
  }
}

case class ArgmaxDotNormIndexed(first: Expression, second: Expression,
                                third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("i",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("s", DoubleType, nullable = false)))

  @transient private lazy val vFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val cFloat: Boolean =
    second.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, c: Any, n: Any): Any =
    ArgmaxDotNormUtil.argmaxDotNorm(v.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], n.asInstanceOf[ArrayData], vFloat, cFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.ArgmaxDotNormUtil.argmaxDotNorm($a, $b, $c, $vFloat, $cFloat)")

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
                                                 c: Expression): ArgmaxDotNormIndexed =
    copy(first = a, second = b, third = c)
}

case class ArgminL2Indexed(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("j",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("d", DoubleType, nullable = false)))

  @transient private lazy val vFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val cFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any =
    ArgminL2Util.argminL2(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      vFloat, cFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ArgminL2Util.argminL2($a, $b, $vFloat, $cFloat)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArgminL2Indexed =
    copy(left = l, right = r)
}

/** Shared shape of the binary vector kernels: array<float|double> ×
  * array<float|double> → nullable double, with the element accessors
  * resolved from the (post-analysis) child types.
  */
abstract class BinaryVectorKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // null is also produced on length mismatch, not only from null inputs
  override def nullable: Boolean = true

  @transient protected lazy val leftFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient protected lazy val rightFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Fully-qualified static kernel, e.g. "graft.functions.VectorUtil.dot". */
  protected def kernel: String

  protected def evalKernel(a: ArrayData, b: ArrayData): java.lang.Double

  override def nullSafeEval(l: Any, r: Any): Any =
    evalKernel(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("vecKernelRes")
      s"""
         |java.lang.Double $res = $kernel($a, $b, $leftFloat, $rightFloat);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res.doubleValue(); }
       """.stripMargin
    })
}

case class DotProduct64(left: Expression, right: Expression) extends BinaryVectorKernel {
  override protected def kernel: String = "graft.functions.VectorUtil.dot"
  override protected def evalKernel(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorUtil.dot(a, b, leftFloat, rightFloat)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct64 =
    copy(left = l, right = r)
}

case class L2Sq64(left: Expression, right: Expression) extends BinaryVectorKernel {
  override protected def kernel: String = "graft.functions.VectorUtil.l2Sq"
  override protected def evalKernel(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorUtil.l2Sq(a, b, leftFloat, rightFloat)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Sq64 =
    copy(left = l, right = r)
}

case class NormSq64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    VectorUtil.normSq(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val res = ctx.freshName("vecKernelRes")
      s"""
         |java.lang.Double $res = graft.functions.VectorUtil.normSq($a, $isFloat);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res.doubleValue(); }
       """.stripMargin
    })

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): NormSq64 =
    copy(child = newChild)
}

/** dot(q, reconstruct(codes, amax)) — see [[VectorUtil.sqDot]]. */
case class SqDot64(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val qFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(q: Any, codes: Any, amax: Any): Any =
    VectorUtil.sqDot(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      amax.asInstanceOf[Double], qFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c, a) => {
      val res = ctx.freshName("sqDotRes")
      s"""
         |java.lang.Double $res = graft.functions.VectorUtil.sqDot($q, $c, $a, $qFloat);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
                                                 c: Expression): SqDot64 =
    copy(first = a, second = b, third = c)
}

/** ‖reconstruct(codes, amax)‖² — see [[VectorUtil.sqNormSq]]. */
/** K20: 64-bit sign code — bit i set iff v_i > 0 (G10's binary
  * quantization). One compiled loop per vector; the composed spelling
  * (a 64-term CASE-WHEN OR tree of element_at calls) compiles into a
  * codegen method large enough to trip the splitting/fallback paths
  * when it lands inside a join stage, which is exactly where G10
  * evaluates it — measured ~5× slower end-to-end at 200k vectors.
  * Null elements contribute a 0 bit (the CASE tree's `otherwise(0)`);
  * dims beyond 64 are ignored, shorter arrays set only their dims
  * (the composed spelling instead ANSI-errors below 64 — the
  * equivalence spec pins equality on the real 64-dim data).
  */
case class SignCode64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    VectorUtil.signCode(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorUtil.signCode($a, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): SignCode64 =
    copy(child = newChild)
}

case class SqNormSq64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(codes: Any, amax: Any): Any =
    VectorUtil.sqNormSq(codes.asInstanceOf[ArrayData], amax.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, a) => {
      val res = ctx.freshName("sqNormRes")
      s"""
         |java.lang.Double $res = graft.functions.VectorUtil.sqNormSq($c, $a);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqNormSq64 =
    copy(left = l, right = r)
}
