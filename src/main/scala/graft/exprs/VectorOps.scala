package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native vector kernels. The HOF formulation
  * `aggregate(zip_with(a,b,(x,y)->x*y), 0d, (acc,x)->acc+x)` materializes a
  * product array per pair and stays out of whole-stage codegen; this
  * expression is the same left-to-right fold (bit-identical doubles) as one
  * fused codegen'd loop — the hot kernel of ANN / embedding-dedup at scale.
  */
object VectorOps {
  /** Σ a(i)*b(i), accumulated left-to-right from 0.0 — exactly the fold
    * order of the HOF version and the DuckDB list_reduce oracle. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** PQ encode: per sub-space argmin over a flattened m × k × (dim/m)
    * codebook. Same arithmetic as the join formulation it replaces —
    * left-to-right squared-diff fold per candidate, ties to the LOWEST
    * code (strict `<` keeps the first winner) — but one fused loop per
    * vector instead of a k×-amplified join: m·k·(dim/m) flops per row,
    * zero intermediate rows. */
  def pqEncode(r: ArrayData, cb: Array[Double], m: Int, k: Int): ArrayData = {
    val dim = r.numElements()
    val dsub = dim / m
    val codes = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestD = Double.MaxValue
      var code = 0
      while (code < k) {
        val off = (sub * k + code) * dsub
        var s = 0.0
        var t = 0
        while (t < dsub) {
          val d = r.getDouble(sub * dsub + t) - cb(off + t)
          s += d * d
          t += 1
        }
        if (s < bestD) { bestD = s; best = code }
        code += 1
      }
      codes(sub) = best
      sub += 1
    }
    new GenericArrayData(codes)
  }

  /** ADC lookup sum: Σ_sub lut(sub)(codes(sub)) — the asymmetric-distance
    * inner loop, m array reads per candidate row. */
  def adcDot(codes: ArrayData, lut: ArrayData): Double = {
    val n = codes.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += lut.getArray(i).getDouble(codes.getInt(i))
      i += 1
    }
    s
  }
}

/** Dot product over two array<double> columns (see [[VectorOps.dot]]). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.exprs.VectorOps.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product"
}

/** Product-quantization encode (see [[VectorOps.pqEncode]]): residual
  * array<double> → array<int> of m codebook codes. The codebook rides the
  * expression as a codegen reference object — one double[] per executor,
  * never a per-row literal. */
case class PqEncode(child: Expression, codebook: Array[Double], m: Int, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType)
  override def nullSafeEval(a: Any): Any =
    VectorOps.pqEncode(a.asInstanceOf[ArrayData], codebook, m, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    defineCodeGen(ctx, ev,
      a => s"graft.exprs.VectorOps.pqEncode($a, $cbRef, $m, $k)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

/** ADC lookup sum over (codes array<int>, lut array<array<double>>) —
  * see [[VectorOps.adcDot]]. */
case class AdcDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(ArrayType(IntegerType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.adcDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.exprs.VectorOps.adcDot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "adc_dot"
}
