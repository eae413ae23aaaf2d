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

  /** Dense matrix–vector product: out(r) = Σ_c mat(r*cols + c) * v(c),
    * left-to-right fold per row. The OPQ rotation kernel — mat rides the
    * expression as one per-executor reference object. */
  def matVec(v: ArrayData, mat: Array[Double], rows: Int, cols: Int): GenericArrayData = {
    val out = new Array[Any](rows)
    var r = 0
    while (r < rows) {
      var s = 0.0
      var c = 0
      val base = r * cols
      while (c < cols) { s += mat(base + c) * v.getDouble(c); c += 1 }
      out(r) = s
      r += 1
    }
    new GenericArrayData(out)
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

/** Compiled PQ scoring state for the streaming probe expressions: coarse
  * centroids + flattened sub-codebooks, shipped once per executor as a
  * codegen reference object. */
final class PqScoreTable(
    val centroids: Array[Array[Double]], // coarseK × dim
    val codebook: Array[Double],         // m × k × (dim/m), flattened
    val m: Int,
    val k: Int) extends Serializable {
  def dim: Int = centroids.head.length
  def dsub: Int = dim / m
}

object PqScore {
  /** nProbe nearest coarse cells of a query vector by L2, ascending
    * distance, ties to the lower cell id (insertion sort over k ≤ 64
    * cells — selection, not a full sort). */
  def nearestCells(qv: ArrayData, t: PqScoreTable, nProbe: Int): ArrayData = {
    val kk = t.centroids.length
    val n = math.min(nProbe, kk)
    val dist = new Array[Double](kk)
    var c = 0
    while (c < kk) {
      val cen = t.centroids(c)
      var s = 0.0
      var i = 0
      while (i < cen.length) {
        val d = qv.getDouble(i) - cen(i); s += d * d; i += 1
      }
      dist(c) = s
      c += 1
    }
    val out = new Array[Int](n)
    val used = new Array[Boolean](kk)
    var j = 0
    while (j < n) {
      var best = -1
      var bestD = Double.MaxValue
      c = 0
      while (c < kk) {
        if (!used(c) && dist(c) < bestD) { bestD = dist(c); best = c }
        c += 1
      }
      used(best) = true
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** ADC cosine of (query, candidate codes) under the residual scheme:
    * (dot(q, c_cell) + Σ_sub dot(q_sub, codebook[sub][code])) /
    * (|q| · nrm). Identical fold orders to the batch LUT construction
    * ([[graft.operators.PqIndex.adcProbe]] builds lut[sub][code] with the
    * same per-sub left-to-right dot and sums subs left-to-right), so
    * streaming and batch scores are bit-identical. LUT-free: ~2·dim flops
    * per candidate instead of m lookups — right for a streaming probe
    * where queries are transient; the batch path amortizes its LUT over
    * the whole candidate scan. */
  def adcCosine(
      qv: ArrayData, cell: Int, codes: ArrayData, nrm: Double,
      t: PqScoreTable): Double = {
    val cen = t.centroids(cell)
    var qc = 0.0
    var i = 0
    while (i < cen.length) { qc += qv.getDouble(i) * cen(i); i += 1 }
    // the sub sums fold into their OWN accumulator first (the batch path
    // is `qdotc + adcDot(...)` — one addition of the completed Σ_sub);
    // folding each s into qc directly re-associates and drifts an ulp
    val dsub = t.dsub
    var acc = 0.0
    var sub = 0
    while (sub < t.m) {
      val off = (sub * t.k + codes.getInt(sub)) * dsub
      var s = 0.0
      var j = 0
      while (j < dsub) { s += qv.getDouble(sub * dsub + j) * t.codebook(off + j); j += 1 }
      acc += s
      sub += 1
    }
    var qn = 0.0
    i = 0
    val d = t.dim
    while (i < d) { val x = qv.getDouble(i); qn += x * x; i += 1 }
    (qc + acc) / (math.sqrt(qn) * nrm)
  }
}

/** `ivf_nearest_cells(qv)` → array<int> of the nProbe nearest coarse
  * cells (see [[PqScore.nearestCells]]). */
case class IvfNearestCells(child: Expression, table: PqScoreTable, nProbe: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    PqScore.nearestCells(v.asInstanceOf[ArrayData], table, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("pqScoreTable", table,
      classOf[PqScoreTable].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.exprs.PqScore.nearestCells($c, $tRef, $nProbe)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): IvfNearestCells = copy(child = newChild)
  override def prettyName: String = "ivf_nearest_cells"
}

/** `pq_adc_cosine(qv, cell, codes, nrm)` → double (see
  * [[PqScore.adcCosine]]). */
case class PqAdcCosine(
    first: Expression, second: Expression, third: Expression,
    fourth: Expression, table: PqScoreTable)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(ArrayType(DoubleType), IntegerType, ArrayType(IntegerType), DoubleType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    PqScore.adcCosine(a.asInstanceOf[ArrayData], b.asInstanceOf[Int],
      c.asInstanceOf[ArrayData], d.asInstanceOf[Double], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("pqScoreTable", table,
      classOf[PqScoreTable].getName)
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.exprs.PqScore.adcCosine($a, $b, $c, $d, $tRef)")
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): PqAdcCosine =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "pq_adc_cosine"
}

/** Dense mat-vec over an array<double> column (see [[VectorOps.matVec]]) —
  * the OPQ rotation applied corpus-wide as one codegen'd pass. */
case class MatVec(child: Expression, mat: Array[Double], rows: Int, cols: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullSafeEval(a: Any): Any =
    VectorOps.matVec(a.asInstanceOf[ArrayData], mat, rows, cols)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("matvecMat", mat, "double[]")
    defineCodeGen(ctx, ev,
      a => s"graft.exprs.VectorOps.matVec($a, $mRef, $rows, $cols)")
  }
  override protected def withNewChildInternal(newChild: Expression): MatVec =
    copy(child = newChild)
  override def prettyName: String = "mat_vec"
}
