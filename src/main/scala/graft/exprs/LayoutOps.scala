package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DataTypes, IntegerType, LongType}

/** Data-layout kernels: Morton (Z-order) interleaving for multi-dimensional
  * file clustering. Sorting a table by the interleaved key before writing
  * makes every parquet row group / file a tight axis-aligned box in BOTH
  * dimensions, so min/max data skipping prunes 2-D range scans — the
  * standard layout lever (Z-ordering) for 100 TB fact tables where no
  * single sort column serves every query.
  */
object LayoutOps {
  /** Interleave the low 16 bits of x (even positions) and y (odd
    * positions) into one 32-bit Morton key, widened to Long. */
  def interleave16(x: Int, y: Int): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      i += 1
    }
    z
  }
}

/** Morton key of two int columns (see [[LayoutOps.interleave16]]). Codegen'd
  * so layout jobs keep the key computation inside whole-stage codegen. */
case class ZOrder16(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    LayoutOps.interleave16(a.asInstanceOf[Int], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.exprs.LayoutOps.interleave16($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder16 =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "zorder16"
}
