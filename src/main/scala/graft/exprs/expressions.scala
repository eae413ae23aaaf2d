package graft.exprs

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for byte-parity semantics the built-ins can't
  * express (SURVEY.md §2.7 X1-X3). All implement doGenCode via direct static
  * calls so they stay inside whole-stage codegen (no CodegenFallback).
  */
case class MinifyJson(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    EventOps.minifyJson(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.EventOps.minifyJson($c)")
  override protected def withNewChildInternal(newChild: Expression): MinifyJson =
    copy(child = newChild)
  override def prettyName: String = "minify_json"
}

case class PayloadIsValid(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any =
    EventOps.validatePayload(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.EventOps.validatePayload($c)")
  override protected def withNewChildInternal(newChild: Expression): PayloadIsValid =
    copy(child = newChild)
  override def prettyName: String = "payload_is_valid"
}

case class LabelIsValid(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any =
    EventOps.validateLabel(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.EventOps.validateLabel($c)")
  override protected def withNewChildInternal(newChild: Expression): LabelIsValid =
    copy(child = newChild)
  override def prettyName: String = "label_is_valid"
}

/** XXH64(seed 0) over the reference's LE entry layout — Spark's builtin
  * xxhash64 hashes internal row representations with seed 42, so it cannot
  * reproduce the reference checksums. */
case class EventChecksum(
    timestamp: Expression,
    label: Expression,
    payload: Expression,
    versionPrevious: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(LongType, StringType, StringType, LongType)
  override def first: Expression = timestamp
  override def second: Expression = label
  override def third: Expression = payload
  override def fourth: Expression = versionPrevious
  override def dataType: DataType = LongType
  override protected def nullSafeEval(ts: Any, l: Any, p: Any, vp: Any): Any =
    EventOps.checksum(
      ts.asInstanceOf[Long],
      l.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String],
      vp.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ts, l, p, vp) =>
      s"graft.exprs.EventOps.checksum($ts, $l, $p, $vp)")
  override protected def withNewChildrenInternal(
      newFirst: Expression,
      newSecond: Expression,
      newThird: Expression,
      newFourth: Expression): EventChecksum =
    copy(
      timestamp = newFirst,
      label = newSecond,
      payload = newThird,
      versionPrevious = newFourth)
  override def prettyName: String = "event_checksum"
}

/** Validating hex->long parse (reference internal/hex/readUint64.go): null on
  * empty, >16 digits, or non-hex chars — unlike conv() which silently wraps. */
case class ParseHexVersion(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    EventOps.hexDecode(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}Tmp = graft.exprs.EventOps.hexDecode($c);
      if (${ev.value}Tmp == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}Tmp.longValue();
      }
    """)
  override protected def withNewChildInternal(newChild: Expression): ParseHexVersion =
    copy(child = newChild)
  override def prettyName: String = "parse_hex_version"
}

/** Shortest-lowercase-hex rendering of an (unsigned) long version. */
case class HexVersion(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] = Seq(LongType)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    EventOps.hexEncode(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.EventOps.hexEncode($c)")
  override protected def withNewChildInternal(newChild: Expression): HexVersion =
    copy(child = newChild)
  override def prettyName: String = "hex_version"
}
