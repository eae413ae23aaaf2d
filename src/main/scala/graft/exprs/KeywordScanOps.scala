package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern scan (Aho & Corasick 1975 — the textbook
  * automaton): ONE pass over the text counts every occurrence of every
  * keyword, overlapping included. The naive alternative is k independent
  * substring scans (or k LIKE predicates) — k passes over a 100 TB
  * corpus; the automaton is one.
  *
  * The automaton rides the expression as a reference object: built once
  * driver-side from the keyword list, shipped per executor, `@transient
  * lazy` so only the keyword list serializes.
  */
final class KeywordTable(val keywords: Seq[String]) extends Serializable {
  require(keywords.nonEmpty && keywords.forall(_.nonEmpty),
    "keywords must be non-empty")

  /** (transitions per node as sorted parallel char/next arrays, fail
    * links, output keyword-id lists per node). */
  @transient private lazy val automaton: (Array[Array[Char]], Array[Array[Int]], Array[Int], Array[Array[Int]]) = {
    import scala.collection.mutable
    val children = mutable.ArrayBuffer(mutable.TreeMap.empty[Char, Int])
    val outs = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    keywords.zipWithIndex.foreach { case (kw, kid) =>
      var node = 0
      kw.foreach { ch =>
        node = children(node).getOrElseUpdate(ch, {
          children += mutable.TreeMap.empty[Char, Int]
          outs += mutable.ArrayBuffer.empty[Int]
          children.length - 1
        })
      }
      outs(node) += kid
    }
    val n = children.length
    val fail = new Array[Int](n)
    val queue = mutable.Queue.empty[Int]
    children(0).foreach { case (_, c) => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val v = queue.dequeue()
      children(v).foreach { case (ch, c) =>
        var f = fail(v)
        while (f != 0 && !children(f).contains(ch)) f = fail(f)
        fail(c) = children(f).get(ch).filter(_ != c).getOrElse(0)
        outs(c) ++= outs(fail(c)) // inherit matches ending here via fail
        queue += c
      }
    }
    val chArr = children.map(_.keysIterator.toArray).toArray
    val nxArr = children.map(_.valuesIterator.toArray).toArray
    (chArr, nxArr, fail, outs.map(_.toArray.sorted).toArray)
  }

  def nKeywords: Int = keywords.length

  /** Count all (overlapping) occurrences of each keyword in `text`.
    * The automaton arrays are hoisted ONCE per call — the lazy-val
    * accessor and tuple loads must not sit in the per-character loop
    * of the kernel whose whole pitch is the one-pass scan. */
  def scan(text: String): Array[Int] = {
    val (chArr, nxArr, fail, outs) = automaton
    val counts = new Array[Int](keywords.length)
    var state = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      var searching = true
      while (searching) {
        val hit = java.util.Arrays.binarySearch(chArr(state), ch)
        if (hit >= 0) { state = nxArr(state)(hit); searching = false }
        else if (state == 0) searching = false
        else state = fail(state)
      }
      val o = outs(state)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1; j += 1 }
      i += 1
    }
    counts
  }
}

object KeywordScanOps {
  def scan(text: UTF8String, table: KeywordTable): GenericArrayData =
    new GenericArrayData(
      table.scan(text.toString).asInstanceOf[Array[Int]].map(_.asInstanceOf[Any]))
}

/** `keyword_scan(text)`: per-keyword occurrence counts (array<int>,
  * index = keyword position in the table's list). */
case class KeywordScan(child: Expression, table: KeywordTable)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType)
  override def nullSafeEval(a: Any): Any =
    KeywordScanOps.scan(a.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("keywordTable", table,
      classOf[KeywordTable].getName)
    defineCodeGen(ctx, ev, a => s"graft.exprs.KeywordScanOps.scan($a, $tRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): KeywordScan =
    copy(child = newChild)
  override def prettyName: String = "keyword_scan"
}
