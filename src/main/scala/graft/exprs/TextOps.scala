package graft.exprs

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03)
  * as ONE pass per document. Semantically identical to the relational
  * formulation — explode every k-gram position, md5 each gram, sliding
  * `min() OVER (ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING)`, distinct —
  * which the DuckDB oracle still runs verbatim. The kernel replaces the
  * row-per-byte explode + doc_id shuffle + per-partition sort with a local
  * monotone-deque sweep: the md5 work is unchanged but no row amplification
  * ever reaches the engine, so a document costs O(bytes), not O(bytes)
  * ROWS through an exchange.
  */
object TextOps {
  private val K = 8 // k-gram length (bytes)
  private val W = 16 // winnow window (hashes)

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Distinct, sorted winnow fingerprints of a normalized UTF-8 byte
    * string. Hash = first 4 md5 bytes as unsigned big-endian (exactly
    * `conv(substring(md5(g),1,8),16,10)`); grams at the tail run short like
    * `substring` does; windows past position max(n-W+1, 1) are the
    * all-partial tail the relational form filters out. */
  def fingerprints(t: Array[Byte]): ArrayData = {
    val len = t.length
    val n = math.max(len - (K - 1), 1)
    val h = new Array[Long](n)
    val digest = md5.get()
    var i = 0
    while (i < n) {
      digest.reset()
      digest.update(t, i, math.min(K, len - i))
      val d = digest.digest()
      h(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val keep = math.max(n - (W - 1), 1)
    val out = new java.util.TreeSet[java.lang.Long]()
    // monotone deque over indices: front is the min of the current window
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    i = 0
    while (i < n) {
      while (tail > head && h(dq(tail - 1)) >= h(i)) tail -= 1
      dq(tail) = i
      tail += 1
      val start = i - (W - 1)
      if (start >= 0 && start < keep) {
        while (dq(head) < start) head += 1
        out.add(h(dq(head)))
      }
      i += 1
    }
    // n < W: the main loop never reaches start 0 — the single (clamped)
    // window [0, n) emits the global min, which is the deque front
    if (n < W) out.add(h(dq(head)))
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }
}

/** `winnow_fps(binary)` → sorted distinct array<long> of fingerprints. */
case class WinnowFingerprints(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextOps.fingerprints(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.TextOps.fingerprints($c)")
  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprints = copy(child = newChild)
  override def prettyName: String = "winnow_fps"
}
