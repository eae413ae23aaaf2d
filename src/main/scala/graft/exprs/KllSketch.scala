package graft.exprs

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** A KLL-style mergeable quantile sketch (Karnin, Lang, Liberty, FOCS
  * 2016 — public literature), with DETERMINISTIC alternating-parity
  * compaction instead of the paper's coin flip: reproducibility is worth
  * more to this engine's gates than the randomized variant's slightly
  * tighter constants, and the deterministic alternation keeps the same
  * O(1/k · log(n/k)) worst-case rank-error shape (each compaction at a
  * level displaces ranks by ≤ its weight, compactions at level ℓ happen
  * ~n/(k·2^ℓ) times, and alternating the kept parity cancels adjacent
  * displacement instead of accumulating it).
  *
  * Structure: level ℓ holds ≤ k items, each counting for 2^ℓ originals;
  * a full level sorts, keeps every other item (parity alternates per
  * level-compaction), and pushes the kept half up one level. State is
  * O(k · log(n/k)) doubles REGARDLESS of n — the quantile analog of the
  * Misra–Gries buffer, and the piece the sketch family was missing
  * (HLL = distinct, MG = heavy hitters, Bloom = membership, KLL =
  * distribution shape).
  *
  * Rank query: all retained (item, 2^level) pairs sorted by item; the
  * φ-quantile is the smallest item whose cumulative weight reaches
  * φ·total (the quantile_disc convention, so the n ≤ k case — nothing
  * ever compacted — is EXACT and oracle-comparable).
  */
object KllSketch {

  final class State(val k: Int) extends Serializable {
    // levels(ℓ) = unsorted buffer of items with weight 2^ℓ
    val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Double]] =
      mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Double])
    // per-level compaction counter — the deterministic parity source
    val compactions: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer(0L)
    var total: Long = 0L

    def add(x: Double): Unit = {
      levels(0) += x
      total += 1
      compactFrom(0)
    }

    private def ensureLevel(l: Int): Unit =
      while (levels.length <= l) {
        levels += mutable.ArrayBuffer.empty[Double]
        compactions += 0L
      }

    private def compactFrom(start: Int): Unit = {
      // scan EVERY level from `start` up, not just a contiguous full
      // prefix: merge() bulk-appends whole level arrays, so a higher
      // level can be over-full while level 0 is under k — exiting at the
      // first non-full level would leave it uncompacted and break the
      // O(k·log(n/k)) state bound on merge-heavy paths (streaming state
      // merged every micro-batch, many-partition final aggregation)
      var l = start
      while (l < levels.length) {
        if (levels(l).length >= k) compactLevel(l)
        l += 1
      }
    }

    private def compactLevel(l: Int): Unit = {
      ensureLevel(l + 1)
      val buf = levels(l)
      val sorted = buf.toArray
      java.util.Arrays.sort(sorted)
      // compact the EVEN prefix only — promoting ceil(m/2) items at
      // double weight from an odd buffer would INFLATE total weight
      // by 2^l; the odd leftover (the largest item, deterministic)
      // stays at this level, so weight is conserved exactly and
      // retained weight always equals the true count
      val m = sorted.length - (sorted.length % 2)
      val parity = (compactions(l) % 2).toInt
      compactions(l) += 1
      buf.clear()
      var i = parity
      while (i < m) {
        levels(l + 1) += sorted(i)
        i += 2
      }
      if (sorted.length % 2 == 1) buf += sorted(sorted.length - 1)
    }

    def merge(other: State): Unit = {
      var l = 0
      while (l < other.levels.length) {
        ensureLevel(l)
        levels(l) ++= other.levels(l)
        l += 1
      }
      total += other.total
      compactFrom(0)
    }

    /** quantile_disc: smallest retained item whose cumulative weight
      * reaches φ·total (weights = 2^level). */
    def quantile(phi: Double): Double = {
      val items = mutable.ArrayBuffer.empty[(Double, Long)]
      var l = 0
      while (l < levels.length) {
        val w = 1L << l
        levels(l).foreach(x => items += ((x, w)))
        l += 1
      }
      require(items.nonEmpty, "quantile of an empty sketch")
      val sorted = items.sortBy(_._1)
      val retained = sorted.map(_._2).sum
      // target rank in RETAINED weight — compactions conserve weight
      // (the leftover rule above), so retained == total
      val target = math.max(1L, math.ceil(phi * retained).toLong)
      var cum = 0L
      var i = 0
      while (i < sorted.length) {
        cum += sorted(i)._2
        if (cum >= target) return sorted(i)._1
        i += 1
      }
      sorted.last._1
    }

    /** Retained-item count across levels (the state bound the spec pins). */
    def retainedCount: Int = levels.map(_.length).sum

    /** Total retained WEIGHT — compaction conserves it exactly, so this
      * must always equal [[total]] (the invariant the spec pins; a
      * drifting weight would silently bias every rank). */
    def retainedWeight: Long =
      levels.zipWithIndex.map { case (b, l) => b.length.toLong << l }.sum
  }

  def serialize(st: State): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(st.k)
    out.writeLong(st.total)
    out.writeInt(st.levels.length)
    var l = 0
    while (l < st.levels.length) {
      out.writeLong(st.compactions(l))
      out.writeInt(st.levels(l).length)
      st.levels(l).foreach(out.writeDouble)
      l += 1
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): State = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new State(in.readInt())
    st.total = in.readLong()
    val nLevels = in.readInt()
    st.levels.clear(); st.compactions.clear()
    var l = 0
    while (l < nLevels) {
      st.compactions += in.readLong()
      val n = in.readInt()
      val buf = mutable.ArrayBuffer.empty[Double]
      var i = 0
      while (i < n) { buf += in.readDouble(); i += 1 }
      st.levels += buf
      l += 1
    }
    st
  }
}

/** `kll_quantiles(x, φs, k)`: the KLL sketch as a native aggregate,
  * evaluating to array<double> of the φ-quantile estimates. */
case class KllQuantilesAgg(
    child: Expression,
    quantiles: Seq[Double],
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllSketch.State]
    with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k >= 8, "kll k must be at least 8")
  require(quantiles.nonEmpty && quantiles.forall(q => q > 0.0 && q <= 1.0),
    "quantiles must lie in (0, 1]")

  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(DoubleType)
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllSketch.State =
    new KllSketch.State(k)

  override def update(st: KllSketch.State, input: InternalRow): KllSketch.State = {
    val v = child.eval(input)
    if (v != null) st.add(v.asInstanceOf[Double])
    st
  }

  override def merge(st: KllSketch.State, other: KllSketch.State): KllSketch.State = {
    st.merge(other)
    st
  }

  override def eval(st: KllSketch.State): Any =
    // a group whose every value was null has an empty sketch: emit an
    // empty array (explode drops the group) rather than throwing
    if (st.total == 0L) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(quantiles.map(st.quantile).toArray[Any])

  override def serialize(st: KllSketch.State): Array[Byte] =
    KllSketch.serialize(st)
  override def deserialize(bytes: Array[Byte]): KllSketch.State =
    KllSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllQuantilesAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_quantiles"
}
