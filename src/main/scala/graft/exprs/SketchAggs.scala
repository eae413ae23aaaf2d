package graft.exprs

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.trees.{TernaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** The Misra–Gries update/merge core, shared by the batch aggregate and
  * the streaming twin (one definition of the compression rule). */
object MisraGries {
  /** Weighted add with capacity compression: insert, then if over
    * capacity subtract the (capacity+1)-th largest count from every
    * entry and drop non-positives — the mergeable-summaries rule, whose
    * total subtracted mass (hence undercount) stays ≤ n/(capacity+1). */
  def add[K](buf: mutable.HashMap[K, Long], key: K, w: Long, capacity: Int): Unit = {
    buf.updateWith(key) {
      case Some(c) => Some(c + w)
      case None => Some(w)
    }
    if (buf.size > capacity) {
      // add() inserts exactly one key before this check, so the size here
      // is exactly capacity+1 and the (capacity+1)-th largest count IS
      // the minimum — one linear pass, not a sort (this runs on the
      // per-row update hot path whenever the buffer is full).
      val sub = buf.values.min
      buf.filterInPlace((_, c) => c > sub)
      buf.mapValuesInPlace((_, c) => c - sub)
    }
  }
}

/** Misra–Gries heavy-hitter summary as a native Catalyst aggregate.
  *
  * The classic frequent-items sketch (Misra & Gries 1982), with the
  * mergeable-summaries weighted merge (Agarwal et al., PODS 2012): the
  * buffer holds ≤ `capacity` (item, count) pairs; when an insert would
  * exceed capacity, the (capacity+1)-th largest count is subtracted from
  * every entry and non-positive entries drop. Undercount after any
  * sequence of updates and merges is ≤ n/(capacity+1), so every item with
  * true frequency > n/(capacity+1) SURVIVES in the candidate set — the
  * guarantee that lets a cheap exact recount over the candidates produce
  * exactly the items above a frequency threshold, with none missed.
  *
  * Scale shape: the full `groupBy(token)` vocabulary aggregate shuffles
  * one row per DISTINCT token — unbounded on a web-scale tail. This
  * aggregate carries a fixed ≤ capacity-entry buffer per partition
  * through a partial/final aggregation (no shuffle of the token
  * universe), and the follow-up recount is a broadcast-semi-join over a
  * ≤ capacity candidate list.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(capacity > 0, "misra_gries capacity must be positive")

  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(StringType)
  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[UTF8String, Long],
      key: UTF8String, w: Long): Unit =
    MisraGries.add(buf, key, w, capacity)

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    // copy: Spark reuses the UTF8String's backing buffer across rows
    if (v != null) add(buf, v.asInstanceOf[UTF8String].copy(), 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, c) => add(buf, k, c) }
    buf
  }

  /** Candidate items, sorted for a deterministic array value. Counts are
    * deliberately NOT exposed: they are underestimates whose exact values
    * depend on partitioning — callers recount exactly. */
  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val keys = buf.keys.toArray
    java.util.Arrays.sort(keys.asInstanceOf[Array[AnyRef]])
    new GenericArrayData(keys.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
  override def prettyName: String = "misra_gries"
}

/** One sampled row in a [[PrioritySampleAgg]] buffer. */
private[graft] final case class PrioEntry(priority: Double, id: Long, w: Double)

/** Priority sampling (Duffield, Lund, Thorup 2007) as a native
  * mergeable aggregate: the buffer holds the top-(k+1) rows by
  * (priority desc, id asc); eval emits the k kept rows as structs
  * (doc_id, w, rank, priority, w_est) with τ = the (k+1)-th priority
  * and ŵ = max(w, τ) — EXACTLY the batch sample_priority algebra, so
  * the streaming twin is bit-parity with the oracle-gated entry.
  *
  * Mergeability is exact (not approximate like MG): the global
  * top-(k+1) is a function of the per-partition top-(k+1)s, so
  * partial/final aggregation and stream-state merges lose nothing.
  * State is ≤ k+1 fixed-size entries — never grows with stream volume.
  */
case class PrioritySampleAgg(
    first: Expression, // priority (double)
    second: Expression, // id (long)
    third: Expression, // w (double)
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[PrioEntry]]
    with ImplicitCastInputTypes with TernaryLike[Expression] {

  require(k > 0, "priority_sample k must be positive")

  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(DoubleType, LongType, DoubleType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("w", DoubleType, nullable = false),
    StructField("rank", LongType, nullable = false),
    StructField("priority", DoubleType, nullable = false),
    StructField("w_est", DoubleType, nullable = false))))
  override def nullable: Boolean = false

  /** (priority desc, id asc): a is better than b. */
  private def better(a: PrioEntry, b: PrioEntry): Boolean =
    a.priority > b.priority || (a.priority == b.priority && a.id < b.id)

  private def add(buf: mutable.ArrayBuffer[PrioEntry], e: PrioEntry): Unit = {
    buf += e
    if (buf.length > k + 1) {
      // drop the single worst — O(k) linear pass on the hot path, the
      // MisraGries.add discipline (k is tens-to-hundreds by contract)
      var worst = 0
      var i = 1
      while (i < buf.length) {
        if (better(buf(worst), buf(i))) worst = i
        i += 1
      }
      buf.remove(worst)
      ()
    }
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[PrioEntry] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[PrioEntry],
      input: InternalRow): mutable.ArrayBuffer[PrioEntry] = {
    val p = first.eval(input)
    val id = second.eval(input)
    val w = third.eval(input)
    if (p != null && id != null && w != null)
      add(buf, PrioEntry(p.asInstanceOf[Double], id.asInstanceOf[Long],
        w.asInstanceOf[Double]))
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[PrioEntry],
      other: mutable.ArrayBuffer[PrioEntry]): mutable.ArrayBuffer[PrioEntry] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[PrioEntry]): Any = {
    val sorted = buf.sortWith(better)
    // under-full window (< k+1 rows seen): everything is kept and τ = 0
    // — ŵ = w exactly, the no-sampling-happened convention
    val tau = if (sorted.length == k + 1) sorted.last.priority else 0.0
    val kept = sorted.take(k)
    new GenericArrayData(kept.zipWithIndex.map { case (e, i) =>
      InternalRow(e.id, e.w, (i + 1).toLong, e.priority,
        math.max(e.w, tau))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.ArrayBuffer[PrioEntry]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { e =>
      out.writeDouble(e.priority)
      out.writeLong(e.id)
      out.writeDouble(e.w)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[PrioEntry] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[PrioEntry]
    var i = 0
    while (i < n) {
      buf += PrioEntry(in.readDouble(), in.readLong(), in.readDouble())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PrioritySampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PrioritySampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PrioritySampleAgg =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "priority_sample"
}
