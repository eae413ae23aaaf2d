package graft.exprs

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType, StructField, StructType}

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

  private val Space =
    org.apache.spark.unsafe.types.UTF8String.fromString(" ")
  private val Empty =
    org.apache.spark.unsafe.types.UTF8String.fromString("")

  /** Null array elements (possible on arbitrary user arrays; `split` never
    * produces them) are treated as empty strings rather than NPE-ing. */
  private def tok(tokens: ArrayData, i: Int)
      : org.apache.spark.unsafe.types.UTF8String = {
    val s = tokens.getUTF8String(i)
    if (s == null) Empty else s
  }

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** 32-bit SimHash over a token array: md5 each token occurrence, ±1 bit
    * votes, bit p set when its vote sum is >= 0. Bit extraction matches the
    * relational form exactly — bit p lives in hex digit p/4 of the md5
    * (first 4 digest bytes, high nibble first), shifted by p%4 — so the
    * DuckDB oracle is unchanged. One narrow pass per document replaces the
    * explode + 32-conditional-sum groupBy (its shuffle, map-side combine,
    * and 32 CASE evaluations per word row). */
  def simhash32(tokens: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val votes = new Array[Int](32)
    val digest = md5.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      digest.reset()
      val d = digest.digest(tok(tokens, i).getBytes)
      var p = 0
      while (p < 32) {
        val c = p / 4 // hex digit index (0-based) within the md5 hex string
        val b = d(c / 2) & 0xff
        val digit = if ((c & 1) == 0) b >>> 4 else b & 0xf
        votes(p) += (if (((digit >> (p % 4)) & 1) == 1) 1 else -1)
        p += 1
      }
      i += 1
    }
    var fp = 0L
    var p = 0
    while (p < 32) {
      if (votes(p) >= 0) fp |= 1L << p
      p += 1
    }
    fp
  }

  /** Word-triple shingles of a token array, matching the relational
    * formulation exactly: for n >= 3 tokens, one shingle per consecutive
    * triple joined by single spaces; for n < 3, ONE shingle = all tokens
    * joined (what `concat_ws` over the null leads produced). Tokens come
    * pre-split so Spark's `split` semantics (empty leading fields, kept
    * trailing fields) are inherited verbatim. */
  def ngramShingles(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val out =
      if (n >= 3) {
        val arr = new Array[org.apache.spark.unsafe.types.UTF8String](n - 2)
        var i = 0
        while (i < n - 2) {
          arr(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(
            Space, tok(tokens, i), tok(tokens, i + 1), tok(tokens, i + 2))
          i += 1
        }
        arr
      } else {
        val all = new Array[org.apache.spark.unsafe.types.UTF8String](n)
        var i = 0
        while (i < n) { all(i) = tok(tokens, i); i += 1 }
        Array(org.apache.spark.unsafe.types.UTF8String.concatWs(Space, all: _*))
      }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  // the minhash affine family's modulus/stride — inlined as literals in the
  // DuckDB oracle SQL (queries/Dedup.scala), so these must not drift
  private val MinhashP = 2147483647L
  private val MinhashC = 12582917L

  /** 12 affine minhashes over the doc's shingle set in one pass: shingle →
    * first-4-md5-bytes hash h (≙ conv(substring(md5(s),1,8),16,10)) →
    * running min of ((2j+1)·h + j·C) mod P for j in 0..11. min() is
    * duplicate-insensitive, so iterating occurrences equals iterating the
    * distinct set; the md5 digests the exact joined-shingle bytes without
    * materializing the string. Replaces the posexplode + two lead windows
    * (a doc_id shuffle + sort) + 12-min groupBy (another shuffle) with a
    * narrow per-document projection. */
  def minhash12(tokens: ArrayData): ArrayData = {
    val digest = md5.get()
    val space = ' '.toByte
    val n = tokens.numElements()
    val mins = Array.fill(12)(Long.MaxValue)

    def visit(h: Long): Unit = {
      var j = 0
      while (j < 12) {
        val v = (h * (j * 2 + 1) + j * MinhashC) % MinhashP
        if (v < mins(j)) mins(j) = v
        j += 1
      }
    }
    def hashOf(): Long = {
      val d = digest.digest()
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }

    if (n >= 3) {
      var i = 0
      while (i < n - 2) {
        digest.reset()
        digest.update(tok(tokens, i).getBytes)
        digest.update(space)
        digest.update(tok(tokens, i + 1).getBytes)
        digest.update(space)
        digest.update(tok(tokens, i + 2).getBytes)
        visit(hashOf())
        i += 1
      }
    } else {
      digest.reset()
      var i = 0
      while (i < n) {
        if (i > 0) digest.update(space)
        digest.update(tok(tokens, i).getBytes)
        i += 1
      }
      visit(hashOf())
    }
    new GenericArrayData(mins)
  }

  /** Decode an ArrayData of strings into a plain UTF8String[] for repeated
    * membership scans. [[TokenStats]] hoists this for foldable stop/marker
    * literals — decoded once per expression, shipped as a reference object —
    * so per-row work touches no ArrayData accessors for the lexicons. */
  def decodeLexicon(a: ArrayData)
      : Array[org.apache.spark.unsafe.types.UTF8String] = {
    val n = a.numElements()
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var j = 0
    while (j < n) { out(j) = tok(a, j); j += 1 }
    out
  }

  /** Per-document token statistics in one pass: total token count, stopword
    * hits, and one hit counter per marker word. Replaces the
    * explode + groupBy(doc_id) shuffle (and, for language ID, the
    * broadcast-join + second groupBy) that round 1 used — the counts are
    * computed inside the scan stage, so `text_quality`, `text_langid`, and
    * `pipeline_clean_corpus` need no exchange before their final (tiny)
    * aggregation. Semantics match the relational form the DuckDB oracle
    * still runs: n_words = count of split tokens, n_stop = tokens ∈ stops,
    * hits(j) = occurrences of markers(j). Stop/marker lists are literal
    * arrays of a few entries, so membership is a short linear scan.
    *
    * This overload takes pre-decoded lexicons — the foldable-literal fast
    * path [[TokenStats]] compiles to. */
  def tokenStatsPre(
      tokens: ArrayData,
      stopW: Array[org.apache.spark.unsafe.types.UTF8String],
      markW: Array[org.apache.spark.unsafe.types.UTF8String]): InternalRow = {
    val ns = stopW.length
    val nm = markW.length
    val n = tokens.numElements()
    var j = 0
    val hits = new Array[Long](nm)
    var nStop = 0L
    var i = 0
    while (i < n) {
      val t = tok(tokens, i)
      j = 0
      var stopped = false
      while (j < ns && !stopped) {
        if (stopW(j).equals(t)) { nStop += 1L; stopped = true }
        j += 1
      }
      j = 0
      while (j < nm) {
        if (markW(j).equals(t)) hits(j) += 1L
        j += 1
      }
      i += 1
    }
    new GenericInternalRow(
      Array[Any](n.toLong, nStop, new GenericArrayData(hits)))
  }

  /** Generic path for non-foldable lexicons: decode per call. */
  def tokenStats(
      tokens: ArrayData,
      stops: ArrayData,
      markers: ArrayData): InternalRow =
    tokenStatsPre(tokens, decodeLexicon(stops), decodeLexicon(markers))

  /** Per-document repetition statistics in ONE pass: token count, distinct
    * tokens, the top token's occurrence count, bigram count, and distinct
    * consecutive bigrams (pair identity = the two tokens joined with a
    * single space — unambiguous because whitespace-split tokens contain no
    * spaces). Replaces the relational form's double explode + two
    * groupBy(doc_id [, token]) shuffles (which the DuckDB oracle still
    * runs verbatim): Gopher-style repetition filters read these ratios to
    * drop boilerplate-heavy documents, and at corpus scale the counts must
    * come out of the scan stage, not out of exchanges over word rows. */
  def repetitionStats(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    val uni = new java.util.HashMap[
      org.apache.spark.unsafe.types.UTF8String, Array[Long]](
      math.max(16, n * 2))
    var top = 0L
    var i = 0
    while (i < n) {
      val t = tok(tokens, i)
      var c = uni.get(t)
      if (c == null) { c = Array(0L); uni.put(t, c) }
      c(0) += 1L
      if (c(0) > top) top = c(0)
      i += 1
    }
    val bigrams = new java.util.HashSet[
      org.apache.spark.unsafe.types.UTF8String](math.max(16, n * 2))
    i = 0
    while (i < n - 1) {
      bigrams.add(org.apache.spark.unsafe.types.UTF8String.concat(
        tok(tokens, i), Space, tok(tokens, i + 1)))
      i += 1
    }
    new GenericInternalRow(Array[Any](
      n.toLong, uni.size.toLong, top,
      math.max(n - 1, 0).toLong, bigrams.size.toLong))
  }

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

/** `ngram_shingles(array<string>)` → word-triple shingle strings. */
case class NgramShingles(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextOps.ngramShingles(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.TextOps.ngramShingles($c)")
  override protected def withNewChildInternal(
      newChild: Expression): NgramShingles = copy(child = newChild)
  override def prettyName: String = "ngram_shingles"
}

/** `minhash12(array<string>)` → the 12-long minhash signature. */
case class Minhash12(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextOps.minhash12(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.TextOps.minhash12($c)")
  override protected def withNewChildInternal(
      newChild: Expression): Minhash12 = copy(child = newChild)
  override def prettyName: String = "minhash12"
}

/** `simhash32(array<string>)` → 32-bit SimHash fingerprint as long. */
case class SimHash32(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextOps.simhash32(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.TextOps.simhash32($c)")
  override protected def withNewChildInternal(
      newChild: Expression): SimHash32 = copy(child = newChild)
  override def prettyName: String = "simhash32"
}

/** `token_stats(tokens, stops, markers)` →
  * struct(n_words long, n_stop long, hits array<long>[len(markers)]). */
case class TokenStats(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(ArrayType(StringType), ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("hits", ArrayType(LongType, containsNull = false),
      nullable = false)))
  // Every call site passes literal stop/marker lists; decode them ONCE at
  // plan time instead of per row (the decoded arrays ride into generated
  // code as reference objects). Null literals fall through to the generic
  // path, whose null handling (nullSafeEval / codegen guards) is unchanged.
  @transient private lazy val preDecoded: Option[
      (Array[org.apache.spark.unsafe.types.UTF8String],
       Array[org.apache.spark.unsafe.types.UTF8String])] =
    if (second.foldable && third.foldable) {
      (second.eval(null), third.eval(null)) match {
        case (s: ArrayData, m: ArrayData) =>
          Some((TextOps.decodeLexicon(s), TextOps.decodeLexicon(m)))
        case _ => None
      }
    } else None

  override def nullSafeEval(t: Any, s: Any, m: Any): Any =
    preDecoded match {
      case Some((stopW, markW)) =>
        TextOps.tokenStatsPre(t.asInstanceOf[ArrayData], stopW, markW)
      case None =>
        TextOps.tokenStats(t.asInstanceOf[ArrayData],
          s.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData])
    }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    preDecoded match {
      case Some((stopW, markW)) =>
        val stopRef = ctx.addReferenceObj("stopW", stopW,
          "org.apache.spark.unsafe.types.UTF8String[]")
        val markRef = ctx.addReferenceObj("markW", markW,
          "org.apache.spark.unsafe.types.UTF8String[]")
        defineCodeGen(ctx, ev,
          (t, _, _) => s"graft.exprs.TextOps.tokenStatsPre($t, $stopRef, $markRef)")
      case None =>
        defineCodeGen(ctx, ev,
          (t, s, m) => s"graft.exprs.TextOps.tokenStats($t, $s, $m)")
    }
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): TokenStats =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def prettyName: String = "token_stats"
}

/** `repetition_stats(array<string>)` → struct(n_tokens, n_distinct,
  * top_cnt, n_bigrams, n_distinct_bigrams — all long). */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct_bigrams", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    TextOps.repetitionStats(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.TextOps.repetitionStats($c)")
  override protected def withNewChildInternal(
      newChild: Expression): RepetitionStats = copy(child = newChild)
  override def prettyName: String = "repetition_stats"
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

/** Compiled BPE merge table for [[BpeEncodeIds]]: the learned merges as
  * parallel arrays in application order, plus the merged-symbol id map
  * under the engine's id scheme (FIRST round wins for a re-learned
  * symbol — the exact contract of the batch tokenizer's mergeIdMapCol).
  * Two alphabets share the machinery:
  *  - a-z (`byteLevel = false`): base chars a-z → 0-25, round-r merge →
  *    25 + r, words are lowercased `[a-z]+` runs;
  *  - BYTE (`byteLevel = true`): base symbols are the 2-hex-char
  *    UPPERCASE renderings of a word's UTF-8 bytes (id = the byte value,
  *    0-255), round-r merge → 255 + r, words are raw whitespace tokens —
  *    no input is ever out-of-alphabet (the GPT-2 byte-alphabet
  *    property), so digits, punctuation, case, and non-Latin text all
  *    tokenize.
  * One instance rides the expression as a codegen reference object:
  * per-executor, never per-row. */
final class BpeMergeTable(
    val lhs: Array[String],
    val rhs: Array[String],
    val merged: Array[String],
    val mergedIds: java.util.HashMap[String, Integer],
    val byteLevel: Boolean,
    val preTok: Boolean = false,
    val gpt2: Boolean = false,
    /** true = ids come from an imported PUBLISHED vocabulary
      * ([[BpeMergeTable.gpt2Imported]]): `mergedIds` then covers EVERY
      * symbol including the 256 single-byte bases (whose released ids
      * are NOT the byte values), and the encode/decode kernels route all
      * id traffic through it instead of the byte-value shortcut. */
    val explicitVocab: Boolean = false) extends Serializable {

  /** id → merged symbol's raw bytes, for [[BpeDecode]] (byte alphabet
    * only: symbols are hex-pair strings). Inverts the FIRST-round-wins id
    * map, so exactly the ids the encoder can emit decode. Built lazily
    * per executor, never shipped. */
  @transient lazy val idSymbolBytes: java.util.HashMap[Integer, Array[Byte]] = {
    val m = new java.util.HashMap[Integer, Array[Byte]]()
    val it = mergedIds.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val hex = e.getKey
      val b = new Array[Byte](hex.length / 2)
      var i = 0
      while (i < b.length) {
        b(i) = ((Character.digit(hex.charAt(2 * i), 16) << 4) |
          Character.digit(hex.charAt(2 * i + 1), 16)).toByte
        i += 1
      }
      m.put(e.getValue, b)
    }
    m
  }
}

object BpeMergeTable {
  private def build(
      merges: Seq[(Long, String, String, String, Long)],
      idBase: Int, byteLevel: Boolean, preTok: Boolean = false,
      gpt2: Boolean = false): BpeMergeTable = {
    val ids = new java.util.HashMap[String, Integer]()
    for ((round, _, _, m, _) <- merges if !ids.containsKey(m))
      ids.put(m, Integer.valueOf(idBase + round.toInt))
    new BpeMergeTable(
      merges.map(_._2).toArray, merges.map(_._3).toArray,
      merges.map(_._4).toArray, ids, byteLevel, preTok, gpt2)
  }

  /** a-z alphabet, from `(round, lhs, rhs, merged, pair_freq)` rows in
    * learned order — `train_bpe`'s output schema and
    * [[graft.operators.BpeModel]]'s on-disk artifact. */
  def apply(merges: Seq[(Long, String, String, String, Long)]): BpeMergeTable =
    build(merges, 25, byteLevel = false)

  /** BYTE alphabet (train_bpe_bytes' merges: hex-pair symbols). */
  def bytes(merges: Seq[(Long, String, String, String, Long)]): BpeMergeTable =
    build(merges, 255, byteLevel = true)

  /** BYTE alphabet with the PRODUCTION pre-tokenizer: letter runs, digit
    * runs, and symbol runs split apart (GPT-2's category-splitting idea)
    * instead of whitespace-glued words — "Hello," is two pre-tokens, so
    * punctuation never inflates the word vocabulary. */
  def pretok(merges: Seq[(Long, String, String, String, Long)]): BpeMergeTable =
    build(merges, 255, byteLevel = true, preTok = true)

  /** BYTE alphabet with the GPT-2-COMPLETE pre-tokenizer: the category
    * runs of [[pretok]] PLUS the contraction cases ('s 't 're 've 'm
    * 'll 'd split off their host word) and the space-prefix convention
    * (a single leading space folds into the following run — " the" is
    * ONE pre-token, so word-boundary information survives into the
    * vocabulary), with residual whitespace runs kept as pre-tokens of
    * their own. The alternation covers EVERY character, so the extracted
    * pre-tokens tile the document exactly — decode ∘ encode re-joined
    * reproduces the original text bit-for-bit, whitespace included
    * (the category-run pre-tokenizer could only promise the
    * whitespace-normalized form). Whitespace semantics are GPT-2's exact
    * lookahead form (round 12): `\s+(?!\S)` ahead of the residual `\s+`
    * makes an interior whitespace run donate its last space to the
    * following word — Java regex runs the lookahead directly; the DuckDB
    * oracle (RE2, no lookarounds) reproduces it with a post-split fix-up
    * proven equivalent in Gpt2LookaheadSpec. */
  def gpt2(merges: Seq[(Long, String, String, String, Long)]): BpeMergeTable =
    build(merges, 255, byteLevel = true, gpt2 = true)

  /** BYTE alphabet + GPT-2-complete pre-tokenizer with an EXPLICIT
    * published vocabulary (round 13, [[graft.operators.BpeModel]]
    * `importMerges`): the id of EVERY symbol — the 256 single-byte
    * bases included — comes from the released vocab.json (keys already
    * translated to the engine's hex symbols), so the engine emits the
    * RELEASED tokenizer's exact ids through the same fused kernel. */
  def gpt2Imported(
      merges: Seq[(Long, String, String, String, Long)],
      vocab: Map[String, Int]): BpeMergeTable = {
    val ids = new java.util.HashMap[String, Integer]()
    vocab.foreach { case (sym, id) => ids.put(sym, Integer.valueOf(id)) }
    new BpeMergeTable(
      merges.map(_._2).toArray, merges.map(_._3).toArray,
      merges.map(_._4).toArray, ids, byteLevel = true, preTok = false,
      gpt2 = true, explicitVocab = true)
  }
}

object BpeEncode {
  private val Word = java.util.regex.Pattern.compile("[a-z]+")
  private val NonWs = java.util.regex.Pattern.compile("[^\\s]+")
  /** The production pre-tokenizer: letter runs | digit runs | symbol
    * runs (RE2-compatible, so the DuckDB oracle tokenizes identically). */
  private val PreTok = java.util.regex.Pattern.compile(
    "[\\p{L}]+|[\\p{N}]+|[^\\s\\p{L}\\p{N}]+")
  /** The GPT-2-complete pre-tokenizer ([[BpeMergeTable.gpt2]]): the
    * contraction alternation, the space-prefix convention via ` ?` on
    * each category run, GPT-2's exact `\s+(?!\S)` whitespace lookahead
    * (an interior run donates its last space to the following word), and
    * residual whitespace runs as pre-tokens. Alternation order is
    * load-bearing (contractions before the symbol run, or `'s` would
    * tokenize as `'` + `s`; the lookahead before the residual `\s+`).
    * Java regex runs the lookahead natively; the DuckDB oracle (RE2)
    * runs the greedy variant plus the equivalent post-split fix-up. */
  private val Gpt2PreTok = java.util.regex.Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+")
  private val HexDigits = "0123456789ABCDEF".toCharArray

  /** The kernel's gpt2 pre-token split, exposed so Gpt2LookaheadSpec can
    * pin its exact-lookahead semantics (and the oracle fix-up's
    * equivalence) against hand-derived GPT-2 expectations. */
  private[graft] def gpt2PreTokens(s: String): Seq[String] = {
    val m = Gpt2PreTok.matcher(s)
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** The merge chain shared by both alphabets: each learned merge is ONE
    * leftmost non-overlapping left-to-right pass whose output never
    * re-pairs within the round (applyBpeMerge's doubled-space rewrite,
    * replayed as an index scan). */
  private def applyMerges(syms0: Array[String], mt: BpeMergeTable): Array[String] = {
    var syms = syms0
    var j = 0
    while (j < mt.lhs.length) {
      val l = mt.lhs(j); val r = mt.rhs(j)
      if (syms.length > 1) {
        val next = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var i2 = 0
        while (i2 < syms.length) {
          if (i2 + 1 < syms.length && syms(i2) == l && syms(i2 + 1) == r) {
            next += mt.merged(j); i2 += 2
          } else { next += syms(i2); i2 += 1 }
        }
        syms = next.toArray
      }
      j += 1
    }
    syms
  }

  /** text → BPE token ids in document order, one fused pass. a-z mode:
    * lowercase (UTF8String.toLowerCase — bit-identical to Spark's `lower`
    * under the default collation) then `[a-z]+` word extraction (the
    * tokenizer family's `regexp_extract_all` contract). BYTE mode: raw
    * whitespace tokens, base symbols = uppercase hex pairs of the word's
    * UTF-8 bytes (ids 0-255 = the byte values — every input byte is
    * in-alphabet, so nothing is ever dropped). Both then run the shared
    * merge chain. The batch path amortizes the chain over a broadcast
    * DISTINCT-word vocabulary (right for throughput over repetitive
    * corpora); this kernel is the per-row twin for streaming latency and
    * vocabulary-free contexts — same ids, different amortization. */
  def encodeIds(
      text: org.apache.spark.unsafe.types.UTF8String,
      mt: BpeMergeTable): ArrayData =
    if (mt.byteLevel) encodeByteIds(text, mt) else {
    val lower = text.toLowerCase.toString
    val out = new scala.collection.mutable.ArrayBuffer[Int](lower.length / 4)
    val m = Word.matcher(lower)
    while (m.find()) {
      val word = m.group()
      val base = new Array[String](word.length)
      var i = 0
      while (i < word.length) { base(i) = word.substring(i, i + 1); i += 1 }
      val syms = applyMerges(base, mt)
      var k = 0
      while (k < syms.length) {
        val s = syms(k)
        out += (if (s.length == 1) s.charAt(0) - 'a'
          else mt.mergedIds.get(s).intValue)
        k += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeByteIds(
      text: org.apache.spark.unsafe.types.UTF8String,
      mt: BpeMergeTable): ArrayData = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuffer[Int](s.length / 2)
    val m = (if (mt.gpt2) Gpt2PreTok
      else if (mt.preTok) PreTok else NonWs).matcher(s)
    while (m.find()) {
      val bytes = m.group()
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val base = new Array[String](bytes.length)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        base(i) = new String(
          Array(HexDigits(b >>> 4), HexDigits(b & 0xf)))
        i += 1
      }
      val syms = applyMerges(base, mt)
      var k = 0
      while (k < syms.length) {
        val sy = syms(k)
        out += (if (mt.explicitVocab) {
            // imported vocabulary: ALL ids (bases included) come from
            // the released vocab — the byte-value shortcut would emit
            // the wrong id space
            val v = mt.mergedIds.get(sy)
            if (v == null) throw new IllegalArgumentException(
              s"symbol '$sy' is missing from the imported vocabulary")
            v.intValue
          } else if (sy.length == 2)
            (Character.digit(sy.charAt(0), 16) << 4) |
              Character.digit(sy.charAt(1), 16)
          else mt.mergedIds.get(sy).intValue)
        k += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

object BpeDecode {
  /** BYTE-alphabet token ids → the exact bytes they encode, as a UTF-8
    * string — the inverse the byte alphabet makes possible (every base
    * id IS a byte; every merge id maps to its symbol's bytes). Word
    * boundaries are the caller's (encode drops inter-word whitespace),
    * so the round-trip contract is per WORD: decode(encode(w)) == w for
    * any whitespace-free w. EOS/PAD specials are sequence framing, not
    * content, and are rejected. */
  def decodeByteIds(
      ids: ArrayData, mt: BpeMergeTable): org.apache.spark.unsafe.types.UTF8String = {
    val out = new java.io.ByteArrayOutputStream(ids.numElements() * 2)
    var i = 0
    while (i < ids.numElements()) {
      val id = ids.getInt(i)
      // the byte-value shortcut only holds for the ENGINE id scheme; an
      // imported vocabulary assigns its own ids to base bytes too, so
      // everything routes through the inverted symbol map
      if (!mt.explicitVocab && id >= 0 && id < 256) out.write(id)
      else {
        val b = mt.idSymbolBytes.get(Integer.valueOf(id))
        if (b == null) throw new IllegalArgumentException(
          s"unknown byte-BPE id $id (not a byte, not a learned merge)")
        out.write(b, 0, b.length)
      }
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out.toByteArray)
  }
}

/** `bpe_decode_byte_ids(ids)` → string (see [[BpeDecode.decodeByteIds]]). */
case class BpeDecodeByteIds(child: Expression, table: BpeMergeTable)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(ArrayType(org.apache.spark.sql.types.IntegerType))
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    BpeDecode.decodeByteIds(v.asInstanceOf[ArrayData], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeMergeTable].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.exprs.BpeDecode.decodeByteIds($c, $tRef)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): BpeDecodeByteIds = copy(child = newChild)
  override def prettyName: String = "bpe_decode_byte_ids"
}

/** `bpe_encode_ids(text)` → array<int> BPE token ids (see
  * [[BpeEncode.encodeIds]]). */
case class BpeEncodeIds(child: Expression, table: BpeMergeTable)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    BpeEncode.encodeIds(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeMergeTable].getName)
    defineCodeGen(ctx, ev, c => s"graft.exprs.BpeEncode.encodeIds($c, $tRef)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): BpeEncodeIds = copy(child = newChild)
  override def prettyName: String = "bpe_encode_ids"
}

/** Compiled Naive-Bayes quality model for per-row streaming inference:
  * token → fixed-point log-odds weight (the batch trainer's output,
  * |w|-top-K capped) + the class prior. One instance per executor via the
  * codegen reference mechanism. */
final class NbModelTable(
    val weights: java.util.HashMap[String, java.lang.Long],
    val prior: Long) extends Serializable

object NbScore {
  /** text → (n_tokens, score_scaled): whitespace-split exactly like the
    * batch `toks` (`split(text, "\\s+")`, limit -1 — leading/trailing
    * empties preserved), n_tokens counts EVERY split token (the weak-label
    * denominator's contract), and the score is prior + Σ weight(token)
    * with unseen tokens contributing 0 — the batch inner join's
    * semantics. Exact BIGINT arithmetic end to end. */
  def score(
      text: org.apache.spark.unsafe.types.UTF8String,
      mt: NbModelTable): InternalRow = {
    val tokens = text.toString.split("\\s+", -1)
    var s = mt.prior
    var i = 0
    while (i < tokens.length) {
      val w = mt.weights.get(tokens(i))
      if (w != null) s += w.longValue
      i += 1
    }
    new GenericInternalRow(Array[Any](tokens.length.toLong, s))
  }
}

/** `nb_quality_score(text)` → struct(n_tokens long, score_scaled long)
  * (see [[NbScore.score]]). */
case class NbQualityScore(child: Expression, table: NbModelTable)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("score_scaled", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    NbScore.score(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("nbModel", table,
      classOf[NbModelTable].getName)
    defineCodeGen(ctx, ev, c => s"graft.exprs.NbScore.score($c, $tRef)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): NbQualityScore = copy(child = newChild)
  override def prettyName: String = "nb_quality_score"
}

/** Compiled bigram-NLL model for per-row streaming inference: bigram →
  * fixed-point add-1 NLL (the batch trainer's output, frequency-top-K
  * capped). Unseen bigrams contribute 0 — the batch inner join's
  * seen-only scoring, preserved. */
final class BigramNllTable(
    val nll: java.util.HashMap[String, java.lang.Long]) extends Serializable

object BigramNll {
  /** text → (n_bigrams_seen, nll_scaled): whitespace tokens in order
    * (split limit -1, the `toks` contract), adjacent pairs joined with
    * one space (the batch bigram key), summed over pairs present in the
    * model. Exact BIGINT arithmetic. */
  def score(
      text: org.apache.spark.unsafe.types.UTF8String,
      mt: BigramNllTable): InternalRow = {
    val tokens = text.toString.split("\\s+", -1)
    var seen = 0L
    var s = 0L
    var i = 0
    while (i + 1 < tokens.length) {
      val w = mt.nll.get(tokens(i) + " " + tokens(i + 1))
      if (w != null) { seen += 1; s += w.longValue }
      i += 1
    }
    new GenericInternalRow(Array[Any](seen, s))
  }
}

/** `bigram_nll_score(text)` → struct(n_bigrams long, nll_scaled long)
  * (see [[BigramNll.score]]). */
case class BigramNllScore(child: Expression, table: BigramNllTable)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("nll_scaled", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    BigramNll.score(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("bigramNll", table,
      classOf[BigramNllTable].getName)
    defineCodeGen(ctx, ev, c => s"graft.exprs.BigramNll.score($c, $tRef)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): BigramNllScore = copy(child = newChild)
  override def prettyName: String = "bigram_nll_score"
}

/** Compiled DSIR importance model for per-row streaming inference: hashed
  * n-gram bucket → fixed-point log importance ratio λ_b (the batch
  * trainer's output — see [[graft.queries.TextAnalysis]] dsir_weights).
  * Dense bucket-indexed array (the feature space is B buckets by
  * construction, kilobytes); buckets absent from the training corpus hold
  * [[DsirScoreTable.Absent]] and contribute nothing — the batch inner
  * join's seen-only scoring, preserved. */
final class DsirScoreTable(val lam: Array[Long]) extends Serializable {
  require(lam.nonEmpty, "empty DSIR model")
}

object DsirScoreTable {
  /** Sentinel for buckets the training corpus never produced. */
  val Absent: Long = Long.MinValue
}

object DsirScore {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 16 bits of md5(ngram) mod B — the per-row twin of the batch
    * `conv(substring(md5(ng), 1, 4), 16, 10) % B` bucket (first 4 hex
    * chars ≡ first 2 digest bytes, big-endian). */
  def bucketOf(ng: String, buckets: Int): Int = {
    val d = digest.get()
    d.reset()
    val h = d.digest(ng.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % buckets
  }

  /** text → (n_feats_seen, weight_scaled): whitespace tokens in order
    * (split limit -1, the `toks` contract), hashed unigram + bigram
    * features (bigram key = the two tokens joined with one space — the
    * batch ngram relation's key), λ summed over buckets present in the
    * model. Exact BIGINT arithmetic. */
  def score(
      text: org.apache.spark.unsafe.types.UTF8String,
      mt: DsirScoreTable): InternalRow = {
    val tokens = text.toString.split("\\s+", -1)
    val b = mt.lam.length
    var seen = 0L
    var s = 0L
    var i = 0
    while (i < tokens.length) {
      val lu = mt.lam(bucketOf(tokens(i), b))
      if (lu != DsirScoreTable.Absent) { seen += 1; s += lu }
      if (i + 1 < tokens.length) {
        val lb = mt.lam(bucketOf(tokens(i) + " " + tokens(i + 1), b))
        if (lb != DsirScoreTable.Absent) { seen += 1; s += lb }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](seen, s))
  }
}

/** `dsir_score(text)` → struct(n_feats long, weight_scaled long)
  * (see [[DsirScore.score]]). */
case class DsirScoreExpr(child: Expression, table: DsirScoreTable)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("weight_scaled", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    DsirScore.score(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("dsirModel", table,
      classOf[DsirScoreTable].getName)
    defineCodeGen(ctx, ev, c => s"graft.exprs.DsirScore.score($c, $tRef)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): DsirScoreExpr = copy(child = newChild)
  override def prettyName: String = "dsir_score"
}

object PhraseScore {
  /** Exact-phrase occurrence count from a token → sorted-positions map —
    * the per-row twin of the batch searchPhrase start-position fold:
    * count start positions p ∈ pos(t₀) with (p + i) ∈ pos(tᵢ) for every
    * later phrase token (overlapping matches count; a missing token ⇒ 0;
    * repeated phrase tokens reuse the one positions array at different
    * offsets — identical semantics, spec-pinned to batch equality). Maps
    * and phrases are query-sized, so the linear lookups stay trivial
    * next to the join that produced the row. */
  def occurrences(
      phrase: ArrayData,
      m: org.apache.spark.sql.catalyst.util.MapData): Long = {
    val k = phrase.numElements()
    if (k == 0 || m.numElements() == 0) return 0L
    val keys = m.keyArray()
    val vals = m.valueArray()
    def posOf(t: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      var i = 0
      while (i < m.numElements()) {
        if (keys.getUTF8String(i).equals(t)) return vals.getArray(i)
        i += 1
      }
      null
    }
    // positions are SORTED ascending by construction (the index's
    // sort_array(collect_list(pos))) — binary search keeps the fold
    // robust on long repetitive documents (O(log n) per probe instead of
    // a linear scan of a potentially document-length array)
    def contains(a: ArrayData, x: Int): Boolean = {
      var lo = 0
      var hi = a.numElements() - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val v = a.getInt(mid)
        if (v == x) return true
        else if (v < x) lo = mid + 1
        else hi = mid - 1
      }
      false
    }
    val first = posOf(phrase.getUTF8String(0))
    if (first == null) return 0L
    val rest = (1 until k).map(i => posOf(phrase.getUTF8String(i)))
    if (rest.exists(_ == null)) return 0L
    var count = 0L
    var s = 0
    while (s < first.numElements()) {
      val p = first.getInt(s)
      var ok = true
      var i = 1
      while (ok && i < k) {
        ok = contains(rest(i - 1), p + i)
        i += 1
      }
      if (ok) count += 1
      s += 1
    }
    count
  }
}

/** `phrase_occurrences(phrase array<string>, m map<string, array<int>>)`
  * → long (see [[PhraseScore.occurrences]]). */
case class PhraseOccurrences(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftshim.Shim.AbstractType] =
    Seq(ArrayType(StringType),
      org.apache.spark.sql.types.MapType(StringType,
        ArrayType(org.apache.spark.sql.types.IntegerType)))
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    PhraseScore.occurrences(a.asInstanceOf[ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.exprs.PhraseScore.occurrences($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PhraseOccurrences =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "phrase_occurrences"
}
