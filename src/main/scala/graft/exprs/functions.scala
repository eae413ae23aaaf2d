package graft.exprs

import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.{Column, SparkSession}

/** Column-level API over the custom expressions, plus SQL registration. */
object functions {
  def minify_json(c: Column): Column =
    Shim.column(MinifyJson(Shim.expression(c)))

  def payload_is_valid(c: Column): Column =
    Shim.column(PayloadIsValid(Shim.expression(c)))

  def label_is_valid(c: Column): Column =
    Shim.column(LabelIsValid(Shim.expression(c)))

  def event_checksum(
      timestamp: Column,
      label: Column,
      payload: Column,
      versionPrevious: Column): Column =
    Shim.column(EventChecksum(
      Shim.expression(timestamp),
      Shim.expression(label),
      Shim.expression(payload),
      Shim.expression(versionPrevious)))

  def dot_product(a: Column, b: Column): Column =
    Shim.column(DotProduct(Shim.expression(a), Shim.expression(b)))

  def pq_encode(r: Column, codebook: Array[Double], m: Int, k: Int): Column =
    Shim.column(PqEncode(Shim.expression(r), codebook, m, k))

  /** One-pass Aho–Corasick multi-keyword scan: per-keyword occurrence
    * counts, overlapping included (see [[KeywordTable.scan]]). */
  def keyword_scan(text: Column, table: KeywordTable): Column =
    Shim.column(KeywordScan(Shim.expression(text), table))

  /** Banded edit distance with threshold: the distance if ≤ k, else −1
    * (see [[EditDistanceOps.within]]) — the fuzzy-join verify kernel. */
  def edit_distance_within(a: Column, b: Column, k: Int): Column =
    Shim.column(EditDistanceWithin(Shim.expression(a), Shim.expression(b), k))

  /** The ≤k-deletion signature set of a string (see
    * [[EditDistanceOps.deletionNeighborhood]]) — the fuzzy joins'
    * candidate generator for corpora whose shared-gram structure
    * degenerates. */
  def deletion_neighborhood(s: Column, k: Int): Column =
    Shim.column(DeletionNeighborhood(Shim.expression(s), k))

  /** Dense mat-vec: rotate/project an array<double> column by a flat
    * row-major matrix reference object (see [[VectorOps.matVec]]). */
  def mat_vec(v: Column, mat: Array[Double], rows: Int, cols: Int): Column =
    Shim.column(MatVec(Shim.expression(v), mat, rows, cols))

  def adc_dot(codes: Column, lut: Column): Column =
    Shim.column(AdcDot(Shim.expression(codes), Shim.expression(lut)))

  def ivf_nearest_cells(qv: Column, table: PqScoreTable, nProbe: Int): Column =
    Shim.column(IvfNearestCells(Shim.expression(qv), table, nProbe))

  def pq_adc_cosine(qv: Column, cell: Column, codes: Column, nrm: Column,
      table: PqScoreTable): Column =
    Shim.column(PqAdcCosine(Shim.expression(qv), Shim.expression(cell),
      Shim.expression(codes), Shim.expression(nrm), table))

  def simhash32(c: Column): Column =
    Shim.column(SimHash32(Shim.expression(c)))

  def ngram_shingles(c: Column): Column =
    Shim.column(NgramShingles(Shim.expression(c)))

  def minhash12(c: Column): Column =
    Shim.column(Minhash12(Shim.expression(c)))

  def winnow_fps(c: Column): Column =
    Shim.column(WinnowFingerprints(Shim.expression(c)))

  def bigram_nll_score(text: Column, table: BigramNllTable): Column =
    Shim.column(BigramNllScore(Shim.expression(text), table))

  def nb_quality_score(text: Column, table: NbModelTable): Column =
    Shim.column(NbQualityScore(Shim.expression(text), table))

  def dsir_score(text: Column, table: DsirScoreTable): Column =
    Shim.column(DsirScoreExpr(Shim.expression(text), table))

  def phrase_occurrences(phrase: Column, m: Column): Column =
    Shim.column(PhraseOccurrences(Shim.expression(phrase), Shim.expression(m)))

  def bpe_encode_ids(
      text: Column, merges: Seq[(Long, String, String, String, Long)]): Column =
    Shim.column(BpeEncodeIds(Shim.expression(text), BpeMergeTable(merges)))

  /** BYTE-alphabet twin of [[bpe_encode_ids]]: whitespace words, UTF-8
    * byte base symbols (ids 0-255), merges from train_bpe_bytes. */
  def bpe_encode_byte_ids(
      text: Column, merges: Seq[(Long, String, String, String, Long)]): Column =
    Shim.column(BpeEncodeIds(Shim.expression(text), BpeMergeTable.bytes(merges)))

  /** [[bpe_encode_byte_ids]] with the PRODUCTION pre-tokenizer (letter |
    * digit | symbol runs split apart — punctuation never glues to
    * words). */
  def bpe_encode_pretok_ids(
      text: Column, merges: Seq[(Long, String, String, String, Long)]): Column =
    Shim.column(BpeEncodeIds(Shim.expression(text), BpeMergeTable.pretok(merges)))

  /** [[bpe_encode_byte_ids]] with the GPT-2-COMPLETE pre-tokenizer:
    * contraction cases split off ('s 't 're 've 'm 'll 'd), single
    * spaces fold into the following run (the space-prefix convention),
    * residual whitespace runs kept — the extracted pre-tokens tile the
    * document, so the encoding is lossless INCLUDING whitespace. */
  def bpe_encode_gpt2_ids(
      text: Column, merges: Seq[(Long, String, String, String, Long)]): Column =
    Shim.column(BpeEncodeIds(Shim.expression(text), BpeMergeTable.gpt2(merges)))

  /** Inverse of [[bpe_encode_byte_ids]] for whitespace-free input: token
    * ids back to the exact bytes they encode (the byte alphabet's
    * losslessness, as an engine function). The id scheme is shared with
    * the pretok encoder, so this decodes both. */
  def bpe_decode_byte_ids(
      ids: Column, merges: Seq[(Long, String, String, String, Long)]): Column =
    Shim.column(BpeDecodeByteIds(Shim.expression(ids), BpeMergeTable.bytes(merges)))

  /** [[bpe_encode_gpt2_ids]] emitting a PUBLISHED tokenizer's ids
    * (round 13, `BpeModel.importMerges`): `vocab` maps the engine's hex
    * symbols — the 256 bases included — to the released vocab.json ids,
    * so the output id stream is the released tokenizer's exactly. */
  def bpe_encode_imported_ids(
      text: Column, merges: Seq[(Long, String, String, String, Long)],
      vocab: Map[String, Int]): Column =
    Shim.column(BpeEncodeIds(Shim.expression(text),
      BpeMergeTable.gpt2Imported(merges, vocab)))

  /** Inverse of [[bpe_encode_imported_ids]] under the same released id
    * space. */
  def bpe_decode_imported_ids(
      ids: Column, merges: Seq[(Long, String, String, String, Long)],
      vocab: Map[String, Int]): Column =
    Shim.column(BpeDecodeByteIds(Shim.expression(ids),
      BpeMergeTable.gpt2Imported(merges, vocab)))

  def repetition_stats(tokens: Column): Column =
    Shim.column(RepetitionStats(Shim.expression(tokens)))

  def token_stats(tokens: Column, stops: Column, markers: Column): Column =
    Shim.column(TokenStats(
      Shim.expression(tokens), Shim.expression(stops),
      Shim.expression(markers)))

  /** Morton key of two int columns — the 2-D file-clustering sort key
    * (see [[LayoutOps.interleave16]]). */
  def zorder16(x: Column, y: Column): Column =
    Shim.column(ZOrder16(Shim.expression(x), Shim.expression(y)))

  /** Misra–Gries heavy-hitter candidates (array<string>): every item with
    * frequency > n/(capacity+1) is guaranteed present — recount exactly
    * downstream (see [[MisraGriesAgg]]). */
  def misra_gries(c: Column, capacity: Int): Column =
    Shim.column(MisraGriesAgg(Shim.expression(c), capacity)
      .toAggregateExpression())

  /** Priority-sampling top-k aggregate: array of
    * (doc_id, w, rank, priority, w_est) structs — the exact batch
    * sample_priority algebra as a mergeable bounded-state aggregate
    * (see [[PrioritySampleAgg]]). */
  def priority_sample(
      priority: Column, id: Column, w: Column, k: Int): Column =
    Shim.column(PrioritySampleAgg(Shim.expression(priority),
      Shim.expression(id), Shim.expression(w), k).toAggregateExpression())

  /** KLL quantile-sketch aggregate: array<double> of the φ-quantile
    * estimates, O(k·log(n/k)) state at any n (see [[KllQuantilesAgg]]). */
  def kll_quantiles(c: Column, quantiles: Seq[Double], k: Int): Column =
    Shim.column(KllQuantilesAgg(Shim.expression(c), quantiles, k)
      .toAggregateExpression())

  def parse_hex_version(c: Column): Column =
    Shim.column(ParseHexVersion(Shim.expression(c)))

  def hex_version(c: Column): Column =
    Shim.column(HexVersion(Shim.expression(c)))

  /** Register all custom expressions for spark.sql(...) use on a live
    * session; new sessions get the same set via
    * `spark.sql.extensions=graft.exprs.GraftExtensions`. */
  def registerAll(spark: SparkSession): Unit =
    GraftExtensions.builders.foreach { case (name, b) =>
      Shim.register(spark, name, b)
    }
}
