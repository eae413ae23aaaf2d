package graft.queries

/** Shared DuckDB fragments for the demo media lift — the oracle-side twin
  * of [[graft.multimodal.MultimodalPipeline.mediaTypeOf]] and of the
  * deterministic codec's byte arithmetic. Every oracle that subsets
  * documents by modality or reads blob bytes through the hex rendering MUST
  * build from these, for the same reason the Spark side centralizes
  * `mediaTypeOf`: a drifted copy would classify rows differently from the
  * engine with no compile-time signal.
  */
private[queries] object MediaSql {

  /** Blob byte length of the demo lift (text utf-8 bytes). NULL text ⇒
    * NULL ⇒ every `% 3 = t` predicate is false — the same rows
    * `fromDocuments`' isNotNull filter drops. */
  val NBytes = "octet_length(encode(text))"

  /** Modality membership predicate: t = 0 image, 1 audio, 2 video. */
  def isType(t: Int): String = s"$NBytes % 3 = $t"

  /** The modality CASE — [[graft.multimodal.MultimodalPipeline.mediaTypeOf]]
    * in SQL. */
  val TypeCase: String =
    s"CASE WHEN $NBytes % 3 = 0 THEN 'image' " +
      s"WHEN $NBytes % 3 = 1 THEN 'audio' ELSE 'video' END"

  /** Byte at 0-based offset `i` (a SQL expr) of a blob via its UPPERCASE
    * hex rendering in column `hx` — the one hex-decode generator every
    * byte-level oracle (audio embedding, perceptual hash) shares. */
  def hexByte(i: String): String =
    s"((instr('0123456789ABCDEF', substr(hx, 2 * ($i) + 1, 1)) - 1) * 16" +
      s" + instr('0123456789ABCDEF', substr(hx, 2 * ($i) + 2, 1)) - 1)"
}
