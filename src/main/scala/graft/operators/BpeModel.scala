package graft.operators

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Persisted BPE merge-table artifact — the tokenizer model as a real,
  * versioned on-disk object ([[IvfIndex]]'s build/save/load lifecycle
  * applied to the trainer, replacing the in-process merge cache as the
  * cross-job contract):
  *
  *  - `save` writes the merge table as parquet under a NEW `v=<n>`
  *    subdirectory — append-only, staged + atomically moved, so a crashed
  *    writer can never leave a partial version visible and concurrent
  *    readers always see a complete model;
  *  - `load` reads the LATEST version; `loadVersion` pins one — time
  *    travel over tokenizer models, the same inclusive-version contract
  *    as the log source's `versionAsOf`.
  *
  * Schema = `train_bpe`'s output, `(round, lhs, rhs, merged, pair_freq)`:
  * merge ORDER is the model (BPE applies merges in learned order), so
  * both `save` and `loadVersion` keep rows sorted by round. The table is
  * model-sized by construction (one row per learned merge — thousands at
  * a production vocab, never corpus-scale), so the load-side collect is
  * bounded by the same contract as IvfIndex's centroid read.
  */
object BpeModel {

  /** (round, lhs, rhs, merged, pair_freq) in learned order. */
  type Merges = Seq[(Long, String, String, String, Long)]

  /** All complete model versions under `dir`, ascending; empty if the
    * directory doesn't exist yet. */
  def versions(dir: String): Seq[Long] = VersionedArtifact.versions(dir)

  /** Persist `merges` as the next version under `dir`; returns the new
    * version number. Staged write + atomic rename: readers never observe
    * a half-written model, and two racing writers get distinct versions
    * (the JVM-level lock serializes the local case; cross-JVM races are
    * resolved by the rename failing on an existing target, retried with
    * the next number).
    *
    * `fingerprint` stamps the version with the identity of the corpus it
    * was trained from (written as a `_fingerprint` file INSIDE the staged
    * dir, so it commits atomically with the model and parquet readers —
    * which skip underscore files — never see it as data). A consumer
    * holding the current corpus fingerprint compares it against
    * [[fingerprintOf]] to detect a STALE artifact instead of silently
    * tokenizing with yesterday's merges — the staleness contract
    * BpeModelStalenessSpec pins. */
  def save(
      s: SparkSession, merges: Merges, dir: String,
      fingerprint: Option[String] = None): Long = {
    import s.implicits._
    val df = merges.toDF("round", "lhs", "rhs", "merged", "pair_freq")
      .orderBy("round")
    VersionedArtifact.save(dir, fingerprint)(staging =>
      df.coalesce(1).write.mode("overwrite").parquet(staging))
  }

  /** The corpus fingerprint version `version` was trained from, or None
    * for a version saved without one (pre-staleness-contract artifacts —
    * their staleness is UNKNOWN, which callers must treat as their own
    * policy decision, not as fresh). */
  def fingerprintOf(dir: String, version: Long): Option[String] =
    VersionedArtifact.fingerprintOf(dir, version)

  /** Load the latest version; throws if no model has been saved. */
  def load(s: SparkSession, dir: String): Merges = {
    val vs = versions(dir)
    require(vs.nonEmpty, s"no BPE model versions under $dir")
    loadVersion(s, dir, vs.last)
  }

  // ------------------------------------------------------------------
  // Published-tokenizer import (round 13): the public merges.txt /
  // vocab.json byte-level interchange format (the released-tokenizer
  // convention popularized by GPT-2's reference implementation —
  // public knowledge) into the SAME versioned artifact, so a released
  // tokenizer serves through the same fused BpeEncodeIds kernel, the
  // same gpt2 pre-tokenizer tier, and the same CLI `tokenize` path as
  // an in-engine-trained model.
  // ------------------------------------------------------------------

  /** GPT-2's bytes_to_unicode table (the public algorithm): printable
    * bytes (33-126, 161-172, 174-255) render as themselves; the rest
    * take U+0100, U+0101, … in byte order — every byte gets a VISIBLE
    * character, which is what makes merges.txt a plain-text format. */
  private[graft] val Gpt2ByteToChar: Array[Char] = {
    val visible = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (visible.contains(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }
  private[graft] val Gpt2CharToByte: Map[Char, Int] =
    Gpt2ByteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  private val HexDigits = "0123456789ABCDEF".toCharArray

  /** A public-format token (visible-unicode characters) → the engine's
    * uppercase hex-pair symbol string. */
  private[graft] def visibleToHex(tok: String): String = {
    val sb = new java.lang.StringBuilder(tok.length * 2)
    tok.foreach { c =>
      val b = Gpt2CharToByte.getOrElse(c,
        throw new IllegalArgumentException(
          s"'$c' (U+${c.toInt.toHexString.toUpperCase}) is not a GPT-2 " +
            "byte character — not a byte-level tokenizer file?"))
      sb.append(HexDigits(b >>> 4)).append(HexDigits(b & 0xf))
    }
    sb.toString
  }

  /** The engine hex symbol → visible-unicode rendering (fixture writers
    * and specs). */
  private[graft] def hexToVisible(sym: String): String = {
    val sb = new java.lang.StringBuilder(sym.length / 2)
    var i = 0
    while (i < sym.length) {
      val b = (Character.digit(sym.charAt(i), 16) << 4) |
        Character.digit(sym.charAt(i + 1), 16)
      sb.append(Gpt2ByteToChar(b))
      i += 2
    }
    sb.toString
  }

  /** Parse a public merges.txt (optional `#…` header lines; one
    * space-separated pair per line, priority order) into the engine's
    * merge-table rows. Released files carry no pair frequencies —
    * `pair_freq` is 0, which nothing downstream reads (merge ORDER is
    * the model). */
  private[graft] def parseMergesTxt(text: String): Merges =
    text.linesIterator
      .map(_.stripSuffix("\r")) // tolerate CRLF releases
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .zipWithIndex
      .map { case (l, i) =>
        val sp = l.split(" ")
        require(sp.length == 2,
          s"merges.txt line ${i + 1}: expected 'A B', got '$l'")
        val (a, b) = (visibleToHex(sp(0)), visibleToHex(sp(1)))
        ((i + 1).toLong, a, b, a + b, 0L)
      }.toSeq

  /** Parse a public vocab.json ({token: id}, flat) into the engine's
    * hex-symbol → id map. Uses the Jackson shipped with Spark. */
  private[graft] def parseVocabJson(bytes: Array[Byte]): Map[String, Int] = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(bytes)
    require(node != null && node.isObject,
      "vocab.json must be a flat {token: id} JSON object")
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    node.fields().forEachRemaining { e =>
      out.put(visibleToHex(e.getKey), e.getValue.intValue())
    }
    out.toMap
  }

  /** Import a PUBLISHED byte-level BPE tokenizer (merges.txt +
    * vocab.json) as the next version under `dir`; returns it. The
    * version's `_fingerprint` is the md5 of both files' bytes — the
    * staleness contract's currency check: re-importing the same release
    * is detectable as already-current, a changed release supersedes.
    * The released vocabulary (bases AND merges, translated to hex
    * symbols) commits atomically alongside the merge parquet as a
    * `_vocab.tsv` inside the version dir (underscore file — parquet
    * readers skip it), read back by [[loadVocab]].
    *
    * Validation up front, loudly: the merge list must chain (every
    * merged symbol present in the vocab) and the vocab must cover all
    * 256 single-byte symbols (the byte-level property that makes encode
    * total — a vocab that can't express some byte isn't byte-level). */
  def importMerges(
      s: SparkSession, mergesPath: String, vocabPath: String,
      dir: String): Long = {
    val mergesBytes = Files.readAllBytes(Paths.get(mergesPath))
    val vocabBytes = Files.readAllBytes(Paths.get(vocabPath))
    val merges = parseMergesTxt(
      new String(mergesBytes, java.nio.charset.StandardCharsets.UTF_8))
    val vocab = parseVocabJson(vocabBytes)
    (0 until 256).foreach { b =>
      val hex = new String(
        Array(HexDigits(b >>> 4), HexDigits(b & 0xf)))
      require(vocab.contains(hex),
        s"vocab.json misses base byte 0x$hex — not a byte-level vocabulary")
    }
    merges.foreach { case (round, _, _, m, _) =>
      require(vocab.contains(m),
        s"merges.txt round $round produces '$m' — absent from vocab.json")
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(mergesBytes)
    md.update(vocabBytes)
    val fp = md.digest().map("%02x".format(_)).mkString
    import s.implicits._
    val df = merges.toDF("round", "lhs", "rhs", "merged", "pair_freq")
      .orderBy("round")
    VersionedArtifact.save(dir, Some(fp)) { staging =>
      df.coalesce(1).write.mode("overwrite").parquet(staging)
      val sb = new java.lang.StringBuilder()
      vocab.foreach { case (sym, id) =>
        sb.append(sym).append('\t').append(id).append('\n')
      }
      Files.write(Paths.get(staging, "_vocab.tsv"),
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** EXPORT a byte-alphabet model as the public merges.txt / vocab.json
    * pair — the inverse of [[importMerges]], closing the interchange
    * round-trip: an in-engine-trained model becomes consumable by any
    * external byte-level BPE runtime, and import∘export serves
    * BIT-IDENTICAL ids back through the explicit-vocab kernel path
    * (the exported vocabulary IS the engine id scheme made explicit:
    * single-byte symbols at their byte values, each merged symbol at
    * 255 + its first round — BpeMergeTable's FIRST-round-wins
    * contract). Tokens render through the same bytes_to_unicode table
    * the importer inverts.
    *
    * a-z-alphabet models refuse loudly: the interchange format is
    * byte-level by definition (its vocab must cover all 256 bytes). */
  def exportMerges(
      s: SparkSession, dir: String,
      mergesPath: String, vocabPath: String): Unit = {
    val merges = load(s, dir)
    merges.foreach { case (round, l, r, m, _) =>
      Seq(l, r, m).foreach(sym => require(
        sym.length % 2 == 0 && sym.forall(c =>
          (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F')),
        s"round $round symbol '$sym' is not a hex-pair byte symbol — " +
          "export requires a BYTE-alphabet model (bytes/pretok/gpt2 " +
          "tiers); the a-z tier has no public interchange form"))
    }
    def esc(tok: String): String = tok.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c => c.toString
    }
    val mt = new java.lang.StringBuilder("#version: 0.2\n")
    merges.foreach { case (_, l, r, _, _) =>
      mt.append(hexToVisible(l)).append(' ')
        .append(hexToVisible(r)).append('\n')
    }
    Files.write(Paths.get(mergesPath),
      mt.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val entries = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    (0 until 256).foreach { b =>
      entries.put(hexToVisible(
        new String(Array(HexDigits(b >>> 4), HexDigits(b & 0xf)))), b)
    }
    for ((round, _, _, m, _) <- merges) {
      val tok = hexToVisible(m)
      if (!entries.contains(tok)) entries.put(tok, 255 + round.toInt)
    }
    val json = entries
      .map { case (tok, id) => "\"" + esc(tok) + "\": " + id }
      .mkString("{\n", ",\n", "\n}")
    Files.write(Paths.get(vocabPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** The imported vocabulary of `version` (hex symbol → released id),
    * or None for an in-engine-trained version (no `_vocab.tsv`). */
  def loadVocab(dir: String, version: Long): Option[Map[String, Int]] = {
    val f = Paths.get(dir, s"v=$version", "_vocab.tsv")
    if (!Files.isRegularFile(f)) None
    else {
      import scala.jdk.CollectionConverters._
      Some(Files.readAllLines(f,
        java.nio.charset.StandardCharsets.UTF_8).asScala
        .filter(_.nonEmpty).map { l =>
          val t = l.split("\t")
          t(0) -> t(1).toInt
        }.toMap)
    }
  }

  /** Load one pinned version (tokenizer-model time travel). */
  def loadVersion(s: SparkSession, dir: String, version: Long): Merges = {
    val path = s"$dir/v=$version"
    require(Files.isDirectory(Paths.get(path)),
      s"BPE model version $version does not exist under $dir")
    // model-sized by construction: one row per learned merge
    s.read.parquet(path)
      .select("round", "lhs", "rhs", "merged", "pair_freq")
      .orderBy("round")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .toSeq
  }
}
