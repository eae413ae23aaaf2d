package graft.queries

import graft.util.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Text-analysis operators for training-data pipelines: language ID
  * (marker-lexicon heuristic), quality scoring, token counting (whitespace +
  * BPE-ish regex), and document fingerprinting via normalization + md5.
  * Everything is int/string-exact or single-expression double math so the
  * DuckDB oracle reproduces results bit-for-bit.
  */
object TextAnalysis {
  type Q = (SparkSession, String) => DataFrame

  /** Marker-word lexicon for the n-gram/stopword language-ID heuristic. */
  private val Lexicon: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "fast", "en" -> "slow",
    "es" -> "data", "es" -> "table", "es" -> "row",
    "de" -> "group", "de" -> "sort", "de" -> "key",
    "fr" -> "join", "fr" -> "merge", "fr" -> "filter",
    "zh" -> "spark", "zh" -> "query", "zh" -> "stream")

  // shared with StreamOps.cleanStream — ONE stopword list for both gates
  private[graft] val Stopwords = Seq("the", "a", "of", "to", "in", "is", "and")
  private val SamplePerStratum = 20 // sample_stratified: docs kept per lang
  private val VocabTopK = 100 // text_vocab: tokens reported
  // chunk_documents: context-window chunking with overlap — the standard
  // long-doc → training-sequence / RAG-passage splitter. Stride < window ⇒
  // consecutive chunks overlap by (window - stride) tokens so no span is
  // ever split across a boundary without appearing whole in some chunk.
  private val ChunkTokens = 128 // tokens per chunk
  private val ChunkStride = 96 // tokens between chunk starts (overlap 32)
  // split_corpus: 8/1/1 thresholds on the 16-bit md5 slice (0..65535);
  // the WHOLE derivation (bucket expression + thresholds, Spark AND
  // oracle-SQL forms) is shared with Dedup.pipeline_pretrain_corpus so
  // the composed pipeline and the standalone operator can never disagree
  // on an assignment
  private[queries] val SplitTrainMax = 52429 // floor(0.8 * 65536) rounded up
  private[queries] val SplitValMax = 58982 // train + floor(0.1 * 65536)

  /** 16-bit split bucket of a document id (0..65535): first 4 hex chars
    * of md5(id) — stable under repartitioning, re-runs, corpus growth. */
  def splitBucketOf(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long")

  /** [[splitBucketOf]] of the `doc_id` column. */
  def splitBucket: Column = splitBucketOf(col("doc_id"))

  /** train/val/test assignment from a [[splitBucket]] value. */
  def splitOf(bucket: Column): Column =
    when(bucket < SplitTrainMax, "train")
      .when(bucket < SplitValMax, "val")
      .otherwise("test")

  /** DuckDB form of [[splitBucketOf]] over an id column reference. */
  private[queries] def splitBucketSqlFor(idRef: String): String =
    s"""list_reduce(list_transform(range(1, 5),
       |    i -> instr('0123456789abcdef',
       |      substr(md5(CAST($idRef AS VARCHAR)), i, 1)) - 1),
       |    (a, b) -> a * 16 + b)""".stripMargin

  /** DuckDB form of [[splitBucket]] (md5 hex fold to the same integer). */
  private[queries] val SplitBucketSql: String = splitBucketSqlFor("doc_id")

  /** Shared CTE prefix for the BPE oracles: word-frequency table s0, then
    * BpeMerges chained rounds (pair count p_k → deterministic argmax b_k →
    * greedy doubled-separator replace s_k), generated from the same
    * constants the Spark side consumes. */
  /** The (freq, syms) word-frequency CTE every BPE oracle starts from —
    * ONE definition, parameterized by CTE name, so the trainers' SQL can
    * never silently disagree about the shared vocabulary (word bound,
    * [a-z]+ extraction, symbol split). Mirrors [[bpeWordTable]]. */
  private def wordTableCte(name: String): String =
    s"""$name AS MATERIALIZED (SELECT freq, array_to_string(list_transform(
       |    range(1, length(word) + 1), i -> substr(word, i, 1)), ' ')
       |    AS syms
       |  FROM (SELECT word, count(*) AS freq
       |    FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+'))
       |        AS word FROM documents WHERE text IS NOT NULL)
       |    WHERE length(word) BETWEEN 2 AND $BpeMaxWordLen
       |    GROUP BY word))""".stripMargin

  /** SQL form of [[applyBpeMerge]]'s doubled-separator merge cycle — the
    * load-bearing encoding, defined once and shared by every BPE oracle
    * (train, batched train, tokenize). */
  private def mergeCycleSql(x: String, l: String, r: String): String =
    s"""trim(replace(replace(' ' || replace($x, ' ', '  ') || ' ',
       |      ' ' || $l || '  ' || $r || ' ',
       |      ' ' || $l || $r || ' '), '  ', ' '))""".stripMargin

  /** The BpeMerges training-round CTEs (pair count p_k → argmax b_k →
    * greedy replace s_k) over whatever word-table CTE `s0` the caller
    * prepends — alphabet-agnostic: the machinery only sees space-joined
    * symbol strings. */
  private def bpeRoundCtes(wordCte: String): String = {
    val rounds = (1 to BpeMerges).map { k =>
      s"""p$k AS (SELECT pr[1] AS l, pr[2] AS r,
         |    CAST(sum(freq) AS BIGINT) AS c
         |  FROM (SELECT freq, unnest(list_transform(range(1, len(sy)),
         |      i -> [sy[i], sy[i + 1]])) AS pr
         |    FROM (SELECT freq, string_split(syms, ' ') AS sy FROM s${k - 1}))
         |  GROUP BY 1, 2),
         |b$k AS MATERIALIZED (SELECT $k AS round, l, r, c FROM p$k
         |  ORDER BY c DESC, l, r LIMIT 1),
         |s$k AS MATERIALIZED (SELECT s${k - 1}.freq,
         |    ${mergeCycleSql(s"s${k - 1}.syms", s"b$k.l", s"b$k.r")} AS syms
         |  FROM s${k - 1}, b$k)""".stripMargin
    }
    s"$wordCte,\n${rounds.mkString(",\n")}"
  }

  private def bpeCtes: String = bpeRoundCtes(wordTableCte("s0"))

  /** The two word sources the byte-alphabet family supports, as DuckDB
    * unnest expressions — whitespace tokens (the simple contract) and
    * the PRODUCTION pre-tokenizer (letter | digit | symbol runs, RE2 ≡
    * Java on these classes, so engine and oracle split identically). */
  private val WsWordsSql = "unnest(string_split_regex(text, '\\s+'))"
  private val PreTokSql = "[\\p{L}]+|[\\p{N}]+|[^\\s\\p{L}\\p{N}]+"
  private val PreTokWordsSql =
    s"unnest(regexp_extract_all(text, '$PreTokSql'))"

  /** The GPT-2-COMPLETE pre-tokenizer ([[graft.exprs.BpeMergeTable.gpt2]]):
    * contraction cases + the ` ?` space-prefix convention + GPT-2's
    * exact `\s+(?!\S)` whitespace lookahead (an interior run of 2+
    * whitespace chars donates its LAST space to the following word) +
    * residual whitespace runs. The alternation tiles EVERY character, so
    * the extracted pre-tokens concatenate back to the document exactly
    * (the losslessness the roundtrip oracle states without modeling
    * BPE). Spark's Java regex runs the lookahead natively; the oracle's
    * RE2 has no lookarounds, so it runs [[Gpt2GreedyPat]] plus
    * [[gpt2FixupSql]] — equivalence proven case-by-case in
    * Gpt2LookaheadSpec. */
  private[graft] val Gpt2PreTokPat =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+"

  /** The RE2-expressible GREEDY variant (plain `\s+`, whole runs) the
    * oracle extracts with before the fix-up. */
  private[graft] val Gpt2GreedyPat =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** The gpt2 family's CONTRACTION-HEAVY derived corpus: the raw test
    * corpus carries no apostrophes AND no multi-space runs, so the
    * oracle gate would exercise neither the contraction alternation nor
    * the `\s+(?!\S)` whitespace lookahead on `text` alone. Three literal
    * replaces (every "e "-ending word gains 's, every "n "-ending word
    * gains 'll, every "s "-ending word — including the freshly-minted
    * 's — gains a SECOND space) make both ubiquitous, and a plain string
    * replace is engine-identical by construction — the SAME transform
    * runs in Spark ([[gpt2Text]]) and DuckDB ([[Gpt2TextSql]]), so the
    * corpora match bit-for-bit before the regex ever runs. The
    * double-space injection is what keeps the lookahead (and the
    * oracle's fix-up) under the per-round gate rather than spec-only. */
  private val Gpt2TextSql =
    "replace(replace(replace(text, 'e ', 'e''s '), 'n ', 'n''ll '), " +
      "'s ', 's  ')"
  private def gpt2Text: Column =
    org.apache.spark.sql.functions.replace(
      org.apache.spark.sql.functions.replace(
        org.apache.spark.sql.functions.replace(
          col("text"), lit("e "), lit("e's ")),
        lit("n "), lit("n'll ")),
      lit("s "), lit("s  "))

  private val Gpt2PatSqlLit = Gpt2GreedyPat.replace("'", "''")

  /** RE2 has no lookahead, so the oracle reproduces `\s+(?!\S)` by a
    * POST-SPLIT FIX-UP over the greedy token list L (bound once via the
    * one-element list_transform trick). The rules, each provably what
    * the lookahead split yields at that position (Gpt2LookaheadSpec pins
    * the algorithm against the real lookahead on adversarial corpora):
    *
    *  - a DONOR — an interior whitespace-only token of length ≥ 2 —
    *    keeps its first n−1 chars; its last char joins the next token
    *    when it is a plain space, else (tab/newline) becomes a one-char
    *    whitespace token of its own (GPT-2's ` ?` folds only 0x20);
    *  - the token AFTER a space-donor gains the leading space; when that
    *    token is a CONTRACTION ('s 't …) the space+apostrophe re-split
    *    as a symbol run — `" '"` — and the contraction's letters rejoin
    *    the following letter-run if one follows (greedy had chopped one
    *    letter run in two: `"  'tis"` is `" ", " '", "tis"` in GPT-2 but
    *    `"  ", "'t", "is"` greedily);
    *  - a letter-run consumed by that rejoin emits nothing;
    *  - everything else passes through. */
  private def gpt2FixupSql(rawList: String): String = {
    val ws = "regexp_full_match(%s, '\\s+')"
    def donor(t: String, i: String, n: String) =
      s"(${ws.format(t)} AND length($t) >= 2 AND $i < $n)"
    def spaceDonor(t: String, i: String, n: String) =
      s"(${donor(t, i, n)} AND substr($t, length($t), 1) = ' ')"
    val contractions = "('''s', '''t', '''re', '''ve', '''m', '''ll', '''d')"
    s"""list_transform([$rawList], L ->
       |  flatten(list_transform(range(1, len(L) + 1), i -> CASE
       |    WHEN ${donor("L[i]", "i", "len(L)")} THEN
       |      CASE WHEN substr(L[i], length(L[i]), 1) = ' '
       |        THEN [substr(L[i], 1, length(L[i]) - 1)]
       |        ELSE [substr(L[i], 1, length(L[i]) - 1),
       |              substr(L[i], length(L[i]), 1)] END
       |    WHEN i > 2 AND ${spaceDonor("L[i-2]", "i-2", "len(L)")}
       |        AND L[i-1] IN $contractions
       |        AND regexp_full_match(L[i], '[\\p{L}]+') THEN
       |      []::VARCHAR[]
       |    WHEN i > 1 AND ${spaceDonor("L[i-1]", "i-1", "len(L)")} THEN
       |      CASE WHEN L[i] IN $contractions THEN
       |        CASE WHEN i < len(L)
       |              AND regexp_full_match(L[i+1], '[\\p{L}]+')
       |          THEN [' ' || substr(L[i], 1, 1),
       |                substr(L[i], 2) || L[i+1]]
       |          ELSE [' ' || substr(L[i], 1, 1), substr(L[i], 2)] END
       |        ELSE [' ' || L[i]] END
       |    ELSE [L[i]] END)))[1]""".stripMargin
  }

  private val Gpt2WordsSql =
    s"unnest(${gpt2FixupSql(
      s"regexp_extract_all($Gpt2TextSql, '$Gpt2PatSqlLit')")})"

  /** BYTE-alphabet word-frequency CTE: raw tokens from `wordsSql` (no
    * lowercasing — case is in-alphabet now), symbols = the uppercase
    * hex-pair rendering of the word's UTF-8 bytes, the 2..N bound on BYTE
    * length. Mirrors [[bpeByteWordTableOf]]. */
  private def byteWordTableCte(name: String, wordsSql: String): String =
    s"""$name AS MATERIALIZED (SELECT freq, array_to_string(list_transform(
       |    range(1, CAST(octet_length(encode(word)) AS INT) + 1),
       |    i -> substring(hex(encode(word)), 2*i-1, 2)), ' ') AS syms
       |  FROM (SELECT word, count(*) AS freq
       |    FROM (SELECT $wordsSql AS word
       |        FROM documents WHERE text IS NOT NULL)
       |    WHERE octet_length(encode(word)) BETWEEN 2 AND $BpeMaxWordLen
       |    GROUP BY word))""".stripMargin

  private def bpeByteCtes: String =
    bpeRoundCtes(byteWordTableCte("s0", WsWordsSql))
  private def bpePretokCtes: String =
    bpeRoundCtes(byteWordTableCte("s0", PreTokWordsSql))
  private def bpeGpt2Ctes: String =
    bpeRoundCtes(byteWordTableCte("s0", Gpt2WordsSql))

  /** DuckDB mirror of train_bpe: project the per-round argmax rows. */
  private def trainSqlOver(ctes: String): String = {
    val union = (1 to BpeMerges)
      .map(k => s"SELECT * FROM b$k").mkString("\n  UNION ALL ")
    s"""WITH $ctes
       |SELECT CAST(round AS BIGINT) AS round, l AS lhs, r AS rhs,
       |  l || r AS merged, c AS pair_freq
       |FROM ($union)
       |ORDER BY round""".stripMargin
  }
  private def trainBpeSql: String = trainSqlOver(bpeCtes)

  /** DuckDB mirror of the DSIR feature map + model + per-doc weights
    * (dsir_weights / sample_importance): same whitespace tokens, same
    * bigram key, same md5-16-bit bucket fold, and the λ double math
    * parenthesized VERBATIM as the Spark side so the one ln per bucket is
    * the only libm call (floor-quantized — the text_perplexity parity
    * discipline). */
  private def dsirWeightCtes: String =
    s"""ta AS (SELECT doc_id, lang, string_split_regex(text, '\\s+') AS a
       |  FROM documents WHERE text IS NOT NULL),
       |uni AS (SELECT doc_id, lang, unnest(a) AS ng FROM ta),
       |bgx AS (SELECT doc_id, lang, unnest(list_transform(range(1, len(a)),
       |    i -> a[CAST(i AS INT)] || ' ' || a[CAST(i AS INT) + 1])) AS ng
       |  FROM ta WHERE len(a) >= 2),
       |feats AS (SELECT doc_id, lang,
       |    list_reduce(list_transform(range(1, 5),
       |        i -> instr('0123456789abcdef',
       |          substr(md5(ng), CAST(i AS INT), 1)) - 1),
       |      (x, y) -> x*16 + y) % $DsirBuckets AS b
       |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bgx)),
       |rawc AS (SELECT b, count(*) AS cr FROM feats GROUP BY 1),
       |tgtc AS (SELECT b, count(*) AS ct FROM feats
       |  WHERE lang = '$DsirTargetLang' GROUP BY 1),
       |tot AS (SELECT count(*) AS nr,
       |    CAST(sum(CASE WHEN lang = '$DsirTargetLang' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS nt
       |  FROM feats),
       |lam AS (SELECT b, CAST(floor(ln(
       |      (CAST(coalesce(ct, 0) + 1 AS DOUBLE) * (nr + $DsirBuckets))
       |      / (CAST(cr + 1 AS DOUBLE) * (nt + $DsirBuckets))) * $NllScale)
       |    AS BIGINT) AS lam FROM rawc LEFT JOIN tgtc USING (b), tot),
       |wts AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_feats,
       |    CAST(sum(lam) AS BIGINT) AS weight_scaled
       |  FROM feats JOIN lam USING (b) GROUP BY 1, 2)""".stripMargin
  private def trainBpeBytesSql: String = trainSqlOver(bpeByteCtes)

  /** DuckDB mirror of train_bpe_batched, generated from the same constants:
    * per super-round, rank pairs (bq), keep the conflict-free prefix (bg —
    * the NOT EXISTS is over ALL higher-ranked candidates, matching the
    * engine), pivot the ≤K survivors to one row (bm — aggregates over an
    * empty bg yield NULLs, coalesced to a '#' sentinel no [a-z]+ symbol can
    * match, so the round degrades to identity exactly like the engine's
    * stop), and apply them as K nested single-merge cycles — the same
    * composition as the engine's chained [[applyBpeMerge]] folds. */
  private def trainBpeBatchedSql: String = {
    val rounds = (1 to BpeBatchRounds).map { k =>
      val applied = (1 to BpeBatchK).foldLeft(s"t${k - 1}.syms") { (acc, j) =>
        mergeCycleSql(acc,
          s"coalesce(bm$k.l$j, '#')", s"coalesce(bm$k.r$j, '#')")
      }
      val mCols = (1 to BpeBatchK).map(j =>
        s"""max(CASE WHEN sel = $j THEN l END) AS l$j,
           |    max(CASE WHEN sel = $j THEN r END) AS r$j""".stripMargin)
        .mkString(",\n    ")
      s"""bp$k AS (SELECT pr[1] AS l, pr[2] AS r,
         |    CAST(sum(freq) AS BIGINT) AS c
         |  FROM (SELECT freq, unnest(list_transform(range(1, len(sy)),
         |      i -> [sy[i], sy[i + 1]])) AS pr
         |    FROM (SELECT freq, string_split(syms, ' ') AS sy FROM t${k - 1}))
         |  GROUP BY 1, 2),
         |bq$k AS (SELECT * FROM (SELECT l, r, c,
         |    row_number() OVER (ORDER BY c DESC, l, r) AS rk FROM bp$k)
         |  WHERE rk <= $BpeBatchCand),
         |bg$k AS (SELECT * FROM (SELECT a.l, a.r, a.c,
         |    row_number() OVER (ORDER BY a.rk) AS sel
         |  FROM bq$k a
         |  WHERE NOT EXISTS (SELECT 1 FROM bq$k b WHERE b.rk < a.rk
         |    AND (b.l = a.l OR b.l = a.r OR b.r = a.l OR b.r = a.r)))
         |  WHERE sel <= $BpeBatchK),
         |bm$k AS (SELECT $mCols FROM bg$k),
         |t$k AS (SELECT t${k - 1}.freq, $applied AS syms
         |  FROM t${k - 1}, bm$k)""".stripMargin
    }
    val union = (1 to BpeBatchRounds)
      .map(k => s"SELECT $k AS round, sel, l, r, c FROM bg$k")
      .mkString("\n  UNION ALL ")
    s"""WITH ${wordTableCte("t0")},
       |${rounds.mkString(",\n")}
       |SELECT CAST(round AS BIGINT) AS round,
       |  CAST(row_number() OVER (ORDER BY round, sel) AS BIGINT) AS seq,
       |  l AS lhs, r AS rhs, l || r AS merged, c AS pair_freq
       |FROM ($union)
       |ORDER BY seq""".stripMargin
  }

  /** DuckDB mirror of tokenize_bpe: tokenize the distinct-word vocabulary
    * through the learned merges (v_k chain, same doubled-separator
    * encoding), then join token lengths back to per-document word counts. */
  private def tokenizeBpeSql: String = {
    // LEFT JOIN + coalesce (not a cross join): once merges exhaust, b_k is
    // empty and the round must be an IDENTITY pass over v_{k-1} — exactly
    // the engine's early stop — not an empty relation.
    val vRounds = (1 to BpeMerges).map { k =>
      s"""v$k AS (SELECT word, coalesce(
         |    ${mergeCycleSql(s"v${k - 1}.syms", s"b$k.l", s"b$k.r")},
         |    v${k - 1}.syms) AS syms
         |  FROM v${k - 1} LEFT JOIN b$k ON TRUE)""".stripMargin
    }
    s"""WITH $bpeCtes,
       |dw AS (SELECT doc_id, word, count(*) AS n
       |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+'))
       |      AS word FROM documents WHERE text IS NOT NULL)
       |  GROUP BY 1, 2),
       |v0 AS (SELECT word, array_to_string(list_transform(
       |    range(1, length(word) + 1), i -> substr(word, i, 1)), ' ')
       |    AS syms FROM (SELECT DISTINCT word FROM dw)),
       |${vRounds.mkString(",\n")}
       |SELECT dw.doc_id, CAST(sum(dw.n) AS BIGINT) AS n_words,
       |  CAST(sum(dw.n * len(string_split(v$BpeMerges.syms, ' ')))
       |    AS BIGINT) AS n_bpe_tokens
       |FROM dw JOIN v$BpeMerges USING (word)
       |GROUP BY 1 ORDER BY doc_id""".stripMargin
  }

  /** DuckDB mirror of [[tokenIdsOf]], appended after [[bpeCtes]]: mt maps
    * merge outputs to ids (keep-first = min round, matching the Scala map
    * build), the v-chain tokenizes the distinct ordered-word vocabulary
    * (identity LEFT JOIN when a round is exhausted, as tokenizeBpeSql),
    * wid maps each word's symbols to id lists in symbol order, and di
    * flattens word id-lists back into per-document sequences via the
    * zipped-unnest position. Ends with `di(doc_id, tids)`. */
  /** The FFD token-pack replay CTEs (e → ffd recursion → md → sq) over
    * any `di(doc_id, tids)`-shaped source — shared by
    * pack_best_fit_tokens and the boundary-composed intake oracles so
    * the replay can never fork. Pair with [[FfdTokenPackSelectSql]]. */
  private def ffdTokenPackSqlCtes(diSrc: String): String =
    s"""e AS MATERIALIZED (SELECT doc_id, doc_id % $PackBuckets AS bucket, tids,
       |    LEAST(CAST(len(tids) AS BIGINT) + 1, $TokenSeqLen) AS n_eff,
       |    CAST(row_number() OVER (PARTITION BY doc_id % $PackBuckets
       |      ORDER BY LEAST(CAST(len(tids) AS BIGINT) + 1, $TokenSeqLen)
       |        DESC, doc_id) AS BIGINT) AS step
       |  FROM $diSrc),
       |ffd AS (
       |  SELECT bucket, step, doc_id, n_eff,
       |    CAST(1 AS BIGINT) AS seq,
       |    [$TokenSeqLen - n_eff] AS rem
       |  FROM e WHERE step = 1
       |  UNION ALL
       |  SELECT e.bucket, e.step, e.doc_id, e.n_eff,
       |    CASE WHEN coalesce(list_position(
       |          list_transform(f.rem, r -> r >= e.n_eff), true), 0) > 0
       |      THEN CAST(coalesce(list_position(
       |          list_transform(f.rem, r -> r >= e.n_eff), true), 0)
       |        AS BIGINT)
       |      ELSE CAST(len(f.rem) + 1 AS BIGINT) END AS seq,
       |    CASE WHEN coalesce(list_position(
       |          list_transform(f.rem, r -> r >= e.n_eff), true), 0) > 0
       |      THEN list_transform(range(1, len(f.rem) + 1),
       |        i -> CASE WHEN i = coalesce(list_position(
       |              list_transform(f.rem, r -> r >= e.n_eff), true), 0)
       |          THEN f.rem[i] - e.n_eff ELSE f.rem[i] END)
       |      ELSE list_append(f.rem, $TokenSeqLen - e.n_eff) END AS rem
       |  FROM ffd f JOIN e ON e.bucket = f.bucket AND e.step = f.step + 1
       |),
       |md AS (SELECT f.bucket, f.seq, f.step,
       |    list_concat(list_slice(e.tids, 1, CAST(f.n_eff - 1 AS INT)),
       |      [$BpeEosId]) AS ids_doc
       |  FROM ffd f JOIN e ON e.bucket = f.bucket AND e.step = f.step),
       |sq AS (SELECT bucket, seq, CAST(count(*) AS BIGINT) AS n_docs,
       |    flatten(list(ids_doc ORDER BY step)) AS real_ids
       |  FROM md GROUP BY 1, 2)""".stripMargin

  /** The audit-row projection over [[ffdTokenPackSqlCtes]]'s `sq`. */
  private def FfdTokenPackSelectSql: String =
    s"""SELECT CAST(bucket AS BIGINT) AS bucket, seq, n_docs,
       |  CAST(len(real_ids) AS BIGINT) AS n_real,
       |  CAST($TokenSeqLen - len(real_ids) AS BIGINT) AS n_pad,
       |  md5(array_to_string(list_concat(real_ids,
       |    list_transform(range($TokenSeqLen - len(real_ids)),
       |      x -> $BpePadId)), ',')) AS ids_md5
       |FROM sq""".stripMargin

  /** One SEEDED FFD recursion: phase CTE `f` replays step table `e`
    * starting from the per-bucket remainder lists in `sd(bucket, rem)`
    * (empty list = fresh bucket; a non-empty list = the bins an earlier
    * drop left open — the [[graft.operators.PackState]] continuation
    * semantics). Base row is step 0 (no doc); the member is the
    * pack_best_fit first-fit step verbatim. */
  private def seededFfdSql(f: String, e: String, sd: String): String = {
    val pos =
      s"coalesce(list_position(list_transform(fp.rem, r -> r >= e.n_eff)," +
        " true), 0)"
    s"""$f AS (
       |  SELECT bucket, CAST(0 AS BIGINT) AS step, CAST(0 AS BIGINT) AS seq,
       |    CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS n_eff,
       |    rem
       |  FROM $sd
       |  UNION ALL
       |  SELECT e.bucket, e.step,
       |    CASE WHEN $pos > 0 THEN CAST($pos AS BIGINT)
       |      ELSE CAST(len(fp.rem) + 1 AS BIGINT) END AS seq,
       |    e.doc_id, e.n_eff,
       |    CASE WHEN $pos > 0
       |      THEN list_transform(range(1, len(fp.rem) + 1),
       |        i -> CASE WHEN i = $pos
       |          THEN fp.rem[i] - e.n_eff ELSE fp.rem[i] END)
       |      ELSE list_append(fp.rem, $TokenSeqLen - e.n_eff) END AS rem
       |  FROM $f fp JOIN $e e ON e.bucket = fp.bucket
       |    AND e.step = fp.step + 1)""".stripMargin
  }

  /** DuckDB mirror of the TWO-DROP persisted pack
    * ([[graft.operators.PackState]] over two drops of any
    * `di(doc_id, tids)` source — membership predicates parameterized;
    * defaults are the doc_id-parity split): phase-1 FFD from empty
    * bins, phase-2 FFD SEEDED with phase 1's final remainder lists,
    * contributions concatenated in cross-drop visit order. Ends with
    * `pksq(bucket, seq, n_docs, real_ids)`. */
  private def twoDropPackSqlCtes(
      diSrc: String,
      where1: String = "doc_id % 2 = 0",
      where2: String = "doc_id % 2 = 1"): String =
    s"""pkall AS MATERIALIZED (SELECT doc_id, doc_id % $PackBuckets AS bucket, tids,
       |    LEAST(CAST(len(tids) AS BIGINT) + 1, $TokenSeqLen) AS n_eff
       |  FROM $diSrc),
       |pke1 AS MATERIALIZED (SELECT doc_id, bucket, tids, n_eff,
       |    CAST(row_number() OVER (PARTITION BY bucket
       |      ORDER BY n_eff DESC, doc_id) AS BIGINT) AS step
       |  FROM pkall WHERE $where1),
       |pke2 AS MATERIALIZED (SELECT doc_id, bucket, tids, n_eff,
       |    CAST(row_number() OVER (PARTITION BY bucket
       |      ORDER BY n_eff DESC, doc_id) AS BIGINT) AS step
       |  FROM pkall WHERE $where2),
       |pks1 AS (SELECT DISTINCT bucket, CAST([] AS BIGINT[]) AS rem
       |  FROM pke1),
       |${seededFfdSql("pkffd1", "pke1", "pks1")},
       |pkf1n AS (SELECT bucket, max(step) AS mstep FROM pkffd1 GROUP BY 1),
       |pkf1f AS (SELECT f.bucket, f.rem FROM pkffd1 f
       |  JOIN pkf1n ON f.bucket = pkf1n.bucket AND f.step = pkf1n.mstep),
       |pks2 AS (SELECT b.bucket,
       |    list_transform(coalesce(pkf1f.rem, CAST([] AS BIGINT[])),
       |      r -> CASE WHEN r < $PackCloseBelow THEN CAST(-1 AS BIGINT)
       |        ELSE r END) AS rem
       |  FROM (SELECT DISTINCT bucket FROM pke2) b
       |  LEFT JOIN pkf1f USING (bucket)),
       |${seededFfdSql("pkffd2", "pke2", "pks2")},
       |pkmdu AS (
       |  SELECT f.bucket, f.seq, 1 AS phase, f.step,
       |    list_concat(list_slice(e.tids, 1, CAST(f.n_eff - 1 AS INT)),
       |      [$BpeEosId]) AS ids_doc
       |  FROM pkffd1 f JOIN pke1 e ON e.bucket = f.bucket AND e.step = f.step
       |  UNION ALL
       |  SELECT f.bucket, f.seq, 2 AS phase, f.step,
       |    list_concat(list_slice(e.tids, 1, CAST(f.n_eff - 1 AS INT)),
       |      [$BpeEosId]) AS ids_doc
       |  FROM pkffd2 f JOIN pke2 e ON e.bucket = f.bucket AND e.step = f.step),
       |pksq AS (SELECT bucket, seq, CAST(count(*) AS BIGINT) AS n_docs,
       |    flatten(list(ids_doc ORDER BY phase, step)) AS real_ids
       |  FROM pkmdu GROUP BY 1, 2)""".stripMargin

  private def tokenIdCtes: String =
    tokenIdCtesOver("SELECT doc_id, text FROM documents", "")

  /** DuckDB mirror of [[graft.operators.DedupState.spanScrub]] over
    * drop 2's CURATED documents vs the gated state (a1's ALIGNED chunk
    * hashes): rebuilds each doc's text with every STRIDE-1
    * [[Dedup.SpanTokens]]-token window whose hash is admitted cut
    * (round 17 — phase-independent; a hit at window start p cuts tokens
    * p..p+SpanTokens−1), survivors rejoined in token order. Requires
    * `a1` and `clean2` in scope; ends with `skept(doc_id, text)`. A doc
    * scrubbed to zero tokens has no skept row — no words, no token
    * rows, exactly the engine's empty-string rebuild. Drop 1 needs no
    * mirror: its pre-drop state is EMPTY, and an empty state's scrub is
    * a token-identity for the whitespace-invariant a-z tokenizer. */
  private def scrubRebuildSqlCtes: String =
    s"""sct AS MATERIALIZED (SELECT doc_id, string_split_regex(text, '\\s+') AS toks
       |  FROM documents WHERE text IS NOT NULL),
       |scc AS (SELECT doc_id, toks,
       |    unnest(range(0, len(toks) // ${Dedup.SpanTokens})) AS ci
       |  FROM sct WHERE len(toks) >= ${Dedup.SpanTokens}),
       |schk AS MATERIALIZED (SELECT doc_id,
       |    md5(array_to_string(list_slice(toks,
       |      ci * ${Dedup.SpanTokens} + 1,
       |      ci * ${Dedup.SpanTokens} + ${Dedup.SpanTokens}), ' '))
       |      AS chunk_hash
       |  FROM scc),
       |ssch1 AS MATERIALIZED (SELECT DISTINCT chunk_hash
       |  FROM schk JOIN a1 USING (doc_id)),
       |swc2 AS (SELECT sct.doc_id, toks,
       |    unnest(range(0, len(toks) - ${Dedup.SpanTokens - 1})) AS wpos
       |  FROM sct JOIN clean2 USING (doc_id)
       |  WHERE len(toks) >= ${Dedup.SpanTokens}),
       |shits AS (SELECT doc_id, wpos FROM swc2
       |  WHERE md5(array_to_string(list_slice(toks,
       |      wpos + 1, wpos + ${Dedup.SpanTokens}), ' '))
       |    IN (SELECT chunk_hash FROM ssch1)),
       |scov AS (SELECT DISTINCT doc_id, wpos + u.u AS pos
       |  FROM shits, (SELECT unnest(range(0, ${Dedup.SpanTokens})) AS u) u),
       |stok AS (SELECT sct.doc_id, unnest(toks) AS tok,
       |    unnest(range(len(toks))) AS pos
       |  FROM sct JOIN clean2 USING (doc_id)),
       |skept AS MATERIALIZED (SELECT stok.doc_id,
       |    string_agg(stok.tok, ' ' ORDER BY stok.pos) AS text
       |  FROM stok LEFT JOIN scov
       |    ON stok.doc_id = scov.doc_id AND stok.pos = scov.pos
       |  WHERE scov.pos IS NULL
       |  GROUP BY 1)""".stripMargin

  /** [[tokenIdCtes]] over a caller-supplied `(doc_id, text)` source and
    * a CTE-name prefix — the scrubbed-loop entries tokenize REBUILT text
    * (and the report needs BOTH chains in one query, hence the prefix).
    * The merge tables b1..bK are shared (the tokenizer is trained once,
    * on the corpus — only the ENCODED relation is parameterized). Ends
    * with `<p>di(doc_id, tids)`. */
  private def tokenIdCtesOver(srcSql: String, p: String): String = {
    val vRounds = (1 to BpeMerges).map { k =>
      s"""${p}v$k AS (SELECT word, coalesce(
         |    ${mergeCycleSql(s"${p}v${k - 1}.syms", s"b$k.l", s"b$k.r")},
         |    ${p}v${k - 1}.syms) AS syms
         |  FROM ${p}v${k - 1} LEFT JOIN b$k ON TRUE)""".stripMargin
    }
    val mtUnion = (1 to BpeMerges)
      .map(k => s"SELECT round, l || r AS merged FROM b$k")
      .mkString("\n  UNION ALL ")
    s"""${p}mt AS MATERIALIZED (SELECT merged, CAST(25 + min(round) AS INT) AS id
       |  FROM ($mtUnion) GROUP BY merged),
       |${p}ow AS MATERIALIZED (SELECT doc_id, unnest(ws) AS word, unnest(range(len(ws))) AS pos
       |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
       |    FROM ($srcSql) AS tsrc WHERE text IS NOT NULL)),
       |${p}v0 AS (SELECT word, array_to_string(list_transform(
       |    range(1, length(word) + 1), i -> substr(word, i, 1)), ' ')
       |    AS syms FROM (SELECT DISTINCT word FROM ${p}ow)),
       |${vRounds.mkString(",\n")},
       |${p}sy AS (SELECT word, unnest(sl) AS sym, unnest(range(len(sl))) AS sp
       |  FROM (SELECT word, string_split(syms, ' ') AS sl FROM ${p}v$BpeMerges)),
       |${p}wid AS MATERIALIZED (SELECT word, list(CASE WHEN length(sym) = 1
       |      THEN ascii(sym) - 97 ELSE ${p}mt.id END ORDER BY sp) AS ids
       |  FROM ${p}sy LEFT JOIN ${p}mt ON ${p}mt.merged = ${p}sy.sym GROUP BY word),
       |${p}di AS (SELECT ${p}ow.doc_id, flatten(list(${p}wid.ids ORDER BY ${p}ow.pos)) AS tids
       |  FROM ${p}ow JOIN ${p}wid USING (word) GROUP BY ${p}ow.doc_id)""".stripMargin
  }

  /** BYTE-alphabet mirror of [[tokenIdCtes]], appended after
    * [[bpeByteCtes]]: same v-chain/sy/wid/di shapes, but words are raw
    * whitespace tokens (empties dropped — string_split_regex emits them
    * at text edges, where the a-z regexp never did), base ids decode the
    * 2-hex-char symbol to its byte value, and merge ids start at 255 + 1.
    * Ends with `di(doc_id, tids)`. */
  private def tokenIdByteCtes: String = tokenIdByteCtesFor(
    "string_split_regex(text, '\\s+')")

  private def tokenIdPretokCtes: String = tokenIdByteCtesFor(
    s"regexp_extract_all(text, '$PreTokSql')")

  private def tokenIdGpt2Ctes: String = tokenIdByteCtesFor(
    gpt2FixupSql(s"regexp_extract_all($Gpt2TextSql, '$Gpt2PatSqlLit')"))

  private def tokenIdByteCtesFor(wordsArraySql: String): String = {
    val vRounds = (1 to BpeMerges).map { k =>
      s"""v$k AS (SELECT word, coalesce(
         |    ${mergeCycleSql(s"v${k - 1}.syms", s"b$k.l", s"b$k.r")},
         |    v${k - 1}.syms) AS syms
         |  FROM v${k - 1} LEFT JOIN b$k ON TRUE)""".stripMargin
    }
    val mtUnion = (1 to BpeMerges)
      .map(k => s"SELECT round, l || r AS merged FROM b$k")
      .mkString("\n  UNION ALL ")
    s"""mt AS MATERIALIZED (SELECT merged, CAST(255 + min(round) AS INT) AS id
       |  FROM ($mtUnion) GROUP BY merged),
       |ow AS MATERIALIZED (SELECT doc_id, word, pos FROM
       |    (SELECT doc_id, unnest(ws) AS word, unnest(range(len(ws))) AS pos
       |      FROM (SELECT doc_id, $wordsArraySql AS ws
       |        FROM documents WHERE text IS NOT NULL))
       |  WHERE word <> ''),
       |v0 AS (SELECT word, array_to_string(list_transform(
       |    range(1, CAST(octet_length(encode(word)) AS INT) + 1),
       |    i -> substring(hex(encode(word)), 2*i-1, 2)), ' ') AS syms
       |  FROM (SELECT DISTINCT word FROM ow)),
       |${vRounds.mkString(",\n")},
       |sy AS (SELECT word, unnest(sl) AS sym, unnest(range(len(sl))) AS sp
       |  FROM (SELECT word, string_split(syms, ' ') AS sl FROM v$BpeMerges)),
       |wid AS MATERIALIZED (SELECT word, list(CASE WHEN length(sym) = 2
       |      THEN (instr('0123456789ABCDEF', substring(sym, 1, 1)) - 1) * 16
       |        + instr('0123456789ABCDEF', substring(sym, 2, 1)) - 1
       |      ELSE mt.id END ORDER BY sp) AS ids
       |  FROM sy LEFT JOIN mt ON mt.merged = sy.sym GROUP BY word),
       |di AS (SELECT ow.doc_id, flatten(list(wid.ids ORDER BY ow.pos)) AS tids
       |  FROM ow JOIN wid USING (word) GROUP BY ow.doc_id)""".stripMargin
  }

  /** Packing CTEs over `di` — DuckDB mirror of [[packTokenIds]]; ends with
    * `pq(bucket, seq_id, n_real, n_pad, ids)`. EOS/PAD ids are the
    * alphabet's (fixed ends of each id space). */
  private def packTokenIdCtesWith(eosId: Int, padId: Int): String =
    s"""de AS (SELECT doc_id, doc_id % $PackBuckets AS bucket,
       |    list_concat(tids, [$eosId]) AS ids FROM di),
       |toff AS (SELECT doc_id, bucket, ids, len(ids) AS n,
       |    sum(len(ids)) OVER (PARTITION BY bucket
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cum FROM de),
       |tst AS (SELECT bucket, (cum - n + p) AS gpos, id
       |  FROM (SELECT bucket, cum, n, unnest(ids) AS id,
       |      unnest(range(len(ids))) AS p FROM toff)),
       |tsq AS (SELECT bucket, gpos // $TokenSeqLen AS seq_id,
       |    list(id ORDER BY gpos) AS real_ids
       |  FROM tst GROUP BY 1, 2),
       |pq AS (SELECT bucket, seq_id,
       |    CAST(len(real_ids) AS BIGINT) AS n_real,
       |    CAST($TokenSeqLen - len(real_ids) AS BIGINT) AS n_pad,
       |    list_concat(real_ids, list_transform(
       |      range($TokenSeqLen - len(real_ids)), x -> $padId)) AS ids
       |  FROM tsq)""".stripMargin

  private def packTokenIdCtes: String =
    packTokenIdCtesWith(BpeEosId, BpePadId)

  /** DuckDB CTEs producing the (doc_id, fp) winnow-fingerprint relation
    * `wf` — shared by text_winnow and Dedup.dedup_winnow so the two
    * oracles can never drift from one fingerprint definition. */
  private[queries] val WinnowFpsSqlCtes: String =
    """t AS (
      |  SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS t,
      |    greatest(length(lower(regexp_replace(text, '\s+', ' ', 'g'))) - 7, 1) AS n
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, n, unnest(range(1, n + 1)) AS pos, t FROM t),
      |h AS (
      |  SELECT doc_id, n, pos,
      |    list_reduce(list_transform(range(1, 9),
      |      i -> instr('0123456789abcdef', substr(md5(substr(t, CAST(pos AS INT), 8)), i, 1)) - 1),
      |      (a, b) -> a*16 + b) AS h
      |  FROM g),
      |w AS (
      |  SELECT doc_id, n, pos,
      |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
      |                 ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS wmin
      |  FROM h),
      |wf AS (SELECT DISTINCT doc_id, wmin AS fp FROM w
      |  WHERE pos <= greatest(n - 15, 1))""".stripMargin

  /** DuckDB form of [[splitOf]] over a bucket column reference. */
  private[queries] def splitCaseSql(bucketRef: String): String =
    s"""CASE WHEN $bucketRef < $SplitTrainMax THEN 'train'
       |       WHEN $bucketRef < $SplitValMax THEN 'val'
       |       ELSE 'test' END""".stripMargin
  private val ShuffleShards = 8 // shuffle_corpus: parallel output streams
  private val CapPerSource = 15 // cap_per_source: max docs kept per source
  private val PrioritySampleK = 50 // sample_priority: sample size
  private val PrioStratumK = 10 // sample_priority_by_lang: per-stratum k
  private val PipelineMixSampleK = 30 // pipeline_mix_sample: sample size
  private val MixTempTarget = 200.0 // mix_temperature: expected total docs
  private val KllK = 200 // text_quantiles_sketch: per-level capacity

  /** Fixed-point scale for the per-source temperature weight q = √n:
    * 2^16 (a power of two, so q·2^16 is EXACT in IEEE — a pure exponent
    * shift of the correctly-rounded sqrt) keeps qs ≤ 2^36 even at 10^12
    * docs/source, so the Σ over 10M+ domain-grained sources stays far
    * inside a BIGINT. The quantization (≤ 2^-16/√n relative) only
    * perturbs the mixing RATE, never exactness: both engines compute the
    * identical integers. */
  private val MixQScale = 65536.0

  /** Per-source temperature acceptance thresholds — the shared heart of
    * mix_temperature / pipeline_mix_sample, in the HIGH-CARDINALITY-SAFE
    * form (round 13): Σ√n is an order-free BIGINT sum of fixed-point
    * [[MixQScale]]-scaled q's, NOT a one-row collect_list fold — a
    * domain-grained `source` column (10M+ values at 100 TB, the
    * RefinedWeb/CCNet posture) pays one map-side-combined count, one
    * scalar integer aggregate, and a broadcast back; nothing in the plan
    * is source-cardinality-sized on a single partition. Every remaining
    * float op is a single correctly-rounded primitive (sqrt, one
    * multiply by a power of two, three divisions, floor), so both
    * engines produce bit-identical rates/thresholds with no fold-order
    * dependence. */
  private[graft] def mixThresholdsOf(d: DataFrame): DataFrame = {
    val srcStats = d.groupBy("source")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("q", sqrt(col("n_docs").cast("double")))
      .withColumn("qs", floor(col("q") * lit(MixQScale)).cast("long"))
    val sumQ = srcStats.agg(sum(col("qs")).as("sum_qs"))
    srcStats.crossJoin(broadcast(sumQ))
      .withColumn("rate", least(lit(1.0),
        ((lit(MixTempTarget) * col("qs").cast("double"))
          / col("sum_qs").cast("double"))
          / col("n_docs").cast("double")))
      .withColumn("thr",
        floor(col("rate") * lit(4294967296.0)).cast("long"))
      .select("source", "n_docs", "q", "rate", "thr")
  }

  /** The shared FFD kernel (round 13): deterministic first-fit-
    * decreasing over (doc_id, bucket, n_tokens, n_eff) rows — visit
    * order (n_eff DESC, doc_id) per bucket, first bin that fits in
    * creation order, budget-sized bins. Emits (doc_id, bucket, seq,
    * step, n_tokens, n_eff) where `step` is the per-bucket visit index
    * (1-based) — the deterministic within-sequence order the token-
    * materializing tier concatenates by. First-fit is the genuinely
    * sequential per-group kernel (no window/join expresses it);
    * flatMapSortedGroups streams each bucket sorted, with only the
    * bin-remainder state. Buckets are the parallelism.
    *
    * In-kernel complexity (round 14): "first bin with rem ≥ n_eff" is
    * answered by a max-prefix segment tree over the bin remainders
    * ([[graft.operators.FirstFitTree]]) in O(log bins) per document —
    * the linear open-bin scan it replaces was O(bins) per doc, per-
    * bucket quadratic at fixed bucket count, which a 100 TB bucket with
    * millions of docs cannot pay. The tree returns the SAME bin the
    * linear scan would (lowest fitting index), so the assignment — and
    * the recursive-CTE oracle that replays it — is unchanged;
    * `graft.tools.FfdMicro` measures the win on one large bucket. */
  private[graft] def ffdAssign(
      s: SparkSession, d: DataFrame, budget: Long): DataFrame = {
    import s.implicits._
    d.select(col("doc_id").cast("long"), col("bucket").cast("long"),
        col("n_tokens").cast("long"), col("n_eff").cast("long"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapSortedGroups(col("n_eff").desc, col("doc_id")) { (bucket, it) =>
        val bins = new graft.operators.FirstFitTree
        var step = 0L
        it.map { case (docId, _, nTokens, nEff) =>
          step += 1L
          val fit = bins.firstFit(nEff)
          val seq =
            if (fit >= 0) { bins.take(fit, nEff); fit + 1L }
            else { bins.append(budget - nEff); bins.size.toLong }
          (docId, bucket, seq, step, nTokens, nEff)
        }
      }
      .toDF("doc_id", "bucket", "seq", "step", "n_tokens", "n_eff")
  }

  /** The FFD token-packing materialization shared by
    * pack_best_fit_tokens and the boundary-composed intake
    * (pipeline_intake_e2e / pipeline_intake_report): takes
    * (doc_id, token_ids) rows, shapes them into the FFD input (bucket =
    * doc_id % PackBuckets, n_eff = min(n_ids + 1, TokenSeqLen)), runs
    * [[ffdAssign]], and materializes one audit row per training
    * sequence — (bucket, seq, n_docs, n_real, n_pad, ids_md5) with every
    * id pinned through the md5 (docs concatenate in FFD visit order,
    * each contributing its prefix + EOS, tail padded with PAD).
    * Per-sequence collect_list is bounded by TokenSeqLen ids. */
  private def ffdTokenRowsOf(s: SparkSession, idRows: DataFrame): DataFrame = {
    val ids = idRows
      .select(col("doc_id").cast("long").as("doc_id"), col("token_ids"))
      .withColumn("bucket", (col("doc_id") % PackBuckets).cast("long"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))
      .withColumn("n_eff",
        least(col("n_tokens") + 1L, lit(TokenSeqLen.toLong)))
    val assigned = ffdAssign(s,
      ids.select("doc_id", "bucket", "n_tokens", "n_eff"),
      TokenSeqLen.toLong)
    assigned
      .join(ids.select(col("doc_id"), col("token_ids")), "doc_id")
      .withColumn("ids_doc", concat(
        slice(col("token_ids"), lit(1), (col("n_eff") - 1L).cast("int")),
        array(lit(BpeEosId))))
      .groupBy("bucket", "seq")
      .agg(count(lit(1)).as("n_docs"),
        sort_array(collect_list(struct(col("step"), col("ids_doc"))))
          .as("a"))
      .withColumn("real_ids",
        flatten(expr("transform(a, x -> x.ids_doc)")))
      .withColumn("n_real", size(col("real_ids")).cast("long"))
      .withColumn("n_pad", lit(TokenSeqLen.toLong) - col("n_real"))
      .withColumn("ids_md5", md5(concat_ws(",",
        concat(col("real_ids"),
          array_repeat(lit(BpePadId), col("n_pad").cast("int")))
          .cast("array<string>"))))
      .select(col("bucket"), col("seq"), col("n_docs"),
        col("n_real"), col("n_pad"), col("ids_md5"))
  }

  /** The shared packing geometry of the persisted pack state — the same
    * constants pack_best_fit_tokens packs with, pinned into the state's
    * manifest so a geometry change can never silently mix rows. */
  private def packParams: graft.operators.PackState.Params =
    graft.operators.PackState.Params(
      TokenSeqLen, BpeEosId, BpePadId, PackBuckets,
      closeBelow = PackCloseBelow)

  /** Build-and-persist the two-drop pack state once per testdata dir
    * ([[graft.util.ArtifactCache]]): tokenize (az BPE, the
    * pack_best_fit_tokens alphabet), pack drop 1 (even doc_ids) into a
    * fresh state, then drop 2 continuing drop 1's open bins — the
    * pipeline_drop_pack entry then just reads training rows. */
  private def ensurePackState(s: SparkSession, dir: String): String =
    graft.util.ArtifactCache.ensure(
      java.nio.file.Paths.get(dir, "documents.parquet"),
      "graft-packstate2", "manifest-v2") { staging =>
      val ids = tokenIdsOf(s, dir, learnBpeMergesCached(s, dir))
      graft.operators.PackState.pack(s, staging,
        ids.filter(col("doc_id") % 2 === 0), "drop-1", packParams)
      graft.operators.PackState.pack(s, staging,
        ids.filter(col("doc_id") % 2 === 1), "drop-2", packParams)
      ()
    }

  /** [[ensurePackState]]'s CURATED twin (pipeline_drop_train): each
    * drop's ids pass the full drop_curate derivation
    * ([[Dedup.curatedDropIds]] — gated admission + registry n-gram +
    * semantic decontamination) before packing. Keyed by the whole
    * testdata dir (the curation reads documents AND embeddings). */
  private def ensureCuratedPackState(s: SparkSession, dir: String): String =
    graft.util.ArtifactCache.ensure(
      java.nio.file.Paths.get(dir),
      "graft-packstatec2", "manifest-v2") { staging =>
      val ids = tokenIdsOf(s, dir, learnBpeMergesCached(s, dir))
      graft.operators.PackState.pack(s, staging,
        ids.join(Dedup.curatedDropIds(s, dir, 0), Seq("doc_id")),
        "drop-1", packParams)
      graft.operators.PackState.pack(s, staging,
        ids.join(Dedup.curatedDropIds(s, dir, 1), Seq("doc_id")),
        "drop-2", packParams)
      ()
    }

  /** One drop's SCRUBBED token ids (round 16 — the treatment composed
    * INTO the loop): the drop's curated documents pass
    * [[graft.operators.DedupState.spanScrub]] against the drop's
    * PRE-drop state (empty for drop 1 — a token-identity, since the
    * a-z tokenizer is whitespace-invariant and an empty state cuts
    * nothing), and the SCRUBBED text is tokenized. This is where the
    * ExactSubstr treatment (Lee et al. 2022) actually pays off: the
    * packer ships training rows with cross-drop repeated spans CUT,
    * instead of computing the scrub and shipping the boilerplate
    * anyway. Docs scrubbed to zero tokens yield no words and drop out
    * of the pack, exactly like word-less originals. */
  private def scrubbedCuratedIds(
      s: SparkSession, dir: String, which: Int,
      merges: Seq[(Long, String, String, String, Long)]): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .join(Dedup.curatedDropIds(s, dir, which), Seq("doc_id"))
      .select("doc_id", "text")
    val pre =
      if (which == 0) graft.operators.DedupState.empty
      else Dedup.gatedStateHandle(s, dir)
    val scrubbed = graft.operators.DedupState.spanScrub(s, pre, docs)
      .select(col("doc_id"), col("scrubbed_text").as("text"))
    tokenIdsOfDocs(scrubbed, merges)
  }

  /** [[ensureCuratedPackState]]'s SCRUBBED twin
    * (pipeline_drop_train_scrubbed): each drop packs the span-scrubbed
    * curated text. */
  private def ensureScrubbedPackState(s: SparkSession, dir: String): String =
    graft.util.ArtifactCache.ensure(
      java.nio.file.Paths.get(dir),
      // prefix bumped r17: the scrub composed into this state became
      // phase-independent (stride-1 probe) — cached states built under
      // the aligned-only scrub would disagree with the new oracle
      "graft-packstates2", "manifest-v2") { staging =>
      val merges = learnBpeMergesCached(s, dir)
      graft.operators.PackState.pack(s, staging,
        scrubbedCuratedIds(s, dir, 0, merges), "drop-1", packParams)
      graft.operators.PackState.pack(s, staging,
        scrubbedCuratedIds(s, dir, 1, merges), "drop-2", packParams)
      ()
    }

  /** corpus_gini in the DISTRIBUTED-RANK form: global ranks i over
    * (n, source) computed by range-partitioning on the sort key (range
    * partition order IS key order), ranking WITHIN partitions in
    * parallel, and adding per-partition row-count offsets. The only
    * unpartitioned window left runs over the partition-count-sized
    * offsets relation (≤ spark.sql.shuffle.partitions rows — bounded by
    * cluster config, never by source cardinality). Values are identical
    * to the single-window form, so the bit-exact oracle is unchanged. */
  private[graft] def corpusGiniOf(d: DataFrame): DataFrame = {
    val counts = d.groupBy("source").agg(count(lit(1)).as("n"))
    val parts = counts.repartitionByRange(col("n"), col("source"))
      .withColumn("pid", spark_partition_id())
    val wLocal = Window.partitionBy("pid").orderBy(col("n"), col("source"))
    val local = parts
      .withColumn("rn", row_number().over(wLocal).cast("long"))
    val wOff = Window.orderBy("pid")
    val offsets = local.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .withColumn("offset", coalesce(sum(col("cnt")).over(
        wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("k", sum(col("cnt")).over(
        wOff.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    local.join(broadcast(offsets), "pid")
      .withColumn("i", col("rn") + col("offset"))
      .agg(max(col("k")).as("n_sources"), sum(col("n")).as("n_docs"),
        sum(col("n") * (col("i") * 2L - col("k") - 1L)).as("num"))
      .select(col("n_sources"), col("n_docs"),
        (col("num").cast("double") /
          (col("n_sources") * col("n_docs")).cast("double")).as("gini"))
  }
  private[graft] val KllQuantiles =
    Seq(0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99)
  private val KllLabels =
    Seq("p01", "p05", "p25", "p50", "p75", "p95", "p99")
  private val SampleFixedN = 60 // sample_fixed: global sample size
  private val TokenBudgetPerLang = 2500 // sample_token_budget: tokens/lang
  // DSIR (Xie et al. 2023, "Data Selection for Language Models via
  // Importance Resampling"): hashed n-gram feature space size B. The
  // paper uses 10k buckets; 4096 keeps the λ table a single broadcast
  // page while the md5-16-bit bucket stays near-uniform over it.
  private[graft] val DsirBuckets = 4096
  private[graft] val DsirTargetLang = "en" // target-domain proxy corpus
  private val SampleImportanceN = 80 // sample_importance: docs resampled
  private val BpeMerges = 8 // train_bpe: merge rounds learned
  private val BpeMaxWordLen = 16 // train_bpe: word-length bound on the vocab
  // token-id scheme (tokenize_bpe_ids / pack_token_sequences): the base
  // alphabet 'a'..'z' owns ids 0..25, merge round k's output token owns
  // 25+k (merge order IS the id order, the GPT-2 byte-alphabet-then-merges
  // convention), and the two specials sit at the fixed end of the id
  // space — fixed because they derive from the BpeMerges CONSTANT, not
  // the learned merge count, so an early-exhausted trainer still yields
  // the same special ids and the oracle agrees without knowing how many
  // rounds actually ran.
  private val BpeEosId = 26 + BpeMerges // end-of-document separator token
  private val BpePadId = 27 + BpeMerges // tail-sequence padding token
  // BYTE-alphabet id scheme (the *_bytes family): base ids 0..255 ARE the
  // byte values (GPT-2's byte-alphabet property — no input is ever
  // out-of-alphabet, so digits/punctuation/case/non-Latin all tokenize),
  // merge round k owns 255 + k, specials at the fixed end of the id space
  // (derived from the BpeMerges CONSTANT, like the a-z family's).
  private val BpeByteEosId = 256 + BpeMerges // end-of-document separator
  private val BpeBytePadId = 257 + BpeMerges // tail-sequence padding
  /** The RESERVED special-token id block of the byte families, ABOVE the
    * merge space: merges own 256..255+[[BpeMerges]], and the next 16 ids
    * are specials — the first two are the established EOS/PAD framing
    * ids (positions unchanged), then BOS/UNK/MASK, then unnamed reserved
    * slots a deployment may claim. Encoders can NEVER emit an id in the
    * block (base ids < 256, merge ids ≤ 255 + BpeMerges), decode REJECTS
    * them (framing is not content), and pack/unpack treat EOS/PAD as
    * sequence structure — the alphabet-blind pack/decode discipline the
    * Gpt2TokenizerSpec round-trips. Fixed-end ids: derived from the
    * BpeMerges CONSTANT, so an early-exhausted trainer still yields the
    * same specials and the oracle agrees without knowing how many rounds
    * ran. */
  val ByteSpecialTokens: Map[String, Int] = Map(
    "eos" -> BpeByteEosId,
    "pad" -> BpeBytePadId,
    "bos" -> (258 + BpeMerges),
    "unk" -> (259 + BpeMerges),
    "mask" -> (260 + BpeMerges))
  val ByteSpecialBlockEnd: Int = 256 + BpeMerges + 15 // inclusive
  private val TokenSeqLen = 128 // pack_token_sequences: ids per training row
  private val BpeBatchRounds = 3 // train_bpe_batched: super-rounds run
  private val BpeBatchK = 4 // train_bpe_batched: max merges applied per round
  private val BpeBatchCand = 12 // train_bpe_batched: candidate ranking window
  private val RareTf = 2 // text_rarity: corpus frequency ≤ this ⇒ rare
  private val CommonTf = 1000 // text_rarity: corpus frequency ≥ this ⇒ common
  private val PackBuckets = 32 // pack_sequences: independent pack streams
  // the persisted pack state's closed-bins threshold — deliberately > 2
  // (the always-semantics-free setting) so the gate EXERCISES the rule:
  // bins with rem < 8 retire between drops, and the seeded FFD oracle
  // mirrors the retirement with a -1 sentinel at the bin's seq position
  private val PackCloseBelow = 8
  private val PackBudget = 512 // pack_sequences: tokens per training sequence
  // fixed-point ln scales, shared with the streaming twins
  // (StreamOps.perplexityStream / classifyQualityStream) so the two tiers
  // can never quantize differently — reference THESE, never the literal
  private[graft] val NllScale = 1000000L // text_perplexity
  private[graft] val NbScale = 1000000L // classify_quality_nb
  private val NbStopPct = 6 // classify_quality_nb: weak-label stop-ratio %
  private val CmDepth = 3 // text_vocab_sketch: hash rows
  private val CmWidth = 1024 // text_vocab_sketch: buckets per row
  // text_heavy_hitters: MG capacity vs report threshold. Guarantee needs
  // capacity+1 > divisor (survivor bound n/1025 < threshold n/512).
  private val HhCapacity = 1024
  private val HhDivisor = 512
  // text_keyword_scan: the watch-list (substring semantics, overlapping
  // occurrences counted — e.g. "stream" matches inside "streaming").
  // Sorted so keyword id = list position = oracle VALUES order.
  private val ScanKeywords = Seq("data", "log", "merge", "stream", "vector")

  // search_tfidf: the literal query-term set (present in the synthetic
  // corpus; any term set works — the plan shape is term-count-independent)
  private val SearchTerms = Seq("vector", "stream", "window", "merge")

  /** The search_tfidf DuckDB mirror — shared verbatim by the persisted-
    * index twin (identical arithmetic from precomputed postings). */
  private lazy val SearchTfidfSql: String =
    s"""WITH tok AS (SELECT doc_id,
         |    unnest(string_split_regex(text, '\\s+')) AS tok
         |  FROM documents WHERE text IS NOT NULL),
         |tf AS (SELECT doc_id, tok, count(*) AS cnt FROM tok
         |  WHERE tok IN (${SearchTerms.map(t => s"'$t'").mkString(", ")})
         |  GROUP BY 1, 2),
         |nn AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL),
         |idf AS (SELECT tok,
         |    CAST(floor(ln(n * 1.0 / count(DISTINCT doc_id)) * 1000000)
         |      AS BIGINT) AS idf_q6
         |  FROM tf, nn GROUP BY tok, n),
         |sc AS (SELECT doc_id, CAST(sum(cnt * idf_q6) AS BIGINT) AS score
         |  FROM tf JOIN idf USING (tok) GROUP BY 1)
         |SELECT doc_id, score FROM sc
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin


  /** The search_bm25 DuckDB mirror — Robertson idf + the PINNED
    * saturation parenthesization (see SearchIndex.searchBm25: every
    * non-ln operand is an exact integer in IEEE doubles, so matching the
    * expression tree verbatim makes both engines fold identical bits). */
  private lazy val SearchBm25Sql: String =
    s"""WITH tok AS (SELECT doc_id,
       |    unnest(string_split_regex(text, '\\s+')) AS tok
       |  FROM documents WHERE text IS NOT NULL),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
       |  FROM tok GROUP BY 1),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    (SELECT CAST(count(*) AS DOUBLE) FROM tok)
       |      / CAST(count(*) AS DOUBLE) AS avgdl
       |  FROM documents WHERE text IS NOT NULL),
       |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt FROM tok
       |  WHERE tok IN (${SearchTerms.map(t => s"'$t'").mkString(", ")})
       |  GROUP BY 1, 2),
       |idf AS (SELECT tok,
       |    CAST(floor(ln((((CAST(n AS DOUBLE)
       |        - CAST(count(DISTINCT doc_id) AS DOUBLE)) + 0.5)
       |      / (CAST(count(DISTINCT doc_id) AS DOUBLE) + 0.5)) + 1.0)
       |      * 1000000) AS BIGINT) AS idf_q6
       |  FROM tf, nn GROUP BY tok, n),
       |sc AS (SELECT tf.doc_id,
       |    CAST(sum(CAST(floor(CAST(idf_q6 AS DOUBLE) *
       |      ((CAST(cnt AS DOUBLE) * 2.2) /
       |       (CAST(cnt AS DOUBLE) + (1.2 * (0.25 +
       |         (0.75 * (CAST(dl.dl AS DOUBLE) / nn.avgdl)))))))
       |      AS BIGINT)) AS BIGINT) AS score
       |  FROM tf JOIN idf USING (tok) JOIN dl USING (doc_id), nn
       |  GROUP BY 1)
       |SELECT doc_id, score FROM sc
       |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  // search_phrase: the literal phrase (adjacent in-order tokens; present
  // ~48× in the synthetic corpus — any phrase works, the plan shape is
  // length-independent)
  private val PhraseTerms = Seq("table", "hash")

  /** The search_phrase DuckDB mirror: the k-way adjacency self-join over
    * token positions — one join per phrase gap, counting start positions
    * (overlapping matches count, exactly like the engine's fold). */
  private lazy val SearchPhraseSql: String = {
    val joins = PhraseTerms.zipWithIndex.tail.map { case (t, i) =>
      s"JOIN (SELECT doc_id, pos FROM tok WHERE tok = '$t') o$i\n" +
        s"  ON o$i.doc_id = o0.doc_id AND o$i.pos = o0.pos + $i"
    }.mkString("\n  ")
    s"""WITH tok AS (SELECT doc_id,
       |    unnest(string_split_regex(text, '\\s+')) AS tok,
       |    generate_subscripts(string_split_regex(text, '\\s+'), 1) AS pos
       |  FROM documents WHERE text IS NOT NULL),
       |sc AS (SELECT o0.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
       |  FROM (SELECT doc_id, pos FROM tok
       |    WHERE tok = '${PhraseTerms.head}') o0
       |  $joins
       |  GROUP BY 1)
       |SELECT doc_id, n_occurrences FROM sc
       |ORDER BY n_occurrences DESC, doc_id LIMIT 20""".stripMargin
  }

  private val MinColloc = 5 // text_collocations: min bigram count

  private def toks(c: Column): Column = split(c, "\\s+")

  /** The Naive-Bayes quality model's three relations from per-(doc, token)
    * counts: weak labels, per-token fixed-point weights, and the class
    * prior — factored so the batch query and the streaming per-row twin
    * ([[nbQualityModelTable]]) can never train differently. */
  private def nbModelParts(
      docTok: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val docLab = docTok.groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        sum(when(col("token").isin(Stopwords: _*), col("c"))
          .otherwise(lit(0L))).as("n_stop"))
      .withColumn("label",
        (col("n_stop") * 100 >= col("n_tokens") * NbStopPct).cast("int"))
      .select("doc_id", "n_tokens", "label")
    val cls = docTok.join(docLab.select("doc_id", "label"), Seq("doc_id"))
      .groupBy("token")
      .agg(sum(when(col("label") === 1, col("c")).otherwise(lit(0L)))
          .as("c1"),
        sum(when(col("label") === 0, col("c")).otherwise(lit(0L)))
          .as("c0"))
    val tot = cls.agg(sum(col("c1")).as("n1"), sum(col("c0")).as("n0"),
      count(lit(1)).as("v"))
    val weights = cls.crossJoin(tot)
      .select(col("token"),
        floor((log((col("c1") + 1).cast("double")
            / (col("n1") + col("v")).cast("double"))
          - log((col("c0") + 1).cast("double")
            / (col("n0") + col("v")).cast("double")))
          * NbScale).cast("long").as("w"))
    val prior = docLab
      .agg(sum(col("label")).as("d1"),
        sum(lit(1) - col("label")).as("d0"))
      .select(floor((log((col("d1") + 1).cast("double"))
          - log((col("d0") + 1).cast("double")))
        * NbScale).cast("long").as("prior"))
    (docLab, weights, prior)
  }

  /** Build-and-save the persisted lexical index once per corpus dir
    * (corpus-fingerprint keyed, staging + atomic rename — the shared
    * artifact-cache discipline). */
  private val loadedIndexCache = new java.util.concurrent.ConcurrentHashMap[
    String, Memo[graft.operators.SearchIndex]]()

  /** The persisted index, built if absent AND loaded once per corpus —
    * the serving entries' contract (a query tier loads an index once and
    * serves many queries; re-listing the postings and re-reading meta per
    * query was pure overhead, ~0.5 s/query at sf1). Keyed by the corpus
    * fingerprint like every in-process memo, so an overwritten corpus
    * re-loads; maintenance (appendDocs/compact) invalidates via the same
    * fingerprint change or a fresh process — the entries here query
    * static corpora by construction. */
  private def loadSearchIndex(
      s: SparkSession, dir: String): graft.operators.SearchIndex =
    corpusKey(dir) match {
      case Some(key) =>
        loadedIndexCache.keySet.removeIf(k =>
          k.startsWith(s"$dir|") && k != key)
        loadedIndexCache.computeIfAbsent(key, _ => new Memo(() =>
          graft.operators.SearchIndex.load(s, ensureSearchIndex(s, dir))))
          .value
      case None =>
        graft.operators.SearchIndex.load(s, ensureSearchIndex(s, dir))
    }

  private def ensureSearchIndex(s: SparkSession, dir: String): String =
    synchronized {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val ck = corpusKey(dir).getOrElse(s"$dir|nofp")
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(ck.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      // searchidx4: the round-10 meta layout (doc_min/doc_max for the
      // appendDocs overlap guard) atop the round-9 batch-manifest layout
      // (dl + positional postings, meta commit markers, no precomputed
      // idf) — the bumped prefix orphans any cached prior-layout index
      // instead of misreading it
      val base = Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft-searchidx4-$key")
      if (Files.isDirectory(base.resolve("postings"))) return base.toString
      val staging = Paths.get(
        base.toString + ".build-" +
          java.util.UUID.randomUUID().toString.take(8))
      graft.operators.SearchIndex.build(
        Tables(s, dir, "documents").select(col("doc_id"), col("text")))
        .save(staging.toString, fingerprint = Some(ck))
      try Files.move(staging, base, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case e @ (_: java.nio.file.FileAlreadyExistsException |
            _: java.nio.file.DirectoryNotEmptyException |
            _: java.nio.file.AccessDeniedException) =>
          graft.storage.ParquetLogBackend.deleteRecursively(staging)
          // "lost the race" is only true if the winner's copy exists —
          // a genuine permission failure must surface, not masquerade as
          // a cache hit pointing at a path that was never created
          if (!Files.isDirectory(base.resolve("postings"))) throw e
      }
      base.toString
    }

  /** The add-1 smoothed bigram NLL model from per-(doc, bigram) counts —
    * factored so the batch text_perplexity_bigram and the streaming
    * per-row scorer ([[bigramNllTable]]) can never train differently. */
  private def bigramNllModel(d: DataFrame, dbg: DataFrame): DataFrame = {
    val cnt = dbg.groupBy("bg").agg(sum(col("c")).as("cbg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val w1tot = cnt.groupBy("w1").agg(sum(col("cbg")).as("cw1"))
    val vocab = d.select(explode(toks(col("text"))).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    cnt.join(w1tot, "w1").crossJoin(vocab)
      .select(col("bg"),
        floor(-log((col("cbg") + 1).cast("double")
          / (col("cw1") + col("v")).cast("double")) * NllScale)
          .cast("long").as("nll_bg"))
  }

  /** Train the bigram LM on `dir`'s corpus and pack it for per-row
    * streaming inference ([[graft.exprs.BigramNllScore]]): bigram →
    * fixed-point NLL, capped to the `topK` most frequent bigrams (the
    * tail is rare by construction; unseen bigrams score 0, mirroring the
    * batch inner join that only scores SEEN bigrams). */
  def bigramNllTable(
      s: SparkSession, dir: String,
      topK: Int = 1 << 18): graft.exprs.BigramNllTable = {
    val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
    val dbg = d.select(col("doc_id"), toks(col("text")).as("a"))
      .filter(size(col("a")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(a) - 1), i -> concat(a[i-1], ' ', a[i]))"))
        .as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
    val withFreq = bigramNllModel(d, dbg)
      .join(dbg.groupBy("bg").agg(sum(col("c")).as("cbg")), "bg")
    val map = new java.util.HashMap[String, java.lang.Long]()
    // collect topK+1 rows: the extra row is pure truncation DETECTION —
    // without it a vocab exactly at / beyond the cap would silently void
    // the "one threshold governs both tiers" bit-parity contract
    val rows = withFreq.orderBy(col("cbg").desc, col("bg")).limit(topK + 1)
      .select("bg", "nll_bg").collect()
    if (rows.length > topK)
      warnTruncated("bigramNllTable", topK,
        "streaming avg_nll diverges from batch for documents whose " +
          "bigrams fell outside the cap")
    rows.take(topK)
      .foreach(r => map.put(r.getString(0), java.lang.Long.valueOf(r.getLong(1))))
    new graft.exprs.BigramNllTable(map)
  }

  /** Hashed n-gram features of every document, one row per OCCURRENCE:
    * whitespace unigrams + adjacent bigrams (the text_perplexity_bigram
    * key — two tokens joined with one space), bucketed into
    * [[DsirBuckets]] by the first 16 bits of md5 (first 4 hex chars, the
    * same content-independent hash family every sampler here uses). This
    * is the DSIR feature map: the hashing trick keeps the model a FIXED
    * B-row table no matter the corpus vocabulary. */
  private def dsirFeatures(d: DataFrame): DataFrame =
    // ONE corpus scan: unigrams and bigrams concatenate into a single
    // exploded array instead of a two-leg unionAll (which scanned and
    // re-tokenized the corpus twice per feature pass — round 17). The
    // guard keeps sequence() away from size(a) < 2 (sequence(1, 0) would
    // DESCEND, not return empty). Feature multiset is unchanged, so every
    // downstream aggregate — and the oracle — is untouched.
    Tables.spread(d.filter(col("text").isNotNull))
      .select(col("doc_id"), col("lang"), toks(col("text")).as("a"))
      .select(col("doc_id"), col("lang"), explode(expr(
        "concat(a, if(size(a) >= 2, transform(sequence(1, size(a) - 1)," +
          " i -> concat(a[i-1], ' ', a[i])), array()))")).as("ng"))
      .select(col("doc_id"), col("lang"),
        (conv(substring(md5(col("ng")), 1, 4), 16, 10).cast("long")
          % DsirBuckets).as("b"))

  /** DSIR importance model from a feature relation: per bucket, the
    * fixed-point log ratio λ_b = ⌊ln(p̂_target(b) / p̂_raw(b))·S⌋ with
    * add-1 smoothing over the B-bucket space (target = the
    * [[DsirTargetLang]] slice — a stand-in for "Wikipedia/books"; raw =
    * the whole corpus). Parenthesization of the double math is pinned
    * verbatim in the DuckDB oracle; the single ln is floor-quantized to
    * [[NllScale]] fixed point, so every downstream sum is exact BIGINT
    * (the text_perplexity discipline — same ~1-ulp boundary caveat).
    * B rows out — kilobytes at ANY corpus size, always broadcastable. */
  private def dsirLambdaOf(feats: DataFrame): DataFrame = {
    // ONE feature pass builds the whole model (round 17): raw and target
    // counts come from the same groupBy (ct = conditional sum ≡ the count
    // of the filtered leg, buckets without target features naturally 0),
    // and the totals aggregate the B-row bucket table — every feature
    // lands in exactly one bucket, so sum(cr)/sum(ct) ≡ the global
    // counts, exact BIGINT. Previously rawc/tgtc/tot were three separate
    // corpus-scale passes over `feats`. λ arithmetic is bit-identical.
    val bucket = feats.groupBy("b").agg(count(lit(1)).as("cr"),
      sum(when(col("lang") === DsirTargetLang, 1L).otherwise(0L)).as("ct"))
    val tot = bucket.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    bucket.crossJoin(tot)
      .select(col("b"),
        floor(log(((col("ct") + 1).cast("double")
            * (col("nr") + lit(DsirBuckets.toLong)))
          / ((col("cr") + 1).cast("double")
            * (col("nt") + lit(DsirBuckets.toLong)))) * NllScale)
          .cast("long").as("lam"))
  }

  /** Per-document DSIR log-importance weights: each feature occurrence
    * broadcast-joins its bucket's λ and the doc sums them — exact BIGINT.
    * One corpus scan (features), two bucket-sized aggregates (the model),
    * one doc-keyed aggregate (the scores). */
  private def dsirWeightsOf(d: DataFrame): DataFrame = {
    val feats = dsirFeatures(d)
    feats.join(broadcast(dsirLambdaOf(feats)), "b")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_feats"), sum(col("lam")).as("weight_scaled"))
  }

  /** Train the DSIR model on `dir`'s corpus and pack it for per-row
    * streaming inference ([[graft.exprs.DsirScoreExpr]]): a dense
    * bucket-indexed λ array (B entries — fixed size by construction, the
    * one model here with NO truncation cap to warn about). Buckets the
    * corpus never produced hold the Absent sentinel and score as the
    * batch inner join does: not at all. */
  def dsirTable(s: SparkSession, dir: String): graft.exprs.DsirScoreTable = {
    val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
    val lam = Array.fill(DsirBuckets)(graft.exprs.DsirScoreTable.Absent)
    dsirLambdaOf(dsirFeatures(d)).collect().foreach { r =>
      lam(r.getLong(0).toInt) = r.getLong(1)
    }
    new graft.exprs.DsirScoreTable(lam)
  }

  /** Model-cap truncation warning — the per-row streaming scorers promise
    * bit-parity with batch, which only holds while the whole model fits
    * under the collect cap; when it doesn't, say so at train time instead
    * of letting stream scores drift silently. */
  private def warnTruncated(what: String, topK: Int, consequence: String): Unit =
    org.slf4j.LoggerFactory.getLogger("graft.queries.TextAnalysis").warn(
      s"$what: model exceeds the topK=$topK cap and was TRUNCATED — $consequence; " +
        "raise topK (the collect is model-sized) or accept the documented divergence")

  /** Train the NB quality model on `dir`'s corpus and pack it for per-row
    * streaming inference ([[graft.exprs.NbQualityScore]]): token → weight
    * map capped to the `topK` largest-|w| tokens (model compression — the
    * tail of near-zero weights moves no prediction), plus the prior.
    * Vocab-sized collect by construction (≤ topK rows). */
  def nbQualityModelTable(
      s: SparkSession, dir: String,
      topK: Int = 1 << 16): graft.exprs.NbModelTable = {
    val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
    val docTok = d
      .select(col("doc_id"), explode(toks(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
    val (_, weights, prior) = nbModelParts(docTok)
    val map = new java.util.HashMap[String, java.lang.Long]()
    val rows = weights.orderBy(abs(col("w")).desc, col("token"))
      .limit(topK + 1).collect()
    if (rows.length > topK)
      warnTruncated("nbQualityModelTable", topK,
        "streaming NB scores diverge from batch for documents carrying " +
          "the dropped near-zero-weight tokens")
    rows.take(topK)
      .foreach(r => map.put(r.getString(0), java.lang.Long.valueOf(r.getLong(1))))
    new graft.exprs.NbModelTable(map, prior.head().getLong(0))
  }

  /** One greedy BPE merge step over a space-joined symbol string, via a
    * DOUBLED-separator encoding (tokens joined by two spaces): each
    * boundary belongs to both of its neighbours, so the pattern's trailing
    * space never consumes the next pair's leading one and a chain
    * 'a a a a' merges to 'aa aa' in one pass — exactly BPE's greedy
    * left-to-right non-overlapping merge. (A single-space replace would
    * silently skip every second chained occurrence.) Shared by train_bpe
    * and tokenize_bpe; the oracle SQL applies the identical encoding. */
  private[graft] def applyBpeMerge(syms: Column, l: String, r: String): Column = {
    val enc = concat(lit(" "), replace(syms, lit(" "), lit("  ")), lit(" "))
    trim(replace(replace(enc, lit(s" $l  $r "), lit(s" $l$r ")),
      lit("  "), lit(" ")))
  }

  /** train_bpe and tokenize_bpe share one training run per corpus within a
    * process (the bench/verify shape) — the in-process stand-in for
    * "persist train_bpe's table" in a production pipeline. Keyed on the
    * corpus files' name+size+mtime fingerprint
    * ([[graft.sources.GraftLogCache.corpusFingerprint]]), so an overwritten
    * documents.parquet — the specs' temp dirs — can never serve stale
    * merges; a corpus the local fingerprint can't see (remote fs) just
    * learns uncached. The catch covers ONLY the fingerprint I/O: a genuine
    * training failure must propagate once, not silently retrain. */
  /** Lazily-trained cache cell: computeIfAbsent installs only the cell
    * (cheap, per ConcurrentHashMap's short-mapping-function contract — the
    * map's bin lock is never held across a Spark job), and the training
    * runs under the cell's own lazy-val lock: same-corpus callers share
    * one run, different corpora never serialize on a shared hash bin. A
    * failed training propagates to its caller uncached (lazy vals retry
    * initialization), so errors surface once with the original trace. */
  private final class Memo[T](thunk: () => T) { lazy val value: T = thunk() }

  /** The corpus cache key: dir + documents-file fingerprint, or None when
    * the fingerprint is unreadable (remote fs) — the ONE derivation every
    * corpus-keyed cache (in-process memo, persisted BpeModel root) shares,
    * so the two paths can never key the same corpus differently. The
    * catch covers ONLY the fingerprint I/O. */
  private def corpusKey(dir: String): Option[String] =
    (try Some(graft.sources.GraftLogCache
      .corpusFingerprint(dir, "documents.parquet"))
    catch { case scala.util.control.NonFatal(_) => None })
      .map(f => s"$dir|$f")

  private def cachedByCorpus[T](
      cache: java.util.concurrent.ConcurrentHashMap[String, Memo[T]],
      s: SparkSession, dir: String)(train: (SparkSession, String) => T): T = {
    corpusKey(dir) match {
      case Some(key) =>
        // an overwritten corpus leaves its previous key dead — drop other
        // keys for the same dir so long-lived JVMs (bench loops, spec
        // temp-dir reuse) hold at most one merge table per corpus path
        cache.keySet.removeIf(k => k.startsWith(s"$dir|") && k != key)
        cache.computeIfAbsent(key, _ => new Memo(() => train(s, dir))).value
      case None => train(s, dir)
    }
  }

  // ---- staged intake drop (round 14) ----------------------------------
  // The boundary-composed intake entries (pipeline_intake_e2e /
  // pipeline_intake_report / corpus_report) read the corpus THROUGH a
  // staged JSONL.gz drop directory that also carries two FIXTURE shards
  // — one with IntakeBadLines malformed lines (the line-quarantine leg)
  // and one corrupt gzip (the file-quarantine leg) — so the composed
  // plan exercises, and accounts for, both failure paths with
  // oracle-pinnable constants. jsonl_roundtrip proves the boundary is
  // the identity on clean rows, so every downstream oracle keeps
  // running against the parquet `documents` table.
  private[queries] val IntakeBadLines = 3L // malformed lines in the fixture
  private[queries] val IntakeSkippedFiles = 1L // corrupt gzip shards
  private val IntakeCleanShards = 32 // gzip members for the clean corpus

  /** Stage (idempotently, corpus-fingerprint-keyed) the intake drop dir:
    * the documents table as [[IntakeCleanShards]] gzip JSONL shards plus
    * the two fixture shards. A `_INTAKE_READY` marker gates completeness
    * (written AFTER the fixtures — `_SUCCESS` alone would race a crash
    * between the corpus write and the fixture writes). */
  private[queries] def intakeShards(s: SparkSession, dir: String): String = {
    val key = corpusKey(dir).map { ck =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(ck.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
    }.getOrElse(java.util.UUID.randomUUID().toString.take(12))
    val root = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft-intake-$key")
    if (!java.nio.file.Files.exists(root.resolve("_INTAKE_READY"))) {
      graft.sources.CorpusJsonl.write(
        Tables(s, dir, "documents"), root.toString,
        shards = IntakeCleanShards)
      // line-quarantine fixture: IntakeBadLines malformed lines (two
      // parse errors + one id-less object)
      val badOut = new java.util.zip.GZIPOutputStream(
        java.nio.file.Files.newOutputStream(
          root.resolve("fixture-badlines.json.gz")))
      try badOut.write(
        ("{\"doc_id\": oops\n" +
          "not json at all\n" +
          "{\"text\": \"no id here\"}\n").getBytes("UTF-8"))
      finally badOut.close()
      // file-quarantine fixture: a .gz whose bytes are not gzip at all
      java.nio.file.Files.write(
        root.resolve("fixture-corrupt.json.gz"), Array.fill[Byte](256)(0x42))
      java.nio.file.Files.write(
        root.resolve("_INTAKE_READY"), Array.empty[Byte])
    }
    root.toString
  }

  private val mergeCache = new java.util.concurrent.ConcurrentHashMap[
    String, Memo[Seq[(Long, String, String, String, Long)]]]()

  private def learnBpeMergesCached(s: SparkSession, dir: String)
      : Seq[(Long, String, String, String, Long)] =
    cachedByCorpus(mergeCache, s, dir)(learnBpeMerges)

  private val byteMergeCache = new java.util.concurrent.ConcurrentHashMap[
    String, Memo[Seq[(Long, String, String, String, Long)]]]()

  private def learnBpeByteMergesCached(s: SparkSession, dir: String)
      : Seq[(Long, String, String, String, Long)] =
    cachedByCorpus(byteMergeCache, s, dir)((s2, d) =>
      trainBpeFastBytes(Tables(s2, d, "documents"), BpeMerges))

  private val pretokMergeCache = new java.util.concurrent.ConcurrentHashMap[
    String, Memo[Seq[(Long, String, String, String, Long)]]]()

  private def learnBpePretokMergesCached(s: SparkSession, dir: String)
      : Seq[(Long, String, String, String, Long)] =
    cachedByCorpus(pretokMergeCache, s, dir)((s2, d) =>
      trainFastOnWords(bpeByteWordTableOf(
        Tables(s2, d, "documents"), preTokWords), BpeMerges, 1 << 22))

  private val gpt2MergeCache = new java.util.concurrent.ConcurrentHashMap[
    String, Memo[Seq[(Long, String, String, String, Long)]]]()

  private def learnBpeGpt2MergesCached(s: SparkSession, dir: String)
      : Seq[(Long, String, String, String, Long)] =
    cachedByCorpus(gpt2MergeCache, s, dir)((s2, d) =>
      trainFastOnWords(bpeByteWordTableOf(
        Tables(s2, d, "documents").withColumn("text", gpt2Text),
        gpt2Words), BpeMerges, 1 << 22))

  /** The (freq, syms) word-frequency symbol table both BPE trainers start
    * from: distinct [a-z]+ words with corpus frequencies, symbols = the
    * space-joined character split. Vocab-sized, never corpus-sized. */
  private def bpeWordTable(s: SparkSession, dir: String): DataFrame =
    bpeWordTableOf(Tables(s, dir, "documents"))

  private def bpeWordTableOf(docs: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(explode(
        expr("regexp_extract_all(lower(text), '([a-z]+)', 1)")).as("word"))
      .filter(length(col("word")).between(2, BpeMaxWordLen))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms", concat_ws(" ",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")))
      .select("freq", "syms")

  /** Uppercase hex-pair symbol split of a word's UTF-8 bytes — the BYTE
    * alphabet's base symbols ("ab1" → "61 62 31", "中" → "E4 B8 AD").
    * Spark's hex() and DuckDB's hex() both render uppercase, so the
    * symbol STRINGS — which the merge machinery compares and
    * concatenates — are engine-identical. */
  private def byteSymsOf(word: Column): Column = {
    val h = hex(encode(word, "UTF-8"))
    concat_ws(" ", transform(
      sequence(lit(1), octet_length(word)),
      i => h.substr(i * 2 - 1, lit(2))))
  }

  /** BYTE-alphabet twin of [[bpeWordTableOf]]: raw tokens from `words`
    * (no lowercasing — case is in-alphabet), bound on BYTE length.
    * Mirrors [[byteWordTableCte]]. */
  private def bpeByteWordTableOf(
      docs: DataFrame, words: Column): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(explode(words).as("word"))
      .filter(octet_length(col("word")).between(2, BpeMaxWordLen))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("freq"), byteSymsOf(col("word")).as("syms"))

  private def bpeByteWordTableOf(docs: DataFrame): DataFrame =
    bpeByteWordTableOf(docs, split(col("text"), "\\s+"))

  /** The pre-tokenizer's word array — the Spark twin of
    * [[PreTokWordsSql]]. Built through the typed API (a SQL string
    * literal would re-interpret the backslashes). */
  private def preTokWords: Column =
    regexp_extract_all(col("text"), lit(PreTokSql), lit(0))

  /** The GPT-2-complete pre-tokenizer's word array over the `text`
    * column (callers feed it the contraction-derived corpus). */
  private def gpt2Words: Column =
    regexp_extract_all(col("text"), lit(Gpt2PreTokPat), lit(0))

  /** Adjacent-symbol pair counts weighted by word frequency — one tiny
    * shuffle over the vocab-sized table. Shared by both trainers. */
  private def bpePairCounts(cur: DataFrame): DataFrame = {
    val a = split(col("syms"), " ")
    cur
      .select(col("freq"), explode(zip_with(
        slice(a, lit(1), size(a) - 1), slice(a, lit(2), size(a) - 1),
        (x, y) => struct(x.as("l"), y.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("c"))
  }

  /** The BpeMerges training rounds — routed through the VOCAB-SCALE
    * trainer ([[trainBpeFast]]): Spark does the corpus-scale word-frequency
    * aggregate once, the merge decisions run driver-side with exact
    * delta-maintained pair counts. Bit-identical to the per-round Spark
    * trainer ([[trainBpeOn]], kept as the reference implementation) — the
    * parity is spec-pinned at 500+ merges (BpeFastTrainerSpec) AND
    * re-proven by the train_bpe oracle at every SF. Returns
    * (round, lhs, rhs, merged, pair_freq) in learned order. */
  private def learnBpeMerges(s: SparkSession, dir: String)
      : Seq[(Long, String, String, String, Long)] =
    trainBpeFast(Tables(s, dir, "documents"), BpeMerges)

  /** Vocab-scale BPE training over an arbitrary (…, text) DataFrame — the
    * library entry point a production tokenizer build uses. ONE Spark job
    * (the distinct-word frequency aggregate, corpus-scale, shuffled once)
    * feeds [[graft.operators.BpeTrainer]]'s driver-side incremental
    * trainer, so a 30k-merge vocabulary costs 30k in-process argmax
    * decisions instead of 30k Spark stage launches — the sequential
    * trainer's true bottleneck at production vocab sizes (SCALING.md).
    *
    * The collected word table is VOCAB-sized (distinct `[a-z]{2,}` words
    * with frequencies — the bounded-collect contract class of the model
    * tables, not corpus data). `maxVocab` caps it defensively: a cap hit
    * logs a loud warning and deterministically keeps the most frequent
    * words (freq DESC, syms ASC), because a silently truncated vocabulary
    * would train different merges than the Spark reference. */
  def trainBpeFast(docs: DataFrame, rounds: Int = BpeMerges,
      maxVocab: Int = 1 << 22): Seq[(Long, String, String, String, Long)] =
    trainFastOnWords(bpeWordTableOf(docs), rounds, maxVocab)

  /** BYTE-alphabet twin of [[trainBpeFast]]: same vocab-scale trainer
    * (BpeTrainer is alphabet-agnostic — it only sees symbol arrays), fed
    * the whitespace-word/UTF-8-hex-symbol table, so digits, punctuation,
    * case, and non-Latin text participate in training. */
  def trainBpeFastBytes(docs: DataFrame, rounds: Int = BpeMerges,
      maxVocab: Int = 1 << 22): Seq[(Long, String, String, String, Long)] =
    trainFastOnWords(bpeByteWordTableOf(docs), rounds, maxVocab)

  private def trainFastOnWords(base: DataFrame, rounds: Int,
      maxVocab: Int): Seq[(Long, String, String, String, Long)] = {
    var rows = base.limit(maxVocab + 1).collect()
    if (rows.length > maxVocab) {
      org.slf4j.LoggerFactory.getLogger("graft.queries.TextAnalysis").warn(
        s"trainBpeFast: distinct-word vocabulary exceeds maxVocab=$maxVocab " +
          "and was truncated to the most frequent words — the learned " +
          "merges may differ from an uncapped train; raise maxVocab " +
          "(the collect is vocab-sized) if driver memory allows")
      rows = base.orderBy(col("freq").desc, col("syms"))
        .limit(maxVocab).collect()
    }
    graft.operators.BpeTrainer.train(
      rows.map(r => (r.getLong(0), r.getString(1).split(" "))), rounds)
  }

  /** Per-round Spark BPE trainer — the REFERENCE implementation
    * [[trainBpeFast]] is spec-pinned against (each round: one pair-count
    * aggregate + a 1-row argmax collect + one materialization). Right when
    * the vocabulary itself is too large to collect; for everything else
    * prefer [[trainBpeFast]], which learns the identical merges without
    * per-round stage launches. */
  def trainBpeOn(docs: DataFrame, rounds: Int = BpeMerges)
      : Seq[(Long, String, String, String, Long)] =
    trainOnWords(bpeWordTableOf(docs), rounds)

  /** BYTE-alphabet twin of [[trainBpeOn]] — the per-round Spark reference
    * the byte fast trainer's parity spec pins against. */
  def trainBpeOnBytes(docs: DataFrame, rounds: Int = BpeMerges)
      : Seq[(Long, String, String, String, Long)] =
    trainOnWords(bpeByteWordTableOf(docs), rounds)

  private def trainOnWords(wordTable: DataFrame, rounds: Int)
      : Seq[(Long, String, String, String, Long)] = {
    val words = wordTable.cache()
    // Round k applies exactly ONE merge to round k-1's MATERIALIZED table
    // (localCheckpoint + release, the ConnectedComponents round pattern)
    // rather than replaying the whole replace chain over the base: without
    // it round k replans k-1 nested replaces — O(rounds²) string work and
    // an expression tree that outgrows codegen at a realistic merge count.
    var cur = words.toDF()
    var ckpt: DataFrame = null
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var exhausted = false
    for (round <- 1 to rounds if !exhausted) {
      val best = bpePairCounts(cur)
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) {
        // The corpus ran out of adjacent pairs (every vocab word fully
        // merged, or the eligible vocab was empty): stop with a shorter
        // merge table. The oracle truncates identically — its empty b_k
        // empties every later round's CTE chain.
        exhausted = true
      } else {
        val l = best(0).getString(0)
        val r = best(0).getString(1)
        merges += ((round.toLong, l, r, l + r, best(0).getLong(2)))
        val next = cur.withColumn("syms", applyBpeMerge(col("syms"), l, r))
          .localCheckpoint(true)
        if (ckpt != null) graft.operators.ConnectedComponents.release(ckpt)
        ckpt = next
        cur = next
      }
    }
    // Nothing consumes the symbol table after the loop — only the merge
    // list escapes — so the last round's checkpoint is releasable too.
    if (ckpt != null) graft.operators.ConnectedComponents.release(ckpt)
    words.unpersist()
    merges.result()
  }

  private val batchedMergeCache = new java.util.concurrent.ConcurrentHashMap[
    String, Memo[Seq[(Long, Long, String, String, String, Long)]]]()

  private def learnBpeBatchedCached(s: SparkSession, dir: String)
      : Seq[(Long, Long, String, String, String, Long)] =
    cachedByCorpus(batchedMergeCache, s, dir)(learnBpeBatched)

  /** Batched BPE trainer — the refinement SCALING.md prices: at a realistic
    * 32k-merge vocabulary the sequential trainer pays 32k tiny Spark rounds
    * of fixed stage-launch cost, so real trainers learn several merges per
    * round. Per super-round: rank pairs by (freq DESC, l, r), keep the
    * CONFLICT-FREE PREFIX of the top-[[BpeBatchCand]] candidates — a
    * candidate survives iff it shares NO symbol with ANY higher-ranked
    * candidate (selected or not; the rule must not depend on selection
    * order, so engine and oracle compute it identically as a rank-window
    * anti-join) — and apply up to [[BpeBatchK]] survivors in rank order.
    * APPLICATION ORDER IS SEMANTIC: the conflict rule only makes survivors
    * disjoint as COUNTED — a merge's output symbol can still feed a later
    * survivor's occurrences (e.g. (ab,a) creating fresh 'aba' runs that an
    * (x,aba) merge then consumes) — so both engine and oracle fold the
    * survivors in rank order within ONE materialization per round, and
    * pair_freq records each pair's pre-round count, not the applied count.
    * Driver rounds still drop ~K-fold, the point of batching. Rank-1
    * always survives (vacuous prefix), so round 1's first merge equals the
    * sequential trainer's first merge; later picks may diverge from
    * sequential greedy BPE where a merge would have changed the ranking —
    * the standard batching trade, here made deterministic and mirrored
    * exactly by the oracle. Returns (round, seq, lhs, rhs, merged, freq). */
  private def learnBpeBatched(s: SparkSession, dir: String)
      : Seq[(Long, Long, String, String, String, Long)] = {
    val words = bpeWordTable(s, dir).cache()
    var cur = words.toDF()
    var ckpt: DataFrame = null
    val out = Seq.newBuilder[(Long, Long, String, String, String, Long)]
    var seq = 0L
    var exhausted = false
    for (round <- 1 to BpeBatchRounds if !exhausted) {
      // bounded collect: the candidate window IS the batch decision, the
      // same contract as the sequential trainer's 1-row argmax
      val cand = bpePairCounts(cur)
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(BpeBatchCand).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val keep = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
      for (i <- cand.indices if keep.size < BpeBatchK) {
        val (l, r, _) = cand(i)
        val clear = (0 until i).forall { j =>
          val (l2, r2, _) = cand(j)
          l2 != l && l2 != r && r2 != l && r2 != r
        }
        if (clear) keep += cand(i)
      }
      if (keep.isEmpty) {
        // no adjacent pairs left anywhere: nothing a later round could
        // find either (merging only removes pairs), stop like the oracle's
        // naturally-empty CTE chain does
        exhausted = true
      } else {
        for ((l, r, c) <- keep) {
          seq += 1
          out += ((round.toLong, seq, l, r, l + r, c))
        }
        val next = keep
          .foldLeft(cur)((df, m) =>
            df.withColumn("syms", applyBpeMerge(col("syms"), m._1, m._2)))
          .localCheckpoint(true)
        if (ckpt != null) graft.operators.ConnectedComponents.release(ckpt)
        ckpt = next
        cur = next
      }
    }
    if (ckpt != null) graft.operators.ConnectedComponents.release(ckpt)
    words.unpersist()
    out.result()
  }

  /** Per-document token-id SEQUENCES — the artifact a training job consumes
    * (tokenize_bpe stops at counts; this emits the ids, in document order).
    *
    * Scale shape, same discipline as tokenize_bpe: the merge chain runs
    * over the DISTINCT-word vocabulary (vocab-sized, never corpus-sized),
    * the word → id-array table is broadcast (megabytes at any corpus
    * size), and the corpus-scale work is one (doc_id, pos, word) explode
    * joined against that broadcast plus one doc_id re-group — shuffle
    * volume ≈ the tokenized corpus itself (~4 B/token), paid exactly once,
    * which is the floor for materializing token ids at all. Word order is
    * preserved via posexplode position, restored with a per-doc
    * sort_array over (pos, ids) structs — a per-group sort of an
    * already-partitioned aggregate, not a global sort. */
  private def tokenIdsOf(s: SparkSession, dir: String,
      merges: Seq[(Long, String, String, String, Long)]): DataFrame =
    tokenIdsOfDocs(Tables(s, dir, "documents"), merges)

  /** [[tokenIdsOf]] over a caller-supplied documents relation (the
    * boundary-composed intake tokenizes the JSONL read-back corpus). */
  private def tokenIdsOfDocs(docs: DataFrame,
      merges: Seq[(Long, String, String, String, Long)]): DataFrame = {
    val ow = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), posexplode(
        expr("regexp_extract_all(lower(text), '([a-z]+)', 1)"))
        .as(Seq("pos", "word")))
    // FUSED vocabulary encode ([[graft.exprs.BpeEncodeIds]]): the whole
    // merge table rides the plan as ONE codegen reference object, so plan
    // depth is CONSTANT in vocab size — the per-merge column-rewrite chain
    // this replaces grew two nested `replace` expressions per learned
    // merge, which at a production 30k-merge vocab outgrows codegen (and
    // the analyzer) long before the data does. Same ids bit-for-bit: the
    // kernel replays applyBpeMerge's doubled-space round semantics and the
    // first-round-wins id scheme (BpeKernelParitySpec pins chain-vs-kernel
    // equality at hundreds of synthetic merges; the streaming twin already
    // encoded this way — batch and stream now share the one kernel).
    val wids = ow.select("word").distinct()
      .select(col("word"),
        graft.exprs.functions.bpe_encode_ids(col("word"), merges).as("ids"))
    ow.join(broadcast(wids), "word")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("pos"), col("ids")))).as("a"))
      .select(col("doc_id"),
        flatten(expr("transform(a, x -> x.ids)")).as("token_ids"))
  }

  /** Per-document token COUNTS via the same broadcast vocab encode
    * (round 17): Σ size(word ids) over the word stream — equal to
    * size(token_ids) by construction (flatten preserves element count,
    * and a doc with no extractable words is absent from both relations)
    * — WITHOUT materializing or regrouping the id arrays. The drop
    * ledger's pack sums only need lengths, and the collect_list +
    * sort_array + flatten regroup was its single most expensive stage. */
  private def tokenCountsOf(docs: DataFrame,
      merges: Seq[(Long, String, String, String, Long)]): DataFrame = {
    val ow = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(
        expr("regexp_extract_all(lower(text), '([a-z]+)', 1)")).as("word"))
    val wids = ow.select("word").distinct()
      .select(col("word"), size(
        graft.exprs.functions.bpe_encode_ids(col("word"), merges)).as("n"))
    ow.join(broadcast(wids), "word")
      .groupBy("doc_id")
      .agg(sum(col("n")).cast("long").as("n_ids"))
  }

  /** BYTE-alphabet twin of [[tokenIdsOf]]: raw whitespace words (empties
    * dropped — split emits them at text edges), the byte-mode fused
    * kernel over the distinct vocabulary, same broadcast-join/regroup
    * scale shape. EVERY word is encodable regardless of the trainer's
    * length bound — base ids cover all 256 byte values, so unseen or
    * over-long words fall back toward per-byte ids instead of dropping
    * (the property the a-z family could not have). */
  private def tokenIdsOfBytes(s: SparkSession, dir: String,
      merges: Seq[(Long, String, String, String, Long)]): DataFrame =
    tokenIdsOfByteWords(s, dir, split(col("text"), "\\s+"),
      graft.exprs.functions.bpe_encode_byte_ids(_, merges))

  /** [[tokenIdsOfBytes]] with the production pre-tokenizer's word
    * source + encoder (category-split runs, same byte id scheme). */
  private def tokenIdsOfPretok(s: SparkSession, dir: String,
      merges: Seq[(Long, String, String, String, Long)]): DataFrame =
    tokenIdsOfByteWords(s, dir, preTokWords,
      graft.exprs.functions.bpe_encode_pretok_ids(_, merges))

  /** [[tokenIdsOfPretok]] upgraded to the GPT-2-complete pre-tokenizer,
    * over the contraction-derived corpus ([[gpt2Text]]). */
  private def tokenIdsOfGpt2(s: SparkSession, dir: String,
      merges: Seq[(Long, String, String, String, Long)]): DataFrame =
    tokenIdsOfByteWordDocs(
      Tables(s, dir, "documents").withColumn("text", gpt2Text),
      gpt2Words,
      graft.exprs.functions.bpe_encode_gpt2_ids(_, merges))

  private def tokenIdsOfByteWords(s: SparkSession, dir: String,
      words: Column, encode: Column => Column): DataFrame =
    tokenIdsOfByteWordDocs(Tables(s, dir, "documents"), words, encode)

  private def tokenIdsOfByteWordDocs(docs: DataFrame,
      words: Column, encode: Column => Column): DataFrame = {
    val ow = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(words).as(Seq("pos", "word")))
      .filter(col("word") =!= "")
    val wids = ow.select("word").distinct()
      .select(col("word"), encode(col("word")).as("ids"))
    ow.join(broadcast(wids), "word")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("pos"), col("ids")))).as("a"))
      .select(col("doc_id"),
        flatten(expr("transform(a, x -> x.ids)")).as("token_ids"))
  }

  /** Pack per-document token-id sequences into fixed-[[TokenSeqLen]]
    * training rows — the REAL-id twin of [[packAssignments]]'s count-only
    * discipline, and the last link between the tokenizer and a trainer:
    * each document's ids plus an explicit [[BpeEosId]] boundary are
    * concatenated per hash bucket in the same deterministic md5 order as
    * pack_sequences, the concatenated stream is sliced every TokenSeqLen
    * ids (documents straddle row boundaries, GPT-style), and ONLY the
    * bucket-tail sequence is padded with [[BpePadId]].
    *
    * Scale shape: the window cumsum runs on doc-level rows (one row per
    * document); the per-TOKEN work is one posexplode → (bucket, seq_id)
    * re-group — shuffle volume ≈ 4 B/token + row overhead, the corpus
    * itself once, which SCALING.md prices as the floor for this operator
    * class. Buckets are independent streams: adding executors adds
    * buckets, no global order exists anywhere. */
  private def packTokenIds(ids: DataFrame,
      eosId: Int = BpeEosId, padId: Int = BpePadId): DataFrame = {
    val w = Window.partitionBy(col("bucket"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val stream = ids.select(col("doc_id"),
        (col("doc_id") % PackBuckets).as("bucket"),
        concat(col("token_ids"), array(lit(eosId))).as("ids"))
      .withColumn("n", size(col("ids")).cast("long"))
      .withColumn("start_off", sum(col("n")).over(w) - col("n"))
      .select(col("bucket"), col("start_off"),
        posexplode(col("ids")).as(Seq("p", "id")))
      .withColumn("gpos", col("start_off") + col("p"))
    stream
      .withColumn("seq_id", expr(s"gpos DIV $TokenSeqLen"))
      .withColumn("spos", (col("gpos") % TokenSeqLen).cast("int"))
      .groupBy("bucket", "seq_id")
      .agg(sort_array(collect_list(struct(col("spos"), col("id")))).as("a"))
      .withColumn("n_real", size(col("a")).cast("long"))
      .withColumn("n_pad", lit(TokenSeqLen.toLong) - col("n_real"))
      .withColumn("token_ids", concat(expr("transform(a, x -> x.id)"),
        array_repeat(lit(padId), col("n_pad").cast("int"))))
      .withColumn("ids_md5",
        md5(concat_ws(",", col("token_ids").cast("array<string>"))))
      .select("bucket", "seq_id", "n_real", "n_pad", "token_ids", "ids_md5")
  }

  /** The PERSISTED-model path for the composed tokenize pipeline: train
    * once (in-process cache), publish as a versioned
    * [[graft.operators.BpeModel]] parquet artifact keyed by the corpus
    * fingerprint, and read the pipeline's merges back FROM THE ARTIFACT —
    * so the composed query exercises the same save → load lifecycle a
    * production pipeline relies on (the in-process cache is only the
    * trainer's memo, never the cross-job contract). Fingerprint-unreadable
    * corpora (remote fs) fall back to the in-memory table. */
  /** The artifact root for `dir`'s corpus (fingerprint-keyed), or None
    * when the fingerprint is unreadable. Package-visible so the staleness
    * spec can place a stale model at the EXACT root the pipeline will
    * read. */
  private[graft] def bpeModelRoot(s: SparkSession, dir: String): Option[String] =
    corpusKey(dir).map { ck =>
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(ck.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"),
        s"graft-bpemodel-$key").toString
    }

  /** STALENESS CONTRACT (BpeModelStalenessSpec pins both halves):
    *  1. the root is keyed by the corpus fingerprint, so a grown or
    *     overwritten corpus keys a DIFFERENT root and trains fresh —
    *     rebuild-on-fingerprint-change, never silent staleness;
    *  2. the artifact itself carries the fingerprint it was trained from
    *     ([[graft.operators.BpeModel.fingerprintOf]]), and the latest
    *     version is VERIFIED against the current corpus before serving —
    *     a stale or foreign model at the right path (a restored backup, a
    *     copied tmpdir) is detected and superseded by a freshly-trained
    *     version instead of silently tokenizing with the wrong merges.
    *     Versions saved without a fingerprint (pre-contract artifacts)
    *     are accepted as-is — their age is unknowable, and retraining on
    *     every call would defeat the artifact. */
  private[graft] def persistedMerges(s: SparkSession, dir: String)
      : Seq[(Long, String, String, String, Long)] = {
    import graft.operators.BpeModel
    (corpusKey(dir), bpeModelRoot(s, dir)) match {
      case (Some(ck), Some(root)) =>
        val latestTrusted = BpeModel.versions(root).lastOption.exists { v =>
          BpeModel.fingerprintOf(root, v).forall(_ == ck)
        }
        if (!latestTrusted)
          BpeModel.save(s, learnBpeMergesCached(s, dir), root, Some(ck))
        BpeModel.load(s, root)
      case _ => learnBpeMergesCached(s, dir)
    }
  }

  // ---- published-tokenizer import (round 13) ----

  /** The checked-in public-format fixture — a "released" tokenizer as a
    * merges.txt / vocab.json pair in the GPT-2 byte-level interchange
    * format — shipped as a jar resource so the gate is cwd-independent. */
  private def importResource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/tokenizer-import/$name")
    require(in != null, s"missing tokenizer-import fixture resource: $name")
    try in.readAllBytes() finally in.close()
  }

  /** Import-once memo: materializes the fixture to files, runs the full
    * release → `BpeModel.importMerges` → versioned artifact → load-back
    * lifecycle at a digest-keyed /tmp root (an already-current
    * fingerprint skips the import — the staleness contract), and serves
    * (merges, vocab) for the imported entries. The GATE therefore
    * exercises the real production path: public files in, versioned
    * artifact on disk, released ids out. */
  private val importedMemo =
    new java.util.concurrent.atomic.AtomicReference[
      (Seq[(Long, String, String, String, Long)], Map[String, Int])]()
  private[graft] def importedModel(s: SparkSession)
      : (Seq[(Long, String, String, String, Long)], Map[String, Int]) = {
    val hit = importedMemo.get()
    if (hit != null) return hit
    import graft.operators.BpeModel
    val mb = importResource("merges.txt")
    val vb = importResource("vocab.json")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(mb)
    md.update(vb)
    val fp = md.digest().map("%02x".format(_)).mkString
    val key = fp.take(12)
    val files = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft-tokrelease-$key")
    java.nio.file.Files.createDirectories(files)
    java.nio.file.Files.write(files.resolve("merges.txt"), mb)
    java.nio.file.Files.write(files.resolve("vocab.json"), vb)
    val root = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft-bpemodelimp-$key").toString
    val current = BpeModel.versions(root).lastOption.exists(v =>
      BpeModel.fingerprintOf(root, v).contains(fp) &&
        BpeModel.loadVocab(root, v).isDefined)
    if (!current)
      BpeModel.importMerges(s, files.resolve("merges.txt").toString,
        files.resolve("vocab.json").toString, root)
    val v = BpeModel.versions(root).last
    val out = (BpeModel.loadVersion(s, root, v),
      BpeModel.loadVocab(root, v).get)
    importedMemo.set(out)
    out
  }

  /** Oracle CTEs for the imported model: the fixture's merge table and
    * vocabulary inlined as VALUES — the merge table as DATA, no training
    * CTEs — then the same per-round replay chain as the trained tiers,
    * with EVERY symbol's id (bases included) coming from the vocab join.
    * Ends with `di(doc_id, tids)`. */
  private lazy val importedOracleCtes: String = {
    import graft.operators.BpeModel
    val merges = BpeModel.parseMergesTxt(new String(
      importResource("merges.txt"),
      java.nio.charset.StandardCharsets.UTF_8))
    val vocab = BpeModel.parseVocabJson(importResource("vocab.json"))
    val n = merges.length
    val bCtes = merges.map { case (r, l, rr, _, _) =>
      s"ib$r AS (SELECT '$l' AS l, '$rr' AS r)"
    }
    val vRounds = (1 to n).map { k =>
      s"""iv$k AS (SELECT word, coalesce(
         |    ${mergeCycleSql(s"iv${k - 1}.syms", s"ib$k.l", s"ib$k.r")},
         |    iv${k - 1}.syms) AS syms
         |  FROM iv${k - 1} LEFT JOIN ib$k ON TRUE)""".stripMargin
    }
    val vocabVals = vocab.toSeq.sortBy(_._2)
      .map { case (sym, id) => s"('$sym', $id)" }.mkString(", ")
    val wordsArraySql =
      gpt2FixupSql(s"regexp_extract_all($Gpt2TextSql, '$Gpt2PatSqlLit')")
    s"""${bCtes.mkString(",\n")},
       |ivt AS (SELECT sym, CAST(id AS INT) AS id
       |  FROM (VALUES $vocabVals) AS t(sym, id)),
       |ow AS (SELECT doc_id, word, pos FROM
       |    (SELECT doc_id, unnest(ws) AS word, unnest(range(len(ws))) AS pos
       |      FROM (SELECT doc_id, $wordsArraySql AS ws
       |        FROM documents WHERE text IS NOT NULL))
       |  WHERE word <> ''),
       |iv0 AS (SELECT word, array_to_string(list_transform(
       |    range(1, CAST(octet_length(encode(word)) AS INT) + 1),
       |    i -> substring(hex(encode(word)), 2*i-1, 2)), ' ') AS syms
       |  FROM (SELECT DISTINCT word FROM ow)),
       |${vRounds.mkString(",\n")},
       |sy AS (SELECT word, unnest(sl) AS sym, unnest(range(len(sl))) AS sp
       |  FROM (SELECT word, string_split(syms, ' ') AS sl FROM iv$n)),
       |wid AS (SELECT word, list(ivt.id ORDER BY sp) AS ids
       |  FROM sy JOIN ivt ON ivt.sym = sy.sym GROUP BY word),
       |di AS (SELECT ow.doc_id, flatten(list(wid.ids ORDER BY ow.pos)) AS tids
       |  FROM ow JOIN wid USING (word) GROUP BY ow.doc_id)""".stripMargin
  }

  /** BYTE-model artifact root — its own keyed prefix: the a-z and byte
    * merge tables are different models of the same corpus and must never
    * shadow each other at one path. */
  private[graft] def bpeByteModelRoot(s: SparkSession, dir: String): Option[String] =
    corpusKey(dir).map { ck =>
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(ck.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"),
        s"graft-bpemodelb-$key").toString
    }

  /** [[persistedMerges]] for the BYTE model — the identical staleness
    * contract (fingerprint-keyed root, in-artifact fingerprint verified
    * before serving, stale artifacts superseded) over the byte trainer. */
  private[graft] def persistedByteMerges(s: SparkSession, dir: String)
      : Seq[(Long, String, String, String, Long)] = {
    import graft.operators.BpeModel
    (corpusKey(dir), bpeByteModelRoot(s, dir)) match {
      case (Some(ck), Some(root)) =>
        val latestTrusted = BpeModel.versions(root).lastOption.exists { v =>
          BpeModel.fingerprintOf(root, v).forall(_ == ck)
        }
        if (!latestTrusted)
          BpeModel.save(s, learnBpeByteMergesCached(s, dir), root, Some(ck))
        BpeModel.load(s, root)
      case _ => learnBpeByteMergesCached(s, dir)
    }
  }

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single symbols. */
  private val BpeRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  // literal-array arguments for the fused token_stats kernel
  private def stopsLit: Column = array(Stopwords.map(lit): _*)
  private def markersLit: Column = array(Lexicon.map(m => lit(m._2)): _*)
  private def noWords: Column = typedLit(Seq.empty[String])

  private val LangsAsc: Seq[String] = Lexicon.map(_._1).distinct.sorted

  /** Marker hits for one language: sum of the kernel's per-marker counters
    * at that language's lexicon positions (element_at is 1-indexed). */
  private def langCnt(st: Column, lang: String): Column =
    Lexicon.zipWithIndex.collect { case ((l, _), i) if l == lang =>
      element_at(st.getField("hits"), i + 1)
    }.reduce(_ + _)

  /** Per-document argmax over languages (cnt DESC, lang ASC — the same
    * tie-break as the relational row_number form): a left fold in ascending
    * language order where only a STRICTLY greater count replaces the
    * incumbent, so ties keep the smaller language. Null token stats (null
    * text) yield a null cnt, which every comparison rejects — callers map
    * that to 'und'/0 exactly like the old left-join did. */
  private def bestLang(st: Column): Column =
    LangsAsc.map(l => struct(langCnt(st, l).as("cnt"), lit(l).as("lang")))
      .reduce((acc, cand) =>
        when(cand.getField("cnt") > acc.getField("cnt"), cand).otherwise(acc))

  /** Concat-and-chunk assignment over a (doc_id, bucket, n_tokens) relation
    * — ONE definition of the packing discipline, shared by pack_sequences
    * and pipeline_pack_corpus (packTailSql is its DuckDB mirror; editing
    * one without the other diverges the composite pipeline silently). */
  private def packAssignments(kept: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("bucket"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    kept
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("start_off", col("cum") - col("n_tokens"))
      .withColumn("seq_first", expr(s"start_off DIV $PackBudget"))
      .withColumn("seq_last", expr(s"(cum - 1) DIV $PackBudget"))
      .withColumn("n_seqs_spanned", col("seq_last") - col("seq_first") + 1)
      .select("doc_id", "bucket", "n_tokens", "start_off",
        "seq_first", "seq_last", "n_seqs_spanned")
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[packAssignments]] over a CTE named `src` with
    * columns (doc_id, bucket, n_tokens). */
  private def packTailSql(src: String): String =
    s"""c AS (
       |  SELECT doc_id, bucket, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY bucket
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS cum
       |  FROM $src)
       |SELECT doc_id, bucket, n_tokens, cum - n_tokens AS start_off,
       |  (cum - n_tokens) // $PackBudget AS seq_first,
       |  (cum - 1) // $PackBudget AS seq_last,
       |  (cum - 1) // $PackBudget - (cum - n_tokens) // $PackBudget + 1
       |    AS n_seqs_spanned
       |FROM c ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    // Language ID: count marker-lexicon hits per language, argmax with
    // deterministic tie-break; 'und' when nothing matches. The fused
    // token_stats kernel counts every marker inside the scan stage — no
    // explode, no join, no groupBy: the only exchange left is the output
    // sort. (Round 1: explode + broadcast-join + two shuffles.)
    "text_langid" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      d.select(col("doc_id"), col("lang").as("declared_lang"),
          graft.exprs.functions.token_stats(
            toks(col("text")), noWords, markersLit).as("st"))
        .withColumn("best", bestLang(col("st")))
        .select(col("doc_id"), col("declared_lang"),
          when(col("best.cnt") > 0, col("best.lang"))
            .otherwise(lit("und")).as("pred_lang"),
          when(col("best.cnt") > 0, col("best.cnt"))
            .otherwise(lit(0L)).as("marker_hits"))
        .orderBy("doc_id")
    },

    // Quality scoring: structural counts + a deterministic combined score.
    // token_stats folds the old explode + groupBy(doc_id) + self-join into
    // a pure projection; the isNotNull filter mirrors the inner join that
    // dropped null-text docs (no token rows) in the relational form.
    "text_quality" -> { (s, dir) =>
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
      // counts surface as BIGINT to line up with DuckDB's length()/sum()
      d.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        length(regexp_replace(col("text"), "[^.,;:!?]", "")).cast("long").as("n_punct"),
        graft.exprs.functions.token_stats(
          toks(col("text")), stopsLit, noWords).as("st"))
        .select(col("doc_id"), col("n_chars"),
          col("st.n_words").as("n_words"), col("n_punct"),
          col("st.n_stop").as("n_stop"))
        .withColumn("avg_word_len",
          (col("n_chars") - (col("n_words") - 1)).cast("double") / col("n_words"))
        .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_words"))
        .select("doc_id", "n_chars", "n_words", "n_punct", "n_stop",
          "avg_word_len", "stop_ratio")
        .orderBy("doc_id")
    },

    // Token counting: whitespace tokens + BPE-ish regex pre-tokens.
    "text_tokens" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      d.select(col("doc_id"),
        size(toks(col("text"))).as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit(BpeRegex), lit(0))).as("bpe_tokens"))
        .orderBy("doc_id")
    },

    // Gopher-style repetition statistics: top-token fraction and duplicate
    // consecutive-bigram fraction — the ratios repetition quality filters
    // gate on. The fused repetition_stats kernel computes all five counts
    // inside the scan stage; the relational form (double explode + two
    // groupBy shuffles over word rows) survives only in the DuckDB oracle.
    "text_repetition" -> { (s, dir) =>
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
      d.select(col("doc_id"),
          graft.exprs.functions.repetition_stats(toks(col("text"))).as("r"))
        .select(col("doc_id"),
          col("r.n_tokens").as("n_tokens"),
          col("r.n_distinct").as("n_distinct"),
          col("r.top_cnt").as("top_cnt"),
          col("r.n_bigrams").as("n_bigrams"),
          col("r.n_distinct_bigrams").as("n_distinct_bigrams"))
        .withColumn("top_frac",
          col("top_cnt").cast("double") / col("n_tokens").cast("double"))
        // formula kept CHARACTER-identical to the oracle (1.0 - d/n): a
        // re-association would change float bits and fail the hash gate
        .withColumn("dup_bigram_frac",
          when(col("n_bigrams") > 0,
            lit(1.0) - col("n_distinct_bigrams").cast("double") /
              col("n_bigrams").cast("double"))
            .otherwise(lit(0.0)))
        .orderBy("doc_id")
    },

    // PII scrubbing: chained regexp_replace masking emails, IPv4 addresses,
    // and numeric identifiers, with per-category hit counts — pure
    // projection, codegen'd, zero exchanges beyond the output sort. The
    // patterns stay in the Java-regex ∩ RE2 subset (no backrefs, no
    // lookaround) so the DuckDB oracle replays them byte-for-byte. Runs on
    // events.props, the one column in the testdata with id-like content.
    "text_pii_scrub" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
      e.select(col("event_id") +: col("props") +: piiColumns(col("props")): _*)
        .orderBy("event_id")
    },

    // Deterministic stratified sampling: k docs per language, ordered by a
    // content-independent hash of the id (md5) — a uniform-without-
    // replacement sample that is reproducible across runs, engines, and
    // cluster sizes (no rand(), no seed plumbing). The rank window is
    // per-stratum — parallel by construction; at 100 TB a hot stratum
    // pre-filters cheaply on a hash threshold (md5 < bound covers k with
    // high probability) before the exact rank, same hash, same sample.
    "sample_stratified" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      d.select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= SamplePerStratum)
        .orderBy("doc_id")
    },

    // Fixed-size global sample — "give me exactly N docs from the whole
    // corpus", deterministically: the N smallest in content-independent
    // md5 order. NOT a window (a single global partition would serialize
    // the corpus through one reducer): orderBy+limit plans as
    // TakeOrderedAndProject — per-partition top-N heaps merged at the
    // driver, so the wire carries executors×N rows and nothing shuffles.
    // The kept set is a stable hash prefix: re-runs and repartitioning
    // can't change it, and growing the corpus only evicts from the
    // boundary (same contract as sample_stratified/cap_per_source).
    "sample_fixed" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      d.select(col("doc_id"), col("lang"), col("source"),
          md5(col("doc_id").cast("string")).as("rank_key"))
        .orderBy(col("rank_key"), col("doc_id"))
        .limit(SampleFixedN)
        .orderBy("doc_id")
    },

    // Per-source (domain) capping — the C4/RefinedWeb anti-boilerplate
    // step: no single domain may contribute more than CapPerSource docs.
    // Kept subset is hash-ranked (same content-independent md5 order as
    // sample_stratified) so the cap is reproducible as the corpus grows.
    // One shuffle on source for both windows (count + rank share the
    // partitioning). At 100 TB a hot domain makes the per-source rank sort
    // the skew risk — mitigation as sample_stratified: pre-filter the
    // stratum on a hash threshold that covers the cap with high
    // probability, then exact-rank only the survivors (same hash ⇒ same
    // kept set).
    "cap_per_source" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val bySrc = Window.partitionBy(col("source"))
      val w = bySrc.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      d.select(col("doc_id"), col("source"))
        .withColumn("src_n", count(lit(1)).over(bySrc))
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("kept", col("rk") <= CapPerSource)
        .orderBy("doc_id")
    },

    // Token-budget sampling — "give me ~N tokens per language", the unit
    // data-mixing actually works in: docs are taken in deterministic hash
    // order until the running token total reaches the budget (the doc that
    // crosses the boundary is included, so the budget is a lower bound).
    // One per-lang window cumsum, same shape as pack_sequences; the
    // kept set is a deterministic prefix — stable under re-runs and
    // engine changes, and growing the corpus only APPENDS candidates after
    // the prefix (docs already inside the budget stay inside it unless new
    // docs hash ahead of them — the same stability contract as
    // sample_stratified, not row-order dependence).
    "sample_token_budget" -> { (s, dir) =>
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      d.select(col("doc_id"), col("lang"),
          size(toks(col("text"))).cast("long").as("n_tokens"))
        .withColumn("cum_before",
          coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .filter(col("cum_before") < TokenBudgetPerLang)
        .orderBy("doc_id")
    },

    // Per-language length-distribution quantiles through a KLL sketch
    // (Karnin–Lang–Liberty 2016; exprs/KllSketch.scala — deterministic
    // alternating-parity compaction, O(k·log(n/k)) state at any n): the
    // distribution-shape member of the sketch family (HLL = distinct,
    // MG = heavy hitters, Bloom = membership). The exact batch
    // alternative (agg_percentile / quantile_disc) shuffles or sorts
    // the value column; the sketch carries ≤ k·levels doubles per group
    // through partial/final aggregation — the only shape that works on
    // an unbounded stream, which is why the streaming twin
    // (quantilesStream) is the same aggregate per window. No exact
    // oracle by design (compaction is engine-internal); the external
    // band re-derives every estimate against DuckDB's exact
    // quantile_disc within 10% (rank error ≤ ~levels/k ≈ 2.5% at these
    // corpus sizes — KllSpec pins the bound directly).
    "text_quantiles_sketch" -> { (s, dir) =>
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
      val labels = array(KllLabels.map(lit): _*)
      d.groupBy("lang")
        .agg(graft.exprs.functions.kll_quantiles(
          col("n_chars").cast("double"), KllQuantiles, KllK).as("ests"))
        .select(col("lang"), posexplode(col("ests")).as(Seq("i", "est")))
        .select(col("lang"), element_at(labels, col("i") + 1).as("q"),
          col("est"))
        .orderBy("lang", "q")
    },

    // Source-concentration audit: the Gini coefficient of per-source
    // doc counts — the one-number "is this corpus dominated by a few
    // domains" signal that decides whether cap_per_source /
    // mix_temperature even need to run. Gini = Σ n_i·(2i − k − 1) /
    // (k·Σn) over counts sorted ascending (i = 1..k rank, source as
    // tiebreak): every term is exact INTEGER arithmetic and the single
    // final division of two exact integers is IEEE-identical in both
    // engines — bit-exact oracle with no tricks. Scale shape (round 13,
    // domain-grained sources): one map-side-combined count per source,
    // then a RANGE-PARTITIONED distributed rank (see [[corpusGiniOf]]) —
    // no unpartitioned window anywhere, so 10M+ sources (URL domains at
    // 100 TB) never degrade to a single-partition sort.
    "corpus_gini" -> { (s, dir) =>
      corpusGiniOf(
        Tables(s, dir, "documents").filter(col("text").isNotNull))
    },

    // WEIGHTED sampling without replacement via PRIORITY SAMPLING
    // (Duffield, Lund, Thorup 2007 — public literature): per doc a
    // deterministic uniform u ∈ (0,1] from an md5 fold, priority
    // p = w/u with w = n_chars, keep the top-k priorities; the
    // (k+1)-th priority is the threshold τ and each kept doc carries
    // the unbiased weight estimator ŵ = max(w, τ) (E[ŵ·1kept] = w —
    // the property that makes a char-budget subsample auditable).
    // The size-biased sample a token/char budget actually wants: big
    // documents are proportionally likelier, small ones that DO land
    // carry τ as their estimate. EVERY operation is exact IEEE both
    // engines: u = (fold+1)/2³² is an integer over a power of two,
    // p is one division, τ/ŵ are comparisons — no libm anywhere, so
    // the oracle hashes bit-exactly with no quantization trick.
    // Scale shape: the top-(k+1) is orderBy+limit —
    // TakeOrderedAndProject, per-partition heaps, no global sort (the
    // sample_fixed contract); the rank/τ window runs over k+1 rows.
    "sample_priority" -> { (s, dir) =>
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
      val u32 = conv(substring(
        md5(concat(lit("ps"), col("doc_id").cast("string"))), 1, 8),
        16, 10).cast("long")
      val top = d.select(col("doc_id"),
          col("n_chars").cast("double").as("w"))
        .withColumn("u",
          (u32 + lit(1L)).cast("double") / lit(4294967296.0))
        .withColumn("priority", col("w") / col("u"))
        .orderBy(col("priority").desc, col("doc_id"))
        .limit(PrioritySampleK + 1)
      val wOrd = Window.orderBy(col("priority").desc, col("doc_id"))
      val full = wOrd.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      top
        .withColumn("rank", row_number().over(wOrd).cast("long"))
        // under-full corpus (n ≤ k): τ = 0, nothing was sampled away —
        // the PrioritySampleAgg convention, one algebra everywhere
        .withColumn("tau", when(
          count(lit(1)).over(full) === PrioritySampleK + 1,
          min(col("priority")).over(full)).otherwise(lit(0.0)))
        .filter(col("rank") <= PrioritySampleK)
        .select(col("doc_id"), col("w"), col("rank"), col("priority"),
          greatest(col("w"), col("tau")).as("w_est"))
        .orderBy("doc_id")
    },

    // Composed curation pipeline: temperature-rebalance the sources
    // (mix_temperature's exact per-source thresholds), then draw the
    // char-weighted priority sample from the KEPT docs — the two
    // round-12 sampling primitives as one plan, still exact end-to-end
    // (every step is the same libm-free arithmetic, so the composition
    // is oracle-gated bit-exactly like its parts).
    "pipeline_mix_sample" -> { (s, dir) =>
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
      val rated = mixThresholdsOf(d).select("source", "thr")
      val mt = conv(substring(
        md5(concat(lit("mt"), col("doc_id").cast("string"))), 1, 8),
        16, 10).cast("long")
      val ps = conv(substring(
        md5(concat(lit("ps"), col("doc_id").cast("string"))), 1, 8),
        16, 10).cast("long")
      val kept = d.select(col("doc_id"), col("source"),
          col("n_chars").cast("double").as("w"), mt.as("u32"),
          ((ps + lit(1L)).cast("double") / lit(4294967296.0)).as("u"))
        .join(broadcast(rated), "source")
        .filter(col("u32") < col("thr"))
      val top = kept
        .withColumn("priority", col("w") / col("u"))
        .select("doc_id", "source", "w", "priority")
        .orderBy(col("priority").desc, col("doc_id"))
        .limit(PipelineMixSampleK + 1)
      val wOrd = Window.orderBy(col("priority").desc, col("doc_id"))
      val full = wOrd.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      top
        .withColumn("rank", row_number().over(wOrd).cast("long"))
        .withColumn("tau", when(
          count(lit(1)).over(full) === PipelineMixSampleK + 1,
          min(col("priority")).over(full)).otherwise(lit(0.0)))
        .filter(col("rank") <= PipelineMixSampleK)
        .select(col("doc_id"), col("source"), col("w"), col("rank"),
          greatest(col("w"), col("tau")).as("w_est"))
        .orderBy("doc_id")
    },

    // Per-language (stratified) priority sampling through the NATIVE
    // bounded-state aggregate ([[graft.exprs.PrioritySampleAgg]] — the
    // same object the streaming twin holds per window): one partial/
    // final aggregation carrying ≤ k+1 entries per (lang, partition),
    // NO per-stratum rank window (a window would sort every stratum's
    // full row set; the aggregate never materializes more than k+1).
    // Same τ / ŵ = max(w, τ) algebra as sample_priority; under-full
    // strata keep everything with τ = 0 (ŵ = w — nothing was sampled
    // away). The oracle restates the algebra with a rank window +
    // per-lang (k+1)-th priority, so the AGGREGATE itself is gated
    // bit-exactly.
    "sample_priority_by_lang" -> { (s, dir) =>
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
      val u32 = conv(substring(
        md5(concat(lit("ps"), col("doc_id").cast("string"))), 1, 8),
        16, 10).cast("long")
      d.select(col("lang"), col("doc_id"),
          col("n_chars").cast("double").as("w"),
          ((u32 + lit(1L)).cast("double") / lit(4294967296.0)).as("u"))
        .withColumn("priority", col("w") / col("u"))
        .groupBy("lang")
        .agg(graft.exprs.functions.priority_sample(
          col("priority"), col("doc_id"), col("w"), PrioStratumK)
          .as("sample"))
        .select(col("lang"), explode(col("sample")).as("t"))
        .select(col("lang"), col("t.doc_id"), col("t.w"), col("t.rank"),
          col("t.priority"), col("t.w_est"))
        .orderBy("lang", "doc_id")
    },

    // TEMPERATURE-based source re-balancing (the multilingual-LM data
    // recipe — sample source s proportionally to p_s^α instead of p_s,
    // α = 0.5): per-source acceptance rate
    //   rate_s = min(1, ((T·q_s) / Σq) / n_s),  q_s = √n_s
    // and a deterministic per-doc Bernoulli — doc kept iff its md5
    // u32 < ⌊rate_s·2³²⌋. α = 0.5 makes EVERY step exact IEEE in both
    // engines (sqrt is correctly rounded, not libm): no quantization
    // trick in the oracle's per-source arithmetic. Σ√n is an ORDER-FREE
    // BIGINT sum of fixed-point q (round 13 — see [[mixThresholdsOf]]),
    // so domain-grained source columns (10M+ values at 100 TB) never
    // degrade to a one-row collect_list. Output is the per-source audit
    // (counts + the exact threshold), which pins every per-doc
    // comparison without materializing the kept set. Scale shape: one
    // map-side-combined count per source, one scalar integer sum, one
    // broadcast join back, one audit aggregate.
    "mix_temperature" -> { (s, dir) =>
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
      val u32 = conv(substring(
        md5(concat(lit("mt"), col("doc_id").cast("string"))), 1, 8),
        16, 10).cast("long")
      d.select(col("doc_id"), col("source"), u32.as("u32"))
        .join(broadcast(mixThresholdsOf(d)), "source")
        .groupBy("source")
        .agg(min(col("n_docs")).as("n_docs"), min(col("q")).as("q"),
          min(col("rate")).as("rate"), min(col("thr")).as("thr"),
          sum(when(col("u32") < col("thr"), 1L).otherwise(0L))
            .as("n_kept"))
        .orderBy("source")
    },

    // DSIR log-importance weights (Xie et al. 2023): score every raw doc
    // by how target-like its hashed n-gram (uni+bi) distribution is —
    // Σ_features λ_bucket, λ = fixed-point ln(p̂_target/p̂_raw) with add-1
    // smoothing over B=4096 buckets. The model is TWO bucket-sized
    // aggregates (kilobytes at any corpus size) broadcast back onto the
    // feature stream; per-doc weights are ONE doc-keyed sum with map-side
    // partials. This is the data-selection primitive: rank/resample raw
    // web text toward a trusted target domain without training a model.
    "dsir_weights" -> { (s, dir) =>
      dsirWeightsOf(Tables(s, dir, "documents")).orderBy("doc_id")
    },

    // DSIR selection — the resampling half: Gumbel top-k over the log
    // weights (key = w/S + Gumbel(0,1), the classic exp-weighted sample
    // without replacement), with the Gumbel noise derived from md5 of the
    // doc id — deterministic across runs, engines, and cluster sizes, the
    // same no-rand() contract as every sampler here. orderBy+limit plans
    // as TakeOrderedAndProject: per-partition top-N heaps, executors×N
    // rows to the driver, nothing shuffles.
    "sample_importance" -> { (s, dir) =>
      dsirWeightsOf(Tables(s, dir, "documents"))
        .withColumn("v32",
          conv(substring(md5(concat(col("doc_id").cast("string"),
            lit(":gumbel"))), 1, 8), 16, 10).cast("long"))
        .withColumn("gumbel_scaled",
          floor(-log(-log((col("v32").cast("double") + lit(0.5))
            / lit(4294967296.0))) * NllScale).cast("long"))
        .withColumn("key_scaled", col("weight_scaled") + col("gumbel_scaled"))
        .orderBy(col("key_scaled").desc, col("doc_id"))
        .limit(SampleImportanceN)
        .select("doc_id", "lang", "weight_scaled", "gumbel_scaled",
          "key_scaled")
        .orderBy("doc_id")
    },

    // BPE tokenizer-vocabulary training — the scalable shape real trainers
    // (SentencePiece, HF tokenizers) use: merges are learned on the WORD-
    // FREQUENCY table, not the raw corpus, so the corpus is scanned exactly
    // once (the word count) and every round after that runs on a
    // vocab-sized cached table (≤ ~10⁷ rows at 100 TB — megabytes). Each
    // round: count adjacent symbol pairs weighted by word freq (one tiny
    // shuffle), pick the argmax with a deterministic (freq desc, pair asc)
    // tie-break, apply the merge greedily left-to-right (see
    // [[applyBpeMerge]] for why the doubled-separator encoding is
    // load-bearing). Output: the learned merge table, BpeMerges rows.
    "train_bpe" -> { (s, dir) =>
      import s.implicits._
      learnBpeMergesCached(s, dir)
        .toDF("round", "lhs", "rhs", "merged", "pair_freq")
        .orderBy("round")
    },

    // Batched BPE training — same word-frequency table, but each driver
    // round learns up to BpeBatchK symbol-disjoint merges from a ranked
    // candidate window instead of one argmax (see [[learnBpeBatched]] for
    // the conflict-free-prefix rule and the determinism argument). This is
    // the shape that makes a 32k-merge vocabulary tractable on a cluster:
    // round count — and with it the fixed stage-launch cost SCALING.md
    // prices as the trainer's true bottleneck — drops ~K-fold.
    "train_bpe_batched" -> { (s, dir) =>
      import s.implicits._
      learnBpeBatchedCached(s, dir)
        .toDF("round", "seq", "lhs", "rhs", "merged", "pair_freq")
        .orderBy("seq")
    },

    // BPE tokenization — applies the learned merge table in the shape that
    // scales: the VOCABULARY is tokenized (the fused BpeEncodeIds kernel
    // over DISTINCT words — vocab-sized, not corpus-sized), then per-
    // document token counts are one word-keyed join + sum. The merge rounds
    // re-run here so the query is self-contained; a production pipeline
    // persists train_bpe's table instead. The word→token-length table is
    // explicitly broadcast (vocab-sized — megabytes at 100 TB per
    // train_bpe's arithmetic), so the per-document side never shuffles on
    // word; the only corpus-scale exchange is the (doc_id, word) count.
    "tokenize_bpe" -> { (s, dir) =>
      val merges = learnBpeMergesCached(s, dir)
      val dw = Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), explode(
          expr("regexp_extract_all(lower(text), '([a-z]+)', 1)")).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
      // fused-kernel vocab encode (see [[tokenIdsOf]]): token count per
      // word = the encoded id array's length — one expression, plan depth
      // constant in merge count
      val wtok = dw.select("word").distinct()
        .select(col("word"),
          size(graft.exprs.functions.bpe_encode_ids(col("word"), merges))
            .cast("long").as("w_tokens"))
      dw.join(broadcast(wtok), "word")
        .groupBy("doc_id")
        .agg(sum(col("n")).as("n_words"),
          sum(col("n") * col("w_tokens")).as("n_bpe_tokens"))
        .orderBy("doc_id")
    },

    // JSONL ingestion round-trip (round 13): documents → gzip JSONL
    // shards (the interchange format raw corpora actually arrive in —
    // [[graft.sources.CorpusJsonl]]) → schema-pinned PERMISSIVE read →
    // back. The oracle is the IDENTITY over the parquet table, so the
    // gate proves the write+read boundary loses and alters nothing —
    // newlines, unicode, nulls — md5 of the text included. The shard
    // materialization is corpus-fingerprint-keyed and idempotent
    // (_SUCCESS gates completeness, overwrite heals partial writes);
    // an unreadable fingerprint just rewrites per run.
    "jsonl_roundtrip" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val key = corpusKey(dir).map { ck =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(ck.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(12)
      }.getOrElse(java.util.UUID.randomUUID().toString.take(12))
      val root = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"),
        s"graft-jsonl-$key")
      if (!java.nio.file.Files.exists(root.resolve("_SUCCESS")))
        // 32 shards: gzip isn't splittable, so shard count caps BOTH the
        // write's deflate parallelism and the read side's task count
        graft.sources.CorpusJsonl.write(d, root.toString, shards = 32)
      graft.sources.CorpusJsonl.read(s, root.toString)
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_chars"), md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    },

    // Per-document token-id SEQUENCES — the end-to-end tokenizer output a
    // trainer actually consumes (tokenize_bpe's counts prove the merge
    // chain; this emits the real ids in document order — see [[tokenIdsOf]]
    // for the id scheme and the broadcast-vocabulary scale shape). The
    // audit projection pins every id bit-for-bit without shipping the
    // variable-length arrays through the driver compare (the emb_quantize
    // precedent): md5 over the comma-joined ids IS the sequence.
    "tokenize_bpe_ids" -> { (s, dir) =>
      tokenIdsOf(s, dir, learnBpeMergesCached(s, dir))
        .select(col("doc_id"),
          size(col("token_ids")).cast("long").as("n_ids"),
          expr("aggregate(token_ids, CAST(0 AS BIGINT), (a, x) -> a + x)")
            .as("sum_ids"),
          md5(concat_ws(",", col("token_ids").cast("array<string>")))
            .as("ids_md5"))
        .orderBy("doc_id")
    },

    // Fixed-length training rows of REAL token ids — the missing link
    // between tokenize_bpe_ids and a training job: EOS document
    // boundaries, TokenSeqLen-id rows, PAD only on each bucket's tail
    // sequence (see [[packTokenIds]]). Output audit row per sequence; the
    // md5 pins the full id content of every training row.
    "pack_token_sequences" -> { (s, dir) =>
      packTokenIds(tokenIdsOf(s, dir, learnBpeMergesCached(s, dir)))
        .select("bucket", "seq_id", "n_real", "n_pad", "ids_md5")
        .orderBy("bucket", "seq_id")
    },

    // FFD packing at the TOKEN-ID tier (round 13): pack_best_fit's
    // boundary-respecting assignment, MATERIALIZED as training rows of
    // real ids — each doc contributes min(n_ids+1, L) ids (its prefix +
    // one EOS; over-long docs truncate to a full row of their own),
    // docs inside a sequence concatenate in the deterministic FFD visit
    // order (step), the tail pads to L with PAD. The md5 pins every id
    // of every training row; the oracle replays tokenize + FFD + the
    // materialization end-to-end (the recursive-CTE FFD joined back to
    // the token arrays). Per-sequence collect_list is bounded by L ids.
    "pack_best_fit_tokens" -> { (s, dir) =>
      ffdTokenRowsOf(s,
        tokenIdsOf(s, dir, learnBpeMergesCached(s, dir)))
        .orderBy("bucket", "seq")
    },

    // The RECURRING drop job closed to training rows (round 15): drops
    // arrive over months, and each one's documents must pack into the
    // SAME FFD bins the previous drops left open — continuing sequence
    // numbering, never repacking or re-tokenizing admitted history.
    // [[graft.operators.PackState]] persists the per-bucket open-bin
    // remainders + visit counters (snapshots) and each drop's
    // per-sequence contributions (deltas) under a manifest-committed
    // store; this entry builds the state from the doc_id-parity drops
    // (drop 1 then drop 2, the ensure-artifact discipline) and emits
    // the training rows — which the oracle replays as a SEEDED
    // recursive FFD: drop 2's recursion starts from drop 1's final
    // remainder lists, so every id of every cross-drop sequence is
    // pinned hash-exactly. Scale shape: one sorted-group pass per drop
    // + a doc_id join back to the drop's token arrays; emitting reads
    // persisted contributions only.
    "pipeline_drop_pack" -> { (s, dir) =>
      val st = ensurePackState(s, dir)
      graft.operators.PackState
        .trainingRows(s, graft.operators.PackState.load(st, packParams))
        .orderBy("bucket", "seq")
    },

    // The COMPLETE recurring loop, drops to trainer-ready rows
    // (round 15): each quality-gated drop is ADMITTED against the
    // persisted DedupState, decontaminated against the persisted
    // registry (n-gram Bloom AND registered embeddings — the
    // pipeline_drop_curate curation, factored as
    // [[Dedup.curatedDropIds]]), tokenized, and PACKED into the bins
    // earlier drops left open ([[graft.operators.PackState]]). Every
    // stage is served from persisted state; nothing rescans admitted
    // text, re-reads a registered benchmark, or repacks an earlier
    // drop. The oracle replays the whole thing — admission CTE chain,
    // corpus-wide registry flag sets, tokenize, and the SEEDED
    // two-phase FFD restricted to each drop's curated ids — pinning
    // every id of every training row the recurring job would ship.
    "pipeline_drop_train" -> { (s, dir) =>
      val st = ensureCuratedPackState(s, dir)
      graft.operators.PackState
        .trainingRows(s, graft.operators.PackState.load(st, packParams))
        .orderBy("bucket", "seq")
    },

    // The loop WITH the treatment applied (round 16): drop_train
    // computes the span-scrub signal and then packs the ORIGINAL text;
    // THIS packs what the treatment actually ships — each drop's
    // curated documents are span-SCRUBBED against their pre-drop state
    // ([[graft.operators.DedupState.spanScrub]] — cross-drop repeated
    // chunks CUT, survivors rejoined in order), the scrubbed text is
    // tokenized, and the result packs into the persisted bins. The
    // oracle chains the admission CTEs + the scrub rebuild + the
    // scrubbed tokenize + the seeded two-phase FFD, pinning every id of
    // every training row the treated loop would ship.
    "pipeline_drop_train_scrubbed" -> { (s, dir) =>
      val st = ensureScrubbedPackState(s, dir)
      graft.operators.PackState
        .trainingRows(s, graft.operators.PackState.load(st, packParams))
        .orderBy("bucket", "seq")
    },

    // The recurring loop's OPERATIONAL LEDGER (round 15): one row per
    // drop — eligible after the quality gate, admitted by the state,
    // registry-flagged (n-gram / semantic), curated, span-dup-flagged
    // (the ADVISORY scrub signal vs the pre-drop state), and the
    // drop's packable token contribution — every count from the SAME
    // lazy frames pipeline_drop_train packs
    // ([[Dedup.dropCurationFrames]]), so the ledger can never describe
    // a different drop than the one the pack ships. Drop 1 reports
    // against the EMPTY pre-drop state (its vs-state span column is
    // structurally zero; the oracle pins that too).
    "pipeline_drop_report" -> { (s, dir) =>
      val merges = learnBpeMergesCached(s, dir)
      // round 17: the ledger's pack sums need token COUNTS, not the id
      // arrays — [[tokenCountsOf]] skips the per-doc array regroup
      val ids = tokenCountsOf(Tables.spread(
        Tables(s, dir, "documents")), merges)
      // the scrubbed-token column reads the SCRUBBED pack state's
      // persisted per-drop contributions (each contrib row's ids_doc is
      // the doc's truncated prefix + EOS, so Σ size(ids_doc) over a
      // drop's delta IS Σ least(n_ids+1, L) over its scrubbed ids) —
      // the ledger thereby describes the rows the treated pack actually
      // shipped, and the steady-state cost is a delta-leaf scan instead
      // of re-running scrub + tokenize per report
      val scrSt = graft.operators.PackState.load(
        ensureScrubbedPackState(s, dir), packParams)
      def row(which: Int): DataFrame = {
        val f = Dedup.dropCurationFrames(s, dir, which)
        val preState =
          if (which == 0) graft.operators.DedupState.empty
          else Dedup.gatedStateHandle(s, dir)
        val spanFlagged = graft.operators.DedupState
          .spanVerdicts(s, preState, f.eligible)
          .filter(col("span_dup_state"))
        def c1(df: DataFrame, n: String): DataFrame =
          df.agg(count(lit(1)).cast("long").as(n))
        def packSum(cntRows: DataFrame, n: String): DataFrame =
          cntRows.agg(coalesce(sum(
            least(col("n_ids") + 1L,
              lit(TokenSeqLen.toLong))), lit(0L)).as(n))
        // round 17: the four admission-stage counts fold into ONE
        // aggregate over the shared flags frame (dropCurationFrames) —
        // previously four crossJoined count branches each re-ran the
        // state-verdict sub-DAG. Same counts, same columns, same oracle.
        val stage = f.flags.agg(
          count(lit(1)).cast("long").as("n_admitted"),
          count(when(col("is_ngram_flagged"), lit(1))).cast("long")
            .as("n_registry_flagged"),
          count(when(col("is_sem_flagged"), lit(1))).cast("long")
            .as("n_sem_flagged"),
          count(when(!col("is_ngram_flagged") && !col("is_sem_flagged"),
            lit(1))).cast("long").as("n_curated"))
        c1(f.eligible, "n_eligible")
          .crossJoin(stage)
          .crossJoin(c1(spanFlagged, "n_span_dup_state"))
          .crossJoin(packSum(ids.join(f.curated, Seq("doc_id")),
            "n_pack_tokens"))
          // what the TREATED loop ships (round 16): the same curated
          // docs, span-scrubbed against the pre-drop state, re-tokenized
          // — served from the persisted scrubbed pack's contributions
          .crossJoin(graft.operators.PackState
            .contrib(s, scrSt.copy(deltas = Seq(scrSt.deltas(which))))
            .agg(coalesce(sum(size(col("ids_doc")).cast("long")),
              lit(0L)).as("n_scrub_tokens")))
          .select(lit(which + 1L).as("drop_no"), col("n_eligible"),
            col("n_admitted"), col("n_registry_flagged"),
            col("n_sem_flagged"), col("n_curated"),
            col("n_span_dup_state"), col("n_pack_tokens"),
            col("n_scrub_tokens"))
      }
      row(0).unionByName(row(1)).orderBy("drop_no")
    },

    // The COMPLETE production intake, boundary to training rows, as ONE
    // declarative plan (round 14): staged JSONL.gz drop (with malformed-
    // line and corrupt-shard fixtures — see [[intakeShards]]) →
    // schema-pinned PERMISSIVE read surviving the corrupt shard →
    // pretrain curation (near-dup cluster keepers → quality gate →
    // benchmark decontamination, n-gram AND semantic → the benchmark
    // split held out) → boundary-respecting FFD token packing — the
    // pack_best_fit_tokens training rows, restricted to the curated
    // corpus. Every stage is individually oracle-gated elsewhere; this
    // entry pins the full COMPOSITION hash-exactly (every id of every
    // training row the intake would hand a trainer). The oracle runs on
    // the parquet table — jsonl_roundtrip proves the boundary is the
    // identity — with the survivor CTE chain prepended to the tokenize +
    // FFD replay. Scale shape: nothing new — each stage keeps its
    // audited shape, and the JSONL read's parallelism is the shard
    // count by construction.
    "pipeline_intake_e2e" -> { (s, dir) =>
      val root = intakeShards(s, dir)
      val files = graft.sources.CorpusJsonl.listShards(s, root)
      // decode the boundary ONCE (round 17): the curation DAG consumes
      // `docs` from five sub-plans (cluster pairs, keeper join, shingle
      // legs, tokenize), and each used to re-gunzip + re-JSON-parse the
      // shard set — measured 5× the decode CPU of the corpus per run.
      // One materialization is exactly what a production intake does at
      // this boundary (parse once, land columnar, curate from that).
      // Round 18: a Staged slot (persist, lineage kept) instead of an
      // unreleased localCheckpoint — repeated construction swaps the
      // previous copy out of executor storage, and at cluster scale the
      // boundary survives executor loss by recomputing the parse.
      val docs = graft.util.Staged.swap(s"intake_e2e.docs:$dir",
        graft.sources.CorpusJsonl.readFiles(s, files))
      val kept = Dedup.pretrainSurvivorsOf(s, docs, dir).select("doc_id")
      ffdTokenRowsOf(s,
        tokenIdsOfDocs(docs, learnBpeMergesCached(s, dir))
          .join(kept, "doc_id"))
        .orderBy("bucket", "seq")
    },

    // The intake ACCOUNTING row (round 14): docs in → rejected lines →
    // skipped shards → dup-dropped → quality-dropped → benchmark held
    // out → n-gram contaminated → semantically contaminated → survivors
    // → packed training rows/tokens — one all-BIGINT row, every count
    // from the SAME stage frames the e2e plan consumes
    // ([[Dedup.pretrainStageFrames]]), so the card can never describe a
    // different composition than the corpus it ships. The oracle pins
    // the fixture constants (rejects, skipped shards) and re-derives
    // every curation count from the survivor CTE chain.
    "pipeline_intake_report" -> { (s, dir) =>
      val root = intakeShards(s, dir)
      val files = graft.sources.CorpusJsonl.listShards(s, root)
      val audit = graft.sources.CorpusJsonl.auditShards(s, files)
      // ONE boundary decode for BOTH line legs (round 17 optimization):
      // clean docs and rejects are disjoint projections of the same
      // PERMISSIVE raw parse, so materializing the raw frame once drops a
      // full gunzip+JSON pass vs giving the rejects leg its own read.
      // The audit keeps its separate decompress pass BY CONTRACT (it
      // probes shard bytes to EOF — see auditShards' doc). Round 18:
      // Staged slot instead of an unreleased localCheckpoint (see
      // intake_e2e's note).
      val raw = graft.util.Staged.swap(s"intake_report.raw:$dir",
        graft.sources.CorpusJsonl.readRawFiles(s, files))
      val docs = graft.sources.CorpusJsonl.cleanOf(raw)
      val rejects = graft.sources.CorpusJsonl.corruptOf(raw)
      val st = Dedup.pretrainStageFrames(s, docs, dir)
      val packed = ffdTokenRowsOf(s,
        tokenIdsOfDocs(docs, learnBpeMergesCached(s, dir))
          .join(st.survivors.select("doc_id"), "doc_id"))
      def c1(df: DataFrame, name: String): DataFrame =
        df.agg(count(lit(1)).cast("long").as(name))
      // round 17: the two shard-audit counts fold into one aggregate (the
      // audit is a full decompress pass — one branch, not two), and every
      // stage count now scans the ONE materialized boundary decode above.
      // The per-stage count branches themselves stay independent — the
      // flags-frame variant was reverted after shared-JVM bench runs
      // showed it slower (see pretrainStageFrames' note).
      audit.agg(count(lit(1)).cast("long").as("n_shards_in"),
          count(when(!col("ok"), lit(1))).cast("long")
            .as("n_shards_skipped"))
        .crossJoin(c1(rejects, "n_rejected_lines"))
        .crossJoin(c1(docs, "n_docs"))
        .crossJoin(c1(st.keepers, "n_keepers"))
        .crossJoin(c1(st.quality, "n_quality"))
        .crossJoin(c1(st.nonBench, "n_non_bench"))
        .crossJoin(c1(st.ngramClean, "n_ngram_clean"))
        .crossJoin(c1(st.survivors, "n_survivors"))
        .crossJoin(packed.agg(
          count(lit(1)).cast("long").as("n_train_seqs"),
          coalesce(sum(col("n_real")), lit(0L)).as("n_real_tokens"),
          coalesce(sum(col("n_pad")), lit(0L)).as("n_pad_tokens")))
        .select(
          col("n_shards_in"), col("n_shards_skipped"),
          (col("n_docs") + col("n_rejected_lines")).as("n_lines_in"),
          col("n_rejected_lines"), col("n_docs"),
          (col("n_docs") - col("n_keepers")).as("n_dup_dropped"),
          (col("n_keepers") - col("n_quality")).as("n_quality_dropped"),
          (col("n_quality") - col("n_non_bench")).as("n_bench_held"),
          (col("n_non_bench") - col("n_ngram_clean")).as("n_contam_ngram"),
          (col("n_ngram_clean") - col("n_survivors"))
            .as("n_contam_semantic"),
          col("n_survivors"), col("n_train_seqs"),
          col("n_real_tokens"), col("n_pad_tokens"))
    },

    // BYTE-alphabet BPE training — the production-tokenizer alphabet: base
    // symbols are the UTF-8 bytes of raw whitespace words (uppercase hex
    // pairs in the symbol strings), so digits, punctuation, CASING, and
    // non-Latin text all participate — nothing is out-of-alphabet, the
    // GPT-2 byte-alphabet property the [a-z] family lacks by construction.
    // Same vocab-scale fast trainer (BpeTrainer is alphabet-agnostic),
    // same argmax/tie-break/merge semantics, oracle-mirrored end to end.
    "train_bpe_bytes" -> { (s, dir) =>
      import s.implicits._
      learnBpeByteMergesCached(s, dir)
        .toDF("round", "lhs", "rhs", "merged", "pair_freq")
        .orderBy("round")
    },

    // BYTE-alphabet per-document token-id sequences: ids 0-255 ARE the
    // byte values, merge round k owns 255+k. Every whitespace word is
    // encodable — over-long or unseen words degrade toward per-byte ids
    // instead of silently dropping (what happened to '3.14', 'Hello', or
    // CJK text under the [a-z] tokenizer). Same broadcast-vocabulary
    // scale shape and audit projection as tokenize_bpe_ids.
    "tokenize_bpe_ids_bytes" -> { (s, dir) =>
      tokenIdsOfBytes(s, dir, learnBpeByteMergesCached(s, dir))
        .select(col("doc_id"),
          size(col("token_ids")).cast("long").as("n_ids"),
          expr("aggregate(token_ids, CAST(0 AS BIGINT), (a, x) -> a + x)")
            .as("sum_ids"),
          md5(concat_ws(",", col("token_ids").cast("array<string>")))
            .as("ids_md5"))
        .orderBy("doc_id")
    },

    // Fixed-length training rows over the BYTE-alphabet ids — the packing
    // discipline of pack_token_sequences with the byte id space's EOS/PAD
    // specials. Together with the two entries above this is the full
    // byte-level tokenizer-to-trainer path, oracle-gated at every stage.
    "pack_token_bytes" -> { (s, dir) =>
      packTokenIds(tokenIdsOfBytes(s, dir, learnBpeByteMergesCached(s, dir)),
          BpeByteEosId, BpeBytePadId)
        .select("bucket", "seq_id", "n_real", "n_pad", "ids_md5")
        .orderBy("bucket", "seq_id")
    },

    // The composed tokenizer pipeline: train (cached) → PERSIST the merge
    // table as a versioned BpeModel parquet artifact → load it back →
    // tokenize to ids → pack into training rows — i.e. the full
    // tokenizer-to-trainer path run through the on-disk model, not the
    // in-process cache (see [[persistedMerges]]). Output: one data-card
    // row per pack bucket, with a bucket_md5 folding every sequence's
    // content hash in seq order — the whole packed corpus pinned in
    // PackBuckets rows.
    "pipeline_tokenize_corpus" -> { (s, dir) =>
      packTokenIds(tokenIdsOf(s, dir, persistedMerges(s, dir)))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_seqs"),
          sum(col("n_real")).as("n_real_tokens"),
          sum(col("n_pad")).as("n_pad_tokens"),
          sort_array(collect_list(struct(col("seq_id"), col("ids_md5"))))
            .as("sh"))
        .select(col("bucket"), col("n_seqs"), col("n_real_tokens"),
          col("n_pad_tokens"),
          md5(concat_ws(",", expr("transform(sh, x -> x.ids_md5)")))
            .as("bucket_md5"))
        .orderBy("bucket")
    },

    // The byte alphabet under the PRODUCTION pre-tokenizer: words are
    // letter | digit | symbol RUNS (GPT-2's category-splitting idea), so
    // "Hello," trains and tokenizes as two pre-tokens — punctuation never
    // inflates the word vocabulary, digits cluster with digits. Same byte
    // base ids and merge machinery; only the word source differs, and the
    // oracle splits with the identical (RE2 ≡ Java) regex.
    "train_bpe_pretok" -> { (s, dir) =>
      import s.implicits._
      learnBpePretokMergesCached(s, dir)
        .toDF("round", "lhs", "rhs", "merged", "pair_freq")
        .orderBy("round")
    },

    "tokenize_bpe_ids_pretok" -> { (s, dir) =>
      tokenIdsOfPretok(s, dir, learnBpePretokMergesCached(s, dir))
        .select(col("doc_id"),
          size(col("token_ids")).cast("long").as("n_ids"),
          expr("aggregate(token_ids, CAST(0 AS BIGINT), (a, x) -> a + x)")
            .as("sum_ids"),
          md5(concat_ws(",", col("token_ids").cast("array<string>")))
            .as("ids_md5"))
        .orderBy("doc_id")
    },

    // pretok losslessness: decode ∘ encode of every pre-token, re-joined
    // with NOTHING between them, equals the concatenation of the
    // pre-tokens the regex extracts — again stated by the oracle without
    // modeling BPE
    "tokenize_roundtrip_pretok" -> { (s, dir) =>
      val merges = learnBpePretokMergesCached(s, dir)
      val ow = Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          posexplode(preTokWords).as(Seq("pos", "word")))
        .filter(col("word") =!= "")
      val wrt = ow.select("word").distinct()
        .select(col("word"),
          graft.exprs.functions.bpe_decode_byte_ids(
            graft.exprs.functions.bpe_encode_pretok_ids(col("word"), merges),
            merges).as("rt"))
      ow.join(broadcast(wrt), "word")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("pos"), col("rt")))).as("a"))
        .select(col("doc_id"),
          concat_ws("", expr("transform(a, x -> x.rt)")).as("rt"))
        .select(col("doc_id"),
          length(col("rt")).cast("long").as("n_chars"),
          md5(col("rt")).as("rt_md5"))
        .orderBy("doc_id")
    },

    // The GPT-2-COMPLETE pre-tokenizer tier: category runs PLUS the
    // contraction cases ('s 't 're 've 'm 'll 'd) and the space-prefix
    // convention (" the" is one pre-token), run over a CONTRACTION-HEAVY
    // derived corpus (the raw test corpus has no apostrophes — a literal
    // replace makes them ubiquitous, identically in both engines). Same
    // byte base ids and merge machinery; only the pre-tokenizer differs.
    "train_bpe_gpt2" -> { (s, dir) =>
      import s.implicits._
      learnBpeGpt2MergesCached(s, dir)
        .toDF("round", "lhs", "rhs", "merged", "pair_freq")
        .orderBy("round")
    },

    "tokenize_bpe_ids_gpt2" -> { (s, dir) =>
      tokenIdsOfGpt2(s, dir, learnBpeGpt2MergesCached(s, dir))
        .select(col("doc_id"),
          size(col("token_ids")).cast("long").as("n_ids"),
          expr("aggregate(token_ids, CAST(0 AS BIGINT), (a, x) -> a + x)")
            .as("sum_ids"),
          md5(concat_ws(",", col("token_ids").cast("array<string>")))
            .as("ids_md5"))
        .orderBy("doc_id")
    },

    // gpt2 losslessness — the STRONGEST roundtrip gate in the family:
    // the alternation tiles every character (whitespace runs included),
    // so decode ∘ encode of the pre-tokens re-joined equals the document
    // ITSELF bit-for-bit, which the oracle states as md5(text) — no
    // normalization, no BPE model, nothing
    "tokenize_roundtrip_gpt2" -> { (s, dir) =>
      val merges = learnBpeGpt2MergesCached(s, dir)
      val ow = Tables(s, dir, "documents")
        .withColumn("text", gpt2Text)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          posexplode(gpt2Words).as(Seq("pos", "word")))
        .filter(col("word") =!= "")
      val wrt = ow.select("word").distinct()
        .select(col("word"),
          graft.exprs.functions.bpe_decode_byte_ids(
            graft.exprs.functions.bpe_encode_gpt2_ids(col("word"), merges),
            merges).as("rt"))
      ow.join(broadcast(wrt), "word")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("pos"), col("rt")))).as("a"))
        .select(col("doc_id"),
          concat_ws("", expr("transform(a, x -> x.rt)")).as("rt"))
        .select(col("doc_id"),
          length(col("rt")).cast("long").as("n_chars"),
          md5(col("rt")).as("rt_md5"))
        .orderBy("doc_id")
    },

    // Tokenize with a RELEASED tokenizer (round 13): the checked-in
    // public merges.txt/vocab.json fixture imports through
    // BpeModel.importMerges into the versioned artifact and serves
    // through the SAME fused kernel and gpt2 pre-tokenizer tier — with
    // the RELEASED ids (base bytes included, whose vocab ids are NOT
    // the byte values, so this gate fails if anything still leans on
    // the engine id scheme). The oracle replays the fixture from VALUES
    // literals: merge table as data, every id from the vocab join.
    "tokenize_bpe_ids_imported" -> { (s, dir) =>
      val (merges, vocab) = importedModel(s)
      Tables(s, dir, "documents")
        .withColumn("text", gpt2Text)
        .filter(col("text").isNotNull && col("text") =!= "")
        .select(col("doc_id"),
          graft.exprs.functions.bpe_encode_imported_ids(
            col("text"), merges, vocab).as("token_ids"))
        .select(col("doc_id"),
          size(col("token_ids")).cast("long").as("n_ids"),
          expr("aggregate(token_ids, CAST(0 AS BIGINT), (a, x) -> a + x)")
            .as("sum_ids"),
          md5(concat_ws(",", col("token_ids").cast("array<string>")))
            .as("ids_md5"))
        .orderBy("doc_id")
    },

    // losslessness of the IMPORTED id space on the real corpus: decode ∘
    // encode equals the document itself (the gpt2 alternation tiles
    // every character, and import validated full byte coverage, so the
    // released vocab decodes everything it encodes)
    "tokenize_roundtrip_imported" -> { (s, dir) =>
      val (merges, vocab) = importedModel(s)
      Tables(s, dir, "documents")
        .withColumn("text", gpt2Text)
        .filter(col("text").isNotNull && col("text") =!= "")
        .select(col("doc_id"),
          graft.exprs.functions.bpe_decode_imported_ids(
            graft.exprs.functions.bpe_encode_imported_ids(
              col("text"), merges, vocab), merges, vocab).as("rt"))
        .select(col("doc_id"),
          length(col("rt")).cast("long").as("n_chars"),
          md5(col("rt")).as("rt_md5"))
        .orderBy("doc_id")
    },

    // The byte alphabet's LOSSLESSNESS as an oracle-gated operator: every
    // word encodes through the learned merges and DECODES back to its
    // exact bytes (bpe_decode_byte_ids inverts the id scheme), so
    // re-joining the decoded words reproduces the whitespace-normalized
    // document bit-for-bit — which the ORACLE can state WITHOUT modeling
    // BPE at all (normalize the text directly). An [a-z] tokenizer can
    // never pass this gate: everything outside its alphabet is destroyed.
    // The real end-to-end proof that no byte of the corpus is lost.
    "tokenize_roundtrip_bytes" -> { (s, dir) =>
      val merges = learnBpeByteMergesCached(s, dir)
      val ow = Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          posexplode(split(col("text"), "\\s+")).as(Seq("pos", "word")))
        .filter(col("word") =!= "")
      val wrt = ow.select("word").distinct()
        .select(col("word"),
          graft.exprs.functions.bpe_decode_byte_ids(
            graft.exprs.functions.bpe_encode_byte_ids(col("word"), merges),
            merges).as("rt"))
      ow.join(broadcast(wrt), "word")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("pos"), col("rt")))).as("a"))
        .select(col("doc_id"),
          concat_ws(" ", expr("transform(a, x -> x.rt)")).as("rt"))
        .select(col("doc_id"),
          length(col("rt")).cast("long").as("n_chars"),
          md5(col("rt")).as("rt_md5"))
        .orderBy("doc_id")
    },

    // The BYTE-alphabet composed pipeline: train bytes (cached) → persist
    // as a versioned BpeModel at the byte-model root → load back →
    // tokenize to byte ids → pack with the byte EOS/PAD — the full
    // production-alphabet tokenizer-to-trainer path through the on-disk
    // artifact, same data-card output contract as pipeline_tokenize_corpus.
    "pipeline_tokenize_bytes" -> { (s, dir) =>
      packTokenIds(tokenIdsOfBytes(s, dir, persistedByteMerges(s, dir)),
          BpeByteEosId, BpeBytePadId)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_seqs"),
          sum(col("n_real")).as("n_real_tokens"),
          sum(col("n_pad")).as("n_pad_tokens"),
          sort_array(collect_list(struct(col("seq_id"), col("ids_md5"))))
            .as("sh"))
        .select(col("bucket"), col("n_seqs"), col("n_real_tokens"),
          col("n_pad_tokens"),
          md5(concat_ws(",", expr("transform(sh, x -> x.ids_md5)")))
            .as("bucket_md5"))
        .orderBy("bucket")
    },

    // Deterministic train/val/test split — the leakage-safe corpus cut
    // every training run starts with: the split is a pure function of a
    // 16-bit md5 slice of doc_id, so it is stable under repartitioning,
    // re-runs, and engine changes (the oracle reproduces it bit-for-bit),
    // and a document can never migrate between splits as the corpus grows.
    // Zero-exchange projection (the output sort is the driver compare's).
    // 8/1/1 via integer thresholds on the 16-bit value.
    "split_corpus" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      d.select(col("doc_id"), col("lang"), splitBucket.as("bucket"))
        .withColumn("split", splitOf(col("bucket")))
        .orderBy("doc_id")
    },

    // Deterministic corpus shuffle + sharding — the "global shuffle before
    // training" step done scalably: assign each document a shard by hash
    // and a position by per-shard hash rank. No global sort exists at any
    // scale: ordering is per-shard (window over the shard partition), and
    // shards are written in parallel. Reading shards round-robin yields
    // the same training order on any cluster size.
    "shuffle_corpus" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val h = md5(concat(lit("shuf:"), col("doc_id").cast("string")))
      val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      d.select(col("doc_id"), h.as("h"))
        .withColumn("shard",
          (conv(substring(col("h"), 1, 4), 16, 10) % ShuffleShards)
            .cast("long"))
        .withColumn("pos_in_shard", row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos_in_shard")
        .orderBy("doc_id")
    },

    // Corpus vocabulary: top-K tokens by occurrence count, with document
    // frequency. The canonical "what is this corpus made of" profile (and
    // the input to stopword/boilerplate lists). Scale shape: explode is
    // linear, the groupBy partial-aggregates map-side (hot tokens collapse
    // to one row per partition before the exchange), and the top-K is
    // TakeOrderedAndProject — per-partition heaps, never a global sort.
    // Deterministic through the cut: ties break on token ASC.
    // The PERSISTED lexical index ([[graft.operators.SearchIndex]]): the
    // serving path — load the token-bucket-partitioned postings from disk
    // and answer the same query search_tfidf computes ad-hoc, with ZERO
    // corpus rescan and the scan statically pruned to the query terms'
    // buckets. Build+save once per corpus (fingerprint cache); the
    // measured query is load + search. Identical fixed-point arithmetic
    // ⇒ the search_tfidf oracle gates it bit-for-bit.
    "search_index_persisted" -> { (s, dir) =>
      val idx = loadSearchIndex(s, dir)
      graft.operators.SearchIndex.search(idx, SearchTerms, 20)
    },

    // BM25 retrieval from the SAME persisted index (k1=1.2, b=0.75,
    // Robertson idf) — what a serving tier actually ranks with: TF
    // saturation plus length normalization, which plain TF-IDF lacks.
    // Fixed-point discipline unchanged: one quantized ln per distinct
    // term, every other operand an exact integer in IEEE doubles with
    // PINNED parenthesization (mirrored verbatim in the oracle), floor
    // per (doc, term), exact BIGINT sums. Same pruned-scan shape as the
    // TF-IDF path; dl rides each posting, avgdl comes from the meta
    // totals, so the length normalization costs no extra scan.
    "search_bm25" -> { (s, dir) =>
      val idx = loadSearchIndex(s, dir)
      graft.operators.SearchIndex.searchBm25(idx, SearchTerms, 20)
    },

    // EXACT-PHRASE retrieval from the positional postings — the query
    // class bag-of-words ranking can't express (order + adjacency).
    // Start-position fold over per-doc position maps; overlapping
    // matches count; the scan is pruned to the phrase terms' buckets.
    // The oracle counts the same phrase via an adjacency self-join.
    "search_phrase" -> { (s, dir) =>
      val idx = loadSearchIndex(s, dir)
      graft.operators.SearchIndex.searchPhrase(idx, PhraseTerms, 20)
    },

    // Ranked lexical retrieval: per-document TF-IDF for a literal query
    // term set, top-20 by score — classic keyword search as one
    // declarative plan. IDF is fixed-point quantized (floor at 1e-6, the
    // text_perplexity discipline) so scores sum as exact BIGINTs and the
    // driver hash-compare holds. Scale shape: the isin filter cuts the
    // token explode to MATCHED rows before anything shuffles (predicate
    // inside the generate stage), per-(doc, term) counts collapse
    // map-side, and the idf model is query-term-sized — broadcast at any
    // corpus scale. Top-20 is a TakeOrdered, never a global sort.
    "search_tfidf" -> { (s, dir) =>
      val d = Tables.spread(
        Tables(s, dir, "documents").filter(col("text").isNotNull))
      val tf = d
        .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
        .filter(col("tok").isin(SearchTerms: _*))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      val idf = tf.groupBy("tok")
        .agg(countDistinct(col("doc_id")).as("df"))
        .crossJoin(d.agg(count(lit(1)).as("n")))
        .select(col("tok"),
          floor(log(col("n").cast("double") / col("df").cast("double"))
            * 1000000L).cast("long").as("idf_q6"))
      tf.join(broadcast(idf), "tok")
        .groupBy("doc_id")
        .agg(sum(col("cnt") * col("idf_q6")).as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(20)
        .select("doc_id", "score")
    },

    "text_vocab" -> { (s, dir) =>
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
      d.select(col("doc_id"), explode(toks(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n_occurrences"),
          count_distinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n_occurrences").desc, col("token"))
        .limit(VocabTopK)
    },

    // Heavy hitters, EXACT at bounded memory: a native Misra–Gries
    // aggregate (exprs/SketchAggs.scala, capacity 1024) carries a fixed
    // ≤1024-entry buffer per partition — never the distinct-token universe
    // — and its guarantee (every item with frequency > n/1025 survives)
    // makes the candidate set a proven superset of everything above the
    // n/512 report threshold. A broadcast-joined exact recount over the
    // ≤1024 candidates then yields exactly the tokens with cnt·512 > n:
    // the oracle states the plain full-aggregation SQL, and the sketch
    // path must reproduce it bit-for-bit. This is the 100 TB shape for
    // "what are the stop-words of this corpus": two linear scans, no
    // vocabulary-sized shuffle.
    "text_heavy_hitters" -> { (s, dir) =>
      val tokens = Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(explode(toks(col("text"))).as("token"))
      // the corpus total rides the SAME pass as the sketch — the entry
      // is two linear scans total (sketch+total, then the recount)
      val sketch = tokens.agg(
        graft.exprs.functions.misra_gries(col("token"), HhCapacity).as("c"),
        count(lit(1)).as("total"))
      val cands = sketch.select(explode(col("c")).as("token"), col("total"))
      tokens.join(broadcast(cands), "token")
        .groupBy("token", "total").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * HhDivisor > col("total"))
        .select(col("token"), col("cnt"))
        .orderBy(col("cnt").desc, col("token"))
    },

    // Per-group heavy hitters: the MG aggregate composes with groupBy —
    // one bounded buffer PER LANGUAGE rides the same partial/final
    // aggregation, and the exact recount joins back on (lang, token).
    // Same guarantee arithmetic per group (each group's n is its own).
    "text_heavy_hitters_by_lang" -> { (s, dir) =>
      val tokens = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("lang").isNotNull)
        .select(col("lang"), explode(toks(col("text"))).as("token"))
      // per-group sketch and per-group total in ONE aggregation pass
      val cands = tokens.groupBy("lang")
        .agg(graft.exprs.functions.misra_gries(col("token"), HhCapacity).as("c"),
          count(lit(1)).as("total"))
        .select(col("lang"), explode(col("c")).as("token"), col("total"))
      tokens.join(broadcast(cands), Seq("lang", "token"))
        .groupBy("lang", "token", "total").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * HhDivisor > col("total"))
        .select(col("lang"), col("token"), col("cnt"))
        .orderBy(col("lang"), col("cnt").desc, col("token"))
    },

    // Multi-keyword substring scan: ONE Aho–Corasick pass over the corpus
    // counts every (overlapping) occurrence of every watch-list keyword —
    // the naive plan is |keywords| independent substring scans (k passes
    // over a 100 TB corpus); the automaton is one, as a codegen'd
    // expression with the trie riding as a reference object. Oracle:
    // DuckDB counts occurrences position-by-position (substr equality at
    // every start), which is exactly the overlap-counting semantics.
    "text_keyword_scan" -> { (s, dir) =>
      val table = new graft.exprs.KeywordTable(ScanKeywords)
      val kw = s.createDataFrame(
        ScanKeywords.zipWithIndex.map { case (k, i) => (i, k) })
        .toDF("kid", "kw")
      Tables(s, dir, "documents").filter(col("text").isNotNull)
        .select(graft.exprs.functions.keyword_scan(col("text"), table).as("c"))
        .select(posexplode(col("c")).as(Seq("kid", "n")))
        .groupBy("kid")
        .agg(sum(col("n")).as("total_occurrences"),
          count(when(col("n") > 0, 1)).as("n_docs"))
        .join(broadcast(kw), "kid")
        .select(col("kw"), col("total_occurrences"), col("n_docs"))
        .orderBy("kw")
    },

    // Count-min-sketch vocabulary: the bounded-memory path for corpus
    // frequency profiling. The exact text_vocab aggregate carries one row
    // per distinct token through the shuffle; the sketch carries AT MOST
    // CmDepth*CmWidth rows no matter how large the vocabulary grows —
    // that's what survives a 100 TB corpus with a web-scale token tail.
    // Each token increments CmDepth buckets (md5-slice hashes); a point
    // estimate is the min over its rows, a guaranteed OVERESTIMATE
    // (asserted in PipelineOpsSpec). Output: the true top-K tokens with
    // their exact count, sketch estimate, and whether the sketch was
    // collision-free — the accuracy audit a real pipeline runs before
    // trusting the sketch at full scale. Oracle-exact: both engines
    // compute identical bucket sums and mins.
    "text_vocab_sketch" -> { (s, dir) =>
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
      val freq = d
        .select(explode(toks(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("tf"))
      // (row, bucket) probe rows for the current token — CmDepth per token
      def rbProbes: Column = explode(array((0 until CmDepth).map(i =>
        struct(lit(i).as("row"),
          (conv(substring(md5(col("token")), 1 + 4 * i, 4), 16, 10)
            .cast("long") % CmWidth).as("bucket"))): _*))
      // ONE corpus aggregation feeds both the sketch build and the top-K
      // cut (identical freq subplans — exchange-reused); the 3072-row
      // sketch broadcasts ONCE and the top-K side probes all CmDepth rows
      // through a single join + min. (The first formulation built one
      // broadcast per sketch row, each recomputing the corpus aggregation:
      // 0.83s → this shape benches ~0.6s at sf0.1.)
      val sketch = freq
        .select(col("tf"), rbProbes.as("rb"))
        .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
        .agg(sum(col("tf")).as("cnt"))
      freq.orderBy(col("tf").desc, col("token")).limit(VocabTopK)
        .select(col("token"), col("tf"), rbProbes.as("rb"))
        .select(col("token"), col("tf"),
          col("rb.row").as("row"), col("rb.bucket").as("bucket"))
        .join(broadcast(sketch), Seq("row", "bucket"))
        .groupBy("token", "tf")
        .agg(min(col("cnt")).as("cm_est"))
        .withColumn("is_exact", col("cm_est") === col("tf"))
        .select("token", "tf", "cm_est", "is_exact")
        .orderBy(col("tf").desc, col("token"))
    },

    // Lexical rarity profile: per-document counts of corpus-rare tokens
    // (frequency ≤ RareTf — misspellings, junk, OCR noise) and corpus-common
    // tokens (≥ CommonTf) — the Zipf-tail signals rare-token quality filters
    // gate on. Two-pass by nature (corpus frequencies, then per-doc re-scan).
    // Scale shape: duplicate tokens collapse per (doc, token) BEFORE any
    // join; the tag join is keyed on the token and left to the planner —
    // the tag side is small here (broadcast), and at 100 TB a shuffled join
    // on token stays safe because tags carry one row per token (no
    // amplification; AQE splits the hot-token partitions).
    "text_rarity" -> { (s, dir) =>
      val d = Tables.spread(
        Tables(s, dir, "documents").filter(col("text").isNotNull))
      val docTok = d
        .select(col("doc_id"), explode(toks(col("text"))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      val freq = docTok.groupBy("token").agg(sum(col("c")).as("tf"))
      val tags = freq.filter(col("tf") <= RareTf || col("tf") >= CommonTf)
      docTok.join(tags, Seq("token"), "left")
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_tokens"),
          sum(when(col("tf") <= RareTf, col("c")).otherwise(lit(0L)))
            .as("n_rare"),
          sum(when(col("tf") >= CommonTf, col("c")).otherwise(lit(0L)))
            .as("n_common"))
        .withColumn("rare_frac",
          col("n_rare").cast("double") / col("n_tokens"))
        .orderBy("doc_id")
    },

    // Training-sequence packing, concat-and-chunk discipline: documents are
    // hashed into independent pack streams, deterministically ordered within
    // each stream (content-independent md5 shuffle, like sample_stratified),
    // concatenated, and sliced into fixed PackBudget-token sequences — the
    // standard GPT-style pretraining pack where documents may straddle
    // sequence boundaries. Output maps every document to its token offset
    // and the sequence range it lands in. Scale shape: one window cumsum per
    // bucket (PackBuckets-way parallel, no global order), all-BIGINT math;
    // at 100 TB buckets are the shuffle key and each stream packs
    // independently — adding executors adds buckets, never a global sort.
    "pack_sequences" -> { (s, dir) =>
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
      packAssignments(d.select(col("doc_id"),
        (col("doc_id") % PackBuckets).as("bucket"),
        size(toks(col("text"))).cast("long").as("n_tokens")))
    },

    // Boundary-respecting BEST-FIT packing (round 13): first-fit-
    // decreasing within hash buckets — the packing shape used when
    // cross-document attention is MASKED: a document never straddles a
    // sequence boundary (pack_sequences' concat-and-chunk splits them),
    // and padding waste is what FFD exists to minimize. Each doc carries
    // one EOS (n_eff = min(n_tokens + 1, budget); longer docs truncate
    // to one full sequence of their own). The assignment is fully
    // deterministic — (n_eff DESC, doc_id) order, first bin that fits in
    // bin-creation order — so the DuckDB oracle REPLAYS it exactly with
    // a recursive CTE over the same order. Output: one row per doc with
    // its (bucket, seq) plus the sequence's fill and padding fraction
    // ((budget − used)/budget — budget is a power of two, the division
    // is exact IEEE on both engines).
    //
    // Scale shape: buckets are the shuffle key and pack independently —
    // at 100 TB, size PackBuckets to the cluster (buckets ARE the
    // parallelism) and the per-group state is one bin-remainder list
    // (≤ docs/bucket longs, only as long as FFD keeps bins open). FFD
    // itself is the genuinely-sequential-per-group kernel: no window or
    // join expresses "first bin that fits", so this is the documented
    // mapGroups-as-last-resort case — flatMapSortedGroups streams each
    // bucket in sorted order with nothing else materialized.
    "pack_best_fit" -> { (s, dir) =>
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id").cast("long").as("doc_id"),
          (col("doc_id") % PackBuckets).cast("long").as("bucket"),
          size(toks(col("text"))).cast("long").as("n_tokens"))
        .withColumn("n_eff",
          least(col("n_tokens") + 1L, lit(PackBudget.toLong)))
      ffdAssign(s, d, PackBudget.toLong)
        .withColumn("seq_used",
          sum(col("n_eff")).over(Window.partitionBy("bucket", "seq")))
        .withColumn("pad_frac",
          (lit(PackBudget.toLong) - col("seq_used")).cast("double")
            / lit(PackBudget.toDouble))
        .select("doc_id", "bucket", "seq", "n_tokens", "n_eff",
          "seq_used", "pad_frac")
        .orderBy("doc_id")
    },

    // Context-window chunking: split each document into overlapping
    // token windows (ChunkTokens wide, ChunkStride apart — the long-doc →
    // training-sequence / RAG-passage splitter that complements
    // pack_sequences' short-doc packing). Pure per-document projection:
    // one Generate over chunk starts, slice + concat from the SAME token
    // array — no shuffle except the output sort; chunk count is integer
    // arithmetic (ceil via (n-W+S-1) div S) so the oracle agrees exactly.
    // At 100 TB the explode multiplies rows by ~n/S but each output chunk
    // is emitted by its own document's partition — linear, no exchange.
    "chunk_documents" -> { (s, dir) =>
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
      val t = d.select(col("doc_id"), toks(col("text")).as("w"))
        .withColumn("n", size(col("w")))
      t.withColumn("n_chunks",
          when(col("n") <= ChunkTokens, lit(1)).otherwise(
            expr(s"CAST((n - $ChunkTokens + ${ChunkStride - 1})" +
              s" DIV $ChunkStride AS INT) + 1")))
        .select(col("doc_id"), col("w"), col("n"),
          explode(sequence(lit(0), col("n_chunks") - 1)).as("k"))
        .select(col("doc_id"),
          col("k").cast("long").as("chunk_idx"),
          (col("k") * ChunkStride).cast("long").as("start_tok"),
          least(col("n") - col("k") * ChunkStride, lit(ChunkTokens))
            .cast("long").as("chunk_tokens"),
          concat_ws(" ",
            slice(col("w"), col("k") * ChunkStride + 1, lit(ChunkTokens)))
            .as("chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    },

    // Unigram-LM negative log-likelihood scoring — the CCNet/Gopher-style
    // "perplexity" quality signal, here against the corpus's own unigram
    // model. Float-sum order is engine-dependent, so the per-token
    // -ln(tf/N) is quantized to fixed-point (floor at 1e-6 resolution) and
    // summed as exact BIGINTs — the SUM is associative and partition-
    // independent; only the final per-doc average divides in double.
    // Honest caveat: ln() itself is each engine's libm, so a value landing
    // within ~1 ulp of an integer boundary could floor apart — probability
    // ~1e-10 per DISTINCT token (not per row), re-checked by the oracle
    // gate at every SF rather than assumed away.
    // Scale shape: the unigram model is vocab-sized (broadcast); per-doc
    // counts collapse map-side before the join, like text_rarity.
    "text_perplexity" -> { (s, dir) =>
      val d = Tables.spread(
        Tables(s, dir, "documents").filter(col("text").isNotNull))
      val docTok = d
        .select(col("doc_id"), explode(toks(col("text"))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      val freq = docTok.groupBy("token").agg(sum(col("c")).as("tf"))
      val model = freq.crossJoin(
          freq.agg(sum(col("tf")).as("n_corpus")))
        .select(col("token"),
          floor(-log(col("tf").cast("double") / col("n_corpus").cast("double"))
            * NllScale).cast("long").as("nll_tok"))
      // pin the build side: the model is vocab-sized (broadcast-able at any
      // corpus scale), while docTok grows with the corpus — size stats at
      // tiny SF would otherwise flip the broadcast onto the doc side
      docTok.join(broadcast(model), Seq("token"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_tokens"),
          sum(col("c") * col("nll_tok")).as("nll_scaled"))
        .withColumn("avg_nll",
          col("nll_scaled").cast("double") / NllScale.toDouble
            / col("n_tokens").cast("double"))
        .select("doc_id", "n_tokens", "nll_scaled", "avg_nll")
        .orderBy("doc_id")
    },

    // Bigram-LM perplexity: conditional add-1-smoothed bigram NLL —
    // the unigram operator's sequel, sensitive to word ORDER (scrambled
    // text scores near-vocabulary-uniform here while unigram can't tell).
    // Same fixed-point discipline (floor at 1e-6, exact BIGINT sums).
    // Scale shape: bigrams come from one zipped-slice projection (no
    // per-token window, no lag shuffle); the model is distinct-bigram-
    // sized — bigger than the unigram vocab, so the model join is LEFT to
    // Catalyst/AQE (broadcast while it fits, shuffled-hash beyond) rather
    // than force-broadcast.
    "text_perplexity_bigram" -> { (s, dir) =>
      val d = Tables.spread(
        Tables(s, dir, "documents").filter(col("text").isNotNull))
      val bg = d.select(col("doc_id"), toks(col("text")).as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(a) - 1), i -> concat(a[i-1], ' ', a[i]))"))
          .as("bg"))
      val dbg = bg.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      val model = bigramNllModel(d, dbg)
      dbg.join(model, "bg")
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_bigrams"),
          sum(col("c") * col("nll_bg")).as("nll_scaled"))
        .withColumn("avg_nll",
          col("nll_scaled").cast("double") / NllScale.toDouble
            / col("n_bigrams").cast("double"))
        .select("doc_id", "n_bigrams", "nll_scaled", "avg_nll")
        .orderBy("doc_id")
    },

    // Corpus collocations: top bigrams by pointwise mutual information —
    // the "which adjacent words belong together" profile a tokenizer/
    // vocab-curation pass reads (merge candidates, multi-word entities).
    // PMI = ln(p(ab) / (p(a)·p(b))) with unigram probabilities over the
    // token stream and the bigram probability over the bigram stream; the
    // ratio is computed as ONE pinned chain of correctly-rounded double
    // ops ((c_ab·N/c_a)·(N/c_b)/N_bg — identical parenthesization in the
    // oracle) and only the final ln is quantized (floor at 1e-6, the
    // perplexity discipline). Rare-pair noise is cut by MinColloc.
    // Scale shape: zipped-slice bigrams (no window), two vocab-sized
    // aggregates, TakeOrdered top-K.
    "text_collocations" -> { (s, dir) =>
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
      val toksDf = d.select(explode(toks(col("text"))).as("t"))
      val uni = toksDf.groupBy("t").agg(count(lit(1)).as("c"))
      val totals = toksDf.agg(count(lit(1)).as("n_tok"))
      val bg = d.select(toks(col("text")).as("a"))
        .filter(size(col("a")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(a) - 1), i -> concat(a[i-1], ' ', a[i]))"))
          .as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= MinColloc)
        .withColumn("w1", substring_index(col("bg"), " ", 1))
        .withColumn("w2", substring_index(col("bg"), " ", -1))
      val nBg = d.select(toks(col("text")).as("a"))
        .filter(size(col("a")) >= 2)
        .agg(sum(size(col("a")) - 1).as("n_bg"))
      bg.join(uni.select(col("t").as("w1"), col("c").as("c_a")), "w1")
        .join(uni.select(col("t").as("w2"), col("c").as("c_b")), "w2")
        .crossJoin(totals).crossJoin(nBg)
        .withColumn("pmi_q6",
          floor(log(
            col("c_ab").cast("double") * col("n_tok") / col("c_a")
              * (col("n_tok").cast("double") / col("c_b"))
              / col("n_bg")) * 1000000L).cast("long"))
        .select(col("bg").as("bigram"), col("c_ab"), col("c_a"), col("c_b"),
          col("pmi_q6"))
        .orderBy(col("pmi_q6").desc, col("bigram")).limit(50)
    },

    // MODEL-BASED quality classifier — the CCNet/GPT-3-style learned filter
    // (a linear classifier over token features), here trained end-to-end
    // inside the engine as multinomial Naive Bayes with Laplace smoothing:
    // weak labels come from a deterministic heuristic (stop-word ratio ≥
    // NbStopPct% — the integer form 100·n_stop ≥ NbStopPct·n_tokens, exact
    // in both engines), class-conditional token counts give per-token
    // log-odds weights, and scoring is a broadcast join + BIGINT sum.
    // Floats are handled exactly like text_perplexity: each weight
    // floor-quantizes (ln((c1+1)/(N1+V)) − ln((c0+1)/(N0+V)))·NbScale to a
    // BIGINT once per DISTINCT token, so the per-doc score SUM is
    // associative and partition-independent; the ~1-ulp ln boundary caveat
    // (see text_perplexity's note) applies per distinct token and is
    // re-checked by the oracle gate at every SF.
    // Scale shape: the model (weights + prior) is vocab-sized and
    // broadcast; per-doc token counts collapse map-side before every join;
    // the class-count aggregation is one tiny (token → 2 longs) shuffle.
    // The docTok subtree appears in both the train and score paths with
    // identical canonical form; AQE runtime stage reuse collapses its
    // seven logical appearances to TWO physical corpus scans (executed
    // isFinalPlan=true dump: ReusedExchange ×8, Scan parquet ×2) — the
    // inherent train-pass + score-pass floor of any learned filter.
    "classify_quality_nb" -> { (s, dir) =>
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
      val docTok = d
        .select(col("doc_id"), explode(toks(col("text"))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      val (docLab, weights, prior) = nbModelParts(docTok)
      docTok.join(broadcast(weights), Seq("token"))
        .groupBy("doc_id").agg(sum(col("c") * col("w")).as("w_sum"))
        .crossJoin(broadcast(prior))
        .join(docLab, Seq("doc_id"))
        .select(col("doc_id"), col("label"), col("n_tokens"),
          (col("w_sum") + col("prior")).as("score_scaled"),
          (col("w_sum") + col("prior") > 0).cast("int").as("pred"))
        .orderBy("doc_id")
    },

    // Gopher-style composite quality gate (Rae et al. 2021 §A1.1 subset):
    // word count, mean word length, stop-word ratio, top-token fraction,
    // duplicate-bigram fraction — each surfaced as its value plus the final
    // keep verdict, so downstream pipelines can re-threshold without a
    // re-scan. The two fused kernels compute every signal inside the scan
    // stage: a pure projection, zero exchanges beyond the output sort.
    "pipeline_gopher_filter" -> { (s, dir) =>
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
      d.select(col("doc_id"),
          // exact sum of token lengths — NOT the (n_chars - separators)
          // shortcut text_quality reports, which assumes single-space
          // separators; this value GATES keep, so whitespace formatting
          // must not be able to flip it. Computed as length(text minus all
          // whitespace): identical to summing split-token lengths, but a
          // pure codegen string op instead of an interpreted aggregate()
          // lambda (ArrayAggregate is CodegenFallback).
          length(regexp_replace(col("text"), "\\s+", "")).cast("long")
            .as("n_token_chars"),
          graft.exprs.functions.token_stats(
            toks(col("text")), stopsLit, noWords).as("st"),
          graft.exprs.functions.repetition_stats(toks(col("text"))).as("r"))
        .select(col("doc_id"),
          col("st.n_words").as("n_words"),
          (col("n_token_chars").cast("double")
            / col("st.n_words")).as("avg_word_len"),
          (col("st.n_stop").cast("double") / col("st.n_words"))
            .as("stop_ratio"),
          (col("r.top_cnt").cast("double") / col("r.n_tokens").cast("double"))
            .as("top_frac"),
          when(col("r.n_bigrams") > 0,
            lit(1.0) - col("r.n_distinct_bigrams").cast("double") /
              col("r.n_bigrams").cast("double"))
            .otherwise(lit(0.0)).as("dup_bigram_frac"))
        .withColumn("keep",
          col("n_words") >= 20 && col("avg_word_len") >= 3.0 &&
            col("avg_word_len") <= 10.0 && col("stop_ratio") >= 0.05 &&
            col("top_frac") <= 0.2 && col("dup_bigram_frac") <= 0.3)
        .orderBy("doc_id")
    },

    // Deterministic data mixing with fractional upsampling — the Pile/
    // Dolma-style "source weights" step: each source carries a sampling
    // weight (derived here from the source id so both engines inline the
    // identical table; production passes a real weight map), a document
    // appears floor(w) times plus one more iff its content-independent
    // hash fraction falls under frac(w) — deterministic across runs,
    // engines, and cluster sizes, integer math throughout (weights in
    // halves, hash threshold at 32768/65536). Scale shape: pure projection
    // + explode bounded by ceil(w) — no shuffle except the output sort;
    // expected copies per source converge to weight × n_docs (spec-checked).
    "mix_corpus" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      d.select(col("doc_id"), col("source"),
          // 2-arg substring (to end of string): same parse as the
          // oracle's substr(source, 4) for ANY suffix length
          (lit(1) + expr("CAST(substring(source, 4) AS INT) % 4")).as("w2"),
          conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long").as("hex16"))
        .withColumn("n_copies", expr("w2 DIV 2") +
          when(col("w2") % 2 === 1 && col("hex16") < 32768L, 1L)
            .otherwise(0L))
        .filter(col("n_copies") > 0)
        .select(col("doc_id"), col("source"),
          (col("w2") / lit(2.0)).as("weight"), col("n_copies"),
          explode(sequence(lit(0L), col("n_copies") - 1)).as("copy_idx"))
        .orderBy("doc_id", "copy_idx")
    },

    // Fingerprinting: normalize (lowercase, strip punct, collapse ws) -> md5;
    // 4-hex-char prefix as the shard bucket.
    "text_fingerprint" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val normalized = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
      d.select(col("doc_id"),
        md5(normalized).as("fingerprint"),
        substring(md5(normalized), 1, 4).as("bucket"))
        .orderBy("doc_id")
    },

    // End-to-end corpus cleaning — the composition the pipeline operators
    // exist for: quality gate -> exact-dedup keepers -> language ID ->
    // per-language corpus stats. ONE token_stats call feeds both the gate
    // (n_words/n_stop) and the language vote (marker hits), so the whole
    // pipeline is: scan -> md5-keeper window -> filters -> 5-key groupBy.
    // Two exchanges total, neither carrying exploded word rows. (Round 1:
    // explode + three groupBy/window shuffles + three doc_id joins.)
    "pipeline_clean_corpus" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      d.select(col("doc_id"), col("text"),
          graft.exprs.functions.token_stats(
            toks(col("text")), stopsLit, markersLit).as("st"))
        // keeper is min(doc_id) over the WHOLE corpus per content hash —
        // computed before the quality gate, exactly like the old `keep` CTE
        .withColumn("keeper",
          min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
        .filter(col("doc_id") === col("keeper"))
        .filter(col("st.n_words") >= 20 && col("st.n_stop") > 0)
        .withColumn("best", bestLang(col("st")))
        .withColumn("pred_lang",
          when(col("best.cnt") > 0, col("best.lang")).otherwise(lit("und")))
        .groupBy("pred_lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("st.n_words")).as("total_words"),
          sum(length(col("text")).cast("long")).as("total_chars"))
        .orderBy("pred_lang")
    },

    // The end-to-end pretraining data job: exact-dedup keepers -> quality
    // gate -> sequence packing. What a training-data team actually ships:
    // documents that survive dedup and the gate land, deterministically
    // shuffled, in fixed-budget training sequences. One token_stats kernel
    // feeds the gate; three exchanges total (keeper hash, pack bucket,
    // output sort), none carrying exploded token rows.
    "pipeline_pack_corpus" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      packAssignments(d.select(col("doc_id"), col("text"),
          graft.exprs.functions.token_stats(
            toks(col("text")), stopsLit, noWords).as("st"))
        .withColumn("keeper",
          min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
        .filter(col("doc_id") === col("keeper"))
        .filter(col("st.n_words") >= 20 && col("st.n_stop") > 0)
        .select(col("doc_id"),
          (col("doc_id") % PackBuckets).as("bucket"),
          col("st.n_words").as("n_tokens")))
    },

    // Winnowing fingerprints (rolling k-gram hashes, min per window of W) —
    // the standard near-dup/plagiarism sketch: two documents share a
    // fingerprint iff they share a k-gram that wins a window, robust to
    // insertions. One explode (linear) + one per-doc window pass; at scale
    // the fingerprint table is the join key for candidate pairing.
    "text_winnow" -> { (s, dir) =>
      // one fused pass per document (graft.exprs.TextOps): k=8 byte grams,
      // md5-prefix hashes, w=16 sliding min via a monotone deque, distinct.
      // Replaces the round-1 row-per-byte explode + doc_id shuffle + window
      // sort — the md5 work is identical (and so is the oracle, which still
      // runs the relational formulation in DuckDB), but no row amplification
      // reaches the engine. The corpus is ASCII so byte grams == char grams.
      val d = Tables(s, dir, "documents")
      d.select(col("doc_id"),
          explode(graft.exprs.functions.winnow_fps(
            encode(lower(regexp_replace(col("text"), "\\s+", " ")), "utf-8")))
            .as("fp"))
        .orderBy("doc_id", "fp")
    },

    // Multimodal plumbing: opaque binary column + typed metadata extraction.
    // The real decode would be a mapPartitions batch op over the binary
    // column (see graft.multimodal.MultimodalPipeline); here the "decode" is
    // the deterministic stub so the schema/plumbing is exercised end-to-end.
    "multimodal_meta" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      d.select(col("doc_id"), encode(col("text"), "utf-8").as("blob"),
        col("source"))
        .withColumn("n_bytes", length(col("blob")))
        .withColumn("media_type",
          when(col("n_bytes") % 3 === 0, "image")
            .when(col("n_bytes") % 3 === 1, "audio")
            .otherwise("video"))
        // deterministic fake decode (no media libs in this environment):
        .withColumn("width", (col("n_bytes") % 640).cast("int"))
        // ×7 in long — the int product overflows past ~306 MB blobs while
        // the oracle computes in BIGINT
        .withColumn("height",
          ((col("n_bytes").cast("long") * 7) % 480).cast("int"))
        .select("doc_id", "source", "n_bytes", "media_type", "width", "height")
        .orderBy("doc_id")
    },

    // The ACTUAL MultimodalPipeline transforms under the correctness gate
    // (not just the inline projection above): each runs the typed Dataset +
    // mapPartitions path with the deterministic codec, whose outputs are
    // pure arithmetic over the blob bytes — i.e., expressible in the
    // oracle's SQL. Swapping in a real codec changes none of this plumbing
    // (MultimodalSpec pins the real imageio/WAV codecs against golden
    // fixtures; DuckDB can't decode PNG, so that half lives in specs).
    "multimodal_decode" -> { (s, dir) =>
      import graft.multimodal.MultimodalPipeline
      MultimodalPipeline.decodeImages(MultimodalPipeline.fromDocuments(s, dir))
        .select(col("id"), col("width"), col("height"), col("channels"),
          length(col("pixels")).as("n_pixels"))
        .orderBy("id")
    },

    "multimodal_frames" -> { (s, dir) =>
      import graft.multimodal.MultimodalPipeline
      MultimodalPipeline.sampleFrames(MultimodalPipeline.fromDocuments(s, dir))
        .select(col("id"),
          size(col("frameIndexes")).as("n_frames"),
          expr("aggregate(transform(frames, f -> length(f)), 0L," +
            " (a, b) -> a + CAST(b AS BIGINT))").as("total_frame_bytes"))
        .orderBy("id")
    },

    "multimodal_audio" -> { (s, dir) =>
      import graft.multimodal.MultimodalPipeline
      val f = MultimodalPipeline.extractAudioFeatures(
        MultimodalPipeline.fromDocuments(s, dir))
      f.select(Seq(col("id"), col("sampleRate").as("sample_rate"),
        col("durationMs").as("duration_ms")) ++
        (0 until 8).map(i => element_at(col("embedding"), i + 1).as(s"e$i")): _*)
        .orderBy("id")
    },

    // Data-card report: the per-(source, lang) corpus summary every intake
    // run publishes next to its output — volume (docs/tokens/chars), length
    // range, and exact-dup pressure (distinct md5(text) vs doc count).
    // Scale shape: hash BEFORE the aggregate so the shuffle carries 32-hex
    // digests, one groupBy whose non-distinct aggregates partial-aggregate
    // map-side and whose count_distinct runs Spark's standard two-phase
    // partial-distinct; output is one row per (source, lang) — a broadcast-
    // sized data card at any corpus size. All-integer → exact vs oracle.
    //
    // Round 14: the card reads through the staged JSONL intake
    // ([[intakeShards]]) and CARRIES THE INTAKE ACCOUNTING as two
    // sentinel rows — source '(intake)', lang '(rejects)' /
    // '(skipped_files)', n_docs = the quarantined-line / corrupt-shard
    // counts, metric columns null — because a data card that can't say
    // "0.3% of lines rejected, N shards skipped" under-reports the
    // corpus. Both counts are REAL computations over the quarantine
    // relations (readCorruptFiles / auditShards); the oracle pins the
    // fixture constants. The stream twin emits the same sentinel-row
    // convention per window from the rejects leg.
    "corpus_report" -> { (s, dir) =>
      val root = intakeShards(s, dir)
      val files = graft.sources.CorpusJsonl.listShards(s, root)
      // one decode for the clean card AND the rejects sentinel (round 17
      // optimization — the intake_report note): both legs project the
      // same raw permissive parse; the audit keeps its contractual
      // bytes-to-EOF pass. Round 18: Staged slot instead of an
      // unreleased localCheckpoint (see intake_e2e's note).
      val raw = graft.util.Staged.swap(s"corpus_report.raw:$dir",
        graft.sources.CorpusJsonl.readRawFiles(s, files))
      val d = graft.sources.CorpusJsonl.cleanOf(raw)
        .filter(col("text").isNotNull)
        .select(col("source"), col("lang"),
          size(toks(col("text"))).cast("long").as("n_toks"),
          col("n_chars"), md5(col("text")).as("hsh"))
      val card = d.groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          min(col("n_toks")).as("min_toks"),
          max(col("n_toks")).as("max_toks"),
          sum(col("n_chars")).as("sum_chars"),
          count_distinct(col("hsh")).as("n_unique"),
          (count(lit(1)) - count_distinct(col("hsh"))).as("n_exact_dups"))
      def sentinel(counted: DataFrame, tag: String): DataFrame =
        counted.agg(count(lit(1)).cast("long").as("n_docs"))
          .select(lit("(intake)").as("source"), lit(tag).as("lang"),
            col("n_docs"),
            lit(null).cast("long").as("n_tokens"),
            lit(null).cast("long").as("min_toks"),
            lit(null).cast("long").as("max_toks"),
            lit(null).cast("long").as("sum_chars"),
            lit(null).cast("long").as("n_unique"),
            lit(null).cast("long").as("n_exact_dups"))
      card
        .unionByName(sentinel(
          graft.sources.CorpusJsonl.corruptOf(raw),
          "(rejects)"))
        .unionByName(sentinel(
          graft.sources.CorpusJsonl.auditShards(s, files)
            .filter(!col("ok")),
          "(skipped_files)"))
        .orderBy("source", "lang")
    }
  )

  // PII patterns — shared between the Spark query and the DuckDB oracle;
  // restricted to the Java-regex ∩ RE2 common subset. PiiCorpusSpec pins
  // the edge-case behavior (adjacent matches, digits inside IPs, '+' in
  // email local parts) to values verified against DuckDB.
  private val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PiiIp = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  private val PiiNum = "[0-9]+"

  /** The text_pii_scrub projection over any text column — one shared
    * definition so the query and its corpus spec can never drift. */
  private[graft] def piiColumns(text: Column): Seq[Column] = Seq(
    regexp_replace(regexp_replace(regexp_replace(text,
      PiiEmail, "<email>"), PiiIp, "<ip>"), PiiNum, "<num>").as("scrubbed"),
    size(regexp_extract_all(text, lit(PiiEmail), lit(0))).cast("long")
      .as("n_email"),
    size(regexp_extract_all(text, lit(PiiIp), lit(0))).cast("long").as("n_ip"),
    size(regexp_extract_all(text, lit(PiiNum), lit(0))).cast("long")
      .as("n_num"))

  private val lexiconValues =
    Lexicon.map { case (l, m) => s"('$l', '$m')" }.mkString(", ")

  private val stopList = Stopwords.map(w => s"'$w'").mkString(", ")

  val oracle: Map[String, String] = Map(
    "text_langid" ->
      s"""WITH lex(cand_lang, marker) AS (VALUES $lexiconValues),
         |tokens AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok FROM documents),
         |hits AS (SELECT doc_id, cand_lang, count(*) AS cnt
         |  FROM tokens JOIN lex ON tok = marker GROUP BY 1, 2),
         |best AS (SELECT doc_id, cand_lang, cnt,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, cand_lang) AS rn
         |  FROM hits)
         |SELECT d.doc_id, d.lang AS declared_lang,
         |  coalesce(b.cand_lang, 'und') AS pred_lang,
         |  coalesce(b.cnt, 0) AS marker_hits
         |FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
         |  ON d.doc_id = b.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "text_quality" ->
      s"""WITH words AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok FROM documents),
         |stops AS (SELECT doc_id, count(*) AS n_words,
         |    CAST(sum(CASE WHEN tok IN ($stopList) THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
         |  FROM words GROUP BY 1)
         |SELECT d.doc_id, length(d.text) AS n_chars,
         |  length(regexp_replace(d.text, '[^.,;:!?]', '', 'g')) AS n_punct,
         |  s.n_words, s.n_stop,
         |  (length(d.text) - (s.n_words - 1)) * 1.0 / s.n_words AS avg_word_len,
         |  s.n_stop * 1.0 / s.n_words AS stop_ratio
         |FROM documents d JOIN stops s ON d.doc_id = s.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |  len(string_split_regex(text, '\s+')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      s"""WITH tokens AS (
         |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok,
         |    generate_subscripts(string_split_regex(text, '\\s+'), 1) AS ord
         |  FROM documents WHERE text IS NOT NULL),
         |uni AS (SELECT doc_id, tok, count(*) AS c FROM tokens GROUP BY 1, 2),
         |ustats AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    count(*) AS n_distinct, CAST(max(c) AS BIGINT) AS top_cnt
         |  FROM uni GROUP BY 1),
         |bigr AS (
         |  SELECT doc_id,
         |    tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS bg
         |  FROM tokens),
         |bstats AS (
         |  SELECT doc_id, count(*) AS n_bigrams,
         |    count(DISTINCT bg) AS n_distinct_bigrams
         |  FROM bigr WHERE bg IS NOT NULL GROUP BY 1)
         |SELECT u.doc_id, u.n_tokens, u.n_distinct, u.top_cnt,
         |  coalesce(b.n_bigrams, 0) AS n_bigrams,
         |  coalesce(b.n_distinct_bigrams, 0) AS n_distinct_bigrams,
         |  CAST(u.top_cnt AS DOUBLE) / CAST(u.n_tokens AS DOUBLE) AS top_frac,
         |  CASE WHEN coalesce(b.n_bigrams, 0) > 0
         |    THEN 1.0 - CAST(b.n_distinct_bigrams AS DOUBLE) / CAST(b.n_bigrams AS DOUBLE)
         |    ELSE 0.0 END AS dup_bigram_frac
         |FROM ustats u LEFT JOIN bstats b USING (doc_id)
         |ORDER BY u.doc_id""".stripMargin,

    "text_pii_scrub" ->
      s"""SELECT event_id, props,
         |  regexp_replace(regexp_replace(regexp_replace(props,
         |    '$PiiEmail', '<email>', 'g'),
         |    '$PiiIp', '<ip>', 'g'),
         |    '$PiiNum', '<num>', 'g') AS scrubbed,
         |  len(regexp_extract_all(props, '$PiiEmail')) AS n_email,
         |  len(regexp_extract_all(props, '$PiiIp')) AS n_ip,
         |  len(regexp_extract_all(props, '$PiiNum')) AS n_num
         |FROM events ORDER BY event_id""".stripMargin,

    "sample_stratified" ->
      s"""SELECT doc_id, lang, source, n_chars, rk FROM (
         |  SELECT doc_id, lang, source, n_chars,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
         |  FROM documents)
         |WHERE rk <= $SamplePerStratum ORDER BY doc_id""".stripMargin,

    "sample_fixed" ->
      s"""SELECT * FROM (
         |  SELECT doc_id, lang, source,
         |    md5(CAST(doc_id AS VARCHAR)) AS rank_key
         |  FROM documents
         |  ORDER BY rank_key, doc_id LIMIT $SampleFixedN)
         |ORDER BY doc_id""".stripMargin,

    "cap_per_source" ->
      s"""SELECT doc_id, source, src_n, rk,
         |  rk <= $CapPerSource AS kept FROM (
         |  SELECT doc_id, source,
         |    count(*) OVER (PARTITION BY source) AS src_n,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
         |  FROM documents) ORDER BY doc_id""".stripMargin,

    "sample_token_budget" ->
      s"""SELECT doc_id, lang, n_tokens, cum_before FROM (
         |  SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
         |    CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY lang
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cum_before
         |  FROM (SELECT doc_id, lang,
         |      len(string_split_regex(text, '\\s+')) AS n_tokens
         |    FROM documents WHERE text IS NOT NULL))
         |WHERE cum_before < $TokenBudgetPerLang ORDER BY doc_id""".stripMargin,

    // exact integer terms, one final division — see the Spark entry
    "corpus_gini" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents
        |    WHERE text IS NOT NULL GROUP BY 1),
        |r AS (SELECT n,
        |    CAST(row_number() OVER (ORDER BY n, source) AS BIGINT) AS i,
        |    CAST(count(*) OVER () AS BIGINT) AS k FROM c)
        |SELECT CAST(max(k) AS BIGINT) AS n_sources,
        |  CAST(sum(n) AS BIGINT) AS n_docs,
        |  CAST(sum(n * (2*i - k - 1)) AS DOUBLE)
        |    / CAST(max(k) * sum(n) AS DOUBLE) AS gini
        |FROM r""".stripMargin,

    // every operation exact IEEE (u = int/2³², one division, max) — no
    // quantization trick needed; see the Spark entry's scaladoc
    "sample_priority" ->
      s"""WITH d AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
         |    CAST(list_reduce(list_transform(range(1, 9),
         |        i -> instr('0123456789abcdef',
         |          substr(md5('ps' || CAST(doc_id AS VARCHAR)),
         |            CAST(i AS INT), 1)) - 1),
         |      (a, b) -> a*16 + b) + 1 AS DOUBLE) / 4294967296.0 AS u
         |  FROM documents WHERE text IS NOT NULL),
         |p AS (SELECT doc_id, w, w / u AS priority FROM d),
         |top AS (SELECT doc_id, w, priority,
         |    CAST(row_number() OVER (ORDER BY priority DESC, doc_id)
         |      AS BIGINT) AS rank
         |  FROM p ORDER BY priority DESC, doc_id
         |  LIMIT ${PrioritySampleK + 1}),
         |t AS (SELECT CASE WHEN count(*) = ${PrioritySampleK + 1}
         |    THEN min(priority) ELSE 0.0 END AS tau FROM top)
         |SELECT doc_id, w, rank, priority, greatest(w, tau) AS w_est
         |FROM top, t WHERE rank <= $PrioritySampleK
         |ORDER BY doc_id""".stripMargin,

    // the composition of the two sampling primitives, exact end-to-end
    "pipeline_mix_sample" ->
      s"""WITH d AS (SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS w,
         |    list_reduce(list_transform(range(1, 9),
         |      i -> instr('0123456789abcdef',
         |        substr(md5('mt' || CAST(doc_id AS VARCHAR)),
         |          CAST(i AS INT), 1)) - 1),
         |      (a, b) -> a*16 + b) AS u32,
         |    CAST(list_reduce(list_transform(range(1, 9),
         |        i -> instr('0123456789abcdef',
         |          substr(md5('ps' || CAST(doc_id AS VARCHAR)),
         |            CAST(i AS INT), 1)) - 1),
         |      (a, b) -> a*16 + b) + 1 AS DOUBLE) / 4294967296.0 AS u
         |  FROM documents WHERE text IS NOT NULL),
         |s AS (SELECT source, count(*) AS n_docs,
         |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 65536.0)
         |      AS BIGINT) AS qs
         |  FROM d GROUP BY 1),
         |sq AS (SELECT sum(qs) AS sum_qs FROM s),
         |r AS (SELECT source,
         |    CAST(floor(least(1.0,
         |      (($MixTempTarget * CAST(qs AS DOUBLE))
         |        / CAST(sum_qs AS DOUBLE))
         |      / CAST(n_docs AS DOUBLE)) * 4294967296.0) AS BIGINT) AS thr
         |  FROM s, sq),
         |kept AS (SELECT d.doc_id, d.source, d.w, d.u
         |  FROM d JOIN r USING (source) WHERE u32 < thr),
         |p AS (SELECT doc_id, source, w, w / u AS priority FROM kept),
         |top AS (SELECT doc_id, source, w, priority,
         |    CAST(row_number() OVER (ORDER BY priority DESC, doc_id)
         |      AS BIGINT) AS rank
         |  FROM p ORDER BY priority DESC, doc_id
         |  LIMIT ${PipelineMixSampleK + 1}),
         |t AS (SELECT CASE WHEN count(*) = ${PipelineMixSampleK + 1}
         |    THEN min(priority) ELSE 0.0 END AS tau FROM top)
         |SELECT doc_id, source, w, rank, greatest(w, tau) AS w_est
         |FROM top, t WHERE rank <= $PipelineMixSampleK
         |ORDER BY doc_id""".stripMargin,

    // the per-lang restatement of the priority algebra: rank window +
    // the (k+1)-th priority per stratum; under-full strata take τ = 0
    "sample_priority_by_lang" ->
      s"""WITH d AS (SELECT lang, doc_id, CAST(n_chars AS DOUBLE) AS w,
         |    CAST(list_reduce(list_transform(range(1, 9),
         |        i -> instr('0123456789abcdef',
         |          substr(md5('ps' || CAST(doc_id AS VARCHAR)),
         |            CAST(i AS INT), 1)) - 1),
         |      (a, b) -> a*16 + b) + 1 AS DOUBLE) / 4294967296.0 AS u
         |  FROM documents WHERE text IS NOT NULL),
         |p AS (SELECT lang, doc_id, w, w / u AS priority FROM d),
         |r AS (SELECT lang, doc_id, w, priority,
         |    CAST(row_number() OVER (PARTITION BY lang
         |      ORDER BY priority DESC, doc_id) AS BIGINT) AS rank
         |  FROM p),
         |t AS (SELECT lang,
         |    coalesce(max(CASE WHEN rank = ${PrioStratumK + 1}
         |      THEN priority END), 0.0) AS tau
         |  FROM r GROUP BY lang)
         |SELECT lang, doc_id, w, rank, priority,
         |  greatest(w, tau) AS w_est
         |FROM r JOIN t USING (lang)
         |WHERE rank <= $PrioStratumK
         |ORDER BY lang, doc_id""".stripMargin,

    // α = 0.5 keeps everything exact (sqrt is correctly rounded); Σ√n
    // is an order-free BIGINT sum of 2^16-fixed-point q's on both sides
    "mix_temperature" ->
      s"""WITH d AS (SELECT doc_id, source,
         |    list_reduce(list_transform(range(1, 9),
         |      i -> instr('0123456789abcdef',
         |        substr(md5('mt' || CAST(doc_id AS VARCHAR)),
         |          CAST(i AS INT), 1)) - 1),
         |      (a, b) -> a*16 + b) AS u32
         |  FROM documents WHERE text IS NOT NULL),
         |s AS (SELECT source, count(*) AS n_docs,
         |    sqrt(CAST(count(*) AS DOUBLE)) AS q,
         |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 65536.0)
         |      AS BIGINT) AS qs
         |  FROM d GROUP BY 1),
         |sq AS (SELECT sum(qs) AS sum_qs FROM s),
         |r AS (SELECT source, n_docs, q,
         |    least(1.0, (($MixTempTarget * CAST(qs AS DOUBLE))
         |        / CAST(sum_qs AS DOUBLE))
         |      / CAST(n_docs AS DOUBLE)) AS rate,
         |    CAST(floor(least(1.0, (($MixTempTarget * CAST(qs AS DOUBLE))
         |        / CAST(sum_qs AS DOUBLE))
         |      / CAST(n_docs AS DOUBLE)) * 4294967296.0) AS BIGINT) AS thr
         |  FROM s, sq)
         |SELECT source, n_docs, q, rate, thr,
         |  CAST(sum(CASE WHEN u32 < thr THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept
         |FROM d JOIN r USING (source)
         |GROUP BY source, n_docs, q, rate, thr
         |ORDER BY source""".stripMargin,

    "dsir_weights" ->
      s"""WITH $dsirWeightCtes
         |SELECT doc_id, lang, n_feats, weight_scaled
         |FROM wts ORDER BY doc_id""".stripMargin,

    "sample_importance" ->
      s"""WITH $dsirWeightCtes,
         |g AS (SELECT doc_id, lang, weight_scaled,
         |  list_reduce(list_transform(range(1, 9),
         |      i -> instr('0123456789abcdef',
         |        substr(md5(CAST(doc_id AS VARCHAR) || ':gumbel'),
         |          CAST(i AS INT), 1)) - 1),
         |    (x, y) -> x*16 + y) AS v32 FROM wts),
         |k AS (SELECT doc_id, lang, weight_scaled,
         |  CAST(floor(-ln(-ln((CAST(v32 AS DOUBLE) + 0.5) / 4294967296.0))
         |    * $NllScale) AS BIGINT) AS gumbel_scaled FROM g)
         |SELECT * FROM (
         |  SELECT doc_id, lang, weight_scaled, gumbel_scaled,
         |    weight_scaled + gumbel_scaled AS key_scaled
         |  FROM k ORDER BY key_scaled DESC, doc_id LIMIT $SampleImportanceN)
         |ORDER BY doc_id""".stripMargin,

    "train_bpe" -> trainBpeSql,

    "train_bpe_batched" -> trainBpeBatchedSql,

    "tokenize_bpe" -> tokenizeBpeSql,

    "tokenize_bpe_ids" ->
      s"""WITH $bpeCtes,
         |$tokenIdCtes
         |SELECT doc_id, CAST(len(tids) AS BIGINT) AS n_ids,
         |  CAST(list_sum(tids) AS BIGINT) AS sum_ids,
         |  md5(array_to_string(tids, ',')) AS ids_md5
         |FROM di ORDER BY doc_id""".stripMargin,

    "pack_token_sequences" ->
      s"""WITH $bpeCtes,
         |$tokenIdCtes,
         |$packTokenIdCtes
         |SELECT CAST(bucket AS BIGINT) AS bucket,
         |  CAST(seq_id AS BIGINT) AS seq_id, n_real, n_pad,
         |  md5(array_to_string(ids, ',')) AS ids_md5
         |FROM pq ORDER BY bucket, seq_id""".stripMargin,

    // tokenize replayed by the shared CTEs, then the FFD recursion
    // (pack_best_fit's, budget = TokenSeqLen) joined back to the token
    // arrays for the materialization — ids, order, and padding all pinned
    "pack_best_fit_tokens" ->
      s"""WITH RECURSIVE $bpeCtes,
         |$tokenIdCtes,
         |${ffdTokenPackSqlCtes("di")}
         |$FfdTokenPackSelectSql ORDER BY bucket, seq""".stripMargin,

    // the persisted cross-drop pack: tokenize replayed by the shared
    // CTEs, then phase-1 FFD + the phase-2 recursion SEEDED with phase
    // 1's final remainders — drop 2's docs land in drop 1's open bins
    // exactly as the state's continuation does
    "pipeline_drop_pack" ->
      s"""WITH RECURSIVE $bpeCtes,
         |$tokenIdCtes,
         |${twoDropPackSqlCtes("di")}
         |SELECT CAST(bucket AS BIGINT) AS bucket, seq, n_docs,
         |  CAST(len(real_ids) AS BIGINT) AS n_real,
         |  CAST($TokenSeqLen - len(real_ids) AS BIGINT) AS n_pad,
         |  md5(array_to_string(list_concat(real_ids,
         |    list_transform(range($TokenSeqLen - len(real_ids)),
         |      x -> $BpePadId)), ',')) AS ids_md5
         |FROM pksq ORDER BY bucket, seq""".stripMargin,

    // the COMPLETE recurring loop: the two-drop gated admission chain
    // (verdict1/verdict2/a1), the registry's corpus-wide n-gram +
    // semantic flag sets, tokenize, and the seeded two-phase FFD
    // restricted to each drop's curated ids
    "pipeline_drop_train" ->
      s"""WITH RECURSIVE ${Dedup.incrementalSqlCtes(Dedup.qualityEligibleSql)},
         |${Dedup.registryContamSqlCtes},
         |clean1 AS (SELECT doc_id FROM a1
         |  WHERE doc_id NOT IN (SELECT doc_id FROM rflag)
         |    AND doc_id NOT IN (SELECT doc_id FROM rsem)),
         |adm2 AS (SELECT doc_id FROM verdict2 WHERE admitted),
         |clean2 AS (SELECT doc_id FROM adm2
         |  WHERE doc_id NOT IN (SELECT doc_id FROM rflag)
         |    AND doc_id NOT IN (SELECT doc_id FROM rsem)),
         |$bpeCtes,
         |$tokenIdCtes,
         |${twoDropPackSqlCtes("di",
             "doc_id IN (SELECT doc_id FROM clean1)",
             "doc_id IN (SELECT doc_id FROM clean2)")}
         |SELECT CAST(bucket AS BIGINT) AS bucket, seq, n_docs,
         |  CAST(len(real_ids) AS BIGINT) AS n_real,
         |  CAST($TokenSeqLen - len(real_ids) AS BIGINT) AS n_pad,
         |  md5(array_to_string(list_concat(real_ids,
         |    list_transform(range($TokenSeqLen - len(real_ids)),
         |      x -> $BpePadId)), ',')) AS ids_md5
         |FROM pksq ORDER BY bucket, seq""".stripMargin,

    // the TREATED loop: the same admission/registry chain, then the
    // scrub rebuild (drop 2's curated docs vs a1's chunk hashes), the
    // tokenize chain re-run over the scrubbed source (drop 1 keeps its
    // original text — empty pre-drop state, token-identity), and the
    // seeded two-phase FFD over the scrubbed ids
    "pipeline_drop_train_scrubbed" ->
      s"""WITH RECURSIVE ${Dedup.incrementalSqlCtes(Dedup.qualityEligibleSql)},
         |${Dedup.registryContamSqlCtes},
         |clean1 AS (SELECT doc_id FROM a1
         |  WHERE doc_id NOT IN (SELECT doc_id FROM rflag)
         |    AND doc_id NOT IN (SELECT doc_id FROM rsem)),
         |adm2 AS (SELECT doc_id FROM verdict2 WHERE admitted),
         |clean2 AS (SELECT doc_id FROM adm2
         |  WHERE doc_id NOT IN (SELECT doc_id FROM rflag)
         |    AND doc_id NOT IN (SELECT doc_id FROM rsem)),
         |$scrubRebuildSqlCtes,
         |ssrc AS (SELECT d.doc_id, d.text FROM documents d
         |    JOIN clean1 USING (doc_id)
         |  UNION ALL SELECT doc_id, text FROM skept),
         |$bpeCtes,
         |${tokenIdCtesOver("SELECT doc_id, text FROM ssrc", "s")},
         |${twoDropPackSqlCtes("sdi",
             "doc_id IN (SELECT doc_id FROM clean1)",
             "doc_id IN (SELECT doc_id FROM clean2)")}
         |SELECT CAST(bucket AS BIGINT) AS bucket, seq, n_docs,
         |  CAST(len(real_ids) AS BIGINT) AS n_real,
         |  CAST($TokenSeqLen - len(real_ids) AS BIGINT) AS n_pad,
         |  md5(array_to_string(list_concat(real_ids,
         |    list_transform(range($TokenSeqLen - len(real_ids)),
         |      x -> $BpePadId)), ',')) AS ids_md5
         |FROM pksq ORDER BY bucket, seq""".stripMargin,

    // the recurring loop's per-drop ledger: counts over the SAME CTE
    // frames drop_train packs, plus the span grid vs each drop's
    // pre-drop admitted state and the packable-token sums from di
    "pipeline_drop_report" ->
      s"""WITH RECURSIVE ${Dedup.incrementalSqlCtes(Dedup.qualityEligibleSql)},
         |${Dedup.registryContamSqlCtes},
         |clean1 AS (SELECT doc_id FROM a1
         |  WHERE doc_id NOT IN (SELECT doc_id FROM rflag)
         |    AND doc_id NOT IN (SELECT doc_id FROM rsem)),
         |adm2 AS (SELECT doc_id FROM verdict2 WHERE admitted),
         |clean2 AS (SELECT doc_id FROM adm2
         |  WHERE doc_id NOT IN (SELECT doc_id FROM rflag)
         |    AND doc_id NOT IN (SELECT doc_id FROM rsem)),
         |ct AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks
         |  FROM documents WHERE text IS NOT NULL),
         |cc AS (SELECT doc_id, toks,
         |    unnest(range(0, len(toks) // ${Dedup.SpanTokens})) AS ci
         |  FROM ct WHERE len(toks) >= ${Dedup.SpanTokens}),
         |chk AS (SELECT doc_id,
         |    md5(array_to_string(list_slice(toks,
         |      ci * ${Dedup.SpanTokens} + 1,
         |      ci * ${Dedup.SpanTokens} + ${Dedup.SpanTokens}), ' '))
         |      AS chunk_hash
         |  FROM cc),
         |sch1 AS (SELECT DISTINCT chunk_hash FROM chk JOIN a1 USING (doc_id)),
         |spf2 AS (SELECT DISTINCT chk.doc_id FROM chk
         |  JOIN elig USING (doc_id)
         |  WHERE chk.doc_id % 2 = 1
         |    AND chunk_hash IN (SELECT chunk_hash FROM sch1)),
         |$scrubRebuildSqlCtes,
         |$bpeCtes,
         |$tokenIdCtes,
         |${tokenIdCtesOver("SELECT doc_id, text FROM skept", "s")},
         |pt AS MATERIALIZED (SELECT doc_id,
         |    LEAST(CAST(len(tids) AS BIGINT) + 1, $TokenSeqLen) AS ne
         |  FROM di),
         |spt AS MATERIALIZED (SELECT doc_id,
         |    LEAST(CAST(len(tids) AS BIGINT) + 1, $TokenSeqLen) AS ne
         |  FROM sdi)
         |SELECT CAST(1 AS BIGINT) AS drop_no,
         |  (SELECT count(*) FROM elig WHERE doc_id % 2 = 0) AS n_eligible,
         |  (SELECT count(*) FROM a1) AS n_admitted,
         |  (SELECT count(*) FROM a1 WHERE doc_id IN
         |    (SELECT doc_id FROM rflag)) AS n_registry_flagged,
         |  (SELECT count(*) FROM a1 WHERE doc_id IN
         |    (SELECT doc_id FROM rsem)) AS n_sem_flagged,
         |  (SELECT count(*) FROM clean1) AS n_curated,
         |  CAST(0 AS BIGINT) AS n_span_dup_state,
         |  (SELECT CAST(coalesce(sum(ne), 0) AS BIGINT) FROM pt
         |    WHERE doc_id IN (SELECT doc_id FROM clean1)) AS n_pack_tokens,
         |  (SELECT CAST(coalesce(sum(ne), 0) AS BIGINT) FROM pt
         |    WHERE doc_id IN (SELECT doc_id FROM clean1)) AS n_scrub_tokens
         |UNION ALL
         |SELECT CAST(2 AS BIGINT),
         |  (SELECT count(*) FROM elig WHERE doc_id % 2 = 1),
         |  (SELECT count(*) FROM adm2),
         |  (SELECT count(*) FROM adm2 WHERE doc_id IN
         |    (SELECT doc_id FROM rflag)),
         |  (SELECT count(*) FROM adm2 WHERE doc_id IN
         |    (SELECT doc_id FROM rsem)),
         |  (SELECT count(*) FROM clean2),
         |  (SELECT count(*) FROM spf2),
         |  (SELECT CAST(coalesce(sum(ne), 0) AS BIGINT) FROM pt
         |    WHERE doc_id IN (SELECT doc_id FROM clean2)),
         |  (SELECT CAST(coalesce(sum(ne), 0) AS BIGINT) FROM spt)
         |ORDER BY drop_no""".stripMargin,

    // the COMPLETE intake composition, boundary to training rows: the
    // survivor chain (cluster keepers → quality → bench split → n-gram →
    // semantic) prepended to the tokenize + FFD replay, di restricted to
    // survivors. The JSONL boundary contributes no CTE — jsonl_roundtrip
    // pins it as the identity on clean rows.
    "pipeline_intake_e2e" ->
      s"""WITH RECURSIVE ${Dedup.pretrainSurvivorSqlCtes},
         |$bpeCtes,
         |$tokenIdCtes,
         |${ffdTokenPackSqlCtes(
             "(SELECT * FROM di WHERE doc_id IN " +
               "(SELECT doc_id FROM survivors))")}
         |$FfdTokenPackSelectSql ORDER BY bucket, seq""".stripMargin,

    // the accounting row: fixture constants for the boundary legs
    // (rejects, skipped shards), every curation count re-derived from
    // the survivor CTE chain, pack totals from the FFD replay
    "pipeline_intake_report" ->
      s"""WITH RECURSIVE ${Dedup.pretrainSurvivorSqlCtes},
         |$bpeCtes,
         |$tokenIdCtes,
         |${ffdTokenPackSqlCtes(
             "(SELECT * FROM di WHERE doc_id IN " +
               "(SELECT doc_id FROM survivors))")},
         |kq AS (SELECT d.doc_id, d.n_chars,
         |    len(string_split_regex(d.text, '\\s+')) AS n_words
         |  FROM documents d JOIN cl USING (doc_id)
         |  WHERE d.doc_id = cl.cluster_id),
         |qy AS (SELECT doc_id FROM kq
         |  WHERE n_chars >= 100 AND n_words >= 20),
         |nb AS (SELECT doc_id FROM qy
         |  WHERE doc_id % ${Dedup.BenchmarkMod} <> 0),
         |ng AS (SELECT doc_id FROM nb
         |  WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
         |pk AS (SELECT CAST(count(*) AS BIGINT) AS n_train_seqs,
         |    CAST(coalesce(sum(len(real_ids)), 0) AS BIGINT)
         |      AS n_real_tokens,
         |    CAST(coalesce(sum($TokenSeqLen - len(real_ids)), 0) AS BIGINT)
         |      AS n_pad_tokens
         |  FROM sq)
         |SELECT
         |  CAST(${IntakeCleanShards + 2} AS BIGINT) AS n_shards_in,
         |  CAST($IntakeSkippedFiles AS BIGINT) AS n_shards_skipped,
         |  (SELECT count(*) FROM documents) + $IntakeBadLines AS n_lines_in,
         |  CAST($IntakeBadLines AS BIGINT) AS n_rejected_lines,
         |  (SELECT count(*) FROM documents) AS n_docs,
         |  (SELECT count(*) FROM documents) -
         |    (SELECT count(*) FROM kq) AS n_dup_dropped,
         |  (SELECT count(*) FROM kq) -
         |    (SELECT count(*) FROM qy) AS n_quality_dropped,
         |  (SELECT count(*) FROM qy) -
         |    (SELECT count(*) FROM nb) AS n_bench_held,
         |  (SELECT count(*) FROM nb) -
         |    (SELECT count(*) FROM ng) AS n_contam_ngram,
         |  (SELECT count(*) FROM ng) -
         |    (SELECT count(*) FROM survivors) AS n_contam_semantic,
         |  (SELECT count(*) FROM survivors) AS n_survivors,
         |  pk.n_train_seqs, pk.n_real_tokens, pk.n_pad_tokens
         |FROM pk""".stripMargin,

    "train_bpe_bytes" -> trainBpeBytesSql,

    "tokenize_bpe_ids_bytes" ->
      s"""WITH $bpeByteCtes,
         |$tokenIdByteCtes
         |SELECT doc_id, CAST(len(tids) AS BIGINT) AS n_ids,
         |  CAST(list_sum(tids) AS BIGINT) AS sum_ids,
         |  md5(array_to_string(tids, ',')) AS ids_md5
         |FROM di ORDER BY doc_id""".stripMargin,

    "pack_token_bytes" ->
      s"""WITH $bpeByteCtes,
         |$tokenIdByteCtes,
         |${packTokenIdCtesWith(BpeByteEosId, BpeBytePadId)}
         |SELECT CAST(bucket AS BIGINT) AS bucket,
         |  CAST(seq_id AS BIGINT) AS seq_id, n_real, n_pad,
         |  md5(array_to_string(ids, ',')) AS ids_md5
         |FROM pq ORDER BY bucket, seq_id""".stripMargin,

    "train_bpe_pretok" -> trainSqlOver(bpePretokCtes),

    "tokenize_bpe_ids_pretok" ->
      s"""WITH $bpePretokCtes,
         |$tokenIdPretokCtes
         |SELECT doc_id, CAST(len(tids) AS BIGINT) AS n_ids,
         |  CAST(list_sum(tids) AS BIGINT) AS sum_ids,
         |  md5(array_to_string(tids, ',')) AS ids_md5
         |FROM di ORDER BY doc_id""".stripMargin,

    "tokenize_roundtrip_pretok" ->
      s"""SELECT doc_id,
         |  CAST(length(rt) AS BIGINT) AS n_chars, md5(rt) AS rt_md5
         |FROM (SELECT doc_id, array_to_string(
         |    regexp_extract_all(text, '$PreTokSql'), '') AS rt
         |  FROM documents WHERE text IS NOT NULL)
         |WHERE rt <> '' ORDER BY doc_id""".stripMargin,

    "train_bpe_gpt2" -> trainSqlOver(bpeGpt2Ctes),

    "tokenize_bpe_ids_gpt2" ->
      s"""WITH $bpeGpt2Ctes,
         |$tokenIdGpt2Ctes
         |SELECT doc_id, CAST(len(tids) AS BIGINT) AS n_ids,
         |  CAST(list_sum(tids) AS BIGINT) AS sum_ids,
         |  md5(array_to_string(tids, ',')) AS ids_md5
         |FROM di ORDER BY doc_id""".stripMargin,

    // the gpt2 alternation tiles the document, so losslessness is
    // md5 of the (derived) text ITSELF — whitespace included, no
    // normalization, no BPE model
    "tokenize_roundtrip_gpt2" ->
      s"""SELECT doc_id,
         |  CAST(length(rt) AS BIGINT) AS n_chars, md5(rt) AS rt_md5
         |FROM (SELECT doc_id, $Gpt2TextSql AS rt
         |  FROM documents WHERE text IS NOT NULL)
         |WHERE rt <> '' ORDER BY doc_id""".stripMargin,

    // identity over the parquet table: the JSONL boundary must lose and
    // alter nothing
    "jsonl_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the fixture's merges + vocab inlined as VALUES; ids from the
    // released vocabulary for every symbol, bases included
    "tokenize_bpe_ids_imported" ->
      s"""WITH $importedOracleCtes
         |SELECT doc_id, CAST(len(tids) AS BIGINT) AS n_ids,
         |  CAST(list_sum(tids) AS BIGINT) AS sum_ids,
         |  md5(array_to_string(tids, ',')) AS ids_md5
         |FROM di ORDER BY doc_id""".stripMargin,

    // same losslessness statement as the gpt2 tier: the round trip under
    // the released id space is the derived document itself
    "tokenize_roundtrip_imported" ->
      s"""SELECT doc_id,
         |  CAST(length(rt) AS BIGINT) AS n_chars, md5(rt) AS rt_md5
         |FROM (SELECT doc_id, $Gpt2TextSql AS rt
         |  FROM documents WHERE text IS NOT NULL)
         |WHERE rt <> '' ORDER BY doc_id""".stripMargin,

    // the oracle needs NO BPE model: losslessness means the round trip
    // equals plain whitespace normalization of the document
    "tokenize_roundtrip_bytes" ->
      s"""SELECT doc_id,
         |  CAST(length(rt) AS BIGINT) AS n_chars, md5(rt) AS rt_md5
         |FROM (SELECT doc_id, array_to_string(
         |    list_filter(string_split_regex(text, '\\s+'), w -> w <> ''),
         |    ' ') AS rt
         |  FROM documents WHERE text IS NOT NULL)
         |WHERE rt <> '' ORDER BY doc_id""".stripMargin,

    "pipeline_tokenize_bytes" ->
      s"""WITH $bpeByteCtes,
         |$tokenIdByteCtes,
         |${packTokenIdCtesWith(BpeByteEosId, BpeBytePadId)},
         |ph AS (SELECT bucket, seq_id, n_real, n_pad,
         |    md5(array_to_string(ids, ',')) AS h FROM pq)
         |SELECT CAST(bucket AS BIGINT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_seqs,
         |  CAST(sum(n_real) AS BIGINT) AS n_real_tokens,
         |  CAST(sum(n_pad) AS BIGINT) AS n_pad_tokens,
         |  md5(string_agg(h, ',' ORDER BY seq_id)) AS bucket_md5
         |FROM ph GROUP BY bucket ORDER BY bucket""".stripMargin,

    "pipeline_tokenize_corpus" ->
      s"""WITH $bpeCtes,
         |$tokenIdCtes,
         |$packTokenIdCtes,
         |ph AS (SELECT bucket, seq_id, n_real, n_pad,
         |    md5(array_to_string(ids, ',')) AS h FROM pq)
         |SELECT CAST(bucket AS BIGINT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_seqs,
         |  CAST(sum(n_real) AS BIGINT) AS n_real_tokens,
         |  CAST(sum(n_pad) AS BIGINT) AS n_pad_tokens,
         |  md5(string_agg(h, ',' ORDER BY seq_id)) AS bucket_md5
         |FROM ph GROUP BY bucket ORDER BY bucket""".stripMargin,

    "split_corpus" ->
      s"""WITH b AS (SELECT doc_id, lang,
         |  $SplitBucketSql AS bucket
         |  FROM documents)
         |SELECT doc_id, lang, CAST(bucket AS BIGINT) AS bucket,
         |  ${splitCaseSql("bucket")} AS split
         |FROM b ORDER BY doc_id""".stripMargin,

    "shuffle_corpus" ->
      s"""WITH h AS (SELECT doc_id,
         |  md5('shuf:' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
         |sh AS (SELECT doc_id, h,
         |  list_reduce(list_transform(range(1, 5),
         |    i -> instr('0123456789abcdef', substr(h, i, 1)) - 1),
         |    (a, b) -> a * 16 + b) % $ShuffleShards AS shard
         |  FROM h)
         |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
         |    AS BIGINT) AS pos_in_shard
         |FROM sh ORDER BY doc_id""".stripMargin,

    "search_tfidf" -> SearchTfidfSql,
    // the persisted index computes the identical arithmetic from its
    // precomputed postings — same oracle, full hash gate
    "search_index_persisted" -> SearchTfidfSql,

    "search_bm25" -> SearchBm25Sql,

    "search_phrase" -> SearchPhraseSql,

    "text_vocab" ->
      s"""WITH tokens AS (SELECT doc_id,
         |    unnest(string_split_regex(text, '\\s+')) AS tok
         |  FROM documents WHERE text IS NOT NULL)
         |SELECT tok AS token, count(*) AS n_occurrences,
         |  count(DISTINCT doc_id) AS n_docs
         |FROM tokens GROUP BY 1
         |ORDER BY n_occurrences DESC, token LIMIT $VocabTopK""".stripMargin,

    "text_heavy_hitters_by_lang" ->
      s"""WITH tokens AS (SELECT lang,
         |    unnest(string_split_regex(text, '\\s+')) AS token
         |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
         |tot AS (SELECT lang, count(*) AS total FROM tokens GROUP BY lang)
         |SELECT t.lang AS lang, token, count(*) AS cnt
         |FROM tokens t JOIN tot ON t.lang = tot.lang
         |GROUP BY t.lang, token, total HAVING count(*) * $HhDivisor > total
         |ORDER BY t.lang, cnt DESC, token""".stripMargin,

    // Position-by-position statement of overlap-counting substring
    // occurrences — exactly the AC automaton's semantics, independently.
    // (range() can't take correlated bounds in DuckDB, so the position
    // axis is a constant 8192 — generous over the corpus's ≤553-char
    // docs — filtered per (doc, kw) by the real length bound.)
    "text_keyword_scan" -> {
      val values = ScanKeywords.map(k => s"('$k')").mkString(", ")
      s"""WITH kws(kw) AS (VALUES $values),
         |pos AS (SELECT range::INT AS p FROM range(1, 8193)),
         |occ AS (
         |  SELECT d.doc_id, k.kw,
         |    count(CASE WHEN substr(d.text, pos.p, length(k.kw)) = k.kw
         |               THEN 1 END) AS n
         |  FROM documents d, kws k, pos
         |  WHERE d.text IS NOT NULL
         |    AND pos.p <= length(d.text) - length(k.kw) + 1
         |  GROUP BY d.doc_id, k.kw)
         |SELECT kw, CAST(sum(n) AS BIGINT) AS total_occurrences,
         |  count(CASE WHEN n > 0 THEN 1 END) AS n_docs
         |FROM occ GROUP BY kw ORDER BY kw""".stripMargin
    },

    // The naive full-vocabulary statement of the same semantics: the MG
    // candidate superset + exact recount must reproduce it exactly.
    "text_heavy_hitters" ->
      s"""WITH tokens AS (SELECT unnest(string_split_regex(text, '\\s+')) AS token
         |  FROM documents WHERE text IS NOT NULL),
         |tot AS (SELECT count(*) AS total FROM tokens)
         |SELECT token, count(*) AS cnt FROM tokens, tot
         |GROUP BY token, total HAVING count(*) * $HhDivisor > total
         |ORDER BY cnt DESC, token""".stripMargin,

    "text_vocab_sketch" ->
      s"""WITH tokens AS (SELECT unnest(string_split_regex(text, '\\s+')) AS tok
         |  FROM documents WHERE text IS NOT NULL),
         |freq AS (SELECT tok AS token, count(*) AS tf FROM tokens GROUP BY 1),
         |pos AS (SELECT token, tf,
         |  list_transform(range(0, $CmDepth), i ->
         |    list_reduce(list_transform(range(1 + 4*i, 5 + 4*i),
         |      j -> instr('0123456789abcdef',
         |        substr(md5(token), CAST(j AS INT), 1)) - 1),
         |      (a, b) -> a*16 + b) % $CmWidth) AS bs
         |  FROM freq),
         |rb AS (
         |  SELECT p.token, p.tf, r.i AS row, p.bs[CAST(r.i AS INT) + 1] AS bucket
         |  FROM pos p, (SELECT unnest(range(0, $CmDepth)) AS i) r),
         |sketch AS (SELECT row, bucket, CAST(sum(tf) AS BIGINT) AS cnt
         |  FROM rb GROUP BY 1, 2),
         |est AS (SELECT r.token, r.tf, min(s.cnt) AS cm_est
         |  FROM rb r JOIN sketch s USING (row, bucket) GROUP BY 1, 2)
         |SELECT token, tf, cm_est, cm_est = tf AS is_exact
         |FROM est ORDER BY tf DESC, token LIMIT $VocabTopK""".stripMargin,

    "text_rarity" ->
      s"""WITH tokens AS (SELECT doc_id,
         |    unnest(string_split_regex(text, '\\s+')) AS tok
         |  FROM documents WHERE text IS NOT NULL),
         |dt AS (SELECT doc_id, tok, count(*) AS c FROM tokens GROUP BY 1, 2),
         |freq AS (SELECT tok, CAST(sum(c) AS BIGINT) AS tf FROM dt GROUP BY 1)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN tf <= $RareTf THEN c ELSE 0 END) AS BIGINT)
         |    AS n_rare,
         |  CAST(sum(CASE WHEN tf >= $CommonTf THEN c ELSE 0 END) AS BIGINT)
         |    AS n_common,
         |  CAST(sum(CASE WHEN tf <= $RareTf THEN c ELSE 0 END) AS BIGINT)
         |    * 1.0 / CAST(sum(c) AS BIGINT) AS rare_frac
         |FROM dt JOIN freq USING (tok)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "pack_sequences" ->
      s"""WITH d AS (
         |  SELECT doc_id, doc_id % $PackBuckets AS bucket,
         |    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
         |  FROM documents WHERE text IS NOT NULL),
         |${packTailSql("d")}""".stripMargin,

    // replays the deterministic FFD exactly: same (n_eff DESC, doc_id)
    // order, first bin that fits in creation order, via a recursive CTE
    // stepping one doc per bucket per round with the bin-remainder list
    // carried as state
    "pack_best_fit" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, doc_id % $PackBuckets AS bucket,
         |    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)
         |      AS n_tokens
         |  FROM documents WHERE text IS NOT NULL),
         |e AS (SELECT doc_id, bucket, n_tokens,
         |    LEAST(n_tokens + 1, $PackBudget) AS n_eff,
         |    CAST(row_number() OVER (PARTITION BY bucket
         |      ORDER BY LEAST(n_tokens + 1, $PackBudget) DESC, doc_id)
         |      AS BIGINT) AS step
         |  FROM d),
         |ffd AS (
         |  SELECT bucket, step, doc_id, n_tokens, n_eff,
         |    CAST(1 AS BIGINT) AS seq,
         |    [$PackBudget - n_eff] AS rem
         |  FROM e WHERE step = 1
         |  UNION ALL
         |  SELECT e.bucket, e.step, e.doc_id, e.n_tokens, e.n_eff,
         |    CASE WHEN coalesce(list_position(
         |          list_transform(f.rem, r -> r >= e.n_eff), true), 0) > 0
         |      THEN CAST(coalesce(list_position(
         |          list_transform(f.rem, r -> r >= e.n_eff), true), 0)
         |        AS BIGINT)
         |      ELSE CAST(len(f.rem) + 1 AS BIGINT) END AS seq,
         |    CASE WHEN coalesce(list_position(
         |          list_transform(f.rem, r -> r >= e.n_eff), true), 0) > 0
         |      THEN list_transform(range(1, len(f.rem) + 1),
         |        i -> CASE WHEN i = coalesce(list_position(
         |              list_transform(f.rem, r -> r >= e.n_eff), true), 0)
         |          THEN f.rem[i] - e.n_eff ELSE f.rem[i] END)
         |      ELSE list_append(f.rem, $PackBudget - e.n_eff) END AS rem
         |  FROM ffd f JOIN e ON e.bucket = f.bucket AND e.step = f.step + 1
         |),
         |u AS (SELECT bucket, seq, sum(n_eff) AS used
         |  FROM ffd GROUP BY 1, 2)
         |SELECT f.doc_id, f.bucket, f.seq, f.n_tokens, f.n_eff,
         |  CAST(u.used AS BIGINT) AS seq_used,
         |  CAST($PackBudget - u.used AS DOUBLE) / ${PackBudget}.0
         |    AS pad_frac
         |FROM ffd f JOIN u USING (bucket, seq)
         |ORDER BY f.doc_id""".stripMargin,

    // chunk grid mirrors the Spark constants: W tokens per chunk, starts S
    // apart, tail chunk shorter; single-chunk docs for n <= W
    "chunk_documents" ->
      s"""WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS w
         |  FROM documents WHERE text IS NOT NULL),
         |n AS (SELECT doc_id, w, len(w) AS n FROM t),
         |c AS (SELECT doc_id, w, n,
         |  CASE WHEN n <= $ChunkTokens THEN 1
         |       ELSE (n - $ChunkTokens + ${ChunkStride - 1}) // $ChunkStride + 1
         |  END AS n_chunks FROM n),
         |e AS (SELECT doc_id, w, n, unnest(range(0, n_chunks)) AS k FROM c)
         |SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
         |  CAST(k * $ChunkStride AS BIGINT) AS start_tok,
         |  CAST(LEAST(n - k * $ChunkStride, $ChunkTokens) AS BIGINT)
         |    AS chunk_tokens,
         |  array_to_string(list_slice(w, k * $ChunkStride + 1,
         |    k * $ChunkStride + $ChunkTokens), ' ') AS chunk_text
         |FROM e ORDER BY doc_id, chunk_idx""".stripMargin,

    "text_perplexity" ->
      s"""WITH tokens AS (SELECT doc_id,
         |    unnest(string_split_regex(text, '\\s+')) AS tok
         |  FROM documents WHERE text IS NOT NULL),
         |dt AS (SELECT doc_id, tok, count(*) AS c FROM tokens GROUP BY 1, 2),
         |freq AS (SELECT tok, CAST(sum(c) AS BIGINT) AS tf FROM dt GROUP BY 1),
         |model AS (
         |  SELECT tok, CAST(floor(-ln(CAST(tf AS DOUBLE)
         |    / CAST((SELECT sum(tf) FROM freq) AS DOUBLE)) * $NllScale)
         |    AS BIGINT) AS nll_tok
         |  FROM freq)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |  CAST(sum(c * nll_tok) AS BIGINT) AS nll_scaled,
         |  CAST(sum(c * nll_tok) AS BIGINT) * 1.0 / $NllScale
         |    / CAST(sum(c) AS BIGINT) AS avg_nll
         |FROM dt JOIN model USING (tok)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "text_perplexity_bigram" ->
      s"""WITH ta AS (SELECT doc_id, string_split_regex(text, '\\s+') AS a
         |  FROM documents WHERE text IS NOT NULL),
         |bgx AS (SELECT doc_id, unnest(list_transform(range(1, len(a)),
         |    i -> a[CAST(i AS INT)] || ' ' || a[CAST(i AS INT) + 1])) AS bg
         |  FROM ta WHERE len(a) >= 2),
         |dbg AS (SELECT doc_id, bg, count(*) AS c FROM bgx GROUP BY 1, 2),
         |cnt AS (SELECT bg, CAST(sum(c) AS BIGINT) AS cbg,
         |    string_split(bg, ' ')[1] AS w1 FROM dbg GROUP BY 1),
         |w1tot AS (SELECT w1, CAST(sum(cbg) AS BIGINT) AS cw1
         |  FROM cnt GROUP BY 1),
         |vv AS (SELECT count(DISTINCT tok) AS v FROM (
         |  SELECT unnest(string_split_regex(text, '\\s+')) AS tok
         |  FROM documents WHERE text IS NOT NULL)),
         |model AS (SELECT bg,
         |    CAST(floor(-ln((cbg + 1) * 1.0 / (cw1 + vv.v)) * $NllScale)
         |      AS BIGINT) AS nll_bg
         |  FROM cnt JOIN w1tot USING (w1), vv)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
         |  CAST(sum(c * nll_bg) AS BIGINT) AS nll_scaled,
         |  CAST(sum(c * nll_bg) AS BIGINT) * 1.0 / $NllScale
         |    / CAST(sum(c) AS BIGINT) AS avg_nll
         |FROM dbg JOIN model USING (bg)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "text_collocations" ->
      s"""WITH tk AS (SELECT unnest(string_split_regex(text, '\\s+')) AS t
         |  FROM documents WHERE text IS NOT NULL),
         |uni AS (SELECT t, count(*) AS c FROM tk GROUP BY 1),
         |tot AS (SELECT count(*) AS n_tok FROM tk),
         |ta AS (SELECT string_split_regex(text, '\\s+') AS a
         |  FROM documents WHERE text IS NOT NULL),
         |bgx AS (SELECT unnest(list_transform(range(1, len(a)),
         |    i -> a[CAST(i AS INT)] || ' ' || a[CAST(i AS INT) + 1])) AS bg
         |  FROM ta WHERE len(a) >= 2),
         |bgc AS (SELECT bg, count(*) AS c_ab FROM bgx GROUP BY 1
         |  HAVING count(*) >= $MinColloc),
         |nbg AS (SELECT CAST(sum(len(a) - 1) AS BIGINT) AS n_bg
         |  FROM ta WHERE len(a) >= 2),
         |j AS (SELECT bg, c_ab,
         |    string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[-1] AS w2
         |  FROM bgc)
         |SELECT j.bg AS bigram, j.c_ab, ua.c AS c_a, ub.c AS c_b,
         |  CAST(floor(ln(
         |    CAST(j.c_ab AS DOUBLE) * tot.n_tok / ua.c
         |      * (CAST(tot.n_tok AS DOUBLE) / ub.c)
         |      / nbg.n_bg) * 1000000) AS BIGINT) AS pmi_q6
         |FROM j JOIN uni ua ON ua.t = j.w1
         |  JOIN uni ub ON ub.t = j.w2, tot, nbg
         |ORDER BY pmi_q6 DESC, bigram LIMIT 50""".stripMargin,

    "classify_quality_nb" ->
      s"""WITH tokens AS (SELECT doc_id,
         |    unnest(string_split_regex(text, '\\s+')) AS token
         |  FROM documents WHERE text IS NOT NULL),
         |dt AS (SELECT doc_id, token, count(*) AS c FROM tokens GROUP BY 1, 2),
         |lab AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CASE WHEN sum(CASE WHEN token IN ($stopList) THEN c ELSE 0 END)
         |        * 100 >= sum(c) * $NbStopPct THEN 1 ELSE 0 END AS label
         |  FROM dt GROUP BY 1),
         |cls AS (SELECT token,
         |    CAST(sum(CASE WHEN label = 1 THEN c ELSE 0 END) AS BIGINT) AS c1,
         |    CAST(sum(CASE WHEN label = 0 THEN c ELSE 0 END) AS BIGINT) AS c0
         |  FROM dt JOIN lab USING (doc_id) GROUP BY 1),
         |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
         |    CAST(sum(c0) AS BIGINT) AS n0, CAST(count(*) AS BIGINT) AS v
         |  FROM cls),
         |wts AS (SELECT token, CAST(floor(
         |      (ln(CAST(c1 + 1 AS DOUBLE) / CAST(n1 + v AS DOUBLE))
         |     - ln(CAST(c0 + 1 AS DOUBLE) / CAST(n0 + v AS DOUBLE)))
         |      * $NbScale) AS BIGINT) AS w
         |  FROM cls, tot),
         |pri AS (SELECT CAST(floor(
         |      (ln(CAST(sum(label) + 1 AS DOUBLE))
         |     - ln(CAST(sum(1 - label) + 1 AS DOUBLE))) * $NbScale)
         |    AS BIGINT) AS prior
         |  FROM lab),
         |sc AS (SELECT doc_id, CAST(sum(c * w) AS BIGINT) AS w_sum
         |  FROM dt JOIN wts USING (token) GROUP BY 1)
         |SELECT l.doc_id, l.label, l.n_tokens,
         |  sc.w_sum + pri.prior AS score_scaled,
         |  CASE WHEN sc.w_sum + pri.prior > 0 THEN 1 ELSE 0 END AS pred
         |FROM sc JOIN lab l USING (doc_id), pri
         |ORDER BY doc_id""".stripMargin,

    "pipeline_gopher_filter" ->
      s"""WITH tokens AS (
         |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok,
         |    generate_subscripts(string_split_regex(text, '\\s+'), 1) AS ord
         |  FROM documents WHERE text IS NOT NULL),
         |stats AS (
         |  SELECT doc_id, count(*) AS n_words,
         |    CAST(sum(length(tok)) AS BIGINT) AS n_token_chars,
         |    CAST(sum(CASE WHEN tok IN ($stopList) THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_stop
         |  FROM tokens GROUP BY 1),
         |uni AS (SELECT doc_id, tok, count(*) AS c FROM tokens GROUP BY 1, 2),
         |ustats AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(max(c) AS BIGINT) AS top_cnt
         |  FROM uni GROUP BY 1),
         |bigr AS (
         |  SELECT doc_id,
         |    tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY ord)
         |      AS bg
         |  FROM tokens),
         |bstats AS (
         |  SELECT doc_id, count(*) AS n_bigrams,
         |    count(DISTINCT bg) AS n_distinct_bigrams
         |  FROM bigr WHERE bg IS NOT NULL GROUP BY 1),
         |sig AS (
         |  SELECT d.doc_id, s.n_words,
         |    s.n_token_chars * 1.0 / s.n_words AS avg_word_len,
         |    s.n_stop * 1.0 / s.n_words AS stop_ratio,
         |    CAST(u.top_cnt AS DOUBLE) / CAST(u.n_tokens AS DOUBLE)
         |      AS top_frac,
         |    CASE WHEN coalesce(b.n_bigrams, 0) > 0
         |      THEN 1.0 - CAST(b.n_distinct_bigrams AS DOUBLE)
         |        / CAST(b.n_bigrams AS DOUBLE)
         |      ELSE 0.0 END AS dup_bigram_frac
         |  FROM documents d
         |  JOIN stats s USING (doc_id) JOIN ustats u USING (doc_id)
         |  LEFT JOIN bstats b USING (doc_id)
         |  WHERE d.text IS NOT NULL)
         |SELECT doc_id, n_words, avg_word_len, stop_ratio, top_frac,
         |  dup_bigram_frac,
         |  (n_words >= 20 AND avg_word_len >= 3.0 AND avg_word_len <= 10.0
         |    AND stop_ratio >= 0.05 AND top_frac <= 0.2
         |    AND dup_bigram_frac <= 0.3) AS keep
         |FROM sig ORDER BY doc_id""".stripMargin,

    "mix_corpus" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    1 + CAST(substr(source, 4) AS INT) % 4 AS w2,
        |    list_reduce(list_transform(range(1, 5),
        |      i -> instr('0123456789abcdef',
        |        substr(md5(CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1),
        |      (a, b) -> a*16 + b) AS hex16
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, w2,
        |    CAST(w2 // 2 + CASE WHEN w2 % 2 = 1 AND hex16 < 32768
        |      THEN 1 ELSE 0 END AS BIGINT) AS n_copies
        |  FROM d)
        |SELECT doc_id, source, w2 / 2.0 AS weight, n_copies,
        |  CAST(unnest(range(0, n_copies)) AS BIGINT) AS copy_idx
        |FROM c WHERE n_copies > 0 ORDER BY doc_id, copy_idx""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint,
        |  substr(md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))), 1, 4) AS bucket
        |FROM documents ORDER BY doc_id""".stripMargin,

    "pipeline_clean_corpus" ->
      s"""WITH words AS (
         |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
         |  FROM documents),
         |stats AS (
         |  SELECT doc_id, count(*) AS n_words,
         |    sum(CASE WHEN tok IN ($stopList) THEN 1 ELSE 0 END) AS n_stop
         |  FROM words GROUP BY 1),
         |quality AS (SELECT * FROM stats WHERE n_words >= 20 AND n_stop > 0),
         |keep AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text,
         |      min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
         |    FROM documents) t WHERE doc_id = keeper),
         |lex(cand_lang, marker) AS (VALUES $lexiconValues),
         |hits AS (
         |  SELECT doc_id, cand_lang, count(*) AS cnt
         |  FROM words JOIN lex ON tok = marker GROUP BY 1, 2),
         |best AS (
         |  SELECT doc_id, cand_lang FROM (
         |    SELECT doc_id, cand_lang,
         |      row_number() OVER (PARTITION BY doc_id
         |                         ORDER BY cnt DESC, cand_lang) AS rn
         |    FROM hits) h WHERE rn = 1)
         |SELECT coalesce(b.cand_lang, 'und') AS pred_lang,
         |  count(*) AS n_docs, CAST(sum(q.n_words) AS BIGINT) AS total_words,
         |  CAST(sum(length(k.text)) AS BIGINT) AS total_chars
         |FROM keep k
         |JOIN quality q USING (doc_id)
         |LEFT JOIN best b USING (doc_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "pipeline_pack_corpus" ->
      s"""WITH words AS (
         |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
         |  FROM documents),
         |stats AS (
         |  SELECT doc_id, count(*) AS n_words,
         |    sum(CASE WHEN tok IN ($stopList) THEN 1 ELSE 0 END) AS n_stop
         |  FROM words GROUP BY 1),
         |keep AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
         |    FROM documents) t WHERE doc_id = keeper),
         |kept AS (
         |  SELECT s.doc_id, s.doc_id % $PackBuckets AS bucket,
         |    CAST(s.n_words AS BIGINT) AS n_tokens
         |  FROM stats s JOIN keep USING (doc_id)
         |  WHERE s.n_words >= 20 AND s.n_stop > 0),
         |${packTailSql("kept")}""".stripMargin,

    "text_winnow" ->
      s"""WITH $WinnowFpsSqlCtes
        |SELECT doc_id, fp FROM wf
        |ORDER BY doc_id, fp""".stripMargin,

    // modality CASE and byte arithmetic from the shared MediaSql fragments
    // (the oracle twin of MultimodalPipeline.mediaTypeOf)
    "multimodal_meta" ->
      s"""SELECT doc_id, source,
         |  ${MediaSql.NBytes} AS n_bytes,
         |  ${MediaSql.TypeCase} AS media_type,
         |  CAST(${MediaSql.NBytes} % 640 AS INT) AS width,
         |  CAST((${MediaSql.NBytes} * 7) % 480 AS INT) AS height
         |FROM documents ORDER BY doc_id""".stripMargin,

    // deterministic-codec arithmetic (MultimodalPipeline.MediaCodec
    // .deterministic): width/height/pixels are pure functions of blob size
    "multimodal_decode" ->
      s"""WITH t AS (SELECT doc_id, ${MediaSql.NBytes} AS len
         |  FROM documents WHERE ${MediaSql.isType(0)})
         |SELECT doc_id AS id,
         |  CAST(GREATEST(1, len % 640) AS INT) AS width,
         |  CAST(GREATEST(1, (len * 7) % 480) AS INT) AS height,
         |  3 AS channels, CAST(len AS INT) AS n_pixels
         |FROM t ORDER BY id""".stripMargin,

    // frameAt(blob, k*8) slices [k*128, k*128+16): per-frame byte count is
    // min(16, max(0, len - k*128)); n = min(4, max(1, len/128))
    "multimodal_frames" ->
      s"""WITH t AS (SELECT doc_id, ${MediaSql.NBytes} AS len
         |  FROM documents WHERE ${MediaSql.isType(2)}),
         |n AS (SELECT doc_id, len,
         |  LEAST(4, GREATEST(1, len // 128)) AS n_frames FROM t),
         |f AS (SELECT doc_id, n_frames, len,
         |  unnest(range(0, n_frames)) AS k FROM n)
         |SELECT doc_id AS id, CAST(n_frames AS INT) AS n_frames,
         |  CAST(sum(LEAST(16, GREATEST(0, len - k * 128))) AS BIGINT)
         |    AS total_frame_bytes
         |FROM f GROUP BY doc_id, n_frames ORDER BY id""".stripMargin,

    // stub decodeAudio: emb[i] = signedByte(blob[i % len]) / 128.0 — byte
    // values recovered via the shared hex-decode fragment, wrapped at len
    "multimodal_audio" -> {
      val embCols = (0 until 8).map { i =>
        s"""  CAST((CASE WHEN b$i >= 128 THEN b$i - 256 ELSE b$i END)
           | / 128.0 AS DOUBLE) AS e$i""".stripMargin.replace("\n", "")
      }.mkString(",\n")
      val byteCols = (0 until 8)
        .map(i => s"  ${MediaSql.hexByte(s"($i) % len")} AS b$i")
        .mkString(",\n")
      s"""WITH t AS (SELECT doc_id, ${MediaSql.NBytes} AS len,
         |  hex(encode(text)) AS hx
         |  FROM documents WHERE ${MediaSql.isType(1)}),
         |b AS (SELECT doc_id, len,
         |$byteCols
         |FROM t)
         |SELECT doc_id AS id, 16000 AS sample_rate,
         |  CAST(len AS BIGINT) AS duration_ms,
         |$embCols
         |FROM b ORDER BY id""".stripMargin
    },

    "corpus_report" ->
      s"""SELECT * FROM (
         |SELECT source, lang, count(*) AS n_docs,
         |  CAST(sum(len(string_split_regex(text, '\\s+'))) AS BIGINT)
         |    AS n_tokens,
         |  CAST(min(len(string_split_regex(text, '\\s+'))) AS BIGINT)
         |    AS min_toks,
         |  CAST(max(len(string_split_regex(text, '\\s+'))) AS BIGINT)
         |    AS max_toks,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  count(DISTINCT md5(text)) AS n_unique,
         |  count(*) - count(DISTINCT md5(text)) AS n_exact_dups
         |FROM documents WHERE text IS NOT NULL
         |GROUP BY source, lang
         |UNION ALL
         |SELECT '(intake)', '(rejects)', CAST($IntakeBadLines AS BIGINT),
         |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
         |UNION ALL
         |SELECT '(intake)', '(skipped_files)',
         |  CAST($IntakeSkippedFiles AS BIGINT),
         |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
         |) ORDER BY source, lang""".stripMargin
  )
}
