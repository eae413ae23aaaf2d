package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale rehearsal (BENCH_TREND.md "sf1" column): upsamples the FULL
  * sf0.1 table set 10× — join keys shifted consistently so every query
  * family sees a coherent 10×-row database — and runs EVERY SparkEntry
  * query once at both scales, printing per-query wall ratios for the
  * slope audit.
  *
  * Upsample shapes (copy token cp ∈ 0..9, key += cp × stride):
  *  - documents: NEAR-duplicate copies (distinct suffix token) — the
  *    realistic heavy case for the near-dup family: every doc in a
  *    10-clique, exact dedup still has within-copy work.
  *  - lineitem/orders/customer/supplier/part: fact keys shifted by the
  *    SAME stride on both sides of each join (l_orderkey with o_orderkey,
  *    o_custkey with c_custkey, …) so join selectivity is preserved;
  *    nation/region stay as-is (bounded dimensions — duplicating an enum
  *    would be schema vandalism, not scale).
  *  - events: new event ids AND new users (user_id shifted) — sessionize/
  *    funnel/retention see 10× users at the same per-user history.
  *  - embeddings: vec_id shifted, vectors kept — ANN sees a 10× corpus.
  *
  * Interpretation contract (BENCH_TREND.md): a healthy slope is ≤ the
  * operator's documented work measure from SCALING.md — linear for scans/
  * aggs (wall ratio ≤ ~10 minus fixed-cost amortization; in practice 1-4×
  * at this absolute size because fixed cost still dominates), edge-volume
  * for the CC family, quadratic-in-clique for pair emitters capped by the
  * band caps. Anything ABOVE its measure is flagged `SLOPE?`.
  */
object ScaleRehearsal {

  /** The documented worst-slope families the 100× column audits
    * (round-12 directive #5): connected components (edge-volume
    * measure), the PQ corpus probe (n^1.5), the fuzzy join (candidate
    * volume — the family the adaptive deletion generator exists for),
    * and the bigram perplexity model (distinct-bigram growth).
    * Round 13 adds the round-12 sampling/sketch/audit families (all
    * scan-speed or k-bounded claims — anything superlinear there is a
    * real bug, not a documented measure) and the round-13 FFD packer
    * (linear scan + bucket-parallel sequential fit). Round 14 adds the
    * round-13 entries that lacked 100× evidence (filtered ANN probes,
    * semantic decontamination, token-tier FFD, the JSONL boundary, the
    * imported tokenizer — scan-speed or k-bounded claims each) plus the
    * round-14 boundary-composed intake (CC-dominated, the
    * pipeline_dedup measure) and the accounting data card. */
  private val Sf10Families = Seq(
    "dedup_clusters", "split_by_cluster", "pipeline_dedup_corpus",
    "dedup_semantic_pq", "fuzzy_join_names", "text_perplexity_bigram",
    "sample_priority", "sample_priority_by_lang", "mix_temperature",
    "pipeline_mix_sample", "corpus_gini", "text_quantiles_sketch",
    "emb_slice_renorm", "pack_best_fit",
    "ann_filtered_persisted", "decontaminate_semantic",
    "pack_best_fit_tokens", "jsonl_roundtrip", "tokenize_bpe_ids_imported",
    "pipeline_intake_e2e", "corpus_report",
    // round-14 session 2: incremental cross-drop dedup — state-evidence
    // scan + drop scan, both linear; the near-dup join is band-capped
    "dedup_incremental", "dedup_incremental_report",
    "pipeline_intake_incremental", "dedup_incremental_semantic",
    "decontaminate_registry", "pipeline_drop_curate",
    // round 15: the span tier, the e2e accounting card, and the
    // persisted cross-drop pack (cold column carries artifact builds)
    "dedup_incremental_span", "pipeline_intake_report",
    "pipeline_drop_pack", "pipeline_drop_train", "pipeline_drop_report",
    "pipeline_drop_scrub",
    // round 16: the treated loop (scrub composed into the pack)
    "pipeline_drop_train_scrubbed",
    // round 17: the cross-drop perceptual tier (banded-hamming
    // admission against persisted dHashes; dedup_incremental_span /
    // pipeline_drop_scrub above now measure the stride-1 probe)
    "dedup_incremental_phash")

  /** `ScaleRehearsal sf10 [base] [out] [queries...]` — the 100× column:
    * a 100-copy database materialized for JUST the tables the audited
    * families read, then warm-vs-warm wall ratios sf0.1 → sf10.
    *
    * Upsample shapes at 100× (chosen so each family's WORK measure
    * scales honestly rather than degenerating):
    *  - documents: 100 copies in 10 GROUPS of 10 — groups are made
    *    textually distinct by a per-group letter rotation (a substitution
    *    cipher rewrites every shingle), copies inside a group keep the
    *    near-dup suffix. Clique size stays 10 while clique COUNT scales
    *    100×: constant dup-rate, the realistic corpus posture (100-crews
    *    would measure clique² explosion, not scale);
    *  - embeddings: vec_id shifted, vectors kept (the sf1 methodology);
    *  - customer: keys shifted AND c_name regenerated from the shifted
    *    key, so the fuzzy join sees a genuinely 100× distinct-name
    *    corpus (the sf1 shape keeps names duplicated, which distinct()
    *    collapses — a flat slope that measures nothing). */
  def runSf10(args: Seq[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf10"
    val only: Set[String] = args.drop(2).toSet
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    buildSf10(spark, base, out)
    val all = graft.SparkEntry.queries
    val names = Sf10Families.filter(q => only.isEmpty || only(q))

    def timeAt(dir: String, name: String): Double = {
      val t0 = System.nanoTime()
      all(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"${"query"}%-28s ${"sf0.1"}%8s ${"sf10cold"}%9s ${"sf10"}%8s  ratio (100x rows, warm)")
    val rows = names.map { q =>
      val r = try {
        timeAt(base, q)
        val a = timeAt(base, q)
        val bCold = timeAt(out, q)
        val b = timeAt(out, q)
        (q, a, bCold, b, b / a, "")
      } catch { case e: Exception =>
        (q, Double.NaN, Double.NaN, Double.NaN, Double.NaN,
          e.getClass.getSimpleName)
      }
      println(f"${r._1}%-28s ${r._2}%8.2f ${r._3}%9.2f ${r._4}%8.2f  ${r._5}%5.1fx ${r._6}")
      r
    }
    val js = rows.map { case (q, a, bCold, b, ratio, err) =>
      if (err.nonEmpty) s""""$q":{"err":"$err"}"""
      else f""""$q":{"sf01":$a%.3f,"sf10_cold":$bCold%.3f,"sf10":$b%.3f,"ratio":$ratio%.2f}"""
    }.mkString(",")
    println(s"""{"rehearsal":"sf10-families","queries":{$js}}""")
    spark.stop()
  }

  /** Materialize the 100× tables the sf10 families read (idempotent). */
  def buildSf10(spark: SparkSession, base: String, out: String): Unit = {
    def tbl(n: String): DataFrame = spark.read.parquet(s"$base/$n.parquet")
    def exists(n: String) = new java.io.File(s"$out/$n.parquet").exists()
    def write(df: DataFrame, n: String): Unit =
      df.repartition(32).write.mode("overwrite")
        .parquet(s"$out/$n.parquet")
    val copies = spark.range(100).toDF("cp")

    if (!exists("documents")) {
      val d = tbl("documents")
      val s = d.agg(max(col("doc_id"))).head().getLong(0) + 1L
      val alpha = "abcdefghijklmnopqrstuvwxyz"
      // group g = cp/10: letter rotation by g rewrites every shingle, so
      // groups are distinct corpora; cp%10 keeps the near-dup suffix
      val g = (col("cp") / 10).cast("int")
      val rotated = (1 until 10).foldLeft(
          when(g === 0, col("text"))) { (acc, gi) =>
        acc.when(g === gi,
          translate(col("text"), alpha, alpha.drop(gi) + alpha.take(gi)))
      }
      write(d.crossJoin(copies).select(
        (col("doc_id") + col("cp") * s).as("doc_id"),
        concat(rotated, lit(" cp"), col("cp") % 10).as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long")),
        "documents")
    }
    if (!exists("embeddings")) {
      val e = tbl("embeddings")
      val s = e.agg(max(col("vec_id"))).head().getLong(0) + 1L
      val cols = e.columns.map {
        case "vec_id" => (col("vec_id") + col("cp") * s).as("vec_id")
        case c => col(c)
      }
      write(e.crossJoin(copies).select(cols.toSeq: _*), "embeddings")
    }
    if (!exists("customer")) {
      val c = tbl("customer")
      val s = c.agg(max(col("c_custkey"))).head().getLong(0) + 1L
      val key = col("c_custkey") + col("cp") * s
      val cols = c.columns.map {
        case "c_custkey" => key.as("c_custkey")
        case "c_name" =>
          concat(lit("Customer#"), lpad(key.cast("string"), 9, "0"))
            .as("c_name")
        case cc => col(cc)
      }
      write(c.crossJoin(copies).select(cols.toSeq: _*), "customer")
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("sf10")) return runSf10(args.drop(1).toSeq)
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val only: Set[String] = args.drop(2).toSet
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    buildSf1(spark, base, out)

    val all = graft.SparkEntry.queries
    val names = all.keys.toSeq.sorted.filter(q => only.isEmpty || only(q))

    def timeAt(dir: String, name: String): Double = {
      val t0 = System.nanoTime()
      all(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }

    // two timed passes per scale; the SLOPE reads warm-vs-warm so it
    // measures data-volume scaling, not plan compilation or one-time
    // artifact builds (log ingest for graft_*, IVF persist, BPE training
    // — those land in the cold column, reported separately: they're
    // amortized builds at 100 TB, not per-query cost).
    println(f"${"query"}%-28s ${"sf0.1"}%8s ${"sf1cold"}%8s ${"sf1"}%8s  ratio (10x rows, warm)")
    val rows = names.map { q =>
      val r = try {
        timeAt(base, q)
        val a = timeAt(base, q)
        val bCold = timeAt(out, q)
        val b = timeAt(out, q)
        (q, a, bCold, b, b / a, "")
      } catch { case e: Exception =>
        (q, Double.NaN, Double.NaN, Double.NaN, Double.NaN,
          e.getClass.getSimpleName)
      }
      println(f"${r._1}%-28s ${r._2}%8.2f ${r._3}%8.2f ${r._4}%8.2f  ${r._5}%5.1fx ${r._6}")
      r
    }
    val js = rows.map { case (q, a, bCold, b, ratio, err) =>
      if (err.nonEmpty) s""""$q":{"err":"$err"}"""
      else f""""$q":{"sf01":$a%.3f,"sf1_cold":$bCold%.3f,"sf1":$b%.3f,"ratio":$ratio%.2f}"""
    }.mkString(",")
    println(s"""{"rehearsal":"sf1-full","queries":{$js}}""")
    spark.stop()
  }

  /** Materialize the 10× database under `out` (idempotent per table). */
  def buildSf1(spark: SparkSession, base: String, out: String): Unit = {
    def tbl(n: String): DataFrame = spark.read.parquet(s"$base/$n.parquet")
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L
    def cp(df: DataFrame): DataFrame = df.crossJoin(
      spark.range(10).toDF("cp"))
    def write(df: => DataFrame, n: String): Unit = {
      val f = new java.io.File(s"$out/$n.parquet")
      if (!f.exists())
        df.repartition(32).write.mode("overwrite").parquet(f.toString)
    }
    // `shifts` is by-name: the existence check must run before any stride
    // scan is forced, so a warm re-run costs zero Spark jobs here
    def shifted(n: String)(shifts: => Seq[(String, Long)]): Unit = {
      val f = new java.io.File(s"$out/$n.parquet")
      if (f.exists()) return
      val d = tbl(n)
      val sm = shifts.toMap
      val cols = d.columns.map { c =>
        sm.get(c) match {
          case Some(s) => (col(c) + col("cp") * s).as(c)
          case None => col(c)
        }
      }
      write(cp(d).select(cols.toSeq: _*), n)
    }

    val docsOut = new java.io.File(s"$out/documents.parquet")
    if (!docsOut.exists()) {
      val d = tbl("documents")
      val s = stride(d, "doc_id")
      write(cp(d).select(
        (col("doc_id") + col("cp") * s).as("doc_id"),
        concat(col("text"), lit(" cp"), col("cp")).as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long")),
        "documents")
    }

    // strides are lazy so a warm re-run (all outputs exist) runs ZERO
    // stride scans — shifted() returns before forcing any of them
    lazy val sO = stride(tbl("orders"), "o_orderkey")
    lazy val sC = stride(tbl("customer"), "c_custkey")
    lazy val sS = stride(tbl("supplier"), "s_suppkey")
    lazy val sP = stride(tbl("part"), "p_partkey")
    shifted("lineitem")(Seq("l_orderkey" -> sO, "l_partkey" -> sP,
      "l_suppkey" -> sS))
    shifted("orders")(Seq("o_orderkey" -> sO, "o_custkey" -> sC))
    shifted("customer")(Seq("c_custkey" -> sC))
    shifted("supplier")(Seq("s_suppkey" -> sS))
    shifted("part")(Seq("p_partkey" -> sP))
    shifted("events")(Seq(
      "event_id" -> stride(tbl("events"), "event_id"),
      "user_id" -> stride(tbl("events"), "user_id")))
    shifted("embeddings")(Seq(
      "vec_id" -> stride(tbl("embeddings"), "vec_id")))
    Seq("nation", "region").foreach(n => write(tbl(n), n))
  }
}
