package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 scale pins for the source-audit family: `source` at 100 TB
  * is domain-grained (10M+ distinct values — the RefinedWeb/CCNet
  * posture), so the plans must carry NO source-cardinality-sized
  * single-partition shape: no one-row collect_list fold for Σ√n, no
  * unpartitioned window over the source rows. Exercised over 100k
  * synthetic sources (the sf tables have 20) with exactness checked
  * against closed-form arithmetic.
  */
class Round13PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  // 100k distinct sources: every source has 3 docs; the first 1000
  // carry 50 extra each (a skewed head, so gini is far from 0)
  private lazy val wide = {
    val base = spark.range(300000L).select(
      col("id").as("doc_id"),
      concat(lit("s"), format_string("%06d", col("id") % 100000L))
        .as("source"),
      lit("x").as("text"),
      (col("id") % 997L + 1L).as("n_chars"))
    val heavy = spark.range(50000L).select(
      (col("id") + 1000000L).as("doc_id"),
      concat(lit("s"), format_string("%06d", col("id") % 1000L))
        .as("source"),
      lit("y").as("text"),
      (col("id") % 997L + 1L).as("n_chars"))
    base.unionByName(heavy)
  }

  /** Every unpartitioned logical Window in `df`'s plan must sit above a
    * pid-grouped aggregate (≤ shuffle-partition-count rows — bounded by
    * cluster config, never by source cardinality). */
  private def assertWindowsBounded(
      df: org.apache.spark.sql.DataFrame, what: String): Unit = {
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: LWindow => w
    }
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      val overPid = w.child.collectFirst {
        case a: Aggregate
            if a.groupingExpressions.exists(_.toString.contains("pid")) =>
          a
      }
      assert(overPid.isDefined,
        s"$what: unpartitioned Window over a non-pid-bounded relation:\n$w")
    }
  }

  test("corpus_gini: distributed rank is EXACT at 100k sources and plans no source-sized single-partition shape") {
    val out = graft.queries.TextAnalysis.corpusGiniOf(wide)
    assertWindowsBounded(out, "corpus_gini")
    val row = out.head()
    assert(row.getAs[Long]("n_sources") === 100000L)
    assert(row.getAs[Long]("n_docs") === 350000L)
    // closed form: ranks 1..99000 are the n=3 sources, 99001..100000
    // the n=53 head (ascending (n, source) — all n=3 sort below n=53)
    val k = 100000L
    var num = 0L
    var i = 1L
    while (i <= k) {
      val n = if (i <= 99000L) 3L else 53L
      num += n * (2L * i - k - 1L)
      i += 1L
    }
    val expected = num.toDouble / (k * 350000L).toDouble
    assert(row.getAs[Double]("gini") === expected,
      "distributed rank must reproduce the single-window value bit-exactly")
    assert(expected > 0.1, "the skewed head must register")
  }

  test("mix thresholds: Σ√n is an order-free integer sum — no collect_list, no unpartitioned window, broadcast-only joins at 100k sources") {
    val thr = graft.queries.TextAnalysis.mixThresholdsOf(wide)
    val lp = thr.queryExecution.optimizedPlan.toString
    assert(!lp.contains("collect_list"),
      s"Σ√n must not fold a one-row collect_list:\n$lp")
    assertWindowsBounded(thr, "mix_thresholds")
    val pp = thr.queryExecution.executedPlan.toString
    assert(!pp.contains("SortMergeJoin") && !pp.contains("CartesianProduct"),
      s"the scalar Σ side must broadcast:\n$pp")
    // functional sanity at 100k sources: every rate in (0, 1], the
    // skewed head is down-weighted relative to its doc share
    val rows = thr.collect()
    assert(rows.length === 100000)
    assert(rows.forall { r =>
      val rate = r.getAs[Double]("rate")
      rate > 0.0 && rate <= 1.0
    })
    val byN = rows.groupBy(_.getAs[Long]("n_docs")).map { case (n, rs) =>
      n -> rs.head.getAs[Double]("rate")
    }
    assert(byN(53L) < byN(3L) * (53.0 / 3.0),
      "temperature must down-weight the heavy head vs proportional")
  }

  test("pack_best_fit: no document straddles a sequence, fills never exceed the budget, and padding beats the per-doc chunk baseline") {
    val out = SparkEntry.queries("pack_best_fit")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    val budget = 512L
    // every document exactly once — a doc can never straddle sequences
    val docIds = out.map(_.getAs[Long]("doc_id"))
    assert(docIds.distinct.length === docIds.length)
    // n_eff = min(n_tokens + 1, budget) (one EOS per doc), fits its bin
    out.foreach { r =>
      assert(r.getAs[Long]("n_eff") ===
        math.min(r.getAs[Long]("n_tokens") + 1L, budget))
      assert(r.getAs[Long]("seq_used") <= budget,
        "a sequence must never be over-filled")
      assert(r.getAs[Double]("pad_frac") ===
        (budget - r.getAs[Long]("seq_used")).toDouble / budget.toDouble)
    }
    // bin fill is consistent: Σ n_eff within a (bucket, seq) == seq_used
    out.groupBy(r => (r.getAs[Long]("bucket"), r.getAs[Long]("seq")))
      .foreach { case (_, rs) =>
        assert(rs.map(_.getAs[Long]("n_eff")).sum ===
          rs.head.getAs[Long]("seq_used"))
      }
    // padding ≤ the boundary-respecting chunk baseline (each doc alone
    // in ⌈n_eff/budget⌉ padded rows), and strictly better on the real
    // corpus — packing must actually pack
    val seqs = out.map(r =>
      (r.getAs[Long]("bucket"), r.getAs[Long]("seq"),
        r.getAs[Long]("seq_used"))).distinct
    val ffdPad = seqs.map(s => budget - s._3).sum
    val basePad = out.map { r =>
      val ne = r.getAs[Long]("n_eff")
      ((ne + budget - 1L) / budget) * budget - ne
    }.sum
    assert(ffdPad <= basePad)
    assert(ffdPad < basePad,
      s"FFD pad $ffdPad must beat the per-doc baseline $basePad")
  }

  test("pack_best_fit_tokens: training rows are exactly L ids, docs never straddle, padding beats the per-doc chunk baseline") {
    val rows = SparkEntry.queries("pack_best_fit_tokens")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val L = 128L
    rows.foreach { r =>
      assert(r.getAs[Long]("n_real") + r.getAs[Long]("n_pad") === L,
        "every materialized training row is exactly L ids")
      assert(r.getAs[Long]("n_real") >= 1L && r.getAs[Long]("n_real") <= L)
    }
    // every tokenized doc lands in exactly one sequence
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val tokenized = SparkEntry.queries("tokenize_bpe_ids")(
      spark, "/root/testdata/sf0.001").count()
    assert(nDocs === tokenized)
    // FFD padding strictly beats one-padded-row-per-doc
    val ffdPad = rows.map(_.getAs[Long]("n_pad")).sum
    assert(ffdPad < tokenized * (L - 1L),
      "packing must beat the trivial per-doc baseline by construction")
    assert(rows.length.toLong * L ===
      rows.map(_.getAs[Long]("n_real")).sum + ffdPad)
  }

  test("CorpusJsonl: malformed lines quarantine — never a crash, never a silent drop; escapes round-trip") {
    import graft.sources.CorpusJsonl
    val dir = java.nio.file.Files
      .createTempDirectory("graft-jsonlspec").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.json"),
      Seq(
        """{"doc_id": 1, "text": "alpha", "lang": "en", "source": "s", "n_chars": 5}""",
        """{"doc_id": 2, "text": "beta\nsecond line", "lang": "de", "source": "s", "n_chars": 16}""",
        """{broken json""",
        """{"text": "orphan without id", "lang": "en", "source": "s", "n_chars": 17}"""
      ).mkString("\n").getBytes("UTF-8"))
    val clean = CorpusJsonl.read(spark, dir).collect()
    assert(clean.map(_.getAs[Long]("doc_id")).sorted.toSeq === Seq(1L, 2L))
    assert(clean.find(_.getAs[Long]("doc_id") == 2L).get
      .getAs[String]("text") === "beta\nsecond line",
      "JSON escapes must decode to the real characters")
    val rejects = CorpusJsonl.readCorrupt(spark, dir).collect()
    assert(rejects.length === 2,
      s"one parse failure + one id-less row quarantine: ${rejects.toSeq}")
    assert(rejects.exists(r =>
      !r.isNullAt(0) && r.getString(0).contains("{broken")),
      "the raw malformed line must be preserved for the quarantine")
    // and a full write→read round trip over the real corpus is the
    // jsonl_roundtrip oracle gate; here just pin the gzip shard count =
    // read parallelism contract
    val d = spark.range(100).selectExpr("id AS doc_id",
      "CAST(id AS STRING) AS text", "'en' AS lang", "'s' AS source",
      "CAST(1 AS LONG) AS n_chars")
    val out = java.nio.file.Files
      .createTempDirectory("graft-jsonlgz").toString
    CorpusJsonl.write(d, out, shards = 4)
    val parts = new java.io.File(out).listFiles()
      .count(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".gz"))
    assert(parts === 4, "gzip shards are the parallelism ceiling — " +
      "the writer must honor the shard count")
    assert(CorpusJsonl.read(spark, out).count() === 100L)
  }

  test("CLI ingest-jsonl: clean rows land as parquet, malformed lines quarantine, counts printed") {
    val in = java.nio.file.Files
      .createTempDirectory("graft-jsonlcli").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(in, "part-0.json"),
      Seq(
        """{"doc_id": 10, "text": "x", "lang": "en", "source": "s", "n_chars": 1}""",
        """{"doc_id": 11, "text": "y", "lang": "en", "source": "s", "n_chars": 1}""",
        """not json at all"""
      ).mkString("\n").getBytes("UTF-8"))
    val out = java.nio.file.Files
      .createTempDirectory("graft-jsonlcliout").toString
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf)) {
      graft.cli.Main.main(Array("ingest-jsonl", in, out))
    }
    val printed = buf.toString("UTF-8")
    assert(printed.contains("ingested 2 documents"), printed)
    assert(printed.contains("quarantined 1 malformed"), printed)
    assert(spark.read.parquet(out).count() === 2L)
    assert(spark.read.json(s"$out/_rejects").count() === 1L)
  }

  test("ffdAssign property: random corpora match a reference FFD simulation exactly") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(61)
    for (trial <- 0 until 4) {
      val budget = Seq(64L, 128L, 512L)(trial % 3)
      val docs = (0 until 400).map { i =>
        val n = 1L + rnd.nextInt(2 * budget.toInt)
        (i.toLong, (i % 8).toLong, n, math.min(n + 1L, budget))
      }
      val got = graft.queries.TextAnalysis.ffdAssign(spark,
          docs.toDF("doc_id", "bucket", "n_tokens", "n_eff"), budget)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("seq"), r.getAs[Long]("step")))
        .toMap
      // reference simulation: per bucket, (n_eff DESC, doc_id) order,
      // first bin that fits in creation order
      val want = docs.groupBy(_._2).flatMap { case (_, grp) =>
        val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
        grp.sortBy(t => (-t._4, t._1)).zipWithIndex.map {
          case ((docId, _, _, nEff), i) =>
            val fit = rem.indexWhere(_ >= nEff)
            val seq =
              if (fit >= 0) { rem(fit) -= nEff; fit + 1L }
              else { rem += budget - nEff; rem.length.toLong }
            docId -> (seq, i + 1L)
        }
      }.toMap
      assert(got === want, s"trial $trial budget $budget")
      // invariants: no bin over-full, bins 1..max contiguous per bucket
      docs.groupBy(_._2).foreach { case (b, grp) =>
        val byBin = grp.groupBy(t => got(t._1)._1)
        byBin.foreach { case (_, ds) =>
          assert(ds.map(_._4).sum <= budget)
        }
        val bins = byBin.keySet
        assert(bins === (1L to bins.max).toSet, s"bucket $b bins $bins")
      }
    }
  }

  test("mix_temperature keeps its exact-audit semantics through the integer-sum form (20-source gate corpus)") {
    // the sf oracle gates bit-exactness; this pins the algebra wiring:
    // per-source n_kept counts docs whose u32 clears the threshold
    val sfDir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("mix_temperature")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("thr") ===
        math.floor(r.getAs[Double]("rate") * 4294967296.0).toLong)
    }
  }
}
