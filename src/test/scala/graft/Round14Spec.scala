package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 additions: the segment-tree first-fit kernel, the hardened
  * JSONL boundary (admission control, corrupt-shard quarantine,
  * size-derived sharding), the factored semantic decontamination
  * operator, and the intake accounting surface. */
class Round14Spec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  // ---------------------------------------------------------------- FFD

  /** The round-13 linear kernel, as the reference implementation. */
  private def packLinear(sizes: Seq[Long], budget: Long): Seq[Long] = {
    val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
    sizes.map { nEff =>
      var i = 0
      var fit = -1
      while (fit < 0 && i < rem.length) {
        if (rem(i) >= nEff) fit = i
        i += 1
      }
      if (fit >= 0) { rem(fit) -= nEff; fit + 1L }
      else { rem += budget - nEff; rem.length.toLong }
    }
  }

  test("FirstFitTree reproduces the linear first-fit scan bin-for-bin on random workloads") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 40) {
      val budget = 16L + rnd.nextInt(2048)
      val n = 1 + rnd.nextInt(4000)
      // FFD visit order: sizes descending, like ffdAssign's sorted groups
      val sizes = Seq.fill(n)(1L + rnd.nextInt(budget.toInt)).sortBy(-_)
      val want = packLinear(sizes, budget)
      val bins = new graft.operators.FirstFitTree
      val got = sizes.map { nEff =>
        val fit = bins.firstFit(nEff)
        if (fit >= 0) { bins.take(fit, nEff); fit + 1L }
        else { bins.append(budget - nEff); bins.size.toLong }
      }
      assert(got === want, s"trial $trial (n=$n budget=$budget)")
    }
  }

  // ------------------------------------------------- snapshot cache

  test("ensureSnapshot: per-process 0700 root, full-layout validation, self-heal on a partially destroyed snapshot") {
    val sparkS = spark
    import sparkS.implicits._
    val names = (0 until 300).map(i => f"ID#$i%06d").toDF("s").distinct()
    val snap = graft.operators.FuzzyJoin.ensureSnapshot(names, 2, 1)
    val p = java.nio.file.Paths.get(snap)
    // per-process scoping: the root dir carries this JVM's pid (two
    // processes sharing a catalog must never resolve to the same dir —
    // the first to exit would delete it under the other's live stream)
    val pid = ProcessHandle.current().pid()
    assert(p.getParent.getFileName.toString
      .startsWith(s"graft-fuzzy-catsnap3-$pid-"),
      s"snapshot root must be process-scoped: $p")
    // 0700 on POSIX: no other user can tamper with or read the cache
    val perms = java.nio.file.Files.getPosixFilePermissions(p.getParent)
    import java.nio.file.attribute.PosixFilePermission._
    assert(!perms.contains(GROUP_READ) && !perms.contains(OTHERS_READ) &&
      !perms.contains(GROUP_WRITE) && !perms.contains(OTHERS_WRITE))
    // the full 128-bit content key names the dir (a truncated key would
    // let a collision serve the WRONG catalog)
    assert(p.getFileName.toString.matches("[0-9a-f]{32}"))
    // reuse: same content → same dir, no re-stage
    assert(graft.operators.FuzzyJoin.ensureSnapshot(names, 2, 1) === snap)
    // partially destroy it (tmp-cleaner shape: generator file lost,
    // names/ retained) — the old existence check would serve it and the
    // stream would then die per micro-batch with no self-heal
    java.nio.file.Files.delete(p.resolve("generator"))
    val healed = graft.operators.FuzzyJoin.ensureSnapshot(names, 2, 1)
    assert(healed === snap, "re-staged under the same content key")
    assert(java.nio.file.Files.isRegularFile(
      java.nio.file.Paths.get(healed, "generator")),
      "the generator file must be re-staged")
    assert(java.nio.file.Files.isRegularFile(
      java.nio.file.Paths.get(healed, "count")),
      "the row-count cross-check file must exist")
    val n = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(healed, "count")), "UTF-8").trim.toLong
    assert(n === 300L)
  }

  // ------------------------------------------------- JSONL boundary

  /** A JSONL drop dir: `nClean` clean docs across `shards` gzip shards,
    * plus one malformed-lines shard and one corrupt (garbage-header)
    * gzip shard. Returns (dir, clean doc count, malformed line count). */
  private def jsonlFixture(
      tag: String, nClean: Int, shards: Int): (String, Int, Int) = {
    val sparkS = spark
    import sparkS.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"r14-jsonl-$tag")
    val docs = (0 until nClean).map(i =>
      (i.toLong, s"doc text number $i", "en", s"src${i % 3}", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    graft.sources.CorpusJsonl.write(docs, dir.toString, shards = shards)
    // malformed-lines shard: 2 parse errors + 1 id-less object
    val bad = java.io.File.createTempFile("badlines", ".json.gz",
      dir.toFile)
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(bad))
    out.write(
      "{\"doc_id\": oops\nnot json at all\n{\"text\": \"no id here\"}\n"
        .getBytes("UTF-8"))
    out.close()
    // corrupt shard: a .gz whose bytes are not gzip at all — the codec
    // fails at open; without file-level tolerance this kills the read
    val corrupt = dir.resolve("corrupt-shard.json.gz")
    java.nio.file.Files.write(corrupt,
      Array.fill[Byte](256)(0x42))
    (dir.toString, nClean, 3)
  }

  test("CorpusJsonl: a corrupt gzip shard does not kill the read; auditShards quarantines exactly that file with its error") {
    val (dir, nClean, nBad) = jsonlFixture("audit", 40, 2)
    val files = graft.sources.CorpusJsonl.listShards(spark, dir)
    // the corrupt shard is LISTED (it is part of the drop) …
    assert(files.exists(_.contains("corrupt-shard")))
    // … the read survives it and loses nothing else
    val clean = graft.sources.CorpusJsonl.readFiles(spark, files)
    assert(clean.count() === nClean.toLong)
    val rejects = graft.sources.CorpusJsonl.readCorruptFiles(spark, files)
    assert(rejects.count() === nBad.toLong)
    // … and the file-quarantine relation flags it, loudly and precisely
    val audit = graft.sources.CorpusJsonl.auditShards(spark, files)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
        Option(r.getString(3)))).toSeq
    assert(audit.length === files.length)
    val badRows = audit.filter(!_._3)
    assert(badRows.length === 1)
    assert(badRows.head._1.contains("corrupt-shard"))
    assert(badRows.head._4.exists(_.nonEmpty), "error surfaced")
    // good shards audit clean with exact line counts
    assert(audit.filter(_._3).map(_._2).sum === (nClean + nBad).toLong)
  }

  test("CorpusJsonl.write derives shard count from size with the MinShards floor") {
    val sparkS = spark
    import sparkS.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r14-shards")
    val docs = (0 until 50).map(i =>
      (i.toLong, s"t$i", "en", "s", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    graft.sources.CorpusJsonl.write(docs, dir.toString) // shards = derive
    val files = graft.sources.CorpusJsonl.listShards(spark, dir.toString)
    // tiny input → the floor binds (read-parallelism floor, not 1 file)
    assert(files.length === graft.sources.CorpusJsonl.MinShards)
    assert(graft.sources.CorpusJsonl
      .read(spark, dir.toString).count() === 50L)
  }

  test("ingestStream admission control: a file backlog drains across bounded micro-batches, still exactly-once") {
    val (dir, nClean, nBad) = jsonlFixture("trigger", 60, 6)
    val work = java.nio.file.Files.createTempDirectory("r14-ingest")
    val (q1, q2) = graft.sources.CorpusJsonl.ingestStream(
      spark, dir, s"$work/table", s"$work/rejects", s"$work/ckpt",
      maxFilesPerTrigger = Some(2))
    try {
      q1.processAllAvailable(); q2.processAllAvailable()
      assert(spark.read.parquet(s"$work/table").count() === nClean.toLong)
      assert(spark.read.schema("raw_line string, doc_id long")
        .json(s"$work/rejects").count() === nBad.toLong)
      // ≥ 8 listed files at 2 per trigger ⇒ the backlog must have taken
      // several micro-batches (one offset file per batch)
      val batches = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$work/ckpt/clean/offsets"))
        .count()
      assert(batches >= 4, s"expected a multi-batch drain, got $batches")
    } finally { q1.stop(); q2.stop() }
  }

  test("fileAuditStream: the streaming file-quarantine leg flags a corrupt shard as it lands") {
    val (dir, nClean, nBad) = jsonlFixture("streamaudit", 20, 2)
    val work = java.nio.file.Files.createTempDirectory("r14-faudit")
    val q = graft.sources.CorpusJsonl.fileAuditStream(spark, dir)
      .writeStream.format("memory").queryName("r14_file_audit")
      .option("checkpointLocation", s"$work/ckpt")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("r14_file_audit")
        .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(3)))
      assert(rows.nonEmpty)
      val bad = rows.filter(!_._3)
      assert(bad.length === 1 && bad.head._1.contains("corrupt-shard"))
      val goodLines = rows.filter(_._3).map(_._2).sum
      assert(goodLines === (nClean + nBad).toLong)
    } finally q.stop()
  }

  // --------------------------------------- semantic decontamination

  test("decontaminateSemantic scores a corpus against an EXTERNAL benchmark relation") {
    val sparkS = spark
    import sparkS.implicits._
    // corpus: c1 aligned with b1 (cos 1), c2 at 45° of b1 (cos ~0.707,
    // also 45° of b2), c3 orthogonal to both
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 1.0)), (3L, Seq(0.0, 0.0) :+ 0.0))
      .map { case (i, v) => (i, v.padTo(3, 0.0)) }
      .toDF("id", "emb")
    val bench = Seq((100L, Seq(1.0, 0.0, 0.0)), (101L, Seq(0.0, 1.0, 0.0)))
      .toDF("bid", "bemb")
    val got = graft.queries.Dedup.decontaminateSemantic(
        corpus.filter($"id" =!= 3L), "id", "emb", bench, "bid", "bemb", 0.7)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // c1 hits b1 only (cos 1.0); c2 hits both at cos 1/√2 ≈ 0.7071
    assert(got.length === 2)
    assert(got(0)._1 === 1L && got(0)._2 === 1L && got(0)._3 === 1.0)
    assert(got(1)._1 === 2L && got(1)._2 === 2L)
    assert(math.abs(got(1)._3 - 1.0 / math.sqrt(2.0)) < 1e-12)
  }

  test("pipeline_pretrain_corpus drops a PARAPHRASE leak the n-gram stage cannot see (semantic leg composed)") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.functions.length
    // three long, mutually shingle-disjoint texts (quality gate needs
    // >= 100 chars and >= 20 words)
    val benchText = ("alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
    val paraphrase = ("zebra yak wolf viper tiger snake rhino puma otter " +
      "newt mole lynx koala jackal ibex heron gecko ferret eagle dingo " +
      "crane bison")
    val clean = ("apple banana cherry date elder fig grape honey iris " +
      "jade kiwi lemon mango nectar olive peach quince rose straw tomato " +
      "ugli vine")
    val docs = Seq(
      (97L, benchText, "en"), // benchmark split (97 % 97 = 0)
      (5L, paraphrase, "en"), // no shared 3-gram — but embedding ≈ bench
      (2L, clean, "en")) // control: survives
    val dir = java.nio.file.Files.createTempDirectory("r14-sem").toString
    docs.toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((97L, Seq(1.0f, 0.0f, 0.0f), 0),
        (5L, Seq(1.0f, 0.0f, 0.0f), 0), // cosine 1.0 vs the bench vector
        (2L, Seq(0.0f, 1.0f, 0.0f), 1)) // orthogonal — clean
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.queries.Dedup.queries("pipeline_pretrain_corpus")(
        spark, dir)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    // ONLY the control survives: doc 97 is the bench split, doc 5 is
    // semantically contaminated (n-gram stage alone would keep it)
    assert(out.map(_._2).sum === 1L, out.toSeq)
    assert(out.head._3 === 22L, out.toSeq)
  }

  test("pipeline_pretrain_corpus without an embeddings relation runs the n-gram stage alone") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.functions.length
    val clean = ("apple banana cherry date elder fig grape honey iris " +
      "jade kiwi lemon mango nectar olive peach quince rose straw tomato " +
      "ugli vine")
    val dir = java.nio.file.Files.createTempDirectory("r14-noemb").toString
    Seq((2L, clean, "en")).toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.Dedup.queries("pipeline_pretrain_corpus")(
      spark, dir).collect()
    assert(out.map(_.getLong(2)).sum === 1L)
  }

  test("corpusReportStream with the rejects leg emits the per-window '(intake)' sentinel row") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(java.sql.Timestamp, String, String, String)]
    val rej = MemoryStream[(java.sql.Timestamp, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val q = graft.streaming.StreamOps.corpusReportStream(
        mem.toDF().toDF("ts", "text", "source", "lang"),
        "ts", "text", "source", "lang", "10 seconds", "5 seconds",
        rejects = Some(rej.toDF().toDF("ts", "raw_line")),
        rejectsTsCol = "ts")
      .writeStream.format("memory").queryName("r14_scard")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts(1), "aa bb cc", "web", "en"),
        (ts(3), "dd ee", "web", "en"))
      rej.addData((ts(2), "{broken"), (ts(4), "not json"))
      q.processAllAvailable()
      // close the window on BOTH inputs (the union's watermark is the min)
      mem.addData((ts(30), "zz", "web", "en"))
      rej.addData((ts(30), "late junk"))
      q.processAllAvailable()
      val rows = spark.table("r14_scard")
        .selectExpr("unix_timestamp(win_start)", "source", "lang",
          "n_docs", "n_tokens")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
      assert(rows.contains((0L, "web", "en", 2L, 5L)), rows)
      // the sentinel: 2 rejected lines in the window, metrics null
      assert(rows.contains((0L, "(intake)", "(rejects)", 2L, -1L)), rows)
    } finally q.stop()
  }

  test("FirstFitTree grows past its initial capacity without losing bins") {
    // every doc fills a whole bin → one bin per doc, forcing two
    // capacity doublings past the initial 1024 leaves
    val budget = 64L
    val bins = new graft.operators.FirstFitTree
    for (i <- 0 until 5000) {
      assert(bins.firstFit(budget) === -1, s"doc $i must open a new bin")
      bins.append(0L)
    }
    assert(bins.size === 5000)
    // now interleave: remainders re-raised must be findable in index order
    bins.take(2500, -10L) // give bin 2500 room (remainder 10)
    bins.take(4999, -10L)
    assert(bins.firstFit(10L) === 2500)
    bins.take(2500, 10L)
    assert(bins.firstFit(10L) === 4999)
  }
}
