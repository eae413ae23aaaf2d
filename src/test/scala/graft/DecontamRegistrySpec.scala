package graft

import graft.operators.{BloomSketch, DecontamRegistry}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted decontamination registry: registrations fold into EXACTLY
  * the single-shot Bloom (mask-of-union = OR-of-masks), names are
  * idempotent, compaction preserves every probe answer, gc reclaims the
  * folded-away deltas.
  */
class DecontamRegistrySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs = graft.util.Tables(spark, dir, "documents")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-decreg").toString

  test("N registrations answer exactly the single-shot Bloom") {
    val reg = tmp()
    val bench = docs.filter(col("doc_id") % 97 === 0)
    DecontamRegistry.register(spark, reg,
      bench.filter(expr("(doc_id DIV 97) % 2 = 0")), "a")
    val h = DecontamRegistry.register(spark, reg,
      bench.filter(expr("(doc_id DIV 97) % 2 = 1")), "b")
    assert(h.names === Set("a", "b"))

    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val incremental = DecontamRegistry.flag(spark, h, corpus)
      .orderBy("doc_id").collect().toSeq
    // single-shot: one Bloom over the WHOLE benchmark at the same bits
    val sh = DecontamRegistry.shingleHashes(docs)
    val oneShot = BloomSketch.flagCard(
        sh.filter(col("doc_id") % 97 =!= 0),
        BloomSketch.maskRelation(
          sh.filter(col("doc_id") % 97 === 0).select("h"), 64, h.bits),
        h.bits)
      .orderBy("doc_id").collect().toSeq
    assert(incremental === oneShot,
      "OR of per-registration masks must BE the union's mask")
    assert(incremental.nonEmpty, "the fixture must actually flag docs")
  }

  test("re-registering a name is a no-op; compact preserves answers; gc reclaims") {
    val reg = tmp()
    val bench = docs.filter(col("doc_id") % 97 === 0)
    DecontamRegistry.register(spark, reg,
      bench.filter(expr("(doc_id DIV 97) % 2 = 0")), "a")
    val h2 = DecontamRegistry.register(spark, reg,
      bench.filter(expr("(doc_id DIV 97) % 2 = 1")), "b")
    val replayed = DecontamRegistry.register(spark, reg,
      docs.limit(1), "a") // different content, SAME name: must not commit
    assert(replayed.version === h2.version)

    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val before = DecontamRegistry.flag(spark, h2, corpus)
      .orderBy("doc_id").collect().toSeq
    val hc = DecontamRegistry.compact(spark, reg)
    assert(hc.st.refs.size === 1)
    assert(hc.names === Set("a", "b"), "the name ledger survives the fold")
    val after = DecontamRegistry.flag(spark, hc, corpus)
      .orderBy("doc_id").collect().toSeq
    assert(after === before)
    assert(DecontamRegistry.gc(reg) === 2)
    assert(DecontamRegistry.flag(spark, DecontamRegistry.load(reg), corpus)
      .orderBy("doc_id").collect().toSeq === before)
  }

  test("health: verdict trips at N registrations, clears after compact; fill and vecs volume reported") {
    val reg = tmp()
    val bench = docs.filter(col("doc_id") % 97 === 0)
    DecontamRegistry.register(spark, reg,
      bench.filter(expr("(doc_id DIV 97) % 2 = 0")), "a")
    DecontamRegistry.register(spark, reg,
      bench.filter(expr("(doc_id DIV 97) % 2 = 1")), "b")
    val emb = graft.util.Tables(spark, dir, "embeddings")
      .filter(col("vec_id") % 97 === 0)
    val h3 = DecontamRegistry.registerEmbeddings(
      spark, reg, emb, "vec_id", "embedding", "a-emb")

    val hr = DecontamRegistry.health(spark, h3, maxDeltas = 2)
    assert(hr.nRegistrations === 3 && hr.compactRecommended,
      "3 deltas > maxDeltas=2 must recommend compaction")
    assert(hr.wordBloomFill > 0.0 && hr.wordBloomFill < 0.5 &&
      !hr.bloomSaturated,
      "the tiny fixture cannot saturate a 2^20-bit Bloom")
    assert(hr.nVecs === emb.count() && hr.vecsBytes > 0 && !hr.vecsHeavy)

    val hc = DecontamRegistry.compact(spark, reg)
    val hr2 = DecontamRegistry.health(spark, hc, maxDeltas = 2)
    assert(hr2.nRegistrations === 1 && !hr2.compactRecommended,
      "compaction clears the delta dimension")
    assert(hr2.wordBloomFill === hr.wordBloomFill,
      "fill is content-driven — the fold ORs the same masks")
    assert(hr2.nVecs === hr.nVecs && hr2.vecsBytes === hr.vecsBytes)
    // a tight vecs budget flips the broadcast-volume flag
    assert(DecontamRegistry.health(spark, hc,
      maxVecsBytes = 1L).vecsHeavy)
  }

  test("semantic registrations: flagSemantic answers exactly the batch decontaminateSemantic; compact folds words AND vecs") {
    val reg = tmp()
    val e = graft.util.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val bench = e.filter(col("vec_id") % 97 === 0)
    val corpus = e.filter(col("vec_id") % 97 =!= 0)
    // a text registration AND an embedding registration share one ledger
    DecontamRegistry.register(spark, reg,
      docs.filter(col("doc_id") % 97 === 0), "suite")
    val h = DecontamRegistry.registerEmbeddings(spark, reg,
      bench, "vec_id", "v", "suite-emb")
    assert(h.names === Set("suite", "suite-emb"))

    val tau = graft.queries.Dedup.SemanticDecontamTau
    val served = DecontamRegistry
      .flagSemantic(spark, h, corpus, "vec_id", "v", tau)
      .orderBy("doc_id").collect().toSeq
    val batch = graft.queries.Dedup.decontaminateSemantic(
        corpus, "vec_id", "v", bench, "vec_id", "v", tau)
      .withColumnRenamed("vec_id", "doc_id")
      .orderBy("doc_id").collect().toSeq
    assert(served === batch,
      "the registry-served semantic card must BE decontaminateSemantic's")
    assert(served.nonEmpty, "the fixture must actually flag docs")

    // idempotent replay on the semantic name
    assert(DecontamRegistry.registerEmbeddings(spark, reg,
      corpus.limit(1), "vec_id", "v", "suite-emb").version === h.version)

    // compact folds the word delta and the vec delta into ONE delta
    // answering both probes identically
    val textFlags = DecontamRegistry
      .flag(spark, h, docs.filter(col("doc_id") % 97 =!= 0))
      .orderBy("doc_id").collect().toSeq
    val hc = DecontamRegistry.compact(spark, reg)
    assert(hc.st.refs.size === 1 &&
      hc.names === Set("suite", "suite-emb"))
    assert(DecontamRegistry
      .flagSemantic(spark, hc, corpus, "vec_id", "v", tau)
      .orderBy("doc_id").collect().toSeq === served)
    assert(DecontamRegistry
      .flag(spark, hc, docs.filter(col("doc_id") % 97 =!= 0))
      .orderBy("doc_id").collect().toSeq === textFlags)
    assert(DecontamRegistry.gc(reg) === 2)
  }

  test("decontaminateRegistryStream: an EMBEDDING benchmark registered mid-stream gates the next micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val reg = tmp()
    val ckpt = tmp()
    val dim = 8
    def unit(k: Int): Seq[Double] =
      (0 until dim).map(i => if (i == k) 1.0 else 0.0)
    // start with one TEXT registration so the registry is non-empty
    DecontamRegistry.register(spark, reg,
      Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("doc_id", "text"), "eval-a")

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val mem = MemoryStream[(Long, String, Seq[Double])]
    val q = graft.streaming.StreamOps.decontaminateRegistryStream(
      mem.toDF().toDF("doc_id", "text", "emb"), "doc_id", "text",
      reg, ckpt, embCol = Some("emb")) {
      clean => clean.collect().foreach(r => seen.add(r.getLong(0)))
    }
    try {
      mem.addData(
        (1L, "novel tokens one", unit(0)), // nothing registered near → clean
        (2L, "novel tokens two", unit(1)))
      q.processAllAvailable()
      assert(seen.asScala().toSet === Set(1L, 2L))

      // register the PARAPHRASE AXIS mid-stream: unit(0) becomes leakage
      DecontamRegistry.registerEmbeddings(spark, reg,
        Seq((900L, unit(0))).toDF("b_id", "bv"), "b_id", "bv", "eval-emb")
      mem.addData(
        (3L, "reworded benchmark item sharing no shingles", unit(0)),
        (4L, "still orthogonal and clean", unit(2)))
      q.processAllAvailable()
      assert(seen.asScala().toSet === Set(1L, 2L, 4L),
        "doc 3 must be gated by the mid-stream semantic registration")
    } finally q.stop()
  }

  test("decontaminateRegistryStream: a benchmark registered MID-STREAM gates the next micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val reg = tmp()
    val ckpt = tmp()
    val benchA = "alpha beta gamma delta epsilon zeta eta theta"
    val benchB = "one two three four five six seven eight nine"
    DecontamRegistry.register(spark, reg,
      Seq((100L, benchA)).toDF("doc_id", "text"), "eval-a")

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamOps.decontaminateRegistryStream(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", reg, ckpt) {
      clean => clean.collect().foreach(r => seen.add(r.getLong(0)))
    }
    try {
      mem.addData(
        (1L, benchA + " with a tail"), // contaminated by eval-a → dropped
        (2L, benchB + " with a tail"), // eval-b not registered YET → clean
        (3L, "totally unrelated novel words nothing shared"))
      q.processAllAvailable()
      assert(seen.asScala().toSet === Set(2L, 3L))

      // register eval-b MID-STREAM: the very next micro-batch gates on it
      DecontamRegistry.register(spark, reg,
        Seq((200L, benchB)).toDF("doc_id", "text"), "eval-b")
      mem.addData(
        (4L, benchB + " with a tail"), // NOW contaminated → dropped
        (5L, "still perfectly clean and unrelated tokens"))
      q.processAllAvailable()
      assert(seen.asScala().toSet === Set(2L, 3L, 5L),
        "doc 4 must be gated by the mid-stream registration")
    } finally q.stop()
  }

  private implicit class QAsScala[A](
      q: java.util.concurrent.ConcurrentLinkedQueue[A]) {
    def asScala(): Seq[A] = {
      import scala.jdk.CollectionConverters._
      q.iterator().asScala.toSeq
    }
  }
}
