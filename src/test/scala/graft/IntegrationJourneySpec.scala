package graft

import graft.api.HttpApiServer
import graft.client.EventLogClient
import graft.core.{EventData, EventLog}
import graft.storage.ParquetLogBackend
import graft.streaming.{LogStream, StreamOps}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The full user journey in ONE test path — every tier the library ships,
  * composed the way a real deployment chains them:
  *
  *   CLI create → HTTP client appends documents as events → the V2
  *   `graft` source reads the SAME log (columnar, version-pruned) →
  *   a batch pipeline derives a corpus, trains + persists a BPE model,
  *   dedups, and reports → a STREAMING pipeline tails the identical log
  *   (readStream + tokenizeBpeStream from the persisted model) and its
  *   token counts agree with the batch tokenizer row for row.
  *
  * The per-tier suites prove each piece in isolation; this pins the
  * COMPOSITION — the log as the single source of truth feeding batch and
  * streaming with the same artifacts. */
class IntegrationJourneySpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkFixture.spark

  private var dir: String = _
  private var log: EventLog = _
  private var server: HttpApiServer = _
  private var client: EventLogClient = _

  override def beforeAll(): Unit = {
    dir = Files.createTempDirectory("graft-journey").toString
    graft.cli.Main.main(Array("create", dir, "-m", "kind:journey"))
    log = new EventLog(ParquetLogBackend.open(spark, dir))
    server = new HttpApiServer(log)
    client = new EventLogClient(s"http://127.0.0.1:${server.start()}")
  }

  override def afterAll(): Unit = {
    client.close()
    server.stop()
    log.close()
  }

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog", // exact dup
    "pack my box with five dozen liquor jugs",
    "sphinx of black quartz judge my vow",
    "how vexingly quick daft zebras jump")

  test("append over HTTP → V2 read → batch pipeline → streaming twin") {
    // 1. ingest through the real wire path (validation, checksums, OCC
    //    sequencer — everything the reference's write path does)
    val r = client.appendMulti(texts.zipWithIndex.map { case (t, i) =>
      EventData("doc", s"""{"id":$i,"text":"$t"}""")
    })
    assert(log.version === texts.length.toLong)

    // 2. the V2 source reads the SAME directory columnar; payloads come
    //    back byte-identical through commit + segment/tail planning
    val scanned = spark.read.format("graft").load(dir)
      .select(col("version"),
        get_json_object(col("payload"), "$.id").cast("long").as("doc_id"),
        get_json_object(col("payload"), "$.text").as("text"))
      .orderBy("version")
    val docs = scanned.select("doc_id", "text").cache()
    assert(docs.collect().map(_.getString(1)).toSeq === texts)

    // 3. batch: exact dedup finds the one duplicate pair; the corpus
    //    card sees 5 docs / 4 distinct
    val hashes = docs.withColumn("h", md5(col("text")))
    assert(hashes.select("h").distinct().count() === 4L)

    // 4. train BPE on this corpus and PERSIST the model — the artifact
    //    the streaming tier will load
    val modelDir = Files.createTempDirectory("graft-journey-bpe").toString
    val merges = graft.queries.TextAnalysis
      .trainBpeOn(docs.select(col("doc_id"), col("text")), rounds = 4)
    assert(merges.nonEmpty)
    graft.operators.BpeModel.save(spark, merges, modelDir)

    // batch token counts from the SAME merges (the fused kernel)
    val batchCounts = docs
      .withColumn("ids",
        graft.exprs.functions.bpe_encode_ids(col("text"), merges))
      .select(col("doc_id"), size(col("ids")).cast("long").as("n_ids"))
      .collect().map(rw => rw.getLong(0) -> rw.getLong(1)).toMap

    // 5. streaming: tail the SAME log directory (readStream), decode the
    //    payloads, tokenize from the PERSISTED model
    val stream = StreamOps.tokenizeBpeStream(
      LogStream.readStream(spark, dir)
        .select(
          get_json_object(col("payload"), "$.id").cast("long").as("doc_id"),
          get_json_object(col("payload"), "$.text").as("text")),
      "text", modelDir)
    val q = stream
      .select(col("doc_id"), col("n_ids"))
      .writeStream.format("memory").queryName("journey")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("journey").collect()
        .map(rw => rw.getLong(0) -> rw.getLong(1)).toMap
      assert(streamed === batchCounts,
        "streaming tokenization off the log must match the batch pass")
    } finally q.stop()

    // 6. and the log remains verifiable end to end (hash chain intact)
    assert(log.checkIntegrity().count() === 0L)
  }
}
