package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus ingestion — the interchange format raw text corpora
  * actually arrive in (one JSON object per line: crawl dumps, exported
  * curation outputs). Parquet is this engine's native table format; this
  * is the boundary where external corpora enter it.
  *
  * Design points, all 100 TB-motivated:
  *  - the read schema is PINNED (an explicit StructType, never
  *    inferSchema — inference is a full extra pass over the corpus and a
  *    silent drift channel when a field's type wobbles across shards);
  *  - PERMISSIVE parsing with the corrupt-record column SURFACED:
  *    a malformed line becomes a row with `_corrupt_record` set and the
  *    typed fields null, so callers choose — [[read]] returns clean rows
  *    only, [[readCorrupt]] returns the rejects for the quarantine
  *    stream a production intake keeps. Silent drops are not an option
  *    (FAILFAST kills a 100 TB job on one bad line; DROPMALFORMED
  *    lies about corpus size);
  *  - gzip shards read natively but are NOT splittable — one task per
  *    shard, so shard count caps parallelism; write MANY shards (the
  *    `shards` parameter repartitions before the write) or use an
  *    uncompressed/indexed format when single-file parallelism matters.
  */
object CorpusJsonl {

  /** The documents-table schema, pinned. `_corrupt_record` must be
    * declared IN the schema for PERMISSIVE mode to surface it. */
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  /** Write a documents-shaped DataFrame as JSONL under `path` —
    * `shards` output files (shard count IS the read-side parallelism
    * ceiling under gzip), `compression` = "gzip"/"none". */
  def write(
      df: DataFrame, path: String,
      shards: Int = 8, compression: String = "gzip"): Unit =
    df.select("doc_id", "text", "lang", "source", "n_chars")
      .repartition(shards)
      .write.mode("overwrite")
      .option("compression", compression)
      .json(path)

  private def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(Schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Clean rows only (documents-shaped). A row is clean iff it parsed
    * (`_corrupt_record` null) AND carries a doc_id — a structurally
    * valid JSON object missing the id is as unusable as a parse error. */
  def read(spark: SparkSession, path: String): DataFrame =
    readRaw(spark, path)
      .filter(col("_corrupt_record").isNull && col("doc_id").isNotNull)
      .select("doc_id", "text", "lang", "source", "n_chars")

  /** The rejects: raw line + why-shaped nulls — the quarantine relation
    * a production intake writes next to the clean table. */
  def readCorrupt(spark: SparkSession, path: String): DataFrame =
    readRaw(spark, path)
      .filter(col("_corrupt_record").isNotNull || col("doc_id").isNull)
      .select(col("_corrupt_record").as("raw_line"), col("doc_id"))

  private def readStreamRaw(spark: SparkSession, inDir: String): DataFrame =
    spark.readStream
      .schema(Schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(inDir)

  /** STREAMING intake: watch `inDir` for new JSONL shards and grow the
    * parquet documents table at `tableDir`, quarantining malformed
    * lines under `rejectsDir` — the drop-directory loop a production
    * corpus intake actually runs (crawl shards land, the table grows,
    * nothing is ever lost or double-counted).
    *
    * Exactly-once by construction: both legs are Spark FILE SINKS
    * (transactional `_spark_metadata` commit log — a replayed
    * micro-batch re-commits the same files instead of appending twice),
    * each with its own checkpoint under `ckptRoot`, so no custom marker
    * machinery is needed. Two queries read the one file source
    * independently (separate checkpoints track separate progress);
    * `spark.read.parquet(tableDir)` serves the clean table to any
    * downstream job while the intake runs.
    *
    * @return (clean-leg query, rejects-leg query) — stop both */
  def ingestStream(
      spark: SparkSession, inDir: String, tableDir: String,
      rejectsDir: String, ckptRoot: String)
      : (org.apache.spark.sql.streaming.StreamingQuery,
         org.apache.spark.sql.streaming.StreamingQuery) = {
    val clean = readStreamRaw(spark, inDir)
      .filter(col("_corrupt_record").isNull && col("doc_id").isNotNull)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .writeStream
      .format("parquet")
      .option("path", tableDir)
      .option("checkpointLocation", s"$ckptRoot/clean")
      .start()
    val rejects = readStreamRaw(spark, inDir)
      .filter(col("_corrupt_record").isNotNull || col("doc_id").isNull)
      .select(col("_corrupt_record").as("raw_line"), col("doc_id"))
      .writeStream
      .format("json")
      .option("path", rejectsDir)
      .option("checkpointLocation", s"$ckptRoot/rejects")
      .start()
    (clean, rejects)
  }
}
