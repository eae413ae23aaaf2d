package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hadoop `Configuration` is not `java.io.Serializable`; this is the
  * standard writeObject/readObject wrapper so the audit kernels can ship
  * the session's Hadoop conf (filesystem credentials, codec settings) to
  * executors instead of relying on whatever default conf the executor
  * classpath resolves. */
private[sources] final class SerializableHadoopConf(
    @transient var conf: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new org.apache.hadoop.conf.Configuration(false)
    conf.readFields(in)
  }
}

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
  *  - FILE-level fault tolerance mirrors the line-level posture
  *    (round 14): a truncated or corrupt `.gz` shard — routine in a
  *    100k-shard crawl drop — must not kill the job (reads run with
  *    `ignoreCorruptFiles`, so the codec error skips the rest of that
  *    shard instead of failing the stage), and it must not be SILENT
  *    either: [[auditShards]] is the quarantine relation for files,
  *    parallel to [[readCorrupt]]'s for lines — one decompress pass per
  *    shard, parallel across executors, flagging every shard that can't
  *    be read to EOF with its line count and error. An intake that
  *    doesn't publish the audit's skipped count under-reports its
  *    corpus (the data card carries it — see corpus_report);
  *  - gzip shards read natively but are NOT splittable — one task per
  *    shard, so shard count caps parallelism; [[write]] derives the
  *    shard count from the input's size estimate (bytes-per-shard
  *    target with a constant floor — a fixed constant at 100 TB would
  *    mean multi-TB gzip members and single-task writes), or takes an
  *    explicit count when the caller knows better.
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

  /** Uncompressed-bytes-per-shard target for derived sharding: ~256 MB
    * of JSON text per gzip member (a gzip member this size reads in one
    * task in tens of seconds and deflates in parallel across shards). */
  val TargetShardBytes: Long = 256L << 20

  /** Floor on the derived shard count — below this, read-side
    * parallelism (one task per gzip member) is the binding constraint,
    * not member size. */
  val MinShards: Int = 8

  /** Write a documents-shaped DataFrame as JSONL under `path`.
    * `shards > 0` forces an explicit output-file count; `shards = 0`
    * (default) derives it from the plan's size estimate at
    * [[TargetShardBytes]] per shard with the [[MinShards]] floor —
    * shard count IS the read-side parallelism ceiling under gzip, and
    * it also bounds member size (a constant count at 100 TB would mean
    * multi-TB single-task members). `compression` = "gzip"/"none". */
  def write(
      df: DataFrame, path: String,
      shards: Int = 0, compression: String = "gzip"): Unit = {
    val out = df.select("doc_id", "text", "lang", "source", "n_chars")
    val n =
      if (shards > 0) shards
      else {
        val est = out.queryExecution.optimizedPlan.stats.sizeInBytes
        val derived = (est + BigInt(TargetShardBytes) - 1) /
          BigInt(TargetShardBytes)
        derived.max(BigInt(MinShards)).min(BigInt(1 << 20)).toInt
      }
    out.repartition(n)
      .write.mode("overwrite")
      .option("compression", compression)
      .json(path)
  }

  /** The data shards under `path` (non-hidden, non-marker files), sorted
    * — the pinned file list that makes multi-pass intakes (clean leg +
    * rejects leg + audit) describe ONE corpus even while new shards
    * land in the directory between passes. */
  def listShards(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p).toSeq
        .filter(_.isFile)
        .map(_.getPath)
        .filterNot { f =>
          val n = f.getName
          n.startsWith("_") || n.startsWith(".")
        }
        .map(_.toString)
        .sorted
  }

  private def readRaw(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read
      .schema(Schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      // file-level tolerance: a corrupt shard logs + skips its remainder
      // instead of killing the job; the accounting lives in auditShards
      .option("ignoreCorruptFiles", "true")
      .json(paths: _*)

  private[graft] def cleanOf(raw: DataFrame): DataFrame =
    raw.filter(col("_corrupt_record").isNull && col("doc_id").isNotNull)
      .select("doc_id", "text", "lang", "source", "n_chars")

  private[graft] def corruptOf(raw: DataFrame): DataFrame =
    raw.filter(col("_corrupt_record").isNotNull || col("doc_id").isNull)
      .select(col("_corrupt_record").as("raw_line"), col("doc_id"))

  /** Clean rows only (documents-shaped). A row is clean iff it parsed
    * (`_corrupt_record` null) AND carries a doc_id — a structurally
    * valid JSON object missing the id is as unusable as a parse error. */
  def read(spark: SparkSession, path: String): DataFrame =
    cleanOf(readRaw(spark, Seq(path)))

  /** [[read]] over a PINNED shard list (from [[listShards]]) — the form
    * a multi-leg intake uses so every leg sees the same corpus. */
  def readFiles(spark: SparkSession, files: Seq[String]): DataFrame =
    cleanOf(readRaw(spark, files))

  /** The rejects: raw line + why-shaped nulls — the quarantine relation
    * a production intake writes next to the clean table. */
  def readCorrupt(spark: SparkSession, path: String): DataFrame =
    corruptOf(readRaw(spark, Seq(path)))

  /** [[readCorrupt]] over a pinned shard list. */
  def readCorruptFiles(spark: SparkSession, files: Seq[String]): DataFrame =
    corruptOf(readRaw(spark, files))

  /** The RAW permissive parse over a pinned shard list — every line as a
    * row, clean fields typed and `_corrupt_record` carrying the rejects.
    * [[cleanOf]] / [[corruptOf]] are disjoint projections of it, so an
    * intake that needs BOTH legs (clean table + quarantine stream) can
    * decode the shard set ONCE, materialize this frame, and project —
    * instead of paying one gunzip+parse pass per leg (gzip members
    * decompress single-threaded per shard; the duplicate pass is pure
    * cost at any scale). */
  def readRawFiles(spark: SparkSession, files: Seq[String]): DataFrame =
    readRaw(spark, files)

  /** FILE-level quarantine relation (round 14): one row per shard —
    * (file, n_lines, ok, error) — from one executor-side decompress
    * pass per file. `ok = false` flags a shard whose bytes can't be
    * read to EOF (truncated gzip member, corrupt header); `n_lines` is
    * the count readable BEFORE the error, so the intake's accounting
    * can say exactly what a skipped shard cost. This is the loud
    * counterpart to the read path's `ignoreCorruptFiles` skip: the
    * audit costs one extra decompress of the corpus, which a
    * production intake pays precisely because a silent skip would lie
    * about corpus size (the same argument the class doc makes against
    * DROPMALFORMED). Parallelism = one task per file, same ceiling as
    * the read itself. */
  def auditShards(spark: SparkSession, files: Seq[String]): DataFrame = {
    import spark.implicits._
    val confW = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val slices = math.max(1, math.min(files.size,
      spark.sparkContext.defaultParallelism))
    spark.createDataset(files)
      .repartition(slices)
      .mapPartitions { it =>
        val conf = confW.conf
        val factory =
          new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
        it.map(f => probeShard(conf, factory, f))
      }
      .toDF("file", "n_lines", "ok", "error")
  }

  /** [[auditShards]] over everything currently under `path`. */
  def auditFiles(spark: SparkSession, path: String): DataFrame =
    auditShards(spark, listShards(spark, path))

  /** One shard's integrity probe: decompress + count lines to EOF;
    * any IO failure mid-stream flags the file with the lines counted
    * so far. Runs on executors. */
  private def probeShard(
      conf: org.apache.hadoop.conf.Configuration,
      factory: org.apache.hadoop.io.compress.CompressionCodecFactory,
      file: String): (String, Long, Boolean, String) = {
    val p = new org.apache.hadoop.fs.Path(file)
    var n = 0L
    try {
      val fs = p.getFileSystem(conf)
      val rawIn = fs.open(p)
      val in = Option(factory.getCodec(p))
        .fold[java.io.InputStream](rawIn)(_.createInputStream(rawIn))
      try {
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(
            in, java.nio.charset.StandardCharsets.UTF_8))
        while (reader.readLine() != null) n += 1
        (file, n, true, null)
      } finally in.close()
    } catch {
      case e: java.io.IOException =>
        (file, n, false, s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }

  private def readStreamRaw(
      spark: SparkSession, inDir: String,
      maxFilesPerTrigger: Option[Int],
      maxBytesPerTrigger: Option[String]): DataFrame = {
    var r = spark.readStream
      .schema(Schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      // same file-level posture as batch: a corrupt shard must not kill
      // a long-running intake; fileAuditStream is its loud counterpart
      .option("ignoreCorruptFiles", "true")
    maxFilesPerTrigger.foreach(n =>
      r = r.option("maxFilesPerTrigger", n.toString))
    maxBytesPerTrigger.foreach(b => r = r.option("maxBytesPerTrigger", b))
    r.json(inDir)
  }

  /** The CLEAN document stream from a drop directory, as a composable
    * streaming DataFrame (the read half of [[ingestStream]] without the
    * parquet sink): what downstream streaming consumers —
    * [[graft.streaming.IndexMaintainer.maintainDedupState]], the live
    * index maintainers — attach to when the drop directory IS the
    * pipeline head. Same admission-control options and corrupt-shard
    * posture as the sink form. */
  def readCleanStream(
      spark: SparkSession, inDir: String,
      maxFilesPerTrigger: Option[Int] = None,
      maxBytesPerTrigger: Option[String] = None): DataFrame =
    cleanOf(readStreamRaw(spark, inDir, maxFilesPerTrigger,
      maxBytesPerTrigger))

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
    * ADMISSION CONTROL (round 14): `maxFilesPerTrigger` /
    * `maxBytesPerTrigger` bound each micro-batch — the first start on an
    * existing drop dir (the common deployment) otherwise lands a 100k-
    * shard backlog in ONE micro-batch, exactly the failure mode the
    * graft V2 source's `maxVersionsPerTrigger` exists for. The backlog
    * drains across bounded batches, still exactly-once (the source's
    * own file log tracks progress). Spark accepts at most one of the
    * two bounds per query.
    *
    * @return (clean-leg query, rejects-leg query) — stop both */
  def ingestStream(
      spark: SparkSession, inDir: String, tableDir: String,
      rejectsDir: String, ckptRoot: String,
      maxFilesPerTrigger: Option[Int] = None,
      maxBytesPerTrigger: Option[String] = None)
      : (org.apache.spark.sql.streaming.StreamingQuery,
         org.apache.spark.sql.streaming.StreamingQuery) = {
    def raw() =
      readStreamRaw(spark, inDir, maxFilesPerTrigger, maxBytesPerTrigger)
    val clean = cleanOf(raw())
      .writeStream
      .format("parquet")
      .option("path", tableDir)
      .option("checkpointLocation", s"$ckptRoot/clean")
      .start()
    val rejects = corruptOf(raw())
      .writeStream
      .format("json")
      .option("path", rejectsDir)
      .option("checkpointLocation", s"$ckptRoot/rejects")
      .start()
    (clean, rejects)
  }

  /** STREAMING file-quarantine leg: watches `inDir` at FILE granularity
    * and emits one audit row per newly-landed shard — (file, length,
    * n_lines, ok, error), the streaming twin of [[auditShards]]. The
    * source is `binaryFile` with only (path, length) selected, so the
    * source itself never loads shard bytes (binary-file column pruning);
    * the probe kernel then decompresses each file once on an executor.
    * Start it next to [[ingestStream]] with its own checkpoint; its
    * sink is the intake's file-quarantine relation, and a data card
    * that can't say "N shards skipped" under-reports the corpus. */
  def fileAuditStream(spark: SparkSession, inDir: String): DataFrame = {
    import spark.implicits._
    val confW = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    spark.readStream
      .format("binaryFile")
      // the binaryFile format's FIXED schema, spelled out because the
      // streaming source requires an explicit one
      .schema(StructType(Seq(
        StructField("path", StringType),
        StructField("modificationTime", TimestampType),
        StructField("length", LongType),
        StructField("content", BinaryType))))
      .load(inDir)
      .select(col("path"), col("length"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val conf = confW.conf
        val factory =
          new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
        it.map { case (f, len) =>
          val (file, n, ok, err) = probeShard(conf, factory, f)
          (file, len, n, ok, err)
        }
      }
      .toDF("file", "length", "n_lines", "ok", "error")
  }
}
