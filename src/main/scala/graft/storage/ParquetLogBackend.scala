package graft.storage

import com.fasterxml.jackson.databind.ObjectMapper
import graft.core._
import graft.exprs.EventOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, max => smax}
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Durable backend: append-only Parquet segments + an fsync'd JSON-lines
  * commit log (≙ reference eventlog/file, re-architected for Spark).
  *
  * The reference fsyncs every append into one sequential file
  * (file.go:68, write_event.go:100). Per-append Parquet files would be
  * pathological (SURVEY.md §7.3), so the roles are split:
  *
  *  - `commits.jsonl` — the durability + atomicity point. One fsync'd line
  *    per commit; a multi-append is one line, hence all-or-nothing.
  *  - `segments/` — columnar home of compacted history; what scans read at
  *    scale (parallel, prunable, column-projected).
  *  - recent tail lives in memory and is unioned into snapshots until
  *    [[compact]] rolls it into a segment.
  *
  * Recovery on open ≙ file.Open (file.go:67-125): max version found in
  * segments, commit-log lines beyond it replayed into the tail, last
  * entry's checksum re-verified (the reference's fast crash detection,
  * file.go:107-122).
  */
final class ParquetLogBackend private (
    spark: SparkSession,
    dir: Path,
    override val metadata: Map[String, String],
    override val payloadLimit: Int,
    compactThreshold: Int,
    compactIntervalMs: Long,
    maxSegmentFiles: Int = 0)
    extends SequencedBackend {

  private val commitLog = dir.resolve("commits.jsonl")
  private val segmentsDir = dir.resolve("segments")
  private val tail = ArrayBuffer.empty[StoredEvent]
  // Segment manifest: (absolute file path, min version, max version) per
  // parquet file, in commit order. THE planning surface: snapshots hand
  // Spark an explicit file list (version-pruned for bounded scans), so at
  // no point after open() does query planning list segments/ or read
  // footers — at 100TB / years of history, directory listing would
  // dominate planning long before data bytes matter. Rebuilt at open from
  // one listing (ranges parsed from the self-describing file names, one
  // footer job only for legacy unnamed files); guarded by ioLock.
  private val manifest = ArrayBuffer.empty[(String, Long, Long)]
  // ioLock guards channel + tail + watermark (held briefly); compactLock
  // serializes whole compactions (two concurrent compacts would both copy
  // the same tail prefix → duplicated segment rows + a double drop that
  // discards fresh appends)
  private val ioLock = new Object
  private val compactLock = new Object
  private var segmentMaxVersion = 0L

  private var channel = java.nio.channels.FileChannel.open(
    commitLog,
    StandardOpenOption.CREATE,
    StandardOpenOption.WRITE,
    StandardOpenOption.APPEND)

  @volatile private var closed = false

  // Timer compaction bounds how long an append can stay commit-log-only:
  // out-of-process readers (LogStream.readStream watches segments/) see
  // every append within compactIntervalMs even when the tail never reaches
  // compactThreshold. 0 disables (size-triggered compaction only).
  // Armed by open() AFTER recover() — the replay appends to `tail` outside
  // ioLock and streams commits.jsonl, so a timer compaction racing it would
  // corrupt both.
  @volatile private var compactTimer: Option[java.util.concurrent.ScheduledExecutorService] = None

  private def startCompactTimer(): Unit =
    if (compactIntervalMs > 0) {
      val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor { r =>
        val t = new Thread(r, "graft-compact")
        t.setDaemon(true)
        t
      }
      ex.scheduleWithFixedDelay(
        () => try {
          if (!closed && ioLock.synchronized(tail.nonEmpty)) compact()
        } catch { case _: Exception => () },
        compactIntervalMs, compactIntervalMs,
        java.util.concurrent.TimeUnit.MILLISECONDS)
      compactTimer = Some(ex)
    }

  override protected def persist(
      events: Seq[StoredEvent], tag: Option[CommitTag]): Unit = {
    val doCompact = ioLock.synchronized {
      val line = ParquetLogBackend.encodeCommit(events, tag)
      channel.write(java.nio.ByteBuffer.wrap(line.getBytes(StandardCharsets.UTF_8)))
      channel.force(true) // the durability point: one fsync per commit
      tail ++= events
      tail.length >= compactThreshold
    }
    if (doCompact) compact()
  }

  /** Roll the in-memory tail into a Parquet segment and rotate the commit
    * log. Appends stay concurrent with the (slow) segment write — only the
    * copied prefix is dropped; the commit log retains exactly the commits
    * past the new segment watermark, so it stays proportional to the tail
    * instead of growing with the full history (and open() replays only
    * those). Crash-safe: segments are append-only and the rotation is an
    * atomic rename; recovery trusts max(version) actually in segments. */
  def compact(): Unit = compactLock.synchronized {
    val batch = ioLock.synchronized(tail.toList)
    if (batch.isEmpty) return
    // Stage the segment in a scratch dir, then move the part file into
    // segments/ under a self-describing name carrying its version range.
    // The name IS the durable statistic: it travels atomically with the
    // file (no manifest-file/datafile crash window), and open() rebuilds
    // the in-memory manifest from names alone — no footer reads.
    val scratch = dir.resolve(
      s"segments.write-${java.util.UUID.randomUUID().toString.take(8)}")
    spark
      .createDataFrame(batch.map(_.toRow).asJava, EventSchema.schema)
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(scratch.toString)
    val part = scala.util.Using.resource(Files.list(scratch))(
      _.filter(_.toString.endsWith(".parquet")).findFirst().orElseThrow(() =>
        new IllegalStateException(s"no parquet part written in $scratch")))
    Files.createDirectories(segmentsDir)
    val (v0, v1) = (batch.head.version, batch.last.version)
    val target = segmentsDir.resolve(ParquetLogBackend.segmentName(v0, v1))
    // ONE lock section moves the file in, registers it, and drops the tail
    // prefix — snapshots (which capture manifest + tail under the same
    // lock) can never see a batch in both places or in neither.
    ioLock.synchronized {
      Files.move(part, target, StandardCopyOption.ATOMIC_MOVE)
      manifest += ((target.toString, v0, v1))
      tail.dropInPlace(batch.length)
      segmentMaxVersion = v1
    }
    deleteRecursively(scratch)
    rotateCommitLog()
    // file-count hygiene: timer compaction writes one small file per
    // interval; unchecked, scan planning drowns in file metadata long
    // before bytes are the problem. OPT-IN (maxSegmentFiles <= 0 default):
    // rewriting history breaks the append-only assumption of file-stream
    // readers (LogStream.readStream would re-deliver everything) and can
    // fail in-flight lazy scans — enable only on logs without streaming
    // consumers, or call coalesceSegments() from a maintenance window.
    if (maxSegmentFiles > 0 && segmentFileCount() > maxSegmentFiles)
      coalesceSegments()
  }

  private def segmentFileCount(): Int =
    if (!Files.exists(segmentsDir)) 0
    else scala.util.Using.resource(Files.list(segmentsDir))(
      _.filter(p => p.toString.endsWith(".parquet")).count().toInt)

  /** Rewrite the segment directory into ~`targetBytes` files. Crash-safe
    * via a rename dance (`segments.rewrite` staged → `segments` moved to
    * `segments.old` → staged promoted → old deleted); [[recover]] rolls an
    * interrupted swap back to the old directory. In-flight lazy snapshot
    * DataFrames race the swap window (~ms) like any file-level compaction —
    * run from the maintenance path (or let [[compact]] trigger it), not
    * concurrently with long scans. */
  def coalesceSegments(targetBytes: Long = 128L << 20): Unit =
    compactLock.synchronized {
      if (!Files.exists(segmentsDir)) return
      val totalBytes = scala.util.Using.resource(Files.list(segmentsDir))(
        _.filter(_.toString.endsWith(".parquet"))
          .mapToLong(Files.size(_)).sum())
      val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
      // already at (or past) the best achievable layout: rewriting the full
      // history again would be O(history) I/O for no file-count gain —
      // without this, a log bigger than maxSegmentFiles*targetBytes would
      // re-rewrite everything on every compaction forever
      if (parts >= segmentFileCount()) return
      val staging = dir.resolve("segments.rewrite")
      deleteRecursively(staging)
      // Range-partition on version (vs plain coalesce): the rewritten files
      // get DISJOINT version ranges, so the manifest prunes bounded scans to
      // exactly the overlapping files even after history is rewritten.
      spark.read.schema(EventSchema.schema).parquet(segmentsDir.toString)
        .repartitionByRange(parts, col("version"))
        .write.mode("overwrite")
        .parquet(staging.toString)
      // one stats job over the staging output → self-describing names
      import org.apache.spark.sql.functions.{input_file_name, min => smin}
      val ranges = spark.read.schema(EventSchema.schema).parquet(staging.toString)
        .groupBy(input_file_name().as("f"))
        .agg(smin("version").as("v0"), smax("version").as("v1"))
        .collect()
        .map { r =>
          val src = Paths.get(java.net.URI.create(r.getString(0)).getPath)
          val name = ParquetLogBackend.segmentName(r.getLong(1), r.getLong(2))
          Files.move(src, staging.resolve(name), StandardCopyOption.ATOMIC_MOVE)
          (name, r.getLong(1), r.getLong(2))
        }
      val old = dir.resolve("segments.old")
      deleteRecursively(old)
      ioLock.synchronized {
        Files.move(segmentsDir, old, StandardCopyOption.ATOMIC_MOVE)
        Files.move(staging, segmentsDir, StandardCopyOption.ATOMIC_MOVE)
        manifest.clear()
        ranges.foreach { case (name, v0, v1) =>
          manifest += ((segmentsDir.resolve(name).toString, v0, v1))
        }
      }
      deleteRecursively(old)
    }

  private def deleteRecursively(p: Path): Unit =
    ParquetLogBackend.deleteRecursively(p)

  /** Drop commit-log lines fully covered by segments (last version <=
    * watermark). Called under compactLock only. The filtered rewrite and its
    * fsync run WITHOUT ioLock so concurrent appends aren't stalled for the
    * rotation; ioLock is taken only to copy the suffix appended meanwhile
    * and swap the file. */
  private def rotateCommitLog(): Unit = {
    val tmp = dir.resolve("commits.jsonl.tmp")
    // Stable prefix boundary: len0 is captured under ioLock, so it sits on a
    // commit-line boundary (persist writes a whole line under the lock).
    val len0 = ioLock.synchronized(channel.size())
    // fsync the tmp file BEFORE the rename and the directory AFTER it:
    // without both, a power loss right after the atomic move can surface an
    // empty/partial commits.jsonl, losing fsync-acknowledged commits.
    val tmpCh = java.nio.channels.FileChannel.open(
      tmp, StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
    try rotateInto(tmpCh, len0)
    catch {
      case t: Throwable => // don't leak the fd/tmp on a failed rotation
        try tmpCh.close() catch { case _: Exception => () }
        try Files.deleteIfExists(tmp) catch { case _: Exception => () }
        // a failure between channel.close() and the reopen must not leave
        // the append channel closed forever
        ioLock.synchronized {
          if (!channel.isOpen)
            channel = java.nio.channels.FileChannel.open(
              commitLog, StandardOpenOption.CREATE,
              StandardOpenOption.WRITE, StandardOpenOption.APPEND)
        }
        throw t
    }
  }

  private def rotateInto(
      tmpCh: java.nio.channels.FileChannel, len0: Long): Unit = {
    val tmp = dir.resolve("commits.jsonl.tmp")
    // Stream prefix → filter → tmp, O(1) memory: with large payloads the
    // commit log can run to gigabytes between compactions.
    val tmpOut = new java.io.BufferedOutputStream(
      java.nio.channels.Channels.newOutputStream(tmpCh))
    scala.util.Using.resource(java.nio.channels.FileChannel.open(
      commitLog, StandardOpenOption.READ)) { rc =>
      val raw = java.nio.channels.Channels.newInputStream(rc)
      val bounded = new java.io.InputStream { // reads exactly [0, len0)
        private var remaining = len0
        override def read(): Int =
          if (remaining <= 0) -1
          else { val b = raw.read(); if (b >= 0) remaining -= 1; b }
        override def read(b: Array[Byte], off: Int, l: Int): Int =
          if (remaining <= 0) -1
          else {
            val n = raw.read(b, off, math.min(l.toLong, remaining).toInt)
            if (n > 0) remaining -= n
            n
          }
      }
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(bounded, StandardCharsets.UTF_8))
      // Txn tags on lines being dropped (events fully in segments) must
      // outlive the line — condensed to one marker per queryId, keeping the
      // HIGHEST batchId (the only one replay detection compares against).
      // Bounded by the number of distinct streaming queries, not history.
      val droppedTxns = scala.collection.mutable.HashMap
        .empty[String, (Long, Long, Long, Long)] // q -> (b, ts, vp, v)
      var line = br.readLine()
      while (line != null) {
        if (line.nonEmpty) {
          val root = ParquetLogBackend.mapper.readTree(line)
          if (root.get("v").asLong() > segmentMaxVersion) {
            tmpOut.write(line.getBytes(StandardCharsets.UTF_8))
            tmpOut.write('\n')
          } else {
            val q = root.get("q")
            if (q != null) {
              val b = root.get("b").asLong()
              droppedTxns.updateWith(q.asText()) {
                case some @ Some((prev, _, _, _)) if prev >= b => some
                case _ => Some((b, root.get("ts").asLong(),
                  root.get("vp").asLong(), root.get("v").asLong()))
              }
            }
          }
        }
        line = br.readLine()
      }
      droppedTxns.foreach { case (q, (b, ts, vp, v)) =>
        tmpOut.write(ParquetLogBackend.encodeTxnMarker(q, b, ts, vp, v)
          .getBytes(StandardCharsets.UTF_8))
      }
    }
    tmpOut.flush()
    tmpCh.force(true)
    ioLock.synchronized {
      // Commits appended during the rewrite are all > segmentMaxVersion by
      // construction — copy them verbatim past the filtered prefix.
      // transferTo may copy fewer bytes than asked (sendfile caps one call
      // around 2 GB) — loop until every byte landed or commits are lost.
      val len1 = channel.size()
      if (len1 > len0)
        scala.util.Using.resource(java.nio.channels.FileChannel.open(
          commitLog, StandardOpenOption.READ)) { rc =>
          var pos = len0
          while (pos < len1) {
            val n = rc.transferTo(pos, len1 - pos, tmpCh)
            if (n <= 0)
              throw new java.io.IOException(
                s"commit-log suffix copy stalled at $pos/$len1")
            pos += n
          }
        }
      tmpCh.force(true)
      tmpCh.close()
      channel.close()
      Files.move(tmp, commitLog,
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      // directory fsync so the rename itself is durable. Linux supports
      // opening a directory for read+force; elsewhere it throws — degrade to
      // best-effort rather than failing the rotation.
      try scala.util.Using.resource(
        java.nio.channels.FileChannel.open(dir, StandardOpenOption.READ))(
        _.force(true))
      catch { case _: java.io.IOException => () }
      channel = java.nio.channels.FileChannel.open(
        commitLog,
        StandardOpenOption.CREATE,
        StandardOpenOption.WRITE,
        StandardOpenOption.APPEND)
    }
  }

  override def snapshot(): DataFrame = snapshotRange(1L, Long.MaxValue)

  /** Version-pruned snapshot off the manifest. Tail, watermark, and file
    * list are captured in ONE ioLock section — compact() moves a segment
    * in, registers it, and drops the tail prefix under the same lock, so a
    * snapshot can never see a batch twice (file + tail) or not at all.
    * Files whose [min,max] version range misses [minVersion,maxVersion]
    * never reach Spark's planner: no directory listing, no footer reads,
    * no per-file tasks — the row-level predicate stays the caller's job
    * (file granularity returns a superset). */
  override def snapshotRange(minVersion: Long, maxVersion: Long): DataFrame = {
    val (t, watermark, files) = ioLock.synchronized(
      (tail.toList, segmentMaxVersion,
        manifest.collect {
          case (f, v0, v1) if v1 >= minVersion && v0 <= maxVersion => f
        }.toList))
    val tailDf = spark.createDataFrame(t.map(_.toRow).asJava, EventSchema.schema)
    if (files.nonEmpty) {
      // watermark bound kept defensively (pushed to row-group stats, free):
      // manifest and watermark are captured atomically so it's a no-op in
      // normal operation, but it hard-bounds any file landed out-of-band.
      val segs = spark.read.schema(EventSchema.schema).parquet(files: _*)
        .filter(col("version") <= watermark)
        .select(EventSchema.schema.fieldNames.map(col).toSeq: _*)
      segs.union(tailDf)
    } else tailDf
  }

  override def close(): Unit = {
    closed = true
    compactTimer.foreach(_.shutdownNow())
    ioLock.synchronized(channel.close())
  }

  /** One listing of segments/ (open-time only), ranges from the
    * self-describing names; legacy files without one get their range from
    * a single footer-stat job and keep working. */
  private def rebuildManifest(): Unit = {
    manifest.clear()
    if (!Files.exists(segmentsDir)) return
    val parquetFiles = scala.util.Using.resource(Files.list(segmentsDir))(
      _.iterator().asScala.filter(_.toString.endsWith(".parquet")).toList)
    val legacy = ArrayBuffer.empty[String]
    parquetFiles.foreach { p =>
      p.getFileName.toString match {
        case ParquetLogBackend.SegmentName(v0, v1) =>
          manifest += ((p.toString, v0.toLong, v1.toLong))
        case _ => legacy += p.toString
      }
    }
    if (legacy.nonEmpty) {
      import org.apache.spark.sql.functions.{input_file_name, min => smin}
      spark.read.schema(EventSchema.schema).parquet(legacy.toSeq: _*)
        .groupBy(input_file_name().as("f"))
        .agg(smin("version").as("v0"), smax("version").as("v1"))
        .collect()
        .foreach { r =>
          val path = Paths.get(java.net.URI.create(r.getString(0)).getPath)
          manifest += ((path.toString, r.getLong(1), r.getLong(2)))
        }
    }
  }

  private def recover(): Unit = {
    // roll back an interrupted coalesceSegments swap: segments.old holds
    // the complete pre-rewrite data; the staging dir is never trusted
    val old = dir.resolve("segments.old")
    if (Files.exists(old)) {
      if (Files.exists(segmentsDir)) deleteRecursively(old) // swap completed
      else Files.move(old, segmentsDir, StandardCopyOption.ATOMIC_MOVE)
    }
    deleteRecursively(dir.resolve("segments.rewrite"))
    // scratch dirs from compactions that crashed between the segment write
    // and the atomic move: their batches are still wholly in the commit log
    // (rotation happens after the move), so the copies are pure leaks
    scala.util.Using.resource(
      Files.newDirectoryStream(dir, "segments.write-*"))(
      _.iterator().asScala.toList.foreach(deleteRecursively))
    rebuildManifest()
    if (manifest.nonEmpty) {
      segmentMaxVersion = manifest.map(_._3).max
      // the recovery timestamp lives at the max version; timestamps are
      // monotone in version, so reading ONLY the file holding it suffices —
      // open cost is one small file, not a full-history scan
      val lastFile = manifest.maxBy(_._3)._1
      val row = spark.read.schema(EventSchema.schema).parquet(lastFile)
        .agg(smax("version"), smax("timestamp")).head()
      restore(segmentMaxVersion, row.getLong(1))
    }
    if (Files.exists(commitLog)) {
      scala.util.Using.resource(Files.lines(commitLog))(_.iterator().asScala.foreach { line =>
        if (line.nonEmpty) {
          val root = ParquetLogBackend.mapper.readTree(line)
          val events = ParquetLogBackend.decodeCommitEvents(root)
            .filter(_.version > segmentMaxVersion)
          if (events.nonEmpty) {
            tail ++= events
            restore(events.last.version, events.last.timestamp)
          }
          val q = root.get("q") // transactional tag (inline or marker line)
          if (q != null) {
            val vp = root.get("vp").asLong()
            restoreTxn(q.asText(), root.get("b").asLong(),
              AppendResult(vp, vp + 1, root.get("v").asLong(),
                root.get("ts").asLong()))
          }
        }
      })
      tail.lastOption.foreach { last => // open-time integrity of the tail entry
        val cs = EventOps.checksum(
          last.timestamp,
          UTF8String.fromString(last.label),
          UTF8String.fromString(last.payload),
          last.versionPrevious)
        if (cs != last.checksum)
          throw new IllegalStateException(
            s"corrupted log: checksum mismatch at version ${last.version}")
      }
    }
  }
}

object ParquetLogBackend {
  private val mapper = new ObjectMapper()

  /** Self-describing segment file name: zero-padded min/max version (so
    * names sort in version order) + a random suffix (uniqueness across
    * rewrites of the same range). */
  private def segmentName(v0: Long, v1: Long): String =
    f"seg-$v0%019d-$v1%019d-${java.util.UUID.randomUUID().toString.take(8)}.parquet"

  private val SegmentName = """seg-(\d{19})-(\d{19})-[0-9a-f]{8}\.parquet""".r

  /** Read-only point-in-time view of a log directory for out-of-process
    * readers (the `graft` DataSource V2): the segment files with their
    * version ranges (parsed from the self-describing names — no footer
    * reads, no Spark job) plus the commit-log tail past the segment
    * watermark. The commit log is read BEFORE the segment listing: a
    * compaction racing this call can only move events from the already-read
    * tail into a segment we then also list — removed by the watermark
    * filter — never hide them (listing first would race rotation, which
    * deletes compacted lines). Files predating self-describing names get
    * their range from a driver-side footer-stats read (no data pages). */
  private[graft] def readView(
      path: String): (Seq[(String, Long, Long)], Seq[StoredEvent]) = {
    val dir = Paths.get(path)
    if (!Files.exists(dir.resolve("meta.json")))
      throw new IllegalStateException(s"not an event log directory: $path")
    val commitLog = dir.resolve("commits.jsonl")
    val tail = ArrayBuffer.empty[StoredEvent]
    if (Files.exists(commitLog)) {
      // A live writer may be mid-append: a torn FINAL line is the normal
      // concurrent-read artifact (the commit simply isn't part of this
      // snapshot yet) and is dropped; a malformed line FOLLOWED by valid
      // ones is real corruption and still throws.
      val lines = scala.util.Using.resource(Files.lines(commitLog))(
        _.iterator().asScala.filter(_.nonEmpty).toList)
      lines.zipWithIndex.foreach { case (line, i) =>
        try tail ++= decodeCommitEvents(mapper.readTree(line))
        catch {
          case _: com.fasterxml.jackson.core.JacksonException
              if i == lines.length - 1 => ()
          case _: NullPointerException if i == lines.length - 1 => ()
        }
      }
    }
    def list(d: Path): Seq[(String, Long, Long)] =
      scala.util.Using.resource(Files.list(d))(
        _.iterator().asScala
          .filter(_.toString.endsWith(".parquet"))
          .map { p =>
            p.getFileName.toString match {
              case SegmentName(v0, v1) => (p.toString, v0.toLong, v1.toLong)
              case _ =>
                val (v0, v1) = cachedFooterRange(p)
                (p.toString, v0, v1)
            }
          }.toList)
    // A coalesceSegments swap (segments -> segments.old, staging ->
    // segments) has a window where segments/ does not exist; segments.old
    // holds the COMPLETE pre-rewrite history then, so falling back to it
    // keeps this view exact instead of silently tail-only. The listing
    // itself can also race the first move — retry covers it.
    val segsDir = dir.resolve("segments")
    val oldDir = dir.resolve("segments.old")
    def listSegments(attempt: Int = 0): Seq[(String, Long, Long)] =
      try {
        if (Files.exists(segsDir)) list(segsDir)
        else if (Files.exists(oldDir)) list(oldDir)
        else Nil
      } catch {
        case _: java.io.UncheckedIOException | _: java.nio.file.NoSuchFileException
            if attempt < 3 =>
          listSegments(attempt + 1)
      }
    val segs = listSegments()
    val watermark = if (segs.isEmpty) 0L else segs.map(_._3).max
    (segs, tail.filter(_.version > watermark).toList)
  }

  private[graft] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      scala.util.Using.resource(Files.walk(p))(
        _.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f)))
    }

  /** Footer-derived ranges for legacy unnamed segment files, cached by
    * (path, size, mtime): segments are immutable once written, but the
    * streaming path calls readView at least twice per trigger — without
    * this, a log with legacy files pays repeated per-trigger footer I/O.
    * Bounded: entries exist only for pre-self-describing-name files. */
  private val footerRangeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), (Long, Long)]()

  private def cachedFooterRange(p: Path): (Long, Long) = {
    val attrs = Files.readAttributes(p,
      classOf[java.nio.file.attribute.BasicFileAttributes])
    footerRangeCache.computeIfAbsent(
      (p.toString, attrs.size(), attrs.lastModifiedTime().toMillis),
      _ => footerVersionRange(p.toString))
  }

  /** min/max of the `version` column from parquet footer statistics —
    * legacy-segment fallback only; reads footers, never data pages. */
  private def footerVersionRange(file: String): (Long, Long) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file),
      new org.apache.hadoop.conf.Configuration())
    scala.util.Using.resource(ParquetFileReader.open(in)) { r =>
      val stats = r.getFooter.getBlocks.asScala.flatMap(
        _.getColumns.asScala.find(_.getPath.toDotString == "version")
          .map(_.getStatistics))
      require(stats.nonEmpty, s"no version statistics in $file")
      (stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min,
        stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max)
    }
  }

  /** Create a new log directory (≙ file.Create, file.go:128-161). */
  def create(
      spark: SparkSession,
      path: String,
      metadata: Map[String, String] = Map.empty,
      payloadLimit: Int = EventSchema.DefaultPayloadLimit,
      compactThreshold: Int = 10000,
      compactIntervalMs: Long = 5000,
      maxSegmentFiles: Int = 0): ParquetLogBackend = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    val meta = mapper.createObjectNode()
    meta.put("proto", 1)
    meta.put("payloadLimit", payloadLimit)
    val mm = meta.putObject("metadata")
    metadata.foreach { case (k, v) => mm.put(k, v) }
    val tmp = dir.resolve("meta.json.tmp")
    Files.write(tmp, mapper.writeValueAsBytes(meta))
    Files.move(tmp, dir.resolve("meta.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    open(spark, path, compactThreshold, compactIntervalMs, maxSegmentFiles)
  }

  /** Open + recover an existing log directory (≙ file.Open, file.go:67-125). */
  def open(
      spark: SparkSession,
      path: String,
      compactThreshold: Int = 10000,
      compactIntervalMs: Long = 5000,
      maxSegmentFiles: Int = 0): ParquetLogBackend = {
    val dir = Paths.get(path)
    val metaFile = dir.resolve("meta.json")
    if (!Files.exists(metaFile))
      throw new IllegalStateException(s"not an event log directory: $path")
    val meta = mapper.readTree(Files.readAllBytes(metaFile))
    val proto = meta.get("proto").asInt()
    if (proto != 1)
      throw new IllegalStateException(s"unsupported log proto version: $proto")
    val metadata = meta.get("metadata").properties().asScala
      .map(e => e.getKey -> e.getValue.asText()).toMap
    val b = new ParquetLogBackend(
      spark, dir, metadata, meta.get("payloadLimit").asInt(),
      compactThreshold, compactIntervalMs, maxSegmentFiles)
    b.recover()
    b.startCompactTimer()
    b
  }

  private def encodeCommit(
      events: Seq[StoredEvent], tag: Option[CommitTag]): String = {
    val root = mapper.createObjectNode()
    root.put("ts", events.head.timestamp)
    root.put("vp", events.head.versionPrevious)
    root.put("v", events.last.version)
    // transactional tag (exactly-once streaming sinks): rides the SAME
    // fsync'd line as the data, so "committed" and "recorded as committed"
    // are one atomic durability event — no window where a crash could
    // replay an already-appended micro-batch
    tag.foreach { t =>
      root.put("q", t.queryId)
      root.put("b", t.batchId)
    }
    val arr = root.putArray("events")
    events.foreach { e =>
      val n = arr.addObject()
      n.put("l", e.label)
      n.put("p", e.payload)
      n.put("c", e.checksum)
    }
    mapper.writeValueAsString(root) + "\n"
  }

  /** Condensed record of a compacted-away transactional commit: the events
    * now live in segments, but the (queryId, batchId) → version-range fact
    * must stay durable for replay detection. */
  private def encodeTxnMarker(
      q: String, b: Long, ts: Long, vp: Long, v: Long): String = {
    val root = mapper.createObjectNode()
    root.put("ts", ts)
    root.put("vp", vp)
    root.put("v", v)
    root.put("q", q)
    root.put("b", b)
    root.putArray("events")
    mapper.writeValueAsString(root) + "\n"
  }

  private def decodeCommitEvents(
      root: com.fasterxml.jackson.databind.JsonNode): Seq[StoredEvent] = {
    val ts = root.get("ts").asLong()
    var vp = root.get("vp").asLong()
    root.get("events").elements().asScala.map { n =>
      val v = vp + 1
      val se = StoredEvent(
        v, vp, ts, n.get("l").asText(), n.get("p").asText(), n.get("c").asLong())
      vp = v
      se
    }.toList
  }
}
