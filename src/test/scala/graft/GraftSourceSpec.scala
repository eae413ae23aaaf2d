package graft

import graft.core.EventData
import graft.sources.{GraftFilePartition, GraftOffset, GraftPartitions, GraftTailPartition}
import graft.storage.ParquetLogBackend
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The `graft` DataSource V2: batch reads (segments + commit-log tail),
  * plan-time file pruning from version predicates, column pruning, and the
  * version-offset micro-batch stream (exactly-once across restarts). */
class GraftSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** A log with 3 compacted segments (versions 1..30) + 5 tail events. */
  private def mkLog(): String = {
    val dir = Files.createTempDirectory("graftdsv2").toString
    val b = ParquetLogBackend.create(spark, dir,
      compactThreshold = 1000, compactIntervalMs = 0)
    try {
      (1 to 3).foreach { s =>
        b.appendMulti((1 to 10).map(i =>
          EventData(s"seg$s", s"""{"i":${(s - 1) * 10 + i}}""")))
        b.compact()
      }
      b.appendMulti((1 to 5).map(i => EventData("tail", s"""{"t":$i}""")))
    } finally b.close()
    dir
  }

  test("batch read = segments + uncompacted tail, all columns intact") {
    val dir = mkLog()
    val df = spark.read.format("graft").load(dir)
    assert(df.count() === 35)
    assert(df.schema === graft.core.EventSchema.schema)
    val rows = df.orderBy("version").collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 35L))
    assert(rows.map(_.getLong(1)).toSeq === (0L to 34L)) // dense chain
    assert(rows.last.getString(3) === "tail")
    assert(rows.last.getString(4) === """{"t":5}""")
  }

  test("version predicates prune segment files at plan time") {
    val dir = mkLog()
    // only versions 12..18 → exactly one of the three segment files
    val parts = GraftPartitions.plan(dir, 12L, 18L)
    assert(parts.length === 1, parts.toSeq)
    assert(parts.head.isInstanceOf[GraftFilePartition])
    // bounded to the tail only → no file partitions at all
    val tailOnly = GraftPartitions.plan(dir, 31L, Long.MaxValue)
    assert(tailOnly.length === 1)
    assert(tailOnly.head.isInstanceOf[GraftTailPartition])
    // empty range → nothing
    assert(GraftPartitions.plan(dir, 100L, 50L).isEmpty)

    // end-to-end: the pushed bound shows in the plan and results are exact
    val df = spark.read.format("graft").load(dir)
      .filter(col("version") >= 12 && col("version") <= 18)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftLogScan"), plan)
    assert(df.select("version").collect().map(_.getLong(0)).sorted.toSeq
      === (12L to 18L))
  }

  test("versionAsOf time-travels the batch read with file-level pruning") {
    val dir = mkLog()
    // ceiling inside segment 2 → segment 3 and the tail never get planned
    val df = spark.read.format("graft").option("versionAsOf", 15).load(dir)
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("versions=[1, 15]"), desc)
    assert(df.select("version").collect().map(_.getLong(0)).sorted.toSeq
      === (1L to 15L))
    // the option composes with pushed predicates (tightest bound wins)
    val both = spark.read.format("graft").option("versionAsOf", 15).load(dir)
      .filter(col("version") >= 12 && col("version") <= 25)
    assert(both.select("version").collect().map(_.getLong(0)).sorted.toSeq
      === (12L to 15L))
    // same answer as the engine facade's snapshotAt
    val back = new graft.core.EventLog(ParquetLogBackend.open(spark, dir))
    try assert(
      back.snapshotAt(15L).select("version", "label", "payload")
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].longValue).toSeq
        === df.select("version", "label", "payload")
          .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].longValue).toSeq)
    finally back.close()
    // nonsense values fail fast; streams reject the option outright
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("versionAsOf", 0).load(dir).count()
    }
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft")
        .option("versionAsOf", 15).load(dir)
        .writeStream.format("memory").queryName("asofstream").start()
      try q.processAllAvailable() finally q.stop()
    }
  }

  test("column pruning reaches the scan") {
    val dir = mkLog()
    val df = spark.read.format("graft").load(dir).select("label")
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("columns=[label]"), desc)
    assert(df.distinct().collect().map(_.getString(0)).sorted.toSeq
      === Seq("seg1", "seg2", "seg3", "tail"))
    // pruned projection + row-filtering bound: version is re-read internally
    val one = spark.read.format("graft").load(dir)
      .filter(col("version") === 17).select("payload")
    assert(one.collect().map(_.getString(0)).toSeq === Seq("""{"i":17}"""))
  }

  test("micro-batch stream delivers exact version ranges, exactly once") {
    val dir = Files.createTempDirectory("graftdsv2s").toString
    val ckpt = Files.createTempDirectory("graftdsv2c").toString
    val b = ParquetLogBackend.create(spark, dir,
      compactThreshold = 1000, compactIntervalMs = 0)
    try {
      b.appendMulti((1 to 10).map(i => EventData("a", s"""{"i":$i}""")))
      b.compact()
      b.appendMulti((1 to 5).map(i => EventData("b", s"""{"i":$i}""")))

      val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      def runOnce(): Unit = {
        val q = spark.readStream.format("graft").load(dir)
          .writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            batch.select("version").collect().foreach(r => seen.add(r.getLong(0)))
            ()
          }
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      runOnce() // versions 1..15
      // more appends, spanning a compaction boundary
      b.appendMulti((1 to 5).map(i => EventData("c", s"""{"i":$i}""")))
      b.compact()
      b.appendMulti((1 to 3).map(i => EventData("d", s"""{"i":$i}""")))
      runOnce() // restart from checkpoint → versions 16..23 only
      import scala.jdk.CollectionConverters._
      val got = seen.asScala.toSeq.sorted
      assert(got === (1L to 23L), "duplicates or gaps across restarts")
    } finally b.close()
  }

  test("a torn trailing commit line is dropped; a torn middle line throws") {
    val dir = mkLog()
    val commits = java.nio.file.Paths.get(dir, "commits.jsonl")
    // simulate reading mid-append: half a JSON line at the end
    Files.writeString(commits,
      """{"ts":123,"vp":35,"v":36,"events":[{"l":"x","p":""",
      java.nio.file.StandardOpenOption.APPEND)
    val df = spark.read.format("graft").load(dir)
    assert(df.count() === 35) // the torn commit is simply not visible yet
    // but a malformed line FOLLOWED by a valid one is corruption
    Files.writeString(commits, "\n", java.nio.file.StandardOpenOption.APPEND)
    val valid = """{"ts":124,"vp":36,"v":37,"events":[{"l":"y","p":"{}","c":0}]}""" + "\n"
    Files.writeString(commits, valid, java.nio.file.StandardOpenOption.APPEND)
    intercept[Exception] {
      spark.read.format("graft").load(dir).count()
    }
  }

  test("readers fall back to segments.old mid-coalesce swap") {
    val dir = mkLog()
    // simulate the window inside coalesceSegments between the two moves:
    // segments/ renamed away, replacement not yet in place
    val segs = java.nio.file.Paths.get(dir, "segments")
    val old = java.nio.file.Paths.get(dir, "segments.old")
    Files.move(segs, old)
    val df = spark.read.format("graft").load(dir)
    assert(df.count() === 35, "view must not silently drop segment history")
    Files.move(old, segs) // restore for temp-dir hygiene
  }

  test("batch scans execute columnar (vectorized reader, not row-by-row)") {
    val dir = mkLog()
    val df = spark.read.format("graft").load(dir)
      .filter(col("version") >= 12 && col("version") <= 33) // clips 2 files
    val plan = df.queryExecution.executedPlan
    // a columnar V2 scan surfaces through a ColumnarToRow transition
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.ColumnarToRowExec]),
      plan.toString)
    // and clipped edge batches + tail batch are still row-exact
    assert(df.select("version").collect().map(_.getLong(0)).sorted.toSeq
      === (12L to 33L))
  }

  test("reported statistics are exact and let a bounded scan broadcast") {
    val dir = mkLog()
    // direct: dense versions make the estimate exact (28..35 = 3 segment
    // rows clipped from [21,30] + 5 tail rows)
    val stats = new graft.sources.GraftScan(dir,
      graft.core.EventSchema.schema, 28L, Long.MaxValue, -1, 0L, 0L)
      .estimateStatistics()
    assert(stats.numRows().getAsLong === 8L)
    assert(stats.sizeInBytes().getAsLong > 0L)
    // end-to-end: with a small broadcast threshold, the version-bounded
    // scan (8 rows) must still broadcast — possible only because the scan
    // reports its size (the V2 fallback is defaultSizeInBytes = huge)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10KB")
      val big = spark.range(200000).selectExpr("id as version", "id * 2 as x")
      val bounded = spark.read.format("graft").load(dir)
        .filter(col("version") >= 28)
      val joined = big.join(bounded, "version")
      assert(joined.count() === 8L)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"),
        s"bounded graft scan must be broadcast-able:\n${p.take(3000)}")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("offset json round-trips") {
    assert(GraftOffset.parse(GraftOffset(42L).json()) === 42L)
    intercept[IllegalArgumentException](GraftOffset.parse("""{"v":1}"""))
  }

  test("limit pushdown stops adding segment files once covered") {
    val dir = mkLog() // 3 segments × 10 versions + 5 tail events
    // limit 5 < first file's 10 rows → one file, no tail
    assert(GraftPartitions.plan(dir, 1L, Long.MaxValue, limit = 5).length === 1)
    // limit 10 is exactly covered by the first file
    assert(GraftPartitions.plan(dir, 1L, Long.MaxValue, limit = 10).length === 1)
    // limit 15 needs two files
    assert(GraftPartitions.plan(dir, 1L, Long.MaxValue, limit = 15).length === 2)
    // limit 31 spills past all 30 segment rows into the tail
    val p31 = GraftPartitions.plan(dir, 1L, Long.MaxValue, limit = 31)
    assert(p31.length === 4 && p31.last.isInstanceOf[GraftTailPartition])
    // a version bound composes: [12, ∞) with limit 5 → only segment 2
    val bounded = GraftPartitions.plan(dir, 12L, Long.MaxValue, limit = 5)
    assert(bounded.length === 1)
    assert(bounded.head.asInstanceOf[GraftFilePartition].minV === 12L)

    // end-to-end through the scan builder: df.limit(k) plans ⌈k-covering⌉
    // files and still returns exactly k rows (Spark's own Limit on top)
    val df = spark.read.format("graft").load(dir).limit(5)
    val scans = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("GraftLogScan"))
    assert(scans.exists(_.contains("limit=5")), scans)
    assert(df.count() === 5)
    // a non-version predicate disables the file-stop (residual filtering
    // may discard planned rows, so coverage arithmetic no longer holds)
    val filtered = spark.read.format("graft").load(dir)
      .filter(col("label") =!= "seg1").limit(5)
    assert(filtered.collect().length === 5)
  }

  test("maxVersionsPerTrigger drains a backlog in exact contiguous batches") {
    val dir = Files.createTempDirectory("graftmvpt").toString
    val ckpt = Files.createTempDirectory("graftmvptc").toString
    val b = ParquetLogBackend.create(spark, dir,
      compactThreshold = 1000, compactIntervalMs = 0)
    try {
      b.appendMulti((1 to 17).map(i => EventData("a", s"""{"i":$i}""")))
      b.compact()
      b.appendMulti((1 to 5).map(i => EventData("b", s"""{"i":$i}""")))

      val batches =
        new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
      def runOnce(): Unit = {
        val q = spark.readStream.format("graft")
          .option("maxVersionsPerTrigger", 7L).load(dir)
          .writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            batches.add(
              batch.select("version").collect().map(_.getLong(0)).sorted.toSeq)
            ()
          }
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      runOnce() // 22-version backlog, cap 7 → ⌈22/7⌉ = 4 batches
      import scala.jdk.CollectionConverters._
      val got = batches.asScala.toSeq
      assert(got.map(_.length) === Seq(7, 7, 7, 1), got)
      // each batch is an exact contiguous version range, no gaps/dupes
      assert(got.flatten === (1L to 22L))
      got.foreach(bt => assert(bt === (bt.head to bt.last)))

      // a restart resumes from the checkpoint with the same cap semantics
      batches.clear()
      b.appendMulti((1 to 10).map(i => EventData("c", s"""{"i":$i}""")))
      runOnce()
      val after = batches.asScala.toSeq
      assert(after.map(_.length) === Seq(7, 3), after)
      assert(after.flatten === (23L to 32L))
    } finally b.close()
  }

  test("min/max/count aggregates push down to an O(1) one-row scan") {
    val dir = mkLog() // versions 1..35 (30 in segments + 5 tail)
    val df = spark.read.format("graft").load(dir)
      .agg(min("version"), max("version"), count(lit(1)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftLogAggScan"), plan)
    assert(plan.contains("no file reads"), plan)
    assert(!plan.contains("GraftLogScan path"), plan)
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 35L, 35L)))

    // version bounds clip the arithmetic, still no file reads
    val bounded = spark.read.format("graft").load(dir)
      .filter(col("version") >= 12 && col("version") <= 18)
      .agg(count(lit(1)), min("version"))
    assert(bounded.queryExecution.executedPlan.toString
      .contains("GraftLogAggScan"), "bounded agg must stay pushed")
    val br = bounded.collect().head
    assert((br.getLong(0), br.getLong(1)) === ((7L, 12L)))

    // versionAsOf composes: the ceiling is just a maxV clamp
    val asOf = spark.read.format("graft").option("versionAsOf", 15)
      .load(dir).agg(max("version"), count(lit(1))).collect().head
    assert((asOf.getLong(0), asOf.getLong(1)) === ((15L, 15L)))

    // an empty clipped range has SQL semantics: count 0, min NULL
    val empty = spark.read.format("graft").load(dir)
      .filter(col("version") > 100).agg(count(lit(1)), min("version"))
      .collect().head
    assert(empty.getLong(0) === 0L)
    assert(empty.isNullAt(1))

    // a non-version residual filter DISABLES pushdown (the arithmetic
    // can't see dropped rows) — falls back to the real scan, same answer
    val residual = spark.read.format("graft").load(dir)
      .filter(col("label") === "tail").agg(count(lit(1)))
    assert(!residual.queryExecution.executedPlan.toString
      .contains("GraftLogAggScan"), "residual filter must block pushdown")
    assert(residual.collect().head.getLong(0) === 5L)

    // group-by aggregates are NOT pushed (not derivable from bounds)
    val grouped = spark.read.format("graft").load(dir)
      .groupBy("label").count()
    assert(!grouped.queryExecution.executedPlan.toString
      .contains("GraftLogAggScan"), "group-by must block pushdown")
    assert(grouped.count() === 4L) // seg1 seg2 seg3 tail
  }

  test("pushed aggregates: gap inside the window fails loudly, damage beyond a pinned ceiling does not") {
    import scala.jdk.CollectionConverters._
    val dir = mkLog() // segments 1-10, 11-20, 21-30 + tail 31-35
    // damage the log: delete the MIDDLE segment (versions 11-20)
    val segs = scala.util.Using.resource(
      Files.list(java.nio.file.Paths.get(dir, "segments")))(
      _.iterator().asScala.toList)
    val victim = segs.find(_.getFileName.toString.contains("00011")).orElse(
      segs.sortBy(_.getFileName.toString).drop(1).headOption).get
    Files.delete(victim)

    // a whole-log pushed aggregate must FAIL, not report arithmetic counts
    // diverging from what the row scan would return
    val e = intercept[IllegalStateException] {
      spark.read.format("graft").load(dir)
        .agg(count(lit(1)), min("version")).collect()
    }
    assert(e.getMessage.contains("gapped log history"),
      s"wrong failure: ${e.getMessage}")

    // but time travel to the intact prefix is EXACTLY the read you want
    // against a damaged log — the contiguity check clips to the window
    val pinned = spark.read.format("graft").option("versionAsOf", 10)
      .load(dir).agg(count(lit(1)), min("version"), max("version"))
    assert(pinned.queryExecution.executedPlan.toString
      .contains("GraftLogAggScan"), "pinned agg must stay pushed")
    val pr = pinned.collect().head
    assert((pr.getLong(0), pr.getLong(1), pr.getLong(2)) === ((10L, 1L, 10L)))

    // bounds entirely ABOVE the hole also work (21..35 is contiguous)
    val above = spark.read.format("graft").load(dir)
      .filter(col("version") >= 21).agg(count(lit(1)), min("version"))
      .collect().head
    assert((above.getLong(0), above.getLong(1)) === ((15L, 21L)))
  }

  test("topN on version desc plans only the newest files (tail of the log)") {
    val dir = mkLog() // 3 segments of 10 + 5 tail events = versions 1..35
    // last 8 = tail (5) + 3 from segment 3: plan must touch ONE file
    val parts = GraftPartitions.plan(dir, 1L, Long.MaxValue, 8, desc = true)
    assert(parts.count(_.isInstanceOf[GraftFilePartition]) === 1, parts.toSeq)
    assert(parts.count(_.isInstanceOf[GraftTailPartition]) === 1, parts.toSeq)
    // last 3 = tail only: zero file partitions on any log size
    val tailOnly = GraftPartitions.plan(dir, 1L, Long.MaxValue, 3, desc = true)
    assert(tailOnly.forall(_.isInstanceOf[GraftTailPartition]), tailOnly.toSeq)

    // end-to-end: pushed direction shows in the plan, results exact
    val df = spark.read.format("graft").load(dir)
      .orderBy(col("version").desc).limit(8)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("limit=8 desc"), plan)
    assert(df.select("version").collect().map(_.getLong(0)).toSeq
      === (35L to 28L by -1))

    // ascending topN keeps the existing low-end file-stop
    val asc = spark.read.format("graft").load(dir)
      .orderBy("version").limit(12)
    assert(asc.queryExecution.executedPlan.toString.contains("limit=12"),
      "asc topN must push as a planning limit")
    assert(asc.select("version").collect().map(_.getLong(0)).toSeq
      === (1L to 12L))

    // a non-version residual blocks the file-stop (correctness over
    // cleverness: the residual could drop planned rows)
    val residual = spark.read.format("graft").load(dir)
      .filter(col("label") === "seg1")
      .orderBy(col("version").desc).limit(2)
    assert(!residual.queryExecution.executedPlan.toString
      .contains("desc"), "residual filter must block topN push")
    assert(residual.select("version").collect().map(_.getLong(0)).toSeq
      === Seq(10L, 9L))
  }

  test("strict bounds at Long extremes saturate to an empty range") {
    // with version filters fully accepted (no Spark residual), a wrapped
    // `x + 1` on `version > Long.MaxValue` would read the WHOLE log —
    // these must return nothing / SQL empty-aggregate semantics
    val dir = mkLog()
    val gt = spark.read.format("graft").load(dir)
      .filter(col("version") > Long.MaxValue)
    assert(gt.count() === 0L)
    val agg = spark.read.format("graft").load(dir)
      .filter(col("version") > Long.MaxValue)
      .agg(count(lit(1)), min("version")).collect().head
    assert(agg.getLong(0) === 0L)
    assert(agg.isNullAt(1))
    val lt = spark.read.format("graft").load(dir)
      .filter(col("version") < Long.MinValue)
    assert(lt.count() === 0L)
  }
}
