package graft

import graft.exprs.KllSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The KLL quantile sketch (round 12): exactness below capacity, the
  * rank-error bound above it, exact weight conservation through odd
  * compactions, merge behavior, serialization, and the streaming twin's
  * bound per closed window. */
class KllSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def exactDisc(sorted: Array[Double], phi: Double): Double =
    sorted(math.max(0, math.ceil(phi * sorted.length).toInt - 1))

  private def trueRank(sorted: Array[Double], v: Double): Double = {
    // rank of the estimate = fraction of values <= v
    val idx = sorted.count(_ <= v)
    idx.toDouble / sorted.length
  }

  private val Phis = Seq(0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99)

  test("below capacity the sketch IS quantile_disc (nothing ever compacts)") {
    val st = new KllSketch.State(64)
    val xs = Array(5.0, 1.0, 9.0, 3.0, 3.0, 7.0, 2.0)
    xs.foreach(st.add)
    val sorted = xs.sorted
    Phis.foreach(phi =>
      assert(st.quantile(phi) === exactDisc(sorted, phi), s"phi=$phi"))
    assert(st.retainedWeight === xs.length)
  }

  test("weight is conserved exactly through odd-size compactions and merges") {
    val st = new KllSketch.State(9) // odd capacity forces the leftover rule
    (1 to 100003).foreach(i => st.add((i * 2654435761L % 9973).toDouble))
    assert(st.total === 100003L)
    assert(st.retainedWeight === 100003L,
      "compaction must never inflate or drop weight")
    val a = new KllSketch.State(9)
    val b = new KllSketch.State(9)
    (1 to 501).foreach(i => a.add(i.toDouble))
    (1 to 502).foreach(i => b.add(-i.toDouble))
    a.merge(b)
    assert(a.retainedWeight === 1003L && a.total === 1003L)
  }

  test("merge compacts over-full HIGHER levels even when level 0 is under capacity (state bound on merge-heavy paths)") {
    // each donor sketch holds k items: level 0 compacts to ≤1 leftover,
    // level 1 holds k/2 — merging 8 donors bulk-appends 4k items into
    // level 1 while level 0 stays at ~8 ≪ k. A compactFrom that exits at
    // the first non-full level (the pre-round-13 bug) leaves level 1 at
    // 4k forever; the state bound demands it compact.
    val k = 32
    val donors = (0 until 8).map { d =>
      val st = new KllSketch.State(k)
      (0 until k).foreach(i => st.add((d * k + i).toDouble))
      st
    }
    val merged = donors.head
    donors.tail.foreach(merged.merge)
    assert(merged.total === 8L * k)
    assert(merged.retainedWeight === 8L * k, "weight conserved through merge")
    merged.levels.zipWithIndex.foreach { case (buf, l) =>
      assert(buf.length < k,
        s"level $l holds ${buf.length} ≥ k=$k items after merge — " +
          "higher levels must compact even when level 0 is under capacity")
    }
    assert(merged.retainedCount <= 3 * k,
      s"retained ${merged.retainedCount} — merge-heavy state must stay O(k·log(n/k))")
    // and the estimates stay sane: every input was in [0, 256)
    Seq(0.25, 0.5, 0.9).foreach { phi =>
      val est = merged.quantile(phi)
      assert(est >= 0.0 && est < 256.0)
    }
  }

  test("rank error stays within the documented bound on a skewed corpus (direct and merged)") {
    val n = 50000
    val rnd = new scala.util.Random(17)
    // heavy-tailed: mostly small, occasional huge — the doc-length shape
    val xs = Array.fill(n)(
      math.floor(math.exp(rnd.nextGaussian() * 1.5 + 5.0))).map(_.toDouble)
    val sorted = xs.sorted
    val k = 200
    // levels ≈ log2(n/k); the deterministic alternation's practical rank
    // error is well under levels/k — gate at that bound
    val bound = math.max(1.0, math.log(n.toDouble / k) / math.log(2.0)) / k

    val st = new KllSketch.State(k)
    xs.foreach(st.add)
    Phis.foreach { phi =>
      val r = trueRank(sorted, st.quantile(phi))
      assert(math.abs(r - phi) <= bound + 1e-9,
        s"phi=$phi est-rank=$r bound=$bound")
    }

    // merge path: 8 partial sketches (the partial/final aggregation and
    // stream-state shape) must stay inside the same bound
    val parts = xs.grouped(n / 8 + 1).map { chunk =>
      val p = new KllSketch.State(k)
      chunk.foreach(p.add)
      p
    }.toSeq
    val merged = parts.head
    parts.tail.foreach(merged.merge)
    assert(merged.retainedWeight === n.toLong)
    Phis.foreach { phi =>
      val r = trueRank(sorted, merged.quantile(phi))
      assert(math.abs(r - phi) <= bound + 1e-9,
        s"merged phi=$phi est-rank=$r bound=$bound")
    }
    // state stays sketch-sized: k per level × levels, not n
    assert(merged.retainedCount <= k * 12,
      s"retained ${merged.retainedCount} items — state must not grow with n")
  }

  test("serialization round-trips the full state") {
    val st = new KllSketch.State(16)
    (1 to 5000).foreach(i => st.add((i % 371).toDouble))
    val back = KllSketch.deserialize(KllSketch.serialize(st))
    assert(back.total === st.total)
    assert(back.retainedWeight === st.retainedWeight)
    Phis.foreach(phi => assert(back.quantile(phi) === st.quantile(phi)))
  }

  test("text_quantiles_sketch entry: estimates within the band of exact per-lang quantiles") {
    val sfDir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("text_quantiles_sketch")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(got.nonEmpty)
    val docs = graft.util.Tables(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1).toDouble))
      .groupBy(_._1).map { case (l, vs) => l -> vs.map(_._2).sorted }
    val labelPhi = Seq("p01" -> 0.01, "p05" -> 0.05, "p25" -> 0.25,
      "p50" -> 0.5, "p75" -> 0.75, "p95" -> 0.95, "p99" -> 0.99).toMap
    got.foreach { case (lang, q, est) =>
      val sorted = docs(lang)
      val r = trueRank(sorted, est)
      assert(math.abs(r - labelPhi(q)) <= 0.05 + 1.0 / sorted.length,
        s"$lang $q: est-rank $r")
    }
  }

  test("quantilesStream: closed-window estimates inside the rank bound") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rnd = new scala.util.Random(5)
    val vals = Array.fill(4000)(
      math.floor(math.exp(rnd.nextGaussian() + 4.0)))
    val sorted = vals.sorted
    val t0 = new java.sql.Timestamp(1000L)
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = graft.streaming.StreamOps.quantilesStream(
        mem.toDF().toDF("ts", "g", "v"), "ts", "g", "v",
        Seq(0.25, 0.5, 0.95), Seq("p25", "p50", "p95"), k = 200)
      .writeStream.format("memory").queryName("kllstream")
      .outputMode("append").start()
    try {
      val (h1, h2) = vals.splitAt(vals.length / 2)
      mem.addData(h1.map(v => (t0, "a", v)).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(h2.map(v => (t0, "a", v)).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(Seq((new java.sql.Timestamp(10000000L), "zz", 1.0)))
      q.processAllAvailable()
      val got = spark.table("kllstream").filter(col("g") === "a")
        .select("q", "est").as[(String, Double)].collect().toMap
      assert(got.size === 3)
      Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95).foreach {
        case (lbl, phi) =>
          val r = trueRank(sorted, got(lbl))
          assert(math.abs(r - phi) <= 0.05,
            s"$lbl: est-rank $r vs $phi")
      }
    } finally q.stop()
  }
}
