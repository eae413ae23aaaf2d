package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-12 sampling additions, pinned against an independent Scala
  * reference (the DuckDB oracle is the per-round gate; this is the
  * third implementation, plus the semantic properties the gate's hash
  * can't state). */
class Round12SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def md5u32(salt: String, id: Long): Long = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest((salt + id.toString).getBytes("UTF-8"))
    java.lang.Long.parseLong(
      h.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("sample_priority equals an independent driver-side reference; estimator algebra holds") {
    val docs = graft.util.Tables(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val k = 50
    val withP = docs.map { case (id, nc) =>
      val u = (md5u32("ps", id) + 1).toDouble / 4294967296.0
      (id, nc.toDouble, nc.toDouble / u)
    }
    val ordered = withP.sortBy(t => (-t._3, t._1))
    val tau = ordered(k)._3 // the (k+1)-th priority
    val want = ordered.take(k).zipWithIndex.map { case ((id, w, p), i) =>
      (id, w, (i + 1).toLong, p, math.max(w, tau))
    }.sortBy(_._1).toSeq

    val got = SparkEntry.queries("sample_priority")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got === want, "entry must equal the driver-side reference")
    // estimator algebra: every kept doc's priority clears τ and its
    // estimate is max(w, τ) — small-w docs that land carry τ itself
    assert(got.forall(_._4 >= tau))
    assert(got.forall(t => t._5 >= t._2))
    assert(got.exists(t => t._5 > t._2),
      "some kept doc must be below τ in raw weight (size-biased sample)")
  }

  test("plan pins: priority top-k is a TakeOrdered, temperature mixing joins broadcast-only") {
    val p1 = SparkEntry.queries("sample_priority")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p1.contains("TakeOrderedAndProject"),
      s"the (k+1) selection must be per-partition heaps, not a global sort:\n$p1")
    val p2 = SparkEntry.queries("mix_temperature")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p2.contains("SortMergeJoin") && !p2.contains("CartesianProduct"),
      s"source-sized sides must broadcast:\n$p2")
    // the stratified entry runs the NATIVE bounded-state aggregate —
    // no per-stratum rank window may appear (a window would sort every
    // stratum's full row set; the aggregate carries <= k+1 entries)
    val p3 = SparkEntry.queries("sample_priority_by_lang")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p3.contains("priority_sample"),
      s"the native aggregate must plan:\n$p3")
    assert(!p3.contains("RunningWindowFunction") &&
      !p3.contains("Window "), // the explode/orderBy stages are fine
      s"no per-stratum rank window may plan:\n$p3")
  }

  test("mix_temperature: rates capped, α=0.5 rebalancing direction, counts consistent") {
    val rows = SparkEntry.queries("mix_temperature")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, q, rate, thr, kept) =>
      assert(q === math.sqrt(n.toDouble))
      assert(rate > 0.0 && rate <= 1.0, s"$src rate $rate")
      assert(thr === math.floor(rate * 4294967296.0).toLong)
      assert(kept >= 0 && kept <= n, s"$src kept $kept of $n")
    }
    // temperature direction: for UNCAPPED sources the acceptance rate
    // falls as 1/√n — a bigger source must never have a higher rate
    val uncapped = rows.filter(_._4 < 1.0).sortBy(_._2)
    uncapped.sliding(2).foreach {
      case Array((sa, na, _, ra, _, _), (sb, nb, _, rb, _, _)) if na < nb =>
        assert(rb <= ra, s"$sb (n=$nb) rate $rb > $sa (n=$na) rate $ra")
      case _ =>
    }
    // the per-doc Bernoulli is the md5 threshold compare, recomputed
    val docs = graft.util.Tables(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val thrBySrc = rows.map(t => t._1 -> t._5).toMap
    val keptRef = docs.groupBy(_._2).map { case (src, ds) =>
      src -> ds.count(d => md5u32("mt", d._1) < thrBySrc(src)).toLong
    }
    rows.foreach { case (src, _, _, _, _, kept) =>
      assert(keptRef(src) === kept, s"$src kept mismatch")
    }
  }
}
