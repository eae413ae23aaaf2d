package graft.tools

import graft.operators.DecontamRegistry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The registry's design claim measured (round-15 directive): probe
  * cost is INDEPENDENT of how many registrations built the registry —
  * N word deltas fold into one ≤ bits/64-row broadcast relation, and
  * compaction only changes how many files the fold reads, never the
  * probe plan. Registers `n` synthetic benchmarks (disjoint shingle
  * vocabularies), probes a fixed corpus at three points — 1
  * registration, n registrations, n-compacted-to-1 — and prints one
  * JSON line of median probe seconds per point plus flagged-doc counts
  * (which must be monotone under registration and INVARIANT under
  * compaction).
  *
  * `RegistryCurve [n] [sfDir]` — defaults 100 registrations, sf0.01.
  */
object RegistryCurve {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files
      .createTempDirectory("graft-regcurve").toString
    val corpus = graft.util.Tables(spark, sfDir, "documents")
      .filter(col("doc_id") % 97 =!= 0)
      .localCheckpoint()

    // n synthetic benchmarks with disjoint vocabularies, each sharing
    // its vocabulary with nothing in the corpus (probe cost is what we
    // measure, not hit volume) EXCEPT benchmark 0, which registers the
    // real benchmark split so flagged counts are non-trivial
    def synthetic(k: Int) = Seq.tabulate(8)(j =>
      (k * 1000L + j, (0 until 40)
        .map(w => s"synth${k}tok${j}w$w").mkString(" ")))
      .toDF("doc_id", "text")

    def probeSec(reps: Int): Double = {
      val h = DecontamRegistry.load(dir)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        DecontamRegistry.flag(spark, h, corpus)
          .agg(count(lit(1)), sum(col("n_flagged"))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      times.sorted.apply(reps / 2)
    }
    def flaggedDocs(): Long = {
      val h = DecontamRegistry.load(dir)
      DecontamRegistry.flag(spark, h, corpus).count()
    }

    DecontamRegistry.register(spark, dir,
      graft.util.Tables(spark, sfDir, "documents")
        .filter(col("doc_id") % 97 === 0), "bench-real")
    val p1 = probeSec(5)
    val f1 = flaggedDocs()

    val tReg0 = System.nanoTime()
    (1 until n).foreach(k =>
      DecontamRegistry.register(spark, dir, synthetic(k), s"synth-$k"))
    val regSec = (System.nanoTime() - tReg0) / 1e9
    val pN = probeSec(5)
    val fN = flaggedDocs()

    val t0c = System.nanoTime()
    DecontamRegistry.compact(spark, dir)
    val compactSec = (System.nanoTime() - t0c) / 1e9
    DecontamRegistry.gc(dir)
    val pC = probeSec(5)
    val fC = flaggedDocs()

    require(fC == fN, s"compaction changed the flagged set: $fN -> $fC")
    println(
      s"""{"metric":"registry_curve","n_registrations":$n,""" +
        s""""probe_sec_1":$p1,"probe_sec_n":$pN,"probe_sec_compacted":$pC,""" +
        s""""flagged_1":$f1,"flagged_n":$fN,"flagged_compacted":$fC,""" +
        s""""register_sec_total":$regSec,"compact_sec":$compactSec,""" +
        s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
