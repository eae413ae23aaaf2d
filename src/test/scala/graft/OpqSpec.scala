package graft

import graft.operators.{OpqRotation, PqIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OPQ rotation: linear-algebra kernel correctness (Jacobi eigen,
  * Procrustes recovery), orthogonality and cosine-preservation of the
  * fitted rotation, and the headline claim — on cross-sub-space-correlated
  * data, the learned rotation cuts PQ quantization error well below plain
  * PQ at the identical code budget, without changing index semantics. */
class OpqSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def maxAbs(a: Array[Double]): Double = a.map(math.abs).max

  private def matMulT(r: Array[Double], d: Int): Array[Double] = {
    // RᵀR − I, flattened
    val out = new Array[Double](d * d)
    for (i <- 0 until d; j <- 0 until d) {
      var s = 0.0
      var k = 0
      while (k < d) { s += r(k * d + i) * r(k * d + j); k += 1 }
      out(i * d + j) = s - (if (i == j) 1.0 else 0.0)
    }
    out
  }

  test("jacobiEigen reconstructs a symmetric matrix") {
    val rnd = new scala.util.Random(3)
    val d = 12
    val bm = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val x = rnd.nextDouble() * 2 - 1
      bm(i)(j) = x; bm(j)(i) = x
    }
    val (v, lam) = OpqRotation.jacobiEigen(bm)
    // V diag(λ) Vᵀ == B
    for (i <- 0 until d; j <- 0 until d) {
      var s = 0.0
      for (k <- 0 until d) s += v(i)(k) * lam(k) * v(j)(k)
      assert(math.abs(s - bm(i)(j)) < 1e-9, s"B[$i][$j]")
    }
  }

  test("Procrustes recovers a known rotation exactly") {
    val rnd = new scala.util.Random(5)
    val d = 8
    // orthogonal Q = eigenvectors of a random symmetric matrix
    val sym = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val x = rnd.nextDouble(); sym(i)(j) = x; sym(j)(i) = x
    }
    val q = OpqRotation.jacobiEigen(sym)._1 // columns orthonormal
    // full-rank X; Ŷ = Q·X exactly → argmin ||R X − Ŷ|| is R = Q
    val n = 40
    val xs = Array.fill(n)(Array.fill(d)(rnd.nextDouble() * 2 - 1))
    val mMat = Array.ofDim[Double](d, d)
    for (x <- xs) {
      val y: Array[Double] = Array.tabulate(d) { i =>
        var s = 0.0
        for (k <- 0 until d) s += q(i)(k) * x(k)
        s
      }
      for (ai <- 0 until d; bj <- 0 until d) mMat(ai)(bj) += x(ai) * y(bj)
    }
    val r = OpqRotation.procrustes(mMat)
    for (i <- 0 until d; j <- 0 until d)
      assert(math.abs(r(i)(j) - q(i)(j)) < 1e-8, s"R[$i][$j]")
  }

  // Deterministic anisotropic corpus: TWO independent high-variance
  // directions both living in the FIRST PQ sub-space (dims 0 and 1),
  // noise elsewhere — the canonical OPQ case. Plain PQ's first
  // sub-quantizer must tile a 2-D square with its k codes (error ~square
  // side² / k) while the other sub-quantizer encodes near-zeros; the
  // optimal rotation routes one direction into each sub-space, so each
  // quantizes a 1-D range with all k codes.
  private def anisotropic(n: Int, d: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(17)
    (0 until n).map { i =>
      val t1 = rnd.nextDouble() * 20 - 10
      val t2 = rnd.nextDouble() * 20 - 10
      val v = Array.fill(d)(rnd.nextDouble() * 0.05)
      v(0) += t1
      v(1) += t2
      (i.toLong, v.toSeq)
    }
  }

  test("fitted rotation is orthogonal and beats plain PQ distortion 2x+") {
    val d = 16
    val df = anisotropic(600, d).toDF("vec_id", "v")
    val m = 2; val k = 8
    val r = OpqRotation.fit(df, m = m, kCodes = k, iters = 6)
    assert(maxAbs(matMulT(r, d)) < 1e-8, "RᵀR != I")
    val base = OpqRotation.quantizationError(
      df, OpqRotation.identityRotation(d), m = m, kCodes = k)
    val opt = OpqRotation.quantizationError(df, r, m = m, kCodes = k)
    assert(opt * 2 < base,
      s"OPQ should at least halve distortion here: base=$base opq=$opt")
  }

  test("rotation preserves cosines through the MatVec kernel") {
    val d = 16
    val df = anisotropic(100, d).toDF("vec_id", "v")
    val r = OpqRotation.fit(df, m = 2, kCodes = 8, iters = 3)
    val rot = df.select(col("vec_id"),
      OpqRotation.rotate(col("v"), r, d).as("v"))
    val raw = df.as[(Long, Seq[Double])].collect().toMap
    val rotm = rot.as[(Long, Seq[Double])].collect().toMap
    def dot(a: Seq[Double], b: Seq[Double]) = a.zip(b).map(p => p._1 * p._2).sum
    for (i <- 0L to 20L; j <- 21L to 40L) {
      val dRaw = dot(raw(i), raw(j))
      val dRot = dot(rotm(i), rotm(j))
      assert(math.abs(dRaw - dRot) < 1e-9 * math.max(1.0, math.abs(dRaw)),
        s"dot($i,$j) raw=$dRaw rot=$dRot")
    }
  }

  test("PqIndex over the rotated corpus: exact rerank equals raw-space cosines") {
    val d = 16
    val df = anisotropic(300, d).toDF("vec_id", "v")
    val r = OpqRotation.fit(df, m = 2, kCodes = 8, iters = 4)
    val rot = df.select(col("vec_id"),
      OpqRotation.rotate(col("v"), r, d).as("v"))
    val idx = PqIndex.build(rot, m = 2, kCodes = 8, coarseK = 4)
    val q = rot.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val got = PqIndex.adcProbe(idx, q, nProbe = 2, topK = 5, rerank = 20)
      .select("q_id", "n_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val raw = df.as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val num = a.zip(b).map(p => p._1 * p._2).sum
      num / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    got.foreach { case (qi, ni, c) =>
      assert(math.abs(c - cos(raw(qi), raw(ni))) < 1e-9,
        s"rotated-index cosine must equal raw-space cosine for ($qi,$ni)")
    }
  }
}
