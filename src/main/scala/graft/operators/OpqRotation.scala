package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Optimized Product Quantization (OPQ, Ge et al., CVPR 2013 — public
  * literature): learn an orthogonal rotation R that aligns the data to the
  * product quantizer's sub-space grid, so the m independent codebooks stop
  * wasting entropy on correlated / badly-scaled dimensions. Plain PQ cuts
  * the space into m fixed coordinate blocks; when variance is concentrated
  * in a few dimensions (always true of learned embeddings), whole
  * sub-quantizers encode near-constant blocks while others are starved. The
  * rotation balances variance across blocks — the measured effect here is a
  * multiple-times-lower quantization error at identical code budget
  * (OpqSpec pins it).
  *
  * Factoring: the rotation lives OUTSIDE the index, as a corpus transform.
  * Because R is orthogonal, norms and dot products — hence cosines — are
  * EXACTLY preserved (up to float ulps), so a [[PqIndex]]/[[IvfIndex]]
  * built over the rotated corpus has unchanged semantics: identical exact
  * rerank, identical recall accounting, every existing maintenance path
  * (append / split / remove / drift) untouched. Queries are rotated by the
  * same R before probing. This is the Spark-first decomposition — one new
  * codegen'd kernel ([[graft.exprs.MatVec]]) and zero changes to the index
  * machinery.
  *
  * Training (OPQ-NP, the non-parametric variant): alternate
  *   (1) fit per-sub-space codebooks on the rotated sample (the same
  *       deterministic Lloyd used by [[PqIndex]]),
  *   (2) given the codes' reconstructions Ŷ, solve the orthogonal
  *       Procrustes problem min_R ||R·X − Ŷ||_F — closed form R = V·Uᵀ
  *       from the SVD of M = X·Ŷᵀ.
  * Everything runs driver-side on the same bounded sample contract as the
  * quantizer fits (≤ trainTarget rows regardless of corpus size); the SVD
  * is a d×d problem solved by cyclic Jacobi eigendecomposition of MᵀM —
  * deterministic (fixed sweep order, index tiebreaks), no external linear
  * algebra dependency. Applying R corpus-wide is one codegen'd mat-vec
  * pass: d² flops per row, no shuffle.
  */
object OpqRotation {

  /** Fit the OPQ rotation on a bounded sample of `emb` (columns: idCol for
    * the deterministic sample order, vCol = array<double>). Returns R as a
    * flat row-major d×d matrix: rotated = R · v. */
  def fit(
      emb: DataFrame,
      idCol: String = "vec_id",
      vCol: String = "v",
      m: Int = 8,
      kCodes: Int = 16,
      iters: Int = 6,
      lloydIters: Int = 5,
      trainTarget: Int = 4096,
      seed: Long = 42L): Array[Double] = {
    val rows = sampleRows(emb, idCol, vCol, m, trainTarget, seed)
    val d = rows.head.length
    val dsub = d / m

    // Identity is a FIXED POINT of the NP alternation (with R = I and
    // codebooks fit on X, M = Σ x·x̂ᵀ is ≈ symmetric PSD, whose Procrustes
    // factor is I again) — so init with the PARAMETRIC solution (Ge et
    // al. §4, "eigenvalue allocation"): rotate into the PCA basis and
    // deal principal directions across sub-spaces so each sub-quantizer
    // receives a balanced share of the variance. The NP iterations then
    // refine from a non-degenerate starting point.
    var r = eigenAllocationInit(rows, d, m, dsub)
    var bestR = r
    var bestErr = Double.MaxValue
    var it = 0
    while (it < iters) {
      val y = rows.map(x => applyMat(r, x))
      val codebooks = fitCodebooksOn(y, m, dsub, kCodes, lloydIters)
      val yhat = y.map(encodeDecode(_, codebooks, dsub))
      // distortion under the CURRENT (R, codebooks); keep the best pair's R
      var err = 0.0
      var i = 0
      while (i < y.length) {
        var j = 0
        while (j < d) {
          val e = y(i)(j) - yhat(i)(j); err += e * e; j += 1
        }
        i += 1
      }
      if (err < bestErr) { bestErr = err; bestR = r }
      // Procrustes update: M = Σ_i x_i · ŷ_iᵀ, R = V·Uᵀ of M's SVD.
      // Skipped on the last iteration — the updated R would never be
      // evaluated against codebooks nor eligible for bestR, so the M
      // accumulation + SVD would be pure waste.
      if (it < iters - 1) {
        val mMat = Array.ofDim[Double](d, d)
        i = 0
        while (i < rows.length) {
          val x = rows(i); val yh = yhat(i)
          var a = 0
          while (a < d) {
            val xa = x(a)
            if (xa != 0.0) {
              var b = 0
              while (b < d) { mMat(a)(b) += xa * yh(b); b += 1 }
            }
            a += 1
          }
          i += 1
        }
        r = flatten(procrustes(mMat))
      }
      it += 1
    }
    bestR
  }

  /** Shared bounded-sample collection for [[fit]]/[[quantizationError]] —
    * ONE place for the determinism (sorted by id) and the guards. */
  private def sampleRows(emb: DataFrame, idCol: String, vCol: String,
      m: Int, trainTarget: Int, seed: Long): Array[Array[Double]] = {
    val n = emb.count()
    val sample =
      if (n <= trainTarget) emb
      else emb.sample(withReplacement = false, trainTarget.toDouble / n, seed)
    val rows = sample.select(col(idCol), col(vCol)).collect()
      .sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray)
    require(rows.nonEmpty, "OPQ needs a non-empty sample")
    require(rows.head.length % m == 0,
      s"dim ${rows.head.length} not divisible by m=$m")
    rows
  }

  private def fitCodebooksOn(y: Array[Array[Double]], m: Int, dsub: Int,
      kCodes: Int, lloydIters: Int): Array[Array[Array[Double]]] =
    (0 until m).map { sub =>
      PqIndex.fitLloyd(y.map(v =>
        java.util.Arrays.copyOfRange(v, sub * dsub, (sub + 1) * dsub)),
        kCodes, lloydIters)
    }.toArray

  /** Rotate an array<double> column by a fitted R (codegen'd kernel). */
  def rotate(v: Column, r: Array[Double], d: Int): Column =
    graft.exprs.functions.mat_vec(v, r, d, d)

  /** Mean squared PQ reconstruction error of the rotated sample under
    * freshly-fitted codebooks — the comparable quantization-quality
    * number for a candidate rotation (R = identity gives plain PQ's).
    * Same bounded-sample / deterministic-fit contract as [[fit]]. */
  def quantizationError(
      emb: DataFrame,
      r: Array[Double],
      idCol: String = "vec_id",
      vCol: String = "v",
      m: Int = 8,
      kCodes: Int = 16,
      lloydIters: Int = 5,
      trainTarget: Int = 4096,
      seed: Long = 42L): Double = {
    val rows = sampleRows(emb, idCol, vCol, m, trainTarget, seed)
    val d = rows.head.length
    val dsub = d / m
    val y = rows.map(x => applyMat(r, x))
    val codebooks = fitCodebooksOn(y, m, dsub, kCodes, lloydIters)
    var err = 0.0
    var i = 0
    while (i < y.length) {
      val yh = encodeDecode(y(i), codebooks, dsub)
      var j = 0
      while (j < d) { val e = y(i)(j) - yh(j); err += e * e; j += 1 }
      i += 1
    }
    err / y.length
  }

  /** The d×d identity as a flat rotation (plain PQ's frame). */
  def identityRotation(d: Int): Array[Double] = identity(d)

  /** Driver-side rotate for query vectors. */
  def applyMat(rFlat: Array[Double], v: Array[Double]): Array[Double] = {
    val d = v.length
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      var s = 0.0
      var j = 0
      val base = i * d
      while (j < d) { s += rFlat(base + j) * v(j); j += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  /** Parametric OPQ init: PCA basis with principal directions dealt
    * greedily across the m sub-spaces balancing per-sub log-variance
    * products (Ge et al. 2013 §4). Rows of the returned flat matrix are
    * the reordered eigenvectors, so it is exactly orthogonal. */
  private def eigenAllocationInit(
      rows: Array[Array[Double]], d: Int, m: Int, dsub: Int): Array[Double] = {
    val mean = new Array[Double](d)
    for (x <- rows; i <- 0 until d) mean(i) += x(i) / rows.length
    val cov = Array.ofDim[Double](d, d)
    for (x <- rows) {
      var i = 0
      while (i < d) {
        val xi = x(i) - mean(i)
        var j = i
        while (j < d) { cov(i)(j) += xi * (x(j) - mean(j)); j += 1 }
        i += 1
      }
    }
    for (i <- 0 until d; j <- i until d) {
      cov(i)(j) /= rows.length
      cov(j)(i) = cov(i)(j)
    }
    val (v, lam) = jacobiEigen(cov)
    val order = (0 until d).sortBy(j => (-lam(j), j))
    // greedy balanced allocation of Π λ per sub-space (sum of logs)
    val binLog = new Array[Double](m)
    val binFill = new Array[Int](m)
    val slotOf = new Array[Int](d) // eigen rank -> output row index
    for (rank <- 0 until d) {
      var best = -1
      var bestLog = Double.MaxValue
      for (b <- 0 until m if binFill(b) < dsub)
        if (binLog(b) < bestLog) { bestLog = binLog(b); best = b }
      slotOf(rank) = best * dsub + binFill(best)
      binFill(best) += 1
      binLog(best) += math.log(math.max(lam(order(rank)), 1e-12))
    }
    val r = new Array[Double](d * d)
    for (rank <- 0 until d) {
      val src = order(rank)
      val row = slotOf(rank)
      var i = 0
      while (i < d) { r(row * d + i) = v(i)(src); i += 1 }
    }
    r
  }

  private def identity(d: Int): Array[Double] = {
    val r = new Array[Double](d * d)
    var i = 0
    while (i < d) { r(i * d + i) = 1.0; i += 1 }
    r
  }

  private def flatten(a: Array[Array[Double]]): Array[Double] = {
    val d = a.length
    val out = new Array[Double](d * d)
    var i = 0
    while (i < d) { System.arraycopy(a(i), 0, out, i * d, d); i += 1 }
    out
  }

  /** Encode y against per-sub codebooks (argmin, ties to the lowest code —
    * the [[graft.exprs.VectorOps.pqEncode]] tie-break) and decode back. */
  private def encodeDecode(
      y: Array[Double], cbs: Array[Array[Array[Double]]], dsub: Int): Array[Double] = {
    val m = cbs.length
    val out = new Array[Double](y.length)
    var sub = 0
    while (sub < m) {
      val cb = cbs(sub)
      var best = 0
      var bestD = Double.MaxValue
      var code = 0
      while (code < cb.length) {
        val c = cb(code)
        var s = 0.0
        var t = 0
        while (t < dsub) {
          val diff = y(sub * dsub + t) - c(t); s += diff * diff; t += 1
        }
        if (s < bestD) { bestD = s; best = code }
        code += 1
      }
      System.arraycopy(cb(best), 0, out, sub * dsub, dsub)
      sub += 1
    }
    out
  }

  /** Orthogonal Procrustes: the orthogonal R maximizing tr(R·M), i.e.
    * R = V·Uᵀ for M = U·S·Vᵀ. SVD via cyclic Jacobi on MᵀM (deterministic);
    * zero-σ directions are completed to an orthonormal U by Gram–Schmidt
    * over the standard basis, so R stays exactly orthogonal even on
    * rank-deficient inputs. */
  private[graft] def procrustes(mMat: Array[Array[Double]]): Array[Array[Double]] = {
    val d = mMat.length
    // B = MᵀM
    val b = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- 0 until d) {
      var s = 0.0
      var k = 0
      while (k < d) { s += mMat(k)(i) * mMat(k)(j); k += 1 }
      b(i)(j) = s
    }
    val (v, lam) = jacobiEigen(b)
    // sort eigenpairs by eigenvalue desc (index asc tiebreak) — determinism
    val order = (0 until d).sortBy(j => (-lam(j), j))
    val sigma = order.map(j => math.sqrt(math.max(lam(j), 0.0))).toArray
    val vCols = order.map(j => Array.tabulate(d)(i => v(i)(j))).toArray
    // U by MODIFIED Gram–Schmidt over the M·V_j candidates: dividing by a
    // tiny σ would admit a numerically non-orthogonal column (rank-deficient
    // M is the NORM for low-rank-structured data — exactly the corpora OPQ
    // helps most), so each candidate is orthogonalized against the accepted
    // columns and kept only if enough independent mass remains. Deficient
    // directions fall through to standard-basis completion below; for
    // degenerate/zero σ any orthonormal basis of the subspace is a valid
    // SVD pairing, so Procrustes optimality is preserved.
    val sigMax = math.max(sigma.headOption.getOrElse(0.0), 1e-300)
    val uCols = Array.ofDim[Double](d, d)
    val accepted = new Array[Boolean](d) // slot k holds a sound u_k
    def projectOut(w: Array[Double]): Double = {
      var k = 0
      while (k < d) {
        if (accepted(k)) {
          var dot = 0.0
          var i = 0
          while (i < d) { dot += w(i) * uCols(k)(i); i += 1 }
          i = 0
          while (i < d) { w(i) -= dot * uCols(k)(i); i += 1 }
        }
        k += 1
      }
      var nrm = 0.0
      var i = 0
      while (i < d) { nrm += w(i) * w(i); i += 1 }
      math.sqrt(nrm)
    }
    var k0 = 0
    while (k0 < d) {
      if (sigma(k0) > 1e-9 * sigMax) {
        val w = new Array[Double](d)
        var i = 0
        while (i < d) {
          var s = 0.0
          var k = 0
          while (k < d) { s += mMat(i)(k) * vCols(k0)(k); k += 1 }
          w(i) = s / sigma(k0)
          i += 1
        }
        val nrm = projectOut(w)
        if (nrm > 0.5) { // a sound column keeps ~unit norm after projection
          i = 0
          while (i < d) { uCols(k0)(i) = w(i) / nrm; i += 1 }
          accepted(k0) = true
        }
      }
      k0 += 1
    }
    // deficient slots: any orthonormal completion is a valid SVD pairing
    // there (σ ≈ 0 contributes nothing to tr(R·M)) — Gram–Schmidt e_0..e_d
    var cand = 0
    var k1 = 0
    while (k1 < d) {
      if (!accepted(k1)) {
        var done = false
        while (!done && cand < d) {
          val w = new Array[Double](d)
          w(cand) = 1.0
          cand += 1
          val nrm = projectOut(w)
          if (nrm > 1e-8) {
            var i = 0
            while (i < d) { uCols(k1)(i) = w(i) / nrm; i += 1 }
            accepted(k1) = true
            done = true
          }
        }
        require(done, "Gram–Schmidt completion failed")
      }
      k1 += 1
    }
    // R = V·Uᵀ: R(i)(j) = Σ_k vCols(k)(i) * uCols(k)(j)
    val r = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- 0 until d) {
      var s = 0.0
      var k = 0
      while (k < d) { s += vCols(k)(i) * uCols(k)(j); k += 1 }
      r(i)(j) = s
    }
    r
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (V, λ) with columns of V the eigenvectors. Fixed sweep order and a
    * fixed convergence budget keep it deterministic. */
  private[graft] def jacobiEigen(
      b0: Array[Array[Double]]): (Array[Array[Double]], Array[Double]) = {
    val d = b0.length
    val a = b0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      for (p <- 0 until d; q <- p + 1 until d) s += a(p)(q) * a(p)(q)
      s
    }
    var norm = 0.0
    for (p <- 0 until d; q <- 0 until d) norm += a(p)(q) * a(p)(q)
    val tol = 1e-24 * math.max(norm, 1e-300)
    var sweep = 0
    while (sweep < 64 && off() > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (v, Array.tabulate(d)(i => a(i)(i)))
  }
}
