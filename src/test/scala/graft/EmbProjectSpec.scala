package graft

import graft.queries.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Empirical Johnson–Lindenstrauss check for emb_project: the 64→8
  * Rademacher projection must roughly preserve pairwise cosine geometry
  * (the property ANN pre-reduction relies on). The DuckDB oracle pins
  * bit-exactness; this pins that the matrix actually projects (k=8 ⇒
  * per-pair noise ~1/√8, so bounds are loose but falsifiable: a broken
  * matrix — all-ones, transposed indexing, unscaled — fails them).
  */
class EmbProjectSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var (d, na, nb) = (0.0, 0.0, 0.0)
    var i = 0
    while (i < a.length) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    d / math.sqrt(na * nb)
  }

  test("projection preserves pairwise cosine within JL noise") {
    val orig = loadEmbeddings()
    val proj = Similarity.queries("emb_project")(spark, dir)
      .collect().map { r =>
        r.getLong(0) -> (1 until 9).map(r.getDouble).toArray
      }.toMap
    assert(proj.size === orig.size, "one projected row per embedding")
    val ids = orig.keys.toArray.sorted.take(60)
    val errs = ids.grouped(2).collect { case Array(a, b) =>
      math.abs(cos(orig(a), orig(b)) - cos(proj(a), proj(b)))
    }.toArray
    val mean = errs.sum / errs.length
    assert(mean < 0.30, f"mean |Δcos| $mean%.3f exceeds JL noise bound")
    assert(errs.max < 0.95, "no pair may be fully scrambled")
  }

  test("projection norms carry the 1/√k scaling (not an unscaled fold)") {
    val orig = loadEmbeddings()
    val proj = Similarity.queries("emb_project")(spark, dir)
      .collect().map { r =>
        r.getLong(0) -> (1 until 9).map(r.getDouble).toArray
      }.toMap
    def n2(v: Array[Double]) = v.map(x => x * x).sum
    // E[‖Px‖²] = ‖x‖² under 1/√k scaling; the sample mean ratio must sit
    // near 1 (an unscaled Rademacher fold would sit near k=8)
    val ratios = orig.keys.toSeq.sorted.take(50)
      .map(id => n2(proj(id)) / n2(orig(id)))
    val mean = ratios.sum / ratios.length
    assert(mean > 0.5 && mean < 2.0, f"norm ratio $mean%.3f is off 1±ε")
  }

  private def loadEmbeddings(): Map[Long, Array[Double]] =
    graft.util.Tables(spark, dir, "embeddings")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
}
