package graft

import org.scalatest.funsuite.AnyFunSuite

/** IVF has no SQL oracle (k-means); its correctness claim is recall against
  * the brute-force scan on the same data. */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def topk(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, sfDir)
      .select("q_id", "n_id").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

  test("ann_ivf_kmeans recall@5 vs brute force is >= 0.5 with 2/8 probes") {
    val exact = topk("ann_cosine_topk")
    val ivf = topk("ann_ivf_kmeans")
    assert(ivf.keySet == exact.keySet)
    val recalls = exact.map { case (q, truth) =>
      ivf(q).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // probing 2 of 8 cells scans ~25% of candidates; embeddings cluster by
    // label so recall should be well above that floor
    assert(mean >= 0.5, s"mean recall $mean, per-query $recalls")
  }
}
