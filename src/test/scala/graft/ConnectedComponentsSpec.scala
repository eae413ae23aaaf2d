package graft

import graft.operators.ConnectedComponents
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial graph shapes for the CC operator under dedup_clusters: a
  * long chain (worst case for label propagation — the min label travels
  * one hop per round), a star, two cliques bridged by one edge, and
  * isolated vertices. */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def cc(
      vs: Seq[Long], es: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents
      .run(vs.toDF("v"), es.toDF("a", "b"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a 12-node chain collapses to its minimum") {
    val got = cc((1L to 12L), (1L to 11L).map(i => (i, i + 1)))
    assert(got === (1L to 12L).map(_ -> 1L).toMap)
  }

  test("chain labeled against the propagation direction still converges") {
    // min at the END of the chain: 12-11-…-1 with ids reversed so the
    // small label must travel the full length
    val got = cc((1L to 12L), (1L to 11L).map(i => (13L - i, 12L - i)))
    assert(got.values.toSet === Set(1L))
  }

  test("star, bridged cliques, and singletons") {
    val star = (2L to 6L).map(i => (1L, i))
    val cliqueA = for (i <- 10L to 13L; j <- (i + 1) to 13L) yield (i, j)
    val cliqueB = for (i <- 20L to 23L; j <- (i + 1) to 23L) yield (i, j)
    val bridge = Seq((13L, 20L))
    val vs = (1L to 6L) ++ (10L to 13L) ++ (20L to 23L) ++ Seq(40L, 41L)
    val got = cc(vs, star ++ cliqueA ++ cliqueB ++ bridge)
    assert((2L to 6L).forall(got(_) === 1L))
    assert(((10L to 13L) ++ (20L to 23L)).forall(got(_) === 10L))
    assert(got(40L) === 40L && got(41L) === 41L) // singletons keep their id
  }

  test("non-convergence within the cap is an error, not a wrong answer") {
    intercept[IllegalArgumentException] {
      cc((1L to 12L), (1L to 11L).map(i => (13L - i, 12L - i)), maxIter = 3)
    }
  }

  test("random graphs match a union-find reference") {
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { _ =>
      val n = 5 + rnd.nextInt(40)
      val vs = (1L to n.toLong)
      val es = Seq.fill(rnd.nextInt(2 * n))(
        (1L + rnd.nextInt(n), 1L + rnd.nextInt(n)))
        .filter { case (a, b) => a != b }
      // driver-side union-find as the independent reference
      val parent = Array.tabulate(n + 1)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val p = parent(c); parent(c) = r; c = p }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = vs.map(v => v -> {
        // component id = min member; find() roots at the min because unions
        // always attach the larger root under the smaller
        find(v.toInt).toLong
      }).toMap
      assert(cc(vs, es) === want, s"n=$n edges=$es")
    }
  }
}
