package graft

import graft.exprs.functions.misra_gries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries heavy-hitter aggregate: the survivor guarantee (the
  * property the text_heavy_hitters oracle gate rests on), the merge path
  * across partitions, and the exactness of candidate+recount. */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def candidates(items: Seq[String], capacity: Int, parts: Int): Set[String] =
    spark.createDataset(items).repartition(parts).toDF("t")
      .agg(misra_gries(col("t"), capacity).as("c"))
      .select(explode(col("c"))).as[String].collect().toSet

  test("survivor guarantee: freq > n/(capacity+1) always present") {
    // 3 heavy items drowned in a long distinct tail, tiny capacity,
    // many partitions → maximal compression pressure on the buffer.
    val heavy = Seq.fill(300)("alpha") ++ Seq.fill(200)("beta") ++
      Seq.fill(150)("gamma")
    val tail = (0 until 1000).map(i => s"tail$i")
    val items = new scala.util.Random(7).shuffle(heavy ++ tail)
    val n = items.size // 1650
    for (capacity <- Seq(8, 16, 64); parts <- Seq(1, 4)) {
      val c = candidates(items, capacity, parts)
      val bound = n.toDouble / (capacity + 1)
      val mustSurvive = Seq("alpha", "beta", "gamma")
        .filter(h => items.count(_ == h) > bound)
      assert(mustSurvive.forall(c.contains),
        s"capacity=$capacity parts=$parts lost ${mustSurvive.filterNot(c.contains)}")
      assert(c.size <= capacity)
    }
  }

  test("candidate + exact recount equals the full aggregation") {
    val rnd = new scala.util.Random(13)
    // zipfish corpus: token i appears ~1000/(i+1) times
    val items = (0 until 200).flatMap(i => Seq.fill(1000 / (i + 1))(s"w$i"))
    val shuffled = rnd.shuffle(items)
    val df = spark.createDataset(shuffled).toDF("token").repartition(8)
    val n = shuffled.size.toLong
    val divisor = 64L // report tokens with cnt*64 > n
    val cands = df.agg(misra_gries(col("token"), 256).as("c"))
      .select(explode(col("c")).as("token"))
    val got = df.join(broadcast(cands), "token")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * divisor > n)
      .as[(String, Long)].collect().toMap
    val want = shuffled.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * divisor > n }.toMap
    assert(got === want)
  }

  test("nulls are ignored; empty input yields empty candidates") {
    val df = Seq(Some("x"), None, Some("x"), None).toDF("t")
    val c = df.agg(misra_gries(col("t"), 4).as("c"))
      .select(explode(col("c"))).as[String].collect().toSet
    assert(c === Set("x"))
    val empty = spark.emptyDataset[String].toDF("t")
      .agg(misra_gries(col("t"), 4).as("c"))
      .select(size(col("c"))).as[Int].collect()
    assert(empty.toSeq === Seq(0))
  }
}
