package graft

import org.scalatest.funsuite.AnyFunSuite

/** text_hash_embed / ann_text_topk: the hashing-trick featurizer and the
  * model-free text similarity search built on it. Both have full DuckDB
  * oracles; this spec pins the semantics against an independent driver-side
  * recompute (different code path: JVM MessageDigest + plain loops vs the
  * Catalyst md5/conv/dot pipeline) so an engine-plus-oracle twin bug can't
  * hide. */
class HashEmbedSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Reference featurizer: token → first md5 hex digit → count → L2 norm.
    * Same left-assoc fold order as the engine, so doubles match bitwise.
    * split limit -1 keeps trailing empty tokens — the engine's Spark
    * `split` and the oracle's `string_split_regex` both do. */
  private def embed(text: String): Array[Double] = {
    val counts = new Array[Double](16)
    text.split("\\s+", -1).foreach { tok =>
      counts(Integer.parseInt(md5Hex(tok).substring(0, 1), 16)) += 1.0
    }
    var ss = 0.0
    counts.foreach(c => ss += c * c)
    val nrm = math.sqrt(ss)
    counts.map(_ / nrm)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  // null-text docs are out of scope by the same filter the engine applies
  private lazy val docs: Map[Long, String] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").where("text IS NOT NULL").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("text_hash_embed matches the driver-side recompute bit-for-bit") {
    val got = SparkEntry.queries("text_hash_embed")(spark, sfDir).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val emb = (0 until 16).map(i => r.getDouble(1 + i)).toArray
      val want = embed(docs(id))
      assert(emb.sameElements(want),
        s"doc $id: ${emb.toSeq} vs ${want.toSeq}")
      val n = math.sqrt(emb.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"doc $id not unit-norm: $n")
    }
  }

  test("ann_text_topk is the brute-force cosine top-5 over hash embeddings") {
    val embs = docs.view.mapValues(embed).toMap
    val expected = embs.keys.filter(_ < 5).map { q =>
      val qv = embs(q)
      val ranked = embs.toSeq.filter(_._1 != q)
        .map { case (n, nv) => (n, dot(qv, nv)) }
        .sortBy { case (n, c) => (-c, n) }
        .take(5).map(_._1)
      q -> ranked
    }.toMap
    val got = SparkEntry.queries("ann_text_topk")(spark, sfDir)
      .select("q_id", "rank", "n_id", "cosine").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (q, want) =>
      assert(got(q) == want, s"query $q: got ${got(q)}, want $want")
    }
  }
}
