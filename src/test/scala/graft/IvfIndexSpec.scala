package graft

import graft.operators.IvfIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted-IVF lifecycle: build → save → load round-trips the quantizer
  * and the cell-partitioned lists; an exhaustive probe (nProbe = k) must
  * equal brute force exactly; a selective probe must prune partitions at
  * the scan (the property that makes probes O(nProbe/k) of the data).
  */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def emb = graft.util.Tables(spark, dir, "embeddings")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private lazy val saved: (IvfIndex, String) = {
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-ivfspec").toString
    IvfIndex.build(emb, k = 8).save(idxDir)
    (IvfIndex.load(spark, idxDir), idxDir)
  }

  test("save/load round-trips centroids and the partitioned lists") {
    val (idx, idxDir) = saved
    assert(idx.k === 8)
    assert(idx.centroids.forall(_.length === 64))
    assert(idx.assignments.count() === emb.count())
    val cellDirs = new java.io.File(s"$idxDir/cells")
      .listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.length === idx.assignments
      .select("cell").distinct().count().toInt,
      "one partition directory per occupied cell")
  }

  test("exhaustive probe equals brute force exactly") {
    val (idx, _) = saved
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val got = IvfIndex.probe(idx, q, nProbe = idx.k, topK = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

    val all = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    (0L until 3L).foreach { qid =>
      val brute = all.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(all(qid), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
      assert(got(qid) === brute, s"query $qid full probe != brute force")
    }
  }

  test("selective probe prunes unprobed cells at the scan") {
    val (idx, _) = saved
    val q = emb.filter(col("vec_id") < 1)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val probed = IvfIndex.probe(idx, q, nProbe = 1, topK = 5)
    val scans = probed.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("cells"))
    assert(scans.nonEmpty)
    assert(scans.exists(s =>
      s.contains("PartitionFilters") && s.contains("cell")),
      s"cell filter must reach PartitionFilters:\n${scans.mkString("\n")}")
  }

  test("probeFiltered: results ⊆ allowed; exhaustive = filtered brute force; selective nProbe keeps the filter and prunes") {
    val s = spark
    import s.implicits._
    val (idx, _) = saved
    val all = graft.util.Tables(spark, dir, "embeddings")
    val allowedIds = all.filter(col("label") % 2 === 0)
      .select("vec_id").as[Long].collect().toSet
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val allowed = all.filter(col("label") % 2 === 0).select("vec_id")

    // exhaustive: exactly the filtered brute force, bit for bit
    val got = IvfIndex.probeFiltered(idx, q, allowed, nProbe = idx.k, topK = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3)).toSeq
    val brute = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
      emb.withColumn("nrm", graft.queries.Similarity.norm(col("v")))
        .filter(col("vec_id").isin(allowedIds.toSeq: _*))
        .select(col("vec_id").as("n_id"), col("v").as("nv"), col("nrm"))
        .crossJoin(broadcast(q.withColumn("qnrm",
          graft.queries.Similarity.norm(col("qv")))))
        .filter(col("n_id") =!= col("q_id"))
        .withColumn("cosine", graft.queries.Similarity.cosinePre(
          col("qv"), col("nv"), col("qnrm"), col("nrm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("q_id", "n_id", "rank", "cosine")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._3)).toSeq
    }
    assert(got === brute,
      "exhaustive filtered probe must BE the filtered brute force")
    assert(got.forall(t => allowedIds.contains(t._2)),
      "no result may escape the predicate")

    // selective probes: still only allowed ids, full topK per query
    // (post-filter-then-rank — selectivity can't starve the answer),
    // recall vs the filtered truth at the usual nProbe floor
    val sel = IvfIndex.probeFiltered(idx, q, allowed, nProbe = 2, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sel.forall(t => allowedIds.contains(t._2)))
    assert(sel.groupBy(_._1).forall(_._2.length == 5),
      "each query keeps a full topK after the filter")
    val truth = brute.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recall = sel.groupBy(_._1).map { case (qid, rows) =>
      rows.map(_._2).toSet.intersect(truth(qid)).size.toDouble / 5.0
    }
    assert(recall.sum / recall.size >= 0.4,
      s"filtered selective-probe recall floor: $recall")
  }

  test("appendVectors: upsert without refit; exhaustive probe = brute force over the union") {
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-ivfupsert").toString
    IvfIndex.build(half, k = 8).save(idxDir)

    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    def answers(): Map[Long, Seq[Long]] =
      IvfIndex.probe(IvfIndex.load(spark, idxDir), q,
        nProbe = 8, topK = 5).collect()
        .map(r => (r.getLong(0), r.getInt(2), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val before = answers()

    assert(IvfIndex.appendVectors(spark, idxDir, rest) === rest.count())
    val after = answers()

    // upserted rows are probable: exhaustive probe over the UNION equals
    // driver brute force over the union (quantizer geometry unchanged)
    val all = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    (0L until 3L).foreach { qid =>
      val brute = all.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(all(qid), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
      assert(after(qid) === brute, s"query $qid after upsert")
    }
    // and the upsert is append-only: the old half's rows are intact
    assert(IvfIndex.load(spark, idxDir).assignments.count() === emb.count())
    assert(before.keySet === after.keySet)
  }

  test("compact rewrites upserted cells to one file each; answers unchanged") {
    val part = (m: Int) => emb.filter(col("vec_id") % 3 === m)
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-ivfcompact").toString
    IvfIndex.build(part(0), k = 8).save(idxDir)
    IvfIndex.appendVectors(spark, idxDir, part(1))
    IvfIndex.appendVectors(spark, idxDir, part(2))

    def cellFiles(): Map[String, Int] =
      new java.io.File(s"$idxDir/cells").listFiles()
        .filter(_.getName.startsWith("cell="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    assert(cellFiles().values.exists(_ > 1),
      "two upserts must leave multi-file cells for the test to mean anything")

    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    def answers(): Seq[(Long, Int, Long)] =
      IvfIndex.probe(IvfIndex.load(spark, idxDir), q, nProbe = 8, topK = 5)
        .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1))).toSeq
        .sorted
    val before = answers()
    val nBefore = IvfIndex.load(spark, idxDir).assignments.count()

    IvfIndex.compact(spark, idxDir)
    assert(cellFiles().values.forall(_ == 1),
      s"every cell must compact to one file: ${cellFiles()}")
    assert(!new java.io.File(s"$idxDir/cells.old").exists(),
      "the pre-rewrite copy must be cleaned up")
    assert(IvfIndex.load(spark, idxDir).assignments.count() === nBefore)
    assert(answers() === before)
  }

  test("a swap torn between renames: readers fall back read-only, maintenance heals") {
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-ivftorn").toString
    IvfIndex.build(emb.filter(col("vec_id") < 100), k = 4).save(idxDir)
    val before = IvfIndex.load(spark, idxDir).assignments.count()
    // simulate a compact that died between the two renames: cells moved
    // to cells.old, the staged copy never landed
    java.nio.file.Files.move(
      java.nio.file.Paths.get(idxDir, "cells"),
      java.nio.file.Paths.get(idxDir, "cells.old"))
    // a plain READER must not mutate swap state (it could be racing a
    // live compact's rename pair): it reads the intact pre-swap data
    // through the .old fallback and leaves the dirs alone
    val reader = IvfIndex.load(spark, idxDir)
    assert(reader.assignments.count() === before,
      "load must read through the .old fallback instead of failing")
    assert(new java.io.File(s"$idxDir/cells.old").exists(),
      "a read-only load must NOT move swap dirs")
    // a MAINTENANCE entry (serialized on the lock) heals the torn swap
    IvfIndex.compact(spark, idxDir)
    assert(!new java.io.File(s"$idxDir/cells.old").exists())
    assert(IvfIndex.load(spark, idxDir).assignments.count() === before)
  }

  test("splitCell: k+1 cells, only the split cell's rows move, exhaustive probe still exact") {
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-ivfsplit").toString
    IvfIndex.build(emb, k = 4).save(idxDir)
    val before = IvfIndex.load(spark, idxDir)
    val beforeAssign = before.assignments
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // probe answers captured BEFORE the split: a generation swap deletes
    // the old generation's files at commit, so handles loaded before the
    // split do not survive it (readers during the swap see .old; handles
    // held across it must re-load — the documented contract)
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val gotBefore = IvfIndex.probe(before, q, nProbe = 4, topK = 5)
      .select("q_id", "rank", "n_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // split the biggest cell — the operation's reason to exist
    val hot = before.assignments.groupBy("cell").count()
      .orderBy(col("count").desc).head().getInt(0)
    val newId = IvfIndex.splitCell(spark, idxDir, hot)
    assert(newId === 4)

    val after = IvfIndex.load(spark, idxDir)
    assert(after.k === 5)
    // conservation: every vector exactly once, non-split rows unmoved
    assert(after.assignments.count() === emb.count())
    val afterAssign = after.assignments
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(afterAssign.size === beforeAssign.size)
    beforeAssign.foreach { case (id, c) =>
      if (c != hot) assert(afterAssign(id) === c, s"vec $id moved from untouched cell $c")
      else assert(afterAssign(id) === hot || afterAssign(id) === newId)
    }
    assert(afterAssign.values.count(_ == newId) > 0, "the split must populate the new cell")

    // answers: exhaustive probe == the same brute force as before
    val gotAfter = IvfIndex.probe(after, q, nProbe = 5, topK = 5)
      .select("q_id", "rank", "n_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(gotAfter === gotBefore)

    // lifecycle composes: an upsert assigns against the k+1 quantizer
    IvfIndex.appendVectors(spark, idxDir,
      emb.limit(0)) // empty append exercises the entry + recovery path
    assert(IvfIndex.load(spark, idxDir).k === 5)
  }

  test("rebalance: splits hot cells until the fraction cap holds, answers preserved") {
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-ivfrebal").toString
    // k = 2 (MLlib's minimum): the larger cell holds >= 50% of the
    // vectors by pigeonhole, so a 30% cap GUARANTEES hot cells to split
    IvfIndex.build(emb, k = 2).save(idxDir)
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val before0 = IvfIndex.load(spark, idxDir)
    val n = before0.assignments.count()
    val gotBefore = IvfIndex.probe(before0, q, nProbe = 2, topK = 5)
      .select("q_id", "rank", "n_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    val splits = IvfIndex.rebalance(spark, idxDir, maxFrac = 0.3,
      maxSplits = 8).splits
    assert(splits >= 1, s"a >= 50% cell must split under a 30% cap")
    val after = IvfIndex.load(spark, idxDir)
    val sizes = after.assignments.groupBy("cell").count()
      .collect().map(_.getLong(1))
    assert(sizes.sum === n, "rebalance must conserve every vector")
    assert(sizes.forall(_ <= (0.3 * n).toLong + 1),
      s"cap must hold after convergence: ${sizes.mkString(",")}")
    val gotAfter = IvfIndex.probe(after, q, nProbe = after.k, topK = 5)
      .select("q_id", "rank", "n_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(gotAfter === gotBefore,
      "exhaustive probes must answer identically across rebalancing")
  }

  test("splitCell under a PQ tier: only the split cell's codes re-encode, deep-rerank answers preserved") {
    import graft.operators.PqIndex
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-ivfsplitpq").toString
    PqIndex.build(emb, m = 8, kCodes = 16, coarseK = 4).save(idxDir)
    val before = PqIndex.load(spark, idxDir)
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    // deep rerank: the final ranking is exact cosine over raw vectors,
    // which a split must never change (only ADC shortlists quantize)
    val gotBefore = PqIndex.adcProbe(before, q, nProbe = 4, topK = 5,
        rerank = 200)
      .select("q_id", "rank", "n_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val codesBefore = before.codes
      .select("vec_id", "cell", "codes").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](2))).toMap
    val hot = before.coarse.assignments.groupBy("cell").count()
      .orderBy(col("count").desc).head().getInt(0)

    val newId = IvfIndex.splitCell(spark, idxDir, hot)
    assert(newId === 4)
    val after = PqIndex.load(spark, idxDir)
    assert(after.coarse.k === 5)
    // conservation on the CODE tier: every vector exactly one code row
    assert(after.codes.count() === emb.count())
    val codesAfter = after.codes
      .select("vec_id", "cell", "codes").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](2))).toMap
    codesBefore.foreach { case (id, (c, codes)) =>
      if (c != hot)
        assert(codesAfter(id) === ((c, codes)),
          s"vec $id in untouched cell $c must keep byte-identical codes")
      else assert(codesAfter(id)._1 === hot || codesAfter(id)._1 === newId)
    }
    // the split cell's codes are CONSISTENT re-encodes: recomputing them
    // from raw vectors against the new centroids with the (unchanged)
    // codebooks reproduces what the generation committed
    val spark2 = spark
    import spark2.implicits._
    val centDf = Seq(
      (hot, after.coarse.centroids(hot).toSeq),
      (newId, after.coarse.centroids(newId).toSeq)).toDF("cell", "cvec")
    val expected = after.coarse.assignments
      .filter(col("cell").isin(hot, newId))
      .join(broadcast(centDf), "cell")
      .withColumn("r", zip_with(col("v"), col("cvec"), (a, b) => a - b))
      .select(col("vec_id"),
        graft.exprs.functions.pq_encode(col("r"),
          after.codebooks.flatten.flatten, // the (sub*k + code)*dsub layout
          after.m, after.kCodes).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    expected.foreach { case (id, codes) =>
      assert(codesAfter(id)._2 === codes,
        s"vec $id codes must equal a fresh re-encode against the new centroid")
    }
    // answers: exhaustive probes + deep rerank unchanged across the split
    val gotAfter = PqIndex.adcProbe(after, q, nProbe = 5, topK = 5,
        rerank = 200)
      .select("q_id", "rank", "n_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(gotAfter === gotBefore)
  }

  test("splitCell on an all-duplicate cell: -1, nothing committed; rebalance skips at fit-cost") {
    val spark2 = spark
    import spark2.implicits._
    val dup = (0L until 20L).map(i => (i, Seq(1.0, 1.0, 1.0, 1.0)))
    val far = (20L until 24L).map(i =>
      (i, Seq(-1.0 - i * 0.1, -1.0, -1.0 + i * 0.1, -1.0)))
    val e = (dup ++ far).toDF("vec_id", "v")
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-ivfdup").toString
    IvfIndex.build(e, k = 2).save(idxDir)
    val idx = IvfIndex.load(spark, idxDir)
    val dupCell = idx.assignments.filter(col("vec_id") === 0L)
      .select("cell").head().getInt(0)
    val beforeAssign = idx.assignments
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(IvfIndex.splitCell(spark, idxDir, dupCell) === -1,
      "an unsplittable cell must signal -1")
    // NOTHING committed: same generation, same k, same assignments, no
    // leftover swap dirs
    assert(!new java.io.File(idxDir + ".old").exists())
    val after = IvfIndex.load(spark, idxDir)
    assert(after.k === 2)
    assert(after.assignments.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap === beforeAssign)
    // rebalance sees the >maxFrac duplicate cell, skips it without paying
    // a generation, and terminates
    assert(IvfIndex.rebalance(spark, idxDir, maxFrac = 0.3,
      maxSplits = 4).splits === 0)
    assert(IvfIndex.load(spark, idxDir).k === 2)
  }

  test("rebalance under a PQ tier: cap converges, codes follow the splits, deep-rerank answers preserved") {
    import graft.operators.PqIndex
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-pqrebal").toString
    // coarseK = 2: the larger cell holds >= 50% by pigeonhole, so a 30%
    // cap guarantees at least one split on the PQ-backed index
    PqIndex.build(emb, m = 8, kCodes = 16, coarseK = 2).save(idxDir)
    val before = PqIndex.load(spark, idxDir)
    val n = before.codes.count()
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val gotBefore = PqIndex.adcProbe(before, q, nProbe = 2, topK = 5,
        rerank = 200)
      .select("q_id", "rank", "n_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    val splits = IvfIndex.rebalance(spark, idxDir, maxFrac = 0.3,
      maxSplits = 8).splits
    assert(splits >= 1, "a >= 50% cell must split under a 30% cap")
    val after = PqIndex.load(spark, idxDir)
    // code tier tracked every generation: one code row per vector, every
    // code row's cell matches its raw row's cell
    assert(after.codes.count() === n)
    val mismatched = after.codes.select(col("vec_id"), col("cell"))
      .join(after.coarse.assignments
        .select(col("vec_id"), col("cell").as("cell2")), "vec_id")
      .filter(col("cell") =!= col("cell2")).count()
    assert(mismatched === 0, "codes and raw lists must agree on cells")
    val sizes = after.coarse.assignments.groupBy("cell").count()
      .collect().map(_.getLong(1))
    assert(sizes.forall(_ <= (0.3 * n).toLong + 1),
      s"cap must hold after convergence: ${sizes.mkString(",")}")
    val gotAfter = PqIndex.adcProbe(after, q, nProbe = after.coarse.k,
        topK = 5, rerank = 200)
      .select("q_id", "rank", "n_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(gotAfter === gotBefore,
      "deep-rerank answers must be invariant across PQ-tier rebalancing")
  }

  test("a generation swap torn between renames: readers fall back, maintenance heals") {
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-ivfgen").toString
    IvfIndex.build(emb.filter(col("vec_id") < 100), k = 4).save(idxDir)
    val before = IvfIndex.load(spark, idxDir).assignments.count()
    // simulate splitCell dying between its two renames: dir moved to
    // dir.old, the staged generation never landed
    java.nio.file.Files.move(
      java.nio.file.Paths.get(idxDir),
      java.nio.file.Paths.get(idxDir + ".old"))
    val reader = IvfIndex.load(spark, idxDir)
    assert(reader.assignments.count() === before,
      "readers must fall back to the consistent .old generation")
    assert(new java.io.File(idxDir + ".old").exists(),
      "a read-only load must NOT move generation dirs")
    IvfIndex.compact(spark, idxDir) // any maintenance entry heals
    assert(!new java.io.File(idxDir + ".old").exists())
    assert(IvfIndex.load(spark, idxDir).assignments.count() === before)
  }

  test("removeVectors: quantizer untouched, survivors' probes = brute force without the removed") {
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-ivfrm").toString
    IvfIndex.build(emb, k = 8).save(idxDir)
    val before = IvfIndex.load(spark, idxDir)
    val centroidsBefore = before.centroids.map(_.toSeq).toSeq
    val total = before.assignments.count()
    // remove ids that RANK for the test queries, so a half-applied
    // removal would be caught
    val victims = IvfIndex.probe(before,
        emb.filter(col("vec_id") < 3)
          .select(col("vec_id").as("q_id"), col("v").as("qv")),
        nProbe = 8, topK = 3)
      .select("n_id").collect().map(_.getLong(0)).distinct.toSeq
    val n = IvfIndex.removeVectors(spark, idxDir, victims)
    assert(n === victims.length.toLong)
    assert(!new java.io.File(idxDir + ".old").exists(),
      "a committed removal must leave no generation residue")

    val after = IvfIndex.load(spark, idxDir)
    assert(after.centroids.map(_.toSeq).toSeq === centroidsBefore,
      "removal must not refit the quantizer")
    assert(after.assignments.count() === total - n)
    assert(after.assignments
      .filter(col("vec_id").isin(victims: _*)).count() === 0L)
    // exhaustive probe over the shrunk index = brute force over survivors
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val got = IvfIndex.probe(after, q, nProbe = 8, topK = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val all = emb.filter(!col("vec_id").isin(victims: _*)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val queries = emb.filter(col("vec_id") < 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    queries.foreach { case (qid, qv) =>
      val brute = all.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
      assert(got(qid) === brute, s"query $qid probe != brute force after removal")
    }
    // unknown ids: nothing staged, 0 returned
    assert(IvfIndex.removeVectors(spark, idxDir, Seq(-5L)) === 0L)
    // emptying the index is refused
    val allIds = after.assignments.select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    val e = intercept[IllegalArgumentException] {
      IvfIndex.removeVectors(spark, idxDir, allIds)
    }
    assert(e.getMessage.contains("empty"))
    assert(IvfIndex.load(spark, idxDir).assignments.count() === total - n,
      "the refused removal must leave the index untouched")
  }

  test("removeVectors under a PQ tier: codes and raw rows drop together, ADC scores of survivors unchanged") {
    import graft.operators.PqIndex
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-pqrm").toString
    PqIndex.build(emb, m = 8, kCodes = 16).save(idxDir)
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    def exhaustive(idx: PqIndex) =
      PqIndex.probeAll(idx, q, nProbe = 8, topK = 10000)
        .select("q_id", "n_id", "adc_cosine").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
        .sortBy(t => (t._1, t._2))
    val before = exhaustive(PqIndex.load(spark, idxDir))
    val victims = Seq(7L, 19L, 42L)
    val codesBefore = PqIndex.load(spark, idxDir).codes.count()
    val n = PqIndex.removeVectors(spark, idxDir, victims)
    assert(n === victims.length.toLong)
    val after = PqIndex.load(spark, idxDir)
    // codes and raw cells drop TOGETHER — shortlist and rerank agree
    assert(after.codes.count() === codesBefore - n)
    assert(after.coarse.assignments
      .filter(col("vec_id").isin(victims: _*)).count() === 0L)
    assert(after.codes
      .filter(col("vec_id").isin(victims: _*)).count() === 0L)
    // survivors' ADC cosines are BIT-identical (quantizer + codebooks
    // untouched): after ≡ before minus the removed candidates
    val vs = victims.toSet
    assert(exhaustive(after) === before.filterNot(t => vs(t._2)))
    // the exact-rerank path still serves, without the removed ids
    val rr = PqIndex.probeAll(after, q, nProbe = 8, topK = 5, rerank = 50)
      .select("n_id").collect().map(_.getLong(0)).toSet
    assert(rr.intersect(vs).isEmpty)
  }
}
