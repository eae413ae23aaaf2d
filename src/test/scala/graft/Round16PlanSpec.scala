package graft

import graft.operators.IvfIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 pin for the PER-QUERY-ROW filtered ANN probe: a multi-tenant
  * batch must be served from ONE cell-pruned scan of the index — the
  * whole point of keying the filter per query row instead of looping
  * per-tenant probeFiltered calls (which pay one index scan each). The
  * deciding (key, candidate) semi-join composes with that single scan.
  */
class Round16PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Scans in `df`'s optimized plan rooted under `dirKey`. */
  private def indexScans(df: DataFrame, dirKey: String): Int =
    df.queryExecution.optimizedPlan.collectLeaves().count {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.exists(_.toString.contains(dirKey))
        case _ => false
      }
      case _ => false
    }

  test("keyed filtered probe: one index scan serves every tenant in the batch") {
    import spark.implicits._
    val emb = graft.util.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-r16plan-ivf").toString
    IvfIndex.build(emb, k = 4).save(dir)
    val idx = IvfIndex.load(spark, dir)
    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("v")).head().getSeq[Double](0)
    val queries = Seq(
      (9000003L, qv, "t3"), (9000005L, qv, "t5"))
      .toDF("q_id", "qv", "tenant")
    val allowedKeyed =
      emb.filter(col("vec_id") % 3 === 0).select("vec_id")
        .withColumn("tenant", lit("t3"))
        .unionByName(emb.filter(col("vec_id") % 5 === 0).select("vec_id")
          .withColumn("tenant", lit("t5")))
    val keyed = IvfIndex.probeFilteredKeyed(
      idx, queries, "tenant", allowedKeyed, nProbe = 4, topK = 5)
    assert(indexScans(keyed, dir) === 1,
      "the multi-tenant batch must read the index ONCE — per-tenant " +
        "loops pay one scan each, which is what keying exists to avoid")
    // and the single-scan plan still answers (parity with per-tenant
    // probeFiltered is pinned in LiveServeSpec)
    assert(keyed.count() > 0)
  }
}
