package graft

import graft.exprs.LayoutOps
import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: the kernel's bit contract and the observable pruning
  * property — per-file (min,max) boxes under the Z layout skip a
  * thin-rectangle query that a single-column sort cannot skip at all.
  * File-box intersection is exactly the predicate parquet min/max data
  * skipping evaluates, so counting intersecting files IS the pruning
  * measurement, independent of scan internals. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("interleave16 bit contract") {
    assert(LayoutOps.interleave16(0, 0) === 0L)
    assert(LayoutOps.interleave16(1, 0) === 1L)
    assert(LayoutOps.interleave16(0, 1) === 2L)
    assert(LayoutOps.interleave16(3, 3) === 15L)
    assert(LayoutOps.interleave16(0xFFFF, 0) === 0x55555555L)
    assert(LayoutOps.interleave16(0, 0xFFFF) === 0xAAAAAAAAL)
    assert(LayoutOps.interleave16(0xFFFF, 0xFFFF) === 0xFFFFFFFFL)
    // locality: a 2x2 block is 4 consecutive keys
    val block = for (x <- 2 to 3; y <- 4 to 5)
      yield LayoutOps.interleave16(x, y)
    assert(block.max - block.min === 3L)
  }

  test("expression and SQL registration agree with the Scala kernel") {
    val df = Seq((7, 11), (65535, 1), (0, 65535)).toDF("x", "y")
    val viaCol = df.select(Layout.zkey($"x", $"y")).as[Long].collect()
    graft.exprs.functions.registerAll(spark)
    df.createOrReplaceTempView("zin")
    val viaSql = spark.sql("select zorder16(x, y) from zin").as[Long].collect()
    val want = Seq(LayoutOps.interleave16(7, 11),
      LayoutOps.interleave16(65535, 1), LayoutOps.interleave16(0, 65535))
    assert(viaCol.toSeq === want)
    assert(viaSql.toSeq === want)
  }

  /** Per-file bounding boxes of (x, y) after writing `df` to parquet. */
  private def fileBoxes(df: org.apache.spark.sql.DataFrame, path: String)
      : Array[(Int, Int, Int, Int)] = {
    df.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min("x").as("xmin"), max("x").as("xmax"),
        min("y").as("ymin"), max("y").as("ymax"))
      .select("xmin", "xmax", "ymin", "ymax")
      .as[(Int, Int, Int, Int)].collect()
  }

  test("Z layout prunes a thin-rectangle query that an x-sort cannot") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    // 256x256 grid; query box = full x range, y < 4 (selective in y ONLY —
    // the worst case for an x-sorted layout).
    val grid = spark.range(0, 65536).select(
      (col("id") % 256).cast("int").as("x"),
      (col("id") / 256).cast("int").as("y"))
    val intersects = (b: (Int, Int, Int, Int)) => b._3 < 4 // ymin < 4

    val xSorted = grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions("x")
    val xBoxes = fileBoxes(xSorted, s"$dir/xsort")
    val zBoxes = fileBoxes(Layout.clusterByZ(grid, col("x"), col("y"), 16),
      s"$dir/zorder")
    assert(xBoxes.length >= 8 && zBoxes.length >= 8)
    val xHit = xBoxes.count(intersects)
    val zHit = zBoxes.count(intersects)
    // x-sorted: every file spans all of y → nothing prunable.
    assert(xHit === xBoxes.length)
    // Z: 16 equal key ranges = 64x64 blocks; only the y=0 block row hits.
    assert(zHit * 2 <= zBoxes.length,
      s"z layout should prune ≥half the files: $zHit/${zBoxes.length}")
    // And the layout is lossless: same rows either way.
    val a = spark.read.parquet(s"$dir/zorder").as[(Int, Int)].collect().sorted
    val b = spark.read.parquet(s"$dir/xsort").as[(Int, Int)].collect().sorted
    assert(a.toSeq === b.toSeq)
  }
}
