package graft

import graft.exprs.{functions => gf, GraftExtensions}
import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** SQL availability of the custom expressions: via runtime registration on
  * a live session, and via the spark.sql.extensions injection hook. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("registerAll makes every custom expression callable from SQL") {
    gf.registerAll(spark)
    val r = spark.sql(
      """SELECT
        |  minify_json(' {"a": 1} ') AS m,
        |  payload_is_valid('{"a":1}') AS pv,
        |  payload_is_valid('{}') AS pv_empty,
        |  label_is_valid('ok-label') AS lv,
        |  label_is_valid('bad label') AS lv_bad,
        |  hex_version(255) AS hx,
        |  parse_hex_version('ff') AS ph,
        |  parse_hex_version('zz') AS ph_bad,
        |  event_checksum(100, 'l', '{"x":0}', 0) AS cs,
        |  dot_product(array(1d, 2d), array(3d, 4d)) AS dp
        |""".stripMargin).head()
    assert(r.getString(0) == """{"a":1}""")
    assert(r.getBoolean(1) && !r.getBoolean(2))
    assert(r.getBoolean(3) && !r.getBoolean(4))
    assert(r.getString(5) == "ff")
    assert(r.getLong(6) == 255L)
    assert(r.isNullAt(7))
    assert(!r.isNullAt(8))
    assert(r.getDouble(9) == 11.0)
  }

  test("agg_approx_distinct HLL stays within its advertised relative error") {
    // the one no_oracle query without a hard local gate: sketches differ
    // across engines (no DuckDB compare), so pin it to the EXACT distinct
    // count instead. approx_count_distinct's default rsd is 0.05; the
    // estimate is deterministic for fixed data, and 2×rsd gives headroom
    // for per-dataset deviation without ever tolerating a broken sketch.
    val dir = "/root/testdata/sf0.001"
    val approx = graft.queries.Relational.queries("agg_approx_distinct")(
      spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.queries.Relational.queries("agg_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    for ((flag, ex) <- exact) {
      val relErr = math.abs(approx(flag) - ex).toDouble / ex
      assert(relErr <= 0.10, s"$flag: approx=${approx(flag)} exact=$ex")
    }
  }

  test("GraftExtensions injects the full function set") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // the registry inside SparkSessionExtensions is private; assert the
    // injection ran for every builder by checking our shared registry size
    // and that a fresh apply throws nothing (injection is additive)
    assert(GraftExtensions.builders.map(_._1).distinct.size
      == GraftExtensions.builders.size)
    assert(GraftExtensions.builders.size == 14) // +zorder16 in round 11
  }
}
