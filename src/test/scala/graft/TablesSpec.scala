package graft

import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Pins the testdata loader's `ts` contract: whatever parquet unit the
  * driver generates `events.ts` with (TIMESTAMP(NANOS) pre-2026-08-13,
  * TIMESTAMP(MICROS) after), `Tables.apply` must surface LongType
  * ns-since-epoch — the reference's UnixNano contract that every event
  * query and every DuckDB oracle (`epoch_ns(ts)`) assumes. The mid-round-7
  * regeneration silently broke 7 queries; this spec makes the next format
  * change a named failure instead. */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("events.ts surfaces as LongType nanoseconds for the current testdata") {
    val e = graft.util.Tables(spark, sfDir, "events")
    assert(e.schema("ts").dataType == LongType,
      s"ts must be ns-long, got ${e.schema("ts").dataType}")
    val r = e.selectExpr("min(ts)", "max(ts)", "count(*)").head()
    val (lo, hi, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n > 0)
    // plausibility window: 2000-01-01..2100-01-01 in ns — catches unit
    // mistakes (us-as-ns is off by 1000x, seconds by 1e9)
    val y2000 = 946684800L * 1000000000L
    val y2100 = 4102444800L * 1000000000L
    assert(lo >= y2000 && hi < y2100,
      s"ts range [$lo, $hi] outside the ns plausibility window")
  }

  test("non-events tables load untouched") {
    val d = graft.util.Tables(spark, sfDir, "documents")
    assert(d.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
  }
}
