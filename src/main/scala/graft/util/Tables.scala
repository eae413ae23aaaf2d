package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md). */
object Tables {
  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** The engine's `ts` contract is the reference's: int64 ns since epoch
    * (event.go UnixNano). The driver's events.parquet has carried that as
    * parquet TIMESTAMP(NANOS) (readable as LongType only under the
    * nanosAsLong legacy conf) and, since the 2026-08-13 regeneration, as
    * TIMESTAMP(MICROS) (surfacing as TIMESTAMP_NTZ). One loader normalizes
    * BOTH generations to the ns-long contract, so every downstream query
    * keeps exact integer time arithmetic; the DuckDB oracles' epoch_ns(ts)
    * computes the identical value whatever the parquet unit. The NTZ→epoch
    * cast goes through the session timezone — every entry point pins
    * spark.sql.session.timeZone=UTC, matching DuckDB's naive-as-UTC
    * epoch_ns.
    *
    * The legacy flag is session-level by necessity (SQLConf, no per-read
    * option) and can't be unset after the call — the returned DataFrame is
    * lazy and re-reads it at planning. Library behavior: touch the conf
    * only when it actually needs flipping, so repeated loads are
    * side-effect-free. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events" &&
        !spark.conf.getOption(NanosConf).contains("true")) {
      spark.conf.set(NanosConf, "true")
    }
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      df.schema("ts").dataType match {
        case LongType => df // TIMESTAMP(NANOS) under nanosAsLong: as-is
        case TimestampNTZType | TimestampType =>
          df.withColumn("ts",
            expr("unix_micros(cast(ts as timestamp)) * 1000L"))
        case other =>
          throw new IllegalStateException(
            s"unsupported events.ts type $other in $dir")
      }
    } else df
  }
}
