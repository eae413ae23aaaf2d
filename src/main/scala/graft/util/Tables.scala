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
  /** Spread a LOW-PARALLELISM scan across the session's cores before a
    * CPU-heavy per-row derivation (round 17, guide §2.5 input skew /
    * §2.2 scale-adaptive partitioning). The testdata parquet ships as one
    * row group, so Spark plans ONE scan task regardless of core count
    * and tokenize/hash-heavy stages run single-threaded (measured: the
    * dsir feature pass spends 2.2 s on 1 of 32 cores). A conditional
    * round-robin repartition buys back the cores for the price of one
    * tiny-input exchange. Scale-adaptive by construction: the no-op
    * branch fires whenever the scan already splits (at production scale
    * inputs carry thousands of row groups, so this never shuffles), and
    * the target derives from the session's core count, never a constant.
    * Half the cores is the measured knee: string/hash work contends
    * superlinearly in local mode (32-way ran 24× the single-task CPU;
    * 16-way 2.9×), and ceil(n/2) keeps the lower-core driver runs
    * proportional.
    *
    * ONLY for derivations whose downstream aggregates are order-free
    * (BIGINT / fixed-point — the repo-wide float discipline); never under
    * a float sum whose fold order the oracle pins. */
  def spread(df: DataFrame, key: String = "doc_id"): DataFrame = {
    val n = math.max(2,
      (df.sparkSession.sparkContext.defaultParallelism + 1) / 2)
    // hash-partition on the id, NOT round-robin: keyless repartition(n)
    // local-sorts every input row first (SPARK-23207 determinism sort —
    // thread dumps showed it as the dominant frame), while a
    // deterministic key hash needs no sort and is retry-safe (guide
    // §2.5); ids are dense so 2n ≫ n distinct values spread evenly
    if (df.rdd.getNumPartitions >= n) df
    else df.repartition(n, org.apache.spark.sql.functions.col(key))
  }

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
