package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md). */
object Tables {
  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** events.parquet carries TIMESTAMP(NANOS); Spark reads it only with the
    * nanosAsLong legacy conf, surfacing `ts` as LongType (ns since epoch).
    * Oracle side uses epoch_ns(ts) to line up.
    *
    * The flag is session-level by necessity (SQLConf, no per-read option)
    * and can't be unset after the call — the returned DataFrame is lazy and
    * re-reads it at planning. Library behavior: touch the conf only when it
    * actually needs flipping, so repeated loads are side-effect-free. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events" &&
        !spark.conf.getOption(NanosConf).contains("true")) {
      spark.conf.set(NanosConf, "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
