package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md). */
object Tables {
  /** events.parquet carries TIMESTAMP(NANOS); Spark reads it only with the
    * nanosAsLong legacy conf, surfacing `ts` as LongType (ns since epoch).
    * Oracle side uses epoch_ns(ts) to line up. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
