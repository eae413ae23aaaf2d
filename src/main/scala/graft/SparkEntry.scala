package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory: the reference's log algebra
  * (EventLogQueries), the relational extension surface (Relational), and the
  * training-data pipeline operators (Dedup / Similarity / TextAnalysis).
  * Every SQL-expressible entry has a DuckDB oracle in `oracleSql`.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++
      EventLogQueries.queries ++
      Dedup.queries ++
      Similarity.queries ++
      TextAnalysis.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (sketches, XXH64 checksums) → driver records a rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++
      EventLogQueries.oracle ++
      Dedup.oracle ++
      Similarity.oracle ++
      TextAnalysis.oracle
}
