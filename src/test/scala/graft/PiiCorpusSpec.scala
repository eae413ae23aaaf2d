package graft

import graft.queries.TextAnalysis
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Pins text_pii_scrub's regex behavior on the corpus edge cases to values
  * verified against DuckDB (RE2), so Java∩RE2 parity is held by tests, not
  * hope: adjacent/overlapping matches, digits inside IPs, backtracking at
  * email boundaries, `+`/`%`/`_` in email local parts, matches at string
  * edges. Expected tuples are (scrubbed, n_email, n_ip, n_num); counts run
  * over the ORIGINAL text, scrubbing is email → ip → num in that order. */
class PiiCorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val corpus: Seq[(String, (String, Long, Long, Long))] = Seq(
    // '+', '%', '_', '.' in local parts; two emails in one string
    "reach me at a+b.c_d%e@mail.example.com or j.doe@sub.domain.org" ->
      (("reach me at <email> or <email>", 2L, 0L, 0L)),
    // five octets: greedy IP takes the first four, the fifth stays a number
    "octets run 12.34.56.78.90 and on" ->
      (("octets run <ip>.<num> and on", 0L, 1L, 5L)),
    // 999 is allowed by the {1,3} pattern (pattern-validity, not RFC)
    "edge 999.999.999.999 valid-by-pattern" ->
      (("edge <ip> valid-by-pattern", 0L, 1L, 4L)),
    // IP match starts mid-digit-run: 1[234.5.6.789]0
    "embedded 1234.5.6.7890 digits" ->
      (("embedded <num><ip><num> digits", 0L, 1L, 4L)),
    // email backtracks to x1@y.zz, trailing 99 survives as a number
    "tight x1@y.zz99 boundary" ->
      (("tight <email><num> boundary", 1L, 0L, 2L)),
    // whole string is one match (both anchorless edges)
    "10.0.0.1" -> (("<ip>", 0L, 1L, 4L)),
    "a@b.co" -> (("<email>", 1L, 0L, 0L)),
    "no pii here at all" -> (("no pii here at all", 0L, 0L, 0L)),
    // bare numbers never form an IP without four dot-joined octets
    "v2.1 release notes 2024-08-12" ->
      (("v<num>.<num> release notes <num>-<num>-<num>", 0L, 0L, 5L)),
    // ports after IPs stay numbers
    "ports 1.2.3.4:8080 and 5.6.7.8:443" ->
      (("ports <ip>:<num> and <ip>:<num>", 0L, 2L, 10L)),
    // adjacent '@': domain backtracks to b.ccc, the rest can't start a
    // local part (no second overlapping match)
    "a@b.ccc@d.ee" -> (("<email>@d.ee", 1L, 0L, 0L)))

  test("pii scrub matches the DuckDB-verified corpus exactly") {
    import spark.implicits._
    val df = corpus.map(_._1).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select(col("id") +: TextAnalysis.piiColumns(col("text")): _*)
    val got = df.collect().sortBy(_.getLong(0)).map(r =>
      (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    corpus.zip(got).foreach { case ((text, want), actual) =>
      assert(actual === want, s"input: $text")
    }
  }
}
