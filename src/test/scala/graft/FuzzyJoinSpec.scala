package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FuzzyJoin (Ed-Join prefix filtering) vs the naive all-pairs ground
  * truth. The oracle gate covers the real tables; this spec targets the
  * guarantee's EDGE territory — short strings below the prefix-filter
  * bound, duplicate-gram strings (where distinct-set dedup weakens the
  * count filter), and the order-independence claim (any global gram order
  * is correct; df-ascending is only the performance choice). */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def bruteSelf(names: Seq[String], k: Int): Set[(String, String, Long)] = {
    val d = names.distinct
    (for {
      a <- d; b <- d if a < b
      dist = lev(a, b) if dist <= k
    } yield (a, b, dist.toLong)).toSet
  }

  private def engineSelf(names: Seq[String], q: Int, k: Int): Set[(String, String, Long)] =
    FuzzyJoin.selfJoin(names.toDF("s"), "s", q, k)
      .as[(String, String, Long)].collect().toSet

  test("banded edit-distance kernel matches full DP (property)") {
    val rnd = new scala.util.Random(23)
    def u(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    for (_ <- 0 until 4000) {
      val la = rnd.nextInt(12)
      val a = (0 until la).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val b = (0 until rnd.nextInt(12)).map(_ =>
        ('a' + rnd.nextInt(3)).toChar).mkString
      val k = rnd.nextInt(4)
      val full = lev(a, b)
      val want = if (full <= k) full else -1
      val got = graft.exprs.EditDistanceOps.within(u(a), u(b), k)
      assert(got === want, s"within('$a','$b',$k)")
    }
  }

  // The counterexample family that breaks naive q-gram blocking: a middle
  // substitution in a length-3 string destroys BOTH its bigrams ("abc" vs
  // "aXc" share no gram). The short block must still pair them.
  test("short strings outside the prefix-filter guarantee are still found") {
    val names = Seq("abc", "axc", "ab", "xb", "a", "b", "", "abcd", "abed")
    assert(engineSelf(names, q = 2, k = 1) === bruteSelf(names, k = 1))
  }

  test("duplicate-gram strings (set-dedup weakens the count filter) are exact") {
    // "aaaa" has ONE distinct gram; an edit can wipe the whole set.
    val names = Seq("aaaa", "aaba", "aaaaaa", "aaaaab", "bbbb", "abab", "baba")
    assert(engineSelf(names, q = 2, k = 1) === bruteSelf(names, k = 1))
  }

  test("k=2 matches brute force on a perturbation-rich corpus") {
    val base = Seq("shipping container", "shipping containers",
      "sipping container", "shipping container!", "shopping container",
      "chipping container", "shipping ontainer", "spinning container",
      "unrelated string", "another one entirely")
    assert(engineSelf(base, q = 2, k = 2) === bruteSelf(base, k = 2))
  }

  test("randomized corpus matches brute force (q=2, k=1)") {
    val rnd = new scala.util.Random(11)
    val names = Seq.fill(120) {
      val n = 1 + rnd.nextInt(10)
      (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    }.distinct
    assert(engineSelf(names, q = 2, k = 1) === bruteSelf(names, k = 1))
  }

  test("matchJoin: probe-vs-catalog equals brute force, including shorts") {
    val catalog = Seq("red widget", "blue bolt", "hot gear", "ab", "aXc")
    val probes = Seq("red widgut", "blue bol", "cold gear", "abc", "zz")
    val got = FuzzyJoin.matchJoin(
        probes.toDF("p"), "p", catalog.toDF("c"), "c", q = 2, k = 1)
      .as[(String, String, Long)].collect().toSet
    val want = (for {
      p <- probes.distinct; c <- catalog.distinct
      d = lev(p, c) if d <= 1
    } yield (p, c, d.toLong)).toSet
    assert(got === want)
  }

  test("candidate volume is prefix-bounded: stop-gram corpus stays subquadratic") {
    // Every name shares the hot prefix; the discriminative grams are the
    // digits. The rarest-first prefix must keep per-gram candidate lists
    // far below df("Cu")² — observable as the verify input size.
    val names = (0 until 400).map(i => f"Customer#$i%09d")
    val out = engineSelf(names, q = 2, k = 1)
    assert(out === bruteSelf(names, k = 1))
    assert(out.nonEmpty) // consecutive ids differ by one substitution
  }

  test("deletion-neighborhood kernel: contents, distinctness, k=2 growth") {
    def nb(s: String, k: Int): Seq[String] =
      graft.exprs.EditDistanceOps.deletionNeighborhood(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), k)
        .toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(nb("abc", 1).toSet === Set("abc", "bc", "ac", "ab"))
    assert(nb("aaa", 1).toSet === Set("aaa", "aa"), "duplicates collapse")
    assert(nb("ab", 2).toSet === Set("ab", "a", "b", ""))
    assert(nb("", 1) === Seq(""))
    val n2 = nb("abcdef", 2)
    assert(n2.distinct === n2, "deterministic, duplicate-free")
    assert(n2.toSet === (for {
      i <- 0 to 5; j <- i to 5
    } yield {
      val once = "abcdef".substring(0, i) + "abcdef".substring(i + 1)
      if (j == i) once
      else {
        val jj = if (j > i) j - 1 else j
        once.substring(0, jj) + once.substring(jj + 1)
      }
    }).toSet + "abcdef")
  }

  test("degenerate gram alphabet reroutes to the deletion generator and stays exact") {
    // zero-padded numeric ids: 101 distinct 2-grams at ANY corpus size —
    // the measured 100× scale-killer for the gram path (131B candidates
    // at 1.5M names). The data-driven chooser must take the deletion
    // path here, and the result must still equal brute force.
    val names = (0 until 600).map(i => f"Customer#$i%09d") ++
      Seq("Customer#0000OO123") // letter/digit confusion pair territory
    val g = names.toDF("s").select(col("s")).distinct()
    val grams = g.select(col("s"),
      explode(graft.operators.FuzzyJoin.qgrams(col("s"), 2)).as("g"))
    val dfT = grams.groupBy("g").agg(count(lit(1)).as("df"))
    // (reconstruct the prefix the way selfJoin does, to ask the chooser)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("s").orderBy(col("df"), col("g"))
    val prefix = grams.join(dfT, "g")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("s", "g")
    assert(FuzzyJoin.selfGenerator(g, prefix, 1) === "deletions",
      "the numeric-id family must reroute off the gram path")
    assert(engineSelf(names, q = 2, k = 1) === bruteSelf(names, k = 1),
      "the deletion path must be result-identical to the naive oracle")

    // a natural-text corpus keeps the gram path (volG under the deletion
    // input floor — step 2 of the chooser, no signature pass paid)
    val natural = Seq("shipping container", "shipping containers",
      "boxed widgets", "amber glass bottle", "cobalt glass bottle",
      "weathered oak plank", "unrelated thing entirely")
    val gn = natural.toDF("s").distinct()
    val gramsN = gn.select(col("s"),
      explode(graft.operators.FuzzyJoin.qgrams(col("s"), 2)).as("g"))
    val dfN = gramsN.groupBy("g").agg(count(lit(1)).as("df"))
    val prefixN = gramsN.join(dfN, "g")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("s", "g")
    assert(FuzzyJoin.selfGenerator(gn, prefixN, 1) === "grams")
  }

  test("deletion-path candidate join plans sort-merge, never a stats-misled broadcast") {
    // Catalyst's static size estimate does not model the (len+1)^k
    // signature fan-out and broadcast the 28M-row relation at the 100×
    // rehearsal (build-side hash map OOM) — the merge hint pins the
    // physical join; this test pins the hint
    val names = (0 until 600).map(i => f"Customer#$i%09d")
    val q = FuzzyJoin.selfJoin(names.toDF("s"), "s", q = 2, k = 1)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"),
      s"the signature self-join must be sort-merge:\n$p")
  }

  // ---- round 13: CODE-POINT exactness (supplementary-plane text) ----
  // The kernel, the deletion signatures, and Spark's length/substr all
  // count code points now, so non-BMP text is first-class — these tests
  // gate it against a code-point reference DP (the DuckDB oracle can't:
  // its levenshtein is byte-grained).

  private def levCp(a: String, b: String): Int = {
    val x = a.codePoints().toArray
    val y = b.codePoints().toArray
    val d = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to x.length; j <- 1 to y.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
    d(x.length)(y.length)
  }

  // alphabet deliberately avoids U+E000..U+FFFF: surrogate pairs invert
  // UTF-16 order only against that range, so Java String `<` (the brute
  // force's pair order) agrees with Spark's UTF-8 binary `<` here
  private val cpAlphabet =
    Array("a", "b", "今", "𝄞" /* 𝄞 */, "😀" /* 😀 */)

  test("kernel counts CODE POINTS: supplementary chars are single edits") {
    def u(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    import graft.exprs.EditDistanceOps.within
    assert(within(u("𝄞"), u("a"), 1) === 1, "𝄞→a is ONE edit")
    assert(within(u("今日"), u("今"), 1) === 1)
    assert(within(u("𝄞x𝄞"),
      u("𝄞y𝄞"), 1) === 1)
    assert(within(u("😀"), u("𝄞"), 1) === 1,
      "supplementary↔supplementary substitution is one edit")
  }

  test("kernel matches the code-point DP on non-BMP strings (property)") {
    val rnd = new scala.util.Random(31)
    def u(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    for (_ <- 0 until 2000) {
      val a = Seq.fill(rnd.nextInt(8))(
        cpAlphabet(rnd.nextInt(cpAlphabet.length))).mkString
      val b = Seq.fill(rnd.nextInt(8))(
        cpAlphabet(rnd.nextInt(cpAlphabet.length))).mkString
      val k = rnd.nextInt(4)
      val full = levCp(a, b)
      val want = if (full <= k) full else -1
      assert(graft.exprs.EditDistanceOps.within(u(a), u(b), k) === want,
        s"within('$a','$b',$k)")
    }
  }

  test("deletion neighborhood deletes code points, never half a surrogate") {
    def nb(s: String, k: Int): Seq[String] =
      graft.exprs.EditDistanceOps.deletionNeighborhood(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), k)
        .toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(nb("𝄞a", 1).toSet ===
      Set("𝄞a", "a", "𝄞"))
    assert(nb("😀😀", 1).toSet ===
      Set("😀😀", "😀"))
    nb("𝄞今😀", 2).foreach { v =>
      var i = 0
      while (i < v.length) {
        val ch = v.charAt(i)
        if (Character.isHighSurrogate(ch))
          assert(i + 1 < v.length && Character.isLowSurrogate(v.charAt(i + 1)),
            s"lone high surrogate in '$v'")
        if (Character.isLowSurrogate(ch))
          assert(i > 0 && Character.isHighSurrogate(v.charAt(i - 1)),
            s"lone low surrogate in '$v'")
        i += 1
      }
    }
  }

  test("selfJoin is exact on a non-BMP corpus (property vs code-point DP)") {
    val rnd = new scala.util.Random(47)
    val names = Seq.fill(150)(
      Seq.fill(1 + rnd.nextInt(6))(
        cpAlphabet(rnd.nextInt(cpAlphabet.length))).mkString).distinct
    val got = engineSelf(names, q = 2, k = 1)
    val want = (for {
      a <- names; b <- names if a < b
      dist = levCp(a, b) if dist <= 1
    } yield (a, b, dist.toLong)).toSet
    assert(want.nonEmpty, "generator must produce close pairs")
    assert(got === want)
  }

  test("matchJoin is exact on a non-BMP probe/catalog pair") {
    val catalog = Seq("𝄞今a", "今今b", "😀ab", "ab")
    val probes = Seq("𝄞今", "今今bb", "😀ab", "a😀b", "zz")
    val got = FuzzyJoin.matchJoin(
        probes.toDF("p"), "p", catalog.toDF("c"), "c", q = 2, k = 1)
      .as[(String, String, Long)].collect().toSet
    val want = (for {
      p <- probes.distinct; c <- catalog.distinct
      d = levCp(p, c) if d <= 1
    } yield (p, c, d.toLong)).toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("matchJoin reroutes on degenerate corpora and stays exact") {
    val catalog = (0 until 500).map(i => f"SKU#$i%08d")
    val probes = catalog.take(120).map(s => s.dropRight(1)) ++ Seq("zz")
    val got = FuzzyJoin.matchJoin(
        probes.toDF("p"), "p", catalog.toDF("c"), "c", q = 2, k = 1)
      .as[(String, String, Long)].collect().toSet
    val want = (for {
      p <- probes.distinct; c <- catalog.distinct
      d = lev(p, c) if d <= 1
    } yield (p, c, d.toLong)).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }
}
