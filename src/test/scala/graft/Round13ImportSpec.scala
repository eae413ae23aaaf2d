package graft

import graft.operators.BpeModel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** Round 13: importing a PUBLISHED tokenizer (the public merges.txt /
  * vocab.json byte-level interchange format) into the versioned
  * BpeModel artifact, serving the RELEASED ids through the fused
  * kernel. The sf oracle gates corpus-level exactness
  * (tokenize_bpe_ids_imported); this spec pins the codec, the
  * validation, the lifecycle, and — adversarially — that the released
  * id SPACE is actually used (base ids ≠ byte values). */
class Round13ImportSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("gpt2 byte↔visible codec round-trips all 256 bytes; foreign chars are rejected") {
    (0 until 256).foreach { b =>
      val hex = f"$b%02X"
      assert(BpeModel.visibleToHex(BpeModel.hexToVisible(hex)) === hex)
    }
    assert(BpeModel.hexToVisible("41") === "A", "printable bytes are themselves")
    assert(BpeModel.Gpt2ByteToChar(0x20) === 'Ġ',
      "space renders as Ġ (the 33rd invisible byte → U+0120)")
    intercept[IllegalArgumentException] {
      BpeModel.visibleToHex("あ") // あ is not a GPT-2 byte char
    }
  }

  test("parseMergesTxt skips header lines, keeps priority order, rejects malformed rows") {
    val m = BpeModel.parseMergesTxt("#version: 0.2\nĠ s\ne r\n")
    assert(m === Seq((1L, "20", "73", "2073", 0L),
      (2L, "65", "72", "6572", 0L)))
    intercept[IllegalArgumentException] {
      BpeModel.parseMergesTxt("a b c\n")
    }
  }

  // a tiny "release": one merge (a b → ab), ids deliberately NOT byte
  // values — base ids are a permutation, the merge id is far away
  private def tinyRelease(): (String, String) = {
    val d = Files.createTempDirectory("graft-tokrel").toString
    Files.write(java.nio.file.Paths.get(d, "merges.txt"),
      "#version: 0.2\na b\n".getBytes(UTF_8))
    val vocabEntries = (0 until 256).map { b =>
      val tok = BpeModel.hexToVisible(f"$b%02X")
      val esc = tok.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c => c.toString
      }
      s""""$esc": ${(b * 7 + 3) % 256}"""
    } :+ s""""ab": 9001"""
    Files.write(java.nio.file.Paths.get(d, "vocab.json"),
      vocabEntries.mkString("{", ",\n", "}").getBytes(UTF_8))
    (s"$d/merges.txt", s"$d/vocab.json")
  }

  test("importMerges: validation is loud, the version carries the file digest, vocab round-trips") {
    val (mp, vp) = tinyRelease()
    val root = Files.createTempDirectory("graft-bpeimp").toString
    val v = BpeModel.importMerges(spark, mp, vp, root)
    assert(BpeModel.versions(root) === Seq(v))
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(Files.readAllBytes(java.nio.file.Paths.get(mp)))
    md.update(Files.readAllBytes(java.nio.file.Paths.get(vp)))
    val fp = md.digest().map("%02x".format(_)).mkString
    assert(BpeModel.fingerprintOf(root, v) === Some(fp),
      "fingerprint must be the md5 of the release files")
    val vocab = BpeModel.loadVocab(root, v).get
    assert(vocab("6162") === 9001)
    assert(vocab("61") === (0x61 * 7 + 3) % 256)
    val merges = BpeModel.loadVersion(spark, root, v)
    assert(merges === Seq((1L, "61", "62", "6162", 0L)))
    // a vocab missing a base byte is NOT byte-level — refuse
    val bad = Files.createTempDirectory("graft-tokbad").toString
    Files.write(java.nio.file.Paths.get(bad, "merges.txt"),
      "a b\n".getBytes(UTF_8))
    Files.write(java.nio.file.Paths.get(bad, "vocab.json"),
      """{"a": 1, "b": 2, "ab": 3}""".getBytes(UTF_8))
    val ex = intercept[IllegalArgumentException] {
      BpeModel.importMerges(spark, s"$bad/merges.txt",
        s"$bad/vocab.json", Files.createTempDirectory("x").toString)
    }
    assert(ex.getMessage.contains("byte-level"))
    // a merge whose product is absent from the vocab can't chain — refuse
    Files.write(java.nio.file.Paths.get(bad, "merges2.txt"),
      "c d\n".getBytes(UTF_8))
    val fullVocabNoCd = (0 until 256).map { b =>
      val tok = BpeModel.hexToVisible(f"$b%02X")
      val esc = tok.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c => c.toString
      }
      s""""$esc": $b"""
    }.mkString("{", ",\n", "}")
    Files.write(java.nio.file.Paths.get(bad, "vocab2.json"),
      fullVocabNoCd.getBytes(UTF_8))
    val ex2 = intercept[IllegalArgumentException] {
      BpeModel.importMerges(spark, s"$bad/merges2.txt",
        s"$bad/vocab2.json", Files.createTempDirectory("x").toString)
    }
    assert(ex2.getMessage.contains("absent from vocab.json"))
  }

  test("the imported model emits RELEASED ids through the fused kernel — base ids are the vocab's, not the byte values") {
    val s = spark
    import s.implicits._
    val (mp, vp) = tinyRelease()
    val root = Files.createTempDirectory("graft-bpeimp2").toString
    val v = BpeModel.importMerges(spark, mp, vp, root)
    val merges = BpeModel.loadVersion(spark, root, v)
    val vocab = BpeModel.loadVocab(root, v).get
    // "ab ab" gpt2-pre-tokenizes to ["ab", " ab"]; the merge fuses a+b
    // in both, so the id stream is [ab, Ġ, ab] in RELEASED ids
    val ids = Seq("ab ab").toDF("t")
      .select(graft.exprs.functions
        .bpe_encode_imported_ids(col("t"), merges, vocab).as("ids"))
      .head().getSeq[Int](0)
    val idSpace = ids.toSet
    assert(ids === Seq(9001, vocab("20"), 9001))
    assert(!idSpace.contains(0x61) || vocab("61") == 0x61,
      "byte-value ids must not leak into the released id space")
    // and the round trip inverts under the released ids
    val rt = Seq("ab ab").toDF("t")
      .select(graft.exprs.functions.bpe_decode_imported_ids(
        graft.exprs.functions.bpe_encode_imported_ids(
          col("t"), merges, vocab), merges, vocab).as("rt"))
      .head().getString(0)
    assert(rt === "ab ab")
  }

  test("CLI tokenize works unchanged on an imported model dir; the imported alphabet emits released ids") {
    val (mp, vp) = tinyRelease()
    val root = Files.createTempDirectory("graft-bpeimp3").toString
    BpeModel.importMerges(spark, mp, vp, root)
    def run(args: String*): String = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) {
        graft.cli.Main.main(args.toArray)
      }
      out.toString("UTF-8")
    }
    // unchanged path: the imported artifact is a regular BpeModel, the
    // gpt2 alphabet serves ENGINE ids from it
    val engine = run("tokenize", root, "gpt2", "ab", "ab")
    assert(engine.contains("3 ids:"), engine)
    assert(engine.contains("256"), "merge round 1 → engine id 255+1")
    // released-id path: the imported alphabet reads the stored vocab
    val released = run("tokenize", root, "imported", "ab", "ab")
    assert(released.contains("9001"), released)
  }

  test("export closes the interchange round-trip: import∘export serves bit-identical ids; a-z models refuse") {
    val s = spark
    import s.implicits._
    // an in-engine byte-level model: one merge (61,62 → 6162)
    val native = Seq((1L, "61", "62", "6162", 7L))
    val root = Files.createTempDirectory("graft-bpeexp").toString
    BpeModel.save(spark, native, root)
    val d = Files.createTempDirectory("graft-bpeexpout").toString
    BpeModel.exportMerges(spark, root, s"$d/merges.txt", s"$d/vocab.json")
    // the exported files parse back to the same merge table (pair_freq
    // is not part of the interchange format — 0 on re-import)
    val root2 = Files.createTempDirectory("graft-bpeexp2").toString
    BpeModel.importMerges(spark, s"$d/merges.txt", s"$d/vocab.json", root2)
    val re = BpeModel.loadVersion(spark, root2, BpeModel.versions(root2).last)
    assert(re === Seq((1L, "61", "62", "6162", 0L)))
    // the exported vocab IS the engine id scheme: the explicit-vocab
    // kernel path emits the SAME ids the native gpt2 path does
    val vocab = BpeModel.loadVocab(root2, BpeModel.versions(root2).last).get
    assert(vocab("61") === 0x61 && vocab("6162") === 256)
    val text = Seq("ab cab").toDF("t")
    val nat = text.select(graft.exprs.functions
      .bpe_encode_gpt2_ids(col("t"), native).as("ids")).head().getSeq[Int](0)
    val imp = text.select(graft.exprs.functions
      .bpe_encode_imported_ids(col("t"), re, vocab).as("ids"))
      .head().getSeq[Int](0)
    assert(imp === nat,
      "import∘export must serve bit-identical ids to the native path")
    // a-z-alphabet models have no byte-level interchange form — refuse
    val azRoot = Files.createTempDirectory("graft-bpeaz").toString
    BpeModel.save(spark, Seq((1L, "a", "b", "ab", 3L)), azRoot)
    val ex = intercept[IllegalArgumentException] {
      BpeModel.exportMerges(spark, azRoot, s"$d/az-m.txt", s"$d/az-v.json")
    }
    assert(ex.getMessage.contains("BYTE-alphabet"))
  }

  test("CLI tokenizer interchange: export-tokenizer then import-tokenizer round-trips through the shell surface") {
    val native = Seq((1L, "61", "62", "6162", 7L))
    val root = Files.createTempDirectory("graft-clixport").toString
    BpeModel.save(spark, native, root)
    val d = Files.createTempDirectory("graft-clixportout").toString
    def run(args: String*): String = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) {
        graft.cli.Main.main(args.toArray)
      }
      out.toString("UTF-8")
    }
    val e = run("export-tokenizer", root, s"$d/m.txt", s"$d/v.json")
    assert(e.contains("exported"), e)
    val root2 = Files.createTempDirectory("graft-clixport2").toString
    val i = run("import-tokenizer", s"$d/m.txt", s"$d/v.json", root2)
    assert(i.contains("(v=1)"), i)
    val t = run("tokenize", root2, "imported", "ab", "ab")
    // engine scheme exported: merge id = 255 + 1 = 256, space = 0x20
    assert(t.contains(s"256 ${0x20} 256"), t)
  }

  test("the fixture resource drives the oracle-gated entries end-to-end (sf0.001 smoke)") {
    val df = SparkEntry.queries("tokenize_bpe_ids_imported")(
      spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_ids") > 0L))
    val rt = SparkEntry.queries("tokenize_roundtrip_imported")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rt.nonEmpty)
  }
}
