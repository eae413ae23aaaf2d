package graft

import graft.multimodal.MultimodalPipeline._
import graft.queries.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual-hash image dedup + real multi-frame video decode.
  *
  * Two kinds of gate live here: (1) the REAL imageio codec against
  * constructed containers (animated GIF frames, PNG-vs-BMP cross-format
  * dHash) — things DuckDB cannot decode, so they can't ride the oracle
  * gate; (2) the join paths of dedup_video_frames / dedup_phash on a
  * synthetic corpus with KNOWN duplicate structure — the driver corpus at
  * sf0.01 happens to contain no video-typed near-dup pair, so without this
  * the 0-row oracle match would be the only evidence the join works.
  */
class PerceptualDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  // -------------------------------------------------- container builders --

  private def rgbImage(w: Int, h: Int)(f: (Int, Int) => Int)
      : java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    img
  }

  private def encodeAs(fmt: String,
      img: java.awt.image.BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, baos), s"no $fmt writer")
    baos.toByteArray
  }

  /** Multi-frame animated GIF from the JDK's own sequence writer. */
  private def gifOf(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f =>
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    baos.toByteArray
  }

  // ------------------------------------------------- real video decode --

  test("imageio frameCount/frameAt decode a real 3-frame animated GIF") {
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff)
    val gif = gifOf(colors.map(c => rgbImage(5, 4)((_, _) => c)))
    val codec = MediaCodec.imageio
    assert(codec.frameCount(gif) == 3)
    colors.zipWithIndex.foreach { case (c, i) =>
      val px = codec.frameAt(gif, i)
      assert(px.length == 5 * 4 * 3, s"frame $i size")
      val (r, g, b) = ((c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff)
      px.grouped(3).foreach { p =>
        assert((p(0) & 0xff) == r && (p(1) & 0xff) == g && (p(2) & 0xff) == b,
          s"frame $i pixel ${p.toSeq}")
      }
    }
  }

  test("sampleFrames walks a real GIF by its actual frame count") {
    import spark.implicits._
    val gif = gifOf(Seq(0xff0000, 0x00ff00, 0x0000ff)
      .map(c => rgbImage(3, 3)((_, _) => c)))
    val ds = Seq(MediaBlob(9L, "video", gif, Map.empty)).toDS()
    val out = sampleFrames(ds, stride = 1, maxFrames = 8,
      codec = MediaCodec.imageio).collect().head
    assert(out.frameIndexes.toSeq === Seq(0, 1, 2))
    assert(out.frames.forall(_.length == 3 * 3 * 3))
    // middle frame is solid green
    assert(out.frames(1).grouped(3).forall(p =>
      (p(0) & 0xff) == 0 && (p(1) & 0xff) == 255 && (p(2) & 0xff) == 0))
  }

  // ---------------------------------------------- ffmpeg external codec --

  test("parsePpmFrames parses a concatenated P6 stream with comments") {
    def p6(w: Int, h: Int, fill: Byte): Array[Byte] = {
      val header = s"P6\n# a comment line\n$w $h\n255\n".getBytes("US-ASCII")
      header ++ Array.fill(w * h * 3)(fill)
    }
    val frames = MediaCodec.parsePpmFrames(p6(3, 2, 7) ++ p6(2, 2, 9))
    assert(frames.length == 2)
    assert(frames(0)._1 == 3 && frames(0)._2 == 2 &&
      frames(0)._3.forall(_ == 7) && frames(0)._3.length == 18)
    assert(frames(1)._1 == 2 && frames(1)._3.forall(_ == 9))
    intercept[IllegalArgumentException] {
      MediaCodec.parsePpmFrames("P5\n2 2\n255\n".getBytes ++ new Array[Byte](4))
    }
    intercept[IllegalArgumentException] { // truncated payload
      MediaCodec.parsePpmFrames(p6(4, 4, 1).dropRight(5))
    }
  }

  test("auto codec resolves by binary availability") {
    if (MediaCodec.ffmpegAvailable()) assert(MediaCodec.auto ne MediaCodec.imageio)
    else assert(MediaCodec.auto eq MediaCodec.imageio)
  }

  /** A tiny real MP4 (H.264 or mpeg4, whatever the build carries) rendered
    * by ffmpeg itself from lavfi testsrc — `sec` shifts the start second so
    * two clips can be made identical or different. */
  private def mp4Of(sec: Int, frames: Int): Array[Byte] = {
    val tmp = java.nio.file.Files.createTempFile("graftmp4", ".mp4")
    try {
      val cmd = Seq("ffmpeg", "-y", "-v", "error", "-f", "lavfi",
        "-i", s"testsrc=size=64x48:rate=4:start=$sec", "-frames:v",
        frames.toString, "-pix_fmt", "yuv420p", tmp.toString)
      val p = new ProcessBuilder(cmd: _*)
        .redirectErrorStream(true).start()
      p.getInputStream.readAllBytes()
      assert(p.waitFor() == 0, "fixture render failed")
      java.nio.file.Files.readAllBytes(tmp)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("ffmpeg codec: real MP4 decode drives the video-frame dedup join") {
    assume(MediaCodec.ffmpegAvailable() && MediaCodec.ffmpegAvailable("ffprobe"),
      "ffmpeg/ffprobe not on PATH")
    import spark.implicits._
    val codec = MediaCodec.ffmpeg()

    // bounded decode honors the sample horizon on a non-GIF container
    val clip = mp4Of(sec = 0, frames = 6)
    val (w, h, _, px) = codec.decodeImage(clip)
    assert(w == 64 && h == 48 && px.length == 64 * 48 * 3)
    assert(codec.frameCount(clip) == 6)
    val (idx, frames) = codec.framesAt(clip, 3, fc => Array.range(0, fc))
    assert(idx.toSeq == Seq(0, 1, 2) &&
      frames.forall(_.length == 64 * 48 * 3))

    // dedup_video_frames' shape on REAL decodes: same-rendered clips must
    // share every sampled-frame fingerprint; a shifted clip shares none
    val dup = mp4Of(sec = 0, frames = 6)
    val other = mp4Of(sec = 60, frames = 6)
    val ds = Seq(
      MediaBlob(1L, "video", clip, Map.empty),
      MediaBlob(2L, "video", dup, Map.empty),
      MediaBlob(3L, "video", other, Map.empty)).toDS()
    val fps = sampleFrames(ds, stride = 1, maxFrames = 4, codec = codec)
      .toDF()
      .select(col("id").as("doc_id"), explode(col("frames")).as("frame"))
      .select(col("doc_id"), md5(col("frame")).as("fp")).distinct()
    val t = fps.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .join(fps, "doc_id")
    val pairs = t.select(col("doc_id").as("doc_a"), col("n").as("n_a"), col("fp"))
      .join(t.select(col("doc_id").as("doc_b"), col("n").as("n_b"), col("fp")),
        Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "n_a", "n_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)),
      s"identical renders must be the only verified pair: ${pairs.toSeq}")
  }

  test("single-frame containers report frameCount 1") {
    val png = encodeAs("png", rgbImage(2, 2)((_, _) => 0x123456))
    assert(MediaCodec.imageio.frameCount(png) == 1)
    assert(MediaCodec.imageio.frameAt(png, 0).length == 2 * 2 * 3)
  }

  // ------------------------------------------------------------- dHash --

  private def hashOf(blob: Array[Byte]): Long = {
    import spark.implicits._
    val ds = Seq(MediaBlob(1L, "image", blob, Map.empty)).toDS()
    perceptualHash(decodeImages(ds, MediaCodec.imageio)).collect().head.phash
  }

  test("dHash of a strictly decreasing ramp sets all 64 bits") {
    // 9×8 is the thumbnail grid itself (resize is the identity), gray of
    // column x = 240 - 25x, so every left>right comparison is true
    val img = rgbImage(9, 8)((x, _) => { val v = 240 - 25 * x; (v << 16) | (v << 8) | v })
    assert(hashOf(encodeAs("png", img)) == -1L)
  }

  test("dHash of a strictly increasing ramp sets no bits") {
    val img = rgbImage(9, 8)((x, _) => { val v = 25 * x; (v << 16) | (v << 8) | v })
    assert(hashOf(encodeAs("png", img)) == 0L)
  }

  test("dHash is perceptual: PNG and BMP of the same pixels hash equal") {
    val img = rgbImage(40, 30)((x, y) => {
      val v = (x * 6 + y * 2) % 256; (v << 16) | ((255 - v) << 8) | (v / 2)
    })
    val png = hashOf(encodeAs("png", img))
    val bmp = hashOf(encodeAs("bmp", img))
    assert(png == bmp, "re-encoding must not change the perceptual hash")
  }

  test("dHash survives small-amplitude pixel noise") {
    // ±1 noise cannot flip a comparison whose gradient step is 25
    val base = rgbImage(9, 8)((x, _) => { val v = 240 - 25 * x; (v << 16) | (v << 8) | v })
    val noisy = rgbImage(9, 8)((x, y) => {
      val v = 240 - 25 * x + (if ((x + y) % 2 == 0) 1 else -1)
      (v << 16) | (v << 8) | v
    })
    assert(hashOf(encodeAs("png", base)) == hashOf(encodeAs("png", noisy)))
  }

  // ------------------------------------- join paths on a known corpus --

  /** Corpus with duplicate structure in every media type. Texts are sized
    * so len % 3 picks the type (image 0 / audio 1 / video 2). */
  private lazy val corpusDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("phash_corpus").toString
    def sized(seed: String, len: Int): String = {
      val s = (seed * (len / seed.length + 1)).take(len)
      assert(s.length == len); s
    }
    // videos (len % 3 == 2): 1 & 2 identical; 3 unrelated; 4 shares ONLY
    // the first frame window [0,16) with 1/2 (differs inside [128,144))
    val vidA = sized("the quick brown fox jumps over the lazy dog ", 260)
    val vidB = sized("completely different video payload here now ", 260)
    val vidC = vidA.substring(0, 100) + sized("X", 160)
    // images (len % 3 == 0): 10 & 11 identical bytes, 12 distinct
    val imgA = sized("an image-typed document with duplicated pixels ", 240)
    val imgB = sized("some other unrelated image-typed content here ", 240)
    Seq(
      (1L, vidA, "web"), (2L, vidA, "web"), (3L, vidB, "web"),
      (4L, vidC, "web"),
      (10L, imgA, "web"), (11L, imgA, "web"), (12L, imgB, "web"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedup_video_frames finds exact-dup videos and honors the threshold") {
    val out = Dedup.queries("dedup_video_frames")(spark, corpusDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    // 1 and 2 share both sampled frames → jaccard 1.0
    assert(out.toSeq === Seq((1L, 2L, 1.0)),
      s"got ${out.toSeq}: 4 shares only frame 0 (jaccard 1/3 < 0.5), " +
        "3 shares none")
  }

  test("dedup_phash groups identical images and keeps min-id as keeper") {
    val out = Dedup.queries("dedup_phash")(spark, corpusDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val byId = out.map(t => t._1 -> t).toMap
    assert(out.length == 3) // the three image-typed docs
    assert(byId(10L)._2 == byId(11L)._2, "identical bytes → identical phash")
    assert(byId(10L)._3 == 10L && !byId(10L)._4)
    assert(byId(11L)._3 == 10L && byId(11L)._4)
  }

  test("dedup_phash_hamming reports the dup pair at hamming 0") {
    val out = Dedup.queries("dedup_phash_hamming")(spark, corpusDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.contains((10L, 11L, 0)))
  }

  test("phash band extraction stays unsigned when bit 63 is set") {
    import spark.implicits._
    // band 0's shift is zero, so a negative phash reaches the byte mask
    // unshifted — `& 255` must still give 0..255 (a sign-following % 256
    // would emit -255..-1 and silently miss oracle pairs)
    val bands = Seq(-1L, java.lang.Long.MIN_VALUE, 0x8040201008040201L)
      .toDF("phash")
      .select(col("phash"), explode(sequence(lit(0), lit(7))).as("b"))
      .withColumn("bval", expr(Dedup.PhashBandExpr))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(bands.nonEmpty)
    bands.foreach { case (p, b, v) =>
      assert(v == ((p >>> (b * 8)) & 255L) && v >= 0, s"phash $p band $b")
    }
  }

  test("pipeline_media_dedup counts one keeper per duplicate group") {
    val out = Dedup.queries("pipeline_media_dedup")(spark, corpusDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // images: 10/11 identical + 12 distinct → 3 docs, 2 keepers
    assert(out("image") == ((3L, 2L)))
    // videos: {1,2} one frame-Jaccard component; 3 and 4 standalone (4's
    // 1/3 jaccard with 1/2 is below threshold so it keeps itself) →
    // 4 docs, 3 keepers
    assert(out("video") == ((4L, 3L)))
  }
}
