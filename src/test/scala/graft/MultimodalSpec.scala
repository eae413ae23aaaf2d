package graft

import graft.multimodal.MultimodalPipeline._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: typed binary columns, partition-local decode,
  * resize, frame sampling — exercised end-to-end on the deterministic stub
  * codec (no media libs in this environment). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val media = fromDocuments(spark, sfDir).cache()

  test("documents lift: every row typed, blob bytes preserved") {
    val rows = media.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(m => Set("image", "audio", "video")(m.mediaType)))
    assert(rows.forall(_.blob.nonEmpty))
    assert(rows.forall(_.meta.contains("source")))
  }

  test("image decode: schema + per-row dimensions from the codec") {
    val imgs = decodeImages(media).collect()
    assert(imgs.nonEmpty)
    imgs.foreach { i =>
      assert(i.width >= 1 && i.height >= 1 && i.channels == 3)
      assert(i.pixels.nonEmpty)
    }
    // deterministic: same input → same output
    val again = decodeImages(media).collect()
    assert(imgs.map(_.id).sorted.sameElements(again.map(_.id).sorted))
  }

  test("resize produces exact target geometry for every image") {
    val out = resize(decodeImages(media), 8, 6).collect()
    assert(out.nonEmpty)
    out.foreach { i =>
      assert(i.width == 8 && i.height == 6)
      assert(i.pixels.length == 8 * 6 * i.channels)
    }
  }

  test("audio features: fixed-width embeddings") {
    val feats = extractAudioFeatures(media).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.sampleRate == 16000)
      assert(f.embedding.length == 8)
    }
  }

  test("video frame sampling respects stride and cap") {
    val vids = sampleFrames(media, stride = 8, maxFrames = 4).collect()
    assert(vids.nonEmpty)
    vids.foreach { v =>
      assert(v.frameIndexes.length <= 4)
      assert(v.frameIndexes.sameElements(v.frameIndexes.indices.map(_ * 8)))
      assert(v.frames.length == v.frameIndexes.length)
    }
  }

  test("imageio codec decodes real PNG bytes through the Spark pipeline") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(
      4, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 4)
      img.setRGB(x, y, (x * 60 << 16) | (y * 80 << 8) | 0x10)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val ds = Seq(MediaBlob(1L, "image", baos.toByteArray, Map.empty)).toDS()
    val out = decodeImages(ds, MediaCodec.imageio).collect().head
    assert(out.width == 4 && out.height == 3 && out.channels == 3)
    // PNG is lossless: every pixel must round-trip exactly (RGB order)
    for (y <- 0 until 3; x <- 0 until 4) {
      val i = (y * 4 + x) * 3
      assert(out.pixels(i) == (x * 60).toByte, s"r($x,$y)")
      assert(out.pixels(i + 1) == (y * 80).toByte, s"g($x,$y)")
      assert(out.pixels(i + 2) == 0x10.toByte, s"b($x,$y)")
    }
    // and the pure-math resize runs unchanged on real decoded pixels
    val small = resize(decodeImages(ds, MediaCodec.imageio), 2, 2).collect().head
    assert(small.width == 2 && small.height == 2)
    assert(small.pixels.length == 2 * 2 * 3)
  }

  test("imageio codec decodes real WAV PCM bytes") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import spark.implicits._
    val sampleRate = 16000
    val nFrames = 1600 // 100 ms
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) { // full-scale square wave → RMS ≈ 1.0
      val s = if (i % 2 == 0) 32767 else -32767
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, baos)
    val ds = Seq(MediaBlob(7L, "audio", baos.toByteArray, Map.empty)).toDS()
    val f = extractAudioFeatures(ds, MediaCodec.imageio).collect().head
    assert(f.sampleRate == sampleRate)
    assert(f.durationMs == 100L)
    assert(f.embedding.length == 8)
    f.embedding.foreach(e => assert(math.abs(e - 1.0f) < 0.01f, e.toString))
  }

  // ------------------------------------------------- golden fixtures --
  // Byte-level fixtures constructed OUTSIDE the JVM (hand-assembled PNG
  // and RIFF/WAV containers) with expected outputs computed independently
  // — unlike the tests above, neither the encoder nor the expectation
  // shares code with the codec under test, so a decode regression cannot
  // cancel itself out.

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // 3x2 truecolor PNG; pixel rows (r,g,b):
  //   (255,0,0) (0,255,0) (0,0,255)
  //   (10,20,30) (40,50,60) (200,150,100)
  private val GoldenPng = unhex(
    "89504e470d0a1a0a0000000d49484452000000030000000208020000001216f14d" +
    "0000001849444154789c63f8cfc0c000c15c22721a463627a6a500003575" +
    "0592f616ccc70000000049454e44ae426082")
  private val GoldenPixels = Array[Int](
    255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30, 40, 50, 60, 200, 150, 100)

  // 16-bit mono PCM WAV @8kHz: 16-sample ramp -32768 + 4096*i
  private val GoldenWav = unhex(
    "524946464400000057415645666d74201000000001000100401f0000803e0000" +
    "0200100064617461200000000080009000a000b000c000d000e000f000" +
    "000010002000300040005000600070")

  test("golden PNG decodes to the exact externally-computed pixel bytes") {
    import spark.implicits._
    val ds = Seq(MediaBlob(1L, "image", GoldenPng, Map.empty)).toDS()
    val out = decodeImages(ds, MediaCodec.imageio).collect().head
    assert(out.width == 3 && out.height == 2 && out.channels == 3)
    assert(out.pixels.map(_ & 0xff).toSeq === GoldenPixels.toSeq)
  }

  test("golden PNG resize matches the externally-computed NN result") {
    import spark.implicits._
    val ds = Seq(MediaBlob(1L, "image", GoldenPng, Map.empty)).toDS()
    val out = resize(decodeImages(ds, MediaCodec.imageio), 2, 2)
      .collect().head
    // nearest-neighbor 3x2 -> 2x2, source picks computed by hand:
    // (0,0)->(0,0) (1,0)->(1,0) / (0,1)->(0,1) (1,1)->(1,1)
    assert(out.pixels.map(_ & 0xff).toSeq ===
      Seq(255, 0, 0, 0, 255, 0, 10, 20, 30, 40, 50, 60))
  }

  test("golden WAV decodes to externally-computed PCM stats") {
    import spark.implicits._
    val ds = Seq(MediaBlob(2L, "audio", GoldenWav, Map.empty)).toDS()
    val f = extractAudioFeatures(ds, MediaCodec.imageio).collect().head
    assert(f.sampleRate == 8000)
    assert(f.durationMs == 2L) // 16 samples @ 8 kHz
    val expected = Seq(0.939581, 0.6903351, 0.4419417, 0.1976424,
      0.0883883, 0.3186887, 0.5659616, 0.8149003)
    assert(f.embedding.length == 8)
    f.embedding.zip(expected).zipWithIndex.foreach { case ((got, exp), i) =>
      assert(math.abs(got - exp) < 1e-5, s"band $i: $got vs $exp")
    }
  }

  test("frame sampling slices the exact externally-computed byte windows") {
    import spark.implicits._
    // 300-byte blob: n = min(4, 300/128) = 2 frames at indexes 0 and 8;
    // frameAt slices [index*16, index*16+16) → windows [0,16) and [128,144)
    val blob = Array.tabulate(300)(i => (i % 251).toByte)
    val ds = Seq(MediaBlob(3L, "video", blob, Map.empty)).toDS()
    val out = sampleFrames(ds).collect().head
    assert(out.frameIndexes.toSeq === Seq(0, 8))
    assert(out.frames(0).toSeq === blob.slice(0, 16).toSeq)
    assert(out.frames(1).toSeq === blob.slice(128, 144).toSeq)
  }

  test("repartitionForDecode sizes by blob bytes") {
    // tiny target → forces multiple partitions even at sf0.001
    val parts = repartitionForDecode(media, targetBytesPerPartition = 4096)
      .rdd.getNumPartitions
    assert(parts > 1)
  }
}
