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

  test("repartitionForDecode sizes by blob bytes") {
    // tiny target → forces multiple partitions even at sf0.001
    val parts = repartitionForDecode(media, targetBytesPerPartition = 4096)
      .rdd.getNumPartitions
    assert(parts > 1)
  }
}
