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

  test("repartitionForDecode sizes by blob bytes") {
    // tiny target → forces multiple partitions even at sf0.001
    val parts = repartitionForDecode(media, targetBytesPerPartition = 4096)
      .rdd.getNumPartitions
    assert(parts > 1)
  }
}
