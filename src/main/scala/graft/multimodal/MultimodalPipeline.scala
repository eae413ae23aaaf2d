package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: media as opaque `binary`
  * columns + typed metadata, with decode / feature-extract / resize /
  * frame-sample as partition-local batch transforms.
  *
  * The Spark-side plumbing is real — schemas, encoders, iterator-based
  * `mapPartitions` (never materializing a partition), and blob-aware
  * repartitioning. Codecs are pluggable: [[MediaCodec.imageio]] is a REAL
  * decoder on JDK built-ins (javax.imageio images, javax.sound.sampled PCM
  * audio); [[MediaCodec.deterministic]] is a clearly-marked STUB used by the
  * oracle query (and for video, which needs ffmpeg). Swapping codecs changes
  * no plan shape.
  */
object MultimodalPipeline {

  /** A media row: opaque bytes + typed metadata. */
  final case class MediaBlob(
      id: Long,
      mediaType: String, // "image" | "audio" | "video"
      blob: Array[Byte],
      meta: Map[String, String])

  final case class DecodedImage(
      id: Long,
      width: Int,
      height: Int,
      channels: Int,
      pixels: Array[Byte])

  final case class AudioFeatures(
      id: Long,
      sampleRate: Int,
      durationMs: Long,
      embedding: Array[Float])

  final case class VideoFrames(
      id: Long,
      frameIndexes: Array[Int],
      frames: Array[Array[Byte]])

  /** Decode interface a real implementation would satisfy (libjpeg/ffmpeg/
    * javax.imageio behind JNI). Instantiated once per PARTITION, not per
    * row — the shape that amortizes codec init at scale. */
  trait MediaCodec extends Serializable {
    def decodeImage(blob: Array[Byte]): (Int, Int, Int, Array[Byte])
    def decodeAudio(blob: Array[Byte]): (Int, Long, Array[Float])
    def frameAt(blob: Array[Byte], index: Int): Array[Byte]

    /** Number of frames the container holds. Default mirrors the
      * deterministic stub's 16-byte slicing; real codecs override with the
      * container's actual frame count (see [[MediaCodec.imageio]] for
      * multi-frame GIF). */
    def frameCount(blob: Array[Byte]): Int = math.max(1, blob.length / 16)

    /** Decode the frames `pick(frameCount)` selects, in ONE container
      * session: returns (pickedIndexes, frames-in-pick-order) — the
      * indexes actually decoded, so callers never re-derive them. The
      * count probe is capped at `maxNeeded`: the CALLER guarantees
      * `pick(fc)` is invariant for all fc ≥ maxNeeded, which lets a
      * container codec stop parsing at the sample horizon instead of
      * walking a 10k-frame clip to sample 4 frames. The default composes
      * [[frameCount]] + [[frameAt]]; container-parsing codecs override so
      * a k-frame sample costs one bounded parse, not k+1 full ones
      * ([[MediaCodec.imageio]] reads ascending indexes off a single
      * reader). */
    def framesAt(blob: Array[Byte], maxNeeded: Int,
        pick: Int => Array[Int]): (Array[Int], Array[Array[Byte]]) = {
      val fc = math.min(frameCount(blob), maxNeeded)
      val idx = pick(fc)
      (idx, idx.map(frameAt(blob, _)))
    }
  }

  object MediaCodec {
    /** STUB codec — deterministic functions of the bytes, no media libs.
      * Replace with a real decoder in production; everything downstream
      * (schema, partitioning, batch shape) is unchanged. */
    val deterministic: MediaCodec = new MediaCodec {
      def decodeImage(blob: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
        val w = math.max(1, blob.length % 640)
        // ×7 in Long: an Int product overflows for blobs over ~306 MB and
        // would diverge from the oracle's BIGINT arithmetic
        val h = math.max(1, ((blob.length.toLong * 7) % 480).toInt)
        (w, h, 3, blob) // "pixels" = the raw bytes
      }
      def decodeAudio(blob: Array[Byte]): (Int, Long, Array[Float]) = {
        val emb = Array.tabulate(8)(i =>
          (if (blob.isEmpty) 0 else blob(i % blob.length).toInt) / 128.0f)
        (16000, blob.length.toLong, emb)
      }
      def frameAt(blob: Array[Byte], index: Int): Array[Byte] =
        blob.slice(index * 16, index * 16 + 16)
    }

    /** Real decoder on JDK built-ins, zero external deps: images via
      * javax.imageio (PNG/JPEG/GIF/BMP → packed RGB bytes), audio via
      * javax.sound.sampled (WAV/AIFF PCM → sample rate, duration, 8-band RMS
      * energy embedding), and multi-frame video via ImageIO's sequence
      * readers — animated GIF decodes for real ([[frameCount]]/[[frameAt]]
      * return the container's frames as packed RGB). Codecs ImageIO can't
      * read (MP4/H.264 need ffmpeg) are rejected with a clear error rather
      * than silently stubbed. */
    /** 8-band RMS energy embedding over a 16-bit PCM sample stream
      * (channels interleaved — energy is channel-agnostic for a coarse
      * fingerprint). Shared by [[imageio]] (WAV/AIFF) and [[ffmpeg]]
      * (decoded s16le) so both report the SAME embedding for the same
      * samples. */
    private def pcm16Bands8(
        bytes: Array[Byte], bigEndian: Boolean): Array[Float] = {
      val nSamples = bytes.length / 2
      val emb = new Array[Float](8)
      val counts = new Array[Int](8)
      var i = 0
      while (i + 1 < bytes.length) {
        val s: Int =
          if (bigEndian) (bytes(i) << 8) | (bytes(i + 1) & 0xff)
          else (bytes(i + 1) << 8) | (bytes(i) & 0xff)
        // ×8 in Long: an Int product wraps negative past 512 MB of PCM
        // (reachable via ffmpeg decodeAudio on hours-long recordings)
        val band = math.min(7L,
          (i / 2).toLong * 8 / math.max(1, nSamples)).toInt
        val v = s / 32768.0f
        emb(band) += v * v
        counts(band) += 1
        i += 2
      }
      var b = 0
      while (b < 8) {
        emb(b) = math.sqrt(emb(b) / math.max(1, counts(b))).toFloat
        b += 1
      }
      emb
    }

    val imageio: MediaCodec = new MediaCodec {
      private def packRgb(img: java.awt.image.BufferedImage): Array[Byte] = {
        val w = img.getWidth
        val h = img.getHeight
        val px = new Array[Byte](w * h * 3)
        var y = 0
        var i = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            px(i) = ((rgb >> 16) & 0xff).toByte
            px(i + 1) = ((rgb >> 8) & 0xff).toByte
            px(i + 2) = (rgb & 0xff).toByte
            i += 3
            x += 1
          }
          y += 1
        }
        px
      }

      /** ImageReader over in-memory bytes; caller must run `dispose()` via
        * the passed function. One reader per blob — codec-level init is per
        * partition, reader init is per row, which is the granularity a
        * container parse needs anyway. */
      private def withReader[A](blob: Array[Byte])(
          f: javax.imageio.ImageReader => A): A = {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(blob))
        var r: javax.imageio.ImageReader = null
        // iis must close even when no reader matches or setInput throws —
        // per-row catch-and-skip callers would otherwise leak a
        // MemoryCacheImageInputStream per corrupt blob
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          require(readers.hasNext, "unsupported or corrupt media container")
          r = readers.next()
          r.setInput(iis)
          f(r)
        } finally {
          if (r != null) r.dispose()
          iis.close()
        }
      }

      def decodeImage(blob: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(blob))
        require(img != null, "unsupported or corrupt image bytes")
        (img.getWidth, img.getHeight, 3, packRgb(img))
      }

      def decodeAudio(blob: Array[Byte]): (Int, Long, Array[Float]) = {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(blob))
        try {
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16,
            s"only 16-bit PCM supported, got ${fmt.getSampleSizeInBits}-bit")
          val durationMs =
            (ais.getFrameLength * 1000.0 / fmt.getFrameRate).toLong
          val bytes = ais.readAllBytes()
          (fmt.getSampleRate.toInt, durationMs,
            pcm16Bands8(bytes, fmt.isBigEndian))
        } finally ais.close()
      }

      /** Frame `index` of a multi-frame container (animated GIF) as packed
        * RGB — the raw frame raster as stored, not composited against prior
        * frames (fingerprinting wants the per-frame signal; a player would
        * composite). A single-frame container yields its one image at
        * index 0. */
      def frameAt(blob: Array[Byte], index: Int): Array[Byte] =
        withReader(blob)(r => packRgb(r.read(index)))

      override def frameCount(blob: Array[Byte]): Int =
        withReader(blob) { r =>
          // allowSearch=true walks the container for an exact count
          math.max(1, r.getNumImages(true))
        }

      /** Frame count, but never parsing past `cap` frames: uses the
        * container's cheap count when it knows one, else probes frame
        * HEADERS (getWidth, no pixel decode) up to the cap. */
      private def boundedFrameCount(
          r: javax.imageio.ImageReader, cap: Int): Int = {
        val known = r.getNumImages(false) // -1 when a search would be needed
        if (known >= 0) math.min(known, cap)
        else {
          var c = 0
          while (c < cap && (try { r.getWidth(c); true } catch {
              case _: IndexOutOfBoundsException => false
            })) c += 1
          c
        }
      }

      override def framesAt(blob: Array[Byte], maxNeeded: Int,
          pick: Int => Array[Int]): (Array[Int], Array[Array[Byte]]) =
        withReader(blob) { r =>
          val fc = math.max(1, boundedFrameCount(r, maxNeeded))
          val idx = pick(fc)
          // ascending reads reuse the reader's incremental decode state —
          // one container parse, bounded by the sample horizon
          (idx, idx.map(i => packRgb(r.read(i))))
        }
    }

    /** True when the ffmpeg binary exists and answers `-version` — the
      * gate for [[auto]] and for the skippable ffmpeg specs. */
    def ffmpegAvailable(bin: String = "ffmpeg"): Boolean =
      try {
        val p = new ProcessBuilder(bin, "-version")
          .redirectErrorStream(true).start()
        p.getInputStream.readAllBytes()
        p.waitFor() == 0
      } catch { case _: java.io.IOException => false }

    /** Parse a stream of concatenated binary PPM (P6) images — ffmpeg's
      * `image2pipe -c:v ppm` output — into (width, height, packedRGB)
      * frames. P6 is the one raster format whose payload IS the packed
      * RGB byte layout every downstream fingerprint expects, so no pixel
      * conversion happens here at all. */
    private[graft] def parsePpmFrames(
        bytes: Array[Byte]): Array[(Int, Int, Array[Byte])] = {
      val out = Array.newBuilder[(Int, Int, Array[Byte])]
      var pos = 0
      def token(): String = {
        // skip whitespace and '#'-comment lines between header fields
        while (pos < bytes.length &&
            (bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
          if (bytes(pos) == '#')
            while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          else pos += 1
        }
        val start = pos
        while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) pos += 1
        new String(bytes, start, pos - start, "US-ASCII")
      }
      while (pos < bytes.length) {
        val magic = token()
        if (magic.isEmpty) pos = bytes.length
        else {
          require(magic == "P6", s"expected P6 frame header, got '$magic'")
          val w = token().toInt
          val h = token().toInt
          val maxVal = token().toInt
          require(maxVal == 255, s"only 8-bit PPM supported, got maxval $maxVal")
          pos += 1 // the single whitespace byte after maxval
          val n = w * h * 3
          require(pos + n <= bytes.length, "truncated PPM frame payload")
          out += ((w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + n)))
          pos += n
        }
      }
      out.result()
    }

    /** EXTERNAL-PROCESS codec on ffmpeg: closes the "video beyond animated
      * GIF" gap (MP4/H.264/WebM/MKV — anything ffmpeg decodes) when the
      * binary exists on the executor image; [[auto]] falls back to
      * [[imageio]] otherwise, so no deployment is ever broken by a missing
      * binary.
      *
      * Process shape, sized for the per-partition decode stage:
      *  - One short-lived process per ROW (container parse granularity —
      *    same as imageio's one-reader-per-blob), launched from a codec
      *    instantiated once per partition. Process spawn (~1-2 ms) is noise
      *    against a video decode.
      *  - The blob goes through a TEMP FILE, not stdin: MP4 containers
      *    with a trailing moov atom need a seekable input, and a file
      *    sidesteps the stdin-writer deadlock entirely. The file lives in
      *    java.io.tmpdir (executor-local disk) and is deleted in finally.
      *  - Frames come back as concatenated P6 PPM on stdout — whose
      *    payload is already the packed-RGB layout the fingerprint
      *    expressions consume ([[parsePpmFrames]]).
      *  - [[framesAt]] is the hot path and does ONE decode run bounded by
      *    `-frames:v maxNeeded` — the sample horizon, never the whole
      *    clip. [[frameCount]] (exact, whole-clip) exists for completeness
      *    but samplers never call it.
      *  - Audio decodes to mono s16le at 16 kHz (`-ac 1 -ar 16000`) and
      *    reports the same 8-band RMS embedding family as [[imageio]].
      */
    def ffmpeg(bin: String = "ffmpeg", probeBin: String = "ffprobe"): MediaCodec =
      new MediaCodec {
        private def withTempFile[A](blob: Array[Byte])(f: String => A): A = {
          val tmp = java.nio.file.Files.createTempFile("graftmedia", ".bin")
          try {
            java.nio.file.Files.write(tmp, blob)
            f(tmp.toString)
          } finally java.nio.file.Files.deleteIfExists(tmp)
        }

        private def exec(cmd: Seq[String]): Array[Byte] = {
          val pb = new ProcessBuilder(cmd: _*)
          pb.redirectError(ProcessBuilder.Redirect.DISCARD)
          val p = pb.start()
          p.getOutputStream.close() // file input: nothing goes to stdin
          val out = p.getInputStream.readAllBytes()
          val rc = p.waitFor()
          require(rc == 0, s"${cmd.head} failed (rc=$rc) for: ${cmd.mkString(" ")}")
          out
        }

        private def decodeFrames(path: String, maxFrames: Int) =
          parsePpmFrames(exec(Seq(bin, "-v", "error", "-i", path,
            "-frames:v", maxFrames.toString,
            "-f", "image2pipe", "-c:v", "ppm", "pipe:1")))

        def decodeImage(blob: Array[Byte]): (Int, Int, Int, Array[Byte]) =
          withTempFile(blob) { path =>
            val frames = decodeFrames(path, 1)
            require(frames.nonEmpty, "ffmpeg produced no frames")
            val (w, h, px) = frames(0)
            (w, h, 3, px)
          }

        def decodeAudio(blob: Array[Byte]): (Int, Long, Array[Float]) =
          withTempFile(blob) { path =>
            val pcm = exec(Seq(bin, "-v", "error", "-i", path,
              "-f", "s16le", "-ac", "1", "-ar", "16000", "pipe:1"))
            val nSamples = pcm.length / 2
            (16000, nSamples * 1000L / 16000, pcm16Bands8(pcm, bigEndian = false))
          }

        /** O(index) — decodes the leading index+1 frames in one run and
          * keeps the last. Samplers use [[framesAt]]; this exists for the
          * point-lookup contract. */
        def frameAt(blob: Array[Byte], index: Int): Array[Byte] =
          withTempFile(blob) { path =>
            val frames = decodeFrames(path, index + 1)
            require(frames.length > index,
              s"container has only ${frames.length} frames, wanted $index")
            frames(index)._3
          }

        /** Exact count via ffprobe `-count_frames` — decodes the WHOLE
          * stream; sampling paths never pay this ([[framesAt]] is bounded). */
        override def frameCount(blob: Array[Byte]): Int =
          withTempFile(blob) { path =>
            val out = new String(exec(Seq(probeBin, "-v", "error",
              "-select_streams", "v:0", "-count_frames",
              "-show_entries", "stream=nb_read_frames",
              "-of", "csv=p=0", path)), "US-ASCII").trim
            math.max(1, out.toIntOption.getOrElse(1))
          }

        override def framesAt(blob: Array[Byte], maxNeeded: Int,
            pick: Int => Array[Int]): (Array[Int], Array[Array[Byte]]) =
          withTempFile(blob) { path =>
            // one decode run bounded by the sample horizon: ffmpeg stops
            // at maxNeeded frames; fewer back means that IS the count
            val frames = decodeFrames(path, maxNeeded)
            require(frames.nonEmpty, "ffmpeg produced no frames")
            val idx = pick(math.min(frames.length, maxNeeded))
            (idx, idx.map(i => frames(i)._3))
          }
      }

    /** The deployment-adaptive real codec: [[ffmpeg]] when the binary is on
      * the image (full container coverage), [[imageio]] otherwise (JDK
      * formats only, zero external deps). Evaluated once per JVM. */
    lazy val auto: MediaCodec =
      if (ffmpegAvailable()) ffmpeg() else imageio
  }

  /** Lift a DataFrame with (id, blob binary, media_type, meta) into the typed
    * media Dataset. */
  def asMedia(df: DataFrame): Dataset[MediaBlob] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("media_type").as("mediaType"),
      col("blob"), col("meta")).as[MediaBlob]
  }

  /** Size partitions by BLOB BYTES, not row count — media rows are wildly
    * variable (a 4K frame vs an icon); row-count partitioning creates
    * stragglers that stall a 1000-executor decode stage. */
  def repartitionForDecode(
      ds: Dataset[MediaBlob],
      targetBytesPerPartition: Long = 128L << 20): Dataset[MediaBlob] = {
    val total = ds.select(coalesce(sum(length(col("blob"))), lit(0L)))
      .head().getLong(0)
    val parts = math.max(1, math.ceil(total.toDouble / targetBytesPerPartition).toInt)
    ds.repartition(parts)
  }

  /** Decode images partition-locally: codec constructed once per partition,
    * rows streamed through the iterator (constant memory). */
  def decodeImages(
      ds: Dataset[MediaBlob],
      codec: MediaCodec = MediaCodec.deterministic): Dataset[DecodedImage] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(_.mediaType == "image").mapPartitions { it =>
      it.map { m =>
        val (w, h, c, px) = codec.decodeImage(m.blob)
        DecodedImage(m.id, w, h, c, px)
      }
    }
  }

  /** Nearest-neighbor resize on decoded images — pure math over the pixel
    * buffer, runs on real decoders unchanged. */
  def resize(
      ds: Dataset[DecodedImage],
      outW: Int,
      outH: Int): Dataset[DecodedImage] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { img =>
        val out = new Array[Byte](outW * outH * img.channels)
        var y = 0
        while (y < outH) {
          val sy = math.min(img.height - 1, y * img.height / outH)
          var x = 0
          while (x < outW) {
            val sx = math.min(img.width - 1, x * img.width / outW)
            var ch = 0
            while (ch < img.channels) {
              val src = (sy * img.width + sx) * img.channels + ch
              out((y * outW + x) * img.channels + ch) =
                if (src < img.pixels.length) img.pixels(src) else 0
              ch += 1
            }
            x += 1
          }
          y += 1
        }
        DecodedImage(img.id, outW, outH, img.channels, out)
      }
    }
  }

  /** Audio feature extraction (stub embedding; real MFCC/wav2vec drops in). */
  def extractAudioFeatures(
      ds: Dataset[MediaBlob],
      codec: MediaCodec = MediaCodec.deterministic): Dataset[AudioFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(_.mediaType == "audio").mapPartitions { it =>
      it.map { m =>
        val (sr, dur, emb) = codec.decodeAudio(m.blob)
        AudioFeatures(m.id, sr, dur, emb)
      }
    }
  }

  /** Sample every `stride`-th frame up to `maxFrames` per video. The frame
    * budget derives from the codec's [[MediaCodec.frameCount]], so a real
    * container (animated GIF under [[MediaCodec.imageio]]) is sampled by its
    * ACTUAL frame count; the stub's default (`blob.length / 16`) reproduces
    * the prior slicing arithmetic exactly (`⌊⌊L/16⌋/s⌋ = ⌊L/16s⌋`). */
  def sampleFrames(
      ds: Dataset[MediaBlob],
      stride: Int = 8,
      maxFrames: Int = 4,
      codec: MediaCodec = MediaCodec.deterministic): Dataset[VideoFrames] = {
    val spark = ds.sparkSession
    import spark.implicits._
    // (n-1)*stride < fc by construction: every sampled index is a real
    // frame for a frame-count-honest codec. pick(fc) is invariant for
    // fc >= maxFrames*stride (n saturates at maxFrames), which is the
    // contract that lets framesAt cap its count probe there.
    def pick(fc: Int): Array[Int] = {
      val n = math.min(maxFrames, math.max(1, fc / stride))
      Array.tabulate(n)(_ * stride)
    }
    ds.filter(_.mediaType == "video").mapPartitions { it =>
      it.map { m =>
        val (idx, frames) = codec.framesAt(m.blob, maxFrames * stride, pick)
        VideoFrames(m.id, idx, frames)
      }
    }
  }

  final case class ImageHash(id: Long, phash: Long)

  /** 64-bit difference hash (dHash) — the standard perceptual image
    * fingerprint: nearest-neighbor resize to 9×8 (via [[resize]], the same
    * kernel the golden fixtures pin), integer grayscale
    * `(299r + 587g + 114b) / 1000`, bit `y*8+x` set when
    * `gray(x,y) > gray(x+1,y)`. Robust to re-encoding (PNG vs BMP of the
    * same pixels hash identically — PerceptualDedupSpec pins it) and to
    * small-amplitude pixel noise; exact-equal or low-Hamming hashes flag
    * near-duplicate images. Partition-local and collect-free: the 100 TB
    * shape is decode → 72-byte thumbnail → 8-byte hash, so everything after
    * the decode stage shuffles 8 bytes per image. */
  def perceptualHash(ds: Dataset[DecodedImage]): Dataset[ImageHash] = {
    val spark = ds.sparkSession
    import spark.implicits._
    resize(ds, 9, 8).mapPartitions { it =>
      it.map { img =>
        require(img.channels == 3, s"dHash expects RGB, got ${img.channels}")
        val g = new Array[Int](72)
        var i = 0
        while (i < 72) {
          val base = i * 3
          val r = img.pixels(base) & 0xff
          val gg = img.pixels(base + 1) & 0xff
          val b = img.pixels(base + 2) & 0xff
          g(i) = (299 * r + 587 * gg + 114 * b) / 1000
          i += 1
        }
        var acc = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (g(y * 9 + x) > g(y * 9 + x + 1)) acc |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        ImageHash(img.id, acc)
      }
    }
  }

  /** Canonical demo modality derivation (blob bytes % 3 → image / audio /
    * video) — the ONE definition [[fromDocuments]] and every query that
    * subsets documents by modality (pipeline_media_dedup's base table)
    * must share, so keeper rows always join back to base rows. */
  def mediaTypeOf(nBytes: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    when(nBytes % 3 === 0, "image")
      .when(nBytes % 3 === 1, "audio")
      .otherwise("video")

  /** Demo source: documents table lifted into media blobs (text bytes as the
    * opaque payload — the same deterministic fake the multimodal_meta oracle
    * uses). */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaBlob] = {
    // NULL text would otherwise land in "video" with a NULL blob (every
    // when() condition is null) and NPE inside the decode mapPartitions;
    // the oracles' octet_length(...) % 3 predicates exclude NULLs the
    // same way
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("text").isNotNull)
    // round-17 note: a Tables.spread of this boundary was tried and
    // REVERTED — shuffling the blobs cost more than the decode
    // parallelism bought (dedup_phash_hamming 0.37→0.78 s,
    // pipeline_media_dedup 1.8→2.8 s in back-to-back bench runs); at
    // scale the caller-facing repartitionForDecode is the right knob.
    asMedia(d.select(
      col("doc_id").as("id"),
      encode(col("text"), "utf-8").as("blob"),
      mediaTypeOf(length(encode(col("text"), "utf-8"))).as("media_type"),
      map(lit("source"), col("source")).as("meta")))
  }
}
