package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: media as opaque
  * `binary` payloads + typed metadata, with decode / feature-extract /
  * resize / frame-sample stages (builder-prompt extension op).
  *
  * The Spark-side plumbing is real — schema, partition-friendly batch
  * shape (mapPartitions so per-batch decoder setup amortizes, the JVM
  * equivalent of `mapInPandas` batches), pushdown-friendly metadata
  * predicates. Codec status: PPM/PGM images decode for REAL
  * ([[Multimodal.PnmCodec]] — pure JVM byte parsing, no libraries), so
  * the decode stage is exercised honestly on one format; every other
  * format goes through the deterministic [[Multimodal.StubCodec]] (this
  * container has no image/audio libraries) — swap `MediaCodec` for a
  * full implementation to productionize.
  */
object Multimodal {

  case class MediaMeta(media_type: String, width: Int, height: Int,
                       duration_ms: Long, codec: String)
  case class MediaFile(media_id: Long, source: String, payload: Array[Byte],
                       meta: MediaMeta)
  case class DecodedMedia(media_id: Long, source: String, media_type: String,
                          width: Int, height: Int, n_frames: Int,
                          features: Array[Float])

  /** Codec seam: decode+featurize one payload. Serializable — shipped
    * inside mapPartitions tasks. */
  trait MediaCodec extends Serializable {
    def decode(payload: Array[Byte], meta: MediaMeta): (Int, Array[Float])
  }

  /** STUB: deterministic pseudo-decode — frame count from duration,
    * features from a rolling hash of the bytes. Real decode goes here. */
  class StubCodec(featureDim: Int = 8) extends MediaCodec {
    override def decode(payload: Array[Byte], meta: MediaMeta): (Int, Array[Float]) = {
      val nFrames = if (meta.media_type == "video")
        math.max(1, (meta.duration_ms / 40L).toInt) else 1
      var h = 1125899906842597L
      val features = new Array[Float](featureDim)
      var i = 0
      while (i < payload.length) {
        h = h * 31 + (payload(i) & 0xff)
        features(i % featureDim) += ((h % 1000) / 1000.0f)
        i += 1
      }
      (nFrames, features.map(f => f / math.max(1, payload.length / featureDim)))
    }
  }

  /** REAL codec for binary PPM (P6) / PGM (P5) images — pure JVM byte
    * parsing, no native libraries, so the decode stage of the pipeline
    * is exercised end-to-end on at least one honest format. Features:
    * [mean R, mean G, mean B, mean luma], each normalized to [0,1]
    * (PGM: gray replicated across channels). Formats beyond PNM still
    * go through [[StubCodec]] until real libraries are available. */
  class PnmCodec extends MediaCodec {
    override def decode(payload: Array[Byte], meta: MediaMeta): (Int, Array[Float]) = {
      var pos = 0
      def skipWs(): Unit = {
        var done = false
        while (!done && pos < payload.length) {
          val c = payload(pos).toChar
          if (c == '#') { while (pos < payload.length && payload(pos) != '\n') pos += 1 }
          else if (c.isWhitespace) pos += 1
          else done = true
        }
      }
      def token(): String = {
        skipWs(); val start = pos
        while (pos < payload.length && !payload(pos).toChar.isWhitespace) pos += 1
        new String(payload, start, pos - start, "US-ASCII")
      }
      val magic = token()
      require(magic == "P5" || magic == "P6", s"not a binary PGM/PPM payload: $magic")
      val w = token().toInt; val h = token().toInt; val maxval = token().toInt
      require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
      require(maxval > 0 && maxval < 256, s"unsupported maxval $maxval")
      pos += 1 // exactly one whitespace byte separates header and raster
      val channels = if (magic == "P6") 3 else 1
      val n = w * h
      require(payload.length - pos >= n * channels, "truncated raster")
      var r = 0L; var g = 0L; var b = 0L
      var i = pos; var px = 0
      while (px < n) {
        if (channels == 3) {
          r += payload(i) & 0xff; g += payload(i + 1) & 0xff
          b += payload(i + 2) & 0xff; i += 3
        } else { val v = payload(i) & 0xff; r += v; g += v; b += v; i += 1 }
        px += 1
      }
      val d = n.toFloat * maxval
      val mr = r / d; val mg = g / d; val mb = b / d
      (1, Array(mr, mg, mb, 0.299f * mr + 0.587f * mg + 0.114f * mb))
    }
  }

  /** REAL codec for the compressed formats the JDK decodes natively
    * (PNG always; JPEG/GIF/BMP per `ImageIO.getReaderFormatNames`) —
    * `javax.imageio` is public JDK, no container libraries needed, so
    * the decode seam runs a genuine inflate/unfilter pass, not a stub.
    * Same feature contract as [[PnmCodec]]: [mean R, mean G, mean B,
    * mean luma] normalized to [0,1]. */
  class ImageIoCodec extends MediaCodec {
    // one inflater per shipped codec instance (= per task), reset per
    // image inside PngDecoder — not one allocation per payload
    @transient private lazy val inflater = new java.util.zip.Inflater()
    override def decode(payload: Array[Byte], meta: MediaMeta): (Int, Array[Float]) = {
      val img = PngDecoder.decode(payload, inflater)
      require(img != null,
        s"ImageIO has no reader for this payload (declared codec: ${meta.codec})")
      val w = img.width; val h = img.height
      var r = 0L; var g = 0L; var b = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y) // sRGB-normalized regardless of storage
          r += (rgb >> 16) & 0xff; g += (rgb >> 8) & 0xff; b += rgb & 0xff
          x += 1
        }
        y += 1
      }
      val d = w.toFloat * h * 255
      val mr = r / d; val mg = g / d; val mb = b / d
      (1, Array(mr, mg, mb, 0.299f * mr + 0.587f * mg + 0.114f * mb))
    }
  }

  /** Deterministic synthetic PNG: pixel (x,y) of image `id` is a pure
    * integer formula of (id, x, y), dimensions a pure formula of id —
    * so an oracle that never sees a PNG can still state every decoded
    * pixel. The container ships no media testdata; this is the honest
    * substitute: the bytes go through a REAL deflate-compressed PNG
    * encode (`ImageIO.write`) and the pipeline must recover the exact
    * pixels from the compressed payload. */
  def synthPngBytes(id: Long): Array[Byte] = {
    val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 11 + y * 5) % 256).toInt
        val b = ((id * 7 + x * 3 + y * 19) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** (media_id) → (media_id, payload: binary PNG), map-side. */
  def synthPngMedia(ids: DataFrame): DataFrame = {
    import ids.sparkSession.implicits._
    ids.select(col("media_id")).as[Long]
      .mapPartitions(_.map(id => (id, synthPngBytes(id))))
      .toDF("media_id", "payload")
  }

  case class PngStats(media_id: Long, width: Int, height: Int,
                      channels: Int, checksum: Long)

  /** Decode PNG payloads (real `ImageIO` inflate) and emit per-image
    * geometry + a position-weighted pixel checksum:
    * Σ over pixels of (1 + x + y·w) · (R + 2G + 3B). Position weights
    * make the checksum sensitive to pixel ORDER, not just the bag of
    * values — a transposed or row-flipped decode cannot pass. Pure
    * map-side (mapPartitions batches, like [[decodeAndFeaturize]]);
    * at scale this is the shape of any decode stage: no shuffle until
    * the stats are grouped. */
  def pngDecodeStats(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val inf = new java.util.zip.Inflater() // per task, reset per image
        rows.map { case (id, bytes) =>
          val img = PngDecoder.decode(bytes, inf)
          require(img != null, s"payload of media_id=$id is not a decodable image")
          val w = img.width; val h = img.height
          var sum = 0L; var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
              sum += (1L + x + y.toLong * w) * (r + 2L * g + 3L * b)
              x += 1
            }
            y += 1
          }
          PngStats(id, w, h, img.bands, sum)
        }
      }.toDF()
  }

  /** [[synthPngBytes]]'s NEAR-DUPLICATE variant generator for the
    * perceptual-dedup stage (m6): media_id 2k and 2k+1 render the SAME
    * base image (formula of base = media_id/2) with a per-variant
    * brightness shift of (media_id%2)·3 on every channel, clamped at
    * 255 — the LAION-style "same picture, re-encoded slightly
    * brighter" twin. A uniform brightness shift preserves every
    * strict luma gradient except where clamping binds, so twins land
    * within a few dHash bits of each other. Pixels come from a
    * NONLINEAR product formula (unlike m2's linear one, whose
    * near-constant gradients would make every image's dHash similar):
    * the per-cell pattern is pseudorandom per base, so DISTINCT bases
    * sit ~half the hash bits apart and never survive the ≤3 verify.
    * Same honest encode path as m2: real deflate PNG via ImageIO, and
    * an oracle that never sees a PNG can replay every pixel
    * (LEAST(formula + delta, 255)). */
  def synthPngVariantBytes(id: Long): Array[Byte] = {
    val base = id / 2
    val delta = (id % 2).toInt * 3
    val w = (8 + base % 9).toInt; val h = (8 + base % 7).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = math.min(
          (((base * 31 + 7) * (x + 3) * (y + 5)) % 256).toInt + delta, 255)
        val g = math.min(
          (((base * 17 + 5) * (x + 11) * (y + 2)) % 256).toInt + delta, 255)
        val b = math.min(
          (((base * 7 + 13) * (x + 2) * (y + 7)) % 256).toInt + delta, 255)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** (media_id) → (media_id, payload: binary PNG variant), map-side. */
  def synthPngVariantMedia(ids: DataFrame): DataFrame = {
    import ids.sparkSession.implicits._
    ids.select(col("media_id")).as[Long]
      .mapPartitions(_.map(id => (id, synthPngVariantBytes(id))))
      .toDF("media_id", "payload")
  }

  /** PERCEPTUAL dHash over real PNG payloads — the fingerprint of the
    * LAION-style image near-dup stage: ImageIO inflate, the m4
    * nearest-neighbor resample to a `gw`×`gh` INTEGER-luma grid
    * (luma×1000 = 299R + 587G + 114B — scaled to stay integer, order
    * comparisons unaffected), then one bit per horizontal gradient:
    * bit (y·(gw−1)+x) = 1 iff luma(x+1,y) > luma(x,y) (strict).
    * Default 9×7 grid ⇒ 56 bits, so the hash, every band slice, and
    * XOR/popcount stay comfortably inside a signed BIGINT on both
    * engines. Every step is integer arithmetic on the replayable
    * resample rule, so an oracle that never decodes a PNG states the
    * exact hash from the generating pixel formula. Map-side
    * (mapPartitions) like every decode stage; no shuffle until the
    * banding join. Returns (media_id, dhash). */
  def pngDHash(media: DataFrame, gw: Int = 9, gh: Int = 7): DataFrame = {
    require(gw >= 2 && gh >= 1 && (gw - 1) * gh <= 62,
      s"dHash grid ${gw}x$gh must fit a signed long: (gw-1)*gh <= 62")
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val inf = new java.util.zip.Inflater() // per task, reset per image
        rows.map { case (id, bytes) =>
          val img = PngDecoder.decode(bytes, inf)
          require(img != null, s"payload of media_id=$id is not a decodable image")
          val w = img.width; val h = img.height
          val luma = Array.ofDim[Long](gh, gw)
          var y = 0
          while (y < gh) {
            val sy = y * h / gh
            var x = 0
            while (x < gw) {
              val sx = x * w / gw
              val rgb = img.getRGB(sx, sy)
              val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              luma(y)(x) = 299L * r + 587L * g + 114L * b
              x += 1
            }
            y += 1
          }
          var hash = 0L
          y = 0
          while (y < gh) {
            var x = 0
            while (x < gw - 1) {
              if (luma(y)(x + 1) > luma(y)(x))
                hash |= 1L << (y * (gw - 1) + x)
              x += 1
            }
            y += 1
          }
          (id, hash)
        }
      }.toDF("media_id", "dhash")
  }

  /** Deterministic 16-bit PCM mono WAV: RIFF/fmt/data chunks written
    * byte-for-byte (little-endian), samples from an integer formula of
    * (id, position) so an oracle can recompute every statistic without
    * ever seeing a WAV container. 200 + id%100 samples at 8 kHz. */
  def synthWavBytes(id: Long): Array[Byte] = {
    val n = (200 + id % 100).toInt
    val rate = 8000
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    bb.put("RIFF".getBytes(ascii)); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes(ascii))
    bb.put("fmt ".getBytes(ascii)); bb.putInt(16)
    bb.putShort(1) /* PCM */ ; bb.putShort(1) /* mono */
    bb.putInt(rate); bb.putInt(rate * 2) /* byte rate */
    bb.putShort(2) /* block align */ ; bb.putShort(16) /* bits */
    bb.put("data".getBytes(ascii)); bb.putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort((((id * 131 + i * 17) % 65536) - 32768).toShort)
      i += 1
    }
    bb.array()
  }

  /** (media_id) → (media_id, payload: binary WAV), map-side. */
  def synthWavMedia(ids: DataFrame): DataFrame = {
    import ids.sparkSession.implicits._
    ids.select(col("media_id")).as[Long]
      .mapPartitions(_.map(id => (id, synthWavBytes(id))))
      .toDF("media_id", "payload")
  }

  case class WavStats(media_id: Long, sample_rate: Int, n_samples: Int,
                      pos_checksum: Long, energy: Long)

  /** Decode WAV payloads through the real JDK audio stack
    * (`javax.sound.sampled.AudioSystem` parses the RIFF container and
    * hands back typed frames) and emit per-clip stats in INTEGER
    * arithmetic: a position-weighted sample checksum Σ(1+i)·sᵢ (order-
    * sensitive — a byte-swapped or truncated decode cannot pass) and
    * the energy Σsᵢ² (the integer form of RMS). Pure map-side, same
    * batch shape as [[pngDecodeStats]]; audio libs beyond the JDK are
    * stubbed at the [[MediaCodec]] seam, but the container path here is
    * the real thing. */
  def wavDecodeStats(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
            s"media_id=$id: expected 16-bit mono PCM, got $fmt")
          val frames = ais.getFrameLength.toInt
          val buf = ais.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(buf).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          var i = 0; var pos = 0L; var energy = 0L
          while (i < frames) {
            val s = bb.getShort(i * 2).toLong
            pos += (1L + i) * s
            energy += s * s
            i += 1
          }
          WavStats(id, fmt.getSampleRate.toInt, frames, pos, energy)
        }
      }.toDF()
  }

  /** Decode + feature-extract in partition batches. Codec construction
    * happens once per partition (the expensive part with a real codec),
    * rows stream through — same batch shape `mapInPandas` gives Python. */
  def decodeAndFeaturize(media: Dataset[MediaFile],
                         codec: MediaCodec): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (nFrames, features) = codec.decode(m.payload, m.meta)
        DecodedMedia(m.media_id, m.source, m.meta.media_type,
          m.meta.width, m.meta.height, nFrames, features)
      }
    }
  }

  /** Metadata-only predicates stay columnar — never touch the payload
    * (at 100 TB the payload column must not be read for a filter). */
  def filterByMeta(media: DataFrame, minWidth: Int, mediaTypes: Seq[String]): DataFrame =
    media.where(col("meta.width") >= minWidth &&
      col("meta.media_type").isin(mediaTypes: _*))

  /** Frame sampling plan for videos: every `stride`-th frame index up to
    * `maxFrames` — pure Column arithmetic (the decode of the selected
    * frames is the stubbed stage; [[rawVideoFrameSample]] is the REAL
    * container-parsing sibling). */
  def frameSamplePlan(decoded: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    decoded.where(col("media_type") === "video")
      .withColumn("sampled_frames",
        slice(sequence(lit(0), col("n_frames") - 1, lit(stride)), 1, maxFrames))
      .withColumn("n_sampled", size(col("sampled_frames")))

  /** Resize plumbing: records the target geometry per row (aspect-fit),
    * payload transform stubbed ([[pngResizeStats]] is the REAL-decode
    * sibling). */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(maxSide) / col("meta.width").cast("double"),
      lit(maxSide) / col("meta.height").cast("double"), lit(1.0))
    media
      .withColumn("target_width", floor(col("meta.width") * scale).cast("int"))
      .withColumn("target_height", floor(col("meta.height") * scale).cast("int"))
  }

  // ------------------------------------- real resize / frame sampling

  case class ResizedStats(media_id: Long, src_width: Int, src_height: Int,
                          out_width: Int, out_height: Int, checksum: Long)

  /** REAL image resize over real PNG payloads: ImageIO inflate, then an
    * explicit nearest-neighbor sample to a fixed `tw`×`th` target —
    * src pixel (x·w div tw, y·h div th), integer arithmetic only, so
    * the resample rule (unlike Graphics2D's implementation-defined
    * filtering) is replayable from the synthetic pixel formula by an
    * engine that never decodes a PNG. Emits the m2-style
    * position-weighted checksum of the RESIZED raster. Map-side
    * (mapPartitions), no shuffle until the caller aggregates — the
    * shape of every thumbnail/downsample stage at scale. */
  def pngResizeStats(media: DataFrame, tw: Int, th: Int): DataFrame = {
    require(tw >= 1 && th >= 1)
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val inf = new java.util.zip.Inflater() // per task, reset per image
        rows.map { case (id, bytes) =>
          val img = PngDecoder.decode(bytes, inf)
          require(img != null, s"payload of media_id=$id is not a decodable image")
          val w = img.width; val h = img.height
          var sum = 0L; var y = 0
          while (y < th) {
            val sy = y * h / th
            var x = 0
            while (x < tw) {
              val sx = x * w / tw
              val rgb = img.getRGB(sx, sy)
              val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
              sum += (1L + x + y.toLong * tw) * (r + 2L * g + 3L * b)
              x += 1
            }
            y += 1
          }
          ResizedStats(id, w, h, tw, th, sum)
        }
      }.toDF()
  }

  /** Deterministic raw-video container ("RAWV"): 4-byte magic, then
    * big-endian int32 nFrames/width/height, then nFrames packed RGB
    * frames with pixel channels from an integer formula of
    * (id, frame, x, y) — a house container (like the PPM codec) so the
    * frame-sampling DECODE below is a real byte-level parse while an
    * oracle recomputes every statistic from the formula without ever
    * seeing the container. 3 + id%5 frames of (4 + id%3)×(4 + id%4). */
  def synthRawVideoBytes(id: Long): Array[Byte] = {
    val f = (3 + id % 5).toInt; val w = (4 + id % 3).toInt; val h = (4 + id % 4).toInt
    val buf = java.nio.ByteBuffer.allocate(16 + f * w * h * 3)
    buf.put("RAWV".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    buf.putInt(f).putInt(w).putInt(h)
    var fi = 0
    while (fi < f) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          buf.put(((id * 31 + fi * 29 + x * 7 + y * 13) % 256).toByte)
          buf.put(((id * 17 + fi * 23 + x * 11 + y * 5) % 256).toByte)
          buf.put(((id * 7 + fi * 19 + x * 3 + y * 19) % 256).toByte)
          x += 1
        }
        y += 1
      }
      fi += 1
    }
    buf.array()
  }

  /** (media_id) → (media_id, payload: RAWV bytes), map-side. */
  def synthRawVideoMedia(ids: DataFrame): DataFrame = {
    import ids.sparkSession.implicits._
    ids.select(col("media_id")).as[Long]
      .mapPartitions(_.map(id => (id, synthRawVideoBytes(id))))
      .toDF("media_id", "payload")
  }

  case class FrameSampleStats(media_id: Long, n_frames: Int, width: Int,
                              height: Int, n_sampled: Int, checksum: Long)

  /** REAL frame sampling: parse the RAWV container byte-for-byte, keep
    * every `stride`-th frame up to `maxFrames` (indices 0, stride, …),
    * and checksum only the SAMPLED frames' pixels — weight
    * (1 + x + y·w) · (1 + frame index) · (R + 2G + 3B), so a sampler
    * that reads the wrong frames or the wrong byte offsets cannot
    * pass. Skipped frames' bytes are never touched past the seek — at
    * scale that is the point of stride sampling: decode cost scales
    * with SAMPLED frames, not stored ones. */
  def rawVideoFrameSample(media: DataFrame, stride: Int,
                          maxFrames: Int): DataFrame = {
    require(stride >= 1 && maxFrames >= 1)
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val buf = java.nio.ByteBuffer.wrap(bytes)
          val magic = new Array[Byte](4); buf.get(magic)
          require(new String(magic, java.nio.charset.StandardCharsets.US_ASCII) == "RAWV",
            s"media_id=$id is not a RAWV container")
          val f = buf.getInt; val w = buf.getInt; val h = buf.getInt
          val frameBytes = w * h * 3
          var sum = 0L; var sampled = 0; var fi = 0
          while (fi < f && sampled < maxFrames) {
            val base = 16 + fi * frameBytes
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = base + (y * w + x) * 3
                val r = bytes(p) & 0xff; val g = bytes(p + 1) & 0xff
                val b = bytes(p + 2) & 0xff
                sum += (1L + x + y.toLong * w) * (1L + fi) * (r + 2L * g + 3L * b)
                x += 1
              }
              y += 1
            }
            sampled += 1
            fi += stride
          }
          FrameSampleStats(id, f, w, h, sampled, sum)
        }
      }.toDF()
  }
}
