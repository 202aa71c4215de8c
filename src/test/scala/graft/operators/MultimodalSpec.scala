package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import Multimodal._

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val media: Seq[MediaFile] = {
    // synthesize binary payloads from document text (no media libs in
    // this container — payload content is opaque to the plumbing anyway)
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(20).collect()
    docs.zipWithIndex.map { case (r, i) =>
      val bytes = r.getAs[String]("text").getBytes("UTF-8")
      val mt = Seq("image", "video", "audio")(i % 3)
      MediaFile(r.getAs[Long]("doc_id"), r.getAs[String]("source"), bytes,
        MediaMeta(mt, width = 640 + i * 10, height = 480, duration_ms = 2000L * (i + 1),
          codec = "fake"))
    }.toSeq
  }

  test("decode+featurize: batch shape, deterministic stub features") {
    val ds = media.toDS().repartition(3)
    val out1 = decodeAndFeaturize(ds, new StubCodec(8)).collect()
      .map(d => d.media_id -> d.features.toSeq).toMap
    val out2 = decodeAndFeaturize(ds.repartition(5), new StubCodec(8)).collect()
      .map(d => d.media_id -> d.features.toSeq).toMap
    assert(out1 === out2) // partitioning must not change results
    assert(out1.values.forall(_.length === 8))
  }

  test("PnmCodec decodes real PPM/PGM payloads through the Spark pipeline") {
    // P6 2x2, maxval 255: pixels red, green, blue, white
    val ppm = ("P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](
      255.toByte, 0, 0,  0, 255.toByte, 0,
      0, 0, 255.toByte,  255.toByte, 255.toByte, 255.toByte))
    // P5 2x1 with a header comment: gray 0 and 255
    val pgm = ("P5\n# synthetic\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](0, 255.toByte))
    val files = Seq(
      MediaFile(1L, "ppm", ppm, MediaMeta("image", 2, 2, 0L, "ppm")),
      MediaFile(2L, "pgm", pgm, MediaMeta("image", 2, 1, 0L, "pgm")))
    val out = decodeAndFeaturize(files.toDS(), new PnmCodec).collect()
      .map(d => d.media_id -> d.features).toMap
    // mean of (255,0,0,255)/4 per channel = 127.5/255 = 0.5 exactly
    val Array(r, g, b, luma) = out(1L)
    assert(r === 0.5f && g === 0.5f && b === 0.5f)
    assert(math.abs(luma - 0.5f) < 1e-6)
    val Array(r2, g2, b2, _) = out(2L)
    assert(r2 === 0.5f && g2 === 0.5f && b2 === 0.5f)
    // malformed payloads are rejected, not silently featurized
    intercept[IllegalArgumentException](
      new PnmCodec().decode("JFIF-not-pnm".getBytes, files.head.meta))
    intercept[IllegalArgumentException](
      new PnmCodec().decode("P6\n9 9\n255\nxx".getBytes, files.head.meta))
  }

  test("ImageIoCodec decodes real PNG payloads through the codec seam") {
    // a genuine deflate-compressed PNG, not a stub: encode a known 2x2
    // image, decode through the MediaCodec seam, check exact means
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    // PNG magic bytes prove this went through a real container format
    assert((png(0) & 0xff) === 0x89 && png(1).toChar === 'P')
    val files = Seq(MediaFile(1L, "png", png, MediaMeta("image", 2, 2, 0L, "png")))
    val out = decodeAndFeaturize(files.toDS(), new ImageIoCodec).collect()
    val Array(r, g, b, luma) = out.head.features
    assert(r === 0.5f && g === 0.5f && b === 0.5f)
    assert(math.abs(luma - 0.5f) < 1e-6)
    // garbage bytes are rejected, not silently featurized
    intercept[IllegalArgumentException](
      new ImageIoCodec().decode("not-a-png".getBytes, files.head.meta))
  }

  test("pngDecodeStats: decode(encode(x)) recovers every pixel — checksum matches the generating formula") {
    val ids = Seq(0L, 7L, 50L, 123L, 9999L)
    val stats = pngDecodeStats(synthPngMedia(ids.toDF("media_id")))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    ids.foreach { id =>
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      var expected = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val r = (id * 31 + x * 7 + y * 13) % 256
        val g = (id * 17 + x * 11 + y * 5) % 256
        val b = (id * 7 + x * 3 + y * 19) % 256
        expected += (1L + x + y.toLong * w) * (r + 2 * g + 3 * b)
      }
      assert(stats(id) === ((w, h, 3, expected)),
        s"id=$id decoded ${stats(id)}, formula says (${w},${h},3,$expected)")
    }
    // the payloads really are PNG containers, not raw rasters
    val payload = synthPngBytes(123L)
    assert((payload(0) & 0xff) === 0x89 && payload(1).toChar === 'P')
  }

  test("wavDecodeStats: decode(encode(x)) recovers every sample — stats match the generating formula") {
    val ids = Seq(0L, 3L, 40L, 123L, 9999L)
    val stats = wavDecodeStats(synthWavMedia(ids.toDF("media_id")))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    ids.foreach { id =>
      val n = (200 + id % 100).toInt
      var pos = 0L; var energy = 0L
      for (i <- 0 until n) {
        val s = (id * 131 + i * 17) % 65536 - 32768
        pos += (1L + i) * s
        energy += s * s
      }
      assert(stats(id) === ((8000, n, pos, energy)),
        s"id=$id decoded ${stats(id)}, formula says (8000,$n,$pos,$energy)")
    }
    // the payloads really are RIFF containers the JDK audio stack parses
    val payload = synthWavBytes(123L)
    assert(new String(payload.take(4), "US-ASCII") === "RIFF")
    assert(new String(payload.slice(8, 12), "US-ASCII") === "WAVE")
  }

  test("metadata filters never need the payload (pruned scan shape)") {
    val df = media.toDS().toDF()
    val filtered = filterByMeta(df, minWidth = 700, mediaTypes = Seq("image", "video"))
    val plan = filtered.select(col("media_id"), col("meta.width"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("payload"), s"payload column not pruned:\n$plan")
    assert(filtered.count() > 0)
  }

  test("frame sampling plan: stride + cap") {
    val decoded = decodeAndFeaturize(media.toDS(), new StubCodec()).toDF()
    val sampled = frameSamplePlan(decoded, stride = 10, maxFrames = 5)
    val rows = sampled.select("n_frames", "n_sampled").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected = math.min(5, (r.getInt(0) + 9) / 10)
      assert(r.getInt(1) === expected)
    }
  }

  test("resize plan preserves aspect ratio and never upscales") {
    val df = media.toDS().toDF()
    val resized = resizePlan(df, maxSide = 320).collect()
    resized.foreach { r =>
      val tw = r.getAs[Int]("target_width"); val th = r.getAs[Int]("target_height")
      assert(tw <= 640 + 200 && th <= 320)
      assert(tw <= r.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("width"))
    }
  }

  test("real NN resize at source geometry is the identity: checksum equals the m2 decode checksum") {
    // src pixel (x·w div w, y·h div h) = (x, y) — resizing to the
    // source size must reproduce pngDecodeStats' checksum exactly, so
    // the NN loop provably reads the raster at the right offsets
    val ids = spark.range(1, 6).select(col("id").as("media_id"))
    val png = synthPngMedia(ids)
    val decode = pngDecodeStats(png).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("checksum")).toMap
    decode.keys.foreach { id =>
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      val res = pngResizeStats(png.where(col("media_id") === id), w, h)
        .collect().head
      assert(res.getAs[Long]("checksum") === decode(id),
        s"identity resize must equal the decode checksum for id=$id")
    }
  }

  test("PngDecoder fast path ≡ ImageIO pixel-for-pixel; non-truecolor falls back") {
    val inf = new java.util.zip.Inflater()
    // every synth generator shape (w/h cycles, filters chosen by the
    // encoder) plus both brightness variants — the exact hot-path inputs
    val payloads =
      (0L until 40L).map(Multimodal.synthPngBytes) ++
      (0L until 40L).map(Multimodal.synthPngVariantBytes)
    payloads.foreach { bytes =>
      val fast = PngDecoder.decode(bytes, inf)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(fast.width === ref.getWidth && fast.height === ref.getHeight)
      assert(fast.bands === ref.getRaster.getNumBands)
      for (y <- 0 until ref.getHeight; x <- 0 until ref.getWidth)
        assert(fast.getRGB(x, y) === ref.getRGB(x, y), s"($x,$y)")
    }
    // a shape the fast path must refuse (grayscale PNG): the fallback
    // still decodes, with ImageIO's own packing
    val gray = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 4; x <- 0 until 5) gray.getRaster.setSample(x, y, 0, (x * 50 + y) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gray, "png", bos)
    val g = PngDecoder.decode(bos.toByteArray, inf)
    val gref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
    assert(g.bands === gref.getRaster.getNumBands)
    for (y <- 0 until 4; x <- 0 until 5)
      assert(g.getRGB(x, y) === gref.getRGB(x, y))
    // garbage bytes: null, not an exception (callers own the require)
    assert(PngDecoder.decode(Array[Byte](1, 2, 3), inf) == null)
  }

  test("pngDHash: the decoded-raster hash equals the pixel-formula replay bit for bit") {
    // replicate the oracle's math in plain Scala: clamped-brightness
    // pixel formula -> NN resample to 9x7 -> integer luma -> gradient
    // bits. A match proves the REAL decode+resample path lands on the
    // same raster the formula states.
    def expected(id: Long): Long = {
      val base = id / 2; val delta = (id % 2) * 3
      val w = 8 + base % 9; val h = 8 + base % 7
      def luma(gx: Long, gy: Long): Long = {
        val sx = gx * w / 9; val sy = gy * h / 7
        val r = math.min((base * 31 + 7) * (sx + 3) * (sy + 5) % 256 + delta, 255)
        val g = math.min((base * 17 + 5) * (sx + 11) * (sy + 2) % 256 + delta, 255)
        val b = math.min((base * 7 + 13) * (sx + 2) * (sy + 7) % 256 + delta, 255)
        299 * r + 587 * g + 114 * b
      }
      (for (y <- 0L until 7L; x <- 0L until 8L
            if luma(x + 1, y) > luma(x, y))
        yield 1L << (y * 8 + x)).sum
    }
    val ids = spark.range(0, 24).select(col("id").as("media_id"))
    val got = pngDHash(synthPngVariantMedia(ids)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 24L).foreach(id =>
      assert(got(id) === expected(id), s"dhash mismatch for media_id=$id"))
  }

  test("perceptual near-dup: brightness twins pair, distinct bases do not; components group the twins") {
    val ids = spark.range(0, 40).select(col("id").as("media_id"))
    val hashes = pngDHash(synthPngVariantMedia(ids))
    val pairs = Dedup.hammingNearDupPairs(hashes, "media_id", "dhash",
      bits = 56, maxDist = 3, bands = 4)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted twin (2k, 2k+1) must surface...
    (0L until 20L).foreach(k =>
      assert(got.contains((2 * k, 2 * k + 1)), s"twin pair of base $k missed"))
    // ...and nothing else (distinct bases sit ~half the bits apart)
    assert(got === (0L until 20L).map(k => (2 * k, 2 * k + 1)).toSet)
    val comps = Dedup.connectedComponents(
        pairs.select(col("id1"), col("id2")), assumeDistinctPairs = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 20L).foreach { k =>
      assert(comps(2 * k) === 2 * k && comps(2 * k + 1) === 2 * k)
    }
  }

  test("c18 stage: imageDedupKept drops exactly the non-canonical twin members, keeps singletons") {
    // cohort doc ids 0,3,6,9,12 → media 0..4: twin clusters {0,1} (docs
    // 0,3) and {2,3} (docs 6,9); media 4 (doc 12) is a singleton. The
    // min-id canonical of each cluster keeps; its twin drops.
    val gated = Seq((0L, "s", "t0"), (3L, "s", "t3"), (6L, "s", "t6"),
      (9L, "s", "t9"), (12L, "s", "t12")).toDF("doc_id", "source", "text")
    val kept = graft.queries.CurationStages.imageDedupKept(gated)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(0L, 6L, 12L))
  }

  test("hammingNearDupPairs: candidates never leave their band bucket (plan pin) and recall contract is enforced") {
    val hashes = Seq((1L, 7L), (2L, 7L), (3L, 1024L)).toDF("id", "h")
    val pairs = Dedup.hammingNearDupPairs(hashes, "id", "h",
      bits = 56, maxDist = 3, bands = 4)
    val plan = pairs.queryExecution.executedPlan.toString
    // the self-join must key on (band, bucket) — never a cross product
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("band") && plan.contains("bucket"))
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((1L, 2L)))
    // pigeonhole: dist >= bands cannot guarantee recall — reject loudly
    intercept[IllegalArgumentException](
      Dedup.hammingNearDupPairs(hashes, "id", "h", 56, maxDist = 4, bands = 4))
    intercept[IllegalArgumentException](
      Dedup.hammingNearDupPairs(hashes, "id", "h", 57, maxDist = 3, bands = 4))
  }

  test("real frame sampling: stride 1 with no cap reads every frame; stride skips exactly") {
    val ids = spark.range(1, 8).select(col("id").as("media_id"))
    val vids = synthRawVideoMedia(ids)
    val full = rawVideoFrameSample(vids, stride = 1, maxFrames = 100)
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("n_frames"), r.getAs[Int]("n_sampled")))).toMap
    full.foreach { case (id, (f, s)) =>
      assert(s === f, s"stride=1 uncapped must sample all $f frames (id=$id)")
      assert(f === (3 + id % 5).toInt)
    }
    val strided = rawVideoFrameSample(vids, stride = 3, maxFrames = 2)
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("n_frames"), r.getAs[Int]("n_sampled")))).toMap
    strided.foreach { case (id, (f, s)) =>
      assert(s === math.min(2, (f + 2) / 3), s"id=$id f=$f s=$s")
    }
  }
}
