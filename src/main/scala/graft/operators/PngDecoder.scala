package graft.operators

import java.util.zip.Inflater

/** Minimal PNG decoder for the pipeline's hot image-decode stages
  * (m2/m4/m6/m7/c18): parses exactly the shape `ImageIO.write(_, "png")`
  * emits for a `TYPE_INT_RGB` raster — 8-bit truecolor (color type 2),
  * non-interlaced, zlib IDAT — and falls back to `ImageIO.read` for any
  * other PNG/JPEG/GIF/BMP payload, so pixels are identical by
  * construction on every input (PNG is lossless; the m2 checksum and
  * the dHash oracles replay every pixel and would fail loudly on any
  * defilter bug).
  *
  * Why not ImageIO on the hot path: per image it walks the reader
  * registry, allocates a fresh `PNGImageReader` + `Inflater`, and (with
  * the default `ImageIO.getUseCache`) backs the stream with a TEMP FILE
  * — at 100 TB of images that is file-system churn and allocation
  * pressure in the hottest multimodal stage. Here the caller owns ONE
  * [[Inflater]] per task (`mapPartitions` closure), reset per image,
  * and decode is two linear passes (inflate, defilter) into a reused
  * packed-int raster shape. The fallback path also disables the ImageIO
  * disk cache (memory-cache streams) — same pixels, no temp files.
  */
object PngDecoder {
  // fallback must never write temp files on executors
  javax.imageio.ImageIO.setUseCache(false)

  /** Decoded raster with `BufferedImage.getRGB` packing (0xFFRRGGBB);
    * `bands` = raster band count (3 for truecolor — the fast path's
    * only shape; the fallback reports the real raster's). */
  final class RgbImage(val width: Int, val height: Int, val bands: Int,
                       val argb: Array[Int]) {
    @inline def getRGB(x: Int, y: Int): Int = argb(y * width + x)
  }

  /** Decode any payload ImageIO could decode; null when neither path
    * can (callers keep their `require(img != null, ...)` contract). */
  def decode(bytes: Array[Byte], inf: Inflater): RgbImage = {
    val fast = decodeRgb8OrNull(bytes, inf)
    if (fast != null) return fast
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    new RgbImage(w, h, img.getRaster.getNumBands, img.getRGB(0, 0, w, h, null, 0, w))
  }

  private final val Sig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  @inline private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  /** The native path: 8-bit color-type-2 non-interlaced PNG, or null
    * for anything else (caller falls back). */
  private def decodeRgb8OrNull(b: Array[Byte], inf: Inflater): RgbImage = {
    // signature + IHDR (always the first chunk, length 13)
    if (b.length < 45) return null
    var i = 0
    while (i < 8) { if (b(i) != Sig(i)) return null; i += 1 }
    if (be32(b, 8) != 13 || b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
      return null
    val w = be32(b, 16); val h = be32(b, 20)
    val bitDepth = b(24); val colorType = b(25)
    val interlace = b(28)
    if (bitDepth != 8 || colorType != 2 || b(26) != 0 || b(27) != 0 || interlace != 0)
      return null
    if (w <= 0 || h <= 0 || w.toLong * h > Int.MaxValue / 4) return null

    // chunk walk: collect IDAT extents, stop at IEND
    val idatOff = new scala.collection.mutable.ArrayBuffer[Int](4)
    val idatLen = new scala.collection.mutable.ArrayBuffer[Int](4)
    var p = 8 + 4 + 4 + 13 + 4
    var end = false
    while (!end) {
      if (p + 8 > b.length) return null
      val len = be32(b, p)
      if (len < 0 || p + 12L + len > b.length) return null
      val t0 = b(p + 4); val t1 = b(p + 5); val t2 = b(p + 6); val t3 = b(p + 7)
      if (t0 == 'I' && t1 == 'D' && t2 == 'A' && t3 == 'T') {
        idatOff += p + 8; idatLen += len
      } else if (t0 == 'I' && t1 == 'E' && t2 == 'N' && t3 == 'D') {
        end = true
      }
      p += 12 + len
    }
    if (idatOff.isEmpty) return null

    // inflate the filtered scanlines: h rows of 1 filter byte + w*3
    val stride = w * 3
    val rawLen = h * (1 + stride)
    val raw = new Array[Byte](rawLen)
    inf.reset()
    var out = 0
    var ci = 0
    try {
      while (out < rawLen) {
        if (inf.needsInput) {
          if (ci >= idatOff.length) return null // truncated stream
          inf.setInput(b, idatOff(ci), idatLen(ci)); ci += 1
        }
        val n = inf.inflate(raw, out, rawLen - out)
        out += n
        if (n == 0 && !inf.needsInput) {
          if (inf.finished || inf.needsDictionary) return null
        }
        if (inf.finished && out < rawLen) return null
      }
    } catch { case _: java.util.zip.DataFormatException => return null }

    // defilter (bpp = 3) straight into the packed raster
    val px = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (1 + stride)) & 0xff
      val src = y * (1 + stride) + 1
      val dst = y * stride
      ft match {
        case 0 =>
          System.arraycopy(raw, src, px, dst, stride)
        case 1 => // Sub
          var i = 0
          while (i < stride) {
            val left = if (i >= 3) px(dst + i - 3) & 0xff else 0
            px(dst + i) = ((raw(src + i) & 0xff) + left).toByte
            i += 1
          }
        case 2 => // Up
          var i = 0
          while (i < stride) {
            val up = if (y > 0) px(dst - stride + i) & 0xff else 0
            px(dst + i) = ((raw(src + i) & 0xff) + up).toByte
            i += 1
          }
        case 3 => // Average
          var i = 0
          while (i < stride) {
            val left = if (i >= 3) px(dst + i - 3) & 0xff else 0
            val up = if (y > 0) px(dst - stride + i) & 0xff else 0
            px(dst + i) = ((raw(src + i) & 0xff) + ((left + up) >> 1)).toByte
            i += 1
          }
        case 4 => // Paeth
          var i = 0
          while (i < stride) {
            val a = if (i >= 3) px(dst + i - 3) & 0xff else 0
            val c2 = if (y > 0) px(dst - stride + i) & 0xff else 0
            val c3 = if (i >= 3 && y > 0) px(dst - stride + i - 3) & 0xff else 0
            val pp = a + c2 - c3
            val pa = math.abs(pp - a); val pb = math.abs(pp - c2); val pc = math.abs(pp - c3)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) c2 else c3
            px(dst + i) = ((raw(src + i) & 0xff) + pred).toByte
            i += 1
          }
        case _ => return null
      }
      y += 1
    }

    val argb = new Array[Int](w * h)
    var o = 0
    var q = 0
    while (o < argb.length) {
      argb(o) = 0xff000000 | ((px(q) & 0xff) << 16) | ((px(q + 1) & 0xff) << 8) | (px(q + 2) & 0xff)
      o += 1; q += 3
    }
    new RgbImage(w, h, 3, argb)
  }
}
