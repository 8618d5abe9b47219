package graft.functions

import java.util.zip.{CRC32, Deflater, Inflater}

/** Dependency-free PNG codec for 8-bit grayscale images, built on the zlib
  * that ships inside the JVM (java.util.zip) — this replaces the pixel-level
  * part of the multimodal decode stub with a REAL codec path: chunked
  * container format with CRCs, deflate-compressed scanlines, and full
  * filter reconstruction (None/Sub/Up/Average/Paeth).
  *
  * The encoder deliberately cycles through all five scanline filter types
  * (row r uses filter r % 5), so a decoder only round-trips if every filter
  * path is implemented correctly. Cross-validation against the JDK's
  * independent ImageIO decoder lives in MultimodalSpec, which rules out
  * symmetric encode/decode bugs.
  *
  * Scale note: both sides are per-row byte-array kernels with no Spark
  * state — exactly the shape a `mapPartitions` media pipeline wants (the
  * bytes never leave their partition; only small features flow on).
  */
object PngCodec {
  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def beInt(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def readBeInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new CRC32()
    crc.update(t)
    crc.update(data)
    beInt(data.length) ++ t ++ data ++ beInt(crc.getValue.toInt)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode an 8-bit grayscale image (pixel (x, y) = px(x, y) & 0xff). */
  def encodeGray(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    val raw = new Array[Byte](h * (w + 1))
    val cur = new Array[Int](w)
    val prev = new Array[Int](w) // previous RAW (unfiltered) scanline
    var y = 0
    var o = 0
    while (y < h) {
      var x = 0
      while (x < w) { cur(x) = px(x, y) & 0xff; x += 1 }
      val f = y % 5 // exercise every filter type
      raw(o) = f.toByte
      o += 1
      x = 0
      while (x < w) {
        val a = if (x > 0) cur(x - 1) else 0
        val b = if (y > 0) prev(x) else 0
        val c = if (x > 0 && y > 0) prev(x - 1) else 0
        val v = f match {
          case 0 => cur(x)
          case 1 => cur(x) - a
          case 2 => cur(x) - b
          case 3 => cur(x) - ((a + b) / 2)
          case _ => cur(x) - paeth(a, b, c)
        }
        raw(o) = (v & 0xff).toByte
        o += 1
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, w)
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      bos.write(buf, 0, n)
    }
    deflater.end()
    // IHDR: depth 8, color type 0 (grayscale), deflate, adaptive, no interlace
    val ihdr = beInt(w) ++ beInt(h) ++ Array[Byte](8, 0, 0, 0, 0)
    Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", bos.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Decode an 8-bit grayscale PNG → (width, height, row-major pixels).
    * Walks chunks (IDAT may span several), inflates, reconstructs all five
    * filter types. */
  def decodeGray(png: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(png.length > 8 &&
      Signature.indices.forall(i => png(i) == Signature(i)), "not a PNG")
    var off = 8
    var w = 0
    var h = 0
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && off + 8 <= png.length) {
      val len = readBeInt(png, off)
      // a corrupt length (negative via the sign bit, or past the buffer)
      // must fail loudly — unchecked it would walk the chunk loop backwards
      // forever or read out of bounds
      require(len >= 0 && off + 12 + len <= png.length,
        s"corrupt chunk length $len at offset $off")
      val typ = new String(png, off + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          w = readBeInt(png, off + 8)
          h = readBeInt(png, off + 12)
          require(png(off + 16) == 8 && png(off + 17) == 0,
            "only 8-bit grayscale is supported")
        case "IDAT" => idat.write(png, off + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks (tEXt, gAMA, …) are skippable
      }
      off += 12 + len
    }
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte](h * (w + 1))
    var got = 0
    while (got < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, got, raw.length - got)
      require(n > 0 || !inflater.needsInput(), "truncated IDAT stream")
      got += n
    }
    inflater.end()
    require(got == raw.length, s"short pixel data: $got of ${raw.length}")
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val f = raw(y * (w + 1)) & 0xff
      var x = 0
      while (x < w) {
        val v = raw(y * (w + 1) + 1 + x) & 0xff
        val a = if (x > 0) out(y * w + x - 1) & 0xff else 0
        val b = if (y > 0) out((y - 1) * w + x) & 0xff else 0
        val c = if (x > 0 && y > 0) out((y - 1) * w + x - 1) & 0xff else 0
        val r = f match {
          case 0 => v
          case 1 => v + a
          case 2 => v + b
          case 3 => v + ((a + b) / 2)
          case 4 => v + paeth(a, b, c)
          case other =>
            throw new IllegalArgumentException(s"bad filter type $other")
        }
        out(y * w + x) = (r & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }
}
