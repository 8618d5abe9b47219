package graft.functions

/** Dependency-free YUV4MPEG2 (.y4m) video codec, mono colorspace —
  * completes the multimodal trio next to PngCodec and WavCodec: y4m is a
  * real, standard video container (ffmpeg/mjpegtools interchange format)
  * that stores uncompressed frames, so full write/parse plus frame
  * extraction needs no codec library.
  *
  * Layout: an ASCII stream header `YUV4MPEG2 W<w> H<h> F<n>:<d> Cmono\n`,
  * then per frame an ASCII `FRAME\n` marker followed by the raw plane
  * (w×h bytes for mono). Parser handles unknown header parameters by
  * skipping them (as the spec requires).
  */
object Y4mCodec {

  private val Magic = "YUV4MPEG2"

  /** Encode a mono video: frame f pixel (x, y) = px(x, y, f) & 0xff. */
  def encodeMono(w: Int, h: Int, frames: Int, fpsNum: Int, fpsDen: Int,
      px: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && frames >= 0, s"bad geometry ${w}x$h×$frames")
    val bos = new java.io.ByteArrayOutputStream(32 + frames * (6 + w * h))
    bos.write(s"$Magic W$w H$h F$fpsNum:$fpsDen Cmono\n".getBytes("US-ASCII"))
    var f = 0
    while (f < frames) {
      bos.write("FRAME\n".getBytes("US-ASCII"))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { bos.write(px(x, y, f) & 0xff); x += 1 }
        y += 1
      }
      f += 1
    }
    bos.toByteArray
  }

  /** Decoded stream: geometry + frame rate + raw frames (row-major). */
  final case class Video(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
      frames: Vector[Array[Byte]])

  /** Parse a mono y4m stream: header tokens, then FRAME-marked planes. */
  def decodeMono(y4m: Array[Byte]): Video = {
    var off = 0
    def readLine(): String = {
      val start = off
      while (off < y4m.length && y4m(off) != '\n') off += 1
      require(off < y4m.length, "unterminated y4m header line")
      off += 1
      new String(y4m, start, off - 1 - start, "US-ASCII")
    }
    val header = readLine()
    val tokens = header.split(' ')
    require(tokens.headOption.contains(Magic), "not a YUV4MPEG2 stream")
    var w = -1
    var h = -1
    var fpsNum = 25
    var fpsDen = 1
    var mono = false
    tokens.tail.foreach { t =>
      if (t.nonEmpty) t.charAt(0) match {
        case 'W' => w = t.substring(1).toInt
        case 'H' => h = t.substring(1).toInt
        case 'F' =>
          val parts = t.substring(1).split(':')
          fpsNum = parts(0).toInt
          fpsDen = parts(1).toInt
        case 'C' => mono = t == "Cmono"
        case _ => () // interlacing/aspect/extension params — skippable
      }
    }
    require(w > 0 && h > 0, "missing W/H in y4m header")
    require(mono, "only the mono colorspace is supported")
    val frames = Vector.newBuilder[Array[Byte]]
    while (off < y4m.length) {
      val marker = readLine()
      require(marker == "FRAME" || marker.startsWith("FRAME "),
        s"bad frame marker: $marker")
      require(off + w * h <= y4m.length, "truncated frame plane")
      frames += java.util.Arrays.copyOfRange(y4m, off, off + w * h)
      off += w * h
    }
    Video(w, h, fpsNum, fpsDen, frames.result())
  }
}
