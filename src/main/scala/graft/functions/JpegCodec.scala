package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import javax.imageio.stream.MemoryCacheImageOutputStream

/** Baseline-JPEG codec for 8-bit grayscale images over the JDK's built-in
  * ImageIO JPEG plugin (com.sun.imageio ships in every JDK — no external
  * dependency). This closes the last image-codec gap in the multimodal
  * path: PNG (PngCodec) covers the lossless container, this covers the
  * COMPRESSED lossy codec class; only video/audio compressed codecs
  * (H.264/MP3) remain honestly stubbed, because those genuinely don't
  * ship in the JVM.
  *
  * JPEG is lossy, so the pipeline contract differs from PngCodec's:
  * dimensions and pixel COUNT survive exactly, pixel VALUES survive
  * within a bounded reconstruction error (small on smooth images at high
  * quality). Oracle rows therefore carry the exact quantities (dims,
  * counts, source-pixel stats) as values and the reconstruction quality
  * as asserted booleans — MultimodalSpec pins the actual error bound.
  *
  * Scale note: same shape as PngCodec — stateless per-row byte-array
  * kernels for a `mapPartitions` media pipeline; bytes never leave their
  * partition.
  */
object JpegCodec {

  /** Encode an 8-bit grayscale image (pixel (x, y) = px(x, y) & 0xff) as
    * baseline JPEG at the given quality (0..1]. */
  def encodeGray(w: Int, h: Int, px: (Int, Int) => Int,
      quality: Float = 0.95f): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, px(x, y) & 0xff); x += 1 }
      y += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Decode a JPEG to (width, height, row-major 8-bit gray pixels). A
    * color JPEG is collapsed to luma via the default ColorConvert. */
  def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "not a decodable JPEG stream")
    val (w, h) = (img.getWidth, img.getHeight)
    val gray =
      if (img.getType == BufferedImage.TYPE_BYTE_GRAY) img
      else {
        val g = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val gr = g.createGraphics()
        try gr.drawImage(img, 0, 0, null) finally gr.dispose()
        g
      }
    val out = new Array[Byte](w * h)
    val raster = gray.getRaster
    var y = 0
    var o = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(o) = raster.getSample(x, y, 0).toByte
        x += 1; o += 1
      }
      y += 1
    }
    (w, h, out)
  }

  /** True when `bytes` starts with the JPEG SOI marker + JFIF/EXIF-class
    * segment header — the sibling of PngCodec's signature check. */
  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff
}
