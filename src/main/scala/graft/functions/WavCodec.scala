package graft.functions

/** Dependency-free PCM WAV codec (RIFF container, fmt + data chunks,
  * 16-bit little-endian mono) — upgrades the audio half of the multimodal
  * decode stub to a real path the way PngCodec did for images: PCM needs
  * no compression library, so the full container write/parse + sample
  * decode is exact and self-contained.
  *
  * Both directions are per-row byte-array kernels with no Spark state —
  * the `mapPartitions` media-pipeline shape where bytes never leave their
  * partition and only small features flow onward.
  */
object WavCodec {

  private def leInt(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def leShort(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def readLeInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def readLeShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Encode mono 16-bit PCM at `sampleRate` Hz. */
  def encodePcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bos = new java.io.ByteArrayOutputStream(44 + dataLen)
    bos.write("RIFF".getBytes("US-ASCII"))
    bos.write(leInt(36 + dataLen))
    bos.write("WAVE".getBytes("US-ASCII"))
    bos.write("fmt ".getBytes("US-ASCII"))
    bos.write(leInt(16)) // PCM fmt chunk size
    bos.write(leShort(1)) // audio format 1 = PCM
    bos.write(leShort(1)) // mono
    bos.write(leInt(sampleRate))
    bos.write(leInt(sampleRate * 2)) // byte rate
    bos.write(leShort(2)) // block align
    bos.write(leShort(16)) // bits per sample
    bos.write("data".getBytes("US-ASCII"))
    bos.write(leInt(dataLen))
    samples.foreach(s => bos.write(leShort(s & 0xffff)))
    bos.toByteArray
  }

  /** Decode mono 16-bit PCM WAV → (sampleRate, samples). Walks RIFF
    * chunks (skipping ancillary ones like LIST/fact), validating the
    * format chunk. */
  def decodePcm16(wav: Array[Byte]): (Int, Array[Short]) = {
    require(wav.length >= 12 &&
      new String(wav, 0, 4, "US-ASCII") == "RIFF" &&
      new String(wav, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE file")
    var off = 12
    var sampleRate = -1
    var samples: Array[Short] = null
    while (off + 8 <= wav.length && (sampleRate < 0 || samples == null)) {
      val typ = new String(wav, off, 4, "US-ASCII")
      val len = readLeInt(wav, off + 4)
      // corrupt lengths must fail loudly: a negative len would stall the
      // chunk walk forever, an oversized one would read past the buffer
      require(len >= 0 && off + 8 + len <= wav.length,
        s"corrupt chunk length $len at offset $off")
      typ match {
        case "fmt " =>
          require(len >= 16, s"short fmt chunk ($len bytes)")
          require(readLeShort(wav, off + 8) == 1, "only PCM is supported")
          require(readLeShort(wav, off + 10) == 1, "only mono is supported")
          require(readLeShort(wav, off + 22) == 16,
            "only 16-bit samples are supported")
          sampleRate = readLeInt(wav, off + 12)
        case "data" =>
          val n = len / 2
          samples = Array.tabulate(n)(i =>
            readLeShort(wav, off + 8 + i * 2).toShort)
        case _ => () // ancillary chunk
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    (sampleRate, samples)
  }
}
