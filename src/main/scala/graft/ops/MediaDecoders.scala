package graft.ops

/** Pluggable media decoding for the multimodal pipeline (the batched
  * `MultimodalOps.extractFeatures` stage).
  *
  * The decode seam the reference pipeline needs at 100 TB: an executor-side
  * pure function `bytes → features`, chosen per payload by container
  * sniffing, with per-batch setup amortized by the surrounding
  * `mapPartitions`. Two REAL dependency-free decoders are included — a
  * RIFF/WAVE 16-bit PCM parser and an uncompressed 24/32-bit BMP parser
  * (both formats are fully specified public layouts; no codec library
  * involved) — plus the deterministic byte-statistics fallback for opaque
  * payloads (the corpus's synthetic media is text bytes, which no container
  * claims). A production JPEG/FLAC/H.264 decoder drops into the same trait
  * without touching the Spark plumbing.
  *
  * All decoders emit `MultimodalOps.FeatureDim` floats and are
  * integer-exact in float32 within documented payload bounds, keeping the
  * whole surface oracle-checkable.
  */
object MediaDecoders {

  val FeatureDim: Int = MultimodalOps.FeatureDim

  trait MediaDecoder {
    /** Feature vector for one payload; total function (never throws on
      * arbitrary bytes — return None to decline and let sniffing fall
      * through to the byte-stats fallback). */
    def decode(content: Array[Byte]): Option[Array[Float]]
  }

  // ------------------------------------------------------------- helpers

  private def u8(b: Byte): Int = b & 0xff

  /** Little-endian readers (both containers are little-endian). */
  private def le16(a: Array[Byte], off: Int): Int = u8(a(off)) | (u8(a(off + 1)) << 8)
  private def le32(a: Array[Byte], off: Int): Int =
    u8(a(off)) | (u8(a(off + 1)) << 8) | (u8(a(off + 2)) << 16) | (u8(a(off + 3)) << 24)

  private def ascii(a: Array[Byte], off: Int, s: String): Boolean =
    a.length >= off + s.length && s.indices.forall(i => a(off + i) == s.charAt(i).toByte)

  // ------------------------------------------------------- WAV (RIFF/PCM)

  /** RIFF/WAVE 16-bit PCM: walks the chunk list to `fmt ` and `data`,
    * validates PCM-16, and emits per-8-bucket sums of |sample| / 32768
    * (sample counts bounded so float32 accumulation stays exact: |s|≤2¹⁵,
    * so a bucket stays integer-exact in the ×32768 domain below 2²⁴ — the
    * emitted normalized floats are those exact integers / 32768). */
  object WavPcmDecoder extends MediaDecoder {
    def decode(a: Array[Byte]): Option[Array[Float]] = {
      if (!(ascii(a, 0, "RIFF") && a.length >= 44 && ascii(a, 8, "WAVE"))) return None
      var off = 12
      var dataOff = -1
      var dataLen = -1
      var pcm16 = false
      while (off + 8 <= a.length && (dataOff < 0 || !pcm16)) {
        val sz = le32(a, off + 4)
        if (sz < 0 || off + 8 + sz > a.length) return None // corrupt chunk
        if (ascii(a, off, "fmt ") && sz >= 16)
          pcm16 = le16(a, off + 8) == 1 && le16(a, off + 22) == 16
        else if (ascii(a, off, "data")) { dataOff = off + 8; dataLen = sz }
        off += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      if (!pcm16 || dataOff < 0) return None
      val out = new Array[Float](FeatureDim)
      val n = dataLen / 2
      var i = 0
      while (i < n) {
        val s = (le16(a, dataOff + 2 * i) << 16) >> 16 // sign-extend
        out(i % FeatureDim) += math.abs(s).toFloat / 32768f
        i += 1
      }
      Some(out)
    }
  }

  // ------------------------------------------- BMP (uncompressed 24/32bpp)

  /** Windows BMP, BITMAPINFOHEADER, uncompressed 24- or 32-bit pixels:
    * validates the declared file size against the payload, then emits mean
    * B, G, R over the pixel array in buckets 0-2 (alpha/padding skipped),
    * pixel count in bucket 3, width/height in 4-5 (the rest zero). Means
    * are exact: channel sums are integers < 2²⁴ for payloads ≤ 64 K
    * pixels, divided once at the end. */
  object BmpDecoder extends MediaDecoder {
    def decode(a: Array[Byte]): Option[Array[Float]] = {
      if (!(ascii(a, 0, "BM") && a.length >= 54)) return None
      if (le32(a, 2) != a.length) return None       // declared size must match
      val pixOff = le32(a, 10)
      if (le32(a, 14) != 40) return None            // BITMAPINFOHEADER only
      val w = le32(a, 18)
      val h = le32(a, 22)
      val bpp = le16(a, 28)
      if (le32(a, 30) != 0) return None             // BI_RGB (uncompressed)
      if (w <= 0 || h == 0 || (bpp != 24 && bpp != 32)) return None
      val rows = math.abs(h)
      val bytesPerPx = bpp / 8
      val stride = ((w * bytesPerPx + 3) / 4) * 4   // rows pad to 4 bytes
      if (pixOff < 54 || pixOff.toLong + stride.toLong * rows > a.length) return None
      val out = new Array[Float](FeatureDim)
      var r = 0
      while (r < rows) {
        var c = 0
        while (c < w) {
          val p = pixOff + r * stride + c * bytesPerPx
          out(0) += u8(a(p)).toFloat      // B
          out(1) += u8(a(p + 1)).toFloat  // G
          out(2) += u8(a(p + 2)).toFloat  // R
          c += 1
        }
        r += 1
      }
      val n = (w.toLong * rows).toFloat
      out(0) /= n; out(1) /= n; out(2) /= n
      out(3) = n
      out(4) = w.toFloat
      out(5) = rows.toFloat
      Some(out)
    }
  }

  // -------------------------------------------------------- fallback + mux

  /** Byte-statistics fallback for opaque payloads — the former stub,
    * unchanged: position-mod-8 sums of raw byte values, integer-exact in
    * float32 below 2²⁴ per bucket, reproducible from SQL over the bytes
    * (the mm_features oracle). */
  object ByteStatsDecoder extends MediaDecoder {
    def decode(content: Array[Byte]): Option[Array[Float]] =
      Some(MultimodalOps.decodeStub(content))
  }

  /** Container sniffing: each real decoder validates its own magic AND
    * internal structure (declared sizes vs payload), so ASCII text that
    * merely starts with "BM" cannot misparse; anything unclaimed falls
    * back to byte statistics. First match wins. */
  val decoders: Seq[MediaDecoder] = Seq(WavPcmDecoder, BmpDecoder, ByteStatsDecoder)

  def decode(content: Array[Byte]): Array[Float] =
    decoders.iterator.flatMap(_.decode(content)).next()
}
