package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** REAL media codecs in pure JVM bytes — no external libraries: BMP
  * (24-bit uncompressed, BITMAPINFOHEADER) and WAV (PCM16) are plain
  * header formats, PNG (8-bit truecolor — see [[PngCodec]], r15)
  * needs only `java.util.zip`'s DEFLATE + CRC32, and baseline JPEG
  * (see [[JpegCodec]], r16) is Huffman + DCT arithmetic written out
  * longhand — so all four can be encoded AND decoded here for full
  * pipeline verification (MP3 stays a declared stub in [[Multimodal]]
  * — see ARCHITECTURE's recorded decision): the mm2/mm4/mm5 harness
  * queries encode deterministic payloads, decode them back, and the
  * DuckDB oracle recomputes the expected features from the generating
  * formula — a hash match proves the byte layout (row padding, chunk
  * walking, filter reconstruction, endianness) round-trips exactly
  * (banded for JPEG, whose round-trip is lossy by design).
  *
  * Everything is little-endian per both formats' specs; decode returns
  * None for malformed input (the per-row barrier, like the DNS parser).
  */
object MediaCodecs {

  // ------------------------------------------------------------- BMP ----

  /** Per-channel e6-scaled means in storage order (B, G, R). */
  final case class BmpInfo(width: Int, height: Int, bpp: Int, meanE6: Array[Long])

  /** Encode a 24-bit bottom-up BMP; `pixelByte(k)` supplies the k-th
    * pixel byte in storage order (B,G,R interleaved, padding excluded). */
  def encodeBmp(w: Int, h: Int, pixelByte: Int => Int): Array[Byte] = {
    require(w > 0 && h > 0)
    val rowBytes = w * 3
    val pad = (4 - (rowBytes % 4)) % 4
    val dataSize = (rowBytes + pad) * h
    val bb = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54 + dataSize) // file size
    bb.putInt(0) // reserved
    bb.putInt(54) // pixel data offset
    bb.putInt(40) // BITMAPINFOHEADER size
    bb.putInt(w).putInt(h)
    bb.putShort(1) // planes
    bb.putShort(24) // bpp
    bb.putInt(0) // BI_RGB
    bb.putInt(dataSize)
    bb.putInt(2835).putInt(2835) // 72 DPI
    bb.putInt(0).putInt(0) // palette
    var k = 0
    (0 until h).foreach { _ =>
      (0 until rowBytes).foreach { _ =>
        bb.put((pixelByte(k) & 0xff).toByte); k += 1
      }
      (0 until pad).foreach(_ => bb.put(0.toByte))
    }
    bb.array()
  }

  /** Decode a 24-bit BMP: dimensions + exact per-channel e6 means
    * (`sum·10⁶ DIV pixels` — integer, oracle-replayable). */
  def decodeBmp(bytes: Array[Byte]): Option[BmpInfo] = {
    try {
      if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val offset = bb.getInt(10)
      val w = bb.getInt(18)
      val hRaw = bb.getInt(22)
      val h = math.abs(hRaw)
      val bpp = bb.getShort(28).toInt
      // w bounded so rowBytes/stride can't overflow Int and fake out the
      // Long bounds check below with a negative product
      if (bpp != 24 || w <= 0 || w > Int.MaxValue / 3 - 4 || h == 0) return None
      val rowBytes = w * 3
      val stride = rowBytes + (4 - (rowBytes % 4)) % 4
      if (offset.toLong + stride.toLong * h > bytes.length) return None
      val sums = new Array[Long](3)
      var row = 0
      while (row < h) {
        val base = offset + row * stride
        var i = 0
        while (i < rowBytes) {
          sums(i % 3) += (bytes(base + i) & 0xff).toLong
          i += 1
        }
        row += 1
      }
      val pixels = w.toLong * h
      Some(BmpInfo(w, h, bpp, sums.map(s => s * 1000000L / pixels)))
    } catch { case _: Exception => None }
  }

  /** 64-bit perceptual average-hash (aHash) of a 24-bit BMP, an
    * 8-bit truecolor PNG, or a baseline JPEG (format-dispatched on the
    * signature bytes — PNG payloads route to [[PngCodec.aHash64]],
    * JPEG (FFD8) to [[JpegCodec.aHash64]], same grid/threshold
    * rule, so all three formats join one Hamming-blocked near-dup
    * family and `imageNearDupPairs` needs no format flag): the image is
    * partitioned into an 8×8 grid of cells (cell (i,j) covers storage
    * rows [i·h/8, (i+1)·h/8) × cols [j·w/8, (j+1)·w/8)); each cell's
    * value is the exact integer SUM of its pixel bytes (all channels —
    * a monotone stand-in for the mean, so no division anywhere), and bit
    * i·8+j is set iff 64·cell > Σcells (strict — the "brighter than
    * average" rule in pure int64 arithmetic, replayable in SQL). Returns
    * null for malformed input or images smaller than the 8×8 grid.
    *
    * Two perceptually-near images (few pixels changed) differ in few
    * cells → few bits: Hamming distance over this hash is the image
    * member of the near-dup family, blocked exactly like SimHash
    * ([[Dedup.hammingPairs]]). */
  def aHash64(bytes: Array[Byte]): java.lang.Long = {
    try {
      if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P')
        return PngCodec.aHash64(bytes)
      if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
        return JpegCodec.aHash64(bytes)
      if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return null
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val offset = bb.getInt(10)
      val w = bb.getInt(18)
      val h = math.abs(bb.getInt(22))
      val bpp = bb.getShort(28).toInt
      if (bpp != 24 || w < 8 || w > Int.MaxValue / 3 - 4 || h < 8) return null
      val rowBytes = w * 3
      val stride = rowBytes + (4 - (rowBytes % 4)) % 4
      if (offset.toLong + stride.toLong * h > bytes.length) return null
      val cells = new Array[Long](64)
      var r = 0
      while (r < h) {
        val ci = r * 8 / h
        val base = offset + r * stride
        var x = 0
        while (x < w) {
          val cj = x * 8 / w
          val k = base + x * 3
          cells(ci * 8 + cj) += (bytes(k) & 0xff).toLong +
            (bytes(k + 1) & 0xff) + (bytes(k + 2) & 0xff)
          x += 1
        }
        r += 1
      }
      var total = 0L
      var c = 0
      while (c < 64) { total += cells(c); c += 1 }
      var hash = 0L
      c = 0
      while (c < 64) {
        if (cells(c) * 64 > total) hash |= (1L << c)
        c += 1
      }
      java.lang.Long.valueOf(hash)
    } catch { case _: Exception => null }
  }

  /** REAL nearest-neighbor resize of a 24-bit BMP — decode, sample, and
    * re-encode in pure byte math (no codec libs): target pixel (y, x)
    * reads source pixel (`y·h DIV th`, `x·w DIV tw`) (floor mapping).
    * The output is always bottom-up; a TOP-DOWN source (negative
    * biHeight) has its row index flipped (`sy' = h−1−sy`) so image
    * orientation is preserved either way. Returns a well-formed 24-bit
    * BMP of `tw`×`th`; None for malformed input or non-positive targets.
    * Upscaling replicates pixels (the mapping is total either way). */
  def resizeBmpNearest(bytes: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
    try {
      if (tw <= 0 || th <= 0) return None
      if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val offset = bb.getInt(10)
      val w = bb.getInt(18)
      val hRaw = bb.getInt(22)
      val h = math.abs(hRaw)
      val topDown = hRaw < 0
      val bpp = bb.getShort(28).toInt
      if (bpp != 24 || w <= 0 || w > Int.MaxValue / 3 - 4 || h == 0) return None
      val rowBytes = w * 3
      val stride = rowBytes + (4 - (rowBytes % 4)) % 4
      if (offset.toLong + stride.toLong * h > bytes.length) return None
      Some(encodeBmp(tw, th, k => {
        val y = k / (tw * 3)
        val rem = k % (tw * 3)
        val x = rem / 3
        val ch = rem % 3
        val sy0 = (y.toLong * h / th).toInt
        val sy = if (topDown) h - 1 - sy0 else sy0
        val sx = (x.toLong * w / tw).toInt
        bytes(offset + sy * stride + sx * 3 + ch) & 0xff
      }))
    } catch { case _: Exception => None }
  }

  // ------------------------------------------------------------- WAV ----

  /** Exact-integer audio facts: sample count, µs duration
    * (`n·10⁶ DIV rate`), and int64 energy (Σ sample²). */
  final case class WavInfo(sampleRate: Int, channels: Int, nSamples: Long,
      durationUs: Long, energy: Long)

  /** Encode mono PCM16 WAV. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
    bb.putInt(36 + dataSize)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII"))
    bb.putInt(16) // PCM fmt chunk size
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2) // block align
    bb.putShort(16) // bits
    bb.put("data".getBytes("US-ASCII"))
    bb.putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** 64-bit perceptual hash of a PCM16 WAV: samples are partitioned into
    * 64 equal windows (window w covers samples [w·n/64, (w+1)·n/64)),
    * each window's value is its exact int64 ENERGY (Σ sample²), and bit
    * w is set iff 64·energy(w) > Σenergies (strict) — the audio analogue
    * of [[aHash64]]'s brighter-than-average rule, in pure int arithmetic
    * replayable in SQL. Perceptually-near audio (a few samples changed)
    * differs in few windows → few bits; Hamming-blocked pairing reuses
    * [[Dedup.hammingPairs]]. Null for malformed input or fewer than 64
    * samples. */
  def audioHash64(bytes: Array[Byte]): java.lang.Long = {
    val info = decodeWav(bytes)
    if (info.isEmpty) return null
    val w = info.get
    val n = (w.nSamples * w.channels).toInt
    if (n < 64) return null
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // re-locate the data chunk (decodeWav validated the walk already)
    var pos = 12
    var dataOff = -1
    while (dataOff < 0 && pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = bb.getInt(pos + 4)
      if (id == "data") dataOff = pos + 8
      else pos += 8 + len + (len & 1)
    }
    val wins = new Array[Long](64)
    var i = 0
    while (i < n) {
      val s = bb.getShort(dataOff + i * 2).toLong
      wins((i.toLong * 64 / n).toInt) += s * s // long math: i*64 can pass Int.MaxValue
      i += 1
    }
    var total = 0L
    var c = 0
    while (c < 64) { total += wins(c); c += 1 }
    var hash = 0L
    c = 0
    while (c < 64) {
      if (wins(c) * 64 > total) hash |= (1L << c)
      c += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** REAL audio frame sampling — the "decode every Nth frame and
    * feature-extract it" pipeline over mono PCM16 WAV in pure byte math:
    * samples split into consecutive FULL frames of `frameSamples` (a
    * trailing partial frame is dropped — fixed-size frames are the
    * contract of every downstream featurizer), every `everyNth`-th frame
    * kept (0, N, 2N, …), each yielding its exact int64 energy
    * (Σ sample²). Returns (frame_idx, energy) pairs; None for malformed
    * input or non-mono. */
  def wavFrameEnergies(bytes: Array[Byte], frameSamples: Int,
      everyNth: Int): Option[Seq[(Int, Long)]] = {
    require(frameSamples > 0 && everyNth > 0)
    val info = decodeWav(bytes)
    if (info.isEmpty || info.get.channels != 1) return None
    val n = info.get.nSamples.toInt
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // re-locate the data chunk (decodeWav validated the walk already)
    var pos = 12
    var dataOff = -1
    while (dataOff < 0 && pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = bb.getInt(pos + 4)
      if (id == "data") dataOff = pos + 8
      else pos += 8 + len + (len & 1)
    }
    val out = Seq.newBuilder[(Int, Long)]
    var f = 0
    while ((f + 1) * frameSamples <= n) {
      if (f % everyNth == 0) {
        var e = 0L
        var i = f * frameSamples
        val end = i + frameSamples
        while (i < end) {
          val s = bb.getShort(dataOff + i * 2).toLong
          e += s * s
          i += 1
        }
        out += ((f, e))
      }
      f += 1
    }
    Some(out.result())
  }

  /** Decode PCM16 WAV by walking RIFF chunks (tolerates extra chunks
    * before fmt/data, per the spec). */
  def decodeWav(bytes: Array[Byte]): Option[WavInfo] = {
    try {
      if (bytes.length < 44) return None
      def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
      if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      var rate = 0; var channels = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      while (pos + 8 <= bytes.length) {
        val id = ascii(pos, 4)
        val len = bb.getInt(pos + 4)
        // a negative/oversized chunk length would make the walk step
        // non-positive (infinite loop) or read past the buffer
        if (len < 0 || pos.toLong + 8 + len > bytes.length) return None
        if (id == "fmt ") {
          if (bb.getShort(pos + 8) != 1) return None // PCM only
          channels = bb.getShort(pos + 10).toInt
          rate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22).toInt
        } else if (id == "data") { dataOff = pos + 8; dataLen = len }
        pos += 8 + len + (len & 1) // chunks are word-aligned
      }
      if (rate <= 0 || channels <= 0 || bits != 16 || dataOff < 0) return None
      if (dataOff.toLong + dataLen > bytes.length) return None
      val n = dataLen / 2 / channels
      var energy = 0L
      var i = 0
      while (i < n * channels) {
        val s = bb.getShort(dataOff + i * 2).toLong
        energy += s * s
        i += 1
      }
      Some(WavInfo(rate, channels, n.toLong, n.toLong * 1000000L / rate, energy))
    } catch { case _: Exception => None }
  }
}
