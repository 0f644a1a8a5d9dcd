package graft.ext

/** Pure-JVM FLAC codec subset (r8) — closes the compressed-AUDIO
  * boundary the r7 verdict flagged: the JDK ships image codecs
  * (ImageIO → q315 PNG, q327 JPEG) but NO compressed-audio codec
  * (`javax.sound.sampled` reads only PCM containers), and the
  * no-new-deps rule holds — so the codec is implemented here from the
  * public FLAC format (RFC 9639), zero dependencies.
  *
  * Scope — the FIXED-prediction subset, implemented for real:
  *  - stream: fLaC magic, STREAMINFO + arbitrary skipped metadata
  *    blocks (the fixture inserts a PADDING block so a decoder that
  *    assumes frames start right after STREAMINFO reads garbage);
  *  - frames: 14-bit sync, blocking strategy, coded block-size /
  *    sample-rate / bps (STREAMINFO-deferred and literal forms),
  *    UTF-8-coded frame index, header CRC-8 (poly 0x07) VERIFIED;
  *  - subframes: CONSTANT, VERBATIM, FIXED orders 0–4 (order-k warmup
  *    + polynomial-difference residuals), LPC any order (r8 —
  *    quantized coefficients + shift, 64-bit accumulation; the frame
  *    type real encoders emit most), wasted-bits unary prefix;
  *  - residuals: 4-bit rice method, any partition order, per-partition
  *    rice parameter with the 0b1111 raw-bitlen escape, zigzag coding;
  *  - whole-frame CRC-16 (poly 0x8005) VERIFIED.
  * Stereo decorrelation and reserved constructs are rejected LOUDLY
  * (IllegalArgumentException names the construct) — corrupt or
  * out-of-subset media must fail, not emit garbage features.
  *
  * FLAC is LOSSLESS, so unlike q327's JPEG tolerance contract the
  * decode oracle is EXACT: the fixture's samples are a closed form of
  * (doc_id, t) and DuckDB recomputes every output moment analytically.
  *
  * The encoder (fixture builder) writes multi-frame streams (block
  * size 256), chooses the best rice parameter per partition at
  * partition order 1, and emits real CRCs — so the decoder is
  * exercised on frame iteration, partition walking, and parameter
  * variation, not just on the inverse of a degenerate writer.
  */
object Flac {

  /** Decoded FLAC record — [[Multimodal.WavOut]]'s all-integer shape
    * (exact sums; `first_s` is the order-sensitive probe).
    */
  case class FlacOut(media_id: Long, sample_rate: Int, n_samples: Long,
                     duration_ms: Long, peak: Int, first_s: Int,
                     sum_s: Long, sumsq_s: Long)

  // ---- CRCs (FLAC: CRC-8 poly 0x07 init 0; CRC-16 poly 0x8005 init 0)

  private def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
              else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  private def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // ---- MSB-first bit IO

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nbits = 0
    def writeBits(v: Long, n: Int): Unit = {
      require(n >= 0 && n <= 57, s"writeBits width $n")
      acc = (acc << n) | (v & ((1L << n) - 1))
      nbits += n
      while (nbits >= 8) {
        out.write(((acc >>> (nbits - 8)) & 0xff).toInt)
        nbits -= 8
      }
    }
    def writeUnary(q: Int): Unit = {
      var r = q
      while (r >= 32) { writeBits(0L, 32); r -= 32 }
      writeBits(1L, r + 1) // q zeros then a one
    }
    def alignByte(): Unit = if (nbits > 0) writeBits(0L, 8 - nbits)
    def toBytes: Array[Byte] = { alignByte(); out.toByteArray }
  }

  private final class BitReader(bytes: Array[Byte], startByte: Int) {
    private var pos = startByte * 8L
    def bytePos: Int = { require(pos % 8 == 0, "unaligned"); (pos / 8).toInt }
    def readBits(n: Int): Long = {
      var v = 0L
      var left = n
      while (left > 0) {
        val byteIx = (pos / 8).toInt
        require(byteIx < bytes.length, "flac: truncated stream")
        val bitIx = (pos % 8).toInt
        val take = math.min(8 - bitIx, left)
        val chunk = ((bytes(byteIx) & 0xff) >>> (8 - bitIx - take)) &
          ((1 << take) - 1)
        v = (v << take) | chunk
        pos += take
        left -= take
      }
      v
    }
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      (v << (64 - n) >> (64 - n)).toInt // sign-extend
    }
    def readUnary(): Int = {
      var q = 0
      while (readBits(1) == 0L) q += 1
      q
    }
    def alignByte(): Unit = if (pos % 8 != 0) pos = (pos / 8 + 1) * 8
  }

  // ---- encoder (fixture builder)

  private def utf8FrameIndex(ix: Long): Array[Byte] = {
    // FLAC's UTF-8-style extended coding of the frame number
    if (ix < 0x80) Array(ix.toByte)
    else if (ix < 0x800) Array(
      (0xC0 | (ix >> 6)).toByte, (0x80 | (ix & 0x3f)).toByte)
    else Array( // 3-byte form covers every fixture (ix < 65536)
      (0xE0 | (ix >> 12)).toByte, (0x80 | ((ix >> 6) & 0x3f)).toByte,
      (0x80 | (ix & 0x3f)).toByte)
  }

  private def riceBits(resid: Array[Int], from: Int, until: Int, k: Int): Long = {
    var bits = 0L
    var i = from
    while (i < until) {
      val z = (resid(i) << 1) ^ (resid(i) >> 31) // zigzag
      bits += (z >>> k) + 1 + k
      i += 1
    }
    bits
  }

  private def bestRiceParam(resid: Array[Int], from: Int, until: Int): Int =
    (0 to 14).minBy(k => riceBits(resid, from, until, k))

  /** Encode 16-bit mono samples as a real FLAC stream: STREAMINFO, one
    * PADDING block, then frames of `blockSize` samples (last frame
    * shorter), rice partition order 1 when the block splits evenly,
    * else 0. With `useLpc` each frame carries an order-4 LPC subframe
    * (covariance-method fit, 15-bit quantized coefficients + shift —
    * what real encoders emit most), falling back to FIXED order 2 when
    * the fit degenerates; without it every frame is FIXED. Both are
    * LOSSLESS — the choice changes bytes, never decoded samples.
    * Deterministic byte-for-byte (strictfp-free double math is still
    * deterministic on one JVM arch; the DECODER is pure integer math,
    * so decode correctness never depends on the fit).
    */
  def encodeFlac(sampleRate: Int, nSamples: Int, sample: Int => Int,
                 blockSize: Int = 256, useLpc: Boolean = false): Array[Byte] = {
    require(sampleRate > 0 && nSamples > 0 && blockSize >= 16)
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO (not last)
    val si = new BitWriter
    si.writeBits(blockSize.toLong, 16) // min block size
    si.writeBits(blockSize.toLong, 16) // max block size
    si.writeBits(0L, 24)               // min frame size unknown
    si.writeBits(0L, 24)               // max frame size unknown
    si.writeBits(sampleRate.toLong, 20)
    si.writeBits(0L, 3)                // channels - 1 (mono)
    si.writeBits(15L, 5)               // bps - 1 (16-bit)
    si.writeBits(nSamples.toLong, 36)
    (0 until 16).foreach(_ => si.writeBits(0L, 8)) // MD5 unset
    val siBytes = si.toBytes
    out.write(0x00); writeLen24(out, siBytes.length); out.write(siBytes)
    // PADDING block (last) — frames do NOT start right after STREAMINFO
    out.write(0x81); writeLen24(out, 5); out.write(Array[Byte](0, 0, 0, 0, 0))
    // frames
    var start = 0
    var frameIx = 0L
    while (start < nSamples) {
      val bs = math.min(blockSize, nSamples - start)
      out.write(encodeFrame(sampleRate, sample, start, bs, frameIx,
        useLpc = useLpc))
      start += bs
      frameIx += 1
    }
    out.toByteArray
  }

  private def writeLen24(out: java.io.ByteArrayOutputStream, n: Int): Unit = {
    out.write((n >> 16) & 0xff); out.write((n >> 8) & 0xff); out.write(n & 0xff)
  }

  /** COVARIANCE-method fit of an order-`order` linear predictor over
    * the block (true least squares: Gᵀa = b from the block's own
    * prediction rows), quantized to 15-bit coefficients + shift. The
    * textbook autocorrelation/Levinson route is deliberately NOT used:
    * its implicit zero-padding bias is catastrophic on deterministic
    * signals (measured on a pure sinusoid: Levinson residual ~87 vs
    * covariance ~0.4 vs FIXED-2's ~37 — the "optimal" autocorrelation
    * fit LOST to a fixed polynomial). Lossless regardless of fit
    * quality — residuals absorb everything, so a poor fit only costs
    * bits. Returns None on a degenerate system (constant/near-silent
    * block) — caller falls back to FIXED.
    */
  private def lpcFit(s: Array[Int], order: Int): Option[(Array[Int], Int)] = {
    val n = s.length
    if (n <= order * 3) return None
    val g = Array.ofDim[Double](order, order)
    val b = new Array[Double](order)
    var t = order
    while (t < n) {
      var i = 0
      while (i < order) {
        b(i) += s(t).toDouble * s(t - 1 - i)
        var j = i
        while (j < order) {
          g(i)(j) += s(t - 1 - i).toDouble * s(t - 1 - j)
          j += 1
        }
        i += 1
      }
      t += 1
    }
    var i = 0
    while (i < order) {
      var j = 0
      while (j < i) { g(i)(j) = g(j)(i); j += 1 }
      i += 1
    }
    // gaussian elimination with partial pivoting
    val a = new Array[Double](order)
    val m = Array.tabulate(order)(r0 => g(r0) :+ b(r0))
    var col = 0
    while (col < order) {
      var piv = col
      var r0 = col + 1
      while (r0 < order) {
        if (math.abs(m(r0)(col)) > math.abs(m(piv)(col))) piv = r0
        r0 += 1
      }
      if (math.abs(m(piv)(col)) < 1e-6) return None
      val tmp = m(col); m(col) = m(piv); m(piv) = tmp
      r0 = col + 1
      while (r0 < order) {
        val f = m(r0)(col) / m(col)(col)
        var c = col
        while (c <= order) { m(r0)(c) -= f * m(col)(c); c += 1 }
        r0 += 1
      }
      col += 1
    }
    var r1 = order - 1
    while (r1 >= 0) {
      var acc = m(r1)(order)
      var c = r1 + 1
      while (c < order) { acc -= m(r1)(c) * a(c); c += 1 }
      a(r1) = acc / m(r1)(r1)
      if (!java.lang.Double.isFinite(a(r1))) return None
      r1 -= 1
    }
    val maxA = a.map(math.abs).max
    if (maxA == 0.0 || maxA > 30.0) return None // wild fit: bail
    // largest shift whose quantized max coefficient still fits the
    // 15-bit signed range — maximizes coefficient precision (a coarse
    // shift leaves quantization error ~s·2^-shift in every residual,
    // which is the whole compression budget)
    val precision = 15
    val lim = (1 << (precision - 1)) - 1
    var shift = 15
    while (shift > 1 && math.round(maxA * (1L << shift)) > lim) shift -= 1
    val coefs = a.map(x =>
      math.max(-lim - 1, math.min(lim, math.round(x * (1L << shift)).toInt)))
    if (coefs.forall(_ == 0)) None else Some((coefs, shift))
  }

  private def writeRice(w2: BitWriter, resid: Array[Int], bs: Int,
                        order: Int): Unit = {
    // rice: partition order 1 when the block splits evenly into two
    // partitions with the warmup fitting the first, else order 0
    val po = if (bs % 2 == 0 && bs / 2 > order) 1 else 0
    w2.writeBits(0L, 2)           // residual method: 4-bit rice
    w2.writeBits(po.toLong, 4)    // partition order
    val nPart = 1 << po
    var p = 0
    while (p < nPart) {
      val pFrom = if (p == 0) 0 else p * bs / nPart - order
      val pUntil = (p + 1) * bs / nPart - order
      val k = bestRiceParam(resid, pFrom, pUntil)
      w2.writeBits(k.toLong, 4)
      var j = pFrom
      while (j < pUntil) {
        val z = (resid(j) << 1) ^ (resid(j) >> 31)
        w2.writeUnary(z >>> k)
        if (k > 0) w2.writeBits(z.toLong & ((1L << k) - 1), k)
        j += 1
      }
      p += 1
    }
  }

  private def encodeFrame(sampleRate: Int, sample: Int => Int,
                          start: Int, bs: Int, frameIx: Long,
                          useLpc: Boolean): Array[Byte] = {
    val w = new BitWriter
    w.writeBits(0x3ffe, 14)  // sync
    w.writeBits(0L, 1)       // reserved
    w.writeBits(0L, 1)       // fixed blocking strategy
    w.writeBits(0x7L, 4)     // block size: 16-bit value-1 at header end
    w.writeBits(0x0L, 4)     // sample rate: from STREAMINFO
    w.writeBits(0x0L, 4)     // channels: 1, independent
    w.writeBits(0x4L, 3)     // bps: 16
    w.writeBits(0L, 1)       // reserved
    utf8FrameIndex(frameIx).foreach(b => w.writeBits(b & 0xffL, 8))
    w.writeBits((bs - 1).toLong, 16)
    val headerSoFar = w.toBytes // aligned: header fields are whole bytes
    val w2 = new BitWriter
    headerSoFar.foreach(b => w2.writeBits(b & 0xffL, 8))
    w2.writeBits(crc8(headerSoFar, 0, headerSoFar.length).toLong, 8)
    val s = Array.tabulate(bs)(t => sample(start + t))
    val lpc = if (useLpc) lpcFit(s, order = 4) else None
    lpc match {
      case Some((coefs, shift)) =>
        val order = coefs.length
        w2.writeBits(0L, 1)                         // pad
        w2.writeBits((0x20 | (order - 1)).toLong, 6) // LPC|order-1
        w2.writeBits(0L, 1)                         // no wasted bits
        var i = 0
        while (i < order) { w2.writeBits(s(i).toLong & 0xffff, 16); i += 1 }
        w2.writeBits(14L, 4)  // precision - 1 (15-bit coefficients)
        w2.writeBits(shift.toLong & 0x1f, 5)
        coefs.foreach(c => w2.writeBits(c.toLong & 0x7fff, 15))
        val resid = Array.tabulate(bs - order) { j =>
          val t = j + order
          var acc = 0L
          var m = 0
          while (m < order) { acc += coefs(m).toLong * s(t - 1 - m); m += 1 }
          s(t) - (acc >> shift).toInt
        }
        writeRice(w2, resid, bs, order)
      case None =>
        // FIXED order 2 (order 0/1 when the block is tiny)
        val order = math.min(2, bs - 1)
        w2.writeBits(0L, 1)                    // pad
        w2.writeBits((0x08 | order).toLong, 6) // FIXED|order
        w2.writeBits(0L, 1)                    // no wasted bits
        var i = 0
        while (i < order) { w2.writeBits(s(i).toLong & 0xffff, 16); i += 1 }
        val resid = Array.tabulate(bs - order) { j =>
          val t = j + order
          order match {
            case 0 => s(t)
            case 1 => s(t) - s(t - 1)
            case _ => s(t) - 2 * s(t - 1) + s(t - 2)
          }
        }
        writeRice(w2, resid, bs, order)
    }
    w2.alignByte()
    val body = w2.toBytes
    val full = new BitWriter
    body.foreach(b => full.writeBits(b & 0xffL, 8))
    full.writeBits(crc16(body, 0, body.length).toLong, 16)
    full.toBytes
  }

  // ---- decoder

  /** Rice-coded residual section: method tag, partition order, per-
    * partition parameter (with the 0b1111 raw-bitlen escape), zigzag
    * decode. Shared by the FIXED and LPC subframe branches.
    */
  private def readRice(id: Long, r: BitReader, bs: Int,
                       order: Int): Array[Int] = {
    val resid = new Array[Int](bs - order)
    val method = r.readBits(2).toInt
    require(method == 0, s"media $id: unsupported residual method $method")
    val po = r.readBits(4).toInt
    val nPart = 1 << po
    require(bs % nPart == 0 && bs / nPart > order,
      s"media $id: invalid partition order $po for block $bs")
    var p = 0
    var j = 0
    while (p < nPart) {
      val pUntil = (p + 1) * bs / nPart - order
      val k = r.readBits(4).toInt
      if (k == 15) { // raw escape
        val raw = r.readBits(5).toInt
        while (j < pUntil) { resid(j) = r.readSigned(raw); j += 1 }
      } else {
        while (j < pUntil) {
          val q = r.readUnary()
          val z = (q.toLong << k) | (if (k > 0) r.readBits(k) else 0L)
          resid(j) = ((z >>> 1) ^ -(z & 1L)).toInt // un-zigzag
          j += 1
        }
      }
      p += 1
    }
    resid
  }

  /** Decode a mono FLAC stream (CONSTANT/VERBATIM/FIXED/LPC subframes;
    * stereo decorrelation rejected loudly). Verifies every frame's
    * CRC-8 and CRC-16.
    */
  private[graft] def decodeFlac(id: Long, bytes: Array[Byte]): FlacOut = {
    require(bytes.length >= 42 &&
      new String(bytes, 0, 4, "US-ASCII") == "fLaC",
      s"media $id: not a FLAC stream")
    // metadata walk
    var off = 4
    var sampleRate = 0
    var totalSamples = 0L
    var bpsSi = 0
    var last = false
    var sawStreamInfo = false
    while (!last) {
      val h = bytes(off) & 0xff
      last = (h & 0x80) != 0
      val typ = h & 0x7f
      val len = ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      if (typ == 0) {
        sawStreamInfo = true
        val r = new BitReader(bytes, off + 4)
        r.readBits(16); r.readBits(16); r.readBits(24); r.readBits(24)
        sampleRate = r.readBits(20).toInt
        val channels = r.readBits(3).toInt + 1
        require(channels == 1, s"media $id: unsupported channels=$channels")
        bpsSi = r.readBits(5).toInt + 1
        totalSamples = r.readBits(36)
      }
      off += 4 + len
    }
    require(sawStreamInfo && sampleRate > 0, s"media $id: no STREAMINFO")
    // RFC 9639 allows total-samples = 0 meaning "unknown"; the decode
    // loop below is count-driven, so an unknown count would decode zero
    // frames and emit all-zero moments — garbage dressed as features.
    // Out-of-subset media must fail loudly (ADVICE-r8).
    require(totalSamples > 0,
      s"media $id: unknown total sample count (STREAMINFO=0) unsupported")
    var peak = 0
    var firstS = 0
    var sumS = 0L
    var sumsqS = 0L
    var decoded = 0L
    while (decoded < totalSamples) {
      val frameStart = off
      val r = new BitReader(bytes, off)
      require(r.readBits(14) == 0x3ffe, s"media $id: lost frame sync")
      r.readBits(1) // reserved
      r.readBits(1) // blocking strategy
      val bsCode = r.readBits(4).toInt
      val srCode = r.readBits(4).toInt
      val chan = r.readBits(4).toInt
      require(chan == 0, s"media $id: unsupported channel assignment $chan")
      val bpsCode = r.readBits(3).toInt
      r.readBits(1)
      // UTF-8 frame index: leading-ones count gives the byte length
      val b0 = r.readBits(8).toInt
      val extra = Integer.numberOfLeadingZeros(~(b0 << 24)) match {
        case 0 => 0
        case n => n - 1
      }
      (0 until extra).foreach(_ => r.readBits(8))
      val bs = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.readBits(8).toInt + 1
        case 7 => r.readBits(16).toInt + 1
        case c if c >= 8 => 256 << (c - 8)
        case c => throw new IllegalArgumentException(
          s"media $id: reserved block size code $c")
      }
      srCode match {
        case 0 => () // STREAMINFO
        case 12 => r.readBits(8)
        case 13 | 14 => r.readBits(16)
        case c if c >= 1 && c <= 11 => ()
        case c => throw new IllegalArgumentException(
          s"media $id: invalid sample rate code $c")
      }
      val bps = bpsCode match {
        case 0 => bpsSi
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case c => throw new IllegalArgumentException(
          s"media $id: reserved bps code $c")
      }
      // header CRC-8 (everything from frame start up to here is aligned)
      val hdrEnd = r.bytePos
      require(r.readBits(8).toInt == crc8(bytes, frameStart, hdrEnd),
        s"media $id: frame header CRC-8 mismatch")
      // subframe
      require(r.readBits(1) == 0L, s"media $id: bad subframe pad bit")
      val sfType = r.readBits(6).toInt
      val wasted = if (r.readBits(1) == 1L) r.readUnary() + 1 else 0
      val eff = bps - wasted
      val samples = new Array[Int](bs)
      if (sfType == 0) { // CONSTANT
        val v = r.readSigned(eff)
        java.util.Arrays.fill(samples, v)
      } else if (sfType == 1) { // VERBATIM
        var t = 0
        while (t < bs) { samples(t) = r.readSigned(eff); t += 1 }
      } else if ((sfType & 0x38) == 0x08 && (sfType & 0x07) <= 4) { // FIXED
        val order = sfType & 0x07
        var t = 0
        while (t < order) { samples(t) = r.readSigned(eff); t += 1 }
        val resid = readRice(id, r, bs, order)
        var t2 = order
        while (t2 < bs) {
          val pred = order match {
            case 0 => 0
            case 1 => samples(t2 - 1)
            case 2 => 2 * samples(t2 - 1) - samples(t2 - 2)
            case 3 => 3 * samples(t2 - 1) - 3 * samples(t2 - 2) +
              samples(t2 - 3)
            case _ => 4 * samples(t2 - 1) - 6 * samples(t2 - 2) +
              4 * samples(t2 - 3) - samples(t2 - 4)
          }
          samples(t2) = pred + resid(t2 - order)
          t2 += 1
        }
      } else if ((sfType & 0x20) != 0) { // LPC (r8)
        val order = (sfType & 0x1f) + 1
        require(order < bs, s"media $id: LPC order $order >= block $bs")
        var t = 0
        while (t < order) { samples(t) = r.readSigned(eff); t += 1 }
        val precM1 = r.readBits(4).toInt
        require(precM1 != 15, s"media $id: invalid LPC precision code")
        val precision = precM1 + 1
        val shift = r.readSigned(5)
        require(shift >= 0, s"media $id: negative LPC shift $shift")
        val coefs = Array.fill(order)(r.readSigned(precision))
        val resid = readRice(id, r, bs, order)
        var t2 = order
        while (t2 < bs) {
          var acc = 0L
          var m = 0
          while (m < order) {
            acc += coefs(m).toLong * samples(t2 - 1 - m)
            m += 1
          }
          samples(t2) = (acc >> shift).toInt + resid(t2 - order)
          t2 += 1
        }
      } else {
        throw new IllegalArgumentException(
          s"media $id: reserved subframe type $sfType")
      }
      r.alignByte()
      val bodyEnd = r.bytePos
      require(r.readBits(16).toInt == crc16(bytes, frameStart, bodyEnd),
        s"media $id: frame CRC-16 mismatch")
      var t = 0
      while (t < bs) {
        val v = samples(t) << wasted
        if (decoded == 0 && t == 0) firstS = v
        if (math.abs(v) > peak) peak = math.abs(v)
        sumS += v
        sumsqS += v.toLong * v
        t += 1
      }
      decoded += bs
      off = r.bytePos
    }
    FlacOut(id, sampleRate, decoded, decoded * 1000 / sampleRate,
      peak, firstS, sumS, sumsqS)
  }

  /** Batched FLAC decode — [[Multimodal.decodeBmpBatched]]'s
    * mapPartitions seam with this codec in the leaf.
    */
  def decodeFlacBatched(ds: org.apache.spark.sql.Dataset[Multimodal.MediaIn],
                        batchSize: Int = 64,
                        batchCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : org.apache.spark.sql.Dataset[FlacOut] = {
    require(batchSize > 0)
    implicit val enc: org.apache.spark.sql.Encoder[FlacOut] =
      org.apache.spark.sql.Encoders.product[FlacOut]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batchCounter.foreach(_.add(1))
        batch.iterator.map(m => decodeFlac(m.media_id, m.media))
      }
    }
  }
}
