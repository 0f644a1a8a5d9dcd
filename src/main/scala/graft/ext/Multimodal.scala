package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline (north-star EXT,
  * SURVEY.md §2.14): media as opaque `BinaryType` + typed metadata, with
  * decode / feature-extract / resize / frame-sample plumbing.
  *
  * STUB NOTICE: this container has no image/audio codec LIBRARIES, so
  * the generic `decode` is a clearly-marked deterministic fake
  * (header-math dimensions/features from the bytes). The Spark-side
  * contract — schema, batch shape, partitioning, column signatures —
  * is real and tested; swapping the fake for a codec-backed vectorized
  * UDF (e.g. Arrow-batched) changes only the leaf expressions. Two
  * formats ARE decoded for real, pure JVM, through the same batched
  * path: uncompressed 24-bit BMP ([[decodeBmp]]/[[decodeBmpBatched]],
  * q201 — actual pixels) and 16-bit mono PCM WAV
  * ([[decodeWav]]/[[decodeWavBatched]], q209 — actual samples).
  */
object Multimodal {

  /** Canonical media record schema: bytes + envelope metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType), // "image/png", "audio/wav", ...
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Code point of the `pos`-th (1-indexed) character of the payload's
    * string view, 0 past the end — for ASCII payloads this IS the byte,
    * matching [[parseHeader]]'s `b(i)`, and any engine recomputes it
    * with `ascii(substr(...))`. (A real codec reads raw bytes; the stub
    * documents the ASCII-payload assumption instead of hiding behind a
    * hash.)
    */
  private def byteAt(s: Column, pos: Int): Column =
    when(length(s) >= pos, ascii(substring(s, pos, 1))).otherwise(lit(0))

  /** STUB decode: dimensions a real codec would read from the header,
    * here parsed from the leading payload bytes (big-endian pairs, mod
    * display dims) — the same math as the batched path's
    * [[parseHeader]], so the columnar and mapPartitions decoders agree
    * byte-for-byte on ASCII payloads (pinned in MultimodalSpec), and
    * the DuckDB oracle recomputes every value with ascii() arithmetic.
    * Real impl: a vectorized batch UDF decoding per partition.
    */
  def decodeStub(media: Column): Column = {
    val s = media.cast("string")
    struct(
      ((byteAt(s, 1) * 256 + byteAt(s, 2)) % 1920 + 1).cast("int").as("width"),
      ((byteAt(s, 3) * 256 + byteAt(s, 4)) % 1080 + 1).cast("int").as("height"),
      length(media).cast("long").as("n_bytes"))
  }

  /** STUB resize: metadata-level scale of the decoded dimensions (a real
    * impl rewrites pixels; the plumbing — a struct→struct column map —
    * is identical).
    */
  def resizeStub(decoded: Column, maxDim: Int): Column = {
    val w = decoded.getField("width")
    val h = decoded.getField("height")
    val scale = lit(maxDim) / greatest(w, h)
    struct(
      when(greatest(w, h) <= maxDim, w)
        .otherwise(floor(w * scale).cast("int")).as("width"),
      when(greatest(w, h) <= maxDim, h)
        .otherwise(floor(h * scale).cast("int")).as("height"),
      decoded.getField("n_bytes").as("n_bytes"))
  }

  /** STUB feature extraction: fixed-dim pseudo-embedding from the
    * payload bytes after the 4-byte "header" (byte value / 256 → values
    * in [0, 1)). Deterministic, columnar, no UDF, and — unlike the
    * previous hash-seeded form — independently recomputable by the
    * DuckDB oracle. The real codec-backed extractor slots in at the
    * same signature (binary → array<double>).
    */
  def featuresStub(media: Column, dim: Int = 8): Column = {
    val s = media.cast("string")
    array((0 until dim).map(i =>
      byteAt(s, 5 + i).cast("double") / 256.0): _*)
  }

  /** Frame/segment sampling: split the payload into `n` byte ranges and
    * take each range's prefix — the batch-shape analogue of sampling n
    * frames from a video (real impl: codec seek). Works on BinaryType
    * via substr.
    */
  def frameSample(media: Column, n: Int, frameBytes: Int = 16): Column = {
    val len = length(media)
    array((0 until n).map { i =>
      val off = (len * i / n) + 1
      media.substr(off, lit(frameBytes))
    }: _*)
  }

  /** Input/output rows of the batched decoder. */
  case class MediaIn(media_id: Long, media: Array[Byte])
  case class MediaOut(media_id: Long, width: Int, height: Int, n_bytes: Long)

  /** "Header parse" of the stub codec: width/height from the first four
    * payload bytes (big-endian pairs, mod display dims) — the shape of a
    * real header read, deterministic, and recomputable by any engine
    * (for ASCII payloads: `ascii(substr(...))` arithmetic).
    */
  private[ext] def parseHeader(bytes: Array[Byte]): (Int, Int) = {
    def b(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else 0
    ((b(0) * 256 + b(1)) % 1920 + 1, (b(2) * 256 + b(3)) % 1080 + 1)
  }

  /** Batched per-partition decode — the execution shape a REAL codec
    * needs: one codec context per batch (JNI/native init amortized over
    * `batchSize` payloads), iterator-in/iterator-out so a partition
    * never materializes, and no row-level UDF boundary. The stub
    * "codec" is [[parseHeader]]; a libjpeg/ffmpeg-backed context slots
    * into `newContext`/`decode` without touching the Spark plumbing.
    * `batchCounter`, when set, counts context inits (spec observability:
    * inits track batches, not rows).
    */
  def decodeBatched(ds: org.apache.spark.sql.Dataset[MediaIn],
                    batchSize: Int = 64,
                    batchCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : org.apache.spark.sql.Dataset[MediaOut] = {
    require(batchSize > 0)
    implicit val enc: org.apache.spark.sql.Encoder[MediaOut] =
      org.apache.spark.sql.Encoders.product[MediaOut]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // REAL impl: val ctx = Codec.newContext(); batch.map(ctx.decode)
        batchCounter.foreach(_.add(1)) // one "context init" per batch
        batch.iterator.map { m =>
          val (w, h) = parseHeader(m.media)
          MediaOut(m.media_id, w, h, m.media.length.toLong)
        }
      }
    }
  }

  // ---------------------------------------------------------------
  // REAL codec: uncompressed 24-bit BMP (pure JVM, no native libs).
  // The one format this container can decode for real — so the
  // multimodal column is first-class beyond metadata: actual pixels
  // come out, and the padding/bottom-up/channel-order details below
  // are exactly the bugs a fake can't catch.
  // ---------------------------------------------------------------

  /** Decoded BMP record: dimensions, per-channel pixel means, and the
    * TOP-LEFT pixel's channels. The corner pixel is deliberately
    * order-sensitive: BMP stores rows BOTTOM-UP with each row padded
    * to 4 bytes, so reading it requires walking to the last stored
    * row past the padding — a decoder that ignores either detail gets
    * it wrong while the (order-free) means still pass.
    */
  case class BmpOut(media_id: Long, width: Int, height: Int,
                    mean_r: Double, mean_g: Double, mean_b: Double,
                    tl_r: Int, tl_g: Int, tl_b: Int)

  /** Encode an uncompressed 24-bit bottom-up BMP (BITMAPINFOHEADER,
    * rows padded to 4 bytes, pixels stored B,G,R). `pix(x, y)` gives
    * (r, g, b) with y=0 the TOP row — the encoder does the vertical
    * flip the format mandates. Pure fixture builder for the decode
    * oracle; deterministic byte-for-byte.
    */
  def encodeBmp(w: Int, h: Int, pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0)
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(54 + dataSize).putInt(0).putInt(54)   // file header
      .putInt(40).putInt(w).putInt(h)               // DIB: size, w, h (+h = bottom-up)
      .putShort(1).putShort(24).putInt(0)           // planes, bpp, BI_RGB
      .putInt(dataSize).putInt(2835).putInt(2835)   // size, 72 dpi
      .putInt(0).putInt(0)                          // palette
    // bottom-up: stored row 0 holds the BOTTOM image row (y = h-1)
    var sy = 0
    while (sy < h) {
      val y = h - 1 - sy                            // image row this stored row holds
      var x = 0
      while (x < w) {
        val (r, g, b) = pix(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var p = 0
      while (p < pad) { buf.put(0.toByte); p += 1 }
      sy += 1
    }
    buf.array()
  }

  /** Decode an uncompressed 24-bit BMP: validates the magic, bpp and
    * BI_RGB compression, honors the pixel-array offset, per-row
    * padding, channel order (B,G,R) and bottom-up row storage (a
    * negative height means top-down — also handled). Throws
    * IllegalArgumentException on anything it can't decode — corrupt
    * media must fail loudly, not produce silent garbage features.
    */
  private[ext] def decodeBmp(id: Long, bytes: Array[Byte]): BmpOut = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      s"media $id: not a BMP")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val off = buf.getInt(10)
    val w = buf.getInt(18)
    val hRaw = buf.getInt(22)
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    val bpp = buf.getShort(28).toInt
    val comp = buf.getInt(30)
    require(bpp == 24 && comp == 0,
      s"media $id: unsupported BMP (bpp=$bpp comp=$comp)")
    val rowStride = w * 3 + (4 - (w * 3) % 4) % 4
    require(off + rowStride.toLong * h <= bytes.length,
      s"media $id: truncated pixel array")
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var tlR = 0; var tlG = 0; var tlB = 0
    var sy = 0
    while (sy < h) {
      val y = if (bottomUp) h - 1 - sy else sy // image row of stored row sy
      val base = off + sy * rowStride
      var x = 0
      while (x < w) {
        val b = bytes(base + x * 3) & 0xff
        val g = bytes(base + x * 3 + 1) & 0xff
        val r = bytes(base + x * 3 + 2) & 0xff
        sumR += r; sumG += g; sumB += b
        if (x == 0 && y == 0) { tlR = r; tlG = g; tlB = b }
        x += 1
      }
      sy += 1
    }
    val n = w.toLong * h
    BmpOut(id, w, h, sumR.toDouble / n, sumG.toDouble / n,
      sumB.toDouble / n, tlR, tlG, tlB)
  }

  /** Batched BMP decode — [[decodeBatched]]'s shape with the REAL
    * codec in the leaf: iterator-in/iterator-out mapPartitions, one
    * "context" per `batchSize` payloads (a pure-JVM decoder needs no
    * context, but the seam — and the accumulator observability — is
    * where a libjpeg/ffmpeg handle would amortize).
    */
  def decodeBmpBatched(ds: org.apache.spark.sql.Dataset[MediaIn],
                       batchSize: Int = 64,
                       batchCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : org.apache.spark.sql.Dataset[BmpOut] = {
    require(batchSize > 0)
    implicit val enc: org.apache.spark.sql.Encoder[BmpOut] =
      org.apache.spark.sql.Encoders.product[BmpOut]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batchCounter.foreach(_.add(1))
        batch.iterator.map(m => decodeBmp(m.media_id, m.media))
      }
    }
  }

  // ---------------------------------------------------------------
  // REAL codec #2: PCM WAV (pure JVM). The audio counterpart of the
  // BMP decoder: a RIFF chunk WALK (fmt / junk / data in any order,
  // odd-sized chunks padded to even), not a fixed-offset read — the
  // fixture inserts an odd-sized junk chunk between fmt and data so a
  // decoder that assumes samples start at byte 44 reads garbage.
  // ---------------------------------------------------------------

  /** Decoded WAV record. All-integer on purpose (exact sums, no float
    * convention needed): `first_s` is the order-sensitive probe (wrong
    * data offset ⇒ wrong first sample while `peak`/`sum_s` may still
    * collide), `sum_s`/`sumsq_s` are exact 64-bit moments a caller
    * derives mean/RMS from.
    */
  case class WavOut(media_id: Long, sample_rate: Int, n_samples: Long,
                    duration_ms: Long, peak: Int, first_s: Int,
                    sum_s: Long, sumsq_s: Long)

  /** Encode a 16-bit mono PCM WAV (RIFF/WAVE, fmt chunk, an odd-sized
    * "junk" filler chunk + its mandated pad byte, then data). `sample(t)`
    * gives the t-th sample in [-32768, 32767]. Fixture builder for the
    * decode oracle; deterministic byte-for-byte.
    */
  def encodeWav(sampleRate: Int, nSamples: Int, sample: Int => Int): Array[Byte] = {
    require(sampleRate > 0 && nSamples > 0)
    val junk = Array[Byte]('x', 'y', 'z') // odd size 3 → 1 pad byte
    val dataSize = nSamples * 2
    val riffSize = 4 + (8 + 16) + (8 + junk.length + 1) + (8 + dataSize)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    buf.put("LIST".getBytes("US-ASCII")).putInt(junk.length)
      .put(junk).put(0.toByte)           // odd chunk → pad to even
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var t = 0
    while (t < nSamples) {
      val s = sample(t)
      require(s >= Short.MinValue && s <= Short.MaxValue, s"sample $t out of range")
      buf.putShort(s.toShort)
      t += 1
    }
    buf.array()
  }

  /** Decode a 16-bit mono PCM WAV by WALKING the RIFF chunks: validates
    * magic/format, reads `fmt ` wherever it appears, skips unknown
    * chunks (honoring the odd-size pad byte), and locates `data` by its
    * tag — never by a fixed offset. Throws IllegalArgumentException on
    * anything it can't decode — corrupt media must fail loudly, not
    * produce silent garbage features.
    */
  private[ext] def decodeWav(id: Long, bytes: Array[Byte]): WavOut = {
    require(bytes.length >= 44, s"media $id: too short for WAV")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "WAVE", s"media $id: not a WAV")
    var pos = 12
    var rate = -1; var dataOff = -1; var dataLen = -1
    while (pos + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
      val ck = tag(pos); val len = buf.getInt(pos + 4)
      require(len >= 0 && pos + 8 + len <= bytes.length,
        s"media $id: truncated chunk $ck")
      ck match {
        case "fmt " =>
          require(len >= 16, s"media $id: short fmt chunk")
          val fmt = buf.getShort(pos + 8).toInt
          val ch = buf.getShort(pos + 10).toInt
          val bits = buf.getShort(pos + 22).toInt
          require(fmt == 1 && ch == 1 && bits == 16,
            s"media $id: unsupported WAV (fmt=$fmt ch=$ch bits=$bits)")
          rate = buf.getInt(pos + 12)
        case "data" => dataOff = pos + 8; dataLen = len
        case _ => // skip unknown chunk
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned: odd size → pad
    }
    require(rate > 0, s"media $id: no fmt chunk")
    require(dataOff >= 0 && dataLen % 2 == 0, s"media $id: no PCM data")
    val n = dataLen / 2
    require(n > 0, s"media $id: empty PCM data")
    var sum = 0L; var sumsq = 0L; var peak = 0
    val first = buf.getShort(dataOff).toInt
    var i = 0
    while (i < n) {
      val s = buf.getShort(dataOff + i * 2).toInt
      sum += s; sumsq += s.toLong * s
      val a = math.abs(s); if (a > peak) peak = a
      i += 1
    }
    WavOut(id, rate, n.toLong, n.toLong * 1000L / rate, peak, first, sum, sumsq)
  }

  /** Batched WAV decode — [[decodeBatched]]'s shape with the REAL audio
    * codec in the leaf (same context-per-batch seam as
    * [[decodeBmpBatched]]).
    */
  def decodeWavBatched(ds: org.apache.spark.sql.Dataset[MediaIn],
                       batchSize: Int = 64,
                       batchCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : org.apache.spark.sql.Dataset[WavOut] = {
    require(batchSize > 0)
    implicit val enc: org.apache.spark.sql.Encoder[WavOut] =
      org.apache.spark.sql.Encoders.product[WavOut]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batchCounter.foreach(_.add(1))
        batch.iterator.map(m => decodeWav(m.media_id, m.media))
      }
    }
  }

  // ---------------------------------------------------------------
  // REAL codec #3: PNG via javax.imageio (pure JDK, zero new deps) —
  // the first COMPRESSED format through the batched path: zlib
  // inflate + per-scanline defiltering happen inside the JDK reader,
  // so this covers the format a real image corpus actually ships
  // (q201's BMP pins the hand-rolled byte walk; PNG pins the
  // library-backed seam a libjpeg/WebP context would use).
  // ---------------------------------------------------------------

  /** Decoded PNG record — [[BmpOut]]'s shape (dimensions, per-channel
    * means, order-sensitive top-left probe) so the two image codecs
    * share oracle spelling and specs.
    */
  case class PngOut(media_id: Long, width: Int, height: Int,
                    mean_r: Double, mean_g: Double, mean_b: Double,
                    tl_r: Int, tl_g: Int, tl_b: Int)

  /** Encode an RGB PNG with `pix(x, y) = (r, g, b)`, y=0 the top row.
    * Fixture builder for the decode oracle: ImageIO writes a real
    * compressed PNG (IHDR/IDAT/IEND, deflate, filters) — NOT a stub.
    */
  def encodePng(w: Int, h: Int, pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pix(x, y)
        img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos),
      "JDK PNG writer unavailable")
    bos.toByteArray
  }

  /** Decode a PNG (any color model ImageIO handles — the RGB read goes
    * through `getRGB`, which normalizes palette/gray to sRGB). Throws
    * IllegalArgumentException on non-PNG magic or undecodable bytes —
    * corrupt media fails loudly, never silent garbage (decodeBmp's
    * contract).
    */
  private[ext] def decodePng(id: Long, bytes: Array[Byte]): PngOut = {
    require(bytes.length >= 8 &&
      (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G',
      s"media $id: not a PNG")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"media $id: undecodable PNG body")
    val (w, h) = (img.getWidth, img.getHeight)
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sumR += (p >> 16) & 0xff; sumG += (p >> 8) & 0xff; sumB += p & 0xff
        x += 1
      }
      y += 1
    }
    val tl = img.getRGB(0, 0)
    val n = w.toLong * h
    PngOut(id, w, h, sumR.toDouble / n, sumG.toDouble / n,
      sumB.toDouble / n, (tl >> 16) & 0xff, (tl >> 8) & 0xff, tl & 0xff)
  }

  /** Batched PNG decode — [[decodeBatched]]'s shape with the JDK codec
    * in the leaf. ImageIO reader instances are NOT thread-safe but ARE
    * cheap per call; the per-batch seam is where a pooled native
    * decoder handle would live.
    */
  def decodePngBatched(ds: org.apache.spark.sql.Dataset[MediaIn],
                       batchSize: Int = 64,
                       batchCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : org.apache.spark.sql.Dataset[PngOut] = {
    require(batchSize > 0)
    implicit val enc: org.apache.spark.sql.Encoder[PngOut] =
      org.apache.spark.sql.Encoders.product[PngOut]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batchCounter.foreach(_.add(1))
        batch.iterator.map(m => decodePng(m.media_id, m.media))
      }
    }
  }

  /** Encode an RGB JPEG (default ImageIO quality) — fixture builder
    * for [[decodeJpegBatched]]. JPEG is LOSSY: decoded pixels are
    * close to, not equal to, `pix(x, y)`, so oracles for this codec
    * are tolerance CONTRACTS (the q44 recall-contract stance), never
    * byte-equality.
    */
  def encodeJpeg(w: Int, h: Int, pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pix(x, y)
        img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "jpg", bos),
      "JDK JPEG writer unavailable")
    bos.toByteArray
  }

  /** Decode a JPEG (SOI magic FF D8 validated; DCT inverse + chroma
    * upsampling inside the JDK reader). Same output shape as
    * [[decodePng]]; corrupt media fails loudly.
    */
  private[ext] def decodeJpeg(id: Long, bytes: Array[Byte]): PngOut = {
    require(bytes.length >= 3 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      s"media $id: not a JPEG")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"media $id: undecodable JPEG body")
    val (w, h) = (img.getWidth, img.getHeight)
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sumR += (p >> 16) & 0xff; sumG += (p >> 8) & 0xff; sumB += p & 0xff
        x += 1
      }
      y += 1
    }
    val tl = img.getRGB(0, 0)
    val n = w.toLong * h
    PngOut(id, w, h, sumR.toDouble / n, sumG.toDouble / n,
      sumB.toDouble / n, (tl >> 16) & 0xff, (tl >> 8) & 0xff, tl & 0xff)
  }

  /** Batched JPEG decode — [[decodeBatched]]'s shape, JDK codec leaf. */
  def decodeJpegBatched(ds: org.apache.spark.sql.Dataset[MediaIn],
                        batchSize: Int = 64,
                        batchCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : org.apache.spark.sql.Dataset[PngOut] = {
    require(batchSize > 0)
    implicit val enc: org.apache.spark.sql.Encoder[PngOut] =
      org.apache.spark.sql.Encoders.product[PngOut]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batchCounter.foreach(_.add(1))
        batch.iterator.map(m => decodeJpeg(m.media_id, m.media))
      }
    }
  }

  // ---------------------------------------------------------------
  // REAL codec #6: GIF (r9) — FROM-SCRATCH parser + LZW decompressor
  // (header / logical screen descriptor / global+local color tables /
  // extension-block skip / image descriptor / variable-code-width LZW
  // with clear-code dictionary resets and the deferred k-omega case),
  // anchored against an EXTERNAL ground truth: the fixture bytes come
  // from the JDK's own GIF *writer* (indexed color model, lossless),
  // so a decoder bug cannot cancel against an encoder bug the way a
  // self-paired codec could (the FLAC caveat). The JDK writer
  // interlaces by default, so the 4-pass deinterlace permutation is
  // exercised by every fixture. Out-of-subset media — truncated
  // streams, bad LZW codes, missing color tables — fail loudly.
  // ---------------------------------------------------------------

  /** Encode a GIF via the JDK writer with an EXPLICIT exact palette
    * (TYPE_BYTE_INDEXED over the image's own distinct colors, ≤256 by
    * construction) — lossless, unlike letting the writer quantize a
    * true-color image. Fixture builder for [[decodeGifBatched]].
    */
  def encodeGif(w: Int, h: Int, pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0)
    val colors = (for (y <- 0 until h; x <- 0 until w) yield pix(x, y)).distinct
    require(colors.size <= 256,
      s"GIF fixture needs <= 256 distinct colors, got ${colors.size}")
    val n = colors.size
    val rs = new Array[Byte](n); val gs = new Array[Byte](n)
    val bs = new Array[Byte](n)
    colors.zipWithIndex.foreach { case ((r, g, b), i) =>
      rs(i) = r.toByte; gs(i) = g.toByte; bs(i) = b.toByte
    }
    val icm = new java.awt.image.IndexColorModel(8, n, rs, gs, bs)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pix(x, y)
        img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "gif", bos),
      "JDK GIF writer unavailable")
    bos.toByteArray
  }

  /** LSB-first bit reader over the concatenated LZW sub-block bytes. */
  private final class LzwBits(data: Array[Byte]) {
    private var pos = 0
    private var bit = 0
    def read(nBits: Int): Int = {
      var v = 0
      var got = 0
      while (got < nBits) {
        require(pos < data.length, "LZW stream truncated")
        val avail = 8 - bit
        val take = math.min(avail, nBits - got)
        v |= (((data(pos) & 0xff) >> bit) & ((1 << take) - 1)) << got
        got += take
        bit += take
        if (bit == 8) { bit = 0; pos += 1 }
      }
      v
    }
  }

  /** GIF-variant LZW decode of `nPix` palette indices: code width
    * starts at minCodeSize+1, grows when the next free slot crosses a
    * power of two (cap 12 bits), clear code resets, the k-omega case
    * (code == next free slot) emits prev + prev.head.
    */
  private def lzwDecode(id: Long, minCode: Int, data: Array[Byte],
                        nPix: Int): Array[Byte] = {
    val bits = new LzwBits(data)
    val clear = 1 << minCode
    val eoi = clear + 1
    val dict = new Array[Array[Byte]](4096)
    def resetDict(): Int = {
      var i = 0
      while (i < clear) { dict(i) = Array(i.toByte); i += 1 }
      clear + 2
    }
    var next = resetDict()
    var codeSize = minCode + 1
    var prev: Array[Byte] = null
    val out = new java.io.ByteArrayOutputStream(nPix)
    var done = false
    while (!done && out.size < nPix) {
      val code = bits.read(codeSize)
      if (code == clear) {
        next = resetDict(); codeSize = minCode + 1; prev = null
      } else if (code == eoi) {
        done = true
      } else {
        val entry: Array[Byte] =
          if (code < next && dict(code) != null) dict(code)
          else {
            require(code == next && prev != null,
              s"media $id: bad LZW code $code (next=$next)")
            prev :+ prev(0)
          }
        out.write(entry, 0, entry.length)
        if (prev != null && next < 4096) {
          dict(next) = prev :+ entry(0)
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = entry
      }
    }
    val idx = out.toByteArray
    require(idx.length == nPix,
      s"media $id: LZW decoded ${idx.length} pixels, expected $nPix")
    idx
  }

  /** Per-frame decode record for animated GIFs (the video-adjacent
    * frame-sample path with a REAL codec behind it).
    */
  case class GifFrameOut(media_id: Long, frame: Int, width: Int, height: Int,
                         mean_r: Double, mean_g: Double, mean_b: Double,
                         tl_r: Int, tl_g: Int, tl_b: Int)

  /** Walk ALL image blocks of a (possibly animated) GIF, decoding
    * every `sampleEvery`-th frame and SKIPPING the LZW dictionary work
    * for unsampled ones (their sub-blocks are length-walked only — the
    * scale story: sampling 1-in-30 frames pays 1/30th of the decode,
    * not 1/30th of the output). Frames must be full-logical-screen
    * replacements (left=0, top=0) — partial-frame disposal composition
    * is out of subset and fails loudly.
    * The LZW dictionary is the standard GIF variant: code width starts
    * at minCodeSize+1, grows when the next free slot crosses a power
    * of two (cap 12 bits), clear code resets, and the k-omega case
    * (code == next free slot) emits prev + prev.head. Pixels map
    * through the active (local-over-global) color table. Interlace is
    * handled by the 4-pass row permutation.
    */
  private[ext] def gifFrames(id: Long, bytes: Array[Byte],
                             sampleEvery: Int = 1): Vector[GifFrameOut] = {
    require(sampleEvery >= 1)
    require(bytes.length >= 13 &&
      bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') &&
      bytes(5) == 'a', s"media $id: not a GIF")
    var p = 6
    def u8(): Int = { val v = bytes(p) & 0xff; p += 1; v }
    def u16(): Int = { val v = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8); p += 2; v }
    def colorTable(sizeBits: Int): Array[Int] = {
      val sz = 2 << sizeBits
      val t = new Array[Int](sz)
      var i = 0
      while (i < sz) { t(i) = (u8() << 16) | (u8() << 8) | u8(); i += 1 }
      t
    }
    u16(); u16() // logical screen w/h (each image descriptor's governs)
    val packed = u8()
    u8(); u8() // background color index, aspect ratio
    val gct: Array[Int] =
      if ((packed & 0x80) != 0) colorTable(packed & 0x07) else Array.empty
    var frames = Vector.empty[GifFrameOut]
    var frameIdx = 0
    var sep = u8()
    while (sep != 0x3b) {
      if (sep == 0x21) { // extension: label + sub-blocks
        u8()
        var len = u8()
        while (len != 0) { p += len; len = u8() }
      } else if (sep == 0x2c) {
        val left = u16(); val top = u16()
        require(left == 0 && top == 0,
          s"media $id: partial-frame composition unsupported")
        val w = u16(); val h = u16()
        require(w > 0 && h > 0, s"media $id: empty image")
        val ipacked = u8()
        val interlaced = (ipacked & 0x40) != 0
        val table: Array[Int] =
          if ((ipacked & 0x80) != 0) colorTable(ipacked & 0x07) else gct
        require(table.nonEmpty, s"media $id: no color table")
        val minCode = u8()
        require(minCode >= 2 && minCode <= 8,
          s"media $id: bad LZW root size $minCode")
        if (frameIdx % sampleEvery != 0) {
          // unsampled: length-walk the sub-blocks, no LZW work
          var len = u8()
          while (len != 0) { p += len; len = u8() }
        } else {
          val lzw = new java.io.ByteArrayOutputStream()
          var len = u8()
          while (len != 0) {
            lzw.write(bytes, p, len); p += len
            len = u8()
          }
          val idx0 = lzwDecode(id, minCode, lzw.toByteArray, w * h)
          // GIF89a appendix E interlace: rows arrive in four passes
          // (every 8th from 0, every 8th from 4, every 4th from 2,
          // every 2nd from 1) — permute back to scan order
          val idx = if (!interlaced) idx0 else {
            val res = new Array[Byte](idx0.length)
            var src = 0
            Seq((0, 8), (4, 8), (2, 4), (1, 2)).foreach { case (start, step) =>
              var r = start
              while (r < h) {
                System.arraycopy(idx0, src * w, res, r * w, w)
                src += 1
                r += step
              }
            }
            res
          }
          var sumR = 0L; var sumG = 0L; var sumB = 0L
          var i = 0
          while (i < idx.length) {
            val ci = idx(i) & 0xff
            require(ci < table.length,
              s"media $id: palette index $ci out of range")
            val c = table(ci)
            sumR += (c >> 16) & 0xff; sumG += (c >> 8) & 0xff
            sumB += c & 0xff
            i += 1
          }
          val tl = table(idx(0) & 0xff)
          val nPix = w.toLong * h
          frames :+= GifFrameOut(id, frameIdx, w, h, sumR.toDouble / nPix,
            sumG.toDouble / nPix, sumB.toDouble / nPix,
            (tl >> 16) & 0xff, (tl >> 8) & 0xff, tl & 0xff)
        }
        frameIdx += 1
      } else {
        require(false, s"media $id: unknown block separator $sep")
      }
      sep = u8()
    }
    require(frames.nonEmpty, s"media $id: no decodable frames")
    frames
  }

  /** Decode a single-image GIF (the q349 path): frame 0's moments. */
  private[ext] def decodeGif(id: Long, bytes: Array[Byte]): PngOut = {
    val f = gifFrames(id, bytes).head
    PngOut(f.media_id, f.width, f.height, f.mean_r, f.mean_g, f.mean_b,
      f.tl_r, f.tl_g, f.tl_b)
  }


  /** Batched GIF decode — [[decodeBatched]]'s shape, from-scratch leaf. */
  def decodeGifBatched(ds: org.apache.spark.sql.Dataset[MediaIn],
                       batchSize: Int = 64,
                       batchCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : org.apache.spark.sql.Dataset[PngOut] = {
    require(batchSize > 0)
    implicit val enc: org.apache.spark.sql.Encoder[PngOut] =
      org.apache.spark.sql.Encoders.product[PngOut]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batchCounter.foreach(_.add(1))
        batch.iterator.map(m => decodeGif(m.media_id, m.media))
      }
    }
  }

  /** Batched animated-GIF frame sampling: decode every `sampleEvery`-th
    * frame of each payload (unsampled frames are length-walked, not
    * LZW-decoded — see [[gifFrames]]), iterator-out one row per sampled
    * frame. The video frame-sample path with a real codec in the leaf.
    */
  def sampleGifFramesBatched(ds: org.apache.spark.sql.Dataset[MediaIn],
                             sampleEvery: Int,
                             batchSize: Int = 64,
                             batchCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : org.apache.spark.sql.Dataset[GifFrameOut] = {
    require(batchSize > 0)
    implicit val enc: org.apache.spark.sql.Encoder[GifFrameOut] =
      org.apache.spark.sql.Encoders.product[GifFrameOut]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batchCounter.foreach(_.add(1))
        batch.iterator.flatMap(m =>
          gifFrames(m.media_id, m.media, sampleEvery))
      }
    }
  }

  /** One hand-authored frame for [[encodeGifComposed]]: a partial
    * rectangle at (left, top) with its GCE disposal method and
    * row-major palette indices. `transparentIndex` ≥ 0 sets the GCE
    * transparency flag: pixels carrying that palette index PASS
    * THROUGH (leave the canvas untouched) when composited (r11,
    * VERDICT-r10 #7).
    */
  case class GifRawFrame(left: Int, top: Int, w: Int, h: Int,
                         disposal: Int, indices: Array[Byte],
                         transparentIndex: Int = -1)

  /** Hand-rolled GIF89a writer for COMPOSITION fixtures (the JDK
    * sequence writer cannot author partial frames or disposal methods
    * without deep metadata-tree surgery): header, 256-entry global
    * color table, and per frame a Graphic Control Extension (disposal,
    * zero delay, no transparency) + image descriptor + LZW data. The
    * LZW stream uses the classic UNCOMPRESSED-GIF technique — literal
    * codes at root-size-8 width with a CLEAR emitted before the
    * decoder's dictionary would force a width change — valid LZW any
    * conformant reader (incl. the JDK's) accepts.
    */
  def encodeGifComposed(screenW: Int, screenH: Int,
                        palette: Seq[(Int, Int, Int)],
                        frames: Seq[GifRawFrame]): Array[Byte] = {
    require(screenW > 0 && screenH > 0 && frames.nonEmpty)
    require(palette.nonEmpty && palette.size <= 256)
    val bos = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = bos.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    bos.write("GIF89a".getBytes("US-ASCII"))
    w16(screenW); w16(screenH)
    w8(0xf7); w8(0); w8(0) // GCT flag + 256 entries; bg index 0
    (0 until 256).foreach { i =>
      val (r, g, b) = if (i < palette.size) palette(i) else (0, 0, 0)
      w8(r); w8(g); w8(b)
    }
    frames.foreach { f =>
      require(f.indices.length == f.w * f.h)
      require(f.left >= 0 && f.top >= 0 &&
        f.left + f.w <= screenW && f.top + f.h <= screenH)
      require(f.transparentIndex < 256)
      val tflag = if (f.transparentIndex >= 0) 1 else 0
      w8(0x21); w8(0xf9); w8(4); w8(((f.disposal & 7) << 2) | tflag)
      w16(0) // zero delay
      w8(if (f.transparentIndex >= 0) f.transparentIndex else 0)
      w8(0) // GCE terminator
      w8(0x2c); w16(f.left); w16(f.top); w16(f.w); w16(f.h); w8(0)
      val minCode = 8
      w8(minCode)
      val clear = 1 << minCode
      val eoi = clear + 1
      val width = minCode + 1
      val payload = new java.io.ByteArrayOutputStream()
      var cur = 0L
      var nb = 0
      def emit(code: Int): Unit = {
        cur |= code.toLong << nb; nb += width
        while (nb >= 8) {
          payload.write((cur & 0xff).toInt); cur >>= 8; nb -= 8
        }
      }
      emit(clear)
      var count = 0
      val cap = clear - 2 // decoder's next stays below 1 << (minCode+1)
      f.indices.foreach { ix =>
        if (count == cap) { emit(clear); count = 0 }
        emit(ix & 0xff); count += 1
      }
      emit(eoi)
      if (nb > 0) payload.write((cur & 0xff).toInt)
      val data = payload.toByteArray
      var off = 0
      while (off < data.length) {
        val len = math.min(255, data.length - off)
        w8(len); bos.write(data, off, len); off += len
      }
      w8(0)
    }
    w8(0x3b)
    bos.toByteArray
  }

  /** Composited animated-GIF sampling with GCE semantics: partial
    * frames paint onto a persistent canvas; disposal 0/1 leave the
    * frame in place, disposal 2 restores the frame's REGION to the
    * background color after display, disposal 3 restores the canvas
    * to its pre-frame state (one saved canvas copy — bounded memory,
    * only while a d3 frame is in flight); GCE transparency (r11)
    * passes the flagged palette index through, leaving the canvas
    * pixel untouched. EVERY frame must be LZW-decoded —
    * composition is a running fold over the canvas (the same reason
    * video needs keyframes) — so unlike [[gifFrames]], sampling here
    * selects which canvas SNAPSHOTS are emitted, not which frames are
    * decoded. Emitted dims are the LOGICAL SCREEN's (the canvas), not
    * the frame rect's.
    */
  private[graft] def gifComposited(id: Long, bytes: Array[Byte],
                                   sampleEvery: Int = 1): Vector[GifFrameOut] = {
    require(sampleEvery >= 1)
    var frames = Vector.empty[GifFrameOut]
    gifComposeWalk(id, bytes) { (frameIdx, screenW, screenH, canvas) =>
      if (frameIdx % sampleEvery == 0) {
        var sumR = 0L; var sumG = 0L; var sumB = 0L
        canvas.foreach { c =>
          sumR += (c >> 16) & 0xff; sumG += (c >> 8) & 0xff
          sumB += c & 0xff
        }
        val tl = canvas(0)
        val nPix = screenW.toLong * screenH
        frames :+= GifFrameOut(id, frameIdx, screenW, screenH,
          sumR.toDouble / nPix, sumG.toDouble / nPix,
          sumB.toDouble / nPix,
          (tl >> 16) & 0xff, (tl >> 8) & 0xff, tl & 0xff)
      }
    }
    require(frames.nonEmpty, s"media $id: no decodable frames")
    frames
  }

  /** The GCE composition walk under [[gifComposited]], factored so the
    * fuzz spec (r10, VERDICT-r9 #4) can compare WHOLE CANVASES per
    * frame against an independent compositor over the JDK reader's
    * decoded frames — the public sampler emits only channel means +
    * top-left, which a compensating two-pixel error could slip past.
    * `emit` receives the LIVE canvas after each frame's paint (before
    * its disposal runs) — copy it if you keep it.
    */
  private[graft] def gifComposeWalk(id: Long, bytes: Array[Byte])
      (emit: (Int, Int, Int, Array[Int]) => Unit): Unit = {
    require(bytes.length >= 13 &&
      bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') &&
      bytes(5) == 'a', s"media $id: not a GIF")
    var p = 6
    def u8(): Int = { val v = bytes(p) & 0xff; p += 1; v }
    def u16(): Int = { val v = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8); p += 2; v }
    def colorTable(sizeBits: Int): Array[Int] = {
      val sz = 2 << sizeBits
      val t = new Array[Int](sz)
      var i = 0
      while (i < sz) { t(i) = (u8() << 16) | (u8() << 8) | u8(); i += 1 }
      t
    }
    val screenW = u16(); val screenH = u16()
    require(screenW > 0 && screenH > 0, s"media $id: empty screen")
    val packed = u8()
    val bgIndex = u8(); u8()
    val gct: Array[Int] =
      if ((packed & 0x80) != 0) colorTable(packed & 0x07) else Array.empty
    val bg = if (gct.nonEmpty) gct(bgIndex min (gct.length - 1)) else 0
    val canvas = Array.fill(screenW * screenH)(bg)
    var frameIdx = 0
    var disposal = 0
    var transparentIdx = -1
    var sep = u8()
    while (sep != 0x3b) {
      if (sep == 0x21) {
        val label = u8()
        if (label == 0xf9) { // Graphic Control Extension
          require(u8() == 4, s"media $id: malformed GCE")
          val gp = u8()
          disposal = (gp >> 2) & 7
          require(disposal <= 3,
            s"media $id: disposal method $disposal unsupported")
          u16() // delay
          val ti = u8()
          // transparency (r11, VERDICT-r10 #7): pixels at this palette
          // index pass through — the canvas keeps its prior color
          transparentIdx = if ((gp & 0x01) != 0) ti else -1
          require(u8() == 0, s"media $id: malformed GCE terminator")
        } else {
          var len = u8()
          while (len != 0) { p += len; len = u8() }
        }
      } else if (sep == 0x2c) {
        val left = u16(); val top = u16()
        val w = u16(); val h = u16()
        require(left + w <= screenW && top + h <= screenH,
          s"media $id: frame rect exceeds the logical screen")
        val ipacked = u8()
        require((ipacked & 0x40) == 0,
          s"media $id: interlaced partial frames unsupported")
        val table: Array[Int] =
          if ((ipacked & 0x80) != 0) colorTable(ipacked & 0x07) else gct
        require(table.nonEmpty, s"media $id: no color table")
        val minCode = u8()
        require(minCode >= 2 && minCode <= 8,
          s"media $id: bad LZW root size $minCode")
        val lzw = new java.io.ByteArrayOutputStream()
        var len = u8()
        while (len != 0) {
          lzw.write(bytes, p, len); p += len
          len = u8()
        }
        val idx = lzwDecode(id, minCode, lzw.toByteArray, w * h)
        val saved = if (disposal == 3) canvas.clone() else null
        var i = 0
        while (i < idx.length) {
          val ci = idx(i) & 0xff
          if (ci != transparentIdx) {
            require(ci < table.length,
              s"media $id: palette index $ci out of range")
            val x = left + i % w
            val y = top + i / w
            canvas(y * screenW + x) = table(ci)
          }
          i += 1
        }
        emit(frameIdx, screenW, screenH, canvas)
        if (disposal == 2) { // restore the REGION to background
          var y = top
          while (y < top + h) {
            var x = left
            while (x < left + w) {
              canvas(y * screenW + x) = bg
              x += 1
            }
            y += 1
          }
        } else if (disposal == 3) { // restore the pre-frame canvas
          System.arraycopy(saved, 0, canvas, 0, canvas.length)
        }
        disposal = 0
        transparentIdx = -1 // a GCE governs exactly the next image
        frameIdx += 1
      } else {
        require(false, s"media $id: unknown block separator $sep")
      }
      sep = u8()
    }
  }

  /** Batched composited sampling — [[sampleGifFramesBatched]]'s shape
    * with the GCE compositor in the leaf.
    */
  def sampleGifCompositedBatched(ds: org.apache.spark.sql.Dataset[MediaIn],
                                 sampleEvery: Int,
                                 batchSize: Int = 64,
                                 batchCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : org.apache.spark.sql.Dataset[GifFrameOut] = {
    require(batchSize > 0)
    implicit val enc: org.apache.spark.sql.Encoder[GifFrameOut] =
      org.apache.spark.sql.Encoders.product[GifFrameOut]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batchCounter.foreach(_.add(1))
        batch.iterator.flatMap(m =>
          gifComposited(m.media_id, m.media, sampleEvery))
      }
    }
  }

  /** Encode an animated GIF via the JDK sequence writer, one exact
    * indexed palette per frame (lossless) — fixture builder for
    * [[sampleGifFramesBatched]].
    */
  def encodeAnimatedGif(w: Int, h: Int, nFrames: Int,
                        pix: Int => (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    // interlace must be OFF here: the JDK's sequence writer + reader do
    // NOT round-trip interlaced frames (probed: rows come back
    // permuted and the last pass row constant) — single-image write()
    // does, which is why q349's fixtures keep it on
    val wp = writer.getDefaultWriteParam
    wp.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    writer.prepareWriteSequence(null)
    (0 until nFrames).foreach { f =>
      val pf = pix(f)
      val colors =
        (for (y <- 0 until h; x <- 0 until w) yield pf(x, y)).distinct
      require(colors.size <= 256)
      val n = colors.size
      val rs = new Array[Byte](n); val gs = new Array[Byte](n)
      val bs = new Array[Byte](n)
      colors.zipWithIndex.foreach { case ((r, g, b), i) =>
        rs(i) = r.toByte; gs(i) = g.toByte; bs(i) = b.toByte
      }
      val icm = new java.awt.image.IndexColorModel(8, n, rs, gs, bs)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = pf(x, y)
          img.setRGB(x, y,
            ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), wp)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** Assemble a media DataFrame from any (id, bytes, type) source with
    * decode+features applied — one narrow, codegen'd pass; partition by
    * size bucket first when payload skew matters (large blobs hash to
    * the same partitions as small ones otherwise).
    */
  def enrich(df: DataFrame, idCol: String, bytesCol: String,
             typeCol: String, featureDim: Int = 8): DataFrame =
    df.select(col(idCol).as("media_id"), col(typeCol).as("media_type"),
        col(bytesCol).as("media"))
      .withColumn("decoded", decodeStub(col("media")))
      .withColumn("resized", resizeStub(col("decoded"), 512))
      .withColumn("features", featuresStub(col("media"), featureDim))
      .withColumn("frames", frameSample(col("media"), 4))
}
