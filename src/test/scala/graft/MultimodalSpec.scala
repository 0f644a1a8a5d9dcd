package graft

import org.apache.spark.sql.functions._

import graft.ext.Multimodal

/** Multimodal plumbing: schema shape, determinism of the stub decode,
  * resize invariants, frame-sample batch shape (SURVEY.md §2.14).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, "hello world of binary payloads", "image/png"),
    (2L, (0 until 440).map(i => ('a' + i % 26).toChar).mkString
      + "0123456789", "video/mp4"),
    (3L, "x", "audio/wav"))
    .toDF("id", "text", "mtype")
    .select(col("id"), encode(col("text"), "UTF-8").as("bytes"), col("mtype"))

  test("enrich: schema + determinism") {
    val out = Multimodal.enrich(media, "id", "bytes", "mtype")
    val fields = out.schema.fieldNames.toSet
    assert(Set("media_id", "media_type", "media", "decoded", "resized",
      "features", "frames").subsetOf(fields))
    val a = out.select("features").collect().map(_.getSeq[Double](0))
    val b = Multimodal.enrich(media, "id", "bytes", "mtype")
      .select("features").collect().map(_.getSeq[Double](0))
    assert(a.toSeq == b.toSeq) // hash-stub is deterministic
    assert(a.forall(v => v.size == 8 && v.forall(x => x >= 0 && x < 1)))
  }

  test("resize stub: never exceeds max dim, preserves small media") {
    val out = Multimodal.enrich(media, "id", "bytes", "mtype")
      .select(col("decoded.width").as("w0"), col("decoded.height").as("h0"),
        col("resized.width").as("w1"), col("resized.height").as("h1"))
      .collect()
    out.foreach { r =>
      val (w0, h0, w1, h1) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(math.max(w1, h1) <= 512)
      if (math.max(w0, h0) <= 512) assert((w1, h1) == (w0, h0))
    }
  }

  test("frame sample: n frames of bounded size from byte ranges") {
    val frames = Multimodal.enrich(media, "id", "bytes", "mtype")
      .select(col("media_id"), col("frames")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Array[Byte]](1)).toMap
    assert(frames(2L).size == 4)
    assert(frames(2L).forall(_.length <= 16))
    // frames come from distinct offsets of the payload
    assert(frames(2L).map(_.toSeq).distinct.size > 1)
  }

  test("columnar decodeStub == batched parseHeader on ASCII payloads; f0 is byte 5") {
    val cols = Multimodal.enrich(media, "id", "bytes", "mtype")
      .select(col("media_id"), col("decoded.width"), col("decoded.height"),
        col("decoded.n_bytes"), element_at(col("features"), 1))
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
      .toMap
    val ds = media.select(col("id").as("media_id"), col("bytes").as("media"))
      .as[Multimodal.MediaIn]
    val batched = Multimodal.decodeBatched(ds).collect()
      .map(o => o.media_id -> (o.width, o.height, o.n_bytes)).toMap
    cols.foreach { case (id, (w, h, n, _)) =>
      assert(batched(id) == ((w, h, n)), s"columnar vs batched diverge for $id")
    }
    // f0 = 5th byte / 256 ('hello' → 'o' = 111), 0 past the end
    assert(cols(1L)._4 == 111.0 / 256.0)
    assert(cols(3L)._4 == 0.0)
  }

  test("decodeBatched: header parse exact, short/binary payloads safe, inits per batch") {
    import spark.implicits._
    val rows = (0L until 100L).map { i =>
      // payloads include non-ASCII bytes and a too-short header
      val bytes =
        if (i == 7L) Array[Byte](5)
        else Array[Byte]((i % 256).toByte, 0x41, (255 - i % 256).toByte, 0x7f) ++
          Array.fill(i.toInt % 13)(0x61.toByte)
      Multimodal.MediaIn(i, bytes)
    }
    val acc = spark.sparkContext.longAccumulator("codecInits")
    val ds = spark.createDataset(rows).repartition(4)
    val out = Multimodal.decodeBatched(ds, batchSize = 16, Some(acc))
      .collect().map(o => o.media_id -> o).toMap
    // exact header math, short payload zero-padded
    rows.foreach { m =>
      def b(i: Int) = if (i < m.media.length) m.media(i) & 0xff else 0
      val o = out(m.media_id)
      assert(o.width == (b(0) * 256 + b(1)) % 1920 + 1, m.media_id)
      assert(o.height == (b(2) * 256 + b(3)) % 1080 + 1, m.media_id)
      assert(o.n_bytes == m.media.length.toLong)
    }
    // context inits track BATCHES, not rows: 100 rows / 4 partitions /
    // batchSize 16 → between ceil(100/16)=7 and 4 partitions' worth of
    // ragged tails (≤ 4 + 100/16), never 100
    assert(acc.value >= 7 && acc.value <= 11, s"inits = ${acc.value}")
  }

  test("BMP codec: encode/decode round-trip is exact, incl. padding and bottom-up rows") {
    // 3×2 image with distinct per-pixel channels; w=3 forces a 3-byte
    // row pad, h=2 forces the vertical flip to matter
    val pix = Map(
      (0, 0) -> (10, 20, 30), (1, 0) -> (40, 50, 60), (2, 0) -> (70, 80, 90),
      (0, 1) -> (110, 120, 130), (1, 1) -> (140, 150, 160), (2, 1) -> (170, 180, 190))
    val bytes = Multimodal.encodeBmp(3, 2, (x, y) => pix((x, y)))
    // structural: 54-byte header + 2 rows of 3*3 padded to 12
    assert(bytes.length == 54 + 2 * 12)
    assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
    // stored row 0 must be the BOTTOM image row (y=1), B first
    assert((bytes(54) & 0xff) == 130 && (bytes(56) & 0xff) == 110)
    val out = Multimodal.decodeBmpBatched(
      spark.createDataset(Seq(Multimodal.MediaIn(9L, bytes)))).collect()(0)
    assert(out.width == 3 && out.height == 2)
    assert((out.tl_r, out.tl_g, out.tl_b) == ((10, 20, 30)))
    def mean(c: ((Int, Int, Int)) => Int) =
      pix.values.map(c).sum / 6.0
    assert(math.abs(out.mean_r - mean(_._1)) < 1e-12)
    assert(math.abs(out.mean_g - mean(_._2)) < 1e-12)
    assert(math.abs(out.mean_b - mean(_._3)) < 1e-12)
  }

  test("BMP codec: negative height (top-down row order) decodes the same image") {
    // flip a bottom-up encoding into the top-down variant by negating
    // the height field and reversing the stored row order — the decoder
    // must land on identical stats and the SAME top-left pixel
    val pix = Map(
      (0, 0) -> (1, 2, 3), (1, 0) -> (4, 5, 6),
      (0, 1) -> (7, 8, 9), (1, 1) -> (10, 11, 12))
    val up = Multimodal.encodeBmp(2, 2, (x, y) => pix((x, y)))
    val down = up.clone()
    java.nio.ByteBuffer.wrap(down)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(22, -2)
    val stride = 8 // 2*3 padded to 8
    for (i <- 0 until stride) {
      down(54 + i) = up(54 + stride + i)
      down(54 + stride + i) = up(54 + i)
    }
    val out = Multimodal.decodeBmpBatched(spark.createDataset(Seq(
      Multimodal.MediaIn(1L, up), Multimodal.MediaIn(2L, down))))
      .collect().map(o => o.media_id -> o).toMap
    assert(out(1L).height == 2 && out(2L).height == 2)
    Seq(1L, 2L).foreach { id =>
      val o = out(id)
      assert((o.tl_r, o.tl_g, o.tl_b) == ((1, 2, 3)), s"media $id corner")
      assert(math.abs(o.mean_r - 5.5) < 1e-12 && math.abs(o.mean_g - 6.5) < 1e-12)
    }
  }

  test("PNG codec: encode/decode round-trip is exact through real " +
      "deflate + defiltering; batched inits track batches") {
    val pix = Map(
      (0, 0) -> (10, 20, 30), (1, 0) -> (40, 50, 60), (2, 0) -> (70, 80, 90),
      (0, 1) -> (110, 120, 130), (1, 1) -> (140, 150, 160),
      (2, 1) -> (170, 180, 190))
    val bytes = Multimodal.encodePng(3, 2, (x, y) => pix((x, y)))
    // a real PNG: magic + IHDR; compressed, so NOT raw pixel bytes
    assert((bytes(0) & 0xff) == 0x89 &&
      new String(bytes.slice(1, 4), "US-ASCII") == "PNG")
    assert(new String(bytes.slice(12, 16), "US-ASCII") == "IHDR")
    val acc = spark.sparkContext.longAccumulator("png_batches")
    val many = (1 to 5).map(i => Multimodal.MediaIn(i.toLong, bytes))
    val out = Multimodal.decodePngBatched(
      spark.createDataset(many).repartition(1), batchSize = 2,
      batchCounter = Some(acc)).collect().map(o => o.media_id -> o).toMap
    assert(acc.value == 3, s"5 payloads / batch 2 => 3 inits, got ${acc.value}")
    val o = out(1L)
    assert(o.width == 3 && o.height == 2)
    assert((o.tl_r, o.tl_g, o.tl_b) == ((10, 20, 30)))
    def mean(c: ((Int, Int, Int)) => Int) = pix.values.map(c).sum / 6.0
    assert(math.abs(o.mean_r - mean(_._1)) < 1e-12)
    assert(math.abs(o.mean_g - mean(_._2)) < 1e-12)
    assert(math.abs(o.mean_b - mean(_._3)) < 1e-12)
  }

  test("PNG codec: corrupt media fails loudly, not as silent garbage") {
    val good = Multimodal.encodePng(2, 2, (_, _) => (1, 2, 3))
    // wrong magic
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodePngBatched(spark.createDataset(Seq(
        Multimodal.MediaIn(1L, "nope".getBytes)))).collect()
    }
    // right magic, mangled body (truncate mid-IDAT)
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodePngBatched(spark.createDataset(Seq(
        Multimodal.MediaIn(2L, good.take(24))))).collect()
    }
  }

  test("GIF codec: from-scratch LZW decode agrees with the JDK's own " +
      "reader on JDK-written bytes, pixel-exact") {
    // the external-anchor property: fixture bytes come from ImageIO's
    // GIF WRITER; decodeGif (our LZW) must land on the exact pixels
    // ImageIO's READER also reports
    def pix(n: Long)(x: Int, y: Int): (Int, Int, Int) = (
      ((n + 3 * x + y) % 256).toInt,
      ((n + x + 4 * y + 7) % 256).toInt,
      ((n + 2 * x + 2 * y + 3) % 256).toInt)
    for (n <- Seq(0L, 9L, 52L, 95L)) {
      val (w, h) = ((6 + n % 4).toInt, (5 + n % 3).toInt)
      val bytes = Multimodal.encodeGif(w, h, pix(n))
      assert(new String(bytes.take(6), "US-ASCII").startsWith("GIF8"))
      val ours = Multimodal.decodeGifBatched(spark.createDataset(Seq(
        Multimodal.MediaIn(n, bytes)))).collect().head
      // JDK reader ground truth
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(ours.width == img.getWidth && ours.height == img.getHeight)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        // and the JDK reader itself must agree with the formula —
        // the write was lossless by exact-palette construction
        assert((((p >> 16) & 0xff), ((p >> 8) & 0xff), (p & 0xff))
          == pix(n)(x, y))
      }
      val np = (w * h).toDouble
      assert(math.abs(ours.mean_r - sr / np) < 1e-12)
      assert(math.abs(ours.mean_g - sg / np) < 1e-12)
      assert(math.abs(ours.mean_b - sb / np) < 1e-12)
      assert((ours.tl_r, ours.tl_g, ours.tl_b) == pix(n)(0, 0))
    }
  }

  test("GIF codec: LZW dictionary growth past one code-width boundary " +
      "decodes exactly (wide image, many distinct colors)") {
    // 16x16 = 256 pixels with 256 distinct colors: the LZW dictionary
    // crosses at least one width increase and the palette is full
    val bytes = Multimodal.encodeGif(16, 16,
      (x, y) => (x * 16 + y, (x * 16 + y + 85) % 256, (x * 16 + y + 170) % 256))
    val o = Multimodal.decodeGifBatched(spark.createDataset(Seq(
      Multimodal.MediaIn(7L, bytes)))).collect().head
    assert(o.width == 16 && o.height == 16)
    // mean over k=0..255 of each channel = 127.5 exactly
    assert(math.abs(o.mean_r - 127.5) < 1e-12)
    assert(math.abs(o.mean_g - 127.5) < 1e-12)
    assert(math.abs(o.mean_b - 127.5) < 1e-12)
    assert((o.tl_r, o.tl_g, o.tl_b) == ((0, 85, 170)))
  }

  test("animated GIF: sampled frames agree with the JDK sequence " +
      "reader per frame index; unsampled frames are never decoded") {
    val n = 11L
    val (w, h, nf) = (5, 4, 5)
    def pf(f: Int)(x: Int, y: Int): (Int, Int, Int) = (
      ((n + 7 * f + x + 2 * y) % 256).toInt,
      ((n + 3 * f + 2 * x + y + 5) % 256).toInt,
      ((n + 11 * f + x + 3 * y + 9) % 256).toInt)
    val bytes = Multimodal.encodeAnimatedGif(w, h, nf, f => pf(f))
    val ours = Multimodal.sampleGifFramesBatched(
      spark.createDataset(Seq(Multimodal.MediaIn(n, bytes))),
      sampleEvery = 2).collect().sortBy(_.frame)
    assert(ours.map(_.frame).toSeq == Seq(0, 2, 4),
      s"expected frames 0,2,4, got ${ours.map(_.frame).toSeq}")
    val rdr = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    rdr.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    assert(rdr.getNumImages(true) == nf)
    for (o <- ours) {
      val img = rdr.read(o.frame)
      assert(o.width == img.getWidth && o.height == img.getHeight)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
          == pf(o.frame)(x, y),
          s"frame ${o.frame} pixel ($x,$y) diverged from the JDK reader")
      }
      val np = (w * h).toDouble
      assert(math.abs(o.mean_r - sr / np) < 1e-12)
      assert(math.abs(o.mean_g - sg / np) < 1e-12)
      assert(math.abs(o.mean_b - sb / np) < 1e-12)
    }
    rdr.dispose()
  }

  test("hand-rolled GIF writer: the JDK reader accepts the " +
      "uncompressed-LZW stream and reproduces frame 0 pixel-exact") {
    val colors = Seq((10, 20, 30), (40, 50, 60), (70, 80, 90))
    val f0 = Multimodal.GifRawFrame(0, 0, 4, 3, disposal = 1,
      Array.tabulate(12)(i => (i % 3).toByte))
    val f1 = Multimodal.GifRawFrame(1, 1, 2, 2, disposal = 1,
      Array[Byte](2, 2, 2, 2))
    val bytes = Multimodal.encodeGifComposed(4, 3, colors, Seq(f0, f1))
    val rdr = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    rdr.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    assert(rdr.getNumImages(true) == 2)
    val img = rdr.read(0)
    assert(img.getWidth == 4 && img.getHeight == 3)
    for (y <- 0 until 3; x <- 0 until 4) {
      val p = img.getRGB(x, y)
      val want = colors((y * 4 + x) % 3)
      assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) == want,
        s"writer bytes misread by the JDK at ($x,$y)")
    }
    rdr.dispose()
  }

  test("GIF composition: partial frames paint onto the canvas; " +
      "disposal 2 restores its region to background") {
    // palette(0) = A doubles as the background color, so a disposal-2
    // restore returns the region to A visibly
    val A = (100, 0, 0); val B = (0, 100, 0); val C = (0, 0, 100)
    val full = Multimodal.GifRawFrame(0, 0, 4, 4, 1,
      Array.fill(16)(0.toByte))
    val b2 = Multimodal.GifRawFrame(0, 0, 2, 2, 2, // disposal 2
      Array.fill(4)(1.toByte))
    val c1 = Multimodal.GifRawFrame(2, 2, 2, 2, 1,
      Array.fill(4)(2.toByte))
    val bytes = Multimodal.encodeGifComposed(4, 4, Seq(A, B, C),
      Seq(full, b2, c1))
    val snaps = Multimodal.gifComposited(7L, bytes, sampleEvery = 1)
    assert(snaps.map(_.frame) == Vector(0, 1, 2))
    // f0: all A
    assert(snaps(0).mean_r == 100.0 && snaps(0).mean_g == 0.0)
    assert((snaps(0).tl_r, snaps(0).tl_g, snaps(0).tl_b) == A)
    // f1 displayed: B in the 2x2 corner, A elsewhere (restore happens
    // AFTER display)
    assert(snaps(1).mean_r == 100.0 * 12 / 16)
    assert(snaps(1).mean_g == 100.0 * 4 / 16)
    assert((snaps(1).tl_r, snaps(1).tl_g, snaps(1).tl_b) == B)
    // f2: B's region restored to background A, C painted at (2,2)
    assert(snaps(2).mean_r == 100.0 * 12 / 16)
    assert(snaps(2).mean_g == 0.0)
    assert(snaps(2).mean_b == 100.0 * 4 / 16)
    assert((snaps(2).tl_r, snaps(2).tl_g, snaps(2).tl_b) == A)
  }

  test("GIF composition: disposal 3 restores the pre-frame canvas; " +
      "reserved disposal values fail loudly; transparency passes " +
      "flagged pixels through") {
    val A = (100, 0, 0); val B = (0, 100, 0); val C = (0, 0, 100)
    val full = Multimodal.GifRawFrame(0, 0, 4, 4, 1,
      Array.fill(16)(0.toByte))
    val b3 = Multimodal.GifRawFrame(0, 0, 2, 2, 3, // restore-to-previous
      Array.fill(4)(1.toByte))
    val c1 = Multimodal.GifRawFrame(2, 2, 2, 2, 1,
      Array.fill(4)(2.toByte))
    val bytes = Multimodal.encodeGifComposed(4, 4, Seq(A, B, C),
      Seq(full, b3, c1))
    val snaps = Multimodal.gifComposited(8L, bytes, sampleEvery = 1)
    // f1 displayed: B visible in the corner
    assert((snaps(1).tl_r, snaps(1).tl_g, snaps(1).tl_b) == B)
    assert(snaps(1).mean_g == 100.0 * 4 / 16)
    // f2: B's frame fully undone (restore-to-previous), C painted
    assert((snaps(2).tl_r, snaps(2).tl_g, snaps(2).tl_b) == A)
    assert(snaps(2).mean_g == 0.0)
    assert(snaps(2).mean_r == 100.0 * 12 / 16)
    assert(snaps(2).mean_b == 100.0 * 4 / 16)
    // reserved disposal 4: loud rejection
    val d4 = Multimodal.GifRawFrame(0, 0, 1, 1, 4, Array[Byte](0))
    intercept[IllegalArgumentException] {
      Multimodal.gifComposited(9L,
        Multimodal.encodeGifComposed(2, 2, Seq(A),
          Seq(Multimodal.GifRawFrame(0, 0, 2, 2, 1,
            Array.fill(4)(0.toByte)), d4)))
    }
    // transparency (r11, VERDICT-r10 #7): the flagged index passes
    // through — the canvas keeps frame 0's paint under those pixels
    val f0 = Multimodal.GifRawFrame(0, 0, 2, 2, 1, Array.fill(4)(0.toByte))
    val f1 = Multimodal.GifRawFrame(0, 0, 2, 2, 1,
      Array[Byte](1, 2, 2, 1), transparentIndex = 2)
    val t2 = Multimodal.gifComposited(10L,
      Multimodal.encodeGifComposed(2, 2, Seq(A, B, C), Seq(f0, f1)),
      sampleEvery = 1)
    // frame 1 canvas: (B, A, A, B) — B painted, C-flagged kept A
    assert((t2(1).tl_r, t2(1).tl_g, t2(1).tl_b) == B)
    assert(t2(1).mean_r == 100.0 * 2 / 4, "pass-through pixels lost A")
    assert(t2(1).mean_g == 100.0 * 2 / 4, "opaque pixels did not paint B")
    assert(t2(1).mean_b == 0.0, "the transparent index painted C")
  }

  test("GIF codec: corrupt or out-of-subset media fails loudly") {
    val good = Multimodal.encodeGif(3, 3, (x, y) => (x, y, x + y))
    // wrong magic
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeGifBatched(spark.createDataset(Seq(
        Multimodal.MediaIn(1L, "GIF9za nope".getBytes)))).collect()
    }
    // right magic, truncated mid-LZW
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeGifBatched(spark.createDataset(Seq(
        Multimodal.MediaIn(2L, good.take(good.length - 4))))).collect()
    }
    // global color table flag cleared => the parser must error out
    // (misframed stream / missing table), never emit garbage pixels
    val noGct = good.clone()
    noGct(10) = (noGct(10) & 0x7f).toByte
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeGifBatched(spark.createDataset(Seq(
        Multimodal.MediaIn(3L, noGct)))).collect()
    }
  }

  test("JPEG codec: lossy round-trip lands within the contract " +
      "tolerances; corrupt media fails loudly") {
    // smooth gradient — the signal class JPEG preserves
    val (w, h) = (10, 8)
    def pix(x: Int, y: Int) = (100 + x * 3 + y * 2, 80 + x * 2, 120 + y * 3)
    val bytes = Multimodal.encodeJpeg(w, h, pix)
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "SOI")
    val o = Multimodal.decodeJpegBatched(spark.createDataset(Seq(
      Multimodal.MediaIn(7L, bytes)))).collect()(0)
    assert(o.width == w && o.height == h)
    def exp(c: ((Int, Int, Int)) => Int) =
      (for (x <- 0 until w; y <- 0 until h) yield c(pix(x, y))).sum /
        (w * h).toDouble
    assert(math.abs(o.mean_r - exp(_._1)) <= 8.0, s"mean_r ${o.mean_r}")
    assert(math.abs(o.mean_g - exp(_._2)) <= 8.0, s"mean_g ${o.mean_g}")
    assert(math.abs(o.mean_b - exp(_._3)) <= 8.0, s"mean_b ${o.mean_b}")
    assert(math.abs(o.tl_r - 100) <= 24 && math.abs(o.tl_g - 80) <= 24 &&
      math.abs(o.tl_b - 120) <= 24, s"corner (${o.tl_r},${o.tl_g},${o.tl_b})")
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeJpegBatched(spark.createDataset(Seq(
        Multimodal.MediaIn(1L, "bogus".getBytes)))).collect()
    }
  }

  test("WAV codec: round-trip exact; chunk walk skips the odd junk chunk") {
    val samples = Array(100, -200, 32767, -32768, 0, 7)
    val bytes = Multimodal.encodeWav(8000, samples.length, samples(_))
    // the junk LIST chunk sits where a fixed-offset reader expects data:
    // bytes 36..39 must NOT be "data" (they are "LIST"), so a decoder
    // that skips the chunk walk reads garbage here
    assert(new String(bytes, 36, 4, "US-ASCII") == "LIST")
    val out = Multimodal.decodeWavBatched(
      spark.createDataset(Seq(Multimodal.MediaIn(5L, bytes)))).collect()(0)
    assert(out.sample_rate == 8000 && out.n_samples == samples.length)
    assert(out.duration_ms == samples.length * 1000L / 8000)
    assert(out.first_s == 100 && out.peak == 32768)
    assert(out.sum_s == samples.map(_.toLong).sum)
    assert(out.sumsq_s == samples.map(s => s.toLong * s).sum)
  }

  test("WAV codec: corrupt/unsupported media fails loudly") {
    val bad = "RIFFxxxxWAVEnope".getBytes("US-ASCII") ++ Array.fill[Byte](40)(1)
    intercept[org.apache.spark.SparkException](
      Multimodal.decodeWavBatched(
        spark.createDataset(Seq(Multimodal.MediaIn(1L, bad)))).collect())
    // stereo is out of scope and must be rejected, not misread as mono
    val mono = Multimodal.encodeWav(8000, 4, _ => 1)
    val stereo = mono.clone()
    java.nio.ByteBuffer.wrap(stereo)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(22, 2)
    intercept[org.apache.spark.SparkException](
      Multimodal.decodeWavBatched(
        spark.createDataset(Seq(Multimodal.MediaIn(2L, stereo)))).collect())
  }

  test("BMP codec: corrupt media fails loudly, not as silent garbage") {
    val bad = Array.fill[Byte](60)(0x42)
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.decodeBmpBatched(
        spark.createDataset(Seq(Multimodal.MediaIn(1L, bad)))).collect())
    assert(e.getMessage != null)
    // 8-bit BMPs are out of scope and must be rejected, not misread
    val bytes24 = Multimodal.encodeBmp(2, 2, (_, _) => (1, 2, 3))
    val as8bit = bytes24.clone(); as8bit(28) = 8
    intercept[org.apache.spark.SparkException](
      Multimodal.decodeBmpBatched(
        spark.createDataset(Seq(Multimodal.MediaIn(2L, as8bit)))).collect())
  }

  test("GIF compositor fuzz (r10, VERDICT-r9 #4; r11 + transparency): " +
      "100 seeded random animations — disposal 0-3, partial rects, " +
      "random palettes, random transparent indexes — compose " +
      "canvas-identically to an independent compositor driven by the " +
      "JDK reader's decoded frames and metadata") {
    // The JDK reader is the external ground truth for LZW pixel content
    // and frame geometry (an encoder bug cannot cancel against our own
    // decoder); the spec-side compositor below is written directly from
    // GIF89a's disposal table, independent of Multimodal's walker. Full
    // CANVAS equality per frame — the public sampler's means/top-left
    // could mask a compensating two-pixel error. Transparency (r11,
    // VERDICT-r10 #7) rides the JDK reader's ALPHA channel: a flagged
    // index decodes to alpha 0, and the reference compositor skips
    // those pixels — exactly the pass-through contract.
    val rnd = new scala.util.Random(20260816L)
    for (k <- 0 until 100) {
      val sw = 3 + rnd.nextInt(10)
      val sh = 3 + rnd.nextInt(10)
      val nPal = 2 + rnd.nextInt(15)
      val palette = Seq.fill(nPal)(
        (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
      val nf = 1 + rnd.nextInt(5)
      val frames = (0 until nf).map { _ =>
        val w = 1 + rnd.nextInt(sw)
        val h = 1 + rnd.nextInt(sh)
        val left = rnd.nextInt(sw - w + 1)
        val top = rnd.nextInt(sh - h + 1)
        // ~half the frames carry a transparent index; it may or may
        // not actually occur in the pixel data (both paths legal)
        val ti = if (rnd.nextBoolean()) rnd.nextInt(nPal) else -1
        Multimodal.GifRawFrame(left, top, w, h,
          disposal = rnd.nextInt(4),
          Array.fill(w * h)(rnd.nextInt(nPal).toByte),
          transparentIndex = ti)
      }
      val bytes = Multimodal.encodeGifComposed(sw, sh, palette, frames)
      // ours: full canvas after each frame's paint
      val ours = Vector.newBuilder[Array[Int]]
      Multimodal.gifComposeWalk(k.toLong, bytes)((_, _, _, c) =>
        ours += c.clone())
      val ourCanvases = ours.result()
      assert(ourCanvases.size == nf, s"case $k: frame count")
      // reference: JDK reader frames + metadata, composed independently
      val rdr = javax.imageio.ImageIO
        .getImageReadersByFormatName("gif").next()
      rdr.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      assert(rdr.getNumImages(true) == nf, s"case $k: JDK frame count")
      def attr(n: org.w3c.dom.Node, a: String): String =
        n.getAttributes.getNamedItem(a).getNodeValue
      val bgc = palette.head
      val bg = (bgc._1 << 16) | (bgc._2 << 8) | bgc._3
      val canvas = Array.fill(sw * sh)(bg)
      for (i <- 0 until nf) {
        val root = rdr.getImageMetadata(i)
          .getAsTree("javax_imageio_gif_image_1.0")
          .asInstanceOf[org.w3c.dom.Element]
        val desc = root.getElementsByTagName("ImageDescriptor").item(0)
        val left = attr(desc, "imageLeftPosition").toInt
        val top = attr(desc, "imageTopPosition").toInt
        val gce = root.getElementsByTagName("GraphicControlExtension")
        val disposal =
          if (gce.getLength > 0) attr(gce.item(0), "disposalMethod")
          else "none"
        val img = rdr.read(i)
        val saved =
          if (disposal == "restoreToPrevious") canvas.clone() else null
        for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
          val argb = img.getRGB(x, y)
          // alpha 0 = the frame's transparent index: pass through
          if ((argb >>> 24) != 0)
            canvas((top + y) * sw + (left + x)) = argb & 0xffffff
        }
        assert(java.util.Arrays.equals(ourCanvases(i), canvas),
          s"case $k frame $i (disposal ${frames(i).disposal}): canvas " +
            "diverged from the JDK-reader compositor")
        if (disposal == "restoreToBackgroundColor") {
          for (y <- top until top + img.getHeight;
               x <- left until left + img.getWidth)
            canvas(y * sw + x) = bg
        } else if (disposal == "restoreToPrevious") {
          System.arraycopy(saved, 0, canvas, 0, canvas.length)
        }
      }
      rdr.dispose()
    }
  }
}
