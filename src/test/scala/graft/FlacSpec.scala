package graft

import graft.ext.Flac

/** Pins the FLAC subset codec (ext/Flac.scala) beyond the q335
  * analytic oracle: lossless round-trip on adversarial sample
  * patterns, multi-frame iteration, metadata-walk correctness, CRC
  * verification (corruption must fail loudly), and loud rejection of
  * out-of-subset constructs.
  */
class FlacSpec extends SparkSpec {

  private def moments(samples: Seq[Int]): (Long, Long, Int, Int) =
    (samples.map(_.toLong).sum,
      samples.map(s => s.toLong * s).sum,
      samples.map(math.abs).max,
      samples.head)

  test("round-trip: decoded moments equal the source exactly on " +
      "adversarial patterns (lossless codec, no tolerance)") {
    val patterns: Seq[(String, Int, Int => Int)] = Seq(
      ("constant", 300, _ => 123),
      ("full-scale alternation", 300,
        t => if (t % 2 == 0) Short.MaxValue else Short.MinValue),
      ("linear ramp (order-2 residuals all zero)", 520, t => t - 260),
      ("quadratic", 700, t => ((t.toLong * t * 7) % 3001 - 1500).toInt),
      ("single-frame short block", 40, t => t * 31 - 600))
    for ((name, ns, f) <- patterns) {
      val bytes = Flac.encodeFlac(8000, ns, f)
      val out = Flac.decodeFlac(7L, bytes)
      val (sum, sumsq, peak, first) = moments((0 until ns).map(f))
      assert(out.n_samples == ns, s"$name: sample count")
      assert(out.sum_s == sum && out.sumsq_s == sumsq, s"$name: moments")
      assert(out.peak == peak && out.first_s == first, s"$name: probes")
      assert(out.sample_rate == 8000)
    }
  }

  test("LPC subframes (r8): Levinson-Durbin-encoded streams decode " +
      "losslessly, including sinusoids where LPC actually predicts") {
    val patterns: Seq[(String, Int, Int => Int)] = Seq(
      ("sinusoid (strong LPC fit)", 600,
        t => (12000 * math.sin(t * 0.07)).toInt),
      ("damped chirp", 512,
        t => (9000 * math.exp(-t / 400.0) * math.cos(t * t * 1e-4)).toInt),
      ("noisy quadratic", 700,
        t => ((t.toLong * t * 7) % 3001 - 1500).toInt),
      ("constant (fit degenerates -> FIXED fallback)", 300, _ => 55))
    for ((name, ns, f) <- patterns) {
      val bytes = Flac.encodeFlac(8000, ns, f, useLpc = true)
      val out = Flac.decodeFlac(9L, bytes)
      val (sum, sumsq, peak, first) = moments((0 until ns).map(f))
      assert(out.n_samples == ns && out.sum_s == sum &&
        out.sumsq_s == sumsq && out.peak == peak && out.first_s == first,
        s"$name: LPC round-trip diverged")
    }
    // the sinusoid stream must actually CONTAIN an LPC subframe (type
    // bit 0x20 after the frame header) — otherwise the fallback path
    // silently swallowed the whole test
    val b = Flac.encodeFlac(8000, 600,
      t => (12000 * math.sin(t * 0.07)).toInt, useLpc = true)
    val fixedOnly = Flac.encodeFlac(8000, 600,
      t => (12000 * math.sin(t * 0.07)).toInt, useLpc = false)
    assert(b.length < fixedOnly.length,
      "LPC encoding did not compress a sinusoid better than FIXED — " +
        "the LPC path is probably not being taken")
  }

  test("multi-frame streams: block size 256 splits a 600-sample " +
      "signal into 3 frames and the walk crosses the PADDING block") {
    val ns = 600
    val f = (t: Int) => ((t * 37) % 2001) - 1000
    val bytes = Flac.encodeFlac(16000, ns, f, blockSize = 256)
    val out = Flac.decodeFlac(1L, bytes)
    assert(out.n_samples == ns)
    val (sum, sumsq, _, _) = moments((0 until ns).map(f))
    assert(out.sum_s == sum && out.sumsq_s == sumsq)
    assert(out.duration_ms == ns * 1000L / 16000)
  }

  test("corruption fails loudly: flipped frame byte breaks a CRC; " +
      "a non-FLAC payload is rejected") {
    val bytes = Flac.encodeFlac(8000, 300, t => t % 997 - 498)
    // flip one byte deep in the frame section (past magic + metadata)
    val corrupted = bytes.clone()
    corrupted(corrupted.length - 20) =
      (corrupted(corrupted.length - 20) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](
      Flac.decodeFlac(2L, corrupted))
    assert(e.getMessage.contains("CRC") || e.getMessage.contains("sync")
      || e.getMessage.contains("truncated"),
      s"unexpected failure mode: ${e.getMessage}")
    intercept[IllegalArgumentException](
      Flac.decodeFlac(3L, "RIFFxxxxWAVE".getBytes("US-ASCII")))
  }

  test("batched decode seam: one batch counter tick per batch, " +
      "distributed over partitions") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("flacBatches")
    val media = spark.range(0, 10).repartition(2).as[Long]
      .map(n => graft.ext.Multimodal.MediaIn(n,
        Flac.encodeFlac(8000, 64 + n.toInt, t => (n.toInt * 7 + t) % 500)))
    val out = Flac.decodeFlacBatched(media, batchSize = 4,
      batchCounter = Some(acc)).collect()
    assert(out.length == 10)
    assert(out.forall(o => o.n_samples >= 64 && o.sum_s ==
      (0 until o.n_samples.toInt)
        .map(t => ((o.media_id.toInt * 7 + t) % 500).toLong).sum))
    assert(acc.value >= 2 && acc.value <= 6) // ceil(per-partition/4) sums
  }
}
