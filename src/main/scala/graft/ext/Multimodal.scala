package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline (north-star EXT,
  * SURVEY.md §2.14): media as opaque `BinaryType` + typed metadata, with
  * decode / feature-extract / resize / frame-sample plumbing.
  *
  * STUB NOTICE: this container has no image/audio codecs, so `decode` is
  * a clearly-marked deterministic fake (hash-derived dimensions/features
  * from the bytes). The Spark-side contract — schema, batch shape,
  * partitioning, column signatures — is real and tested; swapping the
  * fake for a codec-backed vectorized UDF (e.g. Arrow-batched) changes
  * only the leaf expressions.
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
