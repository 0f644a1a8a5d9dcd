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

  /** STUB decode: dimensions/properties a real codec would read from the
    * header, here derived deterministically from the bytes (length +
    * seeded hash) so plumbing and tests are stable. Real impl: a
    * vectorized batch UDF decoding per partition.
    */
  def decodeStub(media: Column): Column = struct(
    (pmod(xxhash64(media, lit(1)), lit(1920)) + 1).cast("int").as("width"),
    (pmod(xxhash64(media, lit(2)), lit(1080)) + 1).cast("int").as("height"),
    length(media).cast("long").as("n_bytes"))

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

  /** STUB feature extraction: fixed-dim pseudo-embedding from seeded
    * hashes of the bytes, values in [0, 1). Deterministic, columnar, no
    * UDF — the real codec-backed extractor would slot in at the same
    * signature (binary → array<double>).
    */
  def featuresStub(media: Column, dim: Int = 8): Column =
    array((0 until dim).map(i =>
      (pmod(xxhash64(media, lit(100 + i)), lit(100000)).cast("double") / 100000.0)): _*)

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
