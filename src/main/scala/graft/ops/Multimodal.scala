package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Feature row produced by the (stubbed) media decoder. */
case class MediaFeatures(
    doc_id: Long,
    size_bytes: Int,
    width: Int,
    height: Int,
    channels: Int,
    n_frames: Int,
    mean_byte: Double)

/** Multimodal-column plumbing (SURVEY.md §2D): media (image/audio/video)
  * is carried as an opaque BINARY column + typed metadata. The container
  * has no codec libraries, so the decode kernel is a clearly-marked
  * deterministic STUB — but the Spark-side shape is real: binary column
  * handling, per-partition batched decode via mapPartitions on a typed
  * Dataset, fixed output schema via Encoder, narrow (no shuffle).
  *
  * The driver tables have no true media column; `text` bytes stand in as
  * the blob (cast to BINARY and treated as opaque from then on).
  */
object Multimodal {

  /** Documents with an opaque blob column — the ingest-side
    * representation of a media table at scale (blob + metadata columns,
    * media NEVER parsed by the engine itself).
    */
  def withBlob(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("text").cast("binary").as("blob"))

  /** Metadata extraction with pure codegen'd builtins: byte size, leading
    * magic bytes, content digest. At 100 TB this is the cheap pass that
    * routes blobs to type-specific decoders.
    */
  def metadata(documents: DataFrame): DataFrame =
    withBlob(documents).select(
      col("doc_id"),
      length(col("blob")).cast("long").as("size_bytes"),
      substring(hex(col("blob")), 1, 8).as("magic_hex"),
      md5(col("blob")).as("content_md5"))

  /** STUB decode kernel — deterministic fake in place of a codec call.
    * A real deployment swaps the body for e.g. an image library while
    * keeping the exact same signature and batch shape.
    */
  private[ops] def decodeStub(id: Long, blob: Array[Byte]): MediaFeatures = {
    // ??? <- real codec goes here; deterministic fake below.
    val b0 = if (blob.nonEmpty) blob(0) & 0xff else 0
    val b1 = if (blob.length > 1) blob(1) & 0xff else 0
    var sum = 0L
    var i = 0
    while (i < blob.length) { sum += (blob(i) & 0xff); i += 1 }
    MediaFeatures(
      doc_id = id,
      size_bytes = blob.length,
      width = 64 + (b0 % 64),
      height = 64 + (b1 % 64),
      channels = 3,
      n_frames = blob.length / 1024 + 1,
      mean_byte = if (blob.isEmpty) 0.0 else sum.toDouble / blob.length)
  }

  /** Batched decode → features over the blob column. mapPartitions gives
    * the decoder a whole batch per task (amortizing codec/model setup, the
    * shape a Pandas-UDF/mapInPandas pipeline has in PySpark); output is a
    * typed Dataset with a fixed schema.
    */
  def decodeFeatures(spark: SparkSession, documents: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    withBlob(documents)
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, blob) => decodeStub(id, blob) } }
  }

  /** Frame sampling plan: one row per sampled frame index, stride chosen
    * to keep ≈8 frames per clip. The explode happens AFTER decode-side
    * metadata (n_frames) is known and carries only (doc_id, frame_idx)
    * — at 100 TB the sampled-frame worklist is two longs per row, and
    * the actual frame extraction is a second batched decode pass over
    * exactly those indices.
    */
  def frameSample(spark: SparkSession, documents: DataFrame,
                  targetFrames: Int = 8): DataFrame =
    decodeFeatures(spark, documents)
      .toDF()
      .withColumn("__stride",
        greatest(lit(1), (col("n_frames") / targetFrames).cast("int")))
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, col("__stride")))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"))

  /** Resize plan: integer-exact target dimensions with the long side
    * scaled to `maxDim`, aspect preserved (floor semantics on both
    * engines — no float rounding at the boundary). The plan rows feed
    * the decode pass that does the actual pixel work; computing them
    * engine-side keeps the codec kernel dumb and batchable.
    */
  def resizePlan(spark: SparkSession, documents: DataFrame,
                 maxDim: Int = 224): DataFrame =
    decodeFeatures(spark, documents)
      .toDF()
      .withColumn("__long", greatest(col("width"), col("height")))
      .select(
        col("doc_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        floor(col("width") * maxDim / col("__long")).as("out_w"),
        floor(col("height") * maxDim / col("__long")).as("out_h"))

  /** Feature pipeline as a DataFrame (driver-facing entry): decode then
    * derived columns (aspect ratio, frame-sampling stride).
    */
  def features(spark: SparkSession, documents: DataFrame): DataFrame =
    decodeFeatures(spark, documents)
      .toDF()
      .withColumn("aspect_ratio", round(col("width").cast("double") / col("height"), 4))
      .withColumn("sample_stride", greatest(lit(1), (col("n_frames") / 8).cast("int")))
      .withColumn("mean_byte", round(col("mean_byte"), 4))
}
