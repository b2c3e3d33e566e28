package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extraction / resize / frame-sampling stages.
  *
  * The actual media codecs are STUBBED (this container has no
  * image/audio libraries): [[decodeStub]] derives deterministic fake
  * dimensions/features from the payload bytes. Everything around the
  * stub — schema, batch-oriented mapPartitions execution, partitioning,
  * metadata propagation — is the real Spark plumbing a production decode
  * UDF would drop into (swap `decodeStub` for the codec call; the batch
  * shape is already per-partition-iterator, the same contract as
  * mapInPandas/Arrow batches).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("declared_bytes", LongType, nullable = true))), nullable = true)))

  /** Synthesize a media table from any (id, text) table: payload = UTF-8
    * bytes; modality round-robins. Deterministic.
    */
  def synthesize(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(lit("synthetic").as("source"),
        octet_length(col(textCol)).cast("long").as("declared_bytes")).as("meta"))

  /** STUB decode — deterministic pseudo-decode of one payload.
    * A real implementation calls the codec here; contract: pure
    * function of bytes, returns (width, height, channels, nFrames).
    */
  def decodeStub(payload: Array[Byte], modality: String): (Int, Int, Int, Int) = {
    val h = payload.foldLeft(1469598103934665603L)((a, b) => (a ^ (b & 0xff)) * 1099511628211L)
    val w = 16 + math.abs(h % 1024).toInt
    val ht = 16 + math.abs((h >> 10) % 1024).toInt
    val ch = if (modality == "audio") 1 else 3
    val frames = if (modality == "video") 1 + math.abs((h >> 20) % 300).toInt else 1
    (w, ht, ch, frames)
  }

  /** Batch decode via mapPartitions (per-partition iterator = the Arrow/
    * Pandas-batch execution shape). Emits typed metadata columns.
    */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mod, bytes) =>
          val (w, h, c, f) = decodeStub(bytes, mod)
          (id, mod, bytes.length.toLong, w, h, c, f)
        }
      }
      .toDF("media_id", "modality", "n_bytes", "width", "height", "channels", "n_frames")
  }

  /** Byte-histogram feature extraction (16 bins, L1-normalized) — the
    * stubbed "embedding" stage; batch shape identical to a real feature
    * extractor.
    */
  def features(media: DataFrame, bins: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val hist = new Array[Double](bins)
          bytes.foreach(b => hist((b & 0xff) * bins / 256) += 1.0)
          val n = math.max(1.0, bytes.length.toDouble)
          (id, hist.map(_ / n))
        }
      }
      .toDF("media_id", "features")
  }

  /** Metadata-level "resize": recompute target dims preserving aspect
    * ratio (the real op would transform pixels; the plumbing — pushdown
    * of the decode + the column contract — is identical).
    */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame =
    decoded.withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
          .otherwise(lit(maxSide) / greatest(col("width"), col("height")).cast("double")))
      .withColumn("out_width", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", ceil(col("height") * col("scale")).cast("int"))

  /** Deterministic frame sampling for video rows: every ceil(n/target)-th
    * frame index.
    */
  def sampleFrames(decoded: DataFrame, targetFrames: Int): DataFrame =
    decoded.filter(col("modality") === "video")
      .withColumn("stride", greatest(ceil(col("n_frames") / lit(targetFrames)), lit(1)).cast("int"))
      .withColumn("frame_idx",
        filter(sequence(lit(0), col("n_frames") - 1), i => pmod(i, col("stride")) === 0))
      .select(col("media_id"), col("n_frames"), col("stride"), col("frame_idx"))
}
