package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extraction / resize / frame-sampling stages.
  *
  * The decode stage is REAL byte-level parsing of three standard
  * container formats, all pure JVM (no codec libraries needed for
  * header-level decode):
  *  - PNG: signature + IHDR chunk (width/height/bit-depth/color-type,
  *    CRC32-verified — java.util.zip.CRC32);
  *  - WAV: RIFF/WAVE chunk walk → fmt (channels/sample-rate) + data
  *    (frame count = data bytes / block align);
  *  - AVI: RIFF/'AVI ' → hdrl LIST → avih (frames/width/height).
  * Pixel/sample DECOMPRESSION is out of scope (payloads carry zeroed
  * sample data) — the operator under test is the scan-shaped
  * decode-metadata stage every multimodal pipeline runs first, and the
  * mm_decode gate pins it with a byte-level oracle: synthesize encodes
  * dimensions derived from doc_id into real headers, decode must get
  * them back by parsing bytes alone (it never looks at the id).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("declared_bytes", LongType, nullable = true))), nullable = true)))

  // ---- encoders (synthesis side) ----------------------------------------

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def crc32(parts: Array[Byte]*): Long = {
    val c = new java.util.zip.CRC32
    parts.foreach(p => c.update(p))
    c.getValue
  }

  /** Minimal valid-header PNG: signature, IHDR (8-bit truecolor, real
    * CRC), IEND. 45 bytes.
    */
  def encodePng(width: Int, height: Int): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdrData = be32(width.toLong) ++ be32(height.toLong) ++
      Array[Byte](8, 2, 0, 0, 0) // bit depth 8, color type 2 (truecolor), default methods
    val ihdr = be32(13L) ++ ascii("IHDR") ++ ihdrData ++
      be32(crc32(ascii("IHDR"), ihdrData))
    val iend = be32(0L) ++ ascii("IEND") ++ be32(crc32(ascii("IEND")))
    sig ++ ihdr ++ iend
  }

  /** PCM16 WAV: RIFF/WAVE with fmt + data chunks; sample payload zeroed.
    * 44 + nSamples·2·channels bytes.
    */
  def encodeWav(channels: Int, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val blockAlign = channels * 2
    val dataSize = nSamples * blockAlign
    ascii("RIFF") ++ le32(36L + dataSize) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(16L) ++
      le16(1) ++ le16(channels) ++ le32(sampleRate.toLong) ++
      le32(sampleRate.toLong * blockAlign) ++ le16(blockAlign) ++ le16(16) ++
      ascii("data") ++ le32(dataSize.toLong) ++ new Array[Byte](dataSize)
  }

  /** AVI header-only RIFF: 'AVI ' + hdrl LIST + avih main header.
    * 88 bytes.
    */
  def encodeAvi(width: Int, height: Int, frames: Int): Array[Byte] = {
    val avih = le32(33366L) /* ~30fps µs/frame */ ++ le32(0L) ++ le32(0L) ++ le32(0L) ++
      le32(frames.toLong) ++ le32(0L) ++ le32(1L) /* streams */ ++ le32(0L) ++
      le32(width.toLong) ++ le32(height.toLong) ++ new Array[Byte](16)
    val hdrl = ascii("LIST") ++ le32(4L + 8L + avih.length) ++ ascii("hdrl") ++
      ascii("avih") ++ le32(avih.length.toLong) ++ avih
    ascii("RIFF") ++ le32(4L + hdrl.length) ++ ascii("AVI ") ++ hdrl
  }

  // ---- parser (decode side; never sees the id) ---------------------------

  final case class Decoded(modality: String, width: Int, height: Int,
      channels: Int, nFrames: Int)

  private def rdBe32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def rdLe32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def rdLe16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse a PNG IHDR (CRC-verified). */
  def parsePng(b: Array[Byte]): Decoded = {
    require(b.length >= 33 && b.take(8).sameElements(PngSig), "not a PNG")
    require(rdBe32(b, 8) == 13L && tag(b, 12) == "IHDR", "first chunk must be IHDR")
    val data = java.util.Arrays.copyOfRange(b, 16, 29)
    require(rdBe32(b, 29) == crc32(ascii("IHDR"), data), "IHDR CRC mismatch")
    val w = rdBe32(b, 16).toInt
    val h = rdBe32(b, 20).toInt
    val channels = b(25) match { // color type
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case c => throw new IllegalArgumentException(s"bad PNG color type $c")
    }
    Decoded("image", w, h, channels, 1)
  }

  /** Walk RIFF/WAVE chunks → fmt (channels, block align) + data size. */
  def parseWav(b: Array[Byte]): Decoded = {
    require(b.length >= 44 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE", "not a WAV")
    var o = 12
    var channels = -1
    var blockAlign = -1
    var dataSize = -1L
    while (o + 8 <= b.length) {
      val id = tag(b, o)
      val sz = rdLe32(b, o + 4)
      if (id == "fmt ") {
        channels = rdLe16(b, o + 10)
        blockAlign = rdLe16(b, o + 20)
      } else if (id == "data") dataSize = sz
      o += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    require(channels > 0 && blockAlign > 0 && dataSize >= 0, "missing fmt/data chunk")
    Decoded("audio", 0, 0, channels, (dataSize / blockAlign).toInt)
  }

  /** Walk RIFF/'AVI ' → hdrl LIST → avih main header. */
  def parseAvi(b: Array[Byte]): Decoded = {
    require(b.length >= 88 && tag(b, 0) == "RIFF" && tag(b, 8) == "AVI ", "not an AVI")
    var o = 12
    while (o + 12 <= b.length) {
      if (tag(b, o) == "LIST" && tag(b, o + 8) == "hdrl" && tag(b, o + 12) == "avih") {
        val d = o + 20 // avih chunk data
        return Decoded("video", rdLe32(b, d + 32).toInt, rdLe32(b, d + 36).toInt,
          3, rdLe32(b, d + 16).toInt)
      }
      o += 8 + rdLe32(b, o + 4).toInt
    }
    throw new IllegalArgumentException("no avih header found")
  }

  /** Dispatch on MAGIC BYTES (never the modality column): the real
    * contract of a decode stage over opaque binary payloads.
    */
  def parseMedia(b: Array[Byte]): Decoded =
    if (b.length >= 8 && b.take(8).sameElements(PngSig)) parsePng(b)
    else if (b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE") parseWav(b)
    else if (b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "AVI ") parseAvi(b)
    else throw new IllegalArgumentException(s"unknown container (${b.length} bytes)")

  // ---- operators ---------------------------------------------------------

  /** Synthesize a media table from any (id, text) table: REAL format
    * payloads (PNG / WAV / AVI headers, modality = id mod 3) whose
    * encoded dimensions are a pinned arithmetic function of the id —
    * which is exactly what makes decode() byte-level oracle-checkable:
    *   image: 45-byte PNG, w = 16 + id%1024, h = 16 + (id·7)%1024
    *   audio: WAV, ch = 1 + id%2, rate = 8000 + (id%8)·1000,
    *          samples = 100 + id%900 (payload zeroed)
    *   video: 88-byte AVI, image dims, frames = 1 + id%300
    */
  def synthesize(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, _) =>
        val w = (16 + id % 1024).toInt
        val h = (16 + (id * 7) % 1024).toInt
        val (modality, payload) = (id % 3) match {
          case 0 => ("image", encodePng(w, h))
          case 1 => ("audio", encodeWav((1 + id % 2).toInt,
            (8000 + (id % 8) * 1000).toInt, (100 + id % 900).toInt))
          case _ => ("video", encodeAvi(w, h, (1 + id % 300).toInt))
        }
        (id, modality, payload, ("synthetic", payload.length.toLong))
      }
      .toDF("media_id", "modality", "payload", "meta")
      .withColumn("meta", struct(col("meta._1").as("source"),
        col("meta._2").as("declared_bytes")))
  }

  /** Batch decode via mapPartitions (per-partition iterator = the Arrow/
    * Pandas-batch execution shape). Emits typed metadata columns parsed
    * from the payload BYTES alone.
    */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val d = parseMedia(bytes)
          (id, d.modality, bytes.length.toLong, d.width, d.height, d.channels, d.nFrames)
        }
      }
      .toDF("media_id", "modality", "n_bytes", "width", "height", "channels", "n_frames")
  }

  /** Byte-histogram feature extraction (16 bins, L1-normalized) — the
    * cheap content-signature stage; batch shape identical to a real
    * feature extractor.
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
