package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `BinaryType` columns with
  * typed metadata, exactly how a 100 TB image/audio corpus rides in
  * Parquet next to its text.
  *
  * The Spark-side mechanics are real and tested — schema, batch-shaped
  * per-partition processing, metadata extraction as codegen'd expressions.
  * The actual media decode is a STUB (no image/audio libs in this
  * container): [[decodeStub]] produces deterministic fake features from
  * the bytes. Swapping in a real decoder keeps every signature.
  *
  * Mirrors the reference's treatment of payloads as opaque bytes
  * (kafka.clj:58) — but where bifrost only ever copies them, this module
  * shows the decode/feature-extract stage a training pipeline bolts on.
  */
object Multimodal {

  /** Typed envelope for a media column. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("byte_len", IntegerType, nullable = false)))

  /** Wrap a text table as a media table (fixture stand-in: utf-8 bytes play
    * the role of image bytes). In production this is `spark.read.format
    * ("binaryFile")` or a parquet with a real binary column. */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("content"),
      lit("application/octet-stream").as("mime"),
      octet_length(encode(col(textCol), "UTF-8")).as("byte_len"))

  /** Real media ingestion: a directory tree of opaque files via Spark's
    * built-in `binaryFile` source → the [[mediaSchema]] envelope.
    * `pathGlobFilter` prunes non-matching files at the LISTING (never
    * opened). Each file materializes as one in-memory byte array, so set
    * `spark.sql.sources.binaryFile.maxLength` (session conf; Spark's
    * default admits ~2 GB files) to a sane per-file bound before pointing
    * this at an untrusted tree. media_id is the cross-engine
    * 60-bit path hash; mime is derived from the extension (a real
    * pipeline would sniff magic bytes in the decode stage). At 100 TB
    * this source parallelizes by file — fine for media corpora (many
    * small-to-medium objects); the downstream steps are the same
    * [[withMetadata]]/[[decodeStub]] stages as the parquet path. */
  def fromBinaryFiles(spark: SparkSession, dir: String,
                      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        graft.core.Determinism.xhash(col("path")).as("media_id"),
        col("content"),
        when(lower(col("path")).endsWith(".png"), "image/png")
          .when(lower(col("path")).endsWith(".jpg") ||
            lower(col("path")).endsWith(".jpeg"), "image/jpeg")
          .when(lower(col("path")).endsWith(".wav"), "audio/wav")
          .when(lower(col("path")).endsWith(".mp4"), "video/mp4")
          .otherwise("application/octet-stream").as("mime"),
        octet_length(col("content")).as("byte_len"))

  /** Pure-expression metadata extraction (codegen'd, no decode needed):
    * byte length, 8-byte header as hex, cross-engine content hash, and a
    * "frame sample" — bytes at a fixed stride, as hex. */
  def withMetadata(media: DataFrame): DataFrame =
    media
      .withColumn("header_hex", expr("substr(hex(content), 1, 16)"))
      .withColumn("content_md5", md5(col("content")))
      .withColumn("frame_sample", expr(
        "transform(sequence(0, 3), i -> substr(hex(content), i * 32 + 1, 2))"))

  /** Feature-extraction schema the decode stage emits. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = false)))

  /** STUB RESIZE — the binary→binary media transform shape (decode →
    * resample → re-encode) with the same per-partition batch contract as
    * [[decodeStub]]: decoder/encoder init once per partition, content in,
    * content out, metadata updated. The fake "resize" derives a
    * deterministic target-length byte string by striding the input to
    * targetW*targetH bytes (0-padded) — replace the body with a real
    * codec, keep the signature and schema. */
  def resizeStub(spark: SparkSession, media: DataFrame,
                 targetW: Int, targetH: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema)
    val target = targetW * targetH
    media.select("media_id", "content", "mime", "byte_len").mapPartitions { rows =>
      // per-partition init happens here (codec context, scaler buffers...)
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        // ??? real decode→resample→encode goes here; fake = strided bytes
        val out = Array.tabulate(target) { i =>
          if (bytes.isEmpty) 0.toByte
          else bytes((i.toLong * bytes.length / target).toInt % bytes.length)
        }
        Row(id, out, s"image/stub-resized-${targetW}x$targetH", out.length)
      }
    }(enc)
  }

  /** STUB DECODE — deterministic fake standing in for an image decoder.
    * Real shape: `mapPartitions` over batches of binary rows (the Scala
    * analog of `mapInPandas`), one decoder instance per partition, emitting
    * fixed-dim features. The fake derives "width/height/features" from the
    * bytes so tests are deterministic. Replace the body, keep the shape. */
  def decodeStub(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    media.select("media_id", "content").mapPartitions { rows =>
      // per-partition init happens here (decoder handle, model weights...)
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val n = bytes.length
        // ??? real decoder goes here; fake = byte statistics
        val w = if (n == 0) 0 else (bytes.head & 0xff)
        val h = if (n == 0) 0 else (bytes.last & 0xff)
        val feats = Array.tabulate(4) { i =>
          if (n == 0) 0f else (bytes(i * (n / 4).max(1) % n) & 0xff) / 255f
        }
        Row(id, w, h, feats.toSeq)
      }
    }(enc)
  }
}
