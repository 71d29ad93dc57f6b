package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `BinaryType` columns with
  * typed metadata, exactly how a 100 TB image/audio corpus rides in
  * Parquet next to its text.
  *
  * Everything here is real and tested: schema, batch-shaped
  * per-partition processing, metadata extraction as codegen'd
  * expressions, and an actual image decode/resample path built on
  * `javax.imageio` (in the JDK — zero added dependencies): PNG / BMP /
  * GIF / JPEG decode to dimensions + channel statistics, and a
  * deterministic nearest-neighbor resize that re-encodes PNG. Bytes a
  * decoder rejects flow through with `decode_ok = false` rather than
  * failing the job — at corpus scale some objects are always corrupt.
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

  /** Feature-extraction schema the decode stage emits: dimensions,
    * channel count, per-channel mean statistics (R, G, B, luma — each in
    * [0,1]), and a decode flag (corrupt bytes survive as `false` rows,
    * never task failures). */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = false)))

  /** Decode bytes with the JDK's ImageIO. Returns null for anything the
    * installed readers reject (wrong magic, truncated stream, ...). */
  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    if (bytes == null || bytes.length == 0) null
    else
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null } // corrupt container headers throw

  /** REAL image decode + feature extraction via `javax.imageio` (PNG /
    * BMP / GIF / JPEG — all JDK-bundled readers; an external codec for
    * other formats drops into the same loop). The Scala analog of
    * `mapInPandas`: one `mapPartitions` pass, per-partition init (the
    * ImageIO disk cache is disabled once per task, decoder instances are
    * pooled by the JDK), then row-at-a-time decode. Channel means are
    * exact-integer pixel sums divided once at the end — deterministic
    * across partitionings and retries.
    *
    * Pixel access is BULK, not per-pixel: 8-bit component images sum
    * raw raster bands (one `getSamples` call per channel), everything
    * else (palette / >8-bit) takes one bulk `getRGB` for the whole
    * image. Raster reads mean a grayscale image's channel value IS its
    * stored sample — no gray→sRGB colorspace detour — which is both the
    * standard reading of a gray PNG and what makes the decode a pure
    * arithmetic function of the encoded bytes (q140's oracle relies on
    * this). Raster band index = color-component index regardless of the
    * storage order (e.g. 3BYTE_BGR's sample model maps band 0 → red). */
  def decodeImages(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    media.select("media_id", "content").mapPartitions { rows =>
      // per-partition init: no temp-file cache for ByteArray streams
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val img = readImage(r.getAs[Array[Byte]](1))
        if (img == null)
          Row(id, false, 0, 0, 0, Seq(0f, 0f, 0f, 0f))
        else {
          val w = img.getWidth
          val h = img.getHeight
          val cm = img.getColorModel
          val rawBands = !cm.isInstanceOf[java.awt.image.IndexColorModel] &&
            (0 until cm.getNumComponents).forall(cm.getComponentSize(_) <= 8)
          var sr = 0L; var sg = 0L; var sb = 0L
          if (rawBands) {
            val raster = img.getRaster
            val buf = new Array[Int](w * h)
            def bandSum(b: Int): Long = {
              raster.getSamples(0, 0, w, h, b, buf)
              var s = 0L; var i = 0
              while (i < buf.length) { s += buf(i); i += 1 }
              s
            }
            if (raster.getNumBands <= 2) { // gray / gray+alpha
              sr = bandSum(0); sg = sr; sb = sr
            } else {
              sr = bandSum(0); sg = bandSum(1); sb = bandSum(2)
            }
          } else {
            // palette or deep images: one bulk ARGB conversion call
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            var i = 0
            while (i < px.length) {
              val p = px(i)
              sr += (p >>> 16) & 0xff; sg += (p >>> 8) & 0xff; sb += p & 0xff
              i += 1
            }
          }
          val n = w.toLong * h * 255L
          val feats = Seq(
            (sr.toDouble / n).toFloat, (sg.toDouble / n).toFloat,
            (sb.toDouble / n).toFloat,
            // ITU-R BT.601 luma on the exact integer sums
            ((299L * sr + 587L * sg + 114L * sb).toDouble / (1000L * n)).toFloat)
          Row(id, true, w, h, cm.getNumComponents, feats)
        }
      }
    }(enc)
  }

  /** FRAME SAMPLING over real decoded pixels — the video verb of the
    * multimodal family spelled on the fixture's stills: each decoded
    * image's pixel ROWS stand in for a clip's frames, a fixed stride
    * samples every `stride`-th frame, and each sampled frame emits its
    * mean luma — the decode → frame-sample → per-frame-feature
    * pipeline shape (same `mapPartitions` + per-partition codec init
    * as [[decodeImages]]; a real video codec drops into the same loop
    * with rows→frames). Luma rides the exact integer band sums and
    * divides ONCE (299·sr+587·sg+114·sb as int64 → one double divide),
    * so per-frame values are a pure arithmetic function of the decoded
    * samples — oracle-replayable without a codec, exactly like q140.
    * Undecodable bytes emit no frames (their absence is the signal;
    * q140 carries the decode_ok row-level flag). */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_mean", FloatType, nullable = false)))

  def frameSamples(spark: SparkSession, media: DataFrame,
                   stride: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(frameSchema)
    media.select("media_id", "content").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val id = r.getLong(0)
        val img = readImage(r.getAs[Array[Byte]](1))
        if (img == null) Iterator.empty
        else {
          val w = img.getWidth
          val raster = img.getRaster
          val buf = new Array[Int](w)
          def rowSum(y: Int, b: Int): Long = {
            raster.getSamples(0, y, w, 1, b, buf)
            var s = 0L; var i = 0
            while (i < w) { s += buf(i); i += 1 }
            s
          }
          (0 until img.getHeight by stride).iterator.map { y =>
            val (sr, sg, sb) =
              if (raster.getNumBands <= 2) {
                val s = rowSum(y, 0); (s, s, s) // gray: luma IS the sample
              } else (rowSum(y, 0), rowSum(y, 1), rowSum(y, 2))
            val mean = (299L * sr + 587L * sg + 114L * sb).toDouble /
              (1000L * w * 255L)
            Row(id, y, mean.toFloat)
          }
        }
      }
    }(enc)
  }

  /** 63-bit average perceptual hash (aHash) over REAL decoded pixels —
    * the image-space fingerprint that survives re-encodes and small
    * edits where a byte hash breaks: decode, nearest-neighbor-sample an
    * 8×8 luma grid (identity for 8×8 inputs), set bit i iff pixel i's
    * luma exceeds the grid mean. Exact integer arithmetic throughout:
    * luma = (299r+587g+114b) div 1000 and the mean compare is
    * 64·lᵢ > Σl — no division, no fp, so the hash is a pure function of
    * the decoded pixels (which q140 proves are a pure function of the
    * encoded bytes for our PNGs). 63 bits, not 64: bit 63 would need
    * 1<<63, outside signed-int64 range in standard SQL engines — the
    * oracle must be able to spell the same hash. Same per-partition
    * decode contract as [[decodeImages]]. Undecodable bytes →
    * decode_ok = false, phash = 0. */
  val aHashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("phash", LongType, nullable = false)))

  def aHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(aHashSchema)
    media.select("media_id", "content").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val img = readImage(r.getAs[Array[Byte]](1))
        if (img == null) Row(id, false, 0L)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val cm = img.getColorModel
          // raw raster samples, NOT getRGB: getRGB on a gray image runs
          // the gray→sRGB colorspace conversion and the stored sample is
          // lost — the exact defect the q140 raster fix removed
          val rawBands = !cm.isInstanceOf[java.awt.image.IndexColorModel] &&
            (0 until cm.getNumComponents).forall(cm.getComponentSize(_) <= 8)
          val raster = img.getRaster
          val luma = new Array[Long](64)
          var sum = 0L
          var i = 0
          while (i < 64) {
            // nearest-neighbor grid sample (top-left convention, the
            // same mapping resizeImages uses)
            val sx = (i % 8) * w / 8
            val sy = (i / 8) * h / 8
            val l =
              if (rawBands && raster.getNumBands <= 2)
                raster.getSample(sx, sy, 0).toLong
              else if (rawBands)
                (299L * raster.getSample(sx, sy, 0) +
                  587L * raster.getSample(sx, sy, 1) +
                  114L * raster.getSample(sx, sy, 2)) / 1000L
              else {
                val p = img.getRGB(sx, sy) // palette/deep: ARGB fallback
                (299L * ((p >>> 16) & 0xff) + 587L * ((p >>> 8) & 0xff) +
                  114L * (p & 0xff)) / 1000L
              }
            luma(i) = l; sum += l; i += 1
          }
          var hash = 0L
          i = 0
          while (i < 63) { // 63 bits — see Scaladoc
            if (64L * luma(i) > sum) hash |= 1L << i
            i += 1
          }
          Row(id, true, hash)
        }
      }
    }(enc)
  }

  /** REAL resize — decode → nearest-neighbor resample → PNG re-encode,
    * all JDK (`javax.imageio` + a manual pixel loop: no Graphics2D
    * filtering, so the output bytes are a pure function of the input
    * pixels — deterministic across runs and retries). Same per-partition
    * batch contract as [[decodeImages]]. Bytes that don't decode pass
    * through UNCHANGED (content, mime, byte_len) — a resize stage must
    * be lossless over the objects it cannot handle. */
  def resizeImages(spark: SparkSession, media: DataFrame,
                   targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema)
    media.select("media_id", "content", "mime", "byte_len").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img = readImage(bytes)
        if (img == null) Row(id, bytes, r.getString(2), r.getInt(3))
        else {
          val out = new java.awt.image.BufferedImage(
            targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < targetH) {
            val sy = (y.toLong * img.getHeight / targetH).toInt
            var x = 0
            while (x < targetW) {
              val sx = (x.toLong * img.getWidth / targetW).toInt
              out.setRGB(x, y, img.getRGB(sx, sy))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          val enc2 = bos.toByteArray
          Row(id, enc2, "image/png", enc2.length)
        }
      }
    }(enc)
  }

  // ------------------------------------------------------------- audio
  /** REAL audio container round-trip — the audio verb of the multimodal
    * family, same honesty contract as the image path: the fixture has
    * no audio corpus, so a deterministic PCM16 waveform is synthesized
    * per document BY PURE INTEGER ARITHMETIC (sample k of doc d is
    * ((d·31 + k·17) mod 4096) − 2048, n = 256 + d mod 256 samples),
    * encoded into a GENUINE RIFF/WAVE container (the bytes parse with
    * the JDK's `javax.sound.sampled.AudioSystem` — spec-proven, so the
    * container is real WAV, not a private format), and the feature
    * stage DECODES THOSE BYTES BACK with a chunk-walking parser that
    * validates magics, PCM format, mono, 16-bit — the decode →
    * feature-extract stage a training pipeline bolts on, with corrupt
    * bytes surviving as `decode_ok = false` rows exactly like q140.
    * Features are exact integers of the decoded samples (peak |s|,
    * Σ|s|, sign-change count — the silence/clipping/activity triage a
    * 100 TB audio corpus runs before any model sees it), so the ORACLE
    * replays the arithmetic waveform definition without any codec —
    * the q140/q223 derived-oracle discipline. One mapPartitions pass
    * each way; per-row cost is O(samples), no shuffle anywhere. */
  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("peak_abs", LongType, nullable = false),
    StructField("sum_abs", LongType, nullable = false),
    StructField("zero_cross", LongType, nullable = false)))

  val AudioRate = 16000

  /** The deterministic per-document waveform (shared with the oracle's
    * SQL spelling — pure integer arithmetic, no RNG, no libm). */
  def synthSamples(id: Long): Array[Short] = {
    val n = (256 + (id % 256)).toInt
    Array.tabulate(n)(k => (((id * 31 + k.toLong * 17) % 4096) - 2048).toShort)
  }

  /** Mono PCM16 little-endian RIFF/WAVE writer. */
  def wavEncode(samples: Array[Short], rate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Chunk-walking WAV parser: validates RIFF/WAVE magics, walks chunks
    * to `fmt ` (requires PCM / mono / 16-bit) and `data`, returns
    * (sampleRate, samples). None for anything malformed — corrupt
    * containers are data, not task failures. */
  def wavDecode(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    try {
      if (bytes == null || bytes.length < 44) return None
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      if (tag() != "RIFF") return None
      buf.getInt // riff size
      if (tag() != "WAVE") return None
      var rate = -1
      var samples: Array[Short] = null
      while (buf.remaining() >= 8 && (rate < 0 || samples == null)) {
        val t = tag()
        val len = buf.getInt
        if (len < 0 || len > buf.remaining()) return None
        t match {
          case "fmt " =>
            val fmt = buf.getShort; val ch = buf.getShort
            rate = buf.getInt
            buf.getInt; buf.getShort // byte rate, block align
            val bits = buf.getShort
            if (fmt != 1 || ch != 1 || bits != 16) return None
            buf.position(buf.position() + len - 16)
          case "data" =>
            samples = Array.fill(len / 2)(buf.getShort)
          case _ =>
            buf.position(buf.position() + len + (len & 1))
        }
      }
      if (rate > 0 && samples != null) Some((rate, samples)) else None
    } catch { case _: Exception => None }
  }

  /** The synthetic audio corpus as a media table: one real WAV blob per
    * document, with a deterministic corrupt cohort (media_id ≡ 0 mod
    * [[AudioCorruptMod]] gets its container truncated mid-header) so
    * the decode_ok path is exercised honestly. */
  val AudioCorruptMod = 50

  def audioTable(ids: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema)
    ids.select(col("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val wav = wavEncode(synthSamples(id), AudioRate)
        val content =
          if (id % AudioCorruptMod == 0) java.util.Arrays.copyOf(wav, 20)
          else wav
        Row(id, content, "audio/wav", content.length)
      }
    }(enc)
  }

  /** Decode → integer feature extraction (the audio analog of
    * [[decodeImages]]): peak amplitude, total absolute amplitude, and
    * the sign-change count (s_k ≥ 0 differing from s_{k−1} ≥ 0) — all
    * exact integers of the decoded samples. */
  def audioFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(audioFeatureSchema)
    media.select("media_id", "content").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        wavDecode(r.getAs[Array[Byte]](1)) match {
          case None => Row(id, false, 0, 0, 0L, 0L, 0L)
          case Some((rate, s)) =>
            var peak = 0L; var sabs = 0L; var zc = 0L
            var i = 0
            while (i < s.length) {
              val a = math.abs(s(i).toLong)
              if (a > peak) peak = a
              sabs += a
              if (i > 0 && ((s(i) >= 0) != (s(i - 1) >= 0))) zc += 1
              i += 1
            }
            Row(id, true, rate, s.length, peak, sabs, zc)
        }
      }
    }(enc)
  }
}
