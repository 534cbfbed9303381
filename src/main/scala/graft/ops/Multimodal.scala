package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal blob handling: opaque binary payloads referenced by
 * immutable BlobReference structs (uri, content_type, checksum,
 * hash_algorithm, size_bytes, etag, version_id, metadata) — the schema
 * from raise_/transforms/multimodal.py:102-144, realized as a Spark
 * struct column instead of a Python object.
 *
 * Decode / feature-extraction is a pluggable per-batch function over
 * `mapPartitions` (no image/audio libs ship in this environment, so the
 * default extractor is a deterministic fake; the Spark-side plumbing —
 * schema, batching, partitioning — is real and tested).
 */
object Multimodal {

  val blobRefType: StructType = StructType(Seq(
    StructField("uri", StringType, nullable = false),
    StructField("content_type", StringType, nullable = true),
    StructField("checksum", StringType, nullable = true),
    StructField("hash_algorithm", StringType, nullable = true),
    StructField("size_bytes", LongType, nullable = true),
    StructField("etag", StringType, nullable = true),
    StructField("version_id", StringType, nullable = true),
    StructField("metadata", MapType(StringType, StringType), nullable = true)))

  /** Extension → MIME type (multimodal.py:878-918 table). */
  val contentTypeByExtension: Map[String, String] = Map(
    "png" -> "image/png", "jpg" -> "image/jpeg", "jpeg" -> "image/jpeg",
    "webp" -> "image/webp", "gif" -> "image/gif", "tiff" -> "image/tiff",
    "bmp" -> "image/bmp",
    "wav" -> "audio/wav", "mp3" -> "audio/mpeg", "flac" -> "audio/flac",
    "ogg" -> "audio/ogg", "aac" -> "audio/aac",
    "mp4" -> "video/mp4", "webm" -> "video/webm", "avi" -> "video/avi",
    "mov" -> "video/quicktime",
    "pdf" -> "application/pdf",
    "npy" -> "application/x-numpy", "npz" -> "application/x-numpy-compressed",
    "pt" -> "application/x-pytorch",
    "safetensors" -> "application/x-safetensors")

  /** Infer the MIME content type from a uri's file extension, NULL when
    * unrecognized (infer_content_type, multimodal.py:878) — a codegen'd
    * CASE chain over `lower(substring_index(uri, '.', -1))`, map-only. */
  def inferContentType(uri: Column): Column = {
    val ext = lower(substring_index(uri, ".", -1))
    contentTypeByExtension.foldLeft(lit(null).cast(StringType)) {
      case (acc, (e, ct)) => when(ext === e, ct).otherwise(acc)
    }
  }

  /** Build a blob_ref struct column from uri + payload columns. */
  def blobRef(uri: Column, contentType: Column, payload: Column,
      metadata: Column = map()): Column =
    struct(
      uri.as("uri"),
      contentType.as("content_type"),
      sha2(payload, 256).as("checksum"),
      lit("sha256").as("hash_algorithm"),
      length(payload).cast("long").as("size_bytes"),
      md5(payload).as("etag"),
      lit("v1").as("version_id"),
      metadata.as("metadata"))

  /**
   * Scan a directory of binary files into blob_ref rows + payload.
   * Columns: path, modificationTime, length, content (Spark binaryFile
   * source — ref MultimodalSource.scan, multimodal.py:614-661, for real).
   */
  def scanBinaryFiles(spark: org.apache.spark.sql.SparkSession, path: String,
      pathGlob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    pathGlob.fold(r)(g => r.option("pathGlobFilter", g)).load(path)
      .withColumn("blob_ref",
        blobRef(col("path"), lit(null).cast(StringType), col("content")))
  }

  /**
   * Integrity check over blob payloads: recompute checksum, compare with
   * the recorded one (observability.py:383-451 semantics, real sha2).
   * Returns (n_checked, n_invalid, invalid_rate).
   */
  def blobIntegrity(df: DataFrame, blobRefCol: String, payloadCol: String,
      sampleRate: Double = 1.0): DataFrame = {
    val sampled = if (sampleRate >= 1.0) df else df.sample(sampleRate, 42L)
    sampled
      .withColumn("__ok",
        (sha2(col(payloadCol), 256) === col(s"$blobRefCol.checksum")).cast("long"))
      .agg(
        count(lit(1)).as("n_checked"),
        (count(lit(1)) - sum(col("__ok"))).as("n_invalid"),
        ((count(lit(1)) - sum(col("__ok"))) / count(lit(1)).cast("double"))
          .as("invalid_rate"))
  }

  /**
   * Frame-sampling plumbing for video payloads: the blob is treated as
   * a sequence of fixed-size encoded frame blocks and every `stride`-th
   * block is emitted with its index and byte slice. A real container
   * demuxer would replace the fixed-block model (codec libs don't ship
   * offline — builder contract says stub the decode, keep the
   * distributed plumbing real): the fan-out, slicing, schema, and
   * per-frame rows are the actual pipeline shape. Map-only; output
   * bounded at ⌈frames/stride⌉ rows per blob.
   */
  def frameSample(df: DataFrame, uriCol: String, payloadCol: String,
      frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be > 0")
    val nFrames = ceil(length(col(payloadCol)).cast("double") / frameBytes)
      .cast("long")
    df.withColumn("n_frames", nFrames)
      .where(col("n_frames") > 0)
      .select(col(uriCol), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
          .as("frame_idx"),
        col(payloadCol))
      .withColumn("frame",
        expr(s"substring($payloadCol, cast(frame_idx * $frameBytes + 1 as int), $frameBytes)"))
      .select(col(uriCol), col("frame_idx"), col("frame"), col("n_frames"))
  }

  /**
   * Audio chunk planning for PCM-modeled payloads: fixed-duration
   * windows with overlap, expressed as exact BYTE RANGES — the
   * pre-decode step of an audio pipeline (ASR batching, diarization
   * windows). For raw PCM the sample↔byte arithmetic here is exact,
   * not a stub; container formats would insert a demuxer before it
   * (codec libs don't ship offline — same contract as [[frameSample]]).
   * Map-only: per blob, `total_samples = ⌊bytes / (bytesPerSample ·
   * channels)⌋`, windows of `chunkSeconds` advance by `chunkSeconds −
   * overlapSeconds`, the tail window truncates; output is one row per
   * chunk with sample and byte offsets plus start/end seconds. The
   * caller slices payload bytes with `substring(payload, start_byte+1,
   * n_bytes)` when the content rides along.
   */
  def audioChunkPlan(df: DataFrame, uriCol: String, sizeBytesCol: String,
      sampleRate: Int, bytesPerSample: Int = 2, channels: Int = 1,
      chunkSeconds: Double = 30.0, overlapSeconds: Double = 0.0)
      : DataFrame = {
    require(sampleRate > 0 && bytesPerSample > 0 && channels > 0,
      "sampleRate/bytesPerSample/channels must be positive")
    require(chunkSeconds > 0 && overlapSeconds >= 0 &&
      overlapSeconds < chunkSeconds,
      "need 0 <= overlapSeconds < chunkSeconds")
    val frameBytes = bytesPerSample.toLong * channels
    val chunkSamples = math.max(1L, math.round(chunkSeconds * sampleRate))
    val hopSamples = math.max(1L,
      chunkSamples - math.round(overlapSeconds * sampleRate))
    val total = floor(col(sizeBytesCol).cast("double") / frameBytes)
      .cast("long")
    val nChunks = when(total <= 0, lit(0L))
      .when(total <= chunkSamples, lit(1L))
      .otherwise(ceil((total - chunkSamples).cast("double") / hopSamples)
        .cast("long") + 1L)
    df.withColumn("__total", total)
      .withColumn("__n", nChunks)
      .where(col("__n") > 0)
      .select(col(uriCol), col("__total"),
        explode(sequence(lit(0L), col("__n") - 1)).as("chunk_idx"))
      .withColumn("start_sample", col("chunk_idx") * hopSamples)
      .withColumn("n_samples",
        least(lit(chunkSamples), col("__total") - col("start_sample")))
      .withColumn("start_byte", col("start_sample") * frameBytes)
      .withColumn("n_bytes", col("n_samples") * frameBytes)
      .withColumn("start_sec",
        col("start_sample").cast("double") / sampleRate)
      .withColumn("end_sec",
        (col("start_sample") + col("n_samples")).cast("double") / sampleRate)
      .drop("__total")
  }

  /** Feature row produced by the (pluggable) decoder. */
  type BatchExtractor = Iterator[(String, Array[Byte])] => Iterator[(String, Array[Float], Long)]

  /**
   * Deterministic fake extractor — stands in for image/audio decode
   * (real decoders are not available offline). Produces a fixed-dim
   * "embedding" derived from payload bytes, so the distributed plumbing
   * (batching, schema, partition shape) is fully exercised.
   */
  def fakeExtractor(dim: Int): BatchExtractor = { it =>
    it.map { case (uri, bytes) =>
      val v = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { v(i % dim) += (bytes(i) & 0xff) / 255.0f; i += 1 }
      (uri, v, bytes.length.toLong)
    }
  }

  /**
   * Decode/feature-extract blobs via mapPartitions: one extractor call
   * per partition (model-load amortized), rows streamed — the Spark
   * native analog of a pandas-UDF batch (inference.py:405-531 contract).
   */
  def extractFeatures(df: DataFrame, uriCol: String, payloadCol: String,
      dim: Int = 16,
      extractor: Option[BatchExtractor] = None): DataFrame = {
    val ext = extractor.getOrElse(fakeExtractor(dim))
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("uri", StringType),
      StructField("features", ArrayType(FloatType, containsNull = false)),
      StructField("n_bytes", LongType)))
    val uriIdx = df.schema.fieldIndex(uriCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.queryExecution.toRdd.mapPartitions { rows =>
      val in = rows.map { r =>
        (r.getUTF8String(uriIdx).toString, r.getBinary(payIdx))
      }
      ext(in).map { case (u, v, n) => Row(u, v.toSeq, n) }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /**
   * ViT-style patch-grid planning for image payloads: the (width,
   * height) metadata becomes a ⌈w/p⌉×⌈h/p⌉ patch grid, one row per
   * patch with its grid coordinates and the byte offset of its
   * top-left pixel in the row-major uncompressed layout — the
   * schema/partitioning shape a patch-embedding pipeline consumes
   * (the decode itself is the stubbed extractor contract, same as
   * [[frameSample]]). Map-only; output bounded at patches-per-image
   * rows; edge patches are clipped by construction (`px`/`py` carry
   * the grid position, consumers pad).
   */
  def imagePatchPlan(df: DataFrame, idCol: String, widthCol: String,
      heightCol: String, patch: Int = 16,
      bytesPerPixel: Int = 3): DataFrame = {
    require(patch > 0 && bytesPerPixel > 0,
      "patch and bytesPerPixel must be > 0")
    val w = col(widthCol).cast("long")
    val h = col(heightCol).cast("long")
    val npx = ceil(w.cast("double") / patch).cast("long")
    val npy = ceil(h.cast("double") / patch).cast("long")
    df.select(col(idCol), w.as("__w"), npx.as("n_px"), npy.as("n_py"))
      .where(col("n_px") > 0 && col("n_py") > 0)
      .withColumn("patch_id",
        explode(sequence(lit(0L), col("n_px") * col("n_py") - 1)))
      .select(col(idCol), col("patch_id"),
        (col("patch_id") % col("n_px")).as("px"),
        (col("patch_id") / col("n_px")).cast("long").as("py"),
        col("n_px"), col("n_py"),
        (((col("patch_id") / col("n_px")).cast("long") * patch *
          col("__w") + (col("patch_id") % col("n_px")) * patch) *
          bytesPerPixel).as("start_byte"))
  }
}
