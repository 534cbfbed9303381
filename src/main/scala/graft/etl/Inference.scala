package graft.etl

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/**
 * Bulk model-inference transform (raise_/transforms/inference.py): the
 * full configuration contract — model spec, accelerator resources,
 * batching, column mappings, result metrics — with execution as a
 * `mapPartitions` batch loop over a pluggable model function. Real GPU
 * serving is out of scope offline; the contract (batching shape,
 * success/failure accounting, throughput metrics) is fully exercised.
 */
final case class ModelSpec(
    uri: String, // s3:// | hf:// | mlflow:// | triton:// | file:// ...
    framework: String, // pytorch|tensorflow|onnx|sklearn|xgboost|...
    version: Option[String] = None,
    task: Option[String] = None) {
  val scheme: String = uri.takeWhile(_ != ':')
  require(ModelSpec.schemes(scheme), s"Unknown model uri scheme: $scheme")
  require(ModelSpec.frameworks(framework), s"Unknown framework: $framework")
}
object ModelSpec {
  val schemes: Set[String] =
    Set("s3", "gs", "hf", "mlflow", "triton", "file", "http", "https")
  val frameworks: Set[String] = Set(
    "pytorch", "tensorflow", "onnx", "sklearn", "xgboost", "lightgbm",
    "jax", "transformers", "sentence_transformers", "custom")
}

/** Resource request → Spark resource-profile knobs (inference.py:43-69). */
final case class AcceleratorConfig(
    kind: String = "cpu", // cpu | gpu | tpu
    count: Int = 0,
    memoryGb: Option[Int] = None) {
  /** spark confs this config maps to on a real cluster. */
  def sparkConf: Map[String, String] =
    if (kind == "cpu" || count == 0) Map.empty
    else Map(
      "spark.task.resource.gpu.amount" -> count.toString,
      "spark.executor.resource.gpu.amount" -> count.toString)
}

final case class BatchConfig(
    batchSize: Int = 32,
    dynamic: Boolean = false,
    maxLatencyMs: Option[Long] = None)

/** Per-run accounting (inference.py:538-595). */
final case class InferenceResult(
    totalSamples: Long,
    successSamples: Long,
    failedSamples: Long,
    durationMs: Long) {
  def throughputPerSec: Double =
    if (durationMs == 0) 0.0 else successSamples * 1000.0 / durationMs
}

/**
 * The batch model function: a batch of input rows (as Seq[Any] per the
 * input column mapping) → one output value per row, or an exception for
 * the whole batch (counted as failed samples).
 */
final case class InferenceTransformSpec(
    model: ModelSpec,
    inputColumns: Seq[String],
    outputColumn: String,
    outputType: DataType = ArrayType(FloatType, containsNull = false),
    batch: BatchConfig = BatchConfig(),
    accelerator: AcceleratorConfig = AcceleratorConfig())

object InferenceTransform {

  type BatchModel = Seq[Seq[Any]] => Seq[Any]

  /** Deterministic stand-in "embedding model" (offline default). */
  def fakeEmbeddingModel(dim: Int): BatchModel = { rows =>
    rows.map { inputs =>
      val h = inputs.mkString("").hashCode
      Array.tabulate(dim)(i => ((h * (i + 1)).toFloat / Int.MaxValue))
    }
  }

  /**
   * Run inference: partitions stream through the model in
   * `batch.batchSize` chunks (model loaded once per partition in real
   * use). Failed batches yield null outputs; accounting via accumulators.
   */
  def run(df: DataFrame, spec: InferenceTransformSpec,
      model: BatchModel): (DataFrame, InferenceResult) = {
    val spark = df.sparkSession
    val t0 = System.nanoTime()
    val okAcc = spark.sparkContext.longAccumulator("inference_success")
    val failAcc = spark.sparkContext.longAccumulator("inference_failed")
    val inIdx = spec.inputColumns.map(df.schema.fieldIndex)
    val outSchema = df.schema.add(spec.outputColumn, spec.outputType)
    val bs = spec.batch.batchSize
    val outRdd = df.rdd.mapPartitions { rows =>
      rows.grouped(bs).flatMap { chunk =>
        val inputs = chunk.map(r => inIdx.map(r.get))
        try {
          val outs = model(inputs)
          okAcc.add(chunk.size)
          chunk.zip(outs).map { case (r, o) =>
            Row.fromSeq(r.toSeq :+ (o match {
              case a: Array[Float] => a.toSeq
              case other           => other
            }))
          }
        } catch {
          case _: Throwable =>
            failAcc.add(chunk.size)
            chunk.map(r => Row.fromSeq(r.toSeq :+ null))
        }
      }
    }
    val out = spark.createDataFrame(outRdd, outSchema)
    out.cache().count() // materialize so accumulators are final
    val res = InferenceResult(
      okAcc.value + failAcc.value, okAcc.value, failAcc.value,
      (System.nanoTime() - t0) / 1000000)
    (out, res)
  }

  // convenience constructors (inference.py:647-785)
  def embedding(modelUri: String, textColumn: String,
      outputColumn: String = "embedding", dim: Int = 16): InferenceTransformSpec =
    InferenceTransformSpec(ModelSpec(modelUri, "sentence_transformers",
      task = Some("embedding")), Seq(textColumn), outputColumn)

  def classification(modelUri: String, inputColumns: Seq[String],
      outputColumn: String = "label"): InferenceTransformSpec =
    InferenceTransformSpec(ModelSpec(modelUri, "sklearn",
      task = Some("classification")), inputColumns, outputColumn, StringType)

  def llmInference(modelUri: String, promptColumn: String,
      outputColumn: String = "completion"): InferenceTransformSpec =
    InferenceTransformSpec(ModelSpec(modelUri, "transformers",
      task = Some("generation")), Seq(promptColumn), outputColumn, StringType,
      BatchConfig(batchSize = 8, dynamic = true))
}
