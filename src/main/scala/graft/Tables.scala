package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Testdata table access. The driver's parquet tables live in
 * `/root/testdata/sf{0.001,0.01,0.1}/<name>.parquet`.
 *
 * The `events` table stores `ts` as parquet TIMESTAMP(NANOS) which Spark
 * refuses to read by default ([PARQUET_TYPE_ILLEGAL]). We flip
 * `spark.sql.legacy.parquet.nanosAsLong` and truncate nanos → micros,
 * which is bit-identical to what DuckDB reports for the same file
 * (TIMESTAMP, µs), keeping oracle parity exact.
 */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // proactive: TIMESTAMP(NANOS) parquet otherwise fails the whole read job
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTimestamps(spark.read.parquet(path(dir, name)))
  }

  /** Long nano columns (from nanosAsLong) named like timestamps → µs timestamps. */
  private def normalizeTimestamps(df: DataFrame): DataFrame = {
    val tsLongCols = df.schema.fields.collect {
      case f if f.dataType == LongType && (f.name == "ts" || f.name.endsWith("_ts")) => f.name
    }
    tsLongCols.foldLeft(df) { (d, c) =>
      // integer div, not double div: ns-since-epoch exceeds 2^53
      d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
    }
  }

  private def msgChain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view (used by SQLTransform / spark.sql paths). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
