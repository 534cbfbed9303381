package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.BinaryType

import graft.etl.{ParquetTarget, WriteMode}
import graft.ops.Dedup

/**
 * Ingestion-time corpus decontamination as a Structured Streaming sink —
 * the streaming composition of [[graft.ops.Dedup.bloomDecontaminate]]:
 * every micro-batch of documents is checked for n-gram overlap with a
 * FIXED reference (eval/benchmark) corpus, and per-document verdicts
 * land in a parquet target.
 *
 * Build-once, probe-forever: the reference n-gram set and its Bloom
 * filter are computed ONCE at stream construction (a scalar subquery
 * would re-run the bloom aggregate every micro-batch), the bloom binary
 * is collected to the driver and embedded as a LITERAL in the probe
 * expression, and the distinct reference n-grams are cached for the
 * confirm join. Per batch the work is: map-only codegen'd bloom probe
 * over the batch's n-grams → exact semi-join of the few survivors
 * against the cached reference set → one small upsert. The batch never
 * shuffles on content; state never grows (the reference is fixed — for
 * a growing corpus-vs-itself check use [[StreamingDedup]]).
 *
 * Delivery: verdicts are UPSERTed on `idCol` through the staged-swap
 * commit, so a redelivered batch rewrites identical rows —
 * effectively-once per document. An empty reference set yields a NULL
 * bloom literal; `might_contain(NULL, …)` is NULL, the filter keeps
 * nothing, and every document reports clean — correct, not an error.
 */
object StreamingDecontaminate {

  /** Stream → per-document (id, dirty_ngrams, contaminated) verdicts
    * vs the fixed `ref` corpus. `stream` must carry `idCol`+`textCol`. */
  def decontaminateEachBatch(stream: DataFrame, idCol: String,
      textCol: String, ref: DataFrame, refTextCol: String,
      target: ParquetTarget, n: Int = 8,
      expectedItems: Long = 4000000L, fpp: Double = 0.01)
      : DataStreamWriter[Row] = {
    val refGrams = Dedup.distinctGrams(ref, refTextCol, n).persist()
    val (items, bits) = Dedup.bloomSizing(ref, expectedItems, fpp)
    val bloomRow = refGrams.agg(Dedup.bloomAgg(items, bits).as("bf")).head()
    val bloomLit =
      if (bloomRow.isNullAt(0)) Literal.create(null, BinaryType)
      else Literal(bloomRow.getAs[Array[Byte]](0))
    val probe = Dedup.bloomProbe(bloomLit)

    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      batch.persist()
      try if (!batch.isEmpty) {
        val candidates = Dedup
          .shingles(batch, idCol, textCol, n, distinct = true)
          .where(probe)
        val verdicts =
          Dedup.confirmAndCount(batch, idCol, candidates, refGrams)
        target.write(verdicts, WriteMode.Upsert, Seq(idCol))
        ()
      } finally { batch.unpersist(); () }
    }
  }
}
