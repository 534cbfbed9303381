package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.etl.{ParquetTarget, WriteMode}
import graft.ops.Dedup

/**
 * Ingestion-time near-duplicate detection as a Structured Streaming
 * sink: every micro-batch of documents is MinHash-signed, band-joined
 * against a persisted corpus signature store, and then added to that
 * store — the streaming composition of
 * [[graft.ops.Dedup.minhashCandidatesAgainst]]. Per batch the cost is
 * O(batch signatures + band-keyed join against the store's matching
 * buckets) plus an O(batch) APPEND to the store: no corpus rescan, no
 * self-join, no per-batch store rewrite, and the only growing state is
 * the signature store — k×8 hex chars per document, on disk, NOT in
 * executor memory (a 1B-doc corpus at k=16 is ~130 GB of parquet — a
 * table, not a state store).
 *
 * Delivery semantics:
 *  - matches: UPSERT on (new_id, corpus_id) through the staged-swap
 *    commit — a redelivered batch re-derives the same pairs, so
 *    replay is idempotent (effectively-once pairs).
 *  - store: plain APPEND (at-least-once). A redelivered batch appends
 *    its signatures AGAIN — deliberately harmless: the candidate join
 *    emits DISTINCT pairs, so duplicate store rows change cost, never
 *    results. An upsert store would buy row-level exactly-once at the
 *    price of rewriting store partitions every batch — the wrong trade
 *    for an append-mostly corpus index. Compact/dedup the store
 *    offline if replays accumulate ([[graft.etl.Compaction]]).
 *  - replay divergence is closed by ANTI-JOINING the store against the
 *    batch's own ids before matching: if a crash lands between the
 *    store append and the streaming checkpoint, the redelivered batch
 *    would otherwise find ITSELF in the store and emit batch-internal
 *    pairs the first delivery didn't. With the anti-join both
 *    deliveries see the same effective store. Batch-internal
 *    duplicates are deliberately out of scope (run
 *    [[graft.ops.Dedup.minhashCandidates]] over the batch in the same
 *    foreachBatch if they matter).
 */
object StreamingDedup {

  /** Stream → near-dup matches vs the growing corpus. `stream` must
    * carry `idCol` and `textCol`; matches land as (new_id, corpus_id)
    * rows in `matchesTarget`, signatures accumulate in `storeTarget`. */
  def nearDupEachBatch(stream: DataFrame, idCol: String, textCol: String,
      storeTarget: ParquetTarget, matchesTarget: ParquetTarget,
      k: Int = 16, shingleN: Int = 3, bands: Int = 4)
      : DataStreamWriter[Row] = {
    require(k % bands == 0,
      s"bands ($bands) must divide k ($k): k/bands truncation would " +
        "silently ignore trailing signature rows")
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      batch.persist()
      try if (!batch.isEmpty) {
        val spark = batch.sparkSession
        val sigs = Dedup
          .minhashSignatures(batch, idCol, textCol, k, shingleN)
          .persist() // read twice: match join + store append
        try {
          val store: Option[DataFrame] =
            try Some(spark.read.parquet(storeTarget.path))
            catch { case _: org.apache.spark.sql.AnalysisException => None }
          store.foreach { st =>
            val prior = st.join(sigs.select(col("id")), Seq("id"),
              "left_anti") // replay safety: see the object doc
            val matches = Dedup.minhashCandidatesAgainst(sigs, prior,
              bands, k / bands).persist()
            try {
              // empty-guard: an upsert of zero rows would still stage
              // and swap the whole matches table
              if (!matches.isEmpty)
                matchesTarget.write(matches, WriteMode.Upsert,
                  Seq("new_id", "corpus_id"))
            } finally { matches.unpersist(); () }
          }
          storeTarget.write(sigs, WriteMode.Append)
          ()
        } finally { sigs.unpersist(); () }
      } finally { batch.unpersist(); () }
    }
  }
}
