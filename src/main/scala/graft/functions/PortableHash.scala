package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The engine-portable hash-threshold primitive shared by every
 * deterministic sampler/thinner in the library (record sampling,
 * stratified sampling, weighted mixing, ANN bucket caps).
 *
 * `bucket(cols)` = the first 60 bits of `md5(col1|col2|…)` mod 2^20 —
 * replayable bit-exactly in any engine with md5; the DuckDB mirror is
 * `(('0x' || substring(md5(k), 1, 15))::BIGINT % 1048576)`. Keep the
 * formula in ONE place: the oracle SQL of every consumer is written
 * against exactly this construction, so a drift in any copy silently
 * breaks parity. Hash only columns whose string rendering is identical
 * across engines (integers and strings are; doubles may not be).
 */
object PortableHash {

  /** Hash bucket count (2^20). */
  val M = 1048576L

  /** Deterministic bucket in [0, M) from the '|'-joined string forms. */
  def bucket(cols: Seq[Column]): Column =
    pmod(
      conv(substring(md5(concat_ws("|", cols.map(_.cast("string")): _*)),
        1, 15), 16, 10).cast("long"),
      lit(M))
}
