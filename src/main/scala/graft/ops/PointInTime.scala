package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Point-in-time-correct (as-of) join — THE feature-store training-set
 * operator: for every left row (entity, t) attach the latest right-side
 * feature row with the same entity key and timestamp ≤ t (optionally
 * within a lookback tolerance), with no future leakage.
 *
 * Reference scope: the reference's PIT semantics live in its feature
 * serving/materialization design (raise_/PRD.md §4.5 point lookups and
 * training-data export); it ships no user-facing as-of join, so this is
 * a beyond-reference operator per BASELINE.json's north star.
 *
 * Scale design — the union-marker algorithm, NOT a range join:
 * left and right are unioned with a side marker, shuffled ONCE by
 * entity key, and sorted within each entity partition by (time, side)
 * with right-before-left at equal timestamps (inclusive at-or-before).
 * The matched right row is carried forward WHOLESALE: one
 * `last(struct(rightTs, valueCols…), ignoreNulls)` running window, so a
 * NULL inside a matched row's value column stays NULL (it is never
 * back-filled from an older right row), all attached values come from
 * the SAME right row, and `feature_ts` always corresponds to them —
 * DuckDB `ASOF JOIN` semantics. One shuffle per input, zero row
 * expansion — a range join instead explodes candidate pairs per entity
 * and re-filters, which collapses at 100 TB on hot entities.
 *
 * Window partitioning is by entity key, so parallelism scales with
 * distinct entities. For heavy-tailed entity histograms pass
 * `salt > 1`: left rows of keys above `hotThreshold` are spread over
 * `salt` sub-partitions and the (much smaller) right history of those
 * keys is replicated into each — results identical, and no single task
 * ever sorts a whole hot entity.
 *
 * Right side must be unique per (keys, rightTs) — pre-aggregate
 * upstream (e.g. latest per key+ts) — so the carried value is
 * deterministic.
 */
object PointInTime {

  /**
   * @param left      probe side; all its columns are preserved
   * @param right     build side (features); must be unique on keys+rightTs
   * @param keys      equality join keys (entity id columns, same names
   *                  on both sides)
   * @param leftTs    event-time column on `left`
   * @param rightTs   feature-time column on `right`
   * @param valueCols right columns to attach (emitted under the same
   *                  names, NULL when no feature row is at-or-before)
   * @param tolerance max lookback (left.ts - right.ts); matches older
   *                  than this are nulled out (None = unbounded)
   * @param salt      sub-partitions for hot entities (1 = off; no extra
   *                  passes when off)
   * @param hotThreshold left-row count above which a key is salted
   */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String],
      tolerance: Option[Column] = None,
      salt: Int = 1, hotThreshold: Long = 4000000L): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns.toSeq
    val keyCols = keys.map(col)
    val nonKeyLeft = leftCols.filterNot(keys.contains)
    require(valueCols.intersect(leftCols).isEmpty,
      "valueCols must not collide with left column names")

    // identical layout on both sides (unionByName aligns by name):
    // every left col (nulls on build rows), __t/__side, and the carried
    // right-row struct __vals (null struct on probe rows — NOT a struct
    // of nulls, so ignoreNulls skips probe rows but carries a matched
    // right row even when its value columns are NULL)
    val rtType = right.schema(rightTs).dataType
    val valsType = StructType(StructField("__rt", rtType) +:
      valueCols.map(c => StructField(c, right.schema(c).dataType)))
    val probe = left.select(
      leftCols.map(col) ++
        Seq(col(leftTs).as("__t"), lit(1).as("__side"),
          lit(null).cast(valsType).as("__vals")): _*)
    val build = right.select(
      (keyCols ++
        nonKeyLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c))) ++
        Seq(col(rightTs).as("__t"), lit(0).as("__side"),
          struct(col(rightTs).as("__rt") +: valueCols.map(col): _*)
            .as("__vals")): _*)

    // hot-entity salting: left rows of hot keys spread by a ts-hash,
    // right rows of hot keys replicated into every sub-partition
    val (probeS, buildS, partKeys) =
      if (salt <= 1) (probe, build, keyCols)
      else {
        val hot = left.groupBy(keyCols: _*).agg(count(lit(1)).as("__n"))
          .where(col("__n") > hotThreshold)
          .select(keyCols: _*).withColumn("__hot", lit(1))
        val p = probe.join(broadcast(hot), keys, "left")
          .withColumn("__salt",
            when(col("__hot").isNotNull,
              pmod(xxhash64(col("__t")), lit(salt)).cast("int"))
              .otherwise(lit(0)))
          .drop("__hot")
        val b = build.join(broadcast(hot), keys, "left")
          .withColumn("__salt",
            explode(when(col("__hot").isNotNull,
              sequence(lit(0), lit(salt - 1)))
              .otherwise(array(lit(0)))))
          .drop("__hot")
        (p, b, keyCols :+ col("__salt"))
      }

    // right rows sort before left rows at equal time → inclusive ≤
    val w = Window.partitionBy(partKeys: _*).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = probeS.unionByName(buildS)
      .withColumn("__m", last(col("__vals"), ignoreNulls = true).over(w))

    val mt = col("__m").getField("__rt")
    val within = tolerance match {
      case Some(tol) => col("__m").isNotNull && (col("__t") - mt) <= tol
      case None      => col("__m").isNotNull
    }
    carried
      .where(col("__side") === 1)
      .withColumn("__ok", within)
      .select(leftCols.map(col) ++
        Seq(when(col("__ok"), mt).as("feature_ts")) ++
        valueCols.map(c =>
          when(col("__ok"), col("__m").getField(c)).as(c)): _*)
  }

  /**
   * NEAREST-direction as-of join: each left row picks the right row
   * with the smallest |Δt| per key, in EITHER direction — the
   * sensor-alignment variant of [[asofJoin]] (backward-only as-of is
   * right for feature lookup, wrong for matching two clocks that
   * both jitter). Composed from two runs of the same union-marker
   * single-shuffle algorithm: the forward pass rides NEGATED
   * epoch-µs timestamps through the backward machinery, so there is
   * exactly one algorithm to trust; ties (equal gap both sides) take
   * the backward (earlier) match.
   *
   * Returns every left row plus (nearest_ts, direction,
   * gap_seconds, valueCols...). `idCol` must uniquely identify left
   * rows (it keys the backward/forward recombination).
   */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      idCol: String, leftTs: String, rightTs: String,
      valueCols: Seq[String]): DataFrame = {
    val b = asofJoin(left, right, keys, leftTs, rightTs, valueCols)
    val fwdVals = valueCols.map(_ + "__fwd")
    val leftN = left.select(left.columns.map(col) :+
      (-unix_micros(col(leftTs))).as("__nts"): _*)
    val rightN = right.select((keys.map(col) :+
      (-unix_micros(col(rightTs))).as("__nts")) ++
      valueCols.zip(fwdVals).map { case (c, f) => col(c).as(f) }: _*)
    val f = asofJoin(leftN, rightN, keys, "__nts", "__nts", fwdVals)
      .select(col(idCol).as("__fid") +:
        timestamp_micros(-col("feature_ts")).as("__fwd_ts") +:
        fwdVals.map(col): _*)
    val j = b.join(f, col(idCol) === col("__fid")).drop("__fid")
    val gapB = unix_micros(col(leftTs)) - unix_micros(col("feature_ts"))
    val gapF = unix_micros(col("__fwd_ts")) - unix_micros(col(leftTs))
    val useB = col("feature_ts").isNotNull &&
      (col("__fwd_ts").isNull || gapB <= gapF)
    j.select(left.columns.map(col) ++ Seq(
      when(useB, col("feature_ts")).otherwise(col("__fwd_ts"))
        .as("nearest_ts"),
      when(useB, "backward")
        .when(col("__fwd_ts").isNotNull, "forward").as("direction"),
      (when(useB, gapB).otherwise(gapF) / 1000000.0)
        .as("gap_seconds")) ++
      valueCols.map(c =>
        when(useB, col(c)).otherwise(col(c + "__fwd")).as(c)): _*)
  }

  /**
   * Bucketed interval (range) join: attach every point row to EVERY
   * interval row whose `[start, end)` contains its timestamp — the
   * non-equi join class (maintenance windows × events, campaigns ×
   * clicks, overlapping sessions × telemetry) that Spark's optimizer,
   * given the raw `p.t >= i.s AND p.t < i.e` predicate, can only plan
   * as a broadcast-nested-loop — O(|points|·|intervals|) comparisons.
   *
   * Buckets are the manufactured equi-key: time is tiled into
   * fixed-width buckets; each interval explodes to the buckets it
   * overlaps (a bounded fan-out of span/width rows), each point maps to
   * exactly ONE bucket, the join is a plain hash equi-join on the
   * bucket id, and the containment predicate is re-checked exactly on
   * the survivors. Every qualifying (interval, point) pair meets in
   * exactly one bucket — the point's — so the result needs no dedup and
   * is EXACT; the bucket tiling only prunes. All bucket arithmetic is
   * integer floor-division (no floating-point boundary drift).
   *
   * Scale: one keyed shuffle per side; the interval fan-out is bounded
   * by `maxBucketsPerInterval` (exceeding it throws rather than
   * silently exploding — pick `bucketWidth` near the MEDIAN interval
   * span so typical intervals cover 1-2 buckets). Hot buckets (many
   * intervals over one time tile) inflate that bucket's join task;
   * AQE's skew-join split handles moderate cases, and a narrower width
   * spreads chronic ones.
   *
   * Columns must be integral (cast timestamps to epoch seconds/micros
   * upstream — a raw `timestamp` cast to long is seconds in Spark);
   * empty intervals (`end <= start`) match nothing.
   */
  def rangeJoin(points: DataFrame, pointTs: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long, maxBucketsPerInterval: Long = 10000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "points and intervals must not share column names")
    def fdiv(c: Column) =
      ((c - pmod(c, lit(bucketWidth))) / bucketWidth).cast("long")
    val expl = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__b0", fdiv(col(startCol)))
      .withColumn("__b1", fdiv(col(endCol) - 1))
      // the guard lives INSIDE the kept expression so column pruning
      // can't optimize it away
      .withColumn("__bkt", explode(sequence(col("__b0"),
        when(col("__b1") - col("__b0") < maxBucketsPerInterval, col("__b1"))
          .otherwise(raise_error(concat(
            lit(s"rangeJoin: interval [" ), col(startCol), lit(", "),
            col(endCol),
            lit(s") spans >= $maxBucketsPerInterval buckets of width " +
              s"$bucketWidth — raise bucketWidth or the cap")))
            .cast("long")))))
      .drop("__b0", "__b1")
    points.withColumn("__bkt", fdiv(col(pointTs)))
      .join(expl, Seq("__bkt"))
      .where(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__bkt")
  }

  /**
   * Interval × interval overlap join — [[rangeJoin]] generalized to two
   * interval sets: every (left, right) pair with
   * `[ls, le) ∩ [rs, re) ≠ ∅` (campaigns × maintenance windows,
   * session overlap analysis). Both sides tile onto the same bucket
   * grid; a qualifying pair meets in every bucket their spans share, so
   * instead of a post-join dedup the pair is counted ONLY in its
   * canonical bucket — the bucket of `max(ls, rs)`, the overlap start,
   * which both intervals cover by definition. Same exactness and guard
   * story as [[rangeJoin]]; integral columns, end-exclusive, empty
   * intervals match nothing.
   */
  def intervalJoin(left: DataFrame, leftStart: String, leftEnd: String,
      right: DataFrame, rightStart: String, rightEnd: String,
      bucketWidth: Long, maxBucketsPerInterval: Long = 10000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left and right must not share column names")
    def fdiv(c: Column) =
      ((c - pmod(c, lit(bucketWidth))) / bucketWidth).cast("long")
    def explBuckets(df: DataFrame, s: String, e: String): DataFrame =
      df.where(col(e) > col(s))
        .withColumn("__b0", fdiv(col(s)))
        .withColumn("__b1", fdiv(col(e) - 1))
        .withColumn("__bkt", explode(sequence(col("__b0"),
          when(col("__b1") - col("__b0") < maxBucketsPerInterval,
            col("__b1"))
            .otherwise(raise_error(concat(
              lit("intervalJoin: interval ["), col(s), lit(", "), col(e),
              lit(s") spans >= $maxBucketsPerInterval buckets of width " +
                s"$bucketWidth — raise bucketWidth or the cap")))
              .cast("long")))))
        .drop("__b0", "__b1")
    explBuckets(left, leftStart, leftEnd)
      .join(explBuckets(right, rightStart, rightEnd), Seq("__bkt"))
      .where(col(leftStart) < col(rightEnd) &&
        col(rightStart) < col(leftEnd) &&
        fdiv(greatest(col(leftStart), col(rightStart))) === col("__bkt"))
      .drop("__bkt")
  }
}
