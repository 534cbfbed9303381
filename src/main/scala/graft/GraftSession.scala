package graft

import org.apache.spark.sql.SparkSession

/**
 * Opinionated SparkSession defaults for running this library at scale —
 * every knob is the one the operators here are designed against:
 *
 *  - AQE on (runtime re-plan: skew-join splitting, partition
 *    coalescing, broadcast demotion) — the operators lean on it for
 *    fact-fact join skew instead of hand-salting everything;
 *  - `spark.sql.shuffle.partitions` sized by the caller (cores × 2-3
 *    locally; thousands on a real cluster — AQE coalesces down);
 *  - dynamic partition overwrite, so `ParquetTarget`'s partition-scoped
 *    upsert replaces only affected partitions;
 *  - parquet nanos-as-long + UTC session time, matching
 *    [[Tables.load]]'s nano-timestamp handling and the oracle's
 *    microsecond truncation;
 *  - 128 MiB scan partitions (`files.maxPartitionBytes` default kept —
 *    documented here as the lever to retune when row width is extreme).
 *
 * This is a convenience, not a requirement — every operator works on a
 * plain session; tests/Bench/Verify build their own.
 */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /**
   * Register the library's SQL function surface on a built session so
   * `derived_from` strings EXECUTE everywhere
   * [[graft.expr.ExpressionValidator]] accepts them: the vector
   * functions (DOT/COSINE_SIMILARITY/L2_DISTANCE/…/VEC_*) plus the
   * reference's conditional aliases IIF/IFNULL/NVL
   * (raise_/validation/validator.py:116-120 lists them as accepted
   * names). Aliases register as plain Catalyst expression builders
   * (`If`/`Coalesce` — type-generic, codegen'd, no UDF closure) and
   * only when the running Spark doesn't already ship the name, so a
   * native builtin always wins. Idempotent.
   */
  def withFunctions(spark: SparkSession): SparkSession = {
    graft.functions.VectorFunctions.registerAll(spark)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Coalesce, If}
    val reg = spark.sessionState.functionRegistry
    def missing(n: String) = !reg.functionExists(FunctionIdentifier(n))
    if (missing("iif"))
      reg.createOrReplaceTempFunction("iif", { exprs =>
        require(exprs.length == 3, "IIF(cond, ifTrue, ifFalse) takes 3 args")
        If(exprs(0), exprs(1), exprs(2))
      }, "built-in")
    Seq("ifnull", "nvl").foreach { n =>
      if (missing(n))
        reg.createOrReplaceTempFunction(n, { exprs =>
          require(exprs.length == 2, s"$n(a, b) takes 2 args")
          Coalesce(exprs)
        }, "built-in")
    }
    if (missing("jaro_winkler"))
      reg.createOrReplaceTempFunction("jaro_winkler", { exprs =>
        require(exprs.length == 2, "JARO_WINKLER(a, b) takes 2 args")
        graft.functions.JaroWinkler(exprs(0), exprs(1))
      }, "built-in")
    // reference dialect's AGE(end[, start]) → interval (PRD App.B);
    // everything else in that dialect table (DATE(), TO_CHAR, NULLIF,
    // DATE_PART, NOW, LEFT/RIGHT) ships natively in Spark 4 — probed,
    // not assumed
    if (missing("age"))
      reg.createOrReplaceTempFunction("age", { exprs =>
        require(exprs.length == 1 || exprs.length == 2,
          "AGE(end[, start]) takes 1 or 2 args")
        import org.apache.spark.sql.catalyst.expressions.{Cast, CurrentDate, SubtractTimestamps}
        import org.apache.spark.sql.types.TimestampType
        if (exprs.length == 2) SubtractTimestamps(exprs(0), exprs(1))
        // PG semantics: 1-arg age(ts) anchors to current_date (today's
        // MIDNIGHT), not now() — the dialect this alias mimics
        else SubtractTimestamps(Cast(CurrentDate(), TimestampType), exprs(0))
      }, "built-in")
    spark
  }

  /** Local session sized to the machine (tests, notebooks, Bench). */
  def local(cores: Int = math.min(Runtime.getRuntime.availableProcessors, 32))
      : SparkSession =
    withFunctions(builder(s"local[$cores]", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate())
}
