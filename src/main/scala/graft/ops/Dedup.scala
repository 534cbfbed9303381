package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/**
 * Deduplication operators for large-scale training-data pipelines:
 * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
 *
 * Scale design: every path is a shingle-explode → groupBy/join pipeline —
 * shuffles are keyed on shingles / band keys / block ids, never all-pairs
 * across the corpus. The only quadratic step is *within* a candidate
 * bucket or block, which LSH banding keeps small.
 *
 * Hash choice: MinHash permutations use `md5(salt || shingle)` with the
 * *lexicographic* min over hex digests — a monotone bijection of the
 * usual integer min, deterministic across engines (DuckDB computes the
 * same digests), which is what lets the driver oracle-verify near-dup
 * output. At 100 TB swap md5 for `xxhash64(shingle, seed)` (cheaper,
 * same structure; noted, not default, to keep oracle parity).
 */
object Dedup {

  /**
   * Exact dedup: group identical values, keep the smallest id.
   *
   * Groups by `(xxhash64(text), length(text))`, NOT the text itself —
   * a full-text group key would move the entire corpus through the
   * exchange, whereas the hashed key shuffles 16 bytes per row. The
   * oracle mirror groups by the text (same output). Collision stance:
   * 64-bit hash + exact length ⇒ a false merge needs a same-length
   * xxhash64 collision; expected collisions ≈ n²/2^65 per length class
   * (~1e-7 at a billion equal-length docs). Swap in `md5` (128-bit)
   * where even that is unacceptable — same shape, 2× key width.
   */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(xxhash64(col(textCol)).as("__h"),
        length(col(textCol)).as("__len"), col(idCol))
      .groupBy("__h", "__len")
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select("keeper_id", "n_copies")

  /** Word n-gram shingles; `distinct=false` skips the dedup shuffle for
    * consumers that are duplicate-insensitive (min-aggregation).
    * The token array is materialized as its own projection first — if the
    * `split()` stays inline it is re-evaluated inside every `element_at`
    * of the shingle lambda, turning shingling O(words²) per document
    * (measured 4.6 s → 0.5 s on 260k shingles). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int,
      distinct: Boolean = true): DataFrame = {
    val tokenized = df
      .select(col(idCol).as("id"), split(col(textCol), " ").as("__w"))
    val w = col("__w")
    val sh =
      if (n == 1) explode(w)
      else
        explode(transform(
          sequence(lit(1), size(w) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*)))
    val out = tokenized.where(size(w) >= n).select(col("id"), sh.as("s"))
    if (distinct) out.distinct() else out
  }

  /**
   * MinHash signatures: k independent "permutations" from k/4 salted md5
   * digests — each 128-bit digest is split into four 8-hex-char chunks,
   * and in the random-oracle model each chunk is an independent 32-bit
   * hash function of the shingle. Signature element i = min over
   * shingles of chunk (i%4) of md5((i/4) || ':' || shingle); the
   * lexicographic min over fixed-width hex equals the integer min.
   * 4× fewer digest computations than one-md5-per-permutation (the
   * dominant per-shingle cost), same statistical guarantees.
   * One explode + one groupBy — fully distributed, no driver state.
   */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, shingleN: Int = 3): DataFrame = {
    require(k % 4 == 0, "k must be a multiple of 4 (4 chunks per digest)")
    // min() is duplicate-insensitive → skip the distinct shuffle entirely
    val sh = shingles(df, idCol, textCol, shingleN, distinct = false)
    val withDigests = (0 until k / 4).foldLeft(sh)((d, i) =>
      d.withColumn(s"__h$i", md5(concat(lit(s"$i:"), col("s")))))
    val mins = (0 until k).map { i =>
      min(substring(col(s"__h${i / 4}"), (i % 4) * 8 + 1, 8)).as(s"mh_$i")
    }
    withDigests.groupBy("id").agg(mins.head, mins.tail: _*)
  }

  /** Signature frame → one (id, band, key) row per band; key = md5 of
    * the band's row-group. Shared by self- and incremental banding. */
  private def bandKeys(signatures: DataFrame, bands: Int,
      rowsPerBand: Int): DataFrame =
    signatures.select(
      col("id"),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          md5(concat((0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}")): _*))
            .as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))

  /**
   * LSH banding: signature → `bands` keys (md5 of each row-group), then
   * candidate pairs = docs sharing any band key. Join is keyed on
   * (band index, band key) — bucket sizes stay tiny for random data, so
   * the pair expansion is local to genuine near-dup clusters.
   *
   * `maxBucketSize` is the hot-bucket guard for pathological corpora
   * (millions of byte-identical docs land in ONE bucket and make the
   * pair join quadratic there): when set, any bucket above the cap
   * fails the job LOUDLY with the offending (band, key, size) instead
   * of silently grinding. The guard is a `raise_error` woven into the
   * banded frame — a window count over the SAME (band, key) the join
   * shuffles on, no extra pass/action — so it costs one windowed
   * aggregation, not a second scan. The documented discipline stands:
   * run exact dedup before near-dup (the [[CorpusPipeline]] DAG does),
   * and the guard turns a violation into an error, not an outage.
   */
  def minhashCandidates(signatures: DataFrame, bands: Int = 4,
      rowsPerBand: Int = 4, maxBucketSize: Option[Int] = None): DataFrame = {
    val banded0 = bandKeys(signatures, bands, rowsPerBand)
    val banded = maxBucketSize.fold(banded0) { cap =>
      require(cap > 0, "minhashCandidates: maxBucketSize must be positive")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "key")
      banded0
        .withColumn("__bsz", count(lit(1)).over(w))
        .select(
          // guard rides the id column so pruning can never drop it
          when(col("__bsz") > cap, raise_error(concat(
            lit(s"minhashCandidates: LSH bucket exceeds maxBucketSize=$cap"),
            lit(" (band="), col("band").cast("string"),
            lit(", key="), col("key"),
            lit(", size="), col("__bsz").cast("string"),
            lit(") - run exact dedup before near-dup or raise the cap"))))
            .otherwise(col("id")).as("id"),
          col("band"), col("key"))
    }
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key")
        && col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
  }

  /**
   * MinHash-LSH parameter planner: for a `numPerm`-hash signature and
   * a target Jaccard threshold `t`, enumerate every banding
   * b·r = numPerm and score its S-curve P(s) = 1 − (1 − s^r)^b against
   * the ideal step at `t`:
   *   fp_area = ∫₀ᵗ P(s) ds   (how much sub-threshold similarity still
   *                            collides — wasted verification work),
   *   fn_area = ∫ₜ¹ 1 − P(s) ds (how much true near-dup mass the
   *                              banding misses).
   * Midpoint rule on `grid` cells, plus s50 = (1/b)^(1/r), the
   * similarity where collision probability crosses ½ (the banding's
   * effective threshold). This is the tuning FRONT-END for
   * [[minhashSignatures]]/[[minhashCandidates]]: pick (bands, rows)
   * from this table BEFORE shuffling a corpus-sized signature frame —
   * at 100 TB, a banding whose s50 sits 0.1 below the target threshold
   * multiplies the candidate-pair volume the verify join must absorb.
   *
   * Scale shape: a (divisors × grid) Range fan-out — a few thousand
   * rows regardless of corpus size; the planner is O(1) in data.
   * Returns one row per banding, ordered by bands: (bands, rows,
   * s50, fp_area, fn_area, total_error).
   */
  def lshParameterPlan(spark: SparkSession, numPerm: Int = 128,
      threshold: Double = 0.8, grid: Int = 400): DataFrame = {
    require(numPerm > 0 && grid >= 10 && threshold > 0 && threshold < 1,
      s"lshParameterPlan: numPerm > 0, grid >= 10, threshold in (0,1)")
    val bandings = spark.range(1, numPerm.toLong + 1)
      .where(lit(numPerm) % col("id") === 0)
      .select(col("id").as("bands"),
        (lit(numPerm.toLong) / col("id")).cast("long").as("rows"))
    val pts = spark.range(grid.toLong)
      .select(((col("id").cast("double") + 0.5) / grid).as("__s"))
    // bounded fan-out: both sides are literal Ranges (divisor count ×
    // grid), never corpus data — the deliberate crossJoin idiom
    bandings.crossJoin(pts)
      .withColumn("__p", lit(1.0) -
        pow(lit(1.0) - pow(col("__s"), col("rows")), col("bands")))
      .groupBy("bands", "rows")
      .agg(
        (sum(when(col("__s") < threshold, col("__p")).otherwise(0.0)) / grid)
          .as("fp_area"),
        (sum(when(col("__s") >= threshold, lit(1.0) - col("__p"))
          .otherwise(0.0)) / grid).as("fn_area"))
      .select(col("bands"), col("rows"),
        pow(lit(1.0) / col("bands"), lit(1.0) / col("rows")).as("s50"),
        col("fp_area"), col("fn_area"),
        (col("fp_area") + col("fn_area")).as("total_error"))
      .orderBy("bands")
  }

  /**
   * INCREMENTAL near-dup: candidates between a NEW batch and an
   * EXISTING corpus — the ingestion-time shape ("is this incoming
   * document a near-copy of anything already indexed?"). The corpus
   * side arrives as a PRE-COMPUTED signature frame (persist the
   * [[minhashSignatures]] output bucketed by band key in a real
   * pipeline), so each batch costs signatures over the BATCH plus a
   * band-keyed join against the store — O(batch), never a corpus
   * rescan, and no O(corpus²) self-join anywhere. Asymmetric by
   * construction: output rows are (new_id, corpus_id).
   */
  def minhashCandidatesAgainst(newSignatures: DataFrame,
      corpusSignatures: DataFrame, bands: Int = 4,
      rowsPerBand: Int = 4): DataFrame = {
    val a = bandKeys(newSignatures, bands, rowsPerBand).as("a")
    val b = bandKeys(corpusSignatures, bands, rowsPerBand).as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key")
        && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("new_id"), col("b.id").as("corpus_id"))
      .distinct()
  }

  /** Incremental near-dup from raw text on both sides (convenience;
    * production keeps the corpus side's signatures materialized). */
  def incrementalNearDup(newDocs: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, k: Int = 16, shingleN: Int = 3,
      bands: Int = 4): DataFrame = {
    require(k % bands == 0,
      s"bands ($bands) must divide k ($k): k/bands truncation would " +
        "silently ignore trailing signature rows")
    minhashCandidatesAgainst(
      minhashSignatures(newDocs, idCol, textCol, k, shingleN),
      minhashSignatures(corpus, idCol, textCol, k, shingleN),
      bands, k / bands)
  }

  /** MinHash + LSH near-dup pairs, end to end. `maxBucketSize` is the
    * hot-bucket guard (see [[minhashCandidates]]). */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, shingleN: Int = 3, bands: Int = 4,
      maxBucketSize: Option[Int] = None): DataFrame = {
    require(k % bands == 0,
      s"bands ($bands) must divide k ($k): k/bands truncation would " +
        "silently ignore trailing signature rows")
    minhashCandidates(minhashSignatures(df, idCol, textCol, k, shingleN),
      bands, k / bands, maxBucketSize)
  }

  /**
   * Estimated Jaccard for LSH candidate pairs from the MinHash
   * signatures themselves — the scale path that never builds posting
   * lists: each candidate pair costs k signature-position comparisons
   * instead of a posting-list intersection, with E[estimate] = true
   * Jaccard and σ = √(J(1−J)/k). Signature frame is reused for the
   * banding and both join sides (identical subplans — exchange reuse).
   */
  def minhashEstimatedJaccard(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, shingleN: Int = 3, bands: Int = 4): DataFrame = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val sig = minhashSignatures(df, idCol, textCol, k, shingleN)
    val cand = minhashCandidates(sig, bands, k / bands)
    val a = sig.select(col("id").as("doc_a") +:
      (0 until k).map(i => col(s"mh_$i").as(s"__a$i")): _*)
    val b = sig.select(col("id").as("doc_b") +:
      (0 until k).map(i => col(s"mh_$i").as(s"__b$i")): _*)
    cand.join(a, "doc_a").join(b, "doc_b")
      .withColumn("est_jaccard",
        (0 until k)
          .map(i => when(col(s"__a$i") === col(s"__b$i"), 1).otherwise(0))
          .reduce(_ + _) / lit(k.toDouble))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
  }

  /**
   * Scale-path MinHash+LSH: xxhash64 with per-permutation seeds instead
   * of salted md5 — ~10× cheaper per shingle and 8-byte signature
   * elements instead of 32-char digests, at the cost of oracle
   * portability (DuckDB has no xxhash64). Same banding structure and
   * statistical guarantees; the preferred variant at 100 TB.
   */
  def minhashLshFast(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, shingleN: Int = 3, bands: Int = 4): DataFrame = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val sh = shingles(df, idCol, textCol, shingleN, distinct = false)
    val mins = (0 until k).map(i => min(xxhash64(lit(i), col("s"))).as(s"mh_$i"))
    val sig = sh.groupBy("id").agg(mins.head, mins.tail: _*)
    val rowsPerBand = k / bands
    val banded = sig.select(
      col("id"),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          xxhash64((0 until rowsPerBand)
            .map(r => col(s"mh_${b * rowsPerBand + r}")): _*).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
  }

  /**
   * Exact n-gram Jaccard pairs ≥ threshold. Candidate generation by
   * shared-shingle join (inverted index), intersection by count, union by
   * |A|+|B|−|A∩B|. Quadratic only within a shingle's posting list.
   */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8,
      maxPostings: Int = 1000): DataFrame = {
    // Shingle strings collapse to xxhash64 longs before the distinct —
    // every downstream shuffle moves 8-byte keys instead of ~25-char
    // strings (collision odds at 2^64 are ~n²/2⁶⁵, irrelevant here).
    // Intersections come from posting lists (groupBy shingle →
    // sorted id list → in-place ordered-pair expansion): ONE shuffle of
    // the shingle frame instead of a two-sided self-join shuffle.
    // Skew/stop-list: shingles whose document frequency exceeds
    // `maxPostings` are dropped from the universe — BEFORE collect_list,
    // so an ultra-common n-gram ("the quick brown" at corpus scale)
    // never materializes a giant posting array or a quadratic pair
    // expansion. Jaccard is then defined over the capped shingle sets;
    // the oracle applies the identical HAVING cap. The df-filter join
    // reuses the same sk-hash shuffle as the posting-list groupBy.
    val sh = shingles(df, idCol, textCol, n, distinct = false)
      .select(col("id"), xxhash64(col("s")).as("sk")).distinct()
    // document frequency via an sk-partitioned window: rides the same
    // sk-hash shuffle the posting-list groupBy needs anyway (no extra
    // exchange), and WindowExec spills oversized groups to disk — the
    // hot shingle is counted and discarded without ever being collected
    val wdf = Window.partitionBy("sk")
    val shk = sh
      .withColumn("__df", count(lit(1)).over(wdf))
      .where(col("__df") <= maxPostings)
      .drop("__df")
    // single posting-list aggregation feeds BOTH the pair expansion and
    // the per-doc sizes — its two consumers share an identical subplan
    // up to the aggregate, so the sk-shuffle is planned once
    // (ReuseExchange) and no session-lifetime cache is needed
    val posts = shk.groupBy("sk")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
    val sizes = posts.select(explode(col("ids")).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_sh"))
    val ids = col("ids")
    val inter = posts
      .where(size(ids) > 1)
      .select(explode(flatten(transform(ids, (a, i) =>
        transform(slice(ids, i + lit(2), size(ids) - i - lit(1)),
          b => struct(a.as("_1"), b.as("_2")))))).as("p"))
      .groupBy(col("p._1").as("doc_a"), col("p._2").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
      .join(sizes.withColumnRenamed("id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /**
   * Train/benchmark decontamination: n-gram containment of each
   * benchmark document inside training documents — the "is eval data
   * leaked into the training set" check. containment(t, b) =
   * |shingles(t) ∩ shingles(b)| / |shingles(b)| over the capped shingle
   * sets. Same inverted-index shape as [[ngramJaccardPairs]]: join on
   * 8-byte shingle hashes, count per (train, bench) pair; the per-side
   * document-frequency cap (sk-window, same shuffle as the join) bounds
   * the da×db pair fan-out of corpus-common n-grams.
   */
  def ngramContainment(train: DataFrame, trainId: String, trainText: String,
      bench: DataFrame, benchId: String, benchText: String,
      n: Int = 3, threshold: Double = 0.5,
      maxPostings: Int = 1000): DataFrame = {
    def capped(df: DataFrame, id: String, text: String, as: String) = {
      val sh = shingles(df, id, text, n, distinct = false)
        .select(col("id").as(as), xxhash64(col("s")).as("sk")).distinct()
      val wdf = Window.partitionBy("sk")
      sh.withColumn("__df", count(lit(1)).over(wdf))
        .where(col("__df") <= maxPostings).drop("__df")
    }
    val sa = capped(train, trainId, trainText, "train_id")
    val sb = capped(bench, benchId, benchText, "bench_id")
    val sizes = sb.groupBy("bench_id").agg(count(lit(1)).as("__nb"))
    sa.join(sb, "sk")
      .groupBy("train_id", "bench_id").agg(count(lit(1)).as("inter"))
      .join(sizes, "bench_id")
      .withColumn("containment", col("inter") / col("__nb"))
      .where(col("containment") >= threshold)
      .select(col("train_id"), col("bench_id"), col("containment"))
  }

  /**
   * Within-corpus asymmetric containment: pairs (super_id, sub_id)
   * where containment(sub ⊂ super) = |sh(super) ∩ sh(sub)| / |sh(sub)|
   * ≥ threshold, self-pairs excluded — the near-SUPERSET detector for
   * quote-expansion / boilerplate-wrapped duplicates whose smaller
   * member a symmetric Jaccard threshold never flags. Same DF-capped
   * posting-list discipline as [[ngramContainment]], but the capped
   * shingle frame is built ONCE and localCheckpointed (it feeds both
   * join sides and the size frame — corpus-vs-corpus through the
   * two-sided API would shingle the whole corpus twice).
   */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5,
      maxPostings: Int = 1000): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n, distinct = false)
      .select(col("id"), xxhash64(col("s")).as("sk")).distinct()
    val wdf = Window.partitionBy("sk")
    val k = sh.withColumn("__df", count(lit(1)).over(wdf))
      .where(col("__df") <= maxPostings).drop("__df")
      .localCheckpoint() // 3 readers: both join sides + sizes
    val sizes = k.groupBy(col("id").as("sub_id"))
      .agg(count(lit(1)).as("__nb"))
    k.select(col("id").as("super_id"), col("sk"))
      .join(k.select(col("id").as("sub_id"), col("sk")), "sk")
      .where(col("super_id") =!= col("sub_id"))
      .groupBy("super_id", "sub_id").agg(count(lit(1)).as("inter"))
      .join(sizes, "sub_id")
      .withColumn("containment", col("inter") / col("__nb"))
      .where(col("containment") >= threshold)
      .select(col("super_id"), col("sub_id"), col("containment"))
  }

  /**
   * Blocked fuzzy matching — entity-resolution dedup for SHORT strings
   * (names, titles, product labels) where token-set methods are too
   * coarse: pairs within `maxDist` Levenshtein edits, generated only
   * INSIDE blocks (the classic blocking-key design — all-pairs edit
   * distance across a corpus is quadratic and unshardable). The
   * default block key is the string's first token; callers pass any
   * blocker (soundex, length band, sorted-bigram key) matched to their
   * notion of candidate recall — a pair split across blocks is
   * deliberately unseen, that's the trade that makes it scale.
   *
   * Within a block: self-join on the block key with `id_a < id_b`,
   * `length`-difference prefilter (a cheap codegen'd bound: edit
   * distance ≥ length gap, so unequal-length pairs skip the O(mn)
   * Levenshtein), then the exact distance.
   *
   * Skew: a hot block (every row named "the …") goes quadratic, so the
   * CANDIDATE (`id_b`) side is capped by DEFAULT at `maxBlock` rows per
   * block via the [[graft.ops.Similarity.thinBuckets]] md5 threshold —
   * blocks at or under the cap are bit-exact untouched (the threshold
   * exceeds the hash range), oversized blocks keep a deterministic
   * ~`maxBlock`-row candidate subset, and per-block work drops from
   * O(pop²) to O(pop · maxBlock). The query (`id_a`) side is never
   * thinned, so every string is still compared against candidates
   * ([[graft.ops.Similarity.lshSelfKnn]] makes the same trade). Pass
   * `maxBlock <= 0` for exhaustive blocks; block population is exactly
   * what [[graft.ops.SkewAware.keySkewProfile]] reports, and any
   * external replay (an oracle) must mirror the active cap's md5
   * threshold.
   *
   * Corpora repeat values: DEDUPE TO DISTINCT STRINGS FIRST
   * (`groupBy(strCol).agg(min(id))`) and match the name table — the
   * comparison space becomes vocabulary-bounded instead of
   * corpus-quadratic, and the pair map re-applies to rows by key.
   * q97 demonstrates exactly this shape.
   */
  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 2,
      blockKey: Column => Column = s => split(s, " ").getItem(0),
      maxBlock: Int = 10000): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val a = df.select(col(idCol).as("id_a"), col(strCol).as("__sa"),
      blockKey(col(strCol)).as("__bk"))
    val b0 = df.select(col(idCol).as("id_b"), col(strCol).as("__sb"),
      blockKey(col(strCol)).as("__bk"))
    val b = if (maxBlock <= 0) b0
            else Similarity.thinBuckets(b0, "__bk", "id_b", maxBlock)
    a.join(b, Seq("__bk"))
      .where(col("id_a") < col("id_b"))
      .where(abs(length(col("__sa")) - length(col("__sb"))) <= maxDist)
      .withColumn("edit_dist", levenshtein(col("__sa"), col("__sb")))
      .where(col("edit_dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("edit_dist"))
  }

  /**
   * N-gram novelty scoring (Lee et al., "Deduplicating Training Data
   * Makes Language Models Better" §5 memorization lens, inverted):
   * what share of a document's DISTINCT n-grams never appear in a
   * reference corpus? High novelty = genuinely new text; near-zero =
   * re-hashed reference content. The complement of decontamination
   * ([[bloomDecontaminate]] flags ANY overlap; this measures the
   * overlap RATE per doc).
   *
   * Scale shape: both sides reduce to distinct n-gram frames; the
   * score is one n-gram-keyed LEFT join (the reference side carries
   * one row per DISTINCT gram — vocabulary-bounded, not corpus-
   * bounded) and a doc-keyed count rollup. Returns
   * (idCol, n_ngrams, n_seen, novelty = 1 − seen/total).
   */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String, n: Int = 3): DataFrame = {
    val docGrams = shingles(df, idCol, textCol, n)
    val refGrams = shingles(
      ref.select(lit(0L).as("__rid"), col(refTextCol)),
      "__rid", refTextCol, n)
      .select(col("s"), lit(1L).as("__seen")).distinct()
    docGrams.join(refGrams, Seq("s"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(coalesce(col("__seen"), lit(0L))).as("n_seen"))
      .withColumn("novelty",
        lit(1.0) - col("n_seen").cast("double") / col("n_ngrams"))
      .withColumnRenamed("id", idCol)
  }

  /**
   * Sorted-neighborhood blocking (Hernández–Stolfo merge/purge): order
   * records by a sort key and emit exactly the pairs within `window`
   * positions of each other — the classic entity-resolution candidate
   * generator when a good equi-block key doesn't exist but a sortable
   * proxy (amount, timestamp, numeric-encoded name key) does. Output
   * is every pair with 1 ≤ rank(b) − rank(a) ≤ window, carrying both
   * ids, both sort keys, the rank gap, and `carryCols` as `<c>_a`/
   * `<c>_b` for the caller's comparator
   * ([[graft.functions.StringSimilarity.jaroWinkler]], `levenshtein`).
   *
   * Scale shape: the global rank is NOT a single-partition window —
   * it is (rows with smaller key) + (same-key rows with smaller id),
   * both from [[graft.analysis.PrefixSum]] bucketed passes, so ties
   * are id-broken deterministically and any engine's
   * `row_number() OVER (ORDER BY key, id) − 1` replays it. The pair
   * join is rank-bucket equi-keyed (bucket = ⌊rank/window⌋, right side
   * exploded to its own and previous bucket — each row joins ≤ 2
   * buckets), so work is O(n · window / bucket) per task, never a
   * cross join. `sortCol` and `idCol` must be numeric (PrefixSum's
   * bucket-boundary contract); map string keys through a dictionary
   * frame first.
   */
  def sortedNeighborhood(df: DataFrame, idCol: String, sortCol: String,
      window: Int, carryCols: Seq[String] = Nil): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val base = df.select(
      col(idCol).as("__id") +: col(sortCol).cast("double").as("__k") +:
        carryCols.map(col): _*)
      .where(col("__k").isNotNull)
    // global rank of the distinct key = exclusive prefix of key counts
    val keyCounts = base.groupBy(col("__k")).agg(count(lit(1)).as("__n"))
    val starts = graft.analysis.PrefixSum
      .exclusive(keyCounts, "__k", Seq("__n" -> "__start"))
      .drop("__n")
    // within-key rank by id (grouped prefix of ones)
    val ranked = graft.analysis.PrefixSum
      .exclusive(base.withColumn("__one", lit(1L)), "__id",
        Seq("__one" -> "__rik"), groupCols = Seq("__k"))
      .join(starts, Seq("__k"))
      .withColumn("__rank", col("__start") + col("__rik"))
      .drop("__one", "__rik", "__start")
    val a = ranked.select(
      col("__id").as("id_a") +: col("__k").as("key_a") +:
        (col("__rank") / window).cast("long").as("__b") +:
        col("__rank").as("__ra") +:
        carryCols.map(c => col(c).as(s"${c}_a")): _*)
    val b = ranked.select(
      col("__id").as("id_b") +: col("__k").as("key_b") +:
        explode(array((col("__rank") / window).cast("long"),
          (col("__rank") / window).cast("long") - 1)).as("__b") +:
        col("__rank").as("__rb") +:
        carryCols.map(c => col(c).as(s"${c}_b")): _*)
    a.join(b, Seq("__b"))
      .where(col("__rb") > col("__ra") &&
        col("__rb") - col("__ra") <= window)
      .withColumn("rank_gap", (col("__rb") - col("__ra")).cast("long"))
      .drop("__b", "__ra", "__rb")
  }

  /**
   * Bloom-prefiltered corpus decontamination — the 100 TB shape of the
   * "does any eval n-gram appear in this training document" check
   * (GPT-3 App. C / PaLM-style dirty-document flagging; cf. the
   * containment variant [[ngramContainment]], which scores per
   * (train, bench) PAIR — this op flags per train doc against the
   * whole reference set).
   *
   * Two stages, exact result:
   *  1. a Bloom filter over the distinct reference n-grams is built by
   *     the native `BloomFilterAggregate` (partial map-side combine →
   *     one binary buffer; no driver-side loop) and probed on the
   *     training side as a codegen'd `BloomFilterMightContain` over a
   *     scalar subquery — the exact machinery Spark's
   *     InjectRuntimeFilter uses for runtime row-group filters. The
   *     probe is MAP-ONLY: the training corpus never shuffles on
   *     content, only its bloom-surviving candidate n-grams do.
   *  2. candidates (true hits + ≈fpp·|train grams| false positives) are
   *     confirmed by an exact semi-join against the reference n-grams,
   *     so the bloom only PRUNES — the output is exact and
   *     oracle-verifiable regardless of fpp.
   *
   * Sizing: `numBits` follows the standard −n·ln(p)/ln²2 formula,
   * clamped to Spark's runtime-filter caps
   * (`spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`maxNumBits`,
   * 4M items / 64Mbit ≈ 8 MB defaults — raise both for a 100 TB
   * reference set; past the clamp the filter degrades to a higher
   * effective fpp, never to wrong answers). An EMPTY reference set
   * yields a NULL bloom, `might_contain` returns NULL, and every
   * document reports 0 dirty n-grams — correct, not an error.
   *
   * Returns one row per training document:
   * (idCol, dirty_ngrams = exact count of its distinct n-grams that
   * appear anywhere in the reference corpus, contaminated = >0).
   *
   * Cost note: the reference n-gram frame is derived TWICE per action
   * (once inside the bloom-build subquery, once as the confirm-join
   * side) — inherent to returning a lazy frame. The reference is the
   * small side by definition (an eval suite vs a training corpus); if
   * yours is large, `.persist()` the ref n-grams upstream and call the
   * [[graft.streaming.StreamingDecontaminate]] build-once literal path,
   * which computes them exactly once.
   */
  def bloomDecontaminate(train: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String, n: Int = 8,
      expectedItems: Long = 4000000L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftShims
    val refGrams = distinctGrams(ref, refTextCol, n)
    val (items, bits) = bloomSizing(train, expectedItems, fpp)
    val bloom = refGrams.agg(bloomAgg(items, bits).as("bf"))
    val candidates = shingles(train, idCol, textCol, n, distinct = true)
      .where(bloomProbe(GraftShims.toExpression(bloom.scalar())))
    confirmAndCount(train, idCol, candidates, refGrams)
  }

  /** Distinct word n-grams of a whole frame (no per-doc identity). */
  private[graft] def distinctGrams(df: DataFrame, textCol: String,
      n: Int): DataFrame =
    shingles(df.select(monotonically_increasing_id().as("__rid"),
        col(textCol).as("__rt")),
      "__rid", "__rt", n, distinct = false)
      .select("s").distinct()

  /** (items, numBits) clamped to Spark's runtime-filter caps. */
  private[graft] def bloomSizing(df: DataFrame, expectedItems: Long,
      fpp: Double): (Long, Long) = {
    val conf = df.sparkSession.conf
    val maxItems = conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000")
      .toLong
    val maxBits = conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864")
      .toLong
    val items = math.max(1L, math.min(expectedItems, maxItems))
    val bits = math.max(64L, math.min(
      org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(items, fpp),
      maxBits))
    (items, bits)
  }

  /** Native distributed bloom build over an arbitrary LONG hash
    * column ([[bloomAgg]] keeps the n-gram `s` convention). */
  private[graft] def bloomAggOver(hashCol: Column, items: Long,
      bits: Long): Column = {
    import org.apache.spark.sql.GraftShims
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    GraftShims.toColumn(new BloomFilterAggregate(
      GraftShims.toExpression(hashCol),
      Literal(items), Literal(bits)).toAggregateExpression())
  }

  /** Native distributed bloom build over the `s` column. */
  private[graft] def bloomAgg(items: Long, bits: Long): Column =
    bloomAggOver(xxhash64(col("s")), items, bits)

  /** Codegen'd might-contain of a LONG hash column against a bloom
    * binary expression (scalar subquery or literal). */
  private[graft] def bloomProbeOver(
      bloomExpr: org.apache.spark.sql.catalyst.expressions.Expression,
      hashCol: Column): Column = {
    import org.apache.spark.sql.GraftShims
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    GraftShims.toColumn(new BloomFilterMightContain(bloomExpr,
      GraftShims.toExpression(hashCol)))
  }

  /** Codegen'd might-contain probe of `s` against a bloom binary
    * expression (scalar subquery or literal). */
  private[graft] def bloomProbe(
      bloomExpr: org.apache.spark.sql.catalyst.expressions.Expression)
      : Column =
    bloomProbeOver(bloomExpr, xxhash64(col("s")))

  /** Exact confirm join + per-document dirty-gram counts (0 for clean). */
  private[graft] def confirmAndCount(train: DataFrame, idCol: String,
      candidates: DataFrame, refGrams: DataFrame): DataFrame = {
    val counts = candidates.join(refGrams, Seq("s"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("dirty_ngrams"))
    train.select(col(idCol))
      .join(counts.withColumnRenamed("id", "__cid"),
        col(idCol) === col("__cid"), "left")
      .select(col(idCol),
        coalesce(col("dirty_ngrams"), lit(0L)).as("dirty_ngrams"),
        (coalesce(col("dirty_ngrams"), lit(0L)) > 0).as("contaminated"))
  }

  /**
   * Connected components over an undirected pair list (near-dup edges →
   * duplicate clusters) by iterative min-label propagation: every vertex
   * starts as its own component, then repeatedly adopts the minimum
   * label among itself and its neighbors until a fixpoint (≤ graph
   * diameter rounds — near-dup clusters are shallow, so typically 2-4).
   * Each round is one join + one min-aggregate, all distributed; the
   * only driver-side state is the per-round changed-label count used
   * for early exit. Returns (id, component), component = min id in the
   * component. Deterministic.
   */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val e = edges.select(col(aCol).as("__a"), col(bCol).as("__b"))
      .unionByName(
        edges.select(col(bCol).as("__a"), col(aCol).as("__b")))
      .distinct()
      .cache()
    // init = identity fused with the first propagation round:
    // component(v) = min(v, min neighbor) — complete-subgraph clusters
    // (the common near-dup shape) then converge in one confirm round.
    // Each further round combines one neighbor-hop with POINTER
    // DOUBLING (adopt your component's own component), so a chain of
    // length L converges in O(log L) rounds, not L. Convergence is a
    // changed-row count against the previous labels — works for any id
    // type (string hashes included). Non-convergence within `maxIter`
    // throws rather than returning silently-split clusters.
    // localCheckpoint per round truncates the logical plan — the
    // doubling join references the round's labels TWICE, so without
    // truncation the plan tree grows exponentially with rounds.
    // Convergence = max over a per-row changed flag carried through the
    // round itself (works for any id type, string hashes included).
    var labels = e.groupBy(col("__a").as("id"))
      .agg(least(col("__a"), min(col("__b"))).as("component"))
      .localCheckpoint()
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      val prev = labels
      val prop = e.join(labels.withColumnRenamed("id", "__a"), "__a")
        .select(col("__b").as("id"), col("component"))
      val viaNbr = labels.unionByName(prop)
        .groupBy("id").agg(min(col("component")).as("component"))
      val half = viaNbr
        .withColumnRenamed("id", "__cid")
        .withColumnRenamed("component", "__cc")
      val next = viaNbr
        .join(half, viaNbr("component") === col("__cid"), "left")
        .select(viaNbr("id"),
          least(viaNbr("component"),
            coalesce(col("__cc"), viaNbr("component"))).as("component"))
      // change detection FUSED into the round: prev's label joins in
      // before the checkpoint materializes, so convergence costs one
      // narrow agg over the already-materialized blocks — not the
      // former second join + count() pass over both label frames.
      // (id sets are identical every round: init covers every vertex.)
      val flagged = next
        .join(prev.withColumnRenamed("component", "__old"), "id")
        .select(col("id"), col("component"),
          (col("component") =!= col("__old")).cast("int").as("__chg"))
        .localCheckpoint()
      converged = flagged
        .agg(coalesce(max(col("__chg")), lit(0)))
        .collect()(0).getInt(0) == 0
      labels = flagged.drop("__chg")
      // flagged is materialized (eager localCheckpoint), so prev's
      // blocks are no longer needed; best-effort release here, and the
      // ContextCleaner reclaims checkpoint RDDs once unreferenced
      prev.unpersist()
      i += 1
    }
    e.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint in $maxIter rounds")
    labels
  }

  /**
   * Duplicate clusters for a whole corpus: every id gets a cluster
   * (pair-free rows are their own singleton cluster) and the minimum id
   * per cluster is flagged representative — the "keep one copy" step of
   * a dedup pipeline.
   */
  def dedupClusters(df: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b")
      : DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("id", idCol)
    df.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("component"), col(idCol)))
      .withColumn("is_representative", col(idCol) === col("cluster"))
      .select(col(idCol), col("cluster"), col("is_representative"))
  }

  /**
   * Canonical-document selection over near-dup clusters: for every
   * cluster from [[dedupClusters]]-shaped input, the kept (canonical)
   * document is the one maximizing `scoreCol` (ties → lowest id) — the
   * "keep the longest copy" policy of C4/RefinedWeb-style cleaning,
   * where the min-id representative of the connected component is an
   * arbitrary graph artifact, not the best text.
   *
   * One window per cluster (clusters are near-dup groups — small by
   * construction; a pathological giant cluster is a dedup-threshold
   * problem upstream, not a partitioning problem here). Output keeps
   * every input row with its `canonical_id` and a `keep` flag, so the
   * caller can either filter (`keep`) or map ids (redirect references).
   */
  def canonicalPerCluster(clusters: DataFrame, docs: DataFrame,
      idCol: String, scoreCol: String): DataFrame = {
    val w = Window.partitionBy("cluster")
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    clusters
      .join(docs.select(col(idCol), col(scoreCol)), Seq(idCol))
      .withColumn("canonical_id", first(col(idCol)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("keep", col(idCol) === col("canonical_id"))
      .select(col(idCol), col("cluster"), col("canonical_id"), col("keep"))
  }

  /**
   * Persisted cluster-assignment store — the production shape of every
   * per-action cluster consumer. Pair generation + connected components
   * is the expensive derivation; a pipeline runs it ONCE, writes the
   * (id, cluster, is_representative) frame, and every downstream action
   * — canonical selection, reference remapping, join-time dup filters —
   * READS the store instead of recomputing the graph per action. Same
   * amortization pattern as the MinHash signature store consumed by
   * [[minhashCandidatesAgainst]]: heavy derivation materialized at
   * ingestion, consumers O(read). Parquet keeps the store
   * engine-portable and partition-prunable.
   */
  def writeClusterStore(df: DataFrame, idCol: String, pairs: DataFrame,
      path: String, aCol: String = "doc_a", bCol: String = "doc_b"): Unit =
    dedupClusters(df, idCol, pairs, aCol, bCol)
      .write.mode("overwrite").parquet(path)

  /** Canonical selection against a PERSISTED cluster store: cost is
    * one store read + the per-cluster window — no pair generation, no
    * connected components ([[writeClusterStore]] paid those once). */
  def canonicalFromStore(storePath: String, docs: DataFrame,
      idCol: String, scoreCol: String): DataFrame =
    canonicalPerCluster(docs.sparkSession.read.parquet(storePath), docs,
      idCol, scoreCol)

  /**
   * C4-style repeated-passage removal: split every document into fixed
   * `chunkTokens`-word chunks ([[TextAnalysis.chunk]], zero overlap),
   * count how many DISTINCT documents contain each chunk text across
   * the corpus, and drop every chunk occurring in `maxDocs` or more —
   * boilerplate (headers, footers, license blocks) repeats across
   * documents; unique prose does not. Surviving chunks are reassembled
   * in document order.
   *
   * Scale design: the corpus-wide count groups by `xxhash64(chunk)` —
   * an 8-byte shuffle key, never the chunk text (same stance as
   * [[exact]]); the hot-chunk frame (chunks in ≥ maxDocs docs) is the
   * join side and is SMALL by definition — boilerplate cardinality,
   * not corpus cardinality. Reassembly is a per-document
   * `collect_list` bounded by document size. One shuffle to count, one
   * to join, one to reassemble.
   */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, maxDocs: Long): DataFrame =
    dedupOverChunks(TextAnalysis.chunk(df, idCol, textCol, chunkTokens, 0),
      idCol, maxDocs)

  /** The shared hot-chunk pipeline behind [[chunkDedup]] (fixed
    * windows) and [[cdcChunkDedup]] (content-defined): corpus-wide
    * distinct-doc counts keyed on the 8-byte chunk hash, hot chunks
    * dropped, survivors reassembled in document order. */
  private[graft] def dedupOverChunks(ch0: DataFrame, idCol: String,
      maxDocs: Long): DataFrame = {
    val ch = ch0.withColumn("__h", xxhash64(col("chunk_text")))
    val hot = ch.groupBy("__h")
      .agg(count_distinct(col(idCol)).as("__docs"))
      .where(col("__docs") >= maxDocs)
      .select(col("__h"), lit(true).as("__hot"))
    ch.join(hot, Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        coalesce(sum(when(col("__hot"), lit(1L))), lit(0L)).as("n_dropped"),
        // collect_list skips the NULLs the `when` leaves on hot chunks,
        // so only kept chunks are gathered; struct sort restores
        // document order before the join back to text
        array_join(transform(
          array_sort(collect_list(when(col("__hot").isNull,
            struct(col("chunk_id"), col("chunk_text"))))),
          s => s.getField("chunk_text")), " ").as("clean_text"))
  }

  /**
   * Content-defined chunking (CDC) at word granularity — the FastCDC
   * insight applied to text: a chunk starts wherever the word's
   * portable hash ≡ 0 (mod `divisor`), so boundaries are a function of
   * CONTENT, not offsets. Insert or delete a word and only the
   * neighboring chunk changes — under fixed windows every downstream
   * chunk shifts and re-hashes, defeating cross-version/cross-document
   * chunk matching. Average chunk ≈ `divisor` words.
   *
   * Map-only per document: the token array is projected ONCE (the
   * shingles O(n²) trap), boundary positions come from one `filter`
   * over positions, chunks from one indexed `transform` + `slice`.
   * The md5-based hash replays in any engine ([[graft.functions.PortableHash]]
   * contract). Returns (idCol, chunk_id, chunk_text).
   */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      divisor: Int = 8): DataFrame = {
    require(divisor >= 2, "divisor must be >= 2")
    val tokenized = df.select(col(idCol), split(col(textCol), " ").as("__w"))
    val w = col("__w")
    def wordHash(word: Column) =
      pmod(conv(substring(md5(word), 1, 13), 16, 10).cast("long"),
        lit(divisor.toLong))
    val starts = filter(sequence(lit(1), size(w)),
      i => (i === 1) || (wordHash(element_at(w, i)) === 0L))
    val withStarts = tokenized.withColumn("__st", starts)
    val chunks = transform(col("__st"), (s, j) =>
      struct(j.as("chunk_id"),
        concat_ws(" ", slice(w, s,
          // try_: the last chunk has no successor — ANSI element_at
          // would throw INVALID_ARRAY_INDEX instead of yielding NULL
          coalesce(try_element_at(col("__st"), j + 2), size(w) + 1) - s))
          .as("chunk_text")))
    withStarts.select(col(idCol), explode(chunks).as("__c"))
      .select(col(idCol), col("__c.chunk_id").as("chunk_id"),
        col("__c.chunk_text").as("chunk_text"))
  }

  /** [[chunkDedup]] over content-defined chunks: boilerplate removal
    * that keeps matching across insertions/deletions. */
  def cdcChunkDedup(df: DataFrame, idCol: String, textCol: String,
      divisor: Int = 8, maxDocs: Long = 3): DataFrame =
    dedupOverChunks(cdcChunks(df, idCol, textCol, divisor), idCol, maxDocs)

  /**
   * Exact duplicated-substring SPANS (the Lee et al. "Deduplicating
   * Training Data Makes Language Models Better" shape, at n-gram
   * resolution): every position whose n-gram occurs in `minDocs`+
   * distinct documents is duplicated; runs of overlapping/adjacent
   * duplicated grams merge into maximal `[span_start, span_end]` token
   * intervals per document — the spans a cleaning pipeline cuts out,
   * rather than dropping whole documents.
   *
   * Scale design: grams shuffle by their 8-byte `xxhash64` (the [[exact]]
   * stance — position payload, never gram text, crosses the exchange);
   * the duplicated-gram frame joins back on the same key; span merging
   * is a per-DOCUMENT window (partitioned by id — bounded by document
   * length, nothing corpus-global). Two keyed shuffles + one
   * doc-partitioned window, any corpus size.
   */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minDocs: Long = 2): DataFrame = {
    val toked = df
      .select(col(idCol).as("id"), split(col(textCol), " ").as("__w"))
    val w = col("__w")
    val grams = toked.where(size(w) >= n)
      .select(col("id"), posexplode(transform(
        sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*)))
        .as(Seq("__p0", "__g")))
      .select(col("id"), (col("__p0") + 1).cast("long").as("pos"),
        xxhash64(col("__g")).as("__h"))
    val dup = grams.groupBy("__h")
      .agg(count_distinct(col("id")).as("__docs"))
      .where(col("__docs") >= minDocs)
      .select("__h")
    val wOrd = Window.partitionBy("id").orderBy("pos")
    // grams at p < q overlap or touch while q <= p + n ⇒ same span
    grams.join(dup, "__h")
      .withColumn("__new",
        when(col("pos") - lag(col("pos"), 1).over(wOrd) > n, 1)
          .otherwise(lit(0))) // first row: NULL lag ⇒ 0 ⇒ span 0
      .withColumn("__span", sum(col("__new")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("id").as(idCol), col("__span"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (n - 1)).as("span_end"))
      .withColumn("span_tokens", col("span_end") - col("span_start") + 1)
      .select(col(idCol), col("span_start"), col("span_end"),
        col("span_tokens"))
  }

  /**
   * SemDeDup-style semantic dedup (Abbas et al. 2023): k-means cells
   * over the embedding space are the blocking key, cosine pairs are
   * computed only WITHIN a cell, and a document is dropped when any
   * LOWER-id document in its cell sits above the similarity threshold
   * — the deterministic greedy keep (min-id wins; transitive chains
   * resolve in id order, so the result is engine-replayable, unlike
   * random-order greedy scans). Train the cells with `roundDp > 0` to
   * make the whole pipeline replayable ([[Similarity.kmeansCentroids]]).
   *
   * Scale: assignment is map-only; the pair join is cell-blocked (the
   * O(cell²) concern is governed by the cell count — SemDeDup runs
   * ~100k cells at web scale precisely so cells stay small). Above
   * `cellThreshold` cells, training and assignment switch to the
   * DataFrame-resident coarse→fine path
   * ([[Similarity.kmeansCentroidsDF]]) so no driver-side collect or
   * plan literal scales with the cell count; the pair/keep logic is
   * identical in both regimes.
   */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      cells: Int, iters: Int = 1, roundDp: Int = 6,
      threshold: Double = 0.7,
      cellThreshold: Int = Similarity.defaultCellThreshold): DataFrame = {
    val tagged =
      if (cells > cellThreshold) {
        val idx = Similarity.kmeansCentroidsDF(df, idCol, vecCol, cells,
          iters, roundDp)
        Similarity.assignCellsDF(df, idCol, vecCol, idx)
          .where(col("__cell").isNotNull)
      } else {
        val cents = Similarity.kmeansCentroids(df, idCol, vecCol, cells,
          iters, roundDp)
        Similarity.assignCells(df, vecCol, cents)
      }
    val assigned = tagged
      .select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v"),
        col("__cell").cast("long").as("cell"))
      .withColumn("nrm", VectorFunctions.norm(col("v")))
    val a = assigned.select(col("id").as("id_a"), col("v").as("va"),
      col("nrm").as("na"), col("cell"))
    val b = assigned.select(col("id").as("id_b"), col("v").as("vb"),
      col("nrm").as("nb"), col("cell"))
    val flagged = a.join(b, Seq("cell"))
      .where(col("id_a") < col("id_b"))
      .where(VectorFunctions.dot(col("va"), col("vb")) /
        (col("na") * col("nb")) >= threshold)
      .select(col("id_b").as("id")).distinct()
      .withColumn("__dup", lit(true))
    assigned.join(flagged, Seq("id"), "left")
      .select(col("id").as(idCol), col("cell"),
        col("__dup").isNull.as("keep"))
  }

  /**
   * SimHash fingerprint (16 bits): per-token md5 hex digits 1..16, each
   * digit's parity votes ±1 on one bit; fingerprint bit = majority sign.
   * Deterministic and engine-portable (string ops + md5 only).
   */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Two conv() calls turn the first 16 md5 hex digits into two 32-bit
    // ints; each digit's parity is then one shift+mask instead of a
    // locate+substring pass over the digest string. Same votes as the
    // oracle's strpos formulation (digit parity == low bit of the nibble).
    val toks = shingles(df, idCol, textCol, 1)
      .withColumn("h", md5(col("s")))
      .withColumn("h1", conv(substring(col("h"), 1, 8), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(col("h"), 9, 8), 16, 10).cast("long"))
    val votes = (1 to 16).map { j =>
      val nib =
        if (j <= 8) shiftright(col("h1"), 4 * (8 - j))
        else shiftright(col("h2"), 4 * (16 - j))
      sum(nib.bitwiseAND(lit(1L)) * 2 - 1).as(s"v_$j")
    }
    val agg = toks.groupBy("id").agg(votes.head, votes.tail: _*)
    agg.select(
      col("id"),
      concat((1 to 16).map(j =>
        when(col(s"v_$j") >= 0, "1").otherwise("0")): _*).as("simhash"))
  }

  /**
   * Embedding near-dup: cosine ≥ threshold within a blocking column
   * (label / LSH bucket / IVF cell). Block-local self-join — all-pairs
   * only inside a block, never across the corpus.
   *
   * `maxBlock > 0` bounds a skewed block's pair count the same way
   * [[Similarity.lshSelfKnn]] caps hot LSH buckets: deterministic
   * hash-threshold thinning (blocks at or under the cap untouched;
   * oversized blocks reduced to a ~`maxBlock` subset on BOTH pair
   * sides, so the block's pairs go from O(pop²) to O(maxBlock²)). A
   * documented recall trade for hot blocks — off by default because
   * near-DUP detection, unlike top-k ANN, may genuinely need every
   * pair; enable it when the caller's blocking key is skewed.
   */
  /**
   * Embedding-space decontamination: flag TRAIN documents semantically
   * close (cosine ≥ `threshold`) to ANY eval/benchmark item — the
   * paraphrase-leak screen that n-gram decontamination
   * ([[decontaminate]]) misses. Returns one row per contaminated train
   * doc: (train id, n_eval_hits, max_cos, worst eval id, deterministic
   * min-id among ties).
   *
   * Scale shape: eval suites are small (10³–10⁵ rows) while train is
   * the 100 TB side — so eval is BROADCAST (norms precomputed once)
   * and the train side stays map-only: one codegen'd dot product per
   * (train, eval) pair, no shuffle of train content at all. The
   * per-row cost is |eval|·d multiplies — for larger eval suites,
   * pre-filter candidates with [[Similarity.lshKnn]] banding first;
   * this operator is the exact-scoring stage.
   */
  def embeddingDecontaminate(train: DataFrame, eval: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val t = train.select(col(idCol).as("train_id"),
      col(vecCol).cast("array<double>").as("vt"),
      VectorFunctions.norm(col(vecCol)).as("nt"))
    val e = eval.select(col(idCol).as("eval_id"),
      col(vecCol).cast("array<double>").as("ve"),
      VectorFunctions.norm(col(vecCol)).as("ne"))
    t.join(broadcast(e))
      .withColumn("cos",
        VectorFunctions.dot(col("vt"), col("ve")) / (col("nt") * col("ne")))
      .where(col("cos") >= threshold)
      // struct-max argmax: highest cos, MIN eval id among exact ties
      // (requires a numeric eval id) — deterministic, single agg pass
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_eval_hits"),
        max(struct(col("cos").as("c"), (-col("eval_id")).as("ni")))
          .as("__m"))
      .select(col("train_id"), col("n_eval_hits"),
        col("__m.c").as("max_cos"), (-col("__m.ni")).as("worst_eval_id"))
  }

  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double, maxBlock: Int = 0): DataFrame = {
    // pre-cast to double and precompute each vector's norm ONCE — the
    // pairwise stage then does a single dot product per pair (3× less
    // vector math than recomputing both norms per pair)
    val prepped0 = df.select(col(idCol).as("id"), col(blockCol).as("blk"),
      col(vecCol).cast("array<double>").as("v"),
      VectorFunctions.norm(col(vecCol)).as("nrm"))
    val prepped = if (maxBlock <= 0) prepped0
                  else Similarity.thinBuckets(prepped0, "blk", "id", maxBlock)
    val a = prepped.select(col("id").as("id_a"), col("blk"),
      col("v").as("va"), col("nrm").as("na"))
    val b = prepped.select(col("id").as("id_b"), col("blk"),
      col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("blk"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos",
        VectorFunctions.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("cos") >= threshold)
      .select(col("blk"), col("id_a"), col("id_b"), col("cos"))
  }

  /**
   * Cross-source exact-duplicate matrix: for every source pair, how
   * many DISTINCT texts appear in both — the mixture-hygiene readout
   * behind "crawl B is 30% a re-crawl of A" (corpus-level dedup
   * tells you the duplicate count; this tells you which source pairs
   * to fix). Texts are compared by md5 (engine-replayable; collision
   * odds irrelevant at report scale). Returns one row per unordered
   * pair: (source_a, source_b, docs_a, docs_b, shared_texts,
   * overlap_a = shared/docs_a, overlap_b).
   *
   * Scale shape: the corpus reduces to the distinct (hash, source)
   * frame; the pair counts come from a hash-keyed self-join of that
   * frame — per-hash work is ≤ |sources|², never corpus².
   */
  def crossSourceDuplicates(df: DataFrame, srcCol: String,
      textCol: String): DataFrame = {
    val hs = df.select(col(srcCol).as("__s"),
        md5(col(textCol)).as("__h"))
      .where(col("__h").isNotNull)
      .distinct().localCheckpoint()
    val sizes = hs.groupBy("__s").agg(count(lit(1)).as("__d"))
      .localCheckpoint()
    hs.as("a")
      .join(hs.select(col("__s").as("__s2"), col("__h")), Seq("__h"))
      .where(col("__s") < col("__s2"))
      .groupBy(col("__s"), col("__s2"))
      .agg(count(lit(1)).as("shared_texts"))
      .join(broadcast(sizes), Seq("__s"))
      .join(broadcast(sizes.select(col("__s").as("__s2"),
        col("__d").as("__d2"))), Seq("__s2"))
      .select(col("__s").as("source_a"), col("__s2").as("source_b"),
        col("__d").as("docs_a"), col("__d2").as("docs_b"),
        col("shared_texts"),
        (col("shared_texts").cast("double") / col("__d"))
          .as("overlap_a"),
        (col("shared_texts").cast("double") / col("__d2"))
          .as("overlap_b"))
  }

  /**
   * Fellegi–Sunter probabilistic record-linkage scoring (Fellegi &
   * Sunter 1969) over blocked candidate pairs: for each within-block
   * pair and each comparison field f with match/unmatch probabilities
   * (m_f, u_f), agreement contributes log₂(m_f/u_f) and disagreement
   * log₂((1−m_f)/(1−u_f)); the summed weight classifies the pair
   * against the (lower, upper] thresholds into non_match / possible /
   * match — the canonical entity-resolution decision rule. Fields are
   * caller-NORMALIZED columns (name prefixes, phone bands, rounded
   * amounts …) compared by null-safe equality; m/u come from training
   * pairs or domain priors. Returns (id_a, id_b, n_agree, weight,
   * decision) with id_a < id_b.
   *
   * Scale shape: candidate generation is the [[fuzzyPairs]] discipline
   * — a block-keyed equi-join with the candidate side capped per block
   * by the deterministic md5 threshold (`maxBlock`; ≤-cap blocks are
   * untouched bit-exact, oversized ones keep a ~maxBlock-row subset;
   * `maxBlock <= 0` = exhaustive). The weight is pure map-side column
   * algebra over the pair frame — no window, no driver state.
   */
  def fellegiSunter(df: DataFrame, idCol: String, blockCol: String,
      fields: Seq[(String, Double, Double)], upper: Double,
      lower: Double, maxBlock: Int = 10000): DataFrame = {
    require(fields.nonEmpty, "fellegiSunter: no comparison fields")
    require(upper >= lower, "fellegiSunter: upper >= lower")
    fields.foreach { case (f, m, u) =>
      require(m > 0 && m < 1 && u > 0 && u < 1,
        s"fellegiSunter: m/u for '$f' must be in (0,1)")
    }
    val names = fields.map(_._1)
    val a = df.select(col(idCol).as("id_a") +: col(blockCol).as("__bk")
      +: names.map(c => col(c).as(s"__a_$c")): _*)
    val b0 = df.select(col(idCol).as("id_b") +: col(blockCol).as("__bk")
      +: names.map(c => col(c).as(s"__b_$c")): _*)
    val b = if (maxBlock <= 0) b0
            else Similarity.thinBuckets(b0, "__bk", "id_b", maxBlock)
    val ln2 = math.log(2.0)
    val weight = fields.map { case (f, m, u) =>
      when(col(s"__a_$f") <=> col(s"__b_$f"),
        lit(math.log(m / u) / ln2))
        .otherwise(lit(math.log((1 - m) / (1 - u)) / ln2))
    }.reduce(_ + _)
    val agree = names.map(f =>
      when(col(s"__a_$f") <=> col(s"__b_$f"), 1L).otherwise(0L))
      .reduce(_ + _)
    a.join(b, Seq("__bk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), agree.as("n_agree"),
        weight.as("weight"),
        when(weight > upper, "match")
          .when(weight > lower, "possible")
          .otherwise("non_match").as("decision"))
  }
  /**
   * Chapman capture–recapture estimate of a corpus' TRUE unique-item
   * count from two overlapping capture lists (two crawls, two dedup
   * passes, two vendor feeds): N̂ = (n₁+1)(n₂+1)/(m+1) − 1 with the
   * standard variance — the "how many unique documents exist that
   * NEITHER crawl saw" readout a raw union count can't give (assumes
   * captures are independent and uniform; correlated crawls bias N̂
   * low, stated in every wildlife textbook and true for crawls too).
   * `inA`/`inB` mark each row's list membership; items are distinct
   * `keyCol` values. Returns ONE row: (n_a, n_b, n_overlap, n_union,
   * chapman_estimate, se, unseen_estimate).
   *
   * Scale shape: one distinct-key groupBy with two conditional max
   * flags, one 1-row reduce.
   */
  def chapmanOverlap(df: DataFrame, keyCol: String, inA: Column,
      inB: Column): DataFrame = {
    val per = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("__k"))
      .agg(max(when(inA, 1.0).otherwise(0.0)).as("__a"),
        max(when(inB, 1.0).otherwise(0.0)).as("__b"))
      .where(col("__a") + col("__b") > 0)
    per.agg(sum(col("__a")).as("__n1"), sum(col("__b")).as("__n2"),
        sum(col("__a") * col("__b")).as("__m"),
        count(lit(1)).cast("double").as("__u"))
      .select(col("__n1").cast("long").as("n_a"),
        col("__n2").cast("long").as("n_b"),
        col("__m").cast("long").as("n_overlap"),
        col("__u").cast("long").as("n_union"),
        ((col("__n1") + 1) * (col("__n2") + 1) / (col("__m") + 1) - 1)
          .as("chapman_estimate"),
        sqrt((col("__n1") + 1) * (col("__n2") + 1) *
          (col("__n1") - col("__m")) * (col("__n2") - col("__m")) /
          (pow(col("__m") + 1, 2.0) * (col("__m") + 2))).as("se"))
      .withColumn("unseen_estimate",
        greatest(round(col("chapman_estimate") - col("n_union"), 6),
          lit(0.0)))
  }

  /**
   * MinHash accuracy audit: on the LSH candidate pairs, compare the
   * signature-estimated Jaccard against the EXACT shingle Jaccard,
   * bucketed by the estimate — the calibration read that answers "can
   * I trust a 0.8 signature threshold", i.e. the tuning input for
   * [[minhashLsh]]'s band/row and threshold choices before a corpus
   * run. Exact intersections are computed ONLY for candidate pairs
   * (bucketed LSH discipline — never all-pairs).
   * Returns per estimate-bucket: (bucket, est_lo, n_pairs, avg_est,
   * avg_exact, mae).
   */
  def minhashAccuracyAudit(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, shingleN: Int = 3, bands: Int = 4,
      buckets: Int = 5): DataFrame = {
    require(buckets >= 1 && buckets <= 100,
      "minhashAccuracyAudit: buckets in 1..100")
    val est = minhashEstimatedJaccard(df, idCol, textCol, k, shingleN,
        bands)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
      .localCheckpoint()
    val sh = shingles(df, idCol, textCol, shingleN).localCheckpoint()
    val sizes = sh.groupBy("id").agg(count(lit(1)).cast("double").as("__sz"))
    val inter = est.select("doc_a", "doc_b")
      .join(sh.select(col("id").as("doc_a"), col("s")), Seq("doc_a"))
      .join(sh.select(col("id").as("doc_b"), col("s")), Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).cast("double").as("__i"))
    val exact = est.join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0.0, Seq("__i"))
      .join(sizes.select(col("id").as("doc_a"), col("__sz").as("__sa")),
        Seq("doc_a"))
      .join(sizes.select(col("id").as("doc_b"), col("__sz").as("__sb")),
        Seq("doc_b"))
      .select(col("est_jaccard"),
        (col("__i") / (col("__sa") + col("__sb") - col("__i")))
          .as("__ex"))
    exact
      .groupBy(least(floor(col("est_jaccard") * buckets),
        lit(buckets - 1L)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        avg(col("est_jaccard")).as("avg_est"),
        avg(col("__ex")).as("avg_exact"),
        avg(abs(col("est_jaccard") - col("__ex"))).as("mae"))
      .withColumn("est_lo", col("bucket").cast("double") / buckets)
      .select(col("bucket"), col("est_lo"), col("n_pairs"),
        col("avg_est"), col("avg_exact"), col("mae"))
  }

  /**
   * Cross-source n-gram containment matrix: for each ordered source
   * pair, what fraction of A's distinct n-grams also occur in B — the
   * corpus-level contamination/recycling read ([[crossSourceDuplicates]]
   * catches whole-document copies; this catches PASSAGE-level reuse
   * between sources before train/eval splits are cut along them).
   *
   * Scale shape: one distinct (source, gram) pass; the pair counts
   * come from a gram-keyed self-join whose per-gram fan-out is bounded
   * by the (small) source count; sizes broadcast back. Returns ordered
   * pairs: (src_a, src_b, grams_a, grams_shared, containment).
   */
  def crossSourceNgramContainment(df: DataFrame, groupCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    val grams = df
      .where(col(groupCol).isNotNull && col(textCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"), col(textCol))
      .transform(d => shingles(d, "__g", textCol, n))
      .localCheckpoint()
    val sizes = grams.groupBy(col("id").as("__ga"))
      .agg(count(lit(1)).cast("double").as("__sz"))
    val shared = grams.as("a")
      .join(grams.as("b"),
        col("a.s") === col("b.s") && col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("src_a"), col("b.id").as("src_b"))
      .agg(count(lit(1)).as("grams_shared"))
    shared
      .join(broadcast(sizes), col("src_a") === col("__ga"))
      .select(col("src_a"), col("src_b"),
        col("__sz").cast("long").as("grams_a"), col("grams_shared"),
        (col("grams_shared") / col("__sz")).as("containment"))
  }
}
