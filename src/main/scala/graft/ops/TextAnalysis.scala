package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines: token counting,
 * quality scoring, language ID, document fingerprinting. All are map-only
 * column expressions (no shuffle) except fingerprint dedup's final
 * groupBy — they scale embarrassingly.
 */
object TextAnalysis {

  /** whitespace tokens */
  private def words(text: Column): Column = split(text, " ")

  /**
   * Per-document statistics + a composite quality score in [0, 1]:
   * rewards medium length, penalizes very short docs and low lexical
   * diversity (type-token ratio).
   */
  def textStats(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val w = words(t)
    df.withColumn("n_chars_calc", length(t))
      .withColumn("n_words", size(w))
      .withColumn("n_distinct_words", size(array_distinct(w)))
      .withColumn("avg_word_len",
        (length(t) - (size(w) - 1)).cast("double") / size(w))
      .withColumn("ttr", size(array_distinct(w)) / size(w).cast("double"))
      .withColumn("quality_score",
        round(least(size(w) / lit(50.0), lit(1.0)) * lit(0.5)
          + (size(array_distinct(w)) / size(w).cast("double")) * lit(0.5), 6))
  }

  /** Common-word marker lists per language (tiny, embedded). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "est", "que"))

  /**
   * N-gram-free heuristic language ID: count marker-word hits per
   * language; the max wins, ties/zero → 'und'. (A real n-gram model is a
   * drop-in replacement — the plumbing, a map-only score + argmax, is
   * identical.)
   */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    // distinct tokens: array_intersect/list_intersect dedup semantics then
    // agree across engines (counting distinct marker hits)
    val w = array_distinct(words(col(textCol)))
    val scored = langMarkers.toSeq.sortBy(_._1).foldLeft(df) {
      case (d, (lang, markers)) =>
        d.withColumn(s"hits_$lang",
          size(array_intersect(w, array(markers.map(lit): _*))))
    }
    val langs = langMarkers.keys.toSeq.sorted
    val best = langs.map(l => col(s"hits_$l")).reduce((a, b) => greatest(a, b))
    scored.withColumn("predicted_lang",
      when(best <= 0, "und").otherwise(
        // first language (alphabetical) achieving the max — deterministic
        langs.foldRight(lit("und")) { (l, acc) =>
          when(col(s"hits_$l") === best, l).otherwise(acc)
        }))
  }

  /**
   * Token counting: whitespace tokens plus a BPE-ish regex tokenizer
   * (letter runs / digit runs / single other chars) — the standard
   * pre-tokenization shape.
   */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("ws_tokens", size(split(t, " ")))
      .withColumn("bpe_ish_tokens",
        size(expr(s"regexp_extract_all($textCol, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)")))
  }

  /**
   * Gopher-style repetition statistics — the standard "remove
   * machine-generated / boilerplate text" signals of an LLM data
   * pipeline (cf. Rae et al. 2021, §A1.1 repetition filters):
   *
   *  - `distinct_word_ratio`: type-token ratio (low ⇒ repetitive);
   *  - `top_bigram_frac`: occurrences of the single most frequent
   *    bigram over all bigram occurrences (high ⇒ one phrase loops);
   *  - `dup_bigram_frac`: fraction of bigram occurrences whose bigram
   *    appears more than once (high ⇒ pervasive near-loops).
   *
   * Shuffles are keyed by (doc, gram) then doc — per-document
   * aggregation state only, nothing corpus-global, so the operator
   * scales with the corpus like every other text op here. Documents
   * with fewer than 2 words report NULL bigram fractions (no bigram
   * population). NULL text yields no row; EMPTY text splits to one
   * empty-string token (`split`/`string_split` semantics in both
   * engines) and reports n_words = 1 — filter empties upstream if they
   * must be distinguished.
   */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val uni = Dedup.shingles(df, idCol, textCol, 1, distinct = false)
    val uniAgg = uni.groupBy("id").agg(
      count(lit(1)).as("n_words"),
      count_distinct(col("s")).as("__dw"))
    val biCounts = Dedup.shingles(df, idCol, textCol, 2, distinct = false)
      .groupBy("id", "s").agg(count(lit(1)).as("__c"))
    val biAgg = biCounts.groupBy("id").agg(
      sum(col("__c")).as("__bt"),
      max(col("__c")).as("__bm"),
      sum(when(col("__c") > 1, col("__c")).otherwise(lit(0L))).as("__bd"))
    uniAgg.join(biAgg, Seq("id"), "left")
      .select(col("id").as(idCol),
        col("n_words"),
        round(col("__dw") / col("n_words").cast("double"), 6)
          .as("distinct_word_ratio"),
        round(col("__bm") / col("__bt").cast("double"), 6)
          .as("top_bigram_frac"),
        round(col("__bd") / col("__bt").cast("double"), 6)
          .as("dup_bigram_frac"))
  }

  /**
   * Gopher-style STRUCTURAL quality gate — the non-repetition half of
   * corpus filtering (the repetition half is [[repetitionStats]]): word
   * count bounds, mean word length bounds, minimum alphabetic-word
   * fraction, and minimum distinct-stopword hits (natural language
   * contains function words; keyword spam and code dumps mostly don't).
   * One map-only projection per document — every signal is computed
   * from the token array in a single codegen'd pass, no shuffle.
   *
   * Defaults follow the published Gopher rules where they transfer
   * (mean word length 3–10, ≥2 distinct stopwords, ≥80% alphabetic
   * words) with the word-count floor lowered to 20 (Gopher's 50 targets
   * web pages). `pass` is the conjunction; callers wanting the reasons
   * keep the component columns.
   */
  def qualityFlags(df: DataFrame, idCol: String, textCol: String,
      minWords: Long = 20, maxWords: Long = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minStopHits: Int = 2, minAlphaFrac: Double = 0.8,
      stopwords: Seq[String] = langMarkers("en")): DataFrame = {
    val t = col(textCol)
    val w = words(t)
    val n = size(w)
    // identical formula to textStats: total chars minus separators
    val meanLen = (length(t) - (n - 1)).cast("double") / n
    val stopHits = size(array_intersect(array_distinct(w),
      array(stopwords.map(lit): _*)))
    val alphaFrac = size(filter(w, x => x.rlike("^[A-Za-z]+$")))
      .cast("double") / n
    df.select(col(idCol),
      n.cast("long").as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      stopHits.cast("long").as("stop_hits"),
      round(alphaFrac, 6).as("alpha_frac"),
      (n.between(minWords, maxWords) &&
        meanLen.between(minMeanWordLen, maxMeanWordLen) &&
        stopHits >= minStopHits && alphaFrac >= minAlphaFrac).as("pass"))
  }

  /**
   * Gate-yield waterfall over the [[qualityFlags]] gates: for each
   * gate in the FIXED pipeline order (word_count → mean_word_len →
   * stopword_hits → alpha_frac), how many documents fail it
   * MARGINALLY (ignoring the others) and how many survive the
   * pipeline CUMULATIVELY through it — the mixture-planning readout
   * that says which gate actually costs corpus, and whether gates
   * overlap (marginal ≫ cumulative drop) or bite independently.
   * Returns one row per gate:
   * (gate_order, gate, n_fail_marginal, n_pass_cumulative,
   * yield_share). One conditional-aggregation scan; the 4-row output
   * explodes a literal struct array off the 1-row reduce.
   */
  def gateWaterfall(df: DataFrame, textCol: String,
      minWords: Long = 20, maxWords: Long = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minStopHits: Int = 2, minAlphaFrac: Double = 0.8,
      stopwords: Seq[String] = langMarkers("en")): DataFrame = {
    val t = col(textCol)
    val w = words(t)
    val n = size(w)
    val meanLen = (length(t) - (n - 1)).cast("double") / n
    val stopHits = size(array_intersect(array_distinct(w),
      array(stopwords.map(lit): _*)))
    val alphaFrac = size(filter(w, x => x.rlike("^[A-Za-z]+$")))
      .cast("double") / n
    val gates: Seq[(String, Column)] = Seq(
      "word_count" -> n.between(minWords, maxWords),
      "mean_word_len" -> meanLen.between(minMeanWordLen, maxMeanWordLen),
      "stopword_hits" -> (stopHits >= minStopHits),
      "alpha_frac" -> (alphaFrac >= minAlphaFrac))
    val cums = gates.scanLeft(lit(true)) { case (acc, (_, c)) => acc && c }
      .tail
    val aggs = count(lit(1)).cast("double").as("__total") +:
      gates.zipWithIndex.map { case ((_, c), i) =>
        sum(when(!c, 1L).otherwise(0L)).as(s"__f$i")
      } ++: cums.zipWithIndex.map { case (c, i) =>
        sum(when(c, 1L).otherwise(0L)).as(s"__c$i")
      }
    val m = df.where(t.isNotNull).agg(aggs.head, aggs.tail: _*)
    val rows = gates.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(i + 1).as("gate_order"), lit(name).as("gate"),
        col(s"__f$i").as("n_fail_marginal"),
        col(s"__c$i").as("n_pass_cumulative"),
        (col(s"__c$i") / col("__total")).as("yield_share"))
    }
    m.select(explode(array(rows: _*)).as("__r")).select("__r.*")
  }

  /**
   * Content fingerprint: md5 of the sorted distinct word set — robust to
   * word order and duplication; groups near-identical (bag-of-words-
   * equal) documents.
   */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(text, " ")))))

  /** Fingerprint dedup: keeper id + copy count per word-set group. */
  def fingerprintDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select("fp", "keeper_id", "n_copies")

  /**
   * Fixed-size token chunking with overlap — the context-window
   * preprocessing step: doc → ⌈(n−chunk)/stride⌉+1 chunks of
   * `chunkTokens` whitespace tokens, consecutive chunks sharing
   * `overlap` tokens; the final chunk keeps the overhang. Map-only
   * (tokenize once, per-chunk slices of the SAME projected array — no
   * O(words²) re-evaluation), output fan-out = Σ chunks.
   */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val toked = df.select(col(idCol),
      split(col(textCol), " ").as("__w"))
    val n = size(col("__w"))
    val nChunks = when(n <= chunkTokens, lit(1L)).otherwise(
      ceil((n - lit(chunkTokens)).cast("double") / stride).cast("long") + 1L)
    toked
      .select(col(idCol),
        posexplode(transform(sequence(lit(0L), nChunks - 1),
          i => slice(col("__w"), (i * stride + 1).cast("int"),
            lit(chunkTokens))))
          .as(Seq("chunk_id", "__c")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        concat_ws(" ", col("__c")).as("chunk_text"),
        size(col("__c")).cast("long").as("n_tokens"))
  }

  /**
   * PII preset patterns for [[redact]] (regex dialect restricted to the
   * RE2 ∩ Java-regex subset, so the same pattern text runs in Spark,
   * DuckDB, and most scrubbing engines).
   */
  val piiPresets: Map[String, String] = Map(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\+?[0-9][0-9 ()./-]{6,}[0-9]",
    "ipv4" -> "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b",
    "ssn" -> "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b")

  /**
   * Pattern redaction (PII scrubbing): each (pattern, replacement) pair
   * is applied in order to the text; `n_redactions` counts matches of
   * every pattern against the ORIGINAL text (so counts are independent
   * of application order). Map-only — two codegen'd regex passes per
   * pattern, no shuffle.
   */
  def redact(df: DataFrame, textCol: String,
      patterns: Seq[(String, String)],
      outCol: String = "redacted"): DataFrame = {
    val redacted = patterns.foldLeft(col(textCol)) { (c, p) =>
      regexp_replace(c, p._1, p._2)
    }
    val nRed = patterns
      .map(p => regexp_count(col(textCol), lit(p._1)))
      .reduce(_ + _)
    df.withColumn(outCol, redacted)
      .withColumn("n_redactions", nRed.cast("long"))
  }

  /** Scrub all [[piiPresets]], each replaced by `<UPPERCASE_NAME>`.
    * Specific patterns run before general ones (ssn/ipv4 before phone,
    * whose digit-run pattern would otherwise swallow them). */
  def redactPii(df: DataFrame, textCol: String,
      outCol: String = "redacted"): DataFrame =
    redact(df, textCol,
      Seq("email", "ssn", "ipv4", "phone")
        .map(k => piiPresets(k) -> s"<${k.toUpperCase}>"),
      outCol)

  /**
   * Per-(doc, term) TF-IDF: tf = term count / doc length, idf =
   * ln(N / doc-frequency), score = tf·idf.
   *
   * Scale design: one explode + two keyed aggregations (by (doc, term)
   * and by term); N and the per-doc lengths are aggregate frames joined
   * back (doc-length shuffle-joined by doc, term df by term, scalar N
   * broadcast). No window over raw tokens anywhere.
   */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(words(col(textCol))).as("term"))
    val tc = toks.groupBy("id", "term").agg(count(lit(1)).as("cnt"))
    val dl = tc.groupBy("id").agg(sum(col("cnt")).as("doc_len"))
    val dfreq = tc.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    tc.join(dl, "id").join(dfreq, "term").join(broadcast(n))
      .select(col("id"), col("term"),
        ((col("cnt") / col("doc_len")) *
          log(col("n_docs") / col("doc_freq"))).as("tfidf"))
  }

  /**
   * BM25 top-k retrieval (Robertson/Sparck Jones; the standard
   * full-text relevance score — cf. reference search surface
   * `raise_/models/feature_group.py:520-560` search_features, which the
   * reference implements as substring match only). Okapi formula with
   * the +1 idf smoothing (Lucene's variant, always positive):
   *
   *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
   *   idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))
   *
   * Scale shape: the ONLY corpus-sized shuffle is the (doc, term)
   * count over query-matching tokens — the token array is filtered to
   * the query vocabulary BEFORE the explode, so the exploded frame is
   * O(matches), not O(corpus tokens). Doc length rides along from a
   * map-only `size(words)` (no join-back against a corpus-sized length
   * frame), N + avgdl are one 1-row broadcast aggregate, per-term df is
   * a ≤|query|-row broadcast. Top-k is TakeOrdered (no global sort).
   * Both engines order by the ROUNDED score with an id tiebreak, so the
   * k-boundary is deterministic under fp noise.
   */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    val w = words(col(textCol))
    val qlit = array(queryTerms.distinct.map(lit): _*)
    val base = df.select(col(idCol).as("id"),
      size(w).cast("double").as("dl"),
      filter(w, t => array_contains(qlit, t)).as("__qw"))
    val stats = broadcast(base.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl")))
    val tf = base.where(size(col("__qw")) > 0)
      .select(col("id"), col("dl"), explode(col("__qw")).as("term"))
      .groupBy("id", "term")
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    val dfreq = broadcast(
      tf.groupBy("term").agg(count(lit(1)).cast("double").as("df")))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val term = idf * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(dfreq, "term").join(stats)
      .groupBy("id").agg(round(sum(term), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("id").asc)
      .limit(k)
      .withColumnRenamed("id", idCol) // consistent operator surface
  }

  /**
   * Persisted inverted index for BM25 retrieval — the amortized
   * production shape of [[bm25TopK]] (which tokenizes the corpus per
   * query): postings (term, id, tf, dl) and corpus stats (N, avgdl)
   * are written ONCE as parquet; every query then reads only its
   * terms' postings — the term predicate lands in the parquet scan's
   * PushedFilters, so a query touches O(matching postings), never the
   * corpus. Same heavy-derivation-amortized pattern as the MinHash
   * signature store and the cluster store.
   */
  def writeSearchIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val w = words(col(textCol))
    val dir = path.stripSuffix("/")
    docs.select(col(idCol).as("id"), size(w).cast("double").as("dl"),
        explode(w).as("term"))
      .groupBy("term", "id")
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
      .write.mode("overwrite").parquet(s"$dir/postings")
    docs.select(size(w).cast("double").as("dl"))
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /**
   * Incremental index maintenance: append a NEW batch of documents to
   * a [[writeSearchIndex]] store without touching the existing
   * postings — O(batch) tokenization, one postings append, and a
   * 1-row weighted merge of the corpus stats (counts and mean compose
   * exactly, so the merged stats equal a full rebuild's). Batch ids
   * must be new (re-ingesting an id would double its postings — pair
   * with [[graft.streaming.StreamingDedup]]-style id screening at
   * ingestion). [[searchIndex]] results after an append are identical
   * to rebuilding over the concatenated corpus.
   */
  def appendToSearchIndex(newDocs: DataFrame, idCol: String,
      textCol: String, path: String): Unit = {
    val spark = newDocs.sparkSession
    val w = words(col(textCol))
    val dir = path.stripSuffix("/")
    newDocs.select(col(idCol).as("id"), size(w).cast("double").as("dl"),
        explode(w).as("term"))
      .groupBy("term", "id")
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
      .write.mode("append").parquet(s"$dir/postings")
    val old = spark.read.parquet(s"$dir/stats").head()
    val batch = newDocs.select(size(w).cast("double").as("dl"))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0.0))
        .as("s")).head()
    val n = old.getLong(0) + batch.getLong(0)
    val avgdl = (old.getDouble(1) * old.getLong(0) + batch.getDouble(1)) /
      math.max(n, 1L)
    import spark.implicits._
    // write-then-swap would be safer under concurrency; stats is a
    // 1-row frame and the writer-lock pattern (etl.ParquetTarget)
    // covers the contended case
    Seq((n, avgdl)).toDF("n_docs", "avgdl")
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** BM25 top-k against a [[writeSearchIndex]] store: scores are
    * IDENTICAL to [[bm25TopK]] over the original corpus — the index
    * just pre-pays tokenization and posting aggregation. */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queryTerms: Seq[String], k: Int = 10, k1: Double = 1.2,
      b: Double = 0.75, idCol: String = "id"): DataFrame = {
    require(queryTerms.nonEmpty, "searchIndex: empty query")
    val dir = path.stripSuffix("/")
    val postings = spark.read.parquet(s"$dir/postings")
      .where(col("term").isin(queryTerms.distinct: _*)) // pushed to scan
    val stats = broadcast(spark.read.parquet(s"$dir/stats"))
    val dfreq = broadcast(
      postings.groupBy("term").agg(count(lit(1)).cast("double").as("df")))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val term = idf * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    postings.join(dfreq, "term").join(stats)
      .groupBy("id").agg(round(sum(term), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("id").asc)
      .limit(k)
      .withColumnRenamed("id", idCol)
  }

  /**
   * PMI collocations: top bigrams by pointwise mutual information with
   * a minimum-count support threshold — the classic phrase-mining /
   * vocabulary-induction statistic (Church & Hanks 1990):
   *
   *   pmi(x,y) = ln( (c_xy/T_bi) / ((c_x/T_uni)·(c_y/T_uni)) )
   *
   * Adjacent pairs come from zipping the token array with its tail
   * (`slice`+`arrays_zip` — one map-only pass, no positional window
   * over exploded tokens). Two keyed aggregations (bigram counts,
   * unigram counts) are the only shuffles; corpus totals are a 1-row
   * broadcast; the unigram join is vocabulary-sized (≪ corpus), keyed
   * by each side of the bigram. min-count pruning applies BEFORE the
   * unigram joins so the joined frame is the reported support set, not
   * the full bigram tail. Ordered by rounded PMI with (x,y) tiebreak.
   */
  /**
   * Standard corpus text canonicalization — the normalization stage
   * BEFORE any hash-based dedup, so case/whitespace variants of the
   * same text collapse to one form (exact-dedup recall, fingerprint
   * stability): lowercase, control characters → space, whitespace runs
   * collapsed to single spaces, ends trimmed. One map-only codegen'd
   * projection; the same regexes replay in any engine with RE2∩Java
   * semantics (the [[redact]] portability contract).
   */
  def normalizeText(df: DataFrame, textCol: String,
      outCol: String = "norm_text"): DataFrame =
    df.withColumn(outCol,
      trim(regexp_replace(
        regexp_replace(lower(col(textCol)), "[\\x00-\\x1f\\x7f]", " "),
        "[ \\t\\n\\r]+", " ")))

  /**
   * Corpus-unigram log-likelihood scoring — the CCNet/KenLM
   * "perplexity filter" shape without an external language model: a
   * unigram LM with add-α smoothing is fit on `ref` and every document
   * of `df` is scored by its mean token log-probability (low = unlike
   * the reference corpus = boilerplate/noise/other-language; high =
   * fluent in-domain text). `ppl = exp(-avg_logprob)` is the familiar
   * per-token perplexity form.
   *
   *   P(w) = (c_ref(w) + α) / (N_ref + α·(V_ref + 1))
   *
   * with unseen-in-ref tokens falling to the +α floor (the "+1" slot).
   * Scale: token frequencies are one keyed aggregation on the ref; the
   * scoring join is keyed by term against that vocabulary frame (≪
   * corpus); N/V ride a 1-row broadcast. No driver-side model object —
   * the "LM" IS a DataFrame.
   */
  def unigramLogLikelihood(df: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String,
      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, "alpha must be positive for smoothing")
    val refToks = ref.select(explode(words(col(refTextCol))).as("term"))
    val vocab = refToks.groupBy("term").agg(count(lit(1)).as("__c"))
    val totals = broadcast(vocab.agg(sum(col("__c")).as("__n"),
      count(lit(1)).as("__v")))
    val toks = df.select(col(idCol).as("id"),
      explode(words(col(textCol))).as("term"))
    val scored = toks
      .join(vocab, Seq("term"), "left")
      .join(totals)
      .select(col("id"),
        log((coalesce(col("__c"), lit(0L)) + lit(alpha)) /
          (col("__n") + lit(alpha) * (col("__v") + lit(1)))).as("__lp"))
    scored.groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("__lp")), 6).as("avg_logprob"),
        round(exp(-avg(col("__lp"))), 6).as("ppl"))
      .withColumnRenamed("id", idCol)
  }

  /**
   * Per-group token-distribution diagnostics — the "how diverse is each
   * source/language slice" report a corpus-mixing decision reads:
   * Shannon entropy of the unigram distribution (nats), vocabulary
   * size, token count, and type-token ratio. Two keyed aggregations
   * ((group, term) counts, then per-group entropy fold) — no
   * driver-side vocabulary, any corpus size. High entropy = diverse
   * text; near-zero = templated/boilerplate-dominated slices that
   * temperature mixing ([[graft.ops.Sampling.temperatureMix]]) would
   * otherwise over-weight.
   */
  def tokenEntropy(df: DataFrame, groupCol: String, textCol: String)
      : DataFrame = {
    val counts = df
      .select(col(groupCol), explode(words(col(textCol))).as("term"))
      .groupBy(groupCol, "term").agg(count(lit(1)).as("__c"))
    val totals = counts.groupBy(groupCol)
      .agg(sum(col("__c")).as("__n"), count(lit(1)).as("vocab_size"))
    counts.join(totals, groupCol)
      .groupBy(groupCol)
      .agg(
        first(col("__n")).as("n_tokens"),
        first(col("vocab_size")).as("vocab_size"),
        round(-sum((col("__c") / col("__n")) *
          log(col("__c") / col("__n"))), 6).as("entropy"),
        round(first(col("vocab_size")) / first(col("__n")).cast("double"),
          6).as("type_token_ratio"))
  }

  /**
   * DSIR-style importance log-ratio (Xie et al. 2023, unigram variant):
   * per-document Σ_t [ln p_target(t) − ln p_raw(t)] under two add-α
   * unigram LMs — fit on a TARGET corpus (the domain you want more of)
   * and the RAW corpus itself. Documents with a positive ratio look
   * more like the target than like average raw text; selecting by
   * threshold (or feeding `exp(log_ratio)` into a weighted sampler)
   * is the importance-resampling step of domain-targeted data
   * selection.
   *
   * Scale: both "LMs" are vocabulary-sized DataFrames
   * ([[unigramLogLikelihood]]'s design); scoring is one token explode
   * with two vocabulary-keyed left joins and a per-doc sum — no model
   * object, no driver state.
   */
  def dsirLogRatio(df: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, "alpha must be positive for smoothing")
    def lm(ref: DataFrame, c: String, pfx: String) = {
      val vocab = ref.select(explode(words(col(c))).as("term"))
        .groupBy("term").agg(count(lit(1)).as(s"${pfx}c"))
      val tot = broadcast(vocab.agg(sum(col(s"${pfx}c")).as(s"${pfx}n"),
        count(lit(1)).as(s"${pfx}v")))
      (vocab, tot)
    }
    val (tv, tt) = lm(target, targetTextCol, "__t")
    val (rv, rt) = lm(df, textCol, "__r")
    def lp(pfx: String) =
      log((coalesce(col(s"${pfx}c"), lit(0L)) + lit(alpha)) /
        (col(s"${pfx}n") + lit(alpha) * (col(s"${pfx}v") + lit(1))))
    df.select(col(idCol).as("id"), explode(words(col(textCol))).as("term"))
      .join(tv, Seq("term"), "left")
      .join(rv, Seq("term"), "left")
      .join(tt).join(rt)
      .select(col("id"), (lp("__t") - lp("__r")).as("__d"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("__d")), 6).as("log_ratio"))
      .withColumnRenamed("id", idCol)
  }

  /**
   * Interpolated bigram-LM scoring — one order up from
   * [[unigramLogLikelihood]]: each document's mean log-probability of
   * `P(w_i|w_{i−1}) = λ·c(w_{i−1}w_i)/c(w_{i−1}) + (1−λ)·P_α(w_i)`
   * (Jelinek-Mercer interpolation with the add-α unigram as the
   * backoff floor, so unseen bigrams never zero out). Catches
   * word-salad text that fools a unigram model (right words, wrong
   * order). Scale shape unchanged from the unigram scorer: both count
   * frames are vocabulary-sized, document bigrams come from the
   * map-only zip of a token array with its tail, scoring is two keyed
   * joins + a per-doc mean. Documents with fewer than 2 tokens score
   * NULL.
   */
  def bigramLogLikelihood(df: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String, lambda: Double = 0.7,
      alpha: Double = 1.0): DataFrame = {
    require(lambda >= 0 && lambda <= 1, "lambda must be in [0,1]")
    require(alpha > 0, "alpha must be positive")
    def bigrams(frame: DataFrame, c: String, extra: Seq[String]) = {
      val w = words(col(c))
      frame.where(size(w) >= 2)
        .select(extra.map(col) :+ explode(arrays_zip(
          slice(w, lit(1), size(w) - 1).as("x"),
          slice(w, lit(2), size(w) - 1).as("y"))).as("p"): _*)
        .select(extra.map(col) :+ col("p.x").as("x") :+ col("p.y").as("y"): _*)
    }
    val refBi = bigrams(ref, refTextCol, Nil)
      .groupBy("x", "y").agg(count(lit(1)).as("__cxy"))
    val refUni = ref.select(explode(words(col(refTextCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("__ct"))
    val totals = broadcast(refUni.agg(sum(col("__ct")).as("__n"),
      count(lit(1)).as("__v")))
    val pUni = (coalesce(col("__cy_uni"), lit(0L)) + lit(alpha)) /
      (col("__n") + lit(alpha) * (col("__v") + lit(1)))
    val pBi = when(col("__cx_uni").isNotNull && col("__cxy").isNotNull,
      col("__cxy").cast("double") / col("__cx_uni"))
      .otherwise(lit(0.0))
    bigrams(df, textCol, Seq(idCol))
      .join(refBi, Seq("x", "y"), "left")
      .join(refUni.select(col("t").as("x"), col("__ct").as("__cx_uni")),
        Seq("x"), "left")
      .join(refUni.select(col("t").as("y"), col("__ct").as("__cy_uni")),
        Seq("y"), "left")
      .join(totals)
      .select(col(idCol),
        log(lit(lambda) * pBi + lit(1.0 - lambda) * pUni).as("__lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("__lp")), 6).as("avg_logprob"),
        round(exp(-avg(col("__lp"))), 6).as("ppl"))
  }

  def pmiBigrams(df: DataFrame, textCol: String,
      minCount: Long = 5, k: Int = 20): DataFrame = {
    val w = words(col(textCol))
    val toks = df.select(w.as("__w"))
    val bi = toks.where(size(col("__w")) >= 2)
      .select(explode(arrays_zip(
        slice(col("__w"), lit(1), size(col("__w")) - 1).as("x"),
        slice(col("__w"), lit(2), size(col("__w")) - 1).as("y"))).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
    val uni = toks.select(explode(col("__w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c_t"))
    val totBi = broadcast(bi.agg(sum(col("c_xy")).as("t_bi")))
    val totUni = broadcast(uni.agg(sum(col("c_t")).as("t_uni")))
    bi.where(col("c_xy") >= minCount)
      .join(uni.select(col("t").as("x"), col("c_t").as("c_x")), "x")
      .join(uni.select(col("t").as("y"), col("c_t").as("c_y")), "y")
      .join(totBi).join(totUni)
      .select(col("x"), col("y"), col("c_xy"),
        round(log((col("c_xy").cast("double") / col("t_bi")) /
          ((col("c_x").cast("double") / col("t_uni")) *
           (col("c_y").cast("double") / col("t_uni")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("x").asc, col("y").asc)
      .limit(k)
  }

  /**
   * Compression-ratio quality signal: deflate(level 6) bytes / raw
   * UTF-8 bytes per document. A well-known corpus-quality filter —
   * boilerplate and template spam compress far below prose (ratio
   * → 0), while encrypted/binary junk doesn't compress at all (ratio
   * → 1); curation keeps a middle band. Adds `outCol` (double; null
   * text → null, empty text → 1.0 by convention).
   *
   * Shape: a map-only `mapPartitions` kernel — one `Deflater` per
   * partition, `reset()` between rows (allocation-free steady state),
   * no shuffle, no per-row UDF closure serialization. Not
   * SQL-oracle-expressible (no deflate in the oracle engine), so
   * verification is scalatest: ordering properties + determinism.
   */
  def compressionRatio(df: DataFrame, textCol: String,
      outCol: String = "compression_ratio"): DataFrame = {
    val spark = df.sparkSession
    val idx = df.columns.indexOf(textCol)
    require(idx >= 0, s"no column $textCol")
    val outSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+
        org.apache.spark.sql.types.StructField(outCol,
          org.apache.spark.sql.types.DoubleType, nullable = true))
    val result = df.rdd.mapPartitions { it =>
      val deflater =
        new java.util.zip.Deflater(6, /*nowrap=*/ true)
      val buf = new Array[Byte](64 * 1024)
      it.map { row =>
        val ratio: Any =
          if (row.isNullAt(idx)) null
          else {
            val raw = row.getString(idx)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            if (raw.isEmpty) 1.0
            else {
              deflater.reset()
              deflater.setInput(raw)
              deflater.finish()
              var compressed = 0L
              while (!deflater.finished())
                compressed += deflater.deflate(buf)
              compressed.toDouble / raw.length
            }
          }
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ ratio)
      }
    }
    spark.createDataFrame(result, outSchema)
  }

  /**
   * Zipf's-law fit over the corpus term-frequency distribution: the
   * weighted OLS slope of log(frequency) on log(rank) — a healthy
   * natural-language corpus sits near −1; a flat slope flags
   * template/boilerplate-heavy data, a steep one flags tiny-vocabulary
   * spam. Returns ONE row: (n_terms, n_freq_levels, slope, intercept).
   *
   * Ranks are frequency-descending with ties sharing the AVERAGE rank
   * of their block ("rank-binned" fit — ties at frequency f are one
   * OLS point weighted by the tie count). That makes the statistic a
   * pure function of the frequency histogram: the corpus collapses to
   * one (frequency → term count) frame and the rank positions come
   * from a single [[PrefixSum.exclusive]] pass over it — no global
   * per-term sort, state bounded by DISTINCT frequency values (≪
   * vocabulary, by Zipf itself).
   */
  def zipfSlope(df: DataFrame, textCol: String): DataFrame = {
    val tf = df.select(explode(split(col(textCol), " ")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).cast("double").as("__f"))
    val fc = tf.groupBy("__f").agg(count(lit(1)).cast("double").as("__cnt"))
    val ranked = graft.analysis.PrefixSum
      .exclusive(fc.withColumn("__nf", -col("__f")), "__nf",
        Seq("__cnt" -> "__bef"))
      .select(log(col("__f")).as("__y"),
        log(col("__bef") + (col("__cnt") + 1) / 2.0).as("__x"),
        col("__cnt").as("__wgt"))
    ranked
      .agg(sum(col("__wgt")).as("__n"), count(lit(1)).as("n_freq_levels"),
        sum(col("__wgt") * col("__x")).as("__sx"),
        sum(col("__wgt") * col("__y")).as("__sy"),
        sum(col("__wgt") * col("__x") * col("__x")).as("__sxx"),
        sum(col("__wgt") * col("__x") * col("__y")).as("__sxy"))
      .select(col("__n").cast("long").as("n_terms"), col("n_freq_levels"),
        ((col("__sxy") - col("__sx") * col("__sy") / col("__n")) /
          (col("__sxx") - col("__sx") * col("__sx") / col("__n")))
          .as("slope"),
        ((col("__sy") - ((col("__sxy") - col("__sx") * col("__sy") /
          col("__n")) / (col("__sxx") - col("__sx") * col("__sx") /
          col("__n"))) * col("__sx")) / col("__n")).as("intercept"))
  }

  /**
   * Heaps'-law vocabulary-growth fit: V(n) ≈ K·n^β over per-document
   * checkpoints of (cumulative tokens n, cumulative vocabulary V) in
   * document-id order. β far from the 0.4–0.6 natural-text band flags
   * duplicated (low β) or noise/ID-heavy (β→1) corpora. Returns ONE
   * row: (n_docs, total_tokens, vocab, beta, k).
   *
   * "First occurrence" is a min(doc) per term — one keyed agg, no
   * order-sensitive scan; the cumulative checkpoints come from one
   * [[graft.analysis.PrefixSum.exclusive]] pass over the per-document
   * frame; the OLS of log V on log n runs over |docs| checkpoint rows.
   */
  def heapsLaw(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("__d"),
      explode(split(col(textCol), " ")).as("__w"))
    val perDoc = tok.groupBy("__d")
      .agg(count(lit(1)).cast("double").as("__tok"))
    val newTerms = tok.groupBy("__w").agg(min(col("__d")).as("__fd"))
      .groupBy(col("__fd").as("__d"))
      .agg(count(lit(1)).cast("double").as("__nw"))
    val per = perDoc.join(newTerms, Seq("__d"), "left")
      .na.fill(0.0, Seq("__nw"))
    val cum = graft.analysis.PrefixSum
      .exclusive(per, "__d", Seq("__tok" -> "__ct", "__nw" -> "__cv"))
      .select((col("__ct") + col("__tok")).as("__n"),
        (col("__cv") + col("__nw")).as("__v"))
    cum
      .agg(count(lit(1)).cast("double").as("__c"),
        max(col("__n")).as("__tt"), max(col("__v")).as("__vv"),
        sum(log(col("__n"))).as("__sx"), sum(log(col("__v"))).as("__sy"),
        sum(log(col("__n")) * log(col("__n"))).as("__sxx"),
        sum(log(col("__n")) * log(col("__v"))).as("__sxy"))
      .select(col("__c").cast("long").as("n_docs"),
        col("__tt").cast("long").as("total_tokens"),
        col("__vv").cast("long").as("vocab"),
        ((col("__sxy") - col("__sx") * col("__sy") / col("__c")) /
          (col("__sxx") - col("__sx") * col("__sx") / col("__c")))
          .as("beta"),
        exp((col("__sy") - ((col("__sxy") - col("__sx") * col("__sy") /
          col("__c")) / (col("__sxx") - col("__sx") * col("__sx") /
          col("__c"))) * col("__sx")) / col("__c")).as("k"))
  }

  /**
   * Term burstiness — the variance-to-mean ratio (index of dispersion)
   * of each term's per-document count ACROSS ALL documents, zeros
   * included: ≈1 for Poisson-scattered function words, ≫1 for bursty
   * topical terms (and for boilerplate that repeats inside few docs).
   * Returns one row per term with document frequency ≥ `minDf`:
   * (term, df, total_tf, mean_tf, vmr).
   *
   * The all-documents moments need no dense (term × doc) grid: with
   * S = Σ counts and SS = Σ counts² over OBSERVED (term, doc) cells,
   * mean = S/D and var = SS/D − mean² — zero cells contribute exactly
   * zero to both sums. All inputs are integer-valued, so mean/vmr are
   * bit-identical across engines (safe to ORDER BY). One (term, doc)
   * groupBy then one per-term agg; D is a 1-row broadcast.
   */
  def termBurstiness(df: DataFrame, idCol: String, textCol: String,
      minDf: Long = 5): DataFrame = {
    val tok = df.select(col(idCol).as("__d"),
      explode(split(col(textCol), " ")).as("__w"))
    val cells = tok.groupBy("__w", "__d")
      .agg(count(lit(1)).cast("double").as("__c"))
    val perTerm = cells.groupBy(col("__w").as("term"))
      .agg(count(lit(1)).as("df"), sum(col("__c")).as("__s"),
        sum(col("__c") * col("__c")).as("__ss"))
    perTerm.where(col("df") >= minDf)
      .join(broadcast(df.agg(
        countDistinct(col(idCol)).cast("double").as("__dd"))))
      .select(col("term"), col("df"),
        col("__s").cast("long").as("total_tf"),
        (col("__s") / col("__dd")).as("mean_tf"),
        ((col("__ss") / col("__dd") -
          (col("__s") / col("__dd")) * (col("__s") / col("__dd"))) /
          (col("__s") / col("__dd"))).as("vmr"))
  }

  /**
   * Jensen–Shannon divergence between the TERM distributions of two
   * corpus slices (sources, time windows, language buckets) — the
   * text-space analog of the numeric drift family: JS(P,Q) =
   * ½KL(P‖M) + ½KL(Q‖M), M = (P+Q)/2, natural-log units, bounded by
   * ln 2. Terms absent from one side contribute only through the
   * present side (p·ln(p/m) with q = 0) — no smoothing, the
   * divergence is exact for the observed vocabularies. Returns ONE
   * row: (n_terms_a, n_terms_b, n_terms_union, tokens_a, tokens_b,
   * js_divergence).
   *
   * Scale shape: two term-count aggregates full-outer-joined on term
   * (vocabulary-sized, shuffled by term), totals broadcast from 1-row
   * aggregates, one reduce — the corpus is scanned once per slice.
   */
  def termJsDivergence(df: DataFrame, textCol: String, groupCol: String,
      groupA: String, groupB: String): DataFrame = {
    def counts(g: String, out: String) =
      df.where(col(groupCol) === g)
        .select(explode(split(col(textCol), " ")).as("__w"))
        .groupBy("__w").agg(count(lit(1)).cast("double").as(out))
    val ca = counts(groupA, "__ca")
    val cb = counts(groupB, "__cb")
    // totals from the (vocabulary-sized) count frames, not a corpus
    // rescan — Spark reuses the aggregation exchange for both readers
    val joined = ca
      .join(cb, Seq("__w"), "full_outer")
      .na.fill(0.0, Seq("__ca", "__cb"))
      .join(broadcast(ca.agg(sum(col("__ca")).as("__tta"))))
      .join(broadcast(cb.agg(sum(col("__cb")).as("__ttb"))))
      .withColumn("__pa", col("__ca") / col("__tta"))
      .withColumn("__pb", col("__cb") / col("__ttb"))
      .withColumn("__m", (col("__pa") + col("__pb")) / 2.0)
    joined.agg(
        sum(when(col("__ca") > 0, lit(1L)).otherwise(lit(0L)))
          .as("n_terms_a"),
        sum(when(col("__cb") > 0, lit(1L)).otherwise(lit(0L)))
          .as("n_terms_b"),
        count(lit(1)).as("n_terms_union"),
        max(col("__tta")).cast("long").as("tokens_a"),
        max(col("__ttb")).cast("long").as("tokens_b"),
        (sum(when(col("__pa") > 0,
          col("__pa") * log(col("__pa") / col("__m"))).otherwise(lit(0.0)))
          / 2.0 +
          sum(when(col("__pb") > 0,
            col("__pb") * log(col("__pb") / col("__m"))).otherwise(lit(0.0)))
          / 2.0).as("js_divergence"))
  }

  /**
   * Vocabulary coverage quantiles: for each requested token-mass share
   * s, the smallest vocabulary size (taking terms most-frequent-first,
   * ties counted together) whose cumulative token mass reaches s·T.
   * The tokenizer-design statistic — "how many types cover 95% of the
   * corpus". Returns one row per share:
   * (share, vocab_size, total_vocab, total_tokens, coverage).
   *
   * All arithmetic is integer counts + one s·T product, so the
   * crossing-block search is exact: the corpus collapses to the
   * (frequency → term count) histogram, one [[graft.analysis.PrefixSum
   * .exclusive]] pass adds cumulative term/token counts, and each
   * share picks its unique crossing block (tokens_before < s·T ≤
   * tokens_before + block) with ceil((s·T − before)/f) terms from
   * inside it. State bounded by distinct frequency values.
   */
  def vocabCoverage(df: DataFrame, textCol: String,
      shares: Seq[Double]): DataFrame = {
    import df.sparkSession.implicits._
    val fc = df.select(explode(split(col(textCol), " ")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).cast("double").as("__f"))
      .groupBy("__f").agg(count(lit(1)).cast("double").as("__cnt"))
      .withColumn("__toks", col("__f") * col("__cnt"))
    val pre = graft.analysis.PrefixSum
      .exclusive(fc.withColumn("__nf", -col("__f")), "__nf",
        Seq("__cnt" -> "__terms_before", "__toks" -> "__toks_before"))
      .join(broadcast(fc.agg(sum(col("__toks")).as("__tt"),
        sum(col("__cnt")).as("__tv"))))
    val shareDf = shares.toDF("share")
    shareDf.crossJoin(pre)
      .withColumn("__target", col("share") * col("__tt"))
      .where(col("__toks_before") < col("__target") &&
        col("__toks_before") + col("__toks") >= col("__target"))
      .withColumn("__need",
        ceil((col("__target") - col("__toks_before")) / col("__f")))
      .select(col("share"),
        (col("__terms_before") + col("__need")).cast("long")
          .as("vocab_size"),
        col("__tv").cast("long").as("total_vocab"),
        col("__tt").cast("long").as("total_tokens"),
        ((col("__toks_before") + col("__need") * col("__f")) / col("__tt"))
          .as("coverage"))
  }

  /**
   * DSIR-style importance weighting for data selection (Xie et al.
   * 2023, "Data Selection for Language Models via Importance
   * Resampling"): scores each document by the log-likelihood ratio of
   * its tokens under a TARGET-domain unigram LM vs a RAW-corpus LM,
   * both add-α smoothed over the raw vocabulary. Documents whose
   * token distribution looks like the target get positive
   * `log_ratio_sum`; resample the corpus ∝ exp(λ·score) downstream
   * (e.g. via [[graft.ops.Sampling.weightedSampleWithoutReplacement]]).
   *
   * Scale shape: identical to [[unigramLogLikelihood]] — both "LMs"
   * are vocabulary-keyed count FRAMES (one aggregation each over the
   * reference corpora), the scoring is one term-keyed join of the
   * exploded document tokens against the merged vocabulary, totals
   * ride a 1-row broadcast. Smoothing uses the raw vocabulary size V
   * for both models so an out-of-both-vocabulary token scores
   * log-ratio 0 bias-free. Returns (idCol, n_tokens, log_ratio_sum,
   * log_ratio_avg).
   */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      raw: DataFrame, rawTextCol: String,
      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, "alpha must be positive for smoothing")
    val tVocab = target.select(explode(words(col(targetTextCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("__ct"))
    val rVocab = raw.select(explode(words(col(rawTextCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("__cr"))
    val vocab = rVocab.join(tVocab, Seq("term"), "full_outer")
    val totals = broadcast(vocab.agg(
      sum(coalesce(col("__ct"), lit(0L))).as("__nt"),
      sum(coalesce(col("__cr"), lit(0L))).as("__nr"),
      count(lit(1)).as("__v")))
    val toks = df.select(col(idCol).as("id"),
      explode(words(col(textCol))).as("term"))
    toks.join(vocab, Seq("term"), "left")
      .join(totals)
      .select(col("id"),
        (log((coalesce(col("__ct"), lit(0L)) + lit(alpha)) /
            (col("__nt") + lit(alpha) * (col("__v") + lit(1)))) -
         log((coalesce(col("__cr"), lit(0L)) + lit(alpha)) /
            (col("__nr") + lit(alpha) * (col("__v") + lit(1)))))
          .as("__lr"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__lr")).as("log_ratio_sum"),
        avg(col("__lr")).as("log_ratio_avg"))
      .withColumnRenamed("id", idCol)
  }

  /**
   * Good–Turing frequency-of-frequencies profile — the corpus-coverage
   * diagnostic behind LM smoothing and vocabulary-growth estimates:
   * how much probability mass belongs to UNSEEN words
   * (`p0 = N₁/N`, Good's estimator), and the adjusted counts
   * `r* = (r+1)·N_{r+1}/N_r` that discount each low-frequency band.
   * Returns one row per count band r = 1..maxR: the number of types
   * seen exactly r times (`n_types`), that band's share of all tokens,
   * its Good–Turing adjusted count `r_star`, and the constant `p0`
   * column (the singleton mass).
   *
   * Two keyed aggregations (term counts, then count-of-counts) and a
   * 1-row broadcast total; the frequency-of-frequencies frame is at
   * most maxR+1 rows — the band self-align for N_{r+1} is a broadcast
   * self-join on r+1 over that tiny frame (NOT a lead window: a lead
   * would grab the next PRESENT band, which is r+2 when a band is
   * empty), never the corpus.
   */
  def goodTuring(df: DataFrame, textCol: String,
      maxR: Int = 5, n: Int = 1): DataFrame = {
    require(n >= 1, "n-gram order must be >= 1")
    // type unit = word n-gram (n=1: plain words) — higher orders reach
    // the low-frequency bands that make the estimator informative when
    // the unigram vocabulary is small and saturated
    val grams =
      if (n == 1) df.select(explode(words(col(textCol))).as("__w"))
      else df
        .select(words(col(textCol)).as("__ws"))
        .where(size(col("__ws")) >= n)
        .select(explode(expr(
          s"transform(sequence(1, size(__ws) - ${n - 1}), " +
            s"i -> array_join(slice(__ws, i, $n), '_'))")).as("__w"))
    val termCounts = grams
      .groupBy("__w").agg(count(lit(1)).as("__r"))
    val bands = termCounts
      .where(col("__r") <= maxR + 1)
      .groupBy(col("__r").as("r"))
      .agg(count(lit(1)).as("n_types"))
    val totals = broadcast(termCounts.agg(
      sum(col("__r")).cast("double").as("__n"),
      coalesce(sum(when(col("__r") === 1, 1L)), lit(0L))
        .cast("double").as("__n1")))
    val nextBand = bands
      .select((col("r") - 1).as("r"), col("n_types").as("__next_types"))
    bands.where(col("r") <= maxR)
      .join(broadcast(nextBand), Seq("r"), "left")
      .join(totals)
      .select(col("r"), col("n_types"),
        (col("r") * col("n_types") / col("__n")).as("token_share"),
        ((col("r") + 1) * coalesce(col("__next_types"), lit(0L)) /
          col("n_types")).as("r_star"),
        (col("__n1") / col("__n")).as("p0"))
      .orderBy("r")
  }

  /**
   * Blocklist screening — the word-list content gate every curation
   * pipeline runs (toxicity lists, brand/safety terms, licensing
   * markers): per document, total occurrences of listed terms, count
   * of distinct listed terms present, and the flag. Map-only: the
   * list is a broadcast array literal and both counts are codegen'd
   * higher-order functions over the token array — no explode, no
   * shuffle, no join; cost is O(tokens × |list|) per row with |list|
   * in the tens (regex-compile a trie offline for big lists).
   */
  def blocklistScore(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], lowercase: Boolean = true): DataFrame = {
    require(terms.nonEmpty, "empty blocklist")
    val txt = if (lowercase) lower(col(textCol)) else col(textCol)
    val toks = split(txt, " ")
    val listed = lit(terms.map(t =>
      if (lowercase) t.toLowerCase else t).distinct.sorted.toArray)
    val hitToks = filter(toks, t => array_contains(listed, t))
    df.select(col(idCol),
      size(hitToks).as("hits"),
      size(array_distinct(hitToks)).as("distinct_terms"),
      (size(hitToks) > 0).as("flagged"))
  }

  /**
   * Per-document keyword extraction: the top-k terms of each document
   * by TF-IDF ([[tfIdf]] scores; rank ties break on term ascending).
   * One window partitioned BY DOCUMENT on the (doc, term) frame —
   * per-doc sort only, no global sort. Returns
   * (id, term, tfidf, rank), rank ≤ k.
   */
  def topTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    require(k >= 1, "topTerms: k >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    tfIdf(df, idCol, textCol)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /**
   * Column-level PII exposure profile: for each string column, the
   * fraction of rows matching each [[piiPresets]] pattern (email,
   * ssn, ipv4, phone) plus the any-hit rate — the discovery-side scan
   * that tells a pipeline which columns need [[redactPii]] before
   * export. ONE aggregation pass over all columns (conditional sums;
   * the regexes are codegen'd rlike predicates), then the 1-row
   * result is melted to a per-column frame — no per-column scans, no
   * shuffle beyond the single agg. Returns
   * (column, n, email_rate, ssn_rate, ipv4_rate, phone_rate, any_rate).
   */
  def piiProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "piiProfile: no columns")
    val kinds = Seq("email", "ssn", "ipv4", "phone")
    val aggs = count(lit(1)).cast("double").as("__n") +: cols.flatMap {
      c =>
        kinds.map { k =>
          sum(when(col(c).rlike(piiPresets(k)), 1.0).otherwise(0.0))
            .as(s"__${c}__$k")
        } :+ sum(when(kinds.map(k => col(c).rlike(piiPresets(k)))
          .reduce(_ || _), 1.0).otherwise(0.0)).as(s"__${c}__any")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"), col("__n").cast("long").as("n"),
        (col(s"__${c}__email") / col("__n")).as("email_rate"),
        (col(s"__${c}__ssn") / col("__n")).as("ssn_rate"),
        (col(s"__${c}__ipv4") / col("__n")).as("ipv4_rate"),
        (col(s"__${c}__phone") / col("__n")).as("phone_rate"),
        (col(s"__${c}__any") / col("__n")).as("any_rate"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /**
   * Byte-pair-encoding merge learning (Sennrich et al. 2016 — the
   * standard subword-tokenizer induction): `merges` rounds of
   * (count adjacent symbol pairs over the word-type vocabulary,
   * weighted by word frequency) → (merge the most frequent pair
   * everywhere, greedy left-to-right). Returns one row per round:
   * (round, left, right, merged, cnt).
   *
   * Symbols ride in a delimiter-wrapped string form ("&lt;c&gt; &lt;a&gt; &lt;t&gt;")
   * so merge application is a plain substring replace — replace()
   * scans left-to-right over non-overlapping occurrences in every
   * engine, which IS BPE's application order, and the wrapping makes
   * a pair pattern unable to match inside a longer symbol. Count ties
   * break on (left, right) ascending.
   *
   * Scale: the corpus is read ONCE (word-type counts — the frame BPE
   * iterates on is the vocabulary, corpus-independent in size); each
   * round is one explode/groupBy over the vocab + a 1-row broadcast
   * winner applied map-side, with the vocab localCheckpointed so
   * round r+1 never replays round r. Training-scale BPE runs on the
   * type vocabulary like this by construction — never on raw text.
   */
  def bpeMerges(df: DataFrame, textCol: String,
      merges: Int = 3): DataFrame = {
    require(merges >= 1 && merges <= 32, "bpeMerges: merges in [1,32]")
    val wrap = concat_ws(" ",
      transform(filter(split(col("w"), ""), c => length(c) > 0),
        c => concat(lit("<"), c, lit(">"))))
    var vocab = df
      .select(explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(wrap.as("s"), col("n"))
      .localCheckpoint()
    var out: DataFrame = null
    val inner = (c: org.apache.spark.sql.Column) =>
      c.substr(lit(2), length(c) - 2)
    for (round <- 1 to merges) {
      val pc = vocab.withColumn("t", split(col("s"), " "))
        .where(size(col("t")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(0, size(t)-2), " +
            "i -> struct(t[i] AS l, t[i+1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
      val best = pc.orderBy(desc("cnt"), asc("l"), asc("r")).limit(1)
        .localCheckpoint()
      val merged = concat(lit("<"), inner(col("l")), inner(col("r")),
        lit(">"))
      val pick = best.select(lit(round).as("round"), col("l").as("left"),
        col("r").as("right"), merged.as("merged"), col("cnt"))
      out = if (out == null) pick else out.unionByName(pick)
      if (round < merges) {
        val b = broadcast(best.select(col("l").as("__l"),
          col("r").as("__r")))
        vocab = vocab.crossJoin(b)
          .select(replace(col("s"),
            concat(col("__l"), lit(" "), col("__r")),
            concat(lit("<"), inner(col("__l")), inner(col("__r")),
              lit(">"))).as("s"),
            col("n"))
          .localCheckpoint()
      }
    }
    out
  }

  /**
   * Vocabulary overlap between corpus sources: for every source pair,
   * the Jaccard similarity of their DISTINCT word sets — the
   * mixture-planning diagnostic ("are these two crawls the same
   * text?") that document-level dedup can't answer cheaply. Returns
   * one row per unordered pair: (source_a, source_b, vocab_a,
   * vocab_b, common, jaccard).
   *
   * Scale shape: the corpus reduces to the distinct (source, term)
   * frame (vocabulary-bounded, localCheckpointed — sizes AND the
   * pair join read it); intersections come from a term-keyed
   * self-join of that frame — work is Σ_term df(term)², bounded by
   * the source count per term (≤ |sources|), never corpus².
   */
  def sourceVocabularyOverlap(df: DataFrame, srcCol: String,
      textCol: String): DataFrame = {
    val vocab = df
      .select(col(srcCol).as("__s"),
        explode(split(lower(col(textCol)), "[^a-z]+")).as("__t"))
      .where(length(col("__t")) > 0)
      .distinct().localCheckpoint()
    val sizes = vocab.groupBy("__s")
      .agg(count(lit(1)).as("__v")).localCheckpoint()
    val pairs = vocab.as("a")
      .join(vocab.select(col("__s").as("__s2"), col("__t")), Seq("__t"))
      .where(col("__s") < col("__s2"))
      .groupBy(col("__s"), col("__s2"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(broadcast(sizes), Seq("__s"))
      .join(broadcast(sizes.select(col("__s").as("__s2"),
        col("__v").as("__v2"))), Seq("__s2"))
      .select(col("__s").as("source_a"), col("__s2").as("source_b"),
        col("__v").as("vocab_a"), col("__v2").as("vocab_b"),
        col("common"),
        (col("common").cast("double") /
          (col("__v") + col("__v2") - col("common"))).as("jaccard"))
  }

  /**
   * Apply a learned [[bpeMerges]] table to a corpus — the ENCODE side
   * of the BPE pair: every word is wrapped into per-character symbols
   * and the merges replay in round order (greedy left-to-right via
   * substring replace, BPE's own application order), yielding the
   * post-merge token count per document beside the character-level
   * baseline. The compression readout (base/bpe) is the standard
   * "how much did the vocabulary buy" diagnostic when sizing a
   * tokenizer. Returns one row per document:
   * (idCol, n_words, n_tokens_base, n_tokens_bpe, compression).
   *
   * Scale shape: the merges frame is ≤32 rows by [[bpeMerges]]'s own
   * cap — collected and inlined as literal replace chains, so
   * encoding is ONE map-side pass over the exploded word frame plus
   * the per-doc count rollup; the corpus never joins anything.
   */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: DataFrame): DataFrame = {
    // limit(33) makes the ≤32-row contract STRUCTURAL (the plan ends
    // in a GlobalLimit, satisfying the bounded-collect lint); the
    // require still fires loud if a 33rd row shows the contract broken
    val ms = merges.select("round", "left", "right", "merged")
      .limit(33).collect().sortBy(_.getAs[Int]("round"))
    require(ms.nonEmpty && ms.length <= 32,
      s"bpeEncode: 1..32 merges expected, got ${ms.length}")
    val wrapped = concat_ws(" ",
      transform(filter(split(col("__w"), ""), c => length(c) > 0),
        c => concat(lit("<"), c, lit(">"))))
    val words = df
      .select(col(idCol), explode(split(lower(col(textCol)), "[^a-z]+"))
        .as("__w"))
      .where(length(col("__w")) > 0)
    val encoded = ms.foldLeft(wrapped) { (acc, r) =>
      replace(acc,
        lit(r.getAs[String]("left") + " " + r.getAs[String]("right")),
        lit(r.getAs[String]("merged")))
    }
    words
      .select(col(idCol), length(col("__w")).cast("long").as("__base"),
        size(split(encoded, " ")).cast("long").as("__bpe"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__base")).as("n_tokens_base"),
        sum(col("__bpe")).as("n_tokens_bpe"))
      .withColumn("compression",
        col("n_tokens_base").cast("double") / col("n_tokens_bpe"))
  }

  /**
   * Readability scoring — Flesch reading ease and Flesch–Kincaid
   * grade level with the standard corpus-scale proxies: words =
   * whitespace tokens, sentences = terminal-punctuation count
   * (floored at 1), syllables = vowel-group runs `[aeiouy]+` (the
   * classic dictionary-free approximation, floored at one per word).
   * A quality-filtering gate alongside the Gopher rules: training
   * corpora routinely drop documents outside a readability band.
   *
   * Map-only: three codegen'd regexp/split counts per row, no
   * shuffle, no UDF. Appends (n_words, n_sentences, n_syllables,
   * flesch, fk_grade) to the input columns.
   */
  def readability(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val words = greatest(lit(1.0),
      size(split(trim(t), "\\s+")).cast("double"))
    val sents = greatest(lit(1.0),
      regexp_count(t, lit("[.!?]")).cast("double"))
    val syl = greatest(words,
      regexp_count(lower(t), lit("[aeiouy]+")).cast("double"))
    df.withColumn("n_words", words.cast("long"))
      .withColumn("n_sentences", sents.cast("long"))
      .withColumn("n_syllables", syl.cast("long"))
      .withColumn("flesch",
        lit(206.835) - lit(1.015) * (words / sents) -
          lit(84.6) * (syl / words))
      .withColumn("fk_grade",
        lit(0.39) * (words / sents) + lit(11.8) * (syl / words) -
          lit(15.59))
  }

  /**
   * Grade-level readability panel — the four dictionary-free indices
   * a quality gate cross-checks against Flesch ([[readability]])
   * before dropping a document, each keyed to a different proxy so
   * they fail independently: ARI and Coleman–Liau read CHARACTERS
   * per word (robust where the syllable heuristic is not), Gunning
   * fog and SMOG read COMPLEX words (≥3 vowel-group runs). Proxies
   * match [[readability]]'s exactly: words = whitespace tokens,
   * sentences = terminal-punctuation count floored at 1, letters =
   * non-whitespace chars, complex words counted per-token with a
   * codegen'd higher-order `filter` (no UDF). Appends (n_words,
   * n_sentences, n_letters, n_complex, ari, coleman_liau,
   * gunning_fog, smog) to the input columns. Map-only, no shuffle.
   */
  def readabilityPanel(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = filter(split(trim(t), "\\s+"), w => length(w) > 0)
    val words = greatest(lit(1.0), size(toks).cast("double"))
    val sents = greatest(lit(1.0),
      regexp_count(t, lit("[.!?]")).cast("double"))
    val letters = length(regexp_replace(t, "\\s", "")).cast("double")
    val complexW = size(filter(toks,
      w => regexp_count(lower(w), lit("[aeiouy]+")) >= 3)).cast("double")
    val l100 = letters / words * 100 // Coleman–Liau reads per-100-word rates
    val s100 = sents / words * 100
    df.withColumn("n_words", words.cast("long"))
      .withColumn("n_sentences", sents.cast("long"))
      .withColumn("n_letters", letters.cast("long"))
      .withColumn("n_complex", complexW.cast("long"))
      .withColumn("ari",
        lit(4.71) * (letters / words) + lit(0.5) * (words / sents) -
          lit(21.43))
      .withColumn("coleman_liau",
        lit(0.0588) * l100 - lit(0.296) * s100 - lit(15.8))
      .withColumn("gunning_fog",
        (words / sents + complexW / words * 100) * lit(0.4))
      .withColumn("smog",
        lit(1.0430) * sqrt(complexW * 30 / sents) + lit(3.1291))
  }

  /**
   * Keyness: which terms are characteristically OVER-represented in
   * one sub-corpus vs the rest, by Dunning's log-likelihood ratio
   * (Dunning 1993) — the corpus-comparison readout behind "what is
   * this source actually about" and training-mixture audits. For each
   * term with focus count a (of N_a focus tokens) and reference count
   * b (of N_b): G² = 2·[a·ln(a/E_a) + b·ln(b/E_b)] with expectations
   * E = (a+b)·N_side/N; zero cells contribute zero. `keyness` is G²
   * signed by direction (positive = over-represented in the focus
   * side). Top `k` terms by G² (term-ascending tie-break), terms with
   * fewer than `minCount` total occurrences dropped (rare terms make
   * G² noisy and the cut keeps the TakeOrdered heap honest).
   *
   * Scale shape: one tokenize-explode scan to a (term, side) count
   * frame, the two side totals as a broadcast 1-row aggregate, then a
   * TakeOrdered(k) — executor-side heaps, never a global sort.
   */
  def keyness(df: DataFrame, textCol: String, focusCond: Column,
      k: Int = 30, minCount: Long = 5): DataFrame = {
    require(k >= 1, "keyness: k >= 1")
    val toks = df
      .select(when(focusCond, lit(1.0)).otherwise(lit(0.0)).as("__f"),
        explode(split(lower(col(textCol)), "[^a-z]+")).as("__t"))
      .where(length(col("__t")) > 0)
    val per = toks.groupBy("__t")
      .agg(sum(col("__f")).as("__a"),
        sum(lit(1.0) - col("__f")).as("__b"))
      .where(col("__a") + col("__b") >= minCount)
    val tot = broadcast(per.agg(sum(col("__a")).as("__na"),
      sum(col("__b")).as("__nb")))
    val ea = (col("__a") + col("__b")) * col("__na") /
      (col("__na") + col("__nb"))
    val eb = (col("__a") + col("__b")) * col("__nb") /
      (col("__na") + col("__nb"))
    val g2 = lit(2.0) * (
      when(col("__a") > 0, col("__a") * log(col("__a") / ea))
        .otherwise(lit(0.0)) +
      when(col("__b") > 0, col("__b") * log(col("__b") / eb))
        .otherwise(lit(0.0)))
    per.crossJoin(tot)
      .select(col("__t").as("term"), col("__a").cast("long").as("n_focus"),
        col("__b").cast("long").as("n_reference"), g2.as("__g2"),
        (when(col("__a") / col("__na") >= col("__b") / col("__nb"),
          lit(1.0)).otherwise(lit(-1.0)) * g2).as("keyness"))
      .orderBy(col("__g2").desc, col("term").asc)
      .limit(k)
      .drop("__g2")
  }

  /**
   * Flesch reading-ease scoring per document, rolled up by a group
   * column — the classic prose-difficulty gate of a text-quality
   * pipeline (206.835 − 1.015·words/sentences − 84.6·syllables/words).
   * Syllables use the standard engine-portable proxy: vowel-run count
   * (`[aeiouy]+` matches), the deterministic approximation every
   * SQL-replayable readability implementation settles on; sentences =
   * terminal-punctuation runs, floored at 1. Map-only per-doc
   * arithmetic → one grouped rollup: (group, n_docs, avg_words,
   * avg_sentence_len, avg_syllables_per_word, avg_flesch,
   * share_difficult) where difficult = score < 50.
   */
  def fleschReadingEase(df: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    val t = col(textCol)
    val wordsN = size(expr(
      s"filter(split($textCol, ' '), x -> x != '')")).cast("double")
    val sentN = greatest(
      size(expr(s"regexp_extract_all($textCol, '[.!?]+', 0)")),
      lit(1)).cast("double")
    val sylN = greatest(
      size(expr(s"regexp_extract_all(lower($textCol), '[aeiouy]+', 0)")),
      lit(1)).cast("double")
    val flesch = lit(206.835) - lit(1.015) * (wordsN / sentN) -
      lit(84.6) * (sylN / wordsN)
    df.where(t.isNotNull && wordsN > 0)
      .select(col(groupCol).as("__g"), wordsN.as("__w"),
        sentN.as("__s"), sylN.as("__y"), flesch.as("__f"))
      .groupBy(col("__g").as(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        avg(col("__w")).as("avg_words"),
        avg(col("__w") / col("__s")).as("avg_sentence_len"),
        avg(col("__y") / col("__w")).as("avg_syllables_per_word"),
        avg(col("__f")).as("avg_flesch"),
        avg(when(col("__f") < 50, 1.0).otherwise(0.0))
          .as("share_difficult"))
  }

  /**
   * Vocabulary coverage curve: what share of the corpus TOKEN MASS
   * does a top-k frequency vocabulary cover, for each k — the
   * tokenizer/embedding-table sizing readout ("is 32k vocab enough or
   * does the tail matter here"). Exact, via the count-of-counts
   * frame: terms with the same frequency are interchangeable, so the
   * top-k boundary lands inside ONE frequency class and coverage is
   * prefix mass + a pro-rata slice of that class — no per-term sort,
   * no top-k heap; prefix sums ride [[graft.analysis.PrefixSum]] over
   * the ≤O(√mass)-row frequency-class frame in DESCENDING count
   * order (negated key). Returns one row per k: (k, k_effective,
   * vocabulary, total_tokens, covered_tokens, coverage).
   */
  def topKVocabCoverage(df: DataFrame, textCol: String,
      ks: Seq[Long] = Seq(100L, 1000L, 10000L)): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0), "vocabCoverage: ks > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val tf = df.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("__w"))
      .where(col("__w") =!= "")
      .groupBy("__w").agg(count(lit(1)).cast("double").as("__c"))
    val cc = tf.groupBy(col("__c"))
      .agg(count(lit(1)).cast("double").as("__m"))
      .withColumn("__mass", col("__c") * col("__m"))
      .withColumn("__negc", -col("__c"))
    val pre = graft.analysis.PrefixSum.exclusive(cc, "__negc",
      Seq("__m" -> "__exm", "__mass" -> "__exmass"))
    val tot = broadcast(tf.agg(sum(col("__c")).as("__total"),
      count(lit(1)).cast("double").as("__vocab")))
    val ksDf = broadcast(ks.toDF("k").crossJoin(tot)
      .withColumn("__k2", least(col("k").cast("double"), col("__vocab"))))
    // the boundary frequency class: __exm terms rank strictly above it
    pre.join(ksDf,
        col("__exm") < col("__k2") &&
          col("__k2") <= col("__exm") + col("__m"))
      .select(col("k"), col("__k2").cast("long").as("k_effective"),
        col("__vocab").cast("long").as("vocabulary"),
        col("__total").cast("long").as("total_tokens"),
        (col("__exmass") + (col("__k2") - col("__exm")) * col("__c"))
          .cast("long").as("covered_tokens"),
        ((col("__exmass") + (col("__k2") - col("__exm")) * col("__c")) /
          col("__total")).as("coverage"))
  }

  /**
   * Corpus vocabulary-frequency profile: vocabulary size, hapax and
   * dis legomena counts (terms seen exactly once / twice) and their
   * shares, total token mass, and the hapax TOKEN share — the Zipf
   * tail readout behind "how much of this corpus is one-off noise"
   * (hapax-heavy corpora inflate vocabulary-sensitive costs like BPE
   * training and embedding tables; a corpus losing hapax share round
   * over round is being deduplicated or templated). One token
   * explode → term counts → count-of-counts reduce — corpus-linear,
   * nothing driver-side.
   */
  def vocabularyProfile(df: DataFrame, textCol: String): DataFrame = {
    val tf = df.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("__w"))
      .where(col("__w") =!= "")
      .groupBy("__w").agg(count(lit(1)).as("__c"))
    tf.agg(count(lit(1)).as("vocabulary"),
        sum(col("__c")).as("n_tokens"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("hapax"),
        sum(when(col("__c") === 2, 1L).otherwise(0L)).as("dis_legomena"))
      .select(col("vocabulary"), col("n_tokens"), col("hapax"),
        col("dis_legomena"),
        (col("hapax").cast("double") / col("vocabulary"))
          .as("hapax_vocab_share"),
        (col("hapax").cast("double") / col("n_tokens"))
          .as("hapax_token_share"),
        (col("vocabulary").cast("double") / col("n_tokens"))
          .as("type_token_ratio"))
  }

  /**
   * Lexical-richness panel from the corpus count-of-counts frame —
   * the classical vocabulary-concentration constants, every one a
   * pure function of (m, V_m) = (frequency level, types at that
   * level), so the whole panel reduces TWO tiny aggregations after
   * the term-count shuffle ([[vocabularyProfile]]'s scale shape):
   * Yule's K = 10⁴(Σm²V_m − N)/N² (repeat-rate; spam ↑), Simpson's
   * D = Σm(m−1)V_m/(N(N−1)), Herdan's C = lnV/lnN, Guiraud's
   * R = V/√N, Sichel's S = V₂/V, Honoré's H = 100·lnN/(1 − V₁/V)
   * (NULL when every type is a hapax — the degenerate-input
   * convention). All counts are integer-exact; only the final
   * scalars carry float noise. Returns ONE row.
   */
  def lexicalRichness(df: DataFrame, textCol: String): DataFrame = {
    val tf = df.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("__w"))
      .where(col("__w") =!= "")
      .groupBy("__w").agg(count(lit(1)).as("__c"))
    val coc = tf.groupBy(col("__c").as("__m"))
      .agg(count(lit(1)).cast("double").as("__vm"))
    coc.agg(
        sum(col("__m") * col("__vm")).as("__N"),
        sum(col("__vm")).as("__V"),
        sum(col("__m") * col("__m") * col("__vm")).as("__sm2"),
        sum(col("__m") * (col("__m") - 1) * col("__vm")).as("__sm11"),
        sum(when(col("__m") === 1, col("__vm")).otherwise(0.0)).as("__v1"),
        sum(when(col("__m") === 2, col("__vm")).otherwise(0.0)).as("__v2"))
      .select(col("__N").cast("long").as("n_tokens"),
        col("__V").cast("long").as("vocabulary"),
        (lit(1e4) * (col("__sm2") - col("__N")) /
          (col("__N") * col("__N"))).as("yule_k"),
        when(col("__N") > 1, col("__sm11") /
          (col("__N") * (col("__N") - 1))).as("simpson_d"),
        when(col("__N") > 1 && col("__V") > 1,
          log(col("__V")) / log(col("__N"))).as("herdan_c"),
        (col("__V") / sqrt(col("__N"))).as("guiraud_r"),
        when(col("__V") > 0, col("__v2") / col("__V")).as("sichel_s"),
        when(col("__v1") < col("__V"),
          lit(100.0) * log(col("__N")) /
            (lit(1.0) - col("__v1") / col("__V"))).as("honore_h"))
  }

  /**
   * Collocation-strength panel over corpus bigrams — the lexicographic
   * pair to [[pmiBigrams]]'s information-theoretic ranking: per
   * bigram, the t-score t = (f(xy) − f(x)f(y)/N)/√f(xy)
   * (Church–Hanks; frequency-favoring, stable for common pairs) and
   * logDice = 14 + log₂(2f(xy)/(f(x)+f(y))) (corpus-size-invariant,
   * the Sketch Engine standard). Top-k by ROUNDED logDice
   * (6-decimal grid, then lexicographic tiebreak — the pmiBigrams
   * engine-determinism convention). Scale shape identical to
   * pmiBigrams: zip-with-tail bigrams (map-only), two keyed aggs,
   * min-count prune BEFORE the vocab joins, TakeOrdered(k).
   */
  def collocationPanel(df: DataFrame, textCol: String,
      minCount: Long = 5, k: Int = 20): DataFrame = {
    val w = words(col(textCol))
    val toks = df.select(w.as("__w")) // two map-only scans beat a
    // corpus-sized token-array checkpoint (the Blomqvist lesson)
    val bi = toks.where(size(col("__w")) >= 2)
      .select(explode(arrays_zip(
        slice(col("__w"), lit(1), size(col("__w")) - 1).as("x"),
        slice(col("__w"), lit(2), size(col("__w")) - 1).as("y"))).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
    val uni = toks.select(explode(col("__w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c_t"))
    val totUni = broadcast(uni.agg(sum(col("c_t")).as("t_uni")))
    bi.where(col("c_xy") >= minCount)
      .join(uni.select(col("t").as("x"), col("c_t").as("c_x")), "x")
      .join(uni.select(col("t").as("y"), col("c_t").as("c_y")), "y")
      .join(totUni)
      .select(col("x"), col("y"), col("c_xy"),
        round((col("c_xy") -
          col("c_x").cast("double") * col("c_y") / col("t_uni")) /
          sqrt(col("c_xy")), 6).as("t_score"),
        round(lit(14.0) + log(2.0,
          lit(2.0) * col("c_xy") / (col("c_x") + col("c_y"))), 6)
          .as("log_dice"))
      .orderBy(col("log_dice").desc, col("x").asc, col("y").asc)
      .limit(k)
  }

  /**
   * Hill-number diversity profile per group (language/source): the
   * ecology-standard triple q=0 (type richness), q=1 (exp Shannon,
   * "effective common types") and q=2 (inverse Simpson, "effective
   * dominant types") over each group's term distribution — one
   * number series that exposes both long-tail richness and
   * head-domination, the corpus-mix screen a per-source token count
   * can't give. One term-count shuffle, one per-group rollup.
   * Returns one row per group: (group, n_tokens, hill_q0, hill_q1,
   * hill_q2).
   */
  /**
   * Gries' DP (deviation of proportions) term-dispersion profile:
   * per term, DP = ½·Σ_sources |share-of-term-in-source −
   * source-size-share| ∈ [0, 1) — 0 means the term spreads exactly
   * like the corpus, →1 means it CLUMPS in one shard. The
   * cross-source companion to within-document burstiness: a
   * high-frequency, high-DP term is a shard-local artifact
   * (boilerplate, template spam) that a plain frequency cut keeps.
   * Zero-occurrence sources enter via the identity
   * DP = ½ + ½·Σ_{c>0}(|c/f − s| − s) — no grid fill. Returns the
   * top-k most clumped terms with count ≥ minCount:
   * (term, count, dp), ordered by rounded DP desc, term asc.
   *
   * Scale shape: ONE (term, source) count shuffle, a term rollup, a
   * bounded source-totals broadcast, TakeOrdered(k).
   */
  def termDispersion(df: DataFrame, textCol: String, srcCol: String,
      minCount: Long = 100, k: Int = 15): DataFrame = {
    val ts = df.where(col(textCol).isNotNull && col(srcCol).isNotNull)
      .select(col(srcCol).as("__s"),
        explode(split(col(textCol), " ")).as("__w"))
      .where(col("__w") =!= "")
      .groupBy("__s", "__w").agg(count(lit(1)).cast("double").as("__c"))
      .localCheckpoint() // term rollup + source totals + DP pass read it
    val termTot = ts.groupBy("__w").agg(sum(col("__c")).as("__f"))
    val srcTot = ts.groupBy("__s").agg(sum(col("__c")).as("__ns"))
    val corpus = broadcast(srcTot.agg(sum(col("__ns")).as("__N")))
    val shares = broadcast(srcTot.crossJoin(corpus)
      .select(col("__s"), (col("__ns") / col("__N")).as("__sh")))
    graft.analysis.PrefixSum.joinNullSafe(ts, shares, Seq("__s"),
        broadcastRight = true)
      .join(termTot, Seq("__w"))
      .groupBy(col("__w").as("term"))
      .agg(max(col("__f")).as("__ff"),
        sum(abs(col("__c") / col("__f") - col("__sh")) - col("__sh"))
          .as("__dsum"))
      .where(col("__ff") >= minCount)
      .select(col("term"), col("__ff").cast("long").as("count"),
        round(lit(0.5) + lit(0.5) * col("__dsum"), 6).as("dp"))
      .orderBy(col("dp").desc, col("term").asc)
      .limit(k)
  }

  /**
   * Burrows' Delta stylometric distance between document groups
   * (language/source): z-score each group's relative frequency of the
   * corpus's top-k terms against the across-group mean/sd, then
   * Delta(a, b) = mean_t |z_a(t) − z_b(t)| — the standard authorship/
   * register distance, here the "do these shards speak the same
   * dialect" screen a token-count comparison can't answer. Returns
   * one row per unordered group pair: (group_a, group_b, delta).
   *
   * Scale shape: ONE (group, term) count shuffle; the top-k term list
   * (integer-count TakeOrdered, term tiebreak) and the group list are
   * BOUNDED frames, so the zero-filled grid, the per-term moments and
   * the pair join all run on k×|groups| rows.
   */
  def burrowsDelta(df: DataFrame, textCol: String, groupCol: String,
      k: Int = 30): DataFrame = {
    val gt = df.where(col(textCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        explode(split(col(textCol), " ")).as("__w"))
      .where(col("__w") =!= "")
      .groupBy("__g", "__w").agg(count(lit(1)).cast("double").as("__c"))
      .localCheckpoint() // top-k + group totals + grid join read it
    val topk = broadcast(gt.groupBy("__w")
      .agg(sum(col("__c")).as("__f"))
      .orderBy(col("__f").desc, col("__w").asc)
      .limit(k).select("__w"))
    val gTot = broadcast(gt.groupBy("__g").agg(sum(col("__c")).as("__n")))
    val grid = gTot.select("__g", "__n").crossJoin(topk)
    val r = grid.join(gt, Seq("__g", "__w"), "left")
      .select(col("__g"), col("__w"),
        (coalesce(col("__c"), lit(0.0)) / col("__n")).as("__r"))
      .localCheckpoint() // moments + both pair-join sides read it
    val mom = r.groupBy("__w")
      .agg(avg(col("__r")).as("__mu"), stddev_samp(col("__r")).as("__sd"))
    val z = r.join(broadcast(mom), Seq("__w"))
      .where(col("__sd") > 0)
      .select(col("__w"), col("__g"),
        ((col("__r") - col("__mu")) / col("__sd")).as("__z"))
    val zb = z.select(col("__w"), col("__g").as("__g2"),
      col("__z").as("__z2"))
    z.join(zb, Seq("__w"))
      .where(col("__g") < col("__g2"))
      .groupBy(col("__g").as("group_a"), col("__g2").as("group_b"))
      .agg(round(avg(abs(col("__z") - col("__z2"))), 6).as("delta"))
      .orderBy("group_a", "group_b")
  }

  def hillDiversity(df: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    val tf = df.where(col(textCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        explode(split(col(textCol), " ")).as("__w"))
      .where(col("__w") =!= "")
      .groupBy("__g", "__w").agg(count(lit(1)).cast("double").as("__c"))
    val totals = tf.groupBy("__g").agg(sum(col("__c")).as("__N"))
    graft.analysis.PrefixSum.joinNullSafe(tf, totals, Seq("__g"),
        broadcastRight = true)
      .groupBy("__g")
      .agg(max(col("__N")).as("__n"),
        count(lit(1)).cast("double").as("__v"),
        sum(when(col("__c") > 0,
          -(col("__c") / col("__N")) * log(col("__c") / col("__N")))
          .otherwise(0.0)).as("__h"),
        sum(pow(col("__c") / col("__N"), 2)).as("__l"))
      .select(col("__g").as(groupCol),
        col("__n").cast("long").as("n_tokens"),
        col("__v").cast("long").as("hill_q0"),
        exp(col("__h")).as("hill_q1"),
        when(col("__l") > 0, lit(1.0) / col("__l")).as("hill_q2"))
  }
  /**
   * Vocabulary-richness estimators from the frequency-of-frequencies
   * profile — "how much of this corpus's vocabulary have we actually
   * seen": Good–Turing's unseen-mass estimate P₀ ≈ n₁/N (the
   * singleton share of tokens) and the Chao1 richness floor
   * V + n₁²/(2n₂) (how many types a larger crawl would reveal), the
   * standard pre-scaling answer to "is more data still buying new
   * vocabulary". Whitespace tokens, matching the corpus token ops.
   * Returns ONE row: (n_tokens, vocab, singletons, doubletons,
   * p_unseen, coverage, chao1).
   *
   * Scale shape: token counts (one shuffle), then the KB-sized
   * frequency-of-frequencies reduction — never a second corpus pass.
   */
  def vocabRichness(df: DataFrame, textCol: String): DataFrame = {
    val tf = df.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("__w"))
      .where(col("__w") =!= "")
      .groupBy("__w").agg(count(lit(1)).as("__c"))
    tf.agg(sum(col("__c")).cast("double").as("__n"),
        count(lit(1)).cast("double").as("__v"),
        sum(when(col("__c") === 1, 1.0).otherwise(0.0)).as("__n1"),
        sum(when(col("__c") === 2, 1.0).otherwise(0.0)).as("__n2"))
      .select(col("__n").cast("long").as("n_tokens"),
        col("__v").cast("long").as("vocab"),
        col("__n1").cast("long").as("singletons"),
        col("__n2").cast("long").as("doubletons"),
        (col("__n1") / col("__n")).as("p_unseen"),
        (lit(1.0) - col("__n1") / col("__n")).as("coverage"),
        when(col("__n2") > 0,
          col("__v") + col("__n1") * col("__n1") / (col("__n2") * 2))
          .as("chao1"))
  }

  /**
   * TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
   * the word co-occurrence graph — adjacency edges (bigrams) with
   * corpus count ≥ `minCount`, symmetrized — then the top-k terms by
   * rank. Damping and the fixed iteration count come from
   * [[graft.ops.Graph.pageRank]], so the scores replay exactly in any
   * engine (no convergence test). Returns k rows: (term, rank).
   *
   * Scale shape: one corpus tokenize+bigram groupBy bounds the graph
   * by the VOCABULARY (count-≥-minCount edges), after which each
   * PageRank iteration is one keyed join over vocab-sized frames.
   */
  /**
   * "Fightin' words" (Monroe, Colaresi & Quinn 2008): which terms
   * distinguish the even-id from the odd-id half of the corpus, by
   * log-odds ratio with an informative Dirichlet prior (α_w
   * proportional to the pooled frequency, α₀ total mass) and its
   * z-score — the statistically honest alternative to raw
   * frequency-ratio "trending terms", which over-ranks rare words.
   * Returns the top-k terms by |z|: (term, n_a, n_b, log_odds, z).
   *
   * Scale shape: two corpus term counts, a pooled-prior join, one
   * vocab-sized score frame, top-k bounded sort.
   */
  def fightinWords(df: DataFrame, idCol: String, textCol: String,
      alpha0: Double = 10.0, k: Int = 20): DataFrame = {
    require(alpha0 > 0 && k >= 1 && k <= 1000,
      "fightinWords: alpha0 > 0, k in 1..1000")
    def counts(side: DataFrame) =
      side.select(explode(words(col(textCol))).as("__t"))
        .groupBy("__t").agg(count(lit(1)).cast("double").as("__c"))
    val a = counts(df.where(col(idCol) % 2 === 0))
    val b = counts(df.where(col(idCol) % 2 === 1))
    val joined = a.select(col("__t"), col("__c").as("__ca"))
      .join(b.select(col("__t"), col("__c").as("__cb")), Seq("__t"),
        "full_outer")
      .na.fill(0.0, Seq("__ca", "__cb"))
      .localCheckpoint() // totals + prior + scores all read it
    val tot = broadcast(joined.agg(sum(col("__ca")).as("__na"),
      sum(col("__cb")).as("__nb")))
    val scored = joined.crossJoin(tot)
      .withColumn("__aw",
        (col("__ca") + col("__cb")) * alpha0 /
          (col("__na") + col("__nb")))
      .withColumn("__d",
        log((col("__ca") + col("__aw")) /
          (col("__na") + lit(alpha0) - col("__ca") - col("__aw"))) -
          log((col("__cb") + col("__aw")) /
            (col("__nb") + lit(alpha0) - col("__cb") - col("__aw"))))
      .withColumn("__s2",
        lit(1.0) / (col("__ca") + col("__aw")) +
          lit(1.0) / (col("__cb") + col("__aw")))
      .withColumn("__z", col("__d") / sqrt(col("__s2")))
    scored
      .select(col("__t").as("term"), col("__ca").cast("long").as("n_a"),
        col("__cb").cast("long").as("n_b"), col("__d").as("log_odds"),
        col("__z").as("z"))
      .orderBy(abs(col("z")).desc, col("term").asc)
      .limit(k)
  }

  /**
   * Rank-stability diagnostics between the term-frequency rankings of
   * two corpus halves (even vs odd `idCol`): truncated rank-biased
   * overlap RBO@k = (1−p)·Σ_{d≤k} p^{d−1}·|A_d ∩ B_d|/d (top-weighted
   * — churn at rank 3 costs more than churn at rank 40), the plain
   * overlap fraction at k, and the Spearman footrule Σ|r_A − r_B|
   * over terms in both top-k lists. Rankings order by (count DESC,
   * term ASC) — integer counts + a total tiebreak, so the lists are
   * engine-identical. Returns ONE row: (k, n_shared, overlap_at_k,
   * rbo, footrule).
   *
   * Scale shape: two corpus term counts (one groupBy each), two
   * top-k limits, then everything is ≤2k rows (a k-row depth grid
   * joined against the ≤2k union).
   */
  def rankStability(df: DataFrame, idCol: String, textCol: String,
      k: Int = 50, p: Double = 0.9): DataFrame = {
    require(k >= 1 && k <= 1000, s"rankStability: k 1..1000, got $k")
    require(p > 0 && p < 1, s"rankStability: p in (0,1), got $p")
    import org.apache.spark.sql.expressions.Window
    def topK(side: DataFrame, tag: String): DataFrame = {
      val counts = side.select(explode(words(col(textCol))).as("__t"))
        .groupBy("__t").agg(count(lit(1)).as("__c"))
      // global top-k: the vocab-sized count frame first LIMITS to k
      // per engine-deterministic (count, term) order via a bounded
      // sort — orderBy+limit is a TakeOrderedAndProject, not a
      // single-partition window
      counts.orderBy(col("__c").desc, col("__t").asc).limit(k)
        .withColumn(s"__r$tag",
          row_number().over(
            Window.partitionBy(lit(1))
              .orderBy(col("__c").desc, col("__t").asc)))
        .select(col("__t"), col(s"__r$tag"))
    }
    val a = topK(df.where(col(idCol) % 2 === 0), "a")
    val b = topK(df.where(col(idCol) % 2 === 1), "b")
    val joined = a.join(b, Seq("__t"), "full_outer").localCheckpoint()
    val depths = df.sparkSession.createDataFrame(
      (1 to k).map(d => Tuple1(d))).toDF("__d")
    val xd = depths.crossJoin(joined)
      .where(col("__ra") <= col("__d") && col("__rb") <= col("__d"))
      .groupBy("__d").agg(count(lit(1)).cast("double").as("__x"))
    val rbo = depths.join(xd, Seq("__d"), "left")
      .na.fill(0.0, Seq("__x"))
      .agg(sum(pow(lit(p), col("__d") - 1) * col("__x") / col("__d"))
        .as("__s"))
      .select((lit(1.0 - p) * col("__s")).as("rbo"))
    val shared = joined
      .agg(sum(when(col("__ra").isNotNull && col("__rb").isNotNull, 1L)
        .otherwise(0L)).as("n_shared"),
        sum(when(col("__ra").isNotNull && col("__rb").isNotNull,
          abs(col("__ra") - col("__rb")))).as("footrule"))
    shared.crossJoin(rbo)
      .select(lit(k).as("k"), col("n_shared"),
        (col("n_shared").cast("double") / k).as("overlap_at_k"),
        col("rbo"), col("footrule"))
  }

  /**
   * ROUGE-1/ROUGE-2 overlap scores for given document pairs — the
   * clipped-count n-gram precision/recall/F the summarization and
   * dedup-diagnostics literature uses: overlap = Σ_g min(c_a(g),
   * c_b(g)), recall against doc_a, precision against doc_b. Returns
   * one row per pair: (doc_a, doc_b, r1_precision, r1_recall, r1_f,
   * r2_f); pairs whose b-side has no bigrams get r2_f NULL.
   *
   * Scale shape: per-doc n-gram count frames (one tokenize pass each),
   * then PAIR-keyed joins — cost scales with |pairs|·|shared terms|,
   * never corpus²; the pair list is the caller's (bucketed LSH/
   * Jaccard) candidate set, already bounded.
   */
  def rougePairs(df: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, aCol: String = "doc_a",
      bCol: String = "doc_b"): DataFrame = {
    val w = words(col(textCol))
    val toks = df.select(col(idCol).as("__id"), w.as("__w"))
      .localCheckpoint() // read by both n-gram passes
    val uni = toks.select(col("__id"), explode(col("__w")).as("__g"))
      .groupBy("__id", "__g").agg(count(lit(1)).as("__c"))
    val bi = toks.where(size(col("__w")) >= 2)
      .select(col("__id"), explode(arrays_zip(
        slice(col("__w"), lit(1), size(col("__w")) - 1).as("x"),
        slice(col("__w"), lit(2), size(col("__w")) - 1).as("y"))).as("p"))
      .select(col("__id"),
        concat_ws(" ", col("p.x"), col("p.y")).as("__g"))
      .groupBy("__id", "__g").agg(count(lit(1)).as("__c"))
    val p = pairs.select(col(aCol).as("__a"), col(bCol).as("__b"))
      .localCheckpoint()
    def overlap(grams: DataFrame, tag: String): DataFrame = {
      val tot = grams.groupBy("__id")
        .agg(sum(col("__c")).cast("double").as("__t"))
      val ov = p
        .join(grams.select(col("__id").as("__a"), col("__g"),
          col("__c").as("__ca")), Seq("__a"))
        .join(grams.select(col("__id").as("__b"), col("__g"),
          col("__c").as("__cb")), Seq("__b", "__g"))
        .groupBy("__a", "__b")
        .agg(sum(least(col("__ca"), col("__cb"))).cast("double")
          .as(s"__o$tag"))
      p.join(ov, Seq("__a", "__b"), "left")
        .na.fill(0.0, Seq(s"__o$tag"))
        .join(tot.select(col("__id").as("__a"), col("__t").as(s"__ta$tag")),
          Seq("__a"), "left")
        .join(tot.select(col("__id").as("__b"), col("__t").as(s"__tb$tag")),
          Seq("__b"), "left")
    }
    val u = overlap(uni, "1")
    val b = overlap(bi, "2")
    def f(o: Column, ta: Column, tb: Column) = {
      val r = o / ta
      val pr = o / tb
      when(ta > 0 && tb > 0 && o > 0, lit(2.0) * pr * r / (pr + r))
        .otherwise(when(ta > 0 && tb > 0, lit(0.0)))
    }
    u.join(b.select(col("__a"), col("__b"), col("__o2"), col("__ta2"),
        col("__tb2")), Seq("__a", "__b"))
      .select(col("__a").as(aCol), col("__b").as(bCol),
        (col("__o1") / col("__tb1")).as("r1_precision"),
        (col("__o1") / col("__ta1")).as("r1_recall"),
        f(col("__o1"), col("__ta1"), col("__tb1")).as("r1_f"),
        f(col("__o2"), col("__ta2"), col("__tb2")).as("r2_f"))
  }

  /**
   * Corpus diversity as distinct-n ratios (Li et al. 2016): for each
   * n-gram order, distinct grams / total grams — the standard
   * generation-diversity readout (a templated or mode-collapsed corpus
   * scores near 0, fresh prose near 1 at higher orders). Returns one
   * row per order n = 1..maxN: (n, total_ngrams, distinct_ngrams,
   * distinct_ratio).
   *
   * Scale shape: one tokenize pass per order into a map-side-combined
   * gram groupBy; totals and distincts both fall out of the same
   * vocab-sized count frame.
   */
  def distinctNgrams(df: DataFrame, textCol: String,
      maxN: Int = 3): DataFrame = {
    require(maxN >= 1 && maxN <= 5, s"distinctNgrams: maxN 1..5, got $maxN")
    val w = words(col(textCol))
    val toks = df.select(w.as("__w")).localCheckpoint()
    val perOrder = (1 to maxN).map { n =>
      val grams =
        if (n == 1) toks.select(explode(col("__w")).as("__g"))
        else toks.where(size(col("__w")) >= n)
          .select(explode(arrays_zip(
            (0 until n).map(i => slice(col("__w"), lit(i + 1),
              size(col("__w")) - (n - 1)).as(s"w$i")): _*)).as("p"))
          .select(concat_ws(" ",
            (0 until n).map(i => col(s"p.w$i")): _*).as("__g"))
      grams.groupBy("__g").agg(count(lit(1)).as("__c"))
        .agg(lit(n).as("n"), sum(col("__c")).as("total_ngrams"),
          count(lit(1)).as("distinct_ngrams"))
    }
    perOrder.reduce(_ unionByName _)
      .withColumn("distinct_ratio",
        col("distinct_ngrams").cast("double") / col("total_ngrams"))
  }

  def textRank(df: DataFrame, textCol: String, minCount: Long = 5,
      k: Int = 20, iterations: Int = 3): DataFrame = {
    val w = words(col(textCol))
    val toks = df.select(w.as("__w"))
    val bi = toks.where(size(col("__w")) >= 2)
      .select(explode(arrays_zip(
        slice(col("__w"), lit(1), size(col("__w")) - 1).as("x"),
        slice(col("__w"), lit(2), size(col("__w")) - 1).as("y"))).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
      .where(col("c_xy") >= minCount && col("x") =!= col("y"))
    val und = bi.select(col("x").as("src"), col("y").as("dst"))
      .unionByName(bi.select(col("y").as("src"), col("x").as("dst")))
    Graph.pageRank(und, "src", "dst", iterations)
      .select(col("node").as("term"), col("rank"))
      .orderBy(col("rank").desc, col("term").asc)
      .limit(k)
  }

  /**
   * LM-score decile × source mixture: bucket documents into exact
   * deciles of their [[unigramLogLikelihood]] average log-probability
   * and report each source's share of each decile — "which sources
   * dominate the low-quality tail", the decision table behind
   * re-weighting or dropping sources before training. Deciles cut at
   * exact-DISC thresholds (order statistics of the already-rounded
   * score, so both engines bucket identically).
   *
   * Scale shape: scoring is the LM op's two grouped passes; thresholds
   * are ONE exact-percentile row broadcast back; the mix is a (decile,
   * source) groupBy. Returns (decile, source, n_docs, share_of_decile)
   * for occupied cells.
   */
  def lmScoreDecileMix(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, ref: DataFrame, refTextCol: String): DataFrame = {
    val scores = unigramLogLikelihood(df, idCol, textCol, ref, refTextCol)
      .select(col(idCol), col("avg_logprob"))
    val scored = df.select(col(idCol), col(groupCol).as("source"))
      .join(scores, Seq(idCol))
      .localCheckpoint()
    val qs = broadcast(graft.analysis.AnalysisPlanner
      .exactPercentilesDisc(scored, "avg_logprob",
        (1 to 9).map(i => s"__q$i" -> i / 10.0), Nil))
    val dec = scored.crossJoin(qs)
      .select(col("source"),
        (1 to 9).map(i =>
          when(col("avg_logprob") > col(s"__q$i"), 1).otherwise(0))
          .reduce(_ + _).as("decile"))
    val cell = dec.groupBy("decile", "source")
      .agg(count(lit(1)).as("n_docs"))
    val per = cell.groupBy("decile")
      .agg(sum(col("n_docs")).as("__tot"))
    cell.join(broadcast(per), Seq("decile"))
      .select(col("decile"), col("source"), col("n_docs"),
        (col("n_docs") / col("__tot")).as("share_of_decile"))
  }

  /**
   * Per-source text-profile outlier screen: each source's mean
   * document length, mean word length, stopword ratio, and type-token
   * ratio, z-scored against the across-source distribution — the
   * 5-minute "which source doesn't look like text" triage before the
   * per-document [[qualityFlags]] machinery runs. |z| > 2 on any axis
   * flags the source.
   *
   * Scale shape: one corpus token pass folded to per-source aggregates
   * (≤ |sources| rows); the z frame is a broadcast 1-row moment
   * aggregate over those. Returns one row per source.
   */
  def sourceProfileOutliers(df: DataFrame, groupCol: String,
      textCol: String,
      stopwords: Seq[String] = langMarkers("en")): DataFrame = {
    val toks = df
      .where(col(groupCol).isNotNull && col(textCol).isNotNull)
      .select(col(groupCol).cast("string").as("source"),
        explode(words(col(textCol))).as("__t"))
      .where(length(col("__t")) > 0)
    val per = toks.groupBy("source")
      .agg(count(lit(1)).cast("double").as("__ntok"),
        avg(length(col("__t")).cast("double")).as("mean_word_len"),
        avg(when(col("__t").isin(stopwords: _*), 1.0).otherwise(0.0))
          .as("stopword_ratio"),
        (countDistinct(col("__t")).cast("double") / count(lit(1)))
          .as("type_token_ratio"))
    val docs = df.where(col(groupCol).isNotNull && col(textCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("source"))
      .agg(count(lit(1)).as("n_docs"))
    val joined = per.join(docs, Seq("source"))
      .withColumn("mean_doc_tokens", col("__ntok") / col("n_docs"))
      .localCheckpoint()
    val st = broadcast(joined.agg(
      avg(col("mean_doc_tokens")).as("__m1"),
      sqrt(avg(col("mean_doc_tokens") * col("mean_doc_tokens")) -
        avg(col("mean_doc_tokens")) * avg(col("mean_doc_tokens")))
        .as("__s1"),
      avg(col("stopword_ratio")).as("__m2"),
      sqrt(avg(col("stopword_ratio") * col("stopword_ratio")) -
        avg(col("stopword_ratio")) * avg(col("stopword_ratio")))
        .as("__s2"),
      avg(col("type_token_ratio")).as("__m3"),
      sqrt(avg(col("type_token_ratio") * col("type_token_ratio")) -
        avg(col("type_token_ratio")) * avg(col("type_token_ratio")))
        .as("__s3")))
    val zc = (v: Column, m: Column, s: Column) => when(s > 0, (v - m) / s)
    joined.crossJoin(st)
      .select(col("source"), col("n_docs"), col("mean_doc_tokens"),
        col("mean_word_len"), col("stopword_ratio"),
        col("type_token_ratio"),
        zc(col("mean_doc_tokens"), col("__m1"), col("__s1")).as("z_len"),
        zc(col("stopword_ratio"), col("__m2"), col("__s2")).as("z_stop"),
        zc(col("type_token_ratio"), col("__m3"), col("__s3")).as("z_ttr"))
      .withColumn("flagged",
        abs(coalesce(col("z_len"), lit(0.0))) > 2 ||
        abs(coalesce(col("z_stop"), lit(0.0))) > 2 ||
        abs(coalesce(col("z_ttr"), lit(0.0))) > 2)
  }

  /**
   * Per-source Zipf slope + hapax share: regress log frequency on log
   * rank over each source's top-`topM` terms and report the share of
   * its vocabulary seen exactly once — natural text sits near slope −1
   * with a large hapax mass; templated/generated slices flatten both.
   * The per-source companion of the corpus-level [[zipfSlope]].
   *
   * Scale shape: (source, term) counts in one pass; ranking is a
   * window PARTITIONED by source (per-partition size = source
   * vocabulary ≪ corpus); the OLS folds ≤ topM rows per source.
   */
  def zipfHapaxBySource(df: DataFrame, groupCol: String, textCol: String,
      topM: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topM >= 5, "zipfHapaxBySource: topM >= 5")
    val counts = df
      .where(col(groupCol).isNotNull && col(textCol).isNotNull)
      .select(col(groupCol).cast("string").as("source"),
        explode(words(col(textCol))).as("__t"))
      .where(length(col("__t")) > 0)
      .groupBy("source", "__t").agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val hapax = counts.groupBy("source")
      .agg(count(lit(1)).as("vocab"),
        (sum(when(col("__c") === 1, 1.0).otherwise(0.0)) / count(lit(1)))
          .as("hapax_share"))
    val w = Window.partitionBy("source")
      .orderBy(col("__c").desc, col("__t"))
    val top = counts.withColumn("__r", row_number().over(w))
      .where(col("__r") <= topM)
      .select(col("source"), log(col("__r").cast("double")).as("__lx"),
        log(col("__c").cast("double")).as("__ly"))
    val ols = top.groupBy("source")
      .agg(count(lit(1)).cast("double").as("__k"),
        sum(col("__lx")).as("__sx"), sum(col("__ly")).as("__sy"),
        sum(col("__lx") * col("__lx")).as("__sxx"),
        sum(col("__lx") * col("__ly")).as("__sxy"),
        sum(col("__ly") * col("__ly")).as("__syy"))
    val sxxC = col("__sxx") - col("__sx") * col("__sx") / col("__k")
    val sxyC = col("__sxy") - col("__sx") * col("__sy") / col("__k")
    val syyC = col("__syy") - col("__sy") * col("__sy") / col("__k")
    hapax.join(ols, Seq("source"))
      .select(col("source"), col("vocab"), col("hapax_share"),
        col("__k").cast("long").as("n_ranked"),
        when(sxxC > 0, sxyC / sxxC).as("zipf_slope"),
        when(sxxC > 0 && syyC > 0, sxyC * sxyC / (sxxC * syyC)).as("r2"))
  }

  /**
   * Normalized Kendall tau distance between two rankings of the same
   * groups by two different metrics (here: total tokens vs vocabulary
   * size) — the FULL-LIST disagreement read next to
   * [[rankBiasedOverlap]]'s top-weighted one: the share of group pairs
   * the two rankings order differently. Rankings break ties by group
   * id, so both engines produce identical permutations.
   *
   * Scale shape: both metrics come from ONE (group, term) grouped
   * pass; ranks from broadcast triangular self-joins over the
   * ≤|groups| frames; the pair scan is |groups|²/2.
   * Returns 1 row: (n_groups, n_pairs, n_discordant, tau_distance).
   */
  def rankingDisagreement(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val per = df
      .where(col(groupCol).isNotNull && col(textCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"),
        explode(words(col(textCol))).as("__t"))
      .where(length(col("__t")) > 0)
      .groupBy("__g", "__t").agg(count(lit(1)).as("__c"))
      .groupBy("__g")
      .agg(sum(col("__c")).as("__tok"), count(lit(1)).as("__voc"))
      .localCheckpoint()
    def rank(metric: String, out: String) = {
      val t2 = per.select(col("__g").as("__g2"),
        col(metric).as("__m2"))
      per.join(broadcast(t2),
          col("__m2") > col(metric) ||
            (col("__m2") === col(metric) && col("__g2") < col("__g")),
          "left")
        .groupBy("__g").agg((count(col("__g2")) + 1).as(out))
    }
    val ranked = rank("__tok", "__ra").join(rank("__voc", "__rb"),
      Seq("__g")).localCheckpoint()
    val other = ranked.select(col("__g").as("__h"),
      col("__ra").as("__ra2"), col("__rb").as("__rb2"))
    val pairs = ranked.join(other, col("__g") < col("__h"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when((col("__ra") < col("__ra2")) =!=
          (col("__rb") < col("__rb2")), 1L).otherwise(0L))
          .as("n_discordant"))
    pairs.crossJoin(broadcast(per.agg(count(lit(1)).as("n_groups"))))
      .select(col("n_groups"), col("n_pairs"), col("n_discordant"),
        when(col("n_pairs") > 0,
          col("n_discordant").cast("double") / col("n_pairs"))
          .as("tau_distance"))
  }

  /**
   * Rank-biased overlap (Webber et al. 2010) between two groups'
   * term-frequency rankings: the top-weighted list-similarity readout
   * for "did this source's vocabulary ordering drift" — unlike plain
   * set overlap it discounts depth geometrically (persistence `p`), so
   * disagreement at rank 2 costs more than at rank 19. Reports the
   * depth-truncated RBO and the standard extrapolated RBO_ext
   * (truncated + p^D · overlap@D).
   *
   * Scale shape: per-group term counts are one corpus groupBy; each
   * top-D list is a distributed TakeOrdered (orderBy + limit — NO
   * unpartitioned window over the vocabulary); ranks inside the ≤ D-row
   * lists come from a broadcast triangular self-join (the PrefixSum
   * offsets trick at list size); everything after is ≤ D² rows.
   */
  def rankBiasedOverlap(df: DataFrame, groupCol: String, textCol: String,
      groupA: String, groupB: String, depth: Int = 20,
      p: Double = 0.9): DataFrame = {
    require(depth >= 1 && depth <= 1000, "rankBiasedOverlap: depth 1..1000")
    require(p > 0 && p < 1, "rankBiasedOverlap: p in (0,1)")
    val counts = df
      .where(col(groupCol).isin(groupA, groupB) && col(textCol).isNotNull)
      .select(col(groupCol).as("__g"),
        explode(split(col(textCol), " ")).as("__t"))
      .where(length(col("__t")) > 0)
      .groupBy("__g", "__t").agg(count(lit(1)).as("__n"))
      .localCheckpoint()
    def ranked(g: String) = {
      val t = counts.where(col("__g") === g)
        .orderBy(col("__n").desc, col("__t")).limit(depth)
        .select(col("__t"), col("__n"))
      val t2 = t.select(col("__t").as("__t2"), col("__n").as("__n2"))
      t.join(broadcast(t2),
          col("__n2") > col("__n") ||
            (col("__n2") === col("__n") && col("__t2") < col("__t")),
          "left")
        .groupBy("__t").agg((count(col("__t2")) + 1).as("__r"))
    }
    val joined = ranked(groupA)
      .join(ranked(groupB).select(col("__t"), col("__r").as("__rb")),
        Seq("__t"))
      .select(greatest(col("__r"), col("__rb")).as("__m"))
      .localCheckpoint()
    val ds = df.sparkSession.range(1, depth + 1L).toDF("__d")
    val ad = ds.join(broadcast(joined), col("__m") <= col("__d"), "left")
      .groupBy("__d").agg(count(col("__m")).cast("double").as("__a"))
    ad.agg(
        sum(lit(1.0 - p) * pow(lit(p), col("__d") - 1) * col("__a") /
          col("__d")).as("__rbo"),
        max(when(col("__d") === depth, col("__a"))).as("__alast"),
        count(lit(1)).as("__nd"))
      .crossJoin(broadcast(joined.agg(count(lit(1)).as("n_common"))))
      .select(lit(depth).as("depth"), col("n_common"),
        (col("__alast") / depth).as("overlap_at_depth"),
        col("__rbo").as("rbo_trunc"),
        (col("__rbo") + lit(math.pow(p, depth)) * col("__alast") / depth)
          .as("rbo_ext"))
  }

  /**
   * Weighted (Ruzicka) Jaccard similarity between every pair of
   * groups' term RELATIVE-frequency vectors: Σ min(w_a, w_b) /
   * Σ max(w_a, w_b) — the distribution-aware sibling of set Jaccard
   * and the symmetric complement of the KL/JS divergence drift reads.
   * Because each group's weights sum to 1, Σ max = 2 − Σ min, so ONLY
   * shared terms ever join: Σ min over the term-keyed equi-join, no
   * full-outer, no per-pair vocabulary scan.
   *
   * Scale shape: one corpus groupBy to (group, term) counts, one
   * group-total join, then a term-keyed self-join whose fan-out per
   * term is bounded by the (small) group count — shuffle on term,
   * output ≤ |groups|² rows.
   */
  def weightedJaccardGroups(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val tf = df.where(col(groupCol).isNotNull && col(textCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"),
        explode(split(col(textCol), " ")).as("__t"))
      .where(length(col("__t")) > 0)
      .groupBy("__g", "__t").agg(count(lit(1)).cast("double").as("__n"))
    val tot = tf.groupBy("__g").agg(sum(col("__n")).as("__tot"))
    val rel = tf.join(tot, Seq("__g"))
      .select(col("__g"), col("__t"), (col("__n") / col("__tot")).as("__w"))
      .localCheckpoint()
    rel.as("a")
      .join(rel.as("b"),
        col("a.__t") === col("b.__t") && col("a.__g") < col("b.__g"))
      .groupBy(col("a.__g").as("src_a"), col("b.__g").as("src_b"))
      .agg(count(lit(1)).as("n_shared_terms"),
        sum(least(col("a.__w"), col("b.__w"))).as("__smin"))
      .select(col("src_a"), col("src_b"), col("n_shared_terms"),
        (col("__smin") / (lit(2.0) - col("__smin")))
          .as("weighted_jaccard"))
  }

  /**
   * Zipf–Mandelbrot rank-frequency fit: OLS of ln f on ln(rank + q)
   * over a small integer grid of the Mandelbrot offset q, keeping
   * the best-R² fit — the flattened-head correction that plain Zipf
   * (q = 0) always misses on real corpora, where the top handful of
   * types sit BELOW the power line. Ranks order by (freq desc, term
   * asc) so ties are deterministic; R² rounds to 1e-9 before the
   * grid argmax so a last-bit ln() wobble can't flip the chosen q.
   *
   * Scale shape: one token groupBy, ranks via freq-cell PrefixSum +
   * a per-freq-block window (partitioned), a (maxQ+1)-way explode of
   * the type frame, one groupBy(q) reduce + TakeOrdered(1). Returns
   * 1 row: (n_types, best_q, slope, intercept, r2).
   */
  def zipfMandelbrot(df: DataFrame, textCol: String,
      maxQ: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxQ >= 0 && maxQ <= 100,
      s"zipfMandelbrot: maxQ in [0, 100], got $maxQ")
    val tf = df.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("__t"))
      .where(length(col("__t")) > 0)
      .groupBy("__t").agg(count(lit(1)).cast("double").as("__f"))
      .localCheckpoint()
    val fc = tf.groupBy("__f").agg(count(lit(1)).as("__cnt"))
    val pre = graft.analysis.PrefixSum
      .exclusive(fc, "__f", Seq("__cnt" -> "__ex"))
    val tot = broadcast(pre.agg(sum(col("__cnt")).as("__V")))
    val ranked = tf
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__f")).orderBy(col("__t"))))
      .join(pre, Seq("__f")).crossJoin(tot)
      .select((col("__V") - col("__ex") - col("__cnt") + col("__rn"))
        .cast("double").as("__r"), log(col("__f")).as("__y"),
        col("__V"))
    val grid = ranked
      .withColumn("q", explode(sequence(lit(0), lit(maxQ))))
      .withColumn("__x", log(col("__r") + col("q")))
      .groupBy("q")
      .agg(max(col("__V")).as("__V"),
        count(lit(1)).cast("double").as("__m"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__y") * col("__y")).as("__syy"))
    val b = (col("__m") * col("__sxy") - col("__sx") * col("__sy")) /
      (col("__m") * col("__sxx") - col("__sx") * col("__sx"))
    val r2 = ((col("__m") * col("__sxy") - col("__sx") * col("__sy")) *
      (col("__m") * col("__sxy") - col("__sx") * col("__sy"))) /
      ((col("__m") * col("__sxx") - col("__sx") * col("__sx")) *
        (col("__m") * col("__syy") - col("__sy") * col("__sy")))
    grid.select(col("__V").as("n_types"), col("q"),
        b.as("slope"),
        ((col("__sy") - b * col("__sx")) / col("__m")).as("intercept"),
        round(r2, 9).as("r2"))
      .orderBy(col("r2").desc, col("q").asc).limit(1)
      .select(col("n_types"), col("q").as("best_q"), col("slope"),
        col("intercept"), col("r2"))
  }

  /**
   * Exact rarefaction (species-accumulation) curve of the corpus
   * vocabulary: the expected distinct-type count E[V(m)] in a
   * WITHOUT-replacement subsample of m tokens, at m = ⌊f·N⌋ for each
   * requested fraction — the curve that says whether scraping 2×
   * more of the same source buys new vocabulary or just repeats it
   * (complements q*_heaps_law's parametric fit with the exact
   * finite-sample expectation). A type with count n survives with
   * probability 1 − C(N−n, m)/C(N, m); the ratio is computed as
   * exp Σᵢ₌₀^{n−1} ln((N−m−i)/(N−i)) — an exact per-type index
   * explode totalling N rows per fraction, no gamma functions.
   *
   * Scale shape: one token groupBy → type frame; per fraction, a
   * sequence explode of Σn = N map-only rows into a groupBy(type) +
   * final reduce. Returns one row per fraction: (fraction, m,
   * n_tokens, n_types, expected_types, expected_share).
   */
  def rarefaction(df: DataFrame, textCol: String,
      fractions: Seq[Double] = Seq(0.1, 0.25, 0.5)): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(f => f > 0 && f < 1),
      "rarefaction: fractions in (0,1)")
    val tf = df.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("__t"))
      .where(length(col("__t")) > 0)
      .groupBy("__t")
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint()
    val tot = broadcast(tf.agg(sum(col("__n")).as("__ntot"),
      count(lit(1)).as("__V")))
    val fr = fractions.sorted.map { f =>
      val m = floor(col("__ntot") * f).cast("long")
      val perType = tf.crossJoin(tot)
        .select(col("__t"), col("__n"), col("__ntot"), col("__V"),
          m.as("__m"))
        .withColumn("__i", explode(sequence(lit(0L), col("__n") - 1)))
        .groupBy(col("__t"), col("__n"), col("__ntot"), col("__V"),
          col("__m"))
        .agg(sum(when(col("__n") > col("__ntot") - col("__m"), lit(0.0))
          .otherwise(log((col("__ntot") - col("__m") - col("__i"))
            .cast("double") / (col("__ntot") - col("__i"))))).as("__s"))
        .select(col("__ntot"), col("__V"), col("__m"),
          when(col("__n") > col("__ntot") - col("__m"), lit(1.0))
            .otherwise(lit(1.0) - exp(col("__s"))).as("__p"))
      perType.groupBy(col("__ntot"), col("__V"), col("__m"))
        .agg(sum(col("__p")).as("expected_types"))
        .select(lit(f).as("fraction"), col("__m").as("m"),
          col("__ntot").as("n_tokens"), col("__V").as("n_types"),
          col("expected_types"),
          (col("expected_types") / col("__V")).as("expected_share"))
    }
    fr.reduce(_.unionByName(_))
  }

  /**
   * Character-trigram typicality score per group: every document's
   * char 3-grams are scored under the CORPUS-wide trigram MLE and
   * averaged per group — the gibberish/mojibake/encoding-damage
   * detector that word-level models miss (a doc of plausible words
   * in impossible character order scores fine on q112's word LM but
   * craters here). No OOV handling needed: the model is fit on the
   * same corpus it scores, so every trigram has mass.
   *
   * Scale shape: position explode (≤ |chars| rows) → two groupBys →
   * one model equi-join → per-group reduce. Returns one row per
   * group: (group, n_trigrams, avg_logprob, perplexity).
   */
  def charTrigramScore(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val tri = df
      .where(col(groupCol).isNotNull && col(textCol).isNotNull &&
        length(col(textCol)) >= 3)
      .select(col(groupCol).cast("string").as("__g"),
        col(textCol).as("__txt"))
      .withColumn("__i",
        explode(sequence(lit(1), length(col("__txt")) - 2)))
      .select(col("__g"), col("__txt").substr(col("__i"), lit(3))
        .as("__tr"))
      .groupBy("__g", "__tr")
      .agg(count(lit(1)).cast("double").as("__k"))
      .localCheckpoint()
    val model = tri.groupBy("__tr").agg(sum(col("__k")).as("__c"))
    val tot = broadcast(model.agg(sum(col("__c")).as("__nt")))
    tri.join(model, Seq("__tr")).crossJoin(tot)
      .groupBy(col("__g").as(groupCol))
      .agg(sum(col("__k")).cast("long").as("n_trigrams"),
        (sum(col("__k") * log(col("__c") / col("__nt"))) /
          sum(col("__k"))).as("avg_logprob"))
      .withColumn("perplexity", exp(-col("avg_logprob")))
  }

  /**
   * Interpolated Kneser–Ney bigram language model: fit on the train
   * split, score the held-out split — the smoothing that actually
   * wins for n-gram LMs (absolute discount + CONTINUATION-count
   * backoff, so "francisco" stops inheriting "san francisco"'s mass
   * in novel contexts). P(w|v) = max(c(vw) − D, 0)/c(v) +
   * D·N₁₊(v·)/c(v)·Pcont(w), Pcont(w) = N₁₊(·w)/N₁₊(··); a held-out
   * bigram whose w never occurs as a train continuation is OOV and
   * skipped (counted); an unseen CONTEXT v backs off to Pcont(w)
   * alone. c(v) is the bigram-sum context count, per the standard
   * formulation.
   *
   * Scale shape: token positions via posexplode, bigrams via a
   * per-doc partitioned lead window; all model tables are
   * groupBy-reduced and probed with equi-joins (the 1-row totals
   * broadcast); no collect. Returns 1 row: (n_train_bigrams,
   * n_bigram_types, n_heldout, n_scored, avg_logprob, perplexity).
   */
  def kneserNeyBigram(df: DataFrame, idCol: String, textCol: String,
      trainFlag: Column, discount: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(discount > 0 && discount < 1,
      s"KN discount must be in (0,1), got $discount")
    def bigrams(d: DataFrame): DataFrame = {
      val tok = d.select(col(idCol).as("__doc"),
          posexplode(split(col(textCol), " ")).as(Seq("__i", "__w")))
        .where(length(col("__w")) > 0)
      val wd = Window.partitionBy(col("__doc")).orderBy(col("__i"))
      tok.withColumn("__nx", lead(col("__w"), 1).over(wd))
        .where(col("__nx").isNotNull)
        .select(col("__w").as("__v"), col("__nx").as("__x"))
    }
    val train = df.where(trainFlag && col(textCol).isNotNull)
    val held = df.where(!trainFlag && col(textCol).isNotNull)
    val cvw = bigrams(train).groupBy("__v", "__x")
      .agg(count(lit(1)).as("__cvw")).localCheckpoint()
    val ctx = cvw.groupBy("__v")
      .agg(sum(col("__cvw")).as("__cv"),
        count(lit(1)).as("__n1v"))
    val cont = cvw.groupBy("__x").agg(count(lit(1)).as("__n1w"))
    val tot = broadcast(cvw.agg(
      sum(col("__cvw")).as("__nbi"), count(lit(1)).as("__ntypes")))
    val ho = bigrams(held).groupBy("__v", "__x")
      .agg(count(lit(1)).as("__k"))
    val scored = ho
      .join(cvw, Seq("__v", "__x"), "left")
      .join(ctx, Seq("__v"), "left")
      .join(cont, Seq("__x"), "left")
      .crossJoin(tot)
      .select(col("__k"), col("__n1w"),
        when(col("__n1w").isNotNull,
          when(col("__cv").isNotNull,
            greatest(coalesce(col("__cvw"), lit(0L)).cast("double") -
              lit(discount), lit(0.0)) / col("__cv") +
              lit(discount) * col("__n1v") / col("__cv") *
              (col("__n1w").cast("double") / col("__ntypes")))
            .otherwise(col("__n1w").cast("double") / col("__ntypes")))
          .as("__p"))
    scored.agg(
        sum(col("__k")).as("n_heldout"),
        coalesce(sum(when(col("__p").isNotNull, col("__k"))), lit(0L))
          .as("n_scored"),
        sum(when(col("__p").isNotNull, col("__k") * log(col("__p"))))
          .as("__ll"))
      .crossJoin(tot)
      .select(col("__nbi").as("n_train_bigrams"),
        col("__ntypes").as("n_bigram_types"),
        col("n_heldout"), col("n_scored"),
        (col("__ll") / col("n_scored")).as("avg_logprob"),
        exp(-col("__ll") / col("n_scored")).as("perplexity"))
  }

  /**
   * RAKE keyword extraction over the whole corpus: candidate phrases
   * are maximal stopword/punctuation-free token runs (capped at
   * `maxPhraseLen` words), each word scored deg(w)/freq(w) over the
   * candidate set, each phrase by the sum of its member scores — the
   * zero-training keyphrase baseline that beats TF-IDF top-terms
   * (q30) on multi-word concepts. Phrases are aggregated corpus-wide
   * (deg/freq are corpus-level, so a phrase's score is identical at
   * every occurrence); ordering keys round the score to 1e-6 so the
   * top-k frontier can't hang on float-association noise.
   *
   * Scale shape: posexplode + per-doc island windows (partitioned by
   * doc), two groupBys, one bounded top-k. Returns ≤ topK rows:
   * (phrase, n_words, n_occurrences, score) by (score desc, phrase).
   */
  /**
   * Coverage-adjusted (Chao–Shen) token entropy per group: the
   * plug-in −Σp·ln p UNDERSTATES entropy on finite samples because
   * unseen vocabulary carries no term; Chao–Shen shrinks each
   * frequency by the Good–Turing sample coverage C = 1 − f₁/N and
   * reweights by the Horvitz–Thompson inclusion probability
   * 1 − (1 − Cp)^N — the estimator to trust when comparing the
   * lexical entropy of CORPORA OF DIFFERENT SIZES, where plug-in
   * gaps are mostly sample-size artifacts. Reported next to its
   * plug-in sibling so the correction itself is visible.
   *
   * Scale shape: one token groupBy, one per-group reduce, one
   * broadcast join back over the type frame, one final reduce.
   * Returns one row per group: (group, n_tokens, n_types,
   * f1_singletons, coverage, h_plugin, h_chao_shen).
   */
  def chaoShenEntropy(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val tf = df.where(col(groupCol).isNotNull && col(textCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"),
        explode(split(col(textCol), " ")).as("__t"))
      .where(length(col("__t")) > 0)
      .groupBy("__g", "__t")
      .agg(count(lit(1)).cast("double").as("__n"))
      .localCheckpoint()
    val per = tf.groupBy("__g")
      .agg(sum(col("__n")).as("__tok"),
        count(lit(1)).as("__V"),
        sum(when(col("__n") === 1.0, 1.0).otherwise(0.0)).as("__f1"))
    val joined = tf.join(broadcast(per), Seq("__g"))
      .select(col("__g"), col("__tok"), col("__V"), col("__f1"),
        (col("__n") / col("__tok")).as("__p"),
        ((lit(1.0) - col("__f1") / col("__tok")) * col("__n") /
          col("__tok")).as("__pc"))
    joined.groupBy(col("__g").as(groupCol))
      .agg(max(col("__tok")).cast("long").as("n_tokens"),
        max(col("__V")).as("n_types"),
        max(col("__f1")).cast("long").as("f1_singletons"),
        (lit(1.0) - max(col("__f1")) / max(col("__tok")))
          .as("coverage"),
        (-sum(col("__p") * log(col("__p")))).as("h_plugin"),
        (-sum(when(col("__pc") > 0,
          col("__pc") * log(col("__pc")) /
            (lit(1.0) - pow(lit(1.0) - col("__pc"), col("__tok"))))))
          .as("h_chao_shen"))
  }

  def rakeKeywords(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String] = langMarkers("en"),
      maxPhraseLen: Int = 4, topK: Int = 15): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.where(col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        posexplode(split(col(textCol), " ")).as(Seq("__i", "__w")))
      .where(length(col("__w")) > 0)
    val ns = tok.where(!col("__w").isInCollection(stopwords))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__id")).orderBy(col("__i"))))
      .withColumn("__g", col("__i") - col("__rn"))
    val phr = ns.groupBy("__id", "__g")
      .agg(count(lit(1)).as("__len"),
        array_join(transform(
          array_sort(collect_list(struct(col("__i"), col("__w")))),
          x => x("__w")), " ").as("phrase"))
      .where(col("__len") <= maxPhraseLen)
      .localCheckpoint()
    val members = ns.join(
      phr.select(col("__id"), col("__g"), col("__len"), col("phrase")),
      Seq("__id", "__g"))
    val ws = members.groupBy("__w")
      .agg(sum(col("__len")).as("__deg"), count(lit(1)).as("__freq"))
    val occ = members.join(ws, Seq("__w"))
      .groupBy(col("__id"), col("__g"), col("phrase"), col("__len"))
      .agg(sum(col("__deg").cast("double") / col("__freq"))
        .as("__score"))
    occ.groupBy("phrase")
      .agg(max(col("__len")).as("n_words"),
        count(lit(1)).as("n_occurrences"),
        max(round(col("__score"), 6)).as("score"))
      .orderBy(col("score").desc, col("phrase").asc)
      .limit(topK)
      .select(col("phrase"), col("n_words"), col("n_occurrences"),
        col("score"))
  }

  /**
   * Character-n-gram compressibility proxy: distinct n-grams over
   * total n-grams per document — a cheap LZ-dictionary stand-in that
   * flags low-entropy machine-generated / template text which WORD-
   * level repetition gates (the Gopher bigram fractions) miss when the
   * looping unit is sub-word or crosses token boundaries. Ratio near 1
   * = incompressible natural text; near 0 = one pattern looping.
   * Texts shorter than n contribute one truncated gram (ratio 1).
   *
   * Map-only: the gram array is built and deduped INSIDE one
   * projection (transform + array_distinct over an offsets sequence —
   * no explode, no shuffle); scales per-row like every doc-local op.
   * Returns (idCol, n_grams, distinct_grams, compress_ratio).
   */
  def charNgramCompressibility(df: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    require(n >= 2, "charNgramCompressibility: n >= 2")
    val grams = expr(
      s"transform(sequence(1, greatest(length($textCol) - ${n - 1}, 1))," +
        s" i -> substring($textCol, i, $n))")
    df.where(col(textCol).isNotNull)
      .select(col(idCol),
        size(grams).cast("long").as("n_grams"),
        size(array_distinct(grams)).cast("long").as("distinct_grams"))
      .withColumn("compress_ratio",
        col("distinct_grams").cast("double") / col("n_grams"))
  }

  /**
   * C4-style boilerplate mining: text units (sentences here — split on
   * `". "`) that recur across ≥ `minDocs` DISTINCT documents, with
   * their document frequency — the remove-list the C4 cleaning rule
   * ("drop any line occurring in ≥3 documents") consumes. Catches
   * navigation chrome / legal footers / template headers that per-doc
   * repetition stats never see because each document contains the unit
   * only once.
   *
   * Scale shape: explode → per-(doc, unit) distinct → one unit-keyed
   * count — the word-count topology; the output is DF-thresholded and
   * top-K bounded, so the result is a small remove-list whatever the
   * corpus size.
   */
  def boilerplateUnits(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 3, topK: Int = 50): DataFrame = {
    require(minDocs >= 2 && topK >= 1,
      "boilerplateUnits: minDocs >= 2, topK >= 1")
    df.select(col(idCol).as("__id"),
        explode(split(col(textCol), "\\. ")).as("unit"))
      .where(col("unit") =!= "")
      .distinct()
      .groupBy("unit").agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("unit").asc)
      .limit(topK)
  }
}
