package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting over a document corpus — the workhorse of
  * keyword extraction / lexical relevance scoring in data-curation
  * pipelines (e.g. topical filtering, query-based corpus slicing).
  *
  * Scale shape: term frequencies are one hash aggregation on
  * (doc, term) with map-side combine; document frequencies are a second
  * hash aggregation on term (vocabulary-sized, not corpus-sized); the
  * idf join is a vocab-keyed hash join that AQE converts to broadcast
  * when the vocabulary fits. The corpus count rides a broadcast
  * cross-join of a 1-row aggregate — no driver-side collect in the
  * plan. Top-k selection is a per-document window (partition = one
  * document's vocabulary, bounded by document length, never by corpus
  * size).
  */
object TfIdf {
  /** Smoothed idf: ln((N + 1) / (df + 1)) + 1 — strictly positive, so
    * every term of every doc gets a defined score. */
  private def idf(n: Column, df: Column): Column =
    log((n + lit(1)).cast("double") / (df + lit(1)).cast("double")) + lit(1.0)

  /** Per-document unigram surprisal: the mean −ln p(token) under the
    * corpus's own unigram distribution — a model-free quality/outlier
    * score (gibberish and boilerplate sit far from the corpus mean).
    * Same scale shape as topTerms: corpus term counts are one
    * vocab-sized aggregation, the total-token count is a broadcast
    * 1-row aggregate, and the per-doc mean is a hash aggregation on doc
    * id. Output: (id, n_tok, surprisal) rounded to 6. */
  def unigramSurprisal(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
    val freq = toks.groupBy("term").agg(count(lit(1)).as("cf"))
    val total = freq.agg(sum("cf").as("__tot"))
    toks.join(freq, "term")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        round(avg(-log(col("cf").cast("double") / col("__tot"))), 6)
          .as("surprisal"))
  }

  /** Per-document bigram log-perplexity under a Jelinek–Mercer
    * interpolated bigram LM trained on the corpus itself — the CCNet-
    * style (Wenzek et al., arXiv:1911.00359) perplexity signal used to
    * bucket pretraining data by fluency (boilerplate, gibberish, and
    * template text score far from the corpus mean; unigramSurprisal is
    * the order-0 version of the same idea).
    *
    *   P(w2|w1) = λ·c(w1,w2)/c(w1) + (1−λ)·c(w2)/T
    *   logppl(d) = mean over d's bigram positions of −ln P
    *
    * c(w1) is the corpus unigram count (not the context count — one
    * fewer aggregation, documented model choice), T the corpus token
    * total. Self-trained, every token is in-vocab, so P > 0 without
    * smoothing hyperparameters.
    *
    * Scale shape: tokenize once; bigram pairs are a map-only array zip
    * (no self-join); LM training is two hash aggregations (bigram and
    * unigram counts — the shuffles are linear in corpus size with
    * map-side combine, the classic n-gram count job); scoring joins doc
    * bigrams to the count tables on their natural keys and T rides a
    * broadcast 1-row aggregate. Docs with <2 tokens surface with
    * n_bigrams = 0 and null logppl rather than vanishing. Output:
    * (id, n_bigrams, logppl) rounded to 6. */
  def bigramLogPerplexity(docs: DataFrame, idCol: String, textCol: String,
                          lambda: Double = 0.9): DataFrame = {
    require(lambda > 0 && lambda < 1, "lambda must be in (0, 1)")
    val toksOf = TextAnalysis.tokens(lower(col(textCol)))
    val withToks = docs.select(col(idCol), toksOf.as("__t"))
    val bigrams = withToks.select(col(idCol),
      explode(when(size(col("__t")) >= 2,
        transform(sequence(lit(1), size(col("__t")) - 1), i =>
          struct(element_at(col("__t"), i.cast("int")).as("w1"),
                 element_at(col("__t"), (i + lit(1)).cast("int")).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
        .as("__b"))
      .select(col(idCol), col("__b.w1"), col("__b.w2"))
    val uni = withToks.select(explode(col("__t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("__c"))
    val tot = uni.agg(sum("__c").cast("double").as("__T"))
    val bg = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("__c12"))
    val p = lit(lambda) * col("__c12").cast("double") / col("__c1") +
      lit(1.0 - lambda) * col("__c2").cast("double") / col("__T")
    val scored = bigrams
      .join(bg, Seq("w1", "w2"))
      .join(uni.select(col("w").as("w1"), col("__c").cast("double").as("__c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("__c").cast("double").as("__c2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(-log(p)), 6).as("logppl"))
    // left join back so short docs (<2 tokens) keep a row
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("logppl"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., arXiv:1911.00359
    * §4.3): rank the corpus by LM log-perplexity and cut it into
    * `buckets` equal-mass quality tiers — the classic head/middle/tail
    * split used to select or re-weight pretraining data by fluency.
    * Docs too short to score (no bigram) land in bucket 0.
    *
    * Scale shape: the perplexity pass is [[bigramLogPerplexity]]'s
    * count-aggregation plan; the tier boundaries are ONE 1-row corpus
    * aggregate broadcast to a map-only assignment — no global sort, no
    * window. Exact interpolated `percentile` keeps the DuckDB twin
    * bit-replayable; at 100 TB swap in `approx_percentile` — same
    * 1-row broadcast plan shape, boundary precision is the only trade.
    * Output: (id, n_bigrams, logppl, bucket) with bucket 1..buckets
    * ascending in perplexity (1 = most fluent). */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        buckets: Int = 3, lambda: Double = 0.9): DataFrame = {
    require(buckets >= 2, s"perplexityBuckets: buckets=$buckets must be >= 2")
    // persisted: the boundary aggregate AND the assignment both read it —
    // without this the whole bigram-LM lineage (a multi-join corpus
    // pass) executes twice in one plan
    val ppl = bigramLogPerplexity(docs, idCol, textCol, lambda)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fracs = (1 until buckets).map(i => i.toDouble / buckets)
    val bounds = ppl.where(col("logppl").isNotNull)
      .agg(percentile(col("logppl"),
        typedlit(fracs)).as("__qs"))
    val over = fracs.indices
      .map(i => when(col("logppl") > element_at(col("__qs"), i + 1), 1).otherwise(0))
      .reduce(_ + _)
    ppl.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        when(col("logppl").isNull, lit(0)).otherwise(over + lit(1)))
      .select(col(idCol), col("n_bigrams"), col("logppl"), col("bucket"))
  }

  /** BM25 (Robertson/Spärck Jones) top-k document retrieval for a bag
    * of query terms — the lexical ranking used for query-based corpus
    * slicing and retrieval-style decontamination audits.
    *
    *   score(d) = Σ_t idf(t) · tf(d,t)·(k1+1) / (tf(d,t) + k1·(1−b+b·|d|/avg|d|))
    *   idf(t)   = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))
    *
    * Scale shape: the corpus scan tokenizes once; non-query terms are
    * dropped BEFORE the (doc, term) aggregation (the filter is a literal
    * array membership — map-side, so the shuffle carries only
    * query-term hits, a tiny fraction of the corpus); doc lengths are a
    * second map-side-combined aggregation; N/avgdl ride one broadcast
    * 1-row aggregate; df(t) is a query-terms-sized aggregate. Final
    * ranking is one global top-k over per-doc scores
    * (TakeOrdered-sized, never a full sort). Scores round to 6 with
    * (score desc, id asc) tie-break → engine-exact and deterministic.
    * Output: (id, score, rnk). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    val qt = array(queryTerms.distinct.map(t => lit(t.toLowerCase)): _*)
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("__dl"))
    val tf = toks.where(array_contains(qt, col("term")))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    val stats = dl.agg(count(lit(1)).as("__n"), avg("__dl").as("__avgdl"))
    val idf = log(lit(1.0) +
      (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val perTerm = tf.join(dfreq, "term").join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("__s", idf * col("__tf") * (lit(k1) + 1.0) /
        (col("__tf") + lit(k1) * (lit(1.0) - lit(b) +
          lit(b) * col("__dl") / col("__avgdl"))))
    val scored = perTerm.groupBy(col(idCol))
      .agg(round(sum("__s"), 6).as("score"))
    // ORDER BY + LIMIT plans as TakeOrderedAndProject (per-partition
    // top-k, tiny merge on the driver) — never a global sort; the
    // unpartitioned rank window runs over the k survivors only
    val top = scored.orderBy(col("score").desc, col(idCol).asc).limit(k)
    val w = Window.orderBy(col("score").desc, col(idCol).asc)
    top.withColumn("rnk", row_number().over(w))
      .select(col(idCol), col("score"), col("rnk").cast("long").as("rnk"))
  }

  /** Top-k terms per document by tf·idf. Output:
    * (id, term, tf, score, rnk) with rnk 1..k per doc; deterministic
    * tie-break on (score desc, term asc). Scores rounded to 6 for
    * engine-parity comparison. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 3): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
    // persist the doc-term matrix: document frequencies re-aggregate it
    // instead of re-scanning + re-exploding the corpus (plan-verified:
    // without this the corpus is read twice)
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") * idf(col("__n"), col("df")), 6))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("score"), col("rnk"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169,
    * "Data Selection for Language Models via Importance Resampling"):
    * each document's log importance ratio between a TARGET sample's
    * feature distribution and the RAW corpus's,
    *
    *   log w(d) = Σ_{t ∈ d} [ ln p̂_target(t) − ln p̂_raw(t) ]
    *
    * with add-1 smoothing over the raw vocabulary on both sides.
    * Resampling by these weights tilts the corpus toward the target
    * domain. The published method buckets hashed n-grams before the
    * ratio; this unigram-feature form keeps the same estimator shape
    * with an exactly-verifiable oracle — bucket hashing is a drop-in
    * swap of the feature key (`hash(term) % B`), not a different plan.
    *
    * Scale shape: feature counts for BOTH distributions come from ONE
    * vocab-sized hash aggregation over the corpus (the target is a
    * conditional sum riding the same pass, not a second scan); totals
    * are a broadcast 1-row aggregate; the log-ratio table is
    * vocabulary-sized (AQE broadcasts it); the per-doc sum is a hash
    * aggregation on the doc id. The corpus never self-joins.
    * Output: (id, n_tok, log_weight) rounded to 6. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column): DataFrame = {
    val toks = docs.select(col(idCol), isTarget.as("__t"),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = toks.groupBy("term").agg(
      count(lit(1)).as("cr"),
      sum(when(col("__t"), lit(1L)).otherwise(lit(0L))).as("ct"))
    val totals = stats.agg(sum("cr").as("__tr"), sum("ct").as("__tt"),
      count(lit(1)).as("__v"))
    val ratio = stats.crossJoin(broadcast(totals))
      .select(col("term"),
        (log((col("ct") + lit(1)).cast("double") / (col("__tt") + col("__v"))) -
          log((col("cr") + lit(1)).cast("double") / (col("__tr") + col("__v"))))
          .as("lr"))
    toks.join(ratio, "term")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        round(sum(col("lr")), 6).as("log_weight"))
  }

  /** Per-document n-gram NOVELTY: the share of a doc's distinct
    * shingles that appear in NO other document — the inverse signal of
    * repeated-span detection, high for original content and low for
    * boilerplate/templates. One distinct-shingle explode, one df hash
    * agg, one rejoin keyed by shingle — word-count shape, no self-join.
    * Output: (id, n_shingles, novel, novelty round 6); docs too short
    * to shingle are absent (no shingles to judge). */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol),
      explode(Dedup.shingles(col(textCol), shingleN)).as("__s"))
    val df = sh.groupBy("__s").agg(countDistinct(col(idCol)).as("__df"))
    sh.join(df, "__s")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).as("novel"))
      .withColumn("novelty",
        round(col("novel").cast("double") / col("n_shingles"), 6))
  }

  /** Per-group token-distribution DRIFT: smoothed KL divergence of each
    * group's unigram distribution from the whole-corpus distribution —
    * the mixing-dashboard number that says which sources are
    * linguistically far from the blend ("how much does adding more of
    * source X move the mix"). Laplace-smoothed over the corpus
    * vocabulary and TRUNCATED to each group's observed support (the
    * standard practical estimator: terms the group never uses carry
    * only the O(α·V/n_g) smoothing mass; an exact tail would need a
    * group×vocabulary expansion for a correction far below the
    * signal). Two hash aggs (group×term, term) + a term-keyed join —
    * no self-join, the corpus never shuffles twice.
    * Output: (group, n_tok, kl round 6). */
  def distributionDrift(docs: DataFrame, groupCol: String, textCol: String,
                        alpha: Double = 0.5): DataFrame = {
    val toks = docs.select(col(groupCol).as("__g"),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
    val corpus = toks.groupBy("term").agg(count(lit(1)).as("cf"))
    // corpus total + vocabulary size as a 1-row broadcast (NOT a global
    // window over the vocab table — the vocabulary is corpus-dependent,
    // so a single-task funnel over it does not bound at 100 TB)
    val totals = corpus.agg(sum("cf").as("__tot"), count(lit(1)).as("__v"))
    val group = toks.groupBy("__g", "term").agg(count(lit(1)).as("gf"))
    // per-group totals: partitioned window over the group's vocab rows
    val gw = org.apache.spark.sql.expressions.Window.partitionBy("__g")
    group
      .withColumn("__gtot", sum("gf").over(gw))
      .join(corpus, "term")
      .crossJoin(broadcast(totals))
      .withColumn("__q", (col("cf") + alpha) /
        (col("__tot") + lit(alpha) * col("__v")))
      .withColumn("__p", (col("gf") + alpha) /
        (col("__gtot") + lit(alpha) * col("__v")))
      .groupBy(col("__g").as(groupCol))
      .agg(sum("gf").as("n_tok"),
        round(sum(col("__p") * log(col("__p") / col("__q"))), 6).as("kl"))
  }
}
