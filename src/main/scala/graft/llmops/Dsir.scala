package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR; Xie et al. 2023,
  * arXiv:2302.03169): score every raw-corpus document by how much more
  * likely its hashed n-gram features are under a (small) target-domain
  * corpus than under the raw corpus itself, then resample the raw
  * corpus in proportion to those importance weights. This is the
  * standard recipe for "make the 100 TB crawl look like Wikipedia":
  * fit two bag-of-hashed-features multinomials, weight by the
  * log-likelihood ratio, Gumbel-top-k select.
  *
  * Scale shape: the feature space is a FIXED number of hash buckets
  * (default 256), so both fitted distributions are tiny — each is one
  * map-side-combined hash aggregation producing ≤ `buckets` rows, and
  * the per-document scoring pass joins the raw corpus's exploded
  * features against a BROADCAST log-ratio table (≤ `buckets` rows)
  * followed by one hash aggregation on doc id. The corpus is read
  * once, nothing driver-side scales with data size, and no shuffle
  * moves more than (corpus feature occurrences → doc id) — the same
  * shape as a word count. Selection is a TakeOrdered top-k, never a
  * full sort.
  *
  * Determinism: features hash through the portable md5 formula
  * (Dedup.portableHash60 truncated to 8 hex chars, mod `buckets`), so
  * an external engine can re-derive every weight — the DuckDB oracle
  * does exactly that.
  */
object Dsir {
  /** Hashed unigram+bigram feature buckets of a token array, one entry
    * per occurrence (counts matter — the fitted model is a multinomial
    * over occurrences, not a set). Bucket = first-8-md5-hex(feature)
    * mod `buckets`. */
  def featureBuckets(toks: Column, buckets: Int): Column = {
    // zip_with pads the shorter side with null and concat_ws skips
    // nulls, so the final element degenerates to a bare unigram — the
    // size filter drops it (tokens never contain spaces)
    val bigrams = filter(
      zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => concat_ws(" ", a, b)),
      g => size(split(g, " ")) === 2)
    val feats = concat(toks, bigrams)
    transform(feats, f =>
      conv(substring(md5(f.cast("binary")), 1, 8), 16, 10).cast("long") % buckets)
  }

  /** Per-bucket occurrence counts of a corpus: (b, n), ≤ `buckets`
    * rows. One explode + one map-side-combined hash agg. Tokens
    * materialize into a column first — featureBuckets references its
    * token array several times (concat/zip_with/slice/size), and an
    * inlined split expression would re-run per reference. */
  private def bucketCounts(df: DataFrame, textCol: String, buckets: Int): DataFrame =
    df.select(TextAnalysis.tokens(col(textCol)).as("__w"))
      .select(explode(featureBuckets(col("__w"), buckets)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("n"))

  /** Importance weights: for every raw-corpus document,
    * `weight = Σ_features [ log p̂_target(b) − log p̂_raw(b) ]`
    * summed over the document's feature OCCURRENCES, where each p̂ is
    * the Laplace-smoothed multinomial
    * `(count_b + alpha) / (total + alpha·buckets)` fitted on the
    * respective corpus. Output: (id, n_feats, weight round 6).
    * Documents with no tokens produce no features → weight 0 via the
    * left join's coalesce. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        idCol: String, textCol: String,
                        buckets: Int = 256, alpha: Double = 0.5): DataFrame = {
    val tc = bucketCounts(target, textCol, buckets).withColumnRenamed("n", "nt")
    val rc = bucketCounts(raw, textCol, buckets).withColumnRenamed("n", "nr")
    val joined = rc.join(tc, Seq("b"), "full_outer")
      .select(col("b"),
        coalesce(col("nt"), lit(0L)).as("nt"),
        coalesce(col("nr"), lit(0L)).as("nr"))
    // corpus totals via a deliberately-GLOBAL window over the joined
    // count table — bounded at ≤ `buckets` rows by construction, so the
    // single-task funnel is constant-size at any corpus scale. (A
    // separate agg + stats-join would re-derive the two count subtrees
    // → two extra corpus scans when exchange reuse doesn't kick in.)
    val tw = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val denomB = lit(alpha * buckets)
    val ratio = joined
      .select(col("b"),
        (log((col("nt") + alpha) / (sum("nt").over(tw) + denomB)) -
         log((col("nr") + alpha) / (sum("nr").over(tw) + denomB))).as("lr"))
    val occ = raw
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__w"))
      .select(col(idCol), explode(featureBuckets(col("__w"), buckets)).as("b"))
    val scored = occ.join(broadcast(ratio), Seq("b"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_feats"), sum("lr").as("w"))
    raw.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        round(coalesce(col("w"), lit(0.0)), 6).as("weight"))
  }

  /** Gumbel-top-k resampling on the importance weights: key =
    * weight/temperature + Gumbel noise g = −ln(−ln u), u a seeded md5
    * uniform — the standard trick making "sample k without replacement
    * ∝ exp(weight)" a deterministic, engine-recomputable top-k
    * (TakeOrdered; no full sort). Output: (id, weight, gkey round 6),
    * ordered (gkey desc, id). */
  def resample(weights: DataFrame, idCol: String, k: Int,
               temperature: Double = 1.0, seed: String = "dsir"): DataFrame = {
    val u = (Sampling.hashBucket(col(idCol), seed).cast("double") + lit(0.5)) /
      lit(1000000.0)
    val g = -log(-log(u))
    weights
      .withColumn("gkey", round(col("weight") / temperature + g, 6))
      .select(col(idCol), col("weight"), col("gkey"))
      .orderBy(col("gkey").desc, col(idCol).asc)
      .limit(k)
  }
}
