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
}
