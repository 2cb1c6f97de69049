package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Persistable text-search index: the corpus statistics `$search`'s
  * BM25 scoring needs, precomputed once and stored as a collection —
  * the Atlas/Lucene index lifecycle (build on write, probe on query)
  * instead of a per-query corpus stats pass.
  *
  * Layout (one row per entry, single collection so `$search`'s `index`
  * option can resolve it by name):
  *   - kind='summary': (path, n_docs, avgdl) over docs with ≥1 token
  *   - kind='term':    (path, term, df) — document frequency of every
  *     distinct token under the path
  *
  * The tokenizer is EXACTLY `$search`'s (TextAnalysis.tokens ∘ lower),
  * so looked-up statistics are bit-identical to what the per-query
  * aggregate would compute. Phrase and fuzzy statistics are positional
  * or edit-distance-derived — not representable as term rows — so
  * queries using them keep the corpus pass (same results either way).
  *
  * Scale shape: the term table is vocabulary-sized (a word-count job —
  * explode + map-side-combined hash agg); the query side reads only
  * the rows matching its own terms (a bounded filtered collect). */
object TextIndex {
  private def toks(path: String): Column =
    TextAnalysis.tokens(lower(col(path)))

  def build(df: DataFrame, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "TextIndex.build: need at least one path")
    paths.map { p =>
      val t = df.select(toks(p).as("__w"))
      val summary = t.where(size(col("__w")) > 0)
        .agg(count(lit(1)).as("n_docs"),
          avg(size(col("__w")).cast("double")).as("avgdl"))
        .select(lit("summary").as("kind"), lit(p).as("path"),
          lit(null).cast("string").as("term"), lit(0L).as("df"),
          col("n_docs"), col("avgdl"))
      val terms = t
        .select(explode(array_distinct(col("__w"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("df"))
        .select(lit("term").as("kind"), lit(p).as("path"), col("term"),
          col("df"), lit(0L).as("n_docs"),
          lit(null).cast("double").as("avgdl"))
      summary.unionByName(terms)
    }.reduce(_ unionByName _)
  }

  /** Incremental maintenance: fold a NEW batch of documents into an
    * existing index without re-scanning the indexed corpus — the write
    * path of a live search index (streaming ingest folds each
    * micro-batch the same way). Exact, not approximate: term dfs ADD;
    * the path summary merges as a weighted mean
    * (avgdl' = (n₁·a₁ + n₂·a₂)/(n₁+n₂)), so update(build(A), B) ≡
    * build(A ∪ B) up to float associativity. Cost: index-sized +
    * batch-sized — the old CORPUS is never touched, only the old index
    * rows reduce again. */
  def update(index: DataFrame, newDocs: DataFrame, paths: Seq[String]): DataFrame = {
    val delta = build(newDocs, paths)
    val both = index.unionByName(delta)
    val terms = both.where(col("kind") === "term")
      .groupBy("path", "term").agg(sum("df").as("df"))
      .select(lit("term").as("kind"), col("path"), col("term"), col("df"),
        lit(0L).as("n_docs"), lit(null).cast("double").as("avgdl"))
    val summaries = both.where(col("kind") === "summary")
      .groupBy("path")
      .agg(sum("n_docs").as("n_docs"),
        (sum(col("avgdl") * col("n_docs")) /
          when(sum("n_docs") > 0, sum("n_docs"))).as("avgdl"))
      .select(lit("summary").as("kind"), col("path"),
        lit(null).cast("string").as("term"), lit(0L).as("df"),
        col("n_docs"), col("avgdl"))
    summaries.unionByName(terms)
  }
}
