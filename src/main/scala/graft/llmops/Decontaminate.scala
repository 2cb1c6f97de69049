package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find (and drop) training documents that
  * share word n-grams with a held-out evaluation/benchmark corpus — the
  * standard guard against test-set leakage into a training mix.
  *
  * Scale shape: the BENCHMARK side is small by construction (eval sets
  * are thousands of documents, not terabytes), so its distinct shingle
  * set is broadcast and the corpus side never shuffles — contamination
  * detection is a map-side semi-join over the corpus scan followed by
  * one hash aggregation on doc id. The corpus is read once; no state
  * scales with corpus size except the per-doc hit counts.
  */
object Decontaminate {
  /** Per-document contamination hits: (id, hits) where `hits` is the
    * number of distinct `shingleN`-gram shingles the document shares
    * with `bench`; only documents with hits ≥ `minHits` are returned.
    * Shingles are distinct per doc (Dedup.shingles), so count(*) after
    * the semi-join counts distinct shared shingles. */
  def contaminationHits(docs: DataFrame, idCol: String, textCol: String,
                        bench: DataFrame, benchTextCol: String,
                        shingleN: Int = 3, minHits: Int = 1): DataFrame = {
    val benchShingles = bench
      .select(explode(Dedup.shingles(col(benchTextCol), shingleN)).as("__s"))
      .distinct()
    docs
      .select(col(idCol), explode(Dedup.shingles(col(textCol), shingleN)).as("__s"))
      .join(broadcast(benchShingles), "__s")
      .groupBy(idCol)
      .agg(count(lit(1)).as("hits"))
      .where(col("hits") >= minHits)
  }

  /** Drop contaminated documents: anti-join `docs` against the flagged
    * id set (small — AQE broadcasts it). */
  def dropContaminated(docs: DataFrame, idCol: String, textCol: String,
                       bench: DataFrame, benchTextCol: String,
                       shingleN: Int = 3, minHits: Int = 1): DataFrame = {
    val bad = contaminationHits(docs, idCol, textCol, bench, benchTextCol,
      shingleN, minHits).select(col(idCol))
    docs.join(bad, docs(idCol) === bad(idCol), "left_anti")
  }
}
