package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
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
    // degenerate guard: a null/empty-text benchmark row shingles to
    // array("") (WordShingles' null contract), and the "" shingle would
    // then flag EVERY null/empty corpus document as test-set leakage
    val benchShingles = bench
      .select(explode(Dedup.shingles(col(benchTextCol), shingleN)).as("__s"))
      .where(col("__s") =!= "").distinct()
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

  /** Bloom-filter contamination flagging, for benchmark suites whose
    * distinct shingle set strains an exact broadcast (a full eval-suite
    * union can reach 10⁸+ shingles; at 1% fpp the filter is ~10 bits
    * per shingle — 20-50× smaller than the strings, and constant-size
    * per executor). Guarantees: NO false negatives (every truly
    * contaminated doc is flagged), ~fpp false-positive shingle hits —
    * the conservative direction for decontamination: a clean doc may be
    * dropped at the configured rate, leakage is never missed. The probe
    * (`bloom_contains` native expression) stays map-side inside the
    * corpus scan; nothing shuffles but per-doc hit counts, exactly like
    * the exact path. Callers needing exactness re-verify the flagged
    * (small) candidate set with `contaminationHits` — corpus-scan cost
    * is paid once either way. */
  /** Longest-contiguous-overlap contamination score: for each corpus
    * document, the length (in shingles and in tokens) of the longest
    * RUN of consecutive positions whose `shingleN`-gram also appears in
    * the benchmark — the "13-gram overlap span" style check (GPT-3
    * appendix C / PaLM) that distinguishes a verbatim quoted test item
    * from scattered incidental n-gram hits, which plain hit-counting
    * cannot. Output: (id, max_run, overlap_tokens = max_run+n−1,
    * n_hits) for documents with ≥ 1 matching shingle.
    *
    * Scale shape: the benchmark shingle set broadcasts (small by
    * construction, same contract as [[contaminationHits]]); matched
    * positions — a tiny fraction of the corpus — shuffle once on doc
    * id; the run detection is the classic islands trick (pos −
    * row_number) under a window PARTITIONED by doc id, bounded by
    * per-doc match counts. The corpus itself never shuffles. */
  def overlapSpans(docs: DataFrame, idCol: String, textCol: String,
                   bench: DataFrame, benchTextCol: String,
                   shingleN: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tokens materialize into a column BEFORE the per-position lambda —
    // a tokenizer expression captured inside transform() re-runs the
    // split per POSITION (O(positions × tokens) regex work per doc; the
    // round-5 phrase-scorer lesson)
    def posShingles(w: Column): Column =
      // sequence(1, stop) DESCENDS when stop < 1 — guard short docs
      when(size(w) >= shingleN,
        transform(sequence(lit(1), size(w) - (shingleN - 1)), i =>
          struct(i.as("pos"), concat_ws(" ", slice(w, i, lit(shingleN))).as("s"))))
        .otherwise(array().cast("array<struct<pos:int,s:string>>"))
    val benchShingles = bench
      .select(explode(Dedup.shingles(col(benchTextCol), shingleN)).as("s"))
      .where(col("s") =!= "").distinct() // "" = null/empty bench text (see contaminationHits)
    val matched = docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__w"))
      .select(col(idCol), explode(posShingles(col("__w"))).as("ps"))
      .select(col(idCol), col("ps.pos").as("pos"), col("ps.s").as("s"))
      .join(broadcast(benchShingles), "s")
    val isl = matched.withColumn("__isl",
      col("pos") - row_number().over(
        Window.partitionBy(idCol).orderBy(col("pos").asc)))
    isl.groupBy(col(idCol), col("__isl"))
      .agg(count(lit(1)).as("__run"))
      .groupBy(idCol)
      .agg(max("__run").as("max_run"), sum("__run").as("n_hits"))
      .select(col(idCol), col("max_run"),
        (col("max_run") + (shingleN - 1)).as("overlap_tokens"), col("n_hits"))
  }

  def contaminationHitsBloom(docs: DataFrame, idCol: String, textCol: String,
                             bench: DataFrame, benchTextCol: String,
                             shingleN: Int = 3, minHits: Int = 1,
                             fpp: Double = 0.01): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // persisted: the exact-count sizing pass and the filter build both
    // consume the distinct set — unpersisted, the dominant distinct
    // aggregation would run twice on exactly the large-bench path this
    // function exists for. "" guard as in contaminationHits.
    val benchShingles = bench
      .select(explode(Dedup.shingles(col(benchTextCol), shingleN)).as("__s"))
      .where(col("__s") =!= "").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = benchShingles.count()
    if (n == 0L) { // an all-blank benchmark: nothing can be contaminated
      benchShingles.unpersist(blocking = false)
      return docs.select(col(idCol), lit(0L).as("hits")).limit(0)
    }
    val bloom = benchShingles.stat.bloomFilter("__s", n, fpp)
    benchShingles.unpersist(blocking = false)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    docs
      .select(col(idCol), explode(Dedup.shingles(col(textCol), shingleN)).as("__s"))
      .where(call_function("bloom_contains", col("__s"), lit(bytes)))
      .groupBy(idCol)
      .agg(count(lit(1)).as("hits"))
      .where(col("hits") >= minHits)
  }

  /** SEMANTIC decontamination: flag training rows whose embedding sits
    * within `threshold` cosine of ANY benchmark embedding. N-gram
    * decontamination misses paraphrased/translated leakage; embedding
    * similarity is its complement, run over the same small benchmark
    * side. Returns (id, hits, max_cos).
    *
    * Scale shape: the benchmark embedding table is broadcast (eval sets
    * are thousands of rows) and the corpus is scanned once — a
    * broadcast nested-loop with a map-side cosine per (row, bench)
    * pair; nothing shuffles except the flagged per-doc aggregates. For
    * benchmark sides too big to broadcast, pre-bucket both sides with
    * the LSH machinery (Dedup.embeddingDedup's candidate generator)
    * before scoring. */
  def semanticContaminationHits(corpus: DataFrame, idCol: String,
                                vecCol: String, bench: DataFrame,
                                benchVecCol: String,
                                threshold: Double): DataFrame = {
    val b = broadcast(bench.select(
      col(benchVecCol).cast("array<double>").as("__bv"),
      Similarity.norm(col(benchVecCol)).as("__bn")))
    val sim = round(Similarity.rawDot(col("__cv"), col("__bv")) /
      (col("__cn") * col("__bn")), 6)
    corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("__cv"),
        Similarity.norm(col(vecCol)).as("__cn"))
      .join(b, sim >= lit(threshold))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("hits"), max(sim).as("max_cos"))
  }

  /** Drop semantically contaminated rows (anti-join against the flagged
    * id set — small, AQE broadcasts it). */
  def dropSemanticContaminated(corpus: DataFrame, idCol: String,
                               vecCol: String, bench: DataFrame,
                               benchVecCol: String,
                               threshold: Double): DataFrame = {
    val bad = semanticContaminationHits(corpus, idCol, vecCol, bench,
      benchVecCol, threshold).select(col(idCol))
    corpus.join(bad, corpus(idCol) === bad(idCol), "left_anti")
  }
}
