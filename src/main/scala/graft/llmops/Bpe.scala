package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training over a corpus — the step between
  * curation and the training run that every LLM data pipeline needs.
  *
  * Scale split, by design:
  *  - the CORPUS-sized work (pre-tokenize every document, aggregate the
  *    word dictionary, count first-iteration merge pairs) is fully
  *    distributed: explode → hash agg, the word-count shape, map-side
  *    combined, never driver-bound;
  *  - the MERGE LOOP runs on the driver over the frequency-capped word
  *    dictionary. This is the honest 100 TB architecture, not a
  *    shortcut: BPE training is inherently sequential in the merge
  *    rank (merge N+1's counts depend on merge N having been applied),
  *    so a "distributed" loop is nMerges tiny shuffle jobs over the
  *    SAME shrinking dict — strictly worse than one bounded collect.
  *    Zipf makes the cap principled: the top-100k words of a web-scale
  *    corpus carry ~97% of token mass, and SentencePiece/HF tokenizers
  *    train on exactly such capped/sampled dictionaries.
  *  - APPLYING the trained vocabulary is corpus-sized again and runs as
  *    the codegen'd [[graft.functions.BpeEncode]] expression with the
  *    merge table baked in as a plan constant (the PQ-codebook
  *    pattern) — map-only at any scale.
  */
object Bpe {
  import TextAnalysis.BpeSplitPattern

  /** Corpus word dictionary: (word, cnt) over GPT-2-style pre-tokens
    * (leading spaces belong to the word, per the split pattern). One
    * hash agg; the corpus never re-scans during training. */
  def wordDict(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(regexp_extract_all(col(textCol),
        lit(BpeSplitPattern), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Adjacent-pair symbol segmentation of a word column: code-point
    * symbols (a supplementary character is ONE symbol, matching the
    * encode kernel). */
  private def charsOf(word: Column): Column =
    regexp_extract_all(word, lit("[\\s\\S]"), lit(0))

  /** First-iteration merge candidates: corpus-wide adjacent character
    * pair frequencies, weighted by word count ("aaa" contributes the
    * (a,a) pair twice — the symbol-stream adjacency count every BPE
    * implementation uses). Fully distributed; the gate query's oracle
    * recomputes it by direct expansion in DuckDB. */
  def pairCounts(df: DataFrame, textCol: String): DataFrame =
    wordDict(df, textCol)
      .select(col("cnt"), charsOf(col("word")).as("sym"))
      .where(size(col("sym")) >= 2)
      .select(col("cnt"), explode(transform(
        sequence(lit(1), size(col("sym")) - 1),
        i => struct(element_at(col("sym"), i).as("p1"),
          element_at(col("sym"), i + 1).as("p2")))).as("p"))
      .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
      .agg(sum("cnt").as("freq"))

  /** Train `nMerges` BPE merges: one distributed dictionary aggregation
    * (corpus-sized), then the classic merge loop over the top-`dictCap`
    * words on the driver (see the object doc for why the loop is
    * driver-side by design). Ties break deterministically on
    * (freq desc, p1 asc, p2 asc). Stops early when no pair reaches
    * `minFreq`. Returns (p1, p2, freq-at-merge-time) in rank order. */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            dictCap: Int = 100000, minFreq: Long = 2)
      : Seq[(String, String, Long)] = {
    require(nMerges >= 0 && dictCap > 0)
    val dict = wordDict(df, textCol)
      .orderBy(desc("cnt"), asc("word")).limit(dictCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainLocal(dict, nMerges, minFreq)
  }

  /** The merge loop itself, over an in-memory (word, cnt) dictionary —
    * exposed for spec-level verification against hand-worked examples. */
  def trainLocal(dict: Array[(String, Long)], nMerges: Int,
                 minFreq: Long = 2): Seq[(String, String, Long)] = {
    // code-point segmentation, same as charsOf / the encode kernel
    val words: Array[(Array[String], Long)] = dict.map { case (w, c) =>
      val b = Array.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        b += w.substring(i, i + n); i += n
      }
      (b.result(), c)
    }
    val syms = words.map(_._1.toBuffer)
    val out = Seq.newBuilder[(String, String, Long)]
    var r = 0
    var stop = false
    while (r < nMerges && !stop) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi); val c = words(wi)._2
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
        wi += 1
      }
      val best = counts.minByOption { case ((p1, p2), f) => (-f, p1, p2) }
      best match {
        case Some(((p1, p2), f)) if f >= minFreq =>
          out += ((p1, p2, f))
          val merged = p1 + p2
          var w = 0
          while (w < syms.length) {
            val s = syms(w)
            var i = 0
            while (i < s.length - 1) {
              if (s(i) == p1 && s(i + 1) == p2) {
                s(i) = merged; s.remove(i + 1)
              }
              i += 1 // the merged symbol never re-merges in this pass
            }
            w += 1
          }
        case _ => stop = true
      }
      r += 1
    }
    out.result()
  }

  /** The merge table as the foldable literal [[graft.functions.BpeEncode]]
    * expects (rank order = array order). */
  def mergesLit(merges: Seq[(String, String)]): Column =
    if (merges.isEmpty) array().cast("array<array<string>>")
    else array(merges.map(m => array(lit(m._1), lit(m._2))): _*)

  /** Apply a trained merge table corpus-wide: array<string> of BPE
    * tokens per document. Map-only codegen'd expression; the vocabulary
    * rides the plan as a constant, never the shuffle. */
  def encode(text: Column, merges: Seq[(String, String)]): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("bpe_encode", text, mergesLit(merges))
  }
}
