package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Specs for the round-6 curation additions: DSIR importance
  * resampling, chunk-level dedup with reconstruction, and the
  * longest-contiguous-overlap decontamination score. */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("featureBuckets emits unigrams + bigrams, one per occurrence") {
    val df = Seq((1L, "a b a")).toDF("id", "text")
    val n = df.select(size(Dsir.featureBuckets(
      TextAnalysis.tokens(col("text")), 256)).as("n"))
      .as[Int].head()
    // 3 unigram occurrences + 2 bigrams ("a b", "b a")
    assert(n == 5)
    // single-token and empty docs: no bigrams, no stray null-padded one
    val n1 = Seq((1L, "solo")).toDF("id", "text")
      .select(size(Dsir.featureBuckets(TextAnalysis.tokens(col("text")), 256)))
      .as[Int].head()
    assert(n1 == 1)
    val n0 = Seq((1L, "  ")).toDF("id", "text")
      .select(size(Dsir.featureBuckets(TextAnalysis.tokens(col("text")), 256)))
      .as[Int].head()
    assert(n0 == 0)
  }

  test("importanceWeights ranks target-like docs above off-domain docs") {
    val target = Seq(
      (100L, "physics energy quantum field theory"),
      (101L, "quantum field energy state physics")).toDF("id", "text")
    val raw = Seq(
      (1L, "quantum physics energy field notes"),   // target-like
      (2L, "cheap shoes buy now sale discount"),    // off-domain
      (3L, "energy drink sale")                     // mixed
    ).toDF("id", "text")
    val w = Dsir.importanceWeights(raw, target, "id", "text", buckets = 64)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(w(1L) > w(3L) && w(3L) > w(2L),
      s"expected target-like > mixed > off-domain, got $w")
    // every raw doc gets a row, even one with no tokens
    val withEmpty = raw.union(Seq((4L, "   ")).toDF("id", "text"))
    val w2 = Dsir.importanceWeights(withEmpty, target, "id", "text", buckets = 64)
    assert(w2.count() == 4)
    assert(w2.where(col("id") === 4L).select("weight").as[Double].head() == 0.0)
  }

  test("resample is a deterministic Gumbel top-k") {
    val target = Seq((100L, "alpha beta gamma")).toDF("id", "text")
    val raw = (1L to 20L).map(i => (i, s"alpha beta doc$i")).toDF("id", "text")
    val w = Dsir.importanceWeights(raw, target, "id", "text", buckets = 64)
    val a = Dsir.resample(w, "id", k = 5).as[(Long, Double, Double)].collect()
    val b = Dsir.resample(w, "id", k = 5).as[(Long, Double, Double)].collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 5)
    // keys descend
    assert(a.map(_._3).toSeq == a.map(_._3).sorted(Ordering[Double].reverse).toSeq)
  }

  test("dedupChunks keeps first occurrence and rebuilds documents") {
    val df = Seq(
      (1L, "a b c d e f"),   // chunks (size 3): "a b c", "d e f"
      (2L, "a b c x y z"),   // "a b c" duplicates doc 1's first chunk
      (3L, "d e f"),         // duplicates doc 1's second chunk
      (4L, "   ")            // no tokens → zero chunks, empty text
    ).toDF("id", "text")
    val out = Dedup.dedupChunks(df, "id", "text", chunkSize = 3)
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, "a b c d e f"),
      (2L, 2L, 1L, "x y z"),
      (3L, 1L, 0L, ""),
      (4L, 0L, 0L, "")))
  }

  test("canonicalPick keeps the highest-quality doc per near-dup cluster") {
    // docs 1/2 are near-dups (doc 2 extends doc 1); doc 3 is a
    // singleton. Doc 2 is longer and stopword-denser → higher quality
    // score → cluster representative.
    val df = Seq(
      (1L, "the quick brown fox jumps over lazy dogs"),
      (2L, "the quick brown fox jumps over lazy dogs it is the"),
      (3L, "completely different content lives here now")).toDF("id", "text")
    val out = Dedup.canonicalPick(df, "id", "text",
      TextAnalysis.qualityScore(col("text")), threshold = 0.5)
      .orderBy("id")
      .select("id", "cluster_id", "rep_id", "keep")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) == Seq((1L, 1L), (2L, 1L), (3L, 3L)))
    assert(out.map(_._3) == Seq(2L, 2L, 3L), s"doc 2 should represent: $out")
    assert(out.map(_._4) == Seq(false, true, true))
  }

  test("truncStats/renorm: energy ratio and unit-norm prefix") {
    val df = Seq((1L, Seq(3.0f, 4.0f, 0.0f, 0.0f)),
                 (2L, Seq(0.0f, 0.0f, 5.0f, 5.0f))).toDF("id", "v")
    val out = df.select(col("id"),
        Similarity.truncStats(col("v"), 2).as("s"), col("v"))
      .select(col("id"), col("s.norm_t"), col("s.energy"),
        Similarity.renorm(col("v"), 2, col("s.norm_t")).as("r"))
      .orderBy("id")
      .as[(Long, Double, Double, Seq[Double])].collect().toSeq
    assert(out(0) == (1L, 5.0, 1.0, Seq(0.6, 0.8)))
    // doc 2: prefix is all-zero → norm 0, energy 0, zeros (no NaN)
    assert(out(1) == (2L, 0.0, 0.0, Seq(0.0, 0.0)))
  }

  test("curationReport counts global dups against the right groups") {
    val df = Seq(
      (1L, "same text here", "a", "en"),
      (2L, "SAME   text here", "b", "en"),   // normalized dup of doc 1
      (3L, "unique snowflake content", "a", "en")
    ).toDF("doc_id", "text", "source", "lang")
    val out = TextAnalysis.curationReport(df, "text", Seq("source", "lang"))
      .orderBy("source")
      .select("source", "n_docs", "n_tokens", "dup_docs")
      .as[(String, Long, Long, Long)].collect().toSeq
    // the dup pair spans sources a and b — each group sees its own copy
    assert(out == Seq(("a", 2L, 6L, 1L), ("b", 1L, 3L, 1L)))
  }

  test("ngramNovelty: unique shingles score 1, copied docs score 0") {
    val df = Seq(
      (1L, "a b c d e"),          // all 3 shingles unique → novelty 1
      (2L, "x y z w q"),          // copied by doc 3 → novelty 0
      (3L, "x y z w q")).toDF("id", "text")
    val out = TfIdf.ngramNovelty(df, "id", "text").orderBy("id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 3L, 3L, 1.0), (2L, 3L, 0L, 0.0), (3L, 3L, 0L, 0.0)))
  }

  test("distributionDrift: an off-blend source drifts further") {
    val df = Seq(
      (1L, "the cat sat on the mat", "a"),
      (2L, "the dog sat on the rug", "a"),
      (3L, "quantum flux capacitors resonate", "b")).toDF("id", "text", "source")
    val kl = TfIdf.distributionDrift(df, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // (truncated-support KL: individual values may dip below zero for
    // a perfectly blend-like group — only the ORDERING is asserted)
    assert(kl("b") > kl("a"), s"expected b to drift further: $kl")
  }

  test("mediaNearDupPairs: byte-identical payloads pair at hamming 0") {
    val media = Seq(
      (1L, "the same bytes exactly repeated here ok"),
      (2L, "the same bytes exactly repeated here ok"),
      (3L, "completely different payload content !!")).toDF("doc_id", "text")
    val df = Multimodal.asMediaTable(media, "doc_id", "text")
    val pairs = Multimodal.mediaNearDupPairs(df, "media_id", "payload")
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 0L)))
  }

  test("overlapSpans finds the longest consecutive-hit run, not just hits") {
    val bench = Seq((1L, "q w e r t y")).toDF("id", "text")
    // doc 10: "q w e r" → positional 3-grams "q w e","w e r" both hit,
    // consecutive → run 2, overlap_tokens 4. doc 11 has two SEPARATED
    // single hits → max_run 1 but n_hits 2.
    val docs = Seq(
      (10L, "q w e r zz zz"),
      (11L, "q w e zz zz r t y zz"),
      (12L, "no hits here at all")).toDF("id", "text")
    val out = Decontaminate.overlapSpans(docs, "id", "text", bench, "text")
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((10L, 2L, 4L, 2L), (11L, 1L, 3L, 2L)))
  }
}
