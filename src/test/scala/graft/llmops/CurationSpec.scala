package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Specs for the round-4 curation operators: decontamination, tf-idf,
  * repetition metrics, per-group caps, mixture resampling, int8
  * quantization. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("contaminationHits flags exactly the docs sharing benchmark n-grams") {
    val bench = Seq((1L, "the quick brown fox jumps high")).toDF("id", "text")
    val docs = Seq(
      (10L, "a lazy dog sleeps all day long"),          // clean
      (11L, "look the quick brown fox runs here"),      // shares 2 shingles
      (12L, "totally unrelated words only here now")    // clean
    ).toDF("id", "text")
    val hits = Decontaminate.contaminationHits(docs, "id", "text",
      bench, "text", shingleN = 3)
      .as[(Long, Long)].collect().toMap
    // "the quick brown" and "quick brown fox" are shared; nothing else
    assert(hits == Map(11L -> 2L))
    val kept = Decontaminate.dropContaminated(docs, "id", "text",
      bench, "text", shingleN = 3).select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(10L, 12L))
  }

  test("bloom contamination hits: no false negatives vs the exact path") {
    val bench = Seq((1L, "the quick brown fox jumps high")).toDF("id", "text")
    val docs = Seq(
      (10L, "a lazy dog sleeps all day long"),
      (11L, "look the quick brown fox runs here"),
      (12L, "totally unrelated words only here now"),
      (13L, "quick brown fox jumps high today ok")
    ).toDF("id", "text")
    val exact = Decontaminate.contaminationHits(docs, "id", "text",
      bench, "text", shingleN = 3)
      .as[(Long, Long)].collect().toMap
    val bloomed = Decontaminate.contaminationHitsBloom(docs, "id", "text",
      bench, "text", shingleN = 3, fpp = 0.001)
      .as[(Long, Long)].collect().toMap
    // the guarantee: NO false negatives — every exact hit is present
    // with at least the exact count. (False positives are permitted at
    // ~fpp and DO occur on a filter this tiny — 4 items — so exact
    // equality is deliberately not asserted.)
    exact.foreach { case (id, hits) =>
      assert(bloomed.getOrElse(id, 0L) >= hits, s"false negative for doc $id")
    }
    assert(exact.keySet.subsetOf(bloomed.keySet))
  }

  test("tf-idf ranks distinctive terms above corpus-common ones") {
    val docs = Seq(
      (1L, "shared shared zebra"),
      (2L, "shared common words"),
      (3L, "shared common other")
    ).toDF("id", "text")
    val top = TfIdf.topTerms(docs, "id", "text", k = 2)
    val doc1 = top.where($"id" === 1).orderBy("rnk")
      .select("term").as[String].collect()
    // zebra (df=1) is distinctive, but tf=2 on shared (df=3) wins the
    // smoothed formula: 2*(ln(4/4)+1)=2.0 vs 1*(ln(4/2)+1)≈1.69
    assert(doc1.toSeq == Seq("shared", "zebra"))
    // scores are deterministic and rounded
    val z = top.where($"id" === 1 && $"term" === "zebra")
      .select("score").as[Double].head()
    assert(math.abs(z - (math.rint((math.log(2.0) + 1) * 1e6) / 1e6)) < 1e-9)
  }

  test("dupNgramFrac: repeats score high, unique text scores 0, short docs 0") {
    val df = Seq(
      (1L, "a b a b a b"),     // 2-grams: ab ba ab ba ab → 5 total, 2 distinct
      (2L, "all words unique here"),
      (3L, "one")              // shorter than n
    ).toDF("id", "text")
    val got = df.select($"id", TextAnalysis.dupNgramFrac($"text", 2).as("f"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 0.6)     // 1 - 2/5
    assert(got(2L) == 0.0)
    assert(got(3L) == 0.0)
  }

  test("capPerGroup keeps k rows per group in rank order") {
    val df = Seq(
      ("a", 1L, 10), ("a", 2L, 30), ("a", 3L, 20), ("a", 4L, 30),
      ("b", 5L, 1)
    ).toDF("grp", "id", "score")
    val got = Sampling.capPerGroup(df, "grp", "id", col("score"), k = 2)
      .select("grp", "id", "rnk").as[(String, Long, Int)].collect().toSet
    // ties on score=30 break by id asc: id 2 then id 4
    assert(got == Set(("a", 2L, 1), ("a", 4L, 2), ("b", 5L, 1)))
  }

  test("resampleMixture: integer weights repeat exactly, zero drops, " +
       "fractional is deterministic") {
    val df = Seq(
      (1L, "en"), (2L, "en"), (3L, "fr"), (4L, "de")
    ).toDF("id", "lang")
    val out = Sampling.resampleMixture(df, "id", "lang",
      Map("en" -> 2.0, "de" -> 0.5), defaultWeight = 0.0)
      .select("id", "copy").as[(Long, Long)].collect().toSeq
    // en rows appear exactly twice with copy 1,2; fr dropped
    assert(out.filter(_._1 == 1L).map(_._2).sorted == Seq(1L, 2L))
    assert(out.filter(_._1 == 2L).map(_._2).sorted == Seq(1L, 2L))
    assert(!out.exists(_._1 == 3L))
    // de (w=0.5): kept 0 or 1 times, and identically on re-run
    val again = Sampling.resampleMixture(df, "id", "lang",
      Map("en" -> 2.0, "de" -> 0.5), defaultWeight = 0.0)
      .select("id", "copy").as[(Long, Long)].collect().toSeq
    assert(out.sorted == again.sorted)
    assert(out.count(_._1 == 4L) <= 1)
  }

  test("temperatureResample: alpha=1 is the identity mixture; alpha<1 " +
       "upsamples low-resource groups deterministically") {
    val df = ((0L until 90L).map(i => (i, "en")) ++
      (100L until 110L).map(i => (i, "is"))).toDF("id", "lang")
    // alpha=1: every group's rate is exactly n/N·N/n = 1.0 — each row
    // appears exactly once
    val id1 = Sampling.temperatureResample(df, "id", "lang", alpha = 1.0)
      .select("id", "copy").as[(Long, Long)].collect().toSeq
    assert(id1.map(_._1).sorted == (0L until 90L) ++ (100L until 110L))
    assert(id1.forall(_._2 == 1L))
    // alpha=0.5: shares √90:√10 ≈ 0.75:0.25 → rates ≈ 0.833 / 2.5 —
    // the minority upsamples (≥2 copies each), the majority thins
    val out = Sampling.temperatureResample(df, "id", "lang", alpha = 0.5)
      .select("id", "lang", "copy").as[(Long, String, Long)].collect().toSeq
    val nEn = out.count(_._2 == "en")
    val nIs = out.count(_._2 == "is")
    assert(nIs > 10 && nIs >= 20, s"minority must upsample, got $nIs")
    assert(nEn < 90, s"majority must thin, got $nEn")
    // every minority row appears at least floor(2.5)=2 times
    assert((100L until 110L).forall(i => out.count(_._1 == i) >= 2))
    // deterministic across runs
    val again = Sampling.temperatureResample(df, "id", "lang", alpha = 0.5)
      .select("id", "lang", "copy").as[(Long, String, Long)].collect().toSeq
    assert(out.sorted == again.sorted)
    // a null stratum is a group of its own, not an error
    val withNull = (Seq((1L, "en"), (2L, null), (3L, null)))
      .toDF("id", "lang")
    val nn = Sampling.temperatureResample(withNull, "id", "lang", alpha = 0.5)
      .select("id").as[Long].collect()
    assert(nn.nonEmpty && nn.toSet.subsetOf(Set(1L, 2L, 3L)))
  }

  test("int8 quantization: codes in [0,255], reconstruction within scale/2") {
    val df = Seq((1L, Array(0.0f, 0.5f, 1.0f, 0.25f)),
                 (2L, Array(3.0f, 3.0f, 3.0f))) // constant → scale 0
      .toDF("id", "vec")
    val q = df.select($"id",
      Similarity.quantizeInt8($"vec").as("q"),
      Similarity.quantizationMse($"vec").as("mse"))
    val r1 = q.where($"id" === 1).select("q.codes", "q.minv", "q.scale", "mse")
      .as[(Seq[Int], Double, Double, Double)].head()
    assert(r1._1.forall(c => c >= 0 && c <= 255))
    assert(r1._1.head == 0 && r1._1(2) == 255) // min → 0, max → 255
    assert(r1._4 <= r1._3 * r1._3 / 4 + 1e-12) // mse ≤ (scale/2)²
    val r2 = q.where($"id" === 2).select("q.codes", "mse")
      .as[(Seq[Int], Double)].head()
    assert(r2._1.forall(_ == 0) && r2._2 == 0.0)
    // native-pass edges: empty vector → (null, null, [], 0); null → null
    val edge = Seq((1L, Some(Array.empty[Float])), (2L, None))
      .toDF("id", "vec")
      .select($"id", Similarity.quantizeInt8Full($"vec").as("q"))
      .orderBy("id").collect()
    val e1 = edge(0).getStruct(1)
    assert(e1.isNullAt(0) && e1.isNullAt(1)
      && e1.getSeq[Int](2).isEmpty && e1.getDouble(3) == 0.0)
    assert(edge(1).isNullAt(1))
    // double input accepted alongside float
    val dv = Seq((1L, Array(0.0, 2.0))).toDF("id", "vec")
      .select(Similarity.quantizeInt8Full($"vec").as("q"))
      .select("q.codes").as[Seq[Int]].head()
    assert(dv == Seq(0, 255))
  }

  test("gopherRepetition edges: null/empty text, tab lines, tie order") {
    val docs = Seq(
      (1L, None),                       // null text → zero struct
      (2L, Some("")),                   // empty → zero struct
      (3L, Some(" \t x\n \t x")),       // space-only trim keeps tabs:
                                        // "\t x" duplicates → frac > 0
      (4L, Some("b b a a b b"))         // ties: "b b"×2 beats "a a"/"a b"
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
      TextAnalysis.gopherRepetition(col("text")).as("g"))
      .orderBy("doc_id").collect()
    val g1 = out(0).getStruct(1); val g2 = out(1).getStruct(1)
    assert(g1.getDouble(0) == 0.0 && g1.getDouble(2) == 0.0)
    assert(g2.getDouble(0) == 0.0 && g2.getDouble(2) == 0.0)
    assert(out(2).getStruct(1).getDouble(0) == 0.5) // 2 lines, 1 distinct
    // doc 4 bigrams: [b b, b a, a a, a b, b b] → "b b" count 2, len 3,
    // covered chars 2·(3−1)=4 over 6 token chars
    assert(out(3).getStruct(1).getDouble(2) ==
      BigDecimal(4.0 / 6.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("redactPii scrubs emails, IPs, and phone-shaped numbers") {
    val df = Seq(
      "mail me at alice.smith+x@corp.example.org today",
      "server 192.168.1.254 answered",
      "call 555-0142 or 555 9913",
      "clean text with no pii at all",
      "version 1.2 is not an ip"
    ).toDF("text")
    val got = df.select(TextAnalysis.redactPii($"text").as("t"))
      .as[String].collect().toSeq
    assert(got == Seq(
      "mail me at <EMAIL> today",
      "server <IP> answered",
      "call <PHONE> or <PHONE>",
      "clean text with no pii at all",
      "version 1.2 is not an ip"))
  }

  test("unigramSurprisal: rare-token docs score higher than common-token docs") {
    val docs = Seq(
      (1L, "common common common common"),
      (2L, "common rareword")
    ).toDF("id", "text")
    val got = TfIdf.unigramSurprisal(docs, "id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // p(common)=5/6, p(rareword)=1/6
    val pc = -math.log(5.0 / 6.0); val pr = -math.log(1.0 / 6.0)
    assert(got(1L)._1 == 4L)
    assert(math.abs(got(1L)._2 - math.rint(pc * 1e6) / 1e6) < 1e-9)
    assert(math.abs(got(2L)._2 - math.rint((pc + pr) / 2 * 1e6) / 1e6) < 1e-9)
    assert(got(2L)._2 > got(1L)._2)
  }

  test("gopherRepetition: hand-computed line and top-ngram fractions") {
    val docs = Seq(
      (1L, "x y\nx y\nz w q"),      // dup lines present
      (2L, "a b c"),                // single line → line fracs 0
      (3L, "t t t t")               // degenerate top-gram
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
      TextAnalysis.gopherRepetition(col("text")).as("g"))
      .select(col("doc_id"), col("g.dup_line_frac"),
        col("g.dup_line_char_frac"), col("g.top_ngram_char_frac"))
      .orderBy("doc_id").collect()
    // doc 1: lines [x y, x y, z w q]: (3-2)/3; chars (11-5)/11;
    // top 2-gram "x y" ×2, token chars 7 → 2*2/7
    assert(out(0).getDouble(1) == 0.333333)
    assert(out(0).getDouble(2) == 0.545455)
    assert(out(0).getDouble(3) == 0.571429)
    assert(out(1).getDouble(1) == 0.0 && out(1).getDouble(2) == 0.0)
    // doc 3: "t t" ×3 (overlapping), token chars 4 → capped at 1.0
    assert(out(2).getDouble(3) == 1.0)
  }

  test("bigramLogPerplexity: hand-computed JM interpolation, short docs null") {
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b"),
      (3L, "x")
    ).toDF("doc_id", "text")
    val out = TfIdf.bigramLogPerplexity(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    // uni: a=3 b=3 x=1, T=7; bigrams: (a,b)x3 + (b,a)x1
    val pab = 0.9 * 3.0 / 3.0 + 0.1 * 3.0 / 7.0
    val pba = 0.9 * 1.0 / 3.0 + 0.1 * 3.0 / 7.0
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = r6((-math.log(pab) - math.log(pba) - math.log(pab)) / 3.0)
    val d2 = r6(-math.log(pab))
    assert(out(0) == ((1L, 3L, Some(d1))))
    assert(out(1) == ((2L, 1L, Some(d2))))
    assert(out(2) == ((3L, 0L, None)))
    // fluency ordering on a larger corpus: a doc of corpus-frequent
    // bigrams scores lower (more fluent) than a shuffled-token doc
    val corpus = (1L to 40L).map(i => (i, "the model reads the data well"))
      .toDF("doc_id", "text")
      .union(Seq((99L, "well the reads data model the")).toDF("doc_id", "text"))
    val ppl = TfIdf.bigramLogPerplexity(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ppl(1L) < ppl(99L))
  }

  test("dedupAgainst drops snapshot docs already fingerprinted, keeps the rest") {
    val old = Seq((1L, "The quick brown fox"), (2L, "other old doc"))
      .toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "the  quick\tbrown fox"), // normalized dup of doc 1
      (11L, "The quick brown fox"),   // byte-exact dup of doc 1
      (12L, "genuinely new content"),
      (13L, "other old doc")          // dup of doc 2
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupAgainst(fresh, old, "doc_id", "text", normalize = true)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(12L))
    // without normalization only byte-exact copies drop
    val keptRaw = Dedup.dedupAgainst(fresh, old, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptRaw == Seq(10L, 12L))
    // schema passes through untouched
    assert(Dedup.dedupAgainst(fresh, old, "doc_id", "text").columns.toSeq ==
      Seq("doc_id", "text"))
  }

  test("perplexityBuckets: equal-mass tiers, fluent docs in bucket 1, short docs in 0") {
    // 40 fluent clones + 1 shuffled outlier + 1 unscorable single token
    val corpus = (1L to 40L).map(i => (i, "the model reads the data well"))
      .toDF("doc_id", "text")
      .union(Seq((99L, "well the reads data model the"),
                 (100L, "x")).toDF("doc_id", "text"))
    val out = TfIdf.perplexityBuckets(corpus, "doc_id", "text", buckets = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(out(100L) == 0)            // no bigram → unscored bucket
    assert(out(99L) == 3)             // the disfluent outlier is the tail
    assert(out(1L) >= 1 && out(1L) <= 2) // clones share the low tiers
    // every scored doc got a tier; tier ids stay within range
    assert(out.values.forall(b => b >= 0 && b <= 3))
    // equal-mass on distinct values: 4 quartile buckets over 1..8
    val spread = (1L to 8L).map(i => (i, ("w " * i.toInt) + "end"))
      .toDF("doc_id", "text")
    val q4 = TfIdf.perplexityBuckets(spread, "doc_id", "text", buckets = 4)
      .groupBy("bucket").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(q4.keys.toSet.subsetOf(Set(0, 1, 2, 3, 4)), q4.toString)
  }

  test("packSequences: offsets are contiguous per group and packs chunk at L") {
    val docs = Seq(
      (1L, "g", 300L), (2L, "g", 300L), (3L, "g", 300L), (4L, "h", 10L)
    ).toDF("id", "grp", "n_tok")
    val got = Sampling.packSequences(docs, "id", "grp", col("n_tok"), 512L)
      .select("grp", "id", "start_offset", "pack_first", "pack_last")
      .as[(String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._3))
    val g = got.filter(_._1 == "g")
    // contiguous layout: offsets 0, 300, 600 in SOME deterministic order
    assert(g.map(_._3).toSeq == Seq(0L, 300L, 600L))
    // first doc spans [0,300) → pack 0; second [300,600) → straddles 512
    assert(g(0)._4 == 0 && g(0)._5 == 0)
    assert(g(1)._4 == 0 && g(1)._5 == 1)
    assert(g(2)._4 == 1 && g(2)._5 == 1)
    val h = got.filter(_._1 == "h").head
    assert(h._3 == 0 && h._4 == 0 && h._5 == 0)
  }

  test("packSequences and resampleMixture are partition-invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def packed(df: org.apache.spark.sql.DataFrame) =
      Sampling.packSequences(df, "doc_id", "source",
        TextAnalysis.tokenCount(col("text")), 128L)
        .select("source", "doc_id", "start_offset", "pack_first", "pack_last")
        .as[(String, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(packed(docs.repartition(1)).toSeq == packed(docs.repartition(17)).toSeq)
    def mixed(df: org.apache.spark.sql.DataFrame) =
      Sampling.resampleMixture(df, "doc_id", "lang", Map("en" -> 1.5),
        defaultWeight = 0.25)
        .select("doc_id", "copy").as[(Long, Long)].collect().sorted
    assert(mixed(docs.repartition(1)).toSeq == mixed(docs.repartition(17)).toSeq)
  }

  test("compressionRatio orders repetitive text below varied text") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "the quick brown fox jumps over a lazy dog tonight"),
      (3L, "")
    ).toDF("id", "text")
    val got = df.select($"id", TextAnalysis.compressionRatio($"text").as("r"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) < got(2L)) // boilerplate compresses better
    assert(got(3L) == 1.0)    // empty input → ratio 1
    assert(got.values.forall(r => r > 0.0 && r < 2.0))
    // null text → null ratio
    val n = Seq((4L, null: String)).toDF("id", "text")
      .select(TextAnalysis.compressionRatio($"text")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("interval join plan works in batch (same plan as the stream)") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val ev = Seq(
      (1L, 7L, "click", ts("2024-01-01 10:00:00")),
      (2L, 7L, "purchase", ts("2024-01-01 10:05:00")),  // within 10 min
      (3L, 7L, "purchase", ts("2024-01-01 10:20:00")),  // outside
      (4L, 8L, "purchase", ts("2024-01-01 10:05:00"))   // other user
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = graft.streaming.EventStream.intervalJoin(ev, "click", "purchase")
      .select("l_id", "r_id", "lag_us").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 300000000L)))
  }

  test("dropRepeatedSpans removes cross-doc repeated windows, keeps the rest") {
    val shared = (1 to 8).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"$shared delta epsilon"),
      (3L, "unique tokens only here")
    ).toDF("doc_id", "text")
    val out = Dedup.dropRepeatedSpans(docs, "doc_id", "text", n = 8, minDocs = 2)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "alpha beta gamma", 8L),
      (2L, "delta epsilon", 8L),
      (3L, "unique tokens only here", 0L)))
  }

  test("classifierScore: sigmoid bounds, empty text is exactly 0.5, " +
       "deterministic per token multiset") {
    val docs = Seq((1L, "spark fast query"), (2L, ""), (3L, "spark fast query"))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
      TextAnalysis.classifierScore(col("text")).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(got(2L) == 0.5)
    assert(got(1L) == got(3L))
    assert(got(1L) > 0.0 && got(1L) < 1.0 && got(1L) != 0.5)
  }

  test("semanticContaminationHits flags near-benchmark vectors, drop removes them") {
    val bench = Seq((100L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(0.99f, 0.1f)),   // ~0.995 cosine — contaminated
      (2L, Seq(0.0f, 1.0f)),    // orthogonal
      (3L, Seq(-1.0f, 0.0f))    // opposite
    ).toDF("vec_id", "embedding")
    val hits = Decontaminate.semanticContaminationHits(
      corpus, "vec_id", "embedding", bench, "embedding", threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(hits.map(_._1) == Seq(1L) && hits.head._2 == 1L)
    assert(hits.head._3 > 0.99)
    val kept = Decontaminate.dropSemanticContaminated(
      corpus, "vec_id", "embedding", bench, "embedding", threshold = 0.9)
      .select("vec_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(2L, 3L))
  }

  test("clusterAssignments: one cell groups everything; ids preserved") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(-1.0f, 0.2f))
    ).toDF("vec_id", "embedding")
    val one = Similarity.clusterAssignments(vecs, nCells = 1)
      .as[(Long, Long)].collect().toSeq
    assert(one.map(_._1).sorted == Seq(1L, 2L, 3L))
    assert(one.map(_._2).distinct.size == 1)
  }

  test("canonicalPick: a null-quality doc never beats scored cluster members") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight ok"),
      (2L, "the quick brown fox jumps over the lazy dog tonight yes"))
      .toDF("doc_id", "text")
    // doc 1 unscored (null quality), doc 2 scored: the scored one wins
    val q = when(col("doc_id") === 2L, lit(0.9)).otherwise(lit(null).cast("double"))
    val picked = Dedup.canonicalPick(docs, "doc_id", "text", q, threshold = 0.5)
      .select("doc_id", "rep_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(picked(1L) == 2L && picked(2L) == 2L,
      s"null-quality doc elected representative: $picked")
  }

  test("a blank benchmark row cannot flag empty corpus docs as contaminated") {
    val docs = Seq((1L, ""), (2L, null.asInstanceOf[String]),
      (3L, "completely unrelated words here today"))
      .toDF("doc_id", "text")
    val bench = Seq((10L, ""), (11L, null.asInstanceOf[String]))
      .toDF("bid", "btext")
    assert(Decontaminate.contaminationHits(
      docs, "doc_id", "text", bench, "btext").count() == 0)
    assert(Decontaminate.dropContaminated(
      docs, "doc_id", "text", bench, "btext").count() == 3)
    assert(Decontaminate.contaminationHitsBloom(
      docs, "doc_id", "text", bench, "btext").count() == 0)
  }
}
