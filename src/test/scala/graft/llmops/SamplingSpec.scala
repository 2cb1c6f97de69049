package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("stratified sample: rate 1 keeps a stratum whole, rate 0 drops it") {
    val en = docs.where($"lang" === "en").count()
    val kept = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0), defaultRate = 0.0)
    assert(kept.count() == en)
    assert(kept.where($"lang" =!= "en").count() == 0)
  }

  test("chunkDocuments: window/stride layout, tails kept, short docs whole") {
    val d = Seq(
      (1L, (1 to 10).map("t" + _).mkString(" ")),  // 10 tokens
      (2L, "a b"),                                 // shorter than overlap+1
      (3L, "")                                     // no tokens → dropped
    ).toDF("doc_id", "text")
    val out = Sampling.chunkDocuments(d, "doc_id", "text", 8, 2)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, (1 to 8).map("t" + _).mkString(" "), 8L),
      (1L, 1L, (7 to 10).map("t" + _).mkString(" "), 4L),  // 2-token overlap
      (2L, 0L, "a b", 2L)))
    // overlap >= size rejected
    intercept[IllegalArgumentException](
      Sampling.chunkDocuments(d, "doc_id", "text", 4, 4))
    // full coverage: every token index lands in some chunk
    val n = Sampling.chunkDocuments(docs, "doc_id", "text", 40, 10)
    val tokTotal = docs.select(TextAnalysis.tokenCount(col("text"))).as[Long]
      .collect().sum
    val chunkTotal = n.agg(sum("n_tokens")).head.getLong(0)
    assert(chunkTotal >= tokTotal) // overlap re-counts, never loses
  }

  test("weightedSample: A-ES selection is weight-biased, deterministic, " +
       "and excludes non-positive weights") {
    val rows = Seq(
      (1L, 10.0), (2L, 10.0), (3L, 10.0), (4L, 10.0),
      (5L, 1e9),                     // u^(1/w) → ~1: always selected
      (6L, 0.0), (7L, -3.0)          // never selectable
    ).toDF("doc_id", "w")
    val top3 = Sampling.weightedSample(rows, "doc_id", col("w"), 3)
      .select("doc_id").as[Long].collect().toSet
    assert(top3.contains(5L))
    assert(!top3.contains(6L) && !top3.contains(7L))
    // k beyond the positive-weight population returns exactly it
    assert(Sampling.weightedSample(rows, "doc_id", col("w"), 100).count() == 5)
    // deterministic and partition-invariant
    val a = Sampling.weightedSample(docs, "doc_id", col("n_chars"), 20)
      .select("doc_id").as[Long].collect().toSeq
    val b = Sampling.weightedSample(docs.repartition(13), "doc_id",
      col("n_chars"), 20).select("doc_id").as[Long].collect().toSeq
    assert(a == b)
    // weight bias: uniform-weight mean n_chars < weighted-sample mean
    val wMean = Sampling.weightedSample(docs, "doc_id", col("n_chars"), 50)
      .agg(avg("n_chars")).head.getDouble(0)
    val uMean = docs.agg(avg("n_chars")).head.getDouble(0)
    assert(wMean > uMean)
  }

  test("stratified sample is deterministic and partition-invariant") {
    val a = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.3), defaultRate = 0.5).select("doc_id")
      .as[Long].collect().sorted.toSeq
    val b = Sampling.stratifiedSample(docs.repartition(13), "doc_id", "lang",
      Map("en" -> 0.3), defaultRate = 0.5).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("stratified sample rate lands near the target fraction") {
    val total = docs.count().toDouble
    val kept = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map.empty, defaultRate = 0.5).count().toDouble
    assert(math.abs(kept / total - 0.5) < 0.15) // 500 docs, hash noise
  }

  test("token budget: every kept prefix is within budget, cut is tight") {
    val out = Sampling.tokenBudget(docs, "doc_id", "source",
      TextAnalysis.tokenCount(col("text")), budget = 200L)
    val maxCum = out.agg(max("cum_tokens")).as[Long].head()
    assert(maxCum <= 200L)
    // at least one source actually hit the cut (fixture sources carry
    // far more than 200 tokens)
    val perSource = out.groupBy("source").agg(max("cum_tokens").as("m"))
    assert(perSource.where($"m" > 100L).count() > 0)
    // deterministic across partitioning
    val again = Sampling.tokenBudget(docs.repartition(9), "doc_id", "source",
      TextAnalysis.tokenCount(col("text")), budget = 200L)
    assert(again.select("doc_id").as[Long].collect().sorted.toSeq ==
           out.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("hashSplit: partitions the corpus, near target fractions, stable") {
    val out = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val total = docs.count().toDouble
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == total.toLong) // every row exactly one split
    assert(math.abs(counts("train") / total - 0.8) < 0.1)
    // stable across partitioning: same doc → same split
    val again = Sampling.hashSplit(docs.repartition(11), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.select("doc_id", "split").as[(Long, String)].collect().sorted.toSeq
      == again.select("doc_id", "split").as[(Long, String)].collect().sorted.toSeq)
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, "doc_id", Seq("train" -> 0.5)) // sums to 0.5
    }
  }

  test("shuffleChunks: global_pos is a permutation of 0..n-1, stable") {
    val out = Sampling.shuffleChunks(docs, "doc_id", nChunks = 8)
    val n = docs.count()
    val pos = out.select("global_pos").as[Long].collect().sorted
    assert(pos.toSeq == (0L until n).toSeq) // dense permutation, no gaps
    // within a chunk, pos is dense from 0 too
    val chunk0 = out.where($"chunk" === out.agg(min("chunk")).head().getLong(0))
      .select("pos").as[Long].collect().sorted
    assert(chunk0.toSeq == (0L until chunk0.length).toSeq)
    // deterministic across input partitioning
    val again = Sampling.shuffleChunks(docs.repartition(7), "doc_id", nChunks = 8)
    assert(out.select("doc_id", "global_pos").as[(Long, Long)].collect().sorted.toSeq
      == again.select("doc_id", "global_pos").as[(Long, Long)].collect().sorted.toSeq)
  }

  test("repeatedSpans: planted cross-doc span is found, unique text is not") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "PRE alpha beta gamma delta epsilon zeta eta theta iota kappa POST"),
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedSpans(df, "doc_id", "text", n = 8, minDocs = 2)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // docs 1+2 share a 10-token run → 3 repeated 8-windows each; doc 3 none
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._1 == 3L)
    // doc 1: all 10 tokens covered → frac 1.0; doc 2: 10 of 12
    assert(out(1L)._2 == 1.0)
    assert(math.abs(out(2L)._2 - 10.0 / 12.0) < 1e-4)
  }

  test("ruleFilter flags agree with hand-computed stats") {
    val df = Seq(
      (1L, "the cat sat on the mat today quite happily indeed"), // clean → keep
      (2L, "a b"),                                    // too few tokens
      (3L, "zzzz qqqq xxxx wwww vvvv uuuu tttt ssss") // no stopwords
    ).toDF("doc_id", "text")
    val f = TextAnalysis.ruleFilter(col("text"))
    val m = df.select(col("doc_id"), f.getField("keep").as("k"),
        f.getField("len_ok").as("l"), f.getField("stopword_ok").as("s"))
      .as[(Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(m(1L) == (true, true, true))
    assert(m(2L)._2 == false && m(2L)._1 == false)
    assert(m(3L)._3 == false && m(3L)._1 == false)
  }

  test("native text_stats counters equal the Column formulations") {
    // edge zoo: tabs/newlines/VT/FF separators, unicode + surrogate
    // pairs (emoji counts as ONE char), punct inside tokens, leading/
    // trailing whitespace, empty and whitespace-only strings, stopword
    // case folding, repeated stopwords (total vs distinct)
    val texts = Seq(
      "the cat sat on the mat",
      "THE\tThe\nthe",
      "  padded   withodd\fseparators  ",
      "héllo wörld 🎉🎉 one.two,three!",
      "a:b;c?d",
      "", "   ", "\n\t",
      "singleword",
      "ends with punct...")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val sOld = df.select(col("id"),
      TextAnalysis.tokenCount(col("text")).as("n_tok"),
      TextAnalysis.charCount(col("text")).as("n_chars"),
      round(TextAnalysis.punctRatio(col("text")), 6).as("punct"),
      round(TextAnalysis.avgWordLen(col("text")), 6).as("awl"),
      round(TextAnalysis.stopwordRatio(col("text"),
        TextAnalysis.EnglishStopwords), 6).as("swr"))
      .orderBy("id").collect().map(_.toSeq)
    val st = TextAnalysis.textStats(col("text"))
    val sNew = df.withColumn("__s", st).select(col("id"),
      col("__s.n_tok").as("n_tok"),
      col("__s.n_chars").as("n_chars"),
      round(col("__s.punct_chars").cast("double") /
        greatest(col("__s.n_chars"), lit(1L)).cast("double"), 6).as("punct"),
      round(col("__s.sum_tok_chars").cast("double") /
        greatest(col("__s.n_tok"), lit(1L)).cast("double"), 6).as("awl"),
      round(col("__s.stop_total").cast("double") /
        greatest(col("__s.n_tok"), lit(1L)).cast("double"), 6).as("swr"))
      .orderBy("id").collect().map(_.toSeq)
    sOld.zip(sNew).foreach { case (o, n) =>
      assert(o == n, s"text '${texts(o.head.toString.toInt)}': $o != $n")
    }
  }

  test("shardManifest: covers every doc, stable across partition counts") {
    val m = Sampling.shardManifest(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), nShards = 16)
    val rows = m.collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(rows.forall { r =>
      val s = r.getAs[Long]("shard"); s >= 0 && s < 16 })
    val m4 = Sampling.shardManifest(docs.repartition(4), "doc_id",
      TextAnalysis.tokenCount(col("text")), nShards = 16)
    assert(m.orderBy("shard").collect().toSeq ==
      m4.orderBy("shard").collect().toSeq)
  }

  test("temperatureMixture: q sums to 1, flattens toward the tail") {
    val out = Sampling.temperatureMixture(docs, "lang", alpha = 0.5)
      .orderBy("lang").collect()
    val qSum = out.map(_.getAs[Double]("q")).sum
    assert(math.abs(qSum - 1.0) < 1e-4, s"q sum $qSum")
    // temperature < 1 shrinks the head stratum's share and grows every
    // tail stratum's: q < p on the largest, q > p on the smallest
    val byN = out.sortBy(_.getAs[Long]("n"))
    assert(byN.last.getAs[Double]("q") < byN.last.getAs[Double]("p"))
    assert(byN.head.getAs[Double]("q") > byN.head.getAs[Double]("p"))
    // alpha = 1 is the identity mixture
    val id = Sampling.temperatureMixture(docs, "lang", alpha = 1.0).collect()
    id.foreach(r => assert(
      math.abs(r.getAs[Double]("q") - r.getAs[Double]("p")) < 1e-6))
  }

  test("wordNgrams + ngramDiversity: exact grams, short-doc edge") {
    val d = Seq((1L, "a b c b c", "s1"), (2L, "x", "s1"), (3L, "", "s2"))
      .toDF("doc_id", "text", "src")
    val grams = d.select(col("doc_id"),
      TextAnalysis.wordNgrams(col("text"), 2).as("g")).orderBy("doc_id")
      .collect().map(_.getSeq[String](1))
    assert(grams(0) == Seq("a b", "b c", "c b", "b c"))
    assert(grams(1).isEmpty && grams(2).isEmpty)
    val div = TextAnalysis.ngramDiversity(d, "text", "src", 2).collect()
    assert(div.length == 1)  // s2/x contribute no grams
    val r = div.head
    assert(r.getAs[Long]("n_types") == 3 && r.getAs[Long]("n_total") == 4)
    assert(r.getAs[Double]("ttr") == 0.75)
  }

  test("sourceOverlap: pair counts match a brute-force check") {
    val d = Seq(
      (1L, "alpha beta", "s1"), (2L, "beta alpha", "s2"),  // same fp
      (3L, "alpha beta", "s3"), (4L, "gamma", "s1"),
      (5L, "gamma", "s2"), (6L, "delta", "s3")).toDF("doc_id", "text", "src")
    val got = Dedup.sourceOverlap(d, "text", "src")
      .orderBy("src_a", "src_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("s1", "s2", 2L),  // alpha-beta + gamma
      ("s1", "s3", 1L), ("s2", "s3", 1L)))
  }

  test("fimTransform: PSM reconstruction, determinism, rate bounds") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a"), (3L, ""), (4L, "hello world again"),
      (5L, "x" * 200), (6L, "unicode h\u00e9llo \ud83c\udf89 text"))
      .toDF("doc_id", "text")
    val out = Sampling.fimTransform(docs, "doc_id", "text", rate = 1.0)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Boolean]("fim_applied"), r.getAs[String]("fim_text"))).toSeq
    out.foreach { case (id, text, applied, fim) =>
      if (text.isEmpty) {
        assert(!applied && fim == text, s"doc $id")
      } else {
        assert(applied, s"doc $id should transform at rate=1.0")
        // PSM reconstruction: prefix + middle + suffix == original
        val m = "(?s)<fim_prefix>(.*)<fim_suffix>(.*)<fim_middle>(.*)".r
        fim match {
          case m(p, sfx, mid) => assert(p + mid + sfx == text, s"doc $id")
          case _ => fail(s"doc $id: not PSM form: $fim")
        }
      }
    }
    // deterministic across invocations and partitionings
    val again = Sampling.fimTransform(docs.repartition(3), "doc_id", "text",
      rate = 1.0).select("doc_id", "fim_text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    out.foreach { case (id, _, _, fim) => assert(again(id) == fim) }
    // rate 0 leaves everything untouched
    val none = Sampling.fimTransform(docs, "doc_id", "text", rate = 0.0)
    assert(none.where(col("fim_applied")).count() == 0)
    assert(none.where(col("fim_text") =!= col("text")).count() == 0)
  }

  test("spanCorrupt: input+target reassemble the original, determinism, rate bounds") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a"), (3L, ""), (4L, "hello world again and again"),
      (5L, "y" * 150), (6L, "unicode héllo text here"))
      .toDF("doc_id", "text")
    val out = Sampling.spanCorrupt(docs, "doc_id", "text", rate = 1.0)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Boolean]("corrupt_applied"), r.getAs[String]("corrupt_input"),
        r.getAs[String]("corrupt_target"))).toSeq
    val inRe = "(?s)(.*)<extra_id_0>(.*)<extra_id_1>(.*)".r
    val tgRe = "(?s)<extra_id_0>(.*)<extra_id_1>(.*)<extra_id_2>".r
    out.foreach { case (id, text, applied, inp, tgt) =>
      if (text.isEmpty) {
        assert(!applied && inp == text && tgt == null, s"doc $id")
      } else {
        assert(applied, s"doc $id should transform at rate=1.0")
        (inp, tgt) match {
          case (inRe(i0, i1, i2), tgRe(t0, t1)) =>
            // the denoising contract: interleaving input context with
            // target spans reproduces the document exactly
            assert(i0 + t0 + i1 + t1 + i2 == text, s"doc $id")
          case other => fail(s"doc $id: not T5 form: $other")
        }
      }
    }
    // deterministic across partitionings
    val again = Sampling.spanCorrupt(docs.repartition(3), "doc_id", "text",
      rate = 1.0).select("doc_id", "corrupt_input").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    out.foreach { case (id, _, _, inp, _) => assert(again(id) == inp) }
    // rate 0: untouched text, null targets
    val none = Sampling.spanCorrupt(docs, "doc_id", "text", rate = 0.0)
    assert(none.where(col("corrupt_applied")).count() == 0)
    assert(none.where(col("corrupt_input") =!= col("text")).count() == 0)
    assert(none.where(col("corrupt_target").isNotNull).count() == 0)
  }
}
