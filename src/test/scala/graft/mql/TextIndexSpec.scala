package graft.mql

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.llmops.TextIndex

/** `$search` persisted-index path: stored (term, df) + path summaries
  * replace the per-query corpus stats pass when derivable. */
class TextIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark makes big data simple"),
    (2L, "spark query engines love columns"),
    (3L, "window functions rank rows"),
    (4L, "completely unrelated text here")).toDF("doc_id", "text")

  private def runQ(pipeline: String,
                   resolve: PipelineCompiler.TableResolver = _ =>
                     throw new MqlException("no tables")) =
    PipelineCompiler.run(docs, pipeline, resolve)
      .as[(Long, Double)].collect().toSeq

  private val project =
    """{"$project": {"doc_id": 1, "score": {"$meta": "searchScore"}}},
       {"$sort": {"score": -1, "doc_id": 1}}"""

  test("indexed text search scores exactly like the corpus-stats pass") {
    val idx = TextIndex.build(docs, Seq("text"))
    val resolve: PipelineCompiler.TableResolver = {
      case "tidx" => idx
      case o => fail(s"unexpected $o")
    }
    val plain = runQ(s"""[
      {"$$search": {"text": {"query": "spark query window", "path": "text"},
        "limit": 10, "tieBreaker": "doc_id"}}, $project]""")
    val indexed = runQ(s"""[
      {"$$search": {"index": "tidx",
        "text": {"query": "spark query window", "path": "text"},
        "limit": 10, "tieBreaker": "doc_id"}}, $project]""", resolve)
    assert(plain.nonEmpty && indexed == plain)
  }

  test("phrase queries keep the corpus pass (index not derivable)") {
    val idx = TextIndex.build(docs, Seq("text"))
    val resolve: PipelineCompiler.TableResolver = { case "tidx" => idx }
    val plain = runQ(s"""[
      {"$$search": {"phrase": {"query": "spark query", "path": "text"},
        "limit": 10, "tieBreaker": "doc_id"}}, $project]""")
    val indexed = runQ(s"""[
      {"$$search": {"index": "tidx",
        "phrase": {"query": "spark query", "path": "text"},
        "limit": 10, "tieBreaker": "doc_id"}}, $project]""", resolve)
    assert(indexed == plain)
  }

  test("non-index collection and uncovered paths are refused loudly") {
    val resolve: PipelineCompiler.TableResolver = { case _ => docs }
    val e = intercept[MqlException] { runQ(s"""[
      {"$$search": {"index": "docs",
        "text": {"query": "spark", "path": "text"}, "limit": 5}},
      $project]""", resolve) }
    assert(e.getMessage.contains("not a text index"))

    val idxOther = TextIndex.build(docs.withColumnRenamed("text", "body"),
      Seq("body"))
    val resolve2: PipelineCompiler.TableResolver = { case _ => idxOther }
    val e2 = intercept[MqlException] { runQ(s"""[
      {"$$search": {"index": "other",
        "text": {"query": "spark", "path": "text"}, "limit": 5}},
      $project]""", resolve2) }
    assert(e2.getMessage.contains("does not cover path"))
  }

  test("update(build(A), B) equals build(A ∪ B)") {
    val a = docs.where($"doc_id" <= 2)
    val b = docs.where($"doc_id" > 2)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select($"kind", $"path", $"term", $"df", $"n_docs",
        org.apache.spark.sql.functions.round($"avgdl", 9).as("avgdl"))
      .orderBy("kind", "term").collect().toSeq
    val merged = canon(TextIndex.update(
      TextIndex.build(a, Seq("text")), b, Seq("text")))
    val full = canon(TextIndex.build(docs, Seq("text")))
    assert(merged == full)
    // and an indexed query through the MERGED index matches plain
    val resolve: PipelineCompiler.TableResolver = {
      case "m" => TextIndex.update(TextIndex.build(a, Seq("text")), b, Seq("text"))
    }
    val plain = runQ(s"""[
      {"$$search": {"text": {"query": "spark query window", "path": "text"},
        "limit": 10, "tieBreaker": "doc_id"}}, $project]""")
    val viaMerged = runQ(s"""[
      {"$$search": {"index": "m",
        "text": {"query": "spark query window", "path": "text"},
        "limit": 10, "tieBreaker": "doc_id"}}, $project]""", resolve)
    assert(viaMerged == plain)
  }

  test("postings index: winners fetched via semi-join, scores identical") {
    val idx = TextIndex.build(docs, Seq("text"), Some("doc_id"))
    val resolve: PipelineCompiler.TableResolver = { case "inv" => idx }
    val plain = runQ(s"""[
      {"$$search": {"text": {"query": "spark query window", "path": "text"},
        "limit": 2, "tieBreaker": "doc_id"}}, $project]""")
    val indexed = PipelineCompiler.run(docs, s"""[
      {"$$search": {"index": "inv",
        "text": {"query": "spark query window", "path": "text"},
        "limit": 2, "tieBreaker": "doc_id"}}, $project]""", resolve)
    assert(indexed.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
      "postings plan should fetch winners via a left-semi join")
    assert(indexed.as[(Long, Double)].collect().toSeq == plain)
    // the candidate set is the full MATCHED set (not a precomputed
    // top-k), so the pruning also serves user-sort shapes correctly
    val sorted = PipelineCompiler.run(docs, s"""[
      {"$$search": {"index": "inv",
        "text": {"query": "spark", "path": "text"},
        "sort": {"doc_id": -1}, "limit": 2, "tieBreaker": "doc_id"}},
      {"$$project": {"doc_id": 1}}]""", resolve)
    assert(sorted.as[Long].collect().toSeq == Seq(2L, 1L))
    // ...and a $search over an upstream-FILTERED frame: matched-ids
    // pruning only removes rows the match filter would drop anyway
    val filtered = PipelineCompiler.run(docs.where($"doc_id" >= 2), s"""[
      {"$$search": {"index": "inv",
        "text": {"query": "spark", "path": "text"},
        "limit": 5, "tieBreaker": "doc_id"}},
      {"$$project": {"doc_id": 1}}]""", resolve)
    assert(filtered.as[Long].collect().toSeq == Seq(2L))
  }

  test("update carries postings: fold equals full postings build") {
    val a = docs.where($"doc_id" <= 2)
    val b = docs.where($"doc_id" > 2)
    def canonAll(df: org.apache.spark.sql.DataFrame) = df
      .select($"kind", $"path", $"term", $"df", $"n_docs",
        org.apache.spark.sql.functions.round($"avgdl", 9).as("avgdl"),
        $"doc_id", $"tf", $"dl")
      .orderBy("kind", "term", "doc_id").collect().toSeq
    val merged = canonAll(TextIndex.update(
      TextIndex.build(a, Seq("text"), Some("doc_id")), b, Seq("text")))
    val full = canonAll(TextIndex.build(docs, Seq("text"), Some("doc_id")))
    assert(merged == full)
  }

  test("$searchMeta count answers from the postings index alone") {
    val idx = TextIndex.build(docs, Seq("text"), Some("doc_id"))
    val resolve: PipelineCompiler.TableResolver = { case "inv" => idx }
    def count(pipeline: String,
              r: PipelineCompiler.TableResolver = resolve): Long =
      PipelineCompiler.run(docs, pipeline, r)
        .select("count.total").collect().head.getLong(0)
    val plain = count("""[{"$searchMeta": {
      "text": {"query": "spark query window", "path": "text"},
      "count": {"type": "total"}}}]""",
      { case n => throw new MqlException(s"no $n") })
    val indexed = count("""[{"$searchMeta": {"index": "inv",
      "text": {"query": "spark query window", "path": "text"},
      "count": {"type": "total"}}}]""")
    assert(indexed == plain && plain == 3L)
  }

  test("postings plan property: 40 random term sets and limits agree with the corpus plan") {
    val idx = TextIndex.build(docs, Seq("text"), Some("doc_id"))
    val resolve: PipelineCompiler.TableResolver = { case "inv" => idx }
    val vocab = Seq("spark", "query", "window", "simple", "rank", "columns",
      "engines", "data", "unrelated", "nosuchterm", "rows")
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 40) {
      val terms = rnd.shuffle(vocab).take(1 + rnd.nextInt(4)).mkString(" ")
      val lim = 1 + rnd.nextInt(4)
      val q = (idxOpt: String) => s"""[
        {"$$search": {$idxOpt"text": {"query": "$terms", "path": "text"},
          "limit": $lim, "tieBreaker": "doc_id"}}, $project]"""
      val plain = runQ(q(""))
      val viaIdx = runQ(q(""""index": "inv", """), resolve)
      assert(viaIdx == plain, s"terms='$terms' limit=$lim")
    }
  }

  test("remove(build(A), B) equals build(A \\ B), corpus untouched") {
    import org.apache.spark.sql.functions.round
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select($"kind", $"path", $"term", $"df", $"n_docs",
        round($"avgdl", 9).as("avgdl"), $"doc_id", $"tf", $"dl")
      .orderBy("kind", "term", "doc_id").collect().toSeq
    val full = TextIndex.build(docs, Seq("text"), Some("doc_id"))
    val removed = TextIndex.remove(full,
      docs.where($"doc_id" >= 3).select("doc_id"), "doc_id")
    val rebuilt = TextIndex.build(
      docs.where($"doc_id" < 3), Seq("text"), Some("doc_id"))
    assert(canon(removed) == canon(rebuilt))
    // terms whose last document left drop out entirely
    val gone = removed.where($"kind" === "term" && $"term" === "window").count()
    assert(gone == 0)
    // an indexed query through the SHRUNK index matches a plain query
    // over the shrunk corpus
    val small = docs.where($"doc_id" < 3)
    val resolve: PipelineCompiler.TableResolver = { case "r" => removed }
    val q = s"""{"$$search": {%s"text": {"query": "spark query", "path": "text"},
        "limit": 10, "tieBreaker": "doc_id"}}, $project]"""
    val plain = PipelineCompiler.run(small, "[" + q.format(""))
      .as[(Long, Double)].collect().toSeq
    val viaIdx = PipelineCompiler.run(small, "[" + q.format("\"index\": \"r\", "),
      resolve).as[(Long, Double)].collect().toSeq
    assert(viaIdx == plain)
    // a statistics-only index cannot support deletion — refuse loudly
    intercept[IllegalArgumentException](
      TextIndex.remove(TextIndex.build(docs, Seq("text")),
        docs.select("doc_id"), "doc_id"))
  }

  test("removing every doc of a path keeps its summary (empty-build shape)") {
    import graft.llmops.TextIndex
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val idx = TextIndex.build(docs, Seq("text"), postingsIdCol = Some("doc_id"))
    val emptied = TextIndex.remove(idx,
      Seq(1L, 2L).toDF("doc_id"), "doc_id")
    // the summary row survives with the empty-corpus shape: a $search
    // against this index must return zero matches, not refuse coverage
    val sum = emptied.where($"kind" === "summary").select("path", "n_docs")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sum == Seq(("text", 0L)))
    assert(emptied.where($"kind" === "doc").count() == 0)
    assert(emptied.where($"kind" === "term").count() == 0)
  }

  test("returnStoredSource: match, score, and output from the index alone") {
    import org.apache.spark.sql.functions.lit
    val idx = TextIndex.build(docs, Seq("text"), Some("doc_id"),
      storedSource = Seq("doc_id", "text"))
    val resolve: PipelineCompiler.TableResolver = { case "s" => idx }
    // the source frame is a POISON corpus: if the stored path ever read
    // from it, text would be empty and every score would change
    val poisoned = docs.withColumn("text", lit(""))
    val q = s"""[{"$$search": {"index": "s", %s
        "text": {"query": "spark query", "path": "text"},
        "limit": 10, "tieBreaker": "doc_id"}}, $project]"""
    val viaStored = PipelineCompiler.run(poisoned,
      q.format("\"returnStoredSource\": true,"), resolve)
      .as[(Long, Double)].collect().toSeq
    val plain = runQ(q.format(""), resolve)
    assert(viaStored == plain && viaStored.nonEmpty)
    // update folds the new batch's stored rows through the recorded
    // schema; remove drops them — both keep the stored plan working
    val grown = TextIndex.update(
      TextIndex.build(docs.where($"doc_id" <= 2), Seq("text"),
        Some("doc_id"), Seq("doc_id", "text")),
      docs.where($"doc_id" > 2), Seq("text"))
    assert(grown.where($"kind" === "stored").count() == 4)
    val shrunk = TextIndex.remove(grown,
      docs.where($"doc_id" >= 3).select("doc_id"), "doc_id")
    assert(shrunk.where($"kind" === "stored").count() == 2)
    // a query scoring a path the index does not store is refused
    val noText = TextIndex.build(docs, Seq("text"), Some("doc_id"),
      storedSource = Seq("doc_id"))
    val r2: PipelineCompiler.TableResolver = { case "n" => noText }
    val err = intercept[MqlException](PipelineCompiler.run(poisoned,
      s"""[{"$$search": {"index": "n", "returnStoredSource": true,
        "text": {"query": "spark", "path": "text"},
        "limit": 5, "tieBreaker": "doc_id"}}, $project]""", r2))
    assert(err.getMessage.contains("does not store"))
  }

  test("CRUD property: update/remove chains equal from-scratch builds") {
    import org.apache.spark.sql.functions.{col, round}
    val corpus = SparkFixture.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("kind"), col("path"), col("term"), col("df"),
        col("n_docs"), round(col("avgdl"), 9).as("avgdl"),
        col("doc_id"), col("tf"), col("dl"))
      .orderBy("kind", "term", "doc_id").collect().toSeq
    for (m <- 2 to 5; r <- 0 to 1) {
      val a = corpus.where(col("doc_id") % m === r)
      val b = corpus.where(col("doc_id") % m =!= r)
      val full = TextIndex.build(corpus, Seq("text"), Some("doc_id"))
      // fold B into A's index ≡ full build
      val folded = TextIndex.update(
        TextIndex.build(a, Seq("text"), Some("doc_id")), b, Seq("text"))
      assert(canon(folded) == canon(full), s"update mismatch m=$m r=$r")
      // remove B's ids from the full index ≡ A's build
      val removed = TextIndex.remove(full, b.select("doc_id"), "doc_id")
      assert(canon(removed) ==
        canon(TextIndex.build(a, Seq("text"), Some("doc_id"))),
        s"remove mismatch m=$m r=$r")
    }
  }

  test("unknown index name falls back to self-computed stats") {
    val plain = runQ(s"""[
      {"$$search": {"text": {"query": "spark", "path": "text"},
        "limit": 5, "tieBreaker": "doc_id"}}, $project]""")
    val fallback = runQ(s"""[
      {"$$search": {"index": "nope",
        "text": {"query": "spark", "path": "text"},
        "limit": 5, "tieBreaker": "doc_id"}}, $project]""")
    assert(fallback == plain)
  }

  test("autocomplete from the edgeGram index: candidates via LeftSemi " +
       "gram-postings intersection, results ≡ the corpus pass, no " +
       "corpus scan feeding the match") {
    val auto = """{"tokenizer": "whitespace", "tokenFilters": [
      {"type": "lowercase"},
      {"type": "edgeGram", "minGram": 2, "maxGram": 6}]}"""
    val idx = TextIndex.build(docs, Seq("text"), Some("doc_id"),
      Map("text" -> auto))
    val resolve: PipelineCompiler.TableResolver = { case "ac" => idx }
    // corpus-pass twin (no index): default-analyzer autocomplete
    val plain = runQ(s"""[
      {"$$search": {"autocomplete": {"query": "spark qu", "path": "text"}}},
      $project]""")
    assert(plain.map(_._1) == Seq(2L)) // "spark query engines..."
    val indexed = PipelineCompiler.run(docs, s"""[
      {"$$search": {"index": "ac",
        "autocomplete": {"query": "spark qu", "path": "text"}}},
      $project]""", resolve)
    assert(indexed.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
      "autocomplete-over-index should fetch candidates via left-semi join")
    assert(indexed.as[(Long, Double)].collect().toSeq == plain)
    // single-token prefix form; gram intersection is the superset, the
    // re-run match predicate enforces the consecutive-run contract
    val one = PipelineCompiler.run(docs, s"""[
      {"$$search": {"index": "ac",
        "autocomplete": {"query": "spar", "path": "text"}}},
      {"$$project": {"doc_id": 1}}, {"$$sort": {"doc_id": 1}}]""", resolve)
    assert(one.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(one.as[Long].collect().toSeq == Seq(1L, 2L))
    // prefix LONGER than maxGram: truncated gram is still a superset
    val long = PipelineCompiler.run(docs, s"""[
      {"$$search": {"index": "ac",
        "autocomplete": {"query": "complete", "path": "text"}}},
      {"$$project": {"doc_id": 1}}]""", resolve)
    assert(long.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(long.as[Long].collect().toSeq == Seq(4L))
    // prefix SHORTER than minGram: no usable gram — silent corpus pass,
    // same results, no semi-join
    val short = PipelineCompiler.run(docs, s"""[
      {"$$search": {"index": "ac",
        "autocomplete": {"query": "s", "path": "text"}}},
      {"$$project": {"doc_id": 1}}, {"$$sort": {"doc_id": 1}}]""", resolve)
    assert(!short.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(short.as[Long].collect().toSeq == Seq(1L, 2L))
    // a non-autocomplete clause on the gram-analyzed path refuses (its
    // token column would need the gram stream in the same stage)
    val e = intercept[MqlException] { PipelineCompiler.run(docs, s"""[
      {"$$search": {"index": "ac", "compound": {"must": [
        {"autocomplete": {"query": "spark qu", "path": "text"}},
        {"text": {"query": "engines", "path": "text"}}]}}},
      {"$$project": {"doc_id": 1}}]""", resolve).collect() }
    assert(e.getMessage.contains("autocomplete"))
    // and any OTHER non-default analyzer still refuses autocomplete
    val idx2 = TextIndex.build(docs, Seq("text"),
      Map("text" -> "lucene.standard"))
    val r2: PipelineCompiler.TableResolver = { case "std" => idx2 }
    val e2 = intercept[MqlException] { PipelineCompiler.run(docs, s"""[
      {"$$search": {"index": "std",
        "autocomplete": {"query": "spark qu", "path": "text"}}},
      {"$$project": {"doc_id": 1}}]""", r2).collect() }
    assert(e2.getMessage.contains("only the default analyzer"))
  }
}
