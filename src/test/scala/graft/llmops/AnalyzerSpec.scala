package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.mql.{MqlException, PipelineCompiler}

/** Atlas analyzer surface: doc-side / query-side tokenizer agreement
  * per analyzer, index-declared per-path analyzers, and the refusal
  * matrix (unknown names, index/query disagreement, operators whose own
  * analysis contract admits only the default). */
class AnalyzerSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  // punctuation, case, apostrophes, digits, unicode letters, empties
  private val fixtures = Seq(
    "Customer#000000042 paid $15.30",
    "don't STOP the Café-au-lait",
    "  spaced   out\ttabs ",
    "", "2.5 x 10",
    "ALLCAPS mixedCase lower")

  test("query-side and document-side tokenization agree, per analyzer") {
    val df = fixtures.toDF("t")
    Analyzers.Names.foreach { name =>
      val docSide = df.select(Analyzers.docTokens(name, col("t")).as("w"))
        .collect().map(r => r.getSeq[String](0).toList).toList
      val querySide = fixtures.map(Analyzers.queryTerms(name, _).toList)
      assert(docSide == querySide, s"analyzer '$name' disagrees")
    }
  }

  test("analyzer semantics: the documented contracts hold") {
    def q(n: String, s: String) = Analyzers.queryTerms(n, s)
    assert(q("graft.whitespace", "Customer#07 A b") ==
      Seq("customer#07", "a", "b"))
    assert(q("lucene.whitespace", "Customer#07 A b") ==
      Seq("Customer#07", "A", "b"))
    assert(q("lucene.standard", "Customer#000000042 don't 2.5") ==
      Seq("customer", "000000042", "don't", "2", "5"))
    assert(q("lucene.simple", "Customer#42 don't") ==
      Seq("customer", "don", "t"))
    assert(q("lucene.keyword", "One Exact Term") == Seq("One Exact Term"))
    assert(q("lucene.keyword", "") == Nil)
    // lucene.english: possessive strip → lowercase → stop list → Porter
    assert(q("lucene.english", "The Dog's Connections are running") ==
      Seq("dog", "connect", "run"))
    assert(q("lucene.english", "generalizations of the oscillators") ==
      Seq("gener", "oscil"))
    // possessive strip happens before lowercase/stem (the typographic
    // U+2019 form splits at the standard tokenizer — the documented
    // lucene.standard divergence — so only ASCII ' reaches the filter)
    assert(q("lucene.english", "Maria's thesis") ==
      Seq("maria", "thesi"))
    // the full 33-word stop list drops
    assert(q("lucene.english",
      "a an and are as at be but by for if in into is it no not of on " +
        "or such that the their then there these they this to was will " +
        "with") == Nil)
  }

  test("lucene.english custom-chain equivalence: the built-in name and " +
       "its spelled-out custom definition tokenize identically") {
    val custom = s"""{"tokenizer": "standard", "tokenFilters": [
      {"type": "englishPossessive"}, {"type": "lowercase"},
      {"type": "stopword", "tokens": [${Analyzers.EnglishStops
        .map("\"" + _ + "\"").mkString(",")}], "ignoreCase": false},
      {"type": "porterStemming"}]}"""
    for (t <- fixtures :+ "The Dog's Connections are running wildly")
      assert(Analyzers.queryTerms("lucene.english", t) ==
        Analyzers.queryTerms(custom, t), s"disagree on '$t'")
  }

  test("unknown analyzer names refuse loudly everywhere") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(intercept[MqlException] {
      Analyzers.validate("lucene.french", "ctx")
    }.getMessage.contains("unknown analyzer"))
    assert(intercept[MqlException] {
      TextIndex.build(docs, Seq("text"), Map("text" -> "lucene.bogus"))
    }.getMessage.contains("unknown analyzer"))
    assert(intercept[MqlException] {
      PipelineCompiler.run(docs, """[
        {"$search": {"analyzer": "lucene.bogus",
          "text": {"query": "a", "path": "text"}}}]""")
    }.getMessage.contains("unknown analyzer"))
    // a declared path that is not indexed is a typo, not a no-op
    assert(intercept[IllegalArgumentException] {
      TextIndex.build(docs, Seq("text"), Map("txt" -> "lucene.standard"))
    }.getMessage.contains("not indexed"))
  }

  private lazy val names = Seq(
    (1L, "Customer#000000001"), (2L, "Customer#000000002"),
    (3L, "Customer#000000003"), (4L, "Supplier#000000004"))
    .toDF("id", "name")

  test("stage analyzer changes matching: standard splits what whitespace keeps") {
    def hits(spec: String): Seq[Long] =
      PipelineCompiler.run(names, s"""[
        {"$$search": $spec},
        {"$$project": {"id": 1}}, {"$$sort": {"id": 1}}]""")
        .as[Long].collect().toSeq
    // default (lowercase whitespace): "customer" is not a token of
    // "Customer#000000002" — no matches
    assert(hits("""{"text": {"query": "Customer", "path": "name"}}""")
      == Nil)
    assert(hits("""{"analyzer": "lucene.standard",
        "text": {"query": "Customer", "path": "name"}}""")
      == Seq(1L, 2L, 3L))
    // non-folding analyzer: case-sensitive terms
    assert(hits("""{"analyzer": "lucene.whitespace",
        "text": {"query": "customer#000000001", "path": "name"}}""")
      == Nil)
    assert(hits("""{"analyzer": "lucene.whitespace",
        "text": {"query": "Customer#000000001", "path": "name"}}""")
      == Seq(1L))
    assert(hits("""{"analyzer": "lucene.keyword",
        "text": {"query": "Customer#000000004", "path": "name"}}""")
      == Nil)
    assert(hits("""{"analyzer": "lucene.keyword",
        "text": {"query": "Supplier#000000004", "path": "name"}}""")
      == Seq(4L))
  }

  test("index-declared analyzer drives both sides; disagreement refuses") {
    val idx = TextIndex.build(names, Seq("name"),
      Map("name" -> "lucene.standard"))
    assert(TextIndex.indexAnalyzers(idx) == Map("name" -> "lucene.standard"))
    val resolve: PipelineCompiler.TableResolver = {
      case "nidx" => idx
      case o => fail(s"unexpected $o")
    }
    // no stage option: the index's analyzer applies
    val scored = PipelineCompiler.run(names, """[
      {"$search": {"index": "nidx",
        "text": {"query": "Customer", "path": "name"},
        "limit": 10, "tieBreaker": "id"}},
      {"$project": {"id": 1}}, {"$sort": {"id": 1}}]""", resolve)
      .as[Long].collect().toSeq
    assert(scored == Seq(1L, 2L, 3L))
    // a matching stage option is redundant but legal
    PipelineCompiler.run(names, """[
      {"$search": {"index": "nidx", "analyzer": "lucene.standard",
        "text": {"query": "Customer", "path": "name"},
        "limit": 10, "tieBreaker": "id"}},
      {"$project": {"id": 1}}]""", resolve).collect()
    // a disagreeing one must refuse, not silently mis-score —
    // including the default-vs-declared direction
    val e1 = intercept[MqlException] {
      PipelineCompiler.run(names, """[
        {"$search": {"index": "nidx", "analyzer": "graft.whitespace",
          "text": {"query": "Customer", "path": "name"}}}]""", resolve)
    }
    assert(e1.getMessage.contains("must agree"))
    val plain = TextIndex.build(names, Seq("name"))
    val resolve2: PipelineCompiler.TableResolver = { case _ => plain }
    val e2 = intercept[MqlException] {
      PipelineCompiler.run(names, """[
        {"$search": {"index": "pidx", "analyzer": "lucene.standard",
          "text": {"query": "Customer", "path": "name"}}}]""", resolve2)
    }
    assert(e2.getMessage.contains("must agree"))
  }

  test("update folds new docs with the index's declared analyzer") {
    val idx = TextIndex.build(names.where(col("id") <= 2), Seq("name"),
      Map("name" -> "lucene.standard"))
    val folded = TextIndex.update(idx, names.where(col("id") > 2), Seq("name"))
    // analyzer row carried once
    assert(TextIndex.indexAnalyzers(folded) ==
      Map("name" -> "lucene.standard"))
    // fold ≡ rebuild: the delta must have analyzed with lucene.standard
    val rebuilt = TextIndex.build(names, Seq("name"),
      Map("name" -> "lucene.standard"))
    def termSet(ix: org.apache.spark.sql.DataFrame) =
      ix.where(col("kind") === "term").select("term", "df")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(termSet(folded) == termSet(rebuilt))
  }

  private val customStd =
    """{"tokenizer": "standard", "tokenFilters": [
         {"type": "lowercase"},
         {"type": "asciiFolding"},
         {"type": "stopword", "tokens": ["the"]},
         {"type": "length", "min": 2, "max": 10}]}"""

  test("custom analyzers: doc/query agreement, declared filter order") {
    val df = fixtures.toDF("t")
    val docSide = df.select(Analyzers.docTokens(customStd, col("t")).as("w"))
      .collect().map(r => r.getSeq[String](0).toList).toList
    val querySide = fixtures.map(Analyzers.queryTerms(customStd, _).toList)
    assert(docSide == querySide)
    // the chain applied: lowercase → fold → stopword → length
    assert(Analyzers.queryTerms(customStd, "The Café-au-lait is x big") ==
      Seq("cafe", "au", "lait", "is", "big")) // 'the' stopped, 'x' too short
    // ORDER matters: stopword(ignoreCase=false) before lowercase keeps
    // the capitalized form that the stoplist no longer matches
    val stopFirst = """{"tokenizer": "whitespace", "tokenFilters": [
        {"type": "stopword", "tokens": ["the"], "ignoreCase": false},
        {"type": "lowercase"}]}"""
    val lowerFirst = """{"tokenizer": "whitespace", "tokenFilters": [
        {"type": "lowercase"},
        {"type": "stopword", "tokens": ["the"], "ignoreCase": false}]}"""
    assert(Analyzers.queryTerms(stopFirst, "The the") == Seq("the"))
    assert(Analyzers.queryTerms(lowerFirst, "The the") == Nil)
  }

  test("custom analyzers: normalization makes spelling-variant " +
       "definitions compare equal") {
    val variant = """{ "tokenFilters": [ "lowercase", "asciiFolding",
        {"tokens": ["the"], "type": "stopword", "ignoreCase": true},
        {"min": 2, "type": "length", "max": 10} ],
        "tokenizer": {"type": "standard"} }"""
    assert(Analyzers.normalize(customStd, "t") ==
      Analyzers.normalize(variant, "t"))
    // index built with one spelling, stage option with the other: agree
    val idx = TextIndex.build(names, Seq("name"), Map("name" -> customStd))
    val resolve: PipelineCompiler.TableResolver = { case _ => idx }
    val out = PipelineCompiler.run(names, s"""[
      {"$$search": {"index": "cidx",
        "analyzer": ${variant},
        "text": {"query": "customer", "path": "name"},
        "limit": 10, "tieBreaker": "id"}},
      {"$$project": {"id": 1}}, {"$$sort": {"id": 1}}]""", resolve)
      .as[Long].collect().toSeq
    assert(out == Seq(1L, 2L, 3L))
    // a genuinely different definition refuses
    assert(intercept[MqlException] {
      PipelineCompiler.run(names, """[
        {"$search": {"index": "cidx",
          "analyzer": {"tokenizer": "whitespace"},
          "text": {"query": "customer", "path": "name"}}}]""", resolve)
    }.getMessage.contains("must agree"))
  }

  test("custom analyzers: charFilters htmlStrip + mapping, both sides agree") {
    val html = """{"tokenizer": "standard",
        "charFilters": ["htmlStrip"],
        "tokenFilters": [{"type": "lowercase"}]}"""
    assert(Analyzers.queryTerms(html,
      "<p>Hello <b>World</b></p><br/>done") == Seq("hello", "world", "done"))
    val mapped = """{"tokenizer": "whitespace",
        "charFilters": [{"type": "mapping",
          "mappings": {"-": " ", "&": " and "}}],
        "tokenFilters": [{"type": "lowercase"}]}"""
    assert(Analyzers.queryTerms(mapped, "data-driven R&D") ==
      Seq("data", "driven", "r", "and", "d"))
    // Column side agrees token for token on the shared fixture
    val df = fixtures.toDF("t")
    for (a <- Seq(html, mapped)) {
      val docSide = df.select(Analyzers.docTokens(a, col("t")).as("w"))
        .collect().map(r => r.getSeq[String](0).toList).toList
      assert(docSide == fixtures.map(Analyzers.queryTerms(a, _).toList),
        s"charFilter analyzer disagrees: $a")
    }
    // normalization covers charFilters (order + mappings canonicalized)
    val variant = """{ "tokenFilters": ["lowercase"],
        "charFilters": [ {"mappings": {"-": " ", "&": " and "},
          "type": "mapping"} ], "tokenizer": "whitespace" }"""
    assert(Analyzers.normalize(mapped, "t") ==
      Analyzers.normalize(variant, "t"))
  }

  test("gram families: edgeGram / nGram / shingle semantics and " +
       "doc/query agreement") {
    val edge = """{"tokenizer": "whitespace", "tokenFilters": [
        {"type": "lowercase"},
        {"type": "edgeGram", "minGram": 2, "maxGram": 4}]}"""
    val ngram = """{"tokenizer": "whitespace", "tokenFilters": [
        {"type": "lowercase"},
        {"type": "nGram", "minGram": 2, "maxGram": 3}]}"""
    val shingle = """{"tokenizer": "whitespace", "tokenFilters": [
        {"type": "lowercase"},
        {"type": "shingle", "minShingleSize": 2, "maxShingleSize": 3}]}"""
    // edgeGram: prefixes of 2..4; 1-char tokens emit nothing
    assert(Analyzers.queryTerms(edge, "Spark a go") ==
      Seq("sp", "spa", "spar", "go"))
    // nGram: every substring of 2..3
    assert(Analyzers.queryTerms(ngram, "abcd x") ==
      Seq("ab", "bc", "cd", "abc", "bcd"))
    // shingle: unigrams + 2- and 3-token windows
    assert(Analyzers.queryTerms(shingle, "a b c") ==
      Seq("a", "b", "c", "a b", "b c", "a b c"))
    // streams shorter than minShingleSize emit unigrams only
    assert(Analyzers.queryTerms(shingle, "solo") == Seq("solo"))
    // doc/query agreement, token for token, on the shared fixture
    val df = fixtures.toDF("t")
    Seq(edge, ngram, shingle).foreach { a =>
      val docSide = df.select(Analyzers.docTokens(a, col("t")).as("w"))
        .collect().map(r => r.getSeq[String](0).toList).toList
      val querySide = fixtures.map(Analyzers.queryTerms(a, _).toList)
      assert(docSide == querySide, s"gram analyzer disagrees: $a")
    }
    // normalization round-trips the gram parameters
    assert(Analyzers.normalize(edge, "t").contains(
      """{"type":"edgeGram","minGram":2,"maxGram":4}"""))
    // parameter validation refuses
    def bad(s: String): String =
      intercept[MqlException](Analyzers.validate(s, "ctx")).getMessage
    assert(bad("""{"tokenizer": "standard", "tokenFilters": [
        {"type": "edgeGram", "minGram": 0, "maxGram": 3}]}""")
      .contains("minGram <= maxGram"))
    assert(bad("""{"tokenizer": "standard", "tokenFilters": [
        {"type": "nGram", "minGram": 4, "maxGram": 2}]}""")
      .contains("minGram <= maxGram"))
    assert(bad("""{"tokenizer": "standard", "tokenFilters": [
        {"type": "shingle", "minShingleSize": 1, "maxShingleSize": 2}]}""")
      .contains("minShingleSize"))
    assert(bad("""{"tokenizer": "standard", "tokenFilters": [
        {"type": "edgeGram"}]}""").contains("needs minGram"))
  }

  test("custom analyzers: refusal matrix") {
    def bad(s: String): String =
      intercept[MqlException](Analyzers.validate(s, "ctx")).getMessage
    assert(bad("""{"tokenizer": "edgeGram"}""").contains("unsupported tokenizer"))
    assert(bad("""{"tokenizer": "standard",
        "tokenFilters": [{"type": "snowballStemming"}]}""")
      .contains("unsupported token filter"))
    assert(bad("""{"tokenizer": "standard",
        "charFilters": [{"type": "icuNormalize"}]}""")
      .contains("unsupported char filter"))
    assert(bad("""{"tokenizer": "standard",
        "charFilters": [{"type": "mapping", "mappings": {}}]}""")
      .contains("non-empty mappings"))
    assert(bad("""{"tokenFilters": []}""").contains("needs a tokenizer"))
    assert(bad("""{"tokenizer": "standard",
        "tokenFilters": [{"type": "length", "min": 5, "max": 2}]}""")
      .contains("min <= max"))
    assert(bad("""{"tokenizer": "standard",
        "tokenFilters": [{"type": "stopword", "tokens": []}]}""")
      .contains("non-empty"))
    assert(bad("""not json {""").contains("unknown analyzer"))
  }

  test("operators with their own analysis contract refuse non-default analyzers") {
    def run(spec: String) = PipelineCompiler.run(names, s"""[
      {"$$search": $spec}, {"$$project": {"id": 1}}]""")
    assert(intercept[MqlException] { run("""{"analyzer": "lucene.standard",
      "autocomplete": {"query": "cust", "path": "name"}}""") }
      .getMessage.contains("only the default analyzer"))
    assert(intercept[MqlException] { run("""{"analyzer": "lucene.standard",
      "queryString": {"defaultPath": "name", "query": "customer"}}""") }
      .getMessage.contains("only the default analyzer"))
    assert(intercept[MqlException] { run("""{"analyzer": "lucene.standard",
      "text": {"query": "customer", "path": "name"},
      "highlight": {"path": "name"}}""") }
      .getMessage.contains("only the default analyzer"))
    // synonyms need folding
    val syn = Seq(("equivalent", Seq("customer", "client")))
      .toDF("mappingType", "synonyms")
    val resolve: PipelineCompiler.TableResolver = { case _ => syn }
    assert(intercept[MqlException] {
      PipelineCompiler.run(names, """[
        {"$search": {"analyzer": "lucene.whitespace",
          "text": {"query": "customer", "path": "name",
            "synonyms": "syn"}}}]""", resolve)
    }.getMessage.contains("case-folding"))
  }
}
