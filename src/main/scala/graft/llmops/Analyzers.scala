package graft.llmops

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Atlas-style text analyzers for `$search` / TextIndex — the analysis
  * step Lucene runs on BOTH the indexed documents and the query string
  * (reference: the pipelines the client passes through uninterpreted are
  * analyzed server-side by the index's declared analyzer; P/api.py
  * delegates, so the analyzer lives here, engine-side).
  *
  * Every analyzer has a Column form (document side — codegen'd
  * builtins, no UDFs) and a Scala form (query side) that MUST agree
  * token for token; AnalyzerSpec pins the agreement on a shared fixture.
  * Both forms are replayable in DuckDB (regexp_extract_all + lower), so
  * analyzer-selecting gates keep full oracle twins.
  *
  * Supported names (unknown names refuse loudly — a typo must never
  * silently fall back to a different tokenization):
  *  - `graft.whitespace` (engine default): lowercase + whitespace split
  *    — Atlas `lucene.whitespace` plus lowercase folding, the tokenizer
  *    every index/gate before analyzer support used; stays the default
  *    for compatibility with existing indexes.
  *  - `lucene.standard`: lowercase + Unicode word-break, simplified to
  *    maximal letter/digit runs joined by single ASCII apostrophes
  *    between alphanumerics (UAX#29 MidLetter: "don't" is one token).
  *    Divergences from full UAX#29 are documented here: numeric
  *    MidNum joiners ("2.5" splits to "2","5") and typographic
  *    apostrophes are NOT joined.
  *  - `lucene.whitespace`: whitespace split, NO case folding.
  *  - `lucene.simple`: lowercase + maximal letter runs (digits split).
  *  - `lucene.keyword`: the whole field value as one exact term, no
  *    folding (empty string analyzes to no terms).
  */
object Analyzers {
  val Default = "graft.whitespace"

  /** letter/digit runs, apostrophe-joined (see lucene.standard note) */
  private val StandardRx = "[\\p{L}\\p{N}]+(?:'[\\p{L}\\p{N}]+)*"
  private val SimpleRx = "\\p{L}+"

  val Names: Set[String] = Set(Default, "lucene.standard",
    "lucene.whitespace", "lucene.simple", "lucene.keyword")

  /** Refuses unknown analyzer names (MQL-surface error). */
  def validate(name: String, ctx: String): Unit =
    if (!Names(name)) throw new graft.mql.MqlException(
      s"$ctx: unknown analyzer '$name' (supported: " +
        Names.toSeq.sorted.mkString(", ") + ")")

  /** Whether analysis case-folds — decides if query-side constants
    * (wildcard/regex patterns, synonym entries) may be lowercased. */
  def lowercases(name: String): Boolean =
    name != "lucene.whitespace" && name != "lucene.keyword"

  /** Document-side tokenizer: array<string> of analyzed terms (null
    * input stays null, matching TextAnalysis.tokens' convention). */
  def docTokens(name: String, c: Column): Column = name match {
    case Default            => TextAnalysis.tokens(lower(c))
    case "lucene.whitespace" => TextAnalysis.tokens(c)
    case "lucene.standard"  => regexp_extract_all(lower(c), lit(StandardRx), lit(0))
    case "lucene.simple"    => regexp_extract_all(lower(c), lit(SimpleRx), lit(0))
    case "lucene.keyword"   =>
      when(c.isNull, lit(null).cast("array<string>"))
        .otherwise(when(c === "", array().cast("array<string>"))
          .otherwise(array(c)))
    case other =>
      validate(other, "analyzer"); throw new IllegalStateException(other)
  }

  private def rxAll(rx: String, s: String): Seq[String] = {
    val m = java.util.regex.Pattern.compile(rx).matcher(s)
    val b = Seq.newBuilder[String]
    while (m.find()) b += m.group()
    b.result()
  }

  /** Query-side tokenizer — must agree with [[docTokens]] exactly. */
  def queryTerms(name: String, q: String): Seq[String] = name match {
    case Default =>
      q.toLowerCase(Locale.ROOT).trim.split("\\s+").filter(_.nonEmpty).toSeq
    case "lucene.whitespace" =>
      q.trim.split("\\s+").filter(_.nonEmpty).toSeq
    case "lucene.standard" => rxAll(StandardRx, q.toLowerCase(Locale.ROOT))
    case "lucene.simple"   => rxAll(SimpleRx, q.toLowerCase(Locale.ROOT))
    case "lucene.keyword"  => if (q.isEmpty) Nil else Seq(q)
    case other =>
      validate(other, "analyzer"); throw new IllegalStateException(other)
  }
}
