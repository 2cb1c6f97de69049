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
  *  - `lucene.english`: Lucene's EnglishAnalyzer chain — standard
  *    tokenizer, possessive-'s strip, lowercase, the classic 33-word
  *    English stop list, Porter stemming ([[graft.functions.Porter]],
  *    the original published algorithm). "Connections" and "connected"
  *    both index as "connect". No DuckDB replay exists for stemming,
  *    so english-analyzer gates are spec-pinned + rows-only.
  *  - CUSTOM definitions (Atlas custom analyzers): a
  *    `{tokenizer, tokenFilters}` JSON document — tokenizers standard/
  *    whitespace/keyword/letter, token filters lowercase/asciiFolding/
  *    stopword/length applied in declared order. See the custom-
  *    analyzer section below; [[normalize]] gives the canonical string
  *    form under which index and query definitions compare.
  */
object Analyzers {
  val Default = "graft.whitespace"

  /** letter/digit runs, apostrophe-joined (see lucene.standard note) */
  private val StandardRx = "[\\p{L}\\p{N}]+(?:'[\\p{L}\\p{N}]+)*"
  private val SimpleRx = "\\p{L}+"

  val Names: Set[String] = Set(Default, "lucene.standard",
    "lucene.whitespace", "lucene.simple", "lucene.keyword",
    "lucene.english")

  /** Lucene EnglishAnalyzer's classic stop set (the CharArraySet
    * Lucene ships as ENGLISH_STOP_WORDS_SET — public, 33 words). */
  private[llmops] val EnglishStops: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with")

  // ---- custom analyzer definitions (Atlas "custom analyzers") ----------
  //
  // A JSON document — {"tokenizer": "standard"|"whitespace"|"keyword"|
  // "letter", "tokenFilters": [{"type": "lowercase"} | {"type":
  // "asciiFolding"} | {"type": "stopword", "tokens": [...],
  // "ignoreCase": bool=true} | {"type": "length", "min": N=1,
  // "max": M=255}, ...]} — is a valid analyzer name anywhere a plain
  // name is: TextIndex.build analyzers values, the `$search` stage
  // option (as a nested document), stored kind='analyzer' rows. Filters
  // apply IN DECLARED ORDER on both sides (lowercase-then-stopword ≠
  // stopword-then-lowercase when ignoreCase=false). Everything is
  // replayable in DuckDB (regexp_extract_all + list_transform/
  // list_filter + translate/replace), so custom-analyzer gates keep
  // full oracle twins. charFilters htmlStrip/mapping ARE supported
  // (applied to the raw text before tokenization, both sides); porterStemming
  // and englishPossessive ARE supported (spec-pinned — stemming has no
  // DuckDB replay, so gates using them are rows-only); edgeGram/nGram/
  // shingle ARE supported (pure Column expansions, DuckDB-replayable
  // via generate_series + substr); the snowball/kStemming language-
  // stemmer families are NOT and refuse loudly (Porter/English covers
  // the stemming surface).
  private sealed trait TokFilter
  private case object FLower extends TokFilter
  private case object FFold extends TokFilter
  private case object FStem extends TokFilter       // porterStemming
  private case object FPossessive extends TokFilter // englishPossessive
  private case class FStop(tokens: Seq[String], ignoreCase: Boolean)
    extends TokFilter
  private case class FLength(min: Int, max: Int) extends TokFilter
  // gram families (Atlas autocomplete is edgeGram-backed; shingle feeds
  // phrase-ish scoring). All three are pure Column-form expansions —
  // zero shuffle, fully DuckDB-replayable (generate_series + substr):
  //  - edgeGram: each token → its prefixes of length min..max (tokens
  //    shorter than min emit nothing — Lucene EdgeNGramTokenFilter
  //    with preserveOriginal=false)
  //  - nGram: each token → ALL substrings of length min..max
  //  - shingle: the token stream → original tokens PLUS space-joined
  //    windows of min..max adjacent tokens (Lucene ShingleFilter with
  //    outputUnigrams=true, the default)
  private case class FEdgeGram(min: Int, max: Int) extends TokFilter
  private case class FNGram(min: Int, max: Int) extends TokFilter
  private case class FShingle(min: Int, max: Int) extends TokFilter
  // charFilters run on the RAW text before tokenization:
  //  - htmlStrip: tags (<...>) become spaces — Lucene's
  //    HTMLStripCharFilter minus entity decoding (documented
  //    simplification; both engines replay it as one regexp_replace)
  //  - mapping: literal from→to replacements applied SEQUENTIALLY in
  //    declared order (Lucene's is simultaneous-longest-match; the
  //    sequential contract is deterministic and replayable — declare
  //    non-overlapping mappings to avoid cascades)
  private sealed trait CharFilter
  private case object CHtmlStrip extends CharFilter
  private case class CMapping(pairs: Seq[(String, String)]) extends CharFilter
  private case class Custom(tokenizer: String, filters: Seq[TokFilter],
                            charFilters: Seq[CharFilter])

  /** ASCII-folding table — the documented Latin-1 accent subset (a real
    * Lucene ASCIIFoldingFilter covers far more; this mapping is what
    * both engines can replay with translate()). */
  private[llmops] val FoldFrom =
    "ÀÁÂÃÄÅàáâãäåÈÉÊËèéêëÌÍÎÏìíîïÒÓÔÕÖØòóôõöøÙÚÛÜùúûüÝýÿÑñÇç"
  private[llmops] val FoldTo =
    "AAAAAAaaaaaaEEEEeeeeIIIIiiiiOOOOOOooooooUUUUuuuuYyyNnCc"
  private lazy val foldMap: Map[Char, Char] = FoldFrom.zip(FoldTo).toMap

  private def isCustom(name: String): Boolean =
    name.trim.startsWith("{")

  private def parseCustom(name: String, ctx: String): Custom = {
    import org.json4s._
    val root = try org.json4s.jackson.JsonMethods.parse(name)
      catch { case e: Exception => throw new graft.mql.MqlException(
        s"$ctx: malformed custom analyzer JSON — ${e.getMessage}") }
    val fields = root match {
      case JObject(fs) => fs
      case _ => throw new graft.mql.MqlException(
        s"$ctx: custom analyzer must be a document")
    }
    fields.map(_._1).find(k =>
        k != "tokenizer" && k != "tokenFilters" && k != "charFilters")
      .foreach(k => throw new graft.mql.MqlException(
        s"$ctx: unsupported custom-analyzer field '$k' " +
          "(supported: tokenizer, tokenFilters, charFilters)"))
    val tok = fields.collectFirst {
      case ("tokenizer", JString(t)) => t
      case ("tokenizer", JObject(to)) => to.collectFirst {
        case ("type", JString(t)) => t
      }.getOrElse(throw new graft.mql.MqlException(
        s"$ctx: tokenizer document needs type"))
    }.getOrElse(throw new graft.mql.MqlException(
      s"$ctx: custom analyzer needs a tokenizer"))
    if (!Set("standard", "whitespace", "keyword", "letter").contains(tok))
      throw new graft.mql.MqlException(
        s"$ctx: unsupported tokenizer '$tok' " +
          "(supported: standard, whitespace, keyword, letter)")
    def intOf(v: JValue, f: String): Int = v match {
      case JInt(i) => i.toInt
      case JLong(l) => l.toInt
      case other => throw new graft.mql.MqlException(
        s"$ctx.$f: expected an integer, got $other")
    }
    val filters = fields.collectFirst {
      case ("tokenFilters", JArray(fs)) => fs.map {
        case JString("lowercase") => FLower
        case JString("asciiFolding") => FFold
        case JString("porterStemming") => FStem
        case JString("englishPossessive") => FPossessive
        case JObject(fo) =>
          val t = fo.collectFirst { case ("type", JString(x)) => x }
            .getOrElse(throw new graft.mql.MqlException(
              s"$ctx: token filter needs type"))
          t match {
            case "lowercase" => FLower
            case "asciiFolding" => FFold
            case "porterStemming" => FStem
            case "englishPossessive" => FPossessive
            case "stopword" =>
              val toks = fo.collectFirst { case ("tokens", JArray(xs)) =>
                xs.map {
                  case JString(s) => s
                  case other => throw new graft.mql.MqlException(
                    s"$ctx: stopword tokens must be strings, got $other")
                }
              }.getOrElse(throw new graft.mql.MqlException(
                s"$ctx: stopword filter needs tokens"))
              if (toks.isEmpty) throw new graft.mql.MqlException(
                s"$ctx: stopword filter needs a non-empty token list")
              val ic = fo.collectFirst { case ("ignoreCase", JBool(b)) => b }
                .getOrElse(true)
              FStop(toks, ic)
            case "length" =>
              val mn = fo.collectFirst { case ("min", v) => intOf(v, "length.min") }
                .getOrElse(1)
              val mx = fo.collectFirst { case ("max", v) => intOf(v, "length.max") }
                .getOrElse(255)
              if (mn < 0 || mx < mn) throw new graft.mql.MqlException(
                s"$ctx: length filter needs 0 <= min <= max (got $mn..$mx)")
              FLength(mn, mx)
            case "edgeGram" | "nGram" =>
              val mn = fo.collectFirst { case ("minGram", v) =>
                intOf(v, s"$t.minGram") }.getOrElse(
                throw new graft.mql.MqlException(
                  s"$ctx: $t filter needs minGram"))
              val mx = fo.collectFirst { case ("maxGram", v) =>
                intOf(v, s"$t.maxGram") }.getOrElse(
                throw new graft.mql.MqlException(
                  s"$ctx: $t filter needs maxGram"))
              if (mn < 1 || mx < mn) throw new graft.mql.MqlException(
                s"$ctx: $t filter needs 1 <= minGram <= maxGram " +
                  s"(got $mn..$mx)")
              if (t == "edgeGram") FEdgeGram(mn, mx) else FNGram(mn, mx)
            case "shingle" =>
              val mn = fo.collectFirst { case ("minShingleSize", v) =>
                intOf(v, "shingle.minShingleSize") }.getOrElse(
                throw new graft.mql.MqlException(
                  s"$ctx: shingle filter needs minShingleSize"))
              val mx = fo.collectFirst { case ("maxShingleSize", v) =>
                intOf(v, "shingle.maxShingleSize") }.getOrElse(
                throw new graft.mql.MqlException(
                  s"$ctx: shingle filter needs maxShingleSize"))
              if (mn < 2 || mx < mn) throw new graft.mql.MqlException(
                s"$ctx: shingle filter needs 2 <= minShingleSize <= " +
                  s"maxShingleSize (got $mn..$mx)")
              FShingle(mn, mx)
            case other => throw new graft.mql.MqlException(
              s"$ctx: unsupported token filter '$other' (supported: " +
                "lowercase, asciiFolding, porterStemming, " +
                "englishPossessive, stopword, length, edgeGram, " +
                "nGram, shingle)")
          }
        case other => throw new graft.mql.MqlException(
          s"$ctx: token filter must be a name or a document, got $other")
      }
    }.getOrElse(Nil)
    val charFilters = fields.collectFirst {
      case ("charFilters", JArray(fs)) => fs.map {
        case JString("htmlStrip") => CHtmlStrip
        case JObject(fo) =>
          val t = fo.collectFirst { case ("type", JString(x)) => x }
            .getOrElse(throw new graft.mql.MqlException(
              s"$ctx: char filter needs type"))
          t match {
            case "htmlStrip" => CHtmlStrip
            case "mapping" =>
              val pairs = fo.collectFirst { case ("mappings", JObject(ms)) =>
                ms.map {
                  case (from, JString(to)) =>
                    if (from.isEmpty) throw new graft.mql.MqlException(
                      s"$ctx: mapping from-string must be non-empty")
                    (from, to)
                  case (from, other) => throw new graft.mql.MqlException(
                    s"$ctx: mapping '$from' must map to a string, got $other")
                }
              }.getOrElse(throw new graft.mql.MqlException(
                s"$ctx: mapping char filter needs mappings"))
              if (pairs.isEmpty) throw new graft.mql.MqlException(
                s"$ctx: mapping char filter needs a non-empty mappings document")
              CMapping(pairs)
            case other => throw new graft.mql.MqlException(
              s"$ctx: unsupported char filter '$other' " +
                "(supported: htmlStrip, mapping)")
          }
        case other => throw new graft.mql.MqlException(
          s"$ctx: char filter must be a name or a document, got $other")
      }
    }.getOrElse(Nil)
    Custom(tok, filters, charFilters)
  }

  /** Canonical string form: plain names pass through (after the known-
    * set check); custom definitions re-serialize deterministically with
    * defaults made explicit, so "the same analyzer spelled differently"
    * (field order, whitespace, shorthand filters) compares equal between
    * a stored index and a stage option. */
  def normalize(name: String, ctx: String): String =
    if (!isCustom(name)) { validate(name, ctx); name }
    else {
      val c = parseCustom(name, ctx)
      def esc(s: String): String =
        "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      val fs = c.filters.map {
        case FLower => """{"type":"lowercase"}"""
        case FFold => """{"type":"asciiFolding"}"""
        case FStem => """{"type":"porterStemming"}"""
        case FPossessive => """{"type":"englishPossessive"}"""
        case FStop(toks, ic) =>
          s"""{"type":"stopword","tokens":[${toks.map(esc).mkString(",")}],"ignoreCase":$ic}"""
        case FLength(mn, mx) =>
          s"""{"type":"length","min":$mn,"max":$mx}"""
        case FEdgeGram(mn, mx) =>
          s"""{"type":"edgeGram","minGram":$mn,"maxGram":$mx}"""
        case FNGram(mn, mx) =>
          s"""{"type":"nGram","minGram":$mn,"maxGram":$mx}"""
        case FShingle(mn, mx) =>
          s"""{"type":"shingle","minShingleSize":$mn,"maxShingleSize":$mx}"""
      }.mkString(",")
      val cfs = c.charFilters.map {
        case CHtmlStrip => """{"type":"htmlStrip"}"""
        case CMapping(pairs) =>
          s"""{"type":"mapping","mappings":{${pairs.map { case (f, t) =>
            s"${esc(f)}:${esc(t)}" }.mkString(",")}}}"""
      }.mkString(",")
      val cfPart = if (c.charFilters.isEmpty) "" else
        s""","charFilters":[$cfs]"""
      s"""{"tokenizer":"${c.tokenizer}","tokenFilters":[$fs]$cfPart}"""
    }

  /** Atlas's autocomplete FIELD shape: the default analysis chain
    * (whitespace tokenizer + lowercase — identical token stream to
    * [[Default]], which lowercases before splitting) terminated by ONE
    * edgeGram filter. An index path analyzed this way stores the
    * edge-grams of the default tokens, so `$search.autocomplete` can
    * take its candidates from the gram postings while matching/scoring
    * keep the default-token semantics. Returns (minGram, maxGram). */
  def autocompleteGrams(name: String): Option[(Int, Int)] =
    if (!isCustom(name)) None
    else scala.util.Try(parseCustom(name, "analyzer")).toOption.collect {
      case Custom("whitespace", Seq(FLower, FEdgeGram(mn, mx)), Nil) =>
        (mn, mx)
    }

  /** Refuses unknown analyzer names (MQL-surface error). */
  def validate(name: String, ctx: String): Unit =
    if (isCustom(name)) { parseCustom(name, ctx): Unit }
    else if (!Names(name)) throw new graft.mql.MqlException(
      s"$ctx: unknown analyzer '$name' (supported: " +
        Names.toSeq.sorted.mkString(", ") + ", or a custom " +
        "{tokenizer, tokenFilters} document)")

  /** Whether analysis case-folds — decides if query-side constants
    * (wildcard/regex patterns, synonym entries) may be lowercased. */
  def lowercases(name: String): Boolean =
    if (isCustom(name))
      parseCustom(name, "analyzer").filters.contains(FLower)
    else name != "lucene.whitespace" && name != "lucene.keyword"

  private def baseDocTokens(tokenizer: String, c: Column): Column =
    tokenizer match {
      case "standard" => regexp_extract_all(c, lit(StandardRx), lit(0))
      case "whitespace" => TextAnalysis.tokens(c)
      case "letter" => regexp_extract_all(c, lit(SimpleRx), lit(0))
      case "keyword" =>
        when(c.isNull, lit(null).cast("array<string>"))
          .otherwise(when(c === "", array().cast("array<string>"))
            .otherwise(array(c)))
    }

  private def applyDocFilter(arr: Column, f: TokFilter): Column = f match {
    case FLower => transform(arr, x => lower(x))
    case FFold => transform(arr, x => translate(x, FoldFrom, FoldTo))
    case FStem =>
      graft.functions.GraftFunctions.register(
        org.apache.spark.sql.SparkSession.active)
      transform(arr, x => call_function("porter_stem", x))
    case FPossessive =>
      // Lucene's EnglishPossessiveFilter: strip a trailing 's or
      // (typographic) ’s — one quote form, token tail only
      transform(arr, x => regexp_replace(x, "['\u2019][sS]$", ""))
    case FStop(toks, true) =>
      val low = toks.map(_.toLowerCase(Locale.ROOT))
      filter(arr, x => !lower(x).isin(low: _*))
    case FStop(toks, false) => filter(arr, x => !x.isin(toks: _*))
    case FLength(mn, mx) =>
      filter(arr, x => length(x) >= mn && length(x) <= mx)
    case FEdgeGram(mn, mx) =>
      // tokens shorter than minGram are dropped FIRST — Spark's
      // sequence(a, b) counts DOWN when b < a, which would fabricate
      // grams; the filter keeps the sequence ascending by construction
      flatten(transform(filter(arr, x => length(x) >= mn),
        x => transform(sequence(lit(mn), least(lit(mx), length(x))),
          g => x.substr(lit(1), g))))
    case FNGram(mn, mx) =>
      flatten(transform(filter(arr, x => length(x) >= mn), x =>
        flatten(transform(sequence(lit(mn), least(lit(mx), length(x))),
          g => transform(sequence(lit(1), length(x) - g + lit(1)),
            p => x.substr(p, g))))))
    case FShingle(mn, mx) =>
      // original tokens + space-joined windows, built by ZIPPING k
      // shifted slices per window size. The shape matters at scale:
      // `arr` is an unevaluated Column — every reference re-runs the
      // upstream tokenizer chain — so the window build must reference
      // it O(k) times, never O(n) (a per-window formulation measured
      // 17.7 s on the sf0.1 corpus; this one 0.9 s, same output).
      // Sizes the stream is too short for contribute nothing.
      val shingles = (mn to mx).map { k =>
        val n1 = size(arr) - (k - 1)
        val win = (1 until k).foldLeft(slice(arr, lit(1), n1)) { (acc, j) =>
          zip_with(acc, slice(arr, lit(1 + j), n1),
            (a, b) => concat(a, lit(" "), b))
        }
        when(size(arr) >= k, win).otherwise(array().cast("array<string>"))
      }
      shingles.foldLeft(arr)((acc, x) => concat(acc, x))
  }

  /** lucene.english as its equivalent custom chain — ONE definition
    * both sides compile, so agreement is structural. */
  private lazy val EnglishChain = Custom("standard",
    Seq(FPossessive, FLower, FStop(EnglishStops, ignoreCase = false),
      FStem), Nil)

  /** Document-side tokenizer: array<string> of analyzed terms (null
    * input stays null, matching TextAnalysis.tokens' convention). */
  def docTokens(name: String, c: Column): Column = name match {
    case "lucene.english" =>
      EnglishChain.filters.foldLeft(
        baseDocTokens(EnglishChain.tokenizer, c))(applyDocFilter)
    case Default            => TextAnalysis.tokens(lower(c))
    case "lucene.whitespace" => TextAnalysis.tokens(c)
    case "lucene.standard"  => regexp_extract_all(lower(c), lit(StandardRx), lit(0))
    case "lucene.simple"    => regexp_extract_all(lower(c), lit(SimpleRx), lit(0))
    case "lucene.keyword"   => baseDocTokens("keyword", c)
    case other if isCustom(other) =>
      val cu = parseCustom(other, "analyzer")
      val filtered = cu.charFilters.foldLeft(c) {
        case (acc, CHtmlStrip) =>
          regexp_replace(acc, "<[^>]*>", " ")
        case (acc, CMapping(pairs)) =>
          pairs.foldLeft(acc) { case (a, (f, t)) => replace(a, lit(f), lit(t)) }
      }
      cu.filters.foldLeft(baseDocTokens(cu.tokenizer, filtered))(applyDocFilter)
    case other =>
      validate(other, "analyzer"); throw new IllegalStateException(other)
  }

  private def rxAll(rx: String, s: String): Seq[String] = {
    val m = java.util.regex.Pattern.compile(rx).matcher(s)
    val b = Seq.newBuilder[String]
    while (m.find()) b += m.group()
    b.result()
  }

  private def baseQueryTerms(tokenizer: String, q: String): Seq[String] =
    tokenizer match {
      case "standard" => rxAll(StandardRx, q)
      case "whitespace" => q.trim.split("\\s+").filter(_.nonEmpty).toSeq
      case "letter" => rxAll(SimpleRx, q)
      case "keyword" => if (q.isEmpty) Nil else Seq(q)
    }

  private def applyQueryFilter(ts: Seq[String], f: TokFilter): Seq[String] =
    f match {
      case FLower => ts.map(_.toLowerCase(Locale.ROOT))
      case FFold => ts.map(_.map(ch => foldMap.getOrElse(ch, ch)))
      case FStem => ts.map(graft.functions.Porter.stem)
      case FPossessive =>
        ts.map(_.replaceAll("['\u2019][sS]$", ""))
      case FStop(toks, true) =>
        val low = toks.map(_.toLowerCase(Locale.ROOT)).toSet
        ts.filterNot(t => low(t.toLowerCase(Locale.ROOT)))
      case FStop(toks, false) => val s = toks.toSet; ts.filterNot(s)
      case FLength(mn, mx) => ts.filter(t => t.length >= mn && t.length <= mx)
      case FEdgeGram(mn, mx) =>
        ts.filter(_.length >= mn).flatMap(t =>
          (mn to math.min(mx, t.length)).map(g => t.substring(0, g)))
      case FNGram(mn, mx) =>
        ts.filter(_.length >= mn).flatMap(t =>
          (mn to math.min(mx, t.length)).flatMap(g =>
            (0 to t.length - g).map(p => t.substring(p, p + g))))
      case FShingle(mn, mx) =>
        ts ++ (mn to mx).filter(_ <= ts.length).flatMap(k =>
          ts.sliding(k).map(_.mkString(" ")))
    }

  /** Query-side tokenizer — must agree with [[docTokens]] exactly. */
  def queryTerms(name: String, q: String): Seq[String] = name match {
    case "lucene.english" =>
      EnglishChain.filters.foldLeft(
        baseQueryTerms(EnglishChain.tokenizer, q))(applyQueryFilter)
    case Default =>
      q.toLowerCase(Locale.ROOT).trim.split("\\s+").filter(_.nonEmpty).toSeq
    case "lucene.whitespace" =>
      q.trim.split("\\s+").filter(_.nonEmpty).toSeq
    case "lucene.standard" => rxAll(StandardRx, q.toLowerCase(Locale.ROOT))
    case "lucene.simple"   => rxAll(SimpleRx, q.toLowerCase(Locale.ROOT))
    case "lucene.keyword"  => if (q.isEmpty) Nil else Seq(q)
    case other if isCustom(other) =>
      val cu = parseCustom(other, "analyzer")
      val filtered = cu.charFilters.foldLeft(q) {
        case (acc, CHtmlStrip) => acc.replaceAll("<[^>]*>", " ")
        case (acc, CMapping(pairs)) =>
          pairs.foldLeft(acc) { case (a, (f, t)) => a.replace(f, t) }
      }
      cu.filters.foldLeft(baseQueryTerms(cu.tokenizer, filtered))(applyQueryFilter)
    case other =>
      validate(other, "analyzer"); throw new IllegalStateException(other)
  }
}
