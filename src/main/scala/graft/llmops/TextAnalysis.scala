package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * Everything is a pure `Column` expression (builtin functions only → whole
  * -stage codegen, no UDFs, no shuffles): at 100 TB these run as map-only
  * work inside the scan stage.
  */
object TextAnalysis {
  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Every per-document quality counter in ONE native pass:
    * struct(n_tok, sum_tok_chars, n_chars, punct_chars, stop_total,
    * stop_distinct) — see functions.TextStats. Materialize this into a
    * column once and derive metrics from its fields; each interpreted
    * HOF metric re-ran the tokenizer per occurrence. */
  def textStats(text: Column,
                stopwords: Seq[String] = EnglishStopwords): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("text_stats", text, array(stopwords.map(lit): _*))
  }

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Unicode normalization (default NFC) — native codegen expression
    * ([[graft.functions.UnicodeNormalize]]) with a zero-copy fast path
    * for already-normalized rows (the overwhelming case in real
    * corpora). Form ∈ NFC|NFD|NFKC|NFKD. Map-only scan-stage work. */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("unicode_normalize", text, lit(form))
  }

  /** Canonical curation cleanup (CCNet-style pre-hash normalization):
    * Unicode-normalize (NFC by default), collapse all whitespace runs
    * to single spaces, strip remaining control/format characters
    * (zero-widths, BOMs, C0/C1 controls — the `[Cc][Cf]` categories),
    * collapse AGAIN, trim. Whitespace first so \n/\t (which are Cc)
    * collapse into spaces rather than vanish and glue words together;
    * the second collapse makes the form canonical — a stripped
    * invisible BETWEEN two whitespace runs ("a ​ b") would
    * otherwise leave a double space, and two texts identical up to an
    * invisible char would hash apart, defeating normalize-before-hash
    * dedup. Pure Column pipeline → whole-stage codegen, map-only. */
  def cleanText(text: Column, form: String = "NFC"): Column =
    trim(regexp_replace(regexp_replace(
      regexp_replace(normalizeUnicode(text, form), "\\s+", " "),
      "[\\p{Cc}\\p{Cf}]", ""), " +", " "))

  /** GPT-2-shaped pre-tokenization splitter: contractions, letter runs,
    * digit runs, punctuation runs (each absorbing one leading space),
    * residual whitespace runs. Deliberately RE2-safe (no lookahead, so
    * the GPT-2 original's `\s+(?!\S)` trailing-space clause is folded
    * into the plain `\s+` alternative) — any engine, including the
    * DuckDB oracle, recomputes the identical token stream. A real BPE
    * merge table changes token COUNTS, not this split boundary; this is
    * the budget-estimation splitter, not a vocabulary. */
  val BpeSplitPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+|\\s+"

  /** BPE-ish token count for training-budget estimation (the whitespace
    * `tokenCount` undercounts punctuation-heavy and code-like text).
    * Map-only, codegen'd; null text stays null. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeSplitPattern), lit(0))).cast("long")

  def charCount(text: Column): Column = length(text).cast("long")

  /** Fraction of characters that are sentence punctuation. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.!?,;:]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def avgWordLen(text: Column): Column =
    aggregate(transform(tokens(text), t => length(t).cast("long")),
      lit(0L), (acc, x) => acc + x).cast("double") /
      greatest(size(tokens(text)), lit(1)).cast("double")

  /** Fraction of tokens found in `stopwords` (lowercased compare). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    size(filter(tokens(lower(text)), t => array_contains(sw, t))).cast("double") /
      greatest(size(tokens(text)), lit(1)).cast("double")
  }

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

  /** Composite quality score in [0,1]: length saturation, low punctuation
    * noise, natural-language stopword density. Rounded so the DuckDB
    * oracle compares bit-equal. */
  def qualityScore(text: Column): Column =
    round(
      lit(0.4) * least(tokenCount(text).cast("double") / lit(100.0), lit(1.0)) +
      lit(0.3) * (lit(1.0) - punctRatio(text)) +
      lit(0.3) * least(stopwordRatio(text, EnglishStopwords) * lit(5.0), lit(1.0)),
      6)

  /** fastText-shaped linear quality classifier: hashed bag-of-words
    * features through a linear layer and a sigmoid, the architecture of
    * the quality classifiers production curation pipelines run per doc
    * (CCNet/GPT-3-style quality filtering). The weight table is a
    * DETERMINISTIC STAND-IN for trained weights (no model ships here):
    * w(t) = 2·(h60(t) mod B)/B − 1 over the portable 60-bit token hash,
    * which the DuckDB oracle re-derives token for token. To
    * productionize, replace `w` with a lookup into a broadcast weight
    * array — the operator shape (a pure map over the corpus, one
    * codegen'd expression, no shuffle) is identical and is what matters
    * at 100 TB. */
  def classifierScore(text: Column, buckets: Int = 1 << 20): Column = {
    // z in one native pass (functions.HashWeightMean — tokenize once,
    // hash each token once); the Column-HOF form re-ran the interpreted
    // tokenize 3× and the per-token md5 plumbing interpreted. Sigmoid +
    // round stay out here so the DuckDB twin compares the same rounded
    // doubles.
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    val z = call_function("hash_weight_mean", text, lit(buckets))
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** Marker-word language ID. N-gram-free heuristic: score = number of
    * distinct marker tokens present; deterministic priority tie-break.
    * (Real pipelines swap in fastText etc. — the operator shape — a pure
    * map over the corpus — is what matters at scale.) */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"))

  def langId(text: Column): Column = {
    val toks = array_distinct(tokens(lower(text)))
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> size(array_intersect(toks, array(markers.map(lit): _*)))
    }
    // first language with the max score wins (stable priority order)
    scores.tail.foldLeft((when(lit(true), scores.head._2), lit(scores.head._1))) {
      case ((bestScore, bestLang), (lang, score)) =>
        (when(score > bestScore, score).otherwise(bestScore),
         when(score > bestScore, lit(lang)).otherwise(bestLang))
    }._2
  }

  /** Gopher-style repetition metric: the fraction of a document's word
    * n-gram occurrences that are repeats of an earlier occurrence —
    * 1 − distinct/total (0 for docs shorter than n tokens). High values
    * flag boilerplate/spam. Distinct count reuses the WordShingles
    * native expression; total is derived from the token count, so the
    * whole metric is one codegen'd map expression — no shuffle. */
  def dupNgramFrac(text: Column, n: Int): Column = {
    val total = greatest(size(tokens(text)) - lit(n - 1), lit(1))
    round(lit(1.0) -
      size(Dedup.shingles(text, n)).cast("double") / total.cast("double"), 6)
  }

  /** Gopher repetition signals (Rae et al. arXiv:2112.11446 §A1.1,
    * the within-document half of the repetition battery; dupNgramFrac
    * covers the n-gram half): fraction of duplicate LINES, fraction of
    * CHARACTERS inside duplicate lines, and the character fraction
    * claimed by the single most frequent n-gram. All map-only array
    * work over one line/token split — no shuffle, no explode; the
    * DuckDB oracle recomputes the identical splits. Lines are
    * non-empty trimmed '\n' segments; a doc with ≤1 line scores 0. */
  def gopherRepetition(text: Column, topNgramN: Int = 2): Column = {
    // one-pass native expression (functions/GraftFunctions.GopherRep):
    // the Column formulation's per-distinct-gram filter() re-evaluated
    // the interpreted tokenize chain quadratically — see the expression
    // Scaladoc for the semantics contract it preserves
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("gopher_rep", text, lit(topNgramN))
  }

  /** Deflate compression ratio (compressed/raw bytes): model-free
    * redundancy signal — boilerplate compresses far below natural text.
    * One pass per doc via the DeflateRatio expression; map-only.
    * zlib-build-dependent, so spec-pinned (ordering), not oracled. */
  def compressionRatio(text: Column): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    round(call_function("deflate_ratio", text), 6)
  }

  /** PII redaction patterns: kept to syntax shared by Java regex and
    * RE2 (no lookarounds/backrefs) so any engine — including the DuckDB
    * oracle — applies the identical automaton. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("\\b\\d{3}[- ]\\d{4}\\b", "<PHONE>"))

  /** Redact emails / IPv4s / phone-shaped numbers with typed
    * placeholder tokens — the pre-training privacy scrub. Chained
    * regexp_replace (global), pure map work inside the scan stage.
    * Order matters: IP before PHONE so dotted quads never half-match
    * the looser phone pattern. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }

  /** Order-insensitive content fingerprint: md5 of the sorted distinct
    * token set. Groups docs that share vocabulary regardless of order. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", sort_array(array_distinct(tokens(lower(text))))))

  /** Word n-grams over an ALREADY-MATERIALIZED token array column.
    * The token array must be a plain column reference, not a derived
    * expression: HOF lambda bodies get no common-subexpression
    * elimination, so a derived `toks` would re-run its whole pipeline
    * (split+filter) once per `element_at` — O(len²) per row. */
  def wordNgramsOf(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ",
          (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Word n-grams of a text column (lowercased whitespace tokens),
    * generated inside codegen — no UDF, no explode until the caller
    * asks for one. Docs shorter than n yield an empty array. For bulk
    * use, materialize `tokens(lower(text))` into its own column and
    * call [[wordNgramsOf]] — see its note on lambda re-evaluation. */
  def wordNgrams(text: Column, n: Int): Column =
    wordNgramsOf(tokens(lower(text)), n)

  /** Per-group n-gram type/token diversity (distinct n-grams over total
    * n-grams — the corpus-diversity metric that catches template spam a
    * per-document repetition score misses). One map-side n-gram explode
    * + one two-phase distinct aggregate per group: no self-join, no
    * window — linear at any corpus size. Tokens materialize into a
    * column BEFORE the gram lambda (see wordNgramsOf). */
  def ngramDiversity(df: org.apache.spark.sql.DataFrame, textCol: String,
                     groupCol: String,
                     n: Int = 2): org.apache.spark.sql.DataFrame =
    df.select(col(groupCol), tokens(lower(col(textCol))).as("__t"))
      .select(col(groupCol), explode(wordNgramsOf(col("__t"), n)).as("__g"))
      .groupBy(col(groupCol))
      .agg(countDistinct(col("__g")).as("n_types"),
        count(lit(1)).as("n_total"))
      .withColumn("ttr",
        round(col("n_types").cast("double") / col("n_total"), 6))

  /** Rule thresholds for `ruleFilter` (Gopher-style repetition/shape
    * heuristics, rule set public via Rae et al. 2021, arXiv:2112.11446). */
  final case class QualityRules(
      minTokens: Long = 5, maxTokens: Long = 100000,
      minAvgWordLen: Double = 2.0, maxAvgWordLen: Double = 12.0,
      maxPunctRatio: Double = 0.2, minStopwordHits: Int = 1)

  /** Gopher-style document filter: per-rule boolean flags plus the
    * verdict. Everything is a codegen'd Column over one row — map-only
    * at any scale. Ratios are rounded to 6 before thresholding so an
    * oracle recomputing them compares bit-equal at the boundaries. */
  def ruleFilter(text: Column, rules: QualityRules = QualityRules()): Column =
    ruleFilterFromStats(textStats(text), rules)

  /** [[ruleFilter]] over an already-materialized [[textStats]] column —
    * the scale-correct usage: `withColumn("s", textStats(text))` once,
    * then every rule/metric is cheap field arithmetic (a ruleFilter
    * struct re-inlined per output field otherwise re-runs its input
    * expression per field). */
  def ruleFilterFromStats(s: Column,
                          rules: QualityRules = QualityRules()): Column = {
    val nTok = s.getField("n_tok")
    val lenOk = nTok >= rules.minTokens && nTok <= rules.maxTokens
    val denom = greatest(nTok, lit(1L)).cast("double")
    val awl = round(s.getField("sum_tok_chars").cast("double") / denom, 6)
    val awlOk = awl >= rules.minAvgWordLen && awl <= rules.maxAvgWordLen
    val punct = round(s.getField("punct_chars").cast("double") /
      greatest(s.getField("n_chars"), lit(1L)).cast("double"), 6)
    val punctOk = punct <= rules.maxPunctRatio
    val stopOk = s.getField("stop_distinct") >= rules.minStopwordHits
    struct(
      lenOk.as("len_ok"), awlOk.as("word_len_ok"), punctOk.as("punct_ok"),
      stopOk.as("stopword_ok"),
      (lenOk && awlOk && punctOk && stopOk).as("keep"))
  }

  /** Corpus curation report: per group (e.g. source × lang) — doc and
    * token counts, mean quality, and how many docs are byte-duplicates
    * of ANOTHER doc anywhere in the corpus (normalized digest). The
    * one-page summary a mixing decision reads before setting per-source
    * weights.
    *
    * Scale shape: one digest-keyed window for the global dup counts
    * (partitioned by digest — groups are duplicate-multiplicity-sized)
    * and one hash agg on the group keys. Two linear shuffles, no
    * self-join, nothing driver-side. */
  def curationReport(df: org.apache.spark.sql.DataFrame,
                     textCol: String, groupCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val digest = md5(regexp_replace(lower(col(textCol)), "\\s+", " ")
      .cast("binary"))
    val flagged = df
      .withColumn("__dup",
        count(lit(1)).over(Window.partitionBy(digest)) > 1)
      .withColumn("__q", qualityScore(col(textCol)))
      .withColumn("__t", tokenCount(col(textCol)))
    // mean over a DECIMAL-exact sum: a plain double avg is summation-
    // order-dependent and flips the 6-dec rounding at group boundaries
    // (the per-doc quality is already 6-dec, so decimal(18,6) is exact)
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    flagged.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__t")).as("n_tokens"),
        round(sum(col("__q").cast(dec6)).cast("double") / count(lit(1)), 6)
          .as("mean_quality"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("dup_docs"))
  }
}
