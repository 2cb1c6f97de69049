package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-shaping operators for training-data pipelines: deterministic
  * stratified sampling and per-source token budgeting.
  *
  * Both are built on a seeded md5-derived uniform hash instead of rand():
  * results are reproducible across runs/partitionings AND recomputable by
  * any engine (the DuckDB oracle rebuilds the identical hash), which is
  * what a data-curation pipeline needs for auditability.
  */
object Sampling {
  /** Uniform value in [0, 1e6) derived from (seed, id) — first 8 md5 hex
    * chars as an integer. Pure map work: codegen'd, no shuffle. */
  def hashBucket(id: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed + ":"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") % 1000000L

  /** Stratified sample with per-stratum rates (proportional/custom
    * allocation). Map-only — the filter runs inside the scan stage, no
    * shuffle, no window: the 100 TB path. Rates are fractions in [0,1];
    * strata not in the map fall back to `defaultRate`. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double = 0.0,
                       seed: String = "strat"): DataFrame = {
    val bucket = hashBucket(col(idCol), seed)
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    df.where(bucket < rate * 1000000L)
  }

  /** Cap rows per group at k, ranked by `rankCol` descending with an
    * ascending id tie-break (deterministic): the per-domain cap step of
    * a web-corpus pipeline (keep the k best pages per domain). One keyed
    * window pass — the shuffle is on the group key and each partition
    * sorts only its groups' rows. For pathologically hot groups
    * (a single domain holding a double-digit share of the corpus) the
    * BoundedTopK aggregate (functions/BoundedTopK.scala) computes the
    * same slice with an O(k) buffer; the window form is preferred while
    * group sizes stay executor-sized because it keeps every input column
    * without a struct round-trip. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
                  rankCol: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(rankCol.desc, col(idCol).asc)
    df.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }

  /** Sliding-window document chunking: each doc becomes ⌈(n−overlap)/
    * (size−overlap)⌉ chunks of ≤ `size` tokens advancing by
    * size−overlap — the context-window prep for RAG indexing and
    * long-doc pretraining. Map-only: one tokenize + one posexplode of
    * per-chunk slices, no shuffle, no window; chunk text re-joins with
    * single spaces (the tokenizer's inverse up to whitespace runs,
    * documented). Final partial chunks are kept (standard practice —
    * dropping them loses document tails); docs with no tokens vanish.
    * Output: (id, chunk_id 0-based, chunk_text, n_tokens). */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got size=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    // tokenize ONCE into a materialized column before the per-chunk
    // lambda: a token expression captured inside transform() re-runs the
    // interpreted split per CHUNK (O(chunks × tokens) regex work per
    // doc) — the projection boundary is the let-binding Spark lacks
    // (same lesson as the phrase-scorer postmortem, PLANS.md round 5)
    val w = col("__w")
    val nChunks = ceil((size(w) - lit(overlap)).cast("double") / stride)
      .cast("int")
    val chunks = transform(sequence(lit(0), greatest(nChunks, lit(1)) - 1), i =>
      slice(w, i * stride + 1, lit(chunkSize)))
    df.select(col(idCol),
        graft.llmops.TextAnalysis.tokens(col(textCol)).as("__w"))
      .select(col(idCol), posexplode(when(size(w) > 0, chunks)))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        concat_ws(" ", col("col")).as("chunk_text"),
        size(col("col")).cast("long").as("n_tokens"))
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-ES, Inf. Process. Lett. 97(5)): each row draws
    * key = u^(1/w) with u a seeded md5 uniform in (0, 1), and the k
    * largest keys win — inclusion probability proportional to weight,
    * exactly one pass. The standard way to bias a pretraining subsample
    * toward high-quality documents while keeping every selection
    * reproducible and engine-recomputable (the oracle re-derives u and
    * the keys). Map-only key computation; the global top-k plans as
    * TakeOrdered (per-partition heads + a k-row driver merge — never a
    * full sort). Rows with null or non-positive weight are excluded (a
    * zero-weight row can never win under A-ES). Output: input columns +
    * `wkey` rounded to 6, ordered (wkey desc, id asc). */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int,
                     seed: String = "wsamp"): DataFrame = {
    val u = (hashBucket(col(idCol), seed).cast("double") + lit(0.5)) / lit(1000000.0)
    val key = pow(u, lit(1.0) / weight.cast("double"))
    df.where(weight.isNotNull && weight > 0)
      .withColumn("wkey", round(key, 6))
      .orderBy(col("wkey").desc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic weighted resampling to a target mixture: every row of
    * stratum s is repeated floor(w_s) times plus one more with
    * probability frac(w_s), decided by the seeded md5 hash of the id —
    * upsampling (w > 1) and downsampling (w < 1) in one map-only
    * operator (explode of a per-row sequence; no shuffle), reproducible
    * across runs, partitionings, and engines. Output carries
    * `copy` (1-based repeat index); rows with zero copies disappear. */
  def resampleMixture(df: DataFrame, idCol: String, stratumCol: String,
                      weights: Map[String, Double], defaultWeight: Double = 1.0,
                      seed: String = "mix"): DataFrame = {
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    val copies = floor(w).cast("long") +
      when(hashBucket(col(idCol), seed) < (w - floor(w)) * 1000000L, 1L)
        .otherwise(0L)
    // sequence(1, 0) would count DOWN in Spark; guard to null so explode
    // drops zero-copy rows instead
    df.withColumn("copy",
      explode(when(copies >= 1L, sequence(lit(1L), copies))))
  }

  /** Temperature-scaled mixture RESAMPLING (the materialized half of
    * [[temperatureMixture]], the multilingual-LM sampling rule of
    * arXiv:1901.07291 §3.1): group g's target share is n_g^alpha
    * renormalized, so alpha=1 keeps natural proportions, alpha→0
    * approaches uniform, and low-resource groups upsample. Each group
    * resamples at rate share_g · N / n_g through the same seeded
    * fractional-copy rule as [[resampleMixture]] (copies ≥ 1 ⇒
    * upsampling by repetition). Group stats are one hash agg bounded
    * by group cardinality, broadcast back — no driver collect; the
    * rate is rounded to 6 decimals so the copy decision is
    * engine-reproducible despite summation-order float drift (and
    * alpha = 0.5 routes through sqrt, which IEEE-754 requires to be
    * correctly rounded — temperatureMixture's rationale). */
  def temperatureResample(df: DataFrame, idCol: String, stratumCol: String,
                          alpha: Double, seed: String = "temp"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0, 1], got $alpha")
    def powA(c: Column): Column = if (alpha == 0.5) sqrt(c) else pow(c, alpha)
    val stats = df.groupBy(col(stratumCol).as("__s"))
      .agg(count(lit(1)).cast("double").as("__n"))
    val tot = stats.agg(sum(col("__n")).as("__N"),
      sum(powA(col("__n"))).as("__Z"))
    // fresh aliases: stats appears on both sides of the cross join
    // (tot derives from it), so reusing its attribute ids is ambiguous
    val statsL = stats.select(col("__s"), col("__n").as("__ng"))
    val rates = statsL.crossJoin(broadcast(tot))
      .select(col("__s"),
        round(powA(col("__ng")) / col("__Z") * col("__N") / col("__ng"), 6)
          .as("__w"))
    // null-safe join: a null stratum is a group like any other
    val withW = df.join(broadcast(rates), col(stratumCol) <=> col("__s"))
      .drop("__s")
    val copies = floor(col("__w")).cast("long") +
      when(hashBucket(col(idCol), seed) <
        (col("__w") - floor(col("__w"))) * 1000000L, 1L).otherwise(0L)
    withW
      .withColumn("copy",
        explode(when(copies >= 1L, sequence(lit(1L), copies))))
      .drop("__w")
  }

  /** Concat-then-chunk sequence packing: documents are laid out in a
    * deterministic order (seeded hash, id tie-break) per group and the
    * concatenated token stream is cut into fixed `packTokens` blocks —
    * the standard sample-packing layout for pre-training batches. Each
    * doc gets its byte-exact placement: start offset in the group's
    * stream and the first/last pack it lands in (a doc may straddle a
    * boundary). Pure integer arithmetic over one keyed window pass —
    * single shuffle on the group key, reproducible anywhere. */
  def packSequences(df: DataFrame, idCol: String, groupCol: String,
                    tokensCol: Column, packTokens: Long,
                    seed: String = "pack"): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol), seed).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__tok", tokensCol.cast("long"))
      .withColumn("__cum", sum(col("__tok")).over(w))
      .withColumn("start_offset", col("__cum") - col("__tok"))
      .withColumn("pack_first", floor(col("start_offset") / packTokens))
      .withColumn("pack_last",
        floor(greatest(col("__cum") - 1, col("start_offset")) / packTokens))
      .drop("__tok", "__cum")
  }

  /** Deterministic train/validation/test split: each row gets the first
    * split label whose cumulative fraction bound exceeds its seeded hash
    * bucket. Map-only — the label is a codegen'd expression inside the
    * scan stage, no shuffle — and reproducible across runs,
    * partitionings, and engines: re-running the pipeline never migrates
    * a document between splits unless the seed changes, which is the
    * property eval-contamination audits depend on (a doc that was ever
    * in `test` stays there). Fractions must sum to 1 (±1e-6); bucket
    * boundaries are rounded to integer millionths so the cut-points are
    * exact on any engine. */
  def fimTransform(df: DataFrame, idCol: String, textCol: String,
                   rate: Double = 0.5, seed: String = "fim"): DataFrame = {
    // Fill-in-the-middle transformation (Bavarian et al. 2022,
    // arXiv:2207.14255 — the FIM pretraining objective for infilling):
    // a seeded-deterministic `rate` fraction of documents rewrite into
    // PSM form `<fim_prefix>P<fim_suffix>S<fim_middle>M`. The two
    // character cut points derive from md5 hashes of (seed, id), so the
    // transform is reproducible across runs, partitionings, and engines
    // (the oracle recomputes every cut). Character-level cuts — the
    // tokenizer-free formulation; the sentinel strings stand in for the
    // tokenizer's special ids (swap at encode time). Map-only:
    // codegen'd string slicing inside the scan stage, no shuffle — a
    // free pass over a 100 TB corpus.
    val len = length(col(textCol))
    val sel = hashBucket(col(idCol), seed) <
      lit(math.round(rate * 1000000L.toDouble))
    val span = (len + lit(1)).cast("long")
    val c1 = hashBucket(col(idCol), seed + "#a") % span
    val c2 = hashBucket(col(idCol), seed + "#b") % span
    val lo = least(c1, c2).cast("int")
    val hi = greatest(c1, c2).cast("int")
    val fim = concat(
      lit("<fim_prefix>"), col(textCol).substr(lit(1), lo),
      lit("<fim_suffix>"), col(textCol).substr(hi + lit(1), len - hi),
      lit("<fim_middle>"), col(textCol).substr(lo + lit(1), hi - lo))
    val applied = sel && col(textCol).isNotNull && len > 0
    df.withColumn("fim_applied", applied)
      .withColumn("fim_text", when(applied, fim).otherwise(col(textCol)))
  }

  /** T5-style span corruption (Raffel et al., arXiv:1910.10683 §3.1.4):
    * a seeded `rate` fraction of documents mask two spans — input keeps
    * the surrounding text with `<extra_id_k>` sentinels in place of the
    * spans, target is the sentinels followed by the masked spans (plus
    * the closing sentinel). The four span boundaries are the SORTED md5
    * cut points of (seed#a..#d, id), so the transform is reproducible
    * across runs, partitionings, and engines (the oracle re-sorts the
    * same hashes). Character-level cuts — the tokenizer-free
    * formulation, sentinels swapped for special ids at encode time.
    * Map-only codegen string slicing inside the scan stage, no shuffle:
    * a free pass over a 100 TB corpus. */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
                  rate: Double = 0.5, seed: String = "t5"): DataFrame = {
    val len = length(col(textCol))
    val sel = hashBucket(col(idCol), seed) <
      lit(math.round(rate * 1000000L.toDouble))
    val span = (len + lit(1)).cast("long")
    val cuts = sort_array(array(
      hashBucket(col(idCol), seed + "#a") % span,
      hashBucket(col(idCol), seed + "#b") % span,
      hashBucket(col(idCol), seed + "#c") % span,
      hashBucket(col(idCol), seed + "#d") % span))
    def cut(i: Int): Column = element_at(cuts, i).cast("int")
    val (c1, c2, c3, c4) = (cut(1), cut(2), cut(3), cut(4))
    val input = concat(
      col(textCol).substr(lit(1), c1),
      lit("<extra_id_0>"), col(textCol).substr(c2 + lit(1), c3 - c2),
      lit("<extra_id_1>"), col(textCol).substr(c4 + lit(1), len - c4))
    val target = concat(
      lit("<extra_id_0>"), col(textCol).substr(c1 + lit(1), c2 - c1),
      lit("<extra_id_1>"), col(textCol).substr(c3 + lit(1), c4 - c3),
      lit("<extra_id_2>"))
    val applied = sel && col(textCol).isNotNull && len > 0
    df.withColumn("corrupt_applied", applied)
      .withColumn("corrupt_input", when(applied, input).otherwise(col(textCol)))
      .withColumn("corrupt_target", when(applied, target).otherwise(lit(null)))
  }

  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
                seed: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-6,
      "split fractions must sum to 1")
    val bucket = hashBucket(col(idCol), seed)
    val cuts = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.round(c * 1000000L.toDouble))
    val label = splits.init.zip(cuts.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cut), acc) => when(bucket < cut, lit(name)).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** Deterministic corpus shuffle layout: assigns every row a stable
    * `global_pos` that is uniform-random with respect to the input
    * order but fully reproducible — the pre-training shuffle, computed
    * without the global single-partition sort a naive
    * row_number()-over-ORDER-BY-hash would plan. Rows hash into
    * `nChunks` chunks (map-only); position within a chunk is one KEYED
    * window (shuffle and per-partition sort bounded by corpus/nChunks);
    * chunk offsets are a prefix sum over the nChunks-row count table
    * (the only unpartitioned window, bounded by nChunks, not corpus
    * size) broadcast back onto the rows. At 100 TB: one keyed shuffle +
    * one tiny aggregate; writers then emit files sorted by
    * (chunk, pos). Use an `nChunks` that divides 1e6 (the hash-bucket
    * modulus) so chunk assignment carries zero modulo bias. */
  def shuffleChunks(df: DataFrame, idCol: String, nChunks: Int = 64,
                    seed: String = "shuf"): DataFrame = {
    require(nChunks > 0, "nChunks must be positive")
    val chunk = hashBucket(col(idCol), seed) % nChunks
    // full md5 as the within-chunk sort key: hex-string order is plain
    // byte order on every engine (ASCII), and collisions fall back to id
    val key = md5(concat(lit(seed + "#"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("chunk")).orderBy(col("__k").asc, col(idCol).asc)
    val withPos = df.withColumn("chunk", chunk).withColumn("__k", key)
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .drop("__k")
    val offsets = withPos.groupBy("chunk").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off",
        sum(col("__cnt")).over(Window.orderBy(col("chunk"))) - col("__cnt"))
      .select(col("chunk"), col("__off"))
    withPos.join(broadcast(offsets), "chunk")
      .withColumn("global_pos", (col("pos") + col("__off")).cast("long"))
      .drop("__off")
  }

  /** Keep documents per group until a token budget is reached:
    * deterministic hash order within the group, running token total,
    * cut where the total exceeds the budget. One keyed window pass
    * (single shuffle on the group key); group cardinality bounds the
    * partition, not corpus size. */
  def tokenBudget(df: DataFrame, idCol: String, groupCol: String,
                  tokensCol: Column, budget: Long,
                  seed: String = "budget"): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol), seed).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__tok", tokensCol.cast("long"))
      .withColumn("cum_tokens", sum(col("__tok")).over(w))
      .where(col("cum_tokens") <= budget)
      .drop("__tok")
  }

  /** Deterministic training-shard manifest: every document lands in
    * hash-shard `md5(seed:id) % nShards` (stable across runs, machines,
    * and partition counts — the property that lets a 1000-executor
    * re-run resume the same shard layout), and the manifest reports per
    * shard what a data loader needs to size its plan: doc count, token
    * total, id range. Map-only assignment + one hash aggregate. */
  def shardManifest(df: DataFrame, idCol: String, tokensCol: Column,
                    nShards: Int, seed: String = "shard"): DataFrame =
    df.withColumn("shard", hashBucket(col(idCol), seed) % nShards)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(tokensCol.cast("long")).as("n_tokens"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))

  /** Temperature-scaled mixture weights over strata (multilingual
    * resampling à la XLM-R: q_s ∝ p_s^alpha flattens the head and
    * boosts the tail). Two tiny aggregates (strata-cardinality rows)
    * broadcast back — the corpus itself is touched once for the count.
    * alpha = 0.5 routes through sqrt, which IEEE-754 requires to be
    * correctly rounded (bit-identical in every engine); pow carries no
    * such guarantee, so the exactly-representable case avoids it. */
  def temperatureMixture(df: DataFrame, stratumCol: String,
                         alpha: Double = 0.5): DataFrame = {
    val c = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
    val tot = c.agg(sum(col("n")).as("__N"))
    val withP = c.crossJoin(broadcast(tot))
      .withColumn("__p", col("n").cast("double") / col("__N"))
      .withColumn("__pa",
        if (alpha == 0.5) sqrt(col("__p")) else pow(col("__p"), alpha))
    val z = withP.agg(sum(col("__pa")).as("__Z"))
    withP.crossJoin(broadcast(z))
      .select(col(stratumCol), col("n"),
        round(col("__p"), 6).as("p"),
        round(col("__pa") / col("__Z"), 6).as("q"),
        round(col("__pa") / col("__Z") * col("__N"), 3).as("expected_n"))
  }
}
