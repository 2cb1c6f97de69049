package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed for the
  * 100 TB case:
  *
  *  - exact/normalized/fingerprint dedup: one hash-partitioned groupBy —
  *    a single shuffle on the digest, map-side partial agg included.
  *  - MinHash-LSH near-dedup: candidate generation is a self-join on
  *    (band hash) — O(n·bands) rows instead of O(n²) pairs; only
  *    candidates pay the exact-jaccard verification. AQE skew-join
  *    handles hot buckets; `maxBucket` drops degenerate buckets (a
  *    shingle shared by half the corpus generates no useful pairs).
  *  - SimHash near-dedup: signature is a pure map (no shuffle); pairs
  *    come from a 4×16-bit chunk self-join — pigeonhole-complete for
  *    hamming distance ≤ 3.
  *
  * No UDFs: signatures are built from xxhash64/transform/aggregate
  * builtins, so everything stays inside whole-stage codegen.
  */
object Dedup {
  /** Word n-gram shingles (distinct), the unit of near-dup comparison.
    * Backed by the WordShingles native expression (one pass per doc;
    * the HOF formulation it replaces dominated near-dup runtime). */
  def shingles(text: Column, n: Int): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("word_shingles", TextAnalysis.tokens(text), lit(n))
  }

  /** Exact dedup: representative (min id) + multiplicity per digest. */
  def exact(df: DataFrame, idCol: String, textCol: String,
            normalize: Boolean = false): DataFrame = {
    val txt = if (normalize) regexp_replace(lower(col(textCol)), "\\s+", " ")
              else col(textCol)
    df.groupBy(md5(txt).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** Incremental (cross-snapshot) dedup: drop from `fresh` every
    * document whose (optionally normalized) content digest already
    * exists in `reference` — the recurring crawl-pipeline shape, where
    * each new snapshot dedups against the accumulated corpus without
    * ever re-shuffling the old data's text.
    *
    * Scale shape: both sides reduce to vocab-of-digests aggregations
    * (the reference side ships ONLY distinct 16-byte digests — at 100 TB
    * the old corpus contributes its fingerprint set, not its text); the
    * anti-join is digest-keyed, AQE-broadcast when the reference
    * fingerprint set fits, shuffle-hash otherwise. Persisting the
    * reference digests once amortizes across snapshots. */
  def dedupAgainst(fresh: DataFrame, reference: DataFrame,
                   idCol: String, textCol: String,
                   normalize: Boolean = false): DataFrame = {
    def digest(df: DataFrame): Column = {
      val txt = if (normalize) regexp_replace(lower(df(textCol)), "\\s+", " ")
                else df(textCol)
      md5(txt)
    }
    val seen = reference.select(digest(reference).as("__digest")).distinct()
    fresh.withColumn("__digest", digest(fresh))
      .join(seen, Seq("__digest"), "left_anti")
      .drop("__digest")
  }

  /** k minhash values from a pre-hashed shingle array (`hs` =
    * xxhash64 per shingle). Family member i re-hashes the 8-byte long
    * with seed i — independent across i (a linear h1+i·h2 family
    * correlates misses across bands and loses recall), but never
    * re-traverses the shingle strings. */
  def minhashFromHashes(hs: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(hs, h => xxhash64(lit(i), h)))): _*)

  /** Convenience single-expression form (tests / small data). */
  def minhashSignature(sh: Column, k: Int): Column =
    minhashFromHashes(transform(sh, s => xxhash64(s)), k)

  /** Exact jaccard between two string arrays (JaccardSim native
    * expression: one hash-set pass per pair, same semantics as
    * size(array_intersect)/size(array_distinct(concat))). */
  def jaccard(a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("jaccard_sim", a, b)
  }

  /** Near-duplicate pairs via MinHash-LSH + exact-jaccard verification.
    * Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold
    * (rounded to 6 for oracle comparability).
    *
    * The persisted per-doc state is the SORTED HASHED shingle set
    * (array<long>), not the shingle strings: signatures derive from the
    * hashes anyway, and verification runs JaccardSimLong (one merge
    * pass over sorted longs), so the two candidate-verification joins
    * ship 8 bytes per shingle instead of the full n-gram text — a
    * 5-10× shuffle reduction at corpus scale. Set jaccard over hashes
    * equals string jaccard up to 64-bit collisions (~1e-15 per pair;
    * the exact-jaccard oracle confirms no drift at fixture scale). */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
                   threshold: Double = 0.8, maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    // hashed shingle sets feed signature building + both verification
    // joins (shingles are distinct per doc, so sort alone gives the
    // sorted-set contract JaccardSimLong requires). One fused native
    // pass (functions.HashedShingles — spec-pinned byte-identical to
    // the tokenize → shingle → xxhash64 → array_sort chain, whose HOF
    // lambdas ran interpreted and evicted the scan projection from
    // WholeStageCodegen).
    val base = df.select(col(idCol).as("__id"),
        call_function("hashed_shingles", col(textCol), lit(shingleN))
          .as("__hs"))
    // signature + band keys in ONE map-only pass per doc
    // (functions.MinhashBands, byte-identical buckets to the previous
    // explode → numHashes-column min-aggregation → band-hash plan): no
    // per-shingle explode shuffle, no 64-slot aggregation buffer, and
    // the per-member hashing runs as a JIT'd primitive loop. Measured
    // round 11: the aggregation formulation was the top stage of every
    // minhash gate and executed once per self-join side.
    val buckets = base.select(col("__id"),
      explode(call_function("minhash_bands", col("__hs"),
        lit(numHashes), lit(bands))).as("__bucket"))
    val pruned = buckets // drop degenerate buckets (skew guard at scale)
      .withColumn("__bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("__bucket")))
      .where(col("__bn") <= maxBucket).drop("__bn")
    val cand = pruned.as("l").join(pruned.as("r"), Seq("__bucket"))
      .where(col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"))
      .distinct()
    val out = cand
      .join(base.select(col("__id").as("id_a"), col("__hs").as("__ha")), "id_a")
      .join(base.select(col("__id").as("id_b"), col("__hs").as("__hb")), "id_b")
      .withColumn("jaccard",
        round(call_function("jaccard_sim_long", col("__ha"), col("__hb")), 6))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    // the hashed-shingle corpus AND the band rows are cached lazily and
    // released right after the caller's FIRST action (CacheScope).
    // `pruned` matters as much as `base`: the bucket self-join consumes
    // it on BOTH sides, and without the cache each side re-ran the
    // explode → 64-min signature aggregation and the skew-guard window
    // (the two most expensive stages of this operator, duplicated —
    // measured round 11). The band rows are (id, bucket) pairs,
    // n_docs × bands rows — tiny at any scale. Consumers that iterate
    // over the pairs persist the small result themselves
    // (Components.fromPairs does).
    graft.operators.CacheScope.persistUntil(out, base, pruned)
    out
  }

  /** Exact n-gram-jaccard pairs with rarest-shingle blocking: candidate
    * pairs share one of each doc's `blockKeys` globally rarest shingles
    * (miss probability ≈ (1-j)^blockKeys — negligible for near-dup
    * thresholds). Rarest keys keep buckets tiny and skew-free at 100 TB
    * (lexicographic-min keys concentrate on corpus-common shingles and
    * degenerate to O(n²) buckets); the global frequency count is one
    * extra linear shuffle. Fully SQL-expressible → DuckDB-oracle-checked.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, threshold: Double = 0.8,
                   blockKeys: Int = 4): DataFrame = {
    // the shingle table feeds three consumers (frequency count, blocking
    // keys, pair verification) — persist it instead of re-shingling the
    // corpus thrice (at 100 TB this is a checkpoint of the shingled
    // corpus; here MEMORY_AND_DISK, evicted LRU after the query)
    val base = df.select(col(idCol).as("__id"), shingles(col(textCol), shingleN).as("__sh"))
    val exploded = base.select(col("__id"), explode(col("__sh")).as("__s"))
    val freq = exploded.groupBy("__s").agg(count(lit(1)).as("__f"))
    // per-doc rarest-k selection: aggregate + in-array sort of each doc's
    // ~shingle-count entries (cheap, local) instead of a row_number()
    // window, whose global shuffle-and-sort over every (doc, shingle)
    // row dominated this query's runtime
    val keyed = exploded.join(freq, "__s")
      .groupBy("__id")
      .agg(slice(array_sort(collect_list(struct(col("__f"), col("__s")))),
        1, blockKeys).as("__top"))
      .select(col("__id"), explode(col("__top")).as("__t"))
      .select(col("__id"), col("__t.__s").as("__key"))
    val cand = keyed.as("l").join(keyed.as("r"), Seq("__key"))
      .where(col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"))
      .distinct()
    val out = cand
      .join(base.select(col("__id").as("id_a"), col("__sh").as("__sha")), "id_a")
      .join(base.select(col("__id").as("id_b"), col("__sh").as("__shb")), "id_b")
      .withColumn("jaccard", round(jaccard(col("__sha"), col("__shb")), 6))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    // shingled corpus + blocking keys cached lazily, released after the
    // caller's first action (CacheScope). `keyed` feeds the candidate
    // self-join on both sides — uncached, each side re-ran the
    // frequency join and rarest-k aggregation (measured round 11; the
    // keys are blockKeys rows per doc, tiny). Iterating consumers
    // (Components' labeling in canonicalPick) persist the small pair
    // set themselves
    graft.operators.CacheScope.persistUntil(out, base, keyed)
    out
  }

  /** End-to-end near-dedup: keep ONE representative (min id) per
    * duplicate CLUSTER and drop the rest — the standard corpus-dedup
    * contract (a connected family of near-dups is one content group).
    * Naive pairwise dropping (remove id_b of every pair) has no such
    * guarantee: depending on id orientation it can keep several members
    * of one family ((1,3),(2,3) keeps both 1 and 2). Closing the pair
    * set into components first makes the result orientation-independent
    * and exactly one-per-family. Shape: the pair generator's cost +
    * O(diameter) component rounds + one anti-join against the (small)
    * duplicate-id set, which AQE broadcasts. */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                         shingleN: Int = 3, threshold: Double = 0.8): DataFrame = {
    val pairs = jaccardPairs(df, idCol, textCol, shingleN, threshold)
    val clusters = graft.operators.Components.fromPairs(pairs, "id_a", "id_b")
    val losers = clusters.where(col("id") =!= col("cluster_id")).select(col("id"))
    df.join(losers, df(idCol) === losers("id"), "left_anti")
  }

  /** Embedding-cosine near-dup dedup: a vector is dropped when a
    * lower-id vector is within `threshold` cosine. The DEFAULT is the
    * scale path (`exact = false`): sign-LSH buckets for candidate
    * generation — an equi-join on bucket ids instead of a cross
    * product, trading recall for linearity (see
    * Similarity.lshCosinePairs). Opt IN to `exact = true` — an O(n²)
    * all-pairs score — for ground truth on bounded slices only; it was
    * previously the default, which handed an unwitting caller a cross
    * product at corpus scale. */
  def embeddingDedup(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, exact: Boolean = false,
                     dim: Int = 64): DataFrame = {
    val pairs =
      if (exact) Similarity.cosinePairs(df, df, threshold, idCol, vecCol)
      else Similarity.lshCosinePairs(df, idCol, vecCol, threshold = threshold, dim = dim)
    val dups = pairs.select(col("id_b")).distinct()
    df.join(dups, df(idCol) === dups("id_b"), "left_anti")
  }

  /** SemDeDup (Abbas et al., 2023, arXiv:2303.09540): semantic dedup by
    * cluster-then-prune. Embeddings are assigned to `nCells` clusters
    * (the IVF machinery: deterministic hash-ordered centroid sample +
    * map-only `nearest_cell` pass — `portableSeed` so the DuckDB oracle
    * rebuilds the identical clustering); within a cluster, a row is a
    * duplicate when a LOWER-ID member sits within `threshold` cosine.
    * Pairwise scoring is confined to clusters — the SemDeDup recipe's
    * whole point: the candidate join is an equi-join on cell_id, so the
    * pair count is Σ|cell|², not |corpus|². At 100 TB: raise nCells so
    * cells stay bounded (the paper runs k≈11k on 1.3e9 embeddings);
    * cell skew is AQE's skew-join case, and a degenerate cell is the
    * same pathology (and fix) as a hot LSH bucket. `lloydIters` > 0
    * buys better (tighter) clusters at the price of oracle parity —
    * dedup quality only, never correctness of the within-cluster
    * pruning itself. Survivors keep their full row. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, nCells: Int = 8,
                    lloydIters: Int = 0): DataFrame = {
    // persist the assigned corpus: BOTH sides of the within-cell
    // self-join consume it (the jaccardPairs checkpoint pattern —
    // without this the corpus is scanned and re-assigned twice)
    val index = Similarity.buildIvf(df, nCells, idCol, vecCol, lloydIters,
      persistIndex = true, portableSeed = true)
    val a = index.assigned.select(col("match_id"), col("__mv"), col("__mn"),
      col("cell_id"))
    val dups = a.as("l").join(a.as("r"), Seq("cell_id"))
      .where(col("l.match_id") < col("r.match_id"))
      .where(round(Similarity.rawDot(col("l.__mv"), col("r.__mv")) /
        (col("l.__mn") * col("r.__mn")), 6) >= threshold)
      .select(col("r.match_id").as("__dup")).distinct()
    // the assigned corpus (full vectors) is cached lazily and released
    // right after the caller's first action (CacheScope): within that
    // action the first self-join side populates it, the second reads it,
    // and nothing leaks across repeated calls (bench loops, Quality
    // sweeps). No dedicated materialization pass.
    val out = df.join(dups, df(idCol) === dups("__dup"), "left_anti")
    graft.operators.CacheScope.persistUntil(out, index.assigned)
    out
  }

  /** SimHash signature width. 60 bits — the widest that survives a
    * portable hash: 15 hex chars of md5 parse losslessly into a signed
    * 64-bit int in both Spark (conv) and DuckDB ('0x'-cast), making the
    * whole simhash pipeline oracle-checkable. 4 chunks of 15 bits keep
    * the pigeonhole blocking for hamming ≤ 3. */
  val SimHashBits = 60

  /** 60-bit token hash computable identically in Spark and DuckDB:
    * first 15 hex chars of md5, parsed base-16
    * (DuckDB: ('0x' || substr(md5(t), 1, 15))::BIGINT). */
  def portableHash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** SimHash of the token multiset: bit i set iff the sum of ±1
    * contributions (tokens whose hash has bit i set vote +1) is
    * positive. Statically unrolled bit-votes folded over a pre-hashed
    * token array — large expression, but map-only and codegen'd. */
  def simhashFromHashes(hashes: Column): Column =
    (0 until SimHashBits).map { i =>
      val vote = aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  def simhash60(text: Column): Column =
    simhashFromHashes(transform(TextAnalysis.tokens(text), t => portableHash60(t)))

  /** Near-dup pairs by SimHash hamming distance ≤ maxDist (≤ 3 for
    * completeness: 4 chunks of 15 bits, pigeonhole). Output
    * (id_a, id_b, hamming), id_a < id_b.
    *
    * Signature build is explode → hash-partitioned groupBy with
    * `SimHashBits` partial-aggregated vote sums (map-side combine keeps
    * the shuffle at one row per doc) rather than per-row array folds —
    * the per-token work is one md5, not 60 re-traversals. Docs with no
    * tokens carry no signature (exact dedup already covers empty-text
    * duplicates). */
  /** Cross-document repeated n-gram SPAN detection — the exact-substring
    * duplication signal of "Deduplicating Training Data Makes Language
    * Models Better" (Lee et al., 2021), reshaped for Spark: instead of
    * a suffix array over the concatenated corpus, every n-token window
    * is hashed, and windows whose hash occurs in ≥ `minDocs` DISTINCT
    * documents are flagged as duplicated spans. Returns, per document
    * with at least one flagged span: the number of repeated windows and
    * the fraction of its tokens covered by ≥1 repeated window — the
    * "how much of this doc is boilerplate shared with others" number
    * that drives span-level filtering decisions.
    *
    * Scale shape: the window table is the same explode the shingle
    * pipelines pay (one row per corpus token); window-frequency counts
    * are one hash-partitioned groupBy with map-side combine; flagged
    * spans come back via one equi-join on the window hash; and only
    * FLAGGED windows (rare by construction) explode into covered-token
    * positions. All expressions are codegen'd builtins — no UDFs. */
  /** Shared window machinery for [[repeatedSpans]] / [[dropRepeatedSpans]]:
    * the persisted tokenized corpus plus its flagged (cross-doc
    * duplicated) window hashes — ONE implementation, so the measure and
    * the transform can never drift on tokenize/window/hash semantics
    * (the lineDedup segments/rebuildDocs rationale). The caller must
    * hand `base` to [[graft.operators.CacheScope.persistUntil]] with its
    * own result frame — a persisted tokenized corpus leaked per call
    * accumulates executor blocks forever (CacheManager holds strong
    * references and the disk tier is not LRU-evicted). */
  private def spanWindows(df: DataFrame, idCol: String, textCol: String,
                          n: Int, minDocs: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    require(n >= 2, "span length must be >= 2 tokens")
    require(minDocs >= 2, "minDocs < 2 would flag every window")
    val base = df.select(col(idCol).as("__id"),
        TextAnalysis.tokens(col(textCol)).as("__w"))
      .withColumn("__nt", size(col("__w")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // sequence(1, 0) counts DOWN in Spark; guard short docs to null so
    // explode drops them instead
    val win = base
      .withColumn("__i", explode(when(col("__nt") >= n,
        sequence(lit(1), col("__nt") - (n - 1)))))
      .select(col("__id"), col("__nt"), col("__i"),
        md5(concat_ws(" ", slice(col("__w"), col("__i"), lit(n))).cast("binary"))
          .as("__h"))
    val flagged = win.groupBy("__h")
      .agg(countDistinct(col("__id")).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select("__h")
    (base, win, flagged)
  }

  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
                    n: Int = 8, minDocs: Int = 2): DataFrame = {
    val (base, win, flagged) = spanWindows(df, idCol, textCol, n, minDocs)
    // tokenized corpus cached lazily, released after the caller's first
    // action (CacheScope — no dedicated materialization pass)
    val out = win.join(flagged, "__h")
      .select(col("__id"), col("__nt"), col("__i"),
        explode(sequence(col("__i"), col("__i") + (n - 1))).as("__p"))
      .groupBy(col("__id"), col("__nt"))
      .agg(countDistinct(col("__i")).as("n_spans"),
        countDistinct(col("__p")).as("__cov"))
      .select(col("__id").as(idCol), col("n_spans"),
        round(col("__cov").cast("double") / col("__nt"), 6).as("dup_frac"))
    graft.operators.CacheScope.persistUntil(out, base)
    out
  }

  /** Exact-substring dedup TRANSFORM (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499):
    * where `repeatedSpans` only measures cross-doc repetition, this
    * rewrites the corpus — every token covered by an n-token window
    * that occurs in >= minDocs documents is removed, and survivors are
    * re-joined with single spaces (tokenizer-normalized whitespace).
    *
    * Scale shape mirrors repeatedSpans (shared [[spanWindows]]): one
    * window-frequency groupBy, one equi-join on the window hash, per-doc
    * covered-position sets bounded by doc length. The tokenized-corpus
    * cache releases after the caller's first action; the final rebuild
    * re-tokenizes lazily (one extra linear pass instead of a corpus-sized
    * cache leaked per call). */
  def dropRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 8, minDocs: Int = 2): DataFrame = {
    val (base, win, flagged) = spanWindows(df, idCol, textCol, n, minDocs)
    val covered = win.join(flagged, "__h")
      .select(col("__id"),
        explode(sequence(col("__i"), col("__i") + (n - 1))).as("__p"))
      .groupBy("__id").agg(collect_set(col("__p")).as("__cov"))
    val toks = TextAnalysis.tokens(col(textCol))
    val out = df.select(col(idCol).as("__id"), toks.as("__w"))
      .join(covered, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        // null text stays null (concat_ws would fold a null token array
        // to the empty string and diverge from the source)
        when(col("__w").isNull, lit(null).cast("string"))
          .otherwise(concat_ws(" ", when(col("__cov").isNull, col("__w"))
            .otherwise(filter(col("__w"), (_, i) =>
              !array_contains(col("__cov"), i + 1))))).as(textCol),
        coalesce(size(col("__cov")), lit(0)).cast("long").as("n_removed"))
    // the tokenized corpus cache releases after the caller's first
    // action (CacheScope); the rebuild branch re-tokenizes lazily — one
    // extra linear pass instead of a corpus-sized cache leaked per call
    graft.operators.CacheScope.persistUntil(out, base)
    out
  }

  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-chunk blocking is only complete for maxDist <= 3")
    val toks = df.select(col(idCol).as("__id"),
      explode(transform(TextAnalysis.tokens(col(textCol)),
        t => portableHash60(t))).as("__h"))
    val votes = (0 until SimHashBits).map(i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"__v$i"))
    val sigs = toks.groupBy("__id").agg(votes.head, votes.tail: _*)
      .select(col("__id"), (0 until SimHashBits).map(i =>
        when(col(s"__v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce(_.bitwiseOR(_)).as("__sig"))
    val chunks = sigs.select(col("__id"), col("__sig"), explode(array(
      (0 until 4).map(j => concat_ws(":", lit(j),
        shiftright(col("__sig"), j * 15).bitwiseAND(lit(0x7FFFL)))): _*)).as("__chunk"))
    chunks.as("l").join(chunks.as("r"), Seq("__chunk"))
      .where(col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"),
        bit_count(col("l.__sig").bitwiseXOR(col("r.__sig"))).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
  }

  /** Quality-canonical near-dup resolution: cluster the corpus's
    * near-duplicates (jaccard pairs → connected components) and pick
    * each cluster's representative by QUALITY instead of min-id — the
    * production dedup policy ("of these 5 crawls of the same page, keep
    * the cleanest"), vs [[dropNearDuplicates]]' arbitrary-survivor
    * policy. Singletons represent themselves. Output per input doc:
    * (id, cluster_id, rep_id, keep, quality) with
    * rep = argmax (quality, then min id) within the cluster.
    *
    * Scale shape: inherits jaccardPairs' blocked candidate generation
    * and Components' bounded labeling; the rep choice is ONE hash agg
    * on cluster id (max over a (quality, −id) struct — no window, no
    * sort) plus id-keyed joins. */
  def canonicalPick(df: DataFrame, idCol: String, textCol: String,
                    quality: Column,
                    shingleN: Int = 3, threshold: Double = 0.8): DataFrame = {
    val pairs = jaccardPairs(df, idCol, textCol, shingleN, threshold)
    val clusters = graft.operators.Components.fromPairs(pairs, "id_a", "id_b")
    val withCl = df.select(col(idCol), quality.as("quality"))
      .join(clusters.select(col("id").as(idCol), col("cluster_id")),
        Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
    // min_by over (−quality, id): highest quality wins, ties → min id.
    // Only QUALITY is negated (always numeric) — negating the id would
    // silently null out non-numeric id types. A NULL quality must rank
    // LAST, not first: struct ordering sorts null fields first, so an
    // unscored document would otherwise beat every scored one —
    // coalesce to −∞ (negated: +∞ = worst).
    val rep = withCl.groupBy("cluster_id")
      .agg(min_by(col(idCol),
        struct((-coalesce(col("quality"),
          lit(Double.NegativeInfinity))).as("nq"),
          col(idCol).as("i"))).as("rep_id"))
    withCl.join(rep, Seq("cluster_id"))
      .select(col(idCol), col("cluster_id"), col("rep_id"),
        (col(idCol) === col("rep_id")).as("keep"), col("quality"))
  }

  /** Paragraph/chunk-level dedup with document reconstruction (the
    * Dolma-style "dedupe paragraphs across the corpus, keep documents"
    * pass; here the unit is a fixed `chunkSize`-token chunk because the
    * fixtures carry no newlines). A chunk occurrence survives iff it is
    * the globally FIRST occurrence of its text (ordered by doc id then
    * chunk position); every document is then rebuilt from its surviving
    * chunks in order. Output: (id, n_chunks, n_kept, text_dedup) for
    * every input document — a fully-deduped doc comes back with
    * n_kept = 0 and empty text.
    *
    * Scale shape: chunks shuffle ONCE on their md5 digest (never the
    * chunk text itself — the join key is 32 bytes regardless of chunk
    * length) for the first-occurrence window, then once on doc id for
    * reconstruction. No self-join, no broadcast that grows with the
    * corpus; both shuffles are linear in corpus size and AQE-skew-safe.
    * Digest collisions (md5 over exact text) are the standard accepted
    * risk of every hash-dedup pipeline. */
  def dedupChunks(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chunks = Sampling.chunkDocuments(df, idCol, textCol, chunkSize)
      .withColumn("__h", md5(col("chunk_text").cast("binary")))
    // first occurrence per digest: rank within the digest's partition —
    // partition count = distinct chunks, each group tiny (duplicate
    // multiplicity), so the window is bounded per key
    val rn = row_number().over(
      Window.partitionBy("__h").orderBy(col(idCol).asc, col("chunk_id").asc))
    val flagged = chunks.withColumn("__keep", rn === 1)
    val rebuilt = flagged.groupBy(idCol).agg(
      count(lit(1)).as("n_chunks"),
      sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
      concat_ws(" ", transform(
        array_sort(collect_list(when(col("__keep"),
          struct(col("chunk_id"), col("chunk_text"))))),
        s => s.getField("chunk_text"))).as("text_dedup"))
    // docs with zero tokens produce no chunks — restore them empty
    df.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }

  /** Cross-source contamination matrix: for every ordered source pair
    * (src_a < src_b), how many distinct content fingerprints both
    * sources contain. The pivot is fingerprint → sorted distinct source
    * list, so pair expansion is bounded by (sources sharing that
    * fingerprint)² — sources are a catalog dimension (thousands at
    * most), documents never self-join: the work is Σ_fp |srcs_fp|²,
    * never corpus². */
  def sourceOverlap(df: DataFrame, textCol: String,
                    sourceCol: String): DataFrame = {
    val d = df.select(TextAnalysis.fingerprint(col(textCol)).as("fp"),
        col(sourceCol).as("__src")).distinct()
    val shared = d.groupBy("fp")
      .agg(sort_array(collect_set(col("__src"))).as("__srcs"))
      .where(size(col("__srcs")) > 1)
    shared
      .select(posexplode(col("__srcs")).as(Seq("__i", "src_a")),
        col("__srcs"))
      .select(col("src_a"), explode(slice(col("__srcs"), col("__i") + 2,
        size(col("__srcs")) - col("__i") - 1)).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  // ---- line-level (segment) dedup — CCNet §3.1 / boilerplate removal ----

  /** (doc, position, segment) exploded view; `sep` is a LITERAL
    * separator (quoted before Spark's regex split). Shared with
    * [[LineFreqIndex]] so the two line-dedup implementations cannot
    * drift on split/ordering semantics. */
  private[llmops] def segments(df: DataFrame, idCol: String, textCol: String,
                               sep: String): DataFrame =
    df.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("__i", "line")))

  /** Rebuild documents from surviving (idCol, __i, line) segments in
    * original order; docs with no surviving segment drop out. */
  private[llmops] def rebuildDocs(segs: DataFrame, idCol: String,
                                  textCol: String, sep: String): DataFrame =
    segs.groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__i"), col("line")))),
          x => x.getField("line")), sep).as(textCol))

  /** Corpus-wide document frequency per line/segment: (line, n_docs).
    * A line repeated within one doc counts that doc once. One shuffle
    * on the line (map-side partial distinct via the two-level agg). */
  def lineDocFreq(df: DataFrame, idCol: String, textCol: String,
                  sep: String = "\n"): DataFrame =
    segments(df, idCol, textCol, sep)
      .select(col(idCol), col("line")).distinct()
      .groupBy("line").agg(count(lit(1)).as("n_docs"))

  /** Boilerplate report: lines/segments present in ≥ `minDocFrac` of
    * all documents — the headers, footers, cookie banners and nav
    * strings that repeat across a crawl. The total-count side is a
    * 1-row broadcast. */
  def boilerplateLines(df: DataFrame, idCol: String, textCol: String,
                       sep: String = "\n",
                       minDocFrac: Double = 0.5): DataFrame = {
    val total = df.select(count(lit(1)).as("__total"))
    lineDocFreq(df, idCol, textCol, sep).crossJoin(broadcast(total))
      .where(col("n_docs") >= col("__total") * minDocFrac)
      .drop("__total")
  }

  /** CCNet-style line-level dedup: rewrite each document keeping only
    * the lines whose corpus-wide DOCUMENT frequency is ≤ `maxDocFrac`
    * of all documents, preserving original line order. Documents whose
    * every line is boilerplate drop out entirely (nothing left to
    * train on).
    *
    * Scale shape: explode → one hash agg for the frequencies → one
    * equi-join back on the line → one per-doc re-aggregation. The
    * per-doc collect_list is bounded by single-document size; the
    * frequency side never collects to the driver (frequent-line sets
    * on a real crawl are NOT small — headers alone are millions of
    * distinct strings — so a broadcast formulation would be wrong at
    * 100 TB; the join stays a shuffle equi-join and AQE may still
    * choose broadcast when the surviving-frequency side is tiny). */
  def dropFrequentLines(df: DataFrame, idCol: String, textCol: String,
                        sep: String = "\n",
                        maxDocFrac: Double = 0.5): DataFrame = {
    val total = df.select(count(lit(1)).as("__total"))
    val keepable = lineDocFreq(df, idCol, textCol, sep)
      .crossJoin(broadcast(total))
      .where(col("n_docs") <= col("__total") * maxDocFrac)
      .select("line")
    rebuildDocs(segments(df, idCol, textCol, sep).join(keepable, "line"),
      idCol, textCol, sep)
  }
}
