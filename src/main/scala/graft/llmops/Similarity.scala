package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Scale design: the dot product is a sequential fold over the array
  * (deterministic summation order — required for oracle parity and for
  * reproducibility across cluster sizes). Brute-force top-k broadcasts
  * the (small) query side so the corpus never shuffles; the LSH variant
  * buckets by random-hyperplane sign bits so candidate generation is an
  * equi-join, not a cross product.
  */
object Similarity {
  /** Dot product of two array<double> columns that are ALREADY double —
    * no per-call cast. Pair-generating operators cast each vector once
    * per row and call this per pair (casting inside the pair loop
    * re-allocates both arrays for every candidate). Backed by the
    * DotDouble codegen expression: left-to-right summation, so the
    * order-deterministic oracle contract of the old
    * aggregate(zip_with(...)) fold is preserved. */
  /** Call a graft-registered native function, registering the function
    * set on the active session first (idempotent). */
  private def graftFn(name: String, cols: Column*): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function(name, cols: _*)
  }

  private[llmops] def rawDot(a: Column, b: Column): Column = graftFn("dot_d", a, b)

  /** Elements cast to double before multiply (float*float loses bits the
    * oracle keeps). Sequential fold → deterministic sum order. */
  def dot(a: Column, b: Column): Column =
    rawDot(a.cast("array<double>"), b.cast("array<double>"))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Int8 scalar quantization of an embedding vector — the standard 4×
    * storage/bandwidth reduction for ANN indexes at corpus scale. Per
    * vector: scale = (max − min)/255, code_i = round((v_i − min)/scale)
    * ∈ [0, 255]; constant vectors (scale 0) encode as all-zero codes.
    * Returns struct(minv, scale, codes array<int>). Pure map expression
    * (HOF transform + array_min/max) — no shuffle, runs in the scan
    * stage. */
  /** One-pass native quantizer (functions/GraftFunctions.QuantInt8):
    * struct(minv, scale, codes, mse). The previous HOF formulation
    * captured the min/max aggregates inside the per-element lambda —
    * O(d²) per vector (see the expression Scaladoc). Callers that need
    * several fields should materialize this struct into a column once
    * and getField from it. */
  def quantizeInt8Full(vec: Column): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("quant_int8", vec)
  }

  /** Int8 quantization struct(minv, scale, codes) — the storage layout
    * half of [[quantizeInt8Full]] (kept for the narrower contract). */
  def quantizeInt8(vec: Column): Column = {
    val q = quantizeInt8Full(vec)
    struct(q.getField("minv").as("minv"), q.getField("scale").as("scale"),
      q.getField("codes").as("codes"))
  }

  /** Reconstruction from quantizeInt8 output: v̂_i = minv + code_i·scale. */
  def dequantizeInt8(q: Column): Column =
    transform(q.getField("codes"),
      c => q.getField("minv") + c.cast("double") * q.getField("scale"))

  /** Mean squared reconstruction error of int8 quantization for a
    * vector — the quality gauge for the storage/recall trade-off. */
  def quantizationMse(vec: Column): Column =
    quantizeInt8Full(vec).getField("mse")

  /** Brute-force cosine top-k: every query row against the whole corpus.
    * Rank by rounded similarity + id tiebreak → fully deterministic. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     qId: String = "vec_id", cId: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(qId).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"), norm(col(vecCol)).as("__qn")))
    val c = corpus.select(col(cId).as("match_id"),
      col(vecCol).cast("array<double>").as("__cv"), norm(col(vecCol)).as("__cn"))
    val scored = c.crossJoin(q)
      .where(col("query_id") =!= col("match_id"))
      .withColumn("cos", round(rawDot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("match_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("match_id"), col("cos"), col("rnk").cast("long").as("rnk"))
  }

  /** Pooling buffer: element-wise sum + contributing-vector count. */
  final case class PoolBuf(sum: Array[Double], n: Long)

  /** Element-wise mean pooling of grouped vectors — the chunk→document
    * embedding fold (embed chunks, pool to one doc vector). A typed
    * Aggregator: ONE shuffle whose partials are a single dim-length
    * array + count per group (map-side combine collapses each
    * partition's chunks before the exchange — at corpus scale the wire
    * carries G·dim doubles, never the chunk vectors). Null vectors are
    * skipped (the $avg contract); an all-null/empty group pools to
    * null; a dimension mismatch inside a group raises rather than
    * zero-padding silently. */
  def meanPool(vec: Column): Column = {
    val agg = new org.apache.spark.sql.expressions.Aggregator[
        Seq[Double], PoolBuf, Option[Seq[Double]]] {
      override def zero: PoolBuf = PoolBuf(Array.empty, 0L)
      // `n == 0` is the only uninitialized marker: a zero-LENGTH vector
      // is a legitimate dim-0 input, so an empty sum array with n > 0
      // must still dimension-check (conflating the two would let
      // [[], [2.0]] silently restart accumulation instead of raising)
      private def add(sum: Array[Double], v: Seq[Double]): Array[Double] =
        if (sum.length != v.length) throw new IllegalArgumentException(
          s"meanPool: dimension mismatch (${sum.length} vs ${v.length})")
        else {
          var i = 0
          while (i < sum.length) { sum(i) += v(i); i += 1 }
          sum
        }
      override def reduce(b: PoolBuf, v: Seq[Double]): PoolBuf =
        if (v == null) b
        else if (b.n == 0) PoolBuf(v.toArray, 1L)
        else PoolBuf(add(b.sum, v), b.n + 1)
      override def merge(a: PoolBuf, b: PoolBuf): PoolBuf =
        if (a.n == 0) b
        else if (b.n == 0) a
        else PoolBuf(add(a.sum, b.sum.toSeq), a.n + b.n)
      override def finish(r: PoolBuf): Option[Seq[Double]] =
        if (r.n == 0) None else Some(r.sum.map(_ / r.n).toSeq)
      override def bufferEncoder: org.apache.spark.sql.Encoder[PoolBuf] =
        org.apache.spark.sql.Encoders.product[PoolBuf]
      override def outputEncoder: org.apache.spark.sql.Encoder[Option[Seq[Double]]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
    udaf(agg, org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
      .apply(vec.cast("array<double>"))
  }

  /** Hard-negative mining for contrastive training-pair prep: per
    * query, the k most-similar corpus items that are NOT labeled
    * positives — the negatives that actually move an embedding model.
    * `positives` is an arbitrary-size (query, positive) pair table and
    * stays on a left-anti join (never collected); `maxCos` optionally
    * drops suspiciously-near items (cos ≥ maxCos) as probable
    * UNLABELED positives — the standard false-negative guard.
    *
    * `scorer` picks the candidate-scoring leg:
    *  - "exact": [[bruteForceTopK]]'s broadcast-queries × full-corpus
    *    scan (linear in corpus, the oracle leg);
    *  - "ivf": candidates from [[ivfQuery]] over a fresh IVF index
    *    (each query scores ~nProbe/nCells of the corpus — the 100 TB
    *    path); cosine scores, so maxCos still applies;
    *  - "pq": candidates from [[pqTopK]] (ADC distances over m-byte
    *    codes; score column is `adc` ascending; maxCos is a cosine and
    *    is refused loudly here).
    * ANN legs over-fetch `candidates` per query (default 4k) BEFORE the
    * positives anti-join — a query whose top-candidates are mostly
    * positives can under-fill its k (inherent to ANN mining; raise
    * `candidates` to taste). The anti-join and final window compose
    * identically across legs: rank by score (+ id tiebreak), take k. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
                    positives: DataFrame, k: Int,
                    qId: String = "vec_id", cId: String = "vec_id",
                    vecCol: String = "embedding",
                    posQCol: String = "query_id", posCCol: String = "match_id",
                    maxCos: Double = Double.PositiveInfinity,
                    scorer: String = "exact",
                    candidates: Int = 0,
                    nCells: Int = 16, nProbe: Int = 4,
                    m: Int = 8, codes: Int = 16, dim: Int = 64,
                    portableSeed: Boolean = false): DataFrame = {
    val kCand = if (candidates > 0) candidates else 4 * k
    val pos = positives.select(col(posQCol).as("__pq"), col(posCCol).as("__pc"))
    def finish(scored: DataFrame, scoreCol: String, asc: Boolean): DataFrame = {
      val negs = scored.join(pos,
        col("query_id") === col("__pq") && col("match_id") === col("__pc"),
        "left_anti")
      val ord = if (asc) col(scoreCol).asc else col(scoreCol).desc
      val w = Window.partitionBy("query_id").orderBy(ord, col("match_id").asc)
      negs.withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= k)
        .select(col("query_id"), col("match_id"), col(scoreCol),
          col("rnk").cast("long").as("rnk"))
    }
    scorer match {
      case "exact" =>
        val q = broadcast(queries.select(col(qId).as("query_id"),
          col(vecCol).cast("array<double>").as("__qv"), norm(col(vecCol)).as("__qn")))
        val c = corpus.select(col(cId).as("match_id"),
          col(vecCol).cast("array<double>").as("__cv"), norm(col(vecCol)).as("__cn"))
        val scored0 = c.crossJoin(q)
          .where(col("query_id") =!= col("match_id"))
          .withColumn("cos",
            round(rawDot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6))
        // the ceiling is OPT-IN: the default (+∞) never drops a candidate —
        // a ceiling of 1.0 would silently exclude exact-duplicate vectors,
        // which are the hardest negatives when they are not positives
        val scored =
          if (maxCos.isPosInfinity) scored0 else scored0.where(col("cos") < maxCos)
        finish(scored, "cos", asc = false)
      case "ivf" =>
        val index = buildIvf(corpus, nCells, cId, vecCol, lloydIters = 0,
          persistIndex = false, portableSeed = portableSeed)
        val q = queries.select(col(qId).as(cId), col(vecCol))
        val cand = ivfQuery(index, q, kCand, nProbe)
        val capped =
          if (maxCos.isPosInfinity) cand else cand.where(col("cos") < maxCos)
        finish(capped, "cos", asc = false)
      case "pq" =>
        require(maxCos.isPosInfinity,
          "hardNegatives: maxCos is a cosine ceiling — it needs cosine " +
            "scoring (exact|ivf); PQ scores are ADC distances")
        val cand = pqTopK(queries, corpus, kCand, m, codes, qId, cId, vecCol, dim)
        finish(cand, "adc", asc = true)
      case other => throw new IllegalArgumentException(
        s"hardNegatives: unknown scorer '$other' (exact|ivf|pq)")
    }
  }

  /** Deterministic ±1 hyperplane component for (plane, dim index): bit 0
    * of the first 15 hex chars of md5("plane:i"). No RNG state —
    * identical on every executor AND reproducible in DuckDB
    * (('0x' || substr(md5(p || ':' || i), 1, 15))::BIGINT & 1), so
    * LSH output is oracle-checkable. Evaluated on the driver into
    * literal arrays (plane components are constants, not per-row work). */
  private[llmops] def planeSign(plane: Int, dimIdx: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$plane:$dimIdx".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.substring(0, 15)
    if ((java.lang.Long.parseLong(hex, 16) & 1L) == 1L) 1.0 else -1.0
  }

  /** Sign-bit LSH bucket id from `planes` random hyperplanes over
    * `dim`-dimensional vectors. Vectors in the same bucket are likely
    * neighbors. (Single-probe: neighbors landing across a hyperplane are
    * missed — see measured recall in README; raise recall by lowering
    * `planes` or via ivfTopK.) One fused codegen pass over the vector
    * (the SignBucket native expression), with the dim guard inside it —
    * the previous `planes`× interpreted aggregate(zip_with) chains plus
    * a when/raise_error wrapper cost +55% on the whole-corpus scan. */
  def signBucket(vec: Column, planes: Int, dim: Int): Column = {
    val matrix = typedlit((0 until planes).map(p =>
      (0 until dim).map(i => planeSign(p, i))))
    graftFn("sign_bucket", vec.cast("array<double>"), matrix)
  }

  /** Bucketed approximate neighbor pairs: same sign-bucket → verify
    * cosine ≥ threshold. The scale path: candidate join is equi-join on
    * the bucket id (n·1 rows), not O(n²). */
  def lshCosinePairs(df: DataFrame, idCol: String, vecCol: String,
                     planes: Int = 8, threshold: Double = 0.4,
                     dim: Int = 64): DataFrame = {
    val b = df.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"),
      signBucket(col(vecCol), planes, dim).as("__bucket"), norm(col(vecCol)).as("__n"))
    b.as("l").join(b.as("r"), Seq("__bucket"))
      .where(col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"),
        round(rawDot(col("l.__v"), col("r.__v")) / (col("l.__n") * col("r.__n")), 6).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Literal pre-normalized centroid matrix (rows ÷ their norms) for the
    * map-only `nearest_cell` assignment: ONE literal node (typedlit), not
    * nCells × dim Literal/CreateArray nodes — at dim 1536 × 256 cells the
    * per-element form puts ~400k nodes in every assignment plan. Rows are
    * driver-side centroid Rows of (cell_id, __cv, __cn), ORDERED BY
    * cell_id so matrix-index ties == cell_id ties (the query-side probe
    * order). A zero-norm centroid maps to the zero vector (dot 0, never
    * dominant) instead of NaN-poisoning its cell. */
  private def centroidMatrix(rows: Array[org.apache.spark.sql.Row]): Column =
    typedlit(rows.toIndexedSeq.map { r =>
      val cn = r.getDouble(2)
      val d = if (cn == 0.0) 1.0 else cn
      r.getSeq[Double](1).map(x => if (cn == 0.0) 0.0 else x / d)
    })

  /** Spherical k-means (Lloyd) refinement of IVF centroids: each
    * iteration assigns every corpus vector to its nearest centroid —
    * a MAP-ONLY pass (`nearest_cell` against the literal centroid
    * matrix: no crossJoin row explosion, no window, the corpus never
    * shuffles whole vectors) — and re-centers each cell on the
    * element-wise mean of its members. The means come back to the
    * driver as nCells single rows (one mean ARRAY per cell — dim
    * column-wise partial sums, no exploded scalars, see
    * [[clusterMeans]]). Cosine similarity divides by the centroid
    * norm, so the mean needs no explicit normalization (spherical
    * k-means). Empty cells keep their previous centroid. */
  private def lloydRefine(corpus: DataFrame, seedRows: Array[org.apache.spark.sql.Row],
                          iters: Int, vecCol: String): Array[org.apache.spark.sql.Row] = {
    var current = seedRows
    val dim = seedRows.headOption.map(_.getSeq[Double](1).length).getOrElse(0)
    for (_ <- 1 to iters) {
      val assigned = corpus
        .select(col(vecCol).cast("array<double>").as("__v"))
        .withColumn("__ci", graftFn("nearest_cell", col("__v"), centroidMatrix(current)))
        .where(col("__ci").isNotNull)
      val means = clusterMeans(assigned, "__ci", dim)
      current = current.zipWithIndex.map { case (r, ci) =>
        means.get(ci) match {
          case Some(vec0) =>
            val vec = vec0.toSeq
            org.apache.spark.sql.Row(r.get(0), vec, math.sqrt(vec.map(x => x * x).sum))
          case None => r // empty cell: keep the previous centroid
        }
      }
    }
    current
  }

  /** Per-cluster mean vectors in ONE aggregate pass, ONE ROW PER
    * CLUSTER: `dim` column-wise sums + a count build the mean array
    * map-side (partial aggregation), so the driver receives k rows of
    * (cluster, n, sums[dim]) instead of k×dim scalar rows — the Lloyd
    * loop's per-iteration round trip shrinks ~dim×. */
  private def clusterMeans(assigned: DataFrame, clCol: String,
                           dim: Int): Map[Int, Array[Double]] =
    assigned.groupBy(col(clCol))
      .agg(count(lit(1)).as("__n"),
        array((0 until dim).map(i =>
          sum(element_at(col("__v"), i + 1))): _*).as("__sums"))
      .collect()
      .map { r =>
        val n = r.getLong(1).toDouble
        r.getInt(0) -> r.getSeq[Double](2).map(_ / n).toArray
      }.toMap

  /** IVF (inverted-file) approximate top-k: the corpus is partitioned
    * into `nCells` Voronoi cells around the centroid matrix; a query
    * probes its `nProbe` nearest cells and brute-forces only those. At
    * 100 TB the cell assignment is one MAP-ONLY pass over the corpus
    * (`nearest_cell` against the literal matrix — no join, no shuffle)
    * and each query touches ~nProbe/nCells of the data. nProbe = nCells
    * degrades gracefully to exact brute force (asserted in tests — and
    * invariant to centroid placement, so the oracle entry stays exact
    * under refinement; refinement is skipped there as wasted work).
    *
    * Centroid choice: the nCells corpus rows with the smallest xxhash64
    * of their id — a deterministic, seed-free hash-ordered sample that
    * exists for any id distribution, found in one TakeOrdered pass (no
    * extra corpus count scan) — refined by `lloydIters` rounds of
    * spherical k-means (measured recall gain in Quality/README).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              lloydIters: Int = 1): DataFrame = {
    // exhaustive probing is invariant to centroid placement → skip the
    // refinement passes as wasted work
    val iters = if (nProbe >= nCells) 0 else lloydIters
    val index = buildIvf(corpus, nCells, idCol, vecCol, iters,
      persistIndex = false)
    ivfQuery(index, queries, k, nProbe)
  }

  /** A built IVF index: broadcastable centroids + the cell-assigned
    * corpus. `assigned` is persisted when built with
    * `persistIndex = true` (the build-once / query-many workflow — at
    * corpus scale this is the materialized index; on a cluster write it
    * to storage instead and reload). */
  final case class IvfIndex private[llmops] (
      centroidRows: Array[org.apache.spark.sql.Row],
      seedSchema: org.apache.spark.sql.types.StructType,
      assigned: DataFrame, idCol: String, vecCol: String) {
    def unpersist(): Unit = { assigned.unpersist(); () }
  }

  /** Build the IVF index: deterministic hash-ordered centroid sample,
    * optional spherical-k-means refinement, then a MAP-ONLY cell
    * assignment pass over the corpus (no join, no shuffle — rows with
    * unindexable vectors are excluded, like any ANN index). */
  def buildIvf(corpus: DataFrame, nCells: Int = 16,
               idCol: String = "vec_id", vecCol: String = "embedding",
               lloydIters: Int = 1,
               persistIndex: Boolean = true,
               portableSeed: Boolean = false): IvfIndex = {
    // re-sorted by cell_id after the hash-ordered sample, so matrix
    // index order == cell_id order: nearest_cell's lowest-index tie
    // break and the query window's cell_id-asc tie break agree (tied
    // duplicate centroids would otherwise send corpus rows to a cell
    // the query never probes)
    // portableSeed swaps xxhash64 for the md5-derived 60-bit hash of the
    // id's STRING form — same hash-ordered-sample semantics, but DuckDB
    // computes it too, so centroid-dependent results (semanticDedup)
    // stay oracle-checkable. xxhash64 stays the default (cheaper).
    val seedOrd = if (portableSeed) Dedup.portableHash60(col(idCol).cast("string"))
                  else xxhash64(col(idCol))
    // cleanliness filter BEFORE the hash-ordered limit (pqTrain's
    // guard, same rationale): a null or null-element vector inside the
    // seed window would NPE the driver-side centroid matrix; a
    // wrong-dimension one would build a ragged matrix that silently
    // nulls every nearest_cell assignment (empty index)
    val seedDf = corpus
      .where(col(vecCol).isNotNull &&
        !exists(col(vecCol).cast("array<double>"), x => x.isNull))
      .orderBy(seedOrd.asc, col(idCol).asc).limit(nCells)
      .select(col(idCol).as("cell_id"), col(vecCol).cast("array<double>").as("__cv"),
        norm(col(vecCol)).as("__cn"))
      .orderBy(col("cell_id").asc)
    val seedSchema = seedDf.schema
    val seedRows = seedDf.collect()
    require(seedRows.nonEmpty, "buildIvf: no usable seed vectors in corpus")
    require(seedRows.map(_.getSeq[Double](1).length).distinct.length == 1,
      "buildIvf: seed vectors disagree on dimension — mixed-dimension " +
        "corpora cannot share one IVF quantizer")
    val centroidRows =
      if (lloydIters <= 0) seedRows
      else lloydRefine(corpus, seedRows, lloydIters, vecCol)
    val cellIds = array(centroidRows.map(r => lit(r.get(0))).toIndexedSeq: _*)
    val assigned0 = corpus
      .select(col(idCol).as("match_id"),
        col(vecCol).cast("array<double>").as("__mv"), norm(col(vecCol)).as("__mn"))
      .withColumn("__ci", graftFn("nearest_cell", col("__mv"), centroidMatrix(centroidRows)))
      .where(col("__ci").isNotNull)
      .withColumn("cell_id", element_at(cellIds, col("__ci") + 1))
      .drop("__ci")
    val assigned = if (persistIndex)
      assigned0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else assigned0
    IvfIndex(centroidRows, seedSchema, assigned, idCol, vecCol)
  }

  /** Persistable face of a built IVF index: one row per cell —
    * (cell_id, centroid, c_norm, n_members) — writable to any store
    * (DocStore collection, parquet dir) and loadable by
    * `$vectorSearch`'s `index` option, which collects the ≤nCells rows
    * back and probes WITHOUT re-running the per-query corpus seeding
    * pass. n_members rides along so the query side can turn
    * numCandidates into a probe count with no extra corpus count job. */
  def centroidFrame(index: IvfIndex): DataFrame = {
    val spark = index.assigned.sparkSession
    val counts = index.assigned.groupBy(col("cell_id"))
      .agg(count(lit(1)).as("n_members"))
    val cents = spark.createDataFrame(
      java.util.Arrays.asList(index.centroidRows: _*), index.seedSchema)
      .select(col("cell_id"), col("__cv").as("centroid"))
    cents.join(counts, Seq("cell_id"), "left")
      .select(col("cell_id"), col("centroid"),
        coalesce(col("n_members"), lit(0L)).as("n_members"))
      .orderBy(col("cell_id"))
  }

  /** The on-disk IVF layout a 100 TB deployment actually uses: the
    * corpus vectors PARTITIONED BY CELL in a graftdocs collection
    * (centroids in a sibling collection), so an nProbe query OPENS only
    * the probed cells' directories — partition pruning turns the probe
    * bound from a filter into an I/O bound. Vector norms are
    * precomputed into the layout: the query never re-reads a vector it
    * does not score. */
  def writeIvfPartitioned(store: graft.sinks.DocStore, index: IvfIndex,
                          name: String): Unit = {
    store.overwritePartitions(
      index.assigned.select(col("cell_id").cast("string").as("cell"),
        col("match_id").as(index.idCol),
        col("__mv").as(index.vecCol), col("__mn").as("vnorm")),
      name, Seq("cell"))
    store.write(centroidFrame(index), name + "_centroids")
  }

  /** Ingest-side maintenance of the partitioned layout: fold one new
    * batch of vectors in, REWRITING ONLY the partitions whose cells the
    * batch hits (the overwritePartitions contract — a day's ingest
    * never rewrites the year). Centroids stay fixed — the IVF
    * maintenance contract: assignment is a snapshot of the trained
    * quantizer, re-training is a rebuild. REPLAY-SAFE: the rewrite
    * anti-joins existing rows on the batch's ids first, so re-running
    * the same batch (streaming replay after a crash mid-commit, or a
    * batch overlapping prior content) converges to the same final
    * state — upsert, not duplication; n_members recounts the touched
    * cells from the folded data (partition-pruned), so it also
    * self-heals on replay. */
  def foldIvfPartitionedBatch(store: graft.sinks.DocStore, name: String,
                              batch: DataFrame, idCol: String = "vec_id",
                              vecCol: String = "embedding",
                              tags: Map[String, String] = Map.empty): Unit = {
    // cell_id-ascending order == centroid matrix index order: the
    // nearest_cell lowest-index tie break must agree with buildIvf's
    val centRows = store.read(name + "_centroids")
      .orderBy("cell_id").select(col("cell_id"), col("centroid"))
      .limit(65537).collect()
    require(centRows.length <= 65536,
      s"foldIvfPartitionedBatch: '$name' exceeds 65536 cells")
    val cellIds = array(centRows.map(r => lit(r.get(0))).toIndexedSeq: _*)
    val assigned = batch
      .select(col(idCol), col(vecCol).cast("array<double>").as(vecCol),
        norm(col(vecCol)).as("vnorm"))
      .withColumn("__ci", nearestCell(col(vecCol),
        centRows.map(_.getSeq[Double](1)).toIndexedSeq))
      .where(col("__ci").isNotNull)
      .withColumn("cell", element_at(cellIds, col("__ci") + 1).cast("string"))
      .drop("__ci")
    val perCell = assigned.groupBy("cell").agg(count(lit(1)).as("__add"))
      .collect()
    if (perCell.nonEmpty) {
      val touched = perCell.map(_.getString(0))
      // REPLAY-SAFE fold: overwritePartitions swaps touched leaves one
      // by one (tags land last), so a crash mid-commit replays the
      // batch against partially-folded cells. An anti-join on the
      // batch's own ids makes the rewrite idempotent — whatever subset
      // of leaves the crashed attempt swapped, re-running produces the
      // identical final content (the NearDupIndex epoch-fold property,
      // achieved here by id instead of by epoch because cells, not
      // batches, are the partition key).
      val batchIds = assigned.select(col(idCol)).distinct()
      val existing = store.read(name).where(col("cell").isin(touched: _*))
        .join(batchIds, Seq(idCol), "left_anti")
      store.overwritePartitions(
        existing.unionByName(assigned.select(existing.columns.map(col): _*)),
        name, Seq("cell"), tags)
      // n_members for the touched cells recounts from the just-folded
      // partitions (partition-pruned — O(touched), never a full index
      // scan) so a replayed fold cannot double-increment
      val recount = store.read(name).where(col("cell").isin(touched: _*))
        .groupBy("cell").agg(count(lit(1)).as("__n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      store.write(store.read(name + "_centroids")
        .withColumn("n_members",
          coalesce(element_at(typedlit(recount), col("cell_id").cast("string")),
            col("n_members")))
        .select("cell_id", "centroid", "n_members"),
        name + "_centroids")
    }
  }

  /** Probe-side of the partitioned layout: rank the stored centroids
    * against the query vector (driver-side over ≤nCells rows), read
    * ONLY the nProbe best cells' partitions, score, top-k. Same score
    * convention as `$vectorSearch` ((cos+1)/2 rounded to 6). */
  def ivfPartitionedTopK(store: graft.sinks.DocStore, name: String,
                         qvec: Seq[Double], k: Int, nProbe: Int,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val cents = store.read(name + "_centroids")
      .select(col("cell_id").cast("string"), col("centroid")).limit(65537).collect()
    require(cents.length <= 65536,
      s"ivfPartitionedTopK: centroid collection '$name' exceeds 65536 cells")
    val qn = math.sqrt(qvec.map(x => x * x).sum)
    val ranked = cents.map { r =>
      val c = r.getSeq[Double](1)
      val cn = math.sqrt(c.map(x => x * x).sum)
      val cos = if (cn == 0.0 || qn == 0.0) -2.0
                else c.zip(qvec).map { case (a, b) => a * b }.sum / (cn * qn)
      (r.getString(0), cos)
    }.sortBy { case (id, cos) => (-cos, id) }
    val probed = ranked.take(nProbe).map(_._1)
    val qArr = array(qvec.map(lit): _*)
    store.read(name).where(col("cell").isin(probed: _*))
      .select(col(idCol),
        round((rawDot(col(vecCol).cast("array<double>"), qArr) /
          (col("vnorm") * lit(qn)) + 1) / 2, 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Document clustering as a first-class output: the IVF machinery's
    * cell assignment IS a spherical k-means clustering of the corpus
    * (deterministic hash-ordered seeds, optional Lloyd refinement), so
    * expose it directly — (id, cluster_id) per indexable row, cluster_id
    * being the seed row's id. Topic bucketing, per-cluster sampling
    * caps, and SemDeDup all consume this shape. Map-only after the
    * bounded seed collect; `portableSeed` keeps it oracle-checkable. */
  def clusterAssignments(corpus: DataFrame, nCells: Int,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding",
                         lloydIters: Int = 0,
                         portableSeed: Boolean = false): DataFrame =
    buildIvf(corpus, nCells, idCol, vecCol, lloydIters,
      persistIndex = false, portableSeed = portableSeed)
      .assigned.select(col("match_id").as(idCol), col("cell_id"))

  /** Euclidean k-means (Lloyd) over an embedding column — the corpus-
    * bucketing workhorse (topic balancing, diversity sampling, cluster-
    * then-curate pipelines) as a first-class, oracle-checkable operator
    * alongside the spherical refinement the IVF index uses internally.
    *
    * Scale shape: assignment is MAP-ONLY via the same codegen'd
    * `nearest_cell` argmax —
    *
    *   argmin_c ‖v−c‖² = argmax_c (v·c − ‖c‖²/2)
    *
    * realized by augmenting each centroid with a bias element −‖c‖²/2
    * and each vector with a constant 1, so Euclidean nearest reuses the
    * dot-product kernel unchanged. The centroid matrix ships as ONE
    * literal; the corpus never shuffles whole vectors; per-iteration
    * means collect as k single rows (one mean array per cluster — dim
    * column-wise partial sums, [[clusterMeans]]; centroids are driver
    * constants, the same contract as the IVF codebooks). Seeds are the k lowest-id
    * vectors (deterministic); empty clusters keep their previous
    * centroid; nearest_cell's strict `>` breaks ties toward the lowest
    * cluster index. Output: (cluster, n, c_norm) — final-assignment
    * sizes plus updated-centroid norms rounded to 6. */
  def kmeansLloyd(df: DataFrame, idCol: String, vecCol: String,
                  k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters > 0, s"kmeansLloyd: k=$k iters=$iters must be positive")
    // persisted: the seed collect, every iteration's means job, and the
    // final assignment aggregate all read it — without this the source
    // is re-scanned iters+2 times (the house pattern; the bench/verify
    // harnesses drop persisted intermediates between queries)
    val corpus = df.where(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // seed guard (pqTrain's rationale): a null-element seed NPEs the
    // driver building augMatrix; a wrong-dimension seed builds a ragged
    // matrix that silently nulls every assignment → empty result
    var centroids: Array[Array[Double]] = corpus
      .where(!exists(col("__v"), x => x.isNull))
      .orderBy(col(idCol)).limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    require(centroids.length == k, s"kmeansLloyd: only ${centroids.length} seed rows for k=$k")
    require(centroids.map(_.length).distinct.length == 1,
      "kmeansLloyd: seed vectors disagree on dimension")
    def augMatrix: Column = typedlit(centroids.toIndexedSeq.map(c =>
      (c :+ (-0.5 * c.map(x => x * x).sum)).toIndexedSeq))
    val augVec = concat(col("__v"), array(lit(1.0)))
    var lastAssigned: DataFrame = null
    val dim = centroids(0).length
    for (_ <- 1 to iters) {
      val assigned = corpus
        .withColumn("__cl", graftFn("nearest_cell", augVec, augMatrix))
        .where(col("__cl").isNotNull)
      lastAssigned = assigned
      val means = clusterMeans(assigned, "__cl", dim)
      centroids = centroids.zipWithIndex.map { case (c, j) => means.getOrElse(j, c) }
    }
    val normCol = typedlit(centroids.toIndexedSeq
      .map(c => math.sqrt(c.map(x => x * x).sum)))
    lastAssigned
      .groupBy(col("__cl").cast("long").as("cluster"))
      .agg(count(lit(1)).as("n"))
      .withColumn("c_norm", round(element_at(normCol, (col("cluster") + 1).cast("int")), 6))
      .orderBy("cluster")
  }

  /** Query a built IVF index: score queries against the broadcast
    * centroids, probe the nProbe best cells, brute-force only those. */
  def ivfQuery(index: IvfIndex, queries: DataFrame, k: Int,
               nProbe: Int = 4): DataFrame = {
    val idCol = index.idCol; val vecCol = index.vecCol
    // query side is small: score against all broadcast centroids, keep
    // the nProbe best cells per query (window over the query set only)
    val probes = {
      val centroids = broadcast(queries.sparkSession.createDataFrame(
        java.util.Arrays.asList(index.centroidRows: _*), index.seedSchema))
      val scored = queries
        .select(col(idCol).as("query_id_tmp"),
          col(vecCol).cast("array<double>").as("__v"), norm(col(vecCol)).as("__n"))
        .crossJoin(centroids)
        .withColumn("__sim", rawDot(col("__v"), col("__cv")) / (col("__n") * col("__cn")))
      val w = Window.partitionBy(col("query_id_tmp"))
        .orderBy(col("__sim").desc, col("cell_id").asc)
      scored.withColumn("__r", row_number().over(w)).where(col("__r") <= nProbe)
        .select(col("query_id_tmp"), col("cell_id"))
    }
    val probed = queries.select(col(idCol).as("query_id_tmp"), col(vecCol))
      .join(probes.select("query_id_tmp", "cell_id"), "query_id_tmp")
      .select(col("query_id_tmp").as("query_id"),
        col(vecCol).cast("array<double>").as("__qv"),
        norm(col(vecCol)).as("__qn"), col("cell_id"))
    val scored = probed.join(index.assigned, "cell_id")
      .where(col("query_id") =!= col("match_id"))
      .withColumn("cos",
        round(rawDot(col("__qv"), col("__mv")) / (col("__qn") * col("__mn")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("match_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("match_id"), col("cos"), col("rnk").cast("long").as("rnk"))
  }

  /** Map-only nearest-centroid id (0-based index into `centroids`) for
    * a vector column — the public face of the `nearest_cell` native
    * expression for callers holding raw (unnormalized) centroid rows.
    * Ties keep the lowest index; null/wrong-dim vectors → null. */
  def nearestCell(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val normed = centroids.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0.0) c.map(_ => 0.0) else c.map(_ / n)
    }
    graftFn("nearest_cell", vec.cast("array<double>"), typedlit(normed))
  }

  // ---- Product quantization (IVF-PQ's memory half) ---------------------

  /** A trained PQ codebook: `books(s)(j)` is codeword j of subspace s
    * (dsub doubles). m·k·dsub doubles total — a driver-side constant
    * that ships to executors as one literal, like the IVF centroid
    * matrix. */
  final case class PqCodebook(books: Seq[Seq[Seq[Double]]]) {
    val m: Int = books.length
    val dsub: Int = books.head.head.length
    require(books.forall(_.forall(_.length == dsub)),
      "ragged codebook: all codewords must have dsub dims")
  }

  /** Train a PQ codebook from the corpus: the `codes` rows with the
    * smallest portable hash of their id (the deterministic hash-ordered
    * sample buildIvf uses, md5-based so the DuckDB oracle rebuilds the
    * identical codebook), each split into `m` contiguous subvectors.
    * One TakeOrdered pass over the corpus — no k-means iterations; like
    * the IVF seeds, Lloyd refinement is a recall upgrade the caller can
    * bolt on, at the price of oracle checkability. */
  def pqTrain(corpus: DataFrame, m: Int = 8, codes: Int = 16,
              idCol: String = "vec_id", vecCol: String = "embedding",
              dim: Int = 64): PqCodebook = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    // dimension filter BEFORE the hash-ordered limit: a malformed
    // vector inside the sample window must not shrink the codebook and
    // shift codeword indices out from under the oracle's re-derivation
    val seeds = corpus
      .where(size(col(vecCol).cast("array<double>")) === dim)
      .orderBy(Dedup.portableHash60(col(idCol).cast("string")).asc, col(idCol).asc)
      .limit(codes)
      .select(col(vecCol).cast("array<double>").as("__v"))
      .collect().map(_.getSeq[Double](0))
    require(seeds.nonEmpty, "no full-dimension seed vectors in corpus")
    PqCodebook((0 until m).map(s =>
      seeds.toIndexedSeq.map(v => v.slice(s * dsub, (s + 1) * dsub))))
  }

  /** Lloyd (k-means) refinement of a PQ codebook: each iteration
    * PQ-encodes the corpus against the current books (map-only,
    * `pq_encode`) and re-centers every codeword on the element-wise
    * mean of the subvectors it captured — exactly `lloydRefine`'s
    * shape, run per subspace. The means shuffle as exploded
    * (subspace, code, dim, value) scalars and return as m·k·dsub tiny
    * rows; empty codewords keep their previous value. Total squared
    * distortion is non-increasing per iteration (standard k-means
    * monotonicity — spec-pinned). Refined books trade away DuckDB
    * oracle parity (the oracle can't iterate k-means), so the gate
    * entry stays on the hash-sampled codebook; use this for recall. */
  def pqRefine(corpus: DataFrame, cb: PqCodebook, iters: Int,
               vecCol: String = "embedding"): PqCodebook = {
    var books = cb.books
    val dsub = cb.dsub
    for (_ <- 1 to iters) {
      val means = corpus
        .select(col(vecCol).cast("array<double>").as("__v"))
        .withColumn("__codes", graftFn("pq_encode", col("__v"), typedlit(books)))
        .where(col("__codes").isNotNull)
        .select(col("__v"), posexplode(col("__codes")).as(Seq("__s", "__j")))
        .select(col("__s"), col("__j"),
          posexplode(slice(col("__v"), col("__s") * dsub + 1, lit(dsub)))
            .as(Seq("__t", "__x")))
        .groupBy("__s", "__j", "__t").agg(avg(col("__x")).as("__m"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case (k, rs) =>
          k -> rs.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
        }
      books = books.zipWithIndex.map { case (sub, s) =>
        sub.zipWithIndex.map { case (cw, j) => means.getOrElse((s, j), cw) }
      }
    }
    PqCodebook(books)
  }

  /** PQ-encode the corpus: each vector → m small codeword indexes
    * (`pq_encode` native expression against the literal codebook).
    * MAP-ONLY — at 100 TB this pass writes the m-bytes-per-vector
    * index (32× smaller than raw float vectors at dim 64 / m 8) that
    * all downstream ANN queries read instead of the embeddings. Rows
    * with unindexable vectors are dropped, like buildIvf. */
  def pqEncode(corpus: DataFrame, cb: PqCodebook,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol),
        graftFn("pq_encode", col(vecCol).cast("array<double>"),
          typedlit(cb.books)).as("pq_codes"))
      .where(col("pq_codes").isNotNull)

  /** Approximate top-k by asymmetric PQ distance (ADC): full-precision
    * query vs the corpus's PQ reconstruction. The corpus side of the
    * broadcast-join carries ONLY (id, m codes) — the point of PQ: the
    * scoring scan never touches raw corpus vectors. Ranked by rounded
    * ADC asc (smaller = closer), id tiebreak — fully deterministic and
    * DuckDB-checkable. Returns (query_id, match_id, adc, rnk). */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             m: Int = 8, codes: Int = 16,
             qId: String = "vec_id", cId: String = "vec_id",
             vecCol: String = "embedding", dim: Int = 64,
             lloydIters: Int = 0): DataFrame = {
    val cb0 = pqTrain(corpus, m, codes, cId, vecCol, dim)
    val cb = if (lloydIters <= 0) cb0
             else pqRefine(corpus, cb0, lloydIters, vecCol)
    val enc = pqEncode(corpus, cb, cId, vecCol)
      .select(col(cId).as("match_id"), col("pq_codes"))
    val q = broadcast(queries.select(col(qId).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv")))
    val scored = enc.crossJoin(q)
      .where(col("query_id") =!= col("match_id"))
      .withColumn("adc", round(
        graftFn("pq_adc", col("__qv"), col("pq_codes"), typedlit(cb.books)), 6))
    val w = Window.partitionBy("query_id").orderBy(col("adc").asc, col("match_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("match_id"), col("adc"),
        col("rnk").cast("long").as("rnk"))
  }

  /** IVF-PQ top-k (Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011): the IVF half prunes WHICH rows are
    * scored (each query touches ~nProbe/nCells of the corpus); the PQ
    * half shrinks WHAT is scored (m codeword bytes per row instead of
    * 4·dim). Query-time plans touch only (id, cell, codes) — raw corpus
    * vectors appear in the build passes and nowhere else, which is what
    * makes the index RAM-resident at billions of vectors. Exhaustive
    * probing (nProbe ≥ nCells) reduces exactly to pqTopK (spec-pinned),
    * mirroring ivfTopK's brute-force equivalence. Returns
    * (query_id, match_id, adc, rnk) — adc ascending = nearest first. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                nCells: Int = 16, nProbe: Int = 4,
                m: Int = 8, codes: Int = 16,
                qId: String = "vec_id", cId: String = "vec_id",
                vecCol: String = "embedding", dim: Int = 64,
                portableSeed: Boolean = false): DataFrame = {
    val cb = pqTrain(corpus, m, codes, cId, vecCol, dim)
    val index = buildIvf(corpus, nCells, cId, vecCol, lloydIters = 0,
      persistIndex = false, portableSeed = portableSeed)
    // the stored index: cell assignment + PQ codes, one map-only pass
    val enc = index.assigned.select(col("match_id"), col("cell_id"),
        graftFn("pq_encode", col("__mv"), typedlit(cb.books)).as("pq_codes"))
      .where(col("pq_codes").isNotNull)
    // probe the nProbe best cells per query (window over the small
    // query×centroid product only, as ivfQuery)
    val centroids = broadcast(queries.sparkSession.createDataFrame(
      java.util.Arrays.asList(index.centroidRows: _*), index.seedSchema))
    val cellScores = queries
      .select(col(qId).as("query_id"),
        col(vecCol).cast("array<double>").as("__qv"), norm(col(vecCol)).as("__qn"))
      .crossJoin(centroids)
      .withColumn("__sim", rawDot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("__sim").desc, col("cell_id").asc)
    val probes = cellScores.withColumn("__r", row_number().over(wp))
      .where(col("__r") <= nProbe)
      .select(col("query_id"), col("__qv"), col("cell_id"))
    val scored = probes.join(enc, "cell_id")
      .where(col("query_id") =!= col("match_id"))
      .withColumn("adc", round(
        graftFn("pq_adc", col("__qv"), col("pq_codes"), typedlit(cb.books)), 6))
    val w = Window.partitionBy("query_id").orderBy(col("adc").asc, col("match_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("match_id"), col("adc"),
        col("rnk").cast("long").as("rnk"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR 2009) —
    * the standard hybrid-retrieval combiner (it is what Mongo's
    * $rankFusion computes): fused(d) = Σ_systems 1/(k + rank_s(d)),
    * summed over every ranking that returned d. Inputs are ranking
    * frames shaped (queryCol, idCol, rankCol) — e.g. bruteForceTopK /
    * pqTopK / bm25 output — already top-k-bounded per query, so the
    * union + one keyed aggregation is trivially small at any corpus
    * scale: fusion cost is a function of k·systems·queries, never of
    * the corpus. Returns (queryCol, idCol, rrf, rnk ≤ topK), fully
    * deterministic (rrf rounded to 6, id tiebreak). */
  def rrfFuse(rankings: Seq[DataFrame], topK: Int, k: Int = 60,
              queryCol: String = "query_id", idCol: String = "match_id",
              rankCol: String = "rnk"): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val contribs = rankings.map(_.select(col(queryCol), col(idCol),
      (lit(1.0) / (lit(k.toDouble) + col(rankCol).cast("double"))).as("__c")))
    val fused = contribs.reduce(_.unionByName(_))
      .groupBy(col(queryCol), col(idCol))
      .agg(round(sum(col("__c")), 6).as("rrf"))
    val w = Window.partitionBy(queryCol)
      .orderBy(col("rrf").desc, col(idCol).asc)
    fused.withColumn("__r", row_number().over(w))
      .where(col("__r") <= topK)
      .select(col(queryCol), col(idCol), col("rrf"),
        col("__r").cast("long").as("rnk"))
  }

  /** Exact cosine pairs over a bounded query slice (oracle-checkable
    * ground truth for the approximate variants). */
  def cosinePairs(left: DataFrame, right: DataFrame, threshold: Double,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val l = broadcast(left.select(col(idCol).as("id_a"),
      col(vecCol).cast("array<double>").as("__va"), norm(col(vecCol)).as("__na")))
    val r = right.select(col(idCol).as("id_b"),
      col(vecCol).cast("array<double>").as("__vb"), norm(col(vecCol)).as("__nb"))
    r.crossJoin(l).where(col("id_a") < col("id_b"))
      .withColumn("cos", round(rawDot(col("__va"), col("__vb")) / (col("__na") * col("__nb")), 6))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Matryoshka-style embedding truncation (Kusupati et al. 2022,
    * arXiv:2205.13147): keep the first `dim` components and L2-renorm —
    * the standard way to trade recall for a `full/dim`× cut in vector
    * storage and ANN cost when embeddings were trained nested.
    * [[truncStats]] returns struct(norm_t, energy) where `energy` is
    * the retained-variance ratio ‖v₁..d‖²/‖v‖² (the quality signal for
    * choosing d); [[renorm]] divides the prefix by a PRE-MATERIALIZED
    * norm column. Two steps on purpose: a norm expression captured
    * inside the per-element lambda would re-run its O(d) fold per
    * element (the quadratic-capture bug class QuantInt8's Scaladoc
    * documents) — materialize truncStats into a column, then renorm
    * against its field. Both are pure map work, rounded to 6 so an
    * external engine recomputes bit-equal. */
  def truncStats(vec: Column, dim: Int): Column = {
    val sq = (x: Column) => x.cast("double") * x.cast("double")
    val e2 = aggregate(slice(vec, 1, dim), lit(0.0), (acc, x) => acc + sq(x))
    val f2 = aggregate(vec, lit(0.0), (acc, x) => acc + sq(x))
    struct(
      round(sqrt(e2), 6).as("norm_t"),
      round(when(f2 > 0.0, e2 / f2).otherwise(lit(0.0)), 6).as("energy"))
  }

  /** Renormed `dim`-prefix against a pre-materialized norm column (see
    * [[truncStats]]); zero norms renorm to zeros. */
  def renorm(vec: Column, dim: Int, norm: Column): Column =
    transform(slice(vec, 1, dim), x =>
      round(when(norm > 0.0, x.cast("double") / norm).otherwise(lit(0.0)), 6))
}
