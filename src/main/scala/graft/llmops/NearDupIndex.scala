package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Persistable MinHash-LSH near-duplicate index: the band buckets and
  * hashed shingle sets of an already-ingested corpus, stored as a
  * collection so that each NEW batch can be near-dedup'd against the
  * whole history WITHOUT rescanning it — the incremental-ingest twin of
  * [[Dedup.minhashPairs]] (one-shot, corpus-vs-itself), and the
  * near-dup member of the index-lifecycle family (TextIndex for
  * `$search`, VectorIndex for `$vectorSearch`).
  *
  * Layout (single collection, one row per entry):
  *   - kind='band': (doc_id, bucket) — the doc's `bands` LSH bucket
  *     keys; the band index is folded into the bucket hash, so one
  *     equality column joins all bands at once.
  *   - kind='doc':  (doc_id, hs) — the SORTED HASHED shingle set
  *     (array<long>), the verification payload: exact jaccard runs as
  *     one merge pass over sorted longs, shipping 8 bytes per shingle
  *     instead of n-gram text (same contract as minhashPairs).
  *   - kind='meta': (param = "shingleN/numHashes/bands") — the LSH
  *     geometry; a query/update with different parameters would
  *     silently lose recall, so it REFUSES loudly instead.
  *
  * Scale shape: build is one map-only pass per doc (the
  * `minhash_bands` kernel — no explode, no aggregation, no shuffle);
  * `queryBatch` touches index rows
  * matching the BATCH's buckets only (hash equi-join, never a corpus
  * scan), so per-ingest cost is O(|batch|·bands + matched candidates);
  * update is a pure union (per-doc rows of disjoint ids) — the index
  * never rebuilds; remove is an anti-join. The skew guard drops
  * degenerate buckets (> maxBucket members) exactly like the one-shot
  * path — boilerplate-heavy corpora otherwise make one bucket
  * quadratic. */
object NearDupIndex {

  private def param(shingleN: Int, numHashes: Int, bands: Int): String =
    s"$shingleN/$numHashes/$bands"

  /** Schema-metadata key carrying the LSH geometry on freshly-built
    * frames (the jobless fast path of [[geometry]]). */
  private val ParamMetaKey = "graft.neardup.param"

  /** Per-doc (doc_id, hs) with hs = sorted xxhash64 shingle set.
    * Id contract (same as TextIndex.build): ids must cast losslessly to
    * long. A silently-nulled cast (e.g. string oids) would collapse
    * every such doc into one null signature group and drop them from
    * the dedup joins — silent recall loss — so the cast fails loudly
    * instead. */
  private def hashedDocs(df: DataFrame, idCol: String, textCol: String,
                         shingleN: Int): DataFrame = {
    val castId = col(idCol).cast("long")
    // two silent-loss shapes: a cast that NULLS (string oids → one null
    // signature group) and a cast that TRUNCATES (12.5 and 12.4 both →
    // 12, colliding distinct docs) — fractional id types get a
    // round-trip value check on top of the null check
    val fractional = df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType |
           _: org.apache.spark.sql.types.DecimalType => true
      case _ => false
    }
    val lossy =
      if (fractional)
        (col(idCol).isNotNull && castId.isNull) ||
          !(castId.cast("double") <=> col(idCol).cast("double"))
      else col(idCol).isNotNull && castId.isNull
    val guarded = when(lossy,
      raise_error(concat(
        lit(s"NearDupIndex: id column '$idCol' value '"),
        col(idCol).cast("string"),
        lit("' does not cast losslessly to long"))).cast("long"))
      .otherwise(castId)
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    // fused tokenize → shingle → xxhash64 → sort pass (HashedShingles;
    // byte-identical to the HOF chain it replaces, spec-pinned)
    df.select(guarded.as("doc_id"),
      call_function("hashed_shingles", col(textCol), lit(shingleN))
        .as("hs"))
  }

  /** (doc_id, bucket) band rows from hashed docs: one map-only
    * `minhash_bands` pass per doc (band keys computed in a single
    * array traversal), exploded to one row per band. */
  private def bandRows(docs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    // one map-only pass per doc (functions.MinhashBands, byte-identical
    // buckets to the explode → min-aggregation → band-hash plan it
    // replaces — same kernel and rationale as Dedup.minhashPairs)
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    docs.select(col("doc_id"),
      explode(call_function("minhash_bands", col("hs"),
        lit(numHashes), lit(bands))).as("bucket"))
  }

  def build(df: DataFrame, idCol: String, textCol: String,
            shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val docs = hashedDocs(df, idCol, textCol, shingleN)
    val nullHs = lit(null).cast("array<long>")
    val nullL = lit(null).cast("long")
    val nullS = lit(null).cast("string")
    val bandPart = bandRows(docs, numHashes, bands)
      .select(lit("band").as("kind"), col("doc_id"), col("bucket"),
        nullHs.as("hs"), nullS.as("param"))
    val docPart = docs
      .select(lit("doc").as("kind"), col("doc_id"), nullL.as("bucket"),
        col("hs"), nullS.as("param"))
    val meta = df.sparkSession.range(1)
      .select(lit("meta").as("kind"), nullL.as("doc_id"), nullL.as("bucket"),
        nullHs.as("hs"), lit(param(shingleN, numHashes, bands)).as("param"))
    val unioned = bandPart.unionByName(docPart).unionByName(meta)
    // geometry rides the schema too (column metadata on `param`): a
    // freshly-built frame answers `geometry` with ZERO jobs — the meta
    // ROW stays the durable form (schema metadata does not survive a
    // store round-trip; stored indexes fall back to the pruned collect)
    val paramMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString(ParamMetaKey, param(shingleN, numHashes, bands)).build()
    val out = unioned.select(col("kind"), col("doc_id"), col("bucket"),
      col("hs"), col("param").as("param", paramMeta))
    // the hashed corpus feeds BOTH union branches (band rows + stored
    // doc rows): cache it lazily so the first action materializing the
    // index (a store write, or cache population when the caller persists
    // the index frame) tokenizes the corpus ONCE, and release it right
    // after (CacheScope). A metadata-only probe (geometry) prunes the
    // union branches and never populates — releasing there costs
    // nothing, because nothing was built.
    graft.operators.CacheScope.persistUntil(out, docs)
    out
  }

  /** The stored LSH geometry; refuses a geometry-free frame. A
    * freshly-built frame answers from schema metadata with no job at
    * all (so building a plan over an unmaterialized index triggers
    * nothing); a store-loaded index pays one filtered collect — the
    * kind='meta' predicate pushes to the scan, so this reads metadata,
    * not the band table. */
  private def geometry(index: DataFrame): (Int, Int, Int) = {
    val fromSchema = index.schema.fields.find(_.name == "param")
      .filter(_.metadata.contains(ParamMetaKey))
      .map(_.metadata.getString(ParamMetaKey))
    val p = fromSchema.orElse(
      index.where(col("kind") === "meta").select("param")
        .collect().headOption.map(_.getString(0))).getOrElse(
        throw new IllegalArgumentException(
          "NearDupIndex: frame has no meta row — not a near-dup index"))
    p.split("/") match {
      case Array(a, b, c) => (a.toInt, b.toInt, c.toInt)
      case _ => throw new IllegalArgumentException(
        s"NearDupIndex: malformed geometry '$p'")
    }
  }

  /** Near-duplicate pairs of a NEW batch against the indexed corpus:
    * (fresh_id, index_id, jaccard) with jaccard ≥ threshold (rounded to
    * 6). The corpus contributes only the index rows the batch's own
    * buckets touch; it is never re-tokenized or rescanned. */
  def queryBatch(index: DataFrame, fresh: DataFrame, idCol: String,
                 textCol: String, threshold: Double = 0.8,
                 maxBucket: Int = 1000): DataFrame = {
    val (shingleN, numHashes, bands) = geometry(index)
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    // cached lazily with release after the caller's first action
    // (CacheScope): the batch is tokenized ONCE and its band rows
    // aggregated ONCE per call even though each has two consumers
    // (touched-buckets probe + candidate join; signature agg +
    // verification join). Inside foreachBatch the micro-batch's sink
    // write is that first action, so per-batch entries release at batch
    // end — no stream-executor pinning.
    val freshDocs = hashedDocs(fresh, idCol, textCol, shingleN)
    val freshBands = bandRows(freshDocs, numHashes, bands)
      .select(col("doc_id").as("fresh_id"), col("bucket"))
    // skew guard on the INDEX side: a bucket every boilerplate page
    // shares would fan each batch doc out to the whole corpus. The
    // membership count runs over the TOUCHED buckets only (semi-join on
    // the batch's own distinct bucket keys first — exact for those
    // buckets, since the join keeps every index row of a touched
    // bucket), so per-ingest window state is bounded by batch fan-out,
    // never the index: the O(|batch|·bands + candidates) contract.
    val idxBands = index.where(col("kind") === "band")
      .select(col("doc_id").as("index_id"), col("bucket"))
      .join(freshBands.select("bucket"), Seq("bucket"), "left_semi")
      .withColumn("__bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("bucket")))
      .where(col("__bn") <= maxBucket).drop("__bn")
    val cand = freshBands.join(idxBands, Seq("bucket"))
      .where(col("fresh_id") =!= col("index_id"))
      .select("fresh_id", "index_id").distinct()
    val out = cand
      .join(freshDocs.select(col("doc_id").as("fresh_id"), col("hs").as("__hf")),
        "fresh_id")
      .join(index.where(col("kind") === "doc")
          .select(col("doc_id").as("index_id"), col("hs").as("__hi")),
        "index_id")
      .withColumn("jaccard",
        round(call_function("jaccard_sim_long", col("__hf"), col("__hi")), 6))
      .where(col("jaccard") >= threshold)
      .select("fresh_id", "index_id", "jaccard")
    graft.operators.CacheScope.persistUntil(out, freshDocs, freshBands)
    out
  }

  /** Fold a new batch in: per-doc rows are independent facts, so the
    * union IS the rebuild (update(build(A), B) ≡ build(A ∪ B) row for
    * row) — no stats to merge, nothing recomputes. Callers dedup ids
    * upstream (re-ingesting an id would double its rows, same contract
    * as the reference's insert path). */
  def update(index: DataFrame, newDocs: DataFrame, idCol: String,
             textCol: String): DataFrame = {
    val (shingleN, numHashes, bands) = geometry(index)
    val delta = build(newDocs, idCol, textCol, shingleN, numHashes, bands)
    index.unionByName(delta.where(col("kind") =!= "meta"))
  }

  /** Drop documents from the index (corpus-free, like TextIndex.remove:
    * the ids' own rows carry everything deletion needs). Exactly
    * rebuild-equivalent: remove(build(A), B) ≡ build(A \ B). */
  def remove(index: DataFrame, removedIds: DataFrame, idCol: String): DataFrame = {
    val ids = removedIds.select(col(idCol).cast("long").as("__rid")).distinct()
    index.join(ids, index("doc_id") === col("__rid"), "left_anti")
  }

  // ---- epoch-partitioned store layout (the at-scale fold) ----------------
  //
  // The single-collection fold above rewrites the whole collection per
  // ingest (`store.write(update(...))`) — fine for a bounded index,
  // wrong at crawl scale where a year of hourly folds would each
  // rewrite the year. The partitioned layout stores the index as a
  // graftdocs collection hive-partitioned by INGEST EPOCH: build lands
  // in `epoch=0`, each fold writes ONLY its own `epoch=N` leaf via the
  // per-partition staged swap (DocStore.overwritePartitions), so fold
  // cost is O(|batch|) in data written and every prior epoch's files
  // stay byte-identical. Reads union the partitions (hive discovery);
  // queryBatch is unchanged — its probe is a bucket equi-join, which
  // never cared how the rows were filed.

  /** The epoch partition column (string-typed, like the IVF layout's
    * `cell`: hive partition values are strings on disk). */
  val EpochCol = "epoch"

  /** Store a freshly built index epoch-partitioned (everything lands in
    * `epoch=0`, including the meta row). The LSH geometry is ALSO
    * committed as a tag so per-fold lookups are one O(1) tag read, not
    * an index scan over thousands of epoch partitions (the fold
    * contract is O(batch)). */
  def writePartitioned(store: graft.sinks.DocStore, index: DataFrame,
                       name: String,
                       tags: Map[String, String] = Map.empty): Unit = {
    val (a, b, c) = geometry(index) // 1-row meta branch, constant-folded
    store.overwritePartitions(index.withColumn(EpochCol, lit("0")),
      name, Seq(EpochCol), tags + ("neardup-geometry" -> param(a, b, c)))
  }

  /** Stored-index geometry: O(1) tag fast path, meta-row scan fallback
    * for externally-written layouts. */
  private def geometryOf(store: graft.sinks.DocStore, name: String)
      : (Int, Int, Int) =
    store.readTag(name, "neardup-geometry").map(_.split("/") match {
      case Array(a, b, c) => (a.toInt, b.toInt, c.toInt)
      case _ => throw new IllegalArgumentException(
        s"NearDupIndex: malformed geometry tag on '$name'")
    }).getOrElse(geometry(store.read(name)))

  /** Fold one ingest batch into an epoch-partitioned index: builds the
    * batch's own band/doc rows and writes them as partition
    * `epoch=<epoch>` ONLY — history partitions are never opened, read,
    * or rewritten. Re-folding the SAME epoch replaces that partition
    * wholesale (the staged-swap contract), which is what makes the
    * streaming replay protocol idempotent. Batches are assumed
    * id-disjoint from prior content, like [[update]]. `epoch` must be
    * positive — 0 is the build partition. */
  def foldPartitionedBatch(store: graft.sinks.DocStore, name: String,
                           batch: DataFrame, epoch: Long,
                           idCol: String, textCol: String,
                           tags: Map[String, String] = Map.empty): Unit = {
    require(epoch > 0, "epoch 0 is the build partition")
    val (shingleN, numHashes, bands) = geometryOf(store, name)
    val delta = build(batch, idCol, textCol, shingleN, numHashes, bands)
      .where(col("kind") =!= "meta")
      .withColumn(EpochCol, lit(epoch.toString))
    store.overwritePartitions(delta, name, Seq(EpochCol), tags)
  }

  /** Epoch compaction — the OPTIMIZE verb of the fold layout: a year of
    * hourly folds leaves thousands of tiny epoch partitions, and every
    * query pays their file-listing + small-file overhead. Rewrites the
    * WHOLE index into `epoch=0` (one explicit full rewrite — exactly
    * what incremental folds avoid paying per batch, scheduled here on
    * the operator's terms) and drops the emptied epoch directories.
    * Rows, geometry, and commit tags survive; folds continue from any
    * later epoch. */
  def compactEpochs(store: graft.sinks.DocStore, name: String): Unit = {
    val tags = store.listTags(name)
    // whole-collection staged swap (NOT per-leaf overwritePartitions):
    // rows move between partitions here, so a per-leaf commit would
    // expose a duplicated-rows window between the epoch=0 swap and the
    // old-epoch deletes; the single swap keeps compaction atomic
    store.write(
      store.read(name).drop(EpochCol).withColumn(EpochCol, lit("0")),
      name, tags, partitionBy = Seq(EpochCol))
  }

  /** Drop documents from an epoch-partitioned index, rewriting ONLY the
    * epochs that contain them: a driver-side epoch list (bounded by the
    * number of ingests, never by data) routes the anti-join to the
    * touched partitions; an epoch whose every row is removed has no
    * staged leaf to swap, so its directory is dropped explicitly.
    * Untouched epochs keep their exact files. */
  def removePartitioned(store: graft.sinks.DocStore, name: String,
                        removedIds: DataFrame, idCol: String): Unit = {
    val idx = store.read(name)
    val ids = removedIds.select(col(idCol).cast("long").as("__rid")).distinct()
    val touched = idx.join(ids, idx("doc_id") === col("__rid"), "left_semi")
      .select(EpochCol).distinct().collect().map(_.getString(0))
    if (touched.isEmpty) return
    val kept = idx.where(col(EpochCol).isin(touched.toIndexedSeq: _*))
      .join(ids, idx("doc_id") === col("__rid"), "left_anti")
    val survivors = kept.select(EpochCol).distinct()
      .collect().map(_.getString(0)).toSet
    if (survivors.nonEmpty)
      store.overwritePartitions(kept, name, Seq(EpochCol))
    touched.filterNot(survivors).foreach { e =>
      store.dropPartition(name, s"$EpochCol=$e"): Unit
    }
  }
}
