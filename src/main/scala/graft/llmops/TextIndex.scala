package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Persistable text-search index: the corpus statistics `$search`'s
  * BM25 scoring needs, precomputed once and stored as a collection —
  * the Atlas/Lucene index lifecycle (build on write, probe on query)
  * instead of a per-query corpus stats pass.
  *
  * Layout (one row per entry, single collection so `$search`'s `index`
  * option can resolve it by name):
  *   - kind='summary': (path, n_docs, avgdl) over docs with ≥1 token
  *   - kind='term':    (path, term, df) — document frequency of every
  *     distinct token under the path
  *
  * The tokenizer is EXACTLY `$search`'s ([[Analyzers]]; default
  * lowercase whitespace, per-path overrides declared at build and
  * recorded as kind='analyzer' rows), so looked-up statistics are
  * bit-identical to what the per-query aggregate would compute —
  * `$search` refuses a query analyzer that disagrees with the index's. Phrase and fuzzy statistics are positional
  * or edit-distance-derived — not representable as term rows — so
  * queries using them keep the corpus pass (same results either way).
  *
  * Scale shape: the term table is vocabulary-sized (a word-count job —
  * explode + map-side-combined hash agg); the query side reads only
  * the rows matching its own terms (a bounded filtered collect). */
object TextIndex {
  private def toks(path: String, analyzers: Map[String, String]): Column =
    Analyzers.docTokens(analyzers.getOrElse(path, Analyzers.Default), col(path))

  /** Validates a per-path analyzer declaration: known names only, and
    * every declared path must actually be indexed (a typo'd path would
    * otherwise silently analyze with the default). */
  private def checkAnalyzers(paths: Seq[String],
                             analyzers: Map[String, String]): Unit =
    analyzers.foreach { case (p, a) =>
      Analyzers.validate(a, "TextIndex.build.analyzers")
      if (!paths.contains(p)) throw new IllegalArgumentException(
        s"TextIndex.build: analyzers declares path '$p' which is not indexed")
    }

  /** kind='analyzer' rows recording each NON-default per-path analyzer
    * (absence = default), so a stored index carries its analysis
    * contract and `$search` can refuse a mismatched query analyzer. */
  private def analyzerRows(df: DataFrame, paths: Seq[String],
                           analyzers: Map[String, String]): Option[DataFrame] = {
    // stored in canonical form so a stage option normalizing to the
    // same analyzer compares equal whatever its spelling
    val declared = paths.flatMap(p => analyzers.get(p)
      .map(a => Analyzers.normalize(a, "TextIndex.build.analyzers"))
      .filter(_ != Analyzers.Default).map(p -> _))
    if (declared.isEmpty) None
    else Some(declared.map { case (p, a) =>
      df.sparkSession.range(1)
        .select(lit("analyzer").as("kind"), lit(p).as("path"),
          lit(a).as("term"), lit(0L).as("df"), lit(0L).as("n_docs"),
          lit(null).cast("double").as("avgdl"))
    }.reduce(_ unionByName _))
  }

  /** The per-path analyzers a stored index declares (one bounded
    * collect; empty map = all-default, incl. pre-analyzer indexes). */
  def indexAnalyzers(index: DataFrame): Map[String, String] =
    index.where(col("kind") === "analyzer").select("path", "term")
      .limit(1001).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  def build(df: DataFrame, paths: Seq[String]): DataFrame =
    build(df, paths, None)

  def build(df: DataFrame, paths: Seq[String],
            analyzers: Map[String, String]): DataFrame =
    build(df, paths, None, analyzers)

  def build(df: DataFrame, paths: Seq[String],
            postingsIdCol: Option[String]): DataFrame =
    build(df, paths, postingsIdCol, Map.empty[String, String])

  /** Statistics-only index (6 columns) when `postingsIdCol` is None;
    * with `postingsIdCol = Some(id)` the index ALSO carries the full
    * inverted structure (3 extra columns) and `$search` can run the
    * postings-only query plan (score from the index, fetch only the
    * winners):
    *   - kind='posting': (path, term, doc_id, tf) — term frequency of
    *     every (doc, term) pair;
    *   - kind='doc':     (path, doc_id, dl) — per-doc token length;
    *   - kind='meta':    (path, term=<id column name>) — which corpus
    *     column the postings' doc_id joins back to. The id column must
    *     be unique and castable to long (Mongo's `_id` contract —
    *     duplicate ids would merge documents' postings).
    * Postings are corpus-token-sized — the real storage cost of a real
    * inverted index; build is one explode + one (doc, term) hash agg. */
  def build(df: DataFrame, paths: Seq[String], postingsIdCol: Option[String],
            analyzers: Map[String, String]): DataFrame = {
    require(paths.nonEmpty, "TextIndex.build: need at least one path")
    checkAnalyzers(paths, analyzers)
    val nullId = lit(null).cast("long")
    def pad(d: DataFrame): DataFrame = postingsIdCol match {
      case None => d
      case Some(_) => d.withColumn("doc_id", nullId)
        .withColumn("tf", nullId).withColumn("dl", nullId)
    }
    val core = paths.map { p =>
      val t = postingsIdCol match {
        case Some(id) => df.select(col(id).cast("long").as("__did"),
          toks(p, analyzers).as("__w"))
        case None => df.select(toks(p, analyzers).as("__w"))
      }
      val summary = t.where(size(col("__w")) > 0)
        .agg(count(lit(1)).as("n_docs"),
          avg(size(col("__w")).cast("double")).as("avgdl"))
        .select(lit("summary").as("kind"), lit(p).as("path"),
          lit(null).cast("string").as("term"), lit(0L).as("df"),
          col("n_docs"), col("avgdl"))
      val terms = t
        .select(explode(array_distinct(col("__w"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("df"))
        .select(lit("term").as("kind"), lit(p).as("path"), col("term"),
          col("df"), lit(0L).as("n_docs"),
          lit(null).cast("double").as("avgdl"))
      val stats = pad(summary.unionByName(terms))
      postingsIdCol match {
        case None => stats
        case Some(id) =>
          val posts = t
            .select(col("__did"), explode(col("__w")).as("term"))
            .groupBy("__did", "term").agg(count(lit(1)).as("tf"))
            .select(lit("posting").as("kind"), lit(p).as("path"),
              col("term"), lit(0L).as("df"), lit(0L).as("n_docs"),
              lit(null).cast("double").as("avgdl"),
              col("__did").as("doc_id"), col("tf"), nullId.as("dl"))
          val docs = t.where(size(col("__w")) > 0)
            .select(lit("doc").as("kind"), lit(p).as("path"),
              lit(null).cast("string").as("term"), lit(0L).as("df"),
              lit(0L).as("n_docs"), lit(null).cast("double").as("avgdl"),
              col("__did").as("doc_id"), nullId.as("tf"),
              size(col("__w")).cast("long").as("dl"))
          val meta = t.sparkSession.range(1)
            .select(lit("meta").as("kind"), lit(p).as("path"),
              lit(id).as("term"), lit(0L).as("df"), lit(0L).as("n_docs"),
              lit(null).cast("double").as("avgdl"),
              nullId.as("doc_id"), nullId.as("tf"), nullId.as("dl"))
          stats.unionByName(posts).unionByName(docs).unionByName(meta)
      }
    }.reduce(_ unionByName _)
    analyzerRows(df, paths, analyzers)
      .map(a => core.unionByName(pad(a))).getOrElse(core)
  }

  /** Postings index that ALSO stores source fields (Atlas
    * `storedSource`): kind='stored' rows carry each document's selected
    * columns as one JSON payload, kind='storedmeta' records their
    * struct schema (DDL), so a `$search` with `returnStoredSource:
    * true` can materialize its result — match, score, AND output —
    * from the index alone: zero corpus I/O on the query path. The id
    * column must be in `storedSource` if downstream stages reference
    * it. Storage cost: one JSON row per document — the price Atlas
    * charges for the same feature. */
  def build(df: DataFrame, paths: Seq[String], postingsIdCol: Option[String],
            storedSource: Seq[String]): DataFrame =
    build(df, paths, postingsIdCol, storedSource, Map.empty[String, String])

  def build(df: DataFrame, paths: Seq[String], postingsIdCol: Option[String],
            storedSource: Seq[String],
            analyzers: Map[String, String]): DataFrame = {
    val base = build(df, paths, postingsIdCol, analyzers)
    if (storedSource.isEmpty) base
    else {
      val id = postingsIdCol.getOrElse(throw new IllegalArgumentException(
        "TextIndex.build: storedSource requires postingsIdCol (stored " +
          "rows are keyed by document id)"))
      val ddl = df.select(storedSource.map(col): _*).schema.toDDL
      val nullId = lit(null).cast("long")
      val stored = df.select(col(id).cast("long").as("doc_id"),
          to_json(struct(storedSource.map(col): _*)).as("sval"))
        .select(lit("stored").as("kind"), lit("__stored").as("path"),
          lit(null).cast("string").as("term"), lit(0L).as("df"),
          lit(0L).as("n_docs"), lit(null).cast("double").as("avgdl"),
          col("doc_id"), nullId.as("tf"), nullId.as("dl"), col("sval"))
      val storedMeta = df.sparkSession.range(1)
        .select(lit("storedmeta").as("kind"), lit("__stored").as("path"),
          lit(ddl).as("term"), lit(0L).as("df"), lit(0L).as("n_docs"),
          lit(null).cast("double").as("avgdl"), nullId.as("doc_id"),
          nullId.as("tf"), nullId.as("dl"),
          lit(null).cast("string").as("sval"))
      base.unionByName(stored, allowMissingColumns = true)
        .unionByName(storedMeta, allowMissingColumns = true)
    }
  }

  /** Incremental maintenance: fold a NEW batch of documents into an
    * existing index without re-scanning the indexed corpus — the write
    * path of a live search index (streaming ingest folds each
    * micro-batch the same way). Exact, not approximate: term dfs ADD;
    * the path summary merges as a weighted mean
    * (avgdl' = (n₁·a₁ + n₂·a₂)/(n₁+n₂)), so update(build(A), B) ≡
    * build(A ∪ B) up to float associativity. Cost: index-sized +
    * batch-sized — the old CORPUS is never touched, only the old index
    * rows reduce again. */
  def update(index: DataFrame, newDocs: DataFrame, paths: Seq[String]): DataFrame = {
    // postings-bearing indexes fold too: term dfs and summaries reduce
    // as below; posting/doc rows are per-(doc, term) facts of DISJOINT
    // batches, so they pass through as a union; the meta row dedupes
    val hasPostings = index.columns.contains("doc_id")
    val idColName: Option[String] =
      if (!hasPostings) None
      else index.where(col("kind") === "meta").select("term")
        .collect().headOption.map(_.getString(0))
    // a stored-source index folds the new batch's stored rows too —
    // the column list comes from the recorded storedmeta schema
    val storedCols: Seq[String] =
      if (!index.columns.contains("sval")) Nil
      else index.where(col("kind") === "storedmeta").select("term")
        .collect().headOption.map(r =>
          org.apache.spark.sql.types.StructType.fromDDL(r.getString(0))
            .fieldNames.toSeq).getOrElse(Nil)
    // the delta MUST analyze with the index's own declared analyzers —
    // folding whitespace-analyzed terms into a standard-analyzed index
    // would corrupt its statistics silently
    val anas = indexAnalyzers(index)
    val delta =
      if (storedCols.isEmpty) build(newDocs, paths, idColName, anas)
      else build(newDocs, paths, idColName, storedCols, anas)
    val both = index.unionByName(delta, allowMissingColumns = true)
    val terms = both.where(col("kind") === "term")
      .groupBy("path", "term").agg(sum("df").as("df"))
      .select(lit("term").as("kind"), col("path"), col("term"), col("df"),
        lit(0L).as("n_docs"), lit(null).cast("double").as("avgdl"))
    val summaries = both.where(col("kind") === "summary")
      .groupBy("path")
      .agg(sum("n_docs").as("n_docs"),
        (sum(col("avgdl") * col("n_docs")) /
          when(sum("n_docs") > 0, sum("n_docs"))).as("avgdl"))
      .select(lit("summary").as("kind"), col("path"),
        lit(null).cast("string").as("term"), lit(0L).as("df"),
        col("n_docs"), col("avgdl"))
    // analyzer rows are per-path facts shared by index and delta —
    // distinct() dedupes the identical copies
    val anaRows = both.where(col("kind") === "analyzer")
      .select("kind", "path", "term", "df", "n_docs", "avgdl").distinct()
    val stats = summaries.unionByName(terms).unionByName(anaRows)
    if (!hasPostings) stats
    else {
      val nullId = lit(null).cast("long")
      val padded = stats.withColumn("doc_id", nullId)
        .withColumn("tf", nullId).withColumn("dl", nullId)
      val carried = both.where(col("kind").isin("posting", "doc", "stored"))
      val meta = both.where(col("kind").isin("meta", "storedmeta")).distinct()
      padded.unionByName(carried, allowMissingColumns = true)
        .unionByName(meta, allowMissingColumns = true)
    }
  }

  /** The DELETE path of index maintenance: drop a set of document ids
    * from a postings-bearing index using ONLY index rows — the removed
    * docs' term sets come from their own posting rows, their lengths
    * from their doc rows, so the corpus contributes zero I/O (it may
    * already be gone — that is what deletion means). Exact
    * rebuild-equivalence: remove(build(A), B) ≡ build(A \ B) —
    * term dfs decrement by integer counts (terms reaching 0 drop out),
    * and the path summary recomputes count/avg over the SURVIVING doc
    * rows' integer lengths, not by algebra on the rounded stored mean.
    * Scale shape: two hash joins of the posting/doc tables against the
    * removed-id set (small → AQE broadcasts it) + one vocabulary-sized
    * decrement agg; nothing touches the corpus. */
  def remove(index: DataFrame, removedIds: DataFrame,
             idCol: String): DataFrame = {
    require(index.columns.contains("doc_id"),
      "TextIndex.remove needs a postings-bearing index (built with " +
        "postingsIdCol): a statistics-only index cannot know which " +
        "terms the removed documents contained")
    val ids = removedIds.select(col(idCol).cast("long").as("__rid")).distinct()
    val posts = index.where(col("kind") === "posting")
    val keptPosts = posts.join(ids, col("doc_id") === col("__rid"), "left_anti")
    val remPosts = posts.join(ids, col("doc_id") === col("__rid"), "left_semi")
    val keptDocs = index.where(col("kind") === "doc")
      .join(ids, col("doc_id") === col("__rid"), "left_anti")
    // postings are one row per (doc, term), so the df decrement per
    // (path, term) is simply the removed-posting count
    val dec = remPosts.groupBy("path", "term").agg(count(lit(1)).as("__ddf"))
    val nullId = lit(null).cast("long")
    val terms = index.where(col("kind") === "term")
      .join(dec, Seq("path", "term"), "left")
      .withColumn("df", col("df") - coalesce(col("__ddf"), lit(0L)))
      .where(col("df") > 0)
      .select(lit("term").as("kind"), col("path"), col("term"), col("df"),
        lit(0L).as("n_docs"), lit(null).cast("double").as("avgdl"),
        nullId.as("doc_id"), nullId.as("tf"), nullId.as("dl"))
    // every path the index covered KEEPS its summary row even when the
    // removal empties it (n_docs=0, avgdl=null — what build over an
    // empty corpus emits): a groupBy over the kept docs alone would
    // drop the row and later $search queries would refuse the index
    // ("does not cover path ...") instead of returning zero matches
    val origPaths = index.where(col("kind") === "summary")
      .select("path").distinct()
    val counts = keptDocs.groupBy("path")
      .agg(count(lit(1)).as("n_docs"),
        avg(col("dl").cast("double")).as("avgdl"))
    val summaries = origPaths.join(counts, Seq("path"), "left")
      .select(lit("summary").as("kind"), col("path"),
        lit(null).cast("string").as("term"), lit(0L).as("df"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"), col("avgdl"),
        nullId.as("doc_id"), nullId.as("tf"), nullId.as("dl"))
    val keptStored = index.where(col("kind") === "stored")
      .join(ids, col("doc_id") === col("__rid"), "left_anti")
    val meta = index.where(col("kind").isin("meta", "storedmeta", "analyzer"))
      .distinct()
    summaries.unionByName(terms)
      .unionByName(keptPosts, allowMissingColumns = true)
      .unionByName(keptDocs, allowMissingColumns = true)
      .unionByName(keptStored, allowMissingColumns = true)
      .unionByName(meta, allowMissingColumns = true)
  }
}
