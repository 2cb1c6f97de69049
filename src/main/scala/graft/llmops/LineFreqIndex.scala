package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.mql.MqlException

/** Incremental line/segment document-frequency index — the standing
  * state behind CCNet-style boilerplate removal on a CONTINUOUS crawl:
  * which lines appear in how many documents, across everything ever
  * ingested, without rescanning history per batch.
  *
  * Unlike the near-dup index (whose per-doc rows are independent facts,
  * so folds are pure unions), line frequencies are corpus-wide SUMS — a
  * new batch changes the count of every line it shares with history.
  * Rewriting those rows per fold would touch the whole index, so the
  * layout is MERGE-ON-READ (the LSM shape): each fold appends its own
  * `epoch=N` partition of per-batch (line, n_docs) DELTAS — O(batch)
  * written, history files byte-identical — and readers sum across
  * epochs (one hash agg over the index, which is ≤ one row per distinct
  * line per epoch, not per corpus document). [[compact]] folds the
  * accumulated deltas back to one merged `epoch=0` in a single atomic
  * whole-collection swap when the epoch count grows.
  *
  * Rows: kind='line' (line, n_docs) deltas; kind='total' the slice's
  * document count (frequency THRESHOLDS need the corpus size, which
  * merges by sum exactly like the line counts); kind='meta' pins the
  * separator — folding with a different separator would silently
  * corrupt every count, so it REFUSES loudly instead. */
object LineFreqIndex {
  val EpochCol = "epoch"

  private def delta(df: DataFrame, idCol: String, textCol: String,
                    sep: String): DataFrame = {
    val lines = Dedup.lineDocFreq(df, idCol, textCol, sep)
      .select(lit("line").as("kind"), col("line"), col("n_docs"))
    val total = df.select(lit("total").as("kind"),
      lit(null).cast("string").as("line"), count(lit(1)).as("n_docs"))
    lines.unionByName(total)
  }

  /** Build the index frame for an initial corpus slice. */
  def build(df: DataFrame, idCol: String, textCol: String,
            sep: String = "\n"): DataFrame =
    delta(df, idCol, textCol, sep).unionByName(
      df.sparkSession.range(1).select(lit("meta").as("kind"),
        lit(sep).as("line"), lit(null).cast("long").as("n_docs")))

  /** Store the built index epoch-partitioned (everything in epoch=0).
    * The separator pin is ALSO committed as a tag so per-fold lookups
    * are one O(1) tag read, not an index scan (the fold contract is
    * O(batch); after a year of hourly folds the meta row hides behind
    * thousands of epoch partitions). */
  def writePartitioned(store: graft.sinks.DocStore, index: DataFrame,
                       name: String,
                       tags: Map[String, String] = Map.empty): Unit =
    store.overwritePartitions(index.withColumn(EpochCol, lit("0")),
      name, Seq(EpochCol), tags + ("linefreq-sep" -> sepOfFrame(index)))

  /** The pinned separator from a frame's meta row (the 1-row union
    * branch — constant-folded, never a corpus scan). */
  private def sepOfFrame(index: DataFrame): String =
    index.where(col("kind") === "meta").select("line")
      .collect().headOption.map(_.getString(0)).getOrElse(
        throw new MqlException(
          "LineFreqIndex: frame has no meta row — not a line-frequency index"))

  /** Stored-index separator: O(1) tag fast path, meta-row scan fallback
    * for externally-written layouts. */
  private def sepOf(store: graft.sinks.DocStore, name: String): String =
    store.readTag(name, "linefreq-sep")
      .getOrElse(sepOfFrame(store.read(name)))

  /** Fold one ingest batch: writes ONLY the `epoch=<epoch>` partition
    * (per-batch deltas; history files byte-identical). Replay-safe by
    * construction — re-folding the same epoch replaces the partition
    * with identical rows. Refuses a separator mismatch. */
  def foldBatch(store: graft.sinks.DocStore, name: String, batch: DataFrame,
                epoch: Long, idCol: String, textCol: String,
                sep: String = "\n",
                tags: Map[String, String] = Map.empty): Unit = {
    require(epoch > 0, "epoch 0 is the build partition")
    val pinned = sepOf(store, name)
    if (pinned != sep) throw new MqlException(
      s"LineFreqIndex '$name' was built with separator ${render(pinned)}; " +
        s"folding with ${render(sep)} would corrupt every count")
    store.overwritePartitions(
      delta(batch, idCol, textCol, sep).withColumn(EpochCol, lit(epoch.toString)),
      name, Seq(EpochCol), tags)
  }

  private def render(s: String): String =
    "'" + s.flatMap(c => if (c < ' ') f"\\u${c.toInt}%04x" else c.toString) + "'"

  /** Merged corpus-wide view: (line, n_docs) summed across every epoch
    * delta. One hash agg over index rows (per-epoch distinct lines,
    * never corpus documents). */
  def lineFreq(store: graft.sinks.DocStore, name: String): DataFrame =
    store.read(name).where(col("kind") === "line")
      .groupBy("line").agg(sum("n_docs").as("n_docs"))

  /** Total documents ever ingested (sums the per-epoch totals). */
  def totalDocs(store: graft.sinks.DocStore, name: String): DataFrame =
    store.read(name).where(col("kind") === "total")
      .select(sum("n_docs").as("__total"))

  /** Boilerplate report against the ACCUMULATED corpus: lines in ≥
    * `minDocFrac` of every document ever ingested. */
  def boilerplate(store: graft.sinks.DocStore, name: String,
                  minDocFrac: Double = 0.5): DataFrame =
    lineFreq(store, name).crossJoin(broadcast(totalDocs(store, name)))
      .where(col("n_docs") >= col("__total") * minDocFrac)
      .drop("__total")

  /** CCNet line dedup of a NEW batch against the accumulated corpus:
    * rewrite each batch document keeping only lines whose HISTORY
    * document-frequency is ≤ `maxDocFrac` (fold the batch first when
    * its own contribution should count). Join shape identical to
    * [[Dedup.dropFrequentLines]] — the frequency side stays a shuffle
    * equi-join, never a broadcast. */
  def dropFrequentLinesAgainst(store: graft.sinks.DocStore, name: String,
                               batch: DataFrame, idCol: String,
                               textCol: String, sep: String = "\n",
                               maxDocFrac: Double = 0.5): DataFrame = {
    val pinned = sepOf(store, name)
    if (pinned != sep) throw new MqlException(
      s"LineFreqIndex '$name' was built with separator ${render(pinned)}, not ${render(sep)}")
    // a batch line HISTORY has never seen is trivially below any
    // threshold — keep it (anti-join against the over-threshold set;
    // unmatched = frequency 0). Explode/rebuild shared with the
    // one-shot operator so split/ordering semantics cannot drift.
    val knownDrop = lineFreq(store, name)
      .crossJoin(broadcast(totalDocs(store, name)))
      .where(col("n_docs") > col("__total") * maxDocFrac)
      .select("line")
    Dedup.rebuildDocs(
      Dedup.segments(batch, idCol, textCol, sep)
        .join(knownDrop, Seq("line"), "left_anti"),
      idCol, textCol, sep)
  }

  /** Compaction (merge-on-read's OPTIMIZE): sum-merge every epoch's
    * deltas into one `epoch=0` in a single atomic whole-collection
    * swap (rows move between partitions, so the per-leaf commit would
    * expose a double-counting window). Merged view, tags, and the
    * separator pin survive; later folds continue from any epoch. */
  def compact(store: graft.sinks.DocStore, name: String): Unit = {
    val idx = store.read(name)
    val sep = sepOfFrame(idx)
    val merged = idx.where(col("kind") =!= "meta")
      .groupBy("kind", "line").agg(sum("n_docs").as("n_docs"))
      .unionByName(idx.sparkSession.range(1).select(lit("meta").as("kind"),
        lit(sep).as("line"), lit(null).cast("long").as("n_docs")))
    store.write(merged.withColumn(EpochCol, lit("0")), name,
      store.listTags(name), partitionBy = Seq(EpochCol))
  }

  private def broadcast(df: DataFrame): DataFrame =
    org.apache.spark.sql.functions.broadcast(df)
}
