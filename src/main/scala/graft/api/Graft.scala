package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.mql.{FilterCompiler, Mql, MqlException, PipelineCompiler}
import org.json4s._

/** Public entry points mirroring the reference's API surface
  * (find_arrow_all / aggregate_arrow_all, bindings/python/pymongoarrow/
  * api.py:129-256), returning DataFrames instead of Arrow tables.
  */
object Graft {
  private val log = org.slf4j.LoggerFactory.getLogger("graft.api.Graft")

  /** Options the reference warns about and drops (api.py:164-170 strips
    * cursor_type from find; api.py:242-248 strips batchSize/useCursor
    * from aggregate). Batching/cursor knobs are meaningless here —
    * partitioning is Spark's — so the same warn-and-drop applies. */
  // warned-and-dropped: cursor/physical knobs with no analogue in a
  // DataFrame engine (the reference forwards its kwargs verbatim to
  // find(), api.py:175 — acceptance, not errors, is the parity contract)
  private val StrippedFindOptions = Set("cursor_type", "batch_size",
    "allow_disk_use", "max_time_ms", "no_cursor_timeout")
  private val StrippedAggOptions = Set("batchSize", "useCursor")

  private[api] def stripOptions(options: Map[String, Any],
                                stripped: Set[String], op: String): Map[String, Any] = {
    options.keys.filter(stripped).foreach(k =>
      log.warn(s"Ignoring the '$k' option as it is not supported by $op"))
    val rest = options.view.filterKeys(!stripped(_)).toMap
    rest.keys.headOption.foreach(k =>
      throw new MqlException(s"unsupported $op option '$k'"))
    rest
  }

  /** find with a pymongo-style options map: unsupported-but-harmless
    * options are warned and dropped, collation (a JSON doc string) is
    * honored, anything else rejects.
    *
    * The index-shaped tail (the reference forwards these verbatim,
    * api.py:175):
    *  - `hint`: a {field: dir} doc is accepted (its fields also feed
    *    returnKey); a named-index string is accepted and ignored — an
    *    index-free engine has no named access paths;
    *  - `min`/`max`: the inclusive-lower / exclusive-upper index-scan
    *    bounds become the equivalent range filters — the semantic
    *    effect of bounding a single-field index walk;
    *  - `returnKey`: only the hinted key fields come back (no hint →
    *    zero columns, Mongo's empty-doc COLLSCAN behavior);
    *  - `comment`: accepted, no result semantics. */
  def findWithOptions(df: DataFrame, filter: String,
                      options: Map[String, Any]): DataFrame = {
    val collation = options.get("collation").map(c =>
      FilterCompiler.Collation.parse(c.toString))
    // hint arrives as either a {field: dir} doc (JSON text) or a named
    // index (bare string — no field info in an index-free engine)
    val hintFields: Seq[String] = options.get("hint") match {
      case Some(h) if h.toString.trim.startsWith("{") =>
        Mql.asObj(Mql.parse(h.toString), "hint").map(_._1)
      case _ => Seq.empty
    }
    def boundPairs(key: String): Seq[(String, org.json4s.JValue)] =
      options.get(key).map(d => Mql.asObj(Mql.parse(d.toString), key))
        .getOrElse(Nil)
    val returnKey = options.get("return_key").orElse(options.get("returnKey"))
      .exists { case b: Boolean => b; case other => other.toString == "true" }
    options.get("comment").foreach(_ => ()) // accepted, no semantics
    stripOptions(options - "collation" - "hint" - "min" - "max"
      - "return_key" - "returnKey" - "comment", StrippedFindOptions, "find")
    var out = find(df, filter, collation = collation)
    boundPairs("min").foreach { case (f, v) =>
      out = out.where(Mql.fieldCol(f) >= Mql.literal(v)) }
    boundPairs("max").foreach { case (f, v) =>
      out = out.where(Mql.fieldCol(f) < Mql.literal(v)) }
    if (returnKey) out = out.select(hintFields.map(col): _*)
    out
  }

  def aggregateWithOptions(df: DataFrame, pipelineJson: String,
                           options: Map[String, Any]): DataFrame = {
    val letJson = options.get("let").map(_.toString)
    // aggregate-level collation (forwarded verbatim by the reference,
    // api.py:252): folds $match string comparisons and $sort ordering;
    // stages whose string GROUPING/JOIN equality it would change are
    // refused loudly inside the compiler
    val collation = options.get("collation").map(c =>
      FilterCompiler.Collation.parse(c.toString))
    // opt-in row-identity assertion (see aggregate's uniqueKey)
    val uniqueKey = options.get("uniqueKey").map(_.toString)
    stripOptions(options - "let" - "collation" - "uniqueKey",
      StrippedAggOptions, "aggregate")
    FilterCompiler.withCollation(collation)(
      aggregate(df, pipelineJson, letJson, uniqueKey))
  }

  /** events.ts normalization: fixture generations have shipped the
    * column as TIMESTAMP(NANOS) (read by Spark only as a long — exact
    * integer div, ns epoch exceeds double precision) and as
    * timestamp[us] without tz (read as TIMESTAMP_NTZ). Both land on µs
    * TimestampType; under the UTC session tz the NTZ cast is wall-clock
    * identity, so the two fixture formats decode to the same instants. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Table resolver over a fixture directory (one parquet per
    * collection); events.ts normalized per [[normalizeEventTs]]. */
  def tables(spark: SparkSession, dir: String): PipelineCompiler.TableResolver = {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
    case name => spark.read.parquet(s"$dir/$name.parquet")
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    tables(spark, dir)(name)

  /** find(filter, projection, sort, limit, skip) ≈ find_arrow_all
    * (reference api.py:129-207). Projection doc follows the same
    * include/exclude rules as $project. */
  def find(df: DataFrame,
           filter: String = "{}",
           projection: Option[String] = None,
           sort: Option[String] = None,
           limit: Option[Int] = None,
           skip: Option[Int] = None,
           collation: Option[FilterCompiler.Collation] = None): DataFrame = {
    // find is the one surface where $near/$nearSphere/$text are legal:
    // the filter compiles to (predicate, implicit nearest-first sort key,
    // text score); an explicit sort() overrides the geo order, as in
    // Mongo, and $text's score lands as a real `textScore` column so the
    // {$meta: "textScore"} projection idiom resolves to it
    val fc = FilterCompiler.withSchema(Some(df.schema))(
      FilterCompiler.compileFind(filter, collation))
    var out = df
    // $text tokens materialize once (carrier column feeds predicate AND
    // score, dropped below) — see FilterCompiler.TextToksCol
    fc.textToks.foreach(t =>
      out = out.withColumn(FilterCompiler.TextToksCol, t))
    out = out.where(fc.pred)
    fc.textScore.foreach(s => out = out.withColumn("textScore", s))
    if (fc.textToks.isDefined) out = out.drop(FilterCompiler.TextToksCol)
    if (sort.isEmpty) fc.nearDist.foreach(d => out = out.orderBy(d.asc))
    // collation affects sort only on string-typed keys: plain ci folds
    // through lower(); the round-11 depth fields (numericOrdering /
    // caseFirst / alternate) sort by the binary-comparable collation
    // KEY (functions/CollationKeys). The untyped column rides as the
    // tiebreak for total order either way.
    val fold = collation.exists(_.caseInsensitive)
    val keyed = collation.filter(_.keyed)
    def sortKey(k: String, asc: Boolean): Seq[org.apache.spark.sql.Column] = {
      val isStr = out.schema.find(_.name == k.split('.').head)
        .exists(f => k.indexOf('.') < 0 &&
          f.dataType == org.apache.spark.sql.types.StringType)
      val keys =
        if (isStr && keyed.isDefined) {
          graft.functions.GraftFunctions.register(df.sparkSession)
          Seq(org.apache.spark.sql.functions.call_function(
            "collation_key", col(k), lit(keyed.get.spec)), col(k))
        } else if (fold && isStr) Seq(lower(col(k)), col(k))
        else Seq(col(k))
      keys.map(c => if (asc) c.asc else c.desc)
    }
    sort.foreach { s =>
      val cols = Mql.asObj(Mql.parse(s), "sort").flatMap {
        case (k, JInt(d))  => sortKey(k, d >= 0)
        case (k, JLong(d)) => sortKey(k, d >= 0)
        case (k, o) => throw new MqlException(s"bad sort direction for $k: $o")
      }
      out = out.orderBy(cols: _*)
    }
    skip.foreach(n => out = out.offset(n))
    limit.foreach(n => out = out.limit(n))
    projection.foreach { p =>
      out = PipelineCompiler.run(out, s"""[{"$$project": $p}]""")
    }
    out
  }

  /** Materialize per-column display timezones (reference §1.4: a tz in
    * the schema converts on read, test_datetime.py:89-168): every
    * TimestampType column carrying tz metadata becomes the tz-local wall
    * clock (TimestampNTZType). Instants without metadata pass through. */
  def localize(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val cols = df.schema.fields.map { f =>
      if (f.dataType == TimestampType &&
          f.metadata.contains(graft.schema.MSchema.TimezoneKey)) {
        val tz = f.metadata.getString(graft.schema.MSchema.TimezoneKey)
        convert_timezone(lit("UTC"), lit(tz), col(f.name).cast(TimestampNTZType))
          .as(f.name)
      } else col(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  /** find with a declared schema: the schema synthesizes the projection
    * (reference api.py:172-173 — schema._get_projection()), so only the
    * declared columns are read (column pruning reaches the scan). */
  def findWithSchema(df: DataFrame, schema: graft.schema.MSchema,
                     filter: String = "{}",
                     sort: Option[String] = None,
                     limit: Option[Int] = None): DataFrame = {
    val base = find(df, filter, projection = None, sort = sort, limit = limit)
    val cols = schema.projection.collect {
      case (name, true) if df.columns.contains(name.split('.').head) => col(name)
    }
    base.select(cols: _*)
  }

  /** aggregate(pipeline) ≈ aggregate_arrow_all (reference api.py:210-256);
    * $out/$merge rejected exactly like api.py:235-240. `let` is the
    * command-level variable document: constant expressions (no field
    * paths — they compile against no document, exactly Mongo's rule),
    * referenced as $$name anywhere in the pipeline; lambda/`$let`
    * variables shadow them. */
  def aggregate(df: DataFrame, pipelineJson: String,
                letJson: Option[String] = None,
                uniqueKey: Option[String] = None): DataFrame = {
    // `uniqueKey` asserts the named column is unique+non-null per input
    // row (Mongo's `_id` contract) — $lookup/$graphLookup then use it as
    // the regroup row identity instead of a frozen synthetic id, skipping
    // the full-input localCheckpoint materialization (PipelineCompiler.run)
    def run0 = PipelineCompiler.run(df, pipelineJson,
      name => throw new MqlException(s"no table resolver provided for '$name'"),
      uniqueKey)
    letJson match {
      case None => run0
      case Some(l) =>
        val vars = Mql.asObj(Mql.parse(l), "let").map { case (k, v) =>
          if (!k.matches("[a-z][A-Za-z0-9_]*")) throw new MqlException(
            s"let: variable name '$k' must start with a lowercase letter")
          k -> graft.mql.ExprCompiler.compile(v, Map.empty)
        }.toMap
        graft.mql.ExprCompiler.withLetVars(vars)(run0)
    }
  }

  def aggregate(spark: SparkSession, dir: String, collection: String,
                pipelineJson: String): DataFrame =
    aggregate(spark, dir, collection, pipelineJson, None)

  def aggregate(spark: SparkSession, dir: String, collection: String,
                pipelineJson: String, uniqueKey: Option[String]): DataFrame = {
    val resolve = tables(spark, dir)
    PipelineCompiler.run(resolve(collection), pipelineJson, resolve, uniqueKey)
  }

  /** aggregate with a `$out`/`$merge` tail — the server-side write the
    * reference client rejects (api.py:235-240) and a standalone engine
    * must supply. Source collections resolve from `dir` (read-only);
    * the write target lives in `store`, which is also where a `$merge`
    * target is read back from. Returns the target collection name. */
  def aggregateTo(spark: SparkSession, dir: String, collection: String,
                  pipelineJson: String, store: graft.sinks.DocStore): String = {
    val resolve = tables(spark, dir)
    PipelineCompiler.runWithWrites(resolve(collection), pipelineJson, resolve, store)
  }

  /** A database handle over a GraftCatalog: the full reference loop —
    * `db[coll].find(...)` / `db[coll].aggregate(...)` (api.py:129,210)
    * — against one catalog database, with `$lookup`/`$unionWith`
    * resolving sibling collections and `$out`/`$merge` writing back
    * into the same database (graftdocs layout, so results are
    * immediately listed/queryable as collections). `catalog` must be
    * registered (`spark.sql.catalog.<name>` = GraftCatalog). */
  final case class Db(spark: SparkSession, catalog: String) {
    private def rootDir: String = spark.conf.get(s"spark.sql.catalog.$catalog.dir")
    private val resolve: PipelineCompiler.TableResolver =
      name => spark.table(s"$catalog.`$name`")
    /** The database's write side (shared dir ⇒ `$out` results appear as
      * catalog collections). */
    def store: graft.sinks.DocStore =
      new graft.sinks.DocStore(spark, rootDir, "graftdocs")

    def collection(name: String): DataFrame = resolve(name)
    /** Mongo's `compact` command (reference clients forward it
      * verbatim), file-layout edition: rewrite the collection's
      * ingest-time file spray into few files; rows, schema, partition
      * layout, and commit tags are preserved. */
    def compact(coll: String, filesPerPartition: Int = 1): Unit =
      store.compact(coll, filesPerPartition)
    /** Mongo's `explain` command for a find: the compiled physical
      * plan at Spark's formatted verbosity. The engine's analogue of
      * "queryPlanner" output — the honest verbosity here, since
      * executionStats live in the Spark UI, not the plan. */
    def explainFind(coll: String, filter: String = "{}"): String =
      find(coll, filter).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    /** Mongo's `explain` for an aggregate pipeline. */
    def explainAggregate(coll: String, pipelineJson: String): String =
      aggregate(coll, pipelineJson).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    /** Mongo `db.coll.drop()`. */
    def dropCollection(coll: String): Boolean = store.drop(coll)
    /** Mongo `db.dropDatabase()`: every live collection drops (each
      * collection-level watch sees drop + invalidate), and db-LEVEL
      * watches get their one terminal invalidate — the only
      * invalidation path a db watch has. Returns the dropped names. */
    def dropDatabase(): Seq[String] = store.dropDatabase()
    /** Mongo `renameCollection` (with its `dropTarget` option). */
    def renameCollection(from: String, to: String,
                         dropTarget: Boolean = false): Unit =
      store.rename(from, to, dropTarget)
    /** Mongo `db.createView(name, viewOn, pipeline)`: a stored
      * aggregation pipeline resolved on every read — wire find/
      * aggregate and `DocStore.readOrView` see through it, filters on
      * the view prune into the underlying scan (the whole plan is
      * declarative), and writes refuse (views are read-only). */
    def createView(name: String, viewOn: String,
                   pipelineJson: String): Unit =
      store.createView(name, viewOn, pipelineJson)
    def dropView(name: String): Boolean = store.dropView(name)
    def find(coll: String, filter: String = "{}"): DataFrame =
      Graft.find(resolve(coll), filter)
    def aggregate(coll: String, pipelineJson: String): DataFrame = {
      // Mongo's aggregate-form change stream: a pipeline whose FIRST
      // stage is `$changeStream` returns the change-document stream
      // (`watch`) with the remaining stages applied to change docs —
      // the server routes `coll.aggregate([{$changeStream:{}}, ...])`
      // to the same cursor `coll.watch(...)` opens. Options accepted:
      // `fullDocument` (no-op here — the insert-only stream always
      // carries the full after-image) and `fullDocumentBeforeChange`
      // "off"/"whenAvailable"; anything else refuses loudly rather
      // than silently ignoring a semantic knob (resumeAfter/startAt*
      // need a wire resume token this engine does not have).
      import org.json4s._
      Mql.parse(pipelineJson) match {
        case JArray(JObject(List(("$changeStream", spec))) :: rest) =>
          // value-level validation, not just keys: every fullDocument
          // mode is satisfiable on an insert-only stream (inserts always
          // carry the full after-image), but pre-images do not exist
          // here, so fullDocumentBeforeChange "whenAvailable"/"off" are
          // honest no-ops while "required" must refuse (Mongo errors
          // whenever a required pre-image is unavailable — which would
          // be always)
          val okValues = Map(
            "fullDocument" ->
              Set("default", "updateLookup", "whenAvailable", "required"),
            "fullDocumentBeforeChange" -> Set("off", "whenAvailable"))
          spec match {
            case JObject(fs) => fs.foreach {
              case (k, v) => okValues.get(k) match {
                case None => throw new graft.mql.MqlException(
                  s"$$changeStream: unsupported option $k")
                case Some(ok) =>
                  val s = v match { case JString(x) => x; case other => other.toString }
                  if (!ok(s)) throw new graft.mql.MqlException(
                    s"$$changeStream: unsupported $k value '$s'" +
                      (if (k == "fullDocumentBeforeChange" && s == "required")
                        " (this engine's streams carry no pre-images)" else ""))
              }
            }
            case _ => throw new graft.mql.MqlException(
              "$changeStream: specification must be a document")
          }
          watch(coll, org.json4s.jackson.JsonMethods.compact(
            org.json4s.jackson.JsonMethods.render(JArray(rest))))
        case _ =>
          // a catalog-persisted unique-key declaration auto-engages the
          // keyless-freeze-free $lookup/$graphLookup path (the sidecar
          // hint is the stored form of aggregate's uniqueKey assertion);
          // a stale hint (column gone after evolution) is ignored, not
          // fatal
          val df = resolve(coll)
          val hint = store.uniqueKeyOf(coll).filter(df.columns.contains)
          PipelineCompiler.run(df, pipelineJson, resolve, hint)
      }
    }
    /** Declare `key` unique+non-null for `coll` (persisted in the
      * catalog sidecar): every later [[aggregate]] on the collection
      * runs `$lookup`/`$graphLookup` with the key column as row
      * identity — no `monotonically_increasing_id` +
      * `localCheckpoint` freeze in the plan. */
    def setUniqueKey(coll: String, key: String): Unit =
      store.setUniqueKey(coll, key)
    /** `$out`/`$merge`-tailed pipeline; returns the target collection name. */
    def aggregateTo(coll: String, pipelineJson: String): String =
      PipelineCompiler.runWithWrites(resolve(coll), pipelineJson, resolve, store)

    /** `db.createSearchIndex(coll, name, paths)` — Mongo's
      * createSearchIndexes command for this engine: builds the BM25
      * statistics index (TextIndex.build) over the collection and
      * stores it AS a sibling collection, so `$search`'s `index`
      * option (and the reference's `{"$search": {"index": name, ...}}`
      * pass-through, api.py:252) resolves it through the same catalog.
      * Rebuild-on-call, like running the command again; incremental
      * upkeep is `TextIndex.update` / `EventStream.indexStream` over
      * the same name. Returns the index name. */
    def createSearchIndex(coll: String, name: String,
                          paths: Seq[String]): String = {
      store.write(graft.llmops.TextIndex.build(resolve(coll), paths), name)
      name
    }

    /** `db.createVectorIndex(coll, name, vecCol, nCells)` — the
      * `$vectorSearch` analogue: builds IVF centroids over the
      * collection's vector column and stores the centroid frame as a
      * sibling collection for `$vectorSearch`'s `index` option.
      * Returns the index name. */
    def createVectorIndex(coll: String, name: String, vecCol: String,
                          nCells: Int = 16, lloydIters: Int = 1,
                          idCol: String = "_id"): String = {
      val idx = graft.llmops.Similarity.buildIvf(resolve(coll), nCells,
        idCol, vecCol, lloydIters, persistIndex = false)
      store.write(graft.llmops.Similarity.centroidFrame(idx), name)
      name
    }

    /** `$listSearchIndexes`-shaped listing: every sibling collection
      * whose schema matches a stored index layout, with its type —
      * 'search' (TextIndex.build) or 'vectorSearch' (centroidFrame).
      * One catalog listing + a schema probe per collection (metadata
      * only — no data reads). */
    def listSearchIndexes(): Seq[(String, String)] = {
      val names = spark.sql(s"SHOW TABLES IN $catalog")
        .select("tableName").collect().map(_.getString(0)).toSeq
      names.flatMap { n =>
        val cols = (try resolve(n).columns.toSet
                    catch { case _: Exception => Set.empty[String] })
        if (Set("kind", "path", "term", "df", "n_docs", "avgdl").subsetOf(cols))
          Some(n -> "search")
        else if (Set("cell_id", "centroid").subsetOf(cols))
          Some(n -> "vectorSearch")
        else None
      }
    }

    /** `dropSearchIndex(name)` — removes the stored index collection
      * (refuses names that are not index-shaped, so a typo cannot drop
      * a data collection). Probes ONLY the named collection — not the
      * whole catalog. */
    def dropSearchIndex(name: String): Unit = {
      val cols = (try resolve(name).columns.toSet
                  catch { case _: Exception => Set.empty[String] })
      val isIndex =
        Set("kind", "path", "term", "df", "n_docs", "avgdl").subsetOf(cols) ||
        Set("cell_id", "centroid").subsetOf(cols)
      if (!isIndex)
        throw new MqlException(
          s"dropSearchIndex: '$name' is not a stored search index")
      spark.sql(s"DROP TABLE $catalog.`$name`"): Unit
    }

    /** `updateSearchIndex` — Mongo's update command rebuilds the
      * definition; here that is a fresh build over the collection
      * (incremental upkeep is `TextIndex.update`/`indexStream`). */
    def updateSearchIndex(coll: String, name: String,
                          paths: Seq[String]): String =
      createSearchIndex(coll, name, paths)

    /** Change-stream surface (`db[coll].watch(pipeline)` — the third
      * Mongo query entry point after find/aggregate): an unbounded
      * stream of change documents in the standard shape
      * `{operationType, ns: {db, coll}, fullDocument}`, with the
      * optional MQL `pipeline` applied to the change documents (the
      * Mongo idiom: `$match` on `fullDocument.<field>`,
      * `$project`, ...).
      *
      * Semantics: the backing store is an append-only collection of
      * document files (the graftdocs micro-batch tail —
      * O(1) (mtime,name) watermark offsets), so every change is an
      * `insert` — the same contract as a change stream on an
      * insert-only collection. Updates/deletes would require a
      * replication log the file layout does not have; a pipeline
      * `$match` on other operationTypes simply yields no rows rather
      * than failing. Each micro-batch carries the newly arrived
      * documents only; watermark/state bounds are the caller's choice
      * of downstream operators. */
    def watch(coll: String, pipelineJson: String = "[]"): DataFrame = {
      val stream = spark.readStream.table(s"$catalog.`$coll`")
      val changes = stream.select(
        lit("insert").as("operationType"),
        struct(lit(catalog).as("db"), lit(coll).as("coll")).as("ns"),
        struct(stream.columns.map(col): _*).as("fullDocument"))
      PipelineCompiler.run(changes, pipelineJson, resolve)
    }

    /** Change-stream replay WITH update/delete operationTypes — the
      * part of `watch`'s contract the append-only tail cannot carry.
      * Works on VERSIONED collections (`writeVersioned` / a
      * `versioned=true` store, where every `$out`/`$merge` rewrite
      * retires the before-image): consecutive snapshots diff into
      * Mongo-shaped change documents `{operationType: insert|update|
      * delete, ns, documentKey, fullDocument, fullDocumentBeforeChange,
      * updatedFields, txnVersion}` — `fullDocument` is the after-image
      * (`fullDocument: updateLookup` comes free from snapshots),
      * `fullDocumentBeforeChange` the 6.0 pre-image option, and the
      * optional MQL `pipeline` applies to the change documents. Batch,
      * not streaming: the replay is bounded by retained history
      * ([[graft.sinks.DocStore.changeEvents]] for the diff shape). */
    def watchOps(coll: String, idCol: String,
                 pipelineJson: String = "[]"): DataFrame = {
      val changes = store.changeEvents(coll, idCol)
        .withColumn("ns",
          struct(lit(catalog).as("db"), lit(coll).as("coll")))
      PipelineCompiler.run(changes, pipelineJson, resolve)
    }
  }
}
