package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 catalog over a document-collection directory: every
  * subdirectory of `dir` is a collection of `.jsonl`/`.bson` document
  * files (the `graftdocs` layout), addressable straight from SQL —
  * the catalog twin of the reference's `database[collection]` handle
  * (bindings/python/pymongoarrow/api.py:129 takes a pymongo
  * Collection; here the session's catalog resolves one).
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  * spark.conf.set("spark.sql.catalog.graft.dir", "/data/collections")
  * spark.sql("SELECT status, count(*) FROM graft.orders " +
  *           "WHERE qty > 5 GROUP BY status")
  * spark.sql("CREATE TABLE graft.hot AS SELECT * FROM graft.orders WHERE hot")
  * spark.sql("INSERT INTO graft.hot SELECT ...")
  * }}}
  *
  * Everything the `graftdocs` source pushes down (filters incl. the
  * MQL-translated form, column pruning, limit, COUNT(*)/partition
  * MIN-MAX aggregates, partition pruning + runtime DPP, columnar
  * decode) applies unchanged — the catalog hands Spark the same Table
  * implementation the `format("graftdocs")` path builds.
  *
  * Collections are namespace-flat (a DocStore dir IS one database).
  * `CREATE TABLE` records the declared schema (plus identity
  * partitioning) in a `_graft_schema.json` sidecar — hidden by the
  * layout's underscore convention, so scans never read it as data —
  * and `loadTable` prefers the sidecar over schema inference, making
  * catalog round-trips exact where bare-directory reads would
  * re-infer (the reference's declared-schema-vs-inference split,
  * api.py:140-147).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var rootDir: String = _
  private var conf: Map[String, String] = Map.empty

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    rootDir = Option(options.get("dir")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name: 'spark.sql.catalog.$name.dir' is required"))
    conf = options.asScala.toMap - "dir"
  }

  override def name(): String = catalogName

  private def fs = new Path(rootDir)
    .getFileSystem(GraftDocSource.activeHadoopConf())

  private def requireFlat(namespace: Array[String]): Unit =
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)

  /** Names that can never be collections (reserved/path-hazard forms). */
  private def invalidName(n: String): Boolean =
    n.isEmpty || n.contains("/") || n.contains("..") || n.startsWith(".") ||
      n.startsWith("_")

  private def tableDir(ident: Identifier): Path = {
    requireFlat(ident.namespace)
    val n = ident.name
    if (invalidName(n))
      throw new IllegalArgumentException(s"bad collection name '$n'")
    new Path(rootDir, n)
  }

  private def sidecar(dir: Path): Path = new Path(dir, "_graft_schema.json")

  // ---- tables -------------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireFlat(namespace)
    val f = fs
    if (!f.exists(new Path(rootDir))) return Array.empty
    f.listStatus(new Path(rootDir)).toSeq
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith(".") &&
        !s.getPath.getName.startsWith("_"))
      .map(s => Identifier.of(Array.empty, s.getPath.getName))
      .sortBy(_.name)
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean = {
    requireFlat(ident.namespace)
    // a name that can never be a collection is ABSENT, not an error —
    // IF EXISTS probes and tooling sweeps expect false here
    !invalidName(ident.name) && fs.exists(tableDir(ident))
  }

  override def loadTable(ident: Identifier): Table =
    loadFrom(ident, tableDir(ident))

  /** SQL time travel over [[graft.sinks.DocStore]] snapshots:
    * `SELECT … FROM cat.coll VERSION AS OF <v>` resolves the retired
    * version's directory (its schema sidecar and files moved there by
    * pointer rename, so the load path is identical to a live table). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val live = tableDir(ident) // validates the name
    val v = version.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"catalog $catalogName: VERSION AS OF expects a numeric graft version id, got '$version'"))
    val vdir = new Path(rootDir, s".graft_versions/${ident.name}/v$v")
    if (!fs.exists(vdir)) {
      if (!fs.exists(live)) throw new NoSuchTableException(ident)
      throw new IllegalArgumentException(
        s"catalog $catalogName: no version $v of '${ident.name}'")
    }
    loadFrom(ident, vdir)
  }

  /** `TIMESTAMP AS OF <t>`: the snapshot that was LIVE at instant `t`
    * (micros from Spark) — the earliest retired version whose
    * retired-at marker is after `t`; none ⇒ the live table. A version
    * missing its marker (pre-marker writer, crash mid-retire) fails
    * loudly rather than guessing. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val store = new graft.sinks.DocStore(
      org.apache.spark.sql.SparkSession.active, rootDir, "graftdocs")
    tableDir(ident): Unit // validates the name
    val tMs = timestampMicros / 1000L
    val hit = store.versions(ident.name).find { v =>
      store.retiredAt(ident.name, v).getOrElse(throw new IllegalStateException(
        s"catalog $catalogName: version $v of '${ident.name}' has no retired-at marker")) > tMs
    }
    hit match {
      case Some(v) => loadTable(ident, v.toString)
      case None => loadTable(ident)
    }
  }

  private def loadFrom(ident: Identifier, dir: Path): Table = {
    val f = fs
    if (!f.exists(dir)) throw new NoSuchTableException(ident)
    val side = sidecar(dir)
    val stored: Option[(StructType, Map[String, String])] =
      if (f.exists(side)) {
        val in = f.open(side)
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                   finally in.close()
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
        val schema = org.apache.spark.sql.types.DataType
          .fromJson(node.get("schema").toString).asInstanceOf[StructType]
        val extra = Option(node.get("options")).map { o =>
          o.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap
        }.getOrElse(Map.empty[String, String])
        Some((schema, extra))
      } else None
    val baseProps = conf ++ Map("path" -> dir.toString)
    val props = baseProps ++ stored.map(_._2).getOrElse(Map.empty)
    val schema = stored.map(_._1).getOrElse {
      new GraftDocSource().inferSchema(
        new CaseInsensitiveStringMap(props.asJava))
    }
    new GraftDocTable(schema, props)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val dir = tableDir(ident)
    val f = fs
    if (f.exists(dir)) throw new TableAlreadyExistsException(ident)
    // a dropped table's retained snapshots: creating a NEW table under
    // the name would hand it the dead table's history (VERSION/TIMESTAMP
    // AS OF serving foreign data). History counts as existence — the
    // DocStore rename stance — so refuse until it is restored or pruned.
    // (versions(), not a directory probe: the id high-water marker
    // rightly survives pruning and is not history.)
    if (new graft.sinks.DocStore(
        org.apache.spark.sql.SparkSession.active, rootDir, "graftdocs")
        .versions(ident.name).nonEmpty)
      throw new IllegalStateException(
        s"catalog $catalogName: retired versions of '${ident.name}' exist " +
          "(dropped table history); restore or prune them before re-creating")
    val partitionBy: Seq[String] = partitions.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references.head.fieldNames.mkString(".")
      case other => throw new UnsupportedOperationException(
        s"catalog $catalogName: only identity partitioning is supported, got $other")
    }
    if (!f.mkdirs(dir))
      throw new IllegalStateException(s"could not create $dir")
    // persist the declared schema + write routing so loadTable (and
    // every later INSERT) sees exactly what CREATE TABLE declared
    // OPTIONS(...) arrive as `option.`-prefixed properties (Spark's
    // TableCatalog.OPTION_PREFIX) and TBLPROPERTIES keys are free-case:
    // normalize both before whitelisting, or declared write routing is
    // silently dropped (format 'bson' writing jsonl)
    val extra: Map[String, String] =
      properties.asScala.toMap.map { case (k, v) =>
        k.stripPrefix("option.").toLowerCase(java.util.Locale.ROOT) -> v
      }.filter { case (k, _) =>
        k == "format" || k == "allowinvalid" || k == "infermaxdocs"
      } ++
      (if (partitionBy.nonEmpty) Map("partitionby" -> partitionBy.mkString(","))
       else Map.empty)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.set[com.fasterxml.jackson.databind.JsonNode]("schema",
      mapper.readTree(schema.json))
    val opts = root.putObject("options")
    extra.foreach { case (k, v) => opts.put(k, v) }
    val outS = f.create(sidecar(dir), true)
    try outS.write(mapper.writeValueAsBytes(root)) finally outS.close()
    new GraftDocTable(schema, conf ++ extra + ("path" -> dir.toString))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      s"catalog $catalogName: ALTER TABLE is not supported")

  override def dropTable(ident: Identifier): Boolean = {
    requireFlat(ident.namespace)
    if (invalidName(ident.name)) return false // can never exist
    val dir = tableDir(ident)
    val f = fs
    // retired versions survive a drop on purpose (drop + restore = undo,
    // the DocStore contract); re-CREATE over that history refuses in
    // createTable so time travel can never serve a dead table's data
    f.exists(dir) && f.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val f = fs
    val from = tableDir(oldIdent); val to = tableDir(newIdent)
    if (!f.exists(from)) throw new NoSuchTableException(oldIdent)
    if (f.exists(to)) throw new TableAlreadyExistsException(newIdent)
    // route through DocStore.rename: version history FOLLOWS the
    // collection, and a stale target history counts as "target exists"
    // — a raw directory rename would leave the history behind for the
    // next table under the old name to adopt (time-travel hijack)
    new graft.sinks.DocStore(
      org.apache.spark.sql.SparkSession.active, rootDir, "graftdocs")
      .rename(oldIdent.name, newIdent.name)
  }

  // ---- namespaces (flat: the root is the single namespace) ---------------

  override def listNamespaces(): Array[Array[String]] = Array.empty

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    requireFlat(namespace)
    Array.empty
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    requireFlat(namespace)
    Map("location" -> rootDir).asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      s"catalog $catalogName is namespace-flat")

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      s"catalog $catalogName is namespace-flat")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      s"catalog $catalogName is namespace-flat")

  override def defaultNamespace(): Array[String] = Array.empty
}
