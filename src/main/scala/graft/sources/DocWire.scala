package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.json4s.{JArray, JObject, JValue}
import graft.mql.{FilterCompiler, FilterTranslator}

/** Loopback document-wire protocol — the testable shape of a live
  * MongoDB connector's client loop (reference api.py:175:
  * `find_raw_batches(filter) → raw BSON batches → columnar decode`)
  * without a mongod in the environment.
  *
  * The pieces a REAL connector needs are all exercised for real here:
  *   - the client translates Catalyst source `Filter`s to the MQL wire
  *     document via [[FilterTranslator]] (untranslatable shapes stay
  *     client-side residuals, exactly the connector contract);
  *   - the request that crosses the socket IS that document, rendered
  *     through Jackson (collection names with quotes/newlines escape
  *     instead of corrupting the line-framed protocol) — specs assert
  *     on [[Server.lastRequest]]/[[Server.requests]];
  *   - the server evaluates the document with [[FilterCompiler]] (the
  *     engine's own MQL semantics standing in for mongod) and streams
  *     back raw length-prefixed BSON documents — `find_raw_batches`'s
  *     payload shape;
  *   - the client lands the raw batches and decodes them through the
  *     NORMAL graftdocs scan (the direct bytes→vector BSON path), so
  *     wire reads and local reads share one decode codepath;
  *   - [[findParallel]] is the reference's thread-pool cursor
  *     parallelism (api.py:181-199): the collection splits into
  *     key-range cursors planned from server-side quantiles (the
  *     MongoSamplePartitioner shape), one wire request per range, each
  *     landed batch file becoming one Spark partition of a single scan.
  *
  * The REAL wire envelope lives next door: [[OpMsg]] speaks MongoDB's
  * OP_MSG framing (opcode 2013) and the find/getMore cursor lifecycle
  * over the same stand-in. What stays environment-blocked is auth
  * (SCRAM-SHA-256/TLS); see LIVE_CONNECTOR.md for the gap map.
  */
object DocWire {

  private val UTF8 = java.nio.charset.StandardCharsets.UTF_8

  /** One-shot JSON requests, one connection each, one JSON line in:
    *   `{"find": coll, "filter": {...}, "limit"?: n}` → schema line +
    *     raw BSON docs;
    *   `{"splits": coll, "key": k, "n": n}` → one JSON array line of
    *     approximate key quantiles (the split-planning command a live
    *     connector gets from `splitVector`/`$sample`).
    * Malformed requests answer a `{"wireError": msg}` line instead of
    * NPE-ing the connection. Each connection serves on its own daemon
    * thread, so parallel cursors really run in parallel. */
  final class Server(spark: SparkSession, store: graft.sinks.DocStore) {
    @volatile private var last: String = _
    @volatile private var running = true
    private val reqs = new java.util.concurrent.CopyOnWriteArrayList[String]()
    private val socket = new java.net.ServerSocket(0, 16,
      java.net.InetAddress.getLoopbackAddress)

    /** The most recent request document received on the wire — what a
      * live server would have been sent; specs assert the pushed MQL
      * filter appears here verbatim. */
    def lastRequest: String = last

    /** Every request received, in arrival order. */
    def requests: Seq[String] = {
      import scala.jdk.CollectionConverters._
      reqs.asScala.toSeq
    }
    def port: Int = socket.getLocalPort

    private val acceptor = new Thread(() => {
      while (running) {
        try {
          val conn = socket.accept()
          val worker = new Thread(() => {
            try serve(conn)
            catch {
              case scala.util.control.NonFatal(e) =>
                if (running) System.err.println(s"[docwire] request failed: $e")
            } finally conn.close()
          }, "graft-docwire-worker")
          worker.setDaemon(true)
          worker.start()
        } catch {
          case _: java.net.SocketException => () // closed during stop()
          case scala.util.control.NonFatal(e) =>
            if (running) System.err.println(s"[docwire] accept failed: $e")
        }
      }
    }, "graft-docwire-server")
    acceptor.setDaemon(true)
    acceptor.start()

    private def serve(conn: java.net.Socket): Unit = {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        conn.getInputStream, UTF8))
      val req = in.readLine()
      if (req == null) return
      last = req
      reqs.add(req): Unit
      val mapper = graft.bson.DocDecoder.newMapper()
      val out = new java.io.BufferedOutputStream(conn.getOutputStream, 1 << 16)
      def fail(msg: String): Unit = {
        val err = mapper.createObjectNode()
        err.put("wireError", msg): Unit
        out.write((err.toString + "\n").getBytes(UTF8))
        out.flush()
      }
      val node =
        try mapper.readTree(req)
        catch { case scala.util.control.NonFatal(_) => fail("request is not JSON"); return }

      if (node.has("splits")) {
        val coll = node.get("splits").asText
        val key = node.get("key")
        val n = Option(node.get("n")).map(_.asInt).getOrElse(0)
        if (key == null) { fail("splits request missing 'key'"); return }
        if (n < 2) { fail("splits request needs n >= 2"); return }
        val bounds = store.read(coll).stat
          .approxQuantile(key.asText, (1 until n).map(_.toDouble / n).toArray, 0.001)
          .distinct.sorted
        val arr = mapper.createArrayNode()
        bounds.foreach(b => arr.add(b): Unit)
        out.write((arr.toString + "\n").getBytes(UTF8))
        out.flush()
        return
      }
      if (!node.has("find")) { fail("request missing 'find'"); return }

      val coll = node.get("find").asText
      val filter = Option(node.get("filter")).map(_.toString).getOrElse("{}")
      val limit = Option(node.get("limit")).map(_.asLong)

      val df0 = store.read(coll)
      val df1 = df0.where(FilterCompiler.compile(filter))
      val df = limit.map(n => df1.limit(n.toInt)).getOrElse(df1)
      val schema = df.schema

      // line 1: the cursor's schema (a live connector gets this from its
      // declared schema or first-batch inference); then raw BSON docs
      out.write((schema.json + "\n").getBytes(UTF8))
      val it = df.toLocalIterator()
      while (it.hasNext)
        out.write(graft.bson.BsonBinary.encodeRow(it.next(), schema))
      out.flush()
    }

    def stop(): Unit = { running = false; socket.close() }
  }

  /** Render the wire request with Jackson — a quote/backslash/newline in
    * the collection name escapes instead of corrupting the line framing. */
  private def renderRequest(coll: String, filterJson: String,
                            limit: Option[Int]): String = {
    val m = graft.bson.DocDecoder.newMapper()
    val root = m.createObjectNode()
    root.put("find", coll): Unit
    root.set[JsonNode]("filter", m.readTree(filterJson)): Unit
    limit.foreach(n => root.put("limit", n): Unit)
    m.writeValueAsString(root)
  }

  /** One request/response exchange: send `req`, read the schema line
    * (raising on a `wireError` line), land the raw batch bytes at
    * `target`. Returns the cursor schema. */
  private def fetch(host: String, port: Int, req: String,
                    target: java.nio.file.Path): StructType = {
    val conn = new java.net.Socket(host, port)
    try {
      val out = conn.getOutputStream
      out.write((req + "\n").getBytes(UTF8))
      out.flush()
      conn.shutdownOutput()
      val in = new java.io.BufferedInputStream(conn.getInputStream, 1 << 16)
      val sb = new java.io.ByteArrayOutputStream()
      var b = in.read()
      while (b != -1 && b != '\n') { sb.write(b); b = in.read() }
      val line1 = sb.toString("UTF-8")
      if (line1.contains("\"wireError\"")) {
        val err = graft.bson.DocDecoder.newMapper().readTree(line1)
        if (err.has("wireError"))
          throw new IllegalArgumentException(
            s"wire request rejected: ${err.get("wireError").asText}")
      }
      val schema = org.apache.spark.sql.types.DataType.fromJson(line1)
        .asInstanceOf[StructType]
      java.nio.file.Files.copy(in, target): Unit
      schema
    } finally conn.close()
  }

  /** Client `find`: translate the pushed filters, send the wire request,
    * land the raw BSON batches, decode through the normal graftdocs scan
    * (direct BSON→vector path), and apply residual filters Spark-side.
    * Returns the decoded DataFrame. */
  def find(spark: SparkSession, host: String, port: Int, coll: String,
           filters: Seq[Filter] = Seq.empty,
           limit: Option[Int] = None): DataFrame = {
    val (mqlDoc, residual) = FilterTranslator.translateAll(filters)
    // limit rides the wire ONLY when the filter translated fully: with
    // residuals the server would limit BEFORE the client-side filter
    // ran, silently under-returning — the same rule a DSv2 scan applies
    // (pushLimit is refused while filters stay residual); the limit
    // then applies client-side after the residuals
    val serverLimit = limit.filter(_ => residual.isEmpty)
    val req = renderRequest(coll, FilterTranslator.render(mqlDoc), serverLimit)
    val dir = java.nio.file.Files.createTempDirectory("graft_wire")
    val schema = fetch(host, port, req, dir.resolve("batches.bson"))
    val decoded = spark.read.format("graftdocs").schema(schema).load(dir.toString)
    val filtered = residual.foldLeft(decoded)((df, f) => df.where(filterToColumn(f)))
    if (serverLimit.isEmpty) limit.map(filtered.limit).getOrElse(filtered)
    else filtered
  }

  /** Ask the server for approximate quantile boundaries of `key` — the
    * split-planning round trip (`splitVector`'s role). */
  def splitBounds(host: String, port: Int, coll: String, key: String,
                  numSplits: Int): Seq[Double] = {
    val m = graft.bson.DocDecoder.newMapper()
    val root = m.createObjectNode()
    root.put("splits", coll): Unit
    root.put("key", key): Unit
    root.put("n", numSplits): Unit
    val conn = new java.net.Socket(host, port)
    try {
      val out = conn.getOutputStream
      out.write((m.writeValueAsString(root) + "\n").getBytes(UTF8))
      out.flush()
      conn.shutdownOutput()
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        conn.getInputStream, UTF8))
      val line = in.readLine()
      val node = m.readTree(line)
      if (node.has("wireError"))
        throw new IllegalArgumentException(
          s"wire request rejected: ${node.get("wireError").asText}")
      import scala.jdk.CollectionConverters._
      node.elements().asScala.map(_.asDouble).toSeq
    } finally conn.close()
  }

  /** Parallel-cursor `find` — the reference's thread-pool cursor loop
    * (api.py:181-199) over the partition plan a live connector builds
    * from `splitVector`: plan `numSplits` half-open key ranges from
    * server quantiles, send ONE wire request per range (the range rides
    * as an extra `$and` conjunct on the translated filter), land each
    * cursor's batches as its own file, and read them all through ONE
    * graftdocs scan — each batch file is one Spark partition.
    *
    * Range boundaries are half-open `[lo, hi)` sharing endpoints, so no
    * row lands twice; null/missing keys ride the FIRST range (its filter
    * is `{$or: [{k: null}, {k: {$lt: b0}}]}` — BSON sorts null lowest).
    * The split key must be numeric (quantile planning); non-numeric keys
    * raise server-side through the quantile call. */
  def findParallel(spark: SparkSession, host: String, port: Int, coll: String,
                   splitKey: String, numSplits: Int,
                   filters: Seq[Filter] = Seq.empty,
                   limit: Option[Int] = None): DataFrame = {
    require(numSplits >= 1, s"numSplits must be >= 1, got $numSplits")
    val bounds =
      if (numSplits == 1) Seq.empty
      else splitBounds(host, port, coll, splitKey, numSplits)
    if (bounds.isEmpty) return find(spark, host, port, coll, filters, limit)

    val ranges: Seq[Filter] = {
      val first: Filter = Or(IsNull(splitKey), LessThan(splitKey, bounds.head))
      val mids = bounds.sliding(2).collect { case Seq(lo, hi) =>
        And(GreaterThanOrEqual(splitKey, lo), LessThan(splitKey, hi)): Filter
      }.toSeq
      val lastR: Filter = GreaterThanOrEqual(splitKey, bounds.last)
      (first +: mids) :+ lastR
    }
    val (mqlDoc, residual) = FilterTranslator.translateAll(filters)
    def withRange(r: Filter): JValue = {
      // range shapes are always translatable (Or/And over IsNull/$lt/$gte)
      val rangeDoc = FilterTranslator.translate(r).get
      mqlDoc match {
        case JObject(Nil) => rangeDoc
        case other => JObject(List("$and" -> JArray(List(other, rangeDoc))))
      }
    }

    val dir = java.nio.file.Files.createTempDirectory("graft_wirep")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(ranges.size, 8))
    val schema =
      try {
        val futs = ranges.zipWithIndex.map { case (r, i) =>
          pool.submit(new java.util.concurrent.Callable[StructType] {
            def call(): StructType = fetch(host, port,
              renderRequest(coll, FilterTranslator.render(withRange(r)), None),
              dir.resolve(f"batch-$i%05d.bson"))
          })
        }
        futs.map(_.get()).head
      } finally pool.shutdown()
    val decoded = spark.read.format("graftdocs").schema(schema).load(dir.toString)
    val filtered = residual.foldLeft(decoded)((df, f) => df.where(filterToColumn(f)))
    limit.map(filtered.limit).getOrElse(filtered)
  }

  /** Residual Spark-side re-evaluation: source Filter → Column. Only the
    * shapes [[FilterTranslator]] refuses can appear here. */
  private[sources] def filterToColumn(f: Filter): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.col
    f match {
      case EqualTo(a, v) => col(a) === v
      case EqualNullSafe(a, v) => col(a) <=> v
      case GreaterThan(a, v) => col(a) > v
      case GreaterThanOrEqual(a, v) => col(a) >= v
      case LessThan(a, v) => col(a) < v
      case LessThanOrEqual(a, v) => col(a) <= v
      case IsNull(a) => col(a).isNull
      case IsNotNull(a) => col(a).isNotNull
      case In(a, vs) => col(a).isin(vs.toIndexedSeq: _*)
      case StringStartsWith(a, s) => col(a).startsWith(s)
      case StringEndsWith(a, s) => col(a).endsWith(s)
      case StringContains(a, s) => col(a).contains(s)
      case And(l, r) => filterToColumn(l) && filterToColumn(r)
      case Or(l, r) => filterToColumn(l) || filterToColumn(r)
      case Not(inner) => !filterToColumn(inner)
      case other => throw new IllegalArgumentException(
        s"unsupported residual filter $other")
    }
  }
}
