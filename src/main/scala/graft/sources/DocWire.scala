package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
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
  *   - the request that crosses the socket IS that document — specs
  *     assert on [[Server.lastRequest]];
  *   - the server evaluates the document with [[FilterCompiler]] (the
  *     engine's own MQL semantics standing in for mongod) and streams
  *     back raw length-prefixed BSON documents — `find_raw_batches`'s
  *     payload shape;
  *   - the client lands the raw batches and decodes them through the
  *     NORMAL graftdocs scan (the direct bytes→vector BSON path), so
  *     wire reads and local reads share one decode codepath.
  *
  * What stays environment-blocked: mongod's actual wire handshake
  * (OP_MSG framing, auth). See LIVE_CONNECTOR.md for the gap map.
  *
  * Scale note: this loopback server streams one cursor; the production
  * shape shards `find` by partition ranges so each Spark task runs its
  * own cursor loop (the reference's thread-pool parallelism,
  * api.py:181-199) — the per-task decode is the same graftdocs reader
  * used here.
  */
object DocWire {

  /** One-shot JSON request: `{"find": coll, "filter": {...}, "limit"?: n}`. */
  final class Server(spark: SparkSession, store: graft.sinks.DocStore) {
    @volatile private var last: String = _
    @volatile private var running = true
    private val socket = new java.net.ServerSocket(0, 8,
      java.net.InetAddress.getLoopbackAddress)

    /** The most recent request document received on the wire — what a
      * live server would have been sent; specs assert the pushed MQL
      * filter appears here verbatim. */
    def lastRequest: String = last
    def port: Int = socket.getLocalPort

    private val acceptor = new Thread(() => {
      while (running) {
        try {
          val conn = socket.accept()
          try serve(conn) finally conn.close()
        } catch {
          case _: java.net.SocketException => () // closed during stop()
          case scala.util.control.NonFatal(e) =>
            if (running) System.err.println(s"[docwire] request failed: $e")
        }
      }
    }, "graft-docwire-server")
    acceptor.setDaemon(true)
    acceptor.start()

    private def serve(conn: java.net.Socket): Unit = {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        conn.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
      val req = in.readLine()
      if (req == null) return
      last = req
      val mapper = graft.bson.DocDecoder.newMapper()
      val node = mapper.readTree(req)
      val coll = node.get("find").asText
      val filter = Option(node.get("filter")).map(_.toString).getOrElse("{}")
      val limit = Option(node.get("limit")).map(_.asLong)

      val df0 = store.read(coll)
      val df1 = df0.where(FilterCompiler.compile(filter))
      val df = limit.map(n => df1.limit(n.toInt)).getOrElse(df1)
      val schema = df.schema

      val out = new java.io.BufferedOutputStream(conn.getOutputStream, 1 << 16)
      // line 1: the cursor's schema (a live connector gets this from its
      // declared schema or first-batch inference); then raw BSON docs
      out.write((schema.json + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val it = df.toLocalIterator()
      while (it.hasNext)
        out.write(graft.bson.BsonBinary.encodeRow(it.next(), schema))
      out.flush()
    }

    def stop(): Unit = { running = false; socket.close() }
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
    val req = {
      val f = FilterTranslator.render(mqlDoc)
      val lim = serverLimit.map(n => s""", "limit": $n""").getOrElse("")
      s"""{"find": "$coll", "filter": $f$lim}"""
    }
    val conn = new java.net.Socket(host, port)
    val dir = java.nio.file.Files.createTempDirectory("graft_wire").toString
    var schema: StructType = null
    try {
      val out = conn.getOutputStream
      out.write((req + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.flush()
      conn.shutdownOutput()
      val in = new java.io.BufferedInputStream(conn.getInputStream, 1 << 16)
      // schema line
      val sb = new java.io.ByteArrayOutputStream()
      var b = in.read()
      while (b != -1 && b != '\n') { sb.write(b); b = in.read() }
      schema = org.apache.spark.sql.types.DataType.fromJson(
        sb.toString("UTF-8")).asInstanceOf[StructType]
      // raw batches land as a .bson file — a real connector hands each
      // cursor batch to the same columnar decoder in memory
      val f = java.nio.file.Paths.get(dir, "batches.bson")
      java.nio.file.Files.copy(in, f)
    } finally conn.close()
    val decoded = spark.read.format("graftdocs").schema(schema).load(dir)
    val filtered = residual.foldLeft(decoded)((df, f) => df.where(filterToColumn(f)))
    if (serverLimit.isEmpty) limit.map(filtered.limit).getOrElse(filtered)
    else filtered
  }

  /** Residual Spark-side re-evaluation: source Filter → Column. Only the
    * shapes [[FilterTranslator]] refuses can appear here. */
  private def filterToColumn(f: Filter): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.sources._
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
