package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** The fake-wire connector loop (DocWire): a loopback server accepts the
  * translated MQL filter document and streams raw BSON batches; the
  * client decodes them through the normal graftdocs scan. Pins:
  *  - find through the wire ≡ the local scan with the same predicates;
  *  - the request crossing the socket IS FilterTranslator's document
  *    (the PushedMqlFilter the plan advertises);
  *  - untranslatable filters stay client-side residuals and results are
  *    still exact;
  *  - limit rides the wire.
  */
class DocWireSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def fixture(): (graft.sinks.DocStore, DocWire.Server) = {
    val store = new graft.sinks.DocStore(spark,
      java.nio.file.Files.createTempDirectory("graft_wire_srv").toString,
      "graftdocs")
    val ev = graft.api.Graft.table(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts"))
    store.write(ev, "events")
    (store, new DocWire.Server(spark, store))
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("event_id").collect().toSeq.map(_.json)

  test("find through the wire ≡ local scan; wire carries the MQL filter") {
    val (store, server) = fixture()
    try {
      val filters: Seq[Filter] = Seq(
        EqualTo("event_type", "click"), GreaterThan("value", 0.25))
      val wire = DocWire.find(spark, "127.0.0.1", server.port, "events", filters)
      val local = store.read("events")
        .where(col("event_type") === "click" && col("value") > 0.25)
      assert(canon(wire) == canon(local) && wire.count() > 0)
      // the socket saw exactly the translated document
      val (doc, residual) = graft.mql.FilterTranslator.translateAll(filters)
      assert(residual.isEmpty)
      assert(server.lastRequest.contains(graft.mql.FilterTranslator.render(doc)))
      assert(server.lastRequest.contains("\"$eq\":\"click\""))
      assert(server.lastRequest.contains("\"$gt\":0.25"))
    } finally server.stop()
  }

  test("untranslatable filters stay client-side residuals, results exact") {
    val (store, server) = fixture()
    try {
      // Not(EqualTo) has no faithful MQL form (Mongo $ne keeps missing
      // fields) — it must NOT cross the wire, and must still apply
      val filters: Seq[Filter] = Seq(
        GreaterThanOrEqual("user_id", 10L), Not(EqualTo("event_type", "view")))
      val wire = DocWire.find(spark, "127.0.0.1", server.port, "events", filters)
      val local = store.read("events")
        .where(col("user_id") >= 10L && !(col("event_type") === "view"))
      assert(canon(wire) == canon(local) && wire.count() > 0)
      assert(server.lastRequest.contains("\"$gte\":10"))
      assert(!server.lastRequest.contains("view"),
        s"residual leaked onto the wire: ${server.lastRequest}")
    } finally server.stop()
  }

  test("limit + residual filters: limit never reaches the server early") {
    val (store, server) = fixture()
    try {
      // Not(EqualTo) stays a client-side residual; a server-side limit
      // would truncate BEFORE the residual ran and under-return
      val filters: Seq[Filter] = Seq(Not(EqualTo("event_type", "view")))
      val n = 5
      val wire = DocWire.find(spark, "127.0.0.1", server.port, "events",
        filters, limit = Some(n))
      assert(!server.lastRequest.contains("limit"),
        s"limit leaked onto the wire with residuals: ${server.lastRequest}")
      assert(wire.count() == n.toLong)
      // every returned row satisfies the residual
      assert(wire.where(col("event_type") === "view").count() == 0)
      assert(store.read("events").where(!(col("event_type") === "view"))
        .count() >= n.toLong)
    } finally server.stop()
  }

  test("limit rides the wire; decode runs the direct BSON path") {
    val (_, server) = fixture()
    try {
      GraftScanMetrics.direct.reset()
      val wire = DocWire.find(spark, "127.0.0.1", server.port, "events",
        Seq(IsNotNull("value")), limit = Some(7))
      assert(wire.count() == 7)
      assert(GraftScanMetrics.direct.sum() > 0,
        "wire batches did not decode through the direct BSON path")
      assert(server.lastRequest.contains("\"limit\":7"))
    } finally server.stop()
  }

  test("parallel cursors: N range requests, union ≡ local scan, no row twice") {
    val (store, server) = fixture()
    try {
      val before = server.requests.size
      val filters: Seq[Filter] = Seq(GreaterThan("value", 0.1))
      val wire = DocWire.findParallel(spark, "127.0.0.1", server.port,
        "events", splitKey = "event_id", numSplits = 4, filters = filters)
      val local = store.read("events").where(col("value") > 0.1)
      assert(canon(wire) == canon(local) && wire.count() > 0)
      val reqs = server.requests.drop(before)
      // one splits-planning request + one find per range
      val finds = reqs.filter(_.contains("\"find\""))
      assert(reqs.exists(_.contains("\"splits\"")))
      assert(finds.size == 4, s"expected 4 range cursors, got: $finds")
      // every find carries BOTH the user filter and its range conjunct
      assert(finds.forall(r => r.contains("\"$gt\":0.1") && r.contains("event_id")))
      assert(finds.count(_.contains("\"$or\"")) == 1)   // null-absorbing first range
      assert(finds.count(_.contains("\"$gte\"")) == 3)  // lower-bounded ranges
      // each landed batch file is one partition of a single scan
      assert(wire.rdd.getNumPartitions == 4)
    } finally server.stop()
  }

  test("parallel cursors: residuals re-apply client-side after the union") {
    val (store, server) = fixture()
    try {
      val filters: Seq[Filter] = Seq(Not(EqualTo("event_type", "view")))
      val wire = DocWire.findParallel(spark, "127.0.0.1", server.port,
        "events", splitKey = "user_id", numSplits = 3, filters = filters)
      val local = store.read("events").where(!(col("event_type") === "view"))
      assert(canon(wire) == canon(local) && wire.count() > 0)
      assert(server.requests.filter(_.contains("\"find\""))
        .forall(!_.contains("view")), "residual leaked onto the wire")
    } finally server.stop()
  }

  test("server rejects a request missing 'find' with a clear error") {
    val (_, server) = fixture()
    try {
      val conn = new java.net.Socket("127.0.0.1", server.port)
      try {
        conn.getOutputStream.write(
          "{\"filter\":{}}\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        conn.getOutputStream.flush()
        conn.shutdownOutput()
        val line = new java.io.BufferedReader(new java.io.InputStreamReader(
          conn.getInputStream)).readLine()
        assert(line.contains("wireError") && line.contains("missing 'find'"))
      } finally conn.close()
    } finally server.stop()
  }

  test("collection names with quotes escape instead of corrupting the frame") {
    val (store, server) = fixture()
    try {
      val weird = "ev\"ents"
      store.write(store.read("events").limit(10), weird)
      val wire = DocWire.find(spark, "127.0.0.1", server.port, weird)
      assert(wire.count() == 10)
      assert(server.lastRequest.contains("\"find\":\"ev\\\"ents\""))
    } finally server.stop()
  }
}
