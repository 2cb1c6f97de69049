package graft.mql

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** The unique-key fast path for the `$lookup`/`$graphLookup` row-identity
  * freeze: with a caller-asserted unique+non-null key column, the regroup
  * id IS that column — no `monotonically_increasing_id`, no eager
  * `localCheckpoint(true)` (the 100×-scale full-input materialization).
  * Pins:
  *  - results identical keyed vs keyless on all three freeze sites
  *    (array-localField lookup, correlated let-lookup, graphLookup);
  *  - the keyed plan contains NO checkpoint node (`Scan ExistingRDD`) —
  *    the keyless plan DOES (the freeze is still there when not asserted);
  *  - the assertion dies when a stage may break uniqueness ($unwind,
  *    key-rewriting $addFields/$project) — freeze returns;
  *  - the fast path refuses a re-execution-unstable row set (bare $limit,
  *    nondeterministic input) even when a key is asserted;
  *  - a missing key column raises loudly.
  */
class LookupUniqueKeySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private lazy val orders = Seq(
    (1L, "ann", Seq("p1", "p2")),
    (2L, "bob", Seq("p2")),
    (3L, "cat", Seq.empty[String]),
    (4L, "dan", null.asInstanceOf[Seq[String]])
  ).toDF("_id", "who", "items")

  private lazy val parts = Seq(
    ("p1", "widget", 5.0), ("p2", "gadget", 7.5), ("p3", "gizmo", 1.25)
  ).toDF("part_id", "pname", "price")

  private lazy val edges = Seq(
    ("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")
  ).toDF("src", "dst")

  private val resolve: PipelineCompiler.TableResolver = {
    case "parts" => parts
    case "edges" => edges
    case other => throw new MqlException(s"no table $other")
  }

  private def hasCheckpoint(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r
    }.nonEmpty

  private def canon(df: DataFrame): Seq[String] =
    df.orderBy("_id").collect().toSeq.map(_.json)

  private val arrayLookup =
    """[{"$lookup": {"from": "parts", "localField": "items",
        "foreignField": "part_id", "as": "matched"}}]"""
  private val letLookup =
    """[{"$lookup": {"from": "parts", "let": {"w": "$who"},
        "pipeline": [{"$match": {"$expr": {"$or": [
          {"$eq": ["$$w", "ann"]}, {"$lt": ["$price", 7.0]}]}}}],
        "as": "cheap"}}]"""

  test("array-localField $lookup: keyed ≡ keyless, keyed plan checkpoint-free") {
    val keyless = PipelineCompiler.run(orders, arrayLookup, resolve)
    val keyed = PipelineCompiler.run(orders, arrayLookup, resolve, Some("_id"))
    assert(canon(keyed) == canon(keyless))
    assert(hasCheckpoint(keyless), "keyless path lost its wrong-attach freeze")
    assert(!hasCheckpoint(keyed), "unique key supplied but plan still checkpoints")
  }

  test("correlated let-$lookup: keyed ≡ keyless, keyed plan checkpoint-free") {
    val keyless = PipelineCompiler.run(orders, letLookup, resolve)
    val keyed = PipelineCompiler.run(orders, letLookup, resolve, Some("_id"))
    assert(canon(keyed) == canon(keyless))
    assert(hasCheckpoint(keyless) && !hasCheckpoint(keyed))
  }

  test("$graphLookup: keyed ≡ keyless, keyed plan checkpoint-free") {
    val docs = Seq((10L, "a"), (20L, "b"), (30L, "x")).toDF("_id", "start")
    val p =
      """[{"$graphLookup": {"from": "edges", "startWith": "$start",
          "connectFromField": "dst", "connectToField": "src",
          "as": "reach", "maxDepth": 3}}]"""
    def canon2(df: DataFrame) = df
      .selectExpr("_id", "sort_array(transform(reach, e -> e.dst)) AS r")
      .orderBy("_id").collect().toSeq.map(_.json)
    val keyless = PipelineCompiler.run(docs, p, resolve)
    val keyed = PipelineCompiler.run(docs, p, resolve, Some("_id"))
    assert(canon2(keyed) == canon2(keyless))
    // BFS rounds still checkpoint their frontiers (bounded, intentional);
    // what the key removes is the FULL-INPUT rid freeze — prove it by
    // node count, not absence
    val cpKeyed = keyed.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r }.size
    val cpKeyless = keyless.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r }.size
    assert(cpKeyed < cpKeyless,
      s"keyed graphLookup kept the input freeze ($cpKeyed vs $cpKeyless)")
  }

  test("key survives row-preserving stages, dies on uniqueness breakers") {
    // $match before the lookup: still keyed (no checkpoint)
    val matched = PipelineCompiler.run(orders,
      s"""[{"$$match": {"_id": {"$$gte": 1}}},
           ${arrayLookup.trim.stripPrefix("[").stripSuffix("]")}]""",
      resolve, Some("_id"))
    assert(!hasCheckpoint(matched))
    // $unwind duplicates rows — the assertion must die, freeze returns
    val unwound = PipelineCompiler.run(orders,
      s"""[{"$$unwind": {"path": "$$items", "preserveNullAndEmptyArrays": true}},
           {"$$lookup": {"from": "parts", "localField": "items",
            "foreignField": "part_id", "as": "m"}}]""".stripMargin,
      resolve, Some("_id"))
    // scalar-local lookup has no rid at all; force the array branch after unwind
    val unwoundArr = PipelineCompiler.run(orders,
      s"""[{"$$unwind": {"path": "$$items", "preserveNullAndEmptyArrays": true}},
           {"$$addFields": {"pair": ["$$items"]}},
           {"$$lookup": {"from": "parts", "localField": "pair",
            "foreignField": "part_id", "as": "m"}}]""",
      resolve, Some("_id"))
    assert(hasCheckpoint(unwoundArr), "$unwind did not drop the key assertion")
    assert(unwound.count() >= orders.count())
    // $addFields overwriting the key — assertion dies
    val rewritten = PipelineCompiler.run(orders,
      s"""[{"$$addFields": {"_id": {"$$literal": 1}}},
           ${arrayLookup.trim.stripPrefix("[").stripSuffix("]")}]""",
      resolve, Some("_id"))
    assert(hasCheckpoint(rewritten), "key rewrite did not drop the assertion")
    // $project keeping the key plain — assertion survives
    val projected = PipelineCompiler.run(orders,
      s"""[{"$$project": {"_id": 1, "items": 1}},
           ${arrayLookup.trim.stripPrefix("[").stripSuffix("]")}]""",
      resolve, Some("_id"))
    assert(!hasCheckpoint(projected))
  }

  test("unstable row sets refuse the fast path even with a key") {
    // bare $limit picks an arbitrary subset under scheduling — the
    // id-bearing side executes twice, so the freeze must stay
    val limited = PipelineCompiler.run(orders,
      s"""[{"$$limit": 3},
           ${arrayLookup.trim.stripPrefix("[").stripSuffix("]")}]""",
      resolve, Some("_id"))
    assert(hasCheckpoint(limited), "bare $limit kept the fast path")
    // nondeterministic INPUT plan (caller-side rand) — freeze stays
    val noisy = orders.withColumn("r", org.apache.spark.sql.functions.rand())
    val noisyOut = PipelineCompiler.run(noisy, arrayLookup, resolve, Some("_id"))
    assert(hasCheckpoint(noisyOut), "nondeterministic input kept the fast path")
  }

  test("missing key column raises loudly") {
    intercept[MqlException](
      PipelineCompiler.run(orders, arrayLookup, resolve, Some("nope")))
  }

  test("aggregateWithOptions forwards uniqueKey (accepted, not stripped)") {
    val out = graft.api.Graft.aggregateWithOptions(
      orders, """[{"$match": {"_id": {"$gte": 2}}}]""",
      Map("uniqueKey" -> "_id"))
    assert(out.count() == 3)
    intercept[MqlException](graft.api.Graft.aggregateWithOptions(
      orders, """[{"$match": {}}]""", Map("uniqueKey" -> "nope")))
  }
}
