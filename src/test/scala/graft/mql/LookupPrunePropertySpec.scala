package graft.mql

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Adversarial property for the `$lookup` projection pushdown: for
  * randomized post-lookup stage tails drawn from a grammar that mixes
  * prunable shapes (field paths, $size, $map lambdas, barriers) with
  * give-up shapes (bare alias refs, $filter, whole-doc pushes), the
  * PRUNED compilation (normal pipeline run, lookahead active) must
  * produce exactly the rows of the UNPRUNED one (stages folded one by
  * one with no lookahead). Any analysis unsoundness — a field the
  * pipeline needs that pruning dropped — surfaces as a row mismatch or
  * a resolution error. */
class LookupPrunePropertySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private lazy val left = Seq(
    (1, 10), (2, 20), (3, 10), (4, 99)).toDF("id", "k")
  private lazy val foreign = Seq(
    (10, "x", 1.5, "p1", 7L), (10, "y", 2.5, "p2", 8L),
    (20, "z", 3.5, "p3", 9L), (20, "z", 3.5, "p3", 9L))
    .toDF("fk", "tag", "price", "payload", "wt")
  private def resolve: PipelineCompiler.TableResolver = {
    case "foreign" => foreign
  }

  private val lookupStage =
    """{"$lookup": {"from": "foreign", "localField": "k",
        "foreignField": "fk", "as": "m"}}"""

  // tail-stage grammar: (json, isTerminal)
  private val tails: Vector[String] = Vector(
    """{"$project": {"id": 1, "n": {"$size": "$m"}}}""",
    """{"$project": {"id": 1, "tot": {"$round": [{"$sum":
        {"$map": {"input": "$m", "in": "$$this.price"}}}, 2]}}}""",
    """{"$project": {"id": 1, "tags": {"$map": {"input": "$m",
        "as": "e", "in": "$$e.tag"}}}}""",
    """{"$project": {"id": 1, "m": 1}}""",                       // bare keep
    """{"$project": {"id": 1, "q": "$m"}}""",                    // bare alias
    """{"$project": {"id": 1, "f": {"$filter": {"input": "$m",
        "cond": {"$gt": ["$$this.price", 2]}}}}}""",             // escape
    """{"$match": {"m.tag": {"$ne": "zz"}}}""",
    """{"$match": {"m": {"$elemMatch": {"price": {"$gt": 1}}}}}""",
    """{"$sort": {"id": -1}}""",
    """{"$unwind": "$m"}""",
    """{"$unset": "m"}""",
    """{"$group": {"_id": null, "s": {"$sum": {"$size": "$m"}}}}""",
    """{"$group": {"_id": null, "all": {"$push": "$m"}}}""",     // bare push
    """{"$count": "n"}""",
    """{"$addFields": {"extra": {"$size": "$m"}}}""",
    """{"$replaceWith": {"id2": "$id", "n": {"$size": "$m"}}}"""
  )
  // stages that end the pipeline (or change shape so further grammar
  // picks could reference dropped fields)
  private def terminal(s: String): Boolean =
    s.contains("$group") || s.contains("$count") ||
      s.contains("$unset") || s.contains("$replaceWith") ||
      s.contains("\"m\": 1") || s.contains("\"q\": \"$m\"") ||
      s.contains("$filter") || s.contains("$unwind")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.functions._
    df.select(to_json(struct(df.columns.sorted.map(col): _*)).as("j"))
      .as[String].collect().sorted.toIndexedSeq
  }

  // array-keyed variants: array localField (dedup-identity path) and
  // array foreignField (pre-explode identity) — the review-era bug
  // class the scalar grammar could not reach
  private lazy val leftArr = Seq(
    (1, Seq(10)), (2, Seq(10, 20)), (3, Seq(20, 99)), (4, Seq.empty[Int]))
    .toDF("id", "k")
  private lazy val foreignArr = Seq(
    (Seq(10, 20), "x", 1.5, "p1", 7L), (Seq(10), "y", 2.5, "p2", 8L),
    (Seq(20), "z", 3.5, "p3", 9L), (Seq(20), "z", 3.5, "p3", 9L))
    .toDF("fk", "tag", "price", "payload", "wt")

  private def check(tailCount: Int, seed: Int,
                    leftDf: org.apache.spark.sql.DataFrame,
                    resolver: PipelineCompiler.TableResolver): Unit = {
    val rnd = new scala.util.Random(seed)
    for (_ <- 1 to tailCount) {
      val n = 1 + rnd.nextInt(3)
      val tail = scala.collection.mutable.ArrayBuffer[String]()
      var done = false
      for (_ <- 1 to n if !done) {
        val s = tails(rnd.nextInt(tails.length))
        tail += s
        if (terminal(s)) done = true
      }
      val json = (lookupStage +: tail).mkString("[", ", ", "]")
      val pruned = scala.util.Try(
        canon(PipelineCompiler.run(leftDf, json, resolver)))
      val unpruned = scala.util.Try(canon(
        Mql.parse(json).asInstanceOf[org.json4s.JArray].arr
          .foldLeft(leftDf) { (acc, st) =>
            Mql.asObj(st, "stage") match {
              case List((name, spec)) =>
                PipelineCompiler.applyStage(acc, name, spec, resolver)
              case o => fail(s"bad stage $o")
            }
          }))
      (pruned, unpruned) match {
        case (scala.util.Success(p), scala.util.Success(u)) =>
          assert(p == u, s"pipeline: $json")
        case (scala.util.Failure(_), scala.util.Failure(_)) =>
        case (p, u) => fail(s"pruned=$p unpruned=$u for: $json")
      }
    }
  }

  test("array-keyed pruned ≡ unpruned over 60 random tails each way") {
    check(60, 11, leftArr, { case "foreign" => foreignArr })   // arr ⨝ arr
    check(60, 13, leftArr, { case "foreign" => foreign })      // arr ⨝ scalar
  }

  test("pruned ≡ unpruned over 120 random pipeline tails") {
    val rnd = new scala.util.Random(42)
    var checked = 0
    for (_ <- 1 to 120) {
      val n = 1 + rnd.nextInt(3)
      val tail = scala.collection.mutable.ArrayBuffer[String]()
      var done = false
      for (_ <- 1 to n if !done) {
        val s = tails(rnd.nextInt(tails.length))
        tail += s
        if (terminal(s)) done = true
      }
      val json = (lookupStage +: tail).mkString("[", ", ", "]")
      // pruned: the normal pipeline run (lookahead active)
      val pruned = scala.util.Try(
        canon(PipelineCompiler.run(left, json, resolve)))
      // unpruned: fold the same stages with NO lookahead
      val unpruned = scala.util.Try(canon(
        Mql.parse(json).asInstanceOf[org.json4s.JArray].arr
          .foldLeft(left) { (acc, st) =>
            Mql.asObj(st, "stage") match {
              case List((name, spec)) =>
                PipelineCompiler.applyStage(acc, name, spec, resolve)
              case o => fail(s"bad stage $o")
            }
          }))
      // a grammar pick can be invalid MQL-on-this-shape (e.g. $ne over
      // an un-unwound array path) — then BOTH variants must refuse;
      // pruning may never turn a valid pipeline into a failing one or
      // change any row
      (pruned, unpruned) match {
        case (scala.util.Success(p), scala.util.Success(u)) =>
          assert(p == u, s"pipeline: $json")
        case (scala.util.Failure(_), scala.util.Failure(_)) => // agree
        case (p, u) => fail(s"pruned=$p unpruned=$u for: $json")
      }
      checked += 1
    }
    assert(checked == 120)
  }
}
