package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.bson.DocDecoder
import graft.mql.PipelineCompiler

/** Golden end-to-end test in the shape of the reference's
  * nested_data_in.json → pipeline → nested_data_out.json flow
  * (test_arrow.py:586-599, FIXTURES.md §1.4): decode deeply nested
  * documents with missing lists, project a deep path, unwind it.
  * Data re-authored here (same shape, original values). */
class GoldenNestedSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val docs = Seq(
    """{"i": 0, "object1": {"object11": {"object111":
        {"list1111": [{"field11111": 1.5}, {"field11111": 2.5}],
         "list1112": [{"field11121": "x"}]}}}}""",
    """{"i": 1, "object1": {"object11": {"object111": {}}}}""", // both lists missing
    """{"i": 2, "object1": {"object11": {"object111":
        {"list1111": [{"field11111": 7.25}]}}}}""",
    """{"i": 3, "object1": {"object11": {"object111":
        {"list1111": []}}}}""") // present but empty

  private val inner = StructType(Seq(StructField("field11111", DoubleType)))
  private val schema = StructType(Seq(
    StructField("i", IntegerType),
    StructField("object1", StructType(Seq(
      StructField("object11", StructType(Seq(
        StructField("object111", StructType(Seq(
          StructField("list1111", ArrayType(inner)),
          StructField("list1112", ArrayType(StructType(Seq(
            StructField("field11121", StringType))))))))))))))))

  test("deep projection: missing list → null, not empty (golden semantics)") {
    val decoded = DocDecoder.decode(docs.toDS(), schema)
    val projected = PipelineCompiler.run(decoded,
      """[{"$project": {"i": 1, "col": "$object1.object11.object111.list1111"}},
          {"$sort": {"i": 1}}]""")
    val rows = projected.collect()
    assert(rows(0).getSeq[Row](1).map(_.getDouble(0)) == Seq(1.5, 2.5))
    assert(rows(1).isNullAt(1))            // missing → null
    assert(rows(2).getSeq[Row](1).map(_.getDouble(0)) == Seq(7.25))
    assert(rows(3).getSeq[Row](1).isEmpty) // empty stays empty
  }

  test("projection + unwind drops null/empty and yields elements") {
    val decoded = DocDecoder.decode(docs.toDS(), schema)
    val out = PipelineCompiler.run(decoded,
      """[{"$project": {"i": 1, "col": "$object1.object11.object111.list1111"}},
          {"$unwind": "$col"},
          {"$project": {"i": 1, "v": "$col.field11111"}},
          {"$sort": {"i": 1, "v": 1}}]""")
    assert(out.as[(Int, Double)].collect().toSeq
      == Seq((0, 1.5), (0, 2.5), (2, 7.25)))
  }

  test("nested-path unwind rebuilds the struct in place") {
    val df = Seq((1, ("a", Seq(10, 20))), (2, ("b", Seq(30))))
      .toDF("id", "s")
      .selectExpr("id", "named_struct('tag', s._1, 'xs', s._2) AS s")
    val out = PipelineCompiler.run(df, """[{"$unwind": "$s.xs"}]""")
    assert(out.selectExpr("id", "s.tag", "s.xs").as[(Int, String, Int)]
      .collect().sorted.toSeq
      == Seq((1, "a", 10), (1, "a", 20), (2, "b", 30)))
  }
}
