package graft.mql
import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
class FuzzDbgSpec extends AnyFunSuite {
  val spark = SparkFixture.spark
  import spark.implicits._
  test("dbg") {
    val docs = Seq(
      (1L, "spark"), (2L, "sprak"), (3L, "spork"), (4L, "xxxx")
    ).toDF("id", "text")
    def ids(pipe: String): Set[Long] =
      PipelineCompiler.run(docs, pipe).select("id").as[Long].collect().toSet
    val r = ids("""[{"$search": {"text": {"query": "spark", "path": "text",
      "fuzzy": {"maxEdits": 1}}}}]""")
    println(s"RESULT: $r")
  }
}
