package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** GraftExtensions injection: the native function surface must resolve
  * in a BRAND-NEW session state with no imperative register() call.
  * `newSession()` is the discriminating probe — temp functions
  * registered imperatively on the fixture session do NOT carry over to
  * a new session, extension-injected ones do. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("extension-injected functions resolve in a fresh session state") {
    val fresh = spark.newSession()
    val j = fresh.sql(
      "SELECT jaccard_sim(array('a','b'), array('b','c')) AS j").head.getDouble(0)
    assert(math.abs(j - 1.0 / 3.0) < 1e-12)
    val sh = fresh.sql(
      "SELECT word_shingles(array('a','b','c'), 2) AS s").head.getSeq[String](0)
    assert(sh == Seq("a b", "b c"))
  }

  test("every registration is injected (surfaces cannot drift)") {
    val fresh = spark.newSession()
    GraftFunctions.registrations.foreach { case (name, _) =>
      assert(fresh.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"$name missing from extension-injected registry")
    }
  }
}
