package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def clusters(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Components.fromPairs(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long)].collect()
      .map { case (id, c, n) => id -> (c, n) }.toMap

  test("two separate components with correct labels and sizes") {
    val m = clusters(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(m(1L) == (1L, 3L) && m(2L) == (1L, 3L) && m(3L) == (1L, 3L))
    assert(m(10L) == (10L, 2L) && m(11L) == (10L, 2L))
    assert(m.size == 5)
  }

  test("long chain converges past one propagation round") {
    // path graph 9-8-7-...-1: min label must travel 8 hops
    val m = clusters((1L to 8L).map(i => (i, i + 1)))
    assert((1L to 9L).forall(i => m(i) == (1L, 9L)))
  }

  test("duplicate and reversed pairs do not inflate sizes") {
    val m = clusters(Seq((5L, 6L), (6L, 5L), (5L, 6L)))
    assert(m(5L) == (5L, 2L) && m(6L) == (5L, 2L))
  }

  test("string node ids cluster correctly (convergence check is type-agnostic)") {
    // doc ids in real corpora are strings/UUIDs; the old numeric-sum
    // convergence check cast them to null and NPE'd on round one
    val m = Components.fromPairs(
        Seq(("doc-a", "doc-b"), ("doc-b", "doc-c"), ("x", "y")).toDF("a", "b"),
        "a", "b")
      .as[(String, String, Long)].collect()
      .map { case (id, c, n) => id -> (c, n) }.toMap
    assert(m("doc-a") == ("doc-a", 3L) && m("doc-c") == ("doc-a", 3L))
    assert(m("y") == ("x", 2L))
  }

  test("maxIter exhaustion fails loudly instead of returning split clusters") {
    val chain = (1L to 8L).map(i => (i, i + 1)).toDF("a", "b")
    val ex = intercept[IllegalStateException] {
      // localMax = 0 forces the distributed propagation path
      Components.fromPairs(chain, "a", "b", maxIter = 2, localMax = 0L).collect()
    }
    assert(ex.getMessage.contains("maxIter"))
  }

  test("distributed propagation path matches the local union-find path") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (20L, 21L)).toDF("a", "b")
    val local = Components.fromPairs(pairs, "a", "b")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val dist = Components.fromPairs(pairs, "a", "b", localMax = 0L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(local == dist)
  }
}
