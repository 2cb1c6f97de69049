package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** MinhashBands must be byte-identical to the SQL formulation it
  * replaced (round-11 optimization): for each family member i,
  * mᵢ = min over the hashed shingle set of `xxhash64(i, h)`, then band
  * b's key = `xxhash64(b, m_{b·r}, …, m_{(b+1)·r−1})`. The LSH bucket
  * values are load-bearing — a silent family change would shift
  * candidate recall — so the kernel is pinned against Spark's own
  * xxhash64 on randomized inputs, not against itself. */
class MinhashBandsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val numHashes = 64
  private val bands = 16

  test("one-pass band keys equal the explode -> min-agg -> xxhash64 plan") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { id =>
      val n = rnd.nextInt(40) // incl. 0-length sets
      (id.toLong, Vector.fill(n)(rnd.nextLong()).distinct.sorted)
    }
    val df = rows.toDF("id", "hs")

    // reference: the pre-round-11 SQL formulation, member hashes via
    // Spark's own xxhash64 expression
    val r = numHashes / bands
    val minCols = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("__h"))).as(s"__m$i"))
    val sig = df.select(col("id"), explode(col("hs")).as("__h"))
      .groupBy("id").agg(minCols.head, minCols.tail: _*)
    val bandCols = (0 until bands).map { b =>
      xxhash64(lit(b) +: (b * r until (b + 1) * r).map(j => col(s"__m$j")): _*)
    }
    val expected = sig.select(col("id"), array(bandCols: _*).as("bk"))
      .collect().map(row => row.getLong(0) -> row.getSeq[Long](1).toVector).toMap

    val got = df.select(col("id"),
        call_function("minhash_bands", col("hs"), lit(numHashes), lit(bands)).as("bk"))
      .collect().map(row => row.getLong(0) -> row.getSeq[Long](1).toVector).toMap

    // empty shingle sets: the explode plan emits no signature row; the
    // kernel returns an empty array (explode of which emits no band
    // rows) — same downstream behavior, asserted explicitly
    rows.foreach { case (id, hs) =>
      if (hs.isEmpty) {
        assert(got(id).isEmpty, s"id $id: empty set must yield no bands")
        assert(!expected.contains(id))
      } else {
        assert(got(id) == expected(id), s"id $id: band keys diverged")
      }
    }
  }

  test("null input stays null; geometry must divide") {
    val df = Seq((1L, null.asInstanceOf[Seq[Long]])).toDF("id", "hs")
    val out = df.select(call_function("minhash_bands",
      col("hs"), lit(numHashes), lit(bands))).collect()
    assert(out.head.isNullAt(0))
    intercept[IllegalArgumentException] {
      graft.functions.MinhashBands(
        org.apache.spark.sql.catalyst.expressions.Literal(null), 64, 7)
    }
  }
}
