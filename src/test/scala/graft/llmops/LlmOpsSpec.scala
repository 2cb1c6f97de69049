package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Pins the operators the DuckDB oracle can't express (xxhash64-based
  * signatures): minhash recall against exact jaccard ground truth on the
  * fixtures' planted near-dups, simhash semantics on constructed docs,
  * LSH precision, multimodal determinism. */
class LlmOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("minhash-LSH recovers exactly the planted near-dup pairs") {
    val truth = Dedup.jaccardPairs(docs, "doc_id", "text", shingleN = 3,
      threshold = 0.8).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val got = Dedup.minhashPairs(docs, "doc_id", "text", shingleN = 3,
      numHashes = 64, bands = 16, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixtures should contain planted near-dups")
    assert(got == truth, s"minhash missed ${truth -- got}, extra ${got -- truth}")
  }

  test("simhash: identical docs distance 0, reordering small, disjoint large") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup
      (3L, "theta eta zeta epsilon delta gamma beta alpha"), // same multiset
      (4L, "totally different words entirely unrelated content here now")
    ).toDF("id", "text")
    val sigs = df.select(col("id"), Dedup.simhash60(col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) == sigs(3L)) // simhash is order-insensitive
    val ham14 = java.lang.Long.bitCount(sigs(1L) ^ sigs(4L))
    assert(ham14 > 10, s"disjoint docs too close: $ham14")
    val pairs = Dedup.simhashPairs(df, "id", "text", maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("null-text docs shingle to [\"\"] (stay in dedup pipelines)") {
    val df = Seq((1L, Some("a b c d")), (2L, None), (3L, None))
      .toDF("id", "text")
    val sh = df.select(Dedup.shingles(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(sh(1) == Seq("") && sh(2) == Seq(""))
  }

  test("signBucket raises on dim mismatch instead of degenerating to one bucket") {
    val bad = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.lshCosinePairs(bad, "vec_id", "embedding", dim = 64).collect()
    }
    assert(e.getMessage.contains("signBucket") ||
      Option(e.getCause).exists(_.getMessage.contains("signBucket")))
  }

  test("embeddingDedup: LSH variant never drops more than exact; LSH is the default") {
    val slice = emb.where(col("vec_id") < 200)
    val exact = Dedup.embeddingDedup(slice, "vec_id", "embedding", 0.4,
      exact = true).select("vec_id").as[Long].collect().toSet
    val approx = Dedup.embeddingDedup(slice, "vec_id", "embedding", 0.4,
      exact = false).select("vec_id").as[Long].collect().toSet
    // LSH candidates ⊆ all pairs → approx drops ⊆ exact drops
    assert(exact.subsetOf(approx))
    // the DEFAULT is the scale path: same result as exact=false
    val dflt = Dedup.embeddingDedup(slice, "vec_id", "embedding", 0.4)
      .select("vec_id").as[Long].collect().toSet
    assert(dflt == approx)
  }

  test("sign-LSH cosine pairs are a subset of exact pairs (precision 1)") {
    val exact = Similarity.cosinePairs(emb, emb, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshCosinePairs(emb, "vec_id", "embedding",
      planes = 8, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(approx.subsetOf(exact), s"false positives: ${approx -- exact}")
  }

  test("brute-force top-k returns k deterministic neighbors per query") {
    val out = Similarity.bruteForceTopK(emb.where(col("vec_id") < 3), emb, k = 5)
    val counts = out.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(counts == Map(0L -> 5L, 1L -> 5L, 2L -> 5L))
    val again = Similarity.bruteForceTopK(emb.where(col("vec_id") < 3), emb, k = 5)
    assert(out.collect().toSeq == again.collect().toSeq)
  }

  test("IVF with exhaustive probing equals brute force; partial probing stays valid") {
    val queries = emb.where(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "match_id", "rnk").as[(Long, Long, Long)].collect().toSet
    val exhaustive = Similarity.ivfTopK(queries, emb, k = 5, nCells = 8, nProbe = 8)
      .select("query_id", "match_id", "rnk").as[(Long, Long, Long)].collect().toSet
    assert(exhaustive == brute) // probing every cell = exact search
    val partial = Similarity.ivfTopK(queries, emb, k = 5, nCells = 8, nProbe = 2)
    val counts = partial.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ == 5L)) // still k results per query
    // partial-probe results are genuine corpus neighbors with true cosines
    val sims = partial.select("cos").as[Double].collect()
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("IVF build-once/query-many equals the one-shot form") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val index = Similarity.buildIvf(emb, nCells = 8, lloydIters = 1)
    try {
      for (slice <- Seq(col("vec_id") < 3, col("vec_id").between(5, 7))) {
        val q = emb.where(slice)
        val viaIndex = Similarity.ivfQuery(index, q, k = 5, nProbe = 2)
          .as[(Long, Long, Double, Long)].collect().toSet
        val oneShot = Similarity.ivfTopK(q, emb, k = 5, nCells = 8, nProbe = 2)
          .as[(Long, Long, Double, Long)].collect().toSet
        assert(viaIndex == oneShot)
      }
    } finally index.unpersist()
  }

  test("multimodal resize fits inside the box; sampleFrames grids duration") {
    import org.apache.spark.sql.Row
    val media = Multimodal.asMediaTable(
      Seq((1L, "x" * 4000), (2L, "")).toDF("doc_id", "text"), "doc_id", "text")
    // doc 1: meta 4000%1920=160 wide, 4000%1080=760 high → scale 100/760
    val r = Multimodal.resize(media, maxW = 200, maxH = 100)
      .select("media_id", "meta.width", "meta.height")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(r(1L) == ((21, 100))) // floor(160*100/760)=21, fits both bounds
    assert(r(2L) == ((0, 0)))    // degenerate dims unchanged
    val f = Multimodal.sampleFrames(media, intervalMs = 1000L)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    assert(f(1L).length == 4)    // 4000 ms → frames at 0,1000,2000,3000
    assert(f(1L).map(_._3).sorted.toSeq == Seq(0L, 1000L, 2000L, 3000L))
    assert(f(2L).toSeq == Seq((2L, 0L, 0L))) // zero duration → poster frame
  }

  test("multimodal feature extraction is deterministic and batch-invariant") {
    val media = Multimodal.asMediaTable(docs.limit(100), "doc_id", "text")
    val a = Multimodal.extractFeatures(media, dim = 8, batchSize = 256)
      .as[(Long, Array[Float])].collect().toMap
    val b = Multimodal.extractFeatures(media, dim = 8, batchSize = 7)
      .as[(Long, Array[Float])].collect().toMap
    assert(a.keySet == b.keySet)
    assert(a.forall { case (k, v) => v.toSeq == b(k).toSeq })
    assert(a.values.forall(_.length == 8))
  }

  test("fingerprint groups docs sharing a vocabulary") {
    val fp = docs.select(TextAnalysis.fingerprint(col("text")).as("fp"))
    assert(fp.distinct().count() < docs.count()) // small vocab → collisions exist
  }

  test("dropNearDuplicates keeps exactly one representative per cluster") {
    val survivors = Dedup.dropNearDuplicates(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text")
    val clusters = graft.operators.Components.fromPairs(pairs, "id_a", "id_b")
      .as[(Long, Long, Long)].collect()
    assert(clusters.nonEmpty, "fixtures should contain planted near-dups")
    // every cluster contributes exactly its min-id member
    clusters.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.map(_._1).min == rep)
      assert(survivors.contains(rep))
      members.map(_._1).filterNot(_ == rep).foreach(m =>
        assert(!survivors.contains(m), s"non-representative $m survived"))
    }
    // docs outside any cluster are untouched
    val clustered = clusters.map(_._1).toSet
    assert(survivors.size ==
      docs.count().toInt - (clustered.size - clusters.map(_._2).distinct.length))
  }
}
