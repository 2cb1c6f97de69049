package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Specs for the round-4 ANN/dedup additions: SemDeDup cluster-then-
  * prune, product quantization (encode + ADC top-k), and BM25
  * retrieval. */
class AnnDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  // 4-dim toy embeddings: ids 1/2 nearly parallel (near-dups), 3
  // orthogonal to them, 4 a near-dup of 3, 5 isolated
  private def toyVecs = Seq(
    (1L, Seq(1.0, 0.0, 0.0, 0.0)),
    (2L, Seq(0.99, 0.1, 0.0, 0.0)),
    (3L, Seq(0.0, 0.0, 1.0, 0.0)),
    (4L, Seq(0.0, 0.0, 0.98, 0.15)),
    // not (0.5,-0.5,…): that vector PQ-collapses onto vec 1's codewords
    // (each subspace quantizes to (1,0)/(0,0)), tying the ADC-0 twin
    (5L, Seq(-1.0, -1.0, 1.0, 1.0))
  ).toDF("vec_id", "embedding")

  test("semanticDedup with nCells=1 equals exact embedding dedup") {
    val sem = Dedup.semanticDedup(toyVecs, "vec_id", "embedding",
      threshold = 0.9, nCells = 1)
      .select("vec_id").as[Long].collect().sorted.toSeq
    val exact = Dedup.embeddingDedup(toyVecs, "vec_id", "embedding",
      threshold = 0.9, exact = true)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(sem == exact)
    // both near-dup families lose their higher id
    assert(!sem.contains(2L) && !sem.contains(4L))
    assert(sem.contains(1L) && sem.contains(3L) && sem.contains(5L))
  }

  test("semanticDedup never drops more than the exact ground truth") {
    val exact = Dedup.embeddingDedup(toyVecs, "vec_id", "embedding",
      threshold = 0.9, exact = true)
      .select("vec_id").as[Long].collect().toSet
    for (cells <- Seq(2, 3)) {
      val sem = Dedup.semanticDedup(toyVecs, "vec_id", "embedding",
        threshold = 0.9, nCells = cells)
        .select("vec_id").as[Long].collect().toSet
      // clustering can only LOSE candidate pairs (cross-cluster dups
      // survive) — survivors are a superset of the exact survivors
      assert(exact.subsetOf(sem), s"nCells=$cells dropped a non-dup")
    }
  }

  test("pqEncode emits one in-range code per subspace; twins share codes") {
    val df = toyVecs.union(Seq((6L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("a", "b"))
    val cb = Similarity.pqTrain(df, m = 2, codes = 4, dim = 4)
    assert(cb.m == 2 && cb.dsub == 2)
    val enc = Similarity.pqEncode(df, cb)
      .as[(Long, Seq[Int])].collect().toMap
    assert(enc.size == 6)
    assert(enc.values.forall(c => c.length == 2 && c.forall(j => j >= 0 && j < 4)))
    // identical vectors quantize identically
    assert(enc(1L) == enc(6L))
  }

  test("pqTopK: an exact twin is the rank-1 match at ADC 0") {
    val df = toyVecs.union(Seq((6L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("a", "b"))
    val top = Similarity.pqTopK(df.where($"vec_id" === 1), df, k = 3,
      m = 2, codes = 4, dim = 4)
      .select("match_id", "adc", "rnk").as[(Long, Double, Long)]
      .collect().sortBy(_._3)
    assert(top.head._1 == 6L, "twin should rank first")
    assert(top.head._2 == 0.0, "twin of an encodable vector scores ADC 0")
    assert(top.map(_._3).toSeq == Seq(1L, 2L, 3L))
  }

  test("ivfPqTopK with exhaustive probing equals pqTopK") {
    val df = toyVecs
    val q = df.where($"vec_id" <= 2)
    val full = Similarity.pqTopK(q, df, k = 3, m = 2, codes = 4, dim = 4)
      .select("query_id", "match_id", "adc", "rnk")
      .as[(Long, Long, Double, Long)].collect().toSet
    val ivfpq = Similarity.ivfPqTopK(q, df, k = 3, nCells = 2, nProbe = 2,
      m = 2, codes = 4, dim = 4)
      .select("query_id", "match_id", "adc", "rnk")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(ivfpq == full)
    // partial probing: every returned (pair, adc) agrees with the
    // exhaustive scorer — probing changes WHICH pairs are scored,
    // never the score
    val allAdc = Similarity.pqTopK(q, df, k = 4, m = 2, codes = 4, dim = 4)
      .select("query_id", "match_id", "adc")
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val part = Similarity.ivfPqTopK(q, df, k = 3, nCells = 2, nProbe = 1,
      m = 2, codes = 4, dim = 4)
      .select("query_id", "match_id", "adc")
      .as[(Long, Long, Double)].collect()
    assert(part.nonEmpty)
    part.foreach { case (qid, mid, adc) =>
      assert(allAdc((qid, mid)) == adc, s"adc drift for ($qid,$mid)")
    }
  }

  test("semanticDedup and pqTopK are invariant to partitioning") {
    // the hash-ordered seed sample is a total order with id tiebreak —
    // repartitioning must not move centroids/codebooks or results
    val base = toyVecs.union(Seq(
      (6L, Seq(0.3, 0.4, 0.5, 0.6)), (7L, Seq(0.31, 0.41, 0.5, 0.6))
    ).toDF("a", "b"))
    def sem(df: org.apache.spark.sql.DataFrame) =
      Dedup.semanticDedup(df, "vec_id", "embedding", 0.9, nCells = 3)
        .select("vec_id").as[Long].collect().sorted.toSeq
    def pq(df: org.apache.spark.sql.DataFrame) =
      Similarity.pqTopK(df.where($"vec_id" <= 2), df, k = 3,
        m = 2, codes = 4, dim = 4)
        .select("query_id", "match_id", "adc", "rnk")
        .as[(Long, Long, Double, Long)].collect().sortBy(t => (t._1, t._4)).toSeq
    val s1 = sem(base.repartition(1)); val p1 = pq(base.repartition(1))
    for (n <- Seq(4, 32)) {
      assert(sem(base.repartition(n)) == s1, s"semanticDedup drifted at $n")
      assert(pq(base.repartition(n)) == p1, s"pqTopK drifted at $n")
    }
  }

  test("pqRefine: Lloyd iterations never increase quantization distortion") {
    import org.apache.spark.sql.functions.{call_function, typedlit, avg, col}
    graft.functions.GraftFunctions.register(spark)
    // 24 vectors in R^4 with real cluster structure
    val df = (1L to 24L).map { i =>
      val base = (i % 3).toInt
      (i, Seq(base * 2.0 + 0.01 * i, 1.0 - base, 0.5 * base, -base + 0.02 * i))
    }.toDF("vec_id", "embedding")
    def distortion(cb: Similarity.PqCodebook): Double = {
      val v = col("embedding").cast("array<double>")
      df.select(call_function("pq_adc", v,
          call_function("pq_encode", v, typedlit(cb.books)),
          typedlit(cb.books)).as("d"))
        .agg(avg("d")).head.getDouble(0)
    }
    val cb0 = Similarity.pqTrain(df, m = 2, codes = 3, dim = 4)
    val d0 = distortion(cb0)
    val cb1 = Similarity.pqRefine(df, cb0, iters = 1)
    val d1 = distortion(cb1)
    val cb2 = Similarity.pqRefine(df, cb0, iters = 2)
    val d2 = distortion(cb2)
    assert(d1 <= d0 + 1e-12, s"one iteration worsened distortion: $d0 -> $d1")
    assert(d2 <= d1 + 1e-12, s"second iteration worsened distortion: $d1 -> $d2")
    assert(cb1.m == cb0.m && cb1.dsub == cb0.dsub)
  }

  test("rrfFuse: hand-computed fusion, topK bound, id tie-break") {
    val sysA = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L))
      .toDF("query_id", "match_id", "rnk")
    val sysB = Seq((0L, 11L, 1L), (0L, 10L, 2L), (0L, 13L, 3L))
      .toDF("query_id", "match_id", "rnk")
    val fused = Similarity.rrfFuse(Seq(sysA, sysB), topK = 3)
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4)
    def r(rs: Long*) = math.rint(rs.map(x => 1.0 / (60 + x)).sum * 1e6) / 1e6
    // 10 (ranks 1+2) and 11 (ranks 2+1) tie exactly → lower id first;
    // 12 and 13 both carry a single rank-3 → lower id takes the last slot
    assert(fused.map(t => (t._2, t._3)).toSeq ==
      Seq((10L, r(1, 2)), (11L, r(2, 1)), (12L, r(3))))
    assert(fused.map(_._4).toSeq == Seq(1L, 2L, 3L))
  }

  test("bm25TopK matches the hand-computed formula and honors k") {
    val docs = Seq(
      (1L, "spark spark fast"),
      (2L, "slow database"),
      (3L, "spark")
    ).toDF("doc_id", "text")
    val got = TfIdf.bm25TopK(docs, "doc_id", "text", Seq("spark"), k = 2)
      .select("doc_id", "score", "rnk").as[(Long, Double, Long)]
      .collect().sortBy(_._3)
    // N=3, avgdl=2, df(spark)=2 → idf = ln(1 + 1.5/2.5)
    val idf = math.log(1 + 1.5 / 2.5)
    def s(tf: Double, dl: Double) =
      math.rint(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 2.0)) * 1e6) / 1e6
    // length normalization puts the 1-token doc above the 3-token one
    assert(got.map(_._1).toSeq == Seq(3L, 1L))
    assert(got(0)._2 == s(1, 1) && got(1)._2 == s(2, 3))
  }

  test("meanPool: hand-computed pooling, null vectors skipped, " +
       "all-null group is null, dim mismatch raises") {
    val df = Seq(
      ("a", Seq(1.0, 3.0)), ("a", Seq(3.0, 5.0)),
      ("b", Seq(10.0, 20.0)),
      ("c", null)
    ).toDF("g", "v")
      .union(Seq(("a", null: Seq[Double])).toDF("g", "v")) // null skipped
    val got = df.groupBy("g").agg(Similarity.meanPool($"v").as("p"))
      .collect().map(r => r.getString(0) ->
        Option(r.getSeq[Double](1)).map(_.toSeq)).toMap
    assert(got("a").contains(Seq(2.0, 4.0)))
    assert(got("b").contains(Seq(10.0, 20.0)))
    assert(got("c").isEmpty) // all-null group pools to null, not zeros
    // float input casts in; single global group works too
    val one = Seq((1, Seq(1.0f, 2.0f)), (2, Seq(3.0f, 4.0f)))
      .toDF("id", "v").agg(Similarity.meanPool($"v")).head.getSeq[Double](0)
    assert(one.toSeq == Seq(2.0, 3.0))
    // ragged dims refuse rather than zero-pad
    val bad = Seq(("a", Seq(1.0, 2.0)), ("a", Seq(1.0, 2.0, 3.0)))
      .toDF("g", "v")
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    val e = intercept[Exception] {
      bad.groupBy("g").agg(Similarity.meanPool($"v")).collect()
    }
    assert(causes(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("dimension mismatch")), e.toString)
    // a zero-LENGTH vector is a dim-0 input, not an uninitialized
    // buffer: mixing it with dim-2 must raise, never silently restart
    // accumulation (review-found: [[], [2,4]] used to pool to [1,2])
    val emptyMix = Seq(("a", Seq.empty[Double]), ("a", Seq(2.0, 4.0)))
      .toDF("g", "v")
    val e2 = intercept[Exception] {
      emptyMix.groupBy("g").agg(Similarity.meanPool($"v")).collect()
    }
    assert(causes(e2).exists(c => c.getMessage != null &&
      c.getMessage.contains("dimension mismatch")), e2.toString)
  }

  test("hardNegatives: positives anti-joined out, cos ceiling drops " +
       "unlabeled near-dups, ranking matches bruteForceTopK residue") {
    val vecs = toyVecs
    // query = vec 1; positives say (1,2) is a labeled pair
    val q = vecs.where($"vec_id" === 1L)
    val pos = Seq((1L, 2L)).toDF("query_id", "match_id")
    val negs = Similarity.hardNegatives(q, vecs, pos, k = 10)
      .select("match_id").as[Long].collect().toSet
    // 2 is a positive (excluded); self excluded; 3,4,5 remain
    assert(negs == Set(3L, 4L, 5L))
    // without the positives table, 2 is the hardest negative (rank 1)
    val all = Similarity.hardNegatives(q, vecs,
      Seq.empty[(Long, Long)].toDF("query_id", "match_id"), k = 10)
      .orderBy("rnk").select("match_id").as[Long].collect()
    assert(all.head == 2L)
    // maxCos treats near-parallel vec 2 as an unlabeled positive
    val guarded = Similarity.hardNegatives(q, vecs,
      Seq.empty[(Long, Long)].toDF("query_id", "match_id"), k = 10,
      maxCos = 0.9)
      .select("match_id").as[Long].collect().toSet
    assert(!guarded.contains(2L) && guarded.contains(3L))
    // the DEFAULT ceiling is off: an exact duplicate of the query under
    // another id (cos rounds to 1.0) is the hardest negative and must
    // survive when nobody opted into the guard
    val withDup = vecs.union(Seq((7L, Seq(1.0, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding"))
    val dflt = Similarity.hardNegatives(q, withDup,
      Seq.empty[(Long, Long)].toDF("query_id", "match_id"), k = 10)
      .orderBy("rnk")
    assert(dflt.select("match_id").as[Long].collect().head == 7L)
    assert(dflt.select("cos").as[Double].collect().head == 1.0)
    // the surviving ranking is exactly bruteForceTopK's with the
    // excluded ids removed and ranks recomputed
    val brute = Similarity.bruteForceTopK(q, vecs, k = 10)
      .where(!$"match_id".isin(2L))
      .orderBy($"cos".desc, $"match_id".asc)
      .select("match_id").as[Long].collect().toSeq
    val mined = Similarity.hardNegatives(q, vecs, pos, k = 10)
      .orderBy("rnk").select("match_id").as[Long].collect().toSeq
    assert(mined == brute)
  }

  test("hardNegatives ANN legs: ivf/pq candidates compose with the " +
       "anti-join + window; ivf recall vs exact measured") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where($"vec_id" < 8)
    val pos = q.select($"vec_id".as("query_id"), $"label")
      .join(e.select($"vec_id".as("match_id"), $"label".as("cl")),
        $"label" === $"cl")
      .select("query_id", "match_id")
    val exact = Similarity.hardNegatives(q, e, pos, k = 10)
    // exhaustive probing degrades IVF to exact — identical output when
    // the candidate pool covers everything the exact leg ranked
    val ivfExhaustive = Similarity.hardNegatives(q, e, pos, k = 10,
      scorer = "ivf", candidates = 1000000, nCells = 4, nProbe = 4)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rnk").collect().toSeq.map(_.json)
    assert(canon(ivfExhaustive) == canon(exact))
    // partial probing: measure recall@10 of the ivf leg vs exact — the
    // contract is "high but approximate", pinned as a floor so a broken
    // probe (recall ~0) fails loudly without flaking on exact equality
    val ivf = Similarity.hardNegatives(q, e, pos, k = 10,
      scorer = "ivf", candidates = 40, nCells = 8, nProbe = 3)
    val exactSet = exact.select("query_id", "match_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfSet = ivf.select("query_id", "match_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivfSet.count(exactSet.contains).toDouble / exactSet.size
    assert(recall >= 0.3, f"ivf hard-negative recall@10 = $recall%.2f")
    // every ANN-mined negative is a real non-positive
    val posSet = pos.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfSet.forall(p => !posSet.contains(p)))
    // pq leg: ADC-ranked, composes with the anti-join; ceiling refused
    val pq = Similarity.hardNegatives(q, e, pos, k = 10,
      scorer = "pq", candidates = 40)
    assert(pq.columns.toSeq == Seq("query_id", "match_id", "adc", "rnk"))
    val pqSet = pq.select("query_id", "match_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pqSet.nonEmpty && pqSet.forall(p => !posSet.contains(p)))
    intercept[IllegalArgumentException](Similarity.hardNegatives(
      q, e, pos, k = 10, scorer = "pq", maxCos = 0.9))
    intercept[IllegalArgumentException](Similarity.hardNegatives(
      q, e, pos, k = 10, scorer = "nope"))
  }

  test("kmeansLloyd: two clean clusters recover exactly; norms from updated centroids") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(0.9, 0.1)), (4L, Seq(0.1, 0.9)),
      (5L, Seq(1.1, -0.1)), (6L, Seq(-0.1, 1.1))
    ).toDF("vec_id", "embedding")
    val got = Similarity.kmeansLloyd(vecs, "vec_id", "embedding", k = 2, iters = 2)
      .as[(Long, Long, Double)].collect().toSeq
    // seeds (1,0)/(0,1) pull {1,3,5} and {2,4,6}; both means land back on
    // the seeds exactly, so the updated centroid norms are 1.0
    assert(got == Seq((0L, 3L, 1.0), (1L, 3L, 1.0)))
  }

  test("kmeansLloyd: duplicate seeds tie to the lowest cluster; empty cluster vanishes") {
    val vecs = Seq(
      (1L, Seq(0.5, 0.5)), (2L, Seq(0.5, 0.5)), (3L, Seq(0.6, 0.4))
    ).toDF("vec_id", "embedding")
    val got = Similarity.kmeansLloyd(vecs, "vec_id", "embedding", k = 2, iters = 1)
      .as[(Long, Long, Double)].collect().toSeq
    // identical seeds: strict-> argmax keeps cluster 0 for every row;
    // cluster 1 stays empty (keeps its seed centroid) and emits no row
    assert(got.map(t => (t._1, t._2)) == Seq((0L, 3L)))
  }

  test("kmeansLloyd is invariant to input partitioning") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = Similarity.kmeansLloyd(e.repartition(1), "vec_id", "embedding",
      k = 4, iters = 2).collect().toSeq
    val alt = Similarity.kmeansLloyd(e.repartition(7), "vec_id", "embedding",
      k = 4, iters = 2).collect().toSeq
    assert(base == alt)
  }

  test("importanceWeights: hand-computed add-1 smoothed log ratios") {
    val docs = Seq(
      (1L, "a a b", "tgt"), (2L, "a c", "raw")
    ).toDF("doc_id", "text", "source")
    val got = TfIdf.importanceWeights(docs, "doc_id", "text",
      col("source") === "tgt")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // corpus a:3 b:1 c:1 (tr=5, V=3); target a:2 b:1 c:0 (tt=3)
    // lr(a)=ln(3/6)-ln(4/8)=0, lr(b)=ln(2/6)-ln(2/8)=ln(4/3),
    // lr(c)=ln(1/6)-ln(2/8)=ln(2/3)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got == Seq(
      (1L, 3L, r6(math.log(4.0 / 3.0))),
      (2L, 2L, r6(math.log(2.0 / 3.0)))))
  }

  test("importanceWeights: target-domain docs score higher on the fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val w = TfIdf.importanceWeights(docs, "doc_id", "text",
      col("source") === "src0")
      .join(docs.select("doc_id", "source"), "doc_id")
      .groupBy(col("source") === "src0")
      .agg(avg(col("log_weight") / col("n_tok")).as("m"))
      .as[(Boolean, Double)].collect().toMap
    assert(w(true) > w(false),
      s"target mean per-token weight ${w(true)} !> raw ${w(false)}")
  }
}
