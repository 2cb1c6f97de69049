package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.llmops.{Dedup, NearDupIndex}

/** The two contracts of the deferred cache-release discipline
  * (CacheScope.persistUntil), pinned together so neither can silently
  * regress:
  *
  *  - LEAK: after the caller's first action completes, NO persisted
  *    blocks remain in the session (the pre-r7 accumulating-blocks bug,
  *    kept fixed);
  *  - TOKENIZE-ONCE: during that single action the expensive shared
  *    intermediate (the tokenized/hashed corpus) is computed exactly
  *    once even though several plan branches consume it (the r7
  *    dedicated-`count()` pass is gone, and nothing recomputes).
  *
  * Tokenize-once is measured with `Dataset.observe` planted UNDER the
  * operator's internal cache point: rows flow through a CollectMetrics
  * node only when the underlying plan actually executes, so the observed
  * count is n per computation — n means once, 2n+ means the cache did
  * not engage. */
class CacheScopeSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val n = 40L

  /** near-dup-rich corpus: every 4th doc is a shingle-identical twin */
  private def docs(obs: Option[Observation]): DataFrame = {
    val base = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ",
        lit("alpha beta gamma delta epsilon zeta"),
        when(col("id") % 4 === 0, lit("eta theta"))
          .otherwise(concat(lit("doc"), col("id")))).as("text"))
    obs.map(o => base.observe(o, count(lit(1)).as("rows"))).getOrElse(base)
  }

  /** run `body`, then wait for the async listener release and assert the
    * session holds zero persisted RDDs */
  private def assertNoLeak[T](body: => T): T = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val r = body
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.sparkContext.getPersistentRDDs.nonEmpty &&
           System.nanoTime() < deadline) Thread.sleep(20)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"persisted blocks leaked: ${spark.sparkContext.getPersistentRDDs}")
    r
  }

  test("persistUntil releases only on an action containing the trigger") {
    val dep = spark.range(100).select((col("id") * 2).as("v"))
    val out = dep.agg(sum("v").as("s"))
    CacheScope.persistUntil(out, dep)
    assert(dep.storageLevel != StorageLevel.NONE)
    // an unrelated action must NOT fire the release
    spark.range(5).count()
    Thread.sleep(200)
    assert(dep.storageLevel != StorageLevel.NONE)
    // the trigger's own materialization does
    assert(out.collect().head.getLong(0) == 9900L)
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (dep.storageLevel != StorageLevel.NONE &&
           System.nanoTime() < deadline) Thread.sleep(20)
    assert(dep.storageLevel == StorageLevel.NONE)
  }

  test("minhashPairs: zero leaked blocks, corpus tokenized exactly once") {
    val obs = Observation("mh_tok")
    val pairs = assertNoLeak {
      val p = Dedup.minhashPairs(docs(Some(obs)), "doc_id", "text")
      assert(p.collect().length == 45) // C(10,2) twin pairs
      p
    }
    // the hashed-shingle corpus has 3 consumers (signature build + both
    // verification joins); the lazy cache must bound the source scan to 1
    assert(obs.get("rows") == n, "corpus tokenized more than once")
    assert(pairs.schema.fieldNames.toSeq == Seq("id_a", "id_b", "jaccard"))
  }

  test("jaccardPairs: zero leaked blocks, corpus tokenized exactly once") {
    val obs = Observation("jp_tok")
    assertNoLeak {
      val p = Dedup.jaccardPairs(docs(Some(obs)), "doc_id", "text")
      assert(p.collect().length == 45)
    }
    assert(obs.get("rows") == n, "corpus tokenized more than once")
  }

  test("repeatedSpans and dropRepeatedSpans: zero leaked blocks") {
    assertNoLeak {
      assert(Dedup.repeatedSpans(docs(None), "doc_id", "text",
        n = 3, minDocs = 2).collect().nonEmpty)
    }
    assertNoLeak {
      assert(Dedup.dropRepeatedSpans(docs(None), "doc_id", "text",
        n = 3, minDocs = 2).collect().length == n)
    }
  }

  test("queryBatch over a built index: leak-free, index corpus " +
       "tokenized once, batch tokenized once") {
    // two independently-observed sources, so each internal cache's
    // tokenize-once contract is pinned on its own counter: build's docs
    // cache must bound the index corpus' two union branches (band rows +
    // stored docs) to ONE scan; queryBatch's freshDocs/freshBands caches
    // must bound the batch side (bucket probe + candidate join +
    // verification) to ONE scan. No index-level persist is needed —
    // queryBatch's two index consumers prune to different union branches.
    val idxObs = Observation("qb_idx_tok")
    val batchObs = Observation("qb_batch_tok")
    val idxSrc = docs(None).where(col("doc_id") % 5 =!= 0)
      .observe(idxObs, count(lit(1)).as("rows"))
    val batchSrc = docs(None).where(col("doc_id") % 5 === 0)
      .observe(batchObs, count(lit(1)).as("rows"))
    assertNoLeak {
      val idx = NearDupIndex.build(idxSrc, "doc_id", "text")
      val out = NearDupIndex.queryBatch(idx, batchSrc, "doc_id", "text",
        threshold = 0.8)
      assert(out.collect().nonEmpty)
    }
    assert(idxObs.get("rows") == 32L,
      s"index corpus scanned ${idxObs.get("rows")}/32 rows — expected once")
    assert(batchObs.get("rows") == 8L,
      s"batch scanned ${batchObs.get("rows")}/8 rows — expected once")
  }

  test("geometry answers from schema metadata without a job on built frames") {
    val idx = NearDupIndex.build(docs(None), "doc_id", "text")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    // queryBatch's plan construction must not run any job (the old meta
    // collect); the real work happens only at the caller's action
    NearDupIndex.queryBatch(idx, docs(None).limit(5), "doc_id", "text")
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "plan construction ran a Spark job")
    spark.catalog.clearCache()
  }
}
