package graft.llmops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Partition-count invariance for the round-6 third-session operators:
  * every one must produce identical rows at 1 and 32 shuffle
  * partitions (catches nondeterminism hiding in window orders,
  * collect_list order sensitivity, float sum ordering past the
  * rounding guard, and first-occurrence races). */
class SessionInvarianceSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sfDir = "/root/testdata/sf0.001"

  private val targets = Seq(
    "q_dsir_hashed", "q_dsir_sample", "q_chunk_dedup", "q_overlap_decon",
    "q_canonical_pick", "q_emb_truncate", "q_curation_report",
    "q_media_near_dup", "q_novelty", "q_source_drift",
    "q_curation_pipeline", "q_index_merge", "q_lookup_array",
    // fourth session: the six lineitem-bridged TPC-H shapes, the four
    // curation additions, and the rewritten window-calculus path
    // ($integral decomposition + native $expMovingAvg)
    "q_tpch_q2", "q_tpch_q9", "q_tpch_q11", "q_tpch_q15", "q_tpch_q16",
    "q_tpch_q20", "q_source_overlap", "q_ngram_diversity",
    "q_shard_manifest", "q_lang_mixture", "q_window_calculus",
    "q_index_remove", "q_search_stored", "q_ivf_part", "q_stream_vec_index",
    "q_searchmeta_stored", "q_compact", "q_zorder", "q_dedup_eval",
    "q_tokenizer_fertility",
    // fifth session: zone-map gates, storage-partitioned join, the
    // incremental/streaming near-dup index
    "q_zonemap_prune", "q_zonemap_minmax", "q_spj_join",
    "q_neardup_index", "q_neardup_ingest", "q_stream_neardup")

  private def canon(name: String): Seq[String] = {
    import org.apache.spark.sql.functions._
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.select(to_json(struct(df.columns.sorted.map(col): _*)).as("j"))
      .collect().map(_.getString(0)).sorted.toIndexedSeq
  }

  test("session operators are shuffle-partition-count invariant") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      targets.foreach { name =>
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        val one = canon(name)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        val many = canon(name)
        assert(one == many, s"$name differs between 1 and 32 partitions")
        assert(one.nonEmpty, s"$name returned no rows at sf0.001")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
