package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llmops.{Dedup, Similarity}

/** Approximation-quality report: recall/precision of the approximate
  * operators against their exact ground truths on the fixtures.
  * Usage: runMain graft.Quality [sfDir] — prints one JSON line. */
object Quality {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def prf(got: Set[(Long, Long)], truth: Set[(Long, Long)]): (Double, Double) = {
      val tp = (got & truth).size.toDouble
      (if (truth.isEmpty) 1.0 else tp / truth.size,
       if (got.isEmpty) 1.0 else tp / got.size)
    }

    // near-dup: jaccard ground truth vs minhash-LSH
    val truth = Dedup.jaccardPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val mh = Dedup.minhashPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val (mhR, mhP) = prf(mh, truth)

    // ANN: brute-force top-10 vs IVF (partial probe) per query, with
    // and without the spherical-k-means centroid refinement
    val queries = emb.where(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(queries, emb, 10)
      .select("query_id", "match_id").as[(Long, Long)].collect().toSet
    val ivf0 = Similarity.ivfTopK(queries, emb, 10, nCells = 16, nProbe = 4,
        lloydIters = 0)
      .select("query_id", "match_id").as[(Long, Long)].collect().toSet
    val (ivf0R, ivf0P) = prf(ivf0, bf)
    val ivf = Similarity.ivfTopK(queries, emb, 10, nCells = 16, nProbe = 4,
        lloydIters = 1)
      .select("query_id", "match_id").as[(Long, Long)].collect().toSet
    val (ivfR, ivfP) = prf(ivf, bf)

    println(
      s"""{"sf":"$sfDir","near_dup_truth_pairs":${truth.size},""" +
      s""""minhash":{"recall":$mhR,"precision":$mhP},""" +
      s""""ivf_top10_nprobe4of16_hash_sample":{"recall":$ivf0R,"precision":$ivf0P},""" +
      s""""ivf_top10_nprobe4of16_lloyd1":{"recall":$ivfR,"precision":$ivfP}}""")
    spark.stop()
  }
}
