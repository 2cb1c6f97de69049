package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llmops.{Dedup, TextAnalysis}

/** Dev tool: stage-by-stage timing of the near-dup pipeline
  * (usage: runMain graft.Profile <sfDir>). Not part of the driver
  * contract — a scratch bench for shuffle/codegen investigation. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm IO

    val base = docs.select(col("doc_id").as("__id"),
      Dedup.shingles(col("text"), 3).as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingle+persist")(base.count())
    val exploded = base.select(col("__id"), explode(col("__sh")).as("__s"))
    time("explode")(exploded.count())
    val freq = exploded.groupBy("__s").agg(count(lit(1)).as("__f"))
    time("freq groupBy")(freq.count())
    val keyed = exploded.join(freq, "__s")
      .groupBy("__id")
      .agg(slice(array_sort(collect_list(struct(col("__f"), col("__s")))), 1, 4).as("__top"))
      .select(col("__id"), explode(col("__top")).as("__t"))
      .select(col("__id"), col("__t.__s").as("__key"))
    time("rarest-4 keys")(keyed.count())
    val cand = keyed.as("l").join(keyed.as("r"), Seq("__key"))
      .where(col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"))
      .distinct()
    time("candidates")(cand.count())
    val verified = cand
      .join(base.select(col("__id").as("id_a"), col("__sh").as("__sha")), "id_a")
      .join(base.select(col("__id").as("id_b"), col("__sh").as("__shb")), "id_b")
      .withColumn("jaccard", round(Dedup.jaccard(col("__sha"), col("__shb")), 6))
      .where(col("jaccard") >= 0.8)
    time("verify")(verified.count())
    time("end-to-end fresh")(
      Dedup.jaccardPairs(docs, "doc_id", "text").count())

    // token path cost for reference
    time("tokens only")(docs.select(explode(TextAnalysis.tokens(col("text")))).count())

    // streaming vs batch windowed agg
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = graft.api.Graft.normalizeEventTs(
      spark.read.parquet(s"$sfDir/events.parquet").where(col("ts").isNotNull))
    time("batch windowed agg")(
      graft.streaming.EventStream.windowedAgg(ev).count())
    time("streaming run 1")(
      graft.streaming.EventStream.runOnFixture(spark, sfDir).count())
    // (runStream pins its own state-store partitioning internally — a
    // shuffle-partition sweep here would silently measure the same
    // config under different labels)
    time("streaming run 2")(
      graft.streaming.EventStream.runOnFixture(spark, sfDir).count())
    spark.stop()
  }
}
