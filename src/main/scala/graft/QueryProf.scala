package graft

import org.apache.spark.sql.SparkSession

/** Scratch timer for individual SparkEntry queries (not driver
  * contract): runMain graft.QueryProf <sfDir> <reps> <name...> */
object QueryProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", "64k"))
      // streaming checkpoints in these harnesses are per-run scratch on
      // tmpfs (deleted at query end), so Spark 4.1's checkpoint-file
      // checksum sidecars (async checksum write awaited on every state
      // delta close - ChecksumCheckpointFileManager) are pure overhead
      // here: the cold-path state commit dropped 4s -> 0.5s with them
      // off. Durable production checkpoints should keep the default.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // dev-only conf overrides for A/B runs, e.g.
    // SPARK_GRAFT_EXTRA_CONF="spark.graft.spread.minInputBytes=999999999999"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(
      _.split(";").filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); b0.config(k, v)
      })
    val spark = b0.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to reps; name <- names) {
      val t0 = System.nanoTime()
      // toRdd.count like Bench: materialize every output column
      val n = SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      println(f"[qprof] $name%-24s #$r ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
