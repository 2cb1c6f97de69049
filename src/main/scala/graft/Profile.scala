package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries in isolation under the bench method
  * (usage: runMain graft.Profile <sfDir> <query> [query...]). Prints
  * per-run seconds so warm-up vs steady-state is visible.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None =>
          println(s"$n: unknown query (valid: " +
            SparkEntry.queries.keys.toSeq.sorted.mkString(", ") + ")")
        case Some(fn) =>
          var failed: Option[String] = None
          val times = (1 to runs).flatMap { _ =>
            val t0 = System.nanoTime()
            try { fn(spark, sfDir).queryExecution.toRdd.count()
                  Some((System.nanoTime() - t0) / 1e9) }
            catch { case t: Throwable => failed = Some(String.valueOf(t.getMessage)); None }
          }
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
          // a failing query must not print a plausible timing line
          if (times.isEmpty || failed.isDefined)
            println(f"$n%-28s FAILED: ${failed.getOrElse("?")}")
          else
            println(f"$n%-28s min=${times.min}%.3f  runs=[${times.map(t => f"$t%.3f").mkString(", ")}]")
      }
    }
    spark.stop()
  }
}
