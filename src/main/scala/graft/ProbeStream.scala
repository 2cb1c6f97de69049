package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one streaming gate and print each micro-batch's
  * durationMs breakdown (triggerExecution, addBatch, getBatch,
  * walCommit, stateOps) — pinpoints whether streaming wall time is
  * task work, state commit, or driver-side log/planning overhead. */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = if (args.length > 1) args(1) else "q_stream_join"
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
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").filter(_.nonEmpty).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b0.config(k, v)
    })
    val spark = b0.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs} state=${p.stateOperators.map(s =>
            s"(rows=${s.numRowsTotal} updated=${s.numRowsUpdated} " +
            s"commitMs=${s.commitTimeMs} mem=${s.memoryUsedBytes})").mkString}")
      }
    })
    // watchdog: periodic in-process stack dumps of busy/parked task
    // threads while the gate runs (jstack is unreachable through the
    // sandbox's pid namespaces)
    val dumper = new Thread(() => {
      try {
        while (true) {
          Thread.sleep(sys.env.getOrElse("SPARK_GRAFT_DUMP_MS", "2000").toLong)
          val traces = Thread.getAllStackTraces
          val all = sys.env.contains("SPARK_GRAFT_DUMP_ALL")
          traces.forEach { (t, st) =>
            val interesting =
              if (all) t.getState == Thread.State.RUNNABLE && st.nonEmpty &&
                !t.getName.contains("dispatcher") && !t.getName.startsWith("RemoteBlock")
              else t.getName.startsWith("Executor task launch") && st.nonEmpty
            if (interesting) {
              println(s"[dump] ${t.getName} ${t.getState}")
              st.take(14).foreach(f => println(s"[dump]    $f"))
            }
          }
          println("[dump] ---")
        }
      } catch { case _: InterruptedException => () }
    })
    dumper.setDaemon(true)
    if (sys.env.contains("SPARK_GRAFT_DUMP_MS")) dumper.start()
    // A/B a runtime conf inside ONE JVM: SPARK_GRAFT_AB="key" toggles
    // it true/false across reps (JVM-level noise cancels out)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val ab = sys.env.get("SPARK_GRAFT_AB")
    for (r <- 1 to reps; v <- ab.map(_ => Seq("true", "false")).getOrElse(Seq(""))) {
      ab.foreach(k => spark.conf.set(k, v))
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      println(f"[probe] $name${ab.map(k => s" $k=$v").getOrElse("")} " +
        f"total=${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    Thread.sleep(500)
    spark.stop()
  }
}
