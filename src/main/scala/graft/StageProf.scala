package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Dev tool (optimization rounds): per-stage breakdown of named queries.
  * Usage: runMain graft.StageProf <sfDir> <reps> <query> [query...]
  *
  * For each run it prints every completed stage's wall time, task time,
  * input/shuffle bytes and record counts, so the expensive stage of a
  * slow query is visible without the UI (guide §1/§7: decide whether
  * time goes to scan, shuffle read/write, or compute before touching
  * anything). */
object StageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
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
    // ad-hoc conf experiments: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").filter(_.nonEmpty).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(id: Int, name: String, ms: Long, taskMs: Long,
                  inB: Long, inRec: Long, srB: Long, swB: Long,
                  swRec: Long, spill: Long, nTasks: Int,
                  cpuMs: Long, gcMs: Long)
    val stages = ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val wall = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(0L)
        stages.synchronized {
          stages += St(si.stageId, si.name.takeWhile(_ != '\n').take(90),
            wall, m.executorRunTime, m.inputMetrics.bytesRead,
            m.inputMetrics.recordsRead, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.shuffleWriteMetrics.recordsWritten, m.diskBytesSpilled,
            si.numTasks, m.executorCpuTime / 1000000, m.jvmGCTime)
        }
      }
    })

    // warmup like Bench
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    for (name <- names; r <- 1 to reps) {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      val total = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      // give listener events a beat to drain
      Thread.sleep(300)
      println(f"\n===== $name #$r total=$total%.2f s rows=$n =====")
      val snap = stages.synchronized(stages.toVector)
      println(f"${"stage"}%-6s${"tasks"}%6s${"wall_ms"}%8s${"task_ms"}%9s${"cpu_ms"}%8s" +
        f"${"gc_ms"}%7s${"in_MB"}%8s${"in_rec"}%10s${"shRd_MB"}%9s${"shWr_MB"}%9s" +
        f"${"shWr_rec"}%10s  name")
      snap.sortBy(-_.taskMs).take(18).foreach { s =>
        println(f"${s.id}%-6d${s.nTasks}%6d${s.ms}%8d${s.taskMs}%9d${s.cpuMs}%8d" +
          f"${s.gcMs}%7d${s.inB / 1e6}%8.1f${s.inRec}%10d${s.srB / 1e6}%9.2f" +
          f"${s.swB / 1e6}%9.2f${s.swRec}%10d  ${s.name}")
      }
      println(f"stages=${snap.size} sum_task_ms=${snap.map(_.taskMs).sum} " +
        f"sum_cpu_ms=${snap.map(_.cpuMs).sum} sum_gc_ms=${snap.map(_.gcMs).sum}")
    }
    spark.stop()
  }
}
