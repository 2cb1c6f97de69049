package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.mql.MqlException

/** A flat collection store over a directory: one parquet dataset per
  * collection name, the same `<dir>/<name>.parquet` convention the
  * fixture resolver (`Graft.tables`) reads. This is the write target for
  * the `$out`/`$merge` pipeline tails ([[graft.mql.WriteStages]]).
  *
  * Replacement is STAGED: the new dataset is fully written to a hidden
  * sibling first, then swapped in with a delete + rename. Readers holding
  * the old file handles finish against the old bytes; a crash mid-write
  * leaves the old dataset intact (the orphaned stage dir is re-listable
  * garbage, never a half-written collection). On HDFS-like filesystems
  * the rename is atomic; on object stores it degrades to copy — the
  * window is the rename, never the (long) write. This mirrors Mongo's
  * `$out` contract: the target is replaced only after the new collection
  * is completely built.
  *
  * Scale note: the swap moves directory POINTERS, not data — the write
  * itself is a plain distributed parquet write, partitioned like any
  * other sink.
  */
final class DocStore(val spark: SparkSession, val dir: String) {
  private def fs = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def validName(name: String): String = {
    if (name.isEmpty || name.contains("/") || name.contains("..") ||
        name.startsWith("."))
      throw new MqlException(s"bad collection name '$name'")
    name
  }

  def path(name: String): String = s"$dir/${validName(name)}.parquet"

  def exists(name: String): Boolean = fs.exists(new Path(path(name)))

  def read(name: String): DataFrame = spark.read.parquet(path(name))

  /** Write `df` as collection `name`, replacing any prior contents via
    * the staged swap described above. */
  def write(df: DataFrame, name: String): Unit = {
    val target = new Path(path(name))
    val stage = new Path(s"$dir/.graft_stage_${validName(name)}_${System.nanoTime()}")
    df.write.mode("overwrite").parquet(stage.toString)
    try {
      if (fs.exists(target) && !fs.delete(target, true))
        throw new MqlException(s"could not replace collection '$name'")
      if (!fs.rename(stage, target))
        throw new MqlException(s"could not commit collection '$name'")
    } finally {
      if (fs.exists(stage)) fs.delete(stage, true): Unit
    }
  }
}
