package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Micro-batch tail of a graftdocs batch directory: continuous document
  * ingest (the streaming twin of the reference's cursor loop). Files
  * arriving between micro-batches are picked up exactly once via the
  * (mtime, name) watermark offset. */
class StreamingDocSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", StringType)))

  private def writeWave(dir: java.nio.file.Path, name: String,
                        ids: Range, grp: String): Unit = {
    val sb = new StringBuilder
    ids.foreach(i => sb.append(s"""{"id": $i, "grp": "$grp"}\n"""))
    java.nio.file.Files.write(dir.resolve(name), sb.toString.getBytes("UTF-8"))
  }

  test("readStream tails the directory; later files arrive in later batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src")
    writeWave(dir, "w1.jsonl", 0 until 100, "a")

    val q = spark.readStream.format("graftdocs").schema(schema)
      .load(dir.toString)
      .groupBy("grp").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("doc_tail")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val r1 = spark.table("doc_tail").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r1 == Map("a" -> 100L))

      // second wave lands after the first batch committed; ensure a
      // LATER mtime even on coarse filesystem clocks
      Thread.sleep(1100)
      writeWave(dir, "w2.jsonl", 0 until 40, "b")
      q.processAllAvailable()
      val r2 = spark.table("doc_tail").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r2 == Map("a" -> 100L, "b" -> 40L), s"got $r2")
    } finally q.stop()
  }

  test("restart from checkpoint resumes at the watermark (no reprocessing)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_ckpt")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt_loc")
    val out = java.nio.file.Files.createTempDirectory("graft_stream_ckpt_out")
    writeWave(dir, "w1.jsonl", 0 until 60, "a")
    // memory sink can't recover a checkpoint — use the file sink
    def start() = spark.readStream.format("graftdocs").schema(schema)
      .load(dir.toString)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt.toString)
      .option("path", out.toString)
      .outputMode("append").start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out.toString).count() == 60)

    // restart: the offset round-trips through deserializeOffset; only
    // the new wave lands (append mode would double rows on replay)
    Thread.sleep(1100)
    writeWave(dir, "w2.jsonl", 0 until 25, "b")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val counts = spark.read.parquet(out.toString).groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 60L, "b" -> 25L), s"got $counts")
  }

  test("streamed decode equals batch decode over the same files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_eq")
    writeWave(dir, "w1.jsonl", 0 until 500, "x")
    writeWave(dir, "w2.jsonl", 500 until 800, "y")

    val q = spark.readStream.format("graftdocs").schema(schema)
      .load(dir.toString)
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("id").as("s"))
      .writeStream.format("memory").queryName("doc_eq")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("doc_eq").orderBy("grp").collect().toSeq.map(_.toSeq)
      val batch = spark.read.format("graftdocs").schema(schema).load(dir.toString)
        .groupBy("grp").agg(count(lit(1)).as("n"), sum("id").as("s"))
        .orderBy("grp").collect().toSeq.map(_.toSeq)
      assert(streamed == batch)
    } finally q.stop()
  }
}
