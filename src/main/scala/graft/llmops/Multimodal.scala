package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs per-partition in fixed-size batches (the
  * shape a real codec or model-inference step needs — batched input,
  * columnar output).
  *
  * The byte→pixels/samples decode itself is STUBBED (`fakeDecode`): no
  * codec libraries ship in this container. The stub is deterministic
  * (CRC-seeded), so tests pin real values; swap `fakeDecode` for a JNI
  * codec / ONNX runtime call and nothing else changes.
  */
object Multimodal {
  val metaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Wrap a text corpus as a binary-payload table (the fixtures carry no
    * real media; payload = utf8 bytes, metadata synthesized). */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(textCol).cast(BinaryType).as("payload"),
      struct(
        lit("text/plain").as("mime"),
        (octet_length(col(textCol)) % 1920).cast(IntegerType).as("width"),
        (octet_length(col(textCol)) % 1080).cast(IntegerType).as("height"),
        octet_length(col(textCol)).cast(LongType).as("duration_ms")).as("meta"))

  /** STUB decode: deterministic pseudo-features from payload bytes.
    * Replace with a real codec; signature (bytes → fixed-dim floats) and
    * batching are what a model-inference step contracts on. */
  private[llmops] def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val crc = new java.util.zip.CRC32()
    crc.update(bytes)
    val seed = crc.getValue
    Array.tabulate(dim) { i =>
      val h = seed * 6364136223846793005L + i * 1442695040888963407L
      ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }
  }

  /** Batched per-partition feature extraction. `batchSize` models the
    * accelerator micro-batch: rows are staged into fixed-size groups
    * before "decode" — identical plumbing to a mapInPandas/ONNX step. */
  def extractFeatures(df: DataFrame, dim: Int = 8, batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, Array[Byte])] = df
      .select(col("media_id").cast(LongType), col("payload"))
      .na.drop("any", Seq("media_id")) // non-numeric/null ids can't key features
      .as[(Long, Array[Byte])]
    in.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // batch boundary: a real impl hands `batch` to the codec/model at once
        batch.map { case (id, bytes) => (id, fakeDecode(bytes, dim)) }
      }
    }.toDF("media_id", "features")
  }
}
