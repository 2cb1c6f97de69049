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
  * Container-HEADER decode is REAL ([[headerMeta]]: PNG/JPEG/GIF format
  * + dimensions from bounded byte reads — the scale-free metadata step).
  * The byte→pixels/samples decode itself is STUBBED (`fakeDecode`): no
  * codec libraries ship in this container. The stub is deterministic
  * (md5-seeded), so tests pin real values; swap `fakeDecode` for a JNI
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

  /** REAL header-level decode: (format, width, height) parsed from the
    * payload's container header — PNG magic + IHDR, a JPEG
    * marker-segment walk to the first SOF frame, GIF logical screen
    * (MediaHeader expression; bounded byte reads, no codec, no pixel
    * decode — the only part of media metadata extraction that stays
    * scale-free at 100 TB). Unrecognized payloads → null struct. */
  def headerMeta(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    graft.functions.GraftFunctions.register(SparkSession.active)
    call_function("media_header", payload)
  }

  /** STUB decode: deterministic pseudo-features from payload bytes.
    * Replace with a real codec; signature (bytes → fixed-dim floats) and
    * batching are what a model-inference step contracts on.
    *
    * Feature i is the i-th 4-hex-char group of md5(payload) scaled to
    * [0,1) — 16-bit ints over 2^16, so each value is float-exact and the
    * first 8 dims are reproducible in DuckDB
    * (('0x' || substr(md5(text), 1+4*i, 4))::BIGINT / 65536.0); dims
    * beyond 8 chain md5 over the previous hex block. */
  private[llmops] def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hexOf(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
    var hex = hexOf(md.digest(bytes))
    Array.tabulate(dim) { i =>
      val g = i % 8
      if (i > 0 && g == 0) // next 8 dims: re-hash the previous block
        hex = hexOf(md.digest(hex.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      (java.lang.Integer.parseInt(hex.substring(4 * g, 4 * g + 4), 16) / 65536.0).toFloat
    }
  }

  /** Perceptual-hash-style near-dup pairs over BINARY payloads: a
    * 60-bit simhash of the payload's fixed-size byte chunks, candidate
    * pairs via 4×15-bit chunk blocking (pigeonhole-complete for
    * hamming ≤ 3), exact hamming verification — the media analogue of
    * the text simhash dedup (real pipelines pHash decoded pixels;
    * the byte-chunk signature is the decode-free stand-in with the
    * same operator shape, robust to partial payload edits the way
    * word-simhash is robust to partial text edits). Output
    * (id_a, id_b, hamming), id_a < id_b.
    *
    * Scale shape: identical to Dedup.simhashPairs — explode chunks →
    * one map-side-combined vote aggregation (one 60-column row per
    * payload shuffles, never the bytes), band equi-join on signature
    * chunks, never all-pairs. */
  def mediaNearDupPairs(df: DataFrame, idCol: String, payloadCol: String,
                        chunkBytes: Int = 8, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-chunk blocking is only complete for maxDist <= 3")
    val nChunks = greatest(
      ceil(octet_length(col(payloadCol)).cast("double") / chunkBytes).cast("int"),
      lit(1))
    val chunkHashes = transform(sequence(lit(0), nChunks - 1), i =>
      Dedup.portableHash60(
        col(payloadCol).substr(i * chunkBytes + 1, lit(chunkBytes))))
    val toks = df.select(col(idCol).as("__id"),
      explode(chunkHashes).as("__h"))
    val votes = (0 until Dedup.SimHashBits).map(i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"__v$i"))
    val sigs = toks.groupBy("__id").agg(votes.head, votes.tail: _*)
      .select(col("__id"), (0 until Dedup.SimHashBits).map(i =>
        when(col(s"__v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce(_.bitwiseOR(_)).as("__sig"))
    val bands = sigs.select(col("__id"), col("__sig"), explode(array(
      (0 until 4).map(j => concat_ws(":", lit(j),
        shiftright(col("__sig"), j * 15).bitwiseAND(lit(0x7FFFL)))): _*))
      .as("__band"))
    bands.as("l").join(bands.as("r"), Seq("__band"))
      .where(col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"),
        bit_count(col("l.__sig").bitwiseXOR(col("r.__sig"))).cast("long")
          .as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
  }

  /** STUB resize: rewrites the metadata to the target box preserving
    * aspect ratio (fit-inside); the payload passes through untouched —
    * a real impl re-encodes pixels in the same batched decode step as
    * extractFeatures. Pure map expression; the plumbing (schema shape,
    * scale math, degenerate-dims guard) is the real part. */
  def resize(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("meta.width").cast(DoubleType)
    val h = col("meta.height").cast(DoubleType)
    // scale ≤ 1 (never upscale); degenerate 0-dims keep their size
    val scale = least(lit(1.0), lit(maxW) / greatest(w, lit(1.0)),
      lit(maxH) / greatest(h, lit(1.0)))
    df.withColumn("meta", struct(
      col("meta.mime").as("mime"),
      floor(w * scale).cast(IntegerType).as("width"),
      floor(h * scale).cast(IntegerType).as("height"),
      col("meta.duration_ms").as("duration_ms")))
  }

  /** Frame sampling: each media row expands to one row per sampled
    * frame (`frame_idx`, `frame_ts_ms`) at a fixed interval over
    * `meta.duration_ms` — the Spark-side shape of video frame
    * extraction: a map-only explode, no shuffle, frame decode left to
    * the batched stub step. Zero-duration media still yields frame 0
    * (a poster frame). */
  def sampleFrames(df: DataFrame, intervalMs: Long = 1000L): DataFrame =
    df.select(col("media_id"),
        explode(sequence(lit(0L),
          (greatest(col("meta.duration_ms") - 1, lit(0L)) / intervalMs)
            .cast(LongType))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * intervalMs).as("frame_ts_ms"))

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
