package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.schema.MSchema

/** Vectorized scan path of the graftdocs source: the plan goes columnar,
  * and the ColumnarBatch decode is value-identical to the row path over
  * the full declared-type matrix (nested structs, arrays of structs,
  * decimal128, binary/objectId, timestamps incl. NTZ, date32, code) —
  * the Spark twin of the reference's columnar-builder equivalence
  * (process_bson_stream builders, lib.pyx:436-870).
  */
class ColumnarReadSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val fullSchema = StructType(Seq(
    StructField("i", IntegerType),
    StructField("l", LongType),
    StructField("d", DoubleType),
    StructField("s", StringType),
    StructField("b", BooleanType),
    MSchema.timestampField("ts"),
    StructField("dt", DateType,
      metadata = new MetadataBuilder()
        .putString(MSchema.BsonTypeKey, "date32").build()),
    StructField("dec", DecimalType(38, 10),
      metadata = new MetadataBuilder()
        .putString(MSchema.BsonTypeKey, "decimal128").build()),
    MSchema.objectIdField("oid"),
    MSchema.binaryField("bin", 0),
    StructField("arr", ArrayType(LongType)),
    StructField("nested", StructType(Seq(
      StructField("x", DoubleType),
      StructField("inner", StructType(Seq(StructField("y", StringType)))),
      StructField("tags", ArrayType(StringType))))),
    StructField("structs", ArrayType(StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))))))

  private def writeFixture(): String = {
    val docs = Seq(
      """{"i": 1, "l": {"$numberLong": "9007199254740993"}, "d": 1.5, "s": "a b", "b": true,
         "ts": {"$date": 1700000000123}, "dt": {"$date": 1700003600000},
         "dec": {"$numberDecimal": "12345.6789012345"},
         "oid": {"$oid": "5f0e3a2b1c9d440000abcdef"},
         "bin": {"$binary": {"base64": "AQIDBA==", "subType": "00"}},
         "arr": [1, 2, null, 4],
         "nested": {"x": 2.25, "inner": {"y": "deep"}, "tags": ["t1", "t2"]},
         "structs": [{"k": 1, "v": "one"}, {"k": 2, "v": null}]}""",
      // missing-field null catch-up: most fields absent
      """{"i": 2, "arr": [], "nested": {"x": null, "inner": null, "tags": null}}""",
      // cross-acceptance: bool→int, int→double, double-truncate→long
      """{"i": true, "l": 3.9, "d": 7, "s": "plain", "b": false,
         "ts": {"$date": "2023-11-14T22:13:20.123Z"}, "dt": {"$date": -86400001},
         "dec": 42.5, "arr": [9], "structs": []}""",
      // NaN → null on numeric targets
      """{"i": NaN, "l": NaN, "d": NaN}"""
    ).map(_.replaceAll("\n\\s*", " "))
    val dir = java.nio.file.Files.createTempDirectory("graft_columnar")
    java.nio.file.Files.write(dir.resolve("docs.jsonl"),
      docs.mkString("", "\n", "\n").getBytes("UTF-8"))
    dir.toString
  }

  private def read(path: String, columnar: Boolean) =
    spark.read.format("graftdocs").schema(fullSchema)
      .option("columnar", columnar).option("allowInvalid", true).load(path)

  test("plan reads columnar batches by default; row path behind the option") {
    val path = writeFixture()
    val colPlan = read(path, columnar = true).queryExecution.executedPlan.toString
    assert(colPlan.contains("ColumnarToRow"), s"not columnar:\n$colPlan")
    val rowPlan = read(path, columnar = false).queryExecution.executedPlan.toString
    assert(!rowPlan.contains("ColumnarToRow"), s"row path lost:\n$rowPlan")
  }

  test("columnar decode ≡ row decode over the full type matrix") {
    val path = writeFixture()
    val colRows = read(path, columnar = true).orderBy("i").collect().toSeq
    val rowRows = read(path, columnar = false).orderBy("i").collect().toSeq
    assert(colRows.length == 4)
    // Row.equals on binary columns compares array identity — compare a
    // canonical rendering instead (json covers every nested field)
    val canon = (r: Seq[org.apache.spark.sql.Row]) =>
      r.map(_.json)
    assert(canon(colRows) == canon(rowRows))
  }

  test("decode-time filter skip works on the columnar path") {
    val path = writeFixture()
    GraftScanMetrics.emitted.reset(); GraftScanMetrics.skipped.reset()
    val got = read(path, columnar = true).where($"i" === 2).collect()
    assert(got.length == 1)
    assert(GraftScanMetrics.skipped.sum() > 0)
  }

  test("direct BSON decode engages under pushed filters, with skips") {
    // round-6 gap: any pushed filter used to force the JsonNode-tree
    // path, surrendering the 2.3× direct decode exactly on the filtered
    // scans real workloads run. Now the direct reader evaluates pushed
    // filters against the decoded vectors and compacts survivors.
    val dir = java.nio.file.Files.createTempDirectory("graft_direct_filter")
    val n = 5000
    spark.range(n).selectExpr("id", "cast(id % 7 as double) as d",
        "concat('row', id) as s",
        "timestamp_millis(1700000000000 + id * 1000) as ts",
        "named_struct('x', cast(id as double), 'tags', array(concat('t', id % 3))) as nested",
        "array(id, id + 1) as arr")
      .repartition(1)
      .write.format("graftdocs").option("format", "bson")
      .mode("overwrite").save(dir.toString)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("d", DoubleType),
      StructField("s", StringType), MSchema.timestampField("ts"),
      StructField("nested", StructType(Seq(
        StructField("x", DoubleType),
        StructField("tags", ArrayType(StringType))))),
      StructField("arr", ArrayType(LongType))))
    def rd(columnar: Boolean) = spark.read.format("graftdocs").schema(schema)
      .option("columnar", columnar).load(dir.toString)
      .where($"d" === 3.0 && $"id" >= 100)

    GraftScanMetrics.emitted.reset(); GraftScanMetrics.skipped.reset()
    GraftScanMetrics.direct.reset()
    // no orderBy here: a range sort samples the source in a second scan
    // pass, which would double every counter — sort driver-side instead
    val colRows = rd(columnar = true).collect().toSeq.sortBy(_.getLong(0))
    assert(GraftScanMetrics.direct.sum() == n,
      s"direct path did not engage: direct=${GraftScanMetrics.direct.sum()}")
    assert(GraftScanMetrics.skipped.sum() > 0, "no decode-time skips counted")
    assert(GraftScanMetrics.emitted.sum() == colRows.length.toLong)
    // value parity with the row path under the same filter
    val rowRows = rd(columnar = false).collect().toSeq.sortBy(_.getLong(0))
    assert(colRows.nonEmpty && colRows.map(_.json) == rowRows.map(_.json))
    // and with the no-filter direct read filtered post-hoc
    val all = spark.read.format("graftdocs").schema(schema).load(dir.toString)
      .collect().toSeq.filter(r => r.getDouble(1) == 3.0 && r.getLong(0) >= 100)
      .sortBy(_.getLong(0))
    assert(colRows.map(_.json) == all.map(_.json))
  }

  test("strict-mode type errors still raise on the columnar path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_columnar_strict")
    java.nio.file.Files.write(dir.resolve("bad.jsonl"),
      """{"i": "not-an-int"}""".getBytes("UTF-8"))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graftdocs")
        .schema(StructType(Seq(StructField("i", IntegerType))))
        .load(dir.toString).collect()
    }
    assert(e.getMessage.contains("unexpected type") ||
      Option(e.getCause).exists(_.getMessage.contains("unexpected type")))
  }

  test("limit pushdown stops decode after n rows per partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft_limit")
    val sb = new StringBuilder
    (1 to 20000).foreach(i => sb.append(s"""{"i": $i}\n"""))
    java.nio.file.Files.write(dir.resolve("big.jsonl"), sb.toString.getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("i", LongType)))
    for (columnar <- Seq(true, false)) {
      GraftScanMetrics.emitted.reset()
      val q = spark.read.format("graftdocs").schema(schema)
        .option("columnar", columnar).load(dir.toString).limit(5)
      assert(q.queryExecution.executedPlan.toString.contains("PushedLimit: 5"))
      assert(q.collect().length == 5)
      // one partition here: the decoder must have stopped at the limit,
      // not decoded all 20000 documents
      assert(GraftScanMetrics.emitted.sum() <= 5L,
        s"columnar=$columnar decoded ${GraftScanMetrics.emitted.sum()} rows")
    }
  }

  test("count(*) pushdown never decodes a document") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cnt")
    val sb = new StringBuilder
    (1 to 12345).foreach(i => sb.append(s"""{"i": $i, "s": "row$i"}\n"""))
    sb.append("\n") // blank line: excluded from the row set, and from the count
    java.nio.file.Files.write(dir.resolve("a.jsonl"), sb.toString.getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("i", LongType), StructField("s", StringType)))
    val df = spark.read.format("graftdocs").schema(schema).load(dir.toString)
    GraftScanMetrics.emitted.reset()
    val q = df.groupBy().count()
    assert(q.queryExecution.executedPlan.toString.contains("PushedAggregation"),
      q.queryExecution.executedPlan.toString)
    assert(q.head.getLong(0) == 12345)
    assert(GraftScanMetrics.emitted.sum() == 0, "count decoded documents")
    // bson format: length-prefix hops
    val bdir = java.nio.file.Files.createTempDirectory("graft_cnt_b")
    spark.range(777).selectExpr("id").write.format("graftdocs")
      .option("format", "bson").mode("overwrite").save(bdir.toString)
    val bs = StructType(Seq(StructField("id", LongType)))
    val bq = spark.read.format("graftdocs").schema(bs).load(bdir.toString).groupBy().count()
    assert(bq.queryExecution.executedPlan.toString.contains("PushedAggregation"))
    assert(bq.head.getLong(0) == 777)
    // a filtered count must NOT push (filters stay post-scan here)
    val fq = df.where($"i" > 100).groupBy().count()
    assert(!fq.queryExecution.executedPlan.toString.contains("PushedAggregation"))
    assert(fq.head.getLong(0) == 12245)
  }

  test("count(*) pushdown is exact across byte-split boundaries") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cnt_split")
    val sb = new StringBuilder
    (1 to 5000).foreach(i => sb.append(s"""{"i": $i}\n"""))
    java.nio.file.Files.write(dir.resolve("a.jsonl"), sb.toString.getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("i", LongType)))
    // tiny splits: every boundary lands mid-line somewhere
    for (split <- Seq(997L, 4096L, 64L * 1024)) {
      val q = spark.read.format("graftdocs").schema(schema)
        .option("maxSplitBytes", split).load(dir.toString).groupBy().count()
      assert(q.queryExecution.executedPlan.toString.contains("PushedAggregation"))
      assert(q.head.getLong(0) == 5000, s"split=$split")
    }
  }

  test("inferMaxDocs bounds the inference sample per file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_infer")
    val sb = new StringBuilder
    // field "late" appears only after the first 100 docs
    (1 to 100).foreach(i => sb.append(s"""{"i": $i}\n"""))
    (1 to 50).foreach(i => sb.append(s"""{"i": $i, "late": "x$i"}\n"""))
    java.nio.file.Files.write(dir.resolve("a.jsonl"), sb.toString.getBytes("UTF-8"))
    val full = spark.read.format("graftdocs").load(dir.toString).schema
    assert(full.fieldNames.contains("late"))
    val sampled = spark.read.format("graftdocs")
      .option("inferMaxDocs", 100).load(dir.toString).schema
    assert(!sampled.fieldNames.contains("late")) // documented trade
    assert(sampled.fieldNames.contains("i"))
  }

  test("multi-batch reads (capacity rollover) keep every row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_columnar_big")
    val sb = new StringBuilder
    (1 to 10000).foreach(i => sb.append(s"""{"i": $i, "s": "row$i"}\n"""))
    java.nio.file.Files.write(dir.resolve("big.jsonl"), sb.toString.getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("i", LongType), StructField("s", StringType)))
    val df = spark.read.format("graftdocs").schema(schema).load(dir.toString)
    assert(df.count() == 10000)
    assert(df.agg(sum("i")).head.getLong(0) == 10000L * 10001 / 2)
  }
}
