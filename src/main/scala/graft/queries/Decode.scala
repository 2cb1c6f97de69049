package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.Graft
import graft.bson.{DocDecoder, SchemaInference}
import graft.schema.MSchema

/** Drives the document-decode surface (the reference's core capability:
  * schema-directed decoding of document streams into typed columns)
  * through the driver contract, using events.props — a JSON-document
  * column — as the document stream. */
object Decode {
  val all: Seq[QueryDef] = Seq(

    // inferred-schema decode (reference inferred mode §1.3) → typed agg
    QueryDef("q_decode_infer",
      (s, dir) => {
        import s.implicits._
        val docs = Graft.table(s, dir, "events").select("props").as[String]
        val decoded = DocDecoder.decode(docs, SchemaInference.infer(docs),
          allowInvalid = true)
        decoded.groupBy(col("k")).agg(count(lit(1)).as("n"))
          .select(col("k").cast(LongType).as("k"), col("n")).orderBy("k")
      },
      Some("""SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1 ORDER BY k""")),

    // declared-schema decode: strict typing straight to LongType
    QueryDef("q_decode_declared",
      (s, dir) => {
        import s.implicits._
        val docs = Graft.table(s, dir, "events").select("props").as[String]
        val schema = StructType(Seq(StructField("k", LongType)))
        DocDecoder.decode(docs, schema)
          .groupBy().agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      },
      Some("""SELECT CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM events"""))
  )
}
