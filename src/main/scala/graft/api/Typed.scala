package graft.api

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Dataset[T]` facade over the fixture tables — the compile-time-
  * checked face of the engine (SURVEY §7: `Dataset[T]` where a case class
  * models the row). Still Catalyst underneath: groupByKey + Aggregator
  * compile to the same partial-agg + shuffle as the untyped path.
  */
object Typed {
  final case class Lineitem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double,
      l_tax: Double, l_returnflag: String, l_linestatus: String,
      l_shipdate: java.time.LocalDateTime)

  final case class Document(doc_id: Long, text: String, lang: String,
                            source: String, n_chars: Long)

  def lineitem(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/lineitem.parquet").as[Lineitem]
  }

  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet").as[Document]
  }

  /** Typed revenue aggregator: exact decimal accumulation (same parity
    * rule as the SQL path), Encoder-backed buffer. */
  object RevenueAgg extends Aggregator[Lineitem, java.math.BigDecimal, Double] {
    private def dec(d: Double) =
      new java.math.BigDecimal(d).setScale(4, java.math.RoundingMode.HALF_UP)
    override def zero: java.math.BigDecimal =
      java.math.BigDecimal.ZERO.setScale(8)
    override def reduce(acc: java.math.BigDecimal, l: Lineitem): java.math.BigDecimal =
      acc.add(dec(l.l_extendedprice).multiply(dec(1 - l.l_discount)))
    override def merge(a: java.math.BigDecimal, b: java.math.BigDecimal): java.math.BigDecimal =
      a.add(b)
    override def finish(acc: java.math.BigDecimal): Double = acc.doubleValue
    override def bufferEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Revenue per return flag, fully typed end to end. */
  def revenueByFlag(ds: Dataset[Lineitem]): Dataset[(String, Double)] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.l_returnflag).agg(RevenueAgg.toColumn.name("revenue"))
  }
}
