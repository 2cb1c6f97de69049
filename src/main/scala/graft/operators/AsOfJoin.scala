package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: attach to each left row the payload of the latest
  * right row with `rightTs <= leftTs` on the same key (the canonical
  * "most recent quote before the trade" operator; the reference has no
  * such operator — this is part of the large-scale-pipeline extension
  * surface).
  *
  * Shape: tag both sides, union, ONE window pass partitioned by the
  * key — a single shuffle, no join, no row explosion. The obvious
  * formulation (range join + rank + filter) multiplies each left row by
  * its match count before pruning — quadratic per key at 100 TB; this
  * plan ships each row exactly once. Hot keys land in one partition
  * each (same trade-off as any keyed window; AQE/salting notes in
  * api/Skew apply when one key dominates).
  *
  * Determinism: rights sort before lefts at equal timestamps (inclusive
  * `<=` semantics), and ties between right rows on the timestamp are
  * broken by the highest `tiebreak` value.
  */
object AsOfJoin {
  /** @param payload right-side columns carried onto matched left rows
    * @param tiebreak right-side column breaking rightTs ties (max wins);
    *   must be one of `payload`. Unmatched left rows keep null payload
    *   (left-outer semantics). */
  def latestPrior(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftTs: String, rightTs: String,
                  payload: Seq[String], tiebreak: String): DataFrame = {
    require(payload.contains(tiebreak), "tiebreak must be a payload column")
    val leftCols = left.columns.toSeq
    val l = left.select(
      col(leftKey).as("__k"), col(leftTs).cast("timestamp").as("__ts"),
      lit(1).as("__side"),
      lit(null).cast(right.schema(tiebreak).dataType).as("__tb"),
      struct(leftCols.map(col): _*).as("__lrow"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        right.select(payload.map(col): _*).schema.fields)).as("__rpay"))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTs).cast("timestamp").as("__ts"),
      lit(0).as("__side"), col(tiebreak).as("__tb"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        left.schema.fields)).as("__lrow"),
      struct(payload.map(col): _*).as("__rpay"))
    // sort: ts asc, rights (side 0) before lefts at equal ts, and among
    // equal-ts rights ascending tiebreak so `last` picks the max
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts").asc, col("__side").asc, col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(n => col(s"__lrow.$n").as(n)) ++
              payload.map(n => col(s"__match.$n").as(n)): _*)
  }
}
