package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Gap-based sessionization — the batch twin of the Structured-Streaming
  * session-window operator, over an event log.
  *
  * Shape: one window pass (lag → gap flag → running sum) + one
  * aggregation, both partitioned by the entity key — two shuffles on
  * user_id regardless of data size, no self-joins. The tiebreaking
  * (ts, eventId) order key makes the result fully deterministic.
  */
object Sessionize {
  /** One row per (user, session): bounds, event count, decimal-exact
    * value sum. `gap` e.g. "30 minutes" → expr interval. */
  def byGap(events: DataFrame, userCol: String, tsCol: String,
            eventIdCol: String, valueCol: String, gapMinutes: Int): DataFrame = {
    val order = Seq(col(tsCol).asc, col(eventIdCol).asc)
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val gapUs = gapMinutes.toLong * 60 * 1000000
    val flagged = events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        unix_micros(col(tsCol)) - unix_micros(col("__prev")) > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        sum(col(valueCol).cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
  }
}
