package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-shaping operators for training-data pipelines: deterministic
  * stratified sampling and per-source token budgeting.
  *
  * Both are built on a seeded md5-derived uniform hash instead of rand():
  * results are reproducible across runs/partitionings AND recomputable by
  * any engine (the DuckDB oracle rebuilds the identical hash), which is
  * what a data-curation pipeline needs for auditability.
  */
object Sampling {
  /** Uniform value in [0, 1e6) derived from (seed, id) — first 8 md5 hex
    * chars as an integer. Pure map work: codegen'd, no shuffle. */
  def hashBucket(id: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed + ":"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") % 1000000L

  /** Stratified sample with per-stratum rates (proportional/custom
    * allocation). Map-only — the filter runs inside the scan stage, no
    * shuffle, no window: the 100 TB path. Rates are fractions in [0,1];
    * strata not in the map fall back to `defaultRate`. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double = 0.0,
                       seed: String = "strat"): DataFrame = {
    val bucket = hashBucket(col(idCol), seed)
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    df.where(bucket < rate * 1000000L)
  }

  /** Keep documents per group until a token budget is reached:
    * deterministic hash order within the group, running token total,
    * cut where the total exceeds the budget. One keyed window pass
    * (single shuffle on the group key); group cardinality bounds the
    * partition, not corpus size. */
  def tokenBudget(df: DataFrame, idCol: String, groupCol: String,
                  tokensCol: Column, budget: Long,
                  seed: String = "budget"): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol), seed).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__tok", tokensCol.cast("long"))
      .withColumn("cum_tokens", sum(col("__tok")).over(w))
      .where(col("cum_tokens") <= budget)
      .drop("__tok")
  }
}
