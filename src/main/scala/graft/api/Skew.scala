package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for pathological join keys.
  *
  * AQE's skew-join splitting handles moderate skew automatically (and is
  * on in this engine's sessions); salting is the manual fallback for
  * power-law keys where one key holds a double-digit percentage of a
  * 100 TB fact table — AQE can split a skewed partition, but a single
  * giant key still lands on one task without salting.
  */
object Skew {
  /** Salted inner equi-join: probe rows spray across `salt` sub-keys
    * (deterministic per row via seeded rand), the build side replicates
    * `salt` times. Hot keys spread over `salt` tasks at the cost of a
    * `salt`× blow-up of the (small) build side. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val sprayed = probe.withColumn("__graft_salt", (rand(42) * salt).cast("int"))
    val replicated = build.withColumn("__graft_salt",
      explode(array((0 until salt).map(lit): _*)))
    sprayed.join(replicated, Seq(key, "__graft_salt"), joinType)
      .drop("__graft_salt")
  }

  /** Key-frequency report: the diagnosis step before salting — at scale
    * run it on a sample (`df.sample(0.001)`). */
  def keyHistogram(df: DataFrame, key: String, topK: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key)).limit(topK)
}
