package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout helpers for repeated large-scale joins.
  *
  * At 100 TB the dominant cost of a fact⋈fact equi-join is the shuffle
  * of BOTH sides. Spark's answer is bucketing: write each side
  * hash-bucketed (and sorted) by the join key once, and every
  * subsequent equi-join on that key is EXCHANGE-FREE — the scan itself
  * satisfies the join's required distribution, so the plan goes
  * scan → (sort) → SortMergeJoin with no Exchange on either side. One
  * write-time shuffle is amortized over every downstream join/agg on
  * the key (the same trade the reference's server makes with indexes:
  * pay at write, win at read).
  *
  * These helpers wrap the `bucketBy` path-based-table contract (Spark
  * requires `saveAsTable` — a catalog entry — for bucketed writes; the
  * in-memory/derby catalog works, no Hive needed).
  */
object Layout {
  /** Write `df` as a bucketed, sorted table named `name`, bucketed by
    * `key` into `buckets` files per partition. Overwrites an existing
    * table of the same name. */
  def writeBucketed(df: DataFrame, name: String, key: String,
                    buckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    require(buckets > 0, s"writeBucketed: buckets=$buckets must be positive")
    val sorts = if (sortCols.isEmpty) Seq(key) else sortCols
    df.write
      .bucketBy(buckets, key)
      .sortBy(sorts.head, sorts.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(name)
  }

  /** Read a bucketed table back (the bucket metadata rides the catalog
    * entry, so joins on the bucket key skip their Exchange). */
  def bucketedTable(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  /** N-dimensional Morton (Z-order) value of non-negative integer
    * columns, `bits` bits each — pure codegen'd Column arithmetic, no
    * UDF. Values clamp into [0, 2^bits); cols.size * bits must fit a
    * signed long. Interleaving makes rows close in EVERY dimension
    * close in z, which is what turns multi-dimensional range predicates
    * into tight per-file/row-group min-max windows. */
  def zorderValue(cols: Seq[org.apache.spark.sql.Column],
                  bits: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(cols.nonEmpty, "zorderValue: need at least one column")
    require(cols.size * bits <= 63,
      s"zorderValue: ${cols.size} cols × $bits bits exceeds a long")
    val top = (1L << bits) - 1
    val clamped = cols.map(c =>
      least(greatest(c.cast("long"), lit(0L)), lit(top)))
    (0 until bits).flatMap { i =>
      clamped.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)),
          i * cols.size + j)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Write `df` as parquet clustered along the Z-order curve of
    * `zCols` — Delta's OPTIMIZE ZORDER as a plain write: range-
    * partition on the z-value into `files` output files and sort
    * within each, so every file and row group carries tight min/max
    * stats on ALL the z columns at once. A query filtering any
    * combination of those dimensions then skips most row groups via
    * ordinary parquet predicate pushdown — data skipping without an
    * index, the cheapest 100 TB scan lever after partition pruning. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    bits: Int = 16, files: Int = 8): Unit = {
    import org.apache.spark.sql.functions._
    val z = zorderValue(zCols.map(col), bits)
    df.withColumn("__graft_z", z)
      .repartitionByRange(files, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)
  }

  /** True when `plan` contains no shuffle Exchange — the assertion a
    * co-located join must pass. AdaptiveSparkPlanExec wrappers and AQE
    * query stages are unwrapped/traversed (both hide their inner plan
    * from a plain collect, which would otherwise return a vacuous
    * true for any adaptive plan). */
  def isExchangeFree(plan: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        nodes(a.executedPlan)
      case _ =>
        p.collect { case n => n } ++ (p.collect {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q
        }.flatMap(q => nodes(q.plan)) ++ p.collect {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a
        }.flatMap(a => nodes(a.executedPlan)))
    }
    !nodes(plan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
  }
}
