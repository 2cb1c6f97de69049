package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.Graft
import graft.queries.{Decode, Headline, LlmOps, QueryDef, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** All declared operators, one QueryDef each (SURVEY.md §2 inventory). */
  def defs: Seq[QueryDef] =
    Relational.all ++ LlmOps.all ++ Decode.all ++ Headline.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Graft.aggregate(spark, "/root/testdata/sf0.001", "lineitem",
      """[
        {"$match": {"l_shipdate": {"$lte": {"$date": "1998-09-01T00:00:00Z"}}}},
        {"$group": {"_id": {"rf": "$l_returnflag", "ls": "$l_linestatus"},
           "sum_qty": {"$sum": {"$toDecimal": "$l_quantity"}},
           "n": {"$count": {}}}},
        {"$project": {"_id": 0, "l_returnflag": "$_id.rf", "l_linestatus": "$_id.ls",
           "sum_qty": {"$toDouble": "$sum_qty"}, "n": 1}},
        {"$sort": {"l_returnflag": 1, "l_linestatus": 1}}]""")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
