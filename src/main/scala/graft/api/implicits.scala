package graft.api

import org.apache.spark.sql.DataFrame
import graft.mql.{FilterCompiler, PipelineCompiler}

/** Extension methods — the Spark twin of the reference's `patch_all`
  * (bindings/python/pymongoarrow/monkey.py:19-40), which grafts the
  * `*_all` entry points onto pymongo Collections. Here the MQL surface
  * attaches to any DataFrame:
  *
  * {{{
  * import graft.api.implicits._
  * df.mqlFind("""{"qty": {"$gt": 45}}""")
  * df.mqlAggregate("""[{"$group": {"_id": "$k", "n": {"$count": {}}}}]""")
  * }}}
  */
object implicits {
  implicit class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {
    /** Filter + optional projection/sort — find_arrow_all shape. */
    def mqlFind(filter: String, projection: String = null,
                sort: String = null): DataFrame =
      Graft.find(df, filter, Option(projection), Option(sort))

    /** Aggregation pipeline — aggregate_arrow_all shape. */
    def mqlAggregate(pipeline: String): DataFrame =
      PipelineCompiler.run(df, pipeline)

    /** Just the predicate, composable with native ops. */
    def mqlWhere(filter: String): DataFrame =
      df.where(FilterCompiler.compile(filter))
  }
}
