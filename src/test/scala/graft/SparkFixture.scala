package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object SparkFixture {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // the whole test run exercises the extensions injection path:
      // native functions resolve in every (new) session without an
      // imperative GraftFunctions.register call
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
