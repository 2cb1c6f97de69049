package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator: the Spark-side query plus (when SQL-expressible)
  * the DuckDB oracle the driver hash-compares against.
  *
  * Oracle-parity conventions used throughout (see SURVEY.md §6):
  *  - double aggregates go through DECIMAL(18,4)/DECIMAL(38,*) so
  *    summation order can never flip a bit: both engines compute the exact
  *    decimal sum, then CAST to DOUBLE (same IEEE value);
  *  - computed integers are cast to BIGINT on both sides (DuckDB's
  *    year()/row_number()/count() default to BIGINT/HUGEINT);
  *  - every query ends in a total ORDER BY (unique tiebreak column).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
