package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extensions injector for the engine's native function
  * surface — the idiomatic deployment hook for a Spark library:
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`),
  * after which every session — including SQL-only clients that never
  * touch the Scala API — resolves `word_shingles`, `nearest_cell`,
  * `pq_adc`, … without any imperative `GraftFunctions.register` call.
  * Cluster-wide: set it once in spark-defaults.conf and each executor-
  * facing session is born with the functions. The imperative
  * `register` path stays for ad-hoc sessions; both read the same
  * `GraftFunctions.registrations` list, so the surfaces cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registrations.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        builder))
    }
}
