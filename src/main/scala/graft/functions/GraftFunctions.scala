package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** ObjectId scalar helpers as native Catalyst expressions (SURVEY.md
  * §7.3: the only custom-Expression surface parity needs). A BSON
  * ObjectId's first 4 bytes are big-endian epoch seconds
  * (reference stores OIDs as fixed_size_binary(12),
  * pymongoarrow/types.py:87-107); these expressions decode the embedded
  * timestamp / counter without leaving codegen.
  */
case class ObjectIdToTimestamp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    if (bytes.length != 12) null
    else {
      val secs = ((bytes(0) & 0xFFL) << 24) | ((bytes(1) & 0xFFL) << 16) |
        ((bytes(2) & 0xFFL) << 8) | (bytes(3) & 0xFFL)
      secs * 1000000L // µs since epoch
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"""if ($b.length != 12) { ${ev.isNull} = true; } else {
         |  ${ev.value} = ((($b[0] & 0xFFL) << 24) | (($b[1] & 0xFFL) << 16) |
         |    (($b[2] & 0xFFL) << 8) | ($b[3] & 0xFFL)) * 1000000L;
         |}""".stripMargin)

  override protected def withNewChildInternal(c: Expression): ObjectIdToTimestamp = copy(c)
}

object GraftFunctions {
  /** Register the engine's SQL functions on a session; idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "objectid_to_timestamp", exprs => ObjectIdToTimestamp(exprs.head), "built-in")
  }

  /** Column-level form (requires register(spark) on the session). */
  def objectIdToTimestamp(c: Column): Column =
    org.apache.spark.sql.functions.call_function("objectid_to_timestamp", c)
}
