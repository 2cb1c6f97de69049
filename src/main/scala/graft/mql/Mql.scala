package graft.mql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Raised for malformed or unsupported MQL constructs (mirrors the
  * reference's ValueError on bad pipelines,
  * bindings/python/pymongoarrow/api.py:235-240). */
final class MqlException(msg: String) extends IllegalArgumentException(msg)

/** Shared helpers for the MQL → Catalyst compilers.
  *
  * The reference (mongodb-labs/mongo-arrow) passes MQL filter documents and
  * aggregation pipelines verbatim to the MongoDB server
  * (bindings/python/pymongoarrow/api.py:175,252). This engine evaluates the
  * same surface natively on Spark: JSON documents are parsed with json4s
  * (ships with Spark) and compiled to Catalyst expressions so the whole
  * query stays inside whole-stage codegen.
  */
object Mql {
  def parse(json: String): JValue = JsonMethods.parse(json)

  def asObj(v: JValue, ctx: String): List[(String, JValue)] = v match {
    case JObject(fields) => fields
    case other => throw new MqlException(s"$ctx: expected a document, got $other")
  }

  /** JVM value for lit(); extended-JSON {"$date": ...} supported. */
  def scalaValue(v: JValue): Any = v match {
    case JString(s)  => s
    case JInt(i)     => if (i.isValidInt) i.toInt else i.toLong
    case JLong(l)    => l
    case JDouble(d)  => d
    case JDecimal(d) => d.bigDecimal
    case JBool(b)    => b
    case JNull | JNothing => null
    case JObject(List(("$date", JString(s)))) =>
      java.sql.Timestamp.from(java.time.Instant.parse(s))
    case JObject(List(("$date", n))) => n match {
      case JInt(ms)    => new java.sql.Timestamp(ms.toLong)
      case JLong(ms)   => new java.sql.Timestamp(ms)
      case JDouble(ms) => new java.sql.Timestamp(ms.toLong)
      case other       => throw new MqlException(s"bad $$date value: $other")
    }
    case other => throw new MqlException(s"unsupported literal: $other")
  }

  def literal(v: JValue): Column = v match {
    case JArray(vs) => array(vs.map(literal): _*)
    case other      => lit(scalaValue(other))
  }

  /** Literal int required (e.g. $limit, $round digits). */
  def intValue(v: JValue, ctx: String): Int = v match {
    case JInt(i)  => i.toInt
    case JLong(l) => l.toInt
    case JDouble(d) if d.isWhole => d.toInt
    case other => throw new MqlException(s"$ctx: expected integer, got $other")
  }

  def strValue(v: JValue, ctx: String): String = v match {
    case JString(s) => s
    case other => throw new MqlException(s"$ctx: expected string, got $other")
  }

  /** A document whose every key is a $-operator (vs a plain sub-document). */
  def isOperatorDoc(fields: List[(String, JValue)]): Boolean =
    fields.nonEmpty && fields.forall(_._1.startsWith("$"))

  /** Dotted paths resolve as nested-field access, matching MQL semantics
    * (reference flattens nested fields to dotted keys,
    * bindings/python/pymongoarrow/lib.pyx:226-241). */
  def fieldCol(path: String): Column = col(path)
}
