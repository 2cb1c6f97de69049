package graft.mql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._
import Mql._

/** Compiles MQL filter documents — the `find`/`$match` query surface the
  * reference delegates to the server (bindings/python/pymongoarrow/
  * api.py:175) — into Catalyst predicates.
  *
  * Missing fields are modeled as SQL NULL (the decoder null-pads missing
  * fields, reference lib.pyx:326-353), so MongoDB's "missing matches
  * $ne/$nin/$exists:false" semantics translate to explicit null handling
  * below. All output is plain Catalyst `Column` logic → fully
  * codegen-able and pushdown-eligible (predicates reach the parquet scan).
  */
object FilterCompiler {
  def compile(json: String): Column = compile(parse(json))

  def compile(v: JValue): Column = compileDoc(asObj(v, "filter"))

  def compileDoc(fields: List[(String, JValue)]): Column =
    fields.map { case (k, v) => compileField(k, v) }
      .reduceOption(_ && _).getOrElse(lit(true))

  private def compileField(key: String, v: JValue): Column = key match {
    case "$and"     => subdocs(v, "$and").map(compileDoc).reduce(_ && _)
    case "$or"      => subdocs(v, "$or").map(compileDoc).reduce(_ || _)
    case "$nor"     => !subdocs(v, "$nor").map(d => coalesce(compileDoc(d), lit(false))).reduce(_ || _)
    case "$expr"    => ExprCompiler.compile(v)
    case "$sampleRate" => v match { // independent per-doc coin flip
      case JDouble(r) if r >= 0 && r <= 1 => rand() < r
      case JInt(r) if r == 0 || r == 1 => rand() < r.toDouble
      case other => throw new MqlException(s"$$sampleRate needs 0..1, got $other")
    }
    case "$comment" => lit(true)
    case op if op.startsWith("$") =>
      throw new MqlException(s"unsupported top-level operator $op")
    case path => v match {
      case JObject(ops) if isOperatorDoc(ops) => compileOps(fieldCol(path), ops)
      case JNull  => fieldCol(path).isNull
      case other  => fieldCol(path) === literal(other)
    }
  }

  private def subdocs(v: JValue, op: String): List[List[(String, JValue)]] = v match {
    case JArray(ds) if ds.nonEmpty => ds.map(d => asObj(d, op))
    case _ => throw new MqlException(s"$op needs a non-empty array of documents")
  }

  /** All operators applied to one field; $regex/$options pairing handled
    * here because they arrive as sibling keys. */
  def compileOps(c: Column, ops: List[(String, JValue)]): Column = {
    val regexOpts = ops.collectFirst { case ("$options", JString(o)) => o }.getOrElse("")
    ops.filterNot(_._1 == "$options")
      .map { case (op, v) => compileOp(c, op, v, regexOpts) }
      .reduce(_ && _)
  }

  /** $in with SQL-null semantics: a null in the list matches null fields. */
  private def inList(c: Column, vs: List[JValue]): Column = {
    val (nulls, rest) = vs.partition(v => v == JNull || v == JNothing)
    val base = if (rest.isEmpty) lit(false) else c.isin(rest.map(scalaValue): _*)
    if (nulls.nonEmpty) base || c.isNull else base
  }

  private def compileOp(c: Column, op: String, v: JValue, regexOpts: String): Column =
    (op, v) match {
      case ("$eq", JNull)  => c.isNull
      case ("$eq", _)      => c === literal(v)
      case ("$ne", JNull)  => c.isNotNull
      case ("$ne", _)      => c.isNull || c =!= literal(v) // missing matches $ne
      case ("$gt", _)      => c > literal(v)
      case ("$gte", _)     => c >= literal(v)
      case ("$lt", _)      => c < literal(v)
      case ("$lte", _)     => c <= literal(v)
      case ("$in", JArray(vs))  => inList(c, vs)
      case ("$nin", JArray(vs)) => !coalesce(inList(c, vs), lit(false))
      case ("$exists", JBool(b)) => if (b) c.isNotNull else c.isNull
      case ("$not", JObject(ops)) if isOperatorDoc(ops) =>
        !coalesce(compileOps(c, ops), lit(false))
      case ("$regex", JString(p)) =>
        c.rlike((if (regexOpts.nonEmpty) s"(?$regexOpts)" else "") + p)
      case ("$mod", JArray(List(d, r))) => c % literal(d) === literal(r)
      case ("$size", _) => size(c) === literal(v)
      // $type matches the value's BSON type name ("number" is the
      // numeric alias); Mongo's numeric type-ids are not supported here
      case ("$type", JString(t)) => typeMatches(c, t)
      case ("$type", JArray(ts)) =>
        ts.map(x => typeMatches(c, strValue(x, "$type"))).reduce(_ || _)
      case ("$all", JArray(vs)) if vs.nonEmpty =>
        vs.map(x => array_contains(c, literal(x))).reduce(_ && _)
      case ("$elemMatch", JObject(ops)) if isOperatorDoc(ops) =>
        exists(c, e => compileOps(e, ops))
      case ("$elemMatch", JObject(fields)) =>
        exists(c, e => fields.map {
          case (k, JObject(ops)) if isOperatorDoc(ops) => compileOps(e.getField(k), ops)
          case (k, other) => e.getField(k) === literal(other)
        }.reduce(_ && _))
      case _ => throw new MqlException(s"unsupported filter operator $op with $v")
    }

  private def typeMatches(c: Column, t: String): Column = t match {
    case "null"   => c.isNull
    case "number" => ExprCompiler.bsonTypeName(c).isin("int", "long", "double", "decimal")
    case other    => ExprCompiler.bsonTypeName(c) === other
  }
}
