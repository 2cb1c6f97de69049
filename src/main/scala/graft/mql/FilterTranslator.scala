package graft.mql

import org.apache.spark.sql.sources._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Catalyst source-`Filter` → MQL filter document — the INVERSE of
  * [[FilterCompiler]], and the pushdown-translation core of a live
  * MongoDB connector: a DSv2 scan hands its pushed predicates to this
  * layer, and the resulting document is what `find(filter, ...)` would
  * send to the server (the reference forwards exactly such a document
  * verbatim, bindings/python/pymongoarrow/api.py:175).
  *
  * Contract: for every translated filter,
  * `FilterCompiler.compile(render(translate(f)))` must KEEP and DROP
  * exactly the rows Spark's own evaluation of `f` keeps and drops
  * (null → drop, three-valued logic collapsed at the filter boundary).
  * That round trip is property-tested in FilterTranslatorSpec; filters
  * whose MQL rendering would diverge (null `$in` members, general
  * negation — Mongo's `$not`/`$nor` KEEP null/missing fields where
  * Spark's `Not` drops them) return None and stay Spark-side residuals,
  * exactly how a connector must treat them.
  */
object FilterTranslator {

  /** Extended-JSON literal for a Spark filter value. None = this value
    * has no faithful MQL rendering (the filter stays a residual). */
  def literalJson(v: Any): Option[JValue] = v match {
    case null => Some(JNull)
    case s: String => Some(JString(s))
    case b: java.lang.Boolean => Some(JBool(b))
    case i: java.lang.Integer => Some(JInt(BigInt(i.intValue)))
    case l: java.lang.Long => Some(JInt(BigInt(l.longValue)))
    case s: java.lang.Short => Some(JInt(BigInt(s.intValue)))
    case b: java.lang.Byte => Some(JInt(BigInt(b.intValue)))
    case d: java.lang.Double => Some(JDouble(d))
    case f: java.lang.Float => Some(JDouble(f.doubleValue)) // exact widen
    case d: java.math.BigDecimal => Some(JDecimal(BigDecimal(d)))
    case d: BigDecimal => Some(JDecimal(d))
    case i: BigInt => Some(JInt(i))
    case t: java.sql.Timestamp =>
      Some(JObject(List("$date" -> JString(t.toInstant.toString))))
    case i: java.time.Instant =>
      Some(JObject(List("$date" -> JString(i.toString))))
    // dates render as UTC-midnight $date: under the engine's UTC session
    // timezone the compiled comparison is equivalent (TimezoneSpec §1.4)
    case d: java.sql.Date =>
      Some(JObject(List("$date" -> JString(
        d.toLocalDate.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toString))))
    case d: java.time.LocalDate =>
      Some(JObject(List("$date" -> JString(
        d.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toString))))
    case _ => None // binary, struct, array, interval: no wire form here
  }

  private def regexQuote(s: String): String =
    java.util.regex.Pattern.quote(s)

  private def fieldOp(a: String, op: String, v: Any): Option[JValue] =
    literalJson(v).map(j => JObject(List(a -> JObject(List(op -> j)))))

  /** MQL filter document for one Spark source filter; None when no
    * faithful rendering exists. */
  def translate(f: Filter): Option[JValue] = f match {
    case EqualTo(_, null) => None // Spark: never matches; Mongo {$eq: null} matches null
    case EqualTo(a, v) => fieldOp(a, "$eq", v)
    case EqualNullSafe(a, null) => Some(JObject(List(a -> JNull))) // isNull
    // at the filter boundary <=> and === keep the same rows (both drop null)
    case EqualNullSafe(a, v) => fieldOp(a, "$eq", v)
    case GreaterThan(a, v) => fieldOp(a, "$gt", v)
    case GreaterThanOrEqual(a, v) => fieldOp(a, "$gte", v)
    case LessThan(a, v) => fieldOp(a, "$lt", v)
    case LessThanOrEqual(a, v) => fieldOp(a, "$lte", v)
    case IsNull(a) => Some(JObject(List(a -> JNull)))
    case IsNotNull(a) => Some(JObject(List(a -> JObject(List("$ne" -> JNull)))))
    case In(a, vs) =>
      // a null member diverges: Mongo's $in-null matches null fields,
      // Spark's In never does — residual
      if (vs.contains(null)) None
      else {
        val js = vs.toList.map(literalJson)
        if (js.exists(_.isEmpty)) None
        else Some(JObject(List(a -> JObject(List("$in" -> JArray(js.map(_.get)))))))
      }
    case StringStartsWith(a, s) => fieldOp(a, "$regex", "^" + regexQuote(s))
    case StringEndsWith(a, s) => fieldOp(a, "$regex", regexQuote(s) + "$")
    case StringContains(a, s) => fieldOp(a, "$regex", regexQuote(s))
    case And(l, r) =>
      for (lj <- translate(l); rj <- translate(r))
        yield JObject(List("$and" -> JArray(List(lj, rj))))
    case Or(l, r) =>
      for (lj <- translate(l); rj <- translate(r))
        yield JObject(List("$or" -> JArray(List(lj, rj))))
    // Negation: Mongo's $not/$nor KEEP documents whose field is null or
    // missing; Spark's Not drops them (null → null → drop). Only the
    // null-safe shapes translate faithfully:
    case Not(EqualNullSafe(a, null)) => // IS NOT NULL
      Some(JObject(List(a -> JObject(List("$ne" -> JNull)))))
    case Not(EqualNullSafe(a, v)) =>
      // !(c <=> v) keeps nulls — EXACTLY Mongo's missing-matches-$ne
      fieldOp(a, "$ne", v)
    case Not(IsNull(a)) => Some(JObject(List(a -> JObject(List("$ne" -> JNull)))))
    case Not(IsNotNull(a)) => Some(JObject(List(a -> JNull)))
    case _ => None
  }

  /** Split a pushed-filter set into (combined MQL document, residuals).
    * The document is the conjunction of every translatable filter —
    * what a live connector would send server-side; residuals must stay
    * in the Spark plan. */
  def translateAll(fs: Seq[Filter]): (JValue, Seq[Filter]) = {
    val (ok, residual) = fs.map(f => f -> translate(f)).partition(_._2.isDefined)
    val docs = ok.flatMap(_._2)
    val doc = docs match {
      case Seq() => JObject(Nil)
      case Seq(one) => one
      case many => JObject(List("$and" -> JArray(many.toList)))
    }
    (doc, residual.map(_._1))
  }

  def render(doc: JValue): String = JsonMethods.compact(JsonMethods.render(doc))
}
