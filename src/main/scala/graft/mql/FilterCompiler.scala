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
      // $bits*: bitmask tests over integral values. Mask is a number or
      // an array of bit positions (Mongo also accepts BinData — out of
      // scope, the decoder keeps binary opaque). Mongo matches only
      // values with an exact 64-bit integral representation: fractional
      // doubles, strings, and nulls never match.
      case ("$bitsAllSet", _)   => bitsTest(c, v, op)((f, m) => f.bitwiseAND(m) === m)
      case ("$bitsAllClear", _) => bitsTest(c, v, op)((f, m) => f.bitwiseAND(m) === lit(0L))
      case ("$bitsAnySet", _)   => bitsTest(c, v, op)((f, m) => f.bitwiseAND(m) =!= lit(0L))
      case ("$bitsAnyClear", _) => bitsTest(c, v, op)((f, m) => f.bitwiseAND(m) =!= m)
      case ("$geoWithin", JObject(shape)) => geoWithin(c, shape)
      case _ => throw new MqlException(s"unsupported filter operator $op with $v")
    }

  private def bitsTest(c: Column, v: JValue, op: String)
                      (test: (Column, Column) => Column): Column = {
    val mask: Long = v match {
      case JInt(i) if i >= 0  => i.toLong
      case JLong(l) if l >= 0 => l
      case JDouble(d) if d.isWhole && d >= 0 => d.toLong
      case JArray(ps) => ps.map {
          case JInt(p) if p >= 0 && p < 63 => 1L << p.toInt
          case other => throw new MqlException(
            s"$op: bit positions must be integers in [0, 62], got $other")
        }.foldLeft(0L)(_ | _)
      case other => throw new MqlException(
        s"$op needs a non-negative bitmask or an array of bit positions, got $other")
    }
    val f = c.cast("long")
    // exact-integral guard: casts of non-numeric values yield null →
    // coalesce(false); fractional doubles fail the round-trip equality
    coalesce(c.cast("double") === f.cast("double"), lit(false)) &&
      test(f, lit(mask))
  }

  /** `$geoWithin` over a [lon, lat] array field. Same arithmetic (and the
    * same operation ORDER, so DuckDB twins agree bit for bit) as the
    * $search geo operators: $center/$polygon/$box are planar in
    * coordinate units (Mongo's 2d flat semantics), $centerSphere compares
    * the haversine central angle against a radius in radians, $geometry
    * Polygon is PNPOLY ray casting. Zero shuffles — a pushable map-side
    * predicate like any other filter. */
  private def geoWithin(c: Column, shape: List[(String, JValue)]): Column = {
    def num(v: JValue, ctx: String): Double = v match {
      case JInt(i) => i.toDouble
      case JLong(l) => l.toDouble
      case JDouble(d) => d
      case JDecimal(d) => d.toDouble
      case other => throw new MqlException(s"$ctx: expected a number, got $other")
    }
    def point(v: JValue, ctx: String): (Double, Double) = v match {
      case JArray(List(x, y)) => (num(x, ctx), num(y, ctx))
      case other => throw new MqlException(s"$ctx: expected [x, y], got $other")
    }
    val lon = element_at(c, 1).cast("double")
    val lat = element_at(c, 2).cast("double")
    def pnpoly(vs: Seq[(Double, Double)]): Column = {
      if (vs.length < 3)
        throw new MqlException("$geoWithin: polygon needs >= 3 vertices")
      vs.indices.map { i =>
        val (xi, yi) = vs(i)
        val (xj, yj) = vs((i + 1) % vs.length)
        val cr = (lit(yi) > lat) =!= (lit(yj) > lat) &&
          lon < lit(xj - xi) * (lat - lit(yi)) / lit(yj - yi) + lit(xi)
        when(cr, 1).otherwise(0)
      }.reduce(_ + _) % 2 === 1
    }
    val in = shape match {
      case List(("$box", JArray(List(bl, tr)))) =>
        val (x1, y1) = point(bl, "$geoWithin.$box")
        val (x2, y2) = point(tr, "$geoWithin.$box")
        lon >= lit(x1) && lon <= lit(x2) && lat >= lit(y1) && lat <= lit(y2)
      case List(("$center", JArray(List(ctr, r)))) =>
        val (cx, cy) = point(ctr, "$geoWithin.$center")
        sqrt(pow(lon - lit(cx), 2) + pow(lat - lit(cy), 2)) <=
          lit(num(r, "$geoWithin.$center radius"))
      case List(("$centerSphere", JArray(List(ctr, r)))) =>
        val (cx, cy) = point(ctr, "$geoWithin.$centerSphere")
        val a = pow(sin(radians(lat - lit(cy)) / 2), 2) +
          cos(radians(lit(cy))) * cos(radians(lat)) *
            pow(sin(radians(lon - lit(cx)) / 2), 2)
        lit(2.0) * asin(sqrt(a)) <= lit(num(r, "$geoWithin.$centerSphere radius"))
      case List(("$polygon", JArray(vs))) =>
        pnpoly(vs.map(point(_, "$geoWithin.$polygon")))
      case List(("$geometry", g)) =>
        val o = asObj(g, "$geoWithin.$geometry")
        o.collectFirst { case ("type", JString(t)) => t } match {
          case Some("Polygon") =>
            val rings = o.collectFirst { case ("coordinates", JArray(rs)) => rs }
              .getOrElse(throw new MqlException(
                "$geoWithin.$geometry: Polygon needs coordinates"))
            if (rings.length != 1) throw new MqlException(
              "$geoWithin.$geometry: only single-ring polygons are supported")
            val pts = rings.head match {
              case JArray(ps) => ps.map(point(_, "$geoWithin.$geometry"))
              case other => throw new MqlException(s"$$geoWithin: bad ring $other")
            }
            // GeoJSON closes the ring; PNPOLY wants it open
            pnpoly(if (pts.length > 1 && pts.head == pts.last) pts.init else pts)
          case other => throw new MqlException(
            s"$$geoWithin.$$geometry: unsupported type $other (Polygon only)")
        }
      case other => throw new MqlException(
        s"$$geoWithin needs one of $$box/$$center/$$centerSphere/$$polygon/$$geometry, got ${other.map(_._1).mkString(",")}")
    }
    coalesce(in, lit(false))
  }

  private def typeMatches(c: Column, t: String): Column = t match {
    case "null"   => c.isNull
    case "number" => ExprCompiler.bsonTypeName(c).isin("int", "long", "double", "decimal")
    case other    => ExprCompiler.bsonTypeName(c) === other
  }
}
