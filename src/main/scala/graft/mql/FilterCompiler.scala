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
  /** Mongo collation document, reduced to what an engine without ICU
    * tailoring can honor exactly: strength 1/2 → case-insensitive string
    * comparison (both sides fold through lower()), strength 3+ (the
    * default) → binary; `numericOrdering: true` (digit runs compare as
    * numbers), `caseFirst: upper|lower` (case variants order by the
    * option at the secondary level), and `alternate: "shifted"`
    * (whitespace/punctuation ignorable) compile through binary-
    * comparable collation KEYS ([[graft.functions.CollationKeys]]).
    * Locale is accepted and ignored except that only untailored
    * comparison is offered — a locale needing tailored order ("sv" and
    * friends) still compares codepoint-wise, the documented deviation.
    * Only comparisons whose LITERAL is a string collate (collation
    * never touches numerics — same contract as Mongo). */
  final case class Collation(caseInsensitive: Boolean,
                             numericOrdering: Boolean = false,
                             caseFirst: String = "off",
                             shifted: Boolean = false) {
    /** Needs the full collation-KEY comparison path (beyond the plain
      * lower()-fold ci offers) — numericOrdering / caseFirst /
      * alternate engage [[graft.functions.CollationKeys]]. */
    def keyed: Boolean = numericOrdering || caseFirst != "off" || shifted
    def spec: String =
      s"ci=${if (caseInsensitive) 1 else 0};" +
        s"num=${if (numericOrdering) 1 else 0};" +
        s"caseFirst=$caseFirst;shifted=${if (shifted) 1 else 0}"
    def keyOf(s: String): String = graft.functions.CollationKeys.key(
      s, caseInsensitive, numericOrdering, caseFirst, shifted)
  }

  object Collation {
    def parse(json: String): Collation = {
      val fields = asObj(Mql.parse(json), "collation")
      fields.map(_._1).find(k => !Set("locale", "strength",
          "numericOrdering", "caseFirst", "alternate").contains(k))
        .foreach(k => throw new MqlException(s"collation: unsupported field '$k'"))
      val strength = fields.collectFirst { case ("strength", v) =>
        v match {
          case JInt(i) => i.toInt
          case other => throw new MqlException(s"collation.strength: $other")
        }
      }.getOrElse(3)
      if (strength < 1 || strength > 5)
        throw new MqlException(s"collation.strength must be 1..5, got $strength")
      val numeric = fields.collectFirst { case ("numericOrdering", v) =>
        v match {
          case JBool(b) => b
          case other => throw new MqlException(s"collation.numericOrdering: $other")
        }
      }.getOrElse(false)
      val caseFirst = fields.collectFirst { case ("caseFirst", v) =>
        v match {
          case JString(cf @ ("upper" | "lower" | "off")) => cf
          case other => throw new MqlException(
            s"collation.caseFirst must be upper|lower|off, got $other")
        }
      }.getOrElse("off")
      val shifted = fields.collectFirst { case ("alternate", v) =>
        v match {
          case JString("shifted") => true
          case JString("non-ignorable") => false
          case other => throw new MqlException(
            s"collation.alternate must be non-ignorable|shifted, got $other")
        }
      }.getOrElse(false)
      // mongod: caseFirst orders case VARIANTS, which only exist when
      // the comparison is case-sensitive (strength 3+)
      if (strength <= 2 && caseFirst != "off")
        throw new MqlException(
          "collation: caseFirst needs a case-sensitive strength (3+)")
      Collation(caseInsensitive = strength <= 2,
        numericOrdering = numeric, caseFirst = caseFirst, shifted = shifted)
    }
  }

  // threaded via a DynamicVariable instead of a parameter on every
  // compile method: the collation is a per-find ambient setting, and
  // the call tree below (compileDoc → compileField → compileOps →
  // compileOp, plus $elemMatch recursion) is pure within one call
  private val activeCollation =
    new scala.util.DynamicVariable[Option[Collation]](None)

  private def ci: Boolean = activeCollation.value.exists(_.caseInsensitive)

  private def keyedColl: Option[Collation] =
    activeCollation.value.filter(_.keyed)

  /** Column side of a collation-KEY comparison (see
    * [[graft.functions.CollationKeys]]); the literal side keys
    * driver-side through the same function. */
  private def keyCol(c: Column, k: Collation): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("collation_key", c, lit(k.spec))
  }

  /** Fold a comparison side for the active collation when the literal
    * is a string (collation affects string comparison only): the
    * key path for numericOrdering/caseFirst/alternate, the plain
    * lower() fold (pushdown-friendlier) when only ci is on. */
  private def cmp(c: Column, v: JValue): (Column, Column) = v match {
    case JString(s) if keyedColl.isDefined =>
      val k = keyedColl.get
      (keyCol(c, k), lit(k.keyOf(s)))
    case JString(s) if ci => (lower(c), lit(s.toLowerCase))
    case _ => (c, literal(v))
  }

  // the input schema, threaded ambiently like the collation: equality
  // needs the FIELD TYPE to honor Mongo's implicit array-traversal rule
  // ({tags: v} matches arrays containing v), and a schema is only known
  // at the sites that apply a filter to a concrete DataFrame. Without a
  // schema every comparison compiles exactly as before (scalar
  // semantics, full analyzer coercion, pushdown untouched).
  private val activeSchema =
    new scala.util.DynamicVariable[Option[org.apache.spark.sql.types.StructType]](None)

  /** Run `body` with the input schema visible to equality compilation. */
  def withSchema[T](schema: Option[org.apache.spark.sql.types.StructType])(body: => T): T =
    activeSchema.withValue(schema)(body)

  /** Leaf type of a (dotted) path under the ambient schema; a dotted
    * step THROUGH an array of structs projects to an array of the
    * member type (what `col("a.b")` yields — and exactly Mongo's
    * array-of-docs dotted semantics). */
  private def leafType(path: String): Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    activeSchema.value.flatMap { schema =>
      path.split('.').foldLeft(Option(schema: DataType)) {
        case (Some(st: StructType), name) =>
          st.fields.find(_.name == name).map(_.dataType)
        case (Some(ArrayType(st: StructType, _)), name) =>
          st.fields.find(_.name == name)
            .map(f => ArrayType(f.dataType, containsNull = true))
        case _ => None
      }
    }
  }

  /** Can a literal of this JSON kind equal a value of `et`? Mongo's
    * type bracketing makes cross-kind equality FALSE (a string never
    * equals a number) — returning lit(false) instead of letting an ANSI
    * cast throw at runtime. */
  private def kindCompatible(v: JValue,
                             et: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    v match {
      case JString(_) => et == StringType
      case JBool(_) => et == BooleanType
      case _: JInt | _: JLong | _: JDouble | _: JDecimal => et.isInstanceOf[NumericType]
      case _ => true // $date and friends: let the analyzer decide
    }
  }

  /** Mongo equality incl. the implicit array-traversal rule: on a field
    * KNOWN to be an array, a scalar literal tests element containment
    * (`exists` — each element comparison goes through the analyzer's
    * ordinary coercion) and an array literal keeps whole-array equality;
    * everywhere else the exact pre-existing scalar comparison compiles
    * (identical plan and pushdown). The ci-collation string path stays
    * on folded scalar equality. */
  private def mongoEq(c: Column, v: JValue,
                      lt: Option[org.apache.spark.sql.types.DataType]): Column =
    (v, lt) match {
      case (JString(s), _) if keyedColl.isDefined =>
        val k = keyedColl.get
        keyCol(c, k) === lit(k.keyOf(s))
      case (JString(s), _) if ci => lower(c) === lit(s.toLowerCase)
      case (JArray(es), Some(org.apache.spark.sql.types.ArrayType(et, _))) =>
        if (es.forall(kindCompatible(_, et))) c === literal(v) else lit(false)
      case (_, Some(org.apache.spark.sql.types.ArrayType(et, _))) =>
        if (kindCompatible(v, et)) exists(c, e => e === literal(v)) else lit(false)
      case _ => val (l, r) = cmp(c, v); l === r
    }

  def compile(json: String): Column = compile(parse(json))

  def compile(v: JValue): Column = compileDoc(asObj(v, "filter"))

  /** Extra results only the find path carries: the implicit nearest-first
    * sort key of `$near`/`$nearSphere`, and the `textScore` column of
    * `$text` (attached as a real column — Spark has no out-of-band
    * metadata channel, the same convention $search/$vectorSearch use for
    * their scores). */
  final case class FindCompiled(pred: Column, nearDist: Option[Column],
                                textScore: Option[Column],
                                textToks: Option[Column] = None)

  /** find-path entry point: compiles the filter AND surfaces the implicit
    * nearest-first sort key when the filter contains `$near`/`$nearSphere`,
    * plus the `$text` relevance score. Mongo's find sorts $near results by
    * distance as a side effect of the geo index walk; an index-free engine
    * reproduces that as an explicit ORDER BY on the same distance
    * expression the bounds test uses. These operators are only legal at
    * the top level of the filter document (Mongo likewise rejects $near
    * inside $or/$nor/$elemMatch), and only once per query (one index
    * walk). `compile`/`$match` reject them outright — Mongo's errors
    * there are "use $geoNear" / "use $search". */
  def compileFind(json: String,
                  collation: Option[Collation] = None): FindCompiled =
    activeCollation.withValue(collation)(compileFindInner(json))

  /** Run `body` with `collation` active: every filter compiled inside
    * folds string comparisons (the aggregate-level collation option —
    * the reference forwards it verbatim in kwargs, api.py:252). */
  def withCollation[T](collation: Option[Collation])(body: => T): T =
    activeCollation.withValue(collation)(body)

  /** Whether a case-insensitive collation is active (pipeline stages
    * consult this to fold sort keys / reject unsupported stages). */
  def collationCaseInsensitive: Boolean = ci

  private def compileFindInner(json: String): FindCompiled = {
    val fields = asObj(parse(json), "filter")
    val nearDists = scala.collection.mutable.ArrayBuffer[Column]()
    val textScores = scala.collection.mutable.ArrayBuffer[Column]()
    val textToks = scala.collection.mutable.ArrayBuffer[Column]()
    val preds = fields.map {
      case (path, JObject(ops)) if !path.startsWith("$") && isOperatorDoc(ops) &&
          ops.exists(o => o._1 == "$near" || o._1 == "$nearSphere") =>
        val (pred, dist) = compileNear(fieldCol(path), ops)
        nearDists += dist
        pred
      case ("$text", v) =>
        val (pred, score, toks) = compileText(asObj(v, "$text"))
        textScores += score
        textToks += toks
        pred
      case (k, v) => compileField(k, v)
    }
    if (nearDists.length > 1)
      throw new MqlException("only one $near/$nearSphere is allowed per query")
    if (textScores.length > 1)
      throw new MqlException("only one $text is allowed per query")
    FindCompiled(preds.reduceOption(_ && _).getOrElse(lit(true)),
      nearDists.headOption, textScores.headOption, textToks.headOption)
  }

  def compileWithNear(json: String): (Column, Option[Column]) = {
    val fc = compileFind(json)
    (fc.pred, fc.nearDist)
  }

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
    case "$jsonSchema" => jsonSchemaRoot(asObj(v, "$jsonSchema"))
    case "$text" => throw new MqlException(
      "$text is only valid at the top level of a find filter " +
        "(aggregation pipelines use $search)")
    case "$where" => throw new MqlException(
      s"$$where: ${PipelineCompiler.JsOutOfScope} (use $$expr)")
    case op if op.startsWith("$") =>
      throw new MqlException(s"unsupported top-level operator $op")
    case path => v match {
      case JObject(ops) if isOperatorDoc(ops) =>
        compileOps(fieldCol(path), ops, leafType(path))
      case JNull  => fieldCol(path).isNull
      case other  => mongoEq(fieldCol(path), other, leafType(path))
    }
  }

  private def subdocs(v: JValue, op: String): List[List[(String, JValue)]] = v match {
    case JArray(ds) if ds.nonEmpty => ds.map(d => asObj(d, op))
    case _ => throw new MqlException(s"$op needs a non-empty array of documents")
  }

  /** All operators applied to one field; $regex/$options pairing handled
    * here because they arrive as sibling keys. */
  def compileOps(c: Column, ops: List[(String, JValue)],
                 lt: Option[org.apache.spark.sql.types.DataType] = None): Column = {
    val regexOpts = ops.collectFirst { case ("$options", JString(o)) => o }.getOrElse("")
    val rest = ops.filterNot(_._1 == "$options")
    if (rest.isEmpty) // {"a": {"$options": "i"}} alone — Mongo's error, not
      throw new MqlException("$options needs a $regex") // an empty reduce
    rest.map { case (op, v) => compileOp(c, op, v, regexOpts, lt) }
      .reduce(_ && _)
  }

  /** $in with SQL-null semantics: a null in the list matches null
    * fields; under case-insensitive collation string members compare
    * folded (non-string members stay binary — collation never touches
    * numerics). */
  private def inList(c: Column, vs: List[JValue],
                     lt: Option[org.apache.spark.sql.types.DataType] = None): Column = {
    // on an ARRAY field, $in is an OR of Mongo equalities over the list
    // members (element containment for scalars, whole-array equality
    // for array members, null members matching missing/null fields)
    if (lt.exists(_.isInstanceOf[org.apache.spark.sql.types.ArrayType])) {
      val (nulls0, rest0) = vs.partition(v => v == JNull || v == JNothing)
      return (rest0.map(v => mongoEq(c, v, lt)) ++
        (if (nulls0.isEmpty) Nil else Seq(c.isNull)))
        .reduceOption(_ || _).getOrElse(lit(false))
    }
    val (nulls, rest) = vs.partition(v => v == JNull || v == JNothing)
    val (strs, others) = rest.partition(_.isInstanceOf[JString])
    val parts =
      (if (strs.isEmpty) Nil
       else if (keyedColl.isDefined) {
         val k = keyedColl.get
         Seq(keyCol(c, k).isin(strs.map {
           case JString(s) => k.keyOf(s); case _ => "" }: _*))
       } else if (ci) Seq(lower(c).isin(strs.map {
         case JString(s) => s.toLowerCase; case _ => "" }: _*))
       else Seq(c.isin(strs.map(scalaValue): _*))) ++
      (if (others.isEmpty) Nil else Seq(c.isin(others.map(scalaValue): _*))) ++
      (if (nulls.isEmpty) Nil else Seq(c.isNull))
    parts.reduceOption(_ || _).getOrElse(lit(false))
  }

  private def compileOp(c: Column, op: String, v: JValue, regexOpts: String,
                        lt: Option[org.apache.spark.sql.types.DataType] = None): Column =
    (op, v) match {
      case ("$eq", JNull)  => c.isNull
      case ("$eq", _)      => mongoEq(c, v, lt)
      case ("$ne", JNull)  => c.isNotNull
      case ("$ne", _) if lt.exists(_.isInstanceOf[org.apache.spark.sql.types.ArrayType]) =>
        // on arrays: not-contains; the coalesce absorbs the null that
        // `exists` yields when the array holds nulls but no match
        c.isNull || !coalesce(mongoEq(c, v, lt), lit(false))
      case ("$ne", _)      => // missing matches $ne
        val (l, r) = cmp(c, v); c.isNull || l =!= r
      case ("$gt", _)      => val (l, r) = cmp(c, v); l > r
      case ("$gte", _)     => val (l, r) = cmp(c, v); l >= r
      case ("$lt", _)      => val (l, r) = cmp(c, v); l < r
      case ("$lte", _)     => val (l, r) = cmp(c, v); l <= r
      case ("$in", JArray(vs))  => inList(c, vs, lt)
      case ("$nin", JArray(vs)) => !coalesce(inList(c, vs, lt), lit(false))
      case ("$exists", JBool(b)) => if (b) c.isNotNull else c.isNull
      case ("$not", JObject(ops)) if isOperatorDoc(ops) =>
        !coalesce(compileOps(c, ops, lt), lit(false))
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
        vs.map {
          case JString(s) if ci =>
            array_contains(transform(c, e => lower(e)), lit(s.toLowerCase))
          case x => array_contains(c, literal(x))
        }.reduce(_ && _)
      case ("$elemMatch", JObject(ops)) if isOperatorDoc(ops) =>
        exists(c, e => compileOps(e, ops))
      case ("$elemMatch", JObject(fields)) =>
        exists(c, e => fields.map {
          case (k, JObject(ops)) if isOperatorDoc(ops) => compileOps(e.getField(k), ops)
          // bare equality follows Mongo's null semantics: {qty: null}
          // matches elements whose qty is null or missing (a raw ===
          // would be null for every element and match nothing)
          case (k, JNull) => e.getField(k).isNull
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
      case ("$geoIntersects", JObject(shape)) => geoIntersects(c, shape)
      case ("$near" | "$nearSphere" | "$minDistance" | "$maxDistance", _) =>
        throw new MqlException(
          s"$op is only valid at the top level of a find filter " +
            "(aggregation $match requires $geoNear)")
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
  private def num(v: JValue, ctx: String): Double = v match {
    case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case other => throw new MqlException(s"$ctx: expected a number, got $other")
  }

  private def point(v: JValue, ctx: String): (Double, Double) = v match {
    case JArray(List(x, y)) => (num(x, ctx), num(y, ctx))
    case other => throw new MqlException(s"$ctx: expected [x, y], got $other")
  }

  /** PNPOLY ray casting (same operation order as the $search geo clauses
    * so DuckDB twins agree bit for bit). */
  private def pnpoly(lon: Column, lat: Column,
                     vs: Seq[(Double, Double)], ctx: String): Column = {
    if (vs.length < 3)
      throw new MqlException(s"$ctx: polygon needs >= 3 vertices")
    vs.indices.map { i =>
      val (xi, yi) = vs(i)
      val (xj, yj) = vs((i + 1) % vs.length)
      val cr = (lit(yi) > lat) =!= (lit(yj) > lat) &&
        lon < lit(xj - xi) * (lat - lit(yi)) / lit(yj - yi) + lit(xi)
      when(cr, 1).otherwise(0)
    }.reduce(_ + _) % 2 === 1
  }

  /** GeoJSON `$geometry` containment test for a point field: Polygon via
    * PNPOLY (single ring), Point via coordinate equality. Shared by
    * `$geoWithin.$geometry` and `$geoIntersects` — for point data the two
    * predicates coincide (a point intersects a shape iff it lies in it). */
  private def geometryContains(lon: Column, lat: Column, g: JValue,
                               ctx: String): Column = {
    val o = asObj(g, ctx)
    o.collectFirst { case ("type", JString(t)) => t } match {
      case Some("Polygon") =>
        val rings = o.collectFirst { case ("coordinates", JArray(rs)) => rs }
          .getOrElse(throw new MqlException(s"$ctx: Polygon needs coordinates"))
        if (rings.length != 1) throw new MqlException(
          s"$ctx: only single-ring polygons are supported")
        val pts = rings.head match {
          case JArray(ps) => ps.map(point(_, ctx))
          case other => throw new MqlException(s"$ctx: bad ring $other")
        }
        // GeoJSON closes the ring; PNPOLY wants it open
        pnpoly(lon, lat,
          if (pts.length > 1 && pts.head == pts.last) pts.init else pts, ctx)
      case Some("Point") =>
        val (px, py) = o.collectFirst { case ("coordinates", cs) =>
          point(cs, ctx) }.getOrElse(throw new MqlException(
            s"$ctx: Point needs coordinates"))
        lon === lit(px) && lat === lit(py)
      case other => throw new MqlException(
        s"$ctx: unsupported geometry type $other (Polygon/Point only)")
    }
  }

  private def geoWithin(c: Column, shape: List[(String, JValue)]): Column = {
    val lon = element_at(c, 1).cast("double")
    val lat = element_at(c, 2).cast("double")
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
        pnpoly(lon, lat, vs.map(point(_, "$geoWithin.$polygon")), "$geoWithin.$polygon")
      case List(("$geometry", g)) =>
        geometryContains(lon, lat, g, "$geoWithin.$geometry")
      case other => throw new MqlException(
        s"$$geoWithin needs one of $$box/$$center/$$centerSphere/$$polygon/$$geometry, got ${other.map(_._1).mkString(",")}")
    }
    coalesce(in, lit(false))
  }

  /** `$geoIntersects` for point fields: GeoJSON `$geometry` only (as in
    * Mongo — legacy shapes are not accepted here). A point intersects a
    * polygon iff it lies inside it, so this shares `geometryContains`
    * with `$geoWithin` — the distinction only matters for non-point
    * document geometries, which the data model does not carry. */
  private def geoIntersects(c: Column, shape: List[(String, JValue)]): Column =
    shape match {
      case List(("$geometry", g)) =>
        coalesce(geometryContains(element_at(c, 1).cast("double"),
          element_at(c, 2).cast("double"), g, "$geoIntersects.$geometry"),
          lit(false))
      case other => throw new MqlException(
        s"$$geoIntersects needs $$geometry, got ${other.map(_._1).mkString(",")}")
    }

  /** One `$near`/`$nearSphere` term → (bounds predicate, raw distance).
    * Distance units follow Mongo's matrix: GeoJSON `$geometry` center →
    * meters on the R=6378100 sphere (haversine, identical arithmetic to
    * $geoNear); legacy [x, y] with `$near` → planar coordinate units;
    * legacy [x, y] with `$nearSphere` → spherical central angle in
    * RADIANS. `$minDistance`/`$maxDistance` ride either as sibling keys
    * (legacy) or inside the operator document (GeoJSON form); both spots
    * are accepted for both forms. Docs without a 2-element point never
    * match (they would not be in the geo index). */
  private def compileNear(c: Column, ops: List[(String, JValue)]): (Column, Column) = {
    val nearOps = ops.filter(o => o._1 == "$near" || o._1 == "$nearSphere")
    if (nearOps.length > 1)
      throw new MqlException("only one $near/$nearSphere is allowed per field")
    val (op, spec) = nearOps.head
    val inner = spec match { case jo: JObject => asObj(jo, op); case _ => Nil }
    def distOpt(key: String): Option[Double] =
      inner.collectFirst { case (`key`, v) => num(v, s"$op.$key") }
        .orElse(ops.collectFirst { case (`key`, v) => num(v, key) })
    val (cx, cy, spherical, radians_) = spec match {
      case JArray(List(x, y)) =>
        (num(x, op), num(y, op), op == "$nearSphere", op == "$nearSphere")
      case _: JObject =>
        val g = inner.collectFirst { case ("$geometry", g) => g }
          .getOrElse(throw new MqlException(s"$op: object form needs $$geometry"))
        val o = asObj(g, s"$op.$$geometry")
        if (!o.exists(_ == ("type", JString("Point"))))
          throw new MqlException(s"$op.$$geometry must be a GeoJSON Point")
        val (x, y) = o.collectFirst { case ("coordinates", cs) =>
          point(cs, s"$op.$$geometry.coordinates") }
          .getOrElse(throw new MqlException(s"$op.$$geometry needs coordinates"))
        (x, y, true, false)
      case other => throw new MqlException(
        s"$op: expected [x, y] or {$$geometry: ...}, got $other")
    }
    val lon = element_at(c, 1).cast("double")
    val lat = element_at(c, 2).cast("double")
    val dist =
      if (spherical) {
        val a = pow(sin(radians(lat - lit(cy)) / 2), 2) +
          cos(radians(lit(cy))) * cos(radians(lat)) *
            pow(sin(radians(lon - lit(cx)) / 2), 2)
        // same operation order as $geoNear so DuckDB twins agree exactly
        if (radians_) lit(2.0) * asin(sqrt(a))
        else lit(2.0 * 6378100.0) * asin(sqrt(a))
      } else sqrt(pow(lon - lit(cx), 2) + pow(lat - lit(cy), 2))
    // any non-near sibling operators still apply as ordinary predicates
    val nearKeys = Set("$near", "$nearSphere", "$minDistance", "$maxDistance")
    val rest = ops.filterNot(o => nearKeys(o._1))
    var pred = c.isNotNull && size(c) === 2
    distOpt("$minDistance").foreach(m => pred = pred && dist >= lit(m))
    distOpt("$maxDistance").foreach(m => pred = pred && dist <= lit(m))
    if (rest.nonEmpty) pred = pred && compileOps(c, rest)
    (pred, dist)
  }

  // ---- $text ---------------------------------------------------------------
  // Legacy text search over a whitespace-tokenized field (the same
  // tokenization as $search/bm25TopK, so the surfaces agree). Mongo
  // resolves the field from the collection's text index; an index-free
  // engine requires it spelled out as `$path` (the same deviation, for
  // the same reason, as $geoNear's required `key`). Search-string
  // grammar: bare terms OR together, "quoted phrases" are required,
  // `-term` / `-"phrase"` exclude. No stemmer exists here, so only
  // `$language: "none"` (or absence) is accepted — silent un-stemmed
  // "english" matching would diverge from Mongo rather than error.
  // textScore = Σ tf(term) + Σ tf(phrase) over the positive clauses — a
  // documented simplification of Mongo's unpublished index weighting
  // (deterministic, oracle-checkable). Map-only: predicate and score are
  // pure Column logic over one tokens expression; no stats pass, no
  // shuffle, pushdown-eligible like any predicate.
  private def compileText(spec: List[(String, JValue)]): (Column, Column, Column) = {
    val known = Set("$search", "$path", "$caseSensitive", "$language",
      "$diacriticSensitive")
    spec.map(_._1).find(!known.contains(_)).foreach(k =>
      throw new MqlException(s"$$text: unsupported option '$k'"))
    val search = spec.collectFirst { case ("$search", JString(s)) => s }
      .getOrElse(throw new MqlException("$text needs $search"))
    val path = spec.collectFirst { case ("$path", JString(s)) => s }
      .getOrElse(throw new MqlException(
        "$text needs $path (no text index exists to infer the field)"))
    val caseSensitive = spec.exists(_ == ("$caseSensitive", JBool(true)))
    spec.collectFirst { case ("$language", JString(l)) if l != "none" =>
      throw new MqlException(
        s"$$text: only $$language 'none' is supported (no stemmer), got '$l'") }
    if (spec.exists(_ == ("$diacriticSensitive", JBool(false))))
      throw new MqlException(
        "$text: diacritic folding is not supported ($diacriticSensitive: false)")
    val norm: String => String = if (caseSensitive) identity else _.toLowerCase
    // peel (possibly negated) quoted phrases, then split the rest
    val phraseRe = "(-?)\"([^\"]*)\"".r
    val phraseMatches = phraseRe.findAllMatchIn(search).toList
    val rest = phraseRe.replaceAllIn(search, " ")
    def phraseToks(s: String): Seq[String] =
      norm(s).split("\\s+").filter(_.nonEmpty).toSeq
    val posPhr = phraseMatches.filter(_.group(1).isEmpty)
      .map(m => phraseToks(m.group(2))).filter(_.nonEmpty)
    val negPhr = phraseMatches.filter(_.group(1).nonEmpty)
      .map(m => phraseToks(m.group(2))).filter(_.nonEmpty)
    val rawTerms = rest.split("\\s+").filter(_.nonEmpty).toList
    val (negRaw, posRaw) = rawTerms.partition(_.startsWith("-"))
    val pos = posRaw.map(norm).distinct
    val neg = negRaw.map(t => norm(t.drop(1))).filter(_.nonEmpty).distinct
    if (pos.isEmpty && posPhr.isEmpty)
      throw new MqlException("$text needs at least one positive term or phrase")
    // tokens materialize ONCE into a carrier column (Graft.find projects
    // it before the filter and drops it after) — referencing the
    // tokenizer expression per term re-ran it N× per row (the same
    // tokenize-once rule the $search stage applies); tf is the codegen'd
    // PhraseTf on a 1-term phrase, not an interpreted filter() lambda
    val toksExpr = graft.llmops.TextAnalysis.tokens(
      if (caseSensitive) fieldCol(path) else lower(fieldCol(path)))
    val toks = col(TextToksCol)
    def tf(t: String): Column = phraseTf0(toks, Seq(t)).cast("double")
    val posHit = pos.map(t => array_contains(toks, t))
      .reduceOption(_ || _).getOrElse(lit(true))
    val phrHit = posPhr.map(p => phraseTf0(toks, p) > 0)
      .reduceOption(_ && _).getOrElse(lit(true))
    val negHit = (neg.map(t => array_contains(toks, t)) ++
        negPhr.map(p => phraseTf0(toks, p) > 0))
      .reduceOption(_ || _).getOrElse(lit(false))
    // Mongo: when the search string carries a phrase, only the phrase
    // gates matching — bare terms become score-only ("text search only
    // matches documents that include the phrase")
    val base = if (posPhr.nonEmpty) phrHit else posHit
    val pred = coalesce(base && !negHit, lit(false))
    val score = (pos.map(tf) ++ posPhr.map(p => phraseTf0(toks, p)))
      .reduce(_ + _)
    (pred, score, toksExpr)
  }

  /** Carrier column name for the one-shot $text token materialization. */
  val TextToksCol = "__graft_text_toks"

  /** Exact (slop-0) phrase occurrence count — consecutive-subsequence
    * starts, the same contract as $search.phrase's zero-slop path. */
  private def phraseTf0(toks: Column, terms: Seq[String]): Column =
    ExprCompiler.graftFn("graft_phrase_tf", toks,
      array(terms.map(lit): _*), lit(0))

  // ---- $jsonSchema ---------------------------------------------------------
  // Draft-4 subset + Mongo's bsonType extension, compiled to Column
  // predicates. JSON Schema's applicability rule — a keyword constrains
  // only values of its type (minimum ignores strings, minLength ignores
  // numbers) — becomes a type gate per keyword; since BsonTypeOf resolves
  // statically from the column's Spark type, Catalyst folds every gate to
  // a constant and dead branches vanish from the plan. A missing property
  // (NULL in the decode model, lib.pyx:326-353) passes every keyword
  // except the parent's `required` — the same present≡non-null equation
  // $exists uses; BSON-null-vs-missing is not distinguishable post-decode
  // (documented with $exists). `properties` over a non-struct column is a
  // schema-authoring error and fails analysis loudly rather than
  // silently matching nothing.
  private def jsonTypeNames(v: JValue, bson: Boolean, ctx: String): Seq[String] = {
    val names = v match {
      case JString(s) => Seq(s)
      case JArray(ts) => ts.map(strValue(_, ctx))
      case other => throw new MqlException(s"$ctx: expected type name(s), got $other")
    }
    val jsonOk = Set("object", "array", "string", "number", "boolean", "null")
    if (!bson) names.find(!jsonOk(_)).foreach(t => throw new MqlException(
      s"$ctx: '$t' is not a JSON Schema type (use bsonType for BSON names)"))
    names.flatMap {
      case "number"  => Seq("int", "long", "double", "decimal")
      case "boolean" => Seq("bool")
      case t => Seq(t)
    }
  }

  private def jsonSchemaRoot(schema: List[(String, JValue)]): Column =
    schema.map {
      case ("properties", v) =>
        asObj(v, "$jsonSchema.properties").map { case (name, sub) =>
          jsonSchemaValue(asObj(sub, s"properties.$name"), fieldCol(name))
        }.reduceOption(_ && _).getOrElse(lit(true))
      case ("required", JArray(ns)) if ns.nonEmpty =>
        ns.map(n => fieldCol(strValue(n, "required")).isNotNull).reduce(_ && _)
      case (k @ ("bsonType" | "type"), v) =>
        // the root value IS a document
        if (jsonTypeNames(v, k == "bsonType", s"$$jsonSchema.$k").contains("object"))
          lit(true) else lit(false)
      case ("allOf", JArray(ss)) if ss.nonEmpty =>
        ss.map(s => jsonSchemaRoot(asObj(s, "allOf"))).reduce(_ && _)
      case ("anyOf", JArray(ss)) if ss.nonEmpty =>
        ss.map(s => jsonSchemaRoot(asObj(s, "anyOf"))).reduce(_ || _)
      case ("oneOf", JArray(ss)) if ss.nonEmpty =>
        ss.map(s => when(coalesce(jsonSchemaRoot(asObj(s, "oneOf")), lit(false)), 1)
          .otherwise(0)).reduce(_ + _) === 1
      case ("not", s) =>
        !coalesce(jsonSchemaRoot(asObj(s, "not")), lit(false))
      case ("title" | "description", _) => lit(true)
      case (k, _) => throw new MqlException(
        s"$$jsonSchema: unsupported document-level keyword '$k'")
    }.reduceOption(_ && _).getOrElse(lit(true))

  /** One subschema applied to a value column. Missing (null) passes —
    * presence is the parent `required`'s job. */
  private def jsonSchemaValue(schema: List[(String, JValue)], c: Column): Column =
    c.isNull || jsonSchemaPreds(schema, c)

  private def jsonSchemaPreds(schema: List[(String, JValue)], c: Column): Column = {
    val t = ExprCompiler.bsonTypeName(c)
    val isNum = t.isin("int", "long", "double", "decimal")
    val isStr = t === "string"
    val isArr = t === "array"
    val isObj = t === "object"
    def numOf(v: JValue, ctx: String) = num(v, ctx)
    val exclMin = schema.exists(_ == ("exclusiveMinimum", JBool(true)))
    val exclMax = schema.exists(_ == ("exclusiveMaximum", JBool(true)))
    def intOf(v: JValue, ctx: String): Int = v match {
      case JInt(i) => i.toInt
      case JLong(l) => l.toInt
      case other => throw new MqlException(s"$ctx: expected an integer, got $other")
    }
    schema.map {
      case (k @ ("bsonType" | "type"), v) =>
        t.isin(jsonTypeNames(v, k == "bsonType", s"$$jsonSchema.$k"): _*)
      case ("enum", JArray(vs)) if vs.nonEmpty =>
        inList(c, vs)
      case ("multipleOf", v) =>
        !isNum || c.cast("double") % lit(numOf(v, "multipleOf")) === lit(0.0)
      case ("minimum", v) =>
        val b = lit(numOf(v, "minimum"))
        !isNum || (if (exclMin) c > b else c >= b)
      case ("maximum", v) =>
        val b = lit(numOf(v, "maximum"))
        !isNum || (if (exclMax) c < b else c <= b)
      case ("exclusiveMinimum" | "exclusiveMaximum", JBool(_)) => lit(true)
      case ("minLength", v) => !isStr || length(c) >= lit(intOf(v, "minLength"))
      case ("maxLength", v) => !isStr || length(c) <= lit(intOf(v, "maxLength"))
      case ("pattern", JString(p)) => !isStr || c.rlike(p)
      case ("minItems", v) => !isArr || size(c) >= lit(intOf(v, "minItems"))
      case ("maxItems", v) => !isArr || size(c) <= lit(intOf(v, "maxItems"))
      case ("uniqueItems", JBool(u)) =>
        if (!u) lit(true) else !isArr || size(array_distinct(c)) === size(c)
      case ("items", s: JObject) =>
        !isArr || forall(c, e => jsonSchemaPreds(asObj(s, "items"), e))
      case ("properties", v) =>
        !isObj || asObj(v, "properties").map { case (name, sub) =>
          jsonSchemaValue(asObj(sub, s"properties.$name"), c.getField(name))
        }.reduceOption(_ && _).getOrElse(lit(true))
      case ("required", JArray(ns)) if ns.nonEmpty =>
        !isObj || ns.map(n => c.getField(strValue(n, "required")).isNotNull)
          .reduce(_ && _)
      case ("allOf", JArray(ss)) if ss.nonEmpty =>
        ss.map(s => jsonSchemaPreds(asObj(s, "allOf"), c)).reduce(_ && _)
      case ("anyOf", JArray(ss)) if ss.nonEmpty =>
        ss.map(s => jsonSchemaPreds(asObj(s, "anyOf"), c)).reduce(_ || _)
      case ("oneOf", JArray(ss)) if ss.nonEmpty =>
        ss.map(s => when(coalesce(jsonSchemaPreds(asObj(s, "oneOf"), c), lit(false)), 1)
          .otherwise(0)).reduce(_ + _) === 1
      case ("not", s) =>
        !coalesce(jsonSchemaPreds(asObj(s, "not"), c), lit(false))
      case ("title" | "description", _) => lit(true)
      case (k, _) => throw new MqlException(
        s"$$jsonSchema: unsupported keyword '$k'")
    }.reduceOption(_ && _).getOrElse(lit(true))
  }

  private def typeMatches(c: Column, t: String): Column = t match {
    case "null"   => c.isNull
    case "number" => ExprCompiler.bsonTypeName(c).isin("int", "long", "double", "decimal")
    case other    => ExprCompiler.bsonTypeName(c) === other
  }
}
