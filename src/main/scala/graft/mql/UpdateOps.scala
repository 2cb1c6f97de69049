package graft.mql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import Mql._

/** MQL update-document compiler — the server half of mongod's `update`
  * / `findAndModify` commands (and the modify half of `delete`).
  *
  * The reference client never issues these (it writes via `insert_many`
  * only, bindings/python/pymongoarrow/api.py:602-713), but any real
  * driver pointed at the wire stand-in sends them the moment an
  * application calls `update_one`/`replace_one`/`delete_many`. This
  * compiles the three update forms mongod accepts:
  *
  *   - operator document: `{$set, $unset, $inc, $mul, $min, $max,
  *     $rename, $currentDate, $setOnInsert, $push, $addToSet, $pull,
  *     $pullAll, $pop}`
  *   - replacement document (no `$`-prefixed keys): every data column
  *     takes the replacement's value, absent columns become null,
  *     `_id` is immutable (mongod's own rule)
  *   - aggregation-pipeline update (`[{$set: ...}, ...]`): `$set` /
  *     `$addFields` / `$unset` stages over the full expression surface
  *
  * Everything lowers to ONE CASE projection over the collection —
  * matched rows take the new value, unmatched pass through — so an
  * update is a single scan + staged-swap write, never a row-at-a-time
  * loop; at 100 TB it is exactly the cost of one curation rewrite.
  *
  * Documented fixed-schema deltas (the engine is relational, not a
  * document heap): `$unset` nulls the column rather than removing a
  * key; `$set` of a column no row has yet ADDS the column (null for
  * unmatched rows); a replacement/`$set` naming a field outside the
  * collection schema with a dotted path into a non-struct refuses
  * loudly rather than reshaping rows.
  */
object UpdateOps {

  /** One compiled update: per-column new-value expressions for MATCHED
    * rows (column name → expression over the pre-image row), plus the
    * literal seed values an upsert-insert would take ($set/$inc/...
    * applied to a document that has no prior values). */
  final case class Compiled(assignments: Seq[(String, Column)],
                            insertValues: Seq[(String, JValue)],
                            fromPipeline: Boolean = false)

  def compile(u: JValue, schema: StructType,
              arrayFilters: JValue = JNothing): Compiled = u match {
    case JArray(stages) =>
      requireNoFilters(arrayFilters, "pipeline updates")
      compilePipeline(stages, schema)
    case JObject(fields) if fields.nonEmpty && fields.forall(_._1.startsWith("$")) =>
      compileOperators(fields, schema, parseArrayFilters(arrayFilters))
    case JObject(fields) if fields.exists(_._1.startsWith("$")) =>
      throw new MqlException(
        "update document mixes operators and plain fields")
    case JObject(fields) =>
      requireNoFilters(arrayFilters, "replacement updates")
      compileReplacement(fields, schema)
    case other => throw new MqlException(s"bad update document: $other")
  }

  private def requireNoFilters(v: JValue, ctx: String): Unit = v match {
    case JNothing | JNull | JArray(Nil) => ()
    case _ => throw new MqlException(s"arrayFilters: not applicable to $ctx")
  }

  /** `arrayFilters` entries → (identifier → element predicate). Each
    * entry names exactly ONE identifier (mongod's rule); dotted keys
    * descend into struct elements; conditions compile through the
    * normal filter-operator surface. */
  private def parseArrayFilters(v: JValue): Map[String, Column => Column] =
    v match {
      case JNothing | JNull => Map.empty
      case JArray(docs) => docs.map {
        case JObject(fields) if fields.nonEmpty =>
          val idents = fields.map(_._1.takeWhile(_ != '.')).distinct
          if (idents.length != 1) throw new MqlException(
            "arrayFilters: each entry must name exactly one identifier")
          val id = idents.head
          val fn: Column => Column = x => fields.map { case (k, cond) =>
            val target =
              if (!k.contains('.')) x
              else k.dropWhile(_ != '.').drop(1).split('.')
                .foldLeft(x)(_.getField(_))
            cond match {
              case JObject(ops) if isOperatorDoc(ops) =>
                FilterCompiler.compileOps(target, ops)
              case other => target <=> literal(other)
            }
          }.reduce(_ && _)
          id -> fn
        case other => throw new MqlException(
          s"arrayFilters entries must be non-empty documents, got $other")
      }.toMap
      case other => throw new MqlException(s"bad arrayFilters: $other")
    }

  // ---- operator form --------------------------------------------------

  private def compileOperators(ops: List[(String, JValue)],
                               schema: StructType,
                               filters: Map[String, Column => Column])
      : Compiled = {
    // assignments thread: a later operator on the same column sees the
    // earlier one's expression (mongod applies operators to one doc in
    // sequence; conflicting paths are a mongod error we inherit by
    // last-wins composition)
    var assigns = scala.collection.mutable.LinkedHashMap.empty[String, Column]
    val usedFilters = scala.collection.mutable.Set.empty[String]
    val inserts = List.newBuilder[(String, JValue)]
    def baseOf(path: String): Column = {
      val top = path.takeWhile(_ != '.')
      assigns.get(top) match {
        case Some(c) if !path.contains('.') => c
        case Some(c) => nestedGet(c, path.dropWhile(_ != '.').drop(1))
        case None => fieldCol(path)
      }
    }
    /** The positional segment of a path, if any: ("arr", ident, sub)
      * for "arr.$[]" / "arr.$[g]" / "arr.$[g].score" — one positional
      * step directly under a top-level array column (mongod allows
      * deeper forms; this engine's fixed schemas make the one-level
      * form the meaningful one, deeper refuses loudly). */
    def positional(path: String): Option[(String, String, Option[String])] = {
      if (!path.contains(".$[")) return None
      val parts = path.split('.')
      val i = parts.indexWhere(p => p.startsWith("$[") && p.endsWith("]"))
      if (i != 1) throw new MqlException(
        s"positional update: '$path' — only <arrayCol>.$$[...] (one " +
          "level under a top-level array column) is supported")
      if (parts.drop(2).exists(p => p.startsWith("$[")))
        throw new MqlException(
          s"positional update: nested $$[...] segments in '$path' are " +
            "unsupported")
      val ident = parts(1).drop(2).dropRight(1)
      val sub = if (parts.length > 2) Some(parts.drop(2).mkString(".")) else None
      Some((parts(0), ident, sub))
    }
    /** Set `path` to mk(old value) for matched rows — the general form
      * every operator lowers through. Positional paths ($[] / $[id])
      * become ONE `transform` lambda over the array column: gated
      * elements take mk(element-target), others pass through. */
    def assignWith(path: String, mk: Column => Column): Unit = {
      if (path == "_id" || path.startsWith("_id."))
        throw new MqlException("update: the _id field is immutable")
      positional(path) match {
        case Some((top, ident, sub)) =>
          if (!schema.fieldNames.contains(top)) throw new MqlException(
            s"positional update: no array column '$top'")
          val gate: Column => Column =
            if (ident.isEmpty) _ => lit(true)
            else {
              usedFilters += ident
              filters.getOrElse(ident, throw new MqlException(
                s"positional update: no arrayFilters entry for " +
                  s"identifier '$ident'"))
            }
          val cur = assigns.getOrElse(top, col(quote(top)))
          assigns(top) = transform(cur, e => {
            val target = sub.fold(e)(s => nestedGet(e, s))
            val updated = mk(target)
            when(coalesce(gate(e), lit(false)),
              sub.fold(updated)(s => e.withField(s, updated)))
              .otherwise(e)
          })
        case None =>
          val top = path.takeWhile(_ != '.')
          if (!path.contains('.')) {
            assigns(top) = mk(baseOf(path)); return
          }
          // dotted path: rebuild the top-level struct via withField —
          // the schema must already carry the struct (fixed-schema
          // engine)
          val rest = path.dropWhile(_ != '.').drop(1)
          val cur = assigns.getOrElse(top, col(quote(top)))
          if (!schema.fieldNames.contains(top))
            throw new MqlException(
              s"update: dotted path '$path' needs existing struct column '$top'")
          assigns(top) = cur.withField(rest, mk(baseOf(path)))
      }
    }
    def assign(path: String, value: Column): Unit =
      assignWith(path, _ => value)
    ops.foreach {
      case ("$set", v) => asObj(v, "$set").foreach { case (p, x) =>
        assign(p, literal(x)); inserts += ((p, x)) }
      case ("$setOnInsert", v) => asObj(v, "$setOnInsert").foreach {
        case (p, x) => inserts += ((p, x)) }
      case ("$unset", v) => asObj(v, "$unset").foreach { case (p, _) =>
        // fixed schema: unset = null (the column stays; mongod removes
        // the key — the relational twin of a missing field IS null)
        assign(p, lit(null)) }
      case ("$inc", v) => asObj(v, "$inc").foreach { case (p, x) =>
        assignWith(p, old => coalesce(old, lit(0)) + literal(x))
        inserts += ((p, x)) }
      case ("$mul", v) => asObj(v, "$mul").foreach { case (p, x) =>
        // mongod: $mul on a missing field creates it as 0
        assignWith(p, old => coalesce(old, lit(0)) * literal(x))
        inserts += ((p, JInt(0))) }
      case ("$min", v) => asObj(v, "$min").foreach { case (p, x) =>
        // Spark's least/greatest skip nulls — exactly mongod's
        // "missing field takes the operand" rule
        assignWith(p, old => least(old, literal(x))); inserts += ((p, x)) }
      case ("$max", v) => asObj(v, "$max").foreach { case (p, x) =>
        assignWith(p, old => greatest(old, literal(x))); inserts += ((p, x)) }
      case ("$rename", v) => asObj(v, "$rename").foreach {
        case (from, JString(to)) =>
          if (from.contains('.') || to.contains('.'))
            throw new MqlException(
              "$rename: only top-level fields (fixed-schema engine)")
          assign(to, baseOf(from)); assign(from, lit(null))
        case (_, other) => throw new MqlException(
          s"$$rename target must be a string, got $other") }
      case ("$currentDate", v) => asObj(v, "$currentDate").foreach {
        case (p, JBool(true)) => assign(p, current_timestamp())
        case (p, JObject(List(("$type", JString("date"))))) =>
          assign(p, current_timestamp())
        case (p, JObject(List(("$type", JString("timestamp"))))) =>
          assign(p, current_timestamp())
        case (p, other) => throw new MqlException(
          s"$$currentDate.$p: bad spec $other") }
      case ("$push", v) => asObj(v, "$push").foreach { case (p, x) =>
        val (each, sliceN) = eachSpec(x, "$push")
        val appended = concat(emptyWhenNull(baseOf(p)), array(each: _*))
        assign(p, sliceN.fold(appended)(n => applySlice(appended, n)))
        inserts += ((p, JArray(eachValues(x, "$push")))) }
      case ("$addToSet", v) => asObj(v, "$addToSet").foreach { case (p, x) =>
        val (each, _) = eachSpec(x, "$addToSet")
        assign(p, array_union(emptyWhenNull(baseOf(p)), array(each: _*)))
        inserts += ((p, JArray(eachValues(x, "$addToSet")))) }
      case ("$pull", v) => asObj(v, "$pull").foreach {
        case (p, JObject(cond)) if isOperatorDoc(cond) =>
          // condition form: keep elements the condition does NOT match
          assign(p, filter(baseOf(p),
            x => !coalesce(FilterCompiler.compileOps(x, cond), lit(false))))
        case (p, x) =>
          // value form: every instance of the value goes
          assign(p, filter(baseOf(p), e => !(e <=> literal(x)))) }
      case ("$pullAll", v) => asObj(v, "$pullAll").foreach {
        case (p, JArray(vs)) =>
          val gone = array(vs.map(literal): _*)
          assign(p, filter(baseOf(p), e => !array_contains(gone, e)))
        case (p, other) => throw new MqlException(
          s"$$pullAll.$p needs an array, got $other") }
      case ("$pop", v) => asObj(v, "$pop").foreach {
        case (p, JInt(n)) if n == 1 => // drop last
          assign(p, slice(baseOf(p), lit(1), greatest(size(baseOf(p)) - 1, lit(0))))
        case (p, JInt(n)) if n == -1 => // drop first
          assign(p, slice(baseOf(p), lit(2), greatest(size(baseOf(p)) - 1, lit(0))))
        case (p, other) => throw new MqlException(
          s"$$pop.$p must be 1 or -1, got $other") }
      case ("$where", _) | ("$function", _) => throw new MqlException(
        "server-side JavaScript ($where/$function) is out of scope for " +
          "this engine — no JS runtime; express the update with " +
          "standard operators or an aggregation-pipeline update")
      case (op, _) => throw new MqlException(s"unsupported update operator $op")
    }
    val unused = filters.keySet -- usedFilters
    if (unused.nonEmpty) throw new MqlException(
      s"arrayFilters: identifier(s) ${unused.mkString(", ")} not used " +
        "in the update document (mongod errors the same way)")
    Compiled(assigns.toSeq, inserts.result())
  }

  private def quote(name: String): String =
    "`" + name.replace("`", "``") + "`"

  private def nestedGet(c: Column, rest: String): Column =
    rest.split('.').foldLeft(c)(_.getField(_))

  private def emptyWhenNull(c: Column): Column =
    coalesce(c, array().cast(ArrayType(NullType)))

  /** `$push`/`$addToSet` operand: plain value or `{$each: [...],
    * $slice: n}` modifier document. */
  private def eachSpec(x: JValue, ctx: String): (List[Column], Option[Int]) =
    x match {
      case JObject(fields) if fields.exists(_._1 == "$each") =>
        val each = fields.collectFirst { case ("$each", JArray(es)) => es }
          .getOrElse(throw new MqlException(s"$ctx: $$each needs an array"))
        var sliceN: Option[Int] = None
        fields.foreach {
          case ("$each", _) => ()
          case ("$slice", n) => sliceN = Some(intValue(n, s"$ctx.$$slice"))
          case (k, _) => throw new MqlException(s"$ctx: unsupported modifier $k")
        }
        (each.map(literal), sliceN)
      case v => (List(literal(v)), None)
    }

  private def eachValues(x: JValue, ctx: String): List[JValue] = x match {
    case JObject(fields) if fields.exists(_._1 == "$each") =>
      fields.collectFirst { case ("$each", JArray(es)) => es }.getOrElse(Nil)
    case v => List(v)
  }

  /** mongod's $slice-on-$push: non-negative keeps the FIRST n, negative
    * keeps the LAST |n|. */
  private def applySlice(c: Column, n: Int): Column =
    if (n >= 0) slice(c, 1, n)
    else slice(c, greatest(size(c) + n + 1, lit(1)), lit(-n))

  // ---- replacement form -----------------------------------------------

  private def compileReplacement(fields: List[(String, JValue)],
                                 schema: StructType): Compiled = {
    val bad = fields.map(_._1).filterNot(schema.fieldNames.contains)
    if (bad.nonEmpty) throw new MqlException(
      s"replacement document names columns outside the collection " +
        s"schema: ${bad.mkString(", ")} (fixed-schema engine — use " +
        "$set to add a new column)")
    val byName = fields.toMap
    val assigns = schema.fields.toSeq.filter(_.name != "_id").map { f =>
      f.name -> byName.get(f.name).map(literal)
        .getOrElse(lit(null).cast(f.dataType))
    }
    Compiled(assigns, fields.filter(_._1 != "_id"))
  }

  // ---- aggregation-pipeline form ---------------------------------------

  private def compilePipeline(stages: List[JValue],
                              schema: StructType): Compiled = {
    var assigns = scala.collection.mutable.LinkedHashMap.empty[String, Column]
    stages.foreach {
      case JObject(List((op, spec))) if op == "$set" || op == "$addFields" =>
        asObj(spec, op).foreach { case (p, e) =>
          if (p.contains('.')) throw new MqlException(
            s"pipeline update: only top-level $$set paths (got '$p')")
          if (p == "_id") throw new MqlException(
            "update: the _id field is immutable")
          // documented delta: expressions read the PRE-IMAGE row (all
          // stages compile against the same input projection); mongod
          // chains stages, which only differs when a later $set reads a
          // field an earlier stage of the SAME update assigned
          assigns(p) = ExprCompiler.compile(e)
        }
      case JObject(List(("$unset", spec))) =>
        val paths = spec match {
          case JString(p) => List(p)
          case JArray(ps) => ps.map(strValue(_, "$unset"))
          case other => throw new MqlException(s"bad $$unset: $other")
        }
        paths.foreach { p =>
          if (p == "_id") throw new MqlException(
            "update: the _id field is immutable")
          assigns(p) = lit(null)
        }
      case JObject(List((op, _))) => throw new MqlException(
        s"pipeline update: unsupported stage $op (only $$set/$$addFields/" +
          "$unset)")
      case other => throw new MqlException(s"bad pipeline update stage: $other")
    }
    Compiled(assigns.toSeq, Nil, fromPipeline = true)
  }

  // ---- application -------------------------------------------------------

  /** Lower the compiled update onto `df`: matched rows (`cond`) take the
    * new expressions, others pass through; columns the update introduces
    * append (null for unmatched rows). Returns the updated frame plus
    * the MODIFIED predicate — `cond` AND at least one column actually
    * changing value — which prices mongod's `nModified` as one aggregate
    * over the same scan. */
  def applyTo(df: DataFrame, cond: Column, compiled: Compiled)
      : (DataFrame, Column) = {
    val existing = df.columns.toSet
    val byName = compiled.assignments.toMap
    val keep = df.columns.toSeq.map { c =>
      byName.get(c) match {
        case Some(e) =>
          val typed = castLike(e, df.schema(c).dataType)
          when(cond, typed).otherwise(col(quote(c))).as(c)
        case None => col(quote(c))
      }
    }
    val added = compiled.assignments.collect {
      case (c, e) if !existing(c) => when(cond, e).as(c)
    }
    val changed = compiled.assignments.map { case (c, e) =>
      if (existing(c)) !(castLike(e, df.schema(c).dataType) <=> col(quote(c)))
      else e.isNotNull
    }.reduceOption(_ || _).getOrElse(lit(false))
    (df.select(keep ++ added: _*), cond && changed)
  }

  /** Keep the column's declared type stable across the CASE projection
    * (an int literal assigned to a double column must not flip the
    * column to int — the schema is the contract). Null literals and
    * same-type expressions cast freely; genuinely incompatible writes
    * surface as Spark analysis errors, which is the loud refusal we
    * want. */
  private def castLike(e: Column, dt: DataType): Column = dt match {
    case _: StructType | _: ArrayType | _: MapType => e
    case _ => e.cast(dt)
  }

  /** The upsert insert-image: one schema-aligned row seeded from the
    * query's top-level equality predicates, then overlaid with the
    * update's insert values (mongod's upsert construction). Generated
    * `_id`: a time-prefixed 24-hex ObjectId-shaped value when the
    * column is string-typed and nothing pinned it. */
  def upsertRow(spark: SparkSession, schema: StructType, query: JValue,
                compiled: Compiled): DataFrame = {
    if (compiled.fromPipeline) throw new MqlException(
      "upsert with an aggregation-pipeline update is unsupported")
    val eq = asObj(query, "query").flatMap {
      case (f, JObject(List(("$eq", v)))) => Some(f -> v)
      case (f, v) if !f.startsWith("$") && (v match {
        case JObject(ops) => !isOperatorDoc(ops); case _ => true
      }) => Some(f -> v)
      case _ => None
    }
    val values = (eq ++ compiled.insertValues).foldLeft(
      scala.collection.immutable.ListMap.empty[String, JValue])(_ + _)
    val outside = values.keys.filterNot(k =>
      schema.fieldNames.contains(k.takeWhile(_ != '.')))
    if (outside.nonEmpty) throw new MqlException(
      s"upsert: fields outside the collection schema: " +
        s"${outside.mkString(", ")}")
    if (values.keys.exists(_.contains('.'))) throw new MqlException(
      "upsert: dotted insert paths are unsupported (set the whole struct)")
    val cols = schema.fields.toSeq.map { f =>
      values.get(f.name) match {
        case Some(v) => literal(v).cast(f.dataType).as(f.name)
        case None if f.name == "_id" && f.dataType == StringType =>
          lit(newObjectIdHex()).as("_id")
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }
    spark.range(1).select(cols: _*)
  }

  private def newObjectIdHex(): String = {
    val ts = (System.currentTimeMillis() / 1000L).toInt
    val rnd = new Array[Byte](8)
    java.util.concurrent.ThreadLocalRandom.current().nextBytes(rnd)
    f"$ts%08x" + rnd.map(b => f"$b%02x").mkString
  }
}
