package graft.mql

import org.json4s._

/** Foreign-side projection pushdown for `$lookup`: decide, from the
  * pipeline stages AFTER a lookup, which fields of the joined `as`
  * array's elements are actually consumed — so the compiler can build
  * `collect_list(struct(<those fields>))` instead of packing every
  * foreign column into the shuffle.
  *
  * Why it matters at scale: the uncorrelated lookup shuffles the whole
  * foreign table grouped into per-key struct arrays. When the rest of
  * the pipeline only reads `{$size: "$as"}` and `$as.one_field`, the
  * unpruned plan ships every foreign column through the group-by
  * exchange, the join, and the per-row arrays — Catalyst's nested
  * column pruning cannot see through `collect_list`, so the compiler
  * must do it at build time, where the struct is born slim and no
  * type rewriting is needed anywhere downstream.
  *
  * The analysis is deliberately CONSERVATIVE (sound over-approximation):
  * it returns `Some(fields)` only when every reference to the alias in
  * the remaining stages is one of the recognized field-bounded shapes
  * below, and some later stage provably drops the alias from the output
  * (a "shape barrier": `$group`, `$count`, a `$project` that excludes or
  * redefines it, `$unset` of it, `$replaceRoot`/`$replaceWith`). Any
  * unrecognized use — a bare `"$as"` reference, an operator that lets
  * whole elements escape (`$filter`/`$slice`/`$arrayElemAt`/…), an
  * unknown stage that mentions the alias — returns `None` and the
  * lookup keeps every column, exactly as before.
  *
  * Recognized field-bounded shapes:
  *  - `"$as.field[....]"` path references (and `"as.field"` keys in
  *    `$match` filters / `$sort` specs / projection keys);
  *  - `{"$size": "$as"}`;
  *  - `$map` / `$reduce` with `input: "$as"` whose lambda touches
  *    elements only through `"$$this.field"` (or the declared `as` var);
  *  - `$unwind` of `"$as"` (the alias then holds single elements; the
  *    same path rules keep applying);
  *  - `{"$elemMatch": {field: …}}` under an `"as"` key in `$match`.
  */
private[mql] object LookupPrune {
  /** `Some(fields)` = only these element fields are consumed before the
    * alias dies; `None` = cannot prove — don't prune. */
  def usedFields(as: String, rest: List[JValue]): Option[Set[String]] = {
    val fields = scala.collection.mutable.Set.empty[String]
    val bare = "$" + as
    val pref = "$" + as + "."

    // ---- expression-tree analysis --------------------------------------
    // returns false on any unprovable use of the alias
    def exprOk(v: JValue): Boolean = v match {
      case JString(s) =>
        if (s == bare) false
        else if (s.startsWith(pref)) { fields += firstSeg(s.drop(pref.length)); true }
        else true
      case JObject(List(("$size", JString(s)))) if s == bare => true
      case JObject(List((op, JObject(args))))
          if (op == "$map" || op == "$reduce") &&
             args.exists { case ("input", JString(s)) => s == bare; case _ => false } =>
        val elemVar = args.collectFirst { case ("as", JString(n)) => n }
          .getOrElse("this")
        val lambdaOk = args.forall {
          case ("input", _) => true
          case ("as", _) => true
          case (_, body) => lambdaFieldsOk(body, elemVar)
        }
        lambdaOk
      case JObject(fs) => fs.forall { case (_, x) => exprOk(x) }
      case JArray(es)  => es.forall(exprOk)
      case _ => true
    }

    // inside a $map/$reduce lambda over the alias: elements may be read
    // only as "$$var.field"; a bare "$$var" lets whole elements escape.
    // Nested HOFs rebinding the same var are over-approximated: their
    // "$$this.x" also lands in `fields` (harmless — the caller rejects
    // names that aren't foreign columns).
    def lambdaFieldsOk(v: JValue, elemVar: String): Boolean = v match {
      case JString(s) =>
        val bareVar = "$$" + elemVar
        if (s == bareVar) false
        else if (s.startsWith(bareVar + ".")) {
          fields += firstSeg(s.drop(bareVar.length + 1)); true
        } else if (s == bare) false          // alias itself inside the lambda
        else if (s.startsWith(pref)) { fields += firstSeg(s.drop(pref.length)); true }
        else true
      case JObject(fs) => fs.forall { case (_, x) => lambdaFieldsOk(x, elemVar) }
      case JArray(es)  => es.forall(lambdaFieldsOk(_, elemVar))
      case _ => true
    }

    def firstSeg(path: String): String =
      path.indexOf('.') match { case -1 => path; case i => path.substring(0, i) }

    // ---- $match filter keys --------------------------------------------
    def filterOk(v: JValue): Boolean = v match {
      case JObject(fs) => fs.forall {
        case (k, sub) if k == as => sub match {
          // {"as": {"$size": n}} — array-level, no element fields
          case JObject(List(("$size", _))) => true
          case JObject(List(("$elemMatch", JObject(inner)))) =>
            // element-level sub-filter: its keys are element fields.
            // $-keyed entries ({$elemMatch: {$eq: …}} / {$in: […]})
            // compare WHOLE elements, reading every field — pruning
            // would be unsound, so refuse (conservative stance, same
            // as the `case _ => false` arm below); field-keyed inner
            // filters are the only prunable form.
            inner.forall {
              case (ik, iv) if !ik.startsWith("$") =>
                fields += firstSeg(ik); exprOk(iv)
              case _ => false
            }
          case _ => false // comparisons against whole elements/arrays
        }
        case (k, sub) if k.startsWith(as + ".") =>
          fields += firstSeg(k.drop(as.length + 1)); filterValueOk(sub)
        case (k, sub) if k == "$and" || k == "$or" || k == "$nor" => sub match {
          case JArray(es) => es.forall(filterOk)
          case _ => false
        }
        case (k, sub) if k == "$expr" => exprOk(sub)
        case (_, sub) => filterValueOk(sub)
      }
      case _ => true
    }
    // operand side of a filter comparison: only $expr-style refs possible
    def filterValueOk(v: JValue): Boolean = exprOk(v)

    // ---- key-path specs ($sort, projection keys) -----------------------
    def keyOk(k: String): Boolean =
      if (k == as) false
      else if (k.startsWith(as + ".")) { fields += firstSeg(k.drop(as.length + 1)); true }
      else true

    // ---- stage walk ----------------------------------------------------
    def mentions(v: JValue): Boolean = v match {
      case JString(s) => s == bare || s.startsWith(pref) || s == as ||
        s.startsWith(as + ".")
      case JObject(fs) => fs.exists { case (k, x) =>
        k == as || k.startsWith(as + ".") || mentions(x) }
      case JArray(es) => es.exists(mentions)
      case _ => false
    }

    // Spark's ResolveMissingReferences lets a Filter/Sort AFTER an
    // inclusion $project still resolve the dropped alias through the
    // projection (engine behavior, property-spec-caught), so a
    // $project is NOT a hard barrier: it only marks the alias as
    // dropped-from-output while scanning continues and later stages'
    // references keep collecting. Only shape-replacing aggregations
    // terminate early; at pipeline end the proof holds iff some stage
    // dropped the alias from the output.
    var dropped = false
    val it = rest.iterator
    while (it.hasNext) {
      val stage = it.next() match {
        case JObject(List(kv)) => kv
        case _ => return None
      }
      stage match {
        case ("$group", spec) =>
          return if (exprOk(spec)) Some(fields.toSet) else None
        case ("$count", _) => return Some(fields.toSet)
        case ("$replaceRoot", spec) =>
          return if (exprOk(spec)) Some(fields.toSet) else None
        case ("$replaceWith", spec) =>
          return if (exprOk(spec)) Some(fields.toSet) else None
        case ("$project", JObject(fs)) =>
          def marker(v: JValue) = isInclude(v) || isExclude(v)
          // computed values must be field-bounded references
          if (!fs.forall { case (_, v) => marker(v) || exprOk(v) }) return None
          // collect "as.field" subpath keys (sound even in exclusion
          // form — extra collected fields only widen the kept set)
          fs.foreach { case (k, _) => if (k.startsWith(as + "."))
            fields += firstSeg(k.drop(as.length + 1)) }
          // bare inclusion {as: 1} carries whole docs to the output
          if (fs.exists { case (k, v) => k == as && isInclude(v) }) return None
          // excluded or redefined → the alias leaves the OUTPUT here
          // (but later Filter/Sort stages may still resolve it through
          // the projection — keep scanning)
          if (fs.exists { case (k, v) => k == as && !isInclude(v) })
            dropped = true
          else {
            // inclusion form: passthrough fields (incl. the alias) are
            // dropped; subpath inclusions narrow elements to collected
            // keys — either way the alias's full shape leaves the output
            val inclusionForm = fs.exists { case (k, v) =>
              k != "_id" && (isInclude(v) || !marker(v)) }
            if (inclusionForm) dropped = true
          }
          // pure exclusion not touching the alias: it survives unchanged
        case ("$unset", spec) =>
          val paths = spec match {
            case JString(f) => Seq(f)
            case JArray(fsx) => fsx.collect { case JString(f) => f }
            case _ => return None
          }
          if (paths.contains(as)) dropped = true
          else if (paths.exists(_.startsWith(as + "."))) return None // element dropFields
        case ("$addFields" | "$set", JObject(fs)) =>
          if (!fs.forall { case (_, v) => exprOk(v) }) return None
          if (fs.exists { case (k, _) => k.startsWith(as + ".") }) return None
          if (fs.exists { case (k, _) => k == as }) dropped = true
        case ("$unwind", spec) =>
          val path = spec match {
            case JString(p) => p
            case JObject(ufs) => ufs.collectFirst { case ("path", JString(p)) => p }
              .getOrElse(return None)
            case _ => return None
          }
          if (path != bare && path.startsWith(pref))
            return None // nested array unwind
          // bare $unwind keeps the alias as single elements; the same
          // path rules keep applying (a later bare "$as" still refuses)
        case ("$match", spec) =>
          if (!filterOk(spec)) return None
        case ("$sort", JObject(fs)) =>
          if (!fs.forall { case (k, _) => keyOk(k) }) return None
        case ("$limit" | "$skip" | "$sample", _) => // no refs
        case ("$sortByCount", spec) => // groups → shape barrier
          return if (exprOk(spec)) Some(fields.toSet) else None
        case (_, spec) =>
          // unknown stage: safe only if it never mentions the alias
          if (mentions(spec)) return None
      }
    }
    if (dropped) Some(fields.toSet)
    else None // alias survives to the output — keep every column
  }

  private def isInclude(v: JValue): Boolean = v match {
    case JBool(b) => b
    case JInt(i) => i != 0
    case JLong(l) => l != 0
    case JDouble(d) => d != 0
    case _ => false
  }
  private def isExclude(v: JValue): Boolean = v match {
    case JBool(false) => true
    case JInt(i) => i == 0
    case JLong(l) => l == 0
    case JDouble(d) => d == 0
    case _ => false
  }
}
