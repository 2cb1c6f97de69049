package graft.mql

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class ExprCompilerSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private lazy val one = Seq((1)).toDF("x")

  private def eval(expr: String): Any =
    one.select(ExprCompiler.compile(Mql.parse(expr)).as("r")).head.get(0)

  test("arithmetic") {
    assert(eval("""{"$add": [1, 2, 3]}""") == 6)
    assert(eval("""{"$subtract": [10, 4]}""") == 6)
    assert(eval("""{"$multiply": [2, 3, 4]}""") == 24)
    assert(eval("""{"$divide": [7, 2]}""") == 3.5)
    assert(eval("""{"$mod": [7, 3]}""") == 1)
    assert(eval("""{"$pow": [2, 10]}""") == 1024.0)
    assert(eval("""{"$round": [2.567, 1]}""") == 2.6)
    // Pinned tie behavior — DOCUMENTED DEVIATION (ExprCompiler $round):
    // exact rounding-digit ties go half-away-from-zero over the shortest
    // decimal repr (the DuckDB-replayable pairing); Mongo documents
    // half-even over the exact binary expansion. Off-tie values agree.
    assert(eval("""{"$round": [2.5, 0]}""") == 3.0)
    assert(eval("""{"$round": [-2.5, 0]}""") == -3.0)
    assert(eval("""{"$round": [0.125, 2]}""") == 0.13)
    assert(eval("""{"$trunc": [2.98]}""") == 2L)
  }

  test("math-domain violations raise like Mongo; nulls pass through") {
    def raises(expr: String, frag: String): Unit = {
      val e = intercept[Exception](eval(expr))
      assert(e.getMessage.contains(frag), s"$expr: ${e.getMessage}")
    }
    raises("""{"$sqrt": -4}""", "$sqrt")
    raises("""{"$ln": 0}""", "$ln")
    raises("""{"$log10": -1}""", "$log10")
    raises("""{"$log": [8, 1]}""", "base")
    raises("""{"$log": [-8, 2]}""", "$log")
    raises("""{"$pow": [0, -1]}""", "negative exponent")
    raises("""{"$asin": 2}""", "$asin")
    raises("""{"$acos": -1.5}""", "$acos")
    // in-domain values and nulls are untouched
    assert(eval("""{"$sqrt": 9}""") == 3.0)
    assert(eval("""{"$log": [8, 2]}""") == 3.0)
    assert(eval("""{"$asin": 1}""") == math.Pi / 2)
    assert(eval("""{"$sqrt": null}""") == null)
    assert(eval("""{"$ln": null}""") == null)
  }

  test("$isArray/$arrayToObject/$replaceOne/$indexOfBytes/$toObjectId") {
    assert(eval("""{"$isArray": [[1, 2]]}""") == true)
    assert(eval("""{"$isArray": "nope"}""") == false)
    assert(eval("""{"$isArray": null}""") == false)
    val m = eval("""{"$arrayToObject": {"$objectToArray": {"a": 1, "b": 2}}}""")
      .asInstanceOf[Map[String, Int]]
    assert(m == Map("a" -> 1, "b" -> 2))
    assert(eval("""{"$replaceOne": {"input": "aXbXc", "find": "X",
      "replacement": "-"}}""") == "a-bXc") // FIRST occurrence only
    assert(eval("""{"$replaceOne": {"input": "abc", "find": "z",
      "replacement": "-"}}""") == "abc")
    assert(eval("""{"$replaceOne": {"input": null, "find": "z",
      "replacement": "-"}}""") == null)
    // héllo: h=1 byte, é=2 bytes → "llo" begins at byte 3
    assert(eval("""{"$indexOfBytes": ["héllo", "llo"]}""") == 3)
    assert(eval("""{"$indexOfBytes": ["abc", "z"]}""") == -1)
    assert(eval("""{"$toObjectId": "507f1f77bcf86cd799439011"}""")
      .asInstanceOf[Array[Byte]].length == 12)
  }

  test("$toUUID/$convert format renderings/$tsSecond/$tsIncrement") {
    // dashed and bare forms both parse; malformed → null
    val u = "3f2a1b4c-9d8e-4a5b-8c7d-112233445566"
    assert(eval(s"""{"$$binarySize": {"$$toUUID": "$u"}}""") == 16)
    assert(eval(s"""{"$$convert": {"input": {"$$toUUID": "$u"},
      "to": "string", "format": "uuid"}}""") == u)
    assert(eval(s"""{"$$convert": {"input": {"$$toUUID":
      "${u.replace("-", "")}"}, "to": "string", "format": "uuid"}}""") == u)
    assert(eval("""{"$toUUID": "not-a-uuid"}""") == null)
    assert(eval(s"""{"$$convert": {"input": {"$$toUUID": "$u"},
      "to": "string", "format": "hex"}}""") == u.replace("-", ""))
    assert(eval(s"""{"$$convert": {"input": {"$$toUUID": "$u"},
      "to": "string", "format": "base64"}}""") ==
      java.util.Base64.getEncoder.encodeToString(
        u.replace("-", "").grouped(2)
          .map(Integer.parseInt(_, 16).toByte).toArray))
    intercept[MqlException](eval("""{"$convert": {"input": "x",
      "to": "int", "format": "uuid"}}"""))
    // BSON replication timestamps decode as {t, i} structs
    val ts = Seq(((1700000000L, 7L))).toDF("t", "i")
      .select(org.apache.spark.sql.functions.struct("t", "i").as("ts"))
    val r = ts.select(
      ExprCompiler.compile(Mql.parse("""{"$tsSecond": "$ts"}""")).as("s"),
      ExprCompiler.compile(Mql.parse("""{"$tsIncrement": "$ts"}""")).as("i"))
      .head
    assert(r.getLong(0) == 1700000000L && r.getLong(1) == 7L)
  }

  test("comparison null-safety: $eq treats null == null as true") {
    assert(eval("""{"$eq": [null, null]}""") == true)
    assert(eval("""{"$ne": [1, null]}""") == true)
  }

  test("$cond array and object forms, $switch, $ifNull") {
    assert(eval("""{"$cond": [{"$gt": [2, 1]}, "yes", "no"]}""") == "yes")
    assert(eval("""{"$cond": {"if": false, "then": 1, "else": 2}}""") == 2)
    assert(eval("""{"$switch": {"branches": [
      {"case": false, "then": "a"}, {"case": true, "then": "b"}],
      "default": "c"}}""") == "b")
    assert(eval("""{"$ifNull": [null, null, 9]}""") == 9)
  }

  test("strings") {
    assert(eval("""{"$concat": ["a", "-", "b"]}""") == "a-b")
    assert(eval("""{"$toUpper": "ab"}""") == "AB")
    assert(eval("""{"$strLenCP": "héllo"}""") == 5)
    assert(eval("""{"$substrCP": ["hello", 1, 3]}""") == "ell")
    // CP is code-point-indexed; Bytes (and deprecated $substr) are byte-indexed
    assert(eval("""{"$substrCP": ["héllo", 1, 3]}""") == "éll")
    assert(eval("""{"$substrBytes": ["héllo", 0, 3]}""") == "hé") // é = 2 bytes
    assert(eval("""{"$substrBytes": ["héllo", 3, 3]}""") == "llo")
    assert(eval("""{"$substr": ["héllo", 3, 3]}""") == "llo")
    assert(eval("""{"$split": ["a.b.c", "."]}""") == Seq("a", "b", "c"))
    assert(eval("""{"$trim": {"input": "  x  "}}""") == "x")
    assert(eval("""{"$replaceAll": {"input": "a.b.a", "find": "a", "replacement": "z"}}""") == "z.b.z")
    assert(eval("""{"$regexMatch": {"input": "Spark", "regex": "^sp", "options": "i"}}""") == true)
  }

  test("$dateTrunc: startOfWeek (Sunday default, unlike Spark) + binSize bins") {
    import java.time._
    def trunc(dateIso: String, opts: String): Instant =
      eval(s"""{"$$dateTrunc": {"date": {"$$date": "$dateIso"}, $opts}}""")
        .asInstanceOf[java.sql.Timestamp].toInstant
    def ist(s: String): Instant = Instant.parse(s)

    // 2024-03-05 is a Tuesday: Mongo's default week start is SUNDAY
    // (2024-03-03), not Spark date_trunc's Monday
    assert(trunc("2024-03-05T06:07:08Z", """"unit": "week"""")
      == ist("2024-03-03T00:00:00Z"))
    assert(trunc("2024-03-05T06:07:08Z",
      """"unit": "week", "startOfWeek": "monday"""")
      == ist("2024-03-04T00:00:00Z"))
    // a date ON the week start truncates to itself
    assert(trunc("2024-03-03T00:00:00Z", """"unit": "week"""")
      == ist("2024-03-03T00:00:00Z"))

    // binSize day-bins anchor at 2000-01-01T00:00Z: 7-day bins starting
    // Saturdays (2000-01-01 was a Saturday) — independently recomputed
    val d0 = LocalDate.of(2000, 1, 1)
    val x = LocalDate.of(2024, 3, 5)
    val daysSince = java.time.temporal.ChronoUnit.DAYS.between(d0, x)
    val binStart = d0.plusDays((daysSince / 7) * 7)
    assert(trunc("2024-03-05T06:07:08Z", """"unit": "day", "binSize": 7""")
      == binStart.atStartOfDay(ZoneOffset.UTC).toInstant)

    // 2-week Monday bins: anchor = first Monday on/after 2000-01-01
    // (2000-01-03); weeks floor-divide by 2
    val anchor = LocalDate.of(2000, 1, 3)
    val wks = java.time.temporal.ChronoUnit.WEEKS.between(anchor,
      LocalDate.of(2024, 3, 4)) // the Monday of x's week
    val w2 = anchor.plusWeeks((wks / 2) * 2)
    assert(trunc("2024-03-05T06:07:08Z",
      """"unit": "week", "binSize": 2, "startOfWeek": "monday"""")
      == w2.atStartOfDay(ZoneOffset.UTC).toInstant)

    // 5-month bins since 2000-01: month index 290 (2024-03) → 290 - 290%5
    // = 290 → 2024-03-01; one month later still the same bin start
    assert(trunc("2024-03-05T06:07:08Z", """"unit": "month", "binSize": 5""")
      == ist("2024-03-01T00:00:00Z"))
    assert(trunc("2024-04-20T00:00:00Z", """"unit": "month", "binSize": 5""")
      == ist("2024-03-01T00:00:00Z"))
    // quarter + pre-2000 (negative month index floor-division)
    assert(trunc("2024-05-05T06:07:08Z", """"unit": "quarter"""")
      == ist("2024-04-01T00:00:00Z"))
    assert(trunc("1999-02-10T12:00:00Z", """"unit": "quarter"""")
      == ist("1999-01-01T00:00:00Z"))
    // month indices since 2000-01: 1999-02 = −11, bin starts at −15
    // (5-month bins anchored at 0): 1998-10 .. 1999-02
    assert(trunc("1999-02-10T12:00:00Z", """"unit": "month", "binSize": 5""")
      == ist("1998-10-01T00:00:00Z"))
    assertThrows[MqlException](trunc("2024-03-05T06:07:08Z",
      """"unit": "day", "binSize": 0"""))
  }

  test("timezone option across the date surface (DST honored)") {
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    // 2024-03-05T03:00Z in America/New_York is 22:00 the previous day
    // (EST, UTC−5) — extraction follows the zone's wall clock
    val d = """{"$date": "2024-03-05T03:00:00Z"}"""
    val nyd = s"""{"date": $d, "timezone": "America/New_York"}"""
    assert(eval(s"""{"$$hour": $nyd}""") == 22)
    assert(eval(s"""{"$$dayOfMonth": $nyd}""") == 4)
    // after the spring-forward the offset is −4 (EDT): DST, not a
    // fixed offset
    assert(eval("""{"$hour": {"date": {"$date": "2024-07-01T03:00:00Z"},
      "timezone": "America/New_York"}}""") == 23)
    // truncation to the ZONE's midnight, result still a UTC instant
    assert(eval(s"""{"$$dateTrunc": {"date": $d, "unit": "day",
      "timezone": "America/New_York"}}""") == ts("2024-03-04T05:00:00Z"))
    // parts assemble in the zone's wall clock
    assert(eval("""{"$dateFromParts": {"year": 2024, "month": 3, "day": 4,
      "timezone": "America/New_York"}}""") == ts("2024-03-04T05:00:00Z"))
    // a calendar day added across spring-forward is 23 real hours
    assert(eval("""{"$dateAdd": {"startDate": {"$date": "2024-03-09T17:00:00Z"},
      "unit": "day", "amount": 1, "timezone": "America/New_York"}}""")
      == ts("2024-03-10T16:00:00Z"))
    // rendering in the zone
    assert(eval(s"""{"$$dateToString": {"date": $d,
      "format": "%Y-%m-%d %H:%M", "timezone": "America/New_York"}}""")
      == "2024-03-04 22:00")
    // $dateToString onNull
    assert(eval("""{"$dateToString": {"date": null, "onNull": "none"}}""")
      == "none")
    // $dateDiff day boundaries counted in the zone: both instants are
    // 03-04 in NY (one day in UTC terms, zero NY midnights crossed)
    assert(eval("""{"$dateDiff": {"startDate": {"$date": "2024-03-04T06:00:00Z"},
      "endDate": {"$date": "2024-03-05T03:00:00Z"}, "unit": "day",
      "timezone": "America/New_York"}}""") == 0L)
  }

  test("dates") {
    val d = """{"$date": "2024-03-05T06:07:08Z"}"""
    assert(eval(s"""{"$$year": $d}""") == 2024)
    assert(eval(s"""{"$$month": $d}""") == 3)
    assert(eval(s"""{"$$dayOfMonth": $d}""") == 5)
    assert(eval(s"""{"$$hour": $d}""") == 6)
    assert(eval(s"""{"$$dateToString": {"date": $d, "format": "%Y/%m/%d %H:%M:%S"}}""")
      == "2024/03/05 06:07:08")
  }

  test("hyperbolic trig") {
    assert(eval("""{"$sinh": 0}""") == 0.0)
    assert(eval("""{"$cosh": 0}""") == 1.0)
    assert(math.abs(eval("""{"$tanh": 1}""").asInstanceOf[Double] - math.tanh(1.0)) < 1e-12)
    assert(math.abs(eval("""{"$asinh": 1}""").asInstanceOf[Double] - 0.8813735870195430) < 1e-12)
    assert(eval("""{"$acosh": 1}""") == 0.0)
    assert(math.abs(eval("""{"$atanh": 0.5}""").asInstanceOf[Double] - 0.5493061443340549) < 1e-12)
  }

  test("$dateToParts calendar and iso8601 forms") {
    val d = """{"$date": "2024-03-05T06:07:08Z"}"""
    val cal = eval(s"""{"$$dateToParts": {"date": $d}}""").asInstanceOf[org.apache.spark.sql.Row]
    assert(cal.getAs[Int]("year") == 2024 && cal.getAs[Int]("month") == 3 &&
      cal.getAs[Int]("day") == 5 && cal.getAs[Int]("hour") == 6 &&
      cal.getAs[Int]("minute") == 7 && cal.getAs[Int]("second") == 8 &&
      cal.getAs[Int]("millisecond") == 0)
    val iso = eval(s"""{"$$dateToParts": {"date": $d, "iso8601": true}}""")
      .asInstanceOf[org.apache.spark.sql.Row]
    // 2024-03-05 is a Tuesday in ISO week 10
    assert(iso.getAs[Int]("isoWeekYear") == 2024 && iso.getAs[Int]("isoWeek") == 10 &&
      iso.getAs[Int]("isoDayOfWeek") == 2)
  }

  test("arrays: elemAt, slice, range, sort, set ops") {
    assert(eval("""{"$arrayElemAt": [[10, 20, 30], 1]}""") == 20)
    assert(eval("""{"$arrayElemAt": [[10, 20, 30], -1]}""") == 30)
    assert(eval("""{"$first": [[7, 8]]}""") == 7)
    assert(eval("""{"$slice": [[1, 2, 3, 4], 2]}""") == Seq(1, 2))
    assert(eval("""{"$slice": [[1, 2, 3, 4], -2]}""") == Seq(3, 4))
    assert(eval("""{"$range": [0, 10, 3]}""") == Seq(0, 3, 6, 9))
    assert(eval("""{"$sortArray": {"input": [3, 1, 2], "sortBy": -1}}""") == Seq(3, 2, 1))
    assert(eval("""{"$setUnion": [[1, 2], [2, 3]]}""")
      .asInstanceOf[scala.collection.Seq[Int]].sorted == Seq(1, 2, 3))
    assert(eval("""{"$in": [2, [1, 2, 3]]}""") == true)
    assert(eval("""{"$indexOfArray": [[9, 8, 7], 8]}""") == 1L)
  }

  test("array-parity corners: $indexOfArray window, $concatArrays null, $range step 0") {
    // start/end restrict the search WINDOW but the index is in the
    // original array; not-found inside the window is -1
    assert(eval("""{"$indexOfArray": [[9, 8, 7, 8], 8, 2]}""") == 3L)
    assert(eval("""{"$indexOfArray": [[9, 8, 7, 8], 8, 2, 3]}""") == -1L)
    assert(eval("""{"$indexOfArray": [[9, 8, 7], 5, 1]}""") == -1L)
    assert(eval("""{"$indexOfArray": [[9, 8, 7], 9, 50]}""") == -1L) // start past end
    assert(eval("""{"$indexOfArray": [[9, 8, 7], 8, 0, 99]}""") == 1L) // end past len ok
    // ANY literal-null operand nulls the whole result (Mongo contract)
    assert(eval("""{"$concatArrays": [[1, 2], null, [3]]}""") == null)
    assert(eval("""{"$concatArrays": [null]}""") == null)
    assert(eval("""{"$concatArrays": [[1], [2, 3]]}""") == Seq(1, 2, 3))
    // zero step raises like Mongo, not an infinite sequence()
    assertThrows[MqlException](eval("""{"$range": [0, 5, 0]}"""))
    assert(eval("""{"$range": [5, 0, -2]}""") == Seq(5, 3, 1))
  }

  test("$slice parity: negative positions clamp to the start like Mongo") {
    // 2-arg negative with |k| ≥ len → the WHOLE array (Spark slice alone
    // returns empty for an out-of-range negative start)
    assert(eval("""{"$slice": [[1, 2], -3]}""") == Seq(1, 2))
    assert(eval("""{"$slice": [[1, 2, 3, 4], -4]}""") == Seq(1, 2, 3, 4))
    // 3-arg negative position counts from the end (no off-by-one)
    assert(eval("""{"$slice": [[1, 2, 3, 4], -2, 3]}""") == Seq(3, 4))
    assert(eval("""{"$slice": [[1, 2, 3, 4], -9, 2]}""") == Seq(1, 2)) // clamps to start
    assert(eval("""{"$slice": [[1, 2, 3, 4], 1, 2]}""") == Seq(2, 3))
    assert(eval("""{"$slice": [[1, 2, 3], 5, 2]}""") == Seq()) // past end: empty
    // 3-arg n must be positive (server 28729)
    assertThrows[MqlException](eval("""{"$slice": [[1, 2], 0, -1]}"""))
    assertThrows[MqlException](eval("""{"$slice": [[1, 2], 0, 0]}"""))
  }

  test("$switch/$split/$substrCP raise like Mongo on the error corners") {
    // no default + no matching branch raises (server 40066), not null
    val e = intercept[Exception](eval(
      """{"$switch": {"branches": [{"case": false, "then": 1}]}}"""))
    assert(e.getMessage.contains("matching branch"))
    // empty branches refuse at compile
    assertThrows[MqlException](eval("""{"$switch": {"branches": []}}"""))
    // empty separator refuses at compile (server 40087)
    assertThrows[MqlException](eval("""{"$split": ["abc", ""]}"""))
    // negative start/length raise (server 34455/34456) — Spark substr
    // would silently count from the end
    assert(intercept[Exception](eval("""{"$substrCP": ["hello", -1, 2]}"""))
      .getMessage.contains("starting index"))
    assert(intercept[Exception](eval("""{"$substrCP": ["hello", 0, -2]}"""))
      .getMessage.contains("length"))
  }

  test("$zip useLongestLength + defaults") {
    assert(eval(
      """{"$zip": {"inputs": [[1, 2, 3], [10, 20]], "useLongestLength": true}}""")
      == Seq(Seq(1, 10), Seq(2, 20), Seq(3, null)))
    assert(eval("""{"$zip": {"inputs": [[1, 2, 3], [10, 20]],
      "useLongestLength": true, "defaults": [0, -1]}}""")
      == Seq(Seq(1, 10), Seq(2, 20), Seq(3, -1)))
    // a real null ELEMENT is not a missing position: no default applies
    assert(eval("""{"$zip": {"inputs": [[1, null], [10, 20, 30]],
      "useLongestLength": true, "defaults": [0, -1]}}""")
      == Seq(Seq(1, 10), Seq(null, 20), Seq(0, 30)))
    // any null INPUT nulls the result, both forms
    assert(eval("""{"$zip": {"inputs": [[1, 2], null]}}""") == null)
    assert(eval(
      """{"$zip": {"inputs": [[1, 2], null], "useLongestLength": true}}""") == null)
    // both-empty inputs → empty result, not a sequence() error
    assert(eval(
      """{"$zip": {"inputs": [[], []], "useLongestLength": true}}""") == Seq())
    // defaults without useLongestLength refuses (server 34514)
    assertThrows[MqlException](eval(
      """{"$zip": {"inputs": [[1], [2]], "defaults": [0, 0]}}"""))
  }

  test("n-value array-expression forms: $firstN/$lastN/$minN/$maxN") {
    assert(eval("""{"$firstN": {"input": [5, null, 3, 9], "n": 2}}""")
      == Seq(5, null, 3, 9).take(2)) // stored order, nulls kept
    assert(eval("""{"$lastN": {"input": [5, null, 3, 9], "n": 2}}""")
      == Seq(3, 9))
    assert(eval("""{"$lastN": {"input": [7], "n": 3}}""") == Seq(7))
    assert(eval("""{"$minN": {"input": [5, null, 3, 9], "n": 2}}""")
      == Seq(3, 5)) // nulls dropped, ascending
    assert(eval("""{"$maxN": {"input": [5, null, 3, 9], "n": 2}}""")
      == Seq(9, 5)) // descending
  }

  test("set predicates, $zip, truthiness folds, $type/$isNumber/$binarySize") {
    assert(eval("""{"$setIsSubset": [[1, 2], [1, 2, 3]]}""") == true)
    assert(eval("""{"$setIsSubset": [[1, 4], [1, 2, 3]]}""") == false)
    assert(eval("""{"$setEquals": [[1, 2, 2], [2, 1]]}""") == true)
    assert(eval("""{"$setEquals": [[1, 2], [2, 3]]}""") == false)
    assert(eval("""{"$zip": {"inputs": [[1, 2, 3], [10, 20]]}}""")
      == Seq(Seq(1, 10), Seq(2, 20))) // shortest-length default
    // truthiness: 0 and null are falsy, other numbers truthy
    // (arrays are homogeneous in Spark — bool and numeric tested apart)
    assert(eval("""{"$anyElementTrue": [[0, 3]]}""") == true)
    assert(eval("""{"$anyElementTrue": [[0, 0]]}""") == false)
    assert(eval("""{"$anyElementTrue": [[false, true]]}""") == true)
    assert(eval("""{"$anyElementTrue": [[null, null]]}""") == false)
    assert(eval("""{"$allElementsTrue": [[1, 7]]}""") == true)
    assert(eval("""{"$allElementsTrue": [[true, false]]}""") == false)
    assert(eval("""{"$allElementsTrue": [[1, 0]]}""") == false)
    // EVERY string is truthy in MQL — including "false" and "0"
    assert(eval("""{"$allElementsTrue": [["false", "0", ""]]}""") == true)
    intercept[MqlException](eval("""{"$setEquals": [[1, 2]]}"""))
    intercept[MqlException](eval("""{"$setIsSubset": [[1], [1], [1]]}"""))
    // $not takes exactly 1 argument (server error 16020) — a 2-element
    // array must raise, not compile to truthy(array-literal) = constant
    assert(eval("""{"$not": [0]}""") == true)
    intercept[MqlException](eval("""{"$not": [1, 1]}"""))
    intercept[MqlException](eval("""{"$not": []}"""))
    assert(eval("""{"$type": "abc"}""") == "string")
    assert(eval("""{"$type": 5}""") == "int")
    assert(eval("""{"$type": 5.5}""") == "double")
    assert(eval("""{"$type": null}""") == "null")
    assert(eval("""{"$isNumber": 3.2}""") == true)
    assert(eval("""{"$isNumber": "x"}""") == false)
    assert(eval("""{"$binarySize": "héllo"}""") == 6)
    assert(eval("""{"$dateSubtract": {"startDate": {"$date": "2024-03-10T00:00:00Z"},
      "unit": "day", "amount": 9}}""").toString.startsWith("2024-03-01"))
  }

  test("$setField/$unsetField/$objectToArray/$regexFind") {
    assert(eval("""{"$getField": {"input": {"$setField":
      {"field": "b", "input": {"a": 1}, "value": 9}}, "field": "b"}}""") == 9)
    // $unsetField drops the field; reading a dropped field fails analysis,
    // so observe via $objectToArray's element count
    assert(eval("""{"$size": {"$objectToArray": {"$unsetField":
      {"field": "b", "input": {"a": 1, "b": 2}}}}}""") == 1)
    val kv = eval("""{"$objectToArray": {"a": 1, "b": 2}}""")
      .asInstanceOf[scala.collection.Seq[org.apache.spark.sql.Row]]
    assert(kv.map(r => (r.getString(0), r.getInt(1))) == Seq(("a", 1), ("b", 2)))
    val m = eval("""{"$regexFind": {"input": "abc123def",
      "regex": "([0-9])([0-9]+)"}}""").asInstanceOf[org.apache.spark.sql.Row]
    assert(m.getString(0) == "123")
    assert(m.getLong(1) == 3L) // 0-based index of the match
    assert(m.getSeq[String](2).toSeq == Seq("1", "23"))
    assert(eval("""{"$regexFind": {"input": "abc", "regex": "[0-9]+"}}""") == null)
    assert(eval("""{"$regexFind": {"input": "ABC1", "regex": "c([0-9])",
      "options": "i"}}""").asInstanceOf[org.apache.spark.sql.Row].getString(0) == "C1")
    // non-participating capture groups are null, not "" (Mongo parity)
    val alt = eval("""{"$regexFind": {"input": "b", "regex": "(a)|(b)"}}""")
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(alt.getSeq[String](2).toSeq == Seq(null, "b"))
    // $setField/$unsetField treat dotted names literally, not as paths
    assert(eval("""{"$getField": {"input": {"$setField":
      {"field": "a.b", "input": {"a": 1}, "value": 7}}, "field": "a.b"}}""") == 7)
    // $regexFindAll: every match in order, per-match idx and captures
    val all = eval("""{"$regexFindAll": {"input": "a1b22c", "regex": "([0-9]+)"}}""")
      .asInstanceOf[scala.collection.Seq[org.apache.spark.sql.Row]]
    assert(all.map(_.getString(0)) == Seq("1", "22"))
    assert(all.map(_.getLong(1)) == Seq(1L, 3L))
    assert(eval("""{"$regexFindAll": {"input": "xyz", "regex": "[0-9]"}}""")
      .asInstanceOf[scala.collection.Seq[_]].isEmpty)
  }

  test("$isoWeekYear: ISO week-numbering year at year boundaries") {
    // 2021-01-01 is a Friday of ISO week 53 of 2020
    assert(eval("""{"$isoWeekYear": {"$toDate": "2021-01-01"}}""") == 2020)
    assert(eval("""{"$isoWeekYear": {"$toDate": "2021-06-15"}}""") == 2021)
  }

  test("$bitAnd/$bitOr/$bitXor/$bitNot and $mergeObjects") {
    assert(eval("""{"$bitAnd": [12, 10]}""") == 8)
    assert(eval("""{"$bitOr": [12, 10]}""") == 14)
    assert(eval("""{"$bitXor": [12, 10]}""") == 6)
    assert(eval("""{"$bitNot": [0]}""") == -1)
    val m = eval("""{"$mergeObjects": [{"a": 1, "b": 2}, {"b": 9, "c": 3}]}""")
      .asInstanceOf[org.apache.spark.sql.Row]
    // later value wins; field order is first-seen
    assert(m.schema.fieldNames.toSeq == Seq("a", "b", "c"))
    assert((m.getInt(0), m.getInt(1), m.getInt(2)) == ((1, 9, 3)))
  }

  test("lambda ops: $filter/$map/$reduce with $$this/$$value and named as") {
    assert(eval("""{"$filter": {"input": [1, 2, 3, 4], "cond": {"$gt": ["$$this", 2]}}}""")
      == Seq(3, 4))
    assert(eval("""{"$filter": {"input": [1, 2, 3], "as": "n",
                   "cond": {"$eq": [{"$mod": ["$$n", 2]}, 1]}}}""") == Seq(1, 3))
    assert(eval("""{"$map": {"input": [1, 2], "as": "v",
                   "in": {"$multiply": ["$$v", 10]}}}""") == Seq(10, 20))
    assert(eval("""{"$reduce": {"input": [1, 2, 3], "initialValue": 0,
                   "in": {"$add": ["$$value", "$$this"]}}}""") == 6)
  }

  test("document expression builds struct") {
    val r = one.select(ExprCompiler.compile(
      Mql.parse("""{"a": {"$add": [1, 1]}, "b": "lit"}""")).as("r"))
      .select("r.a", "r.b").head
    assert(r.get(0) == 2 && r.get(1) == "lit")
  }

  test("type conversions") {
    assert(eval("""{"$toInt": "42"}""") == 42)
    assert(eval("""{"$toDouble": "2.5"}""") == 2.5)
    assert(eval("""{"$toString": 7}""") == "7")
  }

  test("n-ary vs array forms of $max/$min/$sum/$avg") {
    assert(eval("""{"$max": [3, 9, 1]}""") == 9)
    assert(eval("""{"$min": [3, 9, 1]}""") == 1)
    assert(eval("""{"$max": [[3, 9, 1]]}""") == 9) // array form
    assert(eval("""{"$sum": [[1, 2, 3]]}""") == 6.0)
    assert(eval("""{"$avg": [[2, 4]]}""") == 3.0)
    assert(eval("""{"$sum": [1, 2, 10]}""") == 13)
  }

  test("$indexOfCP / $strcasecmp / $dateFromString / $dateFromParts") {
    assert(eval("""{"$indexOfCP": ["abcba", "b"]}""") == 1)
    assert(eval("""{"$indexOfCP": ["abc", "z"]}""") == -1)
    assert(eval("""{"$strcasecmp": ["Hello", "hello"]}""") == 0)
    assert(eval("""{"$strcasecmp": ["apple", "Banana"]}""") == -1)
    assert(eval("""{"$dateFromString": {"dateString": "2024-03-05 06:07:08"}}""")
      .asInstanceOf[java.sql.Timestamp].toInstant.toString == "2024-03-05T06:07:08Z")
    assert(eval("""{"$dateFromParts": {"year": 2024, "month": 3, "day": 5, "hour": 6}}""")
      .asInstanceOf[java.sql.Timestamp].toInstant.toString == "2024-03-05T06:00:00Z")
  }

  test("$convert with onError/onNull") {
    assert(eval("""{"$convert": {"input": "12", "to": "int"}}""") == 12)
    assert(eval("""{"$convert": {"input": "oops", "to": "int", "onError": -1}}""") == -1)
    assert(eval("""{"$convert": {"input": null, "to": "int", "onNull": 0}}""") == 0)
    assert(eval("""{"$convert": {"input": "oops", "to": "long"}}""") == null)
    assert(eval("""{"$convert": {"input": 3.9, "to": "string"}}""") == "3.9")
  }

  test("$stdDevPop/$stdDevSamp expression forms over arrays") {
    // pop([2,4,4,4,5,5,7,9]) = 2 exactly; samp = sqrt(32/7)
    val arr = """[2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0]"""
    assert(eval(s"""{"$$stdDevPop": [$arr]}""") == 2.0)
    val samp = eval(s"""{"$$stdDevSamp": [$arr]}""").asInstanceOf[Double]
    assert(math.abs(samp - math.sqrt(32.0 / 7.0)) < 1e-12)
    // cardinality guards: pop needs >=1 element, samp >=2
    assert(eval("""{"$stdDevPop": [[]]}""") == null)
    assert(eval("""{"$stdDevSamp": [[3.0]]}""") == null)
  }

  test("$median/$percentile expression forms over arrays") {
    // even count → interpolated midpoint; p=[0,1] hit the extremes
    assert(eval("""{"$median": {"input": [1.0, 3.0, 5.0, 7.0],
      "method": "approximate"}}""") == 4.0)
    assert(eval("""{"$median": {"input": [9.0, 1.0, 5.0],
      "method": "approximate"}}""") == 5.0) // unsorted input is sorted first
    val ps = eval("""{"$percentile": {"input": [10.0, 20.0, 30.0, 40.0, 50.0],
      "p": [0.0, 0.25, 0.5, 1.0], "method": "approximate"}}""")
      .asInstanceOf[scala.collection.Seq[Double]]
    assert(ps == Seq(10.0, 20.0, 30.0, 50.0))
  }

  test("$bsonSize: sink-encoder byte count") {
    // {"a": int32 1, "b": "xy"} → 4 + (1+2+4) + (1+2+ 4+3) + 1 = 22
    assert(eval("""{"$bsonSize": {"a": 1, "b": "xy"}}""") == 22)
    // nested doc adds its own 4-byte length + terminator
    assert(eval("""{"$bsonSize": {"d": {"a": 1}}}""") ==
      4 + (1 + 2 + (4 + (1 + 2 + 4) + 1)) + 1)
    // non-document input fails analysis loudly
    assertThrows[Exception](eval("""{"$bsonSize": "not a doc"}"""))
  }
}
