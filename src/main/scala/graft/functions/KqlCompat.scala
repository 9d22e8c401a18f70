package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** KQL scalar-function compatibility (§2.i): the reference's only user
  * extensibility point is a KQL scalar expression string (`--creation-time`,
  * CommandLineOptions.cs:16-20) evaluated per partition tuple; its generated
  * queries use a small scalar surface (SURVEY §2.g). Spark's `expr()` gives
  * the evaluation engine; this object supplies the KQL spellings — both as
  * typed Column functions and as a textual rewrite so reference-flavored
  * expression strings (e.g. `todatetime(strcat(p0,'-01-01'))`, the
  * reference tests' default — ElectricTestBase.cs:13) run unchanged.
  *
  * Invariant: every rewrite is a NO-OP on Spark-SQL-native input — only
  * names that are not valid Spark SQL functions are rewritten (so e.g. KQL
  * `substring`/`split`, whose Spark twins share the name but differ in
  * semantics, are deliberately NOT translated).
  */
object KqlCompat {

  // ---- typed aliases ------------------------------------------------------

  def todatetime(c: Column): Column      = c.cast("timestamp")
  def tostring(c: Column): Column        = c.cast("string")
  def toint(c: Column): Column           = c.cast("int")
  def tolong(c: Column): Column          = c.cast("long")
  def todouble(c: Column): Column        = c.cast("double")
  def strcat(cs: Column*): Column        = concat(cs: _*)
  def iff(p: Column, a: Column, b: Column): Column = when(p, a).otherwise(b)
  /** KQL `has`: whole-TERM case-insensitive match, as in ADX
    * ('administrators' has 'admin' is FALSE — KustoClusterGateway.cs:73's
    * usage relies on term semantics). The haystack splits on
    * non-alphanumeric boundaries; a needle containing non-alphanumerics (a
    * multi-term phrase) never matches here — use `contains` for substrings.
    */
  def has(c: Column, term: String): Column =
    array_contains(split(lower(c), "[^0-9a-z]+"), term.toLowerCase)
  def argMax(value: Column, ordering: Column): Column = max_by(value, ordering)
  def strlen(c: Column): Column          = length(c)
  def isempty(c: Column): Column         = coalesce(c.cast("string"), lit("")) === ""
  def isnotempty(c: Column): Column      = coalesce(c.cast("string"), lit("")) =!= ""
  /** KQL `bin` on numbers: floor to a multiple of `size`. */
  def bin(c: Column, size: Column): Column = floor(c / size) * size

  /** Point-to-great-circle-ARC distance in RADIANS as engine-neutral SQL
    * text over unit-vector component spellings (a = segment start, b =
    * end, p = query point). n = a×b is the great-circle normal; the foot
    * of the perpendicular lies within the arc iff p sits on the b-side of
    * the plane through (n, a) AND the a-side of the plane through (n, b)
    * — then the distance is the cross-track asin(|p·n|/|n|); otherwise
    * the nearer endpoint wins, via the well-conditioned chord form
    * 2·asin(‖p−q‖/2). Degenerate a=b segments (|n|=0) fall back to the
    * endpoint distance. Public so oracle twins restate the IDENTICAL
    * arithmetic (the geo_polygon_area bit-parity discipline).
    */
  def segmentDistanceSql(ax: String, ay: String, az: String,
      bx: String, by: String, bz: String,
      px: String, py: String, pz: String): String = {
    val nx = s"(($ay)*($bz) - ($az)*($by))"
    val ny = s"(($az)*($bx) - ($ax)*($bz))"
    val nz = s"(($ax)*($by) - ($ay)*($bx))"
    val nn = s"($nx*$nx + $ny*$ny + $nz*$nz)"
    val pn = s"(($px)*$nx + ($py)*$ny + ($pz)*$nz)"
    val c1x = s"($ny*($az) - $nz*($ay))"
    val c1y = s"($nz*($ax) - $nx*($az))"
    val c1z = s"($nx*($ay) - $ny*($ax))"
    val c2x = s"(($by)*$nz - ($bz)*$ny)"
    val c2y = s"(($bz)*$nx - ($bx)*$nz)"
    val c2z = s"(($bx)*$ny - ($by)*$nx)"
    val within = s"(($c1x*($px) + $c1y*($py) + $c1z*($pz)) >= 0 AND " +
      s"($c2x*($px) + $c2y*($py) + $c2z*($pz)) >= 0)"
    def endp(qx: String, qy: String, qz: String) =
      s"(2 * asin(least(CAST(1.0 AS DOUBLE), sqrt(" +
        s"(($px)-($qx))*(($px)-($qx)) + (($py)-($qy))*(($py)-($qy)) + " +
        s"(($pz)-($qz))*(($pz)-($qz))) / 2)))"
    val dEnds = s"least(${endp(ax, ay, az)}, ${endp(bx, by, bz)})"
    s"(CASE WHEN $nn = 0 THEN $dEnds WHEN $within THEN " +
      s"asin(least(CAST(1.0 AS DOUBLE), abs($pn) / sqrt($nn))) ELSE $dEnds END)"
  }

  // ---- textual rewrite for expression strings -----------------------------

  // plain spelling swaps: KQL name → Spark name with identical call shape
  private val NameRewrites: Seq[(String, String)] = Seq(
    // try_to_timestamp: ADX todatetime yields null on unparseable input
    // (ANSI to_timestamp would throw)
    "todatetime("     -> "try_to_timestamp(",
    "now("            -> "current_timestamp(",
    "strcat("         -> "concat(",
    "arg_max("        -> "max_by(",
    "iff("            -> "if(",
    "iif("            -> "if(",
    "strlen("         -> "length(",
    "tolower("        -> "lower(",
    "toupper("        -> "upper(",
    "replace_string(" -> "replace(",
    "strcat_delim("   -> "concat_ws(",
    // KQL strcat_array(arr, delim) == Spark array_join(arr, delim)
    "strcat_array("   -> "array_join(",
    // KQL format_datetime uses the same yyyy/MM/dd/HH/mm/ss tokens as Java
    "format_datetime("-> "date_format(",
    "getyear("        -> "year(",
    "getmonth("       -> "month(",
    "monthofyear("    -> "month(",
    "hourofday("      -> "hour(",
    "dayofmonth("     -> "day(",
    "week_of_year("   -> "weekofyear(", // both ISO-8601 week numbering
    "make_datetime("  -> "make_timestamp(",
    // series helpers over make-series outputs (dynamic arrays) — KQL-only
    // names mapping to codegen'd array expressions
    "array_length("   -> "array_size(",
    "series_max("     -> "array_max(",
    "series_min("     -> "array_min(",
    // KQL set_* over dynamic arrays → Spark's array algebra (same
    // semantics: distinct elements, left-to-right order)
    "set_intersect("  -> "array_intersect(",
    "set_union("      -> "array_union(",
    "set_difference(" -> "array_except(",
    // strrep is an expandCalls case (NOT `-> repeat(` — the round-10 KQL
    // `repeat` expansion would array-ify the renamed call on re-rewrite)
    // crypto digests: same hex-string output shape on both engines
    "hash_md5("       -> "md5(",
    "hash_sha1("      -> "sha1(",
    // replace_regex(source, pattern, rewrite): same arg order. Capture
    // references diverge — ADX spells \1 where Spark/Java spells $1
    // (documented divergence; group-free rewrites are identical)
    "replace_regex("  -> "regexp_replace(",
    // datetime_utc_to_local(dt, tz) / datetime_local_to_utc(dt, tz):
    // same (timestamp, IANA zone) order as Spark's utc converters
    "datetime_utc_to_local(" -> "from_utc_timestamp(",
    "datetime_local_to_utc(" -> "to_utc_timestamp(",
    // aliases ADX keeps for compatibility
    "extract_json("    -> "extractjson(",
    "pack_dictionary(" -> "bag_pack(",
    // make_string is the deprecated ADX alias of the codepoints builder
    "make_string("     -> "unicode_codepoints_to_string(",
    // epoch → datetime family (nanos needs a division — expandCalls below)
    "unixtime_seconds_todatetime("      -> "timestamp_seconds(",
    "unixtime_milliseconds_todatetime(" -> "timestamp_millis(",
    "unixtime_microseconds_todatetime(" -> "timestamp_micros("
  )

  private val TimeSpan = """(\d+)\s*([dhms])""".r
  private val SpanSeconds =
    Map("d" -> 86400L, "h" -> 3600L, "m" -> 60L, "s" -> 1L)
  private val SpanUnit =
    Map("d" -> "day", "h" -> "hour", "m" -> "minute", "s" -> "second")

  /** Rewrite a KQL-flavored scalar expression into Spark SQL accepted by
    * `expr()`. Handles the spellings above, cast functions, `datetime(...)`
    * literals, `ago(1d)`, `bin(x, n)` (numeric or timespan),
    * `isempty`/`isnotempty`, and `startofday/month/year`. Spark-SQL-native
    * input passes through untouched.
    */
  /** `dynamic({...})` bag literals → single-quoted JSON string literals
    * (this engine's dynamic currency is JSON text). Runs FIRST, before any
    * other rewrite: the bag's DOUBLE-quoted JSON strings are invisible to
    * the single-quote-aware expansions, so running late would let an
    * earlier handler corrupt function-shaped text inside them (e.g. a
    * message value "split(a,b) failed"), and expandCalls' comma-split+trim
    * would eat interior whitespace ("x, y" → "x,y"). This scanner keeps
    * the raw text verbatim: paren depth tracked OUTSIDE JSON strings,
    * JSON strings tracked with backslash escapes.
    */
  private def rewriteDynamicBags(s0: String): String = {
    val out = new StringBuilder
    var i = 0
    // single-quote parity tracked INCREMENTALLY over the text this scanner
    // has passed through (consumed bag payloads excluded): a recount of the
    // raw prefix would let an apostrophe inside an earlier bag's
    // double-quoted JSON string (dynamic({"m":"it's"})) flip parity and
    // misclassify every later bag as inside-a-literal
    var parity = false
    def advance(chunk: String): Unit = chunk.foreach(c => if (c == '\'') parity = !parity)
    while (i < s0.length) {
      val idx = s0.indexOf("dynamic(", i)
      val precededByIdent = idx > 0 &&
        (s0.charAt(idx - 1).isLetterOrDigit || s0.charAt(idx - 1) == '_')
      // only outside single-quoted SQL literals (quote parity, '' escapes
      // keep parity) and only when the first payload char is '{'
      lazy val insideLiteral = {
        var p = parity
        var k = i
        while (k < idx) { if (s0.charAt(k) == '\'') p = !p; k += 1 }
        p
      }
      var payload = if (idx < 0) -1 else idx + "dynamic(".length
      while (payload >= 0 && payload < s0.length && s0.charAt(payload).isWhitespace)
        payload += 1
      if (idx < 0) { out.append(s0.substring(i)); i = s0.length }
      else if (precededByIdent || insideLiteral ||
          payload >= s0.length || s0.charAt(payload) != '{') {
        advance(s0.substring(i, idx + 1))
        out.append(s0.substring(i, idx + 1)); i = idx + 1
      } else {
        var depth = 0; var inStr = false; var esc = false
        var j = idx + "dynamic(".length
        var end = -1
        while (j < s0.length && end < 0) {
          val c = s0.charAt(j)
          if (inStr) {
            if (esc) esc = false
            else if (c == '\\') esc = true
            else if (c == '"') inStr = false
          } else c match {
            case '"' => inStr = true
            case '(' => depth += 1
            case ')' => if (depth == 0) end = j else depth -= 1
            case _   =>
          }
          j += 1
        }
        if (end < 0) {
          advance(s0.substring(i, idx + 1))
          out.append(s0.substring(i, idx + 1)); i = idx + 1
        } else {
          val content = s0.substring(idx + "dynamic(".length, end).trim
          advance(s0.substring(i, idx)) // payload itself never counts: it
          out.append(s0.substring(i, idx)) // becomes a BALANCED literal below
          out.append("'").append(content.replace("'", "''")).append("'")
          i = end + 1
        }
      }
    }
    out.toString
  }

  /** Test hook: when non-null, every `rewrite` INPUT is recorded so the
    * fixpoint property spec (RewriteFixpointSpec) can replay the real
    * corpus — every scalar fragment the registry's queries actually push
    * through this engine — and assert rewrite∘rewrite == rewrite. Zero
    * cost when null (the default); never set outside tests.
    */
  @volatile private[graft] var recordInputs:
      java.util.concurrent.ConcurrentLinkedQueue[String] = null

  def rewrite(kql: String): String = {
    val rec = recordInputs
    if (rec != null) rec.add(kql)
    // bag literals first — see rewriteDynamicBags
    val kql1 = rewriteDynamicBags(kql)
    // name/literal rewrites see only the text OUTSIDE single-quoted string
    // literals, and match only at identifier boundaries — `my_strcat(`,
    // `sdiff(` and `concat('iff(', x)` must all survive untouched (the
    // no-op-on-Spark-SQL invariant)
    var s = mapOutsideQuotes(kql1) { seg0 =>
      var seg = seg0
      // datetime(2021-01-01) literal → timestamp'2021-01-01'; the negative
      // look-behind keeps `todatetime(` intact
      seg = "(?<![A-Za-z0-9_])datetime\\(([^)']*)\\)".r
        .replaceAllIn(seg, m => s"timestamp'${m.group(1).trim}'")
      // ago(1d) → (current_timestamp() - interval '1' day)
      seg = "(?<![A-Za-z0-9_])ago\\((\\d+)\\s*([dhms])\\)".r
        .replaceAllIn(seg, m =>
          s"(current_timestamp() - interval '${m.group(1)}' ${SpanUnit(m.group(2))})")
      NameRewrites.foreach { case (from, to) =>
        val name = from.stripSuffix("(")
        seg = s"(?<![A-Za-z0-9_])${java.util.regex.Pattern.quote(name)}\\(".r
          .replaceAllIn(seg, java.util.regex.Matcher.quoteReplacement(to))
      }
      seg
    }
    // base64_encode_fromguid / base64_decode_toguid: .NET GUID byte order
    // (Data1/2/3 little-endian, Data4 as-is — the reference's guid wire
    // shape). Expand BEFORE toguid so the emitted calls are rewritten (the
    // in_circle pattern); null propagates from toguid/the base64 guard.
    // each expansion BINDS its argument once (the single-element
    // transform-array trick): the argument text is often itself a nested
    // expansion, and a 9-fold textual copy of a nested copy analyzed to a
    // 100 KB expression tree (3 s of analysis on a constants fixture)
    def reorder(h: String) =
      s"concat(substr($h, 7, 2), substr($h, 5, 2), substr($h, 3, 2), substr($h, 1, 2), " +
        s"substr($h, 11, 2), substr($h, 9, 2), substr($h, 15, 2), substr($h, 13, 2), " +
        s"substr($h, 17, 16))"
    s = expandCalls(s, "base64_encode_fromguid") {
      case Seq(x) =>
        s"element_at(transform(array(replace(toguid($x), '-', '')), " +
          s"__bg -> base64(unhex(${reorder("__bg")}))), 1)"
    }
    s = expandCalls(s, "base64_decode_toguid") {
      case Seq(x) =>
        s"element_at(transform(array($x), __bd -> " +
          s"CASE WHEN regexp_like(__bd, '^[A-Za-z0-9+/]{22}==$$') THEN " +
          s"element_at(transform(array(lower(hex(unbase64(__bd)))), " +
          s"__bh -> toguid(${reorder("__bh")})), 1) ELSE NULL END), 1)"
    }
    // ADX to* conversions yield NULL on failure; under Spark's ANSI mode a
    // plain cast of e.g. toint('abc') would THROW — try_cast restores the
    // KQL contract (tostring keeps cast: a cast to string cannot fail)
    for (t <- Seq("string", "int", "long", "double", "bool", "real", "decimal")) {
      val sparkT = t match {
        case "bool" => "boolean"; case "real" => "double"
        case "decimal" => "decimal(38,18)"; case x => x
      }
      val castFn = if (t == "string") "cast" else "try_cast"
      s = expandCalls(s, s"to$t") { case Seq(x) => s"$castFn($x as $sparkT)" }
    }
    // tohex: KQL emits lowercase hex (Spark's hex is uppercase)
    s = expandCalls(s, "tohex") { case Seq(x) => s"lower(hex($x))" }
    // has_any_index(source, values): 0-based index of the FIRST value that
    // matches source as a whole TERM (the `has` split), -1 when none or
    // the list is empty. The term table binds once; the terms come from a
    // runtime array, so this spells the term split inline (the native
    // term_has is literal-only by contract).
    s = expandCalls(s, "has_any_index") {
      case Seq(src, l) =>
        s"element_at(transform(array(split(lower($src), '[^0-9a-z]+')), __ht -> " +
          s"coalesce(try_element_at(filter(transform($l, (__he, __hi) -> " +
          s"CASE WHEN array_contains(__ht, lower(CAST(__he AS STRING))) THEN __hi ELSE -1 END), " +
          s"__hv -> __hv >= 0), 1), -1)), 1)"
    }
    // toguid: canonical lowercase 8-4-4-4-12, accepting the hyphenated and
    // bare-32-hex spellings (brace/paren wrappers are not accepted —
    // documented); anything else is NULL, the to*-conversion contract.
    // Surfaced as the canonical STRING (the engine's guid currency).
    s = expandCalls(s, "toguid") {
      case Seq(x) =>
        // the argument binds ONCE (single-element transform-array) — the
        // 8-fold copy of a nested-expansion argument is an analysis-time
        // expression-tree explosion
        s"element_at(transform(array(lower(trim($x))), __tg -> " +
          s"CASE WHEN regexp_like(__tg, '^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$$') THEN __tg " +
          s"WHEN regexp_like(__tg, '^[0-9a-f]{32}$$') THEN concat(" +
          // substr, not substring: the KQL substring rewrite (0-based ->
          // 1-based) runs AFTER this expansion and would double-shift
          s"substr(__tg, 1, 8), '-', substr(__tg, 9, 4), '-', substr(__tg, 13, 4), '-', " +
          s"substr(__tg, 17, 4), '-', substr(__tg, 21, 12)) ELSE NULL END), 1)"
    }
    // string_size: UTF-8 byte length (strlen is CHARACTER count)
    s = expandCalls(s, "string_size") { case Seq(x) => s"octet_length($x)" }
    // unicode codepoint round-trips. BMP-limited: Spark's empty-pattern
    // split yields UTF-16 code units, so astral-plane chars come back as
    // surrogate pairs (documented divergence; ADX is full-codepoint)
    s = expandCalls(s, "unicode_codepoints_from_string") {
      case Seq(x) => s"transform(split($x, ''), __uc -> ascii(__uc))"
    }
    s = expandCalls(s, "unicode_codepoints_to_string") {
      case Seq(x) if !x.trim.matches("\\d+") =>
        s"array_join(transform($x, __uc -> char(__uc)), '')"
      case xs if xs.nonEmpty && xs.forall(_.trim.matches("\\d+")) =>
        xs.map(i => s"char($i)").mkString("concat(", ", ", ")")
    }
    // bag_has_key: top-level key membership on the JSON-bag currency
    s = expandCalls(s, "bag_has_key") {
      case Seq(b, k) => s"array_contains(json_object_keys($b), $k)"
    }
    // format_bytes(size [, precision [, units]]): scale to the largest
    // binary tier (or the forced one), fixed-point text via a DECIMAL cast
    // (no locale separators, trailing zeros kept — '1024.00 MB')
    def fmtBytesTier(sz: String, prec: Int, u: String, d: Long): String =
      if (d == 1L)
        s"concat(CAST(round(($sz) * CAST(1 AS DOUBLE), $prec) AS DECIMAL(38,$prec)), ' Bytes')"
      else
        s"concat(CAST(round(($sz) / CAST($d AS DOUBLE), $prec) AS DECIMAL(38,$prec)), ' $u')"
    val byteTiers = Seq("PB" -> 1125899906842624L, "TB" -> 1099511627776L,
      "GB" -> 1073741824L, "MB" -> 1048576L, "KB" -> 1024L)
    def fmtBytes(sz: String, p: String, units: Option[String]): String = {
      val prec = p.trim.toInt
      units match {
        case Some(u0) =>
          val u = u0.trim.stripPrefix("'").stripSuffix("'")
          fmtBytesTier(sz, prec, u, byteTiers.toMap.getOrElse(u, 1L))
        case None =>
          val cases = byteTiers.map { case (u, d) =>
            s"WHEN ($sz) >= $d THEN ${fmtBytesTier(sz, prec, u, d)}"
          }.mkString(" ")
          s"CASE $cases ELSE ${fmtBytesTier(sz, prec, "Bytes", 1L)} END"
      }
    }
    s = expandCalls(s, "format_bytes") {
      case Seq(x)       => fmtBytes(x, "0", None)
      case Seq(x, p)    if p.trim.matches("\\d+") => fmtBytes(x, p, None)
      case Seq(x, p, u) if p.trim.matches("\\d+") &&
        u.trim.matches("'[A-Za-z]+'") => fmtBytes(x, p, Some(u))
    }
    // format_timespan on the day-time-interval timespan currency; the two
    // ADX workhorse formats. 'hh' is hours-of-day (wraps at 24 when the
    // format carries no day field — same convention as ADX)
    s = expandCalls(s, "format_timespan") {
      case Seq(x, f) if f.trim == "'hh:mm:ss'" || f.trim == "'d.hh:mm:ss'" =>
        val day  = f.trim == "'d.hh:mm:ss'"
        val secs = s"CAST(to_unix_timestamp(timestamp'1970-01-01 00:00:00' + ($x)) AS BIGINT)"
        val core = "concat(lpad(CAST((__fts % 86400) DIV 3600 AS STRING), 2, '0'), ':', " +
                   "lpad(CAST((__fts % 3600) DIV 60 AS STRING), 2, '0'), ':', " +
                   "lpad(CAST(__fts % 60 AS STRING), 2, '0'))"
        val full = if (day) s"concat(CAST(__fts DIV 86400 AS STRING), '.', $core)" else core
        s"element_at(transform(array($secs), __fts -> $full), 1)"
    }
    // convert_* unit family: LITERAL unit names resolve to factors at
    // rewrite time (unknown units fail loudly, not silently wrong); the
    // residual arithmetic is a plain double multiply — codegen'd, exact
    // same expression text any SQL twin can restate
    def litUnit(u: String): Option[String] = {
      val t = u.trim
      if (t.matches("'[^']*'")) Some(t.stripPrefix("'").stripSuffix("'").toLowerCase)
      else None
    }
    val unitTables: Seq[(String, Map[String, Double])] = Seq(
      "convert_length" -> Map(
        "meter" -> 1.0, "kilometer" -> 1000.0, "centimeter" -> 0.01,
        "millimeter" -> 0.001, "micrometer" -> 1e-6, "nanometer" -> 1e-9,
        "mile" -> 1609.344, "yard" -> 0.9144, "foot" -> 0.3048,
        "inch" -> 0.0254, "nauticalmile" -> 1852.0),
      "convert_mass" -> Map(
        "kilogram" -> 1.0, "gram" -> 0.001, "milligram" -> 1e-6,
        "tonne" -> 1000.0, "pound" -> 0.45359237, "ounce" -> 0.028349523125,
        "stone" -> 6.35029318),
      "convert_speed" -> Map(
        "meterpersecond" -> 1.0, "kilometerperhour" -> (1000.0 / 3600.0),
        "mileperhour" -> (1609.344 / 3600.0), "knot" -> (1852.0 / 3600.0),
        "footpersecond" -> 0.3048),
      "convert_volume" -> Map(
        "cubicmeter" -> 1.0, "liter" -> 0.001, "milliliter" -> 1e-6,
        "gallon" -> 0.003785411784, "quart" -> 0.000946352946,
        "pint" -> 0.000473176473, "cubicfoot" -> 0.028316846592,
        "cubicinch" -> 0.000016387064),
      "convert_energy" -> Map(
        "joule" -> 1.0, "kilojoule" -> 1000.0, "calorie" -> 4.184,
        "kilocalorie" -> 4184.0, "watthour" -> 3600.0,
        "kilowatthour" -> 3600000.0, "britishthermalunit" -> 1055.05585262),
      "convert_angle" -> Map(
        "radian" -> 1.0, "degree" -> (math.Pi / 180.0),
        "gradian" -> (math.Pi / 200.0), "revolution" -> (2.0 * math.Pi)),
      "convert_force" -> Map(
        "newton" -> 1.0, "kilonewton" -> 1000.0,
        "poundforce" -> 4.4482216152605, "kilogramforce" -> 9.80665),
      "convert_power" -> Map(
        "watt" -> 1.0, "milliwatt" -> 0.001, "kilowatt" -> 1000.0,
        "megawatt" -> 1e6, "gigawatt" -> 1e9,
        "mechanicalhorsepower" -> 745.69987158227022,
        "metrichorsepower" -> 735.49875),
      "convert_pressure" -> Map(
        "pascal" -> 1.0, "kilopascal" -> 1000.0, "megapascal" -> 1e6,
        "bar" -> 1e5, "millibar" -> 100.0, "atmosphere" -> 101325.0,
        "poundforcepersquareinch" -> 6894.757293168361,
        "torr" -> (101325.0 / 760.0),
        "millimeterofmercury" -> 133.322387415))
    for ((fn, factors) <- unitTables) {
      s = expandCalls(s, fn) {
        case Seq(v, f, t) if litUnit(f).isDefined && litUnit(t).isDefined =>
          val ff = factors.getOrElse(litUnit(f).get,
            throw new IllegalArgumentException(s"$fn: unknown unit ${f.trim}"))
          val tf = factors.getOrElse(litUnit(t).get,
            throw new IllegalArgumentException(s"$fn: unknown unit ${t.trim}"))
          s"(CAST($v AS DOUBLE) * $ff / $tf)"
      }
    }
    // temperature is affine, not linear — through Kelvin
    s = expandCalls(s, "convert_temperature") {
      case Seq(v, f, t) if litUnit(f).isDefined && litUnit(t).isDefined =>
        val toK: Map[String, String => String] = Map(
          "kelvin"     -> (x => x),
          "celsius"    -> (x => s"(($x) + 273.15)"),
          "fahrenheit" -> (x => s"((($x) + 459.67) * 5.0 / 9.0)"))
        val fromK: Map[String, String => String] = Map(
          "kelvin"     -> (k => k),
          "celsius"    -> (k => s"(($k) - 273.15)"),
          "fahrenheit" -> (k => s"(($k) * 9.0 / 5.0 - 459.67)"))
        val ff = toK.getOrElse(litUnit(f).get,
          throw new IllegalArgumentException(s"convert_temperature: unknown unit ${f.trim}"))
        val tf = fromK.getOrElse(litUnit(t).get,
          throw new IllegalArgumentException(s"convert_temperature: unknown unit ${t.trim}"))
        tf(ff(s"CAST($v AS DOUBLE)"))
    }
    // ---- round-12 remaining-surface stragglers (surface_checklist.py) ----
    // around(x, center, delta): closed-interval membership. Works for any
    // type whose +/- Spark supports — numeric directly, datetime with a
    // timespan delta (the bare-timespan literal rewrite below turns 1d
    // into an interval before Spark sees it).
    s = expandCalls(s, "around") {
      case Seq(x, c, d) => s"(($x) >= ($c) - ($d) AND ($x) <= ($c) + ($d))"
    }
    // datetime_part(part, dt): LITERAL part names resolve at rewrite time
    // (unknown parts fail loudly). Sub-second parts follow ADX's
    // full-prefix convention (01:02:03.7654321 → millisecond 765,
    // microsecond 765432); nanosecond is microsecond*1000 — this engine's
    // timestamps carry microsecond precision (documented).
    s = expandCalls(s, "datetime_part") {
      case Seq(p, x) if litUnit(p).isDefined =>
        val ts = s"cast(($x) as timestamp)"
        val us = s"((unix_micros($ts) % 1000000 + 1000000) % 1000000)"
        litUnit(p).get match {
          case "year"         => s"year($ts)"
          case "quarter"      => s"quarter($ts)"
          case "month"        => s"month($ts)"
          case "week_of_year" => s"weekofyear($ts)"
          case "day"          => s"day($ts)"
          case "dayofyear"    => s"dayofyear($ts)"
          case "hour"         => s"hour($ts)"
          case "minute"       => s"minute($ts)"
          case "second"       => s"cast(floor(second($ts)) as int)"
          case "millisecond"  => s"cast(floor($us / 1000) as int)"
          case "microsecond"  => s"cast($us as int)"
          case "nanosecond"   => s"cast($us * 1000 as long)"
          case other => throw new IllegalArgumentException(
            s"datetime_part: unknown part '$other'")
        }
    }
    // estimate_data_size(c1, c2, …): per-column byte estimate summed —
    // strings/dynamics by their serialized length, fixed-width types by
    // width (typeof() is a plan-time constant per column, so the CASE
    // folds). ADX's own estimate is heuristic too; exact per-engine byte
    // counts are not comparable and not the point.
    s = expandCalls(s, "estimate_data_size") {
      case args if args.nonEmpty =>
        def sz(a: String) =
          s"(CASE WHEN ($a) IS NULL THEN 0 " +
            s"WHEN typeof($a) = 'string' THEN octet_length($a) " +
            s"WHEN typeof($a) = 'boolean' THEN 1 " +
            s"WHEN typeof($a) IN ('int', 'float', 'date') THEN 4 " +
            s"WHEN typeof($a) LIKE 'array%' OR typeof($a) LIKE 'map%' " +
            // NOT to_json: Spark type-checks every CASE branch, so to_json
            // on a then-unreachable string arg still fails analysis; the
            // string cast is valid for all types and length-equivalent
            s"OR typeof($a) LIKE 'struct%' THEN octet_length(CAST($a AS STRING)) " +
            s"ELSE 8 END)"
        args.map(sz).mkString("(", " + ", ")")
    }
    // gettype(x): ADX's dynamic runtime-type probe mapped onto this
    // engine's STATIC column types (KQL long/real/bool/datetime/timespan/
    // array/dictionary spellings). Divergence, documented: a dynamic
    // column here is typed at parse time, so gettype reports that static
    // type, not a per-row JSON type.
    s = expandCalls(s, "gettype") {
      case Seq(x) =>
        s"(CASE WHEN ($x) IS NULL THEN 'null' " +
          s"WHEN typeof($x) = 'string' THEN 'string' " +
          s"WHEN typeof($x) = 'bigint' THEN 'long' " +
          s"WHEN typeof($x) IN ('int', 'smallint', 'tinyint') THEN 'int' " +
          s"WHEN typeof($x) IN ('double', 'float') OR typeof($x) LIKE 'decimal%' THEN 'real' " +
          s"WHEN typeof($x) = 'boolean' THEN 'bool' " +
          s"WHEN typeof($x) IN ('timestamp', 'date') THEN 'datetime' " +
          s"WHEN typeof($x) LIKE 'interval%' THEN 'timespan' " +
          s"WHEN typeof($x) LIKE 'array%' THEN 'array' " +
          s"WHEN typeof($x) LIKE 'map%' OR typeof($x) LIKE 'struct%' THEN 'dictionary' " +
          s"ELSE typeof($x) END)"
    }
    // isutf8(s): a JVM string is definitionally encodable as valid UTF-8,
    // so the byte-validity probe ADX runs cannot fail here — true for any
    // non-null string (documented).
    s = expandCalls(s, "isutf8") { case Seq(x) => s"(($x) IS NOT NULL)" }
    // erfc BEFORE erf: its expansion emits erf(…) for the later pass
    s = expandCalls(s, "erfc") { case Seq(x) => s"(1.0 - erf($x))" }
    // erf: Abramowitz–Stegun 7.1.26 (|eps| ≤ 1.5e-7), odd extension;
    // the argument and 1/(1+px) each bind ONCE via the single-element
    // transform trick. Same double arithmetic restated in any SQL twin.
    s = expandCalls(s, "erf") {
      case Seq(x) =>
        s"element_at(transform(array(CAST($x AS DOUBLE)), __ex -> " +
          s"sign(__ex) * element_at(transform(array(1.0 / (1.0 + 0.3275911 * abs(__ex))), " +
          s"__t -> 1.0 - (((((1.061405429 * __t - 1.453152027) * __t) + 1.421413741) * __t " +
          s"- 0.284496736) * __t + 0.254829592) * __t * exp(-(__ex * __ex))), 1)), 1)"
    }
    // series_product: multiplicative fold; a null element nulls the
    // product (the series-family null convention, see series_sum)
    s = expandCalls(s, "series_product") {
      case Seq(x) => s"aggregate($x, CAST(1.0 AS DOUBLE), (acc, v) -> acc * CAST(v AS DOUBLE))"
    }
    // percentile_array_tdigest(sketch, percentiles): map the native
    // percentile_tdigest read over the array (or over listed percentiles)
    s = expandCalls(s, "percentile_array_tdigest") {
      // 2-arg with a NUMERIC literal percentile (the legal single-vararg
      // ADX form) still returns an ARRAY — wrap it; an array/column second
      // arg maps directly
      case Seq(d, p) if p.trim.matches("-?[0-9.]+") =>
        s"transform(array($p), __pp -> percentile_tdigest($d, __pp))"
      case Seq(d, arr) => s"transform($arr, __pp -> percentile_tdigest($d, __pp))"
      case args if args.size > 2 =>
        s"transform(array(${args.tail.mkString(", ")}), " +
          s"__pp -> percentile_tdigest(${args.head}, __pp))"
    }
    // percentrank_tdigest: rank as a FRACTION [0,1] — the native
    // rank_tdigest read (a percentage) scaled down
    s = expandCalls(s, "percentrank_tdigest") {
      case Seq(d, v) => s"(rank_tdigest($d, $v) / 100.0)"
    }
    // geo_angle(p1, p2, p3): spherical angle at p2, measured CLOCKWISE
    // from the ray p2→p1 to the ray p2→p3, in [0, 2π) — pure azimuth
    // arithmetic (geo_azimuth expands later in this pass). Null
    // propagates from either azimuth (coincident or invalid points).
    s = expandCalls(s, "geo_angle") {
      case Seq(x1, y1, x2, y2, x3, y3) =>
        s"pmod(geo_azimuth($x2, $y2, $x3, $y3) - geo_azimuth($x2, $y2, $x1, $y1) " +
          "+ 2.0 * pi(), 2.0 * pi())"
    }
    // url_decode: null on malformed %-sequences (the to*-conversion
    // contract); url_encode is Spark's own (form-encoding, '+' for space,
    // UPPERCASE hex — ADX emits lowercase, a spelling divergence only);
    // the _component form keeps spaces as %20 per RFC 3986.
    s = expandCalls(s, "url_decode") { case Seq(x) => s"try_url_decode($x)" }
    s = expandCalls(s, "url_encode_component") {
      case Seq(x) => s"replace(url_encode($x), '+', '%20')"
    }
    // parse_path: the ADX path-anatomy bag (sorted keys, same determinism
    // convention as the bag algebra). AlternateDataStreamName is always ''
    // (NTFS streams out of scope); both / and \ separate
    s = expandCalls(s, "parse_path") {
      case Seq(x) =>
        // Scala "\\\\\\\\" → SQL-literal \\\\ → regex \\ → one literal
        // backslash; nsep/ndsep are the matching negated classes
        val sep  = "[/\\\\\\\\]"   // regex: / or backslash
        val nsep = "[^/\\\\\\\\]"  // regex: neither / nor backslash
        val ndsep = "[^./\\\\\\\\]" // regex: none of . / backslash
        s"element_at(transform(array(CAST($x AS STRING)), __pp -> to_json(named_struct(" +
          "'AlternateDataStreamName', '', " +
          s"'DirectoryName', regexp_extract(__pp, '($nsep+)$sep$nsep*$$', 1), " +
          s"'DirectoryPath', regexp_extract(__pp, '^(.*)$sep$nsep*$$', 1), " +
          s"'Extension', regexp_extract(__pp, '\\\\.($ndsep*)$$', 1), " +
          s"'Filename', regexp_extract(__pp, '($nsep*)$$', 1), " +
          "'RootPath', regexp_extract(__pp, '^([A-Za-z]:|/)', 1), " +
          "'Scheme', regexp_extract(__pp, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)))), 1)"
    }
    // array_split(arr, i): split at 0-based index i → [arr[0..i), arr[i..)]
    s = expandCalls(s, "array_split") {
      case Seq(a, i) if i.trim.matches("\\d+") =>
        val n = i.trim
        s"element_at(transform(array($a), __as -> array(slice(__as, 1, $n), " +
          s"slice(__as, ($n) + 1, greatest(size(__as) - ($n), 0)))), 1)"
    }
    // n-ary element max/min
    s = expandCalls(s, "max_of") { case xs if xs.size >= 2 => s"greatest(${xs.mkString(", ")})" }
    s = expandCalls(s, "min_of") { case xs if xs.size >= 2 => s"least(${xs.mkString(", ")})" }
    // KQL substring is 0-based (Spark's is 1-based); negative-start and
    // over-length behavior already agree once shifted. Emit Spark's SUBSTR
    // alias, not substring: the emission must not re-match this handler on
    // a second rewrite pass (the fixpoint invariant — RewriteFixpointSpec),
    // or the +1 shift compounds.
    s = expandCalls(s, "substring") {
      case Seq(x, i)      => s"substr($x, ($i) + 1)"
      case Seq(x, i, len) => s"substr($x, ($i) + 1, $len)"
    }
    s = expandCalls(s, "exp2") { case Seq(x) => s"pow(CAST(2 AS DOUBLE), $x)" }
    s = expandCalls(s, "exp10") { case Seq(x) => s"pow(CAST(10 AS DOUBLE), $x)" }
    s = expandCalls(s, "cot") { case Seq(x) => s"(CAST(1 AS DOUBLE) / tan($x))" }
    // totimespan('[d.]hh:mm:ss[.fff]') → a day-time interval (the same
    // currency bare `1h`-style literals become), built by field split;
    // malformed input nulls out field-wise (try_cast), matching ADX's
    // null-on-unparseable contract
    s = expandCalls(s, "totimespan") {
      case Seq(x) =>
        val dh = "split(try_element_at(__tts, 1), '\\\\.')"
        s"element_at(transform(array(split($x, ':')), __tts -> make_dt_interval(" +
          s"CASE WHEN size($dh) = 2 THEN try_cast(try_element_at($dh, 1) AS INT) ELSE 0 END, " +
          s"CASE WHEN size($dh) = 2 THEN try_cast(try_element_at($dh, 2) AS INT) " +
          s"ELSE try_cast(try_element_at(__tts, 1) AS INT) END, " +
          s"coalesce(try_cast(try_element_at(__tts, 2) AS INT), 0), " +
          s"coalesce(try_cast(try_element_at(__tts, 3) AS DOUBLE), CAST(0 AS DOUBLE)))), 1)"
    }
    // parse_json/todynamic: the engine's dynamic currency IS JSON text
    // (bag_pack/pack_all/to_json outputs), so these are identity casts —
    // downstream access goes through extractjson/bag_keys/mv-expand exactly
    // as it would on any other bag
    s = expandCalls(s, "parse_json") { case Seq(x) => s"($x)" }
    s = expandCalls(s, "todynamic") { case Seq(x) => s"($x)" }
    // indexof(text, search [, start]): 0-based, -1 when absent — instr/
    // locate are 1-based/0
    s = expandCalls(s, "indexof") {
      case Seq(x, n)     => s"(instr($x, $n) - 1)"
      case Seq(x, n, st) => s"(locate($n, $x, ($st) + 1) - 1)"
    }
    // array_index_of: 0-based, -1 when absent — array_position is 1-based/0
    s = expandCalls(s, "array_index_of") {
      case Seq(a, v) => s"(array_position($a, $v) - 1)"
    }
    // array_sum: double fold, same shape as series_sum
    s = expandCalls(s, "array_sum") {
      case Seq(x) => s"aggregate($x, CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    }
    // extract_all(regex, text) → regexp_extract_all(text, regex) — KQL's
    // argument order is (pattern, source), Spark's is (source, pattern)
    s = expandCalls(s, "extract_all") {
      case Seq(re, x) => s"regexp_extract_all($x, $re)"
    }
    // extractjson('$.path', text) → get_json_object(text, '$.path'); same
    // (pattern, source) → (source, pattern) swap as extract
    s = expandCalls(s, "extractjson") {
      case Seq(p, x) => s"get_json_object($x, $p)"
    }
    // series_sum/avg over dynamic arrays: left-to-right double fold —
    // deterministic, inlined HOF, no explode
    s = expandCalls(s, "series_sum") {
      case Seq(x) => s"aggregate($x, CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    }
    s = expandCalls(s, "series_avg") {
      case Seq(x) =>
        s"(aggregate($x, CAST(0 AS DOUBLE), (acc, v) -> acc + v) / size($x))"
    }
    // series_dot_product / series_magnitude: double folds over zip_with
    // (length mismatch pads nulls → coalesce 0, where ADX errors)
    def seriesDot(a: String, b: String): String =
      s"aggregate(zip_with($a, $b, (__dx, __dy) -> CAST(__dx AS DOUBLE) * __dy), " +
        "CAST(0 AS DOUBLE), (acc, v) -> acc + coalesce(v, CAST(0 AS DOUBLE)))"
    s = expandCalls(s, "series_dot_product") { case Seq(a, b) => seriesDot(a, b) }
    s = expandCalls(s, "series_magnitude") { case Seq(a) => s"sqrt(${seriesDot(a, a)})" }
    // series_iir(x, b, a): direct-form-I IIR filter —
    //   y[i] = (Σ_j b[j]·x[i−j] − Σ_{k≥1} a[k]·y[i−k]) / a[0]
    // as an indexed fold carrying the produced prefix (y feedback needs
    // history, so this cannot be a stateless transform). b=[1], a=[1,−1]
    // is the classic running-cumsum instance. O(n·(|a|+|b|)) per series.
    s = expandCalls(s, "series_iir") {
      case Seq(x, b, a) =>
        val bterm = "aggregate(sequence(0, size(__sb) - 1), CAST(0 AS DOUBLE), " +
          "(__bs, __bj) -> __bs + (CASE WHEN __si - __bj >= 0 THEN " +
          "element_at(__sb, __bj + 1) * element_at(__sx, __si - __bj + 1) " +
          "ELSE CAST(0 AS DOUBLE) END))"
        val aterm = "(CASE WHEN size(__sa) > 1 THEN " +
          "aggregate(sequence(1, size(__sa) - 1), CAST(0 AS DOUBLE), " +
          "(__as, __ak) -> __as + (CASE WHEN __si - __ak >= 0 THEN " +
          "element_at(__sa, __ak + 1) * element_at(__ys, __si - __ak + 1) " +
          "ELSE CAST(0 AS DOUBLE) END)) ELSE CAST(0 AS DOUBLE) END)"
        // empty-input guard: sequence(0, -1) would step BACKWARDS
        s"element_at(transform(array($x), __sx -> " +
          s"element_at(transform(array($b), __sb -> " +
          s"element_at(transform(array($a), __sa -> " +
          "CASE WHEN size(__sx) = 0 THEN CAST(array() AS ARRAY<DOUBLE>) ELSE " +
          "aggregate(sequence(0, size(__sx) - 1), CAST(array() AS ARRAY<DOUBLE>), " +
          s"(__ys, __si) -> array_append(__ys, ($bterm - $aterm) / element_at(__sa, 1))) " +
          "END), 1)), 1)), 1)"
    }
    // series_fill_forward/backward: null gaps take the last (next) non-null
    // value — an inlined array fold (DOUBLE result lane, like the other
    // series helpers); backward = reverse ∘ forward ∘ reverse
    val ffill = (x: String) =>
      s"aggregate($x, CAST(array() AS ARRAY<DOUBLE>), " +
        "(acc, v) -> array_append(acc, coalesce(CAST(v AS DOUBLE), try_element_at(acc, -1))))"
    s = expandCalls(s, "series_fill_forward") { case Seq(x) => ffill(x) }
    s = expandCalls(s, "series_fill_backward") {
      case Seq(x) => s"reverse(${ffill(s"reverse($x)")})"
    }
    // dynamic([…]) array literal → array(…). Bag literals (dynamic({…}))
    // become JSON STRING literals — the engine's dynamic currency is JSON
    // text (bag_keys/bag_pack/treepath/… all read it), so a bag literal
    // IS its JSON. expandCalls splits the bracket commas at depth 1, so
    // rejoin before unwrapping.
    s = expandCalls(s, "dynamic") {
      case parts if parts.nonEmpty && parts.head.trim.startsWith("[") &&
          parts.last.trim.endsWith("]") =>
        // every [..] group (outer AND nested — dynamic([[1,2],[3,4]]) ring
        // literals) becomes array(..), quote-aware
        // quote-aware for BOTH quote styles: JSON-style dynamic literals
        // may double-quote string elements ("a[b"), and a bracket inside
        // either kind of string must pass through verbatim
        val joined = parts.mkString(",").trim
        val sb   = new StringBuilder
        var inQ  = false
        var inDq = false
        joined.foreach {
          case '\'' if !inDq => inQ = !inQ; sb += '\''
          case '"'  if !inQ  => inDq = !inDq; sb += '"'
          case '[' if !inQ && !inDq => sb ++= "array("
          case ']' if !inQ && !inDq => sb += ')'
          case c => sb += c
        }
        sb.toString
    }
    // ---- series analysis over dynamic arrays --------------------------
    // ADX's series_* analysis family as pure array-HOF rewrites: codegen'd
    // per-row expressions, no explode, no shuffle — a make-series output of
    // G groups stays G rows end to end. Folds run left-to-right (fixed
    // summation order ⇒ deterministic across engines); variance/stdev are
    // SAMPLE (n−1) moments via the closed form (n·Σx² − (Σx)²)/(n(n−1)),
    // clamped at 0 against cancellation. CHEAP sub-expressions may repeat
    // textually; expensive intermediates (sorted copies, trend arrays)
    // must bind through the `let1` single-assignment trick below —
    // interpreted HOF eval recomputes every textual copy per reference.
    val asD   = (x: String) => s"transform($x, v -> CAST(v AS DOUBLE))"
    val foldD = (a: String) => s"aggregate($a, CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    def nOf(x: String)  = s"CAST(size($x) AS DOUBLE)"
    def sumOf(x: String)   = foldD(asD(x))
    def sumSqOf(x: String) =
      s"aggregate(${asD(x)}, CAST(0 AS DOUBLE), (acc, v) -> acc + v * v)"
    def varOf(x: String) = {
      val (n, s1, s2) = (nOf(x), sumOf(x), sumSqOf(x))
      s"(CASE WHEN $n > 1 THEN greatest(($n * $s2 - $s1 * $s1) / ($n * ($n - 1)), CAST(0 AS DOUBLE)) ELSE CAST(0 AS DOUBLE) END)"
    }
    // series_decompose_anomalies(x, period): Tukey-fence scores over the
    // decomposition residual. Runs FIRST in the series pass: it emits
    // `series_outliers((series_decompose(…)).residual)` and the two
    // expansions below (which haven't run yet at this point) do the
    // decomposition and quartile work on the emitted text. Same
    // fixed-period divergence as series_decompose.
    s = expandCalls(s, "series_decompose_anomalies") {
      case Seq(x, pStr) if pStr.trim.matches("\\d+") && pStr.trim.toInt >= 2 =>
        s"series_outliers((series_decompose($x, ${pStr.trim})).residual)"
    }
    // series_stats_dynamic(x): min/max with their first 0-based indices,
    // avg, sample stdev/variance, sum, len — one struct, ADX field names
    s = expandCalls(s, "series_stats_dynamic") {
      case Seq(x) =>
        val xd = asD(x)
        s"named_struct(" +
          s"'min', array_min($xd), " +
          s"'min_idx', CAST(array_position($xd, array_min($xd)) - 1 AS BIGINT), " +
          s"'max', array_max($xd), " +
          s"'max_idx', CAST(array_position($xd, array_max($xd)) - 1 AS BIGINT), " +
          s"'avg', ${sumOf(x)} / ${nOf(x)}, " +
          s"'stdev', sqrt(${varOf(x)}), " +
          s"'variance', ${varOf(x)}, " +
          s"'sum', ${sumOf(x)}, " +
          s"'len', CAST(size($x) AS BIGINT))"
    }
    // series_fit_line_dynamic(x): least-squares line over the implicit axis
    // 0..n−1. Σi and Σi² are closed-form; Σxy is one indexed fold. Struct
    // fields follow ADX (rsquare, slope, variance, rvariance, interception,
    // line_fit); rsquare:=1 on a constant series (the fit is exact there).
    s = expandCalls(s, "series_fit_line_dynamic") {
      case Seq(x) =>
        val xd  = asD(x)
        val n   = nOf(x)
        val sy  = sumOf(x)
        val syy = sumSqOf(x)
        val sx  = s"($n * ($n - 1) / 2)"
        val sxx = s"(($n - 1) * $n * (2 * $n - 1) / 6)"
        val sxy = s"aggregate(sequence(0, size($x) - 1), CAST(0 AS DOUBLE), " +
          s"(acc, i) -> acc + element_at($xd, i + 1) * CAST(i AS DOUBLE))"
        val slope =
          s"(CASE WHEN $n > 1 THEN ($n * $sxy - $sx * $sy) / ($n * $sxx - $sx * $sx) ELSE CAST(0 AS DOUBLE) END)"
        val icept = s"(($sy - $slope * $sx) / $n)"
        val ssres = s"aggregate(sequence(0, size($x) - 1), CAST(0 AS DOUBLE), " +
          s"(acc, i) -> acc + pow(element_at($xd, i + 1) - ($icept + $slope * CAST(i AS DOUBLE)), 2))"
        val sstot = s"($syy - $sy * $sy / $n)"
        s"named_struct(" +
          s"'rsquare', (CASE WHEN $sstot > 0 THEN 1 - $ssres / $sstot ELSE CAST(1 AS DOUBLE) END), " +
          s"'slope', $slope, " +
          s"'variance', (CASE WHEN $n > 1 THEN $sstot / ($n - 1) ELSE CAST(0 AS DOUBLE) END), " +
          s"'rvariance', (CASE WHEN $n > 1 THEN $ssres / ($n - 1) ELSE CAST(0 AS DOUBLE) END), " +
          s"'interception', $icept, " +
          s"'line_fit', transform(sequence(0, size($x) - 1), i -> $icept + $slope * CAST(i AS DOUBLE)))"
    }
    // series_outliers(x): Tukey-fence anomaly score per point. Quartiles are
    // type-7 linear interpolation over the sorted copy ((n−1)·p index — the
    // same convention as DuckDB quantile_cont, so oracles can restate the
    // identical arithmetic); score = (x−q75)/iqr above, (x−q25)/iqr below,
    // 0 inside or when iqr = 0.
    def q7(sorted: String, n: String, p: String) = {
      val idx = s"(($n - 1) * $p)"
      val lo  = s"CAST(floor($idx) AS INT)"
      val vlo = s"element_at($sorted, $lo + 1)"
      val vhi = s"coalesce(try_element_at($sorted, $lo + 2), $vlo)"
      s"($vlo + ($idx - floor($idx)) * ($vhi - $vlo))"
    }
    // Single-assignment trick used here and in series_decompose: SQL scalar
    // text has no `let`, so binding an expensive intermediate means wrapping
    // it in a ONE-element array and a `transform` lambda — every later
    // reference is then a lambda-variable lookup (O(1)), not a textual copy
    // that interpreted HOF eval would recompute. Without this, composing
    // series fns (series_decompose_anomalies = outliers ∘ decompose)
    // multiplies whole subtrees per element and per reference — measured
    // MINUTES per row on a 30-point series; with it the cost is the
    // plain O(n·p) of the math.
    def let1(v: String, bound: String, body: String): String =
      s"element_at(transform(array($bound), $v -> $body), 1)"
    s = expandCalls(s, "series_outliers") {
      case Seq(x) =>
        val q25 = q7("__so_s", "CAST(size(__so_x) AS DOUBLE)", "0.25")
        val q75 = q7("__so_s", "CAST(size(__so_x) AS DOUBLE)", "0.75")
        let1("__so_x", asD(x),
          let1("__so_s", "array_sort(__so_x)",
            let1("__so_q", s"named_struct('q25', $q25, 'q75', $q75)",
              "transform(__so_x, v -> CASE " +
                "WHEN (__so_q.q75 - __so_q.q25) <= 0 THEN CAST(0 AS DOUBLE) " +
                "WHEN v > __so_q.q75 THEN (v - __so_q.q75) / (__so_q.q75 - __so_q.q25) " +
                "WHEN v < __so_q.q25 THEN (v - __so_q.q25) / (__so_q.q75 - __so_q.q25) " +
                "ELSE CAST(0 AS DOUBLE) END)")))
    }
    // series_fir(x, filter[, normalize[, center]]): finite-impulse-response
    // moving window — y[i] = Σⱼ w[j]·x[i−j+c] over in-range samples, edges
    // renormalized by the weight mass actually used (normalize=true, the
    // default) so a [1,1,1] filter is a clean moving average. normalize and
    // center must be literal true/false (resolved at rewrite time).
    s = expandCalls(s, "series_fir") {
      case x +: w +: opts if opts.size <= 2 &&
          opts.forall(o => Set("true", "false")(o.trim.toLowerCase)) =>
        val normalize = opts.headOption.forall(_.trim.equalsIgnoreCase("true"))
        val center    = opts.lift(1).exists(_.trim.equalsIgnoreCase("true"))
        val xd  = asD(x)
        val wd  = asD(w)
        val c   = if (center) s"(size($w) div 2)" else "0"
        // Spark's try_element_at still throws on index 0 (INVALID_INDEX_OF_ZERO)
        // — guard the left edge explicitly
        val at  = s"(CASE WHEN i - j + $c >= 0 THEN " +
          s"try_element_at($xd, CAST(i - j + $c + 1 AS INT)) END)"
        val num = s"aggregate(sequence(0, size($w) - 1), CAST(0 AS DOUBLE), " +
          s"(acc, j) -> acc + coalesce(element_at($wd, j + 1) * $at, CAST(0 AS DOUBLE)))"
        val den =
          if (!normalize) "CAST(1 AS DOUBLE)"
          else s"aggregate(sequence(0, size($w) - 1), CAST(0 AS DOUBLE), " +
            s"(acc, j) -> acc + CASE WHEN $at IS NOT NULL THEN element_at($wd, j + 1) ELSE CAST(0 AS DOUBLE) END)"
        s"transform(sequence(0, size($x) - 1), i -> $num / $den)"
    }
    // series_decompose(x, period): CLASSICAL additive decomposition with a
    // FIXED literal period (documented divergence from ADX's
    // period-autodetecting plugin): trend = centered width-`period` moving
    // average with renormalized edges (the series_fir shape); seasonal =
    // per-phase mean of the detrended series; baseline = trend + seasonal;
    // residual = x − baseline. Pure array HOFs — but sub-expressions repeat
    // TEXTUALLY (no scalar `let` in SQL), so per-row cost grows ~O(n²·p) on
    // an n-point series: built for grid-sized series (make-series output,
    // 10²–10³ points), not raw-event arrays.
    s = expandCalls(s, "series_decompose") {
      case Seq(x, pStr) if pStr.trim.matches("\\d+") && pStr.trim.toInt >= 2 =>
        val p  = pStr.trim.toInt
        val c  = p / 2
        // every intermediate binds ONCE through let1 — a reference to
        // __sd_x/__sd_t/__sd_d/__sd_p is an O(1) variable lookup, so the
        // whole decomposition is the plain O(n·p) of the math
        val at = s"(CASE WHEN i - j + $c >= 0 THEN " +
          s"try_element_at(__sd_x, CAST(i - j + $c + 1 AS INT)) END)"
        val num = s"aggregate(sequence(0, ${p - 1}), CAST(0 AS DOUBLE), " +
          s"(acc, j) -> acc + coalesce($at, CAST(0 AS DOUBLE)))"
        val den = s"aggregate(sequence(0, ${p - 1}), CAST(0 AS DOUBLE), " +
          s"(acc, j) -> acc + (CASE WHEN $at IS NOT NULL THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END))"
        val trend = s"transform(sequence(0, size(__sd_x) - 1), i -> $num / $den)"
        // p phase means of the detrended series: one tiny p-length array;
        // the fold carries (sum, count) and finishes with the mean
        val pm = s"transform(sequence(0, ${p - 1}), ph -> " +
          s"aggregate(sequence(0, size(__sd_x) - 1), " +
          s"named_struct('s', CAST(0 AS DOUBLE), 'c', CAST(0 AS DOUBLE)), " +
          s"(acc2, k) -> IF(k % $p = ph, " +
          s"named_struct('s', acc2.s + element_at(__sd_d, k + 1), 'c', acc2.c + 1), acc2), " +
          s"fin -> fin.s / fin.c))"
        val seasonal = s"transform(sequence(0, size(__sd_x) - 1), m -> " +
          s"element_at(__sd_p, CAST(m % $p + 1 AS INT)))"
        let1("__sd_x", asD(x),
          let1("__sd_t", trend,
            let1("__sd_d", "zip_with(__sd_x, __sd_t, (a, b) -> a - b)",
              let1("__sd_p", pm,
                let1("__sd_b", s"zip_with(__sd_t, $seasonal, (a, b) -> a + b)",
                  s"named_struct('baseline', __sd_b, 'seasonal', $seasonal, " +
                    "'trend', __sd_t, " +
                    "'residual', zip_with(__sd_x, __sd_b, (a, b) -> a - b))")))))
    }
    // series_seasonal(x, period): the seasonal component ALONE — per-phase
    // means of the RAW series repeated along it (ADX's fixed-period form;
    // the autodetecting no-period overload is not parsed, same
    // literal-period contract as series_decompose). The (sum, count) fold
    // runs in index order, so the result restates exactly in SQL engines.
    s = expandCalls(s, "series_seasonal") {
      case Seq(x, pStr) if pStr.trim.matches("\\d+") && pStr.trim.toInt >= 1 =>
        val p = pStr.trim.toInt
        val pm = s"transform(sequence(0, ${p - 1}), ph -> " +
          s"aggregate(sequence(0, size(__ss_x) - 1), " +
          s"named_struct('s', CAST(0 AS DOUBLE), 'c', CAST(0 AS DOUBLE)), " +
          s"(acc2, k) -> IF(k % $p = ph, " +
          s"named_struct('s', acc2.s + element_at(__ss_x, k + 1), 'c', acc2.c + 1), acc2), " +
          s"fin -> fin.s / fin.c))"
        let1("__ss_x", asD(x),
          let1("__ss_p", pm,
            s"transform(sequence(0, size(__ss_x) - 1), m -> " +
              s"element_at(__ss_p, CAST(m % $p + 1 AS INT)))"))
    }
    // series_decompose_forecast(x, points, period): decompose-shaped
    // baseline extended `points` steps — centered-MA trend and phase-mean
    // seasonal exactly as series_decompose, a least-squares line over the
    // DESEASONALIZED history for extrapolation, forecast[i] = line(i) +
    // seasonal[i mod p] over n+points indexes. Same fixed-period-literal
    // contract (and documented divergence) as series_decompose.
    s = expandCalls(s, "series_decompose_forecast") {
      case Seq(x, ptsStr, pStr) if ptsStr.trim.matches("\\d+") &&
          pStr.trim.matches("\\d+") && pStr.trim.toInt >= 2 =>
        val pts = ptsStr.trim.toInt
        val p   = pStr.trim.toInt
        val c   = p / 2
        val at = s"(CASE WHEN i - j + $c >= 0 THEN " +
          s"try_element_at(__fc_x, CAST(i - j + $c + 1 AS INT)) END)"
        val num = s"aggregate(sequence(0, ${p - 1}), CAST(0 AS DOUBLE), " +
          s"(acc, j) -> acc + coalesce($at, CAST(0 AS DOUBLE)))"
        val den = s"aggregate(sequence(0, ${p - 1}), CAST(0 AS DOUBLE), " +
          s"(acc, j) -> acc + (CASE WHEN $at IS NOT NULL THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END))"
        val trend = s"transform(sequence(0, size(__fc_x) - 1), i -> $num / $den)"
        val pm = s"transform(sequence(0, ${p - 1}), ph -> " +
          s"aggregate(sequence(0, size(__fc_x) - 1), " +
          s"named_struct('s', CAST(0 AS DOUBLE), 'c', CAST(0 AS DOUBLE)), " +
          s"(acc2, k) -> IF(k % $p = ph, " +
          s"named_struct('s', acc2.s + element_at(__fc_d, k + 1), 'c', acc2.c + 1), acc2), " +
          s"fin -> fin.s / fin.c))"
        val dese = s"transform(sequence(0, size(__fc_x) - 1), i -> " +
          s"element_at(__fc_x, i + 1) - element_at(__fc_p, CAST(i % $p + 1 AS INT)))"
        val stats = s"aggregate(sequence(0, size(__fc_x) - 1), " +
          "named_struct('si', CAST(0 AS DOUBLE), 'sii', CAST(0 AS DOUBLE), " +
          "'sy', CAST(0 AS DOUBLE), 'siy', CAST(0 AS DOUBLE)), " +
          "(a, i) -> named_struct('si', a.si + i, 'sii', a.sii + CAST(i AS DOUBLE) * i, " +
          "'sy', a.sy + element_at(__fc_y, i + 1), " +
          "'siy', a.siy + CAST(i AS DOUBLE) * element_at(__fc_y, i + 1)))"
        val slope = "((CAST(size(__fc_x) AS DOUBLE) * __fc_s.siy - __fc_s.si * __fc_s.sy) / " +
          "(CAST(size(__fc_x) AS DOUBLE) * __fc_s.sii - __fc_s.si * __fc_s.si))"
        val icept = "((__fc_s.sy - __fc_b * __fc_s.si) / CAST(size(__fc_x) AS DOUBLE))"
        val out = s"transform(sequence(0, size(__fc_x) - 1 + $pts), i -> " +
          s"__fc_i + __fc_b * i + element_at(__fc_p, CAST(i % $p + 1 AS INT)))"
        let1("__fc_x", asD(x),
          let1("__fc_t", trend,
            let1("__fc_d", "zip_with(__fc_x, __fc_t, (a, b) -> a - b)",
              let1("__fc_p", pm,
                let1("__fc_y", dese,
                  let1("__fc_s", stats,
                    let1("__fc_b", slope,
                      let1("__fc_i", icept, out))))))))
    }
    // series_pearson_correlation(x, y): closed-form Pearson r from six
    // left-to-right folds; 0 when either side is constant (ADX yields NaN —
    // divergence chosen so the value stays comparable/sortable)
    s = expandCalls(s, "series_pearson_correlation") {
      case Seq(x, y) =>
        val n = nOf(x)
        val (sx, sy)   = (sumOf(x), sumOf(y))
        val (sxx, syy) = (sumSqOf(x), sumSqOf(y))
        val sxy = s"aggregate(zip_with(${asD(x)}, ${asD(y)}, (a, b) -> a * b), " +
          "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        val dx = s"($n * $sxx - $sx * $sx)"
        val dy = s"($n * $syy - $sy * $sy)"
        s"(CASE WHEN $dx > 0 AND $dy > 0 THEN ($n * $sxy - $sx * $sy) / (sqrt($dx) * sqrt($dy)) ELSE CAST(0 AS DOUBLE) END)"
    }
    // float-classification scalars (isnan passes through natively)
    s = expandCalls(s, "isinf") {
      case Seq(x) =>
        s"(($x) = CAST('Infinity' AS DOUBLE) OR ($x) = CAST('-Infinity' AS DOUBLE))"
    }
    s = expandCalls(s, "isfinite") {
      case Seq(x) =>
        s"(NOT isnan($x) AND ($x) <> CAST('Infinity' AS DOUBLE) " +
          s"AND ($x) <> CAST('-Infinity' AS DOUBLE))"
    }
    // series_cosine_similarity(x, y): Σxy / (√Σx² · √Σy²) from three
    // left-to-right folds; 0 when either side has zero norm (divergence
    // from ADX's NaN, keeping the value sortable — the pearson convention)
    s = expandCalls(s, "series_cosine_similarity") {
      case Seq(x, y) =>
        val sxy = s"aggregate(zip_with(${asD(x)}, ${asD(y)}, (a, b) -> a * b), " +
          "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        s"(CASE WHEN ${sumSqOf(x)} > 0 AND ${sumSqOf(y)} > 0 THEN " +
          s"$sxy / (sqrt(${sumSqOf(x)}) * sqrt(${sumSqOf(y)})) ELSE CAST(0 AS DOUBLE) END)"
    }
    // parse_url(u): typed struct with ADX's member names, built on Spark's
    // native parse_url extraction. Divergences (documented): Query is the
    // RAW query string (ADX explodes it into a "Query Parameters" bag) and
    // Port comes from a userinfo-tolerant regex (a password containing ':'
    // would defeat it); Username/Password members are not surfaced.
    // parse_urlquery(u): the ADX query-parameter bag —
    // {"Query Parameters": {k: v, …}} in the engine's sorted-key bag
    // currency. Parameters fold through bag_merge (earlier occurrence of a
    // duplicate key wins — documented; ADX leaves the case unspecified);
    // keys/values percent-decode, with malformed escapes passing through
    // verbatim (try_url_decode null → raw). Expands BEFORE parse_url so
    // the emitted 2-arg Spark-native parse_url survives (1-arg ADX form
    // only is rewritten below).
    s = expandCalls(s, "parse_urlquery") {
      case Seq(u) =>
        val dec = (x: String) => s"coalesce(try_url_decode($x), $x)"
        // a URL with no query string yields NULL from the extractor — ADX
        // returns the empty bag, so coalesce before splitting
        val pairs = s"filter(split(coalesce(parse_url($u, 'QUERY'), ''), '&'), p -> p != '')"
        // value = everything after the FIRST '=' (URL semantics: 'a=b=c'
        // → value 'b=c'; element 2 of the split would truncate at 'b')
        val value = "coalesce(array_join(slice(split(p, '='), 2, size(split(p, '='))), '='), '')"
        s"concat('{\"Query Parameters\":', aggregate($pairs, '{}', (acc, p) -> " +
          s"bag_merge(acc, to_json(map(${dec("split(p, '=')[0]")}, " +
          s"${dec(value)})))), '}')"
    }
    s = expandCalls(s, "parse_url") {
      case Seq(u) =>
        s"named_struct(" +
          s"'Scheme', parse_url($u, 'PROTOCOL'), " +
          s"'Host', parse_url($u, 'HOST'), " +
          s"'Port', regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/:]+:([0-9]+)', 1), " +
          s"'Path', parse_url($u, 'PATH'), " +
          s"'Query', parse_url($u, 'QUERY'), " +
          s"'Fragment', parse_url($u, 'REF'))"
    }
    // parse_version(v): up-to-4 dotted numeric parts folded into ONE
    // comparable double — part i weighs 10^(8·(3−i)), missing/non-numeric
    // parts count 0, so '1.2' == '1.2.0.0' and ordering is component-wise
    s = expandCalls(s, "parse_version") {
      case Seq(v) =>
        s"aggregate(sequence(0, 3), CAST(0 AS DOUBLE), (acc, i) -> acc + " +
          s"coalesce(try_cast(try_element_at(split($v, '\\\\.'), i + 1) AS DOUBLE), " +
          s"CAST(0 AS DOUBLE)) * pow(10, 8 * (3 - i)))"
    }
    // translate(searchList, replaceList, text): ADX argument order →
    // Spark's translate(text, from, to). Emitted UPPERCASE: Spark resolves
    // function names case-insensitively, but this handler matches
    // case-sensitively — a second rewrite pass must not permute the
    // already-permuted arguments again (the fixpoint invariant).
    s = expandCalls(s, "translate") {
      case Seq(from, to, t) => s"TRANSLATE($t, $from, $to)"
    }
    // replace_strings(text, lookups, rewrites): sequential plain-text
    // replacements — a left fold over the zipped pair arrays, so later
    // rules see earlier rules' output (the ADX contract)
    s = expandCalls(s, "replace_strings") {
      case Seq(t, lookups, rewrites) =>
        s"aggregate(zip_with($lookups, $rewrites, (l, r) -> named_struct('l', l, 'r', r)), " +
          s"CAST(($t) AS STRING), (acc, p) -> replace(acc, p.l, p.r))"
    }
    // trim_start/trim_end(regex, text): strip ONE anchored match
    s = expandCalls(s, "trim_start") {
      case Seq(re, t) => s"regexp_replace($t, concat('^(?:', $re, ')'), '')"
    }
    s = expandCalls(s, "trim_end") {
      case Seq(re, t) => s"regexp_replace($t, concat('(?:', $re, ')$$'), '')"
    }
    // trim(regex, text): one anchored strip at EACH end — the 2-arg ADX
    // form only (Spark's native 1-arg trim passes through: expandCalls
    // skips non-matching arities)
    s = expandCalls(s, "trim") {
      case Seq(re, t) =>
        s"regexp_replace(regexp_replace($t, concat('^(?:', $re, ')'), ''), " +
          s"concat('(?:', $re, ')$$'), '')"
    }
    s = expandCalls(s, "isascii") {
      case Seq(t) => s"(($t) RLIKE '^[\\\\x00-\\\\x7F]*$$')"
    }
    // indexof_regex(text, regex): 0-based position of the first match,
    // −1 when none (regexp_instr is 1-based with 0-for-miss — shift aligns
    // both cases at once)
    s = expandCalls(s, "indexof_regex") {
      case Seq(t, re) => s"CAST(regexp_instr($t, $re) - 1 AS BIGINT)"
    }
    // regex_quote(t): backslash-escape every regex metacharacter
    s = expandCalls(s, "regex_quote") {
      case Seq(t) =>
        s"regexp_replace($t, '([.^$$|?*+()\\\\[\\\\]{}\\\\\\\\])', '\\\\\\\\$$1')"
    }
    // endofweek(t): the Sunday-start week's last representable instant —
    // expands BEFORE startofweek so the emitted call is picked up (the
    // in_circle pattern); µs resolution, the endofday discipline
    s = expandCalls(s, "endofweek") {
      case Seq(t) =>
        s"(startofweek($t) + interval '7' day - interval '1' microsecond)"
    }
    // startofweek(t): ADX weeks start SUNDAY. Spelled via Spark's weekday
    // (Monday=0) — NOT dayofweek, which the KQL rewrite above already owns
    // (ADX dayofweek is a timespan) and would re-rewrite here.
    s = expandCalls(s, "startofweek") {
      case Seq(t) =>
        s"CAST(date_sub(CAST(($t) AS DATE), pmod(weekday($t) + 1, 7)) AS TIMESTAMP)"
    }
    // array_iif(cond, then, else): element-wise conditional over dynamics —
    // result length = |cond|, numeric/boolean conditions (nonzero = true,
    // null = false), missing then/else elements yield null (ADX contract)
    s = expandCalls(s, "array_iif") {
      case Seq(c, t, e) =>
        s"transform(sequence(1, size($c)), __ai -> " +
          s"if(coalesce(try_cast(try_element_at($c, __ai) as boolean), false), " +
          s"try_element_at($t, __ai), try_element_at($e, __ai)))"
    }
    // beta_pdf(x, a, b) = x^(a-1)(1-x)^(b-1) · Γ(a+b)/(Γ(a)Γ(b)) — the
    // beta_cdf sibling, via the native gamma (DuckDB's gamma recomputes
    // the Lanczos numerics; callers round)
    s = expandCalls(s, "beta_pdf") {
      case Seq(x, a, b) =>
        s"(pow($x, ($a) - 1) * pow(1 - ($x), ($b) - 1) * " +
          s"gamma(($a) + ($b)) / (gamma($a) * gamma($b)))"
    }
    // series_fill_const(x, c): nulls → the literal constant
    s = expandCalls(s, "series_fill_const") {
      case Seq(x, c) =>
        s"transform(${asD(x)}, v -> coalesce(v, CAST($c AS DOUBLE)))"
    }
    // series_fill_forward(x): each null takes the LAST non-null at or
    // before it (leading nulls stay null). Per-element backward scan —
    // O(n²) on an n-point series, grid-sized by design like the other
    // series fns; __sff_x binds once via let1.
    s = expandCalls(s, "series_fill_forward") {
      case Seq(x) =>
        let1("__sff_x", asD(x),
          "transform(sequence(0, size(__sff_x) - 1), i -> " +
            "aggregate(sequence(0, i), CAST(NULL AS DOUBLE), " +
            "(acc, j) -> coalesce(element_at(__sff_x, j + 1), acc)))")
    }
    // series_fill_backward(x): each null takes the FIRST non-null after it
    // (trailing nulls stay null)
    s = expandCalls(s, "series_fill_backward") {
      case Seq(x) =>
        let1("__sfb_x", asD(x),
          "transform(sequence(0, size(__sfb_x) - 1), i -> " +
            "aggregate(sequence(i, size(__sfb_x) - 1), CAST(NULL AS DOUBLE), " +
            "(acc, j) -> coalesce(acc, element_at(__sfb_x, j + 1))))")
    }
    // series_fill_linear(x): interior nulls interpolate linearly between
    // the nearest non-null neighbors — p + (q − p)·(i − pi)/(qi − pi), the
    // exact spelling oracles restate — and edge nulls take the nearest
    // non-null (ADX's default edge behavior). The neighbor indices bind
    // per element through the one-element-array let trick.
    s = expandCalls(s, "series_fill_linear") {
      case Seq(x) =>
        val pIdx = "aggregate(sequence(0, i), CAST(NULL AS INT), " +
          "(acc, j) -> IF(element_at(__sfl_x, j + 1) IS NOT NULL, j, acc))"
        val qIdx = "aggregate(sequence(i, size(__sfl_x) - 1), CAST(NULL AS INT), " +
          "(acc, j) -> coalesce(acc, IF(element_at(__sfl_x, j + 1) IS NOT NULL, j, CAST(NULL AS INT))))"
        let1("__sfl_x", asD(x),
          "transform(sequence(0, size(__sfl_x) - 1), i -> " +
            s"element_at(transform(array(named_struct('p', $pIdx, 'q', $qIdx)), w -> " +
            "CASE WHEN element_at(__sfl_x, i + 1) IS NOT NULL THEN element_at(__sfl_x, i + 1) " +
            "WHEN w.p IS NULL AND w.q IS NULL THEN CAST(NULL AS DOUBLE) " +
            "WHEN w.p IS NULL THEN element_at(__sfl_x, w.q + 1) " +
            "WHEN w.q IS NULL THEN element_at(__sfl_x, w.p + 1) " +
            "ELSE element_at(__sfl_x, w.p + 1) + " +
            "(element_at(__sfl_x, w.q + 1) - element_at(__sfl_x, w.p + 1)) * " +
            "CAST(i - w.p AS DOUBLE) / CAST(w.q - w.p AS DOUBLE) END), 1))")
    }
    // element-wise series arithmetic: zip_with lanes (null where either
    // side is null, matching ADX); scalar folds for sum/avg
    s = expandCalls(s, "series_add") {
      case Seq(x, y) => s"zip_with(${asD(x)}, ${asD(y)}, (a, b) -> a + b)"
    }
    s = expandCalls(s, "series_subtract") {
      case Seq(x, y) => s"zip_with(${asD(x)}, ${asD(y)}, (a, b) -> a - b)"
    }
    s = expandCalls(s, "series_multiply") {
      case Seq(x, y) => s"zip_with(${asD(x)}, ${asD(y)}, (a, b) -> a * b)"
    }
    s = expandCalls(s, "series_divide") {
      case Seq(x, y) => s"zip_with(${asD(x)}, ${asD(y)}, (a, b) -> a / b)"
    }
    s = expandCalls(s, "series_pow") {
      case Seq(x, y) => s"zip_with(${asD(x)}, ${asD(y)}, (a, b) -> pow(a, b))"
    }
    // element-wise comparisons: dynamic arrays of booleans, null where
    // either side is null (the ADX contract)
    s = expandCalls(s, "series_equals") {
      case Seq(x, y) => s"zip_with(${asD(x)}, ${asD(y)}, (a, b) -> a = b)"
    }
    s = expandCalls(s, "series_not_equals") {
      case Seq(x, y) => s"zip_with(${asD(x)}, ${asD(y)}, (a, b) -> a != b)"
    }
    s = expandCalls(s, "series_greater") {
      case Seq(x, y) => s"zip_with(${asD(x)}, ${asD(y)}, (a, b) -> a > b)"
    }
    s = expandCalls(s, "series_greater_equals") {
      case Seq(x, y) => s"zip_with(${asD(x)}, ${asD(y)}, (a, b) -> a >= b)"
    }
    s = expandCalls(s, "series_less") {
      case Seq(x, y) => s"zip_with(${asD(x)}, ${asD(y)}, (a, b) -> a < b)"
    }
    s = expandCalls(s, "series_less_equals") {
      case Seq(x, y) => s"zip_with(${asD(x)}, ${asD(y)}, (a, b) -> a <= b)"
    }
    s = expandCalls(s, "series_floor") {
      case Seq(x) => s"transform(${asD(x)}, v -> CAST(floor(v) AS DOUBLE))"
    }
    s = expandCalls(s, "series_ceiling") {
      case Seq(x) => s"transform(${asD(x)}, v -> CAST(ceiling(v) AS DOUBLE))"
    }
    s = expandCalls(s, "series_abs") {
      case Seq(x) => s"transform(${asD(x)}, v -> abs(v))"
    }
    s = expandCalls(s, "series_exp") {
      case Seq(x) => s"transform(${asD(x)}, v -> exp(v))"
    }
    // element-wise trig family — ADX's remaining series_* scalars;
    // asin/acos outside [-1,1] yield NaN (libm convention; ADX nulls —
    // test with isnan(), documented divergence)
    // repeat(value, count): dynamic array of `count` copies (negative →
    // empty, the array_repeat convention; ADX errors — documented)
    s = expandCalls(s, "repeat") {
      case Seq(v, n) => s"array_repeat($v, CAST($n AS INT))"
    }
    // SCALAR range(start, stop [, step]) — the dynamic-array form (the
    // `range` OPERATOR is a pipeline source, handled upstream; expandCalls
    // only matches `range(`). Stop is inclusive like ADX; real steps
    // supported via index arithmetic; step 0 / wrong-signed step → NULL.
    s = expandCalls(s, "range") {
      case Seq(a, b) =>
        s"(CASE WHEN ($b) < ($a) THEN NULL ELSE " +
          s"transform(sequence(CAST(0 AS BIGINT), CAST(floor(($b) - ($a)) AS BIGINT)), " +
          s"__ri -> ($a) + __ri) END)"
      case Seq(a, b, c) =>
        s"(CASE WHEN ($c) = 0 OR (($b) - ($a)) / ($c) < 0 THEN NULL ELSE " +
          s"transform(sequence(CAST(0 AS BIGINT), CAST(floor((($b) - ($a)) / ($c)) AS BIGINT)), " +
          s"__ri -> ($a) + __ri * ($c)) END)"
    }
    // strrep(value, multiplier): string repetition. NOT emitted as Spark
    // `repeat(` — rewrite() re-runs expansions to a fixpoint, so the KQL
    // `repeat` expansion above would array-ify it on the next pass (the
    // round-10 substring trap).
    s = expandCalls(s, "strrep") {
      case Seq(v, n) => s"array_join(array_repeat($v, CAST($n AS INT)), '')"
    }
    s = expandCalls(s, "series_sin")  { case Seq(x) => s"transform(${asD(x)}, v -> sin(v))" }
    s = expandCalls(s, "series_cos")  { case Seq(x) => s"transform(${asD(x)}, v -> cos(v))" }
    s = expandCalls(s, "series_tan")  { case Seq(x) => s"transform(${asD(x)}, v -> tan(v))" }
    s = expandCalls(s, "series_asin") { case Seq(x) => s"transform(${asD(x)}, v -> asin(v))" }
    s = expandCalls(s, "series_acos") { case Seq(x) => s"transform(${asD(x)}, v -> acos(v))" }
    s = expandCalls(s, "series_atan") { case Seq(x) => s"transform(${asD(x)}, v -> atan(v))" }
    s = expandCalls(s, "series_log") {
      case Seq(x) => s"transform(${asD(x)}, v -> ln(v))"
    }
    s = expandCalls(s, "series_sign") {
      case Seq(x) => s"transform(${asD(x)}, v -> CAST(sign(v) AS DOUBLE))"
    }
    s = expandCalls(s, "series_sum") {
      case Seq(x) => sumOf(x)
    }
    s = expandCalls(s, "series_avg") {
      case Seq(x) => s"(${sumOf(x)} / ${nOf(x)})"
    }
    // series_periods_detect(x, min_period, max_period, num_periods):
    // top-k candidate periods by NORMALIZED AUTOCORRELATION (divergence
    // from ADX's FFT-based detector, same contract: two arrays, best
    // first). r(L) = Σ c[i]·c[i+L] / Σ c[i]² over the mean-centered
    // series; candidates sort as [-score, lag] pairs — lexicographic
    // array order IS (score desc, lag asc) on both engines. All
    // intermediates let1-bound; cost O(n·(max−min)).
    s = expandCalls(s, "series_periods_detect") {
      case Seq(x, minP, maxP, k) =>
        val num = s"aggregate(sequence(1, size(__spd_c) - __pl), CAST(0 AS DOUBLE), " +
          "(acc, i) -> acc + element_at(__spd_c, i) * element_at(__spd_c, i + __pl))"
        val pairs = s"transform(sequence($minP, $maxP), __pl -> array(" +
          s"-(CASE WHEN __spd_d > 0 AND size(__spd_c) - __pl >= 1 THEN $num / __spd_d " +
          "ELSE CAST(0 AS DOUBLE) END), CAST(__pl AS DOUBLE)))"
        let1("__spd_x", asD(x),
          let1("__spd_m", s"${foldD("__spd_x")} / size(__spd_x)",
            let1("__spd_c", "transform(__spd_x, v -> v - __spd_m)",
              let1("__spd_d",
                "aggregate(__spd_c, CAST(0 AS DOUBLE), (acc, v) -> acc + v * v)",
                let1("__spd_t", s"slice(array_sort($pairs), 1, $k)",
                  "named_struct(" +
                    "'periods', transform(__spd_t, __pp -> element_at(__pp, 2)), " +
                    "'scores', transform(__spd_t, __pp -> round(-element_at(__pp, 1), 6)))")))))
    }
    // series_periods_validate(x, period1, …): the detector's dual — score
    // the GIVEN candidate periods with the SAME normalized-autocorrelation
    // read as series_periods_detect (same divergence note: ADX scores via
    // its FFT detector), input order preserved. Out-of-range or
    // non-positive periods score 0, matching the detector's guard.
    s = expandCalls(s, "series_periods_validate") {
      case args if args.size >= 2 =>
        val num = s"aggregate(sequence(1, size(__spv_c) - __pl), CAST(0 AS DOUBLE), " +
          "(acc, i) -> acc + element_at(__spv_c, i) * element_at(__spv_c, i + __pl))"
        val score = s"element_at(transform(array(CAST(__pld AS INT)), __pl -> " +
          s"round(CASE WHEN __spv_d > 0 AND __pl >= 1 AND size(__spv_c) - __pl >= 1 " +
          s"THEN $num / __spv_d ELSE CAST(0 AS DOUBLE) END, 6)), 1)"
        val periods = args.tail.map(p => s"CAST($p AS DOUBLE)")
          .mkString("array(", ", ", ")")
        let1("__spv_x", asD(args.head),
          let1("__spv_m", s"${foldD("__spv_x")} / size(__spv_x)",
            let1("__spv_c", "transform(__spv_x, v -> v - __spv_m)",
              let1("__spv_d",
                "aggregate(__spv_c, CAST(0 AS DOUBLE), (acc, v) -> acc + v * v)",
                let1("__spv_p", periods,
                  "named_struct('periods', __spv_p, " +
                    s"'scores', transform(__spv_p, __pld -> $score))")))))
    }
    // series_fit_2lines_dynamic(x): best two-segment linear fit — for every
    // split s (2..n−2), closed-form least squares on [0,s) and [s,n) from
    // six per-segment folds (Σx/Σx² are index closed forms; Σy/Σxy/Σy² are
    // O(len) folds → O(n²) per row, grid-sized series by design).
    // Candidates encode as [rss, s, αL, βL, αR, βR] arrays; lexicographic
    // array_sort puts (rss asc, split asc) first on both engines. All
    // intermediates let1-bound.
    s = expandCalls(s, "series_fit_2lines_dynamic") {
      case Seq(x) =>
        def sy(a: String, b: String)  =
          s"aggregate(sequence($a, ($b) - 1), CAST(0 AS DOUBLE), (acc, i) -> acc + element_at(__f2_x, i + 1))"
        def sxy(a: String, b: String) =
          s"aggregate(sequence($a, ($b) - 1), CAST(0 AS DOUBLE), (acc, i) -> acc + CAST(i AS DOUBLE) * element_at(__f2_x, i + 1))"
        def syy(a: String, b: String) =
          s"aggregate(sequence($a, ($b) - 1), CAST(0 AS DOUBLE), (acc, i) -> acc + element_at(__f2_x, i + 1) * element_at(__f2_x, i + 1))"
        // index sums over [a, b): closed forms
        def sx(a: String, b: String)  = s"((($b) - 1 + ($a)) * (($b) - ($a)) / 2.0)"
        def sxx(b: String)            = s"((($b) - 1) * ($b) * (2 * ($b) - 1) / 6.0)"
        def sxx2(a: String, b: String) = s"(${sxx(b)} - ${sxx(a)})"
        // one segment's [α, β, rss] as a 3-array (m ≥ 2 everywhere by the
        // split bounds, and x-values are distinct indices, so D > 0)
        def seg(a: String, b: String) = {
          val m = s"CAST((($b) - ($a)) AS DOUBLE)"
          s"element_at(transform(array(array(${sy(a, b)}, ${sxy(a, b)}, ${syy(a, b)})), __sv -> " +
            s"element_at(transform(array(" +
            s"(($m * element_at(__sv, 2) - ${sx(a, b)} * element_at(__sv, 1)) / " +
            s"($m * ${sxx2(a, b)} - ${sx(a, b)} * ${sx(a, b)}))), __sb -> " +
            s"array((element_at(__sv, 1) - __sb * ${sx(a, b)}) / $m, __sb, " +
            s"element_at(__sv, 3) - (element_at(__sv, 1) - __sb * ${sx(a, b)}) / $m * element_at(__sv, 1) - __sb * element_at(__sv, 2))" +
            s"), 1)), 1)"
        }
        val cand = s"transform(sequence(2, size(__f2_x) - 2), __fs -> " +
          s"element_at(transform(array(${seg("0", "__fs")}), __fl -> " +
          s"element_at(transform(array(${seg("__fs", "size(__f2_x)")}), __fr -> " +
          "array(element_at(__fl, 3) + element_at(__fr, 3), CAST(__fs AS DOUBLE), " +
          "element_at(__fl, 1), element_at(__fl, 2), element_at(__fr, 1), element_at(__fr, 2))" +
          "), 1)), 1))"
        val best = s"element_at(array_sort($cand), 1)"
        let1("__f2_x", asD(x),
          let1("__f2_b", best,
            let1("__f2_s", "CAST(element_at(__f2_b, 2) AS INT)",
              "named_struct(" +
                "'split_idx', CAST(__f2_s AS BIGINT), " +
                s"'rsquare', (CASE WHEN ${varOf("__f2_x")} > 0 THEN " +
                s"1 - element_at(__f2_b, 1) / (${varOf("__f2_x")} * (${nOf("__f2_x")} - 1)) " +
                "ELSE CAST(1 AS DOUBLE) END), " +
                s"'variance', ${varOf("__f2_x")}, " +
                s"'rvariance', element_at(__f2_b, 1) / (${nOf("__f2_x")} - 1), " +
                "'left_interception', element_at(__f2_b, 3), " +
                "'left_slope', element_at(__f2_b, 4), " +
                "'right_interception', element_at(__f2_b, 5), " +
                "'right_slope', element_at(__f2_b, 6), " +
                "'line_fit', transform(sequence(0, size(__f2_x) - 1), i -> " +
                "CASE WHEN i < __f2_s THEN element_at(__f2_b, 3) + element_at(__f2_b, 4) * CAST(i AS DOUBLE) " +
                "ELSE element_at(__f2_b, 5) + element_at(__f2_b, 6) * CAST(i AS DOUBLE) END))")))
    }
    // pack_all(): the whole row as a JSON bag — star-struct serialization
    // (same JSON-string bag currency as bag_pack/bag_unpack)
    s = expandCalls(s, "pack_all") {
      case Seq("") => "to_json(struct(*))"
    }
    // bag_pack('k1', v1, 'k2', v2, …): a JSON bag (bags are JSON strings
    // in this engine — the bag_unpack/extractjson duals). Keys must be
    // string literals (they become struct field names); insertion order is
    // preserved, matching json_object on the oracle side.
    // bag_pack_columns(c1, c2, …): the column NAMES become the keys —
    // args must be plain identifiers. Emits bag_pack (expanded by the
    // next statement — fixpoint-safe: same-pass sequencing suffices and
    // re-expansion of to_json/named_struct is a no-op).
    s = expandCalls(s, "bag_pack_columns") {
      case args if args.nonEmpty &&
          args.forall(_.trim.matches("[A-Za-z_][A-Za-z0-9_]*")) =>
        s"bag_pack(${args.map(a => s"'${a.trim}', ${a.trim}").mkString(", ")})"
    }
    s = expandCalls(s, "bag_pack") {
      case args if args.size >= 2 && args.size % 2 == 0 &&
          args.grouped(2).forall(p => p.head.trim.matches("'[^']*'")) =>
        val fields = args.grouped(2).map { case Seq(k, v) =>
          s"${k.trim}, $v"
        }.mkString(", ")
        s"to_json(named_struct($fields))"
      // dynamic (non-literal) keys: map-backed bag — values coerce to a
      // common type per call; the to_json text stays the same bag currency
      case args if args.size >= 2 && args.size % 2 == 0 =>
        s"to_json(map(${args.mkString(", ")}))"
    }
    // bag_set_key(bag, key, value): set/overwrite one key — the new pair
    // merges FIRST and bag_merge is earlier-wins, so it replaces
    s = expandCalls(s, "bag_set_key") {
      case Seq(b, k, v) => s"bag_merge(to_json(map($k, $v)), $b)"
    }
    // bag_zip(keys, values): parallel arrays → bag; keys stringify (the
    // ADX contract), extra keys pair with null, extra VALUES are dropped.
    // Iterate over the keys array with its index (not zip_with: a longer
    // values array would null-pad the key side and map_from_entries
    // throws on a null map key where ADX just drops the extras).
    s = expandCalls(s, "bag_zip") {
      case Seq(k, v) =>
        s"to_json(map_from_entries(transform($k, " +
          s"(kk, i) -> struct(CAST(kk AS STRING) AS key, try_element_at($v, i + 1) AS value))))"
    }
    // geo scalars: great-circle distance by the haversine closed form on
    // the 6371.0088 km mean-Earth radius (ADX uses a geodesic; documented
    // divergence — haversine restates identically in any SQL engine, which
    // keeps the oracle twin bit-comparable; callers round the meters).
    // in_circle expands FIRST so its emitted geo_distance_2points text is
    // picked up by the expansion below (the decompose_anomalies pattern).
    s = expandCalls(s, "geo_point_in_circle") {
      case Seq(lon, lat, clon, clat, r) =>
        s"(geo_distance_2points($lon, $lat, $clon, $clat) <= ($r))"
    }
    // geo_line_length(line): meters along the geodesic polyline — the sum
    // of great-circle segment lengths. Expands BEFORE geo_distance_2points
    // so the emitted per-segment call is picked up by that expansion (the
    // in_circle pattern). line = dynamic [[lng,lat], …].
    // geo_distance_point_to_line(lng, lat, line): meters from the point
    // to the nearest point of the geodesic polyline — per segment the
    // great-circle cross-track distance when the perpendicular foot lands
    // within the arc, else the nearer endpoint distance (unit-vector
    // closed form, engine-neutral: see segmentDistanceSql, which oracle
    // twins restate with identical arithmetic). line = dynamic
    // [[lng,lat], …]; fewer than 2 points → NULL.
    // ---- round-10 batch 5: polygon/line predicates & centroids ----------
    // All on unit vectors, same discipline as segmentDistanceSql: shared
    // closed-form text, engine-neutral, so DuckDB oracles can restate (or
    // pin literals computed through the identical arithmetic).
    //
    // geo_intersects_2polygons(p1, p2): boundaries cross, or one ring's
    // first vertex sits inside the other (covers full containment).
    // Expands BEFORE intersects_2lines / point_in_polygon (re-rewrite).
    s = expandCalls(s, "geo_intersects_2polygons") {
      case Seq(p1, p2) =>
        s"(CASE WHEN size($p1) < 3 OR size($p2) < 3 THEN CAST(NULL AS BOOLEAN) ELSE (" +
          s"geo_intersects_2lines(concat($p1, slice($p1, 1, 1)), concat($p2, slice($p2, 1, 1))) " +
          s"OR geo_point_in_polygon(element_at($p1, 1)[0], element_at($p1, 1)[1], $p2) " +
          s"OR geo_point_in_polygon(element_at($p2, 1)[0], element_at($p2, 1)[1], $p1)) END)"
    }
    // geo_intersects_line_with_polygon(line, ring): an edge crosses the
    // boundary, or the line starts inside (covers fully-interior lines).
    s = expandCalls(s, "geo_intersects_line_with_polygon") {
      case Seq(line, ring) =>
        s"(CASE WHEN size($line) < 2 OR size($ring) < 3 THEN CAST(NULL AS BOOLEAN) ELSE (" +
          s"geo_intersects_2lines($line, concat($ring, slice($ring, 1, 1))) " +
          s"OR geo_point_in_polygon(element_at($line, 1)[0], element_at($line, 1)[1], $ring)) END)"
    }
    // geo_intersects_2lines(l1, l2): any great-circle segment pair crosses.
    // Per pair (A→B, C→D) with edge-plane normals n1 = A×B, n2 = C×D the
    // test is the S2-style straddle pair — sign(n1·C)·sign(n1·D) < 0 AND
    // sign(n2·A)·sign(n2·B) < 0 — PLUS the same-intersection-point guard
    // (the two great circles meet at ±t, t = n1×n2; both straddle tests
    // can pass with the arcs around OPPOSITE points — e.g. one arc near
    // the antimeridian): t must fall in the same hemisphere as both arc
    // midpoints. Valid for minor arcs (< 180°, the ADX-realistic domain);
    // measure-zero touches/collinear overlaps report false (documented).
    s = expandCalls(s, "geo_intersects_2lines") {
      case Seq(l1, l2) =>
        def uv(l: String) = s"transform($l, p -> array(" +
          "cos(radians(p[1])) * cos(radians(p[0])), " +
          "cos(radians(p[1])) * sin(radians(p[0])), sin(radians(p[1]))))"
        // per segment: [nx, ny, nz, mx, my, mz] — edge normal + midpoint sum
        def segs(v: String) =
          s"zip_with(slice($v, 1, size($v) - 1), slice($v, 2, size($v) - 1), (p, q) -> array(" +
            "p[1]*q[2] - p[2]*q[1], p[2]*q[0] - p[0]*q[2], p[0]*q[1] - p[1]*q[0], " +
            "p[0]+q[0], p[1]+q[1], p[2]+q[2]))"
        val cond =
          "((w.p[0]*w.c[0] + w.p[1]*w.c[1] + w.p[2]*w.c[2]) * " +
            "(w.p[0]*w.d[0] + w.p[1]*w.d[1] + w.p[2]*w.d[2]) < 0 AND " +
          "(w.q[0]*w.a[0] + w.q[1]*w.a[1] + w.q[2]*w.a[2]) * " +
            "(w.q[0]*w.b[0] + w.q[1]*w.b[1] + w.q[2]*w.b[2]) < 0 AND " +
          "element_at(transform(array(array(" +
            "w.p[1]*w.q[2] - w.p[2]*w.q[1], " +
            "w.p[2]*w.q[0] - w.p[0]*w.q[2], " +
            "w.p[0]*w.q[1] - w.p[1]*w.q[0])), t -> " +
            "(t[0]*w.p[3] + t[1]*w.p[4] + t[2]*w.p[5]) * " +
            "(t[0]*w.q[3] + t[1]*w.q[4] + t[2]*w.q[5]) > 0), 1))"
        val body =
          "exists(sequence(1, size(__x2a)), i -> " +
            "exists(transform(sequence(1, size(__x2b)), j -> named_struct(" +
              "'a', element_at(__xva, i), 'b', element_at(__xva, i + 1), " +
              "'c', element_at(__xvb, j), 'd', element_at(__xvb, j + 1), " +
              s"'p', element_at(__x2a, i), 'q', element_at(__x2b, j))), w -> $cond))"
        s"(CASE WHEN size($l1) < 2 OR size($l2) < 2 THEN CAST(NULL AS BOOLEAN) ELSE " +
          let1("__xva", uv(l1),
            let1("__xvb", uv(l2),
              let1("__x2a", segs("__xva"),
                let1("__x2b", segs("__xvb"), body)))) + " END)"
    }
    // geo_polygon_perimeter(ring): meters around the closed geodesic ring —
    // geo_line_length over ring + first vertex re-appended (expand-before
    // re-rewrite, the in_circle pattern). Degenerate ring → NULL.
    s = expandCalls(s, "geo_polygon_perimeter") {
      case Seq(ring) =>
        s"(CASE WHEN size($ring) < 3 THEN CAST(NULL AS DOUBLE) " +
          s"ELSE geo_line_length(concat($ring, slice($ring, 1, 1))) END)"
    }
    // geo_distance_point_to_polygon(lng, lat, ring): 0 inside (geodesic
    // containment), else distance to the nearest boundary point — the
    // point_to_line machinery over the closed ring.
    s = expandCalls(s, "geo_distance_point_to_polygon") {
      case Seq(x, y, ring) =>
        s"(CASE WHEN size($ring) < 3 THEN CAST(NULL AS DOUBLE) " +
          s"WHEN geo_point_in_polygon($x, $y, $ring) THEN CAST(0.0 AS DOUBLE) " +
          s"ELSE geo_distance_point_to_line($x, $y, concat($ring, slice($ring, 1, 1))) END)"
    }
    // geo_polygon_centroid(ring): GeoJSON Point at the spherical centroid.
    // Vector-area identity: ∫∫ r dA over the interior equals ½ Σ n̂ᵢθᵢ over
    // the boundary arcs (n̂ = unit edge-plane normal, θ = arc angle), so the
    // centroid direction is the normalized weighted normal sum — exact for
    // any simple spherical polygon, no small-area approximation. The ½ and
    // the area divisor cancel in the normalization.
    s = expandCalls(s, "geo_polygon_centroid") {
      case Seq(ring) =>
        val uv = s"transform($ring, p -> array(" +
          "cos(radians(p[1])) * cos(radians(p[0])), " +
          "cos(radians(p[1])) * sin(radians(p[0])), sin(radians(p[1]))))"
        def ab(c: String) = s"element_at(__gc_v, $c)"
        val (a, b) = (ab("i"), ab("(i % size(__gc_v)) + 1"))
        val cross = s"array($a[1]*$b[2] - $a[2]*$b[1], $a[2]*$b[0] - $a[0]*$b[2], " +
          s"$a[0]*$b[1] - $a[1]*$b[0], $a[0]*$b[0] + $a[1]*$b[1] + $a[2]*$b[2])"
        val cn = "sqrt(c[0]*c[0] + c[1]*c[1] + c[2]*c[2])"
        val weighted = s"transform(sequence(1, size(__gc_v)), i -> " +
          s"element_at(transform(array($cross), c -> CASE WHEN $cn > 0 THEN array(" +
          s"c[0] / $cn * atan2($cn, c[3]), c[1] / $cn * atan2($cn, c[3]), " +
          s"c[2] / $cn * atan2($cn, c[3])) " +
          "ELSE array(CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)) END), 1))"
        def sum(i: Int) = s"aggregate(__gc_w, CAST(0 AS DOUBLE), (acc, w) -> acc + w[$i])"
        s"(CASE WHEN size($ring) < 3 THEN CAST(NULL AS STRING) ELSE " +
          let1("__gc_v", uv,
            let1("__gc_w", weighted,
              let1("__gc_s", s"array(${sum(0)}, ${sum(1)}, ${sum(2)})",
                let1("__gc_m",
                  "sqrt(__gc_s[0]*__gc_s[0] + __gc_s[1]*__gc_s[1] + __gc_s[2]*__gc_s[2])",
                  "CASE WHEN __gc_m = 0 THEN CAST(NULL AS STRING) ELSE " +
                    "concat('{\"type\":\"Point\",\"coordinates\":[', " +
                    "CAST(degrees(atan2(__gc_s[1], __gc_s[0])) AS STRING), ',', " +
                    "CAST(degrees(asin(__gc_s[2] / __gc_m)) AS STRING), ']}') END")))) +
          " END)"
    }
    // geo_line_centroid(line): GeoJSON Point at the polyline's centroid —
    // per arc a→b with d = a·b, ∫ r ds = a·sinθ + û·(1−cosθ) where
    // û ⟂ a in the arc plane; sinθ = √(1−d²), cosθ = d (no trig calls).
    s = expandCalls(s, "geo_line_centroid") {
      case Seq(line) =>
        val uv = s"transform($line, p -> array(" +
          "cos(radians(p[1])) * cos(radians(p[0])), " +
          "cos(radians(p[1])) * sin(radians(p[0])), sin(radians(p[1]))))"
        def v(c: String) = s"element_at(__lc_v, $c)"
        val (a, b) = (v("i - 1"), v("i"))
        val d = s"least(CAST(1.0 AS DOUBLE), greatest(CAST(-1.0 AS DOUBLE), " +
          s"$a[0]*$b[0] + $a[1]*$b[1] + $a[2]*$b[2]))"
        val bound = s"array($a[0], $a[1], $a[2], $b[0], $b[1], $b[2], $d)"
        val un = "sqrt((w[3]-w[6]*w[0])*(w[3]-w[6]*w[0]) + " +
          "(w[4]-w[6]*w[1])*(w[4]-w[6]*w[1]) + (w[5]-w[6]*w[2])*(w[5]-w[6]*w[2]))"
        def comp(i: Int) =
          s"w[$i]*sqrt(1 - w[6]*w[6]) + (w[${i + 3}]-w[6]*w[$i]) / $un * (1 - w[6])"
        val weighted = s"transform(sequence(2, size(__lc_v)), i -> " +
          s"element_at(transform(array($bound), w -> CASE WHEN $un > 0 THEN " +
          s"array(${comp(0)}, ${comp(1)}, ${comp(2)}) " +
          "ELSE array(CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)) END), 1))"
        def sum(i: Int) = s"aggregate(__lc_w, CAST(0 AS DOUBLE), (acc, w) -> acc + w[$i])"
        s"(CASE WHEN size($line) < 2 THEN CAST(NULL AS STRING) ELSE " +
          let1("__lc_v", uv,
            let1("__lc_w", weighted,
              let1("__lc_s", s"array(${sum(0)}, ${sum(1)}, ${sum(2)})",
                let1("__lc_m",
                  "sqrt(__lc_s[0]*__lc_s[0] + __lc_s[1]*__lc_s[1] + __lc_s[2]*__lc_s[2])",
                  "CASE WHEN __lc_m = 0 THEN CAST(NULL AS STRING) ELSE " +
                    "concat('{\"type\":\"Point\",\"coordinates\":[', " +
                    "CAST(degrees(atan2(__lc_s[1], __lc_s[0])) AS STRING), ',', " +
                    "CAST(degrees(asin(__lc_s[2] / __lc_m)) AS STRING), ']}') END")))) +
          " END)"
    }
    s = expandCalls(s, "geo_distance_point_to_line") {
      case Seq(x, y, line) =>
        val uv = s"transform($line, q -> array(" +
          "cos(radians(q[1])) * cos(radians(q[0])), " +
          "cos(radians(q[1])) * sin(radians(q[0])), sin(radians(q[1]))))"
        val px = s"(cos(radians($y)) * cos(radians($x)))"
        val py = s"(cos(radians($y)) * sin(radians($x)))"
        val pz = s"(sin(radians($y)))"
        def vc(which: String, i: Int) = s"element_at(__gl2_v, $which)[$i]"
        val seg = segmentDistanceSql(
          vc("i - 1", 0), vc("i - 1", 1), vc("i - 1", 2),
          vc("i", 0), vc("i", 1), vc("i", 2), px, py, pz)
        let1("__gl2_v", uv,
          s"(CASE WHEN size(__gl2_v) < 2 THEN CAST(NULL AS DOUBLE) ELSE " +
            s"array_min(transform(sequence(2, size(__gl2_v)), i -> $seg)) * 6371008.8 END)")
    }
    s = expandCalls(s, "geo_line_length") {
      case Seq(line) =>
        // greatest(…, 0): a degenerate 0/1-point line must yield 0.0, not a
        // runtime error from slice's negative-length rejection
        s"aggregate(zip_with(slice($line, 1, greatest(size($line) - 1, 0)), " +
          s"slice($line, 2, greatest(size($line) - 1, 0)), " +
          "(a, b) -> geo_distance_2points(a[0], a[1], b[0], b[1])), " +
          "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    }
    // geo_polygon_area(ring): spherical area in m² on the 6371008.8 m
    // mean-Earth sphere (same radius as geo_distance_2points; ADX's WGS-84
    // ellipsoid differs by <0.3% — documented divergence). EXACT geodesic
    // form: fan-triangulate from vertex 1 and sum signed spherical
    // excesses via the Eriksson/van-Oosterom formula
    //   E = 2·atan2(a·(b×c), 1 + a·b + b·c + c·a)
    // over unit vectors — valid for non-convex rings (signs cancel),
    // orientation-free via abs(). Ring is the open [[lng,lat], …] form.
    s = expandCalls(s, "geo_polygon_area") {
      case Seq(ring) =>
        def v(i: String)              = s"element_at(__ga_v, $i)"
        def dot(p: String, q: String) =
          s"($p[0] * $q[0] + $p[1] * $q[1] + $p[2] * $q[2])"
        def det(p: String, q: String, r: String) =
          s"($p[0] * ($q[1] * $r[2] - $q[2] * $r[1]) + " +
            s"$p[1] * ($q[2] * $r[0] - $q[0] * $r[2]) + " +
            s"$p[2] * ($q[0] * $r[1] - $q[1] * $r[0]))"
        val uv = s"transform($ring, p -> array(" +
          "cos(radians(p[1])) * cos(radians(p[0])), " +
          "cos(radians(p[1])) * sin(radians(p[0])), sin(radians(p[1]))))"
        val (a, b, c) = (v("1"), v("i"), v("i + 1"))
        let1("__ga_v", uv,
          "(CASE WHEN size(__ga_v) < 3 THEN CAST(0 AS DOUBLE) ELSE " +
            "abs(aggregate(sequence(2, size(__ga_v) - 1), CAST(0 AS DOUBLE), " +
            s"(acc, i) -> acc + 2 * atan2(${det(a, b, c)}, " +
            s"1 + ${dot(a, b)} + ${dot(b, c)} + ${dot(c, a)}))) " +
            "* 6371008.8 * 6371008.8 END)")
    }
    s = expandCalls(s, "geo_distance_2points") {
      case Seq(lon1, lat1, lon2, lat2) =>
        "(2.0 * 6371008.8 * asin(sqrt(" +
          s"pow(sin(radians(($lat2) - ($lat1)) / 2), 2) + " +
          s"cos(radians($lat1)) * cos(radians($lat2)) * " +
          s"pow(sin(radians(($lon2) - ($lon1)) / 2), 2))))"
    }
    // geo_azimuth(lng1, lat1, lng2, lat2): initial great-circle bearing at
    // point 1 toward point 2, radians clockwise from north in [0, 2π) —
    // the standard atan2 form, engine-neutral SQL (same libm bit-parity
    // discipline as geo_distance_2points). Antipodal/coincident points
    // yield the formula's own atan2(0, 0) = 0, matching the closed form.
    s = expandCalls(s, "geo_azimuth") {
      case Seq(lon1, lat1, lon2, lat2) =>
        val az = s"atan2(sin(radians(($lon2) - ($lon1))) * cos(radians($lat2)), " +
          s"cos(radians($lat1)) * sin(radians($lat2)) - " +
          s"sin(radians($lat1)) * cos(radians($lat2)) * cos(radians(($lon2) - ($lon1))))"
        s"(($az + 2.0 * pi()) % (2.0 * pi()))"
    }
    // geo_point_in_polygon(lng, lat, ring): GEODESIC containment via the
    // gnomonic projection centered at the query point — great circles map
    // to straight LINES under gnomonic projection, so planar ray casting
    // over the PROJECTED vertices is exactly the spherical-geodesic edge
    // test (a great-circle edge between two mid-latitude vertices bulges
    // poleward; the planar shortcut got those rows wrong). Valid while
    // every ring vertex lies in the open hemisphere around the point
    // (projection denominator c > 0); beyond that the answer is
    // unspecified-but-deterministic, and identical in the DuckDB twin
    // (same closed form, same operation order). `ring` is a dynamic
    // [[lng,lat], …] open ring — the closing edge is implicit
    // (slice-rotate pairs each vertex with its successor). The projected
    // point itself sits at the ORIGIN, so the crossing test is against
    // x=0/y=0; an edge parallel to the ray makes the straddle test false,
    // so its zero-division never contributes (double /0 → ±Inf, compares
    // false). The projection binds ONCE through the let1 trick —
    // interpreted HOF eval recomputes every textual copy.
    s = expandCalls(s, "geo_point_in_polygon") {
      case Seq(x, y, ring) =>
        // c = sin φ sin φv + cos φ cos φv cos(λv − λ); X = cos φv sin(λv − λ) / c
        // Y = (cos φ sin φv − sin φ cos φv cos(λv − λ)) / c
        val c = s"(sin(radians($y)) * sin(radians(v[1])) + " +
          s"cos(radians($y)) * cos(radians(v[1])) * cos(radians(v[0]) - radians($x)))"
        val proj = s"transform($ring, v -> array(" +
          s"(cos(radians(v[1])) * sin(radians(v[0]) - radians($x))) / $c, " +
          s"(cos(radians($y)) * sin(radians(v[1])) - " +
          s"sin(radians($y)) * cos(radians(v[1])) * cos(radians(v[0]) - radians($x))) / $c))"
        val edges = "zip_with(__gp_r, " +
          "concat(slice(__gp_r, 2, size(__gp_r) - 1), slice(__gp_r, 1, 1)), (a, b) -> " +
          "CASE WHEN ((a[1] > 0.0D) != (b[1] > 0.0D)) AND " +
          "(0.0D < (b[0] - a[0]) * (0.0D - a[1]) / (b[1] - a[1]) + a[0]) " +
          "THEN 1 ELSE 0 END)"
        let1("__gp_r", proj,
          s"(aggregate($edges, 0, (acc, v) -> acc + v) % 2 = 1)")
    }
    // HLL sketch scalars (paired with the hll()/hll_merge() aggregates):
    // dcount_hll over a BINARY sketch column estimates it;
    // dcount_intersect estimates |A∩B| (and |A∩B∩C|) by inclusion-
    // exclusion over sketch unions — the only intersection a mergeable
    // sketch supports. Estimates are LONG (hll_sketch_estimate's type).
    s = expandCalls(s, "dcount_hll") {
      case Seq(x) => s"hll_sketch_estimate($x)"
    }
    s = expandCalls(s, "dcount_intersect") {
      case Seq(a, b) =>
        s"(hll_sketch_estimate($a) + hll_sketch_estimate($b) " +
          s"- hll_sketch_estimate(hll_union($a, $b)))"
      case Seq(a, b, c) =>
        s"(hll_sketch_estimate($a) + hll_sketch_estimate($b) + hll_sketch_estimate($c) " +
          s"- hll_sketch_estimate(hll_union($a, $b)) " +
          s"- hll_sketch_estimate(hll_union($a, $c)) " +
          s"- hll_sketch_estimate(hll_union($b, $c)) " +
          s"+ hll_sketch_estimate(hll_union(hll_union($a, $b), $c)))"
    }
    // ---- dynamic-array scalar tail ------------------------------------
    // Mostly 1:1 maps onto Spark's codegen'd array functions. ADX array
    // indices are 0-based; slice/rotate restate them on Spark's 1-based
    // slice/element_at. Set ops keep Spark's order contract (first-array
    // order, deduplicated) — oracle twins normalize with a sort.
    s = expandCalls(s, "array_sort_asc") { case Seq(x) => s"array_sort($x)" }
    s = expandCalls(s, "array_sort_desc") { case Seq(x) => s"reverse(array_sort($x))" }
    s = expandCalls(s, "array_reverse") { case Seq(x) => s"reverse($x)" }
    s = expandCalls(s, "array_length") { case Seq(x) => s"CAST(size($x) AS BIGINT)" }
    s = expandCalls(s, "array_concat") {
      case args if args.nonEmpty => s"concat(${args.mkString(", ")})"
    }
    // array_slice(x, start, end): 0-based INCLUSIVE bounds (non-negative)
    s = expandCalls(s, "array_slice") {
      case Seq(x, a, b) => s"slice($x, ($a) + 1, ($b) - ($a) + 1)"
    }
    s = expandCalls(s, "array_rotate_left") {
      case Seq(x, n) =>
        let1("__arl", x,
          s"concat(slice(__arl, pmod($n, size(__arl)) + 1, " +
            s"size(__arl) - pmod($n, size(__arl))), " +
            s"slice(__arl, 1, pmod($n, size(__arl))))")
    }
    s = expandCalls(s, "array_rotate_right") {
      case Seq(x, n) =>
        let1("__arr", x,
          s"concat(slice(__arr, pmod(-($n), size(__arr)) + 1, " +
            s"size(__arr) - pmod(-($n), size(__arr))), " +
            s"slice(__arr, 1, pmod(-($n), size(__arr))))")
    }
    // array_shift_left(x, n[, fill]): drop the first n, pad n fills (null
    // default) at the end; n must be non-negative (shift right spells the
    // other direction)
    s = expandCalls(s, "array_shift_left") {
      case Seq(x, n)       => s"concat(slice($x, ($n) + 1, size($x) - ($n)), " +
        s"transform(slice($x, 1, $n), __as -> NULL))" // null pad keeps the element type
      case Seq(x, n, fill) => s"concat(slice($x, ($n) + 1, size($x) - ($n)), " +
        s"array_repeat($fill, CAST($n AS INT)))"
    }
    s = expandCalls(s, "set_union") {
      case args if args.size >= 2 => args.reduce((a, b) => s"array_union($a, $b)")
    }
    s = expandCalls(s, "set_intersect") {
      case args if args.size >= 2 => args.reduce((a, b) => s"array_intersect($a, $b)")
    }
    s = expandCalls(s, "set_difference") {
      case a +: rest if rest.nonEmpty =>
        s"array_except($a, ${rest.reduce((x, y) => s"array_union($x, $y)")})"
    }
    s = expandCalls(s, "set_has_element") { case Seq(a, v) => s"array_contains($a, $v)" }
    s = expandCalls(s, "pack_array") { case args => s"array(${args.mkString(", ")})" }
    s = expandCalls(s, "jaccard_index") {
      case Seq(a, b) =>
        s"(CAST(size(array_intersect($a, $b)) AS DOUBLE) / size(array_union($a, $b)))"
    }
    // array_iff(cond, x, y): elementwise selector over three same-length arrays
    s = expandCalls(s, "array_iff") {
      case Seq(b, x, y) =>
        s"transform(sequence(1, size($b)), __ai -> " +
          s"IF(element_at($b, __ai), element_at($x, __ai), element_at($y, __ai)))"
    }
    // zip(a, b): pairs as 2-element arrays (ADX emits JSON pairs)
    s = expandCalls(s, "zip") {
      case Seq(a, b) => s"zip_with($a, $b, (__zl, __zr) -> array(__zl, __zr))"
    }
    s = expandCalls(s, "bag_keys") { case Seq(x) => s"json_object_keys($x)" }
    // array_shift_right(x, n[, fill]): the mirror of array_shift_left —
    // drop the last n, pad n fills at the FRONT
    s = expandCalls(s, "array_shift_right") {
      case Seq(x, n)       => s"concat(transform(slice($x, 1, $n), __as -> NULL), " +
        s"slice($x, 1, size($x) - ($n)))"
      case Seq(x, n, fill) => s"concat(array_repeat($fill, CAST($n AS INT)), " +
        s"slice($x, 1, size($x) - ($n)))"
    }
    // bitwise scalars → Spark's operators/functions (64-bit long semantics,
    // same as ADX; shifts take the count modulo 64 on both engines)
    s = expandCalls(s, "binary_and")  { case Seq(a, b) => s"(($a) & ($b))" }
    s = expandCalls(s, "binary_or")   { case Seq(a, b) => s"(($a) | ($b))" }
    s = expandCalls(s, "binary_xor")  { case Seq(a, b) => s"(($a) ^ ($b))" }
    s = expandCalls(s, "binary_not")  { case Seq(a)    => s"(~($a))" }
    s = expandCalls(s, "binary_shift_left") {
      case Seq(a, n) => s"shiftleft(CAST($a AS BIGINT), CAST($n AS INT))"
    }
    s = expandCalls(s, "binary_shift_right") {
      case Seq(a, n) => s"shiftright(CAST($a AS BIGINT), CAST($n AS INT))"
    }
    s = expandCalls(s, "bitset_count_ones") {
      case Seq(a) => s"CAST(bit_count(CAST($a AS BIGINT)) AS BIGINT)"
    }
    // case(p1, v1, p2, v2, …, default) → CASE WHEN; KQL-only spelling (Spark
    // CASE is keyword syntax, never `case(`), so the rewrite can't collide
    s = expandCalls(s, "case") {
      case args if args.size >= 3 && args.size % 2 == 1 =>
        val whens = args.dropRight(1).grouped(2)
          .map { case Seq(p, v) => s"WHEN ($p) THEN ($v)" }.mkString(" ")
        s"(CASE $whens ELSE (${args.last}) END)"
    }
    // hash_sha256 / base64: Spark spells these sha2(x, 256) and
    // base64/unbase64 over BINARY
    s = expandCalls(s, "hash_sha256") { case Seq(x) => s"sha2($x, 256)" }
    // hash(source [, mod]) / hash_combine(h1, h2, …) / hash_many(v1, v2, …):
    // ADX's general-purpose xxhash64 family. Spark's xxhash64 (seed 42)
    // stands in for ADX's XXH64 — same algorithm family, different seed
    // constant, so VALUES diverge from ADX (documented); determinism,
    // mod-range, and spread are the contract and the gates.
    s = expandCalls(s, "hash_combine") {
      case args if args.size >= 2 => s"xxhash64(${args.mkString(", ")})"
    }
    s = expandCalls(s, "hash_many") {
      case args if args.size >= 2 => s"xxhash64(${args.mkString(", ")})"
    }
    s = expandCalls(s, "hash") {
      case Seq(x)    => s"xxhash64($x)"
      case Seq(x, m) => s"pmod(xxhash64($x), $m)"
    }
    // hash_xxhash64 IS this engine's hash() (both read Spark's xxhash64)
    s = expandCalls(s, "hash_xxhash64") {
      case Seq(x)    => s"xxhash64($x)"
      case Seq(x, m) => s"pmod(xxhash64($x), $m)"
    }
    s = expandCalls(s, "base64_encode_tostring") {
      case Seq(x) => s"base64(CAST($x AS BINARY))"
    }
    s = expandCalls(s, "base64_decode_tostring") {
      case Seq(x) => s"CAST(unbase64($x) AS STRING)"
    }
    // ---- IPv4 helpers -------------------------------------------------
    // parse_ipv4: dotted quad → numeric (null on malformed input, like
    // ADX): exactly 4 parts, each 0..255, folded big-endian. The fold
    // propagates a null octet to a null result.
    def ip4(x: String) = {
      val octets = s"transform(split($x, '\\\\.'), p -> " +
        s"CASE WHEN try_cast(p AS BIGINT) BETWEEN 0 AND 255 THEN try_cast(p AS BIGINT) END)"
      s"(CASE WHEN size(split($x, '\\\\.')) = 4 THEN " +
        s"aggregate($octets, CAST(0 AS BIGINT), (acc, v) -> acc * 256 + v) END)"
    }
    s = expandCalls(s, "parse_ipv4") { case Seq(x) => ip4(x) }
    // parse_ipv4_mask(ip, prefix): the numeric network address — the
    // parsed quad with the host bits below `prefix` cleared. Null outside
    // prefix 0..32 or on a malformed quad (the parse_ipv4 contract).
    s = expandCalls(s, "parse_ipv4_mask") {
      case Seq(x, p) =>
        s"(CASE WHEN try_cast($p AS INT) BETWEEN 0 AND 32 THEN " +
          s"(${ip4(x)}) & (4294967295 - (shiftleft(CAST(1 AS BIGINT), 32 - try_cast($p AS INT)) - 1)) END)"
    }
    // has_ipv4 family: a PROPERLY DELIMITED, octet-valid dotted quad
    // somewhere in the text (the ADX log-scanning predicates). Candidates
    // come from one regexp pass (non-digit/dot boundaries both sides);
    // validity is the same ip4 fold as parse_ipv4 applied to the lambda
    // variable — false when no candidate validates.
    // delimiter = any non-word, non-dot char (or the string edge): 'a1.2.3.4'
    // and '1.2.3.4x' are NOT properly delimited, '(1.2.3.4)' is
    val Ipv4Candidates =
      s"regexp_extract_all(%s, '(?:^|[^0-9A-Za-z_.])([0-9]{1,3}(?:\\\\.[0-9]{1,3}){3})(?![0-9A-Za-z_.])', 1)"
    s = expandCalls(s, "has_ipv4") {
      case Seq(t) =>
        s"exists(${Ipv4Candidates.format(t)}, c -> (${ip4("c")}) IS NOT NULL)"
    }
    s = expandCalls(s, "has_ipv4_prefix") {
      case Seq(t, p) =>
        s"exists(${Ipv4Candidates.format(t)}, c -> (${ip4("c")}) IS NOT NULL " +
          s"AND startswith(c, $p))"
    }
    s = expandCalls(s, "has_any_ipv4") {
      case args if args.size >= 2 =>
        val list = args.tail.mkString("array(", ", ", ")")
        s"exists(${Ipv4Candidates.format(args.head)}, c -> (${ip4("c")}) IS NOT NULL " +
          s"AND array_contains($list, c))"
    }
    // has_any_ipv4_prefix(text, prefix1, …): a properly delimited, valid
    // quad whose TEXT starts with any listed prefix (the has_ipv4_prefix
    // contract, any-folded). Also accepts a single array arg — detected by
    // the array-PRODUCING call shapes this engine's rewrites leave behind
    // (dynamic([…])/pack_array(…) became array(…) in earlier passes, and
    // 2-arg split passes through as Spark's array<string>) OR a bare
    // identifier, which in the ADX signature is a dynamic-array column
    // (the shape that worked pre-r13 and regressed — round-13 advice).
    // Any OTHER single second arg (quoted literal, strcat(…), arithmetic)
    // folds as ONE scalar prefix. Contract notes, both loud at ANALYSIS
    // time, never silent: a SCALAR STRING COLUMN as the single prefix must
    // be spelled pack_array(col) (a bare identifier is taken as the array
    // column and fails `exists` type-checking otherwise); an array-typed
    // CALL in a shape not listed here must go through pack_array(…)
    // (it fails as exists over array<array>).
    s = expandCalls(s, "has_any_ipv4_prefix") {
      case args if args.size >= 2 =>
        val a1 = args(1).trim
        val isArrayShape = a1.startsWith("array(") || a1.startsWith("pack_array(") ||
          a1.startsWith("split(") ||
          a1.matches("[A-Za-z_][A-Za-z0-9_]*") || a1.matches("`[^`]+`")
        val list =
          if (args.size == 2 && isArrayShape) args(1)
          else args.tail.mkString("array(", ", ", ")")
        s"exists(${Ipv4Candidates.format(args.head)}, c -> (${ip4("c")}) IS NOT NULL " +
          s"AND exists($list, __px -> startswith(c, __px)))"
    }
    // ipv4_is_private: RFC-1918 ranges 10/8, 172.16/12, 192.168/16
    s = expandCalls(s, "ipv4_is_private") {
      case Seq(x) =>
        val v = ip4(x)
        s"((($v) BETWEEN 167772160 AND 184549375) OR " +
          s"(($v) BETWEEN 2886729728 AND 2887778303) OR " +
          s"(($v) BETWEEN 3232235520 AND 3232301055))"
    }
    // ipv4_is_in_range(ip, 'a.b.c.d/m'): compare the top m bits; a bare
    // address range (no /m) means /32, i.e. equality
    s = expandCalls(s, "ipv4_is_in_range") {
      case Seq(x, r) =>
        // try_element_at, not [i]: ANSI mode errors on subscript
        // out-of-bounds, and a bare range has no '/' part
        val base = ip4(s"element_at(split($r, '/'), 1)")
        val m    = s"coalesce(try_cast(try_element_at(split($r, '/'), 2) AS INT), 32)"
        s"(shiftright(${ip4(x)}, 32 - $m) = shiftright($base, 32 - $m))"
    }
    // ipv4_compare / ipv4_is_match / netmask-suffix family: both sides may
    // carry IP-prefix notation ('a.b.c.d/m'); the effective prefix is the
    // least of both suffixes and the optional argument (ADX semantics),
    // compared on the top bits after shifting the rest away
    def ip4addr(x: String) = ip4(s"element_at(split($x, '/'), 1)")
    def ip4mask(x: String) =
      s"coalesce(try_cast(try_element_at(split($x, '/'), 2) AS INT), 32)"
    // format_ipv4_mask(ip, prefix): CIDR text of the masked network —
    // address bits below the effective prefix (least of the argument and
    // the ip's own '/m' suffix) zero out, '/prefix' rides along. Expands
    // BEFORE format_ipv4 so the emitted inner call is picked up there.
    s = expandCalls(s, "format_ipv4_mask") {
      case Seq(x, p) =>
        val eff    = s"least(${ip4mask(x)}, CAST($p AS INT))"
        val masked = s"shiftleft(shiftright(${ip4addr(x)}, 32 - $eff), 32 - $eff)"
        s"(CASE WHEN ${ip4addr(x)} IS NOT NULL AND ($p) >= 0 AND ($p) <= 32 THEN " +
          s"concat(format_ipv4($masked), '/', CAST($eff AS STRING)) END)"
    }
    // format_ipv4: numeric → dotted quad
    s = expandCalls(s, "format_ipv4") {
      case Seq(x) =>
        s"concat(CAST((($x) div 16777216) % 256 AS STRING), '.', " +
          s"CAST((($x) div 65536) % 256 AS STRING), '.', " +
          s"CAST((($x) div 256) % 256 AS STRING), '.', " +
          s"CAST(($x) % 256 AS STRING))"
    }
    def ip4cmp(a: String, b: String, p: Option[String]): String = {
      val eff = p match {
        case Some(pp) => s"least(${ip4mask(a)}, ${ip4mask(b)}, $pp)"
        case None     => s"least(${ip4mask(a)}, ${ip4mask(b)})"
      }
      def net(x: String) = s"shiftright(${ip4addr(x)}, 32 - ($eff))"
      s"(CASE WHEN ${ip4addr(a)} IS NULL OR ${ip4addr(b)} IS NULL THEN CAST(NULL AS INT) " +
        s"WHEN ${net(a)} < ${net(b)} THEN -1 " +
        s"WHEN ${net(a)} > ${net(b)} THEN 1 ELSE 0 END)"
    }
    s = expandCalls(s, "ipv4_compare") {
      case Seq(a, b)    => ip4cmp(a, b, None)
      case Seq(a, b, p) => ip4cmp(a, b, Some(p))
    }
    s = expandCalls(s, "ipv4_is_match") {
      case Seq(a, b)    => s"(${ip4cmp(a, b, None)} = 0)"
      case Seq(a, b, p) => s"(${ip4cmp(a, b, Some(p))} = 0)"
    }
    // ipv4_netmask_suffix: the /m suffix, 32 when absent, null on a
    // malformed address part
    s = expandCalls(s, "ipv4_netmask_suffix") {
      case Seq(x) =>
        s"(CASE WHEN ${ip4addr(x)} IS NOT NULL THEN ${ip4mask(x)} END)"
    }
    s = expandCalls(s, "ipv4_is_in_any_range") {
      case args if args.size >= 2 =>
        args.tail.map { r =>
          val base = ip4(s"element_at(split($r, '/'), 1)")
          val m    = s"coalesce(try_cast(try_element_at(split($r, '/'), 2) AS INT), 32)"
          s"(shiftright(${ip4(args.head)}, 32 - $m) = shiftright($base, 32 - $m))"
        }.mkString("(", " OR ", ")")
    }
    // ---- IPv6 helpers -------------------------------------------------
    // parse_ipv6: the native ipv6_norm expression (GraftSessionExtensions)
    // yields the ADX canonical 8×4-hex colon form, null on malformed input
    s = expandCalls(s, "parse_ipv6") { case Seq(x) => s"ipv6_norm($x)" }
    // parse_ipv6_mask(ip, prefix): canonical form with the bits below the
    // prefix zeroed. Same LITERAL multiple-of-4 prefix contract as
    // ipv6_is_match (one canonical hex nibble = 4 bits): the kept head is
    // a substr and the zeroed tail is a rewrite-time constant.
    s = expandCalls(s, "parse_ipv6_mask") {
      case Seq(x, p) if p.trim.matches("\\d+") =>
        val bits = p.trim.toInt
        require(bits >= 0 && bits <= 128 && bits % 4 == 0,
          s"parse_ipv6_mask prefix must be a multiple of 4 in [0, 128], got $bits")
        val nib      = bits / 4
        val chars    = if (nib == 0) 0 else nib + (nib - 1) / 4
        val template = Seq.fill(8)("0000").mkString(":")
        val suffix   = template.substring(chars)
        if (nib == 0) s"(CASE WHEN ipv6_norm($x) IS NOT NULL THEN '$template' END)"
        else s"concat(substr(ipv6_norm($x), 1, $chars), '$suffix')"
    }
    // ipv6_compare(a, b): the canonical form is fixed-width, so ordering IS
    // lexicographic string ordering; null when either side is malformed
    s = expandCalls(s, "ipv6_compare") {
      case Seq(a, b) =>
        s"(CASE WHEN ipv6_norm($a) IS NULL OR ipv6_norm($b) IS NULL THEN CAST(NULL AS INT) " +
          s"WHEN ipv6_norm($a) < ipv6_norm($b) THEN -1 " +
          s"WHEN ipv6_norm($a) > ipv6_norm($b) THEN 1 ELSE 0 END)"
    }
    // ipv6_is_match(a, b[, prefix]): equality of the top `prefix` bits.
    // prefix must be a LITERAL multiple of 4 (one canonical hex nibble = 4
    // bits) — the common /48 /64 shapes; other literals fail loudly at
    // rewrite time rather than silently comparing the wrong bits.
    s = expandCalls(s, "ipv6_is_match") {
      case Seq(a, b) =>
        s"(ipv6_norm($a) IS NOT NULL AND ipv6_norm($a) = ipv6_norm($b))"
      case Seq(a, b, p) if p.trim.matches("\\d+") =>
        val bits = p.trim.toInt
        require(bits >= 0 && bits <= 128 && bits % 4 == 0,
          s"ipv6_is_match prefix must be a multiple of 4 in [0, 128], got $bits")
        val nib = bits / 4
        val chars = nib + (nib - 1) / 4 // count the ':' separators spanned
        if (nib == 0) "(ipv6_norm(" + a + ") IS NOT NULL AND ipv6_norm(" + b + ") IS NOT NULL)"
        else s"(ipv6_norm($a) IS NOT NULL AND ipv6_norm($b) IS NOT NULL AND " +
          s"substr(ipv6_norm($a), 1, $chars) = substr(ipv6_norm($b), 1, $chars))"
    }
    // ipv6_is_in_range(ip, 'base/m'): nibble-prefix compare against a
    // LITERAL range (the canonical form makes it a substr equality; the
    // same multiple-of-4 prefix contract as ipv6_is_match — non-literal or
    // off-nibble ranges fail loudly at rewrite time)
    def ip6InRange(x: String, r0: String): String = {
      val r = r0.trim
      require(r.matches("'[^']*'"),
        s"ipv6_is_in_range range must be a string literal, got: $r")
      val (base, bits) = r.stripPrefix("'").stripSuffix("'").split('/') match {
        case Array(b)    => (b, 128)
        case Array(b, m) => (b, m.toInt)
        case _ => throw new IllegalArgumentException(s"bad ipv6 range: $r")
      }
      require(bits >= 0 && bits <= 128 && bits % 4 == 0,
        s"ipv6 range prefix must be a multiple of 4 in [0, 128], got $bits")
      val nib   = bits / 4
      val chars = nib + (nib - 1) / 4
      if (nib == 0) s"(ipv6_norm($x) IS NOT NULL)"
      else s"(ipv6_norm($x) IS NOT NULL AND " +
        s"substr(ipv6_norm($x), 1, $chars) = substr(ipv6_norm('$base'), 1, $chars))"
    }
    s = expandCalls(s, "ipv6_is_in_range") { case Seq(x, r) => ip6InRange(x, r) }
    s = expandCalls(s, "ipv6_is_in_any_range") {
      case args if args.size >= 2 =>
        args.tail.map(r => ip6InRange(args.head, r)).mkString("(", " OR ", ")")
    }
    // unixtime_nanoseconds_todatetime: truncates to the engine's µs
    // resolution (ADX keeps 100 ns ticks — documented divergence)
    s = expandCalls(s, "unixtime_nanoseconds_todatetime") {
      case Seq(x) => s"timestamp_micros(CAST($x AS BIGINT) DIV 1000)"
    }
    // make_timespan(h, m) / (h, m, s) / (d, h, m, s) → DAY-TIME interval,
    // the same currency totimespan and the bare-timespan literals use
    s = expandCalls(s, "make_timespan") {
      case Seq(h, m)         => s"make_dt_interval(0, $h, $m, 0)"
      case Seq(h, m, sec)    => s"make_dt_interval(0, $h, $m, $sec)"
      case Seq(d, h, m, sec) => s"make_dt_interval($d, $h, $m, $sec)"
    }
    // strcmp(a, b): three-way string compare, −1/0/1; null-in → null-out
    // (a bare CASE would fall through null compares to the ELSE 1 arm)
    s = expandCalls(s, "strcmp") {
      case Seq(a, b) =>
        s"(CASE WHEN ($a) IS NULL OR ($b) IS NULL THEN CAST(NULL AS BIGINT) " +
          s"WHEN ($a) < ($b) THEN -1 WHEN ($a) = ($b) THEN 0 ELSE 1 END)"
    }
    // countof(text, search [, kind]): kind 'normal' (default) counts plain-
    // text matches which per the ADX docs MAY OVERLAP (countof('aaa','aa')
    // = 2); 'regex' matches don't overlap. The replace() trick counts
    // non-overlapping only, so it is used just when the needle provably
    // cannot overlap itself — a literal with no proper border (prefix ==
    // suffix), which covers every 1-char needle; otherwise the native
    // countof_scan expression counts every start offset in one
    // allocation-free byte scan (round-16 review finding #2; the earlier
    // sequence()+filter fallback materialized a length(x)-element array
    // per row — ~KB/row against real document columns, round-16 ADVICE).
    def plainCountof(x: String, n: String): String = {
      val literal = "^'([^']*)'$".r
      val selfOverlapFree = n match {
        case literal(w) =>
          w.nonEmpty && !(1 until w.length).exists(k => w.take(k) == w.takeRight(k))
        case _ => false
      }
      if (selfOverlapFree)
        s"CAST((length($x) - length(replace($x, $n, ''))) / length($n) AS BIGINT)"
      else
        s"countof_scan($x, $n)"
    }
    s = expandCalls(s, "countof") {
      case Seq(x, n)                        => plainCountof(x, n)
      case Seq(x, n, k) if k == "'normal'"  => plainCountof(x, n)
      case Seq(x, n, k) if k == "'regex'" =>
        s"CAST(size(regexp_extract_all($x, $n, 0)) AS BIGINT)"
    }
    // new_guid() / rand([n]): the nondeterministic tail. rand() is a real
    // in [0,1); rand(n) is a uniform integer in [0,n) (the ADX forms).
    // Correctness is gated by PROPERTY booleans (range, format, inequality
    // of two draws) — the values themselves are not reproducible anywhere.
    s = expandCalls(s, "new_guid") { case Seq("") => "uuid()" }
    s = expandCalls(s, "rand") {
      case Seq("") => "rand()"
      case Seq(n)  => s"CAST(floor(rand() * ($n)) AS BIGINT)"
    }
    // split(x, d, i): KQL's indexed form is 0-based — `get` is too, and
    // yields NULL out of bounds exactly like KQL (never an ANSI error).
    // 2-arg split passes through to Spark's (delimiter is a REGEX there vs
    // literal in KQL — identical for the plain separators used here).
    s = expandCalls(s, "split") {
      case Seq(x, d, i) => s"get(split($x, $d), $i)"
    }
    // extract(regex, captureGroup, text) → regexp_extract(text, regex, group);
    // comma-arity 3 only, so Spark's keyword-form extract(field FROM ts)
    // (no top-level commas) is never touched
    s = expandCalls(s, "extract") {
      case Seq(re, g, x) => s"regexp_extract($x, $re, $g)"
    }
    // datetime_diff('unit', a, b) = a − b in units. ADX counts period
    // BOUNDARIES crossed (datetime_diff('day', 03T00:01, 02T23:59) = 1);
    // Spark's timestampdiff counts COMPLETE elapsed units — truncate both
    // operands to the unit first, which makes the two agree for every
    // fixed- and calendar-width unit. Found by ScalarFuzzSpec (r14): 17 of
    // 600 random compositions diverged by one unit on non-aligned operands;
    // DuckDB's date_diff counts boundaries too, so the oracles only passed
    // on unit-aligned fixtures. ADX weeks start SUNDAY while Spark's WEEK
    // truncation lands on Monday — shift by a day around the truncation.
    s = expandCalls(s, "datetime_diff") {
      case Seq(p, a, b) =>
        val unit = p.replace("'", "").trim.toUpperCase
        def trunc(x: String) = unit match {
          case "WEEK" => s"(date_trunc('WEEK', ($x) + interval '1' day) - interval '1' day)"
          case u      => s"date_trunc('$u', $x)"
        }
        // Spark's timestampdiff has no NANOSECOND unit (MICROSECOND..YEAR);
        // storage is µs anyway, so nanoseconds = microseconds × 1000 with
        // no truncation needed (every stored instant is ns-aligned). The
        // ×1000 overflows Long silently in non-ANSI mode for spans past
        // ~292 years — ADX's own ns-tick range caps out similarly, so the
        // bound is inherited from the domain, not added by the expansion
        if (unit == "NANOSECOND") s"(timestampdiff(MICROSECOND, $b, $a) * 1000)"
        else s"timestampdiff($unit, ${trunc(b)}, ${trunc(a)})"
    }
    // datetime_add('unit', n, dt) → timestampadd(UNIT, n, dt)
    s = expandCalls(s, "datetime_add") {
      case Seq(p, n, dt) =>
        s"timestampadd(${p.replace("'", "").trim.toUpperCase}, $n, $dt)"
    }
    // ADX dayofweek returns a TIMESPAN (0d = Sunday); built on Spark's
    // weekday (0 = Monday) — NOT Spark's dayofweek, whose name inside the
    // replacement would re-trigger this very expansion — so that
    // `dayofweek(ts) == 0d` compares true under the timespan→interval
    // rewrite below
    s = expandCalls(s, "dayofweek") {
      case Seq(x) => s"(((weekday($x) + 1) % 7) * interval '1' day)"
    }
    // endofday/month/year: last representable instant of the period — µs
    // resolution here (parquet/Spark) vs ADX's 100 ns tick; documented
    // endofquarter first: interval has no 'quarter' unit, so spell 3 months
    s = expandCalls(s, "endofquarter") { case Seq(x) =>
      s"(date_trunc('QUARTER', $x) + interval '3' month - interval '1' microsecond)"
    }
    s = expandCalls(s, "startofquarter") { case Seq(x) => s"date_trunc('QUARTER', $x)" }
    for ((fn, unit) <- Seq("endofday" -> "DAY", "endofmonth" -> "MONTH", "endofyear" -> "YEAR"))
      s = expandCalls(s, fn) { case Seq(x) =>
        s"(date_trunc('$unit', $x) + interval '1' ${unit.toLowerCase} - interval '1' microsecond)"
      }
    s = expandCalls(s, "isempty") { case Seq(x) => s"(coalesce(cast(($x) as string), '') = '')" }
    s = expandCalls(s, "isnotempty") { case Seq(x) => s"(coalesce(cast(($x) as string), '') != '')" }
    for ((fn, unit) <- Seq("startofday" -> "DAY", "startofmonth" -> "MONTH", "startofyear" -> "YEAR"))
      s = expandCalls(s, fn) { case Seq(x) => s"date_trunc('$unit', $x)" }
    // bin_auto(x): ADX resolves the size from the query property
    // query_bin_auto_size; this engine's analog is a column/let binding of
    // that exact name in scope (documented divergence: a query property
    // plane does not exist in a library engine). Expands BEFORE bin so
    // the emitted call is picked up below.
    s = expandCalls(s, "bin_auto") { case Seq(x) => s"bin($x, query_bin_auto_size)" }
    s = expandCalls(s, "bin") {
      case Seq(x, n) => n.trim match {
        case TimeSpan(q, u) =>
          val secs = q.toLong * SpanSeconds(u)
          // epoch-second flooring keeps arbitrary spans (15m, 6h) exact;
          // cast timestamp→double is Spark's epoch-seconds representation
          s"timestamp_seconds(floor(cast(cast(($x) as timestamp) as double) / $secs) * $secs)"
        case nt => s"(floor(($x)/($nt))*($nt))"
      }
    }
    // bin_at(x, size, fixedPoint): flooring anchored at fixedPoint instead of
    // zero — numeric sizes and timespan sizes (datetime axes) both supported
    s = expandCalls(s, "bin_at") {
      case Seq(x, n, fp) => n.trim match {
        case TimeSpan(q, u) =>
          val secs = q.toLong * SpanSeconds(u)
          val xs  = s"cast(cast(($x) as timestamp) as double)"
          val fps = s"cast(cast(($fp) as timestamp) as double)"
          s"timestamp_seconds(floor(($xs - $fps) / $secs) * $secs + $fps)"
        case nt => s"(floor((($x)-($fp))/($nt))*($nt)+($fp))"
      }
    }
    // LAST (after bin/ago have consumed their own timespan arguments): bare
    // timespan literals in arithmetic — `ts + 1d`, `span > 2h` — become
    // intervals. `1d` can never be an identifier (no digit-leading names),
    // and string literals are opaque to this pass.
    s = mapOutsideQuotes(s) { seg =>
      "(?<![A-Za-z0-9_'.])(\\d+)([dhms])(?![A-Za-z0-9_])".r.replaceAllIn(seg, m =>
        s"interval '${m.group(1)}' ${SpanUnit(m.group(2))}")
    }
    s
  }

  /** Expand every top-level `name(args…)` call in `s` through `render`,
    * splitting arguments at depth-1 commas (single-quoted strings are
    * opaque: commas/parens inside them don't count). Calls whose argument
    * count `render` does not accept are left unchanged.
    */
  /** `column_ifexists(col, default)` — schema-aware, so it expands at the
    * operator layer (KqlPipeline.applyOp), where the frame's columns are in
    * hand; the column may be spelled bare or quoted. Pure text-level
    * resolution: present → the column reference, absent → the default
    * expression, both then flowing through the normal rewrite.
    */
  def columnIfExists(s: String, hasColumn: String => Boolean): String =
    expandCalls(s, "column_ifexists") {
      case Seq(c, d) =>
        val name = c.trim.stripPrefix("'").stripSuffix("'")
        if (hasColumn(name)) s"`$name`" else d
    }

  private def expandCalls(s0: String, name: String)(
      render: PartialFunction[Seq[String], String]): String = {
    var s    = s0
    var from = 0
    var idx  = s.indexOf(name + "(", from)
    while (idx >= 0) {
      val precededByIdent =
        idx > 0 && (s.charAt(idx - 1).isLetterOrDigit || s.charAt(idx - 1) == '_')
      // quote parity: an odd count of ' before idx puts the match inside a
      // string literal ('' escapes keep parity intact) — leave it alone
      val insideLiteral = s.substring(0, idx).count(_ == '\'') % 2 == 1
      if (precededByIdent || insideLiteral) {
        from = idx + 1
      } else {
        val open   = idx + name.length
        var depth  = 0
        var inQ    = false
        var i      = open
        val splits = Seq.newBuilder[Int] // positions of depth-1 commas
        var end    = -1
        while (i < s.length && end < 0) {
          val c = s.charAt(i)
          if (inQ) { if (c == '\'') inQ = false }
          else c match {
            case '\'' => inQ = true
            case '('  => depth += 1
            case ')'  => depth -= 1; if (depth == 0) end = i
            case ','  => if (depth == 1) splits += i
            case _    =>
          }
          i += 1
        }
        if (end < 0) from = idx + 1 // unbalanced — leave untouched
        else {
          val bounds = (open +: splits.result()) :+ end
          val args = bounds.sliding(2).map { case Seq(a, b) => s.substring(a + 1, b).trim }.toSeq
          if (render.isDefinedAt(args)) {
            val replacement = render(args)
            s = s.substring(0, idx) + replacement + s.substring(end + 1)
            // re-scan from idx+1: nested same-name calls (strictly later
            // indices) still expand, but a replacement that itself BEGINS
            // with `name(` can never re-trigger at the same position — the
            // infinite-expansion guard
            from = idx + 1
          } else from = idx + 1
        }
      }
      idx = s.indexOf(name + "(", from)
    }
    s
  }

  /** Apply `f` to every maximal segment of `s` OUTSIDE single-quoted string
    * literals ('' escaping included); the literals pass through verbatim.
    */
  private def mapOutsideQuotes(s: String)(f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var inQ = false
    s.foreach { c =>
      if (!inQ) {
        if (c == '\'') {
          out.append(f(seg.toString)); seg.clear()
          out.append(c); inQ = true
        } else seg.append(c)
      } else {
        out.append(c)
        if (c == '\'') inQ = false
      }
    }
    out.append(f(seg.toString))
    out.toString
  }
}
