package graft.kql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.KqlCompat

/** KQL *tabular* pipeline over registered tables — the reference's outward
  * query surface (its status view is a full `externaldata | summarize
  * arg_max(...) by ... | order by` pipeline, Kusto/DatabaseGateway.cs:85-96,
  * and its tests assert with tabular KQL: `<table> | count`
  * MirrorLakeKustoTest/Electric/LoadTest.cs:22-27, `… | where ModelYear ==
  * 1994 | count` LoadTest.cs:74-89).
  *
  * Spark-first design: the pipeline is parsed into a plain DataFrame program
  * (filter/withColumn/select/groupBy.agg/orderBy/limit) so Catalyst sees one
  * declarative plan — pushdown, pruning and join strategy work exactly as if
  * the user had written the DataFrame calls by hand. Scalar expressions
  * inside operators are rewritten by [[KqlCompat.rewrite]] (KQL spellings →
  * Spark SQL) and handed to `expr()` — no interpreter, no per-row closures.
  *
  * Supported operators (the practical subset the reference's generated and
  * test queries use):
  * {{{
  *   T
  *   | where <expr>                      // also: filter
  *   | extend name = <expr>, …
  *   | project col, name = <expr>, …
  *   | project-away col, … | project-keep col, … | project-rename new = old, …
  *   | summarize [name =] agg(…), … [by key, name = <expr>, …]
  *   | order by <expr> [asc|desc], …     // also: sort by; KQL default = desc
  *   | top N by <expr> [asc|desc], …
  *   | take N                            // also: limit
  *   | distinct col, … | distinct *
  *   | count                             // → single column `Count`
  *   | getschema                         // ColumnName/ColumnOrdinal/ColumnType
  *   | join [kind=inner|innerunique|leftouter|rightouter|fullouter|
  *           leftsemi|leftanti] (T2 | …) on key, …   // or $left.a == $right.b
  *   | lookup [kind=leftouter|inner] (Dim) on key    // broadcast dim join
  *   | union T2, (T3 | where …)          // by-name, null-padding
  *   | mv-expand arrayCol, …
  *   | parse Col with "lit" name "lit2" name2 …
  *   | make-series n = agg(…) [default = d] on t from a to b step s [by k]
  *     // dense gap-filled series over the NUMERIC [a,b) axis (epoch-nanos
  *     // works directly); axis + value arrays per group
  * }}}
  * Join divergences (documented, loud where silent would mislead): KQL's
  * unstated default kind is `innerunique` (left deduped on keys) — we
  * default to plain `inner`; spell `kind=innerunique` to opt in. Bare-key
  * `on k` outputs ONE key column (Spark using-columns) where KQL emits the
  * right copy as `k1`.
  *
  * Aggregates: count, countif, dcount (exact distinct here — KQL's is HLL;
  * documented divergence), sum/avg/min/max (+ their *if masked forms),
  * dcountif, stdev, variance, percentile (exact here — KQL's is T-digest),
  * arg_max, arg_min, make_set, make_list. KQL string predicates `has`/`contains`/`startswith`/
  * `endswith` (case-insensitive, as in KQL) and `=~`/`!~` are rewritten to
  * Spark SQL. `has` is a whole-TERM match as in ADX ('administrators' has
  * 'admin' is FALSE): the haystack is split on non-alphanumeric boundaries
  * and the needle must equal one term. Divergence: a needle that itself
  * contains non-alphanumerics (a multi-term phrase, e.g. 'a-b') matches the
  * adjacent-term phrase in real ADX but never matches here — use `contains`
  * for substring search. `//` comments are stripped so multi-line pipelines
  * read naturally.
  */
object KqlPipeline {

  /** Parse and run `kql` against tables provided by `resolve`. */
  def run(resolve: String => DataFrame, kql: String): DataFrame = {
    val segs = splitTopLevel(stripComments(kql), '|').map(_.trim).filter(_.nonEmpty)
    require(segs.nonEmpty, "empty KQL pipeline")
    val source = segs.head
    require(!source.contains(' '), s"first pipeline segment must be a table name, got: '$source'")
    segs.tail.foldLeft(resolve(source))(applyOp(resolve))
  }

  /** A join/union/lookup operand: a bare table name, or a parenthesized
    * sub-pipeline run through the same parser.
    */
  private def operand(resolve: String => DataFrame, s: String): DataFrame = {
    val trimmed = s.trim
    if (trimmed.startsWith("(") && trimmed.endsWith(")"))
      run(resolve, trimmed.substring(1, trimmed.length - 1))
    else {
      require(!trimmed.contains(' '), s"expected a table name or (sub-pipeline), got: '$trimmed'")
      resolve(trimmed)
    }
  }

  // ---- operator dispatch ---------------------------------------------------

  private def applyOp(resolve: String => DataFrame)(df: DataFrame, seg: String): DataFrame = {
    val (word, rest) = seg.span(c => !c.isWhitespace)
    word.toLowerCase match {
      case "where" | "filter" =>
        df.filter(expr(tx(rest)))

      case "extend" =>
        splitTopLevel(rest, ',').map(_.trim).foldLeft(df) { (d, item) =>
          assignment(item) match {
            case Some((name, e)) => d.withColumn(name, expr(tx(e)))
            case None            => fail(s"extend needs `name = expr`, got: '$item'")
          }
        }

      case "project" =>
        df.select(splitTopLevel(rest, ',').map(_.trim).map { item =>
          assignment(item) match {
            case Some((name, e)) => expr(tx(e)).as(name)
            case None            => expr(tx(item))
          }
        }: _*)

      case "project-away" =>
        df.drop(splitTopLevel(rest, ',').map(_.trim): _*)

      case "project-keep" =>
        df.select(splitTopLevel(rest, ',').map(s => col(s.trim)): _*)

      case "project-rename" =>
        splitTopLevel(rest, ',').map(_.trim).foldLeft(df) { (d, item) =>
          assignment(item) match {
            case Some((newName, oldName)) => d.withColumnRenamed(oldName.trim, newName)
            case None => fail(s"project-rename needs `new = old`, got: '$item'")
          }
        }

      case "summarize" =>
        val (aggsPart, byPart) = splitAtTopLevelBy(rest)
        val aggs = splitTopLevel(aggsPart, ',').map(_.trim).filter(_.nonEmpty).map(aggItem)
        val keys = byPart.toSeq.flatMap(splitTopLevel(_, ',').map(_.trim).map { item =>
          assignment(item) match {
            case Some((name, e)) => expr(tx(e)).as(name)
            case None            => expr(tx(item))
          }
        })
        (aggs, keys) match {
          case (Nil, Nil) => fail("summarize needs aggregates and/or a by-clause")
          case (Nil, ks)  => df.select(ks: _*).distinct() // `summarize by k` = distinct
          case (as, Nil)  => df.agg(as.head, as.tail: _*)
          case (as, ks)   => df.groupBy(ks: _*).agg(as.head, as.tail: _*)
        }

      case "order" | "sort" =>
        val r = rest.trim
        require(r.toLowerCase.startsWith("by") && r.length > 2 && r.charAt(2).isWhitespace,
          s"expected `$word by …`")
        df.orderBy(orderItems(r.drop(3)): _*)

      case "top" =>
        rest.trim.split("\\s+", 3) match {
          case Array(n, by, items) if by.equalsIgnoreCase("by") =>
            df.orderBy(orderItems(items): _*).limit(n.toInt)
          case _ => fail(s"expected `top N by <expr>`, got: '$seg'")
        }

      case "take" | "limit" =>
        df.limit(rest.trim.toInt)

      case "count" =>
        require(rest.trim.isEmpty, s"`count` takes no arguments, got: '$rest'")
        df.agg(count(lit(1)).as("Count"))

      // schema introspection (ADX column order + catalog type names);
      // metadata-only — builds a local frame from the analyzed schema
      case "getschema" =>
        require(rest.trim.isEmpty, s"`getschema` takes no arguments, got: '$rest'")
        val rows = df.schema.fields.zipWithIndex.map { case (f, i) =>
          (f.name, i.toLong, f.dataType.catalogString)
        }
        val session = df.sparkSession
        import session.implicits._
        rows.toSeq.toDF("ColumnName", "ColumnOrdinal", "ColumnType")

      case "distinct" =>
        if (rest.trim == "*") df.distinct()
        else df.select(splitTopLevel(rest, ',').map(s => col(s.trim)): _*).distinct()

      case "join" =>
        val (kind, body) = joinKind(rest.trim)
        val (rightSrc, onClause) = splitAtTopLevelOn(body)
        val right = operand(resolve, rightSrc)
        applyJoin(df, right, kind, onClause)

      // KQL `lookup`: the dimension-enrichment join — semantically a
      // leftouter (or inner) join against a SMALL table, so the right side
      // gets a broadcast hint: zero shuffle on the fact side at any scale.
      case "lookup" =>
        val (kind, body) = joinKind(rest.trim, default = "leftouter")
        require(kind == "leftouter" || kind == "inner",
          s"lookup supports kind=leftouter|inner, got '$kind'")
        val (rightSrc, onClause) = splitAtTopLevelOn(body)
        val right = broadcast(operand(resolve, rightSrc))
        applyJoin(df, right, kind, onClause)

      case "union" =>
        splitTopLevel(rest, ',').map(_.trim).filter(_.nonEmpty).foldLeft(df) { (acc, src) =>
          // KQL union matches columns by NAME and null-pads the gaps
          acc.unionByName(operand(resolve, src), allowMissingColumns = true)
        }

      // `mv-expand c[, d]`: one output row per element of the dynamic
      // (array) column, other columns repeated; empty/null arrays drop the
      // row (KQL default). Multiple columns expand in PARALLEL as in KQL —
      // element i of each array lands on row i, shorter arrays null-padded
      // (arrays_zip + ONE generator), NOT a cartesian product (chain
      // separate mv-expand operators for that). Spark-first: explode, no UDF.
      case "mv-expand" =>
        val cols = splitTopLevel(rest, ',').map(_.trim).filter(_.nonEmpty)
        require(cols.nonEmpty, "mv-expand needs at least one column")
        require(cols.distinct.size == cols.size, "mv-expand columns must be distinct")
        if (cols.size == 1) df.withColumn(cols.head, explode(col(cols.head)))
        else {
          val tmp = "__graft_mv_zip"
          cols.foldLeft(
            df.withColumn(tmp, explode(arrays_zip(cols.map(col): _*))))(
            (d, c) => d.withColumn(c, col(tmp).getField(c))).drop(tmp)
        }

      // `parse Col with ['*'] "lit" Name1 "lit2" Name2 …`: ANCHORED scan, as
      // in KQL — the pattern must match from the start of the value (lead
      // with `*` to skip a prefix; a bare `*` anywhere matches-and-discards).
      // Each literal is matched verbatim, each name captures lazily up to
      // the next literal (the final name captures to end of value). Compiles
      // to ONE regexp pattern evaluated per extracted column (codegen'd
      // RegExpExtract; the pattern compiles once per task via Spark's regex
      // cache). Names may not repeat; non-matching rows yield empty strings
      // (KQL yields nulls — documented divergence of regexp_extract).
      case "parse" =>
        val body = rest.trim
        val withIdx = body.toLowerCase.indexOf(" with ")
        require(withIdx > 0, s"expected `parse <col> with <pattern>`, got: '$seg'")
        val src   = body.substring(0, withIdx).trim
        val parts = parsePattern(body.substring(withIdx + 6))
        val regex = "^" + parts.map {
          case Left(litText) => java.util.regex.Pattern.quote(litText)
          case Right("*")    => "(?:.*?)" // skip, no capture
          case Right(_)      => "(.*?)"
        }.mkString + "$" // last capture extends to end of value
        val names = parts.collect { case Right(n) if n != "*" => n }
        require(names.distinct.size == names.size, "parse capture names must be unique")
        names.zipWithIndex.foldLeft(df) { case (d, (n, i)) =>
          d.withColumn(n, regexp_extract(col(src), regex, i + 1))
        }

      // `make-series name = agg(…) [default = d] on t from a to b step s
      //  [by keys]`: dense gap-filled series per group over the NUMERIC axis
      // [a, b) — works directly on events.ts epoch-nanos (timestamp axes:
      // bin to epoch first). Spark-first: binned partial agg → ONE shuffle
      // per group key → the dense grid is a `sequence`/`transform` pair
      // evaluated per output row; gaps fill via try_element_at on a
      // collect_list map, no driver loop and no per-point join.
      case "make-series" =>
        val (aggPart0, onRest) = splitAtTopLevelKeyword(rest, "on") match {
          case (a, Some(r)) => (a, r)
          case _            => fail(s"make-series needs an `on` clause: '$seg'")
        }
        val (aggPart, defaultE) = splitAtTopLevelKeyword(aggPart0, "default") match {
          case (a, Some(d)) =>
            val dd = d.trim
            require(dd.startsWith("="), s"expected `default = <value>`, got: '$d'")
            (a, expr(tx(dd.drop(1))))
          case (a, None) => (a, lit(0L))
        }
        val (name, aggSpec) = assignment(aggPart.trim).getOrElse(
          fail(s"make-series needs `name = agg(...)`, got: '$aggPart'"))
        val (timeCol0, fromRest) = splitAtTopLevelKeyword(onRest, "from") match {
          case (t0, Some(r)) => (t0.trim, r)
          case _             => fail("make-series needs `from <start>`")
        }
        val (startE, toRest) = splitAtTopLevelKeyword(fromRest, "to") match {
          case (a, Some(r)) => (a.trim, r)
          case _            => fail("make-series needs `to <stop>`")
        }
        val (stopE, stepRest) = splitAtTopLevelKeyword(toRest, "step") match {
          case (a, Some(r)) => (a.trim, r)
          case _            => fail("make-series needs `step <size>`")
        }
        val (stepE, keyNames) = splitAtTopLevelKeyword(stepRest, "by") match {
          case (a, Some(k)) => (a.trim, splitTopLevel(k, ',').map(_.trim).filter(_.nonEmpty))
          case (a, None)    => (a.trim, Seq.empty[String])
        }
        val (start, stop, step) = (expr(tx(startE)), expr(tx(stopE)), expr(tx(stepE)))
        val t       = col(timeCol0)
        val binCol  = floor((t - start) / step) * step + start
        val aggCol  = aggItem(s"$name = $aggSpec")
        val keys    = keyNames.map(col)
        val binned  = df.filter(t >= start && t < stop)
          .withColumn("__graft_bin", binCol)
          .groupBy(keys :+ col("__graft_bin"): _*).agg(aggCol)
        val axis = filter(sequence(start, stop, step), x => x < stop)
        binned
          .groupBy(keys: _*)
          .agg(map_from_entries(
            collect_list(struct(col("__graft_bin"), col(name)))).as("__graft_m"))
          .select(keys ++ Seq(
            axis.as(timeCol0),
            transform(axis, x =>
              coalesce(try_element_at(col("__graft_m"), x), defaultE)).as(name)): _*)

      case other => fail(s"unsupported KQL operator: '$other'")
    }
  }

  // ---- join ----------------------------------------------------------------

  /** KQL → Spark join kinds. KQL's unstated default is `innerunique` (left
    * side deduplicated on the keys); we refuse the silent dedup and default
    * to plain `inner` — spell `kind=innerunique` to get the KQL behavior.
    */
  private val JoinKinds = Map(
    "inner" -> "inner", "innerunique" -> "inner",
    "leftouter" -> "left_outer", "rightouter" -> "right_outer",
    "fullouter" -> "full_outer", "leftsemi" -> "left_semi",
    "leftanti" -> "left_anti", "anti" -> "left_anti")

  // (?s): a join/lookup body legitimately spans lines (multi-line
  // sub-pipelines); without DOTALL the full-match case-pattern never fires
  private val KindRe = """(?s)^kind\s*=\s*([a-z]+)\s*(.*)$""".r

  private def joinKind(body: String, default: String = "inner"): (String, String) =
    body match {
      case KindRe(k, restOf) =>
        require(JoinKinds.contains(k), s"unsupported join kind '$k'")
        (k, restOf)
      case _ => (default, body)
    }

  private def applyJoin(left: DataFrame, right: DataFrame, kqlKind: String,
      onClause: String): DataFrame = {
    val sparkKind = JoinKinds(kqlKind)
    val terms   = splitTopLevel(onClause, ',').map(_.trim).filter(_.nonEmpty)
    require(terms.nonEmpty, "join needs an `on` clause")
    val usingCols = terms.filter(t => !t.contains("=="))
    // $left.a == $right.b pairs, parsed up front so innerunique can see the
    // left key names in EITHER on-clause form
    val exprPairs = terms.filter(_.contains("==")).map { t =>
      val sides = t.split("==").map(_.trim)
      require(sides.length == 2 && sides(0).startsWith("$left.") &&
        sides(1).startsWith("$right."),
        "expected `$left.a == $right.b`, got: '" + t + "'")
      (sides(0).stripPrefix("$left."), sides(1).stripPrefix("$right."))
    }
    // innerunique: KQL dedups the LEFT side on the join keys, with the
    // surviving row unspecified — dropDuplicates matches that contract
    // (don't use innerunique where the surviving row's other columns matter)
    val leftDeduped =
      if (kqlKind == "innerunique")
        left.dropDuplicates(usingCols ++ exprPairs.map(_._1))
      else left
    if (exprPairs.isEmpty) leftDeduped.join(right, usingCols.toSeq, sparkKind)
    else {
      require(usingCols.isEmpty,
        "join mixes bare key names and $left/$right equalities — use one form")
      val cond = exprPairs.map { case (l, r) =>
        leftDeduped(l) === right(r)
      }.reduce(_ && _)
      leftDeduped.join(right, cond, sparkKind)
    }
  }

  /** Split a join body at the top-level ` on ` keyword. */
  private def splitAtTopLevelOn(s: String): (String, String) =
    splitAtTopLevelKeyword(s, "on") match {
      case (before, Some(after)) => (before.trim, after.trim)
      case _                     => fail(s"join/lookup needs an `on` clause: '$s'")
    }

  /** Tokenize a `parse … with` pattern into literals (Left) and capture
    * names (Right).
    */
  private def parsePattern(s: String): Seq[Either[String, String]] = {
    val out = Seq.newBuilder[Either[String, String]]
    var i   = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val end = s.indexOf(c, i + 1)
        require(end > 0, s"unterminated literal in parse pattern: '$s'")
        out += Left(s.substring(i + 1, end))
        i = end + 1
      } else {
        val end = {
          var j = i
          while (j < s.length && !s.charAt(j).isWhitespace &&
            s.charAt(j) != '\'' && s.charAt(j) != '"') j += 1
          j
        }
        out += Right(s.substring(i, end))
        i = end
      }
    }
    out.result()
  }

  // ---- aggregates ----------------------------------------------------------

  private def aggItem(item: String): Column = {
    val (nameOpt, call) = assignment(item) match {
      case Some((n, e)) => (Some(n), e.trim)
      case None         => (None, item.trim)
    }
    val open = call.indexOf('(')
    require(open > 0 && call.endsWith(")"), s"bad aggregate call: '$item'")
    val fn   = call.substring(0, open).trim.toLowerCase
    val args = splitTopLevel(call.substring(open + 1, call.length - 1), ',')
      .map(_.trim).filter(_.nonEmpty)
    def a(i: Int): Column = expr(tx(args(i)))
    def slug(s: String): String = s.replaceAll("[^A-Za-z0-9_]", "_")
    val (c, defName) = fn match {
      case "count" if args.isEmpty => (count(lit(1)), "count_")
      case "countif"               => (count(when(a(0), lit(1))), "countif_")
      // *if family: the predicate masks rows to NULL, which every Spark agg
      // ignores — one pass, no self-join
      case "sumif"                 => (sum(when(a(1), a(0))), s"sumif_${slug(args(0))}")
      case "avgif"                 => (avg(when(a(1), a(0))), s"avgif_${slug(args(0))}")
      case "minif"                 => (min(when(a(1), a(0))), s"minif_${slug(args(0))}")
      case "maxif"                 => (max(when(a(1), a(0))), s"maxif_${slug(args(0))}")
      case "dcountif"              => (countDistinct(when(a(1), a(0))), s"dcountif_${slug(args(0))}")
      case "stdev"                 => (stddev_samp(a(0)), s"stdev_${slug(args(0))}")
      case "variance"              => (var_samp(a(0)), s"variance_${slug(args(0))}")
      // KQL percentile() is an approximation (T-digest); we compute the
      // EXACT percentile (documented divergence, same spirit as dcount) with
      // KQL's nearest-rank-style argument: percentile(x, 95)
      case "percentile" =>
        (expr(s"percentile(${tx(args(0))}, ${args(1).trim.toDouble / 100.0})"),
          s"percentile_${slug(args(0))}_${slug(args(1))}")
      // exact distinct (KQL dcount is an HLL estimate; we refuse to be wrong)
      case "dcount"                => (countDistinct(a(0)), s"dcount_${slug(args(0))}")
      // the KQL-faithful estimator, for users who WANT the sketch: HLL++ at
      // rsd 0.05 (mergeable, constant memory — the 100 TB dcount)
      case "dcount_hll" | "hll"    => (approx_count_distinct(a(0), 0.05),
                                        s"dcount_hll_${slug(args(0))}")
      case "sum"                   => (sum(a(0)), s"sum_${slug(args(0))}")
      case "avg"                   => (avg(a(0)), s"avg_${slug(args(0))}")
      case "min"                   => (min(a(0)), s"min_${slug(args(0))}")
      case "max"                   => (max(a(0)), s"max_${slug(args(0))}")
      // arg_max(ord, ret): the row-wise maximizer — Spark's max_by(ret, ord)
      case "arg_max"               => (max_by(a(1), a(0)), slug(args(1)))
      case "arg_min"               => (min_by(a(1), a(0)), slug(args(1)))
      case "make_set"              => (array_sort(collect_set(a(0))), s"set_${slug(args(0))}")
      case "make_list"             => (collect_list(a(0)), s"list_${slug(args(0))}")
      case other                   => fail(s"unsupported aggregate: '$other'")
    }
    c.as(nameOpt.getOrElse(defName))
  }

  // ---- ordering ------------------------------------------------------------

  /** KQL `order by` / `top … by` default to DESCENDING (ADX semantics). */
  private def orderItems(s: String): Seq[Column] =
    splitTopLevel(s, ',').map(_.trim).map { item =>
      val l = item.toLowerCase
      if (l.endsWith(" asc")) expr(tx(item.dropRight(4))).asc
      else if (l.endsWith(" desc")) expr(tx(item.dropRight(5))).desc
      else expr(tx(item)).desc
    }

  // ---- scalar translation --------------------------------------------------

  /** KQL scalar text → Spark SQL: infix string predicates first, then the
    * shared [[KqlCompat.rewrite]] (casts, datetime/ago/bin/startof*, name
    * swaps). Both passes are no-ops on Spark-SQL-native input.
    */
  private def tx(kql: String): String = KqlCompat.rewrite(infixOps(kql))

  // LHS: identifier or simple call; RHS: quoted literal or identifier.
  private val InfixOperand = """[A-Za-z_][A-Za-z0-9_]*(?:\((?:[^()']|'[^']*')*\))?|'(?:[^']|'')*'"""
  private val InfixRe =
    s"""($InfixOperand)\\s+(!?)(has|contains|startswith|endswith)\\s+($InfixOperand)""".r
  private val CiEqRe = s"""($InfixOperand)\\s*(=~|!~)\\s*($InfixOperand)""".r

  // A match starting INSIDE a string literal is left untouched; a match
  // starting outside may legitimately span into one (`col has 'term'` — the
  // RHS literal is one operand). Scans both quote kinds, matching the
  // lexer's view in splitTopLevel/stripComments (single OR double quotes
  // open a literal; the same char closes it).
  private def insideLiteral(s: String, pos: Int): Boolean = {
    var q = ' '
    var i = 0
    while (i < pos) {
      val c = s.charAt(i)
      if (q != ' ') { if (c == q) q = ' ' }
      else if (c == '\'' || c == '"') q = c
      i += 1
    }
    q != ' '
  }

  private def infixOps(s: String): String = {
    val r = InfixRe.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement {
      if (insideLiteral(s, m.start)) m.matched
      else {
        val (l, neg, op, rhs) = (m.group(1), m.group(2), m.group(3), m.group(4))
        val core = op match {
          // ADX `has` = whole-term match: 'administrators' has 'admin' is
          // FALSE. Split the haystack into alphanumeric terms and require
          // term equality (see scaladoc for the multi-term-needle caveat).
          case "has"        => s"array_contains(split(lower($l), '[^0-9a-z]+'), lower($rhs))"
          case "contains"   => s"contains(lower($l), lower($rhs))"
          case "startswith" => s"startswith(lower($l), lower($rhs))"
          case "endswith"   => s"endswith(lower($l), lower($rhs))"
        }
        if (neg == "!") s"(NOT $core)" else core
      }
    })
    CiEqRe.replaceAllIn(r, m => java.util.regex.Matcher.quoteReplacement {
      if (insideLiteral(r, m.start)) m.matched
      else {
        val (l, op, rhs) = (m.group(1), m.group(2), m.group(3))
        val core = s"lower($l) = lower($rhs)"
        if (op == "!~") s"(NOT $core)" else core
      }
    })
  }

  // ---- lexing helpers ------------------------------------------------------

  /** `name = expr` when `name` is a bare identifier and `=` is not part of
    * `==`/`!=`/`<=`/`>=`/`=~`.
    */
  private val AssignRe = """^([A-Za-z_][A-Za-z0-9_]*)\s*=(?![=~])\s*(.+)$""".r
  private def assignment(item: String): Option[(String, String)] = item match {
    case AssignRe(name, e) => Some((name, e))
    case _                 => None
  }

  /** Split `s` at top-level occurrences of `sep` — outside single/double
    * quotes, outside parens/brackets; `||` is atomic when splitting on `|`.
    */
  private[kql] def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out   = Seq.newBuilder[String]
    val cur   = new StringBuilder
    var depth = 0
    var q     = ' ' // active quote char, NUL = none
    var i     = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != ' ') { cur.append(c); if (c == q) q = ' ' }
      else c match {
        case '\'' | '"'          => cur.append(c); q = c
        case '(' | '['           => depth += 1; cur.append(c)
        case ')' | ']'           => depth -= 1; cur.append(c)
        case '|' if sep == '|' && i + 1 < s.length && s.charAt(i + 1) == '|' =>
          cur.append("||"); i += 1
        case `sep` if depth == 0 => out += cur.toString; cur.clear()
        case _                   => cur.append(c)
      }
      i += 1
    }
    out += cur.toString
    out.result()
  }

  /** Split a summarize body at the top-level `by` keyword. Returns
    * (aggregates, Some(keys)) or (aggregates, None).
    */
  private def splitAtTopLevelBy(s: String): (String, Option[String]) =
    splitAtTopLevelKeyword(s, "by")

  /** Split `s` at the first top-level, word-bounded, case-insensitive
    * occurrence of keyword `kw` — outside quotes (either kind) and
    * brackets. The one scanner behind `summarize … by`, `join … on` and the
    * make-series clause keywords.
    */
  private def splitAtTopLevelKeyword(s: String, kw: String): (String, Option[String]) = {
    val n     = kw.length
    var depth = 0
    var q     = ' '
    var i     = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != ' ') { if (c == q) q = ' ' }
      else c match {
        case '\'' | '"' => q = c
        case '(' | '['  => depth += 1
        case ')' | ']'  => depth -= 1
        case _ if depth == 0 && s.regionMatches(true, i, kw, 0, n)
            && (i == 0 || s.charAt(i - 1).isWhitespace)
            && (i + n == s.length || s.charAt(i + n).isWhitespace) =>
          return (s.substring(0, i), Some(s.substring(i + n)))
        case _ =>
      }
      i += 1
    }
    (s, None)
  }

  /** Strip `//` line comments outside string literals. */
  private[kql] def stripComments(s: String): String =
    s.linesIterator.map { line =>
      var q   = ' '
      var cut = -1
      var i   = 0
      while (i < line.length && cut < 0) {
        val c = line.charAt(i)
        if (q != ' ') { if (c == q) q = ' ' }
        else if (c == '\'' || c == '"') q = c
        else if (c == '/' && i + 1 < line.length && line.charAt(i + 1) == '/') cut = i
        i += 1
      }
      if (cut < 0) line else line.substring(0, cut)
    }.mkString("\n")

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"KQL pipeline: $msg")
}
