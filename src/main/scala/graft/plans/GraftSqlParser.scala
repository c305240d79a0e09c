package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.types.{DataType, StructType}

/** Dialect-bridging SQL parser: the two constructs the shared oracle
  * dialect (DuckDB) uses that Spark's grammar cannot express are
  * rewritten here, at parse level, so the SAME SQL text runs verbatim
  * on both engines — closing the dual-dialect board [[graft.SqlCompat]]
  * opened for the function surface (reference `README.md:21`: ad-hoc
  * analyst SQL is the reference's declared user surface).
  *
  *  1. **`ASOF JOIN`** (q61/q90's greatest-at-or-before / least-at-or-
  *     after enrichment): textually demoted to a plain `JOIN` carrying a
  *     marker conjunct, then the parsed join is rewritten to
  *     candidates → per-left-row `row_number` over the right timestamp
  *     → keep rank 1. The left-row identity is a synthesized
  *     `monotonically_increasing_id` — no unique-key assumption. Inner
  *     semantics (unmatched left rows drop), matching DuckDB's default.
  *     The window partitions by left row — parallel at any scale — but
  *     the candidate join is a range join; the operator face
  *     ([[graft.operators.Temporal.asofJoin]], the union+window plan)
  *     stays the 100-TB path, this face is analyst convenience.
  *  2. **`WITH RECURSIVE` + UNION fixpoint** (q113's transitive
  *     closure): unrolled to `RecursionUnroll` UNION-deduped iterations
  *     — the bounded-recursion contract: equal to the fixpoint whenever
  *     it is reached within the unroll depth (path length ≤ depth+1;
  *     near-dup cluster diameters are far below it), the same bound a
  *     delta-iteration operator would run to. Spark's native recursive
  *     CTE is UNION ALL-only and cannot terminate on the cyclic
  *     reachability graphs this idiom walks.
  *
  * Everything else delegates untouched; both rewrites are gated on a
  * cheap substring probe so the common path pays one `contains`. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = {
    val t = rewriteRecursive(rewriteAsofText(sqlText))
    val plan = delegate.parsePlan(t)
    if (t ne sqlText) rewriteAsofPlan(plan) else plan
  }

  override def parseQuery(sqlText: String): LogicalPlan = {
    val t = rewriteRecursive(rewriteAsofText(sqlText))
    val plan = delegate.parseQuery(t)
    if (t ne sqlText) rewriteAsofPlan(plan) else plan
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  /** Safety rails for the parse-time fixpoint iteration: recursion
    * depth (matches Spark's own cteRecursionLevelLimit default) and the
    * working-set row cap for the driver-collected state — beyond either
    * the analyst is running graph computation at data scale and should
    * use the operator face ([[graft.operators.Dedup.connectedComponents]]
    * and friends), which iterates distributed with per-round
    * checkpoints instead of a collected relation. */
  val RecursionMaxIter = 100
  val RecursionMaxRows = 2000000

  private val MarkerLit = "__graft_asof__"

  // ---------------------------------------------------------------- ASOF

  private val asofRe = java.util.regex.Pattern.compile(
    "(?is)\\bASOF\\s+((?:LEFT\\s+)(?:OUTER\\s+)?)?JOIN\\s+(.+?)\\s+ON\\s+")

  /** `A ASOF [LEFT [OUTER]] JOIN B ON cond` → `A [LEFT] JOIN B ON
    * '<marker>' = '<marker>' AND cond` — the marker survives parsing as
    * a literal equality conjunct and tags exactly the joins
    * [[rewriteAsofPlan]] must transform (DuckDB writes the outer
    * variant `ASOF LEFT JOIN`; the `LEFT ASOF JOIN` order also works —
    * `ASOF JOIN` then matches with LEFT already in place). Constraint
    * (documented, asserted by the regex shape): the right side is a
    * named relation or aliased relation, not a parenthesized subquery
    * containing `ON`. */
  private[plans] def rewriteAsofText(sql: String): String =
    if (!sql.toLowerCase(java.util.Locale.ROOT).contains("asof")) sql
    else asofRe.matcher(sql)
      .replaceAll(s"$$1JOIN $$2 ON '$MarkerLit' = '$MarkerLit' AND ")

  private def isMarker(e: Expression): Boolean = e match {
    case EqualTo(Literal(a, _), Literal(b, _)) =>
      String.valueOf(a) == MarkerLit && String.valueOf(b) == MarkerLit
    case _ => false
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def relationAliases(p: LogicalPlan): Set[String] = p match {
    case SubqueryAlias(id, _) => Set(id.name.toLowerCase(java.util.Locale.ROOT))
    case r: UnresolvedRelation =>
      Set(r.multipartIdentifier.last.toLowerCase(java.util.Locale.ROOT))
    case other => other.children.flatMap(relationAliases).toSet
  }

  /** Rewrite every marker-tagged join into the as-of shape. Inner
    * (DuckDB's default: unmatched left rows drop) and LEFT OUTER
    * (unmatched left rows keep with null right columns) both rewrite;
    * the outer form works because the rank window orders candidate
    * timestamps NULLS LAST, so the null-padded row ranks first exactly
    * when a left row has no candidate. */
  private[plans] def rewriteAsofPlan(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case j @ Join(left, right, jt, Some(cond), hint)
          if (jt == Inner || jt == LeftOuter) &&
            conjuncts(cond).exists(isMarker) =>
        val conds = conjuncts(cond).filterNot(isMarker)
        val rightNames = relationAliases(right)
        def ofRight(e: Expression): Boolean = e match {
          case UnresolvedAttribute(parts) if parts.size >= 2 =>
            rightNames.contains(
              parts(parts.size - 2).toLowerCase(java.util.Locale.ROOT))
          case _ => false
        }
        // the single non-equality comparison is the as-of ordering:
        // right ≤/< left → latest-at-or-before (DESC);
        // right ≥/> left → earliest-at-or-after (ASC)
        val ordering = conds.collectFirst {
          case c @ LessThanOrEqual(a, b) if ofRight(a) && !ofRight(b) =>
            (a, Descending)
          case c @ LessThan(a, b) if ofRight(a) && !ofRight(b) =>
            (a, Descending)
          case c @ GreaterThanOrEqual(a, b) if ofRight(a) && !ofRight(b) =>
            (a, Ascending)
          case c @ GreaterThan(a, b) if ofRight(a) && !ofRight(b) =>
            (a, Ascending)
          case c @ LessThanOrEqual(a, b) if ofRight(b) && !ofRight(a) =>
            (b, Ascending)
          case c @ LessThan(a, b) if ofRight(b) && !ofRight(a) =>
            (b, Ascending)
          case c @ GreaterThanOrEqual(a, b) if ofRight(b) && !ofRight(a) =>
            (b, Descending)
          case c @ GreaterThan(a, b) if ofRight(b) && !ofRight(a) =>
            (b, Descending)
        }
        ordering match {
          case None =>
            // no recognizable as-of inequality — degrade to the plain
            // join the text already demoted to
            Join(left, right, jt, conds.reduceOption(And), hint)
          case Some((rightTs, dir)) =>
            val lid = Alias(MonotonicallyIncreasingID(), "__asof_lid")()
            val leftT = Project(Seq(UnresolvedStar(None), lid), left)
            val joined =
              Join(leftT, right, jt, conds.reduceOption(And), hint)
            // NULLS LAST in BOTH directions: under LeftOuter the
            // null-padded candidate must rank first only when a left
            // row has no real match (ascending would default nulls
            // first and shadow genuine matches)
            val rn = Alias(
              WindowExpression(
                UnresolvedFunction("row_number", Nil, isDistinct = false),
                WindowSpecDefinition(
                  Seq(UnresolvedAttribute("__asof_lid")),
                  Seq(SortOrder(rightTs, dir, NullsLast, Nil)),
                  UnspecifiedFrame)),
              "__asof_rn")()
            Filter(
              EqualTo(UnresolvedAttribute("__asof_rn"), Literal(1)),
              Project(Seq(UnresolvedStar(None), rn), joined))
        }
    }

  // ----------------------------------------------------- WITH RECURSIVE

  /** Case-insensitive word search outside string literals. */
  private def containsWord(text: String, word: String): Boolean =
    java.util.regex.Pattern
      .compile("(?i)\\b" + java.util.regex.Pattern.quote(word) + "\\b")
      .matcher(stripLiterals(text)).find()

  /** Blank out '...' literals so scanning never trips on quoted text
    * (lengths preserved → indexes stay valid). */
  private def stripLiterals(s: String): String = {
    val out = s.toCharArray
    var i = 0
    var inStr = false
    while (i < out.length) {
      val c = out(i)
      if (c == '\'') { inStr = !inStr; }
      else if (inStr) out(i) = ' '
      i += 1
    }
    new String(out)
  }

  private case class Cte(name: String, colList: String, bodyStart: Int,
                         bodyEnd: Int, defStart: Int, defEnd: Int)

  /** Parse the WITH list's CTE definitions (name [(cols)] AS (body)),
    * returning spans into the original text. Depth-0 commas separate
    * definitions; the list ends at the first depth-0 token that cannot
    * start a definition (the main SELECT). */
  private def parseCtes(sql: String, fromIdx: Int): Seq[Cte] = {
    val masked = stripLiterals(sql)
    val ctes = scala.collection.mutable.Buffer[Cte]()
    var i = fromIdx
    val n = sql.length
    def skipWs(j0: Int): Int = {
      var j = j0; while (j < n && masked(j).isWhitespace) j += 1; j
    }
    def matchParen(open: Int): Int = {
      var depth = 0; var j = open
      while (j < n) {
        if (masked(j) == '(') depth += 1
        else if (masked(j) == ')') { depth -= 1; if (depth == 0) return j }
        j += 1
      }
      -1
    }
    var more = true
    while (more) {
      i = skipWs(i)
      val defStart = i
      // CTE name
      val nameStart = i
      while (i < n && (masked(i).isLetterOrDigit || masked(i) == '_')) i += 1
      if (i == nameStart) return ctes.toSeq
      val name = sql.substring(nameStart, i)
      i = skipWs(i)
      // optional column list
      var colList = ""
      if (i < n && masked(i) == '(') {
        val close = matchParen(i)
        colList = sql.substring(i, close + 1)
        i = skipWs(close + 1)
      }
      // AS
      if (!(i + 2 <= n && sql.regionMatches(true, i, "AS", 0, 2)))
        return ctes.toSeq
      i = skipWs(i + 2)
      if (i >= n || masked(i) != '(') return ctes.toSeq
      val bodyOpen = i
      val bodyClose = matchParen(bodyOpen)
      if (bodyClose < 0) return ctes.toSeq
      ctes += Cte(name, colList, bodyOpen + 1, bodyClose, defStart,
        bodyClose + 1)
      i = skipWs(bodyClose + 1)
      if (i < n && masked(i) == ',') i += 1 else more = false
    }
    ctes.toSeq
  }

  /** Split a CTE body at its single top-level `UNION` (distinct — the
    * fixpoint idiom; `UNION ALL` does not match). */
  private def splitUnion(body: String): Option[(String, String)] = {
    val masked = stripLiterals(body)
    var depth = 0
    var i = 0
    val n = body.length
    while (i < n) {
      val c = masked(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && (c == 'U' || c == 'u') &&
          i + 5 <= n && body.regionMatches(true, i, "UNION", 0, 5) &&
          (i == 0 || !masked(i - 1).isLetterOrDigit) &&
          (i + 5 == n || !masked(i + 5).isLetterOrDigit)) {
        var j = i + 5
        while (j < n && masked(j).isWhitespace) j += 1
        val isAll = j + 3 <= n && body.regionMatches(true, j, "ALL", 0, 3) &&
          (j + 3 == n || !masked(j + 3).isLetterOrDigit)
        if (!isAll)
          return Some((body.substring(0, i), body.substring(i + 5)))
        i = j
      }
      i += 1
    }
    None
  }

  private def replaceWord(text: String, word: String, to: String): String =
    java.util.regex.Pattern
      .compile("(?i)\\b" + java.util.regex.Pattern.quote(word) + "\\b")
      .matcher(text).replaceAll(java.util.regex.Matcher.quoteReplacement(to))

  /** Execute every self-referencing UNION-fixpoint CTE under
    * `WITH RECURSIVE` as a parse-time DELTA ITERATION — the exact
    * semantics DuckDB's recursive executor applies (dedup against ALL
    * accumulated rows each round, stop when a round adds nothing) — and
    * substitute the converged relation behind a temp view. A textual
    * unroll is a trap here: Spark ultimately INLINES CTEs, and any
    * fixpoint step references its previous state at least twice, so K
    * unrolled levels explode to 2^K plan leaves (measured: analyzer
    * heap death at K=12 on the q113 oracle). The iteration instead runs
    * one bounded Spark job per round — the non-recursive CTE prefix
    * plus the step text over the current state as a broadcastable
    * LOCAL relation — and the final state lands as a LocalRelation-
    * backed view (self-contained: no pinned blocks, nothing to release).
    *
    * The working set is driver-collected (capped at
    * [[RecursionMaxRows]]): recursive SQL is an ANALYST idiom for
    * closures over modest relations; data-scale graph iteration belongs
    * to the operator face (`Dedup.connectedComponents`), which this
    * rewrite names in its failure message. */
  private[plans] def rewriteRecursive(sql: String): String = {
    val recRe = java.util.regex.Pattern
      .compile("(?is)\\bWITH\\s+RECURSIVE\\b")
    val m = recRe.matcher(sql)
    if (!m.find()) return sql
    val spark = org.apache.spark.sql.SparkSession.getActiveSession
      .getOrElse(return sql) // no session to iterate on — let Spark's
                             // own parser report the recursion
    val head = sql.substring(0, m.start())
    val ctes = parseCtes(sql, m.end())
    if (ctes.isEmpty) return sql
    val tail = sql.substring(ctes.last.defEnd)
    val outDefs = scala.collection.mutable.Buffer[String]()
    var executed = false
    var residualRecursion = false
    ctes.foreach { c =>
      val body = sql.substring(c.bodyStart, c.bodyEnd)
      val recursive = containsWord(body, c.name)
      (if (recursive) splitUnion(body) else None) match {
        case None =>
          // non-recursive, or UNION ALL recursion (Spark 4 executes
          // that natively under its own level limit) — pass through,
          // and keep the RECURSIVE keyword for it
          residualRecursion ||= recursive
          outDefs += sql.substring(c.defStart, c.defEnd)
        case Some((base, step)) =>
          executed = true
          val view = runFixpoint(spark, outDefs.toSeq, base, step, c.name)
          outDefs += s"${c.name}${c.colList} AS (SELECT * FROM $view)"
      }
    }
    if (!executed) return sql
    val kw = if (residualRecursion) "WITH RECURSIVE " else "WITH "
    s"$head$kw${outDefs.mkString(", ")}$tail"
  }

  /** One delta iteration to fixpoint; returns the temp-view name
    * holding the converged relation. `prefixDefs` = the WITH list
    * before the recursive member (earlier recursive members already
    * replaced by their views, so chained recursion works). */
  private def runFixpoint(spark: org.apache.spark.sql.SparkSession,
                          prefixDefs: Seq[String], base: String,
                          step: String, name: String): String = {
    val view = s"__graft_recursive_$name"
    val prefix =
      if (prefixDefs.isEmpty) "" else s"WITH ${prefixDefs.mkString(", ")} "
    def run(q: String) = spark.sql(s"$prefix$q")
    val baseDf = run(s"SELECT * FROM ($base) __graft_rec_base")
    val schema = baseDf.schema
    val seen = scala.collection.mutable.LinkedHashSet[org.apache.spark.sql.Row]()
    def add(rows: Array[org.apache.spark.sql.Row]): Int = {
      val before = seen.size
      rows.foreach(seen += _)
      require(seen.size <= RecursionMaxRows,
        s"recursive CTE '$name' exceeded $RecursionMaxRows rows — use " +
          "the distributed operator face (e.g. graft.operators.Dedup" +
          ".connectedComponents) for data-scale iteration")
      seen.size - before
    }
    def publish(): Unit = spark.createDataFrame(
      java.util.Arrays.asList(seen.toSeq: _*), schema)
      .createOrReplaceTempView(view)
    add(baseDf.collect())
    val stepSql = replaceWord(step, name, view)
    var it = 0
    var grew = true
    while (grew && it < RecursionMaxIter) {
      publish()
      grew = add(run(s"SELECT * FROM ($stepSql) __graft_rec_step")
        .collect()) > 0
      it += 1
    }
    require(!grew,
      s"recursive CTE '$name' did not converge within $RecursionMaxIter " +
        "iterations")
    publish()
    view
  }
}
