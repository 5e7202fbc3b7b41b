package graft.dialect

import scala.util.matching.Regex

/** Pre-parse DuckDB-SQL → Spark-SQL dialect rewriter (SURVEY.md §4 item 1).
  *
  * This is the string-level front-end playing the role sqlglot plays in the
  * reference (eval/metric_utils.py:9-12): it normalizes DuckDB-isms before
  * the text reaches `SparkSqlParser`. Handled here (with the reference
  * query that motivates each, cited by eval/data/dev.json line):
  *
  *   - `SELECT * EXCLUDE (a, b)`        dev.json:183,383  → explicit column list
  *   - `SELECT * REPLACE (e AS c)`      dev.json:407      → explicit column list
  *   - `COLUMNS('regex')` projection    dev.json:167,399  → expanded column list
  *   - bracket index/slice `x[i]`,
  *     `x[i:j]`, `x[:j]`, `x[i:]`       dev.json:295,439,463,471 → duck_index /
  *                                      duck_slice (type-dispatching Catalyst
  *                                      expressions, graft.functions)
  *   - JSON arrows `->>'k'` / `->'k'`   dev.json:543      → get_json_object
  *   - bare `FROM t` queries            dev.json:287      → `SELECT * FROM t`
  *   - `IN (FROM t)`                    dev.json:287      → `IN (SELECT * FROM t)`
  *   - struct literal `{'a': 1}`        dev.json:479      → named_struct('a', 1)
  *   - list literal `[1,2,3]`           dev.json:487      → array(1,2,3)
  *   - single-quoted alias `AS 'x'`     dev.json:79       → backtick alias
  *
  * Schema-dependent expansions (EXCLUDE/REPLACE/COLUMNS) take a
  * `schemaOf: tableName => columns` callback so the rewriter works against
  * any catalog. Expansion only fires for single-table FROM clauses — the
  * exact shape every reference query uses.
  *
  * Scale note: rewriting is a driver-side, O(|sql|) string pass; the output
  * is plain Spark SQL, so everything downstream (pushdown, pruning,
  * codegen) is untouched Catalyst.
  */
object DuckRewriter {

  def rewrite(sql: String, schemaOf: String => Option[Seq[String]] = _ => None)
      : String = {
    var s = sql.trim
    s = bareFrom(s)
    s = inFrom(s)
    s = starExclude(s, schemaOf)
    s = starReplace(s, schemaOf)
    s = columnsRegex(s, schemaOf)
    s = jsonArrows(s)
    s = brackets(s)
    s = arrayLiterals(s)
    s = structLiterals(s)
    s = quotedAlias(s)
    s
  }

  /** `FROM t ...` with no SELECT → `SELECT * FROM t ...` */
  private def bareFrom(s: String): String =
    if (s.toUpperCase.startsWith("FROM ") || s.toUpperCase == "FROM")
      "SELECT * " + s
    else s

  /** `IN (FROM t)` → `IN (SELECT * FROM t)` */
  private val inFromRe: Regex = """(?i)\(\s*FROM\b""".r
  private def inFrom(s: String): String =
    inFromRe.replaceAllIn(s, "(SELECT * FROM")

  /** Finds the (single) FROM table of the query, for schema expansion. */
  private val fromTableRe: Regex =
    """(?is)\bFROM\s+([A-Za-z_][\w.]*)""".r
  private def fromTable(s: String): Option[String] =
    fromTableRe.findFirstMatchIn(s).map(_.group(1))

  private def lookupCols(s: String, schemaOf: String => Option[Seq[String]])
      : Option[Seq[String]] =
    fromTable(s).flatMap(schemaOf)

  /** Finds `<head>(`…balanced…`)` and hands the inner text to `expand`;
    * recurses so repeated occurrences all rewrite. Regexes can't see paren
    * balance (`* REPLACE (upper(x) AS x)` has nested calls), hence the scan. */
  private def rewriteBalanced(s: String, head: Regex,
      expand: String => Option[String]): String =
    head.findFirstMatchIn(s) match {
      case None => s
      case Some(m) =>
        var depth = 1; var inStr = false; var i = m.end
        while (i < s.length && depth > 0) {
          val c = s.charAt(i)
          if (c == '\'') inStr = !inStr
          else if (!inStr && c == '(') depth += 1
          else if (!inStr && c == ')') depth -= 1
          i += 1
        }
        val inner = s.substring(m.end, i - 1)
        expand(inner) match {
          case Some(repl) =>
            rewriteBalanced(s.substring(0, m.start) + repl + s.substring(i),
              head, expand)
          case None => s
        }
    }

  /** `* EXCLUDE (a, b)` → explicit remaining-column list. */
  private val excludeHeadRe: Regex = """(?is)\*\s+EXCLUDE\s*\(""".r
  private def starExclude(s: String, schemaOf: String => Option[Seq[String]])
      : String =
    rewriteBalanced(s, excludeHeadRe, inner => {
      val dropped = splitTopLevel(inner).map(_.trim.toLowerCase).toSet
      lookupCols(s, schemaOf).map(cols =>
        cols.filterNot(c => dropped(c.toLowerCase)).mkString(", "))
    })

  /** `* REPLACE (expr AS col[, ...])` → full column list with substitutions. */
  private val replaceHeadRe: Regex = """(?is)\*\s+REPLACE\s*\(""".r
  private val replaceItemRe: Regex =
    """(?is)(.+?)\s+AS\s+([A-Za-z_]\w*)\s*$""".r
  private def starReplace(s: String, schemaOf: String => Option[Seq[String]])
      : String =
    rewriteBalanced(s, replaceHeadRe, inner => {
      val repls: Map[String, String] = splitTopLevel(inner).flatMap {
        case replaceItemRe(expr, col) => Some(col.toLowerCase -> expr.trim)
        case _ => None
      }.toMap
      lookupCols(s, schemaOf).map(cols =>
        cols.map { c =>
          repls.get(c.toLowerCase) match {
            case Some(e) => s"$e AS $c"
            case None    => c
          }
        }.mkString(", "))
    })

  /** `COLUMNS('re')` → expanded matching-column list. */
  private val columnsRe: Regex =
    """(?is)COLUMNS\s*\(\s*'([^']*)'\s*\)""".r
  private def columnsRegex(s: String, schemaOf: String => Option[Seq[String]])
      : String =
    columnsRe.replaceAllIn(s, m => {
      val re = m.group(1).r
      lookupCols(s, schemaOf) match {
        case Some(cols) =>
          val hit = cols.filter(c => re.findFirstIn(c).isDefined)
          Regex.quoteReplacement(hit.mkString(", "))
        case None => Regex.quoteReplacement(m.matched)
      }
    })

  /** `x ->> 'k'` → get_json_object(x, '$.k'); `->` keeps JSON text too
    * (DuckDB returns JSON; for string-typed storage the text form is the
    * same once extracted). */
  private val arrowRe: Regex =
    """(?s)([A-Za-z_][\w.]*|\))\s*->>?\s*'([^']*)'""".r
  private def jsonArrows(s: String): String =
    arrowRe.replaceAllIn(s, m => Regex.quoteReplacement(
      s"get_json_object(${m.group(1)}, '$$.${m.group(2)}')"))

  /** Bracket indexing and slicing over identifiers / call results:
    * `x[i]` → duck_index(x, i); `x[i:j]` (either bound optional) →
    * duck_slice(x, i|1, j|MAX). Does NOT touch `[...]` without a preceding
    * value — that's a DuckDB list literal, handled below. */
  private val sliceRe: Regex =
    ("""([A-Za-z_][\w.]*(?:\([^()]*\))?)\s*\[\s*""" + // base: ident or f(...)
      """(-?\d+)?\s*:\s*(-?\d+)?\s*\]""").r
  private val indexRe: Regex =
    """([A-Za-z_][\w.]*(?:\([^()]*\))?)\s*\[\s*(-?\d+)\s*\]""".r
  private def brackets(s: String): String = {
    val afterSlice = sliceRe.replaceAllIn(s, m => {
      val base = m.group(1)
      val lo = Option(m.group(2)).getOrElse("1")
      val hi = Option(m.group(3)).getOrElse(Int.MaxValue.toString)
      Regex.quoteReplacement(s"duck_slice($base, $lo, $hi)")
    })
    indexRe.replaceAllIn(afterSlice, m => Regex.quoteReplacement(
      s"duck_index(${m.group(1)}, ${m.group(2)})"))
  }

  /** Remaining `[a, b, c]` with no preceding value (so not an index/slice,
    * those were rewritten above) is a DuckDB list literal (dev.json:487
    * `SELECT [1,2,3]`, :447 INSERT `['12312323','23123344']`) → array(...). */
  private val listRe: Regex = """(?<![\w)\]])\[([^\[\]]*)\]""".r
  private def arrayLiterals(s: String): String =
    listRe.replaceAllIn(s, m =>
      Regex.quoteReplacement(s"array(${m.group(1)})"))

  /** `{'k': v, ...}` → named_struct('k', v, ...). Flat literals only. */
  private val structRe: Regex = """\{([^{}]*)\}""".r
  private val structFieldRe: Regex = """(?s)\s*'([^']*)'\s*:\s*(.+)""".r
  private def structLiterals(s: String): String =
    structRe.replaceAllIn(s, m => {
      val fields = splitTopLevel(m.group(1))
      val kv = fields.flatMap {
        case structFieldRe(k, v) => Seq(s"'$k'", v.trim)
        case other               => Seq(other) // not a struct literal — bail
      }
      if (kv.length == fields.length * 2)
        Regex.quoteReplacement(s"named_struct(${kv.mkString(", ")})")
      else Regex.quoteReplacement(m.matched)
    })

  /** Splits on top-level commas (ignores commas inside parens/quotes). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inStr = false; val cur = new StringBuilder
    s.foreach {
      case '\'' => inStr = !inStr; cur += '\''
      case c @ ('(' | '[' | '{') if !inStr => depth += 1; cur += c
      case c @ (')' | ']' | '}') if !inStr => depth -= 1; cur += c
      case ',' if !inStr && depth == 0 => out += cur.result(); cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.result()
    out.toSeq
  }

  /** `AS 'alias'` → backtick-quoted alias (dev.json:79 `AS 'price (USD)'`). */
  private val aliasRe: Regex = """(?i)\bAS\s+'([^']*)'""".r
  private def quotedAlias(s: String): String =
    aliasRe.replaceAllIn(s, m =>
      Regex.quoteReplacement(s"AS `${m.group(1)}`"))
}
