package graft.dialect

/** Statement analysis for SQL-scan manifest pruning (r14).
  *
  * Decides whether a statement is a PLAIN SINGLE-TABLE SELECT — one
  * SELECT token, one FROM whose target is a bare table name (optional
  * alias), no joins / set-ops / subqueries / CTEs — and if so extracts
  * the WHERE clause's top-level AND conjuncts of the shapes
  *
  *   col <op> literal        (op ∈ =, <, <=, >, >=; either side)
  *   col BETWEEN a AND b
  *   col LIKE 'prefix%'      (% only at the end, no other wildcards)
  *   col IN (lit, …)
  *
  * as raw predicates. The caller (Engine) types the literals against
  * the table's schema, encodes them with SnapshotOps.encodeBound and
  * prunes the manifest file list; the statement's own WHERE still
  * applies in full, so an extracted-and-pruned conjunct can never
  * change results — only skip files that provably hold no match.
  * Anything that fails this grammar (ORs, NOT, expressions, function
  * calls, ambiguous qualifiers) is simply NOT extracted; the
  * surrounding conjuncts remain usable because conjunction is
  * monotone: pruning on a SUBSET of the WHERE's conjuncts is safe.
  *
  * Works on the lexer's token stream (SqlNormalizer.lex), so keywords
  * inside string literals, comments or quoted identifiers can never
  * confuse the analysis — the Engine front-end discipline.
  */
object ScanPrune {
  import SqlNormalizer._

  sealed trait Lit
  final case class NumLit(v: BigDecimal) extends Lit
  final case class StrLit(v: String) extends Lit
  final case class TsLit(text: String) extends Lit
  final case class DateLit(text: String) extends Lit
  /** A literal ALREADY in encodeBound space (r16): produced only by
    * the typed Catalyst front end (graft.sources.CatalystPrune), where
    * date/timestamp values arrive as their internal epoch encodings —
    * never by the SQL text parser. Bound encoding passes it through
    * verbatim for any column type. */
  final case class EncLit(v: BigDecimal) extends Lit

  sealed trait RawPred { def col: String }
  final case class Cmp(col: String, op: String, lit: Lit) extends RawPred
  final case class Between(col: String, a: Lit, b: Lit) extends RawPred
  final case class Prefix(col: String, prefix: String) extends RawPred
  final case class InList(col: String, lits: Seq[Lit]) extends RawPred
  /** Same-column disjunction (r15): EVERY depth-0 OR branch of a
    * region (or of a fully-parenthesized conjunct) is a simple
    * predicate on the SAME column — pruned with the interval UNION,
    * which stays monotone (a file is kept if it may match ANY
    * branch). Any other OR shape still extracts nothing. */
  final case class OrSame(col: String, branches: Seq[RawPred])
    extends RawPred

  private val clauseEnd =
    Set("GROUP", "ORDER", "LIMIT", "HAVING", "WINDOW", "QUALIFY", "OFFSET")
  /** Any of these anywhere disqualifies the whole statement: the
    * single-table attribution argument no longer holds. */
  private val disqualify = Set("JOIN", "UNION", "INTERSECT", "EXCEPT",
    "LATERAL", "VALUES", "WITH")
  private val relOps = Set("=", "<", "<=", ">", ">=")

  /** (table name as written, conjunct predicates) when the statement
    * qualifies; None otherwise. Empty predicate list never returns —
    * a qualifying statement with nothing extractable is None too. */
  def analyze(sql: String): Option[(String, Seq[RawPred])] = {
    val ls = SqlNormalizer.lex(sql)
      .filterNot(_.tok.isInstanceOf[Comment]).toVector
    def word(i: Int): Option[String] = ls.lift(i).map(_.tok).collect {
      case Word(w) => w.toUpperCase }
    if (!word(0).contains("SELECT")) return None
    var selects = 0
    ls.foreach(_.tok match {
      case Word(w) =>
        val u = w.toUpperCase
        if (u == "SELECT") selects += 1
        if (disqualify(u)) return None
      case _ =>
    })
    if (selects != 1) return None
    // the one FROM at depth 0, target a bare table name
    val fromI = findKw(ls, 0, "FROM")
    if (fromI < 0) return None
    val table = ls.lift(fromI + 1).map(_.tok) match {
      case Some(Word(w)) if !clauseEnd(w.toUpperCase) &&
        w.toUpperCase != "WHERE" => w
      case _ => return None
    }
    // optional [AS] alias, then the statement must move straight to
    // WHERE / a trailing clause / end — a comma (implicit cross join),
    // USING, TABLESAMPLE or anything else bails
    var i = fromI + 2
    var alias: Option[String] = None
    word(i) match {
      case Some("AS") => word(i + 1) match {
        case Some(_) => alias = Some(wordText(ls, i + 1)); i += 2
        case None => return None
      }
      case Some(w) if !clauseEnd(w) && w != "WHERE" =>
        alias = Some(wordText(ls, i)); i += 1
      case _ =>
    }
    if (i < ls.length && !word(i).exists(w =>
        w == "WHERE" || clauseEnd(w))) return None
    if (!word(i).contains("WHERE")) return None
    // WHERE region: up to the first depth-0 trailing-clause keyword
    var end = ls.length
    var depth = 0
    var j = i + 1
    while (j < end) {
      ls(j).tok match {
        case Op("(") => depth += 1
        case Op(")") => depth -= 1
        case Word(w) if depth == 0 && clauseEnd(w.toUpperCase) =>
          end = j
        case _ =>
      }
      j += 1
    }
    val names = Set(table.toLowerCase,
      table.split('.').last.toLowerCase) ++ alias.map(_.toLowerCase)
    val preds = parseRegion(ls, i + 1, end, names)
    if (preds.isEmpty) None else Some((table, preds))
  }

  /** Top-level AND conjuncts of a BARE predicate text (a DML WHERE
    * clause) under the same grammar as [[analyze]]'s WHERE handling.
    * `names` = qualifiers accepted on column references (the target
    * table's name/short name). A predicate containing a subquery or
    * any disqualifying construct yields nothing — DML pruning must be
    * exactly as conservative as scan pruning. */
  def conjunctsOf(predText: String, names: Set[String]): Seq[RawPred] = {
    val ls = SqlNormalizer.lex(predText)
      .filterNot(_.tok.isInstanceOf[Comment]).toVector
    if (ls.exists(_.tok match {
      case Word(w) =>
        val u = w.toUpperCase; u == "SELECT" || disqualify(u)
      case _ => false
    })) return Nil
    val lower = names.map(_.toLowerCase)
    parseRegion(ls, 0, ls.length, lower)
  }

  /** A WHERE region → raw predicates. A region with depth-0 ORs is
    * EITHER a same-column disjunction in full ([[OrSame]]) or yields
    * nothing; otherwise the depth-0 AND conjuncts parse
    * independently (a failed conjunct drops alone — conjunction is
    * monotone, disjunction is not). */
  private def parseRegion(ls: Vector[Lexeme], from: Int, until: Int,
      names: Set[String]): Seq[RawPred] = {
    var d = 0
    var hasOr = false
    var i = from
    while (i < until) {
      ls(i).tok match {
        case Op("(") => d += 1
        case Op(")") => d -= 1
        case Word(w) if d == 0 && w.equalsIgnoreCase("OR") => hasOr = true
        case _ =>
      }
      i += 1
    }
    if (hasOr) parseDisjuncts(ls, from, until, names).toSeq
    else splitConjuncts(ls, from, until).flatMap { case (a, b) =>
      parseConjunct(ls.slice(a, b), names) }
  }

  /** Depth-0 OR branches of a region, ALL of which must be simple
    * predicates on ONE column → [[OrSame]]. A depth-0 AND outside a
    * BETWEEN (mixed `a OR b AND c` precedence), an unparsable branch,
    * or a second column kills the whole region: dropping one branch
    * of a disjunction would be unsound, unlike dropping a conjunct. */
  private def parseDisjuncts(ls: Vector[Lexeme], from: Int, until: Int,
      names: Set[String]): Option[OrSame] = {
    val bounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var start = from
    var pendingBetween = 0
    var depth = 0
    var j = from
    while (j < until) {
      ls(j).tok match {
        case Op("(") => depth += 1
        case Op(")") => depth -= 1
        case Word(w) if depth == 0 =>
          w.toUpperCase match {
            case "OR" => bounds += ((start, j)); start = j + 1
            case "BETWEEN" => pendingBetween += 1
            case "AND" if pendingBetween > 0 => pendingBetween -= 1
            case "AND" => return None
            case _ =>
          }
        case _ =>
      }
      j += 1
    }
    bounds += ((start, until))
    if (bounds.size < 2) return None
    val parsed = bounds.map(b => parseConjunct(ls.slice(b._1, b._2), names))
    if (!parsed.forall(_.isDefined)) return None
    val ps = parsed.flatten
    if (ps.exists(_.isInstanceOf[OrSame])) return None // no nesting
    if (ps.map(_.col.toLowerCase).distinct.size != 1) return None
    Some(OrSame(ps.head.col, ps.toSeq))
  }

  /** Token ranges of the depth-0 AND conjuncts in ls[from, until);
    * the AND that belongs to a BETWEEN is consumed by it, never a
    * boundary. A depth-0 OR anywhere in the region extracts NOTHING:
    * AND binds tighter than OR, so `a OR b AND c` is `a OR (b AND c)`
    * — splitting at that AND would treat `c` as a required conjunct
    * and prune away rows that satisfy only `a`. (Parenthesized ORs
    * sit at depth > 0 and stay per-conjunct concerns.) */
  private def splitConjuncts(ls: Vector[Lexeme], from: Int,
      until: Int): Seq[(Int, Int)] = {
    var d = 0
    var i = from
    while (i < until) {
      ls(i).tok match {
        case Op("(") => d += 1
        case Op(")") => d -= 1
        case Word(w) if d == 0 && w.equalsIgnoreCase("OR") =>
          return Seq.empty
        case _ =>
      }
      i += 1
    }
    val bounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var start = from
    var pendingBetween = 0
    var depth = 0
    var j = from
    while (j < until) {
      ls(j).tok match {
        case Op("(") => depth += 1
        case Op(")") => depth -= 1
        case Word(w) if depth == 0 =>
          w.toUpperCase match {
            case "BETWEEN" => pendingBetween += 1
            case "AND" if pendingBetween > 0 => pendingBetween -= 1
            case "AND" => bounds += ((start, j)); start = j + 1
            case _ =>
          }
        case _ =>
      }
      j += 1
    }
    if (start < until) bounds += ((start, until))
    bounds.toSeq
  }

  private def wordText(ls: Vector[Lexeme], i: Int): String =
    ls(i).tok match { case Word(w) => w case t => t.text }

  private def findKw(ls: Vector[Lexeme], from: Int, kw: String): Int = {
    var depth = 0
    var i = from
    while (i < ls.length) {
      ls(i).tok match {
        case Op("(") => depth += 1
        case Op(")") => depth -= 1
        case Word(w) if depth == 0 && w.equalsIgnoreCase(kw) => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** One conjunct → one raw predicate, or None when it doesn't fit
    * the grammar (never an error: unparsed conjuncts just don't
    * prune). `names` = acceptable column qualifiers. */
  private def parseConjunct(ts: Vector[Lexeme],
      names: Set[String]): Option[RawPred] = {
    // a conjunct that is ONE fully-parenthesized group recurses: a
    // plain wrapped predicate, or a same-column disjunction —
    // `(k = 1 OR k = 2) AND v = 3` prunes on both (r15)
    if (ts.length >= 3 && ts.head.tok == Op("(") &&
        ts.last.tok == Op(")")) {
      var d = 0
      var wraps = true
      var i = 0
      while (i < ts.length - 1) {
        ts(i).tok match {
          case Op("(") => d += 1
          case Op(")") => d -= 1
          case _ =>
        }
        if (d == 0) wraps = false
        i += 1
      }
      if (wraps)
        return parseDisjuncts(ts, 1, ts.length - 1, names)
          .orElse(parseConjunct(ts.slice(1, ts.length - 1), names))
    }
    // ORs / NOT / CASE inside a conjunct make its bound non-monotone
    if (ts.exists(_.tok match {
      case Word(w) => Set("OR", "NOT", "CASE")(w.toUpperCase)
      case _ => false
    })) return None

    // [qualifier .] identifier — qualifier must name the one table
    def colRef(i: Int): Option[(String, Int)] = {
      def ident(k: Int): Option[String] = ts.lift(k).map(_.tok) match {
        case Some(Word(w)) => Some(w)
        case Some(q: Quoted) if q.text.startsWith("\"") =>
          Some(q.text.drop(1).dropRight(1).replace("\"\"", "\""))
        case _ => None
      }
      ident(i).flatMap { first =>
        if (ts.lift(i + 1).map(_.tok).contains(Op("."))) {
          if (!names(first.toLowerCase)) None
          else ident(i + 2).map(c => (c, i + 3))
        } else Some((first, i + 1))
      }
    }

    def lit(i: Int): Option[(Lit, Int)] = ts.lift(i).map(_.tok) match {
      case Some(Num(t)) => Some((NumLit(BigDecimal(t)), i + 1))
      case Some(Op("-")) => ts.lift(i + 1).map(_.tok) match {
        case Some(Num(t)) => Some((NumLit(BigDecimal(s"-$t")), i + 2))
        case _ => None
      }
      case Some(q: Quoted) if q.text.startsWith("'") =>
        // Backslashes are processed by Spark's SQL parser (escape
        // sequences) and double as the LIKE escape char, so the bytes
        // the residual WHERE compares differ from the verbatim
        // literal. Declining keeps pruning sound; the conjunct still
        // executes in full. (Covers Prefix too — it pulls via lit.)
        val s = unquote(q.text)
        if (s.contains('\\')) None else Some((StrLit(s), i + 1))
      case Some(Word(w)) if w.equalsIgnoreCase("TIMESTAMP") =>
        ts.lift(i + 1).map(_.tok) match {
          case Some(q: Quoted) if q.text.startsWith("'") =>
            Some((TsLit(unquote(q.text)), i + 2))
          case _ => None
        }
      case Some(Word(w)) if w.equalsIgnoreCase("DATE") =>
        ts.lift(i + 1).map(_.tok) match {
          case Some(q: Quoted) if q.text.startsWith("'") =>
            Some((DateLit(unquote(q.text)), i + 2))
          case _ => None
        }
      case _ => None
    }

    def opAt(i: Int): Option[String] = ts.lift(i).map(_.tok) match {
      case Some(Op(o)) if relOps(o) => Some(o)
      case _ => None
    }

    // col <op> lit | col BETWEEN a AND b | col LIKE 'p%' | col IN (…)
    colRef(0).flatMap { case (c, i) =>
      opAt(i).flatMap(o => lit(i + 1).collect {
        case (l, n) if n == ts.length => Cmp(c, o, l) })
      .orElse(ts.lift(i).map(_.tok) match {
        case Some(Word(w)) if w.equalsIgnoreCase("BETWEEN") =>
          for {
            (a, n1) <- lit(i + 1)
            if ts.lift(n1).map(_.tok).exists {
              case Word(x) => x.equalsIgnoreCase("AND"); case _ => false }
            (b, n2) <- lit(n1 + 1) if n2 == ts.length
          } yield Between(c, a, b)
        case Some(Word(w)) if w.equalsIgnoreCase("LIKE") =>
          lit(i + 1).collect {
            case (StrLit(p), n) if n == ts.length && p.length > 1 &&
              p.endsWith("%") && !p.dropRight(1).exists(ch =>
                ch == '%' || ch == '_') =>
              Prefix(c, p.dropRight(1))
          }
        case Some(Word(w)) if w.equalsIgnoreCase("IN") =>
          if (!ts.lift(i + 1).map(_.tok).contains(Op("("))) None
          else {
            val acc = scala.collection.mutable.ArrayBuffer.empty[Lit]
            var k = i + 2
            while (k < ts.length) {
              lit(k) match {
                case Some((l, n)) =>
                  acc += l
                  ts.lift(n).map(_.tok) match {
                    case Some(Op(",")) => k = n + 1
                    case Some(Op(")")) =>
                      return if (n + 1 == ts.length && acc.nonEmpty)
                        Some(InList(c, acc.toSeq))
                      else None
                    case _ => return None
                  }
                case None => return None
              }
            }
            None
          }
        case _ => None
      })
    }.orElse {
      // reversed: literal <op> col  (flip the operator)
      lit(0).flatMap { case (l, i) =>
        opAt(i).flatMap { o =>
          colRef(i + 1).collect { case (c, n) if n == ts.length =>
            val flipped = o match {
              case "<" => ">" case "<=" => ">="
              case ">" => "<" case ">=" => "<=" case other => other
            }
            Cmp(c, flipped, l)
          }
        }
      }
    }
  }

  private def unquote(t: String): String =
    t.drop(1).dropRight(1).replace("''", "'")
}
