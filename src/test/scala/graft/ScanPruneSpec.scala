package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dialect.ScanPrune
import graft.dialect.ScanPrune._

/** Grammar-level tests for the SQL-pruning conjunct extractor — the
  * one component where a parsing mistake silently becomes a wrong
  * query result (unsound file skipping), so every accept/reject
  * decision is pinned directly, without Spark in the loop. */
class ScanPruneSpec extends AnyFunSuite {

  private def preds(sql: String): Seq[RawPred] =
    ScanPrune.analyze(sql).map(_._2).getOrElse(Nil)

  test("simple shapes extract: op, reversed, BETWEEN, LIKE-prefix, IN") {
    assert(preds("SELECT * FROM t WHERE k = 'x'") ==
      Seq(Cmp("k", "=", StrLit("x"))))
    assert(preds("SELECT * FROM t WHERE 5 < v") ==
      Seq(Cmp("v", ">", NumLit(5))))
    assert(preds("SELECT * FROM t WHERE k BETWEEN 'a' AND 'b'") ==
      Seq(Between("k", StrLit("a"), StrLit("b"))))
    assert(preds("SELECT * FROM t WHERE k LIKE 'pre%'") ==
      Seq(Prefix("k", "pre")))
    assert(preds("SELECT * FROM t WHERE v IN (3, 1, 2)") ==
      Seq(InList("v", Seq(NumLit(3), NumLit(1), NumLit(2)))))
    assert(preds("SELECT * FROM t WHERE ts >= TIMESTAMP " +
      "'2024-01-01 00:00:00'") ==
      Seq(Cmp("ts", ">=", TsLit("2024-01-01 00:00:00"))))
    assert(preds("SELECT * FROM t WHERE d = DATE '2024-01-05'") ==
      Seq(Cmp("d", "=", DateLit("2024-01-05"))))
    assert(preds("SELECT * FROM t WHERE v = -7") ==
      Seq(Cmp("v", "=", NumLit(-7))))
  }

  test("conjunctions split; BETWEEN's AND is consumed, not a boundary") {
    assert(preds("SELECT * FROM t WHERE k >= 'a' AND k < 'b' AND v = 1")
      .size == 3)
    assert(preds(
      "SELECT * FROM t WHERE k BETWEEN 'a' AND 'b' AND v = 1") ==
      Seq(Between("k", StrLit("a"), StrLit("b")),
        Cmp("v", "=", NumLit(1))))
  }

  test("mixed OR/AND kills extraction for the WHOLE region — " +
      "AND binds tighter, so partial extraction is unsound") {
    assert(preds("SELECT * FROM t WHERE k = 'a' OR v = 1 AND k = 'z'")
      .isEmpty)
    assert(preds("SELECT * FROM t WHERE v = 1 AND k = 'z' OR k = 'a'")
      .isEmpty)
    // two-column OR: not a same-column disjunction → nothing
    assert(preds("SELECT * FROM t WHERE k = 'a' OR v = 1").isEmpty)
    // one unparsable branch kills the whole disjunction (dropping a
    // branch would NARROW it — unsound)
    assert(preds("SELECT * FROM t WHERE k = 'a' OR upper(k) = 'B'")
      .isEmpty)
    assert(preds("SELECT * FROM t WHERE k = 'a' OR k = 'x\\nb'")
      .isEmpty)
  }

  test("same-column ORs extract as one OrSame disjunction (r15): " +
      "bare, parenthesized-conjunct, BETWEEN and IN branches") {
    assert(preds("SELECT * FROM t WHERE k = 'a' OR k = 'b' OR k = 'c'") ==
      Seq(OrSame("k", Seq(Cmp("k", "=", StrLit("a")),
        Cmp("k", "=", StrLit("b")), Cmp("k", "=", StrLit("c"))))))
    assert(preds("SELECT * FROM t WHERE " +
      "ts BETWEEN 1 AND 2 OR ts BETWEEN 8 AND 9") ==
      Seq(OrSame("ts", Seq(Between("ts", NumLit(1), NumLit(2)),
        Between("ts", NumLit(8), NumLit(9))))))
    // parenthesized same-column OR is ONE conjunct among others
    assert(preds(
      "SELECT * FROM t WHERE (k = 'a' OR k = 'b') AND v = 1") ==
      Seq(OrSame("k", Seq(Cmp("k", "=", StrLit("a")),
        Cmp("k", "=", StrLit("b")))), Cmp("v", "=", NumLit(1))))
    assert(preds(
      "SELECT * FROM t WHERE k LIKE 'a%' OR k IN ('x', 'y')") ==
      Seq(OrSame("k", Seq(Prefix("k", "a"),
        InList("k", Seq(StrLit("x"), StrLit("y")))))))
    // a mixed-column parenthesized OR still drops (others keep)
    assert(preds(
      "SELECT * FROM t WHERE (k = 'a' OR v = 2) AND v = 1") ==
      Seq(Cmp("v", "=", NumLit(1))))
  }

  test("unparseable conjuncts drop without poisoning the rest") {
    assert(preds("SELECT * FROM t WHERE upper(k) = 'A' AND v = 1") ==
      Seq(Cmp("v", "=", NumLit(1))))
    assert(preds("SELECT * FROM t WHERE NOT k = 'a' AND v = 1") ==
      Seq(Cmp("v", "=", NumLit(1))))
    assert(preds("SELECT * FROM t WHERE k <> 'a' AND v = 1") ==
      Seq(Cmp("v", "=", NumLit(1))))
    assert(preds("SELECT * FROM t WHERE a < b AND v = 1") ==
      Seq(Cmp("v", "=", NumLit(1))))
    // LIKE with any wildcard beyond the trailing % is not a prefix
    assert(preds("SELECT * FROM t WHERE k LIKE 'a%b%'").isEmpty)
    assert(preds("SELECT * FROM t WHERE k LIKE 'a_c%'").isEmpty)
    assert(preds("SELECT * FROM t WHERE k LIKE '%suffix'").isEmpty)
  }

  test("statement qualification: joins, subqueries, set-ops, CTEs, " +
      "derived tables and multi-table FROMs never analyze") {
    assert(ScanPrune.analyze(
      "SELECT * FROM t JOIN u ON t.k = u.k WHERE t.k = 'a'").isEmpty)
    assert(ScanPrune.analyze(
      "SELECT * FROM t WHERE k = (SELECT max(k) FROM t)").isEmpty)
    assert(ScanPrune.analyze(
      "SELECT * FROM t WHERE k = 'a' UNION ALL SELECT * FROM t").isEmpty)
    assert(ScanPrune.analyze(
      "WITH c AS (SELECT * FROM t) SELECT * FROM c WHERE k = 'a'").isEmpty)
    assert(ScanPrune.analyze(
      "SELECT * FROM (VALUES (1)) v(k) WHERE k = 1").isEmpty)
    assert(ScanPrune.analyze(
      "SELECT * FROM t, u WHERE t.k = 'a'").isEmpty)
    assert(ScanPrune.analyze("SELECT * FROM t").isEmpty) // no WHERE
  }

  test("qualifiers: table/alias accepted, foreign qualifiers drop the " +
      "conjunct; keywords in string literals are data") {
    assert(preds("SELECT * FROM t x WHERE x.k = 'a'") ==
      Seq(Cmp("k", "=", StrLit("a"))))
    assert(preds("SELECT * FROM t AS x WHERE t.k = 'a'") ==
      Seq(Cmp("k", "=", StrLit("a"))))
    assert(preds("SELECT * FROM t WHERE z.k = 'a' AND v = 1") ==
      Seq(Cmp("v", "=", NumLit(1))))
    // ' AND '/' OR '/' WHERE ' inside literals never split or disable
    assert(preds(
      "SELECT * FROM t WHERE k = 'x AND y OR z WHERE w' AND v = 1") ==
      Seq(Cmp("k", "=", StrLit("x AND y OR z WHERE w")),
        Cmp("v", "=", NumLit(1))))
    // doubled-quote escape inside the literal
    assert(preds("SELECT * FROM t WHERE k = 'it''s'") ==
      Seq(Cmp("k", "=", StrLit("it's"))))
  }

  test("backslash in a string literal declines extraction — Spark's " +
      "parser processes escapes, so verbatim bytes would prune on " +
      "different data than the residual WHERE compares (r15)") {
    assert(preds("SELECT * FROM t WHERE k = 'a\\nb'").isEmpty)
    assert(preds("SELECT * FROM t WHERE path LIKE 'C:\\data\\%'").isEmpty)
    assert(preds("SELECT * FROM t WHERE k IN ('x', 'a\\tb')").isEmpty)
    assert(preds(
      "SELECT * FROM t WHERE k BETWEEN 'a\\\\' AND 'b'").isEmpty)
    // ...but only THAT conjunct is lost, not the whole region
    assert(preds("SELECT * FROM t WHERE k = 'a\\nb' AND v = 1") ==
      Seq(Cmp("v", "=", NumLit(1))))
  }

  test("trailing clauses bound the WHERE region") {
    assert(preds("SELECT v FROM t WHERE k = 'a' ORDER BY v LIMIT 3") ==
      Seq(Cmp("k", "=", StrLit("a"))))
    assert(preds("SELECT k, count(*) FROM t WHERE k >= 'a' " +
      "GROUP BY k HAVING count(*) > 2") ==
      Seq(Cmp("k", ">=", StrLit("a"))))
  }

  test("conjunctsOf (DML WHERE): same grammar on a bare predicate; " +
      "subqueries and mixed OR/AND extract nothing") {
    val names = Set("t")
    assert(ScanPrune.conjunctsOf("k BETWEEN 'a' AND 'b' AND v = 1",
      names).size == 2)
    assert(ScanPrune.conjunctsOf("k = 'a' OR v = 1 AND k = 'z'",
      names).isEmpty)
    assert(ScanPrune.conjunctsOf("k = (SELECT max(k) FROM t)",
      names).isEmpty)
    assert(ScanPrune.conjunctsOf("t.k = 'a'", names) ==
      Seq(Cmp("k", "=", StrLit("a"))))
  }
}
