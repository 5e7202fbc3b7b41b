package graft

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import scala.util.control.NonFatal
import org.apache.spark.sql.AnalysisException

/** Parse/bind SQL validation without touching real data — the harness's
  * fast negative test (SURVEY.md §2.9 H7; reference
  * examples/validate_sql.py:6-27 + examples/utils.py:85-105).
  *
  * Reference semantics, reproduced exactly:
  *   - Parser / Binder / Catalog errors ⇒ INVALID
  *   - runtime-class errors ⇒ VALID (the reference treats anything past
  *     binding as a data problem, not a SQL problem)
  *   - timeout ⇒ VALID (parse/bind presumed passed — the reference's
  *     budget rule). The default budget is 5 s: generous enough that a
  *     loaded driver doesn't flip genuine parse/bind failures to VALID
  *     (the reference's 0.5 s covered a subprocess that did nothing but
  *     validate; our verdict shares a JVM with running queries). Callers
  *     wanting the reference's exact budget pass timeoutMs = 500.
  *
  * The statement runs against a SCHEMA-ONLY copy of the catalog (every
  * table truncated to zero rows), mirroring the reference's schema-only
  * in-memory DB: DDL/DML execute harmlessly, SELECTs analyze fully, and
  * nothing can scan real data — validation cost is independent of corpus
  * size, which is what makes it usable as a pre-flight check in front of
  * a 100 TB query.
  */
object SqlValidator {

  /** A scratch engine with the same table names/schemas but no rows —
    * in an ISOLATED session (`newSession`: shared SparkContext, separate
    * temp-view catalog and conf), so registering the schema-only views
    * can never clobber the caller's live tables of the same names. */
  def schemaOnly(base: Engine): Engine = {
    val s2 = base.spark.newSession()
    val v = new Engine(s2)
    v.defaultDbName = base.defaultDbName
    base.registeredTables.foreach { case (n, df) =>
      // rebuild the empty relation IN the scratch session — a DataFrame
      // registers temp views in the session it was created by
      v.register(n, s2.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        df.schema))
    }
    v
  }

  /** Validates one statement (or ';'-separated script) against a
    * schema-only copy of `base`'s catalog. Building the scratch session
    * costs more than one verdict — use [[validateAll]] for batteries. */
  def validate(base: Engine, sql: String, timeoutMs: Long = 5000): Boolean =
    validateWith(schemaOnly(base), sql, timeoutMs)

  /** Validates a battery of statements against ONE shared schema-only
    * scratch (statements may observe earlier statements' DDL, like a
    * session would). */
  def validateAll(base: Engine, stmts: Seq[(String, String)],
      timeoutMs: Long = 5000): Seq[(String, Boolean)] = {
    val scratch = schemaOnly(base)
    stmts.map { case (id, sql) => (id, validateWith(scratch, sql, timeoutMs)) }
  }

  private def validateWith(scratch: Engine, sql: String,
      timeoutMs: Long): Boolean = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val group = s"sql-validate-${System.nanoTime()}"
    val sc = scratch.spark.sparkContext
    val f = Future {
      sc.setJobGroup(group, "sql validation", interruptOnCancel = true)
      try {
        // Force parse + bind + optimize + physical planning WITHOUT
        // launching a job — the surface DuckDB's EXPLAIN (the oracle)
        // covers. Analysis/catalog errors throw here; so do
        // optimizer-time errors (e.g. ANSI constant-folding a bad
        // literal cast), which land in the runtime-class catch below
        // exactly as they did when collect() forced them. What this
        // does NOT force is whole-stage codegen's janino compile
        // (deferred to execute()) — but a janino failure falls back to
        // interpreted execution rather than erroring, so it was never
        // part of the validity verdict even under collect(); and
        // calling execute() here is not an option, since under AQE it
        // materializes query stages (real scheduler jobs), the exact
        // per-statement cost this formulation removed (2.5 → 0.52 s).
        scratch.executeScript(sql).queryExecution.executedPlan
        true
      } catch {
        // ParseException extends AnalysisException: parser, binder and
        // catalog failures all land here ⇒ invalid
        case _: AnalysisException => false
        // dialect/command-layer rejections (unknown unit, bad arity…)
        // are binder-class failures
        case _: IllegalArgumentException => false
        case _: MatchError => false
        // anything else is a runtime-class error ⇒ valid, per reference
        case NonFatal(_) => true
      } finally sc.clearJobGroup()
    }
    try Await.result(f, timeoutMs.millis)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        // don't leave the abandoned attempt running on the shared context
        sc.cancelJobGroup(group)
        true
    }
  }
}
