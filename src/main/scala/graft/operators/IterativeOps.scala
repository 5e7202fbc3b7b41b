package graft.operators

import org.apache.spark.sql.DataFrame

/** Iterative fixpoint computation — the engine-side equivalent of
  * `WITH RECURSIVE` (which DuckDB parses natively and Spark does not:
  * there is no recursion in Catalyst plans, so the loop is driven from
  * the driver over checkpointed frontiers, the classic semi-naive
  * evaluation every distributed datalog engine uses).
  *
  * Scale design (100 TB):
  *   - each iteration is ONE distributed join/step job on the previous
  *     FRONTIER only (semi-naive: never re-derives from the full
  *     accumulation), so per-iteration cost tracks the frontier size;
  *   - frontiers are `localCheckpoint`ed — without it the plan tree
  *     doubles per iteration and the optimizer re-plans the whole
  *     history every step (exponential analysis cost, stack overflows
  *     around iteration ~40);
  *   - termination is one `count()` job per iteration — the inherent
  *     synchronization point of any fixpoint loop;
  *   - `recursiveUnion` dedups the frontier against the accumulation
  *     (one co-partitioned anti join per iteration), which both gives
  *     UNION (set) semantics and terminates on cyclic graphs.
  */
object IterativeOps {

  /** `WITH RECURSIVE … UNION ALL` semantics: accumulate every frontier,
    * stop when a step yields no rows. Terminates only on acyclic
    * derivations (like the SQL construct itself: a cycle recurses
    * forever) — `maxIter` is the guard rail. */
  def recursiveUnionAll(base: DataFrame, step: DataFrame => DataFrame,
      maxIter: Int = 100): DataFrame = {
    var frontier = base.localCheckpoint(true)
    var acc = frontier
    var i = 0
    while (i < maxIter && !frontier.isEmpty) {
      frontier = step(frontier).localCheckpoint(true)
      if (!frontier.isEmpty) acc = acc.unionByName(frontier)
      i += 1
    }
    if (i >= maxIter)
      throw new IllegalStateException(
        s"recursiveUnionAll did not converge in $maxIter iterations")
    acc
  }

  /** `WITH RECURSIVE … UNION` (set) semantics: the new frontier is
    * deduped against everything already derived, so cyclic graphs reach
    * a fixpoint. `keyCols` identifies a derived row (all columns if
    * empty). */
  def recursiveUnion(base: DataFrame, step: DataFrame => DataFrame,
      keyCols: Seq[String] = Seq.empty, maxIter: Int = 100): DataFrame = {
    val keys = if (keyCols.nonEmpty) keyCols else base.columns.toSeq
    var frontier = base.dropDuplicates(keys).localCheckpoint(true)
    var acc = frontier
    var i = 0
    while (i < maxIter && !frontier.isEmpty) {
      frontier = step(frontier).dropDuplicates(keys)
        .join(acc, keys, "left_anti")
        .localCheckpoint(true)
      if (!frontier.isEmpty) acc = acc.unionByName(frontier)
        .localCheckpoint(true)
      i += 1
    }
    if (i >= maxIter)
      throw new IllegalStateException(
        s"recursiveUnion did not converge in $maxIter iterations")
    acc
  }
}
