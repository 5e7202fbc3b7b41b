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

  /** Connected components by min-label propagation — the operator that
    * turns near-duplicate PAIRS into duplicate CLUSTERS (pick one
    * representative per component to keep; drop the rest).
    *
    * Each vertex starts labelled with its own id; every iteration each
    * vertex takes the min of its label and its neighbours' labels; the
    * fixpoint labels every vertex with the min id of its component.
    * Convergence in O(component diameter) iterations — near-dup graphs
    * are unions of small cliques, so 2-3 rounds in practice. Each round
    * is one co-partitioned join + one partial-agg shuffle on vertex id;
    * frontiers are localCheckpointed like the other fixpoints here.
    * (For adversarial long-chain graphs the large-star/small-star
    * variant halves the diameter per round; the dedup workload never
    * needs it.)
    *
    * Semi-naive: only vertices whose label CHANGED last round propagate
    * in the next one, so per-round cost tracks the active frontier, not
    * the graph.
    *
    * @param edges undirected edge list (columns `srcCol`, `dstCol`);
    *              vertices = every id appearing in an edge. Isolated
    *              vertices don't appear in the output (their component
    *              is themselves).
    * @return (id, component) with component = min id reachable
    */
  def connectedComponents(edges: DataFrame, srcCol: String,
      dstCol: String, maxIter: Int = 50): DataFrame = {
    import org.apache.spark.sql.functions._
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct().localCheckpoint(true)
    var labels = sym.select(col("a").as("id"), col("a").as("lab"))
      .distinct().localCheckpoint(true)
    var frontier = labels
    var i = 0
    while (i < maxIter && !frontier.isEmpty) {
      // labels that changed last round, pushed across their edges
      val prop = sym.join(frontier, col("b") === col("id"))
        .groupBy(col("a")).agg(min("lab").as("nlab"))
      val next = labels.join(prop, labels("id") === prop("a"), "left")
        .select(labels("id"),
          least(labels("lab"), coalesce(col("nlab"), labels("lab")))
            .as("lab"))
        .localCheckpoint(true)
      frontier = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .where(col("n.lab") < col("o.lab"))
        .select(col("n.id").as("id"), col("n.lab").as("lab"))
        .localCheckpoint(true)
      labels = next
      i += 1
    }
    if (i >= maxIter)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations")
    labels.select(col("id"), col("lab").as("component"))
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
