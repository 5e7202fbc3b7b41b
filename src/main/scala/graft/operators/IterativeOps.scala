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

  /** Checkpoint a fixpoint frontier: eager localCheckpoint to cut the
    * RDD/plan lineage, then strip the checkpoint's stats snapshot
    * (PlanBridge.freshStats) so per-round size estimates cannot
    * compound across iterations — without the strip, a long-chain
    * fixpoint's estimates square per round until the driver hangs in
    * BigInteger stats arithmetic around iteration ~15. */
  private def materialize(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.PlanBridge.freshStats(df.localCheckpoint(true))

  /** `WITH RECURSIVE … UNION ALL` semantics: accumulate every frontier,
    * stop when a step yields no rows. Terminates only on acyclic
    * derivations (like the SQL construct itself: a cycle recurses
    * forever) — `maxIter` is the guard rail. */
  def recursiveUnionAll(base: DataFrame, step: DataFrame => DataFrame,
      maxIter: Int = 100): DataFrame = {
    var frontier = materialize(base)
    var acc = frontier
    var i = 0
    while (i < maxIter && !frontier.isEmpty) {
      frontier = materialize(step(frontier))
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
    * (For long-chain graphs, or when round-count itself is the cost —
    * each round is a driver sync — use [[connectedComponentsStar]],
    * which contracts paths and converges in O(log n) rounds.)
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
    val sym = materialize(
      edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
        .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
        .distinct())
    var labels = materialize(
      sym.select(col("a").as("id"), col("a").as("lab")).distinct())
    var frontier = labels
    var i = 0
    while (i < maxIter && !frontier.isEmpty) {
      // labels that changed last round, pushed across their edges
      val prop = sym.join(frontier, col("b") === col("id"))
        .groupBy(col("a")).agg(min("lab").as("nlab"))
      val next = materialize(
        labels.join(prop, labels("id") === prop("a"), "left")
          .select(labels("id"),
            least(labels("lab"), coalesce(col("nlab"), labels("lab")))
              .as("lab")))
      frontier = materialize(next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .where(col("n.lab") < col("o.lab"))
        .select(col("n.id").as("id"), col("n.lab").as("lab")))
      labels = next
      i += 1
    }
    if (i >= maxIter)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations")
    labels.select(col("id"), col("lab").as("component"))
  }

  /** Connected components by alternating large-star/small-star (Kiveris
    * et al. 2014, "Connected Components in MapReduce and Beyond",
    * SoCC — the two-operation edge-rewriting algorithm), same contract
    * as [[connectedComponents]]: (id, component = min id reachable),
    * vertices = every id appearing in an edge.
    *
    * Why a second formulation: min-label propagation converges in
    * O(diameter) rounds — fine for near-dup cliques, linear-round on
    * chain-shaped graphs — while star alternation contracts PATHS, not
    * just labels, converging in O(log n) rounds on any topology, and
    * each round's jobs touch the shrinking edge set (stars collapse),
    * not a full vertex-label table. Per round:
    *   - large-star: every vertex points its LARGER neighbours at the
    *     min of its neighbourhood (one groupBy-min + one co-keyed
    *     join);
    *   - small-star: every vertex and its smaller-or-equal neighbours
    *     collapse onto that min (same two-job shape);
    *   - convergence = the canonical edge set's (count, xxhash sum)
    *     fingerprint repeating — one agg row per round, no edge-set
    *     diff join.
    * All joins key on a vertex id (broadcast/shuffle-hash by size), no
    * collect, state = the edge set itself (monotonically contracting
    * toward one star per component). */
  def connectedComponentsStar(edges: DataFrame, srcCol: String,
      dstCol: String, maxIter: Int = 30): DataFrame = {
    import org.apache.spark.sql.functions._
    // self-loop-only vertices carry no connectivity but ARE vertices
    // under the shared contract ("every id appearing in an edge") —
    // they re-enter as singletons after the fixpoint
    val selfIds = materialize(
      edges.where(col(srcCol) === col(dstCol))
        .select(col(srcCol).as("id")).distinct())
    var e = materialize(
      edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
        .where(col("s") =!= col("d"))
        .select(greatest(col("s"), col("d")).as("hi"),
          least(col("s"), col("d")).as("lo"))
        .distinct())
    // set fingerprint: count + order-independent bit_xor of edge hashes
    // (xor, not sum: ANSI-safe, and the set is distinct so no pair of
    // identical hashes can cancel)
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("hi"),
        col("lo"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var prev = fingerprint(e)
    var done = prev._1 == 0L
    var i = 0
    while (i < maxIter && !done) {
      // large-star: neighbourhoods over BOTH directions; m = min of
      // Γ(u) ∪ {u}; larger neighbours re-point at m
      val nbrs = e.select(col("hi").as("u"), col("lo").as("v"))
        .unionByName(e.select(col("lo").as("u"), col("hi").as("v")))
      val mins = nbrs.groupBy("u").agg(min(col("v")).as("mnv"))
        .select(col("u"), least(col("mnv"), col("u")).as("m"))
      val large = nbrs.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
      // small-star: key each edge on its larger endpoint; u and all its
      // ≤-neighbours collapse onto the neighbourhood min
      val pairs = large
        .select(greatest(col("hi"), col("lo")).as("u"),
          least(col("hi"), col("lo")).as("v"))
        .where(col("u") =!= col("v"))
      val smins = pairs.groupBy("u").agg(min(col("v")).as("m"))
      val small = pairs.join(smins, "u").where(col("v") =!= col("m"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .unionByName(smins.select(col("u").as("hi"), col("m").as("lo")))
      e = materialize(small
        .select(greatest(col("hi"), col("lo")).as("hi"),
          least(col("hi"), col("lo")).as("lo"))
        .distinct())
      val fp = fingerprint(e)
      done = fp == prev
      prev = fp
      i += 1
    }
    if (i >= maxIter && !done)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIter iterations")
    // at the fixpoint e is one star per component: (node, min); centers
    // appear only on the lo side and label themselves
    val comp = e.select(col("hi").as("id"), col("lo").as("component"))
      .unionByName(e.select(col("lo"), col("lo")).distinct()
        .toDF("id", "component"))
      .distinct()
    comp.unionByName(
      selfIds.join(comp.select("id"), Seq("id"), "left_anti")
        .select(col("id"), col("id").as("component")))
  }

  /** `WITH RECURSIVE … UNION` (set) semantics: the new frontier is
    * deduped against everything already derived, so cyclic graphs reach
    * a fixpoint. `keyCols` identifies a derived row (all columns if
    * empty). */
  def recursiveUnion(base: DataFrame, step: DataFrame => DataFrame,
      keyCols: Seq[String] = Seq.empty, maxIter: Int = 100): DataFrame = {
    val keys = if (keyCols.nonEmpty) keyCols else base.columns.toSeq
    var frontier = materialize(base.dropDuplicates(keys))
    var acc = frontier
    var i = 0
    while (i < maxIter && !frontier.isEmpty) {
      frontier = materialize(step(frontier).dropDuplicates(keys)
        .join(acc, keys, "left_anti"))
      if (!frontier.isEmpty) acc = materialize(acc.unionByName(frontier))
      i += 1
    }
    if (i >= maxIter)
      throw new IllegalStateException(
        s"recursiveUnion did not converge in $maxIter iterations")
    acc
  }
}
