package graft

import org.apache.spark.sql.functions._
import graft.operators.IterativeOps

/** Fixpoint-iteration semantics (the WITH RECURSIVE equivalent). */
class IterativeOpsSpec extends SparkSpecBase {

  test("recursiveUnionAll accumulates every frontier on a chain") {
    import spark.implicits._
    // edges 1→2→3→4; reachability from 1
    val edges = Seq((1, 2), (2, 3), (3, 4)).toDF("src", "dst")
    val base = Seq(1).toDF("node")
    val out = IterativeOps.recursiveUnionAll(base, f =>
      edges.join(f, edges("src") === f("node"))
        .select(col("dst").as("node")))
      .orderBy("node").collect().map(_.getInt(0)).toSeq
    assert(out == Seq(1, 2, 3, 4))
  }

  test("recursiveUnion reaches a fixpoint on a cyclic graph") {
    import spark.implicits._
    // 1→2→3→1 cycle plus 3→4: UNION-ALL would never terminate here
    val edges = Seq((1, 2), (2, 3), (3, 1), (3, 4)).toDF("src", "dst")
    val base = Seq(1).toDF("node")
    val out = IterativeOps.recursiveUnion(base, f =>
      edges.join(f, edges("src") === f("node"))
        .select(col("dst").as("node")))
      .orderBy("node").collect().map(_.getInt(0)).toSeq
    assert(out == Seq(1, 2, 3, 4))
  }

  test("recursiveUnion dedups on key columns (first derivation wins)") {
    import spark.implicits._
    // two paths to node 3 with different lengths; key = node keeps the
    // shorter (first-derived) depth
    val edges = Seq((1, 2), (2, 3), (1, 3)).toDF("src", "dst")
    val base = Seq((1, 0)).toDF("node", "depth")
    val out = IterativeOps.recursiveUnion(base, f =>
      edges.join(f, edges("src") === f("node"))
        .select(col("dst").as("node"), (col("depth") + 1).as("depth")),
      keyCols = Seq("node"))
      .orderBy("node").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(out == Seq((1, 0), (2, 1), (3, 1)))
  }

  test("connectedComponents labels every vertex with its component min") {
    import spark.implicits._
    // components {1,2,3}, {5,7}, {9,10,11,12} (a 4-chain), given as an
    // arbitrary-direction edge list
    val edges = Seq((2, 1), (2, 3), (7, 5), (9, 10), (11, 10), (12, 11))
      .toDF("a", "b")
    val out = IterativeOps.connectedComponents(edges, "a", "b")
      .orderBy("id").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(out == Seq(1 -> 1, 2 -> 1, 3 -> 1, 5 -> 5, 7 -> 5,
      9 -> 9, 10 -> 9, 11 -> 9, 12 -> 9))
  }

  test("connectedComponents converges on a cycle and a long chain") {
    import spark.implicits._
    // an 8-cycle plus a 10-chain: diameter forces several rounds
    val cycle = (0 until 8).map(i => (i, (i + 1) % 8))
    val chain = (100 until 109).map(i => (i, i + 1))
    val edges = (cycle ++ chain).toDF("a", "b")
    val comp = IterativeOps.connectedComponents(edges, "a", "b")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    assert((0 until 8).forall(comp(_) == 0))
    assert((100 to 109).forall(comp(_) == 100))
  }

  test("connectedComponentsStar matches min-label propagation on cliques, " +
      "cycles, chains and a random graph") {
    import spark.implicits._
    val clique = for (i <- 1 to 4; j <- (i + 1) to 4) yield (i, j)
    val cycle = (10 until 18).map(i => (i, 10 + (i - 9) % 8))
    val chain = (100 until 140).map(i => (i + 1, i)) // 41-node chain
    val rnd = new scala.util.Random(7)
    val random = (0 until 200).map(_ =>
      (200 + rnd.nextInt(120), 200 + rnd.nextInt(120)))
      .filter { case (a, b) => a != b }
    val edges = (clique ++ cycle ++ chain ++ random).toDF("a", "b")
    val star = IterativeOps.connectedComponentsStar(edges, "a", "b")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    val label = IterativeOps.connectedComponents(edges, "a", "b")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    assert(star == label)
    // the 41-node chain converges in O(log n) star rounds — well inside
    // a maxIter that the O(diameter) label algorithm would blow through
    val chainOnly = chain.toDF("a", "b")
    val starChain = IterativeOps
      .connectedComponentsStar(chainOnly, "a", "b", maxIter = 8)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    assert((100 to 140).forall(starChain(_) == 100))
  }

  test("connectedComponentsStar keeps self-loop-only vertices as " +
      "singletons — the shared vertex contract with min-label") {
    import spark.implicits._
    // 9 is reflexive-only; 1-2 connect; 2 ALSO has a self-loop (must
    // not double-report)
    val edges = Seq((1, 2), (9, 9), (2, 2)).toDF("a", "b")
    val star = IterativeOps.connectedComponentsStar(edges, "a", "b")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    val label = IterativeOps.connectedComponents(edges, "a", "b")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    assert(star == Seq((1, 1), (2, 1), (9, 9)))
    assert(star == label)
  }

  test("connectedComponentsStar handles empty input and a single edge") {
    import spark.implicits._
    val empty = Seq.empty[(Int, Int)].toDF("a", "b")
    assert(IterativeOps.connectedComponentsStar(empty, "a", "b")
      .collect().isEmpty)
    val one = Seq((9, 5)).toDF("a", "b")
    assert(IterativeOps.connectedComponentsStar(one, "a", "b")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq ==
      Seq(5 -> 5, 9 -> 5))
  }

  test("recursiveUnionAll raises after maxIter on a cycle") {
    import spark.implicits._
    val edges = Seq((1, 2), (2, 1)).toDF("src", "dst")
    val base = Seq(1).toDF("node")
    assertThrows[IllegalStateException] {
      IterativeOps.recursiveUnionAll(base, f =>
        edges.join(f, edges("src") === f("node"))
          .select(col("dst").as("node")), maxIter = 5).count()
    }
  }
}
