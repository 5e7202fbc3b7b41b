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
