package graft.operators

import graft.SparkSpecBase

/** Min-label propagation components: chains that need multiple rounds,
  * bridged components, isolated pairs, and idempotent labels.
  */
class ConnectedComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.clusters(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a long chain converges to the minimum endpoint") {
    // path 1-2-…-9 has diameter 8: exercises the multi-round fixpoint
    val out = run((1L until 9L).map(i => (i, i + 1)))
    assert(out == (1L to 9L).map(_ -> 1L).toMap)
  }

  test("bridge edge merges two triangles; separate pair stays separate") {
    val out = run(Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),     // triangle A
      (7L, 8L), (8L, 9L), (9L, 7L),     // triangle B
      (3L, 7L),                          // bridge: one component, min = 1
      (20L, 21L)))                       // isolated pair
    assert(Seq(1L, 2L, 3L, 7L, 8L, 9L).forall(out(_) == 1L))
    assert(out(20L) == 20L && out(21L) == 20L)
  }

  test("pointer jumping converges a 300-node chain in O(log n) rounds") {
    // diameter 299: plain propagation needs 299 rounds; the l(l(v))
    // shortcut halves chain depth per round, so 12 is ample headroom
    // over the ~9 it takes — and far below the diameter
    val edges = (1L until 300L).map(i => (i, i + 1)).toDF("a", "b")
    val out = ConnectedComponents.clusters(edges, "a", "b", maxRounds = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == (1L to 300L).map(_ -> 1L).toMap)
  }

  test("labels are a fixpoint: rerunning on (id, cluster) edges is stable") {
    val edges = Seq((5L, 6L), (6L, 2L), (10L, 11L))
    val first = run(edges)
    val again = run(first.toSeq.filter { case (id, c) => id != c })
    assert(first.filter { case (id, c) => id != c || edges.exists(e => e._1 == id || e._2 == id) }
      .forall { case (id, c) => again.getOrElse(id, c) == c })
  }
}
