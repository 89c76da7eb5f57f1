package graft.queries

import graft.SparkSpecBase

/** Always-on version of the tools/ExplainCheck census: plans EVERY
  * SparkEntry query on sf0.001 and fails if any plan contains a
  * CartesianProduct, or a BroadcastNestedLoopJoin outside the two
  * legitimate classes (broadcast query-vectors against a corpus scan in
  * the ANN family; the scalar-attach crossJoin of a broadcast ≤1-row
  * aggregate — allowlisted by name in ExplainCheck.legitBnlj). A new
  * query that silently degrades to the O(n·m) join shape fails
  * `sbt test`, not a bench round.
  */
class PlanCensusSpec extends SparkSpecBase {

  test("no query plan degrades to a cartesian or rogue nested-loop join") {
    val bad = graft.SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      try {
        val plan = graft.SparkEntry.queries(name)(spark, sf001)
          .queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val rogue = plan.contains("BroadcastNestedLoopJoin") &&
          !graft.tools.ExplainCheck.legitBnlj.contains(name)
        if (cart || rogue) Some(s"$name: cartesian=$cart rogueBnlj=$rogue")
        else None
      } catch {
        case e: Throwable => Some(s"$name: planning failed: ${e.getMessage}")
      }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
