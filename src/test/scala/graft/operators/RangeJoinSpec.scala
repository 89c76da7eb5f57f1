package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Bucketized range join: inclusive boundaries, exactly-once pair matching
  * across bucket replicas, agreement with a brute-force theta join, and a
  * plan with no nested-loop join.
  */
class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def points = Seq(
    (1L, 5L), (2L, 10L), (3L, 25L), (4L, 30L), (5L, 31L), (6L, 100L)
  ).toDF("p_id", "x")

  // interval B spans 3 buckets at width 10 — pairs must still be unique
  private def intervals = Seq(
    (10L, 10L, 30L),  // A: [10, 30]
    (20L, 8L, 31L),   // B: [8, 31]
    (30L, 90L, 95L)   // C: [90, 95] — matches nothing
  ).toDF("i_id", "s", "e")

  test("inclusive bounds, exactly-once pairs across replicated buckets") {
    val out = RangeJoin.pointInInterval(points, intervals, "x", "s", "e", 10L)
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == out.distinct.length, "duplicate pairs")
    assert(out.toSet == Set(
      (2L, 10L), (3L, 10L), (4L, 10L),          // A gets 10, 25, 30
      (2L, 20L), (3L, 20L), (4L, 20L), (5L, 20L) // B gets 10, 25, 30, 31
    ))
  }

  test("plan is an equi join on the bucket — no nested loop, no cartesian") {
    val plan = RangeJoin.pointInInterval(points, intervals, "x", "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("intervalOverlap: exactly-once pairs, randomized brute-force parity") {
    // seeded random interval sets whose spans straddle many buckets —
    // the canonical-bucket residual must keep each overlapping pair once
    val rnd = new scala.util.Random(7)
    val ls = (1 to 120).map { i =>
      val s = rnd.nextInt(1000).toLong; (i.toLong, s, s + rnd.nextInt(60))
    }
    val rs = (1 to 120).map { i =>
      val s = rnd.nextInt(1000).toLong; (i.toLong, s, s + rnd.nextInt(60))
    }
    val l = ls.toDF("l_id", "ls", "le")
    val r = rs.toDF("r_id", "rs", "re")
    val fast = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re", 25L)
      .select("l_id", "r_id").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(fast.length == fast.distinct.length, "duplicate pairs")
    val slow = (for {
      (li, s1, e1) <- ls; (ri, s2, e2) <- rs
      if s1 <= e2 && s2 <= e1
    } yield (li, ri)).toSet
    assert(fast.toSet == slow && slow.nonEmpty)
    val plan = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re", 25L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("agrees with a brute-force theta join on sf0.001 events") {
    val ev = graft.queries.t(spark, sf001, "events")
      .withColumn("ts_us", expr("ts DIV 1000"))
    val w = ev.filter(col("event_type") === "error" && col("value") > 80)
      .select(col("event_id").as("err_id"), col("ts_us").as("s"),
        (col("ts_us") + lit(1800000000L)).as("e"))
    val p = ev.select(col("event_id").as("p_id"), col("ts_us"))
    val fast = RangeJoin.pointInInterval(p, w, "ts_us", "s", "e", 1800000000L)
      .select("p_id", "err_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val slow = p.join(w, col("ts_us") >= col("s") && col("ts_us") <= col("e"))
      .select("p_id", "err_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == slow && fast.nonEmpty)
  }
}
