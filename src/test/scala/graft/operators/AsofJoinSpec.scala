package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** As-of join semantics on hand-built rows: latest-preceding match,
  * inclusive ties, no-match nulls, key isolation — plus plan shape (one
  * shuffle, no theta-join).
  */
class AsofJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def left = Seq(
    (1L, 100L, "l-a"),  // matches r at 90
    (1L, 50L, "l-b"),   // no preceding right row
    (1L, 200L, "l-c"),  // tie with r at 200 — inclusive
    (2L, 100L, "l-d"),  // key 2: only r at 100 (tie) matches, not key 1 rows
    (3L, 100L, "l-e")   // key absent from right entirely
  ).toDF("k", "ts", "l_tag")

  private def right = Seq(
    (1L, 90L, "r-90", 9.0),
    (1L, 150L, "r-150", 15.0),
    (1L, 200L, "r-200", 20.0),
    (2L, 100L, "r-2-100", 2.0)
  ).toDF("k", "ts", "r_tag", "r_val")

  test("latest preceding right row per key, ties inclusive, nulls when none") {
    val out = AsofJoin.asof(left, right, Seq("k"), "ts", Seq("r_tag", "r_val"))
      .collect().map(r => (r.getAs[String]("l_tag"), r.getAs[String]("r_tag"))).toMap
    assert(out == Map(
      "l-a" -> "r-90", "l-b" -> null, "l-c" -> "r-200",
      "l-d" -> "r-2-100", "l-e" -> null))
  }

  test("all left columns survive; right payload columns are typed") {
    val out = AsofJoin.asof(left, right, Seq("k"), "ts", Seq("r_tag", "r_val"))
    assert(out.columns.toSeq == Seq("k", "ts", "l_tag", "r_tag", "r_val"))
    val row = out.filter(col("l_tag") === "l-a").head()
    assert(row.getAs[Double]("r_val") == 9.0 && row.getAs[Long]("ts") == 100L)
  }

  test("plan shuffles once on the key — no nested-loop/cartesian theta join") {
    val plan = AsofJoin.asof(left, right, Seq("k"), "ts", Seq("r_tag"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("forward: earliest following right row, ties inclusive, nulls when none") {
    val out = AsofJoin.asof(left, right, Seq("k"), "ts", "ts",
        Seq("r_tag", "r_val"), AsofJoin.Forward)
      .collect().map(r => (r.getAs[String]("l_tag"), r.getAs[String]("r_tag"))).toMap
    assert(out == Map(
      "l-a" -> "r-150",   // next after 100
      "l-b" -> "r-90",    // next after 50
      "l-c" -> "r-200",   // tie at 200 — inclusive
      "l-d" -> "r-2-100", // key 2 tie
      "l-e" -> null))     // key absent
  }

  test("nearest: closer of the two directions, equidistant goes backward") {
    val l = Seq(
      (1L, 120L, "n-a"),  // 30 back to 90, 30 fwd to 150 — tie -> backward
      (1L, 95L, "n-b"),   // 5 back to 90 beats 55 fwd
      (1L, 145L, "n-c"),  // 5 fwd to 150 beats 55 back
      (1L, 10L, "n-d"),   // nothing before -> forward match
      (1L, 300L, "n-e"),  // nothing after -> backward match
      (3L, 100L, "n-f")   // key absent from right
    ).toDF("k", "ts", "l_tag")
    val out = AsofJoin.asof(l, right, Seq("k"), "ts", "ts",
        Seq("r_tag"), AsofJoin.Nearest)
      .collect().map(r => (r.getAs[String]("l_tag"), r.getAs[String]("r_tag"))).toMap
    assert(out == Map(
      "n-a" -> "r-90", "n-b" -> "r-90", "n-c" -> "r-150",
      "n-d" -> "r-90", "n-e" -> "r-200", "n-f" -> null))
  }

  test("forward agrees with a brute-force per-row scan on sf0.001 events") {
    val ev = graft.queries.t(spark, sf001, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    val fast = AsofJoin.asof(clicks, views, Seq("user_id"), "ts", "ts",
        Seq("view_id"), AsofJoin.Forward)
      .select("click_id", "view_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    val vRows = views.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val slow = clicks.collect().map { c =>
      val (id, u, ts) = (c.getLong(0), c.getLong(1), c.getLong(2))
      // min ts, then max view_id on ties (largest payload struct)
      val best = vRows.filter(v => v._1 == u && v._2 >= ts)
        .sortBy(v => (-v._2, v._3)).lastOption
      id -> best.map(_._3).getOrElse(-1L)
    }.toMap
    assert(fast == slow)
  }

  test("agrees with a brute-force per-row scan on sf0.001 events") {
    val ev = graft.queries.t(spark, sf001, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    val fast = AsofJoin.asof(clicks, views, Seq("user_id"), "ts", "ts", Seq("view_id"))
      .select("click_id", "view_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    val vRows = views.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val slow = clicks.collect().map { c =>
      val (id, u, ts) = (c.getLong(0), c.getLong(1), c.getLong(2))
      val best = vRows.filter(v => v._1 == u && v._2 <= ts)
        .sortBy(v => (v._2, v._3)).lastOption
      id -> best.map(_._3).getOrElse(-1L)
    }.toMap
    assert(fast == slow)
  }
}
