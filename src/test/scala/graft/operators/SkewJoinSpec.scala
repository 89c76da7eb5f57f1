package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Salted skew join: result parity with the plain join on a pathologically
  * skewed fixture, deterministic salting under recomputation, and the
  * distribution property the salt exists for — a hot key's rows spread
  * over all salt values instead of one reducer.
  */
class SkewJoinSpec extends SparkSpecBase {

  import spark.implicits._

  // 10k rows of one hot key + a uniform tail, joined against a 100-row dim
  private lazy val big = spark.range(12000)
    .select(
      when(col("id") < 10000, 7L).otherwise(pmod(col("id"), lit(100L))).as("k"),
      col("id").as("payload"))
  private lazy val dim = spark.range(100)
    .select(col("id").as("k"), concat(lit("dim"), col("id")).as("tag"))

  test("row-identical to the plain join on a skewed fixture") {
    val plain = big.join(dim, Seq("k"))
      .select("k", "payload", "tag").collect().map(_.toSeq).toSet
    val salted = SkewJoin.salted(big, dim, Seq("k"), salts = 8)
      .select("k", "payload", "tag").collect().map(_.toSeq).toSet
    assert(salted == plain && plain.size == 12000)
  }

  test("hot key rows spread across every salt; salting is deterministic") {
    val saltOf = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(8L)).cast("int"))
    val hot = saltOf.filter(col("k") === 7)
      .groupBy("__salt").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(hot.keySet == (0 until 8).toSet, s"salts unused: $hot")
    // roughly uniform: no salt holds more than 2x its fair share
    assert(hot.values.max <= 2 * 10000 / 8, s"skew survived salting: $hot")
    // deterministic: recomputation deals identical salts (task-retry safety)
    val a = saltOf.select("payload", "__salt").collect().map(_.toSeq).toSet
    val b = saltOf.select("payload", "__salt").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("salted collect-style aggregation merges to the unsalted answer") {
    val direct = big.groupBy("k")
      .agg(sort_array(collect_list(col("payload"))).as("payload"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val salted = SkewJoin.saltedAgg(big, Seq("k"), salts = 8,
        partial = collect_list, valueCol = "payload",
        merge = c => sort_array(flatten(collect_list(c))))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(salted.keySet == direct.keySet,
      s"key sets differ: ${salted.keySet.size} vs ${direct.keySet.size}")
    direct.foreach { case (k, vs) =>
      assert(salted(k) == vs, s"key $k: ${salted(k).take(5)}… vs ${vs.take(5)}…")
    }
    // 10000 hot rows + the 20 tail ids with id % 100 == 7
    assert(direct(7L).length == 10020)
  }
}
