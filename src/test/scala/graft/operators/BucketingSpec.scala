package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Bucketed co-located joins: same results as the shuffle plan, but the
  * join and the aggregation on the bucket key run with zero exchanges.
  */
class BucketingSpec extends SparkSpecBase {

  private lazy val tables: Unit = {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = spark.read.parquet(s"$sf001/orders.parquet")
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .select("l_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_bkt", "l_orderkey")
    Bucketing.writeBucketed(o, "o_bkt", "l_orderkey")
  }

  test("bucketed join plans with zero exchanges and matches shuffle join") {
    tables
    val joined = Bucketing.bucketedJoin(spark, "li_bkt", "o_bkt", "l_orderkey")
    assert(Bucketing.shuffleFree(joined),
      joined.queryExecution.executedPlan.toString)

    val viaBuckets = joined.agg(count(lit(1)), sum("l_quantity")).head()
    val plain = spark.read.parquet(s"$sf001/lineitem.parquet")
      .join(spark.read.parquet(s"$sf001/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)), sum("l_quantity")).head()
    assert(viaBuckets == plain)
  }

  test("aggregation on the bucket key reuses the layout — no exchange") {
    tables
    val agg = spark.table("li_bkt").groupBy("l_orderkey")
      .agg(sum("l_extendedprice").as("rev"))
    assert(Bucketing.shuffleFree(agg),
      agg.queryExecution.executedPlan.toString)
  }
}
