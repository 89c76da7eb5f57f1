package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.mapping.{CompiledMapping, MappingConf}
import graft.sources.{OsmPbf, TagFilters}

/** One-number probe: what fraction of (tag-prefiltered) ways does the
  * import's assembly semi-join actually keep? If ~all, the semi-join
  * shuffle buys nothing on this mapping.
  *
  * Run: sbt "Test/runMain graft.tools.MatchFractionProbe"
  */
object MatchFractionProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val mapping = new CompiledMapping(
      MappingConf.fromFile("/root/reference/test/complete_db_mapping.json"))
    val bundle = OsmPbf.read(spark, "/root/repo/target/bench-pbf", Some(TagFilters(mapping)))

    val lm = mapping.lineStringMatcher
    val gm = mapping.polygonMatcher
    val wtf = mapping.wayTagFilter
    val matched = udf { (t: Map[String, String], closed: Boolean) =>
      val ft = wtf.filter(t)
      lm.matchWay(ft, closed).nonEmpty || gm.matchWay(ft, closed).nonEmpty
    }
    val ways = bundle.ways.withColumn("__closed",
      size(col("refs")) >= 4 && col("refs").getItem(0) === element_at(col("refs"), -1))
    val total = ways.count()
    val nMatched = ways.filter(matched(col("tags"), col("__closed"))).count()
    val memberIds = bundle.relations
      .select(explode(col("members")).as("m"))
      .filter(col("m.type") === 1).select(col("m.id")).distinct().count()
    println(s"[probe] ways=$total matched=$nMatched (${100.0 * nMatched / total}%) " +
      s"distinctMemberWayIds=$memberIds")
    spark.stop()
  }
}
