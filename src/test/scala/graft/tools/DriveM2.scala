package graft.tools
import org.apache.spark.sql.SparkSession
import graft.mapping._
import graft.sources._

/** Manual end-to-end drive of the public mapping+source API (verification aid). */
object DriveM2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cm = new CompiledMapping(MappingConf.fromFile("/root/reference/test/complete_db_mapping.json"))
    println("TABLES=" + cm.conf.tables.keys.mkString(","))
    val b = OsmXml.read(spark, "/root/reference/test/complete_db.osm")
    println(s"COUNTS coords=${b.coords.count} nodes=${b.nodes.count} ways=${b.ways.count} rels=${b.relations.count}")
    val tagged = b.nodes.collect().map(r => (r.getLong(0), r.getAs[Map[String, String]]("tags")))
    val matched = tagged.flatMap { case (id, t) =>
      cm.pointMatcher.matchNode(cm.nodeTagFilter.filter(t)).map(m => (id, m.table, m.key, m.value)) }
    println("POINT_MATCHES=" + matched.take(8).mkString(" | "))
    println("N_POINT_MATCHES=" + matched.length)
    println("PROBE_area_no=" + cm.polygonMatcher.matchWay(Map("building" -> "yes", "area" -> "no"), isClosed = true))
    println("PROBE_bad_mapping=" + (try { MappingConf.fromString("tables: {bad: {}}"); "NO-ERROR" }
      catch { case e: Exception => "ERR:" + e.getMessage }))
    spark.stop()
  }
}
