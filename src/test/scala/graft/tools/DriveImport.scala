package graft.tools
import org.apache.spark.sql.SparkSession
import graft.ImportPipeline
import graft.sources.OsmXml

/** Manual end-to-end drive: full complete_db import, table counts + samples. */
object DriveImport {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mappingFile = if (args.nonEmpty) args(0) else "/root/reference/test/complete_db_mapping.json"
    val osmFile = if (args.length > 1) args(1) else "/root/reference/test/complete_db.osm"
    val t0 = System.nanoTime()
    val tables = ImportPipeline(spark, mappingFile).run(OsmXml.read(spark, osmFile))
    tables.toSeq.sortBy(_._1).foreach { case (name, df) =>
      println(f"TABLE $name%-28s rows=${df.count()}")
    }
    println("SAMPLE places: " + tables("places").collect().mkString(" | "))
    println(f"ELAPSED ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
