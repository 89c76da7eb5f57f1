package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.mapping.{CompiledMapping, MappingConf}
import graft.operators.WayAssembly
import graft.sources.OsmPbf

/** Phase-level timing on the synthesized scale PBF (not a test — a probe
  * for deciding where import time actually goes). Run:
  * sbt "Test/runMain graft.tools.DriveScale"
  */
object DriveScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "32g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/repo/target/bench-pbf"
    val mapping = new CompiledMapping(
      MappingConf.fromFile("/root/reference/test/complete_db_mapping.json"))

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    val bundle = OsmPbf.read(spark, dir)
    time("parse+cache (counts)") {
      println(bundle.coords.count() + " coords, " + bundle.ways.count() + " ways, " +
        bundle.relations.count() + " rels")
    }

    val wtf = mapping.wayTagFilter
    val lm = mapping.lineStringMatcher
    val gm = mapping.polygonMatcher
    val wayFilter = udf((t: Map[String, String]) => wtf.filter(t))
    val matchLine = udf((t: Map[String, String], c: Boolean) => lm.matchWay(t, c))
    val matchPoly = udf((t: Map[String, String], c: Boolean) => gm.matchWay(t, c))
    val waysF = bundle.ways
      .withColumn("tags", wayFilter(col("tags")))
      .withColumn("__closed",
        size(col("refs")) >= 4 && col("refs").getItem(0) === element_at(col("refs"), -1))
      .withColumn("__line", matchLine(col("tags"), col("__closed")))
      .withColumn("__poly", matchPoly(col("tags"), col("__closed")))
      .persist()
    time("way filter+match (3 UDFs)") {
      println(waysF.filter(size(col("__line")) > 0 || size(col("__poly")) > 0).count() + " matched")
    }

    import graft.functions.GeomFunctions._
    val coords = bundle.coords
      .withColumn("x", mercX(quantizeCoord(col("lon"))))
      .withColumn("y", mercY(quantizeCoord(col("lat"))))
      .select("id", "x", "y")
    val matchedIds = waysF
      .filter(size(col("__line")) > 0 || size(col("__poly")) > 0).select("id")
    val memberWayIds = bundle.relations
      .select(explode(col("members")).as("m")).filter(col("m.type") === 1)
      .select(col("m.id").as("id"))
    val assembled = WayAssembly.resolve(
      bundle.ways.join(matchedIds.union(memberWayIds).distinct(), Seq("id"), "left_semi"),
      coords).persist()
    time("way assembly (shuffle join + regroup)") {
      println(assembled.count() + " assembled")
    }

    time("line WKB build") {
      println(waysF.filter(size(col("__line")) > 0).join(assembled, Seq("id"))
        .withColumn("g", lineWkb(3857)(col("xs"), col("ys")))
        .filter(col("g").isNotNull).count() + " lines")
    }
    time("polygon WKB build+validate") {
      println(waysF.filter(size(col("__poly")) > 0).join(assembled, Seq("id"))
        .withColumn("g", polygonValidWkb(3857)(col("xs"), col("ys")))
        .filter(col("g").isNotNull).count() + " polys")
    }

    val ntf = mapping.nodeTagFilter
    val pm = mapping.pointMatcher
    val nodeFilter = udf((t: Map[String, String]) => ntf.filter(t))
    val matchNode = udf((t: Map[String, String]) => pm.matchNode(t))
    time("node filter+match (2 UDFs)") {
      println(bundle.nodes
        .withColumn("tags", nodeFilter(col("tags")))
        .withColumn("m", matchNode(col("tags")))
        .filter(size(col("m")) > 0).count() + " matched nodes")
    }
    spark.stop()
  }
}
