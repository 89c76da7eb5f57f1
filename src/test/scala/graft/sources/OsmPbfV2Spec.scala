package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** DataSource V2 surface: spark.read.format("osmpbf") must agree with the
  * library reader on the Monaco fixture.
  */
class OsmPbfV2Spec extends SparkSpecBase {

  private val fixture =
    "/root/reference/vendor/github.com/omniscale/go-osm/parser/pbf/monaco-20150428.osm.pbf"

  test("format(osmpbf) matches the library reader element-for-element") {
    val v2 = spark.read.format("osmpbf").load(fixture)
    val lib = OsmPbf.readElements(spark, fixture).toDF()
    assert(v2.count() == lib.count())
    // per-kind counts agree
    val v2k = v2.groupBy("kind").count().collect().map(r => r.getByte(0) -> r.getLong(1)).toMap
    val libk = lib.groupBy("kind").count().collect().map(r => r.getByte(0) -> r.getLong(1)).toMap
    assert(v2k == libk, s"$v2k vs $libk")
    // spot-check: same id+tag content for tagged nodes
    val a = v2.filter(size(col("tags")) > 0 && col("kind") === 0)
      .agg(sum(col("id")), count(lit(1))).collect()(0)
    val b = lib.filter(size(col("tags")) > 0 && col("kind") === 0)
      .agg(sum(col("id")), count(lit(1))).collect()(0)
    assert(a == b, s"$a vs $b")
  }

  test("limitto option prunes out-of-coverage files at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-v2-prune").toString
    OsmPbfSynth.synthesize(spark, fixture, dir, 4)
    val gj = java.nio.file.Files.createTempDirectory("graft-v2-gj")
      .resolve("cov.geojson")
    // copy 0's cell only (grid offset −6.0°: Monaco → ~1.4E, 37.7N)
    java.nio.file.Files.writeString(gj,
      """{"type":"FeatureCollection","features":[{"type":"Feature",
        |"properties":{},"geometry":{"type":"Polygon","coordinates":
        |[[[1.2,37.5],[1.7,37.5],[1.7,38.0],[1.2,38.0],[1.2,37.5]]]}}]}"""
        .stripMargin.replace("\n", ""))
    val all = spark.read.format("osmpbf").load(dir)
    val pruned = spark.read.format("osmpbf")
      .option("limitto", gj.toString).load(dir)
    val nAll = all.count()
    val nPruned = pruned.count()
    assert(nPruned > 0 && nPruned * 4 == nAll,
      s"expected exactly copy 0's elements, got $nPruned of $nAll")
  }

  test("bundleOf over the v2 frame drives the normal pipeline inputs") {
    val bundle = OsmXml.bundleOf(spark.read.format("osmpbf").load(fixture))
    val r = bundle.coords.agg(min("lon"), max("lon")).collect()(0)
    assert(r.getDouble(0) > 7.3 && r.getDouble(1) < 7.6, r.toString)
    assert(bundle.ways.count() > 1000)
  }

  test("includeMetadata option decodes versions; default leaves meta null") {
    val withMeta = spark.read.format("osmpbf")
      .option("includeMetadata", "true").load(fixture)
    assert(withMeta.filter(col("meta").isNotNull && col("meta.version") > 0).count() > 0)
    val bare = spark.read.format("osmpbf").load(fixture)
    assert(bare.filter(col("meta").isNotNull).count() == 0)
  }
}
