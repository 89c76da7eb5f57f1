package graft.sources

import graft.SparkSpecBase
import graft.model.{Kind, Op}

class OsmXmlSpec extends SparkSpecBase {
  val completeOsm = "/root/reference/test/complete_db.osm"
  val completeOsc = "/root/reference/test/complete_db.osc"

  test("parses complete_db.osm into the four frames") {
    val b = OsmXml.read(spark, completeOsm)
    val nCoords = b.coords.count()
    val nNodes = b.nodes.count()
    val nWays = b.ways.count()
    val nRels = b.relations.count()
    assert(nCoords > nNodes && nNodes > 0, s"coords=$nCoords nodes=$nNodes")
    assert(nWays > 0 && nRels > 0)
    // node 10000 is the tagged place=village (complete_db.osm:3-6)
    val n = b.nodes.filter("id = 10000").collect()
    assert(n.length == 1)
    val tags = n(0).getAs[Map[String, String]]("tags")
    assert(tags("place") == "village" && tags("name") == "Foo")
  }

  test("ways carry ordered refs; relations carry typed members") {
    import spark.implicits._
    val elems = OsmXml.readElements(spark, completeOsm)
    val way = elems.filter(e => e.kind == Kind.Way).head()
    assert(way.refs.nonEmpty)
    val rel = elems.filter(e => e.kind == Kind.Relation && e.members.nonEmpty).head()
    assert(rel.members.forall(m => m.mtype >= 0 && m.mtype <= 2))
  }

  test("osc parse assigns ops") {
    import spark.implicits._
    val diff = OsmXml.readDiff(spark, completeOsc)
    val ops = diff.map(_.op).collect().toSet
    assert(ops.contains(Op.Modify) || ops.contains(Op.Create))
    assert(ops.contains(Op.Delete))
  }
}

class OsmXmlGzSpec extends graft.SparkSpecBase {
  test("gzipped .osc parses identically to the plain file") {
    val src = java.nio.file.Paths.get("/root/reference/test/complete_db.osc")
    val dir = java.nio.file.Files.createTempDirectory("graft-gz")
    val gz = dir.resolve("complete_db.osc.gz")
    val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(gz))
    try out.write(java.nio.file.Files.readAllBytes(src)) finally out.close()

    val plain = OsmXml.readDiff(spark, src.toString).collect()
    val zipped = OsmXml.readDiff(spark, gz.toString).collect()
    assert(zipped.length == plain.length && zipped.length > 0)
    assert(zipped.map(e => (e.kind, e.id, e.op)).toSet ==
      plain.map(e => (e.kind, e.id, e.op)).toSet)
  }
}
