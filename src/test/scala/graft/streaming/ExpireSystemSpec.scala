package graft.streaming

import graft.SparkSpecBase
import graft.mapping.{CompiledMapping, MappingConf}
import graft.sources.OsmXml

/** End-to-end expire-tiles through the diff pipeline against the
  * reference's expire_tiles fixture: the EXACT tile set of
  * test/expire_tiles_test.go:79-167 (old + new geometries, adaptive zoom,
  * nothing extra).
  */
class ExpireSystemSpec extends SparkSpecBase {

  private lazy val tiles: Set[(Long, Long, Int)] = {
    val mapping = new CompiledMapping(
      MappingConf.fromFile("/root/reference/test/expire_tiles_mapping.yml"))
    val stateDir = java.nio.file.Files.createTempDirectory("graft-exp-state").toString
    val expireDir = java.nio.file.Files.createTempDirectory("graft-exp-tiles").toString
    DiffPipeline.init(spark, mapping, stateDir,
      OsmXml.read(spark, "/root/reference/test/expire_tiles.osm"))
    DiffPipeline.applyDiff(spark, mapping, stateDir,
      OsmXml.readDiff(spark, "/root/reference/test/expire_tiles.osc").toDF(),
      expireDir = Some(expireDir))
    spark.read.textFile(s"$expireDir/1").collect().map { line =>
      val Array(z, x, y) = line.split("/")
      (x.toLong, y.toLong, z.toInt)
    }.toSet
  }

  // (x, y, z) like the reference's tile struct literals
  private val expectedZ14: Set[(Long, Long)] = Set(
    (8328, 8146), // create node
    (8237, 8146), // modify node (old)
    (8237, 8237), // modify node (new)
    (8373, 8146), (8374, 8146), // modify node to unmapped (old)
    (8282, 8146), (8283, 8146), // delete node
    (8283, 8100), // delete way
    (8237, 8100), // modify way
    (8328, 8100), // modify way from node (old)
    (8328, 8283), // modify way from node (new)
    (8374, 8100), // create way
    (8419, 8100), (8420, 8100), (8421, 8100), // create long way
    (8465, 8100), // delete way including its nodes
    (8237, 8055), // modify relation
    (8283, 8055), // delete relation
    (8328, 8055), // modify relation from way
    (8374, 8055), // modify relation from nodes (old)
    (8374, 8328), // modify relation from nodes (new)
    // create polygon (box)
    (8237, 8007), (8237, 8008), (8237, 8009),
    (8238, 8007), (8238, 8008), (8238, 8009),
    (8239, 8007), (8239, 8008), (8239, 8009))

  private val expectedZ12: Set[(Long, Long)] = Set(
    (2073, 2002), (2076, 1999), (2076, 2000), (2073, 2001), (2070, 2000),
    (2070, 2002), (2071, 2002), (2077, 1999), (2073, 1997), (2074, 1999),
    (2075, 2001), (2077, 1997), (2071, 1997), (2075, 1998), (2073, 2000),
    (2076, 1998), (2074, 1998), (2071, 2000), (2076, 1997), (2076, 2001),
    (2075, 2002), (2072, 1997), (2076, 2002), (2070, 1998), (2074, 2000),
    (2077, 2001), (2075, 1997), (2074, 1997), (2071, 2001), (2075, 1999),
    (2072, 1999), (2072, 2001), (2077, 2000), (2073, 1999), (2077, 2002),
    (2072, 2000), (2071, 1999), (2072, 1998), (2075, 2000), (2072, 2002),
    (2071, 1998), (2073, 1998), (2070, 1999), (2077, 1998), (2074, 2002),
    (2074, 2001), (2070, 1997), (2070, 2001))

  test("expire file contains exactly the reference's expected tile set") {
    val expected = expectedZ14.map { case (x, y) => (x, y, 14) } ++
      expectedZ12.map { case (x, y) => (x, y, 12) }
    val missing = expected.diff(tiles)
    val unexpected = tiles.diff(expected)
    assert(missing.isEmpty, s"missing tiles: $missing")
    assert(unexpected.isEmpty, s"unexpected tiles: $unexpected")
  }

  test("new position of now-unmapped node is NOT expired") {
    assert(!tiles.contains((8373L, 8237L, 14)))
  }
}
