package graft

import java.nio.file.{Files, Path => JPath}
import java.util.zip.GZIPOutputStream

import graft.streaming.{DiffPipeline, Replication}

/** CLI dispatch end-to-end (cmd/imposm/main.go analog): import → deploy →
  * diff → query-cache over the cafe fixture, `run -once` over a file
  * endpoint, and a real PBF import of the Monaco fixture through the
  * `import` command.
  */
class MainSpec extends SparkSpecBase {

  private def writeMapping(): String = {
    val yml = Files.createTempDirectory("graft-main-map").resolve("m.yml")
    Files.write(yml,
      """tables:
        |  poi:
        |    type: point
        |    columns:
        |    - name: osm_id
        |      type: id
        |    - name: geometry
        |      type: geometry
        |    - name: name
        |      key: name
        |      type: string
        |    mapping:
        |      amenity: [cafe]
        |""".stripMargin.getBytes("UTF-8"))
    yml.toString
  }

  private def writeBaseOsm(): String = {
    val osm = Files.createTempDirectory("graft-main-osm").resolve("base.osm")
    Files.write(osm,
      """<?xml version='1.0' encoding='UTF-8'?>
        |<osm version="0.6">
        | <node id="1" version="1" timestamp="2011-11-11T00:11:11Z" lat="47.0" lon="9.0">
        |  <tag k="amenity" v="cafe"/><tag k="name" v="A"/>
        | </node>
        |</osm>
        |""".stripMargin.getBytes("UTF-8"))
    osm.toString
  }

  private def gzWrite(p: JPath, body: String): Unit = {
    Files.createDirectories(p.getParent)
    val out = new GZIPOutputStream(Files.newOutputStream(p))
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  private def oscFile(dir: JPath, name: String): String = {
    val f = dir.resolve("change.osc.gz")
    gzWrite(f,
      s"""<?xml version='1.0' encoding='UTF-8'?>
         |<osmChange version="0.6" generator="test">
         | <modify>
         |  <node id="1" version="2" timestamp="2012-01-01T00:00:00Z" lat="47.0" lon="9.0">
         |   <tag k="amenity" v="cafe"/><tag k="name" v="$name"/>
         |  </node>
         | </modify>
         |</osmChange>
         |""".stripMargin)
    f.toString
  }

  test("import -write -connection exports tables; -deployproduction rotates") {
    val mappingFile = writeMapping()
    val state = Files.createTempDirectory("graft-main-state").toString
    val conn = Files.createTempDirectory("graft-main-conn").toString

    Main.main(Array("import", "-mapping", mappingFile, "-read", writeBaseOsm(),
      "-write", "-cachedir", state, "-connection", conn, "-optimize", "-srid", "3857"))
    val imported = spark.read.parquet(s"$conn/import/poi")
    assert(imported.count() == 1)
    assert(imported.head().getAs[String]("name") == "A")

    Main.main(Array("import", "-connection", conn, "-deployproduction"))
    assert(spark.read.parquet(s"$conn/production/poi").count() == 1)
    assert(!new java.io.File(s"$conn/import/poi").exists())

    // diff applies a change file against the same cachedir
    val osc = oscFile(Files.createTempDirectory("graft-main-osc"), "B")
    Main.main(Array("diff", "-mapping", mappingFile, "-cachedir", state, osc))
    val mapping = new graft.mapping.CompiledMapping(
      graft.mapping.MappingConf.fromFile(mappingFile))
    assert(DiffPipeline.readTables(spark, mapping, state)("poi")
      .filter("osm_id = 1").head().getAs[String]("name") == "B")

    // query-cache prints the node as JSON
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Main.main(Array("query-cache", "-cachedir", state, "-node", "1"))
    }
    val json = out.toString("UTF-8")
    assert(json.contains("\"id\":1"), json)
  }

  test("run -once replicates from a file endpoint") {
    val mappingFile = writeMapping()
    val state = Files.createTempDirectory("graft-run-state").toString
    val endpoint = Files.createTempDirectory("graft-run-endpoint")
    val mapping = new graft.mapping.CompiledMapping(
      graft.mapping.MappingConf.fromFile(mappingFile))
    DiffPipeline.init(spark, mapping, state,
      graft.sources.OsmXml.read(spark, writeBaseOsm()))

    val rel = Replication.sequencePath(1)
    gzWrite(endpoint.resolve(s"$rel.osc.gz"),
      """<?xml version='1.0' encoding='UTF-8'?>
        |<osmChange version="0.6" generator="test">
        | <modify>
        |  <node id="1" version="2" timestamp="2012-01-01T00:00:00Z" lat="47.0" lon="9.0">
        |   <tag k="amenity" v="cafe"/><tag k="name" v="R"/>
        |  </node>
        | </modify>
        |</osmChange>
        |""".stripMargin)

    Main.main(Array("run", "-mapping", mappingFile, "-cachedir", state,
      "-replication-url", s"file://$endpoint", "-once",
      "-workdir", Files.createTempDirectory("graft-run-work").toString))
    assert(DiffPipeline.readTables(spark, mapping, state)("poi")
      .filter("osm_id = 1").head().getAs[String]("name") == "R")
  }

  test("import command handles the Monaco PBF with the reference mapping") {
    val monaco = "/root/reference/vendor/github.com/omniscale/go-osm/parser/pbf/monaco-20150428.osm.pbf"
    assume(new java.io.File(monaco).exists())
    val state = Files.createTempDirectory("graft-monaco-state").toString
    val conn = Files.createTempDirectory("graft-monaco-conn").toString
    Main.main(Array("import",
      "-mapping", "/root/reference/test/complete_db_mapping.json",
      "-read", monaco, "-write", "-cachedir", state, "-connection", conn))
    val roads = spark.read.parquet(s"$conn/import/roads")
    assert(roads.count() > 100, "Monaco must produce a real road table")
  }
}
