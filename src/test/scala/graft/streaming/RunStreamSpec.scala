package graft.streaming

import graft.SparkSpecBase
import graft.mapping.{CompiledMapping, MappingConf}
import graft.sources.OsmXml

/** Structured Streaming diff mode (ST1): .osc files landing in a watched
  * dir are applied as one transaction each, discovered exactly-once via the
  * stream checkpoint.
  */
class RunStreamSpec extends SparkSpecBase {

  test("runStream applies a dropped change file and advances the state") {
    val mapping = new CompiledMapping(
      MappingConf.fromFile("/root/reference/test/complete_db_mapping.json"))
    val stateDir = java.nio.file.Files.createTempDirectory("graft-rs-state").toString
    val replDir = java.nio.file.Files.createTempDirectory("graft-rs-repl").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rs-ckpt").toString

    DiffPipeline.init(spark, mapping, stateDir,
      OsmXml.read(spark, "/root/reference/test/complete_db.osm"))
    val store = new StateStore(spark, stateDir)
    assert(store.currentSeq == 0)

    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/reference/test/complete_db.osc"),
      java.nio.file.Paths.get(s"$replDir/000000001.osc"))

    // generous: late in a full-suite run the shared JVM carries 27 suites
    // of cached state and this batch plans noticeably slower than alone
    val q = DiffPipeline.runStream(spark, mapping, stateDir, replDir, ckpt)
    assert(q.awaitTermination(480000), "stream did not finish in 480s")
    assert(store.currentSeq == 1, s"seq=${store.currentSeq}")

    val places = DiffPipeline.readTables(spark, mapping, stateDir)("places")
    val bar = places.filter("osm_id = 10001").collect()
    assert(bar.length == 1 && bar.head.getAs[String]("name") == "Bar")

    // restart with the same checkpoint: file already processed, no re-apply
    val q2 = DiffPipeline.runStream(spark, mapping, stateDir, replDir, ckpt)
    assert(q2.awaitTermination(240000), "restart did not finish in 240s")
    assert(store.currentSeq == 1)
  }

  test("a 10-batch stream compacts segments and vacuums unreferenced versions") {
    val mapping = new CompiledMapping(
      MappingConf.fromFile("/root/reference/test/complete_db_mapping.json"))
    val stateDir = java.nio.file.Files.createTempDirectory("graft-rsc-state").toString
    val replDir = java.nio.file.Files.createTempDirectory("graft-rsc-repl").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rsc-ckpt").toString
    DiffPipeline.init(spark, mapping, stateDir,
      OsmXml.read(spark, "/root/reference/test/complete_db.osm"))
    for (i <- 1 to 10)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(f"$replDir/$i%09d.osc"),
        s"""<?xml version='1.0' encoding='UTF-8'?>
           |<osmChange version="0.6" generator="test">
           | <modify>
           |  <node id="10001" version="${i + 2}" lat="40.0" lon="10.0">
           |   <tag k="place" v="village"/><tag k="name" v="N$i"/>
           |  </node>
           | </modify>
           |</osmChange>
           |""".stripMargin)
    val q = DiffPipeline.runStream(spark, mapping, stateDir, replDir, ckpt)
    assert(q.awaitTermination(480000), "stream did not finish in 480s")
    val store = new StateStore(spark, stateDir)
    assert(store.currentSeq == 10, s"seq=${store.currentSeq}")
    val places = DiffPipeline.readTables(spark, mapping, stateDir)("places")
    assert(places.filter("osm_id = 10001").head()
      .getAs[String]("name") == "N10", "last batch must win")
    // segments must have compacted into a fresh base along the way: the
    // committed manifest cannot carry all 10 batches as segments
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(stateDir, "coords", "v10", "_manifest")), "UTF-8")
    val nSegs = manifest.linesIterator.count(_.startsWith("SEG\t"))
    assert(nSegs <= 8, s"$nSegs segments in v10 — compaction never ran")
    assert(!manifest.contains("v0/__b="),
      "v10 base must come from a compaction, not v0")
    // vacuum dropped version dirs nothing references anymore
    assert(!java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(stateDir, "coords", "v1")),
      "v1 segment dirs are unreferenced after compaction — vacuum missed them")
    assert(store.read("coords", 10).filter("id = 10001").count() == 1)
  }
}
