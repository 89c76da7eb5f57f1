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
}
