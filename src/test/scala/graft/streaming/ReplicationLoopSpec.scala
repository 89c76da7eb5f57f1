package graft.streaming

import java.nio.file.{Files, Path => JPath, Paths}
import java.util.zip.GZIPOutputStream

import graft.SparkSpecBase
import graft.mapping.{CompiledMapping, MappingConf}
import graft.sources.OsmXml

/** End-to-end replication (S3): a file:// endpoint publishing gzipped .osc
  * diffs in the 3/3/3 sequence layout is polled, downloaded, applied in
  * order through the streaming path, and the local pointer advances —
  * mirroring update/cmd.go:231-257. Re-running after a partial cycle must
  * be idempotent (checkpoint + StateStore commits).
  */
class ReplicationLoopSpec extends SparkSpecBase {

  private lazy val mapping: CompiledMapping = {
    val yml = Files.createTempDirectory("graft-repl-map").resolve("m.yml")
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
    new CompiledMapping(MappingConf.fromFile(yml.toString))
  }

  private def gzWrite(p: JPath, body: String): Unit = {
    Files.createDirectories(p.getParent)
    val out = new GZIPOutputStream(Files.newOutputStream(p))
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  private def oscBody(name: String): String =
    s"""<?xml version='1.0' encoding='UTF-8'?>
       |<osmChange version="0.6" generator="test">
       | <modify>
       |  <node id="1" version="2" timestamp="2012-01-01T00:00:00Z" lat="47.0" lon="9.0">
       |   <tag k="amenity" v="cafe"/><tag k="name" v="$name"/>
       |  </node>
       | </modify>
       |</osmChange>
       |""".stripMargin

  private def publish(endpoint: JPath, seq: Long, name: String): Unit = {
    val rel = Replication.sequencePath(seq)
    gzWrite(endpoint.resolve(s"$rel.osc.gz"), oscBody(name))
    Files.createDirectories(endpoint.resolve(rel).getParent)
    Files.write(endpoint.resolve(s"$rel.state.txt"),
      s"sequenceNumber=$seq\ntimestamp=2012-01-01T00\\:00\\:0$seq"
        .concat("Z\n").getBytes("UTF-8"))
  }

  private def initState(): String = {
    val osm = Files.createTempDirectory("graft-repl-osm").resolve("base.osm")
    Files.write(osm,
      """<?xml version='1.0' encoding='UTF-8'?>
        |<osm version="0.6">
        | <node id="1" version="1" timestamp="2011-11-11T00:11:11Z" lat="47.0" lon="9.0">
        |  <tag k="amenity" v="cafe"/><tag k="name" v="A"/>
        | </node>
        |</osm>
        |""".stripMargin.getBytes("UTF-8"))
    val dir = Files.createTempDirectory("graft-repl-state").toString
    DiffPipeline.init(spark, mapping, dir, OsmXml.read(spark, osm.toString))
    dir
  }

  test("poll, apply in order, advance pointer; later cycles resume") {
    val endpoint = Files.createTempDirectory("graft-endpoint")
    val work = Files.createTempDirectory("graft-repl-work").toString
    val stateDir = initState()

    // two diffs published: B then C — one cycle applies both in order
    publish(endpoint, 1, "B")
    publish(endpoint, 2, "C")
    val applied = Replication.replicate(spark, mapping, stateDir,
      s"file://$endpoint", work, from = 1)
    assert(applied == 2)
    val store = new StateStore(spark, stateDir)
    assert(store.currentSeq == 2, "two diff transactions must have committed")
    val name = DiffPipeline.readTables(spark, mapping, stateDir)("poi")
      .filter("osm_id = 1").collect().head.getAs[String]("name")
    assert(name == "C", "the later diff must win")
    val local = Replication.readLocalState(spark, stateDir)
    assert(local.map(_.sequence).contains(2L))

    // nothing new published: cycle is a no-op, pointer stays
    assert(Replication.replicate(spark, mapping, stateDir,
      s"file://$endpoint", work, from = 1) == 2)
    assert(new StateStore(spark, stateDir).currentSeq == 2)

    // a third diff appears: next cycle resumes from the pointer
    publish(endpoint, 3, "D")
    assert(Replication.replicate(spark, mapping, stateDir,
      s"file://$endpoint", work, from = 1) == 3)
    assert(DiffPipeline.readTables(spark, mapping, stateDir)("poi")
      .filter("osm_id = 1").collect().head.getAs[String]("name") == "D")
    assert(Replication.readLocalState(spark, stateDir).map(_.sequence).contains(3L))
  }

  test("replaying an interrupted cycle is idempotent") {
    val endpoint = Files.createTempDirectory("graft-endpoint2")
    val work = Files.createTempDirectory("graft-repl-work2").toString
    val stateDir = initState()
    publish(endpoint, 1, "B")

    // crash simulation: the diff was downloaded and applied but the local
    // pointer write never happened
    val downloads = s"$work/downloads"
    Replication.fetchAvailable(s"file://$endpoint", 1, downloads,
      Replication.hadoopFetch(spark))
    DiffPipeline.runStream(spark, mapping, stateDir, downloads,
      s"$work/checkpoint").awaitTermination()
    assert(new StateStore(spark, stateDir).currentSeq == 1)

    // the retry cycle re-fetches seq 1 (pointer still unset), but the
    // streaming checkpoint skips the already-applied file: no double apply
    val applied = Replication.replicate(spark, mapping, stateDir,
      s"file://$endpoint", work, from = 1)
    assert(applied == 1)
    val store = new StateStore(spark, stateDir)
    assert(store.currentSeq == 1, "replay must not re-commit the same diff")
    assert(DiffPipeline.readTables(spark, mapping, stateDir)("poi")
      .filter("osm_id = 1").count() == 1)
  }
}
