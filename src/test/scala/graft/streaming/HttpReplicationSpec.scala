package graft.streaming

import java.net.InetSocketAddress
import java.nio.file.{Files, Path => JPath}
import java.util.zip.GZIPOutputStream

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpecBase
import graft.mapping.{CompiledMapping, MappingConf}
import graft.sources.OsmXml

/** HTTP transport for the replication fetch seam: status-code semantics
  * (200 download, 404 stop, 5xx retry-with-doubling-backoff, 4xx fail
  * fast), atomic target writes, and a full poll→apply→advance cycle over
  * http://localhost — the deployment shape of `imposm run`
  * (reference update/cmd.go:60, 273, 386-411).
  */
class HttpReplicationSpec extends SparkSpecBase {

  /** Serve `root` over HTTP on an ephemeral port; also counts requests and
    * can fail the first N requests with a 503.
    */
  private final class DirServer(root: JPath) {
    @volatile var requests = 0
    @volatile var failFirst = 0
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      requests += 1
      if (failFirst > 0) {
        failFirst -= 1
        ex.sendResponseHeaders(503, -1)
      } else {
        val f = root.resolve(ex.getRequestURI.getPath.stripPrefix("/"))
        if (Files.isRegularFile(f)) {
          val bytes = Files.readAllBytes(f)
          ex.sendResponseHeaders(200, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
        } else ex.sendResponseHeaders(404, -1)
      }
      ex.close()
    })
    server.start()
    val base: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  private def noSleepFetch(sleeps: scala.collection.mutable.Buffer[Long]) =
    Replication.httpFetch(retries = 3, minBackoffMs = 100, maxBackoffMs = 1000,
      sleep = sleeps += _) _

  test("200 streams the body to the target atomically") {
    val root = Files.createTempDirectory("http-root")
    Files.write(root.resolve("a.txt"), "payload".getBytes("UTF-8"))
    val srv = new DirServer(root)
    try {
      val out = Files.createTempDirectory("http-out").resolve("deep/dir/a.txt")
      val sleeps = scala.collection.mutable.Buffer[Long]()
      assert(noSleepFetch(sleeps)(s"${srv.base}/a.txt", out.toString))
      assert(new String(Files.readAllBytes(out), "UTF-8") == "payload")
      assert(!Files.exists(out.resolveSibling("a.txt.part")), "temp file must be renamed away")
      assert(sleeps.isEmpty)
    } finally srv.stop()
  }

  test("404 returns false without retrying — the poll loop's stop signal") {
    val srv = new DirServer(Files.createTempDirectory("http-empty"))
    try {
      val sleeps = scala.collection.mutable.Buffer[Long]()
      val out = Files.createTempDirectory("http-out2").resolve("x")
      assert(!noSleepFetch(sleeps)(s"${srv.base}/missing", out.toString))
      assert(srv.requests == 1 && sleeps.isEmpty)
    } finally srv.stop()
  }

  test("5xx retries with doubling backoff, then succeeds") {
    val root = Files.createTempDirectory("http-root3")
    Files.write(root.resolve("b.txt"), "ok".getBytes("UTF-8"))
    val srv = new DirServer(root)
    try {
      srv.failFirst = 2
      val sleeps = scala.collection.mutable.Buffer[Long]()
      val out = Files.createTempDirectory("http-out3").resolve("b.txt")
      assert(noSleepFetch(sleeps)(s"${srv.base}/b.txt", out.toString))
      assert(srv.requests == 3)
      assert(sleeps.toSeq == Seq(100L, 200L), "ladder must double from min")
    } finally srv.stop()
  }

  test("5xx beyond the retry budget fails loudly") {
    val srv = new DirServer(Files.createTempDirectory("http-root4"))
    try {
      srv.failFirst = 100
      val sleeps = scala.collection.mutable.Buffer[Long]()
      val out = Files.createTempDirectory("http-out4").resolve("x")
      val e = intercept[java.io.IOException] {
        noSleepFetch(sleeps)(s"${srv.base}/x", out.toString)
      }
      assert(e.getMessage.contains("HTTP 503"))
      assert(sleeps.toSeq == Seq(100L, 200L, 400L), "3 waits for 3 retries")
    } finally srv.stop()
  }

  test("backoff ladder caps at max") {
    val sleeps = scala.collection.mutable.Buffer[Long]()
    val b = new Replication.ExpBackoff(100, 400, sleeps += _)
    (1 to 5).foreach(_ => b.waitOnce())
    assert(sleeps.toSeq == Seq(100L, 200L, 400L, 400L, 400L))
    b.reset(); b.waitOnce()
    assert(sleeps.last == 100L)
  }

  // -- full cycle over http://localhost ------------------------------------

  private lazy val mapping: CompiledMapping = {
    val yml = Files.createTempDirectory("graft-http-map").resolve("m.yml")
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

  private def publish(endpoint: JPath, seq: Long, name: String): Unit = {
    val rel = Replication.sequencePath(seq)
    gzWrite(endpoint.resolve(s"$rel.osc.gz"),
      s"""<?xml version='1.0' encoding='UTF-8'?>
         |<osmChange version="0.6" generator="test">
         | <modify>
         |  <node id="1" version="2" timestamp="2012-01-01T00:00:00Z" lat="47.0" lon="9.0">
         |   <tag k="amenity" v="cafe"/><tag k="name" v="$name"/>
         |  </node>
         | </modify>
         |</osmChange>
         |""".stripMargin)
    Files.write(endpoint.resolve(s"$rel.state.txt"),
      s"sequenceNumber=$seq\ntimestamp=2012-01-01T00\\:00\\:0${seq}Z\n"
        .getBytes("UTF-8"))
  }

  test("replicate() polls, applies, and advances over an HTTP endpoint") {
    val endpoint = Files.createTempDirectory("graft-http-endpoint")
    val work = Files.createTempDirectory("graft-http-work").toString
    val osm = Files.createTempDirectory("graft-http-osm").resolve("base.osm")
    Files.write(osm,
      """<?xml version='1.0' encoding='UTF-8'?>
        |<osm version="0.6">
        | <node id="1" version="1" timestamp="2011-11-11T00:11:11Z" lat="47.0" lon="9.0">
        |  <tag k="amenity" v="cafe"/><tag k="name" v="A"/>
        | </node>
        |</osm>
        |""".stripMargin.getBytes("UTF-8"))
    val stateDir = Files.createTempDirectory("graft-http-state").toString
    DiffPipeline.init(spark, mapping, stateDir, OsmXml.read(spark, osm.toString))

    publish(endpoint, 1, "B")
    publish(endpoint, 2, "C")
    val srv = new DirServer(endpoint)
    try {
      val fetch = Replication.httpFetch(retries = 2, minBackoffMs = 10,
        maxBackoffMs = 20, sleep = _ => ()) _
      val applied = Replication.replicate(spark, mapping, stateDir,
        srv.base, work, from = 1, fetch = Some(fetch))
      assert(applied == 2)
      assert(DiffPipeline.readTables(spark, mapping, stateDir)("poi")
        .filter("osm_id = 1").collect().head.getAs[String]("name") == "C")
      assert(Replication.readLocalState(spark, stateDir)
        .map(_.sequence).contains(2L))
      assert(Replication.readLocalState(spark, stateDir)
        .map(_.timestamp.toString).contains("2012-01-01T00:00:02Z"),
        "pointer timestamp must come from the endpoint's state.txt")
    } finally srv.stop()
  }
}
