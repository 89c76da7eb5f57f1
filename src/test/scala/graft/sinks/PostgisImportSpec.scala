package graft.sinks

import scala.collection.mutable.ArrayBuffer

import graft.{ImportPipeline, SparkSpecBase}
import graft.mapping.{CompiledMapping, MappingConf}
import graft.sources.OsmPbf

/** Recorded-statement integration run of the PostGIS write path: a real
  * Monaco import rendered through [[PostgisImport]] with a fake
  * CopyManager/statement executor recording the exact stream a live
  * server would receive — DDL, chunked COPY payloads, deferred indexes,
  * deploy rotation — closing the reference's database/postgis/tx.go +
  * postgis.go path without a database in the sandbox.
  */
class PostgisImportSpec extends SparkSpecBase {

  private val monaco = "/root/reference/vendor/github.com/omniscale/" +
    "go-osm/parser/pbf/monaco-20150428.osm.pbf"
  private val mappingFile = "/root/reference/test/complete_db_mapping.json"

  test("Monaco import produces the reference statement stream") {
    assume(new java.io.File(monaco).exists())
    val mapping = new CompiledMapping(MappingConf.fromFile(mappingFile))
    val tables = ImportPipeline(spark, mappingFile)
      .run(OsmPbf.read(spark, monaco))
      // keep the spec fast and the transcript readable: three table kinds
      // (point / line+polygon table / generalized source)
      .filter { case (n, _) => Set("places", "roads", "landusages").contains(n) }

    val stmts = ArrayBuffer.empty[String]
    RecordingCopy.clear()
    PostgisImport.run(stmts += _,
      new CopySink(RecordingCopy.factory, "import", chunkRows = 500),
      mapping, tables, deploy = true,
      productionTables = Set("roads"), backupTables = Set("roads"))

    // ---- phase order: schema, DDL per table, indexes, rotation ----
    assert(stmts.head == """CREATE SCHEMA IF NOT EXISTS "import"""")
    val ddl = stmts.takeWhile(!_.startsWith("CREATE INDEX")).drop(1)
    val idx = stmts.filter(_.startsWith("CREATE INDEX"))
    val rotFrom = stmts.indexOf("""CREATE SCHEMA IF NOT EXISTS "public"""")
    assert(rotFrom > 0, s"no rotation block in:\n${stmts.mkString("\n")}")
    val rot = stmts.drop(rotFrom)
    assert(ddl.nonEmpty && idx.nonEmpty)
    assert(stmts.indexOf(idx.head) > stmts.indexOf(ddl.last),
      "indexes must come after all DDL")

    // ---- DDL: per table DROP -> CREATE -> AddGeometryColumn, sorted ----
    val expectDdl = Seq("landusages", "places", "roads").flatMap { n =>
      val t = mapping.conf.tables(n)
      Seq(s"""DROP TABLE IF EXISTS "import"."osm_$n"""",
        PostgisDdl.createTableSql("import", "osm_", t)) ++
        PostgisDdl.addGeometryColumnSql("import", "osm_", t, 3857)
    }
    assert(ddl.toSeq == expectDdl)

    // ---- COPY stream: every row of every table, chunked at 500 ----
    val copies = RecordingCopy.chunks
    val byTable = copies.groupBy(_._1)
    for ((name, df) <- tables) {
      val sql = copies.map(_._1).find(_.contains(s"osm_$name"))
        .getOrElse(fail(s"no COPY for $name"))
      assert(sql.startsWith(s"""COPY "import"."osm_$name" ("""))
      assert(sql.endsWith(") FROM STDIN"))
      val rows = byTable(sql).map(_._2).sum
      assert(rows == df.count(), s"$name: copied $rows of ${df.count()}")
      // TEXT format: each line carries exactly ncols-1 tabs
      val nTabs = df.columns.length - 1
      byTable(sql).flatMap(_._3).foreach { line =>
        assert(line.count(_ == '\t') == nTabs, s"$name line: $line")
      }
    }
    // Monaco roads: >100 real rows (same floor as the Main end-to-end)
    val roadsSql = copies.map(_._1).find(_.contains("osm_roads")).get
    assert(byTable(roadsSql).map(_._2).sum > 100)

    // ---- indexes: GIST on geometry + BTREE id per table ----
    assert(idx.count(_.contains("USING GIST")) == 3)
    assert(idx.count(_.contains("_osm_id_idx")) == 3)

    // ---- rotation: golden transcript (roads pre-exists in prod+backup) ----
    assert(rot.toSeq == Seq(
      """CREATE SCHEMA IF NOT EXISTS "public"""",
      """CREATE SCHEMA IF NOT EXISTS "backup"""",
      "BEGIN",
      """ALTER TABLE "import"."osm_landusages" SET SCHEMA "public"""",
      """ALTER TABLE "import"."osm_places" SET SCHEMA "public"""",
      """DROP TABLE IF EXISTS "backup"."osm_roads"""",
      """ALTER TABLE "public"."osm_roads" SET SCHEMA "backup"""",
      """ALTER TABLE "import"."osm_roads" SET SCHEMA "public"""",
      "COMMIT"))
  }
}

/** JVM-wide recording CopyTarget (local mode: executors share the JVM).
  * Chunks are (copySql, rowCount, sampleLines).
  */
object RecordingCopy {
  private val buf = ArrayBuffer.empty[(String, Int, Seq[String])]

  def clear(): Unit = buf.synchronized(buf.clear())
  def chunks: Seq[(String, Int, Seq[String])] = buf.synchronized(buf.toSeq)

  val factory: CopyTargetFactory = new CopyTargetFactory {
    override def open(): CopyTarget = new CopyTarget {
      override def copyIn(sql: String, data: String): Unit = {
        val lines = data.split("\n", -1).filter(_.nonEmpty)
        buf.synchronized(buf += ((sql, lines.length, lines.take(5).toSeq)))
      }
      override def close(): Unit = ()
    }
  }
}
