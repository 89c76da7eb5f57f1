package graft.sinks

import java.sql.DriverManager

import graft.{ImportPipeline, SparkSpecBase}
import graft.mapping.{CompiledMapping, MappingConf}
import graft.sources.OsmPbf

/** Live-server integration of the PostGIS write path (reference:
  * test/helper_test.go:46-66 runs its suites against a real PostGIS).
  * Activates when `SPARK_GRAFT_PG_URL` names a reachable server (e.g.
  * `jdbc:postgresql://localhost/osm?user=osm&password=osm`) AND the
  * pgjdbc driver is on the test classpath; otherwise every test skips
  * cleanly (`assume`), so `sbt test` stays green in driverless sandboxes.
  *
  * The sandbox this repo builds in has neither a server nor the driver —
  * the same session stream is therefore also gated as a golden transcript
  * (PostgisImportSpec) every round. This suite exists so the one
  * reference capability that transcript cannot prove — acceptance by a
  * real server: DDL validity, COPY TEXT escaping, EWKB geometry parsing,
  * transactional rotation — becomes executable the day an environment
  * provides `SPARK_GRAFT_PG_URL`.
  */
class LivePostgisSpec extends SparkSpecBase {

  private val monaco = "/root/reference/vendor/github.com/omniscale/" +
    "go-osm/parser/pbf/monaco-20150428.osm.pbf"
  private val mappingFile = "/root/reference/test/complete_db_mapping.json"

  private def pgUrl: Option[String] = sys.env.get("SPARK_GRAFT_PG_URL")
  private def driverPresent: Boolean =
    scala.util.Try(Class.forName("org.postgresql.Driver")).isSuccess

  test("Monaco import: DDL, COPY, indexes, and rotation execute on a live server") {
    assume(pgUrl.isDefined, "SPARK_GRAFT_PG_URL not set — live-PostGIS suite skipped")
    assume(driverPresent, "pgjdbc driver not on classpath — live-PostGIS suite skipped")
    assume(new java.io.File(monaco).exists())
    val url = pgUrl.get

    val mapping = new CompiledMapping(MappingConf.fromFile(mappingFile))
    val tables = ImportPipeline(spark, mappingFile)
      .run(OsmPbf.read(spark, monaco))
      .filter { case (n, _) => Set("places", "roads", "landusages").contains(n) }
    val expected = tables.map { case (n, df) => n -> df.count() }

    // ONE session connection for the statement stream: the rotation block
    // is BEGIN…COMMIT and must see a single backend (tx.go:20-199)
    val conn = DriverManager.getConnection(url, new java.util.Properties())
    try {
      val st = conn.createStatement()
      def exec(sql: String): Unit = st.execute(sql)
      def queryLong(sql: String): Long = {
        val rs = st.executeQuery(sql)
        try { rs.next(); rs.getLong(1) } finally rs.close()
      }
      // idempotent re-run: clear anything a previous invocation left
      for (s <- Seq("import", "public_test_backup"))
        exec(s"""DROP SCHEMA IF EXISTS "$s" CASCADE""")
      for (n <- expected.keys)
        exec(s"""DROP TABLE IF EXISTS "public"."osm_$n"""")

      PostgisImport.run(exec,
        new CopySink(url, new java.util.Properties(), "import", "osm_",
          chunkRows = 500),
        mapping, tables, deploy = true,
        backupSchema = "public_test_backup")

      // every row COPYed survived the server's TEXT-format + EWKB parse
      for ((n, cnt) <- expected) {
        val got = queryLong(s"""SELECT count(*) FROM "public"."osm_$n"""")
        assert(got == cnt, s"$n: server holds $got of $cnt rows")
      }
      // rotation moved the import tables into production
      assert(queryLong(
        """SELECT count(*) FROM information_schema.tables
          |WHERE table_schema = 'import' AND table_name LIKE 'osm_%'"""
          .stripMargin) == 0, "rotation left tables in the import schema")
      // indexes exist where DDL placed them post-rotation
      for (n <- expected.keys)
        assert(queryLong(
          s"""SELECT count(*) FROM pg_indexes
             |WHERE schemaname = 'public' AND tablename = 'osm_$n'"""
            .stripMargin) >= 2, s"$n: expected GIST + id indexes")
      // geometries are server-valid PostGIS values, not just parseable
      val validRoads = queryLong(
        """SELECT count(*) FROM "public"."osm_roads"
          |WHERE ST_IsValid(geometry)""".stripMargin)
      assert(validRoads == expected("roads"),
        s"roads: only $validRoads of ${expected("roads")} geometries valid")
      st.close()
    } finally conn.close()
  }
}
