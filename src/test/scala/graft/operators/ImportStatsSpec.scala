package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.sources.OsmXml

/** A5 import statistics (reference stats/stats.go): observe-based per-kind
  * counters report totals and a rates line without extra jobs.
  */
class ImportStatsSpec extends SparkSpecBase {

  test("instrumented bundle reports per-kind totals via the listener") {
    val bundle = OsmXml.bundleOf(
      graft.sources.OsmPbf.readElements(spark,
        "/root/reference/vendor/github.com/omniscale/go-osm/parser/pbf/monaco-20150428.osm.pbf").toDF())
    val stats = ImportStats.attach(spark)
    try {
      val obs = ImportStats.instrument(bundle)
      val nCoords = obs.coords.count()
      val nWays = obs.ways.count()
      obs.nodes.count()
      obs.relations.count()
      // listener callbacks are async — poll until they land
      eventually {
        val c = stats.current
        assert(c.get("coords").contains(nCoords), c.toString)
        assert(c.get("ways").contains(nWays), c.toString)
        assert(c.getOrElse("nodes", 0L) > 0, c.toString)
        assert(c.getOrElse("relations", 0L) > 0, c.toString)
      }
      val line = stats.report()
      assert(line.contains("C:") && line.contains("W:") && line.contains("k/s"), line)
    } finally ImportStats.detach(spark, stats)
  }

  test("re-running an action does not double-count (totals, not increments)") {
    val stats = ImportStats.attach(spark)
    try {
      val df = spark.range(1000).toDF("id")
        .observe("graft.stats.coords", count(lit(1)))
      df.count(); df.count(); df.count()
      eventually {
        assert(stats.current.get("coords").contains(1000L), stats.current.toString)
      }
    } finally ImportStats.detach(spark, stats)
  }

  private def eventually[T](f: => T): T = {
    var last: Throwable = null
    var i = 0
    while (i < 50) {
      try return f
      catch { case e: org.scalatest.exceptions.TestFailedException =>
        last = e; Thread.sleep(100) }
      i += 1
    }
    throw last
  }
}
