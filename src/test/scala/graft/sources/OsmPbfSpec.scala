package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Decodes the public Monaco extract shipped with the reference's vendored
  * parser (vendor/.../parser/pbf/monaco-20150428.osm.pbf) and checks
  * structural invariants: geographic bbox, referential integrity of way
  * refs and relation members, and tag plausibility.
  */
class OsmPbfSpec extends SparkSpecBase {

  private val fixture =
    "/root/reference/vendor/github.com/omniscale/go-osm/parser/pbf/monaco-20150428.osm.pbf"

  private lazy val bundle = OsmPbf.read(spark, fixture)

  test("blob index finds data blobs") {
    val idx = OsmPbf.blobIndex(spark, fixture)
    assert(idx.nonEmpty)
    assert(idx.forall(b => b.length > 0 && b.offset > 0))
  }

  test("blob-level bbox pruning skips out-of-coverage files, same output tables") {
    // 4 translated Monaco copies on the synth grid (0.6° cells): the first
    // lands near (1.4E, 37.7N), the others 0.6° east each
    val dir = java.nio.file.Files.createTempDirectory("graft-prune-pbf").toString
    OsmPbfSynth.synthesize(spark, fixture, dir, 4)
    val idx = OsmPbf.blobIndex(spark, dir)
    assert(idx.forall(_.bbox.nonEmpty), "synth headers must carry a bbox")
    // coverage polygon around copy 0's cell only
    val gj = java.nio.file.Files.createTempDirectory("graft-prune-gj")
      .resolve("cov.geojson")
    java.nio.file.Files.writeString(gj,
      """{"type":"FeatureCollection","features":[{"type":"Feature",
        |"properties":{},"geometry":{"type":"Polygon","coordinates":
        |[[[1.2,37.5],[1.7,37.5],[1.7,38.0],[1.2,38.0],[1.2,37.5]]]}}]}"""
        .stripMargin.replace("\n", ""))
    val lim = new graft.operators.Limitto(gj.toString, srid = 3857)
    val pruned = OsmPbf.prunedIndex(idx, Some(lim))
    assert(pruned.nonEmpty && pruned.size < idx.size,
      s"pruned ${pruned.size} of ${idx.size} blobs — coverage must drop files")
    assert(pruned.map(_.path).toSet.size == 1,
      "only copy 0's file intersects the coverage")
    // identical output tables: the import (with the same limitto) over the
    // pruned read equals the one over the full read — pruning only drops
    // what the pipeline's P6/J5 filters drop anyway
    val mapping = new graft.mapping.CompiledMapping(
      graft.mapping.MappingConf.fromFile("/root/reference/test/complete_db_mapping.json"))
    def roads(cov: Option[graft.operators.Limitto]) = {
      val p = new graft.ImportPipeline(spark, mapping, limit = Some(lim))
      val t = p.run(OsmPbf.read(spark, dir, coverage = cov))("roads")
        .select("osm_id", "name").collect().map(_.mkString("|")).sorted.toSeq
      p.unpersistAll()
      t
    }
    val full = roads(None)
    val prunedT = roads(Some(lim))
    assert(full.nonEmpty && prunedT == full,
      s"pruned import diverged: ${prunedT.size} vs ${full.size} rows")
  }

  test("decodes plausible element counts") {
    val nCoords = bundle.coords.count()
    val nNodes = bundle.nodes.count()
    val nWays = bundle.ways.count()
    val nRels = bundle.relations.count()
    assert(nCoords > 10000, s"coords $nCoords")
    assert(nNodes > 100 && nNodes < nCoords, s"nodes $nNodes")
    assert(nWays > 1000, s"ways $nWays")
    assert(nRels > 50, s"relations $nRels")
  }

  test("coordinates are inside the Monaco bbox") {
    val r = bundle.coords.agg(
      min("lon"), max("lon"), min("lat"), max("lat")).collect()(0)
    assert(r.getDouble(0) > 7.3 && r.getDouble(1) < 7.6, r.toString)
    assert(r.getDouble(2) > 43.5 && r.getDouble(3) < 43.9, r.toString)
  }

  test("way refs resolve against coords (referential integrity)") {
    val refs = bundle.ways.select(explode(col("refs")).as("id")).distinct()
    val missing = refs.join(bundle.coords, Seq("id"), "left_anti").count()
    // extracts clip ways at the boundary; the vast majority must resolve
    assert(missing.toDouble / refs.count() < 0.05, s"missing=$missing")
  }

  test("dense-node tags decode with plausible OSM keys") {
    val keys = bundle.nodes.select(explode(map_keys(col("tags"))).as("k"))
      .groupBy("k").count().orderBy(desc("count")).limit(30)
      .collect().map(_.getString(0)).toSet
    assert(Seq("highway", "name", "amenity").count(keys.contains) >= 2, keys.toString)
  }

  test("source-side tag pushdown drops unmapped tags at parse time") {
    import graft.mapping.{CompiledMapping, MappingConf}
    val mapping = new CompiledMapping(
      MappingConf.fromFile("/root/reference/test/complete_db_mapping.json"))
    val filtered = OsmPbf.read(spark, fixture, Some(TagFilters(mapping)))
    // unmapped bookkeeping keys must be gone from every kind
    val droppedKeys = Seq("created_by", "source", "note")
    for (frame <- Seq(filtered.nodes, filtered.ways, filtered.relations)) {
      val leaked = frame
        .select(explode(map_keys(col("tags"))).as("k"))
        .filter(col("k").isin(droppedKeys: _*)).count()
      assert(leaked == 0, s"unmapped keys survived the pushdown")
    }
    // mapped keys survive; nodes whose tags all dropped became coords
    val kept = filtered.ways.select(explode(map_keys(col("tags"))).as("k"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(kept.contains("highway"), kept.toString)
    assert(filtered.nodes.count() < bundle.nodes.count(),
      "pushdown should demote fully-filtered nodes to coords")
    assert(filtered.coords.count() == bundle.coords.count(),
      "coords (geometry carriers) must be untouched")
  }

  test("includeMetadata decodes version/timestamp/changeset/user") {
    import spark.implicits._
    val withMeta = OsmPbf.readElements(spark, fixture, includeMetadata = true)
    val metas = withMeta.filter(_.meta.isDefined).map(_.meta.get)
    val n = metas.count()
    assert(n > 10000, s"only $n elements carried metadata")
    // timestamps inside [2005, extract date]; versions >= 1; users resolve
    val (tsMin, tsMax) = metas.map(m => (m.timestamp, m.timestamp))
      .reduce((a, b) => (math.min(a._1, b._1), math.max(a._2, b._2)))
    assert(tsMin > java.time.Instant.parse("2004-01-01T00:00:00Z").toEpochMilli, tsMin.toString)
    assert(tsMax < java.time.Instant.parse("2015-04-29T00:00:00Z").toEpochMilli, tsMax.toString)
    assert(metas.filter(_.version >= 1).count() == n)
    assert(metas.filter(_.user.nonEmpty).count() > n / 2,
      "most elements should resolve a user name")
    assert(metas.filter(_.changeset > 0).count() == n)
    // the default path stays metadata-free (planet row-size)
    assert(OsmPbf.readElements(spark, fixture).filter(_.meta.isDefined).count() == 0)
  }

  test("xml source parses metadata attributes behind the same flag") {
    import spark.implicits._
    val withMeta = OsmXml
      .readElements(spark, "/root/reference/test/complete_db.osm", includeMetadata = true)
      .filter(_.meta.isDefined)
    assert(withMeta.count() > 0)
    val m = withMeta.head().meta.get
    assert(m.version >= 1)
    assert(m.timestamp > 0)
  }

  test("relations carry typed members with roles") {
    val m = bundle.relations
      .select(explode(col("members")).as("m"))
      .select(col("m.type").as("t"), col("m.role").as("role"))
    val types = m.select("t").distinct().collect().map(_.getByte(0)).toSet
    assert(types.subsetOf(Set[Byte](0, 1, 2)) && types.size >= 2, types.toString)
    val roles = m.groupBy("role").count().collect().map(_.getString(0)).toSet
    assert(roles.exists(Set("outer", "inner", "stop", "main_stream").contains), roles.toString)
  }
}
