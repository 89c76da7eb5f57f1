package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.SparkSpecBase
import graft.geometry.Geom
import graft.mapping.{CompiledMapping, MappingConf}
import graft.sources.OsmXml

/** Diff-apply against the reference's complete_db fixture: import
  * complete_db.osm, apply complete_db.osc, assert the post-update goldens
  * of test/completedb_test.go (Update section, :430-740).
  */
class DiffPipelineSpec extends SparkSpecBase {

  private lazy val mapping =
    new CompiledMapping(MappingConf.fromFile("/root/reference/test/complete_db_mapping.json"))

  private lazy val stateDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft-diff-state").toString
    DiffPipeline.init(spark, mapping, dir,
      OsmXml.read(spark, "/root/reference/test/complete_db.osm"))
    DiffPipeline.applyDiff(spark, mapping, dir,
      OsmXml.readDiff(spark, "/root/reference/test/complete_db.osc").toDF())
    dir
  }

  private lazy val tables: Map[String, DataFrame] = {
    val t = DiffPipeline.readTables(spark, mapping, stateDir)
    t.map { case (k, v) => k -> v.cache() }
  }

  private def rows(table: String, id: Long) =
    tables(table).filter(s"osm_id = $id").collect()

  private def typeOf(table: String, id: Long): Option[String] =
    rows(table, id).headOption.map(_.getAs[String]("type"))

  private def geomArea(table: String, id: Long): Double =
    Geom.fromWkb(rows(table, id).head.getAs[Array[Byte]]("geometry")).getArea

  test("UpdatedNodes: added/modified nodes; deleted coord gone from state") {
    assert(typeOf("places", 10001).contains("village"))
    assert(rows("places", 10001).head.getAs[String]("name") == "Bar")
    assert(typeOf("places", 10002).contains("city"))
    assert(rows("places", 10002).head.getAs[String]("name") == "Baz")
    val store = new StateStore(spark, stateDir)
    val coords = store.read("coords", store.currentSeq)
    assert(coords.filter("id = 10000").count() == 0)
  }

  test("NoDuplicates after update (except intentional 18001)") {
    for (table <- Seq("roads", "landusages")) {
      val dups = tables(table).groupBy("osm_id").count()
        .filter("count > 1").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val unexpected = dups - 18001L
      assert(unexpected.isEmpty, s"$table duplicates: $unexpected")
    }
    assert(tables("roads").filter("osm_id = 18001").count() == 2)
  }

  test("UpdatedLandusage: modified multipolygon no longer covers the point") {
    val (x, y) = Geom.wgsToMerc(13.4, 47.5)
    val poly = Geom.fromWkb(rows("landusages", -1001).head.getAs[Array[Byte]]("geometry"))
    assert(!poly.intersects(Geom.point(x, y)))
  }

  test("PartialDelete: relation deleted, member ways/nodes stay cached") {
    assert(rows("landusages", -2001).isEmpty)
    assert(rows("landusages", 2001).isEmpty)
    val store = new StateStore(spark, stateDir)
    val seq = store.currentSeq
    assert(store.read("coords", seq).filter("id = 2001").count() == 1)
    assert(store.read("ways", seq).filter("id in (2001, 2002)").count() == 2)
  }

  test("LandusageToWaterarea2: parks became water, incl. generalized tables") {
    assert(typeOf("waterareas", 11001).contains("water"))
    assert(typeOf("waterareas", -13001).contains("water"))
    assert(typeOf("waterareas_gen0", 11001).contains("water"))
    assert(typeOf("waterareas_gen0", -13001).contains("water"))
    assert(typeOf("waterareas_gen1", 11001).contains("water"))
    assert(typeOf("waterareas_gen1", -13001).contains("water"))
    assert(rows("landusages", 11001).isEmpty)
    assert(rows("landusages", -13001).isEmpty)
    assert(rows("landusages_gen0", 11001).isEmpty)
    assert(rows("landusages_gen0", -13001).isEmpty)
    assert(rows("landusages_gen1", 11001).isEmpty)
    assert(rows("landusages_gen1", -13001).isEmpty)
  }

  test("ChangedHoleTags2: newly tagged hole inserted with correct areas") {
    assert(typeOf("waterareas", 14011).contains("water"))
    assert(rows("waterareas", -14011).isEmpty)
    assert(typeOf("landusages", -14001).contains("park"))
    assert(math.abs(geomArea("waterareas", 14011) - 26672019779.0) < 1.0)
    assert(math.abs(geomArea("landusages", -14001) - 10373697182.0) < 1.0)
  }

  test("SplitOuterMultipolygonWay2: split outer way inserted as road") {
    assert(rows("landusages", 15001).isEmpty)
    assert(typeOf("roads", 15002).contains("residential"))
    assert(typeOf("landusages", -15001).contains("park"))
    assert(math.abs(geomArea("landusages", -15001) - 9816216452.0) < 1.0)
  }

  test("MergeOuterMultipolygonWay2: merged outer way") {
    assert(rows("landusages", 16001).isEmpty)
    assert(rows("roads", 16002).isEmpty)
    assert(typeOf("landusages", -16001).contains("park"))
    assert(math.abs(geomArea("landusages", -16001) - 12779350582.0) < 1.0)
  }

  test("WayWithInvalidLayerUpdate: layer now valid -> z_order 23") {
    val r = rows("roads", 17003)
    assert(typeOf("roads", 17003).contains("residential"))
    assert(r.head.getAs[Number]("z_order").intValue == 23)
  }

  test("NodeWayRefAfterDelete2: way deleted, node stays as barrierpoint") {
    assert(rows("roads", 20001).isEmpty)
    assert(typeOf("barrierpoints", 20001).contains("block"))
    val store = new StateStore(spark, stateDir)
    val seq = store.currentSeq
    assert(store.read("coords", seq).filter("id = 20002").count() == 0)
    assert(store.read("ways", seq).filter("id = 20002").count() == 0)
  }

  test("WayRelRefAfterDelete2: relation deleted, way stays as road") {
    assert(typeOf("roads", 21001).contains("residential"))
    assert(rows("landusages", 21001).isEmpty)
    assert(rows("landusages", -21001).isEmpty)
  }

  test("ResidentialToSecondary2: retyped road propagates to gen tables") {
    assert(typeOf("roads", 40001).contains("secondary"))
    assert(typeOf("roads_gen0", 40001).contains("secondary"))
    assert(typeOf("roads_gen1", 40001).contains("secondary"))
  }

  test("RelationAfterRemove: relation deleted, way stays as building") {
    assert(typeOf("buildings", 50011).contains("yes"))
    assert(rows("landusages", 50021).isEmpty)
    assert(rows("landusages", -50021).isEmpty)
  }

  test("RelationWithoutTags2: untagged relation removed, way building stays") {
    assert(typeOf("buildings", 50111).contains("yes"))
    assert(rows("buildings", 50121).isEmpty)
    assert(rows("buildings", -50121).isEmpty)
  }

  test("DuplicateIDs2: only the same-id relation/way pair member was deleted") {
    assert(typeOf("buildings", 51001).contains("way"))
    assert(rows("buildings", -51001).isEmpty)
    assert(rows("buildings", 51011).isEmpty)
    assert(typeOf("buildings", -51011).contains("mp"))
  }

  test("RelationUpdatedByNode2: moved node rebuilds relation geometry") {
    // the fixture ring is a self-intersecting bowtie; GEOS MakeValid and JTS
    // GeometryFixer node the crossing point with sub-mm differences that the
    // 127 km edges amplify to ~400 m^2 (3e-8 relative) — SURVEY §7 hard
    // part (c). Reference asserts its own GEOS value with <1 m^2.
    assert(math.abs(geomArea("buildings", -52121) - 16276875196.653734) < 500.0)
  }

  test("DuplicateNodeCreate: duplicate create does not duplicate way") {
    assert(rows("buildings", 53111).length == 1)
    assert(typeOf("buildings", 53111).contains("way"))
  }

  test("UpdatedWay2: straightened way has new length") {
    // reference tolerance: 1.0 (helper_test.go assertGeomLength) — the
    // expected constant ignores the ~5 mm coord-quantization residual.
    val g = Geom.fromWkb(rows("roads", 60000).head.getAs[Array[Byte]]("geometry"))
    assert(math.abs(g.getLength - 20037508.342789244 / 180.0 / 10.0) < 1.0)
  }

  test("UpdateNodeToCoord2: node retagged to coord leaves amenities") {
    assert(rows("amenities", 70001).isEmpty)
    assert(typeOf("amenities", 70002).contains("police"))
  }

  test("NoDuplicateInsert: sibling relation not re-inserted twice (#65)") {
    assert(typeOf("landusages", -201191).contains("park"))
    assert(rows("landusages", -201191).length == 1)
    assert(typeOf("landusages", -201192).contains("forest"))
    assert(typeOf("roads", 201151).contains("residential"))
  }

  test("UnsupportedRelation: unsupported type not inserted on update") {
    assert(rows("landusages", -201291).isEmpty)
    assert(typeOf("landusages", 201251).contains("park"))
  }
}
