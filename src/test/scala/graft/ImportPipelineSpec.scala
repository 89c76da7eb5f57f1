package graft

import org.apache.spark.sql.DataFrame
import graft.sources.OsmXml

/** End-to-end import against the reference's complete_db fixture; goldens
  * are the assertions of test/completedb_test.go (import phase).
  */
class ImportPipelineSpec extends SparkSpecBase {

  lazy val tables: Map[String, DataFrame] = {
    val p = ImportPipeline(spark, "/root/reference/test/complete_db_mapping.json")
    val out = p.run(OsmXml.read(spark, "/root/reference/test/complete_db.osm"))
    out.map { case (k, v) => k -> v.cache() }
  }

  private def rows(table: String, id: Long): Array[org.apache.spark.sql.Row] =
    tables(table).filter(s"osm_id = $id").collect()

  private def typeOf(table: String, id: Long): Option[String] =
    rows(table, id).headOption.map(_.getAs[String]("type"))

  test("tagged place node lands in places") {
    val r = rows("places", 10000)
    assert(r.length == 1)
    assert(r.head.getAs[String]("type") == "village")
    assert(r.head.getAs[String]("name") == "Foo")
  }

  test("OnlyNewStyleMultipolygon (completedb_test.go:86-92)") {
    assert(typeOf("landusages", -1001).contains("wood"))
    assert(rows("landusages", -1011).isEmpty)
    assert(rows("landusages", -1021).isEmpty)
  }

  test("LandusageToWaterarea1: parks in landusages, not waterareas") {
    assert(rows("waterareas", 11001).isEmpty)
    assert(rows("waterareas", -13001).isEmpty)
    assert(typeOf("landusages", 11001).contains("park"))
    assert(typeOf("landusages", -13001).contains("park"))
  }

  test("ChangedHoleTags1: relation without tags does not shadow way") {
    assert(rows("waterareas", 14011).isEmpty)
    assert(rows("waterareas", -14011).isEmpty)
    assert(typeOf("landusages", 14001).contains("park"))
    assert(rows("landusages", -14001).isEmpty)
  }

  private def geomArea(table: String, id: Long): Double =
    graft.geometry.Geom.fromWkb(
      rows(table, id).head.getAs[Array[Byte]]("geometry")).getArea

  test("SplitOuterMultipolygonWay1: way member of mp not inserted as road") {
    assert(rows("roads", 15002).isEmpty)
    assert(typeOf("landusages", -15001).contains("park"))
    // assertGeomArea tolerance is 1 m^2 (helper_test.go:424-433)
    val area = geomArea("landusages", -15001)
    assert(math.abs(area - 9816216452.0) < 1.0, s"area=$area")
  }

  test("MergeOuterMultipolygonWay1: split outer ways merged into ring") {
    assert(typeOf("landusages", -16001).contains("park"))
    assert(typeOf("roads", 16002).contains("residential"))
    val area = geomArea("landusages", -16001)
    assert(math.abs(area - 12779350582.0) < 1.0, s"area=$area")
  }

  test("BrokenMultipolygonWays: unmergeable outer ways dropped") {
    assert(rows("landusages", -17001).isEmpty)
    assert(typeOf("roads", 17001).contains("residential"))
    assert(rows("roads", 17002).isEmpty) // single-node way
    assert(rows("landusages", -17101).isEmpty)
    assert(typeOf("roads", 17101).contains("residential"))
    assert(rows("roads", 17102).isEmpty) // zero-node way
  }

  test("WayWithInvalidLayer: z_order NULL on int32 overflow") {
    val r = rows("roads", 17003)
    assert(r.length == 1)
    assert(typeOf("roads", 17003).contains("residential"))
    assert(r.head.isNullAt(r.head.fieldIndex("z_order")))
  }

  test("NodeWayInsertedTwice: two mappings, two rows in same table") {
    val types = rows("roads", 18001).map(_.getAs[String]("type")).sorted
    assert(types.toSeq == Seq("residential", "tram"))
  }

  test("OuterWayInsertedTwice: outer ways with own tags inserted") {
    assert(typeOf("landusages", -19001).contains("farmland"))
    assert(typeOf("landusages", 19002).contains("farmyard"))
    assert(typeOf("landusages", 19001).contains("farm"))
  }

  test("geometry columns are valid WKB with srid 3857") {
    val wkb = rows("landusages", -1001).head.getAs[Array[Byte]]("geometry")
    val g = graft.geometry.Geom.fromWkb(wkb)
    assert(g.isValid)
    assert(g.getSRID == 3857)
  }
}
