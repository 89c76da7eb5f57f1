package graft.operators

import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import org.scalatest.funsuite.AnyFunSuite

import graft.geometry.{FeatureIndex, Geom}

/** GeoJSON feature lookup (columns_intersection_test.go), limitto clipping
  * (geom/limit/limit_test.go TestClipper/TestClipperWithBuffer) and geohash
  * encoding.
  */
class SpatialOpsSpec extends AnyFunSuite {

  private val gf = new GeometryFactory()
  private def mercPoint(lon: Double, lat: Double) = {
    val (x, y) = Geom.wgsToMerc(lon, lat)
    gf.createPoint(new Coordinate(x, y))
  }

  test("geojson_intersects_feature country lookup (be_nl_bounds)") {
    val idx = new FeatureIndex("/root/reference/mapping/be_nl_bounds.geojson", 3857)
    assert(idx.property(mercPoint(6.76976, 52.60763), "FIPS_CNTRY").isEmpty) // Germany
    assert(idx.property(mercPoint(5.40129, 52.69766), "FIPS_CNTRY").isEmpty) // IJsselmeer
    assert(idx.property(mercPoint(4.8542, 52.5726), "FIPS_CNTRY").contains("NL"))
    assert(idx.property(mercPoint(5.04529, 51.40216), "FIPS_CNTRY").contains("BE"))
  }

  test("geojson_intersects boolean lookup") {
    val idx = new FeatureIndex("/root/reference/mapping/be_nl_bounds.geojson", 3857)
    assert(!idx.intersects(mercPoint(6.76976, 52.60763)))
    assert(!idx.intersects(mercPoint(5.40129, 52.69766)))
    assert(idx.intersects(mercPoint(4.8542, 52.5726)))
    assert(idx.intersects(mercPoint(5.04529, 51.40216)))
  }

  private val clipGeojson = "/root/reference/geom/limit/clipping.geojson"

  test("clipper: point / line / polygon parts (TestClipper)") {
    val lim = new Limitto(clipGeojson, 0.0, 3857)
    assert(lim.clip(gf.createPoint(new Coordinate(0, 0))).isEmpty)
    assert(lim.clip(gf.createPoint(new Coordinate(1106543, 7082055))).length == 1)
    val line = gf.createLineString(Array(
      new Coordinate(1106543, 7082055), new Coordinate(1107105.2, 7087540.0)))
    assert(lim.clip(line).length == 2)
    val poly = gf.createPolygon(Array(
      new Coordinate(1106543, 7082055), new Coordinate(1107105.2, 7087540.0),
      new Coordinate(1112184.9, 7084424.5), new Coordinate(1106543, 7082055)))
    val parts = lim.clip(poly)
    assert(parts.length == 1)
    assert(parts.head.getArea < poly.getArea)
  }

  test("clipper with buffer: point precheck (TestClipperWithBuffer)") {
    val lim = new Limitto(clipGeojson, 0.1, 3857)
    val (x1, y1) = Geom.wgsToMerc(9.94, 53.53)
    assert(lim.containsPointBuffered(x1, y1))
    val (x2, y2) = Geom.wgsToMerc(9.04, 53.53)
    assert(!lim.containsPointBuffered(x2, y2))
  }

  test("contained geometry returns unchanged (fast path)") {
    val lim = new Limitto(clipGeojson, 0.0, 3857)
    val inner = gf.createPoint(new Coordinate(1106543, 7082055))
    assert(lim.clip(inner).head eq inner)
  }

  test("geohash encoding matches the canonical example") {
    assert(GeohashSort.encode(-5.603027, 42.604980, 5) == "ezs42")
    assert(GeohashSort.encode(-5.603027, 42.604980, 11).startsWith("ezs42"))
  }
}
