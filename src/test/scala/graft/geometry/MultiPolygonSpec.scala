package graft.geometry

import org.scalatest.funsuite.AnyFunSuite

import graft.geometry.Geom.{Pt, WayGeom}

/** Ports the reference's ring/multipolygon corpus
  * (geom/multipolygon_test.go, geom/ring_test.go): shells, holes,
  * holes-in-holes, multi-way rings with reversals, touching outers,
  * self-intersect repair, open-ring handling.
  */
class MultiPolygonSpec extends AnyFunSuite {

  private def way(id: Long, refs: Seq[Long], pts: Seq[(Double, Double)]): WayGeom =
    WayGeom(id, refs.toIndexedSeq, pts.map(p => Pt(p._1, p._2)).toIndexedSeq)

  private def build(ways: WayGeom*): Option[org.locationtech.jts.geom.Geometry] =
    Geom.buildMultiPolygon(ways, maxGap = 0.1)

  private val outer10 = way(1, Seq(1, 2, 3, 4, 1),
    Seq((0, 0), (10, 0), (10, 10), (0, 10), (0, 0)))

  test("SimplePolygonWithHole: area 100-36") {
    val hole = way(2, Seq(5, 6, 7, 8, 5),
      Seq((2, 2), (8, 2), (8, 8), (2, 8), (2, 2)))
    val g = build(outer10, hole).get
    assert(g.isValid)
    assert(g.getArea == 64.0)
  }

  test("MultiPolygonWithMultipleHoles: area 98") {
    val h1 = way(2, Seq(11, 12, 13, 14, 11),
      Seq((1, 1), (2, 1), (2, 2), (1, 2), (1, 1)))
    val h2 = way(3, Seq(21, 22, 23, 24, 21),
      Seq((3, 3), (4, 3), (4, 4), (3, 4), (3, 3)))
    val g = build(outer10, h1, h2).get
    assert(g.isValid)
    assert(g.getArea == 98.0)
  }

  test("MultiPolygonWithNestedHoles: area 100-64+36-16+4") {
    val rings = Seq(
      (Seq(0, 10), 1L, Seq(1L, 2, 3, 4, 1)),
      (Seq(1, 9), 2L, Seq(11L, 12, 13, 14, 11)),
      (Seq(2, 8), 3L, Seq(21L, 22, 23, 24, 21)),
      (Seq(3, 7), 4L, Seq(31L, 32, 33, 34, 31)),
      (Seq(4, 6), 5L, Seq(41L, 42, 43, 44, 41))
    ).map { case (Seq(lo, hi), id, refs) =>
      way(id, refs, Seq((lo, lo), (hi, lo), (hi, hi), (lo, hi), (lo, lo))
        .map { case (x, y) => (x.toDouble, y.toDouble) })
    }
    val g = build(rings: _*).get
    assert(g.isValid)
    assert(g.getArea == 100.0 - 64 + 36 - 16 + 4)
  }

  test("PolygonFromThreeWays: open ways chain into one ring, area 100") {
    val w1 = way(1, Seq(1, 2, 3), Seq((0, 0), (10, 0), (10, 10)))
    val w2 = way(2, Seq(3, 4), Seq((10, 10), (0, 10)))
    val w3 = way(3, Seq(4, 1), Seq((0, 10), (0, 0)))
    val g = build(w1, w2, w3).get
    assert(g.isValid)
    assert(g.getArea == 100.0)
  }

  test("RingMergeReverseEndpoints: segments needing reversal still close") {
    // refs 1-2-3-4, 6-5-4, 1-7-6 -> ring 6,5,4,3,2,1,7,6 (ring_test.go:73)
    val p = (1 to 7).map(i => i.toLong ->
      (10 * math.cos(i * 2 * math.Pi / 7), 10 * math.sin(i * 2 * math.Pi / 7))).toMap
    val w1 = way(1, Seq(1, 2, 3, 4), Seq(p(1), p(2), p(3), p(4)))
    val w2 = way(2, Seq(6, 5, 4), Seq(p(6), p(5), p(4)))
    val w3 = way(3, Seq(1, 7, 6), Seq(p(1), p(7), p(6)))
    val g = build(w1, w2, w3).get
    assert(g.isValid)
    // regular heptagon, r=10: (7/2) r^2 sin(2pi/7)
    val expected = 3.5 * 100 * math.sin(2 * math.Pi / 7)
    assert(math.abs(g.getArea - expected) < 1e-9)
  }

  test("TouchingPolygonsWithHole: two outers sharing an edge, area 264") {
    val o2 = way(2, Seq(2, 5, 6, 3, 2),
      Seq((10, 0), (30, 0), (30, 10), (10, 10), (10, 0)))
    val hole = way(3, Seq(7, 8, 9, 10, 7),
      Seq((2, 2), (8, 2), (8, 8), (2, 8), (2, 2)))
    val g = build(outer10, o2, hole).get
    assert(g.isValid)
    assert(g.getArea == 100.0 + 200 - 36)
  }

  test("BrokenPolygonSelfIntersect: repaired, area 200-36, both orderings") {
    val w1 = way(1, Seq(1, 2, 3, 4, 5, 6, 7, 8, 1),
      Seq((0, 0), (0, 10), (10, 10), (10, 0), (20, 0), (20, 10), (30, 10), (30, 0), (0, 0)))
    val hole = way(2, Seq(15, 16, 17, 18, 15),
      Seq((2, 2), (8, 2), (8, 8), (2, 8), (2, 2)))
    val g1 = build(w1, hole).get
    assert(g1.isValid)
    assert(g1.getArea == 164.0, s"area=${g1.getArea}")

    val w3 = way(1, Seq(4, 1, 2, 3, 4, 5, 6, 7, 8, 4),
      Seq((10, 0), (0, 0), (0, 10), (10, 10), (10, 0), (20, 0), (20, 10), (30, 10), (30, 0), (10, 0)))
    val g2 = build(w3, hole).get
    assert(g2.isValid)
    assert(g2.getArea == 164.0, s"area=${g2.getArea}")
  }

  test("BrokenPolygonSelfIntersectTriangle: minor and larger overlaps") {
    def tri(d: Double) = way(1, Seq(1, 2, 3, 4, 1),
      Seq((0, 0), (0, 100), (100, 50 - d), (100, 50 + d), (0, 0)))
    val hole = way(2, Seq(15, 16, 17, 18, 15),
      Seq((10, 45), (10, 55), (20, 55), (20, 45), (10, 45)))
    val g1 = build(tri(0.00001), hole).get
    assert(g1.isValid)
    assert(math.abs(g1.getArea - (100.0 * 100 / 2 - 100)) < 0.01, s"area=${g1.getArea}")

    val g2 = build(tri(1.0), hole).get
    assert(g2.isValid)
    assert(math.abs(g2.getArea - (100.0 * 98 / 2 - 100)) < 10, s"area=${g2.getArea}")
  }

  test("OpenRing: unclosable ring drops the relation") {
    val open = way(1, Seq(1, 2, 3, 4), Seq((0, 0), (10, 0), (10, 10), (0, 10)))
    assert(build(open).isEmpty)
  }

  test("ClosedAndOpenRing: open fragment is excluded, closed ring builds") {
    val dangling = way(2, Seq(5, 6), Seq((0, 0), (-5, -2)))
    val g = build(outer10, dangling).get
    assert(g.isValid)
    assert(g.getArea == 100.0)
  }

  test("RingMergeMissingRefs: way without refs does not break the merge") {
    val empty = way(2, Seq.empty, Seq.empty)
    val g = build(outer10, empty).get
    assert(g.isValid)
    assert(g.getArea == 100.0)
  }
}
