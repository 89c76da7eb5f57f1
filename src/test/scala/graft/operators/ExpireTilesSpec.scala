package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's expectation table (expire/tilelist_test.go:12-110):
  * (nodes, closed) -> exactly N tiles, all at one zoom level.
  */
class ExpireTilesSpec extends AnyFunSuite {

  private def check(nodes: Seq[(Double, Double)], closed: Boolean,
      expectedNum: Int, expectedZoom: Int): Unit = {
    val tiles = ExpireTiles.expireNodes(nodes, closed)
    assert(tiles.size == expectedNum,
      s"expected $expectedNum tiles, got ${tiles.size}: $tiles")
    if (expectedNum > 0)
      assert(tiles.map(_.z) == Set(expectedZoom),
        s"expected zoom $expectedZoom, got ${tiles.map(_.z)}")
  }

  test("single point")(check(Seq((8.30, 53.26)), closed = false, 1, 14))

  test("point paddings") {
    check(Seq((0.0, 0.0)), closed = false, 4, 14)
    check(Seq((0.01, 0.0)), closed = false, 2, 14)
    check(Seq((0.0, 0.01)), closed = false, 2, 14)
    check(Seq((0.01, 0.01)), closed = false, 1, 14)
  }

  test("vertical line")(
    check(Seq((8.30, 53.25), (8.30, 53.30)), closed = false, 5, 14))

  test("same line split into segments")(
    check(Seq((8.30, 53.25), (8.30, 53.27), (8.30, 53.29), (8.30, 53.30)),
      closed = false, 5, 14))

  test("L-shape")(
    check(Seq((8.30, 53.25), (8.30, 53.30), (8.35, 53.30)), closed = false, 8, 14))

  test("triangle as line")(
    check(Seq((8.30, 53.25), (8.30, 53.30), (8.35, 53.30), (8.30, 53.25)),
      closed = false, 11, 14))

  test("triangle closed: bbox fill")(
    check(Seq((8.30, 53.25), (8.30, 53.30), (8.35, 53.30), (8.30, 53.25)),
      closed = true, 20, 14))

  test("large triangle closed: zoom lowered")(
    check(Seq((8.30, 53.25), (8.30, 53.90), (8.85, 53.90), (8.30, 53.25)),
      closed = true, 28, 11))

  test("large triangle as line: zoom lowered less")(
    check(Seq((8.30, 53.25), (8.30, 53.90), (8.85, 53.90), (8.30, 53.25)),
      closed = false, 63, 13))

  test("long line across the world")(
    check(Seq((-170.0, -80.0), (170.0, 80.0)), closed = false, 17, 4))

  test("large polygon across the world")(
    check(Seq((-160.0, -70.0), (160.0, -70.0), (160.0, 70.0), (-160.0, 70.0)),
      closed = true, 48, 3))

  test("poles expire nothing") {
    check(Seq((0.0, 90.0), (0.0, 89.0)), closed = true, 0, 0)
    check(Seq((0.0, -90.0), (0.0, -89.0)), closed = true, 0, 0)
    check(Seq((-170.0, 89.0), (170.0, 70.0)), closed = true, 0, 0)
  }
}
