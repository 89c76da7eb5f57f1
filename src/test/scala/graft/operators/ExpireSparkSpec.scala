package graft.operators

import graft.SparkSpecBase
import graft.geometry.Geom
import graft.geometry.Geom.Pt

/** The Spark surface of expire-tiles: WKB column in -> distinct Tile set out,
  * matching the pure per-geometry function. */
class ExpireSparkSpec extends SparkSpecBase {

  test("expire() over a WKB column equals per-geometry tile union") {
    import spark.implicits._
    def mercPt(lon: Double, lat: Double): Pt = {
      val (x, y) = Geom.wgsToMerc(lon, lat)
      Pt(x, y)
    }
    val point = Geom.toWkb(Geom.point(mercPt(8.30, 53.26).x, mercPt(8.30, 53.26).y), 3857)
    val line = Geom.toWkb(
      Geom.lineString(IndexedSeq(mercPt(8.30, 53.25), mercPt(8.30, 53.30))).get, 3857)
    val df = Seq(point, line).toDF("geometry")

    val got = ExpireTiles.expire(df).collect().toSet
    val want = ExpireTiles.expirePoint(8.30, 53.26) ++
      ExpireTiles.expireNodes(Seq((8.30, 53.25), (8.30, 53.30)), closed = false)
    assert(got == want)
    assert(got.nonEmpty)
  }
}
