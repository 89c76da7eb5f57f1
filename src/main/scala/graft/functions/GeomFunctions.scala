package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.geometry.Geom
import graft.geometry.Geom.Pt

/** Spark-facing geometry functions. Projection is pure Column math
  * (codegen'd); geometry construction/area are JTS UDFs on WKB — the only
  * non-codegen hot-path functions, mirroring SURVEY.md §4's custom list.
  */
object GeomFunctions {

  /** WGS84 -> spherical-mercator X/Y as native columns (proj/proj.go:11-16). */
  def mercX(lon: Column): Column = lon * lit(Geom.Pole / 180.0)
  def mercY(lat: Column): Column =
    log(tan((lit(90.0) + lat) * lit(math.Pi / 360.0))) * lit(Geom.Pole / math.Pi)

  /** The reference stores every cached coordinate as a truncated uint32
    * (cache/binary/serialize.go:5-13, coordFactor 11930464.7083). Its test
    * goldens embed this ~9mm quantization, so we reproduce it exactly. */
  private val CoordFactor = 11930464.7083
  def quantizeCoord(c: Column): Column =
    floor((c + lit(180.0)) * lit(CoordFactor)) / lit(CoordFactor) - lit(180.0)

  private def pts(xs: Array[Double], ys: Array[Double]): IndexedSeq[Pt] = {
    val n = xs.length
    val out = new Array[Pt](n)
    var i = 0
    while (i < n) { out(i) = Pt(xs(i), ys(i)); i += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  /** point(x, y) -> WKB. */
  def pointWkb(srid: Int) = udf { (x: Double, y: Double) =>
    Geom.toWkb(Geom.point(x, y), srid)
  }

  /** linestring(xs, ys) -> WKB or null (<2 distinct). Array[Double] (not
    * Seq) at the UDF boundary: the encoder bulk-copies via toDoubleArray,
    * where Seq[Double] boxes every coordinate of every way — measured on
    * the 10⁷-ref synth import, the unbox alone was ~10% of the geometry
    * stage. */
  def lineWkb(srid: Int) = udf { (xs: Array[Double], ys: Array[Double]) =>
    if (xs == null || ys == null) null
    else Geom.lineString(pts(xs, ys)).map(Geom.toWkb(_, srid)).orNull
  }

  /** polygon(xs, ys) + MakeValid -> WKB or null (writer/ways.go:146-150). */
  def polygonValidWkb(srid: Int) = udf { (xs: Array[Double], ys: Array[Double]) =>
    if (xs == null || ys == null) null
    else Geom.polygon(pts(xs, ys)).map(p => Geom.toWkb(Geom.makeValid(p), srid)).orNull
  }

  val areaUdf = udf { (wkb: Array[Byte]) => Geom.area(wkb) }
  val webmercAreaUdf = udf { (wkb: Array[Byte]) => Geom.webmercArea(wkb) }

  /** ST_SimplifyPreserveTopology + optional buffer(0) validation (A6). */
  def simplifyWkb(tolerance: Double, validate: Boolean) = udf { (wkb: Array[Byte]) =>
    val g = Geom.fromWkb(wkb)
    if (g == null) null
    else {
      val simplified =
        org.locationtech.jts.simplify.TopologyPreservingSimplifier.simplify(g, tolerance)
      val out = if (validate) Geom.makeValid(simplified) else simplified
      Geom.toWkb(out, g.getSRID)
    }
  }
}
