package graft.operators

import org.locationtech.jts.geom._
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.operation.linemerge.LineMerger

import graft.geometry.Geom
import graft.sources.GeoJson

/** Coverage limiting (SURVEY.md §2 J5/P6; reference geom/limit/limit.go).
  *
  * Two checks, like the reference:
  *  - [[containsPointBuffered]] — cheap filter for coords/nodes against the
  *    buffered coverage (reader/reader.go:215-227);
  *  - [[clip]] — exact, type-preserving intersection of built geometries:
  *    fully-inside returns the input untouched (prepared-contains fast
  *    path), partial overlaps return the clipped parts (each part becomes
  *    its own output row), disjoint returns nothing. Lines re-merge after
  *    clipping; polygon parts stay separate.
  *
  * Serializes as (path, buffer, srid): the parsed coverage + prepared
  * geometry build lazily per executor — broadcast pattern, no shuffle. The
  * reference's grid-split + STRtree (limit.go:70-109) is a GEOS-performance
  * workaround that JTS PreparedGeometry subsumes.
  */
final class Limitto(path: String, bufferDist: Double = 0.0, srid: Int = 3857)
    extends Serializable {

  @transient private lazy val coverage: Geometry = {
    val features = GeoJson.load(path)
    require(features.nonEmpty, s"no polygons in $path")
    val gf = new GeometryFactory()
    val union = gf.createGeometryCollection(features.map(_.geom).toArray).union()
    if (srid == 3857) {
      union.apply(new CoordinateFilter {
        override def filter(c: Coordinate): Unit = {
          val (x, y) = Geom.wgsToMerc(c.x, c.y)
          c.x = x
          c.y = y
        }
      })
      union.geometryChanged()
    }
    union
  }

  @transient private lazy val prepared: PreparedGeometry =
    PreparedGeometryFactory.prepare(coverage)

  @transient private lazy val preparedBuffered: PreparedGeometry =
    PreparedGeometryFactory.prepare(
      if (bufferDist == 0.0) coverage else coverage.buffer(bufferDist))

  @transient private lazy val pointFactory = new GeometryFactory()

  /** P6: point-in-buffered-coverage (x/y already in target srid). */
  def containsPointBuffered(x: Double, y: Double): Boolean =
    preparedBuffered.intersects(pointFactory.createPoint(new Coordinate(x, y)))

  /** Blob/file-level prune test: does a lon/lat envelope intersect the
    * BUFFERED coverage? Mercator is monotone per axis, so the projected
    * corners bound the projected envelope exactly; latitudes are clamped
    * to the projection's valid band. Used by the PBF source to skip whole
    * out-of-coverage blobs before any decode. */
  def intersectsEnvelopeLonLat(minLon: Double, minLat: Double,
      maxLon: Double, maxLat: Double): Boolean = {
    def clampLat(lat: Double): Double = math.max(-85.06, math.min(85.06, lat))
    val (x0, y0) =
      if (srid == 3857) Geom.wgsToMerc(minLon, clampLat(minLat))
      else (minLon, minLat)
    val (x1, y1) =
      if (srid == 3857) Geom.wgsToMerc(maxLon, clampLat(maxLat))
      else (maxLon, maxLat)
    val env = pointFactory.toGeometry(new Envelope(x0, x1, y0, y1))
    preparedBuffered.intersects(env)
  }

  /** J5: clip one geometry; empty result = drop the element. */
  def clip(g: Geometry): Seq[Geometry] = {
    if (g == null) return Seq.empty
    if (prepared.contains(g)) return Seq(g)
    if (!prepared.intersects(g)) return Seq.empty
    val inter = coverage.intersection(g)
    if (inter.isEmpty) return Seq.empty
    g match {
      case _: LineString | _: MultiLineString =>
        val merger = new LineMerger()
        collectParts(inter, 1).foreach(merger.add)
        import scala.jdk.CollectionConverters._
        merger.getMergedLineStrings.asScala.toSeq.collect {
          case l: LineString if !l.isEmpty => l
        }
      case _: Polygon | _: MultiPolygon =>
        collectParts(inter, 2)
      case _: Point =>
        collectParts(inter, 0)
      case _ =>
        Seq(inter)
    }
  }

  /** WKB surface for the pipeline: clip parts re-serialized with the srid. */
  def clipWkb(wkb: Array[Byte]): Seq[Array[Byte]] =
    clip(Geom.fromWkb(wkb)).map(Geom.toWkb(_, srid))

  private def collectParts(g: Geometry, dim: Int): Seq[Geometry] =
    (0 until g.getNumGeometries).map(g.getGeometryN)
      .flatMap { p =>
        if (p.getDimension == dim && !p.isEmpty) Seq(p)
        else if (p.getNumGeometries > 1) collectParts(p, dim)
        else Seq.empty
      }
}
