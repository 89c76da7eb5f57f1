package graft.geometry

import org.locationtech.jts.geom._
import org.locationtech.jts.geom.prep.PreparedGeometryFactory
import org.locationtech.jts.geom.util.GeometryFixer
import org.locationtech.jts.io.{WKBReader, WKBWriter}

/** Geometry construction semantics of the reference's geom package
  * (geom/geom.go, geom/ring.go, geom/multipolygon.go), expressed with JTS
  * instead of GEOS-via-cgo. Pure JVM functions — used from UDFs and from
  * the relation mapGroups; no Spark imports here.
  */
object Geom {

  val Pole: Double = 6378137.0 * math.Pi // spherical-mercator extent (proj/proj.go:9)

  /** WGS84 -> spherical mercator (proj/proj.go:11-16). */
  def wgsToMerc(lon: Double, lat: Double): (Double, Double) =
    (lon * Pole / 180.0, math.log(math.tan((90.0 + lat) * math.Pi / 360.0)) / math.Pi * Pole)

  def mercToWgs(x: Double, y: Double): (Double, Double) =
    (180.0 * x / Pole, 180.0 / math.Pi * (2 * math.atan(math.exp((y / Pole) * math.Pi)) - math.Pi / 2))

  private val gf = new GeometryFactory()

  final case class Pt(x: Double, y: Double)

  /** nodesEqual (geom.go:47-54): |dx|<1e-9 && |dy|<1e-9. */
  @inline private def ptsEqual(a: Pt, b: Pt): Boolean =
    math.abs(a.x - b.x) < 1e-9 && math.abs(a.y - b.y) < 1e-9

  /** unduplicateNodes (geom.go:56-80): drop *consecutive* duplicates. */
  def unduplicate(pts: IndexedSeq[Pt]): IndexedSeq[Pt] = {
    if (pts.length < 2) return pts
    val out = Vector.newBuilder[Pt]
    out += pts.head
    var prev = pts.head
    var i = 1
    while (i < pts.length) {
      if (!ptsEqual(prev, pts(i))) { out += pts(i); prev = pts(i) }
      i += 1
    }
    out.result()
  }

  private def coordSeq(pts: IndexedSeq[Pt]): Array[Coordinate] =
    pts.map(p => new Coordinate(p.x, p.y)).toArray

  def point(x: Double, y: Double): Point = gf.createPoint(new Coordinate(x, y))

  /** LineString (geom.go:82-103): undup; <2 distinct nodes -> None. */
  def lineString(pts: IndexedSeq[Pt]): Option[LineString] = {
    val nd = unduplicate(pts)
    if (nd.length < 2) None else Some(gf.createLineString(coordSeq(nd)))
  }

  /** Polygon from a closed ring (geom.go:105-137): undup; <4 nodes -> None. */
  def polygon(pts: IndexedSeq[Pt]): Option[Polygon] = {
    val nd = unduplicate(pts)
    if (nd.length < 4) None
    else {
      // ensure closure for JTS (caller guarantees ring semantics)
      val closed = if (nd.head == nd.last || ptsEqual(nd.head, nd.last)) nd.updated(nd.length - 1, nd.head) else nd :+ nd.head
      if (closed.length < 4) None
      else Some(gf.createPolygon(gf.createLinearRing(coordSeq(closed))))
    }
  }

  /** The reference's MakeValid is literally buffer(0) (geos/geos.go:289-300)
    * — winding-rule repair that keeps ONE lobe of a bowtie, unlike
    * GeometryFixer's even-odd fill which keeps both. Match buffer(0);
    * fall back to GeometryFixer only when buffering fails outright. */
  def makeValid(g: Geometry): Geometry =
    if (g == null || g.isValid) g
    else
      try {
        val fixed = g.buffer(0)
        if (fixed == null || fixed.isEmpty) GeometryFixer.fix(g) else fixed
      } catch { case _: Exception => GeometryFixer.fix(g) }

  // ---- WKB ------------------------------------------------------------------

  private val wkbWriterTL = new ThreadLocal[WKBWriter] {
    override def initialValue(): WKBWriter = new WKBWriter(2, true) // EWKB w/ SRID
  }
  private val wkbReaderTL = new ThreadLocal[WKBReader] {
    override def initialValue(): WKBReader = new WKBReader()
  }

  def toWkb(g: Geometry, srid: Int): Array[Byte] = {
    if (g == null) return null
    g.setSRID(srid)
    wkbWriterTL.get().write(g)
  }

  def fromWkb(b: Array[Byte]): Geometry =
    if (b == null) null else wkbReaderTL.get().read(b)

  def area(wkb: Array[Byte]): Option[Float] = {
    val g = fromWkb(wkb)
    if (g == null) None
    else {
      val a = g.getArea
      if (a == 0.0) None else Some(a.toFloat)
    }
  }

  /** webmerc_area (mapping/columns.go:151-169): area corrected by
    * cos²(latitude of the bbox mid-Y, inverse-mercator). */
  def webmercArea(wkb: Array[Byte]): Option[Float] = {
    val g = fromWkb(wkb)
    if (g == null) return None
    val a = g.getArea
    if (a == 0.0) return None
    val env = g.getEnvelopeInternal
    val midY = env.getMinY + (env.getMaxY - env.getMinY) / 2
    val midLat = 2 * math.atan(math.exp((midY / Pole) * math.Pi)) - math.Pi / 2
    Some((a * math.pow(math.cos(midLat), 2)).toFloat)
  }

  // ---- ring assembly (geom/ring.go, geom/multipolygon.go) --------------------

  /** One member way's geometry input to ring building. */
  final case class WayGeom(id: Long, refs: IndexedSeq[Long], pts: IndexedSeq[Pt])

  private final class RingB(var wayIds: Vector[Long], var refs: Vector[Long], var pts: Vector[Pt]) {
    def isClosed: Boolean = refs.length >= 4 && refs.head == refs.last
    /** tryClose (ring.go:28-40). */
    def tryClose(maxGap: Double): Boolean = {
      if (refs.length < 4) return false
      val s = pts.head; val e = pts.last
      if (math.hypot(s.y - e.y, s.x - e.x) < maxGap) {
        refs = refs.updated(refs.length - 1, refs.head)
        pts = pts.updated(pts.length - 1, pts.head)
        true
      } else false
    }
  }

  /** mergeRings (ring.go:66-140): chain open ways end-to-end, reversing as
    * needed; exact endpoint-id matching. */
  private def mergeOpenRings(open: Seq[RingB]): Seq[RingB] = {
    val endpoints = scala.collection.mutable.Map.empty[Long, RingB]
    open.foreach { ring =>
      if (ring.refs.length >= 2) {
        val left = ring.refs.head
        val right = ring.refs.last
        endpoints.get(left) match {
          case Some(orig) =>
            endpoints.remove(left)
            if (left == orig.refs.last) {
              orig.refs = orig.refs ++ ring.refs.tail
              orig.pts = orig.pts ++ ring.pts.tail
            } else {
              orig.refs = orig.refs.reverse ++ ring.refs.tail
              orig.pts = orig.pts.reverse ++ ring.pts.tail
            }
            orig.wayIds = orig.wayIds ++ ring.wayIds
            endpoints.get(right) match {
              case Some(rightRing) if rightRing ne orig =>
                endpoints.remove(right)
                if (right == rightRing.refs.head) {
                  orig.refs = orig.refs ++ rightRing.refs.tail
                  orig.pts = orig.pts ++ rightRing.pts.tail
                } else {
                  orig.refs = orig.refs.dropRight(1) ++ rightRing.refs.reverse
                  orig.pts = orig.pts.dropRight(1) ++ rightRing.pts.reverse
                }
                orig.wayIds = orig.wayIds ++ rightRing.wayIds
                endpoints(orig.refs.last) = orig
              case _ =>
                endpoints(orig.refs.last) = orig
            }
          case None =>
            endpoints.get(right) match {
              case Some(orig) =>
                endpoints.remove(right)
                if (right == orig.refs.head) {
                  orig.refs = ring.refs.dropRight(1) ++ orig.refs
                  orig.pts = ring.pts.dropRight(1) ++ orig.pts
                } else {
                  orig.refs = orig.refs.dropRight(1) ++ ring.refs.reverse
                  orig.pts = orig.pts.dropRight(1) ++ ring.pts.reverse
                }
                orig.wayIds = orig.wayIds ++ ring.wayIds
                endpoints(ring.refs.head) = orig
              case None =>
                endpoints(left) = ring
                endpoints(right) = ring
            }
        }
      }
    }
    endpoints.values.toSeq.distinct
  }

  /** buildRings + buildRelGeometry (multipolygon.go:55-222).
    * Returns None when the relation forms no valid (multi)polygon — the
    * relation is dropped, matching the reference's warn-and-skip.
    */
  def buildMultiPolygon(ways: Seq[WayGeom], maxGap: Double): Option[Geometry] = {
    if (ways.isEmpty) return None
    val rings = ways.map(w => new RingB(Vector(w.id), w.refs.toVector, w.pts.toVector))
    val (closed, open) = rings.partition(_.isClosed)

    val complete = Vector.newBuilder[(RingB, Polygon)]
    // closed rings first; polygon build failure drops the whole relation
    for (r <- closed) polygon(r.pts) match {
      case Some(p) => complete += (r -> p)
      case None => return None
    }
    for (r <- mergeOpenRings(open)) {
      if (r.isClosed || r.tryClose(maxGap)) {
        polygon(r.pts) match {
          case Some(p) => complete += (r -> p)
          case None => return None
        }
      } // unclosable merged rings are skipped (multipolygon.go:95-98)
    }
    val completeRings = complete.result()
    if (completeRings.isEmpty) return None

    // sort by area desc (multipolygon.go:111-115); stable like Go's sort? Go
    // uses unstable sort but areas tie only in degenerate fixtures.
    val sorted = completeRings.map { case (r, p) => (r, p, p.getArea) }.sortBy(-_._3)

    val n = sorted.length
    val containedBy = Array.fill(n)(-1)
    val holes = Array.fill(n)(scala.collection.mutable.Set.empty[Int])
    val shells = scala.collection.mutable.LinkedHashSet.empty[Int]
    val outer = Array.fill(n)(false)

    def isHole(idx0: Int): Boolean = {
      var idx = idx0
      var count = 0
      while (containedBy(idx) != -1) { idx = containedBy(idx); count += 1 }
      count % 2 == 1
    }

    for (i <- 0 until n) {
      val prepared = PreparedGeometryFactory.prepare(sorted(i)._2)
      for (j <- (i + 1) until n) {
        if (prepared.contains(sorted(j)._2)) {
          if (containedBy(j) != -1) {
            holes(containedBy(j)) -= j
            shells -= j
          }
          containedBy(j) = i
          if (isHole(j)) { holes(i) += j; outer(i) = false }
          else { shells += j; outer(i) = true }
        }
      }
      if (containedBy(i) == -1) { shells += i; outer(i) = true }
    }

    val polys = shells.toSeq.map { si =>
      val shellRing = sorted(si)._2.getExteriorRing
      val interior = holes(si).toSeq.sorted.map(hi => sorted(hi)._2.getExteriorRing)
      gf.createPolygon(
        gf.createLinearRing(shellRing.getCoordinateSequence),
        interior.map(r => gf.createLinearRing(r.getCoordinateSequence)).toArray)
    }
    val result =
      if (polys.length == 1) polys.head
      else gf.createMultiPolygon(polys.toArray)
    Some(makeValid(result))
  }
}
