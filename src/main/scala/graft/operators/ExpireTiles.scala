package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.geometry.Geom

/** Expire-tiles computation (SURVEY.md §2 A4/K7; reference expire/tilelist.go).
  *
  * Semantics reproduced exactly (unit-tested against the reference's own
  * expectation table, expire/tilelist_test.go):
  *  - a single point expires its tile padded by 0.2 tiles (border nodes
  *    expire the neighbor too);
  *  - a line walks every intersected tile per segment (integer-error walk)
  *    — but only if it covers < 500 bbox tiles at that zoom, else the zoom
  *    is lowered;
  *  - a closed ring expires its whole bbox — if < 64 tiles, else zoom is
  *    lowered ("adaptive zoom": huge geometries expire few coarse tiles
  *    instead of thousands of fine ones);
  *  - (0,0) nodes are cache-miss placeholders and are skipped; coordinates
  *    outside the web-mercator square (poles) expire nothing.
  *
  * As a Spark op this is a `flatMap(geom -> tiles) + distinct` — the
  * distinct shuffles (z,x,y) triples only, never geometry.
  */
object ExpireTiles {

  val DefaultZoom = 14
  private val MercMax = 20037508.342789244

  final case class Tile(z: Int, x: Long, y: Long)

  /** Fractional tile coordinate at `zoom`; None outside the merc square. */
  def tileCoord(lon: Double, lat: Double, zoom: Int): Option[(Double, Double)] = {
    val (x, y) = Geom.wgsToMerc(lon, lat)
    if (x < -MercMax || x > MercMax || y < -MercMax || y > MercMax) None
    else {
      val res = 2 * MercMax / 256 / math.pow(2, zoom)
      Some(((x + MercMax) / (res * 256), (MercMax - y) / (res * 256)))
    }
  }

  /** Point expiry with 0.2-tile padding, always at maxZoom. */
  def expirePoint(lon: Double, lat: Double, maxZoom: Int = DefaultZoom): Set[Tile] =
    tileCoord(lon, lat, maxZoom) match {
      case None => Set.empty
      case Some((tx, ty)) =>
        val pad = 0.2
        (for {
          px <- (tx - pad).toLong to (tx + pad).toLong
          py <- (ty - pad).toLong to (ty + pad).toLong
        } yield Tile(maxZoom, px, py)).toSet
    }

  private def bbox(pts: Seq[(Double, Double)]): Option[(Double, Double, Double, Double)] = {
    val nonEmpty = pts.filterNot(p => p._1 == 0.0 && p._2 == 0.0)
    if (nonEmpty.isEmpty) None
    else Some((nonEmpty.map(_._1).min, nonEmpty.map(_._2).min,
      nonEmpty.map(_._1).max, nonEmpty.map(_._2).max))
  }

  private def numBboxTiles(b: (Double, Double, Double, Double), zoom: Int): Int =
    (tileCoord(b._1, b._4, zoom), tileCoord(b._3, b._2, zoom)) match {
      case (Some((x1, y1)), Some((x2, y2))) =>
        math.abs((x2 - x1 + 1) * (y2 - y1 + 1)).toInt
      case _ => 0
    }

  /** Integer-error line walk over tile space (reference bresenham variant:
    * fractional start/end, truncating casts, multi-step error drain). */
  private def walkSegment(x1in: Double, y1in: Double, x2: Double, y2: Double): Seq[(Long, Long)] = {
    var x1 = x1in
    var y1 = y1in
    var dx = math.abs(x2 - x1)
    var sx = if (x2 - x1 > 0) 1.0 else -1.0
    var dy = math.abs(y2 - y1)
    var sy = if (y2 - y1 > 0) 1.0 else -1.0
    var steep = false
    if (dy > dx) {
      steep = true
      val tx = x1; x1 = y1; y1 = tx
      val td = dx; dx = dy; dy = td
      val ts = sx; sx = sy; sy = ts
    }
    val out = Seq.newBuilder[(Long, Long)]
    var e = 2 * dy - dx
    var i = 0.0
    while (i < dx) {
      if (steep) out += ((y1.toLong, x1.toLong))
      else out += ((x1.toLong, y1.toLong))
      while (e >= 0) { y1 += sy; e -= 2 * dx }
      x1 += sx
      e += 2 * dy
      i += 1
    }
    out += ((x2.toLong, y2.toLong))
    out.result()
  }

  private def expireLine(pts: Seq[(Double, Double)], zoom: Int, maxZoom: Int): Set[Tile] = {
    if (pts.length == 1) return expirePoint(pts.head._1, pts.head._2, maxZoom)
    val out = Set.newBuilder[Tile]
    var i = 0
    var aborted = false
    while (i < pts.length - 1 && !aborted) {
      val a = pts(i)
      val b = pts(i + 1)
      if (!(a._1 == 0 && a._2 == 0) && !(b._1 == 0 && b._2 == 0)) {
        (tileCoord(a._1, a._2, zoom), tileCoord(b._1, b._2, zoom)) match {
          case (Some((x1, y1)), Some((x2, y2))) =>
            if (x1.toLong == x2.toLong && y1.toLong == y2.toLong)
              out += Tile(zoom, x1.toLong, y1.toLong)
            else out ++= walkSegment(x1, y1, x2, y2).map(t => Tile(zoom, t._1, t._2))
          case _ => aborted = true // reference stops walking the line here
        }
      }
      i += 1
    }
    // keep tiles accumulated before the abort (expire/tilelist.go keeps the
    // list built so far when a segment leaves the mercator square)
    out.result()
  }

  private def expireBox(b: (Double, Double, Double, Double), zoom: Int): Set[Tile] =
    (tileCoord(b._1, b._4, zoom), tileCoord(b._3, b._2, zoom)) match {
      case (Some((x1, y1)), Some((x2, y2))) =>
        (for {
          x <- x1.toLong to x2.toLong
          y <- y1.toLong to y2.toLong
        } yield Tile(zoom, x, y)).toSet
      case _ => Set.empty
    }

  /** Adaptive expiry of a node chain (reference ExpireNodes); WGS84 input. */
  def expireNodes(pts: Seq[(Double, Double)], closed: Boolean,
      maxZoom: Int = DefaultZoom): Set[Tile] = {
    if (pts.isEmpty) return Set.empty
    val b = bbox(pts)
    var zoom = maxZoom
    while (zoom > 0) {
      val n = b.map(numBboxTiles(_, zoom)).getOrElse(0)
      if (closed) {
        if (n < 64) return b.map(expireBox(_, zoom)).getOrElse(Set.empty)
      } else if (n < 500) return expireLine(pts, zoom, maxZoom)
      zoom -= 1
    }
    Set.empty
  }

  /** Tiles touched by one WKB geometry in web mercator (3857): points pad,
    * lines walk, polygon exterior rings expire their bbox. */
  def tilesForWkb(wkb: Array[Byte], maxZoom: Int = DefaultZoom): Set[Tile] = {
    import org.locationtech.jts.geom._
    val g = Geom.fromWkb(wkb)
    if (g == null) return Set.empty
    def toWgs(cs: Array[Coordinate]): Seq[(Double, Double)] =
      cs.toSeq.map(c => Geom.mercToWgs(c.x, c.y))
    (0 until g.getNumGeometries).map(g.getGeometryN).flatMap {
      case p: Point =>
        val (lon, lat) = Geom.mercToWgs(p.getX, p.getY)
        expirePoint(lon, lat, maxZoom)
      case l: LineString =>
        expireNodes(toWgs(l.getCoordinates), closed = false, maxZoom)
      case poly: Polygon =>
        expireNodes(toWgs(poly.getExteriorRing.getCoordinates), closed = true, maxZoom)
      case other =>
        expireNodes(toWgs(other.getCoordinates), closed = false, maxZoom)
    }.toSet
  }

  /** Spark surface: distinct z/x/y tiles touched by a WKB geometry column. */
  def expire(geoms: DataFrame, geomCol: String = "geometry",
      maxZoom: Int = DefaultZoom): Dataset[Tile] = {
    val spark = geoms.sparkSession
    import spark.implicits._
    geoms.select(geomCol).as[Array[Byte]]
      .filter((wkb: Array[Byte]) => wkb != null)
      .flatMap(wkb => tilesForWkb(wkb, maxZoom))
      .distinct()
  }

  /** Render as the reference's `.tiles` text lines (expire/tilelist.go:162). */
  def writeTiles(tiles: Dataset[Tile], outDir: String): Unit = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles.map(t => s"${t.z}/${t.x}/${t.y}")
      .coalesce(1).write.mode("overwrite").text(outDir)
  }
}
