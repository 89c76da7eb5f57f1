package graft.geometry

import org.locationtech.jts.geom.{CoordinateFilter, Geometry}
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.index.strtree.STRtree

import graft.sources.GeoJson

/** Broadcast-friendly spatial lookup over a GeoJSON feature set (SURVEY.md
  * §2 J6; reference mapping/columns_intersection.go:26-131).
  *
  * Serializes as just (path, srid); the STRtree of prepared geometries is
  * built lazily once per executor JVM — the Spark analog of the reference's
  * per-process GEOS index. Queries: bbox candidates from the tree, exact
  * test via PreparedGeometry.intersects.
  */
final class FeatureIndex(path: String, srid: Int) extends Serializable {

  @transient private lazy val entries: Seq[(PreparedGeometry, Map[String, String])] =
    GeoJson.load(path).map { f =>
      val g = f.geom.copy()
      if (srid == 3857) projectToMerc(g)
      (PreparedGeometryFactory.prepare(g), f.properties)
    }

  @transient private lazy val tree: STRtree = {
    val t = new STRtree()
    entries.foreach { case (pg, props) =>
      t.insert(pg.getGeometry.getEnvelopeInternal, (pg, props))
    }
    t.build()
    t
  }

  private def projectToMerc(g: Geometry): Unit = {
    g.apply(new CoordinateFilter {
      override def filter(c: org.locationtech.jts.geom.Coordinate): Unit = {
        val (x, y) = Geom.wgsToMerc(c.x, c.y)
        c.x = x
        c.y = y
      }
    })
    g.geometryChanged()
  }

  private def candidates(g: Geometry): Iterator[(PreparedGeometry, Map[String, String])] = {
    import scala.jdk.CollectionConverters._
    tree.query(g.getEnvelopeInternal).asScala.iterator
      .map(_.asInstanceOf[(PreparedGeometry, Map[String, String])])
  }

  def intersects(g: Geometry): Boolean =
    g != null && candidates(g).exists(_._1.intersects(g))

  /** First intersecting feature's property value, like the reference (its
    * index order is load order; ties across overlapping features are rare
    * and unspecified there too). */
  def property(g: Geometry, name: String): Option[String] =
    if (g == null) None
    else candidates(g)
      .filter(_._1.intersects(g))
      .flatMap(_._2.get(name))
      .nextOption()
}
