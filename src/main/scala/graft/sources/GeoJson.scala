package graft.sources

import java.io.InputStream

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.locationtech.jts.geom._

/** GeoJSON polygon reader (SURVEY.md §2 S4; reference geom/geojson/geojson.go).
  *
  * Supports FeatureCollection / Feature / bare Polygon / MultiPolygon, like
  * the reference (other geometry types are rejected). Coordinates stay in
  * WGS84; consumers project as needed. Uses the Jackson shipped with Spark —
  * no extra dependency.
  */
object GeoJson {

  final case class Feature(geom: Geometry, properties: Map[String, String])

  private val gf = new GeometryFactory()

  def load(path: String): Seq[Feature] = {
    val in = new java.io.FileInputStream(path)
    try parse(in) finally in.close()
  }

  def parse(in: InputStream): Seq[Feature] = {
    val root = new ObjectMapper().readTree(in)
    node(root)
  }

  private def node(n: JsonNode): Seq[Feature] = n.path("type").asText() match {
    case "FeatureCollection" =>
      import scala.jdk.CollectionConverters._
      n.path("features").elements().asScala.flatMap(node).toSeq
    case "Feature" =>
      val props = properties(n.path("properties"))
      geometry(n.path("geometry")).map(g => Feature(g, props))
    case "Polygon" | "MultiPolygon" => geometry(n).map(Feature(_, Map.empty))
    case other =>
      throw new IllegalArgumentException(s"unsupported GeoJSON type '$other'")
  }

  private def properties(n: JsonNode): Map[String, String] = {
    if (!n.isObject) return Map.empty
    import scala.jdk.CollectionConverters._
    n.properties().asScala.map { e =>
      val v = e.getValue
      // numeric properties render Go-style: integral floats lose the ".0"
      val s =
        if (v.isNumber && v.asDouble() == math.floor(v.asDouble()) &&
          !v.asText().contains("e")) v.asLong().toString
        else v.asText()
      e.getKey -> s
    }.toMap
  }

  private def geometry(n: JsonNode): Seq[Geometry] = n.path("type").asText() match {
    case "Polygon" => Seq(polygon(n.path("coordinates")))
    case "MultiPolygon" =>
      import scala.jdk.CollectionConverters._
      val polys = n.path("coordinates").elements().asScala.map(polygon).toSeq
      Seq(gf.createMultiPolygon(polys.toArray))
    case other =>
      throw new IllegalArgumentException(s"unsupported geometry type '$other'")
  }

  private def polygon(rings: JsonNode): Polygon = {
    import scala.jdk.CollectionConverters._
    val parsed = rings.elements().asScala.map { ring =>
      val coords = ring.elements().asScala.map { pt =>
        new Coordinate(pt.get(0).asDouble(), pt.get(1).asDouble())
      }.toArray
      gf.createLinearRing(closed(coords))
    }.toSeq
    if (parsed.isEmpty) throw new IllegalArgumentException("empty polygon")
    gf.createPolygon(parsed.head, parsed.tail.toArray)
  }

  private def closed(cs: Array[Coordinate]): Array[Coordinate] =
    if (cs.length >= 3 && cs.head != cs.last) cs :+ cs.head.copy() else cs
}
