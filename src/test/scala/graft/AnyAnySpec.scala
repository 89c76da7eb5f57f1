package graft

import org.apache.spark.sql.DataFrame

import graft.mapping.{CompiledMapping, MappingConf}
import graft.sources.OsmXml

/** `__any__` wildcard + load_all import against the reference's any_any
  * fixture (test/any_any_test.go).
  */
class AnyAnySpec extends SparkSpecBase {

  private lazy val tables: Map[String, DataFrame] = {
    val cm = new CompiledMapping(
      MappingConf.fromFile("/root/reference/test/any_any_mapping.json"))
    new ImportPipeline(spark, cm)
      .run(OsmXml.read(spark, "/root/reference/test/any_any.osm"))
      .map { case (k, v) => k -> v.cache() }
  }

  private def hstoreMap(s: String): Map[String, String] =
    if (s == null || s.isEmpty) Map.empty
    else s.split(", (?=\")").map { kv =>
      val Array(k, v) = kv.split("=>", 2)
      k.stripPrefix("\"").stripSuffix("\"") -> v.stripPrefix("\"").stripSuffix("\"")
    }.toMap

  private def tagsOf(table: String, id: Long): Option[Map[String, String]] = {
    val r = tables(table).filter(s"osm_id = $id").collect()
    r.headOption.map(row => hstoreMap(row.getAs[String]("tags")))
  }

  test("InsertedNodes: wildcard matching with load_all tags") {
    assert(tagsOf("all", 10000).isEmpty) // untagged nodes are not inserted
    assert(tagsOf("all", 10001).contains(Map("random" -> "tag")))
    assert(tagsOf("all", 10002).contains(Map("amenity" -> "shop")))
    assert(tagsOf("all", 10003).contains(
      Map("random" -> "tag", "but" -> "mapped", "amenity" -> "shop")))
    assert(tagsOf("amenities", 10002).contains(Map("amenity" -> "shop")))
    assert(tagsOf("amenities", 10003).contains(
      Map("random" -> "tag", "but" -> "mapped", "amenity" -> "shop")))
  }
}
