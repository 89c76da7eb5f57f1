package graft.mapping

import org.scalatest.funsuite.AnyFunSuite

/** Matcher/filter semantics against the reference's own mapping fixtures
  * (behavioral cases mirror mapping/filter_test.go and matcher_test.go
  * expectations; assertions written from the documented semantics).
  */
class MappingSpec extends AnyFunSuite {
  val completeDb = "/root/reference/test/complete_db_mapping.json"
  val singleTable = "/root/reference/test/single_table_mapping.json"
  val routeRelation = "/root/reference/test/route_relation_mapping.yml"

  lazy val m = new CompiledMapping(MappingConf.fromFile(completeDb))

  test("complete_db mapping parses with all tables and generalized tables") {
    val conf = m.conf
    assert(conf.tables.size == 15)
    assert(conf.tables.contains("landusages") && conf.tables.contains("roads"))
    assert(conf.generalizedTables.size == 8)
    assert(conf.tags.include == Seq("shop", "amenity", "opening_hours"))
    assert(conf.areas.areaTags == Set("leisure"))
    assert(conf.areas.linearTags == Set("highway"))
    assert(!conf.singleIdSpace)
  }

  test("point matcher routes place nodes") {
    val matches = m.pointMatcher.matchNode(Map("place" -> "village", "name" -> "Foo"))
    assert(matches.map(_.table).contains("places"))
    val pm = matches.find(_.table == "places").get
    assert(pm.key == "place" && pm.value == "village")
  }

  test("unmapped tags match nothing") {
    assert(m.pointMatcher.matchNode(Map("random" -> "tag")).isEmpty)
  }

  test("open highway way matches roads as linestring, not closed-area tables") {
    val ms = m.lineStringMatcher.matchWay(Map("highway" -> "secondary"), isClosed = false)
    assert(ms.exists(_.table == "roads"))
    assert(m.polygonMatcher.matchWay(Map("highway" -> "secondary"), isClosed = false).isEmpty)
  }

  test("closed way with building tag matches buildings polygon table") {
    val ms = m.polygonMatcher.matchWay(Map("building" -> "yes"), isClosed = true)
    assert(ms.exists(_.table == "buildings"))
  }

  test("area=yes closed highway is dropped from linestring, area=no from polygon") {
    // linear_tags = [highway]: closed+area=yes -> no linestring match
    val lin = m.lineStringMatcher.matchWay(
      Map("highway" -> "pedestrian", "area" -> "yes"), isClosed = true)
    assert(!lin.exists(_.table == "roads"))
    // polygon side: highway is a linear tag -> only matches with area=yes
    val polYes = m.polygonMatcher.matchWay(
      Map("highway" -> "pedestrian", "area" -> "yes"), isClosed = true)
    val polNo = m.polygonMatcher.matchWay(
      Map("highway" -> "pedestrian", "area" -> "no"), isClosed = true)
    val polPlain = m.polygonMatcher.matchWay(
      Map("highway" -> "pedestrian"), isClosed = true)
    assert(polYes.exists(_.table == "transport_areas") || polYes.nonEmpty)
    assert(polNo.isEmpty)
    assert(!polPlain.exists(_.table == "transport_areas") || polPlain.isEmpty)
  }

  test("leisure (area_tag) closed way stays polygon, drops from linestring") {
    val pol = m.polygonMatcher.matchWay(Map("leisure" -> "park"), isClosed = true)
    assert(pol.exists(_.table == "landusages"))
  }

  test("relation polygon matcher requires multipolygon/boundary type") {
    val rel = m.polygonMatcher.matchRelation(
      Map("type" -> "multipolygon", "landuse" -> "park"))
    assert(rel.exists(_.table == "landusages"))
    val noType = m.polygonMatcher.matchRelation(Map("landuse" -> "park"))
    assert(noType.isEmpty)
    val badType = m.polygonMatcher.matchRelation(
      Map("type" -> "route", "landuse" -> "park"))
    assert(badType.isEmpty)
  }

  test("sub-mappings report the table with submapping name (roads by class)") {
    val ms = m.lineStringMatcher.matchWay(Map("highway" -> "secondary"), isClosed = false)
    val road = ms.find(_.table == "roads").get
    assert(road.subMapping == "roads")
    val rail = m.lineStringMatcher.matchWay(Map("railway" -> "rail"), isClosed = false)
    assert(rail.find(_.table == "roads").exists(_.subMapping == "railway"))
  }

  test("match dedup keeps the lowest-order mapping per table") {
    // landusages maps both landuse=park(order within landuse list) and leisure=park;
    // a way with both should produce exactly ONE landusages row.
    val ms = m.polygonMatcher.matchWay(
      Map("landuse" -> "forest", "leisure" -> "park"), isClosed = true)
    assert(ms.count(_.table == "landusages") == 1)
  }

  test("node tag prefilter keeps mapped + include tags, drops the rest") {
    val f = m.nodeTagFilter
    val kept = f.filter(Map(
      "place" -> "village", "name" -> "X", "random" -> "y",
      "shop" -> "supermarket", "highway" -> "bus_stop"))
    assert(kept.contains("place"))
    assert(kept.contains("name")) // column key
    assert(kept.contains("shop")) // tags.include
    assert(!kept.contains("random"))
    assert(kept.contains("highway")) // bus_stop mapped in transport_points
    val dropped = f.filter(Map("highway" -> "motorway")) // motorway not a point mapping value
    assert(!dropped.contains("highway"))
  }

  test("way tag prefilter keeps area and linestring/polygon mapped keys") {
    val f = m.wayTagFilter
    val kept = f.filter(Map("highway" -> "motorway", "area" -> "yes", "foo" -> "bar"))
    assert(kept.contains("highway") && kept.contains("area") && !kept.contains("foo"))
  }

  test("single_table mapping: single id space + type_mappings on geometry table") {
    val st = new CompiledMapping(MappingConf.fromFile(singleTable))
    assert(st.conf.singleIdSpace)
    val t = st.conf.tables.values.head
    assert(t.tableType == TableType.Geometry)
    assert(t.typeMappings.points.nonEmpty || t.typeMappings.polygons.nonEmpty
      || t.typeMappings.linestrings.nonEmpty)
  }

  test("route_relation yaml parses with relation tables") {
    val rr = new CompiledMapping(MappingConf.fromFile(routeRelation))
    val types = rr.conf.tables.values.map(_.tableType).toSet
    assert(types.contains(TableType.Relation) || types.contains(TableType.RelationMember))
  }

  test("require/reject filters") {
    // synthetic mapping exercising filters (semantics of mapping.go:434-468)
    val conf = MappingConf.fromString(
      """
        |tables:
        |  pubs:
        |    type: point
        |    mapping:
        |      amenity: [pub]
        |    filters:
        |      require:
        |        name: ["__any__"]
        |      reject:
        |        access: ["no", "private"]
        |    columns:
        |    - {name: osm_id, type: id}
        |""".stripMargin)
    val cm = new CompiledMapping(conf)
    assert(cm.pointMatcher.matchNode(Map("amenity" -> "pub", "name" -> "A")).nonEmpty)
    assert(cm.pointMatcher.matchNode(Map("amenity" -> "pub")).isEmpty) // require name
    assert(cm.pointMatcher.matchNode(
      Map("amenity" -> "pub", "name" -> "A", "access" -> "no")).isEmpty)
    assert(cm.pointMatcher.matchNode(
      Map("amenity" -> "pub", "name" -> "A", "access" -> "yes")).nonEmpty)
  }

  test("__any__ key/value wildcard") {
    val conf = MappingConf.fromString(
      """
        |tables:
        |  everything:
        |    type: point
        |    mapping:
        |      __any__: [__any__]
        |    columns:
        |    - {name: osm_id, type: id}
        |""".stripMargin)
    val cm = new CompiledMapping(conf)
    assert(cm.pointMatcher.matchNode(Map("anything" -> "at_all")).nonEmpty)
    // __any__ matches even with no tags at all (matcher.go:189-191)
    assert(cm.pointMatcher.matchTags(Map.empty, closed = false, relation = false).nonEmpty)
  }

  test("load_all with glob excludes") {
    val conf = MappingConf.fromString(
      """
        |tags:
        |  load_all: true
        |  exclude: [created_by, "tiger:*"]
        |tables:
        |  all:
        |    type: point
        |    mapping:
        |      __any__: [__any__]
        |    columns:
        |    - {name: osm_id, type: id}
        |""".stripMargin)
    val cm = new CompiledMapping(conf)
    val kept = cm.nodeTagFilter.filter(Map(
      "created_by" -> "x", "tiger:cfcc" -> "y", "name" -> "keepme"))
    assert(kept == Map("name" -> "keepme"))
  }
}
