package graft.mapping

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's filter corpus (mapping/filter_tags_test.go):
  * require/reject with mapping-filter swaps, require_regexp/reject_regexp,
  * `__any__` wildcards in filters, and deprecated exclude_tags.
  */
class FilterTagsSpec extends AnyFunSuite {

  private def check(yaml: String, accept: Seq[Map[String, String]],
      reject: Seq[Map[String, String]]): Unit = {
    val cm = new CompiledMapping(MappingConf.fromString(yaml))
    for (tags <- accept)
      assert(cm.lineStringMatcher.matchWay(tags, isClosed = false).nonEmpty,
        s"not accepted: $tags")
    for (tags <- reject)
      assert(cm.lineStringMatcher.matchWay(tags, isClosed = false).isEmpty,
        s"not rejected: $tags")
  }

  test("require filter on a non-mapped key (filter_tags_test.go:11)") {
    check(
      """tables:
        |  admin:
        |    fields:
        |    - {name: id, type: id}
        |    - {key: admin_level, name: admin_level, type: integer}
        |    filters:
        |      require:
        |        boundary: ["administrative", "maritime"]
        |    mapping:
        |      admin_level: ['2', '4']
        |    type: linestring""".stripMargin,
      accept = Seq(
        Map("admin_level" -> "2", "boundary" -> "administrative"),
        Map("admin_level" -> "2", "boundary" -> "maritime"),
        Map("admin_level" -> "4", "boundary" -> "administrative", "name" -> "N4"),
        Map("admin_level" -> "4", "boundary" -> "maritime", "name" -> "N4")),
      reject = Seq(
        Map("admin_level" -> "0", "boundary" -> "administrative"),
        Map("admin_level" -> "1", "boundary" -> "administrative"),
        Map("admin_level" -> "2", "boundary" -> "postal_code"),
        Map("admin_level" -> "2", "boundary" -> ""),
        Map("admin_level" -> "2", "boundary" -> "__nil__"),
        Map("admin_level" -> "4", "boundary" -> "census"),
        Map("admin_level" -> "3", "boundary" -> "administrative", "name" -> "NX"),
        Map("admin_level" -> "2"),
        Map("admin_level" -> "4"),
        Map("admin_level" -> "❤"),
        Map("admin_level" -> "__any__", "boundary" -> "__any__"),
        Map("boundary" -> "administrative"),
        Map("boundary" -> "maritime"),
        Map("name" -> "maritime")))
  }

  test("require filter with mapping and filters swapped (filter_tags_test.go:57)") {
    check(
      """tables:
        |  admin:
        |    fields:
        |    - {name: id, type: id}
        |    - {key: admin_level, name: admin_level, type: integer}
        |    filters:
        |      require:
        |        admin_level: ["2", "4"]
        |    mapping:
        |      boundary: [administrative, maritime]
        |    type: linestring""".stripMargin,
      accept = Seq(
        Map("admin_level" -> "2", "boundary" -> "administrative"),
        Map("admin_level" -> "4", "boundary" -> "maritime", "name" -> "N4")),
      reject = Seq(
        Map("admin_level" -> "0", "boundary" -> "administrative"),
        Map("admin_level" -> "2", "boundary" -> "postal_code"),
        Map("admin_level" -> "2"),
        Map("boundary" -> "administrative"),
        Map("name" -> "maritime")))
  }

  test("reject + require_regexp (filter_tags_test.go:105)") {
    check(
      """tables:
        |  buildings:
        |    fields:
        |    - {name: id, type: id}
        |    - {key: building, name: building, type: string}
        |    filters:
        |      reject:
        |        building: ["no", "none"]
        |      require_regexp:
        |        'addr:housenumber': '^\d+[a-zA-Z,]*$'
        |        building: '^[a-z_]+$'
        |    mapping:
        |      building: [__any__]
        |    type: linestring""".stripMargin,
      accept = Seq(
        Map("building" -> "yes", "addr:housenumber" -> "1a"),
        Map("building" -> "house", "addr:housenumber" -> "131"),
        Map("building" -> "residential", "addr:housenumber" -> "21"),
        Map("building" -> "garage", "addr:housenumber" -> "0"),
        Map("building" -> "hut", "addr:housenumber" -> "99999999"),
        Map("building" -> "_", "addr:housenumber" -> "333"),
        Map("building" -> "__any__", "addr:housenumber" -> "333"),
        Map("building" -> "__nil__", "addr:housenumber" -> "333"),
        Map("building" -> "y", "addr:housenumber" -> "1abcdefg"),
        Map("building" -> "tower_block", "addr:housenumber" -> "1A"),
        Map("building" -> "shed", "name" -> "N4", "addr:housenumber" -> "1AAA"),
        Map("building" -> "office", "name" -> "N4", "addr:housenumber" -> "0XYAB,")),
      reject = Seq(
        Map("building" -> "yes", "addr:housenumber" -> "aaaaa-number"),
        Map("building" -> "house", "addr:housenumber" -> "1-3a"),
        Map("building" -> "house", "addr:housenumber" -> "❤"),
        Map("building" -> "house", "addr:housenumber" -> "two"),
        Map("building" -> "residential", "addr:housenumber" -> "x21"),
        Map("building" -> "", "addr:housenumber" -> "111"),
        Map("building" -> "no"),
        Map("building" -> "no", "addr:housenumber" -> "1a"),
        Map("building" -> "No", "addr:housenumber" -> "1a"),
        Map("building" -> "NO", "addr:housenumber" -> "1a"),
        Map("building" -> "none"),
        Map("building" -> "none", "addr:housenumber" -> "0"),
        Map("building" -> "nONe", "addr:housenumber" -> "0"),
        Map("building" -> "Garage"),
        Map("building" -> "tower-block"),
        Map("building" -> "❤"),
        Map("building" -> "Ümlåütê"),
        Map("building" -> "木"),
        Map("building" -> "SheD", "name" -> "N4"),
        Map("admin_level" -> "2"),
        Map("boundary" -> "administrative"),
        Map("name" -> "maritime")))
  }

  test("require __any__ on name (filter_tags_test.go:183)") {
    check(
      """tables:
        |  highway:
        |    fields:
        |    - {name: id, type: id}
        |    - {key: highway, name: highway, type: string}
        |    - {key: name, name: name, type: string}
        |    filters:
        |      require:
        |        name: ["__any__"]
        |      reject:
        |        highway: ["no", "none"]
        |    mapping:
        |      highway: [__any__]
        |    type: linestring""".stripMargin,
      accept = Seq(
        Map("highway" -> "residential", "name" -> "N1"),
        Map("highway" -> "service", "name" -> "N2"),
        Map("highway" -> "", "name" -> "🌍🌎🌏"),
        Map("highway" -> "_", "name" -> "N6"),
        Map("highway" -> "SheD", "name" -> "N11"),
        Map("highway" -> "❤", "name" -> "❤"),
        Map("highway" -> "木", "name" -> "木")),
      reject = Seq(
        Map("highway" -> "no", "name" -> "N1"),
        Map("highway" -> "none", "name" -> "N2"),
        Map("highway" -> "yes"),
        Map("highway" -> "no"),
        Map("highway" -> "residential"),
        Map("highway" -> "❤"),
        Map("admin_level" -> "2"),
        Map("boundary" -> "maritime"),
        Map("name" -> "maritime")))
  }

  test("require list + reject __any__ + reject_regexp (filter_tags_test.go:253)") {
    check(
      """tables:
        |  waterway:
        |    fields:
        |    - {name: id, type: id}
        |    - {key: waterway, name: waterway, type: string}
        |    - {key: name, name: name, type: string}
        |    filters:
        |      require:
        |        name: ["__any__"]
        |        waterway: [stream, river, canal, drain, ditch]
        |      reject:
        |        fixme: ['__any__']
        |        amenity: ['__any__']
        |        shop: ['__any__']
        |        building: ['__any__']
        |        tunnel: ['yes']
        |      reject_regexp:
        |        level: '^\D+.*$'
        |    mapping:
        |      waterway: [__any__]
        |    type: linestring""".stripMargin,
      accept = Seq(
        Map("waterway" -> "stream", "name" -> "N1"),
        Map("waterway" -> "river", "name" -> "N2"),
        Map("waterway" -> "stream", "name" -> "N1", "tunnel" -> "no"),
        Map("waterway" -> "river", "name" -> "N2", "boat" -> "no"),
        Map("waterway" -> "ditch", "name" -> "N4", "level" -> "3"),
        Map("waterway" -> "stream", "name" -> "__any__"),
        Map("waterway" -> "stream", "name" -> "__nil__"),
        Map("waterway" -> "stream", "name" -> "❤")),
      reject = Seq(
        Map("waterway" -> "ditch", "name" -> "N1", "fixme" -> "incomplete"),
        Map("waterway" -> "stream", "name" -> "N1", "amenity" -> "parking"),
        Map("waterway" -> "river", "name" -> "N2", "shop" -> "hairdresser"),
        Map("waterway" -> "canal", "name" -> "N3", "building" -> "house"),
        Map("waterway" -> "drain", "name" -> "N1 tunnel", "tunnel" -> "yes"),
        Map("waterway" -> "river", "name" -> "N4", "level" -> "unknown"),
        Map("waterway" -> "ditch", "name" -> "N4", "level" -> "primary"),
        Map("waterway" -> "path", "name" -> "N5"),
        Map("waterway" -> "SheD", "name" -> "N11"),
        Map("waterway" -> "yes"),
        Map("waterway" -> "__nil__", "name" -> "__nil__"),
        Map("waterway" -> "__any__", "name" -> "__nil__"),
        Map("waterway" -> "stream", "name" -> "__any__", "shop" -> "__any__"),
        Map("waterway" -> "stream", "name" -> "__nil__", "shop" -> ""),
        Map("admin_level" -> "2"),
        Map("name" -> "maritime")))
  }

  test("deprecated exclude_tags (filter_tags_test.go:362)") {
    check(
      """tables:
        |  exclude_tags:
        |    fields:
        |    - {name: id, type: id}
        |    - {key: waterway, name: waterway, type: string}
        |    - {key: name, name: name, type: string}
        |    filters:
        |      require:
        |        waterway: [stream]
        |      exclude_tags:
        |      - ['waterway', 'river']
        |      - ['waterway', 'canal']
        |      - ['waterway', 'drain']
        |      - ['waterway', 'ditch']
        |    mapping:
        |      waterway: [__any__]
        |    type: linestring""".stripMargin,
      accept = Seq(
        Map("waterway" -> "stream", "name" -> "N1"),
        Map("waterway" -> "stream", "name" -> "N1", "tunnel" -> "no"),
        Map("waterway" -> "stream", "name" -> "N1", "amenity" -> "parking")),
      reject = Seq(
        Map("waterway" -> "river", "name" -> "N2"),
        Map("waterway" -> "canal", "name" -> "N3"),
        Map("waterway" -> "drain", "name" -> "N4"),
        Map("waterway" -> "ditch", "name" -> "N5"),
        Map("waterway" -> "path", "name" -> "N5"),
        Map("waterway" -> "yes"),
        Map("admin_level" -> "2"),
        Map("name" -> "maritime")))
  }
}
