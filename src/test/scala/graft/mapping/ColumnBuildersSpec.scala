package graft.mapping

import scala.collection.immutable.ListMap

import org.apache.spark.sql.functions._
import org.locationtech.jts.io.WKTReader

import graft.SparkSpecBase
import graft.geometry.Geom

/** Ports the reference's column-type unit corpus
  * (mapping/columns_test.go:12-354): bool/integer parsing, zorder,
  * enumerate (by match and by key), wayzorder incl. layer/tunnel/bridge and
  * int32 overflow, area/webmerc_area float32 goldens, suffix-replace and
  * hstore escaping.
  */
class ColumnBuildersSpec extends SparkSpecBase {

  private val table = TableConf("t", TableType.Point, Vector.empty,
    ListMap.empty, TypeMappingsConf(Vector.empty, Vector.empty, Vector.empty),
    Seq.empty, None, None)

  private def colConf(tpe: String, key: String = "",
      args: Map[String, Any] = Map.empty): ColumnConf =
    ColumnConf("out", key, Seq.empty, tpe, args, fromMember = false)

  /** Evaluate one column builder over (tags, matchValue, geomWkb). */
  private def eval(conf: ColumnConf, tags: Map[String, String],
      matchValue: String = "", wkb: Array[Byte] = null): Any = {
    import spark.implicits._
    val df = Seq((1L, tags, matchValue, "k")).toDF("__id", "tags", "__value", "__key")
      .withColumn("__geom",
        if (wkb == null) lit(null).cast("binary")
        else lit(wkb))
    val row = df.select(ColumnBuilders.build(table, conf, forMember = false)).collect()(0)
    if (row.isNullAt(0)) null else row.get(0)
  }

  test("bool: falsy literals, everything else true (columns_test.go:12)") {
    val c = colConf("bool", key = "k")
    for (v <- Seq("", "false", "no", "0"))
      assert(eval(c, Map("k" -> v)) == false, s"'$v'")
    assert(eval(c, Map.empty) == false) // missing tag reads as ""
    for (v <- Seq("yes", "1", "true", "other"))
      assert(eval(c, Map("k" -> v)) == true, s"'$v'")
  }

  test("integer: strict int32 parse, overflow -> null (columns_test.go:44)") {
    val c = colConf("integer", key = "k")
    assert(eval(c, Map("k" -> "")) == null)
    assert(eval(c, Map("k" -> "bar")) == null)
    assert(eval(c, Map("k" -> "1e6")) == null)
    assert(eval(c, Map("k" -> "0")) == 0)
    assert(eval(c, Map("k" -> "123456")) == 123456)
    assert(eval(c, Map("k" -> "-123456")) == -123456)
    assert(eval(c, Map("k" -> "1000000000000000000")) == null)
    assert(eval(c, Map("k" -> "19082139812039812093908123")) == null)
  }

  test("zorder: rank = len-index from keyed tag (columns_test.go:74)") {
    val c = colConf("zorder",
      args = Map("key" -> "fips", "ranks" -> Seq("AA", "CC", "FF", "ZZ")))
    assert(eval(c, Map.empty) == 0)
    assert(eval(c, Map("fips" -> "ABCD")) == 0)
    assert(eval(c, Map("fips" -> "AA")) == 4)
    assert(eval(c, Map("fips" -> "CC")) == 3)
    assert(eval(c, Map("fips" -> "ZZ")) == 1)
  }

  test("enumerate by matched mapping value (columns_test.go:113)") {
    val c = colConf("enumerate", args = Map("values" -> Seq("AA", "CC", "FF", "ZZ")))
    assert(eval(c, Map.empty, matchValue = "") == 0)
    assert(eval(c, Map.empty, matchValue = "ABCD") == 0)
    assert(eval(c, Map.empty, matchValue = "AA") == 1)
    assert(eval(c, Map.empty, matchValue = "CC") == 2)
    assert(eval(c, Map.empty, matchValue = "ZZ") == 4)
  }

  test("enumerate by key (columns_test.go:148)") {
    val c = colConf("enumerate", key = "fips",
      args = Map("values" -> Seq("AA", "CC", "FF", "ZZ")))
    assert(eval(c, Map.empty) == 0)
    assert(eval(c, Map("fips" -> "ABCD")) == 0)
    assert(eval(c, Map("fips" -> "AA")) == 1)
    assert(eval(c, Map("fips" -> "CC")) == 2)
    assert(eval(c, Map("fips" -> "ZZ")) == 4)
  }

  test("wayzorder: configured ranks, layer/tunnel/bridge, overflow (columns_test.go:184)") {
    val c = colConf("wayzorder", args = Map(
      "default" -> 5.0,
      "ranks" -> Seq("path", "footway", "pedestrian", "residential", "light_rail",
        "primary", "tram", "rail", "trunk", "motorway_link", "motorway")))
    val cases = Seq(
      ("unknown", Map.empty[String, String], 5),
      ("path", Map.empty[String, String], 1),
      ("residential", Map.empty[String, String], 4),
      ("motorway", Map.empty[String, String], 11),
      ("path", Map("bridge" -> "yes"), 12),
      ("path", Map("layer" -> "1"), 12),
      ("path", Map("tunnel" -> "yes"), -10),
      ("unknown", Map("tunnel" -> "yes"), -6),
      ("unknown", Map("tunnel" -> "yes", "layer" -> "1"), 5))
    for ((mv, tags, expected) <- cases)
      assert(eval(c, tags, matchValue = mv) == expected, s"$mv $tags")
    assert(eval(c, Map("tunnel" -> "yes", "layer" -> "123456789123456789"),
      matchValue = "unknown") == null)
  }

  test("area and webmerc_area float32 goldens (columns_test.go:244)") {
    val reader = new WKTReader()
    def wkbOf(wkt: String) = Geom.toWkb(reader.read(wkt), 3857)
    val area = colConf("area")
    val webmerc = colConf("webmerc_area")
    val cases = Seq(
      ("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))", 100.0f, area),
      ("POLYGON((-10 0, 10 0, 10 10, -10 10, -10 0))", 200.0f, area),
      ("POLYGON((-10 -10, 10 -10, 10 10, -10 10, -10 -10))", 400.0f, webmerc),
      ("POLYGON((1000000  2000000, 1001000  2000000, 1001000  2001000, 1000000  2001000, 1000000  2000000))", 1000000.0f, area),
      ("POLYGON((1000000  2000000, 1001000  2000000, 1001000  2001000, 1000000  2001000, 1000000  2000000))", 907733.750000f, webmerc),
      ("POLYGON((1000000  5000000, 1001000  5000000, 1001000  5001000, 1000000  5001000, 1000000  5000000))", 570974.687500f, webmerc),
      ("POLYGON((1000000 10000000, 1001000 10000000, 1001000 10001000, 1000000 10001000, 1000000 10000000))", 159667.406250f, webmerc),
      ("POLYGON((1284931 6129149,1284931 6129153,1284931 6129174,1285008 6129171,1285008 6129155,1285008 6129146,1284931 6129149))", 1925.000000f, area),
      ("POLYGON((1284931 6129149,1284931 6129153,1284931 6129174,1285008 6129171,1285008 6129155,1285008 6129146,1284931 6129149))", 857.418396f, webmerc),
      ("POLYGON ((1212900 2099809, 1212900 2099916, 1212794 2099916, 1212794 2099809, 1212900 2099809))", 10196.298828f, webmerc),
      ("POLYGON ((1227489 3193498, 1227489 3193613, 1227374 3193613, 1227374 3193498, 1227489 3193498))", 10394.006836f, webmerc),
      ("POLYGON ((1250827 4379962, 1250827 4380090, 1250700 4380090, 1250700 4379962, 1250827 4379962))", 10484.050781f, webmerc),
      ("POLYGON ((1287373 5712461, 1287373 5712609, 1287226 5712609, 1287226 5712461, 1287373 5712461))", 10659.601562f, webmerc),
      ("POLYGON ((1346379 7276530, 1346379 7276709, 1346199 7276709, 1346199 7276530, 1346379 7276530))", 10834.080078f, webmerc),
      ("POLYGON ((1449880 9229305, 1449880 9229543, 1449643 9229543, 1449643 9229305, 1449880 9229305))", 11212.663086f, webmerc),
      ("POLYGON ((1665035 11920408, 1665035 11920770, 1664673 11920770, 1664673 11920408, 1665035 11920408))", 11903.427734f, webmerc))
    for ((wkt, expected, conf) <- cases)
      assert(eval(conf, Map.empty, wkb = wkbOf(wkt)) == expected, wkt)
  }

  test("string_suffixreplace (columns_test.go:287)") {
    val c = colConf("string_suffixreplace", key = "name",
      args = Map("suffixes" -> Map("Straße" -> "Str.", "straße" -> "str.")))
    assert(eval(c, Map("name" -> "Hauptstraße")) == "Hauptstr.")
    assert(eval(c, Map("name" -> "")) == "")
    assert(eval(c, Map("name" -> "Foostraßeee")) == "Foostraßeee")
  }

  test("hstore escaping and include list (columns_test.go:308)") {
    val all = colConf("hstore_tags")
    val include = colConf("hstore_tags", args = Map("include" -> Seq("key1", "key2")))
    assert(eval(all, Map.empty) == "")
    assert(eval(all, Map("key" -> "value")) == """"key"=>"value"""")
    assert(eval(all, Map("\"key\"" -> "'\"value\"'")) == """"\"key\""=>"'\"value\"'"""")
    assert(eval(all, Map("\\" -> "\\\\\\\\")) == """"\\"=>"\\\\\\\\"""")
    assert(eval(all, Map("Ümlåütê=>" -> "")) == "\"Ümlåütê=>\"=>\"\"")
    assert(eval(include, Map("key" -> "value")) == "")
    assert(eval(include, Map("key1" -> "value")) == """"key1"=>"value"""")
    assert(eval(include, Map("key" -> "value", "key2" -> "value")) == """"key2"=>"value"""")
    assert(eval(all, Map("key1" -> "value", "key2" -> "value")) ==
      """"key1"=>"value", "key2"=>"value"""")
  }
}
