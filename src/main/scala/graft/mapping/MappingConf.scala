package graft.mapping

import java.{util => ju}
import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

/** Parsed mapping-file model (reference mapping/config/config.go:9-118).
  *
  * Mapping files are YAML or JSON (the reference parses both with a YAML
  * parser; JSON fixtures contain trailing commas, so we strip those outside
  * strings before handing to snakeyaml). Insertion order of `mapping` values
  * is significant: it is the matcher's tie-break (`OrderedValue`,
  * config.go:71-108).
  */
final case class OrderedValue(value: String, order: Int)

object TableType {
  val Point = "point"
  val LineString = "linestring"
  val Polygon = "polygon"
  val Geometry = "geometry"
  val Relation = "relation"
  val RelationMember = "relation_member"
  val all = Set(Point, LineString, Polygon, Geometry, Relation, RelationMember)
}

final case class ColumnConf(
    name: String,
    key: String,
    keys: Seq[String],
    colType: String,
    args: Map[String, Any],
    fromMember: Boolean)

final case class FiltersConf(
    require: Vector[(String, Vector[OrderedValue])],
    reject: Vector[(String, Vector[OrderedValue])],
    requireRegexp: Vector[(String, String)],
    rejectRegexp: Vector[(String, String)])

final case class TypeMappingsConf(
    points: Vector[(String, Vector[OrderedValue])],
    linestrings: Vector[(String, Vector[OrderedValue])],
    polygons: Vector[(String, Vector[OrderedValue])])

final case class TableConf(
    name: String,
    tableType: String,
    mapping: Vector[(String, Vector[OrderedValue])],
    subMappings: ListMap[String, Vector[(String, Vector[OrderedValue])]],
    typeMappings: TypeMappingsConf,
    columns: Seq[ColumnConf],
    filters: Option[FiltersConf],
    relationTypes: Option[Seq[String]])

final case class GenTableConf(name: String, source: String, sqlFilter: Option[String], tolerance: Double)

final case class TagsConf(loadAll: Boolean, include: Seq[String], exclude: Seq[String])

final case class AreasConf(areaTags: Set[String], linearTags: Set[String])

final case class MappingConf(
    tables: ListMap[String, TableConf],
    generalizedTables: ListMap[String, GenTableConf],
    tags: TagsConf,
    areas: AreasConf,
    singleIdSpace: Boolean)

object MappingConf {

  def fromFile(path: String): MappingConf =
    fromString(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  def fromString(text: String): MappingConf = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = yaml.load[ju.Map[String, Any]](stripTrailingCommas(text))
    parse(Option(root).getOrElse(new ju.LinkedHashMap[String, Any]()))
  }

  /** Remove trailing commas before `}`/`]` outside of quoted strings —
    * the reference's YAML parser tolerates the JSON fixtures' trailing
    * commas (test/complete_db_mapping.json:11), snakeyaml does not.
    */
  private[mapping] def stripTrailingCommas(s: String): String = {
    val out = new StringBuilder(s.length)
    var inStr = false
    var quote = ' '
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        out.append(c)
        if (c == '\\' && i + 1 < s.length) { out.append(s.charAt(i + 1)); i += 1 }
        else if (c == quote) inStr = false
      } else if (c == '"' || c == '\'') {
        inStr = true; quote = c; out.append(c)
      } else if (c == ',') {
        var j = i + 1
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        if (j < s.length && (s.charAt(j) == '}' || s.charAt(j) == ']')) () // drop comma
        else out.append(c)
      } else out.append(c)
      i += 1
    }
    out.toString
  }

  // ---- untyped-tree helpers -------------------------------------------------

  private def asMap(v: Any): ju.Map[String, Any] = v match {
    case null => new ju.LinkedHashMap[String, Any]()
    case m: ju.Map[_, _] => m.asInstanceOf[ju.Map[String, Any]]
    case other => throw new IllegalArgumentException(s"expected mapping, got $other")
  }

  private def asList(v: Any): Seq[Any] = v match {
    case null => Nil
    case l: ju.List[_] => l.asScala.toSeq
    case other => throw new IllegalArgumentException(s"expected list, got $other")
  }

  private def str(v: Any): String = if (v == null) "" else v.toString

  private def strSeq(v: Any): Seq[String] = asList(v).map(str)

  /** `mapping:` block -> ordered (key -> values); the order counter runs
    * across all values of the block in document order (config.go:88-106).
    */
  private def keyValues(v: Any): Vector[(String, Vector[OrderedValue])] = {
    var order = 0
    asMap(v).asScala.toVector.map { case (k, vals) =>
      k -> asList(vals).toVector.map { value =>
        val ov = OrderedValue(str(value), order)
        order += 1
        ov
      }
    }
  }

  private def kvPairs(v: Any): Vector[(String, String)] =
    asMap(v).asScala.toVector.map { case (k, rv) => k -> str(rv) }

  // ---- section parsers ------------------------------------------------------

  private def parseColumn(v: Any): ColumnConf = {
    val m = asMap(v).asScala
    ColumnConf(
      name = str(m.getOrElse("name", "")),
      key = str(m.getOrElse("key", null) match { case null => ""; case x => x }),
      keys = m.get("keys").map(strSeq).getOrElse(Nil),
      colType = str(m.getOrElse("type", "")),
      args = m.get("args").map(a => asMap(a).asScala.toMap).getOrElse(Map.empty),
      fromMember = m.get("from_member").exists {
        case b: java.lang.Boolean => b.booleanValue()
        case s => s.toString == "true"
      })
  }

  private def parseFilters(v: Any): FiltersConf = {
    val m = asMap(v).asScala
    // deprecated exclude_tags -> reject (mapping/mapping.go:369-383)
    val excludeAsReject: Vector[(String, Vector[OrderedValue])] =
      m.get("exclude_tags").map { et =>
        asList(et).toVector.map { pair =>
          val kv = strSeq(pair)
          kv.head -> Vector(OrderedValue(kv(1), 1))
        }
      }.getOrElse(Vector.empty)
    FiltersConf(
      require = m.get("require").map(keyValues).getOrElse(Vector.empty),
      reject = m.get("reject").map(keyValues).getOrElse(Vector.empty) ++ excludeAsReject,
      requireRegexp = m.get("require_regexp").map(kvPairs).getOrElse(Vector.empty),
      rejectRegexp = m.get("reject_regexp").map(kvPairs).getOrElse(Vector.empty))
  }

  private def parseTable(name: String, v: Any): TableConf = {
    val m = asMap(v).asScala
    val tpe = str(m.getOrElse("type", ""))
    require(tpe.nonEmpty, s"missing type for table $name")
    require(TableType.all.contains(tpe), s"unknown type $tpe for table $name")
    val tm = m.get("type_mappings").map(asMap).map(_.asScala).getOrElse(scala.collection.mutable.Map.empty[String, Any])
    if (tpe == TableType.Geometry)
      require(!m.contains("mapping") && !m.contains("mappings"),
        s"table with type:geometry requires type_mappings for table $name")
    TableConf(
      name = name,
      tableType = tpe,
      mapping = m.get("mapping").map(keyValues).getOrElse(Vector.empty),
      subMappings = m.get("mappings").map { sm =>
        ListMap.from(asMap(sm).asScala.toVector.map { case (sn, sv) =>
          sn -> keyValues(asMap(sv).asScala.getOrElse("mapping", null))
        })
      }.getOrElse(ListMap.empty),
      typeMappings = TypeMappingsConf(
        points = tm.get("points").map(keyValues).getOrElse(Vector.empty),
        linestrings = tm.get("linestrings").map(keyValues).getOrElse(Vector.empty),
        polygons = tm.get("polygons").map(keyValues).getOrElse(Vector.empty)),
      columns = {
        // deprecated 'fields' is the old name for 'columns' (mapping.go:123-125)
        val cols = m.get("columns").orElse(m.get("fields"))
        cols.map(c => asList(c).map(parseColumn)).getOrElse(Nil)
      },
      filters = m.get("filters").map(parseFilters),
      relationTypes = m.get("relation_types").map(strSeq))
  }

  private def parse(root: ju.Map[String, Any]): MappingConf = {
    val m = root.asScala
    val tables = ListMap.from(
      m.get("tables").map(asMap).map(_.asScala.toVector).getOrElse(Vector.empty)
        .map { case (name, tv) => name -> parseTable(name, tv) })
    val genTables = ListMap.from(
      m.get("generalized_tables").map(asMap).map(_.asScala.toVector).getOrElse(Vector.empty)
        .map { case (name, gv) =>
          val gm = asMap(gv).asScala
          name -> GenTableConf(
            name = name,
            source = str(gm.getOrElse("source", "")),
            sqlFilter = gm.get("sql_filter").flatMap(Option(_)).map(str).filter(_.nonEmpty),
            tolerance = gm.get("tolerance").map(_.toString.toDouble).getOrElse(0.0))
        })
    val tagsM = m.get("tags").map(asMap).map(_.asScala).getOrElse(scala.collection.mutable.Map.empty[String, Any])
    val areasM = m.get("areas").map(asMap).map(_.asScala).getOrElse(scala.collection.mutable.Map.empty[String, Any])
    MappingConf(
      tables = tables,
      generalizedTables = genTables,
      tags = TagsConf(
        loadAll = tagsM.get("load_all").exists(b => b.toString == "true"),
        include = tagsM.get("include").map(strSeq).getOrElse(Nil),
        exclude = tagsM.get("exclude").map(strSeq).getOrElse(Nil)),
      areas = AreasConf(
        areaTags = areasM.get("area_tags").map(strSeq).getOrElse(Nil).toSet,
        linearTags = areasM.get("linear_tags").map(strSeq).getOrElse(Nil).toSet),
      singleIdSpace = m.get("use_single_id_space").exists(b => b.toString == "true"))
  }
}
