package graft.mapping

/** Tag prefilter (P1; reference mapping/filter.go). Applied at ingest so the
  * cached element tables only carry mapped/needed tag keys — at planet scale
  * tags dominate row size, so this is the projection pushdown that matters.
  *
  * Keep a (k,v) iff: k maps (to `__any__` or to exactly v) in any relevant
  * table mapping, or k is an "extra" tag (column keys, include list, `type`
  * when relation_types used, and always `area`) — filter.go:71-89.
  *
  * With `load_all: true` everything is kept except `exclude` keys
  * (glob-capable, filter.go:96-124).
  */
sealed trait TagPrefilter extends Serializable {
  def filter(tags: Map[String, String]): Map[String, String]
}

final case class MappedTagFilter(
    mappings: Map[String, Set[String]], // key -> value set ("__any__" sentinel kept)
    extraTags: Set[String]) extends TagPrefilter {
  def filter(tags: Map[String, String]): Map[String, String] =
    if (tags == null) null
    else tags.filter { case (k, v) =>
      mappings.get(k) match {
        case Some(values) => values.contains("__any__") || values.contains(v) || extraTags.contains(k)
        case None => extraTags.contains(k)
      }
    }
}

final case class ExcludeTagFilter(keys: Set[String], globs: Seq[String]) extends TagPrefilter {
  @transient private lazy val patterns =
    globs.map(g => java.util.regex.Pattern.compile(globToRegex(g)))
  private def globToRegex(g: String): String = {
    val sb = new StringBuilder("^")
    g.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append('.')
      case '[' => sb.append('[')
      case ']' => sb.append(']')
      case c if "\\.^$+{}()|".contains(c) => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    sb.append('$').toString
  }
  def filter(tags: Map[String, String]): Map[String, String] =
    if (tags == null) null
    else tags.filter { case (k, _) =>
      !keys.contains(k) && !patterns.exists(_.matcher(k).matches())
    }
}

object TagPrefilter {
  import TableType._

  def forNodes(conf: MappingConf): TagPrefilter =
    if (conf.tags.loadAll) exclude(conf)
    else MappedTagFilter(mappedKVs(conf, Point), extras(conf, Point, RelationMember))

  def forWays(conf: MappingConf): TagPrefilter =
    if (conf.tags.loadAll) exclude(conf)
    else MappedTagFilter(
      mappedKVs(conf, LineString, Polygon),
      extras(conf, LineString, Polygon, RelationMember))

  def forRelations(conf: MappingConf): TagPrefilter =
    if (conf.tags.loadAll) exclude(conf)
    else MappedTagFilter(
      // keep type tag values for common relations (filter.go:46-51)
      merge(Map("type" -> Set("multipolygon", "boundary", "land_area")),
            mappedKVs(conf, LineString, Polygon, Relation, RelationMember)),
      extras(conf, LineString, Polygon, Relation, RelationMember))

  private def exclude(conf: MappingConf): ExcludeTagFilter = {
    val (globs, plain) = conf.tags.exclude.partition(k => k.exists("?*[".contains(_)))
    ExcludeTagFilter(plain.toSet, globs)
  }

  /** Flatten table mappings of the given types (+ geometry tables with all
    * their type_mappings) into key -> value-set. */
  private def mappedKVs(conf: MappingConf, tpes: String*): Map[String, Set[String]] = {
    val acc = scala.collection.mutable.Map.empty[String, Set[String]]
    def add(kvs: Vector[(String, Vector[OrderedValue])]): Unit =
      kvs.foreach { case (k, vals) =>
        acc(k) = acc.getOrElse(k, Set.empty) ++ vals.map(_.value)
      }
    conf.tables.values.foreach { t =>
      val relevant = t.tableType == Geometry || tpes.contains(t.tableType)
      if (relevant) {
        add(t.mapping)
        t.subMappings.values.foreach(add)
        tpes.foreach {
          case Point => add(t.typeMappings.points)
          case LineString => add(t.typeMappings.linestrings)
          case Polygon => add(t.typeMappings.polygons)
          case _ => ()
        }
      }
    }
    acc.toMap
  }

  /** mapping.go:240-273 */
  private def extras(conf: MappingConf, tpes: String*): Set[String] = {
    val acc = scala.collection.mutable.Set.empty[String]
    conf.tables.values.foreach { t =>
      if (t.tableType == Geometry || tpes.contains(t.tableType)) {
        t.columns.foreach { c =>
          if (c.key.nonEmpty) acc += c.key
          acc ++= c.keys
        }
        if ((tpes.contains(Polygon) || tpes.contains(Relation) || tpes.contains(RelationMember))
            && t.relationTypes.isDefined) acc += "type"
      }
    }
    acc ++= conf.tags.include
    acc += "area"
    acc.toSet
  }

  private def merge(a: Map[String, Set[String]], b: Map[String, Set[String]]): Map[String, Set[String]] =
    (a.keySet ++ b.keySet).map(k => k -> (a.getOrElse(k, Set.empty) ++ b.getOrElse(k, Set.empty))).toMap
}
