package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.util.zip.GZIPInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{ElemMeta, Kind, Op, RawElement, RawMember}

/** OSM XML (.osm) and OSC change-file (.osc/.osc.gz) sources.
  *
  * The reference ingests PBF for imports (parser/pbf) and gzip XML for
  * diffs (update/process.go:33-46); its test corpus is .osm XML. We parse
  * XML with StAX inside a flatMap over `binaryFile` rows — one file is one
  * task, which is the right granularity for change files (one micro-batch
  * per .osc) and for fixtures. Planet-scale batch ingest uses the PBF
  * source instead.
  */
object OsmXml {

  /** The four element frames of SURVEY.md §1.1. `coords` carries EVERY
    * node (geometry carriers); `nodes` only those with tags remaining.
    * Tag prefilters are applied later (Pipeline) so this source stays
    * mapping-agnostic.
    */
  final case class Bundle(
      coords: DataFrame, // id, lon, lat
      nodes: DataFrame, // id, lon, lat, tags
      ways: DataFrame, // id, refs, tags
      relations: DataFrame) // id, members(id,type,role), tags

  def readElements(spark: SparkSession, path: String,
      includeMetadata: Boolean = false): Dataset[RawElement] = {
    import spark.implicits._
    val withMeta = includeMetadata
    spark.read.format("binaryFile").load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, content) => parseBytes(p, content, withMeta) }
  }

  def read(spark: SparkSession, path: String,
      filters: Option[TagFilters] = None,
      storage: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): Bundle = {
    import spark.implicits._
    val raw = readElements(spark, path)
    val filtered = filters match {
      case Some(f) => raw.map { e =>
        if (e.tags.isEmpty) e
        else e.kind match {
          case Kind.Node => e.copy(tags = f.nodes.filter(e.tags))
          case Kind.Way => e.copy(tags = f.ways.filter(e.tags))
          case _ => e.copy(tags = f.relations.filter(e.tags))
        }
      }
      case None => raw
    }
    bundleOf(filtered.toDF().persist(storage))
  }

  def bundleOf(elems: DataFrame): Bundle = {
    val nodes = elems.filter(col("kind") === Kind.Node)
    Bundle(
      coords = nodes.select(col("id"), col("lon"), col("lat")),
      nodes = nodes.filter(size(col("tags")) > 0)
        .select(col("id"), col("lon"), col("lat"), col("tags")),
      ways = elems.filter(col("kind") === Kind.Way)
        .select(col("id"), col("refs"), col("tags")),
      relations = elems.filter(col("kind") === Kind.Relation)
        .select(col("id"),
          expr("transform(members, m -> struct(m.id as id, m.mtype as type, m.role as role))").as("members"),
          col("tags")))
  }

  /** .osc (optionally gzipped): each element row carries its op. */
  def readDiff(spark: SparkSession, path: String): Dataset[RawElement] =
    readElements(spark, path)

  // ---- StAX parsing ---------------------------------------------------------

  private[sources] def parseBytes(path: String, content: Array[Byte],
      withMeta: Boolean = false): Iterator[RawElement] = {
    val raw: InputStream = new ByteArrayInputStream(content)
    val in = if (path.endsWith(".gz")) new GZIPInputStream(raw) else raw
    parseStream(in, withMeta)
  }

  private[sources] def parseStream(in: InputStream,
      withMeta: Boolean = false): Iterator[RawElement] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_NAMESPACE_AWARE, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty("javax.xml.stream.isSupportingExternalEntities", false)
    val r = f.createXMLStreamReader(in)

    val out = Vector.newBuilder[RawElement]
    var op: Byte = Op.Create

    var kind: Byte = -1
    var id = 0L
    var lon: Option[Double] = None
    var lat: Option[Double] = None
    var tags = Map.newBuilder[String, String]
    var refs = Vector.newBuilder[Long]
    var members = Vector.newBuilder[RawMember]
    var meta: Option[ElemMeta] = None

    def attr(name: String): String = {
      var i = 0
      while (i < r.getAttributeCount) {
        if (r.getAttributeLocalName(i) == name) return r.getAttributeValue(i)
        i += 1
      }
      null
    }

    def startElem(k: Byte): Unit = {
      kind = k
      id = attr("id").toLong
      lon = Option(attr("lon")).map(_.toDouble)
      lat = Option(attr("lat")).map(_.toDouble)
      tags = Map.newBuilder
      refs = Vector.newBuilder
      members = Vector.newBuilder
      meta =
        if (!withMeta) None
        else Some(ElemMeta(
          version = Option(attr("version")).map(_.toInt).getOrElse(0),
          timestamp = Option(attr("timestamp"))
            .map(java.time.Instant.parse(_).toEpochMilli).getOrElse(0L),
          changeset = Option(attr("changeset")).map(_.toLong).getOrElse(0L),
          uid = Option(attr("uid")).map(_.toInt).getOrElse(0),
          user = Option(attr("user")).getOrElse("")))
    }

    def endElem(): Unit = {
      out += RawElement(kind, id, lon, lat, tags.result(), refs.result(),
        members.result(), op, meta)
      kind = -1
    }

    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "create" => op = Op.Create
            case "modify" => op = Op.Modify
            case "delete" => op = Op.Delete
            case "node" => startElem(Kind.Node)
            case "way" => startElem(Kind.Way)
            case "relation" => startElem(Kind.Relation)
            case "tag" if kind >= 0 => tags += (attr("k") -> attr("v"))
            case "nd" if kind == Kind.Way => refs += attr("ref").toLong
            case "member" if kind == Kind.Relation =>
              val mtype: Byte = attr("type") match {
                case "node" => 0
                case "way" => 1
                case "relation" => 2
                case other => throw new IllegalArgumentException(s"member type $other")
              }
              members += RawMember(attr("ref").toLong, mtype, Option(attr("role")).getOrElse(""))
            case _ => ()
          }
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "node" | "way" | "relation" => endElem()
            case "create" | "modify" | "delete" => op = Op.Create
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    out.result().iterator
  }
}
