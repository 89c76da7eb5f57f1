package graft.model

/** OSM element model (reference: vendor/github.com/omniscale/go-osm/element.go:9-87).
  *
  * Three entity kinds share one raw-row shape so a single parse pass yields
  * one Dataset that is then split into coords/nodes/ways/relations frames
  * (SURVEY.md §1.1). Untagged nodes are "coords": geometry carriers only.
  */
object Kind {
  val Node: Byte = 0
  val Way: Byte = 1
  val Relation: Byte = 2
}

/** Change operation for .osc diff rows (go-osm/diff.go:4-17). */
object Op {
  val Create: Byte = 0
  val Modify: Byte = 1
  val Delete: Byte = 2
}

final case class RawMember(id: Long, mtype: Byte, role: String)

/** Element metadata (go-osm element.go:23-29), parsed only when the
  * source's `includeMetadata` flag is set — the reference's
  * `IncludeMetadata` analog (parser/pbf/parser.go:17). `timestamp` is
  * epoch milliseconds. */
final case class ElemMeta(
    version: Int,
    timestamp: Long,
    changeset: Long,
    uid: Int,
    user: String)

/** One parsed OSM element; unused fields are null/empty per kind. */
final case class RawElement(
    kind: Byte,
    id: Long,
    lon: Option[Double],
    lat: Option[Double],
    tags: Map[String, String],
    refs: Seq[Long],
    members: Seq[RawMember],
    op: Byte,
    meta: Option[ElemMeta] = None)

object Ids {
  /** RelIDOffset (reference element/element.go:36-48): single-table imports
    * need one ID space — ways are negated, relations offset below -1e17.
    */
  val RelIDOffset: Long = -100000000000000000L // -1e17

  def wayId(id: Long, singleIdSpace: Boolean): Long =
    if (singleIdSpace) -id else id

  def relId(id: Long, singleIdSpace: Boolean): Long =
    if (singleIdSpace) RelIDOffset - id else -id
}
