package graft.sources

import graft.mapping.{CompiledMapping, TagPrefilter}

/** Per-kind tag prefilters pushed into the source decode tasks (SURVEY.md
  * §2 P1 at parse time; reference applies mapping/filter.go:71-89 inside
  * the reader, reader/reader.go:124).
  *
  * At planet scale tags dominate element row size; filtering inside the
  * decode task means the cached/shuffled element frames never carry
  * unmapped tags. A node whose tags all drop degrades to a coord —
  * exactly the reference's nodes-vs-coords cache split. The pipeline's
  * own tag-filter pass stays (idempotent) so unfiltered sources remain
  * correct.
  */
final case class TagFilters(
    nodes: TagPrefilter,
    ways: TagPrefilter,
    relations: TagPrefilter) extends Serializable

object TagFilters {
  def apply(mapping: CompiledMapping): TagFilters =
    TagFilters(mapping.nodeTagFilter, mapping.wayTagFilter, mapping.relationTagFilter)
}
