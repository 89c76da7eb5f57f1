package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.OsmXml.Bundle

/** `imposm query-cache` analog (SURVEY.md §2 S5; reference
  * cache/query/query.go:53-205): point lookups on the element frames with
  * optional recursive resolution and reverse-dependency expansion. A
  * debugging surface — plain filters and semi-joins on the maintained
  * tables.
  */
object CacheQuery {

  def nodes(b: Bundle, ids: Seq[Long]): DataFrame =
    b.nodes.filter(col("id").isin(ids: _*))

  def coords(b: Bundle, ids: Seq[Long]): DataFrame =
    b.coords.filter(col("id").isin(ids: _*))

  def ways(b: Bundle, ids: Seq[Long], full: Boolean = false): DataFrame = {
    val w = b.ways.filter(col("id").isin(ids: _*))
    if (!full) w
    else {
      // -full: resolve refs to coords (query.go:116-150)
      val exploded = w.select(col("id").as("way_id"), posexplode(col("refs")).as(Seq("pos", "ref")))
      exploded.join(b.coords.withColumnRenamed("id", "ref"), Seq("ref"), "left")
        .groupBy("way_id")
        .agg(sort_array(collect_list(struct(col("pos"), col("ref"), col("lon"), col("lat"))))
          .as("nodes"))
        .join(w.withColumnRenamed("id", "way_id"), Seq("way_id"))
    }
  }

  def relations(b: Bundle, ids: Seq[Long]): DataFrame =
    b.relations.filter(col("id").isin(ids: _*))

  /** -deps: ways referencing the given nodes (reverse index lookup). */
  def waysForNodes(b: Bundle, nodeIds: Seq[Long]): DataFrame =
    b.ways.filter(arrays_overlap(col("refs"),
      array(nodeIds.map(lit(_)): _*)))

  /** -deps: relations referencing the given ways. */
  def relationsForWays(b: Bundle, wayIds: Seq[Long]): DataFrame =
    b.relations.filter(exists(col("members"),
      m => m.getField("type") === 1 &&
        m.getField("id").isin(wayIds: _*)))
}
