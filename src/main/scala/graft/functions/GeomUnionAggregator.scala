package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.geometry.Geom

/** Geometry union aggregate (SURVEY.md §2 A3; reference geom/geos/ops.go:53-103
  * UnionPolygons) — the `ST_Union_Aggr` analog as a typed Aggregator over
  * WKB.
  *
  * Spark's partial aggregation gives the tree-shaped union the reference
  * gets from GEOS UnaryUnion: map-side partials union within partitions,
  * merge unions across, so no executor ever materializes the whole group's
  * geometry list.
  */
final class GeomUnionAggregator(srid: Int = 3857)
    extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {

  // empty array = "no geometry yet": typed-Aggregator buffers must not be
  // null (the encoder round-trips the zero through unsafe rows)
  override def zero: Array[Byte] = Array.emptyByteArray

  private def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a == null || a.isEmpty) return b
    if (b == null || b.isEmpty) return a
    val ga = Geom.fromWkb(a)
    val gb = Geom.fromWkb(b)
    Geom.toWkb(ga.union(gb), srid)
  }

  override def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] = union(buf, in)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = union(a, b)
  override def finish(r: Array[Byte]): Array[Byte] = r

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
