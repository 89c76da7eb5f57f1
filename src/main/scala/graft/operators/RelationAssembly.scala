package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.geometry.Geom
import graft.geometry.Geom.{Pt, WayGeom}

/** A1/A2 — ring assembly + multipolygon build per relation
  * (geom/ring.go:66-140, geom/multipolygon.go:55-222).
  *
  * Inherently per-group sequential chaining -> `groupByKey.mapGroups` with
  * the pure-Scala/JTS ring algorithm in [[Geom.buildMultiPolygon]].
  * Relations are ~1% of elements; the expensive part (coord resolution)
  * happened in [[WayAssembly]]. Skew (20k-member monsters) is bounded by
  * one group per relation; AQE handles partition imbalance.
  */
object RelationAssembly {

  /** One resolved way member row; nodes null => way unresolved. */
  final case class MemberWayRow(
      relId: Long,
      wayId: Long,
      refs: Array[Long],
      xs: Array[Double],
      ys: Array[Double])

  /** @param wayMembers (rel_id, m_id) one row per way-type member
    * @param assembledWays (id, refs, xs, ys) resolved ways
    * @return (rel_id, geometry WKB) — relations whose every way member
    *         resolved AND whose rings form a valid (multi)polygon
    */
  def multiPolygons(
      spark: SparkSession,
      wayMembers: DataFrame,
      assembledWays: DataFrame,
      srid: Int): DataFrame = {
    import spark.implicits._
    // maxGap: 0.1m in mercator units, ~0.1m in degrees (writer/ways.go:37-40)
    val maxGap = if (srid == 4326) 1e-6 else 1e-1

    val rows = wayMembers
      .join(assembledWays, wayMembers("m_id") === assembledWays("id"), "left")
      .select(wayMembers("rel_id").as("relId"), wayMembers("m_id").as("wayId"),
        assembledWays("refs").as("refs"), col("xs"), col("ys"))
      .as[MemberWayRow]

    rows.groupByKey(_.relId)
      .flatMapGroups { (relId, it) =>
        val members = it.toVector
        if (members.exists(_.xs == null)) Iterator.empty // FillWay all-or-nothing
        else {
          val ways = members.map { m =>
            WayGeom(m.wayId, m.refs.toIndexedSeq,
              Array.tabulate(m.xs.length)(i => Pt(m.xs(i), m.ys(i))).toIndexedSeq)
          }
          Geom.buildMultiPolygon(ways, maxGap) match {
            case Some(g) => Iterator.single((relId, Geom.toWkb(g, srid)))
            case None => Iterator.empty
          }
        }
      }
      .toDF("rel_id", "__geom")
  }
}
