package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GeomFunctions
import graft.geometry.Geom
import graft.mapping.{CompiledMapping, GenTableConf, TableType}

/** Generalized-table DAG (SURVEY.md §2 A6; reference postgis.go:236-362).
  *
  * The reference pushes `CREATE TABLE gen AS SELECT
  * ST_SimplifyPreserveTopology(geometry, tol) … WHERE sql_filter` into
  * PostGIS, chaining gen-of-gen with dependency ordering. Here the same
  * computation stays in the engine: each generalized table is a lazy frame
  * over its source (base table or another gen table), with the simplify as
  * a JTS UDF and the sql_filter evaluated by Catalyst — `ST_Area` is
  * registered as a session UDF so the reference's filter strings run
  * unmodified.
  *
  * Scale: simplification is embarrassingly parallel (per-row UDF); the
  * only cross-row work is the source scan, which Catalyst prunes with the
  * pushed-down sql_filter.
  */
object Generalize {

  /** Register the PostGIS-compatible helpers referenced by sql_filter. */
  def registerUdfs(spark: SparkSession): Unit = {
    spark.udf.register("ST_Area",
      (wkb: Array[Byte]) => Geom.area(wkb).map(_.toDouble).getOrElse(0.0))
  }

  /** Compute every generalized table, in dependency (topological) order.
    * Polygon-rooted tables get `validated_geometry` semantics — makeValid
    * after simplify (mapping/columns.go:46-63, spec.go:201-230).
    */
  def apply(spark: SparkSession, mapping: CompiledMapping,
      base: Map[String, DataFrame]): Map[String, DataFrame] = {
    registerUdfs(spark)
    val gens = mapping.conf.generalizedTables
    val done = scala.collection.mutable.Map[String, DataFrame]() ++= base
    val out = scala.collection.mutable.LinkedHashMap[String, DataFrame]()
    var remaining = gens.toVector
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition(g => done.contains(g._2.source))
      require(ready.nonEmpty,
        s"generalized-table cycle or missing source: ${blocked.map(_._1)}")
      for ((name, g) <- ready) {
        val df = generalizeOne(spark, mapping, g, done(g.source))
        done(name) = df
        out(name) = df
      }
      remaining = blocked
    }
    out.toMap
  }

  private def generalizeOne(spark: SparkSession, mapping: CompiledMapping,
      g: GenTableConf, source: DataFrame): DataFrame = {
    val filtered = g.sqlFilter.map(source.where).getOrElse(source)
    filtered.withColumn("geometry",
      GeomFunctions.simplifyWkb(g.tolerance, validate = rootIsPolygon(mapping, g))(
        col("geometry")))
  }

  /** Walk gen-of-gen chains back to the base table to decide validation. */
  private def rootIsPolygon(mapping: CompiledMapping, g: GenTableConf): Boolean = {
    var src = g.source
    while (mapping.conf.generalizedTables.contains(src))
      src = mapping.conf.generalizedTables(src).source
    mapping.conf.tables.get(src)
      .exists(t => t.tableType == TableType.Polygon || t.tableType == TableType.Geometry)
  }
}
