package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions.{count, lit}
import org.apache.spark.sql.util.QueryExecutionListener

import graft.sources.OsmXml.Bundle

/** A5 — import statistics (reference stats/stats.go:10-148): per-kind
  * element counters with elements/s rates, surfaced the Spark way.
  *
  * The reference threads a `Statistics` actor through every reader/writer
  * goroutine and ticks a console line. Here counting rides the query
  * itself: [[instrument]] wraps each bundle frame with `Dataset.observe`
  * (a codegen'd CollectMetrics node — zero extra jobs, no accumulator
  * races), and this listener collects the observed totals as actions
  * complete. Counts are *totals per kind* (observation values are absolute
  * counts of rows flowing through the node), so re-executions of a cached
  * frame update rather than double-add — matching the reference's
  * monotonic per-kind counters.
  */
final class ImportStats extends QueryExecutionListener {

  private val startNs = System.nanoTime()
  private val counts = new ConcurrentHashMap[String, Long]()

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    qe.observedMetrics.foreach { case (name, row) =>
      if (name.startsWith(ImportStats.Prefix)) {
        val kind = name.substring(ImportStats.Prefix.length)
        val n = row.getLong(0)
        counts.merge(kind, n, (a: Long, b: Long) => math.max(a, b))
      }
    }

  override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()

  /** Totals seen so far, by kind (coords/nodes/ways/relations). */
  def current: Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    counts.forEach((k, v) => b += k -> v)
    b.result()
  }

  def elapsedSec: Double = (System.nanoTime() - startNs) / 1e9

  /** One reference-style progress line: `[0:23] C: 7,600k (330k/s) ...`
    * (stats/stats.go:116-148 formats the same four counters + rates). */
  def report(): String = {
    val c = current
    val dt = math.max(elapsedSec, 1e-9)
    def cell(label: String, kind: String): String = {
      val n = c.getOrElse(kind, 0L)
      f"$label: ${n / 1000.0}%.0fk (${n / dt / 1000.0}%.1fk/s)"
    }
    val mins = (elapsedSec / 60).toInt
    val secs = (elapsedSec % 60).toInt
    f"[$mins%d:$secs%02d] ${cell("C", "coords")} ${cell("N", "nodes")} " +
      f"${cell("W", "ways")} ${cell("R", "relations")}"
  }
}

object ImportStats {

  private[operators] val Prefix = "graft.stats."

  /** Register a fresh listener on the session. */
  def attach(spark: SparkSession): ImportStats = {
    val s = new ImportStats
    spark.listenerManager.register(s)
    s
  }

  def detach(spark: SparkSession, stats: ImportStats): Unit =
    spark.listenerManager.unregister(stats)

  /** Wrap each bundle frame with an observe node so every action over it
    * reports the per-kind element total to attached listeners. */
  def instrument(bundle: Bundle): Bundle =
    Bundle(
      coords = bundle.coords.observe(Prefix + "coords", count(lit(1))),
      nodes = bundle.nodes.observe(Prefix + "nodes", count(lit(1))),
      ways = bundle.ways.observe(Prefix + "ways", count(lit(1))),
      relations = bundle.relations.observe(Prefix + "relations", count(lit(1))))
}
