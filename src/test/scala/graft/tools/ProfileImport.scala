package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ImportPipeline
import graft.mapping.{CompiledMapping, MappingConf}
import graft.sources.{OsmPbf, OsmPbfSynth, TagFilters}

/** Ad-hoc import-throughput profiler (not part of the library): times each
  * tracked stage frame and each table sink separately on the synth bench
  * input so optimization work targets the measured bottleneck, not a guess.
  *
  * Run: sbt "Test/runMain graft.tools.ProfileImport"
  */
object ProfileImport {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val monaco = "/root/reference/vendor/github.com/omniscale/go-osm/parser/pbf/monaco-20150428.osm.pbf"
    val synthDir = "/root/repo/target/bench-pbf"
    val copies = sys.env.getOrElse("SPARK_GRAFT_PBF_COPIES", "400").toInt
    OsmPbfSynth.synthesize(spark, monaco, synthDir, copies)
    val mapping = new CompiledMapping(
      MappingConf.fromFile("/root/reference/test/complete_db_mapping.json"))

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val bundle = OsmPbf.read(spark, synthDir, Some(TagFilters(mapping)))
    timed("parse (counts)") {
      bundle.coords.count(); bundle.ways.count(); bundle.relations.count()
      bundle.nodes.count()
    }
    val pipeline = new ImportPipeline(spark, mapping)
    val tables = timed("plan (run())")(pipeline.run(bundle))
    pipeline.stageFrames.zipWithIndex.foreach { case (df, i) =>
      timed(s"stage $i (${df.columns.take(5).mkString(",")})")(df.count())
    }
    tables.foreach { case (name, df) =>
      timed(s"sink $name") {
        df.write.format("noop").mode("overwrite").save()
      }
    }
    pipeline.unpersistAll()

    // bench-shaped second pass, warm JVM: plan, wave-parallel stage
    // materialization, then concurrent sinks — the phases Bench times
    spark.catalog.clearCache()
    System.gc()
    bundle.coords.count() // re-materialize the elements cache
    val p2 = new ImportPipeline(spark, mapping)
    val t2 = timed("plan (warm, 2nd run())")(p2.run(bundle))
    timed("materializeStages (waves)")(p2.materializeStages())
    timed("all sinks (8-concurrent)") {
      import java.util.concurrent.Executors
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = Executors.newFixedThreadPool(8)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      Await.result(Future.sequence(t2.values.toSeq.map(df => Future {
        df.write.format("noop").mode("overwrite").save()
      })), Duration.Inf)
      pool.shutdown()
    }
    p2.unpersistAll()
    spark.stop()
  }
}
