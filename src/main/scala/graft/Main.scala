package graft

import org.apache.spark.sql.SparkSession

import graft.mapping.{CompiledMapping, MappingConf}
import graft.operators.{CacheQuery, GeohashSort, Limitto}
import graft.sinks.DeployRotate
import graft.sources.{OsmPbf, OsmXml}
import graft.streaming.{DiffPipeline, Replication, StateStore}

/** CLI entry point — the reference's `imposm COMMAND` dispatch
  * (cmd/imposm/main.go:18-71, config/config.go:181-300) over the Spark
  * engine. Commands:
  *
  *   import      -mapping M -read FILE [-write] [-connection DIR]
  *               [-cachedir DIR] [-srid N] [-limitto GEOJSON] [-optimize]
  *               [-deployproduction] [-revertdeploy] [-removebackup]
  *   diff        -mapping M [-cachedir DIR] [-srid N]
  *               [-expiretiles-dir DIR] FILE.osc.gz ...
  *   run         -mapping M [-cachedir DIR] -replication-url URL
  *               [-workdir DIR] [-from SEQ] [-interval SECONDS] [-once]
  *   query-cache [-cachedir DIR] [-node IDS] [-way IDS] [-rel IDS]
  *               [-full] [-deps]
  *   version
  *
  * The `-connection` of the reference is a PostGIS DSN; here it is the
  * output root holding the import/production/backup schema directories
  * that [[DeployRotate]] rotates. `-cachedir` is the element + output
  * state ([[StateStore]] root), the analog of the reference's LevelDB
  * cache plus diff state.
  */
object Main {

  private def usage(): Nothing = {
    System.err.println(
      """Usage: graft.Main COMMAND [args]
        |
        |Available commands:
        |  import
        |  diff
        |  run
        |  query-cache
        |  version""".stripMargin)
    sys.exit(1)
  }

  /** Minimal `-flag value` / `-flag` parser; anything not starting with
    * '-' is positional (the diff command's change files). */
  private final case class Args(flags: Map[String, String], positional: Seq[String]) {
    def str(name: String): Option[String] = flags.get(name)
    def required(name: String): String = flags.getOrElse(name,
      { System.err.println(s"missing required -$name"); sys.exit(1) })
    def bool(name: String): Boolean = flags.contains(name)
    def long(name: String, default: Long): Long =
      flags.get(name).map(_.toLong).getOrElse(default)
  }

  private val boolFlags = Set("write", "optimize", "deployproduction",
    "revertdeploy", "removebackup", "once", "full", "deps")

  private def parse(args: Seq[String]): Args = {
    var flags = Map.empty[String, String]
    var positional = Vector.empty[String]
    var rest = args.toList
    while (rest.nonEmpty) {
      rest match {
        case f :: tail if f.startsWith("-") =>
          val name = f.dropWhile(_ == '-')
          if (boolFlags(name) || tail.isEmpty || tail.head.startsWith("-")) {
            flags += name -> "true"; rest = tail
          } else { flags += name -> tail.head; rest = tail.tail }
        case p :: tail => positional :+= p; rest = tail
      }
    }
    Args(flags, positional)
  }

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def mappingOf(a: Args): CompiledMapping =
    new CompiledMapping(MappingConf.fromFile(a.required("mapping")))

  private def readBundle(spark: SparkSession, path: String): OsmXml.Bundle =
    if (path.endsWith(".pbf")) OsmPbf.read(spark, path)
    else OsmXml.read(spark, path)

  // -- import ----------------------------------------------------------------

  private def runImport(spark: SparkSession, a: Args): Unit = {
    val doRotate = a.bool("deployproduction") || a.bool("revertdeploy") ||
      a.bool("removebackup")
    // -read + -write: full initial import into the state store
    if (a.str("read").nonEmpty && a.bool("write")) {
      val mapping = mappingOf(a)
      val cachedir = a.required("cachedir")
      val limit = a.str("limitto").map(p =>
        new Limitto(p, srid = a.long("srid", 3857).toInt))
      val tables = DiffPipeline.init(spark, mapping, cachedir,
        readBundle(spark, a.required("read")), a.long("srid", 3857).toInt, limit = limit)
      // export to the connection root's import schema (K1 bulk load into
      // the blue/green layout; optionally K5-clustered)
      a.str("connection").foreach { conn =>
        tables.foreach { case (name, df) =>
          val out = if (a.bool("optimize") && df.columns.contains("geometry"))
            GeohashSort.clustered(df)
          else df
          out.write.mode("overwrite").parquet(s"$conn/import/$name")
        }
      }
    } else if (!doRotate) {
      System.err.println("import: nothing to do (need -read FILE -write, " +
        "or a deploy flag)")
      sys.exit(1)
    }
    if (a.bool("deployproduction"))
      new DeployRotate(spark, a.required("connection")).deploy()
    if (a.bool("revertdeploy"))
      new DeployRotate(spark, a.required("connection")).revert()
    if (a.bool("removebackup"))
      new DeployRotate(spark, a.required("connection")).removeBackup()
  }

  // -- diff ------------------------------------------------------------------

  private def runDiff(spark: SparkSession, a: Args): Unit = {
    val mapping = mappingOf(a)
    val cachedir = a.required("cachedir")
    if (a.positional.isEmpty) {
      System.err.println("diff: no change files given"); sys.exit(1)
    }
    a.positional.sorted.foreach { osc =>
      DiffPipeline.applyDiff(spark, mapping, cachedir,
        OsmXml.readDiff(spark, osc).toDF(), a.long("srid", 3857).toInt,
        expireDir = a.str("expiretiles-dir"))
    }
  }

  // -- run (continuous replication) -----------------------------------------

  private def runReplication(spark: SparkSession, a: Args): Unit = {
    val mapping = mappingOf(a)
    val cachedir = a.required("cachedir")
    val url = a.required("replication-url")
    val workdir = a.str("workdir").getOrElse(s"$cachedir/replication-work")
    val fetch: Option[(String, String) => Boolean] =
      if (url.startsWith("http")) Some(Replication.httpFetch() _) else None
    val intervalMs = a.long("interval", 60L) * 1000
    var go = true
    while (go) {
      val applied = Replication.replicate(spark, mapping, cachedir, url,
        workdir, from = a.long("from", 1), srid = a.long("srid", 3857).toInt,
        fetch = fetch)
      System.err.println(s"[run] replicated through sequence $applied")
      if (a.bool("once")) go = false else Thread.sleep(intervalMs)
    }
  }

  // -- query-cache -----------------------------------------------------------

  private def runQueryCache(spark: SparkSession, a: Args): Unit = {
    val store = new StateStore(spark, a.required("cachedir"))
    val seq = store.currentSeq
    require(seq >= 0, s"no committed state under ${a.required("cachedir")}")
    val b = OsmXml.Bundle(
      coords = store.read("coords", seq),
      nodes = store.read("nodes", seq),
      ways = store.read("ways", seq),
      relations = store.read("relations", seq))
    def ids(flag: String): Seq[Long] =
      a.str(flag).toSeq.flatMap(_.split(",")).map(_.trim.toLong)
    val frames = Seq(
      ids("node").headOption.map(_ => CacheQuery.nodes(b, ids("node"))),
      ids("way").headOption.map(_ =>
        CacheQuery.ways(b, ids("way"), full = a.bool("full"))),
      ids("rel").headOption.map(_ => CacheQuery.relations(b, ids("rel"))),
      if (a.bool("deps") && ids("node").nonEmpty)
        Some(CacheQuery.waysForNodes(b, ids("node"))) else None,
      if (a.bool("deps") && ids("way").nonEmpty)
        Some(CacheQuery.relationsForWays(b, ids("way"))) else None
    ).flatten
    if (frames.isEmpty) { System.err.println("query-cache: no ids given"); sys.exit(1) }
    frames.foreach(_.toJSON.collect().foreach(println))
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) usage()
    val a = parse(args.toSeq.drop(1))
    args(0) match {
      case "import"      => runImport(session(), a)
      case "diff"        => runDiff(session(), a)
      case "run"         => runReplication(session(), a)
      case "query-cache" => runQueryCache(session(), a)
      case "version"     => println("graft 0.5.0 (imposm3-compatible surface)")
      case other =>
        System.err.println(s"invalid command: '$other'"); usage()
    }
  }
}
