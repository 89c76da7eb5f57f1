package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ImportPipeline
import graft.mapping.{CompiledMapping, TableConf, TableType}
import graft.model.{Ids, Kind, Op}
import graft.operators.Generalize
import graft.sources.OsmXml
import graft.sources.OsmXml.Bundle

/** Incremental maintenance of the import output (SURVEY.md §2 ST1-ST6,
  * §3.2; reference update/process.go).
  *
  * State is *relational* — the four element frames plus every output and
  * generalized table, versioned in a [[StateStore]] — so a diff batch is a
  * plain dataflow, not per-key streaming state:
  *
  *  1. element tables: delete-then-insert by (kind, id) — always delete,
  *     even for Create (the reference's idempotency trick, ST2);
  *  2. dependency closure (J4): changed node → ways whose refs contain it,
  *     changed node/way → relations whose members reference them — the
  *     reverse indexes of the reference's DiffCache are expressed as
  *     explode+semi-join against the maintained ways/relations tables;
  *  3. rebuild: the same ImportPipeline runs over the closure subset
  *     (plus member ways needed for relation assembly) — batch and diff
  *     share one code path, like the reference shares its writer package;
  *  4. output tables: delete closure ids (mangled per table type), append
  *     the rebuilt delta; generalized tables refresh the same way from the
  *     delta (ST6);
  *  5. commit the new version (ST4) — crash-before-commit replays onto the
  *     previous committed version, which delete-then-insert makes safe.
  *
  * At 100 TB the closure semi-joins shuffle only the changed-id sets
  * (minutely diffs are ~10⁴ elements against ~10¹⁰) and the anti-joins
  * broadcast them; the full-table rewrite per version becomes a
  * Delta/Iceberg MERGE on real deployments — the dataflow is identical.
  */
object DiffPipeline {

  private val ElementTables = Seq("coords", "nodes", "ways", "relations")
  private def tbl(name: String): String = s"tbl_$name"

  /** Initial import: write element state + all output tables as v0, all
    * range-bucketed by id so later diffs rewrite only touched buckets.
    * `bucketBits` fixes the bucket span (id >> bits) for the store's life;
    * 22 ⇒ ~4M ids per bucket ⇒ ~3k buckets over planet node ids. */
  def init(spark: SparkSession, mapping: CompiledMapping, stateDir: String,
      bundle: Bundle, srid: Int = 3857, bucketBits: Int = 22,
      limit: Option[graft.operators.Limitto] = None,
      startSeq: Long = 0,
      assembler: (DataFrame, DataFrame) => DataFrame =
        graft.operators.WayAssembly.resolve): Map[String, DataFrame] = {
    val store = new StateStore(spark, stateDir)
    store.setBucketBits(bucketBits)
    // startSeq > 0 re-inits on top of an existing store (`-appendcache`):
    // writing a NEW version while the merged bundle lazily reads the old
    // one keeps the read and write paths disjoint
    store.writeBucketed("coords", startSeq, bundle.coords, "id")
    store.writeBucketed("nodes", startSeq, bundle.nodes, "id")
    store.writeBucketed("ways", startSeq, bundle.ways, "id")
    store.writeBucketed("relations", startSeq, bundle.relations, "id")
    val stored = storedBundle(store, startSeq)
    val pipeline = new ImportPipeline(spark, mapping, srid, limit,
      assembler = assembler)
    val tables = pipeline.run(stored)
    val gens = Generalize(spark, mapping, tables)
    (tables ++ gens).foreach { case (n, df) =>
      store.writeBucketed(tbl(n), startSeq, df, idColFor(mapping, n))
    }
    pipeline.unpersistAll()
    store.commit(startSeq)
    readTables(spark, mapping, stateDir)
  }

  /** Current committed output tables (base + generalized). */
  def readTables(spark: SparkSession, mapping: CompiledMapping,
      stateDir: String): Map[String, DataFrame] = {
    val store = new StateStore(spark, stateDir)
    val seq = store.currentSeq
    allTableNames(mapping).map(n => n -> store.read(tbl(n), seq)).toMap
  }

  private def allTableNames(mapping: CompiledMapping): Seq[String] =
    mapping.conf.tables.keys.toSeq ++ mapping.conf.generalizedTables.keys.toSeq

  /** The element tables of a committed state version — the `-appendcache`
    * read side (import_/import.go:84-101 appends onto the open cache). */
  def storedBundleAt(spark: SparkSession, stateDir: String, seq: Long): Bundle =
    storedBundle(new StateStore(spark, stateDir), seq)

  private def storedBundle(store: StateStore, seq: Long): Bundle =
    Bundle(
      coords = store.read("coords", seq),
      nodes = store.read("nodes", seq),
      ways = store.read("ways", seq),
      relations = store.read("relations", seq))

  /** Apply one change file (one transaction, ST1). `diff` carries
    * RawElement rows with `op`; the last op per element wins is assumed
    * upstream (minutely OSC files are deduplicated by osmosis).
    *
    * `from` applies on top of a specific (possibly uncommitted) state
    * version instead of the committed pointer; paired with
    * `commit = false` it gives the reference's `-commit-latest` batch
    * mode (update/cmd.go:96-134): apply N diffs version-by-version, then
    * advance the pointer once at the end — a crash mid-batch replays the
    * whole batch because the pointer never moved.
    */
  def applyDiff(spark: SparkSession, mapping: CompiledMapping, stateDir: String,
      diff: DataFrame, srid: Int = 3857,
      expireDir: Option[String] = None,
      expireZoom: Int = graft.operators.ExpireTiles.DefaultZoom,
      from: Option[Long] = None,
      commit: Boolean = true): Map[String, DataFrame] = {
    val store = new StateStore(spark, stateDir)
    val seq = from.getOrElse(store.currentSeq)
    require(seq >= 0, s"no committed state in $stateDir — run init first")
    val next = seq + 1

    val d = diff.cache()
    val chN = d.filter(col("kind") === Kind.Node).select("id").distinct().cache()
    val chW = d.filter(col("kind") === Kind.Way).select("id").distinct().cache()
    val chR = d.filter(col("kind") === Kind.Relation).select("id").distinct().cache()

    // -- 1. element tables: delete-then-insert, bucket-pruned -----------------
    // a changed element's insert row has the same id as its delete, so the
    // touched buckets are exactly the changed ids' buckets: read only those,
    // anti-join the change set, append inserts, write only those buckets
    val bN = store.bucketsOf(chN, "id")
    val bW = store.bucketsOf(chW, "id")
    val bR = store.bucketsOf(chR, "id")
    def keptIn(name: String, ch: DataFrame, bs: Set[Long]): DataFrame =
      store.readBuckets(name, seq, bs).join(broadcast(ch), Seq("id"), "left_anti")
    val insN = d.filter(col("kind") === Kind.Node && col("op") =!= Op.Delete)
    store.writeBucketedDelta("coords", next, seq,
      keptIn("coords", chN, bN).unionByName(insN.select("id", "lon", "lat")),
      "id", bN)
    store.writeBucketedDelta("nodes", next, seq,
      keptIn("nodes", chN, bN).unionByName(
        insN.filter(size(col("tags")) > 0).select("id", "lon", "lat", "tags")),
      "id", bN)
    store.writeBucketedDelta("ways", next, seq,
      keptIn("ways", chW, bW).unionByName(
        d.filter(col("kind") === Kind.Way && col("op") =!= Op.Delete)
          .select("id", "refs", "tags")),
      "id", bW)
    store.writeBucketedDelta("relations", next, seq,
      keptIn("relations", chR, bR).unionByName(
        d.filter(col("kind") === Kind.Relation && col("op") =!= Op.Delete)
          .select(col("id"),
            expr("transform(members, m -> struct(m.id as id, m.mtype as type, m.role as role))")
              .as("members"),
            col("tags"))),
      "id", bR)
    val nw = storedBundle(store, next) // short lineage for the joins below

    // -- 2. dependency closure (J4) -------------------------------------------
    val depW = nw.ways
      .select(col("id"), explode(col("refs")).as("ref"))
      .join(broadcast(chN.withColumnRenamed("id", "ref")), Seq("ref"), "left_semi")
      .select("id").union(chW).distinct().cache()
    val mem = nw.relations
      .select(col("id").as("rid"), explode(col("members")).as("m"))
    val relsViaNodes = mem.filter(col("m.type") === 0)
      .join(broadcast(chN.withColumnRenamed("id", "mid")),
        col("m.id") === col("mid"), "left_semi")
    val relsViaWays = mem.filter(col("m.type") === 1)
      .join(depW.withColumnRenamed("id", "mid"), col("m.id") === col("mid"), "left_semi")
    val depR = relsViaNodes.select(col("rid").as("id"))
      .union(relsViaWays.select(col("rid").as("id")))
      .union(chR).distinct().cache()

    // -- 3. rebuild the closure through the shared import pipeline ------------
    val driverRels = nw.relations.join(broadcast(depR), Seq("id"), "left_semi")
    val memberWayIds = driverRels
      .select(explode(col("members")).as("m"))
      .filter(col("m.type") === 1)
      .select(col("m.id").as("id")).distinct()
    val rebuildW = depW.union(memberWayIds).distinct().cache()
    val waysR = nw.ways.join(broadcast(rebuildW), Seq("id"), "left_semi")
    // bucket-pruned coord resolution (the store-side J1, reference analog:
    // random reads against the ID-sorted LevelDB coords cache,
    // cache/delta.go:162-198): the rebuild closure needs only (a) the refs
    // of its ways and (b) the node members of its driver relations — read
    // ONLY those ids' buckets of the coords state instead of scanning all
    // of it. At planet scale a minutely batch touches ~10² of ~3k buckets,
    // so this is the difference between a full multi-billion-row coords
    // scan per diff and an O(changed) one; the pruned read also keeps the
    // assembly join's probe side small enough that AQE broadcasts the
    // exploded refs.
    val neededCoordIds = waysR.select(explode(col("refs")).as("id"))
      .union(driverRels.select(explode(col("members")).as("m"))
        .filter(col("m.type") === 0).select(col("m.id").as("id")))
    val bCoord = store.bucketsOf(neededCoordIds, "id")
    // coords touched by THIS batch resolve at full precision (reference
    // LRU-bunch artifact — see ImportPipeline.projectXY)
    val freshCoords = store.readBuckets("coords", next, bCoord).join(
      broadcast(chN.withColumn("fresh", lit(true))), Seq("id"), "left")
      .withColumn("fresh", coalesce(col("fresh"), lit(false)))
    val bundleR = Bundle(
      coords = freshCoords,
      nodes = nw.nodes.join(broadcast(chN), Seq("id"), "left_semi"),
      ways = waysR,
      relations = driverRels)
    // member-tag / sub-relation resolution sees the FULL maintained state
    // (reference writer/relations.go:216-251 resolves from the whole cache);
    // only the row-driving set is restricted to the closure.
    val pipeline = new ImportPipeline(spark, mapping, srid)
    val delta = pipeline.run(bundleR, resolve = Some(nw))
    val genDelta = Generalize(spark, mapping, delta)

    // -- 4. output tables: delete mangled closure ids, append delta -----------
    val single = mapping.conf.singleIdSpace
    val wDel = rebuildW.select(
      (if (single) -col("id") else col("id")).cast("long").as("osm_id"))
    val rDel = depR.select(
      (if (single) lit(Ids.RelIDOffset) - col("id") else -col("id"))
        .cast("long").as("osm_id"))
    val nDel = chN.select(col("id").cast("long").as("osm_id"))
    def deleteIdsFor(tableType: String): DataFrame = tableType match {
      case TableType.Point => nDel
      case TableType.LineString => wDel.union(rDel)
      case TableType.Polygon => wDel.union(rDel)
      case TableType.Geometry => nDel.union(wDel).union(rDel)
      case TableType.Relation | TableType.RelationMember => rDel
      case other => throw new IllegalArgumentException(other)
    }
    // the rebuilt delta's ids are a subset of the delete ids by
    // construction (rows are driven by the closure), so each table's
    // touched buckets are the delete ids' buckets: read only those, drop
    // mangled closure ids, append delta, write only those buckets
    val bNDel = bN // point deletes are the changed node ids themselves
    val bWDel = store.bucketsOf(wDel, "osm_id")
    val bRDel = store.bucketsOf(rDel, "osm_id")
    def bucketsFor(tableType: String): Set[Long] = tableType match {
      case TableType.Point => bNDel
      case TableType.LineString | TableType.Polygon => bWDel ++ bRDel
      case TableType.Geometry => bNDel ++ bWDel ++ bRDel
      case TableType.Relation | TableType.RelationMember => bRDel
      case other => throw new IllegalArgumentException(other)
    }
    val expireGeoms = Seq.newBuilder[DataFrame]
    for ((name, t) <- mapping.conf.tables) {
      val idc = idColName(t)
      val del = deleteIdsFor(t.tableType).withColumnRenamed("osm_id", idc)
      val bs = bucketsFor(t.tableType)
      val touched = store.readBuckets(tbl(name), seq, bs)
      val kept = touched.join(broadcast(del), Seq(idc), "left_anti")
      store.writeBucketedDelta(tbl(name), next, seq,
        kept.unionByName(delta(name)), idc, bs)
      // ST5 inputs: OLD geometries of replaced/deleted rows (the reference
      // expires via its deleter, update/deleter.go) plus the rebuilt ones
      if (expireDir.nonEmpty && t.tableType != TableType.Relation &&
        t.tableType != TableType.RelationMember) {
        geomColName(t).foreach { gc =>
          expireGeoms += touched.join(broadcast(del), Seq(idc), "left_semi")
            .select(col(gc).as("geometry"))
          expireGeoms += delta(name).select(col(gc).as("geometry"))
        }
      }
    }
    // generalized tables: keyed refresh from the delta (ST6); columns are
    // inherited from the root source table's conf
    for ((name, g) <- mapping.conf.generalizedTables) {
      val rc = rootConf(mapping, g.source)
      val idc = idColName(rc)
      val del = deleteIdsFor(rc.tableType).withColumnRenamed("osm_id", idc)
      val bs = bucketsFor(rc.tableType)
      val kept = store.readBuckets(tbl(name), seq, bs)
        .join(broadcast(del), Seq(idc), "left_anti")
      store.writeBucketedDelta(tbl(name), next, seq,
        kept.unionByName(genDelta(name)), idc, bs)
    }

    // ST5: expire-tiles side output — every geometry touched by this batch
    expireDir.foreach { dir =>
      val geoms = expireGeoms.result()
      if (geoms.nonEmpty) {
        val tiles = graft.operators.ExpireTiles.expire(
          geoms.reduce(_ unionByName _).filter(col("geometry").isNotNull),
          maxZoom = expireZoom)
        graft.operators.ExpireTiles.writeTiles(tiles, s"$dir/$next")
      }
    }

    pipeline.unpersistAll()
    if (commit) store.commit(next)
    Seq(d, chN, chW, chR, depW, depR, rebuildW).foreach(_.unpersist())
    allTableNames(mapping).map(n => n -> store.read(tbl(n), next)).toMap
  }

  // id/geometry columns are whatever the mapping names them (colType is
  // the authority, not the default "osm_id"/"geometry" spellings)
  private def idColName(t: TableConf): String =
    t.columns.find(_.colType == "id").map(_.name).getOrElse("osm_id")

  private def geomColName(t: TableConf): Option[String] =
    t.columns.find(c =>
      c.colType == "geometry" || c.colType == "validated_geometry").map(_.name)

  /** The id column of a base or generalized table (generalized tables
    * inherit the root source table's columns). */
  private def idColFor(mapping: CompiledMapping, name: String): String =
    idColName(mapping.conf.tables.getOrElse(name, rootConf(mapping, name)))

  private def rootConf(mapping: CompiledMapping, source: String): TableConf = {
    var src = source
    while (mapping.conf.generalizedTables.contains(src))
      src = mapping.conf.generalizedTables(src).source
    mapping.conf.tables(src)
  }

  /** Continuous mode (§3.2 `imposm run`): every .osc(.gz) landing in
    * `replicationDir` is applied as its own transaction, in path order —
    * replication sequence numbers sort lexicographically within a cycle
    * dir. Structured Streaming's file source + checkpoint provides
    * exactly-once discovery; StateStore commit provides idempotent apply.
    */
  def runStream(spark: SparkSession, mapping: CompiledMapping, stateDir: String,
      replicationDir: String, checkpointDir: String,
      srid: Int = 3857, expireDir: Option[String] = None,
      expireZoom: Int = graft.operators.ExpireTiles.DefaultZoom): StreamingQuery = {
    spark.readStream
      .format("binaryFile")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY"))
      .option("pathGlobFilter", "*.osc*")
      .load(replicationDir)
      .select("path")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val files = batch.select("path").collect().map(_.getString(0)).sorted
        files.foreach { p =>
          applyDiff(spark, mapping, stateDir, OsmXml.readDiff(spark, p).toDF(), srid,
            expireDir = expireDir, expireZoom = expireZoom)
        }
      }
      .start()
  }
}
