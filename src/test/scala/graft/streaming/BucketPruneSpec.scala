package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpecBase
import graft.mapping.{CompiledMapping, MappingConf}
import graft.sources.OsmXml

/** Diff maintenance must be bucket-pruned: a small diff rewrites only the
  * id-range buckets its closure touches, carrying every other bucket
  * forward by manifest pointer (StateStore bucketed layout). The goldens in
  * DiffPipelineSpec prove content correctness through the same code path;
  * this spec proves the PRUNING — v1 holds strictly fewer bucket dirs than
  * the table has, and untouched buckets still point at v0 files.
  */
class BucketPruneSpec extends SparkSpecBase {

  private lazy val mapping =
    new CompiledMapping(MappingConf.fromFile("/root/reference/test/complete_db_mapping.json"))

  import scala.jdk.CollectionConverters._

  private def bucketDirs(stateDir: String, table: String, seq: Long): Set[String] = {
    val d = Paths.get(stateDir, table, s"v$seq")
    if (!Files.isDirectory(d)) Set.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("__b=")).toSet
      finally s.close()
    }
  }

  private def testStoreFold(): Unit = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-store-fold").toString
    val store = new StateStore(spark, dir)
    store.setHashBuckets(8)
    store.writeBucketed("t", 0,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), "id")
    def ins(seq: Long, rows: Seq[(Long, String)], dels: Seq[Long]): Unit =
      store.writeDelta("t", seq, seq - 1, rows.toDF("id", "v"),
        dels.map(Tuple1(_)).toDF("id"), "id", maxSegments = 2)
    ins(1, Seq((2L, "B")), Seq(2L))             // update id 2
    ins(2, Seq((4L, "d")), Seq(4L))             // insert id 4
    def rows(seq: Long): Seq[(Long, String)] =
      store.read("t", seq).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows(2) == Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))
    ins(3, Seq((1L, "A")), Seq(1L))             // third write → compaction
    assert(rows(3) == Seq((1L, "A"), (2L, "B"), (3L, "c"), (4L, "d")))
    val m3 = new String(Files.readAllBytes(
      Paths.get(dir, "t", "v3", "_manifest")), "UTF-8")
    assert(!m3.contains("SEG\t"), "compaction must fold segments into a base")
    assert(m3.contains("v3/__b="), "compaction must write a fresh base")
    // delete-only batch (no inserts)
    ins(4, Seq.empty, Seq(3L))
    assert(rows(4) == Seq((1L, "A"), (2L, "B"), (4L, "d")))
    // bucket-pruned read folds segments for the requested ids too
    val bs = store.bucketsOf(Seq(Tuple1(2L)).toDF("id"), "id")
    assert(store.readBuckets("t", 4, bs).filter("id = 2")
      .head().getString(1) == "B")
    // the fold's tombstone anti-join must plan as a broadcast HASH join
    // (equi on id + the ordinal inequality as its residual) — a nested
    // loop here would make every segmented read O(rows × tombstones)
    val plan = store.read("t", 4).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"segment fold must be a broadcast hash anti-join:\n$plan")
    // r13 single-scan fold: however many stamped segments accumulate, the
    // insert side of the fold is ONE parquet scan (the files carry their
    // own __ord), not one scan per segment — the per-batch read cost of a
    // long diff stream must not grow with the segment count. v2 holds TWO
    // segments; the plan has base + all-ins + the del scan (duplicated
    // once by the optimizer splitting the anti-join over the union) = 4
    // scans, a CONSTANT in the segment count (legacy folds planned
    // 2 + 2·segments).
    val plan2 = store.read("t", 2).queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan2).size
    assert(scans <= 4,
      s"stamped segments must fold as one scan (got $scans, expected ≤4 " +
        s"independent of segment count):\n$plan2")
    // a no-op version step carries the table forward without a new
    // segment: same rows, no v5 segment dirs, no extra fold level
    store.writeUnchanged("t", 5, 4)
    assert(rows(5) == Seq((1L, "A"), (2L, "B"), (4L, "d")))
    assert(!Files.isDirectory(Paths.get(dir, "t", "v5", "ins")),
      "writeUnchanged must not write a segment")
    val m5 = new String(Files.readAllBytes(
      Paths.get(dir, "t", "v5", "_manifest")), "UTF-8")
    assert(m5.contains("v4/ins"), "v5 manifest must carry v4's segment")
  }

  test("a small diff appends a delta segment, never rewrites base buckets") {
    val stateDir = Files.createTempDirectory("graft-bucket-prune").toString
    // 64 hash buckets: the fixture's ids spread over (almost) all of them,
    // the .osc touches a handful
    DiffPipeline.init(spark, mapping, stateDir,
      OsmXml.read(spark, "/root/reference/test/complete_db.osm"), nBuckets = 64)
    DiffPipeline.applyDiff(spark, mapping, stateDir,
      OsmXml.readDiff(spark, "/root/reference/test/complete_db.osc").toDF())

    val store = new StateStore(spark, stateDir)
    assert(store.currentSeq == 1)
    for (table <- Seq("coords", "ways")) {
      val v0 = bucketDirs(stateDir, table, 0)
      val v1 = bucketDirs(stateDir, table, 1)
      assert(v0.nonEmpty)
      assert(v1.isEmpty,
        s"$table: v1 rewrote ${v1.size} base buckets — the version step " +
          "must be a merge-on-read segment, not a bucket rewrite")
      assert(Files.isDirectory(Paths.get(stateDir, table, "v1", "ins")) &&
        Files.isDirectory(Paths.get(stateDir, table, "v1", "del")),
        s"$table: v1 must hold the batch's insert/tombstone segment")
    }

    // untouched base buckets must be carried forward by pointer, and the
    // new segment must be listed after them
    val manifest = new String(Files.readAllBytes(
      Paths.get(stateDir, "coords", "v1", "_manifest")), "UTF-8")
    assert(manifest.contains("v0/__b="), "v1 manifest must reference v0 buckets")
    assert(manifest.contains("SEGO\tid\tid\tv1/ins\tv1/del"),
      "v1 manifest must list the (ordinal-stamped) delta segment")

    // and the merged view is consistent: committed coords == v0 kept + diff
    val coords = store.read("coords", 1)
    assert(coords.count() > 0)
    assert(coords.select("id").distinct().count() == coords.count(),
      "bucket merge must not duplicate ids")

    // segment fold correctness, the newest-wins contract, and compaction
    // — directly against the store
    testStoreFold()

    // the maintained reverse indexes must stay consistent with the
    // element tables they index after a diff (the closure's correctness
    // rests on this invariant, not just on output goldens)
    {
      import org.apache.spark.sql.functions._
      def pairs(df: org.apache.spark.sql.DataFrame, a: String, b: String) =
        df.select(col(a), col(b)).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val ways = store.read("ways", 1)
      val derivedWayrefs = pairs(ways.select(col("id").as("way_id"),
        explode(col("refs")).as("id")), "way_id", "id")
      val storedWayrefs = pairs(store.read("wayrefs", 1), "way_id", "id")
      assert(storedWayrefs == derivedWayrefs,
        s"wayrefs drifted: +${(storedWayrefs -- derivedWayrefs).size} " +
          s"-${(derivedWayrefs -- storedWayrefs).size}")
      val rels = store.read("relations", 1)
      val derivedRelrefs = pairs(rels
        .select(col("id").as("rel_id"), explode(col("members")).as("m"))
        .select(col("rel_id"), col("m.id").as("id")), "rel_id", "id")
      val storedRelrefs = pairs(store.read("relrefs", 1), "rel_id", "id")
      assert(storedRelrefs == derivedRelrefs, "relrefs drifted")
    }

    // vacuum must NOT delete v0 while the committed manifest references it
    store.vacuum(Seq("coords", "ways") ++
      (mapping.conf.tables.keys ++ mapping.conf.generalizedTables.keys).map(t => s"tbl_$t"),
      keep = 0)
    assert(Files.isDirectory(Paths.get(stateDir, "coords", "v0")),
      "vacuum deleted a version dir still referenced by the live manifest")
    assert(store.read("coords", 1).count() == coords.count())
  }

  test("diff init+apply is identical under distributed file discovery") {
    // the store keeps partition discovery on the driver by default
    // (StateStore.withListScope); against object storage a deployment
    // flips graft.store.listThreshold low so Spark's PARALLEL listing
    // jobs walk the merged-view paths instead. That execution mode must
    // produce byte-identical output tables — run the same init+apply both
    // ways and compare per-table row counts + an order-free row checksum.
    import org.apache.spark.sql.functions._
    def runMode(threshold: Option[String]): Map[String, (Long, Long)] = {
      threshold.foreach(spark.conf.set("graft.store.listThreshold", _))
      try {
        val stateDir = Files.createTempDirectory("graft-dist-list").toString
        DiffPipeline.init(spark, mapping, stateDir,
          OsmXml.read(spark, "/root/reference/test/complete_db.osm"),
          nBuckets = 64)
        DiffPipeline.applyDiff(spark, mapping, stateDir,
          OsmXml.readDiff(spark, "/root/reference/test/complete_db.osc").toDF())
        DiffPipeline.readTables(spark, mapping, stateDir).map { case (n, df) =>
          // to_json renders binary (geometry WKB) as base64 — a stable,
          // order-free per-row digest summed into one checksum
          val row = df.agg(count(lit(1)),
            sum(crc32(to_json(struct(df.columns.map(col): _*))))).head()
          n -> (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
        }
      } finally spark.conf.unset("graft.store.listThreshold")
    }
    val key = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    val before = spark.conf.get(key)
    val driverSide = runMode(None)
    // threshold=1: every multi-path store view exceeds it, so Spark runs
    // its distributed listing job — the untested-by-default branch
    val distributed = runMode(Some("1"))
    assert(driverSide.keySet == distributed.keySet)
    for ((n, d) <- driverSide)
      assert(distributed(n) == d,
        s"$n diverged under distributed listing: $d vs ${distributed(n)}")
    // and the store scoped the conf: the session value is untouched after
    assert(spark.conf.get(key) == before,
      "store reads leaked the discovery-threshold override into the session")
  }

  test("the discovery-threshold scope is per-session: interleaved scopes on " +
      "two sessions never cross-restore") {
    // r10 advice: the scope counter was process-global while the conf is
    // per-SparkSession — interleaved store reads on two sessions could
    // restore session A's saved threshold into session B and leak the
    // override into A permanently. Hammer two sessions from two threads
    // (store reads open/close the scope on every call) and assert both
    // sessions come back to their own pre-set values.
    import spark.implicits._
    val key = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    val s2 = spark.newSession()
    val dir = Files.createTempDirectory("graft-scope").toString
    val store1 = new StateStore(spark, dir)
    store1.setHashBuckets(4)
    store1.writeBucketed("t", 0, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "id")
    val store2 = new StateStore(s2, dir)
    val before1 = "11111"
    val before2 = "22222"
    spark.conf.set(key, before1)
    s2.conf.set(key, before2)
    try {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val fs = Seq(store1 -> spark, store2 -> s2).map { case (st, _) =>
        Future { (1 to 100).foreach(_ => st.read("t", 0)) }
      }
      Await.result(Future.sequence(fs), Duration.Inf)
      pool.shutdown()
      assert(spark.conf.get(key) == before1,
        s"session 1 threshold clobbered: ${spark.conf.get(key)}")
      assert(s2.conf.get(key) == before2,
        s"session 2 threshold clobbered: ${s2.conf.get(key)}")
    } finally { spark.conf.unset(key); s2.conf.unset(key) }
  }
}
