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

  test("a small diff rewrites only the touched buckets") {
    val stateDir = Files.createTempDirectory("graft-bucket-prune").toString
    // span 2^10 = 1024 ids per bucket: the fixture's id range (1000..91000)
    // spreads over dozens of buckets, the .osc touches a handful
    DiffPipeline.init(spark, mapping, stateDir,
      OsmXml.read(spark, "/root/reference/test/complete_db.osm"), bucketBits = 10)
    DiffPipeline.applyDiff(spark, mapping, stateDir,
      OsmXml.readDiff(spark, "/root/reference/test/complete_db.osc").toDF())

    val store = new StateStore(spark, stateDir)
    assert(store.currentSeq == 1)
    for (table <- Seq("coords", "ways")) {
      val v0 = bucketDirs(stateDir, table, 0)
      val v1 = bucketDirs(stateDir, table, 1)
      assert(v0.nonEmpty)
      assert(v1.nonEmpty, s"$table: diff should touch at least one bucket")
      assert(v1.size < v0.size,
        s"$table: v1 rewrote ${v1.size} of ${v0.size} buckets — not pruned")
    }

    // untouched buckets must be carried forward by pointer, not copied:
    // the committed view still reads some files physically under v0
    val manifest = new String(Files.readAllBytes(
      Paths.get(stateDir, "coords", "v1", "_manifest")), "UTF-8")
    assert(manifest.contains("v0/__b="), "v1 manifest must reference v0 buckets")
    assert(manifest.contains("v1/__b="), "v1 manifest must reference new buckets")

    // and the merged view is consistent: committed coords == v0 kept + diff
    val coords = store.read("coords", 1)
    assert(coords.count() > 0)
    assert(coords.select("id").distinct().count() == coords.count(),
      "bucket merge must not duplicate ids")

    // vacuum must NOT delete v0 while the committed manifest references it
    store.vacuum(Seq("coords", "ways") ++
      (mapping.conf.tables.keys ++ mapping.conf.generalizedTables.keys).map(t => s"tbl_$t"),
      keep = 0)
    assert(Files.isDirectory(Paths.get(stateDir, "coords", "v0")),
      "vacuum deleted a version dir still referenced by the live manifest")
    assert(store.read("coords", 1).count() == coords.count())
  }
}
