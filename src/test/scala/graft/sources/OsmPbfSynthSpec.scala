package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The PBF writer must round-trip through the reader byte-exactly in ids
  * and refs (coordinates re-quantize at 100 nanodegrees), and the scale-up
  * synthesizer must produce disjoint, referentially-closed copies.
  */
class OsmPbfSynthSpec extends SparkSpecBase {

  private val fixture =
    "/root/reference/vendor/github.com/omniscale/go-osm/parser/pbf/monaco-20150428.osm.pbf"

  test("encode/decode round-trip preserves elements") {
    val original = OsmPbfSynth.decodeAll(
      Files.readAllBytes(java.nio.file.Paths.get(fixture)))
    val back = OsmPbfSynth.decodeAll(OsmPbfSynth.encodePbf(original))
    assert(back.size == original.size)
    val byKey = back.map(e => (e.kind, e.id) -> e).toMap
    original.foreach { e =>
      val r = byKey((e.kind, e.id))
      assert(r.tags == e.tags, s"tags of ${e.kind}/${e.id}")
      assert(r.refs == e.refs, s"refs of ${e.kind}/${e.id}")
      assert(r.members == e.members, s"members of ${e.kind}/${e.id}")
      for (lon <- e.lon; rlon <- r.lon) assert(math.abs(rlon - lon) < 1e-6)
      for (lat <- e.lat; rlat <- r.lat) assert(math.abs(rlat - lat) < 1e-6)
    }
  }

  test("synthesized copies are disjoint, closed, and reader-compatible") {
    val dir = Files.createTempDirectory("graft-synth").toString
    val stride = 1L << 40
    val total = OsmPbfSynth.synthesize(spark, fixture, dir, copies = 2,
      idStride = stride)
    val bundle = OsmPbf.read(spark, dir)
    val n = bundle.coords.count() + bundle.ways.count() + bundle.relations.count()
    assert(n == total, s"reader saw $n of $total elements")

    // the two id ranges must not overlap
    val ranges = bundle.coords.withColumn("copy", (col("id") / stride).cast("int"))
      .groupBy("copy").agg(min("id").as("lo"), max("id").as("hi"))
      .orderBy("copy").collect()
    assert(ranges.length == 2)
    assert(ranges(0).getAs[Long]("hi") < stride)
    assert(ranges(1).getAs[Long]("lo") >= stride)

    // each copy stays referentially closed: way refs resolve as well as the
    // original extract's do (boundary-clipped ways aside)
    val refs = bundle.ways.select(explode(col("refs")).as("id")).distinct()
    val missing = refs.join(bundle.coords, Seq("id"), "left_anti").count()
    assert(missing.toDouble / refs.count() < 0.05, s"missing=$missing")

    // geography shifted: the two copies occupy different grid cells
    val lonSpread = bundle.coords.agg(max("lon") - min("lon")).head.getDouble(0)
    assert(lonSpread > 0.5, s"copies not translated (lon spread $lonSpread)")
  }
}
