package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpecBase
import graft.streaming.StreamingPacker.{OpenBin, PackDoc, PackedBin, packStep}

class StreamingPackerSpec extends SparkSpecBase {

  private val Cap = 100L
  private val MaxOpen = 2

  /** Reference fold: replay the same per-batch doc_id-ordered sequence
    * through the pure transition the processor uses.
    */
  private def reference(batches: Seq[Seq[PackDoc]])
      : (Map[Long, Seq[OpenBin]], Seq[PackedBin]) = {
    var open = Map.empty[Long, Seq[OpenBin]].withDefaultValue(Seq.empty)
    var next = Map.empty[Long, Long].withDefaultValue(0L)
    val out = Seq.newBuilder[PackedBin]
    for (batch <- batches; d <- batch.sortBy(_.doc_id)) {
      val (o, n, closed) =
        packStep(d.grp, open(d.grp), next(d.grp), d.doc_id, d.len, Cap, MaxOpen)
      open += d.grp -> o
      next += d.grp -> n
      out ++= closed
    }
    (open.filter(_._2.nonEmpty), out.result())
  }

  private def runStream(name: String, batches: Seq[Seq[PackDoc]]): Seq[PackedBin] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB provider; restore the
    // default afterwards so the other streaming suites keep HDFS state
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[PackDoc]
      val q = StreamingPacker.pack(input.toDS(), Cap, MaxOpen)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[PackedBin].collect().toSeq
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("emitted bins match the pure reference fold, batch by batch") {
    val batches = Seq(
      Seq(PackDoc(1, 0, 60), PackDoc(2, 0, 40), PackDoc(3, 1, 100)),
      Seq(PackDoc(4, 0, 70), PackDoc(5, 0, 80), PackDoc(6, 0, 30)),
      Seq(PackDoc(7, 0, 90), PackDoc(8, 1, 55), PackDoc(9, 1, 45)))
    val got = runStream("pack1", batches)
    val (_, want) = reference(batches)
    assert(got.toSet == want.toSet, s"got=$got want=$want")
    assert(got.size == want.size)
  }

  test("invariants: capacity, full-at-capacity, each doc placed at most once") {
    val batches = Seq(
      (1L to 40L).map(i => PackDoc(i, i % 3, (i * 13) % Cap + 1)).toSeq)
    val got = runStream("pack2", batches)
    got.foreach { b =>
      assert(b.fill <= Cap)
      assert(b.doc_ids.nonEmpty)
      if (b.reason == "full") assert(b.fill == Cap)
    }
    val placed = got.flatMap(_.doc_ids)
    assert(placed.distinct.size == placed.size, "a doc landed in two bins")
    // emitted + still-open in the reference accounts for every input doc
    val (openLeft, want) = reference(batches)
    assert(got.toSet == want.toSet)
    val leftover = openLeft.values.flatten.flatMap(_.doc_ids).toSet
    assert(placed.toSet ++ leftover == (1L to 40L).toSet)
  }

  test("eviction closes the fullest bin when the open set is at its bound") {
    // grp 0: two open bins (60, 50); a 60-len doc fits neither and the
    // open set is full -> the fullest (60) bin is evicted
    val batches = Seq(
      Seq(PackDoc(1, 0, 60), PackDoc(2, 0, 50)),
      Seq(PackDoc(3, 0, 60)))
    val got = runStream("pack3", batches)
    assert(got.size == 1)
    assert(got.head.reason == "evicted")
    assert(got.head.doc_ids == Seq(1L))
    assert(got.head.fill == 60L)
  }

  test("capacity-sized and oversized docs emit immediately as full bins") {
    val batches = Seq(Seq(PackDoc(1, 0, 100), PackDoc(2, 0, 500)))
    val got = runStream("pack4", batches)
    assert(got.size == 2)
    assert(got.forall(b => b.reason == "full" && b.fill == Cap))
    assert(got.map(_.doc_ids).toSet == Set(Seq(1L), Seq(2L)))
  }
}
