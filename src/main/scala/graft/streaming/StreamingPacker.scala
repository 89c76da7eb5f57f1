package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Streaming first-fit sequence packer — the online sibling of the batch
  * FFD packer (queries/TextOps d_pack_ffd): documents arrive on a stream
  * and are packed INTACT into fixed-capacity training sequences ("bins");
  * a bin is emitted the moment it can no longer grow (exactly full, or
  * evicted to respect the open-bin bound), so downstream consumers see a
  * stream of finished sequences while state stays O(maxOpen) per group.
  *
  * Guarantees:
  *  - no bin exceeds `capacity`; docs longer than capacity are truncated
  *    to it (the batch packer's convention);
  *  - at most `maxOpen` open bins per group — the state bound. A stream
  *    cannot keep every bin open the way an offline FFD pass can, so when
  *    a doc needs a fresh bin and the open set is full, the FULLEST open
  *    bin (ties → lowest bin id) is closed and emitted with reason
  *    "evicted" — the packing-quality/state-size trade, chosen because
  *    the fullest bin has the least room left to ever use;
  *  - within a micro-batch, docs pack in doc_id order, so replaying a
  *    batch packs identically (batch BOUNDARIES are the stream's own
  *    nondeterminism — the spec drives them explicitly).
  *
  * The per-doc packing transition is a pure function ([[packStep]]) shared
  * with the spec's reference fold — the processor is only state plumbing,
  * one ValueState blob per group (the open set is bounded and tiny, so a
  * single value read-modify-write beats per-element ListState here).
  */
object StreamingPacker {
  final case class PackDoc(doc_id: Long, grp: Long, len: Long)
  final case class OpenBin(bin_id: Long, fill: Long, doc_ids: Seq[Long])
  final case class OpenBins(bins: Seq[OpenBin])
  final case class PackedBin(grp: Long, bin_id: Long, fill: Long,
    doc_ids: Seq[Long], reason: String)

  /** One packing transition: place the doc, return (open set, next bin id,
    * bins closed by this step). First-fit over the open set in bin-id
    * order (the set is kept in creation order).
    */
  def packStep(grp: Long, open: Seq[OpenBin], nextId: Long, docId: Long,
      len0: Long, capacity: Long, maxOpen: Int)
      : (Seq[OpenBin], Long, Seq[PackedBin]) = {
    val len = math.min(len0, capacity)
    val i = open.indexWhere(b => b.fill + len <= capacity)
    if (i >= 0) {
      val b = open(i)
      val nb = b.copy(fill = b.fill + len, doc_ids = b.doc_ids :+ docId)
      if (nb.fill == capacity)
        (open.patch(i, Nil, 1), nextId,
          Seq(PackedBin(grp, nb.bin_id, nb.fill, nb.doc_ids, "full")))
      else (open.updated(i, nb), nextId, Nil)
    } else if (len == capacity) {
      // capacity-sized doc: born full, emitted without ever opening
      (open, nextId + 1, Seq(PackedBin(grp, nextId, len, Seq(docId), "full")))
    } else if (open.size < maxOpen) {
      (open :+ OpenBin(nextId, len, Seq(docId)), nextId + 1, Nil)
    } else {
      val ev = open.maxBy(b => (b.fill, -b.bin_id))
      (open.filterNot(_.bin_id == ev.bin_id) :+ OpenBin(nextId, len, Seq(docId)),
        nextId + 1,
        Seq(PackedBin(grp, ev.bin_id, ev.fill, ev.doc_ids, "evicted")))
    }
  }

  def pack(docs: Dataset[PackDoc], capacity: Long = 256L, maxOpen: Int = 4)
      : Dataset[PackedBin] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.grp)
      .transformWithState(new PackProcessor(capacity, maxOpen),
        TimeMode.None(), OutputMode.Append())
  }

  private class PackProcessor(capacity: Long, maxOpen: Int)
      extends StatefulProcessor[Long, PackDoc, PackedBin] {
    @transient private var open: ValueState[OpenBins] = _
    @transient private var nextId: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState[OpenBins]("open",
        Encoders.product[OpenBins], TTLConfig.NONE)
      nextId = getHandle.getValueState[Long]("nextId",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(grp: Long, rows: Iterator[PackDoc],
        tv: TimerValues): Iterator[PackedBin] = {
      var o = if (open.exists()) open.get().bins else Seq.empty[OpenBin]
      var nid = if (nextId.exists()) nextId.get() else 0L
      val out = Seq.newBuilder[PackedBin]
      rows.toSeq.sortBy(_.doc_id).foreach { d =>
        val (o2, n2, closed) =
          packStep(grp, o, nid, d.doc_id, d.len, capacity, maxOpen)
        o = o2; nid = n2; out ++= closed
      }
      open.update(OpenBins(o))
      nextId.update(nid)
      out.result().iterator
    }
  }
}
