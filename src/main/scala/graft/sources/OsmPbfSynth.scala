package graft.sources

import java.util.zip.Deflater

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.model.{Kind, RawElement}

/** PBF writer + scale-up synthesizer (BASELINE.md §"scale-representative
  * bench"; format: wiki.openstreetmap.org/wiki/PBF_Format).
  *
  * The reference's only published throughput number is a full-planet import
  * (~350 k elements/s single-node); the Monaco fixture (270 KB) measures
  * Spark's fixed stage-scheduling overhead, not throughput. This synthesizer
  * tiles N translated copies of a fixture into a multi-file PBF directory —
  * each copy shifts ids by a stride and coordinates by a grid cell, so way
  * refs and relation members stay internally consistent per copy while the
  * merged extract behaves like one N×-larger region (disjoint id ranges,
  * disjoint geography, same tag/topology distribution as real OSM data).
  *
  * Encoding mirrors the wire format the reader decodes (OsmPbf.scala:89-368):
  * dense nodes with interleaved key/val string indexes, delta-coded way refs
  * and member ids, one deflated PrimitiveBlock of ≤8000 elements per blob.
  * Copies encode in parallel — one Spark task per output file; the reader's
  * blob index then parallelizes the re-read the same way it would a planet
  * file, so the bench exercises the real multi-blob scan path.
  */
object OsmPbfSynth {

  /** Append-only protobuf wire writer. */
  private final class Wb(initial: Int = 1 << 12) {
    private var buf = new Array[Byte](initial)
    private var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + n))
    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, len)
    def writeByte(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }
    def writeVarint(v0: Long): Unit = {
      var v = v0
      var more = true
      while (more) {
        val b = (v & 0x7f).toInt
        v = v >>> 7
        more = v != 0
        writeByte(if (more) b | 0x80 else b)
      }
    }
    def writeZigzag(v: Long): Unit = writeVarint((v << 1) ^ (v >> 63))
    def writeTag(field: Int, wire: Int): Unit = writeVarint((field.toLong << 3) | wire)
    def writeVarintField(field: Int, v: Long): Unit = { writeTag(field, 0); writeVarint(v) }
    def writeBytes(field: Int, b: Array[Byte]): Unit = {
      writeTag(field, 2)
      writeVarint(b.length.toLong)
      ensure(b.length)
      System.arraycopy(b, 0, buf, len, b.length)
      len += b.length
    }
    def writeMsg(field: Int, w: Wb): Unit = writeBytes(field, w.toBytes)
    def writePackedVarints(field: Int, vs: Iterator[Long]): Unit = {
      val w = new Wb(); vs.foreach(w.writeVarint); writeBytes(field, w.toBytes)
    }
    def writePackedZigzags(field: Int, vs: Iterator[Long]): Unit = {
      val w = new Wb(); vs.foreach(w.writeZigzag); writeBytes(field, w.toBytes)
    }
  }

  /** Per-block string table; index 0 is reserved empty per the spec. */
  private final class StringTable {
    private val idx = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
    def apply(s: String): Int = idx.getOrElseUpdate(s, idx.size)
    def encode: Wb = {
      val w = new Wb()
      idx.keysIterator.foreach(s => w.writeBytes(1, s.getBytes("UTF-8")))
      w
    }
  }

  private val BlockSize = 8000

  /** One PrimitiveBlock (stringtable + one group) for a same-kind chunk.
    * Coordinates quantize at the default granularity (100 nanodegrees). */
  private def encodeBlock(chunk: Seq[RawElement]): Array[Byte] = {
    val st = new StringTable
    val group = new Wb()
    chunk.head.kind match {
      case Kind.Node =>
        val dense = new Wb()
        def deltas(vs: Seq[Long]): Iterator[Long] =
          vs.iterator.scanLeft((0L, 0L)) { case ((_, prev), v) => (v - prev, v) }
            .drop(1).map(_._1)
        dense.writePackedZigzags(1, deltas(chunk.map(_.id)))
        dense.writePackedZigzags(8, deltas(chunk.map(e => math.round(e.lat.get * 1e7))))
        dense.writePackedZigzags(9, deltas(chunk.map(e => math.round(e.lon.get * 1e7))))
        val kv = Iterator.newBuilder[Long]
        chunk.foreach { e =>
          e.tags.foreach { case (k, v) => kv += st(k).toLong += st(v).toLong }
          kv += 0L
        }
        dense.writePackedVarints(10, kv.result())
        group.writeMsg(2, dense)
      case Kind.Way =>
        chunk.foreach { e =>
          val w = new Wb()
          w.writeVarintField(1, e.id)
          w.writePackedVarints(2, e.tags.keysIterator.map(st(_).toLong))
          w.writePackedVarints(3, e.tags.valuesIterator.map(st(_).toLong))
          var prev = 0L
          w.writePackedZigzags(8, e.refs.iterator.map { r => val d = r - prev; prev = r; d })
          group.writeMsg(3, w)
        }
      case _ =>
        chunk.foreach { e =>
          val w = new Wb()
          w.writeVarintField(1, e.id)
          w.writePackedVarints(2, e.tags.keysIterator.map(st(_).toLong))
          w.writePackedVarints(3, e.tags.valuesIterator.map(st(_).toLong))
          w.writePackedVarints(8, e.members.iterator.map(m => st(m.role).toLong))
          var prev = 0L
          w.writePackedZigzags(9, e.members.iterator.map { m =>
            val d = m.id - prev; prev = m.id; d
          })
          w.writePackedVarints(10, e.members.iterator.map(_.mtype.toLong))
          group.writeMsg(4, w)
        }
    }
    val block = new Wb(1 << 16)
    block.writeMsg(1, st.encode)
    block.writeMsg(2, group)
    block.toBytes
  }

  /** Deflate a message into a framed `[len][BlobHeader][Blob]` record. */
  private def frameBlob(blobType: String, payload: Array[Byte]): Array[Byte] = {
    val deflater = new Deflater()
    deflater.setInput(payload)
    deflater.finish()
    val zbuf = new Array[Byte](payload.length + 64)
    var zlen = 0
    while (!deflater.finished()) zlen += deflater.deflate(zbuf, zlen, zbuf.length - zlen)
    deflater.end()
    val blob = new Wb()
    blob.writeVarintField(2, payload.length.toLong)
    blob.writeBytes(3, java.util.Arrays.copyOf(zbuf, zlen))
    val blobBytes = blob.toBytes
    val header = new Wb()
    header.writeBytes(1, blobType.getBytes("UTF-8"))
    header.writeVarintField(3, blobBytes.length.toLong)
    val headerBytes = header.toBytes
    val out = new Wb(headerBytes.length + blobBytes.length + 4)
    out.writeByte(headerBytes.length >>> 24)
    out.writeByte(headerBytes.length >>> 16)
    out.writeByte(headerBytes.length >>> 8)
    out.writeByte(headerBytes.length)
    headerBytes.foreach(b => out.writeByte(b))
    blobBytes.foreach(b => out.writeByte(b))
    out.toBytes
  }

  private def headerBlock(elements: Seq[RawElement]): Array[Byte] = {
    val h = new Wb()
    // HeaderBBox (field 1: left/right/top/bottom sint64 nanodegrees) from
    // the nodes — what real extract tools write, and what the source's
    // blob-level coverage prune keys on
    val lons = elements.flatMap(_.lon)
    val lats = elements.flatMap(_.lat)
    if (lons.nonEmpty) {
      val bb = new Wb()
      def nano(d: Double): Long = math.round(d * 1e9)
      bb.writeTag(1, 0); bb.writeZigzag(nano(lons.min))
      bb.writeTag(2, 0); bb.writeZigzag(nano(lons.max))
      bb.writeTag(3, 0); bb.writeZigzag(nano(lats.max))
      bb.writeTag(4, 0); bb.writeZigzag(nano(lats.min))
      h.writeMsg(1, bb)
    }
    h.writeBytes(4, "OsmSchema-V0.6".getBytes("UTF-8"))
    h.writeBytes(4, "DenseNodes".getBytes("UTF-8"))
    frameBlob("OSMHeader", h.toBytes)
  }

  /** Serialize elements (nodes, then ways, then relations — the spec's
    * type ordering) into one .pbf byte stream. */
  def encodePbf(elements: Seq[RawElement]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(headerBlock(elements))
    for (kind <- Seq(Kind.Node, Kind.Way, Kind.Relation)) {
      elements.filter(_.kind == kind).grouped(BlockSize).foreach { chunk =>
        out.write(frameBlob("OSMData", encodeBlock(chunk)))
      }
    }
    out.toByteArray
  }

  /** Decode every element of a .pbf already in memory (driver/task local). */
  def decodeAll(bytes: Array[Byte]): Seq[RawElement] = {
    val out = Seq.newBuilder[RawElement]
    var pos = 0
    while (pos + 4 <= bytes.length) {
      val headerLen = ((bytes(pos) & 0xff) << 24) | ((bytes(pos + 1) & 0xff) << 16) |
        ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      val header = java.util.Arrays.copyOfRange(bytes, pos + 4, pos + 4 + headerLen)
      val (blobType, dataSize) = OsmPbf.decodeBlobHeader(header)
      val dataOffset = pos + 4 + headerLen
      if (blobType == "OSMData")
        out ++= OsmPbf.decodeDataBlob(
          java.util.Arrays.copyOfRange(bytes, dataOffset, dataOffset + dataSize))
      pos = dataOffset + dataSize
    }
    out.result()
  }

  /** Translate one fixture copy: shift all id spaces by `copy * idStride`
    * and the geography by one grid cell (refs/members shift with their
    * targets, so each copy stays referentially closed). */
  def translate(elements: Seq[RawElement], copy: Int, idStride: Long,
      gridCols: Int, cellDeg: Double): Seq[RawElement] = {
    val dId = copy * idStride
    val dLon = (copy % gridCols) * cellDeg - (gridCols * cellDeg) / 2
    val dLat = (copy / gridCols) * cellDeg - (gridCols * cellDeg) / 2
    elements.map { e =>
      e.copy(
        id = e.id + dId,
        lon = e.lon.map(_ + dLon),
        lat = e.lat.map(_ + dLat),
        refs = e.refs.map(_ + dId),
        members = e.members.map(m => m.copy(id = m.id + dId)))
    }
  }

  /** Tile `copies` translated copies of `fixture` into `outDir/synth-N.pbf`,
    * one Spark task per copy. Returns total element count. Skips work when
    * the directory already holds the expected file count (bench reuse). */
  def synthesize(spark: SparkSession, fixture: String, outDir: String,
      copies: Int, idStride: Long = 1L << 40, gridCols: Int = 20,
      cellDeg: Double = 0.6): Long = {
    require(copies.toLong * idStride < 1e17.toLong,
      "id space would collide with RelIDOffset mangling")
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(fixture))
    val perCopy = decodeAll(bytes).size.toLong
    val out = new Path(outDir)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing =
      if (fs.exists(out)) fs.listStatus(out).count(_.getPath.getName.endsWith(".pbf"))
      else 0
    if (existing != copies) {
      if (fs.exists(out)) fs.delete(out, true)
      fs.mkdirs(out)
      val bc = spark.sparkContext.broadcast(bytes)
      spark.sparkContext.parallelize(0 until copies, copies).foreach { c =>
        val translated = translate(decodeAll(bc.value), c, idStride, gridCols, cellDeg)
        val encoded = encodePbf(translated)
        val p = new Path(outDir, f"synth-$c%05d.pbf")
        val o = p.getFileSystem(new Configuration()).create(p, true)
        try o.write(encoded) finally o.close()
      }
      bc.destroy()
    }
    perCopy * copies
  }
}
