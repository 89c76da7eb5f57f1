package graft.sources

import java.util.zip.Inflater

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{ElemMeta, Kind, Op, RawElement, RawMember}
import graft.sources.OsmXml.Bundle

/** OSM PBF source (SURVEY.md §2 S1; reference vendor/.../parser/pbf/).
  *
  * The on-disk format (public spec, wiki.openstreetmap.org/wiki/PBF_Format)
  * is a sequence of `[4-byte BE length][BlobHeader][Blob]` records; each
  * OSMData blob inflates to a PrimitiveBlock of ≤8k elements. We hand-decode
  * the protobuf wire format (varint/zigzag/length-delimited — ~200 lines, no
  * codegen) rather than depending on a protobuf runtime.
  *
  * Scale design: a cheap header-only scan builds a blob index (offset,
  * length) — ~20 bytes read per ~8 MB blob, so indexing a 78 GB planet file
  * touches ~200 KB. The index parallelizes into tasks that each seek + read
  * + inflate + decode their own blob ranges: blob-parallel decode exactly
  * like the reference's NumCPU parser goroutines, but elastic across a
  * cluster. The type-ordering barriers (`OnFirstWay`…) disappear — DAG
  * dependencies replace them.
  */
object OsmPbf {

  /** One OSMData blob: byte range within `path` (offset of the Blob msg).
    * `bbox` is the containing FILE's OSMHeader HeaderBBox as
    * (minLon, minLat, maxLon, maxLat) when the header carries one — the
    * coverage-prune key for `read(coverage = ...)`. */
  final case class BlobRange(path: String, offset: Long, length: Int,
      bbox: Option[(Double, Double, Double, Double)] = None)

  // ---- public API -----------------------------------------------------------

  /** Parse into the four element frames. The raw cache is Dataset-cached
    * (MEMORY_AND_DISK — partitions that don't fit spill); pass
    * `StorageLevel.DISK_ONLY` for planet-scale runs where the decoded
    * corpus shouldn't compete with shuffle memory at all, and a
    * [[TagFilters]] so the cache never materializes unmapped tags. */
  def read(spark: SparkSession, path: String,
      filters: Option[TagFilters] = None,
      storage: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK,
      coverage: Option[graft.operators.Limitto] = None): Bundle =
    OsmXml.bundleOf(
      readElements(spark, path, filters, coverage = coverage)
        .toDF().persist(storage))

  /** `includeMetadata` is the reference's IncludeMetadata analog
    * (parser/pbf/parser.go:17): version/timestamp/changeset/uid/user decode
    * only when asked — the planet-scale default never materializes them. */
  /** `coverage` drops whole blobs whose file's header bbox is disjoint
    * from the BUFFERED limitto coverage before any byte of them is read —
    * the reference drops out-of-coverage elements at parse
    * (reader/reader.go:215-227); at blob granularity the I/O saved scales
    * with (1 − coverage fraction) on spatially-partitioned inputs. Blobs
    * without a header bbox always decode (prune is advisory, never lossy
    * beyond the limitto contract: everything pruned here is outside the
    * buffered coverage, which the pipeline's P6/J5 filters drop anyway). */
  def readElements(spark: SparkSession, path: String,
      filters: Option[TagFilters] = None,
      includeMetadata: Boolean = false,
      coverage: Option[graft.operators.Limitto] = None): Dataset[RawElement] = {
    import spark.implicits._
    val index = prunedIndex(blobIndex(spark, path), coverage)
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val parallelism = math.max(spark.sparkContext.defaultParallelism, 1)
    val tf = filters // local: don't capture the session in the task closure
    val withMeta = includeMetadata
    spark.createDataset(index)
      .repartition(math.min(math.max(index.size / 4, 1), parallelism * 4))
      .mapPartitions { it =>
        val raw = it.flatMap { br =>
          val fs = new Path(br.path).getFileSystem(conf.value)
          val in = fs.open(new Path(br.path))
          val buf = new Array[Byte](br.length)
          try { in.seek(br.offset); in.readFully(buf) } finally in.close()
          decodeDataBlob(buf, withMeta)
        }
        tf match {
          case Some(f) => raw.map(prefilter(_, f))
          case None => raw
        }
      }
  }

  /** Apply the per-kind tag prefilter to one decoded element (P1 at parse
    * time — mapping/filter.go:71-89 via reader/reader.go:124). */
  private def prefilter(e: RawElement, f: TagFilters): RawElement = e.kind match {
    case Kind.Node => if (e.tags.isEmpty) e else e.copy(tags = f.nodes.filter(e.tags))
    case Kind.Way => if (e.tags.isEmpty) e else e.copy(tags = f.ways.filter(e.tags))
    case _ => if (e.tags.isEmpty) e else e.copy(tags = f.relations.filter(e.tags))
  }

  /** Header-only scan: returns the byte ranges of all OSMData blobs, each
    * tagged with its file's OSMHeader bbox when present (the one extra
    * read is the tiny header blob itself, once per file). */
  def blobIndex(spark: SparkSession, path: String): Seq[BlobRange] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files: Seq[Path] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath)
          .filter(_.getName.endsWith(".pbf"))
      else Seq(p)
    files.flatMap { f =>
      val len = fs.getFileStatus(f).getLen
      val in = fs.open(f)
      val out = Seq.newBuilder[BlobRange]
      var fileBBox: Option[(Double, Double, Double, Double)] = None
      try {
        var pos = 0L
        val lenBuf = new Array[Byte](4)
        while (pos + 4 <= len) {
          in.seek(pos)
          in.readFully(lenBuf)
          val headerLen = ((lenBuf(0) & 0xff) << 24) | ((lenBuf(1) & 0xff) << 16) |
            ((lenBuf(2) & 0xff) << 8) | (lenBuf(3) & 0xff)
          val headerBuf = new Array[Byte](headerLen)
          in.readFully(headerBuf)
          val (blobType, dataSize) = decodeBlobHeader(headerBuf)
          val dataOffset = pos + 4 + headerLen
          if (blobType == "OSMHeader") {
            val blob = new Array[Byte](dataSize)
            in.readFully(blob)
            fileBBox = decodeHeaderBBox(inflateBlob(blob))
          } else if (blobType == "OSMData")
            out += BlobRange(f.toString, dataOffset, dataSize, fileBBox)
          pos = dataOffset + dataSize
        }
      } finally in.close()
      out.result()
    }
  }

  /** HeaderBlock field 1 (HeaderBBox: left/right/top/bottom, sint64
    * nanodegrees) → (minLon, minLat, maxLon, maxLat). */
  private def decodeHeaderBBox(
      headerBlock: Array[Byte]): Option[(Double, Double, Double, Double)] = {
    val pb = new Pb(headerBlock, 0, headerBlock.length)
    while (pb.hasMore) pb.readTag() match {
      case 1 =>
        val bb = pb.readSlice()
        var left, right, top, bottom = 0L
        while (bb.hasMore) bb.readTag() match {
          case 1 => left = bb.readZigzag()
          case 2 => right = bb.readZigzag()
          case 3 => top = bb.readZigzag()
          case 4 => bottom = bb.readZigzag()
          case _ => bb.skip()
        }
        return Some((left * 1e-9, bottom * 1e-9, right * 1e-9, top * 1e-9))
      case _ => pb.skip()
    }
    None
  }

  /** Coverage prune over a blob index (exposed so tests and tooling can
    * observe the decoded-blob count drop). */
  def prunedIndex(index: Seq[BlobRange],
      coverage: Option[graft.operators.Limitto]): Seq[BlobRange] =
    coverage match {
      case None => index
      case Some(lim) => index.filter(_.bbox.forall(b =>
        lim.intersectsEnvelopeLonLat(b._1, b._2, b._3, b._4)))
    }

  // ---- protobuf wire reader -------------------------------------------------

  /** Minimal protobuf wire-format cursor over a byte slice. */
  private final class Pb(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end

    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      var b = 0L
      do {
        b = buf(pos) & 0xff
        result |= (b & 0x7f) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      result
    }

    def readZigzag(): Long = {
      val v = readVarint()
      (v >>> 1) ^ -(v & 1)
    }

    /** Returns field number; wire type goes to `lastWire`. */
    var lastWire: Int = 0
    def readTag(): Int = {
      val t = readVarint()
      lastWire = (t & 7).toInt
      (t >>> 3).toInt
    }

    /** For wire type 2: returns a sub-cursor and advances past it. */
    def readSlice(): Pb = {
      val len = readVarint().toInt
      val s = new Pb(buf, pos, pos + len)
      pos += len
      s
    }

    def readBytes(): Array[Byte] = {
      val len = readVarint().toInt
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      out
    }

    def skip(): Unit = lastWire match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 =>
        // NB: must read the length BEFORE touching pos — `pos += readVarint()`
        // captures the pre-varint pos and silently drops the length bytes.
        val len = readVarint().toInt
        pos += len
      case 5 => pos += 4
      case w => throw new IllegalStateException(s"wire type $w")
    }

    def packedVarints(): Array[Long] = {
      val s = readSlice()
      val out = Array.newBuilder[Long]
      while (s.hasMore) out += s.readVarint()
      out.result()
    }

    def packedZigzags(): Array[Long] = {
      val s = readSlice()
      val out = Array.newBuilder[Long]
      while (s.hasMore) out += s.readZigzag()
      out.result()
    }
  }

  private[sources] def decodeBlobHeader(buf: Array[Byte]): (String, Int) = {
    val pb = new Pb(buf, 0, buf.length)
    var tpe = ""
    var dataSize = 0
    while (pb.hasMore) pb.readTag() match {
      case 1 => tpe = new String(pb.readBytes(), "UTF-8")
      case 3 => dataSize = pb.readVarint().toInt
      case _ => pb.skip()
    }
    (tpe, dataSize)
  }

  /** Blob msg → decompressed payload bytes (raw or zlib). */
  private def inflateBlob(blob: Array[Byte]): Array[Byte] = {
    val pb = new Pb(blob, 0, blob.length)
    var raw: Array[Byte] = null
    var rawSize = -1
    var zlib: Array[Byte] = null
    while (pb.hasMore) pb.readTag() match {
      case 1 => raw = pb.readBytes()
      case 2 => rawSize = pb.readVarint().toInt
      case 3 => zlib = pb.readBytes()
      case f => throw new UnsupportedOperationException(
        s"unsupported Blob compression field $f")
    }
    if (raw != null) raw
    else {
      val inflater = new Inflater()
      inflater.setInput(zlib)
      val out = new Array[Byte](rawSize)
      var off = 0
      while (off < rawSize && !inflater.finished())
        off += inflater.inflate(out, off, rawSize - off)
      inflater.end()
      out
    }
  }

  /** Blob msg → decompressed PrimitiveBlock bytes → elements. */
  private[sources] def decodeDataBlob(blob: Array[Byte],
      withMeta: Boolean = false): Iterator[RawElement] =
    decodePrimitiveBlock(inflateBlob(blob), withMeta)

  /** OSMHeader metadata (reference parser/pbf/parser.go:55-67 `Header`):
    * the osmosis replication fields that seed diff state on `import
    * -diff` (import_/state.go:15-36). Absent fields stay None. */
  final case class PbfHeader(replicationTimestamp: Option[java.time.Instant],
      replicationSequence: Option[Long], replicationUrl: Option[String])

  /** Decode the first OSMHeader blob of `path` (a file, or the first
    * .pbf in a directory). Driver-side only — one small blob, no jobs. */
  def header(spark: SparkSession, path: String): PbfHeader = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath)
          .filter(_.getName.endsWith(".pbf")).sortBy(_.getName).headOption
          .getOrElse(throw new IllegalArgumentException(s"no .pbf under $path"))
      else p
    val in = fs.open(file)
    try {
      val lenBuf = new Array[Byte](4)
      in.readFully(lenBuf)
      val headerLen = ((lenBuf(0) & 0xff) << 24) | ((lenBuf(1) & 0xff) << 16) |
        ((lenBuf(2) & 0xff) << 8) | (lenBuf(3) & 0xff)
      val headerBuf = new Array[Byte](headerLen)
      in.readFully(headerBuf)
      val (blobType, dataSize) = decodeBlobHeader(headerBuf)
      if (blobType != "OSMHeader")
        return PbfHeader(None, None, None)
      val blob = new Array[Byte](dataSize)
      in.readFully(blob)
      val hb = inflateBlob(blob)
      val pb = new Pb(hb, 0, hb.length)
      var ts: Option[java.time.Instant] = None
      var seq: Option[Long] = None
      var url: Option[String] = None
      while (pb.hasMore) pb.readTag() match {
        case 32 => ts = Some(java.time.Instant.ofEpochSecond(pb.readVarint()))
        case 33 => seq = Some(pb.readVarint())
        case 34 => url = Some(new String(pb.readBytes(), "UTF-8"))
        case _ => pb.skip()
      }
      PbfHeader(ts, seq, url)
    } finally in.close()
  }

  private def decodePrimitiveBlock(buf: Array[Byte], withMeta: Boolean): Iterator[RawElement] = {
    val pb = new Pb(buf, 0, buf.length)
    var strings: Array[String] = Array.empty
    val groups = Seq.newBuilder[Pb]
    var granularity = 100L
    var dateGranularity = 1000L
    var latOffset = 0L
    var lonOffset = 0L
    while (pb.hasMore) pb.readTag() match {
      case 1 => strings = decodeStringTable(pb.readSlice())
      case 2 => groups += pb.readSlice()
      case 17 => granularity = pb.readVarint()
      case 18 => dateGranularity = pb.readVarint()
      case 19 => latOffset = pb.readVarint()
      case 20 => lonOffset = pb.readVarint()
      case _ => pb.skip()
    }
    val st = strings
    val dg = dateGranularity
    def coordOf(offset: Long, v: Long): Double = 1e-9 * (offset + granularity * v)
    groups.result().iterator.flatMap(g =>
      decodeGroup(g, st, coordOf(latOffset, _), coordOf(lonOffset, _),
        if (withMeta) dg else 0L))
  }

  /** Info message (version/timestamp/changeset/uid/user_sid); timestamps
    * scale by the block's date_granularity to epoch millis. */
  private def decodeInfo(pb: Pb, st: Array[String], dateGran: Long): ElemMeta = {
    var version = 0
    var ts = 0L
    var changeset = 0L
    var uid = 0
    var user = ""
    while (pb.hasMore) pb.readTag() match {
      case 1 => version = pb.readVarint().toInt
      case 2 => ts = pb.readVarint() * dateGran
      case 3 => changeset = pb.readVarint()
      case 4 => uid = pb.readVarint().toInt
      case 5 => user = st(pb.readVarint().toInt)
      case _ => pb.skip()
    }
    ElemMeta(version, ts, changeset, uid, user)
  }

  private def decodeStringTable(pb: Pb): Array[String] = {
    val out = Array.newBuilder[String]
    while (pb.hasMore) pb.readTag() match {
      case 1 => out += new String(pb.readBytes(), "UTF-8")
      case _ => pb.skip()
    }
    out.result()
  }

  /** `dateGran` == 0 means "skip metadata" (the default fast path). */
  private def decodeGroup(
      pb: Pb,
      st: Array[String],
      lat: Long => Double,
      lon: Long => Double,
      dateGran: Long): Iterator[RawElement] = {
    val out = Iterator.newBuilder[RawElement] // preserves in-file order
    while (pb.hasMore) pb.readTag() match {
      case 1 => out += decodeNode(pb.readSlice(), st, lat, lon, dateGran)
      case 2 => out ++= decodeDense(pb.readSlice(), st, lat, lon, dateGran)
      case 3 => out += decodeWay(pb.readSlice(), st, dateGran)
      case 4 => out += decodeRelation(pb.readSlice(), st, dateGran)
      case _ => pb.skip()
    }
    out.result()
  }

  private def tagsOf(st: Array[String], keys: Array[Long], vals: Array[Long]): Map[String, String] = {
    if (keys.isEmpty) Map.empty
    else {
      val b = Map.newBuilder[String, String]
      var i = 0
      while (i < keys.length) {
        b += (st(keys(i).toInt) -> st(vals(i).toInt))
        i += 1
      }
      b.result()
    }
  }

  private def decodeNode(
      pb: Pb, st: Array[String], lat: Long => Double, lon: Long => Double,
      dateGran: Long): RawElement = {
    var id = 0L
    var rawLat = 0L
    var rawLon = 0L
    var keys: Array[Long] = Array.empty
    var vals: Array[Long] = Array.empty
    var meta: Option[ElemMeta] = None
    while (pb.hasMore) pb.readTag() match {
      case 1 => id = pb.readZigzag()
      case 2 => keys = pb.packedVarints()
      case 3 => vals = pb.packedVarints()
      case 4 if dateGran > 0 => meta = Some(decodeInfo(pb.readSlice(), st, dateGran))
      case 8 => rawLat = pb.readZigzag()
      case 9 => rawLon = pb.readZigzag()
      case _ => pb.skip()
    }
    RawElement(Kind.Node, id, Some(lon(rawLon)), Some(lat(rawLat)),
      tagsOf(st, keys, vals), Vector.empty, Vector.empty, Op.Create, meta)
  }

  private def decodeDense(
      pb: Pb, st: Array[String], lat: Long => Double, lon: Long => Double,
      dateGran: Long): Iterator[RawElement] = {
    var ids: Array[Long] = Array.empty
    var lats: Array[Long] = Array.empty
    var lons: Array[Long] = Array.empty
    var keysVals: Array[Long] = Array.empty
    var denseInfo: Pb = null
    while (pb.hasMore) pb.readTag() match {
      case 1 => ids = pb.packedZigzags()
      case 5 if dateGran > 0 => denseInfo = pb.readSlice()
      case 8 => lats = pb.packedZigzags()
      case 9 => lons = pb.packedZigzags()
      case 10 => keysVals = pb.packedVarints()
      case _ => pb.skip()
    }
    // DenseInfo: versions plain, the rest delta-coded (zigzag)
    var versions: Array[Long] = Array.empty
    var timestamps: Array[Long] = Array.empty
    var changesets: Array[Long] = Array.empty
    var uids: Array[Long] = Array.empty
    var userSids: Array[Long] = Array.empty
    if (denseInfo != null) {
      while (denseInfo.hasMore) denseInfo.readTag() match {
        case 1 => versions = denseInfo.packedVarints()
        case 2 => timestamps = denseInfo.packedZigzags()
        case 3 => changesets = denseInfo.packedZigzags()
        case 4 => uids = denseInfo.packedZigzags()
        case 5 => userSids = denseInfo.packedZigzags()
        case _ => denseInfo.skip()
      }
    }
    val n = ids.length
    val out = new Array[RawElement](n)
    var id = 0L
    var la = 0L
    var lo = 0L
    var kv = 0
    var ts = 0L
    var cs = 0L
    var uid = 0L
    var usid = 0L
    var i = 0
    while (i < n) {
      id += ids(i)
      la += lats(i)
      lo += lons(i)
      var meta: Option[ElemMeta] = None
      if (denseInfo != null && i < versions.length) {
        ts += (if (i < timestamps.length) timestamps(i) else 0L)
        cs += (if (i < changesets.length) changesets(i) else 0L)
        uid += (if (i < uids.length) uids(i) else 0L)
        usid += (if (i < userSids.length) userSids(i) else 0L)
        meta = Some(ElemMeta(versions(i).toInt, ts * dateGran, cs, uid.toInt,
          if (usid.toInt < st.length) st(usid.toInt) else ""))
      }
      var tags: Map[String, String] = Map.empty
      if (kv < keysVals.length) {
        val b = Map.newBuilder[String, String]
        var any = false
        while (kv < keysVals.length && keysVals(kv) != 0) {
          b += (st(keysVals(kv).toInt) -> st(keysVals(kv + 1).toInt))
          kv += 2
          any = true
        }
        kv += 1 // consume the 0 terminator
        if (any) tags = b.result()
      }
      out(i) = RawElement(Kind.Node, id, Some(lon(lo)), Some(lat(la)),
        tags, Vector.empty, Vector.empty, Op.Create, meta)
      i += 1
    }
    out.iterator
  }

  private def decodeWay(pb: Pb, st: Array[String], dateGran: Long): RawElement = {
    var id = 0L
    var keys: Array[Long] = Array.empty
    var vals: Array[Long] = Array.empty
    var refs: Array[Long] = Array.empty
    var meta: Option[ElemMeta] = None
    while (pb.hasMore) pb.readTag() match {
      case 1 => id = pb.readVarint()
      case 2 => keys = pb.packedVarints()
      case 3 => vals = pb.packedVarints()
      case 4 if dateGran > 0 => meta = Some(decodeInfo(pb.readSlice(), st, dateGran))
      case 8 => refs = pb.packedZigzags()
      case _ => pb.skip()
    }
    var acc = 0L
    val resolved = refs.map { d => acc += d; acc }
    RawElement(Kind.Way, id, None, None, tagsOf(st, keys, vals),
      resolved.toVector, Vector.empty, Op.Create, meta)
  }

  private def decodeRelation(pb: Pb, st: Array[String], dateGran: Long): RawElement = {
    var id = 0L
    var keys: Array[Long] = Array.empty
    var vals: Array[Long] = Array.empty
    var roles: Array[Long] = Array.empty
    var memids: Array[Long] = Array.empty
    var types: Array[Long] = Array.empty
    var meta: Option[ElemMeta] = None
    while (pb.hasMore) pb.readTag() match {
      case 1 => id = pb.readVarint()
      case 2 => keys = pb.packedVarints()
      case 3 => vals = pb.packedVarints()
      case 4 if dateGran > 0 => meta = Some(decodeInfo(pb.readSlice(), st, dateGran))
      case 8 => roles = pb.packedVarints()
      case 9 => memids = pb.packedZigzags()
      case 10 => types = pb.packedVarints()
      case _ => pb.skip()
    }
    var acc = 0L
    val members = Vector.newBuilder[RawMember]
    var i = 0
    while (i < memids.length) {
      acc += memids(i)
      members += RawMember(acc, types(i).toByte, st(roles(i).toInt))
      i += 1
    }
    RawElement(Kind.Relation, id, None, None, tagsOf(st, keys, vals),
      Vector.empty, members.result(), Op.Create, meta)
  }

  /** Hadoop Configuration is not serializable; standard wrapper. */
  private[sources] final class SerializableHadoopConf(
      @transient private var conf: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    def value: org.apache.hadoop.conf.Configuration = conf
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new org.apache.hadoop.conf.Configuration(false)
      conf.readFields(in)
    }
  }
}
