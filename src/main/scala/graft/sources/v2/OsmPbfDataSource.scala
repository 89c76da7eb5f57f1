package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoder, ExpressionEncoder}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.model.RawElement
import graft.sources.OsmPbf

/** DataSource V2 surface for the PBF reader (SURVEY.md §2 S1):
  *
  * {{{ spark.read.format("osmpbf").load("/path/planet.osm.pbf") }}}
  *
  * yields the RawElement schema (kind, id, lon, lat, tags, refs, members,
  * op, meta). Option `includeMetadata=true` decodes version/timestamp/
  * changeset/uid/user (parser/pbf/parser.go:17 `IncludeMetadata` analog).
  *
  * Planning mirrors the reference's blob-parallel decode (parser.go
  * NumCPU goroutines): a header-only scan indexes OSMData blob byte
  * ranges (~20 bytes read per ~8 MB blob), the index splits into input
  * partitions, and each task seeks + inflates + decodes its own ranges.
  * The library API ([[graft.sources.OsmPbf.read]]) remains the richer
  * path (per-kind tag prefilter push-down, Bundle splitting); this is
  * the standard entry for plain SQL/DataFrame users.
  */
final class OsmPbfDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "osmpbf"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OsmPbfDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OsmPbfTable(properties.asScala.toMap)
}

object OsmPbfDataSource {
  val schema: StructType = Encoders.product[RawElement].schema

  private[v2] def encoder: ExpressionEncoder[RawElement] =
    ExpressionEncoder(Encoders.product[RawElement].asInstanceOf[AgnosticEncoder[RawElement]])
}

private[v2] final class OsmPbfTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"osmpbf(${props.getOrElse("path", "?")})"
  override def schema(): StructType = OsmPbfDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val path = Option(options.get("path")).orElse(props.get("path"))
      .getOrElse(throw new IllegalArgumentException("osmpbf: missing path"))
    val withMeta = options.getBoolean("includeMetadata", false)
    // option("limitto", coverage.geojson) [+ limittobuffer degrees]:
    // blob-level bbox prune at PLANNING time — out-of-coverage blobs never
    // become input partitions (parity with the library path's
    // read(coverage = ...); reference reader/reader.go:215-227 semantics
    // at blob granularity)
    val coverage = Option(options.get("limitto")).orElse(props.get("limitto"))
      .map(p => new graft.operators.Limitto(p,
        bufferDist = options.getDouble("limittobuffer", 0.0), srid = 4326))
    () => new OsmPbfScan(path, withMeta, coverage)
  }
}

private[v2] final case class OsmPbfInputPartition(blobs: Seq[OsmPbf.BlobRange])
    extends InputPartition

private[v2] final class OsmPbfScan(path: String, withMeta: Boolean,
    coverage: Option[graft.operators.Limitto] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = OsmPbfDataSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"osmpbf $path${if (coverage.nonEmpty) " (limitto-pruned)" else ""}"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val index = OsmPbf.prunedIndex(OsmPbf.blobIndex(spark, path), coverage)
    if (index.isEmpty) return Array.empty
    // same sizing as the library path: ~4 blobs per split, capped by
    // cluster parallelism so a planet file fans out and Monaco doesn't
    val parallelism = math.max(spark.sparkContext.defaultParallelism, 1)
    val nSplits = math.min(math.max(index.size / 4, 1), parallelism * 4)
    val perSplit = math.ceil(index.size.toDouble / nSplits).toInt
    index.grouped(perSplit).map(OsmPbfInputPartition(_): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new OsmPbf.SerializableHadoopConf(
      SparkSession.active.sparkContext.hadoopConfiguration)
    new OsmPbfReaderFactory(conf, withMeta)
  }
}

private[v2] final class OsmPbfReaderFactory(
    conf: OsmPbf.SerializableHadoopConf,
    withMeta: Boolean) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val blobs = partition.asInstanceOf[OsmPbfInputPartition].blobs
    new PartitionReader[InternalRow] {
      private val serializer = OsmPbfDataSource.encoder.createSerializer()
      private val it: Iterator[RawElement] = blobs.iterator.flatMap { br =>
        val fs = new org.apache.hadoop.fs.Path(br.path).getFileSystem(conf.value)
        val in = fs.open(new org.apache.hadoop.fs.Path(br.path))
        val buf = new Array[Byte](br.length)
        try { in.seek(br.offset); in.readFully(buf) } finally in.close()
        OsmPbf.decodeDataBlob(buf, withMeta)
      }
      private var current: RawElement = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        current = it.next(); true
      }
      override def get(): InternalRow = serializer(current)
      override def close(): Unit = ()
    }
  }
}
