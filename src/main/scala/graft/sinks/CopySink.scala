package graft.sinks

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.mapping.{CompiledMapping, TableConf}

/** PostgreSQL COPY text-format rendering (K1's live write path; reference
  * database/postgis/tx.go:30-106 feeds pq CopyIn statements per table —
  * here each Spark partition streams `COPY ... FROM STDIN` chunks).
  *
  * Rendering rules (PostgreSQL COPY TEXT):
  *  - fields tab-separated, rows newline-terminated, NULL = `\N`;
  *  - `\`, tab, newline, CR escaped as `\\`, `\t`, `\n`, `\r`;
  *  - booleans `t`/`f`;
  *  - geometry (WKB bytes) as hex EWKB — PostGIS parses it natively;
  *  - hstore as `"k"=>"v",...` with `\` and `"` doubled inside quotes
  *    (reference mapping/columns.go:171,186-195 hstoreReplacer).
  */
object CopyRows {

  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '\t' => sb.append("\\t")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def hstoreEscape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** `"k"=>"v"` pairs, comma-joined (columns.go:186-195). */
  def hstore(m: scala.collection.Map[String, String]): String =
    m.map { case (k, v) =>
      "\"" + hstoreEscape(k) + "\"=>\"" + hstoreEscape(v) + "\""
    }.mkString(",")

  private val HexDigits = "0123456789ABCDEF".toCharArray

  def geomHex(wkb: Array[Byte]): String = {
    val out = new Array[Char](wkb.length * 2)
    var i = 0
    while (i < wkb.length) {
      out(2 * i) = HexDigits((wkb(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(wkb(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def renderField(v: Any, dt: DataType): String = v match {
    case null => "\\N"
    case b: Boolean => if (b) "t" else "f"
    case bytes: Array[Byte] => geomHex(bytes)
    case m: scala.collection.Map[_, _] =>
      escape(hstore(m.asInstanceOf[scala.collection.Map[String, String]]))
    case other => escape(other.toString)
  }

  /** One COPY TEXT line (no trailing newline). */
  def renderRow(row: Row, schema: StructType): String =
    schema.fields.indices.map { i =>
      renderField(row.get(i), schema.fields(i).dataType)
    }.mkString("\t")
}

/** One per-task COPY channel. `copyIn` receives the COPY statement plus a
  * chunk of rendered TEXT rows; implementations stream it to the server.
  */
trait CopyTarget extends java.io.Closeable {
  def copyIn(sql: String, data: String): Unit
}

/** Opens a [[CopyTarget]] inside an executor task — must be serializable
  * because the factory (not the target) ships with the closure.
  */
trait CopyTargetFactory extends Serializable {
  def open(): CopyTarget
}

/** Production factory: pgjdbc CopyManager, loaded by reflection so the
  * PostgreSQL driver stays a runtime-optional dependency (this build ships
  * none; deployments drop postgresql.jar on the executor classpath).
  */
final class PgJdbcCopyFactory(url: String, properties: Properties)
  extends CopyTargetFactory {
  override def open(): CopyTarget = new CopyTarget {
    private val conn = DriverManager.getConnection(url, properties)
    private val baseClass = Class.forName("org.postgresql.core.BaseConnection")
    private val cmClass = Class.forName("org.postgresql.copy.CopyManager")
    private val cm = cmClass.getConstructor(baseClass)
      .newInstance(conn.unwrap(baseClass).asInstanceOf[Object])
    private val copyInM =
      cmClass.getMethod("copyIn", classOf[String], classOf[java.io.Reader])
    override def copyIn(sql: String, data: String): Unit =
      copyInM.invoke(cm, sql, new java.io.StringReader(data))
    override def close(): Unit = conn.close()
  }
}

/** Live COPY sink: `foreachPartition`, one [[CopyTarget]] per non-empty
  * partition — the Spark analog of the reference's per-table feeder
  * goroutine (tx.go:30-44) with cluster-wide parallelism instead of one
  * goroutine per table. The factory indirection lets integration specs
  * swap pgjdbc for a recording fake and assert the exact statement/chunk
  * stream without a live server.
  */
final class CopySink(factory: CopyTargetFactory, schema: String,
    prefix: String = "osm_", chunkRows: Int = 10000) extends Sink with Serializable {

  def this(url: String, properties: Properties, schema: String,
      prefix: String, chunkRows: Int) =
    this(new PgJdbcCopyFactory(url, properties), schema, prefix, chunkRows)

  override def write(name: String, df: DataFrame): Unit = {
    val copySql =
      s"""COPY "$schema"."$prefix$name" (${df.columns.map(c => s""""$c"""").mkString(", ")}) FROM STDIN"""
    val rowSchema = df.schema
    val (f, chunk) = (factory, chunkRows)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val target = f.open()
        try rows.grouped(chunk).foreach { batch =>
          val sb = new StringBuilder
          batch.foreach { r => sb.append(CopyRows.renderRow(r, rowSchema)).append('\n') }
          target.copyIn(copySql, sb.toString)
        } finally target.close()
      }
    }
  }
}

object CopySink {
  /** The statement a table's COPY stream uses (asserted in SinksSpec). */
  def copyStatement(mapping: CompiledMapping, schema: String, prefix: String,
      table: TableConf): String = PostgisDdl.copySql(schema, prefix, table)
}
