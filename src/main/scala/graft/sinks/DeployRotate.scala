package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Blue/green deploy rotation (SURVEY.md §2 K6; reference
  * database/postgis/rotate.go:9-131).
  *
  * The reference rotates PostGIS schemas: import -> production, previous
  * production -> backup. Over parquet output the same semantics are
  * directory renames, which are atomic per table on HDFS-like filesystems:
  * readers keep a consistent production view, and `revert` undoes a bad
  * deploy from the backup.
  */
final class DeployRotate(spark: SparkSession, baseDir: String,
    importDir: String = "import", productionDir: String = "production",
    backupDir: String = "backup") {

  private val root = new Path(baseDir)
  private def fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tablesIn(schema: String): Seq[String] = {
    val d = new Path(root, schema)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq.filter(_.isDirectory).map(_.getPath.getName)
  }

  private def move(table: String, from: String, to: String): Unit = {
    val src = new Path(new Path(root, from), table)
    val dstDir = new Path(root, to)
    if (!fs.exists(dstDir)) fs.mkdirs(dstDir)
    val dst = new Path(dstDir, table)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(src, dst)
  }

  /** import -> production; existing production -> backup (rotate.go:9-75). */
  def deploy(): Unit = {
    val imports = tablesIn(importDir)
    require(imports.nonEmpty, s"nothing to deploy in $baseDir/$importDir")
    for (t <- imports) {
      if (tablesIn(productionDir).contains(t)) move(t, productionDir, backupDir)
      move(t, importDir, productionDir)
    }
  }

  /** production -> import; backup -> production (rotate.go:103-117). */
  def revert(): Unit = {
    for (t <- tablesIn(productionDir)) move(t, productionDir, importDir)
    for (t <- tablesIn(backupDir)) move(t, backupDir, productionDir)
  }

  /** Drop the backup schema (rotate.go:119-131). */
  def removeBackup(): Unit = {
    val d = new Path(root, backupDir)
    if (fs.exists(d)) fs.delete(d, true)
  }

  def productionTables: Seq[String] = tablesIn(productionDir)
}
