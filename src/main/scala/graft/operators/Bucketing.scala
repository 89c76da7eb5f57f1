package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the co-located-join half of the 100 TB design
  * notes. Writing both sides of a recurring join bucketed (and sorted) by
  * the join key lets every subsequent join plan with ZERO exchanges: each
  * task reads matching buckets from both tables, so the shuffle is paid
  * once at write time and never again. This is the batch analog of the
  * StateStore's id-bucketed layout, applied to the relational tables
  * (lineitem⋈orders being the canonical repeated join).
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table (overwrites).
    *
    * Idempotent across JVMs: a fresh session's in-memory catalog has no
    * entry for `table`, but the previous JVM's run may have left the
    * managed location on disk — `saveAsTable` CTAS then fails with
    * LOCATION_ALREADY_EXISTS. Drop the catalog entry AND the orphaned
    * location before writing.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int = 8): Unit = {
    val spark = df.sparkSession
    // resolve qualification through the parser (handles db.tbl and a
    // non-default current database), then quote the PARTS — backtick-quoting
    // the whole string would make `db.tbl` one literal identifier and the
    // DROP would miss the real table
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val quoted =
      ident.database.map(d => s"`$d`.").getOrElse("") + s"`${ident.table}`"
    spark.sql(s"DROP TABLE IF EXISTS $quoted")
    val loc = new Path(spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table) // managed: spark.sql.warehouse.dir
  }

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the property bucketed co-location buys.
    */
  def shuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  /** Join two bucketed tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
