package graft.sinks

import org.apache.spark.sql.DataFrame

import graft.mapping.CompiledMapping

/** Orchestrates a full PostGIS import session as one ordered statement
  * stream — the reference's most-used write path (import_/import.go with
  * database/postgis/postgis.go Init/Import/Finish and rotate.go Deploy):
  *
  *   1. create the import schema; per table DROP + CREATE TABLE +
  *      AddGeometryColumn (Init);
  *   2. COPY every table's rows through the [[Sink]] (Import — per
  *      partition, chunked);
  *   3. deferred index builds, after the bulk load (Finish, K4);
  *   4. optional blue/green schema rotation import → production →
  *      backup (Deploy, rotate.go:9-101).
  *
  * Statements go through `exec` — a live deployment passes a JDBC
  * statement executor, integration specs pass a recorder. Existence
  * checks that the reference performs against pg_tables
  * (rotate.go:40-52) are parameterized as `productionTables` /
  * `backupTables` so statement generation stays side-effect-free.
  */
object PostgisImport {

  /** The rotation statement stream of rotate.go:9-101: ensure both target
    * schemas, then per table (inside one transaction) drop a stale backup,
    * move production aside, move the import in.
    */
  def rotateSql(tables: Seq[String], prefix: String, source: String,
      dest: String, backup: String, destTables: Set[String],
      backupTables: Set[String]): Seq[String] = {
    val perTable = tables.flatMap { name =>
      val t = prefix + name
      val backupStep =
        if (destTables.contains(name)) {
          (if (backupTables.contains(name))
             Seq(s"""DROP TABLE IF EXISTS "$backup"."$t"""")
           else Seq.empty) :+
            s"""ALTER TABLE "$dest"."$t" SET SCHEMA "$backup""""
        } else Seq.empty
      backupStep :+ s"""ALTER TABLE "$source"."$t" SET SCHEMA "$dest""""
    }
    Seq(s"""CREATE SCHEMA IF NOT EXISTS "$dest"""",
      s"""CREATE SCHEMA IF NOT EXISTS "$backup"""",
      "BEGIN") ++ perTable :+ "COMMIT"
  }

  def run(exec: String => Unit, copy: Sink, mapping: CompiledMapping,
      tables: Map[String, DataFrame], srid: Int = 3857,
      prefix: String = "osm_", importSchema: String = "import",
      productionSchema: String = "public", backupSchema: String = "backup",
      deploy: Boolean = false, productionTables: Set[String] = Set.empty,
      backupTables: Set[String] = Set.empty): Unit = {
    val names = tables.keys.toSeq.sorted
    exec(s"""CREATE SCHEMA IF NOT EXISTS "$importSchema"""")
    for (name <- names) {
      val t = mapping.conf.tables(name)
      exec(s"""DROP TABLE IF EXISTS "$importSchema"."$prefix$name"""")
      exec(PostgisDdl.createTableSql(importSchema, prefix, t))
      PostgisDdl.addGeometryColumnSql(importSchema, prefix, t, srid)
        .foreach(exec)
    }
    for (name <- names) copy.write(name, tables(name))
    for {
      name <- names
      sql <- PostgisDdl.indexSql(importSchema, prefix, mapping.conf.tables(name))
    } exec(sql)
    if (deploy)
      rotateSql(names, prefix, importSchema, productionSchema, backupSchema,
        productionTables, backupTables).foreach(exec)
  }
}
