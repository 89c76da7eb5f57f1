package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, shiftright}
import org.apache.spark.sql.types.{DataType, StructType}

/** Versioned parquet state for incremental maintenance (SURVEY.md §2 ST3/ST4).
  *
  * Every maintained table (the four element frames, output tables, and
  * generalized tables) lives under `dir/<name>/`. Two layouts:
  *
  *  - plain: `dir/<name>/v<seq>` holds the whole table (full rewrite per
  *    version — fine for small stores and tests);
  *  - bucketed: rows are range-bucketed by `id >> bucketBits`; a version
  *    writes parquet only for the buckets its batch touched, under
  *    `v<seq>/__b=<bucket>/`, plus a `_manifest` mapping EVERY bucket to
  *    the version dir that last wrote it. This is the scale path: one
  *    minutely diff of ~10⁴ clustered ids rewrites a handful of ~bucketSpan
  *    id ranges instead of 10⁹-row tables (the mini-snapshot scheme a
  *    Delta/Iceberg MERGE would give us on a managed lakehouse; the
  *    reference mutates rows in place via SQL DELETE+COPY instead
  *    (update/deleter.go, writer package) — which a columnar store can't).
  *
  * Range buckets (not hash): OSM ids are allocated sequentially and diffs
  * are temporally clustered, so consecutive new ids land in the same few
  * buckets; a hash would smear 10⁴ ids over 10⁴ distinct buckets and the
  * pruning would be worthless.
  *
  * A batch writes all tables at `seq+1`, then atomically commits by
  * rewriting `state.txt` — the analog of the reference's `last.state.txt`
  * (update/cmd.go:369-384). A crash before commit leaves half-written
  * `v<seq+1>` dirs that the retry simply overwrites: the delete-then-insert
  * batch is idempotent (ST2).
  */
final class StateStore(spark: SparkSession, dir: String) {

  private val root = new Path(dir)
  private def fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def statePath = new Path(root, "state.txt")
  private def tmpPath = new Path(root, ".state.txt.tmp")
  private def bitsPath = new Path(root, "bucketbits.txt")

  // ---- small control files --------------------------------------------------

  private def readSmall(p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def writeSmall(p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def readSeqFile(p: Path): Option[Long] = readSmall(p).trim.toLongOption

  // ---- bucketing ------------------------------------------------------------

  /** log2 of the id-range span per bucket; fixed at init time. Arithmetic
    * shift, not division: exact for the negative mangled way/relation ids
    * (RelIDOffset ≈ -1e17 is far outside double precision). */
  def setBucketBits(bits: Int): Unit = writeSmall(bitsPath, bits.toString)

  lazy val bucketBits: Int =
    if (fs.exists(bitsPath)) readSmall(bitsPath).trim.toInt else 22

  def bucketOf(idCol: Column): Column = shiftright(idCol, bucketBits)

  /** Distinct buckets of an id frame (driver-side control plane: diff id
    * sets are ~10⁴ rows). */
  def bucketsOf(ids: DataFrame, idCol: String): Set[Long] =
    ids.select(bucketOf(col(idCol)).as("b")).distinct()
      .collect().map(_.getLong(0)).toSet

  // ---- sequencing -----------------------------------------------------------

  /** Committed sequence, or -1 when the store is empty.
    *
    * Crash recovery: commit() writes the temp pointer only AFTER every
    * table of that version is durably on disk, so a parseable temp file is
    * itself proof of a committed version — a crash between the delete and
    * the rename (the non-atomic window) leaves only the temp. Finish the
    * interrupted rename here instead of refusing with "run init first".
    */
  def currentSeq: Long = {
    if (fs.exists(tmpPath)) {
      readSeqFile(tmpPath) match {
        case Some(seq) =>
          if (fs.exists(statePath)) fs.delete(statePath, false)
          fs.rename(tmpPath, statePath)
          return seq
        case None => fs.delete(tmpPath, false) // torn write: not yet committed
      }
    }
    if (!fs.exists(statePath)) -1L
    else readSeqFile(statePath).getOrElse(-1L)
  }

  /** Commit via temp file + rename; see currentSeq for the crash story. */
  def commit(seq: Long): Unit = {
    writeSmall(tmpPath, s"$seq\n")
    if (fs.exists(statePath)) fs.delete(statePath, false)
    fs.rename(tmpPath, statePath)
  }

  // ---- plain layout ---------------------------------------------------------

  def tablePath(name: String, seq: Long): String =
    new Path(new Path(root, name), s"v$seq").toString

  def write(name: String, seq: Long, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(tablePath(name, seq))

  /** Read either layout: a `_manifest` under v<seq> selects the bucketed
    * path; otherwise the version dir is the whole table. */
  def read(name: String, seq: Long): DataFrame = {
    val mp = manifestPath(name, seq)
    if (fs.exists(mp)) {
      val (schema, buckets) = readManifest(name, seq)
      if (buckets.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else {
        val base = new Path(root, name)
        spark.read.schema(schema)
          .parquet(buckets.values.toSeq.distinct.map(new Path(base, _).toString): _*)
      }
    } else spark.read.parquet(tablePath(name, seq))
  }

  // ---- bucketed layout ------------------------------------------------------

  /** Read ONLY the given buckets of a bucketed table — the diff path's
    * pruning: a small diff reads a handful of bucket dirs, not the table. */
  def readBuckets(name: String, seq: Long, buckets: Set[Long]): DataFrame = {
    val (schema, m) = readManifest(name, seq)
    val paths = m.filter { case (b, _) => buckets(b) }.values.toSeq.distinct
    if (paths.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else {
      val base = new Path(root, name)
      spark.read.schema(schema).parquet(paths.map(new Path(base, _).toString): _*)
    }
  }

  private def manifestPath(name: String, seq: Long): Path =
    new Path(new Path(tablePath(name, seq)), "_manifest")

  /** `_manifest`: line 1 = schema JSON; then `<bucket>\t<relative dir>`. */
  private def writeManifest(name: String, seq: Long, schema: StructType,
      buckets: Map[Long, String]): Unit = {
    val body = schema.json +: buckets.toSeq.sortBy(_._1)
      .map { case (b, p) => s"$b\t$p" }
    val vdir = new Path(tablePath(name, seq))
    if (!fs.exists(vdir)) fs.mkdirs(vdir)
    writeSmall(manifestPath(name, seq), body.mkString("\n"))
  }

  private def readManifest(name: String, seq: Long): (StructType, Map[Long, String]) = {
    val lines = readSmall(manifestPath(name, seq)).split("\n").toSeq
    val schema = DataType.fromJson(lines.head).asInstanceOf[StructType]
    val buckets = lines.tail.filter(_.nonEmpty).map { l =>
      val Array(b, p) = l.split("\t", 2)
      b.toLong -> p
    }.toMap
    (schema, buckets)
  }

  /** Bucket dirs actually produced by a partitioned write. */
  private def listBuckets(out: String): Seq[Long] = {
    val p = new Path(out)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("__b=")).map(_.stripPrefix("__b=").toLong)
  }

  /** Full bucketed write (init path): every row, partitioned by bucket.
    *
    * `sortWithin`: extra columns to sort by INSIDE each bucket's files.
    * Sorting ahead of the partitioned write (bucket first, then the extra
    * columns) means the writer sees its partition column already ordered
    * and keeps the row order — so parquet row groups carry tight min/max
    * stats on the sort columns, and a later pushed-down predicate on them
    * skips whole row groups instead of scanning the bucket.
    */
  def writeBucketed(name: String, seq: Long, df: DataFrame, idCol: String,
      sortWithin: Seq[String] = Nil): Unit = {
    val out = tablePath(name, seq)
    val bucketed = df.withColumn("__b", bucketOf(col(idCol)))
    val ordered =
      if (sortWithin.isEmpty) bucketed
      else bucketed.sortWithinPartitions(("__b" +: sortWithin).map(col): _*)
    ordered.write.mode("overwrite").partitionBy("__b").parquet(out)
    writeManifest(name, seq, df.schema,
      listBuckets(out).map(b => b -> s"v$seq/__b=$b").toMap)
  }

  /** Delta write: `df` must hold the COMPLETE new content of exactly the
    * `changed` buckets (rows of untouched buckets are carried forward by
    * manifest pointer, never rewritten). A row outside `changed` would be
    * silently shadowed on read, so it fails loudly instead. */
  def writeBucketedDelta(name: String, seq: Long, prevSeq: Long, df: DataFrame,
      idCol: String, changed: Set[Long], sortWithin: Seq[String] = Nil): Unit = {
    val (schema, prev) = readManifest(name, prevSeq)
    if (changed.isEmpty) {
      writeManifest(name, seq, schema, prev)
      return
    }
    val out = tablePath(name, seq)
    val bucketed = df.withColumn("__b", bucketOf(col(idCol)))
    val ordered =
      if (sortWithin.isEmpty) bucketed
      else bucketed.sortWithinPartitions(("__b" +: sortWithin).map(col): _*)
    ordered.write.mode("overwrite").partitionBy("__b").parquet(out)
    val written = listBuckets(out).toSet
    require(written.subsetOf(changed),
      s"$name v$seq: rows written to unchanged buckets ${written.diff(changed)} — " +
        "delta ids escaped the delete set")
    // changed buckets left with zero rows disappear from the manifest
    writeManifest(name, seq, schema,
      (prev -- changed) ++ written.map(b => b -> s"v$seq/__b=$b"))
  }

  /** Drop version dirs older than `keep` behind the committed one — except
    * dirs still referenced by the committed manifest (bucketed tables carry
    * old bucket dirs forward indefinitely until a diff rewrites them). */
  def vacuum(names: Seq[String], keep: Int = 1): Unit = {
    val cur = currentSeq
    for (name <- names) {
      val referenced: Set[Long] =
        if (fs.exists(manifestPath(name, cur)))
          readManifest(name, cur)._2.values
            .map(_.split("/")(0).stripPrefix("v").toLong).toSet
        else Set.empty
      val d = new Path(root, name)
      if (fs.exists(d)) fs.listStatus(d).foreach { st =>
        val v = st.getPath.getName.stripPrefix("v")
        if (v.forall(_.isDigit) && v.nonEmpty && v.toLong < cur - keep &&
          !referenced.contains(v.toLong))
          fs.delete(st.getPath, true)
      }
    }
  }
}
