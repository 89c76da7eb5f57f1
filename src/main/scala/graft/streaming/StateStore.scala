package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod, shiftright, xxhash64}
import org.apache.spark.sql.types.{DataType, StructType}

/** Versioned parquet state for incremental maintenance (SURVEY.md §2 ST3/ST4).
  *
  * Every maintained table (the four element frames, output tables, and
  * generalized tables) lives under `dir/<name>/`. Two layouts:
  *
  *  - plain: `dir/<name>/v<seq>` holds the whole table (full rewrite per
  *    version — fine for small stores and tests);
  *  - bucketed + merge-on-read: the BASE is hash-bucketed by id under
  *    `v<seq>/__b=<bucket>/`; each later version appends a delta SEGMENT
  *    (this batch's insert rows + delete-id tombstones, `v<seq>/ins|del`)
  *    and a `_manifest` listing the base bucket map plus the ordered
  *    segments. Reads fold newest-wins via one broadcast anti-join;
  *    `readBuckets` file-prunes the base to the requested buckets. After
  *    `maxSegments` a write compacts the merged view into a fresh base.
  *    This is the LSM / lakehouse-MERGE shape: per-batch write volume is
  *    O(changed) — the reference mutates rows in place via SQL
  *    DELETE+COPY (update/deleter.go, writer package), which a columnar
  *    store can't; copy-on-write bucket rewrites were measured to amplify
  *    a spread-out 10³-element batch into a near-full store rewrite.
  *
  * A batch writes all tables at `seq+1`, then atomically commits by
  * rewriting `state.txt` — the analog of the reference's `last.state.txt`
  * (update/cmd.go:369-384). A crash before commit leaves half-written
  * `v<seq+1>` dirs that the retry simply overwrites: the delete-then-insert
  * batch is idempotent (ST2).
  */
final class StateStore(spark: SparkSession, dir: String) {

  // A merged view passes every bucket dir as its own path (the manifest
  // may point different buckets at different version dirs), so a full
  // read hands Spark 100s–1000s of paths. Above the default
  // parallelPartitionDiscovery threshold (32) Spark launches a LISTING
  // JOB per view — ~170 ms of job overhead × ~33 tables dominated the
  // diff apply's tail (measured 5.7 s/batch), while driver-side listing
  // of the same dirs is sub-millisecond each. Keep discovery on the
  // driver for the store's views; a real cluster against object storage
  // wants the opposite, so the knob stays overridable (session conf
  // `graft.store.listThreshold` wins, then the env var). The setting is
  // SCOPED to the store's own reads — set before each file-index build
  // and restored after (r9 advice: the old constructor-global set leaked
  // driver-side listing into every later read in the session).
  private val listThreshold: String =
    spark.conf.getOption("graft.store.listThreshold")
      .orElse(sys.env.get("SPARK_GRAFT_LIST_THRESHOLD"))
      .getOrElse("65536")

  /** Run `f` (a `spark.read.parquet` call — parquet resolves its file
    * index eagerly at DataFrame creation) with the store's discovery
    * threshold, restoring the session's previous value after. Store reads
    * run concurrently (the diff apply fans table rebuilds across threads),
    * so the save/restore is DEPTH-COUNTED: the first scope in saves the
    * session value, the last one out restores it — plain save/restore
    * would race two scopes into "restoring" each other's override back
    * into the session. The counter is keyed PER SESSION (r10 advice): the
    * conf is per-SparkSession, so a process-global counter would let
    * interleaved scopes on two sessions (spark.newSession()) restore
    * session A's saved threshold into session B and leak the override
    * into A permanently. All stores of a session resolve the same
    * threshold (env/conf), so nesting different values is not a case. */
  private def withListScope[T](f: => T): T = {
    val key = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    StateStore.scopeLock.synchronized {
      val (depth, saved) = Option(StateStore.scopes.get(spark))
        .getOrElse((0, None))
      val keep = if (depth == 0) spark.conf.getOption(key) else saved
      StateStore.scopes.put(spark, (depth + 1, keep))
      spark.conf.set(key, listThreshold)
    }
    try f
    finally StateStore.scopeLock.synchronized {
      val (depth, saved) = StateStore.scopes.get(spark)
      if (depth == 1) {
        StateStore.scopes.remove(spark)
        saved match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      } else StateStore.scopes.put(spark, (depth - 1, saved))
    }
  }

  private val root = new Path(dir)
  private def fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def statePath = new Path(root, "state.txt")
  private def tmpPath = new Path(root, ".state.txt.tmp")
  private def bitsPath = new Path(root, "bucketbits.txt")
  private def bucketsPath = new Path(root, "buckets.txt")

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

  /** Fix the store's bucketing for its life: `n` HASH buckets
    * (pmod(xxhash64(id), n)). Hash, not id-range shift: bucket population
    * is then uniform for ANY id distribution — range bucketing shattered a
    * store whose ids carried a 2^40 stride into ~75k near-empty bucket
    * dirs (every scan paid 75k file opens; a small diff apply measured
    * 267 s mostly in file overhead), and the same hazard exists for any
    * sparse or mangled id space. Pruning semantics are identical: the
    * bucket of an id is computable without a lookup, so a changed-id set
    * still maps to ≤ min(|ids|, n) buckets. */
  def setHashBuckets(n: Int): Unit = writeSmall(bucketsPath, s"hash:$n")

  /** Legacy id-range scheme (id >> bits); kept so existing stores read. */
  def setBucketBits(bits: Int): Unit = writeSmall(bitsPath, bits.toString)

  // Left(bits) = legacy range shift, Right(n) = hash buckets
  private lazy val scheme: Either[Int, Int] =
    if (fs.exists(bucketsPath))
      Right(readSmall(bucketsPath).trim.stripPrefix("hash:").toInt)
    else if (fs.exists(bitsPath)) Left(readSmall(bitsPath).trim.toInt)
    else Right(1024)

  def bucketOf(idCol: Column): Column = scheme match {
    // arithmetic shift, not division: exact for the negative mangled
    // way/relation ids (RelIDOffset ≈ -1e17 is far outside double precision)
    case Left(bits) => shiftright(idCol, bits)
    case Right(n) => pmod(xxhash64(idCol), lit(n.toLong))
  }

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

  private def replSeqPath = new Path(root, "replseq.txt")
  private def replSeqTmp = new Path(root, ".replseq.txt.tmp")

  /** Sequence-order gate state for streaming replication replays (see
    * DiffPipeline.applyBatchFiles):
    * `<lastSeq> <batchId> <seqBeforeBatch> <firstFile>` — the last applied
    * replication-file sequence, the micro-batch that applied it, the
    * sequence high-water before that batch started (the rollback baseline
    * when a crashed batch is re-delivered), and the basename of the
    * batch's first file (replay identity must not rest on batchId alone:
    * a rebuilt checkpoint restarts batchIds at 0). Written tmp+rename
    * like commit(): a plain truncating overwrite torn by a crash would
    * parse as None and silently DISABLE the out-of-order gate in exactly
    * the crash-and-replay scenario it exists for; with the rename, a torn
    * write leaves the previous state intact. A crash after commit() but
    * before this write just re-applies the file on restart, which
    * delete-then-insert makes safe (ST2). */
  def readReplSeq: Option[(Long, Long, Long, String)] = {
    // Mirror currentSeq's crash recovery: writeReplSeq's delete→rename has a
    // window where replseq.txt is absent but a fully-written tmp exists. A
    // parseable tmp is proof of a completed write (writeSmall closed it), so
    // finish the interrupted rename instead of returning None — None here
    // silently DISABLES the out-of-order gate in exactly the crash-and-replay
    // scenario it exists for. An unparseable tmp is a torn write: discard it.
    if (fs.exists(replSeqTmp)) {
      val parsed = parseReplSeq(readSmall(replSeqTmp))
      parsed match {
        case Some(state) =>
          if (fs.exists(replSeqPath)) fs.delete(replSeqPath, false)
          // a refused rename (rare fs semantics) is non-fatal on the READ
          // side: the tmp still holds the newest committed state, so serve
          // it either way and let the next read retry the rename
          fs.rename(replSeqTmp, replSeqPath)
          return Some(state)
        case None => fs.delete(replSeqTmp, false)
      }
    }
    if (!fs.exists(replSeqPath)) None
    else parseReplSeq(readSmall(replSeqPath))
  }

  private def parseReplSeq(s: String): Option[(Long, Long, Long, String)] =
    s.trim.split("\\s+", 4) match {
      case Array(a, b, c, f) =>
        for (x <- a.toLongOption; y <- b.toLongOption; z <- c.toLongOption)
          yield (x, y, z, f)
      case _ => None
    }

  def writeReplSeq(lastSeq: Long, batchId: Long, seqBefore: Long,
      firstFile: String): Unit = {
    writeSmall(replSeqTmp, s"$lastSeq $batchId $seqBefore $firstFile\n")
    if (fs.exists(replSeqPath)) fs.delete(replSeqPath, false)
    // HDFS-style FileSystems report rename failure by returning false, not
    // throwing; the gate's correctness hangs on this write landing, so a
    // silent false would validate the next batch against a stale baseline.
    if (!fs.rename(replSeqTmp, replSeqPath))
      throw new java.io.IOException(
        s"replseq gate state rename failed: $replSeqTmp -> $replSeqPath")
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
    if (fs.exists(mp)) mergedView(name, seq, None)
    else withListScope(spark.read.parquet(tablePath(name, seq)))
  }

  // ---- bucketed layout ------------------------------------------------------

  /** Read ONLY the given buckets of a bucketed table — the diff path's
    * pruning: a small diff reads a handful of bucket dirs, not the table. */
  def readBuckets(name: String, seq: Long, buckets: Set[Long]): DataFrame =
    mergedView(name, seq, Some(buckets))

  /** The merge-on-read fold: base buckets (file-pruned to `only` when
    * given) unioned with every delta segment's inserts, with a row hidden
    * when ANY LATER segment tombstones its id — one broadcast anti-join
    * with an (id-equi + ordinal) condition; tombstones are batch-sized, so
    * the broadcast is bounded by MaxSegments × batch size.
    *
    * Segment scans (r13, guide §2.4/§6): writeDelta stamps each segment's
    * fold ordinal into the files (`__ord`/`__tord` columns), so ALL
    * stamped segments of a table read as ONE parquet scan instead of one
    * scan + union per segment. A long-running diff stream accumulates up
    * to maxSegments segments per table, and every closure/rebuild read of
    * every table paid N file indexes + an N-way union per view — measured
    * as the per-batch wall growing 4.1 s → 12.4 s (closure) across one
    * 8-batch compaction cycle of the soak. Legacy unstamped segments
    * (pre-r13 stores) keep the per-segment path. */
  private def mergedView(name: String, seq: Long, only: Option[Set[Long]]): DataFrame = {
    val m = readManifest(name, seq)
    val base = new Path(root, name)
    def rd(schema: StructType, rel: Seq[String]): DataFrame =
      if (rel.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else withListScope(spark.read.schema(schema)
        .parquet(rel.map(r => new Path(base, r).toString): _*))
    val bucketPaths = (only match {
      case Some(bs) => m.buckets.filter { case (b, _) => bs(b) }
      case None => m.buckets
    }).values.toSeq.distinct
    val baseDf = rd(m.schema, bucketPaths)
    if (m.segments.isEmpty) return baseDf
    val idCol = m.segments.head.idCol
    val tombCol = m.segments.head.tombCol
    import org.apache.spark.sql.functions.broadcast
    def pruned(df: DataFrame): DataFrame = only match {
      case Some(bs) => df.filter(bucketOf(col(idCol)).isInCollection(bs))
      case None => df
    }
    val ordered = m.segments.zipWithIndex
    val (stamped, legacy) = ordered.partition(_._1.stamped)
    // stamped segments: one scan carrying its own __ord column
    val stampedScan =
      if (stamped.isEmpty) Nil
      else Seq(pruned(rd(
        StructType(m.schema.fields :+
          org.apache.spark.sql.types.StructField("__ord",
            org.apache.spark.sql.types.LongType)),
        stamped.map(_._1.ins))))
    val legacyScans = legacy.map { case (s, i) =>
      pruned(rd(m.schema, Seq(s.ins)).withColumn("__ord", lit(i + 1L)))
    }
    val withOrd = ((baseDf.withColumn("__ord", lit(0L)) +: legacyScans) ++
      stampedScan).reduce(_ unionByName _)
    val tombSchema = StructType(Seq(m.schema(tombCol)))
    val tombStamped =
      if (stamped.isEmpty) Nil
      else Seq(rd(
        StructType(tombSchema.fields :+
          org.apache.spark.sql.types.StructField("__tord",
            org.apache.spark.sql.types.LongType)),
        stamped.map(_._1.del)))
    val tombLegacy = legacy.map { case (s, i) =>
      rd(tombSchema, Seq(s.del)).withColumn("__tord", lit(i + 1L))
    }
    val tombs = (tombLegacy ++ tombStamped).reduce(_ unionByName _)
      .withColumnRenamed(tombCol, "__tid")
    withOrd.join(broadcast(tombs),
        withOrd(tombCol) === tombs("__tid") && tombs("__tord") > withOrd("__ord"),
        "left_anti")
      .drop("__ord")
  }

  private def manifestPath(name: String, seq: Long): Path =
    new Path(new Path(tablePath(name, seq)), "_manifest")

  // `stamped`: the segment's ins/del files physically carry their fold
  // ordinal (`__ord`/`__tord` columns, written by writeDelta since r13) so
  // ALL stamped segments of a table read as ONE parquet scan. Legacy
  // segments (no columns) still read one-scan-per-segment.
  private final case class Segment(idCol: String, tombCol: String,
      ins: String, del: String, stamped: Boolean = false)
  private final case class Manifest(schema: StructType,
      buckets: Map[Long, String], segments: Seq[Segment])

  /** `_manifest`: line 1 = schema JSON; then `<bucket>\t<relative dir>`
    * base-map lines; then ordered
    * `SEG\t<idCol>\t<tombCol>\t<insDir>\t<delDir>` (legacy) or
    * `SEGO\t…` (ordinal-stamped files, r13) lines — merge-on-read delta
    * segments, oldest first. */
  private def writeManifest(name: String, seq: Long, schema: StructType,
      buckets: Map[Long, String], segments: Seq[Segment] = Nil): Unit = {
    val body = schema.json +:
      (buckets.toSeq.sortBy(_._1).map { case (b, p) => s"$b\t$p" } ++
        segments.map(s => s"${if (s.stamped) "SEGO" else "SEG"}\t" +
          s"${s.idCol}\t${s.tombCol}\t${s.ins}\t${s.del}"))
    val vdir = new Path(tablePath(name, seq))
    if (!fs.exists(vdir)) fs.mkdirs(vdir)
    writeSmall(manifestPath(name, seq), body.mkString("\n"))
  }

  private def readManifest(name: String, seq: Long): Manifest = {
    val lines = readSmall(manifestPath(name, seq)).split("\n").toSeq
    val schema = DataType.fromJson(lines.head).asInstanceOf[StructType]
    val (segLines, bucketLines) = lines.tail.filter(_.nonEmpty)
      .partition(l => l.startsWith("SEG\t") || l.startsWith("SEGO\t"))
    val buckets = bucketLines.map { l =>
      val Array(b, p) = l.split("\t", 2)
      b.toLong -> p
    }.toMap
    val segments = segLines.map { l =>
      val Array(tag, idCol, tombCol, ins, del) = l.split("\t", 5)
      Segment(idCol, tombCol, ins, del, stamped = tag == "SEGO")
    }
    Manifest(schema, buckets, segments)
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
    // shuffle rows to their bucket BEFORE the partitioned write: without
    // it every write task holds up to nBuckets open parquet writers at
    // once (writer memory + one small file per task×bucket — a 30-table
    // init measured 12 min mostly here); after it each task streams a few
    // whole buckets sequentially and a bucket is one file
    val bucketed = df.withColumn("__b", bucketOf(col(idCol)))
      .repartition(col("__b"))
    val ordered =
      bucketed.sortWithinPartitions(("__b" +: sortWithin).map(col): _*)
    ordered.write.mode("overwrite").partitionBy("__b").parquet(out)
    writeManifest(name, seq, df.schema,
      listBuckets(out).map(b => b -> s"v$seq/__b=$b").toMap)
  }

  /** Merge-on-read delta write — the diff path's O(changed) version step:
    * append ONLY the batch's insert rows and delete-id tombstones as a new
    * SEGMENT of the table; no bucket is rewritten. This is the LSM /
    * lakehouse-MERGE shape. The copy-on-write spelling it replaces
    * (rewrite every touched bucket whole) amplified a spread-out batch
    * into a near-full store rewrite: 1.7k changed nodes × 1024 buckets
    * touched ~80% of every table and measured 375 s end-to-end; with
    * fine buckets it drowned in per-file overhead instead (75k dirs,
    * 267 s). Write volume here is the batch itself.
    *
    * Delete-then-insert semantics ride on segment ORDER: a segment's
    * tombstones hide matching ids in all EARLIER segments and the base;
    * its own inserts survive. Re-running the same (seq, batch) overwrites
    * the same segment dirs — idempotent, like the bucket path was.
    *
    * After `maxSegments` the write COMPACTS instead: the merged previous
    * view (minus this batch's deletes, plus its inserts) is rewritten as a
    * fresh bucketed base — read cost stays bounded while amortizing the
    * full rewrite over maxSegments batches.
    */
  def writeDelta(name: String, seq: Long, prevSeq: Long, inserts: DataFrame,
      deleteIds: DataFrame, idCol: String, sortWithin: Seq[String] = Nil,
      maxSegments: Int = 8, tombstoneCol: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions.broadcast
    // tombstoneCol: hide-by column when it differs from the bucketing id
    // (reverse indexes bucket by the REFERENCED id but delete by the
    // REFERRER — e.g. wayrefs buckets by ref node id, tombstones by way_id)
    val tc = tombstoneCol.getOrElse(idCol)
    val m = readManifest(name, prevSeq)
    if (m.segments.size >= maxSegments) {
      val merged = mergedView(name, prevSeq, None)
        .join(broadcast(deleteIds.select(col(tc))), Seq(tc), "left_anti")
        .unionByName(inserts)
      writeBucketed(name, seq, merged, idCol, sortWithin)
    } else {
      val vdir = tablePath(name, seq)
      // stamp the fold ordinal into the files (position in the manifest's
      // segment list, 1-based — stable: segments only append until a
      // compaction clears the list) so every later read folds ALL stamped
      // segments in one scan (see mergedView). lit() columns cost nothing
      // in the write and make the read O(1) scans instead of O(segments).
      val ord = m.segments.size + 1L
      val ins = if (sortWithin.isEmpty) inserts
        else inserts.sortWithinPartitions(sortWithin.map(col): _*)
      ins.withColumn("__ord", lit(ord))
        .write.mode("overwrite").parquet(s"$vdir/ins")
      deleteIds.select(col(tc)).withColumn("__tord", lit(ord))
        .write.mode("overwrite").parquet(s"$vdir/del")
      writeManifest(name, seq, m.schema, m.buckets,
        m.segments :+ Segment(idCol, tc, s"v$seq/ins", s"v$seq/del",
          stamped = true))
    }
  }

  /** Version step with NO changes for this table: carry the previous
    * manifest forward (same base buckets, same segments) so readers of
    * v<seq> see the identical table — zero Spark jobs, no new segment.
    * r13 (§2.4): a node-move-only diff batch wrote EMPTY ins+del segments
    * for ways/relations/wayrefs/relrefs every batch; the empty segments
    * still cost two write jobs each at write time and a fold level in
    * every later read, and dragged untouched tables into compaction. */
  def writeUnchanged(name: String, seq: Long, prevSeq: Long): Unit = {
    val m = readManifest(name, prevSeq)
    writeManifest(name, seq, m.schema, m.buckets, m.segments)
  }

  /** Drop version dirs older than `keep` behind the committed one — except
    * dirs still referenced by the committed manifest (bucketed tables carry
    * old bucket dirs and delta segments forward until a compaction). */
  def vacuum(names: Seq[String], keep: Int = 1): Unit = {
    val cur = currentSeq
    for (name <- names) {
      val referenced: Set[Long] =
        if (fs.exists(manifestPath(name, cur))) {
          val m = readManifest(name, cur)
          (m.buckets.values ++ m.segments.flatMap(s => Seq(s.ins, s.del)))
            .map(_.split("/")(0).stripPrefix("v").toLong).toSet
        } else Set.empty
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

private[streaming] object StateStore {
  // withListScope's depth-counted session-conf save/restore (see there).
  // Keyed by session IDENTITY: the threshold conf lives per SparkSession,
  // so each session gets its own (depth, saved) pair.
  private[streaming] val scopeLock = new Object
  private[streaming] val scopes =
    new java.util.IdentityHashMap[SparkSession, (Int, Option[String])]
}
