package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet state for incremental maintenance (SURVEY.md §2 ST3/ST4).
  *
  * Every maintained table (the four element frames, output tables, and
  * generalized tables) lives as `dir/<name>/v<seq>` parquet. A batch writes
  * all tables at `seq+1`, then atomically commits by rewriting `state.txt`
  * — the analog of the reference's `last.state.txt` (update/cmd.go:369-384).
  * A crash before commit leaves half-written `v<seq+1>` dirs that the retry
  * simply overwrites: the delete-then-insert batch is idempotent (ST2).
  */
final class StateStore(spark: SparkSession, dir: String) {

  private val root = new Path(dir)
  private def fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def statePath = new Path(root, "state.txt")

  /** Committed sequence, or -1 when the store is empty. */
  def currentSeq: Long = {
    if (!fs.exists(statePath)) -1L
    else {
      val in = fs.open(statePath)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        new String(buf, 0, math.max(n, 0), StandardCharsets.UTF_8).trim.toLong
      } finally in.close()
    }
  }

  def tablePath(name: String, seq: Long): String =
    new Path(new Path(root, name), s"v$seq").toString

  def read(name: String, seq: Long): DataFrame =
    spark.read.parquet(tablePath(name, seq))

  def write(name: String, seq: Long, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(tablePath(name, seq))

  /** Atomic-enough commit: temp file + rename. */
  def commit(seq: Long): Unit = {
    val tmp = new Path(root, s".state.txt.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$seq\n".getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (fs.exists(statePath)) fs.delete(statePath, false)
    fs.rename(tmp, statePath)
  }

  /** Drop versions older than `keep` behind the committed one. */
  def vacuum(names: Seq[String], keep: Int = 1): Unit = {
    val cur = currentSeq
    for (name <- names) {
      val d = new Path(root, name)
      if (fs.exists(d)) fs.listStatus(d).foreach { st =>
        val v = st.getPath.getName.stripPrefix("v")
        if (v.forall(_.isDigit) && v.nonEmpty && v.toLong < cur - keep)
          fs.delete(st.getPath, true)
      }
    }
  }
}
