package graft.queries

import java.nio.file.Files

import graft.SparkSpecBase

/** The content-defined chunking property that fixed windows lack: editing a
  * document's tail leaves the leading chunk hashes untouched, because
  * boundaries derive from local content, not absolute offsets.
  */
class CdcChunkSpec extends SparkSpecBase {
  import spark.implicits._

  private def chunkHashes(docs: Seq[(Long, String)]): Map[Long, Seq[String]] = {
    val dir = Files.createTempDirectory("cdc").toString
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.SparkEntry.queries("d_chunks_cdc")(spark, dir)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getAs[Long]("chunk_idx")).toSeq
          .map(_.getAs[String]("chunk_md5"))
      }
  }

  test("tail edits keep leading chunk hashes identical") {
    // deterministic pseudo-text long enough for several boundaries
    val prefix = (1 to 80).map(i => s"w${i * 37 % 101}").mkString(" ")
    val a = prefix + " ending one flows along the original channel to the sea"
    val b = prefix + " a wholly different second ending replaces everything"
    val hashes = chunkHashes(Seq((1L, a), (2L, b)))
    val common = hashes(1L).zip(hashes(2L)).takeWhile { case (x, y) => x == y }
    assert(common.size >= 2,
      s"expected >=2 shared leading chunks, got ${common.size} " +
        s"(doc1=${hashes(1L).size} chunks, doc2=${hashes(2L).size})")
    // and the tails DID diverge — the test isn't vacuous
    assert(hashes(1L).last != hashes(2L).last)
  }

  test("boundary-free text is cut every CdcMaxLen chars; all chunks bounded") {
    // 'a' repeated never satisfies hash % 64 == 0 (residue 7), so without
    // the max guard this would be one 500-char chunk
    val dir = Files.createTempDirectory("cdc3").toString
    Seq((9L, "a" * 500)).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("d_chunks_cdc")(spark, dir)
      .collect().sortBy(_.getAs[Long]("chunk_idx"))
    assert(rows.map(_.getAs[Long]("start_pos")).toSeq == Seq(1L, 129L, 257L, 385L))
    assert(rows.map(_.getAs[Long]("n_chars")).toSeq == Seq(128L, 128L, 128L, 116L))
  }

  test("no chunk is shorter than CdcMinLen except a document's last") {
    val docs = (1L to 6L).map(i =>
      i -> (1 to 150).map(j => s"v${(i * 7 + j * 53) % 97}").mkString(" "))
    val dir = Files.createTempDirectory("cdc4").toString
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val byDoc = graft.SparkEntry.queries("d_chunks_cdc")(spark, dir)
      .collect().groupBy(_.getAs[Long]("doc_id"))
    byDoc.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("chunk_idx")).map(_.getAs[Long]("n_chars"))
      assert(sorted.forall(_ <= 128L), sorted.mkString(","))
      assert(sorted.dropRight(1).forall(_ >= 32L), sorted.mkString(","))
    }
  }

  test("chunks tile the document exactly") {
    val text = (1 to 120).map(i => s"t${i * 53 % 97}").mkString(" ")
    val dir = Files.createTempDirectory("cdc2").toString
    Seq((7L, text)).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("d_chunks_cdc")(spark, dir)
      .collect().sortBy(_.getAs[Long]("chunk_idx"))
    assert(rows.head.getAs[Long]("start_pos") == 1L)
    rows.sliding(2).foreach {
      case Array(prev, next) =>
        assert(next.getAs[Long]("start_pos") ==
          prev.getAs[Long]("start_pos") + prev.getAs[Long]("n_chars"))
      case _ =>
    }
    assert(rows.map(_.getAs[Long]("n_chars")).sum == text.length.toLong)
  }
}
