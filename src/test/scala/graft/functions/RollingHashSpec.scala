package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The codegen'd roll_* expressions must be value-identical to the
  * declarative HOF spelling they replaced (`ascii(substring(text, j, 1))`
  * folds) — including the edge semantics: reads past the end contribute
  * `ascii('') = 0`, sub-window strings hash one zero-padded window, the
  * empty string hashes to 0, and candidate position 1 is excluded.
  */
class RollingHashSpec extends SparkSpecBase {
  import spark.implicits._

  private val B = 131L
  private val M = 2147483647L

  private def hofFrame(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .withColumn("roll_hof", expr(
        s"aggregate(sequence(1, length(text)), 0L, " +
          s"(a, i) -> (a * $B + ascii(substring(text, i, 1))) % $M)"))
      .withColumn("minw_hof", expr(
        s"array_min(transform(sequence(1, greatest(length(text) - 7, 1)), " +
          s"i -> aggregate(sequence(i, i + 7), 0L, " +
          s"(a, j) -> (a * $B + ascii(substring(text, j, 1))) % $M)))"))
      .withColumn("cands_hof", expr(
        s"filter(transform(sequence(1, greatest(length(text) - 7, 1)), " +
          s"i -> if(aggregate(sequence(i, i + 7), 0L, " +
          s"(a, j) -> (a * $B + ascii(substring(text, j, 1))) % $M) % 64 = 0, i, -1)), " +
          "x -> x > 1)"))

  private val cases = Seq(
    "",                       // empty
    "a", "abcdefg",           // shorter than one window
    "abcdefgh",               // exactly one window
    "the quick brown fox jumps over the lazy dog",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",     // uniform — mask-periodic
    "größe straße çöğüş 中文分词测试 данные", // multibyte codepoints
    ("x" * 300) + "boundary candidates appear where the mask hits zero " * 4)

  test("codegen'd hashes equal the HOF spelling on edge and unicode cases") {
    val rows = hofFrame(cases)
      .withColumn("roll_n", graft.functions.RollingHashFunctions.rollHash(col("text"), B, M))
      .withColumn("minw_n", graft.functions.RollingHashFunctions.rollMinWindow(col("text"), B, M))
      .withColumn("cands_n", graft.functions.RollingHashFunctions.rollCandidates(col("text"), B, M, 64L))
      .collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("id")
      assert(r.getAs[Long]("roll_hof") == r.getAs[Long]("roll_n"), s"roll_hash case $id")
      assert(r.getAs[Long]("minw_hof") == r.getAs[Long]("minw_n"), s"min_window case $id")
      assert(r.getSeq[Int](r.fieldIndex("cands_hof")) ==
        r.getSeq[Int](r.fieldIndex("cands_n")), s"candidates case $id")
    }
  }

  test("expressions survive whole-stage codegen over a real scan") {
    val df = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"),
        graft.functions.RollingHashFunctions.rollHash(col("text"), B, M).as("h"),
        graft.functions.RollingHashFunctions.rollMinWindow(col("text"), B, M).as("mw"),
        size(graft.functions.RollingHashFunctions.rollCandidates(col("text"), B, M, 64L)).as("nc"))
    assert(df.count() > 0)
    // `*(1)` prefixes mark operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan.take(400))
  }
}
