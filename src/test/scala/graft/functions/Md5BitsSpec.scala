package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.SparkSpecBase

class Md5BitsSpec extends SparkSpecBase with TableDrivenPropertyChecks {

  private def chainVsFused(strings: Seq[String], start: Int, n: Int): Unit = {
    import spark.implicits._
    val df = strings.toDF("s")
      .withColumn("chain", expr(
        s"cast(conv(substring(md5(s), $start, $n), 16, 10) as bigint)"))
      .withColumn("fused", Md5BitsFunctions.md5Bits(col("s"), start, n))
    val bad = df.filter(col("chain") =!= col("fused")).collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  private val samples = Seq(
    "", "a", "hello world", "The quick brown fox", "0",
    "ünïcødé — ∂ƒ≈ç", "日本語テキスト", "emoji 🚀🔥 mix",
    "x" * 10000, (0 until 256).map(_.toChar).mkString)

  test("fused hash equals the conv(substring(md5)) chain on edge strings") {
    for ((start, n) <- Seq((1, 15), (1, 8), (9, 8), (17, 15), (2, 7)))
      chainVsFused(samples, start, n)
  }

  test("fused hash equals the chain on random strings (seeded)") {
    val rnd = new scala.util.Random(42)
    val strings = Seq.fill(2000)(rnd.alphanumeric.take(rnd.nextInt(80)).mkString)
    chainVsFused(strings, 1, 15)
    chainVsFused(strings, 1, 8)
  }

  test("SQL registry rejects non-literal start/n/mode with an analysis error") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val df = Seq(("abc", 3)).toDF("s", "n")
    // a column where a literal is required must surface as a clean
    // AnalysisException naming the contract, not a raw ClassCastException
    // out of the function builder
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("md5_bits(s, 1, n)").collect()
    }
    assert(e1.getMessage.contains("md5_bits"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("text_norm(s, s)").collect()
    }
    assert(e2.getMessage.contains("text_norm"))
    // the literal path still works through the same guard
    assert(df.selectExpr("md5_bits(s, 1, 8)").head().getLong(0) ==
      df.selectExpr("cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint)")
        .head().getLong(0))
  }

  test("null input stays null; codegen and interpreted agree") {
    import spark.implicits._
    val df = Seq(Some("abc"), None).toDF("s")
      .withColumn("h", Md5BitsFunctions.md5Bits60(col("s")))
    val rows = df.orderBy("s").collect()
    assert(rows.exists(_.isNullAt(1)))
    val nonNull = rows.filter(!_.isNullAt(1)).map(_.getLong(1)).toSeq
    val expected = Seq("abc").toDF("s")
      .selectExpr("cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)")
      .collect().map(_.getLong(0)).toSeq
    assert(nonNull == expected)
  }
}
