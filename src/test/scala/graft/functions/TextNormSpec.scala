package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpecBase

class TextNormSpec extends SparkSpecBase {

  // explicit escapes — composed vs decomposed must be byte-exact in source
  private val Composed   = "caf\u00e9"        // é as one code point
  private val Decomposed = "cafe\u0301"       // e + combining acute

  private val samples = Seq(
    "", "plain ascii text", Composed, Decomposed,
    "\u00c5 \u212b",              // Å letter vs angstrom sign (NFC-distinct)
    "ﬁle",                   // ﬁ ligature (NFKC → "fi")
    "½ + ¼",            // vulgar fractions (NFKC-expanded)
    "áéí", "日本語",
    "emoji 🚀 mix", "x" * 5000,
    s"mixed $Composed $Decomposed straße")

  test("each mode matches java.text.Normalizer on edge strings") {
    for ((mode, form) <- Seq(
        ("NFC", Normalizer.Form.NFC), ("NFD", Normalizer.Form.NFD),
        ("NFKC", Normalizer.Form.NFKC), ("NFKD", Normalizer.Form.NFKD));
      s <- samples) {
      val got = TextNorm.normalize(
        UTF8String.fromString(s), TextNorm.modeOf(mode)).toString
      assert(got == Normalizer.normalize(s, form), s"$mode on ${s.take(30)}")
    }
  }

  test("strip accents: NFD, drop marks, recompose") {
    val cases = Seq(
      Composed -> "cafe", Decomposed -> "cafe",
      "áöü" -> "aou", "naïve" -> "naive",
      "plain" -> "plain", "" -> "")
    for ((in, want) <- cases)
      assert(TextNorm.normalize(
        UTF8String.fromString(in), TextNorm.STRIP_ACCENTS).toString == want)
  }

  test("ascii fast path returns the SAME object; normalization idempotent") {
    val ascii = UTF8String.fromString("all ascii, no allocation")
    assert(TextNorm.normalize(ascii, TextNorm.NFKC) eq ascii)
    val once = TextNorm.normalize(
      UTF8String.fromString(s"$Decomposed ﬁle"), TextNorm.NFKC)
    assert(TextNorm.normalize(once, TextNorm.NFKC) == once)
  }

  test("codegen and interpreted agree; nulls stay null; SQL names registered") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq(Some(Composed), Some(Decomposed), None).toDF("s")
      .withColumn("nfc_sql", expr("text_norm(s, 'NFC')"))
      .withColumn("nfc_col", TextNormFunctions.textNorm(col("s"), "NFC"))
      .withColumn("stripped", expr("strip_accents(s)"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(1)) == 1)
    for (r <- rows if !r.isNullAt(0)) {
      assert(r.getString(1) == Composed) // both forms normalize to composed
      assert(r.getString(1) == r.getString(2))
      assert(r.getString(3) == "cafe")
    }
  }

  test("NFC dedup collapses byte-distinct canonically-equal docs") {
    import spark.implicits._
    val df = Seq((1L, s"$Composed menu"), (2L, s"$Decomposed menu"),
      (3L, "other")).toDF("doc_id", "text")
    assert(df.select(col("text")).distinct().count() == 3)
    val n = df.select(TextNormFunctions.textNorm(col("text"), "NFC").as("t"))
      .distinct().count()
    assert(n == 2)
  }
}
