package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** VecDot/VecNorm parity with the HOF spelling (bit-identical doubles),
  * null semantics, codegen-vs-interpreted agreement, and SQL registration.
  */
class VectorExpressionsSpec extends SparkSpecBase {

  private def emb = spark.read
    .parquet(s"$sf001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private val hofDotSelf =
    expr("aggregate(zip_with(e, e, (x, y) -> x * y), 0D, (a, x) -> a + x)")

  test("vec_dot on raw floats is bit-identical to cast-then-fold HOFs") {
    val both = emb
      .withColumn("e", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("hof", hofDotSelf)
      .withColumn("native_d", VectorFunctions.vecDot(col("e"), col("e")))
      .withColumn("native_f", VectorFunctions.vecDot(col("embedding"), col("embedding")))
      .select("vec_id", "hof", "native_d", "native_f")
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (h, d, f) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      // bit-level equality, not epsilon: same op order, exact f->d widening
      assert(java.lang.Double.doubleToLongBits(h) == java.lang.Double.doubleToLongBits(d),
        s"vec ${r.getLong(0)}: hof=$h native_double=$d")
      assert(java.lang.Double.doubleToLongBits(h) == java.lang.Double.doubleToLongBits(f),
        s"vec ${r.getLong(0)}: hof=$h native_float=$f")
    }
  }

  test("vec_norm matches sqrt of the HOF sum of squares") {
    val rows = emb
      .withColumn("e", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("hof", sqrt(hofDotSelf))
      .withColumn("native", VectorFunctions.vecNorm(col("embedding")))
      .select("hof", "native").collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null semantics: null array, null element, length mismatch") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0, 2.0), Array(3.0, 4.0)),   // 11.0
      (2L, null, Array(1.0)),                   // null array
      (3L, Array(1.0, 2.0), Array(1.0))         // length mismatch
    ).toDF("id", "a", "b")
      .withColumn("d", VectorFunctions.vecDot(col("a"), col("b")))
    val byId = df.select("id", "d").collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getDouble(1) == 11.0)
    assert(byId(2L).isNullAt(1))
    assert(byId(3L).isNullAt(1))

    // null ELEMENT (array<double> with a hole) -> null, matching zip_with
    val hole = spark.sql(
      "SELECT array(1.0D, cast(null as double)) AS a, array(2.0D, 3.0D) AS b")
      .withColumn("d", VectorFunctions.vecDot(col("a"), col("b")))
      .withColumn("hof",
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, x) -> s + x)"))
      .head()
    assert(hole.isNullAt(2) && hole.isNullAt(3))
  }

  test("codegen and interpreted paths agree") {
    val modes = Seq("CODEGEN_ONLY", "NO_CODEGEN").map { mode =>
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try emb
        .withColumn("d", VectorFunctions.vecDot(col("embedding"), col("embedding")))
        .withColumn("n", VectorFunctions.vecNorm(col("embedding")))
        .orderBy("vec_id").select("d", "n").collect().toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(modes.head == modes.last)
  }

  test("SQL registration via register() and the session extension") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "vec_norm(array(3.0D, 4.0D)) AS n").head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0)
    // extension class wires the same descriptions (smoke: it applies cleanly)
    // and installs the window-rewrite optimizer rule
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(org.apache.spark.sql.graft.TopKPerKey
      .injectedOptimizerRules(ext, spark)
      .contains(org.apache.spark.sql.graft.TopKRewriteRule))
  }
}
