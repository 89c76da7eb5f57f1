package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector hot path.
  *
  * Every similarity query reduces to sequential-fold dot products. The
  * declarative spelling — `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, …)` —
  * is correct but its higher-order functions evaluate their lambdas
  * interpreted (they are CodegenFallback in Spark), and reading a float
  * corpus first requires a `transform(_, cast)` that allocates a double
  * array per row per pair. `VecDot`/`VecNorm` compile to a tight primitive
  * loop inside whole-stage codegen and read float arrays directly, widening
  * each element to double at the multiply — bit-identical results to the
  * cast-then-fold spelling (float→double widening is exact, accumulation
  * order unchanged), with zero per-pair allocation.
  *
  * Null semantics mirror the HOF spelling: null array → null, any null
  * element → null, and length mismatch → null (zip_with pads with null).
  */
object VectorExpressions {
  private[functions] def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _                                                  => false
  }

  private[functions] def checkVecInputs(
      name: String, children: Seq[Expression]): TypeCheckResult =
    children.find(c => !isVec(c.dataType)) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<float> or array<double> inputs, got ${bad.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  private[functions] def elemGet(dt: DataType, arr: String, i: String): String =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }
}

/** Sequential-fold dot product of two float/double arrays, accumulated in
  * double — `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (s,x) -> s+x)` as
  * one codegen'd loop.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorExpressions._

  override def checkInputDataTypes(): TypeCheckResult =
    checkVecInputs(prettyName, Seq(left, right))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private lazy val leftFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${elemGet(left.dataType, a, i)} * ${elemGet(right.dataType, b, i)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** L2 norm: `sqrt(vec_dot(a, a))` in one pass — same accumulation order as
  * the fold-of-squares spelling.
  */
case class VecNorm(child: Expression)
    extends UnaryExpression {
  import VectorExpressions._

  override def checkInputDataTypes(): TypeCheckResult =
    checkVecInputs(prettyName, Seq(child))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_norm"

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $x = ${elemGet(child.dataType, a, i)};
         |  $acc += $x * $x;
         |}
         |if (!${ev.isNull}) ${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

/** Column-API and SQL-registry front door for the vec_* expressions. */
object VectorFunctions {

  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def vecNorm(a: Column): Column =
    ColumnBridge.column(VecNorm(ColumnBridge.expression(a)))

  /** Fold a required-literal argument, or raise a clean analysis error
    * naming the contract — without the foldability check a column argument
    * (e.g. md5_bits(s, 1, n_col)) escaped the builder as a raw
    * ClassCastException/NullPointerException. */
  private def literalValue(args: Seq[Expression], i: Int, fn: String,
      name: String): Any = {
    val e = args(i)
    val v = if (e.foldable) e.eval() else null
    if (v == null)
      throw new org.apache.spark.sql.AnalysisException(
        "INTERNAL_ERROR",
        Map("message" ->
          (s"$fn requires a non-null literal for argument '$name' " +
            s"(position ${i + 1}); got: ${e.sql}")))
    v
  }

  private def literalInt(args: Seq[Expression], i: Int, fn: String,
      name: String): Int = literalValue(args, i, fn, name) match {
    case n: Number => n.intValue()
    case other => throw new org.apache.spark.sql.AnalysisException(
      "INTERNAL_ERROR",
      Map("message" -> (s"$fn argument '$name' must be an integer " +
        s"literal; got: $other")))
  }

  private def literalString(args: Seq[Expression], i: Int, fn: String,
      name: String): String = literalValue(args, i, fn, name).toString

  private[functions] val descriptions: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))),
    (FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VecNorm].getName, "vec_norm"),
      (args: Seq[Expression]) => VecNorm(args.head)),
    // md5_bits(s, start, n) — start/n must be int literals (folded here so
    // the expression carries plain ints; usable inside SQL lambdas, where
    // the Column API can't reach). Foldability is checked so a column
    // argument raises a clean analysis error naming the contract instead
    // of a raw ClassCastException out of the builder.
    (FunctionIdentifier("md5_bits"),
      new ExpressionInfo(classOf[Md5BitsExpr].getName, "md5_bits"),
      (args: Seq[Expression]) => Md5BitsExpr(args(0),
        literalInt(args, 1, "md5_bits", "start"),
        literalInt(args, 2, "md5_bits", "n"))),
    // text_norm(s, 'NFC'|'NFD'|'NFKC'|'NFKD'|'STRIP_ACCENTS') — mode must
    // be a string literal (folded here, same contract as md5_bits)
    (FunctionIdentifier("text_norm"),
      new ExpressionInfo(classOf[TextNormExpr].getName, "text_norm"),
      (args: Seq[Expression]) => TextNormExpr(args(0),
        TextNorm.modeOf(literalString(args, 1, "text_norm", "mode")))),
    (FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[TextNormExpr].getName, "strip_accents"),
      (args: Seq[Expression]) => TextNormExpr(args.head,
        TextNorm.STRIP_ACCENTS)))

  /** Register vec_* into an existing session (for `spark.sql` use). */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) registers the vec_* functions and
  * the top-k-per-key planner strategy in every session of the application.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    VectorFunctions.descriptions.foreach(ext.injectFunction)
    org.apache.spark.sql.graft.TopKPerKey.inject(ext)
  }
}
