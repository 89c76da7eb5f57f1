package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused spelling of the repo-wide deterministic hash idiom
  * `cast(conv(substring(md5(s), start, n), 16, 10) as bigint)`.
  *
  * The chain is value-perfect but allocates per row: md5() renders a
  * 32-char hex UTF8String, substring() slices it, conv() re-parses the
  * hex back into the number the digest bytes already held. This
  * expression digests once and reads the hex-digit window straight out of
  * the digest — no hex string, no parse — inside whole-stage codegen
  * (defineCodeGen + a static helper, the VecDot/RollingHash packaging).
  * SAME values by construction, so every DuckDB oracle built on the
  * md5-prefix contract is untouched; a property spec pins equality with
  * the chain on arbitrary strings (unicode, empty, long).
  */
object Md5Bits {

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Value of hex digits [start, start+n) (1-based, n ≤ 15) of md5(s). */
  def md5Bits(s: UTF8String, start: Int, n: Int): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var acc = 0L
    var i = start - 1
    val end = start - 1 + n
    while (i < end) {
      val b = digest(i >> 1)
      val nibble = if ((i & 1) == 0) (b >> 4) & 0xF else b & 0xF
      acc = (acc << 4) | nibble
      i += 1
    }
    acc
  }
}

/** `md5_bits(s)` — the fused 60-bit (or narrower) md5-prefix hash. */
case class Md5BitsExpr(child: Expression, start: Int, n: Int)
    extends UnaryExpression {
  require(start >= 1 && n >= 1 && start - 1 + n <= 32 && n <= 15,
    "hex window must lie in the 32-char digest and fit a long")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_bits"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def nullSafeEval(v: Any): Any =
    Md5Bits.md5Bits(v.asInstanceOf[UTF8String], start, n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Bits.md5Bits($c, $start, $n)")
  override protected def withNewChildInternal(newChild: Expression): Md5BitsExpr =
    copy(child = newChild)
}

/** Column-API front door. */
object Md5BitsFunctions {
  /** The repo's standard 60-bit hash: hex chars 1..15 of md5(s). */
  def md5Bits60(s: Column): Column = md5Bits(s, 1, 15)

  def md5Bits(s: Column, start: Int, n: Int): Column =
    ColumnBridge.column(Md5BitsExpr(ColumnBridge.expression(s), start, n))
}
