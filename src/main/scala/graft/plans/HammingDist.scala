package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the Hamming distance between two
  * equal-length signature strings (e.g. the 64-char '0'/'1' SimHash
  * signatures) — a single fused byte-compare loop in generated code, no
  * per-position array materialization, stays inside whole-stage
  * codegen. The verify step of banded SimHash pairing runs this per
  * candidate pair, which is the hot loop of that operator.
  *
  * Byte comparison equals character comparison for the ASCII signature
  * alphabet; mismatched lengths are an error, never truncated.
  */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got ($l, $r)")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    val n = x.numBytes()
    if (n != y.numBytes()) throw new IllegalArgumentException(
      s"hamming_dist: length mismatch ($n vs ${y.numBytes()})")
    val xb = x.getBytes; val yb = y.getBytes
    var d = 0; var i = 0
    while (i < n) { if (xb(i) != yb(i)) d += 1; i += 1 }
    d
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, xb, yb, d, i) = (ctx.freshName("n"), ctx.freshName("xb"),
        ctx.freshName("yb"), ctx.freshName("d"), ctx.freshName("i"))
      s"""
         |int $n = $a.numBytes();
         |if ($n != $b.numBytes()) {
         |  throw new IllegalArgumentException(
         |    "hamming_dist: length mismatch (" + $n + " vs " + $b.numBytes() + ")");
         |}
         |byte[] $xb = $a.getBytes();
         |byte[] $yb = $b.getBytes();
         |int $d = 0;
         |for (int $i = 0; $i < $n; $i++) { if ($xb[$i] != $yb[$i]) $d++; }
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HammingDist {
  val fnName = "hamming_dist"

  private val info = new ExpressionInfo(classOf[HammingDist].getName, fnName)
  private val builder = (children: Seq[Expression]) => {
    require(children.length == 2, s"$fnName expects 2 arguments")
    HammingDist(children.head, children(1))
  }

  /** Imperative registration — works on ANY session, idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(fnName), info, builder)
}
