package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over
  * `array<float>` — the (b) rung of the custom-operator ladder
  * (SURVEY.md §4.2): one fused loop in generated code instead of the
  * higher-order-function chain (zip_with → aggregate ×3), no
  * intermediate arrays, stays inside whole-stage codegen.
  *
  * Summation is in index order (identical to both the HOF
  * implementation and the unrolled DuckDB oracle SQL → bit-identical
  * doubles across all three).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // Zero-vector convention (shared with VectorFunctions.cosine): cos(0,0)
  // = 1.0 (identical inputs are fully similar), cos(0,y≠0) = 0.0. The
  // denominator is sqrt(na·nb) — one sqrt of the product — so for x == x
  // (dot == na == nb) the result is EXACTLY 1.0, since IEEE-754's correctly
  // rounded sqrt gives sqrt(fl(s·s)) == s absent over/underflow. That makes
  // the FoldSelfCosine rewrite (cosine_sim(x,x) → 1.0) an identity for
  // every input. Mismatched vector lengths are an error, never truncated.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) throw new IllegalArgumentException(
      s"cosine_sim: vector length mismatch ($n vs ${y.numElements()})")
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    if (na == 0 && nb == 0) 1.0
    else if (na == 0 || nb == 0) 0.0
    else dot / math.sqrt(na * nb)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, dot, na, nb, i, den) = (ctx.freshName("n"), ctx.freshName("dot"),
        ctx.freshName("na"), ctx.freshName("nb"), ctx.freshName("i"), ctx.freshName("den"))
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "cosine_sim: vector length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = (double) $a.getFloat($i);
         |  double y = (double) $b.getFloat($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |double $den = Math.sqrt($na * $nb);
         |${ev.value} = ($na == 0 && $nb == 0) ? 1.0
         |  : (($na == 0 || $nb == 0) ? 0.0 : $dot / $den);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  val fnName = "cosine_sim"

  private val info = new ExpressionInfo(classOf[CosineSim].getName, fnName)
  private val builder = (children: Seq[Expression]) => {
    require(children.length == 2, s"$fnName expects 2 arguments")
    CosineSim(children.head, children(1))
  }

  /** Imperative registration — works on ANY session (the driver's
    * Verify/Bench sessions included), idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(fnName), info, builder)
}

/** Optimizer rule: `cosine_sim(x, x)` is identically 1.0 — fold the
  * self-comparison to a null-preserving constant instead of running the
  * fused loop per row. Demonstrates the `Rule[LogicalPlan]` extension
  * rung on a rewrite with a real payoff (the diagonal of any self-join
  * similarity matrix). Exact for every input: zero vectors hit the
  * cos(0,0)=1 convention, and non-zero x gives dot==na==nb so
  * dot/sqrt(na·nb) == s²/sqrt(fl(s²·s²)) == 1.0 exactly under IEEE-754
  * correctly-rounded sqrt (absent over/underflow, impossible for
  * float-typed inputs summed in double). */
object FoldSelfCosine extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{If, IsNull, Literal}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSim(a, b) if a.deterministic && a.semanticEquals(b) =>
        If(IsNull(a), Literal.create(null, DoubleType), Literal(1.0))
    }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — the
  * SparkSessionExtensions route for cluster-wide installation. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier(CosineSim.fnName),
      new ExpressionInfo(classOf[CosineSim].getName, CosineSim.fnName),
      (children: Seq[Expression]) => CosineSim(children.head, children(1))))
    ext.injectFunction((FunctionIdentifier(HammingDist.fnName),
      new ExpressionInfo(classOf[HammingDist].getName, HammingDist.fnName),
      (children: Seq[Expression]) => HammingDist(children.head, children(1))))
    ext.injectFunction((FunctionIdentifier(WordNgrams.fnName),
      new ExpressionInfo(classOf[WordNgrams].getName, WordNgrams.fnName),
      WordNgrams.builder))
    ext.injectFunction((FunctionIdentifier(JlProject.fnName),
      new ExpressionInfo(classOf[JlProjectExpr].getName, JlProject.fnName),
      JlProject.builder))
    ext.injectFunction((FunctionIdentifier(JaroWinkler.fnName),
      new ExpressionInfo(classOf[JaroWinkler].getName, JaroWinkler.fnName),
      (children: Seq[Expression]) => JaroWinkler(children.head, children(1))))
    ext.injectOptimizerRule(_ => FoldSelfCosine)
  }
}
