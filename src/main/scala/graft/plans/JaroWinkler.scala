package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Jaro–Winkler similarity (Jaro '89,
  * Winkler '90 — the record-linkage field comparator) with the standard
  * parameterization every engine ships: match window
  * ⌊max(|a|,|b|)/2⌋ − 1, transpositions over matched sequences, prefix
  * scaling p = 0.1 capped at 4 applied only when the Jaro core exceeds
  * 0.7, and 0.0 when either side is empty. Byte-level comparison —
  * identical to character-level for the ASCII identifier/name columns
  * this verifies (same contract as [[HammingDist]]).
  *
  * The verify step of fuzzy-pair candidates (SymSpell / sorted-
  * neighborhood blocking) runs this per candidate pair; generated code
  * stays inside whole-stage codegen via a static call (the
  * ExpressionImplUtils pattern) — no boxing, no UDF bridge.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.JaroWinkler.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  val fnName = "jaro_winkler"

  /** The scalar kernel — static so generated code can call it. */
  def compute(a: UTF8String, b: UTF8String): Double = {
    val s = a.getBytes
    val t = b.getBytes
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var half = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s(i) != t(k)) half += 1
        k += 1
      }
      i += 1
    }
    val trans = half / 2
    val mm = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - trans) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val lMax = math.min(4, math.min(n, m))
    while (l < lMax && s(l) == t(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  private val info = new ExpressionInfo(classOf[JaroWinkler].getName, fnName)
  private val builder = (children: Seq[Expression]) => {
    require(children.length == 2, s"$fnName expects 2 arguments")
    JaroWinkler(children.head, children(1))
  }

  /** Imperative registration — works on ANY session, idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(fnName), info, builder)
}
