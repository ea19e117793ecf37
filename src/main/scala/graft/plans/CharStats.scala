package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-string character-distribution stats in ONE fused pass:
  * `struct(n_chars int, n_distinct int, entropy4 long)` where
  * `entropy4` is the Shannon entropy of the code-point distribution on
  * the engine's 1e-4 fixed-point grid — each character class
  * contributes the integer `round(1e4 · (k/n) · ln(n/k))` and the
  * integer parts sum order-free, so a DuckDB oracle replaying the same
  * per-class formula over an unnest/GROUP BY reaches the identical
  * total regardless of summation order (the BM25 ln-ulp-absorbing
  * idiom). Low entropy flags gibberish / repeated-character /
  * single-token spam that length and stopword signals miss.
  *
  * Scale: a pure per-row map — no explode, no shuffle; the alternative
  * (explode every character and aggregate) would shuffle one row PER
  * CHARACTER of the corpus. Code-point frequencies are counted in a
  * small open-addressed scan over the string (alphabet-bounded
  * distinct classes). Total: any string, including empty (all-zero
  * struct), yields a row. */
case class CharStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("entropy4", LongType, nullable = false)))
  override def prettyName: String = "char_stats"

  /** The kernel — public so the generated code can call it. */
  def stats(s0: UTF8String): InternalRow = {
    val cps = s0.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericInternalRow(Array[Any](0, 0, 0L))
    val counts = new java.util.HashMap[Int, Int]()
    var i = 0
    while (i < n) {
      counts.merge(cps(i), 1, Integer.sum _)
      i += 1
    }
    var entropy4 = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val k = it.next()
      entropy4 += math.round(
        1e4 * (k.toDouble / n) * math.log(n.toDouble / k))
    }
    new GenericInternalRow(Array[Any](n, counts.size(), entropy4))
  }

  override def nullSafeEval(input: Any): Any =
    stats(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("cs", this, classOf[CharStats].getName)
      s"${ev.value} = $self.stats($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharStats {
  val fnName = "char_stats"

  private val info = new ExpressionInfo(classOf[CharStats].getName, fnName)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.length == 1, s"$fnName expects (text)")
    CharStats(children.head)
  }

  /** Imperative registration — works on ANY session, idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(fnName), info, builder)
}
