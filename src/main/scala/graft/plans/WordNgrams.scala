package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression producing word n-grams from a token
  * array: gram i = tokens[i·stride … i·stride + n − 1] joined by a
  * single space. `stride = 1` gives sliding shingles (the dedup /
  * fingerprint / census unit), `stride = n` gives non-overlapping
  * chunks (the span-dedup unit). Total by construction: fewer than `n`
  * tokens → empty array, no guard needed.
  *
  * This is the hottest explode in the engine — every shingle/chunk
  * pipeline runs it over the corpus. The higher-order-function
  * equivalent (`transform(sequence(...), i => concat_ws(" ",
  * slice(...)))`) is interpreted (CodegenFallback) and allocates a
  * lambda frame per gram; this generates one fused loop reusing a
  * parts buffer, and stays inside whole-stage codegen.
  */
case class WordNgrams(child: Expression, n: Int, stride: Int)
    extends UnaryExpression {
  require(n >= 1, "n must be >= 1")
  require(stride >= 1, "stride must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val cnt = if (m >= n) (m - n) / stride + 1 else 0
    val out = new Array[AnyRef](cnt)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < cnt) {
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i * stride + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
      val (m, cnt, out, parts, i, j) = (ctx.freshName("m"),
        ctx.freshName("cnt"), ctx.freshName("out"), ctx.freshName("parts"),
        ctx.freshName("i"), ctx.freshName("j"))
      val u = classOf[UTF8String].getName
      s"""
         |int $m = $a.numElements();
         |int $cnt = ($m >= $n) ? (($m - $n) / $stride + 1) : 0;
         |Object[] $out = new Object[$cnt];
         |$u[] $parts = new $u[$n];
         |for (int $i = 0; $i < $cnt; $i++) {
         |  for (int $j = 0; $j < $n; $j++) {
         |    $parts[$j] = $a.getUTF8String($i * $stride + $j);
         |  }
         |  $out[$i] = $u.concatWs($sepRef, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {
  val fnName = "word_ngrams"

  private val info = new ExpressionInfo(classOf[WordNgrams].getName, fnName)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.length == 3, s"$fnName expects (arr, n, stride)")
    (children(1), children(2)) match {
      case (Literal(n: Int, IntegerType), Literal(s: Int, IntegerType)) =>
        WordNgrams(children.head, n, s)
      case _ => throw new IllegalArgumentException(
        s"$fnName: n and stride must be integer literals")
    }
  }

  /** Imperative registration — works on ANY session, idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(fnName), info, builder)
}
