package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression for the Johnson–Lindenstrauss ±1 sign
  * projection: out[j] = (Σ_i sign(j,i)·x[i]) / √dimOut, signs the
  * deterministic md5-derived constant matrix from [[JlProject.signs]].
  *
  * Why native: the unrolled Column equivalent is a dimOut×dimIn-term
  * expression tree (1 024 adds at 64→16) that blows the JVM's 64 KB
  * method limit inside `Generate` codegen and drops the whole stage to
  * interpreted execution. This generates two small loops over a
  * reference-carried sign matrix — constant code size at any
  * dimensionality, stays inside whole-stage codegen.
  *
  * The summation order (i ascending, left fold) and the ±1.0 double
  * multiplies are bit-identical to the unrolled SQL the oracle runs
  * ([[graft.operators.Embeddings.jlProjectSql]]).
  */
case class JlProjectExpr(child: Expression, dimIn: Int, dimOut: Int)
    extends UnaryExpression {
  require(dimIn >= 1, "dimIn must be >= 1")
  require(dimOut >= 1, "dimOut must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = JlProject.fnName

  private lazy val signs: Array[Array[Int]] = JlProject.signs(dimOut, dimIn)
  private val scale = math.sqrt(dimOut.toDouble)
  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // a null ELEMENT — or an array shorter than dimIn — nulls the whole
  // projection (reading past numElements or a null slot as a primitive
  // would silently yield garbage: UnsafeArrayData does no bounds
  // checks — the null-element class meanPool handles by skipping; a
  // projection can't skip, so it propagates)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < dimIn) return null
    var i = 0
    while (i < dimIn) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Any](dimOut)
    val fl = isFloat
    var j = 0
    while (j < dimOut) {
      val row = signs(j)
      var s = 0.0
      i = 0
      while (i < dimIn) {
        val x = if (fl) arr.getFloat(i).toDouble else arr.getDouble(i)
        s += row(i) * x
        i += 1
      }
      out(j) = s / scale
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullable: Boolean = true

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val signsRef = ctx.addReferenceObj("signs", signs, "int[][]")
      val (out, s, i, j, anyNull) = (ctx.freshName("out"), ctx.freshName("s"),
        ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("anyNull"))
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |boolean $anyNull = $a.numElements() < $dimIn;
         |for (int $i = 0; !$anyNull && $i < $dimIn; $i++) {
         |  if ($a.isNullAt($i)) { $anyNull = true; }
         |}
         |if ($anyNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  Object[] $out = new Object[$dimOut];
         |  for (int $j = 0; $j < $dimOut; $j++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dimIn; $i++) {
         |      $s += $signsRef[$j][$i] * ($get);
         |    }
         |    $out[$j] = Double.valueOf($s / ${scale}D);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JlProject {
  val fnName = "jl_project"

  /** Deterministic ±1 sign matrix: sign(j, i) is the parity of the
    * first byte of md5("j:i") — a fixed, engine-independent constant
    * (the projection is data-independent, so the "random" matrix can be
    * pseudo-random from a public hash and every consumer — this
    * expression, the oracle SQL — inlines the SAME values). */
  def signs(dimOut: Int, dimIn: Int): Array[Array[Int]] = {
    val mdt = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dimOut, dimIn) { (j, i) =>
      val d = mdt.digest(s"$j:$i".getBytes("UTF-8"))
      if ((d(0) & 1) == 0) 1 else -1
    }
  }

  private val info = new ExpressionInfo(classOf[JlProjectExpr].getName, fnName)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.length == 3, s"$fnName expects (vec, dimIn, dimOut)")
    (children(1), children(2)) match {
      case (Literal(dIn: Int, IntegerType), Literal(dOut: Int, IntegerType)) =>
        JlProjectExpr(children.head, dIn, dOut)
      case _ => throw new IllegalArgumentException(
        s"$fnName: dimIn and dimOut must be integer literals")
    }
  }

  /** Imperative registration — works on ANY session, idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(fnName), info, builder)
}
