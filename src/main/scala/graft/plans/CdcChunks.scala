package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking: split a string (over Unicode code
  * points) or a binary blob (over unsigned bytes) at positions where a
  * Rabin-Karp rolling hash of the trailing `w` codes hits a mask
  * (h % mask == 0) — the storage-dedup boundary rule (LBFS/rsync
  * lineage) that makes chunk boundaries a function of LOCAL CONTENT
  * rather than absolute position. Insert or delete a prefix and every
  * fixed-stride chunk shifts; CDC boundaries re-synchronize one window
  * past the edit, so all later chunks are byte-identical and exact
  * chunk-hash dedup still finds the shared tail. The binary form makes
  * the whole CDC family (dup census, snapshot delta, the ingestion
  * store) apply to media payloads: a re-containered blob — same
  * essence bytes behind a different metadata prefix — still shares
  * nearly all its chunks.
  *
  * The hash is the standard polynomial fingerprint over Unicode code
  * points, h(e) = Σ_{j=0}^{w-1} cp[e-j]·B^j mod M with B = 31,
  * M = 1 000 003, maintained in O(1) per position (subtract the
  * outgoing code point's B^{w-1} term, multiply by B, add the
  * incoming) — O(len) per string total, zero allocation until the
  * final chunk array. Every cut position p satisfies
  * (Σ cp·B^j mod M) % mask == 0 over the window ending at p, a purely
  * positional predicate (no min/max chunk-length state), so an oracle
  * can replay the exact boundary set with independent per-position
  * window sums. The final boundary is always the string end; a string
  * shorter than `w` is one chunk; the empty string has no chunks.
  *
  * Total by construction: any string input yields a (possibly empty)
  * chunk array whose concatenation is exactly the input. Stays inside
  * whole-stage codegen (the generated code makes one call into the
  * compiled kernel per row, like the codec expressions).
  */
case class CdcChunks(child: Expression, w: Int, mask: Int)
    extends UnaryExpression {
  require(w >= 2, "window must be >= 2")
  require(mask >= 2, "mask must be >= 2")

  import CdcChunks.{B, M}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string or binary, got $t")
  }
  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  private val bPowW1: Long = {
    var p = 1L
    var k = 0
    while (k < w - 1) { p = p * B % M; k += 1 }
    p
  }

  /** Cut boundaries (1-based, final = n) over any code sequence. */
  private def boundaries(codes: Array[Int]): Array[Int] = {
    val n = codes.length
    val bs = Array.newBuilder[Int]
    if (n > w) {
      var h = 0L
      var k = 0
      while (k < w) { h = (h * B + codes(k)) % M; k += 1 } // window ends at e = w-1
      var e = w - 1
      while (e < n - 1) {                                  // interior cuts only
        if (h % mask == 0) bs += e + 1                     // 1-based cut position
        h = ((h - codes(e - w + 1) * bPowW1) % M + M) % M
        h = (h * B + codes(e + 1)) % M
        e += 1
      }
    }
    bs += n
    bs.result()
  }

  /** The kernel — public so the generated code can call it. Dispatches
    * on the runtime payload: strings chunk over Unicode code points,
    * blobs over unsigned byte values (so for ASCII payloads the two
    * forms cut at identical offsets — spec-asserted). */
  def split(input: Object): ArrayData = input match {
    case s0: UTF8String =>
      val s = s0.toString
      val cps = s.codePoints().toArray
      if (cps.length == 0) return new GenericArrayData(Array.empty[AnyRef])
      val cuts = boundaries(cps)
      val out = new Array[AnyRef](cuts.length)
      var prevCp = 0
      var prevCh = 0
      var i = 0
      while (i < cuts.length) {
        val endCh = s.offsetByCodePoints(prevCh, cuts(i) - prevCp)
        out(i) = UTF8String.fromString(s.substring(prevCh, endCh))
        prevCp = cuts(i)
        prevCh = endCh
        i += 1
      }
      new GenericArrayData(out)
    case b: Array[Byte] =>
      if (b.length == 0) return new GenericArrayData(Array.empty[AnyRef])
      val codes = new Array[Int](b.length)
      var j = 0
      while (j < b.length) { codes(j) = b(j) & 0xff; j += 1 }
      val cuts = boundaries(codes)
      val out = new Array[AnyRef](cuts.length)
      var prev = 0
      var i = 0
      while (i < cuts.length) {
        out(i) = java.util.Arrays.copyOfRange(b, prev, cuts(i))
        prev = cuts(i)
        i += 1
      }
      new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    split(input.asInstanceOf[Object])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("cdc", this, classOf[CdcChunks].getName)
      s"${ev.value} = $self.split($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunks {
  /** Polynomial base / modulus — fixed engine constants, replayed
    * verbatim by the DuckDB oracles (q136). */
  val B = 31L
  val M = 1000003L

  val fnName = "cdc_chunks"

  private val info = new ExpressionInfo(classOf[CdcChunks].getName, fnName)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.length == 3, s"$fnName expects (text, w, mask)")
    (children(1), children(2)) match {
      case (Literal(w: Int, IntegerType), Literal(m: Int, IntegerType)) =>
        CdcChunks(children.head, w, m)
      case _ => throw new IllegalArgumentException(
        s"$fnName: w and mask must be integer literals")
    }
  }

  /** Imperative registration — works on ANY session, idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(fnName), info, builder)
}
