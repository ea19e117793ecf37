package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns using higher-order
  * functions (zip_with / aggregate) — fully codegen'd, no UDF
  * serialization, operating in double precision.
  */
object VectorFunctions {

  private val zero = lit(0.0)

  /** Dot product via zip_with + ordered left fold (deterministic
    * summation order: index 0..n-1). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      zero, (acc, x) => acc + x)

  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity in [-1, 1]; 0 for zero-norm inputs. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom > 0, dot(a, b) / denom).otherwise(0.0)
  }

  /** Explicit fully-unrolled dot product for a KNOWN dimension — the
    * exact same expression (and therefore the exact same IEEE summation
    * order) is generated for the DuckDB oracle by [[dotSql]], making
    * cosine results bit-identical across engines. */
  def dotUnrolled(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i => element_at(a, i).cast("double") * element_at(b, i).cast("double"))
      .reduceLeft(_ + _)

  def cosineUnrolled(a: Column, b: Column, dim: Int): Column =
    dotUnrolled(a, b, dim) /
      (sqrt(dotUnrolled(a, a, dim)) * sqrt(dotUnrolled(b, b, dim)))

  /** DuckDB SQL text for the same unrolled dot product (1-based list
    * indexing there too). */
  def dotSql(a: String, b: String, dim: Int): String =
    (1 to dim).map(i =>
      s"CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE)").mkString(" + ")

  def cosineSql(a: String, b: String, dim: Int): String =
    s"(${dotSql(a, b, dim)}) / (sqrt(${dotSql(a, a, dim)}) * sqrt(${dotSql(b, b, dim)}))"

  /** Sign-bit LSH bucket over the first `bits` dimensions: a cheap,
    * deterministic coarse quantizer ('1' if dim ≥ 0 else '0', concatenated).
    * At scale: bucket once, shuffle by bucket, search within bucket —
    * turns O(N·Q) brute force into O(N·Q / 2^bits) expected. */
  def signBucket(a: Column, bits: Int): Column =
    concat((1 to bits).map(i =>
      when(element_at(a, i) >= 0, lit("1")).otherwise(lit("0"))): _*)

  def signBucketSql(a: String, bits: Int): String =
    (1 to bits).map(i =>
      s"CASE WHEN $a[$i] >= 0 THEN '1' ELSE '0' END").mkString("concat(", ", ", ")")
}
