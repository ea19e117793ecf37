package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column preparation: L2 normalization and deterministic
  * symmetric int8 quantization — the storage/serving transforms an
  * embedding pipeline applies after generation (normalize for cosine =
  * dot, quantize 4× smaller for ANN index shipping).
  *
  * Per-row maps only (no shuffle); outputs are integer-exact so any
  * engine reproduces them bit-for-bit. Double-precision math throughout
  * (`x * (127 / maxabs)` evaluated in the same order everywhere).
  */
object Embeddings {

  /** x / |x|₂ as array<double>; zero vectors stay zero. */
  def l2Normalize(v: Column): Column = {
    val n = graft.functions.VectorFunctions.norm(v)
    when(n > 0, transform(v, x => x.cast("double") / n))
      .otherwise(transform(v, x => x.cast("double")))
  }

  /** Element-wise mean pooling of vectors per group — chunk embeddings
    * back to a document vector, label centroids, etc. Long-format
    * aggregation ((key, pos, x) rows, map-side partial) rather than a
    * dim-wide aggregate: no K-wide codegen pathology, one shuffle keyed
    * (key, pos) that distributes evenly.
    *
    * Determinism: each element is quantized to a 1e-6 fixed-point LONG
    * before the sum, so the rounded mean is bit-identical in any
    * engine and any partitioning (integer sums are order-independent);
    * null elements are skipped, matching `avg` semantics. */
  def meanPool(df: DataFrame, keyCol: String, vecCol: String,
               roundTo: Int = 4): DataFrame =
    FanOut(df.select(col(keyCol).as("key"), col(vecCol).as("__v")))
      .select(col("key"), posexplode(col("__v")).as(Seq("pos", "x")))
      // each element quantized to a 1e-6 fixed-point LONG before the
      // sum: integer sums are order-independent, so the rounded mean is
      // bit-identical in any engine and any partitioning — a double sum
      // rounds differently near 4-dp boundaries depending on summation
      // order (observed: q61 diverged from the oracle at sf0.001). The
      // 1e-6 grid is below fp32 embedding noise.
      .groupBy(col("key"), col("pos"))
      .agg(sum(round(col("x").cast("double") * 1e6).cast("long")).as("s"),
        count(col("x")).as("n"))   // count(x): skip nulls like avg would
      // `=== 0` normalizes IEEE −0.0 (DuckDB's round keeps it, Spark's
      // BigDecimal round does not; stringified compares then diverge)
      .withColumn("__m", round(col("s") / (col("n") * 1e6), roundTo))
      .withColumn("m", when(col("__m") === 0.0, lit(0.0)).otherwise(col("__m")))
      .groupBy(col("key"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
        .getField("m").as("pooled"))

  /** Symmetric int8 quantization of `vecCol`: scale = 127 / max|x|,
    * q_i = floor(x_i·scale + 0.5) ∈ [-127, 127]. Emits the id, the
    * rounded scale denominator, and integer checksums of the quantized
    * vector (sum and L1) — order-independent, engine-exact. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    FanOut(df.select(col(idCol), col(vecCol).as("__v")))
      .withColumn("__maxabs",
        array_max(transform(col("__v"), x => abs(x.cast("double")))))
      .withColumn("__scale",
        when(col("__maxabs") > 0, lit(127.0) / col("__maxabs")).otherwise(lit(0.0)))
      .withColumn("__q", transform(col("__v"),
        x => floor(x.cast("double") * col("__scale") + lit(0.5)).cast("long")))
      .select(col(idCol),
        round(col("__maxabs"), 6).as("max_abs"),
        aggregate(col("__q"), lit(0L), (acc, q) => acc + q).as("q_sum"),
        aggregate(col("__q"), lit(0L), (acc, q) => acc + abs(q)).as("q_l1"))
}
