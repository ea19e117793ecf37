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

  /** Johnson–Lindenstrauss random projection with a ±1 sign matrix
    * (Achlioptas 2003: E[⟨y_a, y_b⟩] = ⟨x_a, x_b⟩, distortion
    * O(1/√dimOut)): y_j = (Σ_i sign(j,i)·x_i) / √dimOut. The cheap
    * dimensionality-reduction front end for ANN — 64-dim → 16-dim cuts
    * every downstream dot product 4× while approximately preserving
    * geometry. The sign matrix is the deterministic md5-derived
    * constant from [[graft.plans.JlProject.signs]].
    *
    * A pure per-row map (no shuffle) through the native codegen
    * [[graft.plans.JlProjectExpr]] expression (the unrolled Column
    * tree blows the 64 KB codegen method limit at 64×16); summation
    * order is i ascending, reproducible in any engine. Emits long
    * format (id, j, y) rounded to 6 dp. */
  def jlProject(df: DataFrame, idCol: String, vecCol: String,
                dimIn: Int, dimOut: Int): DataFrame = {
    graft.plans.JlProject.register(df.sparkSession)
    FanOut(df.select(col(idCol), col(vecCol).as("__v")))
      .select(col(idCol),
        posexplode(call_function(graft.plans.JlProject.fnName,
          col("__v"), lit(dimIn), lit(dimOut))).as(Seq("j", "__y")))
      .withColumn("__r", round(col("__y"), 6))
      // `=== 0.0` also matches −0.0: normalizes the IEEE negative zero a
      // tiny negative sum rounds to (DuckDB's round keeps it, Spark's
      // drops it — same divergence documented at meanPool)
      .select(col(idCol), col("j"),
        when(col("__r") === 0.0, lit(0.0)).otherwise(col("__r")).as("y"))
  }

  /** DuckDB SQL for one [[jlProject]] output coordinate (same sign
    * literals, same left-fold order — cross-engine bit parity). */
  def jlProjectSql(vec: String, dimIn: Int, dimOut: Int, j: Int): String = {
    val signs = graft.plans.JlProject.signs(dimOut, dimIn)
    val sum = (1 to dimIn)
      .map(i => s"(CAST($vec[$i] AS DOUBLE) * ${signs(j)(i - 1).toDouble})")
      .mkString(" + ")
    s"(($sum) / sqrt(${dimOut.toDouble}))"
  }

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
