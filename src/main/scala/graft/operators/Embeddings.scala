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

  /** Top principal component by exact-grid covariance + deterministic
    * power iteration — distributed PCA without MLlib, every number
    * engine-replayable:
    *
    *  1. Components snap to the 1e-6 grid (`x6 = ⌊x·10⁶ + 0.5⌋`), so
    *     the Gram matrix `S_ij = Σ x6_i·x6_j`, the component sums
    *     `m_i`, and the count n are EXACT integers — order-independent
    *     sums any engine reproduces regardless of partitioning. The
    *     Spark pass accumulates the dim×dim Gram per partition in one
    *     primitive-long array (a single `mapPartitions` — no dim²-row
    *     shuffle, the right 100 TB shape: model-sized state per
    *     partition, one tree-reduce) and combines in BigInt, so the
    *     per-partition long bound (rows/partition · (10⁶·|x|max)² <
    *     2⁶³) is the only capacity constraint — ~9M rows/partition at
    *     |x| ≤ 1, far above any sane partition size.
    *  2. Covariance cells land back on a 1e-6 grid through ONE double
    *     division of exact integers:
    *     `cov6_ij = ⌊10⁶·(n·S_ij − m_i·m_j)/(n·n·10¹²) + 0.5⌋` —
    *     the floor(+0.5) form both engines evaluate identically
    *     (`round()` half-rules differ on negatives across engines).
    *  3. Power iteration runs on the integer matrix: v₀ = uniform
    *     1/√dim on the grid; each step's matvec `w = cov6·v6` is an
    *     exact integer sum, the norm² an exact integer, and the
    *     renormalized `v6' = ⌊10⁶·w/√norm2 + 0.5⌋` — the Lloyd-idiom
    *     re-grid that keeps float summation order out of the state.
    *     Fixed `iters`, so an oracle replays the ladder verbatim.
    *
    * Output, one row per dimension: (pos, loading6) plus the Rayleigh
    * eigenvalue `eig6 = ⌊r/d + 0.5⌋` (variance along the component,
    * 1e-6 grid), the exact covariance trace (total variance, 1e-6
    * grid), and `share4` — the fraction of variance this component
    * explains, the number an embedding-compression decision (q97's JL,
    * q230's Matryoshka truncation) is justified by. */
  def pcaTopComponent(df: DataFrame, vecCol: String, dim: Int,
                      iters: Int = 20): DataFrame =
    pcaComponents(df, vecCol, dim, nComp = 1, iters)
      .drop("component")

  /** The exact-grid covariance matrix of [[pcaTopComponent]] (one
    * mapPartitions Gram pass, BigInt combine, floor(+0.5) grid). */
  private def gridCov(df: DataFrame, vecCol: String,
                      dim: Int): Array[Array[Long]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val x6 = df.select(transform(col(vecCol),
        x => floor(x.cast("double") * 1e6 + lit(0.5)).cast("long")).as("v"))
      .as[Seq[Long]].rdd
    // one pass: per-partition (count, sums[dim], gram[dim*dim]) in
    // primitive longs, combined in BigInt
    val (n, sums, gram) = x6.mapPartitions { it =>
      var c = 0L
      val s = new Array[Long](dim)
      val g = new Array[Long](dim * dim)
      it.foreach { v =>
        val a = v.toArray
        c += 1
        var i = 0
        while (i < dim) {
          s(i) += a(i)
          var j = i
          while (j < dim) { g(i * dim + j) += a(i) * a(j); j += 1 }
          i += 1
        }
      }
      Iterator.single((c, s, g))
    }.collect().foldLeft((BigInt(0), Array.fill(dim)(BigInt(0)),
      Array.fill(dim * dim)(BigInt(0)))) { case ((cn, cs, cg), (c, s, g)) =>
      (cn + c,
        cs.zip(s).map { case (x, y) => x + y },
        cg.zip(g).map { case (x, y) => x + y })
    }
    require(n > 0, "pca: empty input")
    val nD = n.toDouble
    Array.tabulate(dim, dim) { (i, j) =>
      val sij = if (i <= j) gram(i * dim + j) else gram(j * dim + i)
      val p = n * sij - sums(i) * sums(j)
      math.floor(1e6 * p.toDouble / (nD * nD * 1e12) + 0.5).toLong
    }
  }

  /** Top `nComp` principal components by repeated power iteration with
    * GRID DEFLATION between components (Hotelling): after extracting
    * (λ, v), `cov6 ← cov6 − ⌊eig6·v6_i·v6_j / 10¹² + 0.5⌋` — the
    * integer-matrix form of cov − λvvᵀ, replayable like every other
    * rung. Output: (component, pos, loading6, eig6, trace6, share4),
    * components 0-indexed in extraction order (descending variance). */
  def pcaComponents(df: DataFrame, vecCol: String, dim: Int,
                    nComp: Int, iters: Int = 20): DataFrame = {
    require(nComp >= 1 && nComp <= dim, "nComp must be in [1, dim]")
    val spark = df.sparkSession
    val cov6 = gridCov(df, vecCol, dim)
    val trace6 = (0 until dim).map(i => cov6(i)(i)).sum
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Long, Long, Long, Long)]
    for (comp <- 0 until nComp) {
      def matvec(v6: Array[Long]): Array[BigInt] = Array.tabulate(dim) { i =>
        (0 until dim).foldLeft(BigInt(0))((acc, j) =>
          acc + BigInt(cov6(i)(j)) * v6(j))
      }
      var v6 = Array.fill(dim)(
        math.floor(1e6 / math.sqrt(dim.toDouble) + 0.5).toLong)
      for (_ <- 1 to iters) {
        val w = matvec(v6)
        val norm2 = w.foldLeft(BigInt(0))((acc, x) => acc + x * x)
        if (norm2 > 0) {
          val nrm = math.sqrt(norm2.toDouble)
          v6 = w.map(x => math.floor(1e6 * x.toDouble / nrm + 0.5).toLong)
        }
      }
      // Rayleigh quotient on the FINAL vector: one more exact matvec
      val w = matvec(v6)
      val r = (0 until dim).foldLeft(BigInt(0))((acc, i) =>
        acc + BigInt(v6(i)) * w(i))
      val d = v6.foldLeft(BigInt(0))((acc, x) => acc + BigInt(x) * x)
      val eig6 = math.floor(r.toDouble / d.toDouble + 0.5).toLong
      val share4 =
        math.floor(1e4 * eig6.toDouble / trace6.toDouble + 0.5).toLong
      (0 until dim).foreach(i =>
        out += ((comp, i, v6(i), eig6, trace6, share4)))
      if (comp < nComp - 1) {
        var i = 0
        while (i < dim) {
          var j = 0
          while (j < dim) {
            val defl = BigInt(eig6) * v6(i) * v6(j)
            cov6(i)(j) -= math.floor(defl.toDouble / 1e12 + 0.5).toLong
            j += 1
          }
          i += 1
        }
      }
    }
    spark.createDataFrame(out.toSeq)
      .toDF("component", "pos", "loading6", "eig6", "trace6", "share4")
  }

  /** Symmetric int8 quantization of `vecCol`: scale = 127 / max|x|,
    * q_i = floor(x_i·scale + 0.5) ∈ [-127, 127]. Emits the id, the
    * rounded scale denominator, and integer checksums of the quantized
    * vector (sum and L1) — order-independent, engine-exact. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    quantizeInt8Vec(df, idCol, vecCol)
      .select(col(idCol),
        round(col("__maxabs"), 6).as("max_abs"),
        aggregate(col("q"), lit(0L), (acc, q) => acc + q).as("q_sum"),
        aggregate(col("q"), lit(0L), (acc, q) => acc + abs(q)).as("q_l1"))

  /** The quantized VECTORS themselves (`q`: array<long> in
    * [-127, 127], plus the raw `__maxabs`): the serving-side frame —
    * integer dot products over `q` are exact in any engine, which is
    * what makes quantization-loss audits (q323) hash-checkable. */
  def quantizeInt8Vec(df: DataFrame, idCol: String,
                      vecCol: String): DataFrame =
    FanOut(df.select(col(idCol), col(vecCol).as("__v")))
      .withColumn("__maxabs",
        array_max(transform(col("__v"), x => abs(x.cast("double")))))
      .withColumn("__scale",
        when(col("__maxabs") > 0, lit(127.0) / col("__maxabs")).otherwise(lit(0.0)))
      .withColumn("q", transform(col("__v"),
        x => floor(x.cast("double") * col("__scale") + lit(0.5)).cast("long")))
      .select(col(idCol), col("__maxabs"), col("q"))
}
