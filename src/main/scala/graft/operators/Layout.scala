package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (Z-order) interleaved sort
  * keys — the Delta/Iceberg `ZORDER BY` idea as a plain column
  * expression. Sorting/range-sharding by the interleaved key clusters
  * BOTH dimensions at once, so per-file min/max statistics prune scans
  * filtered on either column (a single-column sort clusters one
  * dimension and leaves the other's spans file-wide).
  *
  * The locality guarantee is exact and testable: rows sharing their
  * z-key's top 2k bits agree on the top k bits of EACH dimension, so
  * within such a bucket each dimension spans < 2^(bits−k) values
  * (`LayoutSpec` asserts it; q182 reports the spans under the oracle).
  *
  * Pure integer bit arithmetic (shift/and/add) — codegen'd columns,
  * no UDF; the oracle replays the same unrolled terms. */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integer columns: bit i of `x` lands at z-bit 2i, bit i of `y` at
    * 2i+1. Values are taken mod 2^bits (callers discretize wider
    * domains first — e.g. [[Sampling.rangeBuckets]] for
    * histogram-equalized ranks). */
  def zorder2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val xb = pmod(x.cast("long"), lit(1L << bits))
    val yb = pmod(y.cast("long"), lit(1L << bits))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(xb, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** k-dimensional Morton interleave: bit i of dimension j lands at
    * z-bit `i·k + j` (so [[zorder2]] ≡ `zorderN(Seq(x, y), bits)`).
    * Requires `k·bits ≤ 63`. Same locality law per dimension: rows
    * sharing the top `k·b` z-bits agree on each dimension's top `b`
    * bits. */
  def zorderN(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2, "need at least two dimensions")
    require(bits >= 1 && k * bits <= 63, s"k*bits out of range: $k x $bits")
    val bs = cols.map(c => pmod(c.cast("long"), lit(1L << bits)))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      bs.zipWithIndex.foldLeft(acc) { case (a, (b, j)) =>
        a + shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * k + j)
      }
    }
  }

  /** The same unrolled Morton terms as ANSI SQL (DuckDB syntax) over
    * expressions `x`/`y` — the oracle-side twin of [[zorder2]], kept
    * adjacent so the two unrollings cannot drift. */
  def zorder2Sql(x: String, y: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val m = 1L << bits
    // every term fully parenthesized: SQL's `+` binds tighter than
    // `<<`, so a bare `a << 0 + b << 1` would parse as a << (0+b) << 1
    val terms = (0 until bits).flatMap { i =>
      Seq(s"((((($x) % $m) >> $i) & 1) << ${2 * i})",
        s"((((($y) % $m) >> $i) & 1) << ${2 * i + 1})")
    }
    terms.mkString("(", " + ", ")")
  }

  /** Write `df` z-ordered into `nFiles` parquet files: range-partition
    * on the Morton key (sampled range boundaries — balanced files
    * without a global sort pass of our own) and sort within each file.
    * Every file then covers a compact z-range, so both dimensions'
    * min/max footer statistics are tight — a reader filtering on
    * EITHER column touches few files where a single-column layout
    * leaves the other column's spans file-wide (`LayoutSpec` measures
    * exactly that concentration). */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    path: String, nFiles: Int, bits: Int = 16): Unit = {
    require(nFiles >= 1, s"bad file count: $nFiles")
    df.withColumn("__z", zorder2(col(xCol), col(yCol), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-z-bucket span report: bucket = the z-key's top 2·`kBits`
    * bits; per bucket — row count and each dimension's exact min/max.
    * The file-skipping audit for a z-ordered export: every bucket's
    * per-dimension span is < 2^(bits−kBits), which is what makes
    * min/max pruning effective on BOTH filter columns. */
  def zorderSpans(df: DataFrame, xCol: String, yCol: String,
                  bits: Int = 16, kBits: Int = 3): DataFrame = {
    require(kBits >= 1 && kBits <= bits, s"kBits out of range: $kBits")
    val xb = pmod(col(xCol).cast("long"), lit(1L << bits))
    val yb = pmod(col(yCol).cast("long"), lit(1L << bits))
    df.select(
        shiftright(zorder2(col(xCol), col(yCol), bits),
          2 * (bits - kBits)).as("zb"),
        xb.as("xv"), yb.as("yv"))
      .groupBy("zb")
      .agg(count(lit(1)).as("n"),
        min(col("xv")).as("x_min"), max(col("xv")).as("x_max"),
        min(col("yv")).as("y_min"), max(col("yv")).as("y_max"))
  }
}
