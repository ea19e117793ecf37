package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorder2: hand-computed interleave; bit i of x at 2i, of y at 2i+1") {
    // x=0b101 (5), y=0b011 (3) → z bits: x0@0=1, y0@1=1, x1@2=0, y1@3=1,
    // x2@4=1, y2@5=0 → 0b011011 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zorder2(col("x"), col("y"), bits = 3).as("z"))
      .as[Long].head()
    assert(z === 27L)
    // wrap-around: values are taken mod 2^bits
    val z2 = Seq((5L + 8L, 3L + 16L)).toDF("x", "y")
      .select(Layout.zorder2(col("x"), col("y"), bits = 3).as("z"))
      .as[Long].head()
    assert(z2 === 27L)
  }

  test("locality LAW: sharing the top 2k z-bits bounds each dimension span below 2^(bits-k)") {
    val bits = 10
    val k = 3
    val rows = (0 until 4000).map { i =>
      // deterministic pseudo-random spread over the full 10-bit domain
      ((i * 389L) % 1024L, (i * 617L) % 1024L)
    }
    val spans = Layout.zorderSpans(rows.toDF("x", "y"), "x", "y",
        bits = bits, kBits = k)
      .select("zb", "x_min", "x_max", "y_min", "y_max")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(spans.nonEmpty)
    val bound = 1L << (bits - k)
    spans.foreach { case (zb, xmn, xmx, ymn, ymx) =>
      assert(xmx - xmn < bound, s"bucket $zb x-span ${xmx - xmn} >= $bound")
      assert(ymx - ymn < bound, s"bucket $zb y-span ${ymx - ymn} >= $bound")
    }
  }

  test("zorderN: 2-dim form equals zorder2; 3-dim locality law holds") {
    val df = Seq((123L, 456L, 789L)).toDF("x", "y", "z")
    val a = df.select(Layout.zorderN(Seq(col("x"), col("y")), 16).as("k"))
      .as[Long].head()
    val b = df.select(Layout.zorder2(col("x"), col("y"), 16).as("k"))
      .as[Long].head()
    assert(a === b)
    // 3-dim law: sharing top 3·b z-bits bounds each dim span < 2^(bits−b)
    val bits = 8
    val bnd = 3
    val rows = (0 until 3000).map { i =>
      ((i * 37L) % 256L, (i * 89L) % 256L, (i * 151L) % 256L)
    }
    val zc = Layout.zorderN(
      Seq(col("x"), col("y"), col("w")), bits)
    val spans = rows.toDF("x", "y", "w")
      .select(shiftright(zc, 3 * (bits - bnd)).as("zb"),
        col("x"), col("y"), col("w"))
      .groupBy("zb")
      .agg(max(col("x")) - min(col("x")), max(col("y")) - min(col("y")),
        max(col("w")) - min(col("w")))
      .as[(Long, Long, Long, Long)].collect()
    val bound = 1L << (bits - bnd)
    spans.foreach { case (zb, sx, sy, sw) =>
      assert(sx < bound && sy < bound && sw < bound,
        s"bucket $zb spans ($sx, $sy, $sw) >= $bound")
    }
  }

  test("writeZOrdered: matches for a filter on EITHER dim concentrate in few files") {
    // the full 128×128 grid (every pair once); 16 files. A narrow
    // x-slice (1/16 of the domain) hits few z-ordered files (z-curve
    // sqrt-locality) but EVERY file of a y-sorted layout.
    val rows = (0 until 16384).map(i => (i % 128L, i / 128L))
    val df = rows.toDF("x", "y")
    val zdir = java.nio.file.Files.createTempDirectory("zord").toFile
    val ydir = java.nio.file.Files.createTempDirectory("ysort").toFile
    zdir.delete(); ydir.delete()
    graft.operators.Layout.writeZOrdered(df, "x", "y",
      zdir.getAbsolutePath, nFiles = 16, bits = 7)
    df.repartitionByRange(16, col("y")).sortWithinPartitions(col("y"))
      .write.mode("overwrite").parquet(ydir.getAbsolutePath)
    def filesHit(path: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).where(pred)
        .select(org.apache.spark.sql.functions.input_file_name())
        .distinct().count()
    val xSlice = col("x") >= 16 && col("x") < 24
    val zHit = filesHit(zdir.getAbsolutePath, xSlice)
    val yHit = filesHit(ydir.getAbsolutePath, xSlice)
    assert(zHit <= 8, s"z-order should concentrate the x-slice: $zHit files")
    assert(yHit >= 15, s"y-sorted layout spreads the x-slice: $yHit files")
    // and the y-dimension stays concentrated under z-order too
    val ySlice = col("y") >= 64 && col("y") < 72
    assert(filesHit(zdir.getAbsolutePath, ySlice) <= 8)
  }

  test("sql twin produces the same keys as the column expression") {
    val df = Seq((123L, 456L), (65535L, 0L), (1L, 65535L))
      .toDF("x", "y")
    df.createOrReplaceTempView("zin")
    val viaSql = spark.sql(
      s"SELECT ${Layout.zorder2Sql("x", "y")} AS z FROM zin")
      .as[Long].collect().toSeq
    val viaCol = df.select(Layout.zorder2(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    assert(viaSql === viaCol)
  }
}
