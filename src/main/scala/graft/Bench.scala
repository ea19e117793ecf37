package graft

import graft.queries.Registry
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every registry query against
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * Each query is fully materialized through the `noop` sink (forces all
  * columns/operators to execute — `count()` would let the optimizer
  * prune most of the work). A short warmup (schema reads + one tiny
  * query) happens before timing so the numbers measure the plans, not
  * first-touch JIT/codegen of the whole stack.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = GraftSession.local(cpus, "graft-bench")

    def exec(name: String): Unit =
      Registry.byName(name).run(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // warmup: parquet footers + one trivial end-to-end query
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).schema)
    exec("q17_global_topk")

    // Multiple FULL passes, min per query: the box is shared with the
    // test driver, whose periodic work can steal all cores for minutes
    // at a time. Back-to-back repeats of one query can both land inside
    // one stall window; separating the repeats by a whole pass means the
    // min reflects the plan's steady-state cost, not the interference.
    // Round 1 showed two passes can still both be contaminated
    // (q22 measured 15 s vs 1.3 s steady-state), so default is three.
    // Optional local-iteration filter, same contract as Verify's
    // (driver never sets this): SPARK_GRAFT_ONLY=q290,q297 → time only
    // those queries.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = Registry.all
      .filter(q => only.forall(_.exists(q.name.startsWith)))
    def pass(): Map[String, Double] = selected.map { q =>
      val t0 = System.nanoTime()
      q.name -> (try { exec(q.name); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}"); -1.0 })
    }.toMap
    val nPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val passes = (1 to nPasses).map(_ => pass())
    val results = selected.sortBy(_.name).map { q =>
      val ts = passes.map(_(q.name))
      q.name -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val fails = results.count(_._2 < 0)
    val fullLine =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The driver keeps only the last ~2000 chars of output, so a
    // 337-query map on one line truncates mid-JSON and `parsed` comes
    // back null. The COMPLETE line goes to a file (and stderr); stdout
    // ends with ONE compact line that always fits the tail window —
    // totals plus the slowest queries, pointing at the full map.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] cannot write $outPath: ${e.getMessage}") }
    val slow = results.filter(_._2 >= 0).sortBy(-_._2).take(25)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // stop BEFORE the final print: Spark shutdown logs to stderr, and
    // the driver parses the LAST line of merged output — nothing may
    // land after the JSON (build.sbt passes run output through raw and
    // suppresses sbt's trailing success banner for the same reason)
    spark.stop()
    if (results.size <= 60)
      println(fullLine)
    else
      println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"failures":$fails,"queries":$slow,"queries_truncated":true,"queries_file":"$outPath","sf":"$sfDir"}""")
    System.out.flush()
  }
}
