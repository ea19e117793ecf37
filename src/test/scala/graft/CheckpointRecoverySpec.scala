package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Checkpoint/recovery: a file-source streaming aggregation stopped
  * mid-stream and restarted from its checkpoint produces exactly the
  * batch answer — no lost or duplicated contributions (the delivery
  * guarantee the reference's auto-commit consumer cannot give,
  * SURVEY.md §2.2 output-modes row). */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("windowless agg resumes from checkpoint with exactly-once results") {
    val srcDir = Files.createTempDirectory("graft_ckpt_src").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val schema = new StructType().add("k", StringType).add("v", LongType)

    def writeFile(name: String, rows: Seq[(String, Long)]): Unit =
      rows.toDF("k", "v").coalesce(1).write.mode("append").json(s"$srcDir/$name")

    // first file staged now; the second arrives only after the restart
    writeFile("f1", Seq(("a", 1L), ("b", 2L)))

    def start() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .json(s"$srcDir/*")
      .groupBy("k").agg(sum("v").as("total"))
      .writeStream.format("memory").queryName("ckpt_out")
      .option("checkpointLocation", ckpt)
      .outputMode("complete")

    // phase 1: consume the first file, then stop
    val q1 = start().start()
    try q1.processAllAvailable()
    finally { q1.stop(); q1.awaitTermination(10000) }

    // phase 2: new data lands while the query is down; restart from the
    // same checkpoint must fold it into the recovered state
    writeFile("f2", Seq(("a", 10L), ("c", 5L)))
    val q2 = start().start()
    try {
      q2.processAllAvailable()
      val out = spark.sql("SELECT k, total FROM ckpt_out ORDER BY k")
        .as[(String, Long)].collect().toSeq
      assert(out === Seq(("a", 11L), ("b", 2L), ("c", 5L)))
    } finally q2.stop()
  }
}
