package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._
import java.security.MessageDigest

/** The distributed two-phase prefix sum must agree exactly with a
  * sequential driver-side pack over the same md5 ordering. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("packByTokenBudget equals a sequential pack (any partition count)") {
    val docs = (1L to 500L).map(i => (i, (i % 37 + 3))).toDF("id", "n_tok")
    val maxTok = 100L

    // sequential ground truth in plain Scala
    val seqShards = (1L to 500L).map(i => (i, i % 37 + 3))
      .sortBy { case (i, _) => md5hex(i.toString) }
      .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, t)) => (id, cum / maxTok, cum + t) }
      .drop(1)
      .map { case (id, shard, _) => id -> shard }.toMap

    for (parts <- Seq(1, 7, 32)) {
      val out = Packing.packByTokenBudget(docs, "id", "n_tok", maxTok, parts)
        .select(col("id"), col("shard_id")).as[(Long, Long)].collect().toMap
      assert(out === seqShards, s"mismatch at parts=$parts")
    }
  }

  test("packByTokenBudget plans no RangePartitioning and keeps its local sort") {
    val docs = (1L to 100L).map(i => (i, i % 7 + 1)).toDF("id", "n_tok")
    val s = Packing.packByTokenBudget(docs, "id", "n_tok", 50L)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    // a RangePartitioner would sample-re-execute the upstream pipeline
    assert(!s.contains("rangepartitioning"), s)
    // the partition-local sort feeding the prefix-sum mapPartitions must
    // survive optimization (EliminateSorts strips sorts below join
    // children — regression guard for the post-join placement)
    assert(s.contains("Sort ["), s)
  }

  test("writeShards lands a shard_id-partitioned layout that round-trips") {
    val docs = (1L to 40L).map(i => (i, 100L + i)).toDF("doc_id", "n_tokens")
    val packed = Packing.packByTokenBudget(docs, "doc_id", "n_tokens", maxTokens = 1000L)
    val out = java.nio.file.Files.createTempDirectory("shards").toFile
    Packing.writeShards(packed, out.getAbsolutePath)
    val dirs = out.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("shard_id=")))
    val back = spark.read.parquet(out.getAbsolutePath)
    assert(back.count() === 40)
    // partition-pruned single-shard read sees only that shard's docs
    val one = back.where(col("shard_id") === 0).select("doc_id").as[Long].collect().toSet
    val expect = packed.where(col("shard_id") === 0).select("doc_id").as[Long].collect().toSet
    assert(one === expect && one.nonEmpty)
  }

  test("packWithSplitting fills every shard exactly except the last; no tokens lost") {
    val docs = (1L to 25L).map(i => (i, 70L + i * 13 % 50)).toDF("doc_id", "n_tokens")
    val B = 256L
    val segs = Packing.packWithSplitting(docs, "doc_id", "n_tokens", B)
    val perShard = segs.groupBy("shard_id")
      .agg(sum(col("tokens_in_shard")).as("t"))
      .orderBy("shard_id").as[(Long, Long)].collect().toSeq
    val totalTokens = docs.agg(sum(col("n_tokens"))).as[Long].head()
    assert(perShard.map(_._2).sum === totalTokens)                 // conservation
    assert(perShard.init.forall(_._2 === B), s"not full: $perShard") // exact fill
    assert(perShard.last._2 === totalTokens - B * perShard.init.size)
    // a straddling doc appears in consecutive shards with split counts
    val multi = segs.groupBy("doc_id").count().where(col("count") > 1)
    assert(multi.count() > 0)
  }

  test("shard summary fills shards to the token budget") {
    val docs = (1L to 300L).map(i => (i, 10L)).toDF("id", "n_tok")
    val packed = Packing.packByTokenBudget(docs, "id", "n_tok", 100L, parts = 8)
    val summary = Packing.shardSummary(packed, "n_tok", 100L).collect()
    // 300 docs × 10 tokens / 100-token shards → 30 shards, all exactly full
    assert(summary.length === 30)
    assert(summary.forall(_.getAs[Long]("sum_tokens") === 100L))
    assert(summary.forall(_.getAs[Double]("fill_ratio") === 1.0))
  }

  test("packByOrder: shards respect the curriculum order and equal a sequential pack") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
      graft.functions.TextFunctions.qualityScore(col("text"), col("n_chars")).as("quality"))
    val packed = Packing.packByOrder(docs, "doc_id", "n_tokens", "quality", 4096L)
      .cache()
    // curriculum law: min quality of shard i >= max quality of shard i+1
    val stats = packed.groupBy(col("shard_id"))
      .agg(min(col("quality")).as("mn"), max(col("quality")).as("mx"))
      .orderBy(col("shard_id")).collect()
    assert(stats.length > 1, "fixture must span several shards")
    stats.sliding(2).foreach { w =>
      assert(w(0).getAs[Double]("mn") >= w(1).getAs[Double]("mx") - 1e-12,
        s"curriculum violated between shards ${w(0)} and ${w(1)}")
    }
    // exact equivalence with a sequential driver-side pack
    val ordered = docs.orderBy(col("quality").desc, col("doc_id"))
      .select(col("doc_id").cast("long"), col("n_tokens"))
      .as[(Long, Long)].collect()
    var cum = 0L
    val expect = ordered.map { case (id, t) =>
      val s = cum / 4096L; cum += t; id -> s
    }.toMap
    val got = packed.select(col("doc_id").cast("long"), col("shard_id").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got == expect)
    packed.unpersist()
  }

  test("paddingWasteReport: hand-computed waste under both strategies; bucketing never pads more") {
    // lengths by id order: 10, 1, 10, 1, 8; batches of 2.
    // arrival:  {10,1} {10,1} {8}  → padded 20+20+8 = 48, waste 18
    // bucketed (len DESC, id): {10,10} {8,1} {1} → padded 20+16+1 = 37,
    // waste 7
    val docs = Seq((1L, 10L), (2L, 1L), (3L, 10L), (4L, 1L), (5L, 8L))
      .toDF("doc_id", "ntok")
    val got = Packing.paddingWasteReport(docs, "doc_id", "ntok",
        batchRows = 2L)
      .orderBy(col("strategy"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // waste_share4 exact grid: (2·1e4·18 + 48) div 96 = 3750;
    // (2·1e4·7 + 37) div 74 = 1892
    assert(got === Seq(
      ("arrival", 5L, 3L, 30L, 48L, 3750L),
      ("length_bucketed", 5L, 3L, 30L, 37L, 1892L)))
    assert(got(1)._5 <= got(0)._5,
      "bucketing can only reduce padded tokens at equal batch rows")
  }
}
