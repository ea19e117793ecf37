package graft

import graft.functions.TextFunctions
import graft.operators.{Dedup, Sampling, Similarity, TextStats}
import org.apache.spark.sql.functions._

/** Round-4 corpus operators: chunk-level span dedup, cross-doc
  * duplicated-span stats, count-min heavy hitters, quality cascade,
  * PII redaction, token-budget selection, SemDeDup. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docsDir = "/root/testdata/sf0.001"

  test("posChunks: full non-overlapping chunks only; short docs vanish") {
    val docs = Seq(
      (1L, "a b c d e f g"),   // 7 tokens, w=3 -> 2 chunks, remainder dropped
      (2L, "x y"),             // shorter than w -> vanishes
      (3L, "p q r")).toDF("doc_id", "text")
    val out = TextStats.posChunks(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.toSet === Set((1L, 0, "a b c"), (1L, 1, "d e f"), (3L, 0, "p q r")))
  }

  test("chunkDedup: every chunk keeps exactly its first (doc, pos) occurrence") {
    val docs = Seq(
      (1L, "one two three four five six"),    // chunks: "one two three", "four five six"
      (2L, "one two three seven eight nine"), // first chunk is a dup of doc 1's
      (3L, "four five six four five six")).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, "doc_id", "text", 3)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_kept_chunks"), r.getAs[String]("dedup_text"))).toMap
    assert(out(1L) === ((2L, "one two three four five six")))
    assert(out(2L) === ((1L, "seven eight nine")))
    assert(!out.contains(3L)) // both of doc 3's chunks first occurred in doc 1
  }

  test("heavyHitters equals the exact threshold count — even with a tiny sketch forcing collisions") {
    val docs = Tables.documents(spark, docsDir)
    val exact = TextStats.posShingles(docs, "doc_id", "text", 2)
      .groupBy(col("s")).agg(count(lit(1)).as("n"))
      .where(col("n") >= 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    for (width <- Seq(1024, 2)) { // width=2: every gram collides
      val hh = TextStats.heavyHitters(docs, "doc_id", "text",
          n = 2, minCount = 5, depth = 4, width = width)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(hh === exact, s"width=$width")
    }
  }

  test("qualityCascade: first failing rule wins, in declared order") {
    val docs = Seq(
      (1L, "short doc"),                                   // too_short
      (2L, ("w " * 50).trim),                              // 50 tokens, 1 distinct -> low_diversity
      (3L, "a b " * 10 + (1 to 30).map("u" + _).mkString(" ")), // repetitive bigram, diverse enough
      (4L, (1 to 40).map("v" + _).mkString(" "))).toDF("doc_id", "text") // clean
    val out = TextStats.qualityCascade(docs, "doc_id", "text",
        minTokens = 15, maxTokens = 100000,
        minFracDistinct = 0.35, maxTopBigramFrac = 0.1)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("reason"), r.getAs[Boolean]("keep"))).toMap
    assert(out(1L) === (("too_short", false)))
    assert(out(2L) === (("low_diversity", false)))
    assert(out(3L)._1 === "repetitive")
    assert(out(4L) === (("", true)))
  }

  test("redact: specific patterns fire before the digit rule") {
    val rows = Seq(
      "mail me at jane.doe+x@example.com today",
      "server 10.0.255.1 port 8080",
      "no pii here").toDF("t")
    val out = rows.select(TextFunctions.redact(col("t")).as("r"))
      .as[String].collect()
    assert(out(0) === "mail me at <email> today")
    assert(out(1) === "server <ip> port <number>")
    assert(out(2) === "no pii here")
  }

  test("tokenBudgetSelect equals a sequential best-first prefix scan") {
    val scored = Tables.documents(spark, docsDir).select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      TextFunctions.qualityScore(col("text"), col("n_chars")).as("quality"))
    val budget = 8000L
    val got = Sampling.tokenBudgetSelect(scored, "doc_id", "n_tokens",
        "quality", budget)
      .select(col("doc_id"), col("cum_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // sequential reference: sort driver-side, accumulate, cut at budget
    val seq = scored.select(col("doc_id"), col("n_tokens").cast("long"),
        col("quality")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy { case (id, _, q) => (-q, id) }
    var cum = 0L
    val want = scala.collection.mutable.Map[Long, Long]()
    seq.foreach { case (id, t, _) =>
      cum += t
      if (cum <= budget) want(id) = cum
    }
    assert(got === want.toMap)
    assert(got.nonEmpty && got.size < seq.length) // budget actually binds
  }

  test("unigramLogProb: vocabulary outliers score lower; capped vocab falls to the floor") {
    val docs = Seq(
      (1L, "the the the the the"),             // most common token
      (2L, "zyxq the the the the")).toDF("doc_id", "text") // one rare token
    val out = TextStats.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("avg_logprob")).toMap
    assert(out(2L) < out(1L)) // rare token drags the mean log-prob down
    // maxVocab=1: every non-top token takes the smoothing floor 1/(N+V)
    val capped = TextStats.unigramLogProb(docs, "doc_id", "text", maxVocab = 1)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("avg_logprob")).toMap
    assert(capped(1L) === out(1L))  // top-1 token ("the") unaffected
    assert(capped(2L) < out(2L))    // OOV floor < smoothed count for "zyxq"
  }

  test("hardNegatives: top-k closest vectors, never the query's own label") {
    val emb = Tables.embeddings(spark, docsDir)
    val out = Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 3),
        "vec_id", "embedding", "label", k = 4)
      .join(emb.select(col("vec_id").as("corpus_id"),
        col("label").as("c_label")), "corpus_id")
      .join(emb.select(col("vec_id").as("query_id"),
        col("label").as("q_label")), "query_id")
      .collect()
    assert(out.length === 12) // 3 queries x k
    out.foreach(r => assert(
      r.getAs[Int]("c_label") !== r.getAs[Int]("q_label")))
    // equals brute-force top-k restricted to different-label corpus rows
    val brute = Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding",
        k = emb.count().toInt, dim = 64)
      .join(emb.select(col("vec_id").as("corpus_id"), col("label").as("cl")), "corpus_id")
      .join(emb.select(col("vec_id").as("query_id"), col("label").as("ql")), "query_id")
      .where(col("cl") =!= col("ql"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("corpus_id"))
    val expect = brute.withColumn("rn2", row_number().over(w))
      .where(col("rn2") <= 4)
      .select(col("query_id"), col("corpus_id"), col("cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = out.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("corpus_id"), r.getAs[Double]("cosine"))).toSet
    assert(got === expect)
  }

  test("epochMixture: copy counts equal floor(e)·n plus the hash-thresholded residual") {
    val df = (0L until 400L).map(i => (i, "s" + (i % 4))).toDF("doc_id", "source")
    val epochs = Map("s0" -> 2.5, "s1" -> 1.0, "s2" -> 0.3, "s3" -> 0.0)
    val out = Sampling.epochMixture(df, "doc_id", "source", epochs)
    val counts = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected residuals from the same md5 buckets, computed brute-force
    def residual(src: String, frac: Double): Long =
      df.where(col("source") === src)
        .where(Sampling.hashBucket(col("doc_id"), 10000) <
          math.round(frac * 10000).toInt).count()
    assert(counts("s0") === 2 * 100 + residual("s0", 0.5))
    assert(counts("s1") === 100)
    assert(counts("s2") === residual("s2", 0.3))
    assert(!counts.contains("s3"))             // zero epochs -> dropped
    // deterministic on rerun
    val again = Sampling.epochMixture(df, "doc_id", "source", epochs)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === counts)
  }

  test("semDedup: evicted iff a smaller-id same-cluster neighbor reaches tau") {
    // synthetic clusters with planted duplicates: four well-separated
    // directions, several exact/near copies of each
    val base = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f))
    val vecs = (0 until 40).map { i =>
      val b = base(i % 4)
      val jitter = if (i < 20) 0f else 0.05f * (i % 3)
      (i.toLong, b.zipWithIndex.map { case (x, d) =>
        x + (if (d == (i % 4 + 1) % 4) jitter else 0f) })
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val tau = 0.97
    val out = Similarity.semDedup(emb, "vec_id", "embedding",
        nlist = 4, iters = 3, tau = tau)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cid"),
        r.getAs[Boolean]("kept")))
    assert(out.length === 40)
    assert(out.exists(!_._3) && out.exists(_._3))
    val byId = vecs.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val cidOf = out.map(t => t._1 -> t._2).toMap
    out.foreach { case (id, cid, kept) =>
      val hasSmallerNeighbor = out.exists { case (o, ocid, _) =>
        o < id && ocid == cid && cos(byId(o), byId(id)) >= tau
      }
      assert(kept === !hasSmallerNeighbor, s"vec $id in cluster $cid")
    }
  }

  test("cdcChunks: lossless reassembly, total on empty/short, deterministic") {
    val base = (1 to 40).map(i => s"sentence number $i carries words").mkString(" ")
    val docs = Seq((1L, base), (2L, ""), (3L, "tiny")).toDF("doc_id", "text")
    val out = Dedup.cdcChunks(docs, "doc_id", "text")
      .orderBy("id", "pos")
      .as[(Long, Int, String)].collect()
    // reassembly: chunks concatenate back to the exact input
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).mkString)
    assert(byDoc(1L) === base)
    assert(!byDoc.contains(2L), "empty text must emit no chunks")
    assert(byDoc(3L) === "tiny")
    assert(out.count(_._1 == 3L) === 1, "short text is one whole chunk")
    assert(out.count(_._1 == 1L) > 3, "long text must actually split")
    // determinism
    val again = Dedup.cdcChunks(docs, "doc_id", "text")
      .orderBy("id", "pos").as[(Long, Int, String)].collect()
    assert(again === out)
  }

  test("cdcChunks: boundaries re-synchronize after a prefix edit (fixed-stride chunks don't)") {
    val base = (1 to 60).map(i => s"clause $i of the running text").mkString(" ")
    val edited = "INSERTED PREAMBLE " + base
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs, "doc_id", "text")
      .as[(Long, Int, String)].collect()
    val c1 = chunks.filter(_._1 == 1L).map(_._3).toSet
    val c2 = chunks.filter(_._1 == 2L).map(_._3).toSet
    val shared = c1 intersect c2
    // all but the head chunk(s) spanning the edit are byte-identical
    assert(shared.size >= c1.size - 2,
      s"CDC must share nearly all chunks after the edit: ${shared.size} of ${c1.size}")
    // contrast: fixed-stride spans all shift — the q68 machinery finds ~nothing
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val fixed = TextStats.posChunksFromTokens(toks, 5)
      .as[(Long, Int, String)].collect()
    val f1 = fixed.filter(_._1 == 1L).map(_._3).toSet
    val f2 = fixed.filter(_._1 == 2L).map(_._3).toSet
    // 2-token insertion ≠ 0 (mod 5) → every later 5-word chunk shifts
    assert((f1 intersect f2).size <= 1,
      "fixed-stride chunks should nearly all shift under a prefix edit")
  }

  test("cdcDelta: suffix edit reuses all but the tail; unrelated doc reuses nothing") {
    val base = (1 to 50).map(i => s"archived clause $i with steady words").mkString(" ")
    val baseline = Seq((1L, base)).toDF("doc_id", "text")
    val probe = Seq((2L, base + " APPENDED REVISION NOTE"),
      (3L, "totally different content nothing shared at all")).toDF("doc_id", "text")
    val out = Dedup.cdcDelta(baseline, probe, "doc_id", "text")
      .orderBy("id")
      .select("id", "n_chunks", "n_reused", "reuse_frac")
      .as[(Long, Long, Long, Double)].collect()
    val (_, n2, r2, f2) = (out(0)._1, out(0)._2, out(0)._3, out(0)._4)
    assert(r2 >= n2 - 2 && r2 < n2, s"suffix edit must reuse all but the tail ($r2 of $n2)")
    assert(f2 > 0.6)
    assert(out(1)._3 === 0L && out(1)._4 === 0.0)
  }

  test("cdcChunks on binary: lossless, re-syncs after a byte prefix, ASCII cuts match the string form") {
    val essence = (1 to 80).flatMap(i => Seq(i.toByte, (i * 7 % 251).toByte,
      (i * 13 % 251).toByte)).toArray
    val reContainered = ("FAKEHDR!".getBytes("UTF-8") ++ essence)
    val blobs = Seq((1L, essence), (2L, reContainered), (3L, Array.empty[Byte]))
      .toDF("doc_id", "blob")
    val out = Dedup.cdcChunks(blobs, "doc_id", "blob")
      .orderBy("id", "pos")
      .as[(Long, Int, Array[Byte])].collect()
    // lossless reassembly of the byte stream
    assert(out.filter(_._1 == 1L).flatMap(_._3).toSeq === essence.toSeq)
    assert(out.filter(_._1 == 2L).flatMap(_._3).toSeq === reContainered.toSeq)
    assert(!out.exists(_._1 == 3L), "empty blob emits no chunks")
    // a metadata prefix leaves the essence chunks shared (re-sync law)
    val c1 = out.filter(_._1 == 1L).map(_._3.toSeq).toSet
    val c2 = out.filter(_._1 == 2L).map(_._3.toSeq).toSet
    assert((c1 intersect c2).size >= c1.size - 2,
      s"blob CDC must share nearly all chunks: ${(c1 intersect c2).size} of ${c1.size}")
    // ASCII payload: byte cuts == code-point cuts of the string form
    val ascii = (1 to 60).map(i => s"word$i piece").mkString(" ")
    val sChunks = Dedup.cdcChunks(Seq((1L, ascii)).toDF("doc_id", "text"),
        "doc_id", "text").orderBy("pos").as[(Long, Int, String)].collect()
    val bChunks = Dedup.cdcChunks(
        Seq((1L, ascii.getBytes("UTF-8"))).toDF("doc_id", "blob"),
        "doc_id", "blob").orderBy("pos").as[(Long, Int, Array[Byte])].collect()
    assert(sChunks.map(_._3).toSeq ===
      bChunks.map(c => new String(c._3, "UTF-8")).toSeq)
  }

  test("cdcDupStats: identical docs fully duplicated, disjoint doc untouched") {
    val copyText = (1 to 30).map(i => s"shared passage $i with content").mkString(" ")
    val docs = Seq((1L, copyText), (2L, copyText),
      (3L, "wholly unrelated standalone words only")).toDF("doc_id", "text")
    val stats = Dedup.cdcDupStats(docs, "doc_id", "text")
      .orderBy("id")
      .select("id", "n_chunks", "n_dup_chunks", "dup_char_frac")
      .as[(Long, Long, Long, Double)].collect()
    assert(stats(0)._4 === 1.0 && stats(1)._4 === 1.0)
    assert(stats(0)._2 === stats(0)._3, "every chunk of an exact copy is duplicated")
    assert(stats(2)._3 === 0L && stats(2)._4 === 0.0)
  }
}
