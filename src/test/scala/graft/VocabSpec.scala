package graft

import graft.operators.{Dedup, TextStats, Vocab}
import org.apache.spark.sql.functions._

/** Vocabulary induction / token-id encoding and boilerplate chunk
  * removal (round-5 session 3). */
class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("buildFromTokens: rank by (count desc, word asc), contiguous ids from 1") {
    // counts: b=3, a=2, c=2, d=1 → ids b=1, a=2 (tie a<c), c=3, d=4
    val docs = Seq((1L, "b a c b"), (2L, "b a c d")).toDF("doc_id", "text")
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val voc = Vocab.buildFromTokens(toks, 10)
      .orderBy("wid").select("word", "cnt", "wid")
      .as[(String, Long, Long)].collect().toSeq
    assert(voc === Seq(("b", 3L, 1L), ("a", 2L, 2L), ("c", 2L, 3L), ("d", 1L, 4L)))
  }

  test("buildFromTokens: vocabSize truncates at the ranked boundary") {
    val docs = Seq((1L, "b a c b"), (2L, "b a c d")).toDF("doc_id", "text")
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val voc = Vocab.buildFromTokens(toks, 2)
      .orderBy("wid").select("word").as[String].collect().toSeq
    assert(voc === Seq("b", "a"))
  }

  test("encodeStats: hand-computed OOV counts and positional checksum") {
    val docs = Seq((1L, "b a c b"), (2L, "b a c d")).toDF("doc_id", "text")
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val voc = Vocab.buildFromTokens(toks, 3) // b=1 a=2 c=3; d → OOV
    val out = Vocab.encodeStats(toks, voc)
      .orderBy("id")
      .select("id", "n_tokens", "n_unk", "id_checksum")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc1 ids (b,a,c,b)=(1,2,3,1): 1*1+2*2+3*3+4*1 = 18
    // doc2 ids (b,a,c,d)=(1,2,3,0): 1*1+2*2+3*3+4*0 = 14
    assert(out === Seq((1L, 4L, 0L, 18L), (2L, 4L, 1L, 14L)))
  }

  test("encodeStats checksum is order-sensitive: permuted ids disagree") {
    val docs = Seq((1L, "a b"), (2L, "b a")).toDF("doc_id", "text")
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val voc = Vocab.buildFromTokens(toks, 10)
    val out = Vocab.encodeStats(toks, voc)
      .select("id", "id_checksum").as[(Long, Long)].collect().toMap
    assert(out(1L) !== out(2L))
  }

  test("encodeStats ≡ naive local reimplementation on random corpora") {
    val rng = new scala.util.Random(114)
    val corpus = (1L to 40L).map { id =>
      (id, Seq.fill(1 + rng.nextInt(30))(
        ('a' + rng.nextInt(8)).toChar.toString * (1 + rng.nextInt(3))).mkString(" "))
    }
    val docs = corpus.toDF("doc_id", "text")
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val V = 5
    val got = Vocab.encodeStats(toks, Vocab.buildFromTokens(toks, V))
      .orderBy("id").select("id", "n_tokens", "n_unk", "id_checksum")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // naive: census, rank, encode — entirely on the driver
    val words = corpus.flatMap(_._2.split(" ").filter(_.nonEmpty))
    val rank = words.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(V).map(_._1)
      .zipWithIndex.map { case (w, i) => (w, i + 1L) }.toMap
    val expect = corpus.map { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      val ids = ws.map(w => rank.getOrElse(w, 0L))
      (id, ws.length.toLong, ids.count(_ == 0L).toLong,
        ids.zipWithIndex.map { case (v, p) => (p + 1) * v }.sum)
    }
    assert(got === expect)
  }

  test("boilerplateChunkStats: df-threshold removal, hand-computed") {
    // chunk "a b" (w=2) appears in docs 1,2,3 (df=3 ≥ 3 → boilerplate);
    // "c d" in docs 1,2 (df=2 → kept); doc 4 has no boilerplate.
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "c d a b"),
      (3L, "a b e f"),
      (4L, "g h i j")).toDF("doc_id", "text")
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val out = Dedup.boilerplateChunkStats(toks, w = 2, minDocs = 3)
      .orderBy("id").select("id", "n_chunks", "n_removed")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 1L), (4L, 2L, 0L)))
  }

  test("boilerplateChunkStats: df counts distinct docs, not occurrences") {
    // "a b" twice in ONE doc → df=1, below minDocs=2: repetition inside
    // a document is q54/q68 territory, not boilerplate.
    val docs = Seq((1L, "a b a b"), (2L, "c d e f")).toDF("doc_id", "text")
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val out = Dedup.boilerplateChunkStats(toks, w = 2, minDocs = 2)
      .agg(sum("n_removed")).as[Long].collect().head
    assert(out === 0L)
  }

  test("boilerplateStripFromTokens: rebuilds docs without template chunks") {
    // Same corpus as the stats test: "a b" is boilerplate (df=3),
    // everything else survives in position order.
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "c d a b"),
      (3L, "a b e f"),
      (4L, "g h i j")).toDF("doc_id", "text")
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val out = Dedup.boilerplateStripFromTokens(toks, w = 2, minDocs = 3)
      .orderBy("id").select("id", "n_kept_chunks", "clean_text")
      .as[(Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 1L, "c d"), (2L, 1L, "c d"), (3L, 1L, "e f"),
      (4L, 2L, "g h i j")))
  }

  test("boilerplateStripFromTokens: all-template docs vanish; counts agree with stats") {
    // doc 3 is ONLY the boilerplate chunk → no surviving chunks → absent
    // from the strip output (the q68 contract), while the stats variant
    // still reports it. Kept counts satisfy n_kept = n_chunks − n_removed.
    val docs = Seq(
      (1L, "x y c d"),
      (2L, "x y e f"),
      (3L, "x y")).toDF("doc_id", "text")
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val strip = Dedup.boilerplateStripFromTokens(toks, w = 2, minDocs = 3)
    val stats = Dedup.boilerplateChunkStats(toks, w = 2, minDocs = 3)
    assert(strip.select("id").as[Long].collect().toSet === Set(1L, 2L))
    val joined = stats.join(strip, Seq("id"), "left")
      .select(col("id"),
        (col("n_chunks") - col("n_removed")).as("expect_kept"),
        coalesce(col("n_kept_chunks"), lit(0L)).as("got_kept"))
      .as[(Long, Long, Long)].collect().toSeq
    joined.foreach { case (id, expect, got) =>
      assert(expect === got, s"doc $id kept-count mismatch")
    }
  }
}
