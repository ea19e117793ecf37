package graft

import graft.operators.{Bpe, TextStats}
import org.apache.spark.sql.functions._

/** BPE merge induction against the hand-computable Sennrich corpus. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic example: low×5, lower×2, newest×6, widest×3
  private def corpus = Seq(
    (1L, Seq.fill(5)("low").mkString(" ")),
    (2L, Seq.fill(2)("lower").mkString(" ")),
    (3L, Seq.fill(6)("newest").mkString(" ")),
    (4L, Seq.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")

  test("trainMerges reproduces the hand-computed Sennrich merges in order") {
    val got = Bpe.trainMerges(corpus, "doc_id", "text", nMerges = 5)
      .orderBy("rank")
      .collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count")))
    // ties at 9 ((e,s),(s,t),(t,</w>)) break lexicographically; then the
    // merged symbols cascade: es+t, est+</w>, then the l-o-w family at 7
    assert(got.toSeq === Seq(
      (0, "e", "s", 9L),
      (1, "es", "t", 9L),
      (2, "est", "</w>", 9L),
      (3, "l", "o", 7L),
      (4, "lo", "w", 7L)))
  }

  test("trainWordpiece: likelihood argmax diverges from BPE's frequency argmax; snapped-score ties break (l, r) asc; symbol counts track fuses") {
    // "ab"×5, "a"×20, "b"×20, "xy"×3 — symbols a:25 b:25 x:3 y:3 </w>:48
    // scores c/(sl·sr): (x,y) 3/9 = .333 beats every frequent pair,
    // while BPE's count argmax would take (b,</w>) at 25
    val docs = Seq(
      (1L, Seq.fill(5)("ab").mkString(" ")),
      (2L, Seq.fill(20)("a").mkString(" ")),
      (3L, Seq.fill(20)("b").mkString(" ")),
      (4L, Seq.fill(3)("xy").mkString(" "))).toDF("doc_id", "text")
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val wp = Bpe.trainWordpieceFromTokens(toks, nMerges = 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count")))
    // round 2: (b,</w>) 25/(25·48) and (xy,</w>) 3/(3·48) are EXACTLY
    // 1/48 both — equal snapped scores, so (l,r) asc picks "b";
    // round 3: </w> still 48? no — after fusing b</w> its census is 23,
    // so (xy,</w>) 1/23 beats (a,</w>) 20/(25·23)
    assert(wp.toSeq === Seq(
      (0, "x", "y", 3L), (1, "b", "</w>", 25L), (2, "xy", "</w>", 3L)))
    val bpe = Bpe.trainMergesFromTokens(toks, nMerges = 1)
      .collect().map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
    assert(bpe.head === (("b", "</w>")),
      "BPE's frequency argmax must differ from WordPiece's likelihood argmax here")
  }

  test("trainMerges stops early when no pair reaches minPairCount") {
    val tiny = Seq((1L, "ab cd")).toDF("doc_id", "text")
    val got = Bpe.trainMerges(tiny, "doc_id", "text",
      nMerges = 10, minPairCount = 2)
    assert(got.count() === 0)   // every pair occurs once
  }

  test("tiny maxVocab truncates the census gracefully (top words by count desc, word asc)") {
    // maxVocab = 2 keeps only newest (6) and low (5): merges must be the
    // e-s-t chain at count 6 then n-e etc. — never a pair from lower/widest
    // unless shared with the kept words
    val toks = TextStats.tokenized(corpus, "doc_id", "text")
    val got = Bpe.trainMergesFromTokens(toks, nMerges = 3, maxVocab = 2)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count")))
    // census: newest×6, low×5. All newest-pairs count 6; ties break
    // (l, r) asc: (e,s) first, then — with es fused — (e,w) precedes
    // (es,t) lexicographically, then (es,t).
    assert(got.toSeq === Seq(
      (0, "e", "s", 6L),
      (1, "e", "w", 6L),
      (2, "es", "t", 6L)))
    // nothing from the dropped words (lower/widest) may surface: their
    // exclusive symbols are r, i, d
    got.foreach { case (_, l, r, _) =>
      assert(!(l + r).exists("rid".contains(_)), s"dropped-word symbol in ($l, $r)")
    }
  }

  test("non-BMP text: training segments by code points, so train and apply agree") {
    val docs = Seq((1L, Seq.fill(3)("😀ok").mkString(" ")))
      .toDF("doc_id", "text")   // the 😀 emoji is a surrogate pair
    val merges = Bpe.trainMerges(docs, "doc_id", "text", nMerges = 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
    // no merge may contain a lone surrogate half
    merges.foreach { case (l, r) =>
      Seq(l, r).foreach(sym => assert(!sym.exists(Character.isSurrogate)
        || sym.codePoints().count() * 2 == sym.length, s"malformed symbol in ($l, $r)"))
    }
    // applying the trained merges reproduces one fused token stream:
    // 😀 o k </w> under 3 merges collapses fully -> 1 subword per word
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val out = Bpe.applyMerges(toks, merges.toSeq).collect()
    assert(out(0).getAs[Long]("n_words") === 3L)
    assert(out(0).getAs[Long]("n_subwords") === 3L)
  }

  test("incremental pair counting equals a naive full recount on random corpora") {
    // naive reference: recount all pairs from scratch each merge
    def naiveTrain(words: Seq[(String, Long)], nMerges: Int): Seq[(String, String, Long)] = {
      val seqs = words.map { case (w, c) =>
        (w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
          .toBuffer :+ "</w>", c)
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var go = true
      while (out.length < nMerges && go) {
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        seqs.foreach { case (s, c) =>
          (0 until s.length - 1).foreach { j =>
            counts((s(j), s(j + 1))) = counts.getOrElse((s(j), s(j + 1)), 0L) + c
          }
        }
        if (counts.isEmpty) go = false
        else {
          val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
          if (c < 2L) go = false
          else {
            out += ((l, r, c))
            seqs.foreach { case (s, _) =>
              var j = 0
              while (j < s.length - 1) {
                if (s(j) == l && s(j + 1) == r) { s(j) = l + r; s.remove(j + 1) }
                j += 1
              }
            }
          }
        }
      }
      out.toSeq
    }
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 30) {
      val alphabet = "ab" + (if (trial % 3 == 0) "c" else "")
      val words = (1 to 8).map { _ =>
        val w = (1 to (1 + rng.nextInt(5)))
          .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
        (w, (1 + rng.nextInt(4)).toLong)
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
      val docs = words.zipWithIndex.map { case ((w, c), i) =>
        (i.toLong, Seq.fill(c.toInt)(w).mkString(" "))
      }.toDF("doc_id", "text")
      val got = Bpe.trainMerges(docs, "doc_id", "text", nMerges = 10)
        .orderBy("rank").collect()
        .map(r => (r.getAs[String]("left"), r.getAs[String]("right"),
          r.getAs[Long]("pair_count"))).toSeq
      val want = naiveTrain(words, 10)
      assert(got === want, s"trial $trial corpus=$words")
    }
  }

  test("applyMerges replays training segmentation: known subword counts") {
    val doc = Seq((1L, "low lower newest")).toDF("doc_id", "text")
    val toks = TextStats.tokenized(doc, "doc_id", "text")
    val merges = Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"))
    val out = Bpe.applyMerges(toks, merges).collect()
    assert(out.length === 1)
    // low -> [low, </w>]; lower -> [low, e, r, </w>]; newest -> [n, e, w, est</w>]
    assert(out(0).getAs[Long]("n_words") === 3L)
    assert(out(0).getAs[Long]("n_subwords") === (2L + 4L + 4L))
  }

  test("applyMergesViaVocab ≡ applyMerges on random corpora (vocab path, tiny checkpoint batches)") {
    val rng = new scala.util.Random(83)
    val docs = (1L to 30L).map { id =>
      val words = Seq.fill(3 + rng.nextInt(20))(
        Seq.fill(1 + rng.nextInt(6))(('a' + rng.nextInt(4)).toChar).mkString)
      (id, words.mkString(" "))
    }.toDF("doc_id", "text")
    val toks = TextStats.tokenized(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = Bpe.trainMergesFromTokens(toks, nMerges = 12)
      .orderBy("rank")
      .select(col("left"), col("right")).as[(String, String)].collect().toSeq
    assert(merges.nonEmpty)
    val direct = Bpe.applyMerges(toks, merges)
      .orderBy("id").collect().map(r =>
        (r.getLong(0), r.getAs[Long]("n_words"), r.getAs[Long]("n_subwords")))
    val viaVocab = Bpe.applyMergesViaVocab(toks, merges, checkpointEvery = 3)
      .orderBy("id").collect().map(r =>
        (r.getLong(0), r.getAs[Long]("n_words"), r.getAs[Long]("n_subwords")))
    assert(viaVocab.toSeq === direct.toSeq)
    toks.unpersist(blocking = false)
  }

  test("greedyPieces: longest-match-first with ## continuations; DIVERGES from merge replay on the same vocab; UNK on unmatched") {
    // vocab {a, b, c, ab, bc}: greedy takes the longest PREFIX 'ab'
    // then '##c'; merge replay of the single merge (b, c) fuses from
    // the inside out → [a, bc]. Same vocab, different segmentations —
    // why WordPiece needs its own apply face instead of q113's.
    val vocab = Set("a", "b", "c", "ab", "bc")
    assert(Bpe.greedyPieces("abc", vocab) ===
      Some(List("ab", "##c")))
    val replayed = Seq("a", "b", "c") // init cps
    val fused = { // greedy left-to-right fuse of (b, c), BPE's apply
      val buf = scala.collection.mutable.ListBuffer(replayed: _*)
      var i = 0
      while (i < buf.length - 1) {
        if (buf(i) == "b" && buf(i + 1) == "c") {
          buf(i) = "bc"; buf.remove(i + 1)
        }
        i += 1
      }
      buf.toList
    }
    assert(fused === List("a", "bc"))
    assert(Bpe.greedyPieces("abc", vocab).get.map(_.stripPrefix("##"))
      !== fused, "the two apply faces must diverge on this vocab")
    // unmatched position → None (the whole word is [UNK])
    assert(Bpe.greedyPieces("axc", vocab) === None)
    // non-BMP code point: matching is code-point-based, not UTF-16
    assert(Bpe.greedyPieces("a😀b", vocab + "😀") ===
      Some(List("a", "##😀", "##b")))
  }

  test("wordpiecePieceCensus ≡ driver greedy per word; long words and stuck words weight [UNK] per occurrence") {
    val docs = Seq(
      (1L, "abc abc ab zz"),                    // zz: 'z' not in vocab
      (2L, "abc " + "a" * 20)).toDF("doc_id", "text") // 20 cps → UNK
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val merges = Seq(("a", "b"), ("ab", "c</w>"))
    val vocab = Bpe.wordpieceVocab(toks, merges)
    // census chars {a,b,c,z} + stripped products {ab, abc}
    assert(vocab === Set("a", "b", "c", "z", "ab", "abc"))
    val got = Bpe.wordpiecePieceCensus(toks, vocab, maxWordLen = 16)
      .as[(String, Long)].collect().toMap
    // abc ×3 → 'abc'; ab ×1 → 'ab'; zz → z, ##z; a*20 → [UNK] once
    assert(got === Map("abc" -> 3L, "ab" -> 1L, "z" -> 1L, "##z" -> 1L,
      "[UNK]" -> 1L))
    // the per-doc stats face over the same fixture: UNK words count in
    // n_unk_words and contribute zero pieces
    val stats = Bpe.wordpieceSegmentStats(toks, vocab, maxWordLen = 16)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(stats === Map(
      1L -> ((4L, 5L, 0L)),   // abc abc ab zz → 1+1+1+2 pieces
      2L -> ((2L, 1L, 1L))))  // abc + the 20-cp UNK word
  }

  test("byte-level BPE: apply ≡ driver merge replay; unseen non-BMP emoji segments losslessly where a code-point vocab needs UNK") {
    val trainDocs = Seq((1L, "abab abab cd"), (2L, "abab cd cd"))
      .toDF("doc_id", "text")
    val toks = TextStats.tokenized(trainDocs, "doc_id", "text")
    val merges = Bpe.trainByteMergesFromTokens(toks, nMerges = 6)
      .orderBy("rank")
      .select(col("left"), col("right")).as[(String, String)].collect().toSeq
    assert(merges.nonEmpty)
    // every merge side is hex pairs and/or the </w> marker
    assert(merges.forall { case (l, r) =>
      (l + r).replace("</w>", "").matches("[0-9A-F]*") })
    def byteSyms(w: String): List[String] =
      w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => f"${b & 0xff}%02X").toList :+ "</w>"
    // driver replay of the greedy left-to-right fuse (applyMerges law)
    def replay(w: String): List[String] =
      merges.foldLeft(byteSyms(w)) { case (seq, (l, r)) =>
        val buf = scala.collection.mutable.ListBuffer(seq: _*)
        var i = 0
        while (i < buf.length - 1) {
          if (buf(i) == l && buf(i + 1) == r) {
            buf(i) = l + r; buf.remove(i + 1)
          }
          i += 1
        }
        buf.toList
      }
    // apply to a corpus with a word the trainer NEVER saw, containing
    // a non-BMP code point: segmentation is TOTAL — no UNK path exists
    val applyDocs = Seq((9L, "abab 😀x")).toDF("doc_id", "text")
    val atoks = TextStats.tokenized(applyDocs, "doc_id", "text")
    val got = Bpe.applyByteMergesViaVocab(atoks, merges)
      .as[(Long, Long, Long)].collect().head
    assert(got === ((9L, 2L,
      (replay("abab").size + replay("😀x").size).toLong)))
    // LOSSLESSNESS: the emoji word's pieces concatenate back to its
    // exact UTF-8 hex — nothing was dropped or replaced
    val em = replay("😀x")
    assert(em.mkString.replace("</w>", "") ===
      "😀x".getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => f"${b & 0xff}%02X").mkString)
    // the CODE-POINT vocabulary induced from the same training census
    // has no symbol for the emoji — a fixed-vocab code-point tokenizer
    // (q344's greedy face) maps the whole word to [UNK]
    val cpVocab = Bpe.wordpieceVocab(toks, Nil)
    assert(!cpVocab.contains("😀"))
    assert(Bpe.greedyPieces("😀x", cpVocab) === None)
  }
}
