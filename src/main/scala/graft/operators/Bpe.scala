package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge induction (the Sennrich et al. 2016
  * subword-tokenizer training core).
  *
  * Scale design: BPE trains on the WORD CENSUS (word → occurrence
  * count), not the token stream — so the corpus is read once for the
  * census (the word-count shuffle every other census operator here
  * uses), and every merge iteration runs over a frame whose size is
  * the VOCABULARY (bounded: ~millions of rows at web scale, regardless
  * of corpus bytes). Each iteration:
  *
  *   1. explode adjacent symbol pairs from each word's current
  *      segmentation, weighted by word count — map-side-combined
  *      aggregate, one shuffle keyed on the pair;
  *   2. take the most frequent pair (deterministic ties: count desc,
  *      then (left, right) asc) — a driver-held scalar like the IVF
  *      centroid matrix / CM sketch;
  *   3. fuse that pair in every word's segmentation with a greedy
  *      left-to-right `aggregate` fold (non-overlapping, standard BPE
  *      application order) — a pure map.
  *
  * The iterating frame is localCheckpoint'd per merge, truncating the
  * otherwise exponentially nesting HOF lineage (same move as
  * [[Dedup.dupClusters]]); on a multi-node cluster use durable
  * checkpointing. Word segmentations use the `</w>` end-of-word marker
  * so merges never cross word boundaries.
  */
object Bpe {

  /** Initial segmentation: each character a symbol, `</w>` appended. */
  private def initSeq(word: Column): Column =
    concat(
      transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))),
      array(lit("</w>")))

  /** Greedy left-to-right fuse of adjacent (l, r) into l+r. The last
    * element is read under a lazy `when` size guard (CaseWhen branches
    * evaluate lazily) so ANSI element_at never sees an empty array. */
  private def fuse(seq: Column, l: String, r: String): Column =
    aggregate(seq, array().cast("array<string>"), (acc, x) => {
      val last = when(size(acc) > 0, element_at(acc, -1))
      when(last === l && x === r,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x)))
    })

  /** Train `nMerges` BPE merges over the corpus; returns the ordered
    * merge table (rank, left, right, pair_count) — the artifact a
    * tokenizer ships. Stops early when no remaining pair reaches
    * `minPairCount`. */
  def trainMerges(df: DataFrame, idCol: String, textCol: String,
                  nMerges: Int, minPairCount: Long = 2L): DataFrame =
    trainMergesFromTokens(TextStats.tokenized(df, idCol, textCol),
      nMerges, minPairCount)

  /** [[trainMerges]] over a pre-built [[TextStats.tokenized]] frame.
    *
    * The corpus contributes exactly ONE distributed pass (the word
    * census shuffle). The merge loop itself runs driver-side over the
    * collected census — the design every production BPE trainer uses:
    * merge-loop state is vocabulary-sized (`maxVocab` word
    * segmentations ≈ tens of MB for a multi-million-word web
    * vocabulary), independent of corpus bytes, the same driver-held-
    * state pattern as the IVF centroid matrix and the CM sketch. A
    * per-merge Spark job would pay plan compilation per iteration for
    * a frame that fits in one task. `maxVocab` truncates to the most
    * frequent words (min-frequency truncation, standard in BPE
    * training — ties broken (count DESC, word ASC) so the census is
    * deterministic and an oracle can replay it).
    *
    * Driver-memory formula — size `maxVocab` to the DRIVER, not the
    * corpus: each census word costs ≈ one boxed-String symbol per
    * character (+`</w>`) in a growable buffer (~50–60 B/symbol on a
    * 64-bit JVM) plus ~2 pair-map entries (~150 B each with boxed-tuple
    * keys), so a ~10-char-average vocabulary runs ≈ 1 KB per word:
    * the default 2^20 ≈ 1 GB of driver heap — comfortable under the
    * usual multi-GB driver; the previous 2^22 default was ~4 GB, too
    * close to typical limits to be a default. BPE quality is insensitive
    * to dropping the census tail (tail words re-segment through the
    * merges trained on the head, the standard min-frequency cut). */
  def trainMergesFromTokens(toks: DataFrame, nMerges: Int,
                            minPairCount: Long = 2L,
                            maxVocab: Int = 1 << 20): DataFrame = {
    require(nMerges > 0, "nMerges must be positive")
    val spark = toks.sparkSession
    // corpus → word census: the single corpus-sized shuffle
    // code-POINT segmentation (matching applyMerges' substr semantics) —
    // split("") would cut UTF-16 surrogate pairs in half and emit
    // malformed symbols for non-BMP text (emoji, CJK extensions)
    val census = collectCensus(toks, maxVocab,
      w => cps(w) :+ "</w>")
    val merges = freqMergeLoop(census, nMerges, minPairCount)
    import spark.implicits._
    merges.toDF("rank", "left", "right", "pair_count")
  }

  /** BYTE-LEVEL BPE training (the GPT-2 / Radford et al. 2019
    * alphabet): symbols are UTF-8 BYTES — rendered as uppercase hex
    * pairs so every symbol is a plain ASCII string both engines build
    * identically (`hex()` in DuckDB, `%02X` here) — plus the `</w>`
    * end-of-word marker. 256 base symbols cover EVERY input losslessly
    * (no UNK ever, multilingual-safe): a code point never seen in
    * training still decomposes into trained byte merges or raw bytes,
    * where a fixed code-point vocabulary would need `[UNK]`
    * (spec-demonstrated on a non-BMP emoji). Same census discipline,
    * merge loop and determinism contract as [[trainMergesFromTokens]].
    * Returns (rank, left, right, pair_count) over hex-pair strings. */
  def trainByteMergesFromTokens(toks: DataFrame, nMerges: Int,
                                minPairCount: Long = 2L,
                                maxVocab: Int = 1 << 20): DataFrame = {
    require(nMerges > 0, "nMerges must be positive")
    val spark = toks.sparkSession
    val census = collectCensus(toks, maxVocab,
      w => byteSyms(w) :+ "</w>")
    val merges = freqMergeLoop(census, nMerges, minPairCount)
    import spark.implicits._
    merges.toDF("rank", "left", "right", "pair_count")
  }

  private def byteSyms(w: String): Array[String] =
    w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"${b & 0xff}%02X")

  private def collectCensus(toks: DataFrame, maxVocab: Int,
                            symbols: String => Array[String])
      : Array[(Array[String], Long)] = toks
    .select(explode(col("ws")).as("tok"))
    .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    .orderBy(col("cnt").desc, col("tok"))
    .limit(maxVocab)
    .collect()
    .map(r => (symbols(r.getString(0)), r.getLong(1)))

  /** The frequency-argmax merge loop shared by the code-point and
    * byte-level trainers: incremental pair counts, deterministic
    * (count DESC, (l, r) ASC) argmax, greedy left-to-right fuse. */
  private def freqMergeLoop(census: Array[(Array[String], Long)],
                            nMerges: Int, minPairCount: Long)
      : Seq[(Int, String, String, Long)] = {
    val seqs = census.map(_._1.toBuffer)
    // INCREMENTAL pair counts (the production-trainer design): built
    // once, then each merge touches only the pairs around its own fuse
    // sites — full recounting per merge would be O(nMerges × corpus
    // symbols) driver work, infeasible at 32k merges on a web vocab.
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    def bump(k: (String, String), d: Long): Unit = {
      val n = counts.getOrElse(k, 0L) + d
      if (n <= 0L) counts.remove(k) else counts(k) = n
    }
    {
      var i = 0
      while (i < seqs.length) {
        val s = seqs(i); val c = census(i)._2
        var j = 0
        while (j < s.length - 1) { bump((s(j), s(j + 1)), c); j += 1 }
        i += 1
      }
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      if (counts.isEmpty) exhausted = true
      else {
        // deterministic argmax: count desc, then (l, r) asc
        val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        if (c < minPairCount) exhausted = true
        else {
          merges += ((rank, l, r, c))
          val lr = l + r
          var i = 0
          while (i < seqs.length) {
            val s = seqs(i); val cw = census(i)._2
            var j = 0
            while (j < s.length - 1) {
              if (s(j) == l && s(j + 1) == r) {   // greedy left-to-right
                bump((l, r), -cw)
                if (j > 0) { bump((s(j - 1), l), -cw); bump((s(j - 1), lr), cw) }
                if (j + 2 < s.length) {
                  bump((r, s(j + 2)), -cw); bump((lr, s(j + 2)), cw)
                }
                s(j) = lr
                s.remove(j + 1)
              }
              j += 1
            }
            i += 1
          }
          rank += 1
        }
      }
    }
    merges.toSeq
  }

  /** WordPiece merge induction (Schuster & Nakajima 2012, the third
    * production tokenizer family next to BPE and [[UnigramLm]]) — the
    * BPE loop with the LIKELIHOOD argmax: each round fuses the pair
    * maximizing `count(l,r) / (count(l)·count(r))` (the pair whose
    * co-occurrence most exceeds chance) instead of raw frequency.
    * Scores are grid-snapped to integer millinats
    * (`floor(1000·ln(c/(sl·sr)) + 0.5)`, the [[UnigramLm]] move) with
    * ties (score DESC, then (l, r) ASC) so an oracle replays every
    * round bit-for-bit. Symbol counts update incrementally at each
    * fuse site exactly like the pair counts (l and r each lose the
    * fused occurrences, lr gains them; l = r loses twice).
    *
    * Same scale posture as [[trainMergesFromTokens]]: ONE corpus-sized
    * census shuffle, then a driver loop over vocabulary-bounded state.
    * Returns (rank, left, right, pair_count, score_m). */
  def trainWordpieceFromTokens(toks: DataFrame, nMerges: Int,
                               minPairCount: Long = 2L,
                               maxVocab: Int = 1 << 20): DataFrame = {
    require(nMerges > 0, "nMerges must be positive")
    val spark = toks.sparkSession
    def symbols(w: String): Array[String] =
      w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    val census: Array[(Array[String], Long)] = toks
      .select(explode(col("ws")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(maxVocab)
      .collect()
      .map(r => (symbols(r.getString(0)) :+ "</w>", r.getLong(1)))
    val seqs = census.map(_._1.toBuffer)
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val syms = scala.collection.mutable.HashMap.empty[String, Long]
    def bump(k: (String, String), d: Long): Unit = {
      val n = counts.getOrElse(k, 0L) + d
      if (n <= 0L) counts.remove(k) else counts(k) = n
    }
    def bumpSym(s: String, d: Long): Unit = {
      val n = syms.getOrElse(s, 0L) + d
      if (n <= 0L) syms.remove(s) else syms(s) = n
    }
    {
      var i = 0
      while (i < seqs.length) {
        val s = seqs(i); val c = census(i)._2
        var j = 0
        while (j < s.length) {
          bumpSym(s(j), c)
          if (j < s.length - 1) bump((s(j), s(j + 1)), c)
          j += 1
        }
        i += 1
      }
    }
    // grid snap with the boundary guard ([[UnigramLm.snapMillinat]]):
    // a score landing within 1e-9 of the floor(+0.5) cut aborts loud —
    // a sub-ulp ln() difference between engines would flip the snapped
    // value and hence a merge argmax, so the model would not replay
    def scoreM(l: String, r: String, c: Long): Long =
      UnigramLm.snapMillinat(
        c.toDouble / (syms(l).toDouble * syms(r).toDouble))
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long)]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val cand = counts.iterator.filter(_._2 >= minPairCount).map {
        case ((l, r), c) => (l, r, c, scoreM(l, r, c))
      }.toSeq
      if (cand.isEmpty) exhausted = true
      else {
        val (l, r, c, sm) = cand.minBy { case (a, b, _, s) => (-s, a, b) }
        merges += ((rank, l, r, c, sm))
        val lr = l + r
        var i = 0
        while (i < seqs.length) {
          val s = seqs(i); val cw = census(i)._2
          var j = 0
          while (j < s.length - 1) {
            if (s(j) == l && s(j + 1) == r) {   // greedy left-to-right
              bump((l, r), -cw)
              if (j > 0) { bump((s(j - 1), l), -cw); bump((s(j - 1), lr), cw) }
              if (j + 2 < s.length) {
                bump((r, s(j + 2)), -cw); bump((lr, s(j + 2)), cw)
              }
              bumpSym(l, -cw); bumpSym(r, -cw); bumpSym(lr, cw)
              s(j) = lr
              s.remove(j + 1)
            }
            j += 1
          }
          i += 1
        }
        rank += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "pair_count", "score_m")
  }

  private def cps(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** The vocabulary a trained WordPiece SHIPS, derived from
    * [[trainWordpieceFromTokens]]'s merge table: every single code
    * point of the training census plus every merge product with the
    * `</w>` end-of-word marker stripped. Production WordPiece vocabs
    * distinguish word-initial from continuation pieces; our trainer is
    * position-free, so the stripped form serves both (the standard
    * suffix-agnostic simplification — the `##` distinction is applied
    * at SEGMENTATION time by [[greedyPieces]], not stored). The char
    * census is distributed (explode code points over the
    * `limit(maxVocab)` word census — the same cap as training) and the
    * collected set is vocabulary-sized. */
  def wordpieceVocab(toks: DataFrame, merges: Seq[(String, String)],
                     maxVocab: Int = 1 << 20): Set[String] = {
    val cpUdf = udf((w: String) => cps(w))
    val chars = toks.select(explode(col("ws")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(maxVocab)
      .select(explode(cpUdf(col("tok"))).as("p"))
      .distinct().collect().map(_.getString(0)).toSet
    val products = merges.iterator
      .map { case (l, r) => (l + r).replace("</w>", "") }
      .filter(_.nonEmpty).toSet
    chars ++ products
  }

  /** Greedy longest-match-first WordPiece segmentation (Schuster &
    * Nakajima 2012 — the PRODUCTION apply face, NOT merge replay:
    * BPE applies by replaying merges in rank order, WordPiece matches
    * the longest vocab piece at each position; the two DIVERGE on the
    * same vocab, spec-demonstrated). Pieces after the first carry the
    * `##` continuation prefix. Returns None — the whole word maps to
    * `[UNK]` — when some position matches nothing (vocab pieces
    * longer than `maxPieceLen` code points are never matched, by
    * contract mirrored in the oracle). */
  def greedyPieces(word: String, vocab: Set[String],
                   maxPieceLen: Int = 12): Option[List[String]] = {
    val s = cps(word)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      var l = math.min(maxPieceLen, s.length - i)
      var found = -1
      while (l >= 1 && found < 0) {
        if (vocab.contains(s.slice(i, i + l).mkString)) found = l
        l -= 1
      }
      if (found < 0) return None
      val raw = s.slice(i, i + found).mkString
      out += (if (i == 0) raw else "##" + raw)
      i += found
    }
    Some(out.toList)
  }

  /** Corpus-wide WordPiece piece census under [[greedyPieces]]:
    * (piece, n_occ) with `##`-prefixed continuations, words longer
    * than `maxWordLen` code points or with an unmatched position
    * contributing one `[UNK]` per OCCURRENCE (the production
    * max_input_chars_per_word rule). Segmentation runs once per
    * DISTINCT word with the vocab broadcast ([[applyMergesViaVocab]]
    * shape) — the corpus contributes one census shuffle and the
    * output aggregate is piece-keyed (vocabulary-bounded). */
  def wordpiecePieceCensus(toks: DataFrame, vocab: Set[String],
                           maxPieceLen: Int = 12,
                           maxWordLen: Int = 16): DataFrame = {
    val spark = toks.sparkSession
    val bc = spark.sparkContext.broadcast(vocab)
    val mpl = maxPieceLen
    val mwl = maxWordLen
    val segUdf = udf { (w: String) =>
      if (w.codePointCount(0, w.length) > mwl) null
      else greedyPieces(w, bc.value, mpl).map(_.toArray).orNull
    }
    toks.where(size(col("ws")) >= 1)
      .select(explode(col("ws")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .withColumn("pieces", segUdf(col("tok")))
      .select(explode(when(col("pieces").isNull,
        array(lit("[UNK]"))).otherwise(col("pieces"))).as("piece"),
        col("c"))
      .groupBy(col("piece")).agg(sum(col("c")).as("n_occ"))
  }

  /** Corpus-wide WordPiece segmentation stats under [[greedyPieces]]:
    * per-doc `(id, n_words, n_pieces, n_unk_words)` — UNK words (too
    * long or unmatched) contribute zero pieces and count in
    * `n_unk_words`, so compression ratios read over the SEGMENTED
    * mass. Same shape as [[UnigramLm.segmentStats]]: one Viterbi-free
    * greedy pass per DISTINCT word with the vocab broadcast, the
    * corpus never shuffles for tokenization, the per-doc aggregate is
    * the only exchange. */
  def wordpieceSegmentStats(toks: DataFrame, vocab: Set[String],
                            maxPieceLen: Int = 12,
                            maxWordLen: Int = 16): DataFrame = {
    val spark = toks.sparkSession
    val bc = spark.sparkContext.broadcast(vocab)
    val mpl = maxPieceLen
    val mwl = maxWordLen
    val nPieces = udf { (w: String) =>
      if (w.codePointCount(0, w.length) > mwl) null
      else greedyPieces(w, bc.value, mpl)
        .map(p => java.lang.Long.valueOf(p.size.toLong)).orNull
    }
    val words = toks.where(size(col("ws")) >= 1)
      .select(col("id"), explode(col("ws")).as("tok"))
    val wn = words.select(col("tok")).distinct()
      .withColumn("n_sub", nPieces(col("tok")))
    words.join(broadcast(wn), Seq("tok"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("n_sub"), lit(0L))).as("n_pieces"),
        sum(when(col("n_sub").isNull, 1L).otherwise(0L))
          .as("n_unk_words"))
  }

  /** Apply a trained merge table to text: tokenize, segment each word,
    * replay the merges in rank order (greedy left-to-right, the same
    * [[fuse]] fold as training), and emit per-document subword counts.
    * The merge table is a driver-held literal chain (like the IVF
    * centroid matrix) — the corpus never shuffles for application; the
    * per-doc aggregate is the only exchange. Merge chains beyond a few
    * hundred ranks should precompute a vocabulary and use a trie-based
    * codegen expression instead. */
  def applyMerges(toks: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val seg0 = transform(col("ws"), w => initSeq(w))
    val segN = merges.foldLeft(seg0) { case (acc, (l, r)) =>
      transform(acc, s => fuse(s, l, r))
    }
    toks
      .where(size(col("ws")) >= 1)
      .select(col("id"), explode(segN).as("seq"))
      .select(col("id"), size(col("seq")).as("n"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n")).as("n_subwords"))
  }

  /** [[applyMerges]] via the vocabulary — the corpus-scale shape: the
    * merge chain is fused once per DISTINCT word (heavy compute bounded
    * by vocabulary size, lineage truncated every `checkpointEvery`
    * ranks — the [[trainMergesFromTokens]] localCheckpoint move), and
    * the per-word subword counts broadcast-join back onto the token
    * stream. The corpus never shuffles for tokenization; the per-doc
    * aggregate is the only exchange. Tokenization is a pure function of
    * the word, so the result is row-identical to [[applyMerges]]
    * (asserted by BpeSpec). */
  def applyMergesViaVocab(toks: DataFrame, merges: Seq[(String, String)],
                          checkpointEvery: Int = 8): DataFrame = {
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val words = toks.where(size(col("ws")) >= 1)
      .select(col("id"), explode(col("ws")).as("tok"))
    var seg = words.select(col("tok")).distinct()
      .withColumn("seg", initSeq(col("tok")))
    merges.grouped(checkpointEvery).foreach { batch =>
      val segN = batch.foldLeft(col("seg")) {
        case (acc, (l, r)) => fuse(acc, l, r)
      }
      // LAZY checkpoint: plan truncation (the point of the per-batch
      // fence — bounded expression depth) happens at wrap time either
      // way; eager additionally paid one materialization JOB per
      // batch, when the single downstream subword-count job can fold
      // the whole narrow chain in one pass
      seg = seg.withColumn("seg", segN).localCheckpoint(false)
    }
    val subc = seg.select(col("tok"), size(col("seg")).as("n_sub"))
    words.join(broadcast(subc), Seq("tok"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sub").cast("long")).as("n_subwords"))
  }

  /** Initial BYTE-LEVEL segmentation: each UTF-8 byte a hex-pair
    * symbol (`hex()` of the word — codegen'd, no UDF), `</w>`
    * appended. Mirrors [[byteSyms]] and the oracle's
    * `substr(hex(tok), 2i−1, 2)` comprehension. */
  private def initByteSeq(word: Column): Column = {
    val hx = hex(encode(word, "UTF-8"))
    concat(
      transform(sequence(lit(1), (length(hx) / lit(2)).cast("int")),
        i => hx.substr(i * 2 - 1, lit(2))),
      array(lit("</w>")))
  }

  /** [[applyMergesViaVocab]] for a [[trainByteMergesFromTokens]] merge
    * table: the same vocabulary-path discipline (merge chain fused
    * once per DISTINCT word, lineage truncated per batch, per-word
    * subword counts broadcast back, the corpus never shuffles) over
    * the byte alphabet. Total over ANY input — an unseen code point
    * just stays as its raw bytes ([[trainByteMergesFromTokens]]'s
    * no-UNK guarantee). */
  def applyByteMergesViaVocab(toks: DataFrame, merges: Seq[(String, String)],
                              checkpointEvery: Int = 8): DataFrame = {
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val words = toks.where(size(col("ws")) >= 1)
      .select(col("id"), explode(col("ws")).as("tok"))
    var seg = words.select(col("tok")).distinct()
      .withColumn("seg", initByteSeq(col("tok")))
    merges.grouped(checkpointEvery).foreach { batch =>
      val segN = batch.foldLeft(col("seg")) {
        case (acc, (l, r)) => fuse(acc, l, r)
      }
      // LAZY checkpoint: plan truncation (the point of the per-batch
      // fence — bounded expression depth) happens at wrap time either
      // way; eager additionally paid one materialization JOB per
      // batch, when the single downstream subword-count job can fold
      // the whole narrow chain in one pass
      seg = seg.withColumn("seg", segN).localCheckpoint(false)
    }
    val subc = seg.select(col("tok"), size(col("seg")).as("n_sub"))
    words.join(broadcast(subc), Seq("tok"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sub").cast("long")).as("n_subwords"))
  }
}
