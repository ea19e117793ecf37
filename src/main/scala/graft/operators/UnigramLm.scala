package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer training (the Kudo 2018 /
  * SentencePiece family — the OTHER production tokenizer besides BPE,
  * [[Bpe]]), in a fixed-iteration, grid-snapped, fully deterministic
  * variant so a SQL oracle can replay it bit-for-bit:
  *
  *   1. corpus → WORD CENSUS (word, count) — the single corpus-sized
  *      shuffle, the [[Bpe.trainMergesFromTokens]] discipline: all
  *      later work is vocabulary-bounded driver state;
  *   2. SEED vocabulary: every ≤ `maxPieceLen`-code-point substring of
  *      every census word, occurrence-weighted; all single code points
  *      are kept (coverage guarantee), plus the top `maxSeeds`
  *      multi-cp substrings by (count DESC, piece ASC);
  *   3. `nIter` rounds of hard (Viterbi) EM: E-step segments each
  *      census word by minimum total cost under the current piece
  *      costs and counts the pieces on the best path,
  *      occurrence-weighted; M-step recomputes costs from the counts,
  *      dropping multi-cp pieces that won zero tokens (single-cp
  *      pieces never drop — they floor at count 1);
  *   4. piece costs are INTEGER MILLINATS, snapped to the grid with
  *      `floor(1000·ln(total/count) + 0.5)` — ln disagreement between
  *      runtimes is sub-ulp, so the snap makes the whole training
  *      replayable in another engine (the exact-grid PCA move).
  *
  * Viterbi ties break deterministically: minimum cost, then the
  * LONGEST last piece (smallest predecessor position) — mirrored by
  * the oracle's `ORDER BY cost, previ` argmin.
  *
  * True SentencePiece uses soft EM (forward–backward expected counts)
  * and Bayesian-smoothed probabilities; hard Viterbi EM is its
  * standard deterministic simplification and keeps every quantity an
  * integer until the one grid-snapped ln.
  *
  * Scale: training state is census-bounded on the driver (the
  * [[Bpe.trainMergesFromTokens]] memory formula applies — ~1 KB per
  * census word); application ([[segmentStats]]) runs Viterbi once per
  * DISTINCT word with the cost table broadcast, then broadcast-joins
  * the per-word piece counts back onto the token stream — the corpus
  * never shuffles for tokenization, the per-doc aggregate is the only
  * exchange ([[Bpe.applyMergesViaVocab]] shape).
  */
object UnigramLm {

  /** Cost of an out-of-vocabulary single code point (10 000 nats —
    * never preferred over any real piece, but finite so segmentation
    * is total over any input). Training never hits it: every single
    * cp of every census word is seeded and never dropped. */
  val UnkCost = 10000000L

  private def cps(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** Snap `1000·ln(x)` to the integer millinat grid —
    * `floor(1000·ln(x) + 0.5)` — FAILING LOUD when the value lands
    * within 1e-9 of the grid cut (fractional part of 1000·ln(x)
    * within 1e-9 of 0.5): there a sub-ulp ln() disagreement between
    * engines flips the floor, silently reordering an argmax/merge
    * downstream. The scaladoc contract that sub-ulp ln drift is
    * absorbed holds only AWAY from the cut, so boundary-exact values
    * abort training with a diagnosable message instead of producing
    * an engine-dependent model. Shared by [[snapCosts]] and
    * [[Bpe.trainWordpieceFromTokens]]'s score snap (and mirrored by
    * the q336/q340 oracles' `floor(1000 * ln(..) + 0.5)`). */
  def snapMillinat(x: Double): Long = {
    val y = 1000.0 * math.log(x)
    val f = y - math.floor(y)
    require(math.abs(f - 0.5) >= 1e-9,
      f"millinat grid boundary: 1000*ln($x) = $y lands within 1e-9 of " +
        "the floor(+0.5) cut; the snap is not replayable across engines " +
        "here - perturb the census (minPairCount/maxVocab) or widen the grid")
    math.floor(y + 0.5).toLong
  }

  /** Minimum-cost segmentation of `word` under `cost` (integer
    * millinats): returns (total cost, pieces). Pieces are ≤
    * `maxPieceLen` code points; an unknown single cp costs
    * [[UnkCost]]; ties prefer the longest last piece. */
  def viterbi(word: String, cost: collection.Map[String, Long],
              maxPieceLen: Int): (Long, List[String]) = {
    val s = cps(word)
    val n = s.length
    val best = Array.fill(n + 1)(Long.MaxValue)
    val prev = Array.fill(n + 1)(-1)
    best(0) = 0L
    var j = 1
    while (j <= n) {
      // l descending → predecessor i ascending; strictly-less keeps
      // the FIRST minimum → smallest i (longest piece) wins ties,
      // matching the oracle's ORDER BY cost, previ
      var l = math.min(maxPieceLen, j)
      while (l >= 1) {
        val i = j - l
        if (best(i) != Long.MaxValue) {
          val piece = s.slice(i, j).mkString
          val c =
            if (cost.contains(piece)) cost(piece)
            else if (l == 1) UnkCost
            else -1L
          if (c >= 0L && best(i) + c < best(j)) {
            best(j) = best(i) + c
            prev(j) = i
          }
        }
        l -= 1
      }
      j += 1
    }
    var pieces = List.empty[String]
    var k = n
    while (k > 0) {
      val i = prev(k)
      pieces = s.slice(i, k).mkString :: pieces
      k = i
    }
    (best(n), pieces)
  }

  /** Grid-snapped integer millinat costs from effective counts. */
  private def snapCosts(v: collection.Map[String, Long])
      : Map[String, Long] = {
    val tot = v.values.sum.toDouble
    v.iterator.map { case (p, c) =>
      p -> snapMillinat(tot / c)
    }.toMap
  }

  /** Train the unigram-LM piece table; returns
    * (rank, piece, cnt, cost_millinats) ordered by rank
    * (= count DESC, piece ASC). Census words longer than `maxWordLen`
    * code points are excluded from training (at web scale those are
    * URLs/garbage; [[segmentStats]] still segments them — head by
    * Viterbi, tail as single cps). */
  def train(toks: DataFrame, nIter: Int = 2, maxPieceLen: Int = 4,
            maxWordLen: Int = 12, maxSeeds: Int = 500,
            maxVocab: Int = 1 << 20): DataFrame = {
    require(nIter >= 1 && maxPieceLen >= 1 && maxWordLen >= 1)
    val spark = toks.sparkSession
    // 1. corpus → census: the single corpus-sized shuffle
    val census: Array[(String, Long)] = toks
      .select(explode(col("ws")).as("tok"))
      .where(length(col("tok")).between(1, maxWordLen))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // 2. seed: substring census, occurrence-weighted
    val seed = scala.collection.mutable.HashMap.empty[String, Long]
    census.foreach { case (w, cnt) =>
      val s = cps(w)
      var i = 0
      while (i < s.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= s.length) {
          val p = s.slice(i, i + l).mkString
          seed(p) = seed.getOrElse(p, 0L) + cnt
          l += 1
        }
        i += 1
      }
    }
    def isSingle(p: String): Boolean = p.codePointCount(0, p.length) == 1
    val singleSeeds = seed.iterator.filter(kv => isSingle(kv._1)).toMap
    val multiSeeds = seed.iterator.filterNot(kv => isSingle(kv._1)).toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(maxSeeds).toMap
    var vocab: Map[String, Long] = singleSeeds ++ multiSeeds
    // 3. hard-EM rounds
    for (_ <- 1 to nIter) {
      val cost = snapCosts(vocab)
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      census.foreach { case (w, cnt) =>
        viterbi(w, cost, maxPieceLen)._2.foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + cnt
        }
      }
      vocab = vocab.iterator.flatMap { case (p, _) =>
        val c = counts.getOrElse(p, 0L)
        if (isSingle(p)) Some(p -> math.max(c, 1L))
        else if (c >= 1L) Some(p -> c)
        else None
      }.toMap
    }
    val cost = snapCosts(vocab)
    val rows = vocab.toSeq.sortBy { case (p, c) => (-c, p) }
      .zipWithIndex.map { case ((p, c), i) =>
        (i + 1L, p, c, cost(p))
      }
    import spark.implicits._
    rows.toDF("rank", "piece", "cnt", "cost_millinats")
  }

  /** The trained cost table as a driver map (for [[segmentStats]] /
    * the spec) — model-state-sized, like the BPE merge list. */
  def costMap(trained: DataFrame): Map[String, Long] =
    trained.select(col("piece"), col("cost_millinats"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Apply a trained piece table corpus-wide: per-doc word and piece
    * counts. Viterbi runs once per DISTINCT word (vocabulary-sized
    * frame, cost table broadcast); words longer than `maxWordLen`
    * segment their first `maxWordLen` cps by Viterbi and the tail as
    * single cps. The token stream broadcast-joins the per-word piece
    * counts — the corpus never shuffles for tokenization
    * ([[Bpe.applyMergesViaVocab]] shape). */
  def segmentStats(toks: DataFrame, cost: Map[String, Long],
                   maxPieceLen: Int = 4, maxWordLen: Int = 12): DataFrame = {
    val spark = toks.sparkSession
    val bc = spark.sparkContext.broadcast(cost)
    val mpl = maxPieceLen
    val mwl = maxWordLen
    val nPieces = udf { (w: String) =>
      val s = cps(w)
      val (head, tail) = s.splitAt(mwl)
      viterbi(head.mkString, bc.value, mpl)._2.size.toLong + tail.length
    }
    val words = toks.where(size(col("ws")) >= 1)
      .select(col("id"), explode(col("ws")).as("tok"))
    val wn = words.select(col("tok")).distinct()
      .withColumn("n_sub", nPieces(col("tok")))
    words.join(broadcast(wn), Seq("tok"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sub")).as("n_pieces"))
  }
}
