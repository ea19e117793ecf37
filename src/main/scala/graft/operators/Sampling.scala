package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * Instead of RNG-based `sample()` (irreproducible across engines,
  * partitionings, and reruns), rows are assigned to buckets by an md5
  * hash of a stable key. The same row lands in the same bucket in any
  * engine, any run, any partitioning — which is what makes
  * train/test splits auditable and joins between separately-sampled
  * datasets consistent at 100 TB (sample once per KEY, not per row
  * occurrence: all rows of a key travel together).
  */
object Sampling {

  /** Hash bucket in [0, buckets) from the first 4 hex chars of
    * md5(key). */
  def hashBucket(key: Column, buckets: Int): Column =
    (conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int") % buckets)

  /** DuckDB SQL for the same bucket. */
  def hashBucketSql(key: String, buckets: Int): String =
    s"(('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 4))::INT % $buckets)"

  /** Keep ~pct% of keys, deterministically. */
  def deterministicSample(df: DataFrame, keyCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100)
    df.where(hashBucket(col(keyCol), 100) < pct)
  }

  /** Add a `split` column: "test" for ~testPct% of keys, else "train". */
  def trainTestSplit(df: DataFrame, keyCol: String, testPct: Int): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(keyCol), 100) < testPct, "test").otherwise("train"))

  /** GROUP-AWARE train/test split — the leakage-safe form: the split
    * hashes a GROUP key (e.g. the near-dup cluster rep from
    * [[Dedup.dupClusters]]), so every member of a group lands in the
    * SAME split. A per-document split leaks: two near-duplicates can
    * straddle train and test, and the model is then evaluated on
    * paraphrases of its training data — the evaluation-contamination
    * failure the decontamination family (q52/q53) guards against at
    * the corpus boundary, applied here to the corpus's own split.
    * Pure map over a frame already carrying the group column; rows
    * with a NULL group key fall back to their own `keyCol` (a null
    * group means "ungrouped", not "all in one bucket"). */
  def groupTrainTestSplit(df: DataFrame, groupCol: String, keyCol: String,
                          testPct: Int): DataFrame =
    df.withColumn("split",
      when(hashBucket(coalesce(col(groupCol), col(keyCol)), 100) < testPct,
        "test").otherwise("train"))

  /** Temperature (α) mixture reweighting — the multilingual-pretraining
    * sampling scheme (sampling distribution p_s ∝ n_s^α flattens the
    * head, lifts the tail for α < 1). Data-driven two-pass shape:
    * aggregate per-stratum counts (one tiny frame), derive each
    * stratum's keep rate `min(1, T·p_s / n_s)` for a corpus target of
    * `targetFraction`·total rows, broadcast the rates back, keep rows
    * through the deterministic hash buckets (10 000 of them, threshold
    * = round(rate, 4)·10⁴ so the double math is engine-portable).
    *
    * α is fixed at 0.5 (√n): IEEE sqrt is correctly rounded in every
    * engine, so thresholds are bit-reproducible; generic pow(n, α) is
    * not correctly rounded and could differ in the last ulp across
    * engines — callers needing other α should precompute rates. */
  def temperatureSample(df: DataFrame, keyCol: String, stratumCol: String,
                        targetFraction: Double): DataFrame =
    temperatureSampleBySize(df, keyCol, stratumCol, targetFraction,
      count(lit(1)))

  /** The shared √-size schedule: stratum sizes come from `sizeAgg`
    * (row count for [[temperatureSample]], token sum for
    * [[temperatureSampleByTokens]]); one implementation so the
    * rate/threshold quantization cannot drift between the two. */
  private def temperatureSampleBySize(df: DataFrame, keyCol: String,
                                      stratumCol: String,
                                      targetFraction: Double,
                                      sizeAgg: Column): DataFrame = {
    require(targetFraction > 0 && targetFraction <= 1)
    val counts = df.groupBy(col(stratumCol)).agg(sizeAgg.as("__n"))
    val weighted = counts.withColumn("__w", sqrt(col("__n").cast("double")))
    val tot = weighted.agg(sum(col("__n")).as("__tot"), sum(col("__w")).as("__wsum"))
    val rates = weighted.crossJoin(broadcast(tot))
      .withColumn("__rate", least(lit(1.0),
        lit(targetFraction) * col("__tot") * (col("__w") / col("__wsum")) / col("__n")))
      .withColumn("__thr", round(col("__rate"), 4) * 10000)
      .select(col(stratumCol), col("__thr"))
    df.join(broadcast(rates), stratumCol)
      .where(hashBucket(col(keyCol), 10000) < col("__thr"))
      .drop("__thr")
  }

  /** Token-weighted temperature mixture: the [[temperatureSample]]
    * schedule with strata sized by TOKEN sums instead of row counts —
    * pretraining mixtures budget tokens, and a stratum of few huge
    * documents should not be overweighted the way a row-count schedule
    * would. p_s ∝ √T_s; keep rate = min(1, f·T_tot·(w_s/Σw)/T_s);
    * same deterministic md5 buckets and α = 0.5 exactness argument. */
  def temperatureSampleByTokens(df: DataFrame, keyCol: String,
                                stratumCol: String, tokenCol: String,
                                targetFraction: Double): DataFrame =
    temperatureSampleBySize(df, keyCol, stratumCol, targetFraction,
      sum(col(tokenCol).cast("long")))

  /** Stratified deterministic sample: per-stratum percentage keep. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       pctByStratum: Map[String, Int],
                       defaultPct: Int = 0): DataFrame = {
    val pctCol = pctByStratum.foldLeft(lit(defaultPct)) {
      case (acc, (s, p)) => when(col(stratumCol) === s, p).otherwise(acc)
    }
    df.where(hashBucket(col(keyCol), 100) < pctCol)
  }

  /** Epoch-based mixture replication — the LLaMA/GPT-style data
    * schedule ("2.4 epochs of source A, 0.5 of B"): each row appears
    * floor(e) times, plus one extra copy for a deterministic
    * hash-selected (e − floor(e)) fraction of keys. e < 1 downsamples,
    * e > 1 upsamples; strata absent from `epochs` get `defaultEpochs`.
    * Emits a 0-based `rep` copy index.
    *
    * Pure map + explode with per-stratum literal thresholds — ZERO
    * shuffles at any scale, and exactly reproducible in any engine
    * (integer thresholds are precomputed driver-side, so both engines
    * compare the same integers; no float boundary in the plan). */
  def epochMixture(df: DataFrame, idCol: String, stratumCol: String,
                   epochs: Map[String, Double], defaultEpochs: Double = 1.0,
                   buckets: Int = 10000): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(_ >= 0),
      "epochs must be >= 0")
    def lits(f: Double => Int) =
      epochs.foldLeft(lit(f(defaultEpochs))) { case (acc, (s, e)) =>
        when(col(stratumCol) === s, lit(f(e))).otherwise(acc) }
    val nreps = lits(e => math.ceil(e).toInt)
    val fullreps = lits(e => math.floor(e).toInt)
    val thr = lits(e => math.round((e - math.floor(e)) * buckets).toInt)
    df.where(nreps > 0)
      .withColumn("rep",
        explode(sequence(lit(0L), nreps.cast("long") - 1)))
      .where(col("rep") < fullreps.cast("long") ||
        hashBucket(col(idCol), buckets) < thr)
  }

  /** DSIR-style importance weighting for data selection (Xie et al.,
    * arXiv:2302.03169, reduced to its hashed-n-gram core): featurize
    * each document as hashed bigram buckets, fit add-one-smoothed
    * bucket distributions for the TARGET slice (rows where `target` is
    * true — the high-quality / in-domain exemplar set) and the RAW
    * corpus, and score each document by its summed per-feature
    * log-likelihood ratio `Σ log p_target(b) / p_raw(b)`. High scores
    * mark documents that look like the target domain; feeding them to
    * [[tokenBudgetSelect]] or a rate-based sampler is importance
    * resampling.
    *
    * 100 TB story: the feature census is word-count shaped over at most
    * `buckets` keys; the fitted log-ratio table (≤ `buckets` rows) is
    * BROADCAST back against the feature stream, so the corpus shuffles
    * only for the per-doc aggregate, keyed on doc id. Totals stay
    * in-plan as a 1-row broadcast — no driver action. Bucket hashing is
    * md5-derived (first 48 bits mod `buckets`), so any engine
    * reproduces the exact weights.
    *
    * Determinism: per-bucket log-ratios are quantized to 1e-4
    * fixed-point LONGs before the per-doc sum, so `dsir_logweight` is
    * bit-identical across engines and partitionings (integer sums are
    * order-independent; the coarse grid absorbs libm ln ulps). */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
                  target: Column, buckets: Int = 4096): DataFrame =
    dsirWeightsFromTokens(
      FanOut(df.select(col(idCol).as("id"), col(textCol).as("__text"),
          target.cast("boolean").as("__t")))
        .select(col("id"), col("__t"),
          graft.functions.TextFunctions.tokens(col("__text")).as("ws")),
      buckets)

  /** [[dsirWeights]] over a pre-built frame `(id, __t, ws)` — join the
    * target flag onto [[TextStats.tokenized]] (a doc-level broadcast
    * join, BEFORE the feature explode) to reuse one corpus tokenize
    * pass across the token family. */
  def dsirWeightsFromTokens(toks: DataFrame, buckets: Int = 4096): DataFrame = {
    require(buckets >= 2, "need buckets >= 2")
    graft.plans.WordNgrams.register(toks.sparkSession)
    val feats = toks
      .where(size(col("ws")) >= 2)
      .select(col("id"), col("__t"), explode(
        call_function(graft.plans.WordNgrams.fnName,
          col("ws"), lit(2), lit(1))).as("g"))
      .select(col("id"), col("__t"),
        (conv(substring(md5(col("g")), 1, 12), 16, 10).cast("long")
          % buckets).as("b"))
    // One explode pass: per-(doc, bucket) occurrence counts feed BOTH
    // the census (train) and the per-doc scoring (apply) — persisted so
    // the apply pass reads this compact frame instead of re-exploding
    // the corpus. Returned plan references the cache: lifecycle is the
    // caller's, plan-identity caching dedups repeated calls (same
    // convention as unigramLogProb's census).
    val docFeats = feats
      .groupBy(col("id"), col("__t"), col("b"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val census = docFeats.groupBy(col("b"))
      .agg(sum(when(col("__t"), col("n")).otherwise(0L)).as("ct"),
        sum(col("n")).as("cr"))
    val tot = census.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    // per-bucket log-ratio quantized to a 1e-4 fixed-point LONG: the
    // per-doc sum is then integer-exact, so the rounded weight is
    // bit-identical across engines/partitionings (a double sum rounds
    // differently near 4-dp boundaries depending on summation order).
    // 1e-4 grid because ln differs by an ulp across libm
    // implementations — see [[TextStats.unigramLogProbFromTokens]].
    val lw = census.crossJoin(broadcast(tot))
      .select(col("b"),
        round((log((col("ct") + lit(1.0)) / (col("nt") + lit(buckets.toLong))) -
          log((col("cr") + lit(1.0)) / (col("nr") + lit(buckets.toLong))))
          * 1e4).cast("long").as("wq"))
    docFeats.join(broadcast(lw), "b")
      .groupBy(col("id"))
      .agg(sum(col("n")).as("n_feats"),
        round(sum(col("n") * col("wq")) / 1e4, 4).as("__w"))
      // `=== 0` normalizes IEEE −0.0 — see [[Embeddings.meanPool]]
      .withColumn("dsir_logweight",
        when(col("__w") === 0.0, lit(0.0)).otherwise(col("__w")))
      .drop("__w")
  }

  /** Quality-ordered selection under a global token budget: order
    * documents by (`priorityCol` desc, id) and keep the maximal prefix
    * whose running token sum stays ≤ `budget` — "spend the compute on
    * the best data first", the data-selection step after scoring.
    * Appends `cum_tokens`, the inclusive running sum in selection
    * order.
    *
    * The global order is a range-partitioned parallel sort and the
    * running sum is the two-phase [[Packing.runningStart]] prefix sum,
    * so no stage ever sees a single-partition window; token counts are
    * integers, making the result bit-identical to a sequential pass in
    * any engine. */
  def tokenBudgetSelect(df: DataFrame, idCol: String, tokenCol: String,
                        priorityCol: String, budget: Long,
                        parts: Int = 32): DataFrame = {
    require(budget > 0, "budget must be positive")
    val keyed = df
      .withColumn("__t", col(tokenCol).cast("long"))
      .repartitionByRange(parts, col(priorityCol).desc, col(idCol))
      .sortWithinPartitions(col(priorityCol).desc, col(idCol))
      .withColumn("__pid", spark_partition_id())
    Packing.runningStart(keyed)
      .withColumn("cum_tokens", col("__start") + col("__t"))
      .where(col("cum_tokens") <= budget)
      .drop("__t", "__pid", "__offset", "__start")
  }

  /** Weighted Bernoulli subsample — the RESAMPLING half of importance
    * weighting (DSIR-style scores, quality scores): doc i is kept with
    * probability p_i ∝ w_i, scaled so the expected kept fraction is
    * `fracNum/fracDen` (docs with p_i ≥ 1 are always kept). The
    * per-doc coin is md5-derived like every sampler here, so the same
    * doc gets the same verdict in any engine, any run.
    *
    * The acceptance test is EXACT INTEGER arithmetic end to end:
    * weights quantize to the 1e-4 grid (w4 = round(w·1e4), negatives
    * clamp to 0), the coin is the first 48 md5 bits (u48), and
    *   keep ⟺ u48 · Σw4 · fracDen < w4_i · N · fracNum · 2^48
    * evaluated in decimal(38,0) — no float appears anywhere, so the
    * kept set is bit-reproducible and scale-invariant in the weights
    * (w → c·w changes both sides identically). Σw4 is summed AS
    * decimal(38,0) (per-row values fit long; the total need not —
    * a long sum would wrap negative and keep everything silently).
    * Headroom: at N = 10¹¹ docs both sides stay < 10³¹ ≪ 10³⁸.
    *
    * One pass for (Σw4, N) as a 1-row broadcast, one pure-map pass for
    * the verdicts — no shuffle of the corpus. Emits every row with its
    * `kept` flag (filter on it to materialize the sample; keeping the
    * flags makes the decision auditable, like `qualityCascade`). */
  def weightedBernoulliSample(df: DataFrame, idCol: String, weightCol: String,
                              fracNum: Int, fracDen: Int): DataFrame = {
    require(fracNum >= 0 && fracDen > 0, "target fraction must be >= 0")
    val dec = "decimal(38,0)"
    val base = df.select(col(idCol),
      greatest(round(col(weightCol) * 1e4).cast("long"), lit(0L)).as("w4"),
      conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
        .cast("long").as("u48"))
    val tot = base.agg(sum(col("w4").cast(dec)).as("sw4"), count(lit(1)).as("n"))
    base.crossJoin(broadcast(tot))
      .withColumn("kept",
        col("u48").cast(dec) * col("sw4") * lit(fracDen).cast(dec) <
          col("w4").cast(dec) * col("n").cast(dec) * lit(fracNum).cast(dec) *
            lit(281474976710656L).cast(dec))   // 2^48
      .select(col(idCol), col("w4"), col("kept"))
  }

  /** Weighted k-sampling WITHOUT replacement (Efraimidis–Spirakis
    * A-ES, "Weighted random sampling with a reservoir", IPL 2006):
    * keep the k items with the largest u_i^(1/w_i), equivalently the
    * SMALLEST (−ln u_i)/w_i — each item's inclusion probability is
    * weight-proportional and no item repeats, the exact-size
    * complement of [[weightedBernoulliSample]]'s per-item coin.
    *
    * Determinism/cross-engine: u_i is the 48-bit md5 integer of the id
    * (the engine's standard coin) and the sort key is
    * `round(1e10 · ln(2^48 / (u48+1)) / w4)` — one ln snapped to an
    * integer grid (the BM25 idiom), ties broken by id, so any engine
    * replaying the formula ranks identically. Zero-weight items are
    * excluded (never sampleable, per A-ES).
    *
    * Scale: a pure map to (id, key) then a global TakeOrdered k — no
    * shuffle of the corpus, no single-partition window; the k-row
    * result gets its rank from a window over k rows. */
  /** The A-ES ranking projection shared by [[weightedTopKSample]] and
    * the streaming reservoir ([[graft.streaming.Pipelines
    * .weightedSampleAgainstStore]]): (original columns +, w4, key10)
    * with zero-weight rows dropped. ONE definition so the batch and
    * streaming samplers can never rank by different formulas. */
  def aresKeys(df: DataFrame, idCol: String, weightCol: String): DataFrame =
    df.withColumn("w4",
        greatest(round(col(weightCol) * 1e4).cast("long"), lit(0L)))
      .withColumn("u48",
        conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
          .cast("long"))
      .where(col("w4") > 0)
      .withColumn("key10",
        round(lit(1e10) * log(lit(281474976710656.0) / (col("u48") + lit(1)))
          / col("w4")).cast("long"))
      .drop("u48")

  def weightedTopKSample(df: DataFrame, idCol: String, weightCol: String,
                         k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val base = aresKeys(df.select(col(idCol), col(weightCol)), idCol, weightCol)
    base.orderBy(col("key10"), col(idCol)).limit(k)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("key10"), col(idCol))))
      .select(col(idCol), col("w4"), col("key10"), col("rn"))
  }

  /** Per-group [[weightedTopKSample]]: an independent A-ES k-sample
    * per `groupCol` value (per-source eval slices, per-language probe
    * sets) in ONE pass — a keyed window over the group, no global
    * TakeOrdered and no per-group jobs. Same item-intrinsic keys as
    * the global and streaming samplers ([[aresKeys]]), so a group's
    * sample is identical whether drawn here, globally over the group
    * alone, or incrementally by the streaming reservoir. */
  def weightedTopKSamplePerGroup(df: DataFrame, idCol: String,
                                 weightCol: String, groupCol: String,
                                 k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val base = aresKeys(df.select(col(groupCol), col(idCol), col(weightCol)),
      idCol, weightCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("key10"), col(idCol))
    base.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col(groupCol), col(idCol), col("w4"), col("key10"), col("rn"))
  }

  /** Exact mixture waterfilling: given per-source available tokens and
    * integer target weights, allocate a token `budget` proportionally
    * to the targets SUBJECT to availability — sources that cannot fill
    * their proportional share saturate (allocate everything they
    * have), and their surplus redistributes across the rest at the
    * same proportions. This is the planning step of every
    * target-mixture training run ("books 30%, web 50%, code 20%" meets
    * reality); [[temperatureSample]]/[[weightedBernoulliSample]]
    * execute the resulting per-source rates.
    *
    * The classic waterfilling fixpoint: find λ with
    * Σ min(tokens_s, λ·tgt_s) = budget. Sources sorted by
    * tokens/target saturate as a PREFIX, so the unique feasible prefix
    * is found by scanning S candidates. All feasibility tests and
    * allocations are exact integer arithmetic (BigInt — no float λ);
    * the sort key is the IEEE double tokens/tgt (ties by source), the
    * same key an engine replaying in SQL computes. Driver-side on
    * purpose: the input is one row per SOURCE (model-state-sized, like
    * IVF centroids), never row-level data.
    *
    * Unsaturated allocations floor to whole tokens, so
    * Σ allocated ≤ budget with slack < #unsaturated — the report
    * carries exact numbers, the caller decides where the slack goes.
    * Requires every target weight ≥ 1 and tokens ≥ 0. */
  def mixtureWaterfill(perSource: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    val spark = perSource.sparkSession
    import spark.implicits._
    val rows = perSource
      .select(col("src").cast("string"), col("tokens").cast("long"),
        col("tgt").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    require(rows.forall(_._3 >= 1), "every target weight must be >= 1")
    require(rows.forall(_._2 >= 0), "token counts must be >= 0")
    val sorted = rows.sortBy { case (s, tok, tgt) =>
      (tok.toDouble / tgt, s) }
    val n = sorted.length
    val cumTok = sorted.scanLeft(BigInt(0))(_ + _._2)   // cumTok(k) = Σ first k
    val cumTgt = sorted.scanLeft(BigInt(0))(_ + _._3)
    val totTgt = cumTgt(n)
    val b = BigInt(budget)
    // first k in 0..n where prefix P = sorted.take(k) is the saturated set
    val kStar = (0 to n).find { k =>
      val lastOk = k == 0 || {
        val (_, tok, tgt) = sorted(k - 1)
        BigInt(tok) * (totTgt - cumTgt(k)) <= (b - cumTok(k)) * tgt
      }
      val firstOut = k == n || {
        val (_, tok, tgt) = sorted(k)
        BigInt(tok) * (totTgt - cumTgt(k)) > (b - cumTok(k)) * tgt
      }
      lastOk && firstOut
    }.getOrElse(n)
    val remB = b - cumTok(kStar)
    val remT = totTgt - cumTgt(kStar)
    val out = sorted.zipWithIndex.map { case ((s, tok, tgt), i) =>
      val saturated = i < kStar
      val alloc =
        if (saturated) BigInt(tok)
        else if (remT == 0) BigInt(0)
        else remB * tgt / remT                      // BigInt floor division
      val rate4 = if (tok == 0) 0L
        else (alloc * 10000 / BigInt(tok)).toLong
      (s, tok, tgt, alloc.toLong, saturated, rate4)
    }
    out.toSeq.toDF("source", "tokens", "tgt", "allocated", "saturated", "rate4")
  }

  /** Histogram-equalized range bucketing WITHOUT a global sort: assign
    * each row a bucket 0..`buckets`-1 that is monotone in `scoreCol`
    * and (up to tie mass) balanced — the boundary-derivation step of a
    * range-partitioned export (sort 100 TB of docs by quality into B
    * balanced shards) done exactly, not by sampling.
    *
    * How: scores live on the 1e-4 integer grid, so the corpus reduces
    * to per-grid-cell counts (ONE map-side-combined aggregate; the cell
    * frame is GRID-bounded — ≤ ~20k rows for scores in [-1, 1] — never
    * corpus-bounded). A cumulative window over the cell frame (small by
    * construction, the one place a partition-less window is safe)
    * yields each cell's preceding-population count, and
    * bucket(cell) = floor(cum_before · B / n). All rows of one cell
    * land in one bucket (a tie never straddles a boundary — the
    * determinism a re-export needs), so buckets are balanced up to the
    * largest tie class. The cell→bucket map joins back broadcast-sized.
    *
    * Contrast with `repartitionByRange`/`ntile`: those sample or
    * globally sort and break ties arbitrarily across partitions —
    * non-reproducible shard membership; this is exact, deterministic,
    * and one aggregate + one broadcast join at any scale. */
  def rangeBuckets(df: DataFrame, idCol: String, scoreCol: String,
                   buckets: Int): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val s4 = round(col(scoreCol) * 1e4).cast("long").as("s4")
    val rows = df.select(col(idCol), s4)
    val cells = rows.groupBy("s4").agg(count(lit(1)).as("n_cell"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("s4"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val mapped = cells
      .withColumn("cum_before", coalesce(sum(col("n_cell")).over(w), lit(0L)))
      .crossJoin(broadcast(rows.agg(count(lit(1)).as("n_total"))))
      .withColumn("bucket",
        floor(col("cum_before") * buckets / col("n_total")).cast("int"))
      .select("s4", "bucket")
    rows.join(broadcast(mapped), "s4").select(col(idCol), col("s4"), col("bucket"))
  }

  /** Neyman-optimal stratified sample allocation: split a row `budget`
    * across strata proportionally to N_h·σ_h (the allocation that
    * minimizes the estimator variance — survey-sampling's standard
    * answer to "how many rows from each source"). The weight is EXACT:
    * N_h·σ_h = √(n·Σv² − (Σv)²) on the 1e-4 value grid (128-bit sums),
    * snapped to an integer; the split is Hamilton largest-remainder
    * apportionment on those integers — floor quotas from the
    * exact-multiple division trick, leftovers to the largest
    * remainders (ties → stratum name) — so Σalloc = budget exactly and
    * both engines agree seat by seat. Zero-variance strata weigh 0.
    * Returns (stratum, n_rows, w, alloc). */
  def neymanAllocation(df: DataFrame, stratumCol: String, valueCol: String,
                       budget: Long): DataFrame = {
    require(budget >= 0, "budget must be nonnegative")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val s = df.where(col(valueCol).isNotNull)
      .select(col(stratumCol).as("stratum"),
        round(col(valueCol) * 1e4).cast("long").as("v4"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n"), sum(col("v4")).as("sv"),
        // square in 128-bit: a 1e9-grid value squares past int64
        sum(col("v4").cast(dec) * col("v4")).as("svv"))
      .withColumn("w", round(sqrt((col("n") * col("svv")
        - col("sv").cast(dec) * col("sv")).cast("double"))).cast("long"))
    val tot = s.agg(sum(col("w")).as("wt"))
    val a = lit(budget) * col("w")
    val base = when(col("wt") > 0L,
      ((a - pmod(a, col("wt"))) / col("wt")).cast("long")).otherwise(lit(0L))
    val based = s.crossJoin(broadcast(tot))
      .withColumn("base", base)
      .withColumn("rem", when(col("wt") > 0L, pmod(a, col("wt")))
        .otherwise(lit(0L)))
    val leftover = based.agg((lit(budget) - sum(col("base"))).as("lo"))
    val wr = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("stratum"))
    based.crossJoin(broadcast(leftover))
      .withColumn("rn", row_number().over(wr))
      .select(col("stratum"), col("n").as("n_rows"), col("w"),
        (col("base") + when(col("rn") <= col("lo"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** Greedy maximum-coverage selection (the classic (1−1/e)-approximate
    * set cover greedy): pick k documents that together cover the most
    * DISTINCT elements (shingles, vocabulary, topics) — the
    * diversity-first data-selection rule ("which 8 docs teach the
    * most"), also the dedup-aware seed-picking move. Each round takes
    * the doc with the largest MARGINAL gain (elements not covered by
    * earlier picks; ties → smallest id), then removes its elements
    * from play — a doc overlapping earlier picks is re-scored on what
    * it ADDS, which a one-shot top-k-by-size gets wrong.
    *
    * The greedy chain is inherently sequential in k; each round is one
    * distributed census + one element-keyed anti-join over the
    * REMAINING incidence (shrinking every round), with a single-ROW
    * collect for the argmax — k·O(|incidence|) work, driver state k
    * rows. `idCol` must be numeric (castable to long). A fixed-k
    * chained-CTE ladder replays it exactly.
    * Returns one row per pick: (step, id, gain, covered_total). */
  def greedyMaxCoverage(elems: DataFrame, idCol: String, elemCol: String,
                        k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = elems.sparkSession
    import spark.implicits._
    // LAZY checkpoints throughout the chain: each round's census
    // collect materializes the round's `remaining` and the argmax in
    // ONE job, and the anti-join then reuses the cached blocks — half
    // the jobs of eager mode (the hits() renorm trick; measured there
    // and re-measured here: q286 census+checkpoint jobs fuse 2 → 1
    // per round).
    var remaining = elems
      .select(col(idCol).cast("long").as("id"), col(elemCol).as("s"))
      .distinct().localCheckpoint(false)
    var cum = 0L
    var step = 1
    var exhausted = false
    val picks = Seq.newBuilder[(Long, Long, Long, Long)]
    while (step <= k && !exhausted) {
      val top = remaining.groupBy(col("id")).agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("id")).limit(1)
        .collect()  // exactly one row — bounded driver state
      if (top.isEmpty) exhausted = true
      else {
        val id = top(0).getLong(0)
        val gain = top(0).getLong(1)
        cum += gain
        picks += ((step.toLong, id, gain, cum))
        val cov = remaining.where(col("id") === id).select(col("s"))
        remaining = remaining.join(cov, Seq("s"), "left_anti")
          .localCheckpoint(false)
        step += 1
      }
    }
    picks.result().toDF("step", "id", "gain", "covered_total")
  }
}
