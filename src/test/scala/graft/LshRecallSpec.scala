package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Recall of the approximate similarity paths against brute-force ground
  * truth on the driver's real embeddings (sf0.001, 500 × 64-dim). */
class LshRecallSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val K = 10

  private lazy val emb = Tables.embeddings(spark, dir).cache()
  private lazy val queries = emb.filter(col("vec_id") < 20)

  private def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("query_id"), col("corpus_id")).as[(Long, Long)].collect().toSet

  test("multi-probe LSH recall ≥ single-bucket recall; both are subsets of candidates scored exactly") {
    val truth = resultSet(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", K, 64))
    val single = resultSet(Similarity.signLshTopK(emb, queries, "vec_id", "embedding", K, 64, bits = 6))
    val multi = resultSet(Similarity.signLshTopKMultiProbe(emb, queries, "vec_id", "embedding", K, 64, bits = 6))

    val rSingle = (single & truth).size.toDouble / truth.size
    val rMulti = (multi & truth).size.toDouble / truth.size
    info(f"recall@$K single-bucket=$rSingle%.3f multi-probe=$rMulti%.3f")
    // These synthetic embeddings are near-uniform (no cluster structure),
    // the hardest case for sign-LSH — the check is the relative gain and
    // a sanity floor, not production recall (clustered real-world
    // embeddings bucket far better; see SCALE.md trade-offs).
    assert(rMulti >= rSingle)
    assert(rMulti >= 3 * rSingle || rSingle > 0.5,
      s"multi-probe should materially beat single-bucket: $rMulti vs $rSingle")
    assert(rMulti > 0.1, s"multi-probe recall unexpectedly low: $rMulti")
  }

  test("IVF (learned centroids) recall beats fixed sign-planes at similar probe volume") {
    val truth = resultSet(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", K, 64))
    // nprobe/nlist = 1/4 of the corpus per query vs multi-probe's ~7/64
    val ivf = resultSet(Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      K, 64, nlist = 16, nprobe = 4))
    val rIvf = (ivf & truth).size.toDouble / truth.size
    info(f"recall@$K ivf(nlist=16,nprobe=4)=$rIvf%.3f")
    assert(rIvf > 0.3, s"IVF recall unexpectedly low: $rIvf")
  }

  test("IVF is deterministic across runs") {
    def run() = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        K, 64, nlist = 8, nprobe = 2, iters = 3)
      .orderBy("query_id", "rn").collect().toSeq
    assert(run() === run())
  }

  test("filtered probe: label predicate holds, pre-filter fills k where post-filter starves") {
    val cents = Similarity.ivfTrain(emb, "vec_id", "embedding", nlist = 8, iters = 3)
    val labeled = Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
      .join(emb.select(col("vec_id").as("corpus_id"), col("label")), "corpus_id")
      .cache()
    val got = Similarity.ivfProbeFiltered(labeled, cents, queries,
      "vec_id", "embedding", attrCol = "label", targetCol = "label",
      k = K, nprobe = 2)
    // every hit shares the query's label
    val qLabels = emb.select(col("vec_id").as("query_id"), col("label")
      .as("qlabel"))
    val mismatches = got
      .join(emb.select(col("vec_id").as("corpus_id"), col("label")), "corpus_id")
      .join(qLabels, "query_id")
      .where(col("label") =!= col("qlabel")).count()
    assert(mismatches === 0L)
    // pre-filter vs post-filter: filtering the UNFILTERED top-K down to
    // the query's label must yield ≤ as many hits per query (and here,
    // with ~1/labelCount selectivity, strictly fewer for some query) —
    // the starvation the pre-filter exists to avoid
    val unf = Similarity.ivfProbe(labeled, cents, queries,
      "vec_id", "embedding", k = K, nprobe = 2)
    val post = unf
      .join(emb.select(col("vec_id").as("corpus_id"), col("label")), "corpus_id")
      .join(qLabels, "query_id")
      .where(col("label") === col("qlabel"))
      .groupBy("query_id").count()
    val pre = got.groupBy("query_id").count()
    val cmp = pre.withColumnRenamed("count", "npre")
      .join(post.withColumnRenamed("count", "npost"), Seq("query_id"), "left")
      .select(col("npre"), coalesce(col("npost"), lit(0L)).as("npost"))
      .as[(Long, Long)].collect()
    assert(cmp.forall { case (p, q) => p >= q })
    assert(cmp.exists { case (p, q) => p > q },
      "expected at least one query where post-filtering starves top-k")
    labeled.unpersist()
  }

  test("IVF split API (train/assign/probe) equals the monolithic ivfTopK and reuses one index across query batches") {
    val mono = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        K, 64, nlist = 8, nprobe = 2, iters = 3)
      .orderBy("query_id", "rn").collect().toSeq
    val cents = Similarity.ivfTrain(emb, "vec_id", "embedding", nlist = 8, iters = 3)
    val index = Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
      .cache()  // the persisted-index stand-in
    val split = Similarity.ivfProbe(index, cents, queries, "vec_id", "embedding",
        K, nprobe = 2)
      .orderBy("query_id", "rn").collect().toSeq
    assert(split === mono)
    // second batch against the SAME index — no retrain, no reassign
    val batch2 = Similarity.ivfProbe(index, cents,
        emb.filter(col("vec_id") >= 20 && col("vec_id") < 30),
        "vec_id", "embedding", K, nprobe = 2)
      .groupBy("query_id").count().collect()
    assert(batch2.length === 10 && batch2.forall(_.getLong(1) === K))
    index.unpersist()
  }

  test("group-aware widening: fixed nprobe starves real (query, group) quotas; widened probes fill every reachable one; non-starved rows bit-identical") {
    val perGroupK = 3
    val cents = Similarity.ivfTrain(emb, "vec_id", "embedding",
      nlist = 16, iters = 3)
    val labeled = Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
      .join(emb.select(col("vec_id").as("corpus_id"), col("label")),
        "corpus_id").cache()
    def rows(df: org.apache.spark.sql.DataFrame)
        : Seq[(Long, Int, Long, Double, Int)] =
      df.select(col("query_id"), col("label"), col("corpus_id"),
        col("cosine"), col("rn")).as[(Long, Int, Long, Double, Int)]
        .collect().toSeq
    val fixed = rows(Similarity.ivfProbeGrouped(labeled, cents, queries,
      "vec_id", "embedding", "label", perGroupK, nprobe = 1))
    val widened = rows(Similarity.ivfProbeGroupedWidened(labeled, cents,
      queries, "vec_id", "embedding", "label", perGroupK, nprobe = 1))
    val sizes = emb.groupBy(col("label")).count()
      .as[(Int, Long)].collect().toMap
    val qLabel = queries.select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    // every (query, group)'s reachable quota: group size minus the
    // query's own vector when it belongs to the group
    def reachable(q: Long, g: Int): Long =
      math.min(perGroupK.toLong, sizes(g) - (if (qLabel(q) == g) 1 else 0))
    val expect = (for (q <- qLabel.keys; g <- sizes.keys) yield
      (q, g) -> reachable(q, g)).toMap
    def byPair(rs: Seq[(Long, Int, Long, Double, Int)])
        : Map[(Long, Int), Long] =
      rs.groupBy(r => (r._1, r._2)).map { case (p, v) => p -> v.size.toLong }
    val fc = byPair(fixed); val wc = byPair(widened)
    // 1. starvation is real on the real embeddings at nprobe=1
    val starved = expect.filter { case (p, e) => fc.getOrElse(p, 0L) < e }
    assert(starved.nonEmpty,
      "expected fixed-nprobe starvation on real embeddings at nprobe=1")
    info(s"starved (query, group) pairs at nprobe=1: ${starved.size}")
    // 2. widening fills EVERY reachable quota
    val unfilled = expect.filter { case (p, e) => wc.getOrElse(p, 0L) < e }
    assert(unfilled.isEmpty,
      s"widened probe left quotas unfilled: ${unfilled.take(5)}")
    // 3. (query, group) pairs already full under fixed nprobe return
    //    bit-identical rows — widening never touches non-starved groups
    val fullPairs = expect.keySet.filter(p => fc.getOrElse(p, 0L) == expect(p))
    assert(fullPairs.nonEmpty)
    val fixedFull = fixed.filter(r => fullPairs((r._1, r._2))).toSet
    val widenedFull = widened.filter(r => fullPairs((r._1, r._2))).toSet
    assert(fixedFull === widenedFull)
    // filtered sibling: same law, quota = the query's own-label top-k
    val k = 3
    val ffix = Similarity.ivfProbeFiltered(labeled, cents, queries,
        "vec_id", "embedding", "label", "label", k, nprobe = 1)
      .groupBy("query_id").count().as[(Long, Long)].collect().toMap
    val fwide = Similarity.ivfProbeFilteredWidened(labeled, cents, queries,
        "vec_id", "embedding", "label", "label", k, nprobe = 1)
      .groupBy("query_id").count().as[(Long, Long)].collect().toMap
    val fexpect = qLabel.map { case (q, g) =>
      q -> math.min(k.toLong, sizes(g) - 1) }
    assert(fexpect.exists { case (q, e) => ffix.getOrElse(q, 0L) < e },
      "expected filtered starvation at nprobe=1")
    assert(fexpect.forall { case (q, e) => fwide.getOrElse(q, 0L) == e },
      "filtered widening must fill every reachable top-k")
    labeled.unpersist()
  }

  test("silhouetteReport: hand-computed s on fixed centroids; rival-straddling vector goes negative") {
    import org.apache.spark.sql.functions.col
    // 1-d vectors, two fixed centroids at 0 and 10
    val cents = Array(0 -> Array(0.0), 1 -> Array(10.0))
    val vecs = Seq(
      (1L, Seq(0.0f)),   // a=0, b=10  → s = 1          → 1000000
      (2L, Seq(2.0f)),   // a=2, b=8   → 1 − 2/8 = .75  → 750000
      (3L, Seq(4.5f)),   // a=4.5, b=5.5 → 1 − 4.5/5.5  → 181818
      (4L, Seq(10.0f)),  // a=0, b=10  → 1
      (5L, Seq(7.0f))    // a=3, b=7   → 1 − 3/7 ≈ .5714 → 571429
    ).toDF("vec_id", "embedding")
    val out = Similarity.silhouetteReport(vecs, "vec_id", "embedding", cents)
      .orderBy(col("cid"))
      .as[(Int, Long, Long, Long)].collect()
    // cluster 0 mean = round((1000000 + 750000 + 181818)/3) = 643939;
    // cluster 1 mean = round((1000000 + 571429)/2) = 785715 (half-up)
    assert(out.toSeq === Seq(
      (0, 3L, 643939L, 0L), (1, 2L, 785715L, 0L)))
    // a vector assigned by a STALE cid would be negative — here argmin
    // assignment makes s ≥ 0 always; the negative face is the b2=0 guard
    val degenerate = Similarity.silhouetteReport(
      Seq((9L, Seq(5.0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", Array(0 -> Array(5.0), 1 -> Array(5.0)))
      .as[(Int, Long, Long, Long)].collect()
    assert(degenerate.toSeq === Seq((0, 1L, 0L, 0L)))
  }
}
