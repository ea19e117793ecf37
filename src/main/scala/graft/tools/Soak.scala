package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Dedup, Multimodal, TextStats}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale soak: times the heaviest operator families at 1× and 10× the
  * sf0.1 corpus (the 10× frame is the same documents unioned with
  * disjoint remapped ids — no new fixture data, just more of it) and
  * prints the scaling factor per operator. A keyed-shuffle operator
  * should scale ~linearly in rows (factor ≈ 10 ± constant overhead);
  * anything super-linear here is an all-pairs cliff the plan audit
  * missed. This is the empirical check behind SCALE.md's "would this
  * hold at 1000×" claims — run it after touching any dedup/similarity
  * candidate-generation path.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *          sbt "runMain graft.tools.Soak"
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SOAK_COPIES", "10").toInt
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-soak")
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).cache()
    val n1 = docs1.count()
    // copy offset derived from the fixture's actual max id: a fixed
    // 10M stride would silently collide (deflating the scaled row
    // count) if a fixture ever carried larger doc_ids
    val stride = docs1.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val docsN = (0 until copies).map { i =>
      docs1.select((col("doc_id") + lit(i.toLong * stride)).as("doc_id"),
        col("text"))
    }.reduce(_ unionAll _).cache()
    val nN = docsN.count()
    println(s"[soak] corpus 1x=$n1 rows, ${copies}x=$nN rows")

    def time[A](what: String)(f: => A): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[soak] $what%-28s ${s}%7.2f s")
      s
    }

    // each op is forced with a cheap count; candidate-generation cost
    // dominates every one of these
    def ops(docs: DataFrame): Seq[(String, () => Long)] = {
      lazy val toks = TextStats.tokenized(docs, "doc_id", "text")
      Seq(
        "chunk_dedup" -> (() => Dedup.chunkDedupFromTokens(toks, 5).count()),
        "minhash_lsh_dedup" -> (() =>
          Dedup.minhashDedup(docs, "doc_id", "text").count()),
        "simhash_neardups" -> (() =>
          Dedup.simhashNearDups(docs, "doc_id", "text", 3).count()),
        "boilerplate_strip" -> (() =>
          Dedup.boilerplateStripFromTokens(toks, 5, 3).count()),
        "image_dhash" -> (() => {
          import spark.implicits._
          val blobs = docs.select(col("doc_id")).as[Long]
            .mapPartitions(_.map { id =>
              val seed = id % 50
              (id, Multimodal.encodePng(
                (9 + seed % 23).toInt, (8 + (seed * 7) % 24).toInt, seed))
            }).toDF("doc_id", "blob")
          Multimodal.decodeImageHashPartitions(blobs, "blob", "doc_id").count()
        }))
    }

    val results = ops(docs1).zip(ops(docsN)).map {
      case ((name, f1), (_, fN)) =>
        val t1 = time(s"$name 1x")(f1())
        val tN = time(s"$name ${copies}x")(fN())
        (name, t1, tN, tN / t1)
    }
    println("[soak] --- scaling factors (rows x" + copies + ") ---")
    var bad = List.empty[String]
    results.foreach { case (name, t1, tN, r) =>
      println(f"[soak] $name%-28s ${r}%5.1fx (${t1}%.2f s -> ${tN}%.2f s)")
      // 3x headroom over row growth before we call it super-linear:
      // the duplicated corpus makes every chunk/shingle a heavy hitter,
      // the worst case for candidate generation
      if (r > copies * 3.0) bad ::= name
    }
    if (bad.nonEmpty) {
      System.err.println(s"[soak] FAIL super-linear: ${bad.mkString(", ")}")
      spark.stop(); sys.exit(1)
    }

    // --- leg: persistent dedup store — per-batch cost vs store size ---
    // the store grows 10×; the micro-batch stays fixed. With the
    // bucketed layout the batch reads only its own fingerprint buckets
    // and broadcasts itself into the slice, so per-batch time must stay
    // ~flat (NOT grow 10× with the history).
    {
      import graft.streaming.Pipelines
      val buckets = 1024
      def mkStore(nRows: Int): String = {
        val dir = java.nio.file.Files.createTempDirectory("soak_store").toString
        val seed = spark.range(nRows.toLong)
          .select(col("id").as("doc_id"),
            concat(lit("seed corpus document number "), col("id"),
              lit(" with its own unique body")).as("text"))
        Pipelines.dedupAgainstStore("text", dir, buckets) { _ => () }(seed, 0L)
        dir
      }
      val batch = spark.range(64).select(
        (col("id") + 5_000_000L).as("doc_id"),
        concat(lit("probe batch doc "), col("id")).as("text")).cache()
      batch.count()
      def runBatch(store: String): Long =
        Pipelines.dedupFresh(batch, "text", store, buckets).count()
      val small = mkStore(20_000); val big = mkStore(200_000)
      runBatch(small) // warm (codegen, parquet footers)
      val tS = time("store_batch vs 20k store")(runBatch(small))
      val tB = time("store_batch vs 200k store")(runBatch(big))
      val r = tB / tS
      println(f"[soak] store_dedup_batch        ${r}%5.1fx per-batch cost for 10x store growth")
      if (r > 3.0) {
        System.err.println("[soak] FAIL store-size-linear per-batch dedup")
        spark.stop(); sys.exit(1)
      }
    }

    // --- leg: CDC chunk store — per-batch cost vs store size ---
    // same contract as the fingerprint store: the batch derives its
    // chunk buckets driver-side and partition-prunes the read, so a
    // 10× deeper ingestion history must not show up in per-batch time.
    {
      import graft.streaming.Pipelines
      val buckets = 1024
      def mkStore(nRows: Int): String = {
        val dir = java.nio.file.Files.createTempDirectory("soak_cdc").toString
        val seed = spark.range(nRows.toLong)
          .select(col("id").as("doc_id"),
            concat(lit("seed corpus document number "), col("id"),
              lit(" body text that spans a few content defined chunk"),
              lit(" boundaries at the default mask")).as("text"))
        Pipelines.cdcDedupAgainstStore("doc_id", "text", dir,
          buckets = buckets) { _ => () }(seed, 0L)
        dir
      }
      val batch = spark.range(16).select(
        (col("id") + 5_000_000L).as("doc_id"),
        concat(lit("probe batch document "), col("id"),
          lit(" with novel wording throughout")).as("text")).cache()
      batch.count()
      def runBatch(store: String): Long = {
        val chunks = Pipelines.cdcHashed(batch, "doc_id", "text", 8, 64, buckets)
        val known = Pipelines.cdcKnown(spark, chunks, store)
        Pipelines.cdcFresh(batch, chunks, known, "doc_id", 0.5).count()
      }
      val small = mkStore(20_000); val big = mkStore(200_000)
      runBatch(small) // warm
      val tS = time("cdc_batch vs 20k store")(runBatch(small))
      val tB = time("cdc_batch vs 200k store")(runBatch(big))
      val r = tB / tS
      println(f"[soak] cdc_store_batch          ${r}%5.1fx per-batch cost for 10x store growth")
      if (r > 3.0) {
        System.err.println("[soak] FAIL store-size-linear per-batch CDC dedup")
        spark.stop(); sys.exit(1)
      }
    }

    // --- leg: SCD2 change store — per-batch cost vs dimension size ---
    // a fixed 64-key update batch against a 20k- then 200k-key change
    // store: the current-state read is pruned to the batch's key
    // buckets, so per-batch time must stay ~flat as the dimension
    // grows 10×. The timed run is an exact REPLAY of the update batch
    // (absorbed — appends nothing), which isolates the read path that
    // must not scale with history.
    {
      import graft.streaming.Pipelines
      val buckets = 1024
      def mkStore(nRows: Int): String = {
        val dir = java.nio.file.Files.createTempDirectory("soak_scd2").toString
        val seed = spark.range(nRows.toLong).select(col("id").as("k"),
          to_timestamp(lit("2020-01-01")).as("snap_ts"),
          concat(lit("seg"), (col("id") % 7).cast("string")).as("seg"))
        Pipelines.scd2IngestStream("k", "snap_ts", Seq("seg"), dir,
          buckets)()(seed, 0L)
        dir
      }
      val batch = spark.range(64).select(col("id").as("k"),
        to_timestamp(lit("2020-02-01")).as("snap_ts"),
        lit("segX").as("seg")).cache()
      batch.count()
      def runBatch(dir: String): Unit =
        Pipelines.scd2IngestStream("k", "snap_ts", Seq("seg"), dir,
          buckets)()(batch, 1L)
      val small = mkStore(20_000); val big = mkStore(200_000)
      runBatch(small); runBatch(big) // apply the update once each (warm)
      val tS = time("scd2_batch vs 20k dims")(runBatch(small))
      val tB = time("scd2_batch vs 200k dims")(runBatch(big))
      val r = tB / tS
      println(f"[soak] scd2_store_batch         ${r}%5.1fx per-batch cost for 10x dimension growth")
      if (r > 3.0) {
        System.err.println("[soak] FAIL dimension-size-linear SCD2 batch")
        spark.stop(); sys.exit(1)
      }
    }

    // --- leg: PIT enrichment — per-batch enrich cost vs dim HISTORY ---
    // a fixed 64-key fact batch enriched against a 20k-key change store
    // holding 1 vs 10 generations of changes (history 10×, key count
    // FIXED — isolating exactly the axis the enrich-side read must not
    // pay for): the read prunes to the batch's key buckets and
    // semi-joins the fact keys, so per-batch enrich time must stay
    // ~flat as the dimension's history grows. min-of-2 per store to
    // keep the tight gate off scheduler jitter.
    {
      import graft.streaming.Pipelines
      val buckets = 1024
      def mkStore(gens: Int): String = {
        val dir = java.nio.file.Files.createTempDirectory("soak_pit").toString
        val enr = Pipelines.PitEnricher(dir, Seq("seg"), buckets)
        (0 until gens).foreach { g =>
          val snap = spark.range(20_000L).select(col("id").as("k"),
            to_timestamp(lit(f"2020-${g + 1}%02d-01")).as("snap_ts"),
            concat(lit("seg"), ((col("id") + g) % 7).cast("string"))
              .as("seg"))
          enr.ingestDim(snap, g.toLong)
        }
        dir
      }
      val facts = spark.range(64L).select(col("id").as("ck"),
        to_timestamp(lit("2020-12-15")).as("ts"), lit(1.0).as("amt"))
        .cache()
      facts.count()
      def runEnrich(dir: String): Long =
        Pipelines.PitEnricher(dir, Seq("seg"), buckets)
          .enrich(facts, "ck", "ts").count()
      val small = mkStore(1); val big = mkStore(10)
      runEnrich(small); runEnrich(big) // warm
      val tS = math.min(time("pit_enrich vs 1x history")(runEnrich(small)),
        time("pit_enrich vs 1x history")(runEnrich(small)))
      val tB = math.min(time("pit_enrich vs 10x history")(runEnrich(big)),
        time("pit_enrich vs 10x history")(runEnrich(big)))
      val r = tB / tS
      println(f"[soak] pit_enrich_batch         ${r}%5.1fx per-batch enrich cost for 10x dim-history growth")
      if (r > 1.5) {
        System.err.println("[soak] FAIL history-linear PIT enrichment")
        spark.stop(); sys.exit(1)
      }
    }

    // --- leg: hierarchy store — per-batch cost vs tree size ---
    // a fixed 64-event churn batch (32 value restatements + 32
    // reparents) against a 20k- vs 200k-node forest: reads prune to
    // the touched buckets and deltas walk ancestor chains only, so
    // per-batch time must track the batch, not the corpus. Chains in
    // the synthetic prefix forest are ≤7 deep at 200k nodes.
    {
      import graft.streaming.Pipelines
      val buckets = 1024
      def mkStore(nRows: Int): String = {
        val dir = java.nio.file.Files.createTempDirectory("soak_hier").toString
        val nodes = spark.range(nRows.toLong).select(col("id"),
          when(col("id") === 0L, lit(null).cast("long"))
            .otherwise(expr("id div 10")).as("parent"),
          (col("id") % 97).cast("long").as("value"))
        Pipelines.hierarchyIngestStream(dir, buckets)()(nodes, 0L)
        dir
      }
      val restate = spark.range(32L).select((col("id") * 7L + 3L).as("id"),
        expr("(id * 7 + 3) div 10").as("parent"),
        lit(500L).as("value"))
      val repar = spark.range(32L).select((col("id") * 11L + 350L).as("id"),
        expr("(id * 11 + 350) div 100").as("parent"),
        ((col("id") * 11L + 350L) % 97).cast("long").as("value"))
      val batch = restate.unionByName(repar).cache(); batch.count()
      def runBatch(dir: String, bid: Long): Unit =
        Pipelines.hierarchyIngestStream(dir, buckets)()(batch, bid)
      val small = mkStore(20_000); val big = mkStore(200_000)
      runBatch(small, 1L); runBatch(big, 1L) // apply once (warm)
      // the timed run is an exact REPLAY (absorbed: zero deltas) —
      // isolating the read/walk path that must not scale with corpus
      val tS = time("hier_batch vs 20k nodes")(runBatch(small, 1L))
      val tB = time("hier_batch vs 200k nodes")(runBatch(big, 1L))
      val r = tB / tS
      println(f"[soak] hier_store_batch         ${r}%5.1fx per-batch cost for 10x tree growth")
      if (r > 3.0) {
        System.err.println("[soak] FAIL corpus-size-linear hierarchy batch")
        spark.stop(); sys.exit(1)
      }
    }

    // --- leg: streaming weighted reservoir — per-batch cost vs history ---
    // the reservoir's state is ≤ k rows per stratum FOREVER, so a batch
    // against a reservoir that has absorbed 100× more history must cost
    // the same as against a young one (unlike the dedup stores, whose
    // state IS the history and needs bucketing to stay flat).
    {
      import graft.streaming.Pipelines
      val k = 64
      def mkReservoir(nRows: Int): String = {
        val dir = java.nio.file.Files.createTempDirectory("soak_res").toString
        val seed = spark.range(nRows.toLong).select(
          col("id").as("item_id"),
          (col("id") % 97 + 1).cast("double").as("w"),
          concat(lit("s"), (col("id") % 8).cast("string")).as("src"))
        Pipelines.weightedSampleAgainstStore("item_id", "w", "src",
          dir, k) { _ => () }(seed, 0L)
        dir
      }
      val batch = spark.range(256).select(
        (col("id") + 9_000_000L).as("item_id"),
        lit(2.5).as("w"),
        concat(lit("s"), (col("id") % 8).cast("string")).as("src")).cache()
      batch.count()
      def runBatch(dir: String): Unit =
        Pipelines.weightedSampleAgainstStore("item_id", "w", "src",
          dir, k) { _ => () }(batch, 1L)
      val young = mkReservoir(10_000); val old = mkReservoir(1_000_000)
      runBatch(mkReservoir(10_000)) // warm
      val tY = time("reservoir_batch vs 10k history")(runBatch(young))
      val tO = time("reservoir_batch vs 1M history")(runBatch(old))
      val r = tO / tY
      println(f"[soak] reservoir_batch           ${r}%5.1fx per-batch cost for 100x history")
      if (r > 3.0) {
        System.err.println("[soak] FAIL history-dependent reservoir batch")
        spark.stop(); sys.exit(1)
      }
    }

    // --- leg: mega-class exact-dup group emission stays linear ---
    // one identical-signature class of 10k then 100k members: the
    // group-emission report must scale ~linearly in rows (the PAIR
    // form would be 5·10⁷ → 5·10⁹ rows — quadratic in class size).
    {
      def sigs(classSize: Int) = spark.range(classSize.toLong + 5000L)
        .select(col("id"), when(col("id") < classSize,
            lit("1010101010101010101010101010101010101010101010101010101010101010"))
          .otherwise(concat(lit("0"),
            lpad(conv(col("id").cast("string"), 10, 2), 63, "0"))).as("simhash64"))
      def run(classSize: Int): Double = time(s"dup_groups class=$classSize") {
        graft.operators.Dedup.hammingDupGroups(sigs(classSize)).count()
      }
      run(10_000) // warm
      val t1 = run(10_000); val t10 = run(100_000)
      val r = t10 / t1
      println(f"[soak] mega_class_groups        ${r}%5.1fx for 10x class size")
      if (r > 30.0) {   // 10x rows × 3x headroom, same gate as above
        System.err.println("[soak] FAIL super-linear mega-class grouping")
        spark.stop(); sys.exit(1)
      }
    }

    // --- leg: streaming cluster store — per-batch cost vs history ---
    // a fixed 64-pair batch against a 20k- then 200k-member cluster
    // store: the member read partition-prunes to the batch's id
    // buckets and the CC runs on batch-sized supernode edges, so
    // per-batch time must stay ~flat as the clustered history grows
    // 10× (the q303 operator's scale contract). driverCcMaxEdges = 0
    // forces the DISTRIBUTED edge-rewiring CC — the 100 TB path is
    // the one this leg must prove flat; the driver union-find below
    // the cutoff is the small-batch latency optimization, not the
    // scale contract.
    {
      import graft.streaming.Pipelines
      def mkStore(nPairs: Int): String = {
        val dir = java.nio.file.Files.createTempDirectory("soak_clst").toString
        val seed = spark.range(nPairs.toLong)
          .select((col("id") * 2).as("id_a"), (col("id") * 2 + 1).as("id_b"))
        Pipelines.clusterIngestStream(dir, driverCcMaxEdges = 0)()(seed, 0L)
        dir
      }
      val batch = spark.range(64)
        .select((col("id") * 2 + 9_000_000L).as("id_a"),
          (col("id") * 2 + 9_000_001L).as("id_b")).cache()
      batch.count()
      def runBatch(dir: String): Unit =
        Pipelines.clusterIngestStream(dir, driverCcMaxEdges = 0)()(batch, 1L)
      val small = mkStore(10_000); val big = mkStore(100_000)
      runBatch(mkStore(10_000)) // warm
      val tS = time("cluster_batch vs 20k members")(runBatch(small))
      val tB = time("cluster_batch vs 200k members")(runBatch(big))
      val r = tB / tS
      println(f"[soak] cluster_store_batch       ${r}%5.1fx per-batch cost for 10x member growth")
      if (r > 3.0) {
        System.err.println("[soak] FAIL member-history-linear cluster batch")
        spark.stop(); sys.exit(1)
      }
    }

    // --- leg: graph iteration family at 10× edges ---
    // the one operator family with ROUND structure: wall must track
    // edge count (~linear, 3× headroom), and round counts must stay
    // shape-bound, not size-bound. CC runs on a pure CHAIN — the
    // adversarial diameter shape where label propagation needed
    // diameter-many rounds; the edge-rewiring loop must converge
    // within a FIXED 16-round cap at both sizes (the require inside
    // dupClusters IS the round gate — a size-dependent round count
    // fails loud here, not at 100×). BFS/k-core/HITS run on a
    // ring-with-chords (bounded degree, diameter ≫ hop cap) so their
    // round counts are cap/fixed-iteration-bound by construction.
    {
      import graft.operators.{Dedup, GraphOps}
      def chain(n: Long): DataFrame =
        spark.range(n).select(col("id").as("id_a"),
          (col("id") + 1L).as("id_b"))
      def ring(n: Long): DataFrame =
        spark.range(n).select(col("id").as("id_a"),
          ((col("id") + 1L) % n).as("id_b"))
          .unionAll(spark.range(n).select(col("id").as("id_a"),
            ((col("id") + 7L) % n).as("id_b")))
      def gate(name: String, t1: Double, tN: Double): Unit = {
        val r = tN / t1
        println(f"[soak] $name%-28s ${r}%5.1fx for 10x edges")
        if (r > 30.0) {
          System.err.println(s"[soak] FAIL super-linear graph op: $name")
          spark.stop(); sys.exit(1)
        }
      }
      def ccRun(n: Long): Double = time(s"cc_chain n=$n") {
        val docs = spark.range(n + 1).select(col("id").as("doc_id"))
        val wrong = Dedup.dupClusters(docs, "doc_id", chain(n), maxIters = 16)
          .where(col("cluster_rep") =!= 0L).count()
        require(wrong == 0L, s"cc_chain merged wrong: $wrong")
      }
      ccRun(2000) // warm
      gate("cc_chain", ccRun(2000), ccRun(20000))
      def bfsRun(n: Long): Double = time(s"bfs_ring n=$n") {
        GraphOps.bfsHops(ring(n),
          spark.range(1).select(col("id")), maxHops = 8).count()
      }
      bfsRun(30_000) // warm
      gate("bfs_ring", bfsRun(30_000), bfsRun(300_000))
      def hitsRun(n: Long): Double = time(s"hits_ring n=$n") {
        GraphOps.hits(ring(n).select(col("id_a").as("src"),
          col("id_b").as("dst")), iters = 3).count()
      }
      hitsRun(30_000) // warm
      gate("hits_ring", hitsRun(30_000), hitsRun(300_000))
      def kcoreRun(n: Long): Double = time(s"kcore_ring n=$n") {
        // ring+chords is 4-regular → the 3-core is everything and the
        // 5-core empty; peel at k=5 so rounds exercise full peeling
        GraphOps.kCore(ring(n), k = 5).count()
      }
      kcoreRun(30_000) // warm
      gate("kcore_ring", kcoreRun(30_000), kcoreRun(300_000))
      // hub-heavy link prediction: an n-leaf star riding a small ring —
      // without the maxDegree cap the hub alone generates O(n²) wedges
      // (the boilerplate-hub cliff); with the cap the hub drops from
      // the center role and wall must track the degree census, not n²
      def cncRun(n: Long): Double = time(s"cnc_hub n=$n") {
        val star = spark.range(n).select(lit(0L).as("id_a"),
          (col("id") + 1L).as("id_b"))
        GraphOps.commonNeighborCandidates(star.unionAll(ring(1000)),
          minCommon = 2L, maxDegree = Some(1000L)).count()
      }
      cncRun(30_000) // warm
      gate("cnc_hub", cncRun(30_000), cncRun(300_000))
    }

    println("[soak] OK: no super-linear operator")
    spark.stop()
  }
}
