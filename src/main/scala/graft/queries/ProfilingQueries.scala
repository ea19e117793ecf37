package graft.queries

import graft.Tables
import graft.operators.Profiling
import org.apache.spark.sql.functions._

/** Data-quality queries over [[graft.operators.Profiling]] — the
  * Deequ-shaped profile/constraint family. */
object ProfilingQueries {

  /** Generic per-column table profile of `lineitem` (see
    * [[graft.operators.Profiling.profile]]): row/null/distinct counts,
    * grid min/max for numerics, verbatim min/max for strings — ONE
    * scan for all columns. The oracle recomputes each column profile
    * independently and unions. */
  val q179 = GQuery("q179_table_profile",
    {
      val nums = Seq("l_orderkey", "l_quantity", "l_extendedprice",
        "l_discount")
      val strs = Seq("l_returnflag", "l_linestatus")
      val numSel = nums.map { c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(round(min(CAST($c AS DOUBLE)) * 1e4) AS BIGINT) AS min4,
           |  CAST(round(max(CAST($c AS DOUBLE)) * 1e4) AS BIGINT) AS max4,
           |  CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s
           |FROM lineitem""".stripMargin
      }
      val strSel = strs.map { c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(NULL AS BIGINT) AS min4, CAST(NULL AS BIGINT) AS max4,
           |  min($c) AS min_s, max($c) AS max_s
           |FROM lineitem""".stripMargin
      }
      (numSel ++ strSel).mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    }) { (s, dir) =>
    Profiling.profile(Tables.lineitem(s, dir),
        numericCols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
          "l_discount"),
        stringCols = Seq("l_returnflag", "l_linestatus"))
      .orderBy(col("column"))
  }

  /** Constraint audit across the TPC-H snapshot (see
    * [[graft.operators.Profiling]]): key uniqueness, referential
    * integrity (with a deliberately-broken variant proving the check
    * CAN fire — orders whose custkey is shifted out of range), and a
    * value-range rule — one (check, n_violations) row each, the
    * fitness report an ingest gates on. */
  val q180 = GQuery("q180_constraint_audit",
    """SELECT 'orders_pk_unique' AS check_name, CAST(coalesce(sum(n - 1), 0) AS BIGINT)
      |  AS n_violations FROM (
      |  SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
      |UNION ALL
      |SELECT 'orders_custkey_fk', CAST(count(*) AS BIGINT) FROM orders o
      |  ANTI JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE o.o_custkey IS NOT NULL
      |UNION ALL
      |SELECT 'orders_custkey_shifted_fk', CAST(count(*) AS BIGINT) FROM (
      |  SELECT o_custkey * 1000 + 7 AS fk FROM orders) o
      |  ANTI JOIN customer c ON o.fk = c.c_custkey
      |UNION ALL
      |SELECT 'lineitem_orderkey_fk', CAST(count(*) AS BIGINT) FROM lineitem l
      |  ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE l.l_orderkey IS NOT NULL
      |UNION ALL
      |SELECT 'discount_range', CAST(sum(CASE WHEN l_discount IS NOT NULL
      |    AND (l_discount < 0 OR l_discount > 0.1) THEN 1 ELSE 0 END)
      |  AS BIGINT) FROM lineitem
      |ORDER BY check_name""".stripMargin) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    val customer = Tables.customer(s, dir)
    val lineitem = Tables.lineitem(s, dir)
    def tag(name: String, df: org.apache.spark.sql.DataFrame,
            vCol: String) =
      df.select(lit(name).as("check_name"), col(vCol).as("n_violations"))
    tag("orders_pk_unique",
        Profiling.uniqueViolations(orders, Seq("o_orderkey")),
        "n_surplus_rows")
      .unionAll(tag("orders_custkey_fk",
        Profiling.orphanCount(orders, "o_custkey", customer, "c_custkey"),
        "n_orphans"))
      .unionAll(tag("orders_custkey_shifted_fk",
        Profiling.orphanCount(
          orders.select((col("o_custkey") * 1000 + 7).as("fk")),
          "fk", customer, "c_custkey"),
        "n_orphans"))
      .unionAll(tag("lineitem_orderkey_fk",
        Profiling.orphanCount(lineitem, "l_orderkey", orders, "o_orderkey"),
        "n_orphans"))
      .unionAll(tag("discount_range",
        Profiling.rangeViolations(lineitem, "l_discount", 0.0, 0.1),
        "n_violations"))
      .orderBy(col("check_name"))
  }

  /** Z-order layout audit (see [[graft.operators.Layout]]): Morton
    * keys over (l_partkey, l_suppkey), bucketed by the top 6 z-bits —
    * per bucket, the exact span of BOTH dimensions (the min/max
    * file-skipping statistic a z-ordered export yields). The oracle
    * replays the identical unrolled interleave terms
    * ([[graft.operators.Layout.zorder2Sql]]). */
  val q182 = GQuery("q182_zorder_spans",
    s"""WITH z AS (
       |  SELECT ${graft.operators.Layout.zorder2Sql(
               "l_partkey", "l_suppkey")} AS zk,
       |    l_partkey % 65536 AS xv, l_suppkey % 65536 AS yv
       |  FROM lineitem)
       |SELECT zk >> 26 AS zb, count(*) AS n,
       |  min(xv) AS x_min, max(xv) AS x_max,
       |  min(yv) AS y_min, max(yv) AS y_max
       |FROM z GROUP BY zb ORDER BY zb""".stripMargin) { (s, dir) =>
    graft.operators.Layout.zorderSpans(Tables.lineitem(s, dir),
        "l_partkey", "l_suppkey", bits = 16, kBits = 3)
      .orderBy(col("zb"))
  }

  /** Join-key skew census (see
    * [[graft.operators.Profiling.skewCensus]]): the 10 heaviest
    * event-stream users with exact shares and the salt factor that
    * caps a straggler at 50 rows — the pre-shuffle advisor for the
    * [[graft.operators.SkewJoin]] machinery. */
  val q183 = GQuery("q183_skew_census",
    """WITH f AS (
      |  SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n
      |  FROM events GROUP BY user_id),
      |t AS (SELECT count(*) AS t FROM events)
      |SELECT key, n,
      |  CAST(round(1e4 * n / t) AS BIGINT) AS share4,
      |  CAST(floor((n + 49) / 50) AS BIGINT) AS salt_factor
      |FROM f, t
      |ORDER BY n DESC, key LIMIT 10""".stripMargin) { (s, dir) =>
    graft.operators.Profiling.skewCensus(Tables.events(s, dir),
      "user_id", k = 10, targetPerTask = 50L)
  }

  /** Capstone snapshot-fitness gate: ONE verdict table deciding
    * whether the snapshot is fit to ingest — constraint checks
    * (uniqueness / FK / range: pass iff 0 violations), null rules on
    * load-bearing columns, and per-source quality-KS drift
    * ([[graft.operators.TextStats.groupScoreDrift]], pass iff
    * ks4 ≤ 2000) — the q179/q180/q161 machinery composed under one
    * oracle; the report an orchestrator gates a 100 TB ingest on. */
  val q184 = GQuery("q184_snapshot_fitness",
    s"""WITH ${TextQueries.qualityCte},
       |srcm AS (SELECT doc_id, source FROM documents),
       |rws AS (
       |  SELECT srcm.source AS grp,
       |    CAST(round(q.quality * 1e4) AS BIGINT) AS s4
       |  FROM q JOIN srcm USING (doc_id)),
       |gc AS (SELECT grp, s4, count(*) AS n_g FROM rws GROUP BY 1, 2),
       |ac AS (SELECT s4, count(*) AS n_all FROM rws GROUP BY 1),
       |spine AS (
       |  SELECT g.grp, a.s4
       |  FROM (SELECT DISTINCT grp FROM gc) g CROSS JOIN ac a),
       |cells AS (
       |  SELECT sp.grp, sp.s4, coalesce(gc.n_g, 0) AS n_g, ac.n_all
       |  FROM spine sp
       |  LEFT JOIN gc ON gc.grp = sp.grp AND gc.s4 = sp.s4
       |  JOIN ac ON ac.s4 = sp.s4),
       |tg AS (SELECT grp, count(*) AS t_g FROM rws GROUP BY grp),
       |ta AS (SELECT count(*) AS t_all FROM rws),
       |cdf AS (
       |  SELECT grp, s4,
       |    sum(n_g) OVER (PARTITION BY grp ORDER BY s4
       |      ROWS UNBOUNDED PRECEDING) AS c_g,
       |    sum(n_all) OVER (PARTITION BY grp ORDER BY s4
       |      ROWS UNBOUNDED PRECEDING) AS c_all
       |  FROM cells),
       |ks AS (
       |  SELECT cdf.grp AS source,
       |    max(abs(CAST(round(1e4 * c_g / t_g) AS BIGINT)
       |          - CAST(round(1e4 * c_all / t_all) AS BIGINT))) AS ks4
       |  FROM cdf JOIN tg USING (grp) CROSS JOIN ta GROUP BY 1),
       |checks AS (
       |  SELECT 'drift_' || source AS check_name, ks4 AS metric,
       |    CASE WHEN ks4 <= 2000 THEN 'pass' ELSE 'fail' END AS verdict
       |  FROM ks
       |  UNION ALL
       |  SELECT 'orders_pk_unique', coalesce(sum(n - 1), 0),
       |    CASE WHEN coalesce(sum(n - 1), 0) = 0 THEN 'pass' ELSE 'fail' END
       |  FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey
       |        HAVING count(*) > 1)
       |  UNION ALL
       |  SELECT 'lineitem_orderkey_fk', count(*),
       |    CASE WHEN count(*) = 0 THEN 'pass' ELSE 'fail' END
       |  FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  WHERE l.l_orderkey IS NOT NULL
       |  UNION ALL
       |  SELECT 'discount_range',
       |    sum(CASE WHEN l_discount IS NOT NULL
       |        AND (l_discount < 0 OR l_discount > 0.1) THEN 1 ELSE 0 END),
       |    CASE WHEN sum(CASE WHEN l_discount IS NOT NULL
       |        AND (l_discount < 0 OR l_discount > 0.1) THEN 1 ELSE 0 END) = 0
       |      THEN 'pass' ELSE 'fail' END
       |  FROM lineitem
       |  UNION ALL
       |  SELECT 'null_doc_text', sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END),
       |    CASE WHEN sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) = 0
       |      THEN 'pass' ELSE 'fail' END
       |  FROM documents)
       |SELECT check_name, CAST(metric AS BIGINT) AS metric, verdict
       |FROM checks ORDER BY check_name""".stripMargin) { (s, dir) =>
    import graft.functions.TextFunctions
    val docs = Tables.documents(s, dir)
    val lineitem = Tables.lineitem(s, dir)
    val orders = Tables.orders(s, dir)
    def zeroRule(name: String, df: org.apache.spark.sql.DataFrame,
                 vCol: String) =
      df.select(lit(name).as("check_name"), col(vCol).as("metric"))
    val scored = docs.select(col("source"),
      TextFunctions.qualityScore(col("text"), col("n_chars")).as("quality"))
    val drift = graft.operators.TextStats
      .groupScoreDrift(scored, "source", "quality")
      .select(concat(lit("drift_"), col("grp")).as("check_name"),
        col("ks4").as("metric"))
    val zeros = zeroRule("orders_pk_unique",
        Profiling.uniqueViolations(orders, Seq("o_orderkey")),
        "n_surplus_rows")
      .unionAll(zeroRule("lineitem_orderkey_fk",
        Profiling.orphanCount(lineitem, "l_orderkey", orders, "o_orderkey"),
        "n_orphans"))
      .unionAll(zeroRule("discount_range",
        Profiling.rangeViolations(lineitem, "l_discount", 0.0, 0.1),
        "n_violations"))
      .unionAll(zeroRule("null_doc_text",
        docs.agg(sum(col("text").isNull.cast("long")).as("n")), "n"))
    drift
      .select(col("check_name"), col("metric"),
        when(col("metric") <= 2000L, "pass").otherwise("fail").as("verdict"))
      .unionAll(zeros.select(col("check_name"), col("metric"),
        when(col("metric") === 0L, "pass").otherwise("fail").as("verdict")))
      .orderBy(col("check_name"))
  }

  /** Per-source quality-vs-length regression (see
    * [[graft.operators.Profiling.groupLinFit]]): does a source's
    * quality score scale with document length, and how tightly —
    * closed-form OLS from exact integer sufficient statistics, no
    * MLlib. The oracle assembles the same five sums and the same
    * double ratios. */
  val q194 = GQuery("q194_source_quality_fit",
    s"""WITH ${TextQueries.qualityCte},
       |rws AS (
       |  SELECT d.source AS grp, CAST(q.n_tokens AS BIGINT) AS x,
       |    CAST(round(q.quality * 1e4) AS BIGINT) AS y
       |  FROM q JOIN documents d USING (doc_id)),
       |s AS (
       |  SELECT grp, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
       |    sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
       |  FROM rws GROUP BY grp)
       |SELECT grp AS source, CAST(n AS BIGINT) AS n,
       |  CAST(round(1e6 * CAST(n * sxy - sx * sy AS DOUBLE)
       |    / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT) AS slope6,
       |  CAST(round((CAST(sy AS DOUBLE)
       |      - (CAST(n * sxy - sx * sy AS DOUBLE)
       |         / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
       |    / CAST(n AS DOUBLE)) AS BIGINT) AS intercept,
       |  CAST(CASE WHEN n * syy - sy * sy > 0 THEN
       |    round(1e4 * CAST(n * sxy - sx * sy AS DOUBLE)
       |      * CAST(n * sxy - sx * sy AS DOUBLE)
       |      / (CAST(n * sxx - sx * sx AS DOUBLE)
       |         * CAST(n * syy - sy * sy AS DOUBLE)))
       |    ELSE 10000 END AS BIGINT) AS r2_4
       |FROM s WHERE n * sxx - sx * sx > 0
       |ORDER BY source""".stripMargin) { (s, dir) =>
    import graft.functions.TextFunctions
    val rows = Tables.documents(s, dir).select(col("source"),
      TextFunctions.tokenCount(col("text")).as("x"),
      round(TextFunctions.qualityScore(col("text"), col("n_chars")) * 1e4)
        .cast("long").as("y"))
    Profiling.groupLinFit(rows, "source", "x", "y")
      .select(col("grp").as("source"), col("n"), col("slope6"),
        col("intercept"), col("r2_4"))
      .orderBy(col("source"))
  }

  /** A/B experiment readout: users deterministically assigned by the
    * md5 coin (the engine's standard deterministic-randomness idiom —
    * assignment is reproducible run-over-run and engine-over-engine),
    * then per-variant exact purchase statistics: users, events, value
    * sum (1e-2 grid), and the mean and variance assembled as double
    * ratios of exact integer sums (the OLS idiom) — everything a
    * significance test consumes, hash-matchable. */
  val q195 = GQuery("q195_ab_readout",
    """WITH a AS (
      |  SELECT user_id,
      |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
      |      AS BIGINT) % 2 AS variant
      |  FROM (SELECT DISTINCT user_id FROM events)),
      |m AS (
      |  SELECT a.variant, e.user_id,
      |    CAST(round(e.value * 100) AS BIGINT) AS v2
      |  FROM events e JOIN a USING (user_id)
      |  WHERE e.event_type = 'purchase')
      |SELECT variant, count(DISTINCT user_id) AS n_users,
      |  count(*) AS n_purchases,
      |  CAST(sum(v2) AS BIGINT) AS sum_v2,
      |  CAST(round(CAST(sum(v2) AS DOUBLE) / count(*)) AS BIGINT) AS mean_v2,
      |  CAST(round((count(*) * CAST(sum(v2 * v2) AS DOUBLE)
      |      - CAST(sum(v2) AS DOUBLE) * CAST(sum(v2) AS DOUBLE))
      |    / (CAST(count(*) AS DOUBLE) * count(*))) AS BIGINT) AS var_v2
      |FROM m GROUP BY variant ORDER BY variant""".stripMargin) { (s, dir) =>
    val assign = Tables.events(s, dir).select(col("user_id")).distinct()
      .withColumn("variant",
        pmod(conv(substring(md5(col("user_id").cast("string")), 1, 12),
          16, 10).cast("long"), lit(2L)))
    Tables.events(s, dir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), round(col("value") * 100).cast("long").as("v2"))
      .join(assign, "user_id")
      .groupBy("variant")
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_purchases"),
        sum(col("v2")).as("sum_v2"),
        round(sum(col("v2")).cast("double") / count(lit(1))).cast("long")
          .as("mean_v2"),
        round((count(lit(1)) * sum(col("v2") * col("v2")).cast("double")
          - sum(col("v2")).cast("double") * sum(col("v2")).cast("double"))
          / (count(lit(1)).cast("double") * count(lit(1)))).cast("long")
          .as("var_v2"))
      .orderBy(col("variant"))
  }

  /** Join-size law: the exact inner-equi-join cardinality computed
    * from the two key CENSUSES (Σ over shared keys of nA·nB) WITHOUT
    * executing the join — the advisory a planner wants before
    * shuffling 100 TB — then verified against the actual join count.
    * The two must be equal by construction; a mismatch would be an
    * engine bug, and the oracle checks both numbers independently. */
  val q196 = GQuery("q196_join_size_law",
    """WITH ca AS (SELECT o_orderkey AS k, count(*) AS na FROM orders
      |  GROUP BY 1),
      |cb AS (SELECT l_orderkey AS k, count(*) AS nb FROM lineitem
      |  GROUP BY 1),
      |prod AS (
      |  SELECT count(*) AS n_shared_keys,
      |    CAST(coalesce(sum(na * nb), 0) AS BIGINT) AS predicted_rows
      |  FROM ca JOIN cb USING (k)),
      |act AS (
      |  SELECT count(*) AS actual_rows
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
      |SELECT n_shared_keys, predicted_rows, CAST(actual_rows AS BIGINT)
      |  AS actual_rows
      |FROM prod, act""".stripMargin) { (s, dir) =>
    val ca = Tables.orders(s, dir)
      .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("na"))
    val cb = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("nb"))
    val prod = ca.join(cb, "k")
      .agg(count(lit(1)).as("n_shared_keys"),
        coalesce(sum(col("na") * col("nb")), lit(0L)).as("predicted_rows"))
    val act = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir),
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("actual_rows"))
    prod.crossJoin(act)
  }

  /** Per-source Gini concentration of character mass across documents
    * (see [[graft.operators.Profiling.giniByGroup]]) — the corpus
    * data-card inequality metric. The oracle replays the division-free
    * rank-sum cell arithmetic (HUGEINT products, `//` integer-exact
    * rank blocks). */
  val q208 = GQuery("q208_gini_concentration",
    """WITH cells AS (
      |  SELECT source AS grp, n_chars AS v, CAST(count(*) AS BIGINT) AS m
      |  FROM documents WHERE n_chars IS NOT NULL GROUP BY source, n_chars),
      |cum AS (
      |  SELECT grp, v, m,
      |    CAST(coalesce(sum(m) OVER (PARTITION BY grp ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS c
      |  FROM cells),
      |parts AS (
      |  SELECT grp,
      |    CAST(v AS HUGEINT) * (2 * m * c + m * (m + 1)) AS u,
      |    CAST(v AS HUGEINT) * m AS t, m
      |  FROM cum),
      |agg AS (
      |  SELECT grp, CAST(sum(m) AS BIGINT) AS n, sum(u) AS s2, sum(t) AS t
      |  FROM parts GROUP BY grp)
      |SELECT grp AS source, n AS n_rows, CAST(t AS BIGINT) AS total,
      |  CAST(round(1e4 * (CAST(s2 AS DOUBLE) - (n + 1) * CAST(t AS DOUBLE))
      |    / (n * CAST(t AS DOUBLE))) AS BIGINT) AS gini4
      |FROM agg ORDER BY source""".stripMargin) { (s, dir) =>
    Profiling.giniByGroup(Tables.documents(s, dir), "source", "n_chars")
      .withColumnRenamed("grp", "source")
      .orderBy(col("source"))
  }

  /** Event-type × hour-of-day association (see
    * [[graft.operators.Profiling.categoricalAssociation]]): mutual
    * information, chi-square, and Cramér's V in one row — "does event
    * mix depend on time of day". Hour via pure epoch arithmetic (the
    * q185 convention); the oracle replays the per-cell grid parts. */
  val q211 = GQuery("q211_categorical_association",
    """WITH base AS (
      |  SELECT event_type AS x,
      |    CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS y
      |  FROM events),
      |cells AS (
      |  SELECT x, y, CAST(count(*) AS BIGINT) AS n_xy
      |  FROM base GROUP BY x, y),
      |xm AS (SELECT x, CAST(sum(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY x),
      |ym AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY y),
      |tot AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n,
      |  CAST(count(DISTINCT x) AS BIGINT) AS r,
      |  CAST(count(DISTINCT y) AS BIGINT) AS c FROM cells),
      |parts AS (
      |  SELECT
      |    CAST(round(1e8 * (CAST(n_xy AS DOUBLE) / n)
      |      * ln(CAST(n_xy AS DOUBLE) * n
      |        / (CAST(n_x AS DOUBLE) * n_y))) AS BIGINT) AS mi_part8,
      |    CAST(round(1e4
      |      * pow(CAST(n_xy AS DOUBLE) - CAST(n_x AS DOUBLE) * n_y / n, 2)
      |      / (CAST(n_x AS DOUBLE) * n_y / n)) AS BIGINT) AS chi_part4
      |  FROM cells JOIN xm USING (x) JOIN ym USING (y), tot),
      |sums AS (SELECT CAST(sum(mi_part8) AS BIGINT) AS mi8,
      |  CAST(sum(chi_part4) AS BIGINT) AS chi2_4 FROM parts)
      |SELECT n, r, c, mi8, chi2_4,
      |  CASE WHEN least(r, c) <= 1 THEN 0
      |    ELSE CAST(round(1e4 * sqrt((CAST(chi2_4 AS DOUBLE) / 1e4)
      |      / (CAST(n AS DOUBLE) * (least(r, c) - 1)))) AS BIGINT)
      |  END AS cramers_v4
      |FROM tot, sums""".stripMargin) { (s, dir) =>
    Profiling.categoricalAssociation(
      Tables.events(s, dir).select(col("event_type").as("etype"),
        (floor(unix_timestamp(col("ts")) / 3600) % 24).cast("long").as("hr")),
      "etype", "hr")
  }

  /** Gini impurity of a (pos, neg) pair as portable SQL — division and
    * multiplication only, mirroring the operator's expression shape so
    * the 1e-4 grid rounds identically. */
  private def impSql(a: String, b: String): String =
    s"""CASE WHEN ($a) + ($b) = 0 THEN 0.0
       |  ELSE 1.0 - (CAST($a AS DOUBLE) * ($a) + CAST($b AS DOUBLE) * ($b))
       |    / (CAST(($a) + ($b) AS DOUBLE) * CAST(($a) + ($b) AS DOUBLE))
       |END""".stripMargin

  /** Exact CART decision stump (see
    * [[graft.operators.Profiling.decisionStump]]): the single best
    * order-date threshold separating finished orders — Gini-impurity
    * gain over the distinct-day cell spine, rational arithmetic only,
    * so the oracle replays every candidate bit-identically. */
  val q212 = GQuery("q212_decision_stump",
    s"""WITH base AS (
       |  SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS s,
       |    o_orderstatus = 'F' AS y
       |  FROM orders),
       |cells AS (
       |  SELECT s, CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p,
       |    CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS q
       |  FROM base GROUP BY s),
       |cum AS (
       |  SELECT s, p, q,
       |    CAST(coalesce(sum(p) OVER (ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS cp,
       |    CAST(coalesce(sum(q) OVER (ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS cq
       |  FROM cells),
       |tot AS (SELECT CAST(sum(p) AS BIGINT) AS n_pos,
       |               CAST(sum(q) AS BIGINT) AS n_neg FROM cells),
       |cand AS (
       |  SELECT s, cp + cq AS nl, (n_pos - cp) + (n_neg - cq) AS nr,
       |    n_pos, n_neg,
       |    CAST(round(1e4 * (${impSql("n_pos", "n_neg")}
       |      - (CAST(cp + cq AS DOUBLE) / CAST(n_pos + n_neg AS DOUBLE))
       |        * ${impSql("cp", "cq")}
       |      - (CAST((n_pos - cp) + (n_neg - cq) AS DOUBLE)
       |          / CAST(n_pos + n_neg AS DOUBLE))
       |        * ${impSql("n_pos - cp", "n_neg - cq")})) AS BIGINT) AS gain4
       |  FROM cum, tot)
       |SELECT n_pos + n_neg AS n, n_pos, s AS best_thr, gain4 AS best_gain4,
       |  nl AS n_left, nr AS n_right
       |FROM cand ORDER BY gain4 DESC, s DESC LIMIT 1""".stripMargin) {
    (s, dir) =>
    Profiling.decisionStump(
      Tables.orders(s, dir).select(
        floor(unix_timestamp(col("o_orderdate")) / 86400).cast("long")
          .as("day"),
        (col("o_orderstatus") === "F").as("lbl")),
      "day", "lbl")
  }

  /** Welch's t between every pair of event types' value distributions
    * (see [[graft.operators.Profiling.welchT]]) — the pairwise
    * significance matrix. The oracle replays the exact grid sums and
    * the fixed double-expression shape for t and the Welch df. */
  val q215 = GQuery("q215_welch_t",
    """WITH s AS (
      |  SELECT event_type AS grp, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(round(1e4 * value) AS BIGINT)) AS BIGINT) AS sv,
      |    sum(CAST(round(1e4 * value) AS BIGINT)
      |      * CAST(round(1e4 * value) AS BIGINT)) AS svv
      |  FROM events WHERE value IS NOT NULL
      |  GROUP BY event_type HAVING count(*) >= 2),
      |p AS (
      |  SELECT a.grp AS g1, b.grp AS g2, a.n AS n1, b.n AS n2,
      |    a.sv AS sv1, b.sv AS sv2, a.svv AS svv1, b.svv AS svv2,
      |    (CAST(a.n AS DOUBLE) * a.svv - CAST(a.sv AS DOUBLE) * a.sv)
      |      / (CAST(a.n AS DOUBLE) * (a.n - 1) * a.n) AS se1,
      |    (CAST(b.n AS DOUBLE) * b.svv - CAST(b.sv AS DOUBLE) * b.sv)
      |      / (CAST(b.n AS DOUBLE) * (b.n - 1) * b.n) AS se2
      |  FROM s a JOIN s b ON a.grp < b.grp)
      |SELECT g1, g2, n1, n2,
      |  CAST(round(CAST(sv1 AS DOUBLE) / n1) AS BIGINT) AS mean1_4,
      |  CAST(round(CAST(sv2 AS DOUBLE) / n2) AS BIGINT) AS mean2_4,
      |  CAST(round(1e4 * ((CAST(sv1 AS DOUBLE) / n1 - CAST(sv2 AS DOUBLE) / n2)
      |    / sqrt(se1 + se2))) AS BIGINT) AS t4,
      |  CAST(round(1e4 * (((se1 + se2) * (se1 + se2))
      |    / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)))) AS BIGINT)
      |    AS df_w4
      |FROM p WHERE se1 + se2 > 0
      |ORDER BY g1, g2""".stripMargin) { (s, dir) =>
    Profiling.welchT(Tables.events(s, dir), "event_type", "value")
      .orderBy(col("g1"), col("g2"))
  }

  /** Population stability index between the q134 corpus snapshots'
    * length distributions (see [[graft.operators.Profiling.psi]]):
    * v1/v2 carved by the same moduli as the diff family, 100-char
    * bins, add-half smoothing on the union spine. The oracle replays
    * the binning and every 1e-8-grid part. */
  val q217 = GQuery("q217_psi_drift",
    """WITH c1 AS (
      |  SELECT CAST(floor(n_chars / 100) AS BIGINT) AS bin,
      |    CAST(count(*) AS BIGINT) AS n1
      |  FROM documents WHERE doc_id % 7 <> 0 GROUP BY 1),
      |c2 AS (
      |  SELECT CAST(floor((CASE WHEN doc_id % 11 = 0 THEN n_chars + 5
      |      ELSE n_chars END) / 100) AS BIGINT) AS bin,
      |    CAST(count(*) AS BIGINT) AS n2
      |  FROM documents WHERE doc_id % 5 <> 0 GROUP BY 1),
      |j AS (
      |  SELECT coalesce(c1.bin, c2.bin) AS bin,
      |    coalesce(n1, 0) AS n1, coalesce(n2, 0) AS n2
      |  FROM c1 FULL JOIN c2 ON c1.bin = c2.bin),
      |tot AS (SELECT CAST(sum(n1) AS BIGINT) AS t1,
      |  CAST(sum(n2) AS BIGINT) AS t2, CAST(count(*) AS BIGINT) AS nb
      |  FROM j),
      |parts AS (
      |  SELECT CAST(round(1e8 * (
      |      ((n1 + 0.5) / (t1 + 0.5 * nb) - (n2 + 0.5) / (t2 + 0.5 * nb))
      |      * ln(((n1 + 0.5) / (t1 + 0.5 * nb))
      |          / ((n2 + 0.5) / (t2 + 0.5 * nb))))) AS BIGINT) AS part8
      |  FROM j, tot)
      |SELECT t1 AS n1, t2 AS n2, nb AS n_bins,
      |  (SELECT CAST(sum(part8) AS BIGINT) FROM parts) AS psi8
      |FROM tot""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val v1 = docs.where(col("doc_id") % 7 =!= 0)
    val v2 = docs.where(col("doc_id") % 5 =!= 0)
      .withColumn("n_chars", when(col("doc_id") % 11 === 0,
        col("n_chars") + 5).otherwise(col("n_chars")))
    Profiling.psi(v1, v2, "n_chars", binWidth = 100L)
  }

  /** Capstone model governance (q221): ONE row a deployment gate reads
    * before trusting the q126 classifier — tie-aware AUC + best-F1
    * operating point ([[graft.operators.QualityClassifier.rocReport]]),
    * the best single-threshold stump on the model score
    * ([[graft.operators.Profiling.decisionStump]] — the separability
    * floor), PSI between the score distributions of the doc-id parity
    * halves ([[graft.operators.Profiling.psi]] — split stability; a
    * high value means the score depends on WHICH half of the corpus
    * you look at), and whether the 10-decile calibration curve is
    * monotone (the q171 miscalibration alarm as a single bit). ONE
    * oracle replays training, scoring, and all four audits. */
  val q221 = {
    val roc =
      """rc AS (
        |  SELECT score4 AS s,
        |    CAST(sum(CASE WHEN label_keep THEN 1 ELSE 0 END) AS BIGINT) AS p,
        |    CAST(sum(CASE WHEN label_keep THEN 0 ELSE 1 END) AS BIGINT) AS q
        |  FROM nb GROUP BY score4),
        |rcum AS (
        |  SELECT s, p, q,
        |    CAST(coalesce(sum(p) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cp,
        |    CAST(coalesce(sum(q) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cq
        |  FROM rc),
        |rtot AS (SELECT CAST(sum(p) AS BIGINT) AS n_pos,
        |                CAST(sum(q) AS BIGINT) AS n_neg FROM rc),
        |rop AS (
        |  SELECT s, p * (2 * cq + q) AS u2p,
        |    n_pos - cp AS tp, n_neg - cq AS fp, n_pos, n_neg
        |  FROM rcum, rtot),
        |rf AS (SELECT s,
        |    CAST(round(1e4 * 2.0 * tp / (tp + fp + n_pos)) AS BIGINT) AS f14
        |  FROM rop),
        |rbest AS (SELECT max(f14) AS best_f14 FROM rf),
        |roc AS (
        |  SELECT n_pos + n_neg AS n_docs,
        |    CAST(round(1e4 * (SELECT CAST(sum(u2p) AS BIGINT) FROM rop)
        |      / (2.0 * n_pos * n_neg)) AS BIGINT) AS auc4,
        |    (SELECT max(s) FROM rf, rbest WHERE f14 = rbest.best_f14)
        |      AS best_thr,
        |    (SELECT best_f14 FROM rbest) AS best_f14
        |  FROM rtot)""".stripMargin
    val stump =
      s"""scand AS (
         |  SELECT s,
         |    CAST(round(1e4 * (${impSql("n_pos", "n_neg")}
         |      - (CAST(cp + cq AS DOUBLE) / CAST(n_pos + n_neg AS DOUBLE))
         |        * ${impSql("cp", "cq")}
         |      - (CAST((n_pos - cp) + (n_neg - cq) AS DOUBLE)
         |          / CAST(n_pos + n_neg AS DOUBLE))
         |        * ${impSql("n_pos - cp", "n_neg - cq")})) AS BIGINT) AS gain4
         |  FROM rcum, rtot),
         |stump AS (SELECT s AS s_thr, gain4 AS s_gain4 FROM scand
         |  ORDER BY gain4 DESC, s DESC LIMIT 1)""".stripMargin
    val psi =
      """p1 AS (SELECT CAST(floor(score4 / 1) AS BIGINT) AS bin,
        |    CAST(count(*) AS BIGINT) AS n1
        |  FROM nb WHERE doc_id % 2 = 0 GROUP BY 1),
        |p2 AS (SELECT CAST(floor(score4 / 1) AS BIGINT) AS bin,
        |    CAST(count(*) AS BIGINT) AS n2
        |  FROM nb WHERE doc_id % 2 = 1 GROUP BY 1),
        |pj AS (
        |  SELECT coalesce(p1.bin, p2.bin) AS bin,
        |    coalesce(n1, 0) AS n1, coalesce(n2, 0) AS n2
        |  FROM p1 FULL JOIN p2 ON p1.bin = p2.bin),
        |ptot AS (SELECT CAST(sum(n1) AS BIGINT) AS t1,
        |  CAST(sum(n2) AS BIGINT) AS t2, CAST(count(*) AS BIGINT) AS nbn
        |  FROM pj),
        |pparts AS (
        |  SELECT CAST(round(1e8 * (
        |      ((n1 + 0.5) / (t1 + 0.5 * nbn) - (n2 + 0.5) / (t2 + 0.5 * nbn))
        |      * ln(((n1 + 0.5) / (t1 + 0.5 * nbn))
        |          / ((n2 + 0.5) / (t2 + 0.5 * nbn))))) AS BIGINT) AS part8
        |  FROM pj, ptot),
        |psi AS (SELECT CAST(sum(part8) AS BIGINT) AS split_psi8
        |  FROM pparts)""".stripMargin
    val calib =
      """cc AS (SELECT score4 AS s4, count(*) AS n_cell FROM nb GROUP BY score4),
        |ctt AS (SELECT count(*) AS n_total FROM nb),
        |cmap AS (
        |  SELECT s4,
        |    CAST(floor(coalesce(sum(n_cell) OVER (ORDER BY s4
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      * 10 / n_total) AS INT) AS bucket
        |  FROM cc, ctt),
        |crate AS (
        |  SELECT bucket,
        |    CAST(round(1e4 * sum(CASE WHEN label_keep THEN 1 ELSE 0 END)
        |      / count(*)) AS BIGINT) AS keep_rate4
        |  FROM (SELECT score4 AS s4, label_keep FROM nb) JOIN cmap USING (s4)
        |  GROUP BY bucket),
        |calib AS (
        |  SELECT CAST(min(CASE WHEN prev IS NULL OR keep_rate4 >= prev
        |    THEN 1 ELSE 0 END) AS BIGINT) AS calib_monotone
        |  FROM (SELECT keep_rate4,
        |          lag(keep_rate4) OVER (ORDER BY bucket) AS prev
        |        FROM crate))""".stripMargin
    GQuery("q221_model_governance",
      s"""WITH nb AS (${TextQueries.q126.oracle.get}),
         |$roc,
         |$stump,
         |$psi,
         |$calib
         |SELECT roc.n_docs, roc.auc4, roc.best_thr, roc.best_f14,
         |  stump.s_thr, stump.s_gain4, psi.split_psi8, calib.calib_monotone
         |FROM roc, stump, psi, calib""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val nb = TextQueries.sharedNbScores(s, dir)
        .select(col("doc_id"), col("score4"), col("label_keep"))
      val roc = graft.operators.QualityClassifier
        .rocReport(nb, "score4", "label_keep")
        .select((col("n_pos") + col("n_neg")).as("n_docs"), col("auc4"),
          col("best_thr"), col("best_f14"))
      val stump = Profiling.decisionStump(nb, "score4", "label_keep")
        .select(col("best_thr").as("s_thr"), col("best_gain4").as("s_gain4"))
      val psi = Profiling.psi(nb.where(col("doc_id") % 2 === 0),
          nb.where(col("doc_id") % 2 === 1), "score4", binWidth = 1L)
        .select(col("psi8").as("split_psi8"))
      val scored = nb.select(col("doc_id"), (col("score4") / 1e4).as("score"),
        col("label_keep"))
      val rates = graft.operators.Sampling
        .rangeBuckets(scored, "doc_id", "score", 10)
        .join(scored.select("doc_id", "label_keep"), "doc_id")
        .groupBy("bucket")
        .agg(round(lit(1e4) * sum(when(col("label_keep"), 1L).otherwise(0L))
          / count(lit(1))).cast("long").as("keep_rate4"))
      val calib = rates
        .withColumn("prev",
          lag(col("keep_rate4"), 1).over(Window.orderBy(col("bucket"))))
        .agg(min(when(col("prev").isNull
          || col("keep_rate4") >= col("prev"), 1L).otherwise(0L))
          .as("calib_monotone"))
      roc.crossJoin(broadcast(stump)).crossJoin(broadcast(psi))
        .crossJoin(broadcast(calib))
    }
  }

  /** Two-proportion z-test on CONVERSION (a heavy-purchaser flag:
    * ≥ 14 purchase events — the fixture's median, so both outcomes are
    * populated at every SF) between the q195 md5-coin variants — the
    * significance readout for a binary metric (q215's Welch t covers
    * the continuous one): pooled-variance z from four exact integers
    * in one fixed double shape. A |z| < 1.96 on the hash coin is also
    * a perpetual A/A sanity check of the assignment itself. */
  val q224 = GQuery("q224_conversion_ztest",
    """WITH a AS (
      |  SELECT user_id,
      |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
      |      AS BIGINT) % 2 AS variant
      |  FROM (SELECT DISTINCT user_id FROM events)),
      |cv AS (SELECT user_id FROM events WHERE event_type = 'purchase'
      |  GROUP BY user_id HAVING count(*) >= 14),
      |s AS (
      |  SELECT variant, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN cv.user_id IS NOT NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS conv
      |  FROM a LEFT JOIN cv USING (user_id) GROUP BY variant),
      |w AS (
      |  SELECT max(CASE WHEN variant = 0 THEN n END) AS n0,
      |    max(CASE WHEN variant = 0 THEN conv END) AS c0,
      |    max(CASE WHEN variant = 1 THEN n END) AS n1,
      |    max(CASE WHEN variant = 1 THEN conv END) AS c1
      |  FROM s)
      |SELECT n0, c0, n1, c1,
      |  CAST(round(1e4 * (CAST(c0 AS DOUBLE) / n0)) AS BIGINT) AS p0_4,
      |  CAST(round(1e4 * (CAST(c1 AS DOUBLE) / n1)) AS BIGINT) AS p1_4,
      |  CAST(round(1e4 * ((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
      |    / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
      |      * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
      |      * (1.0 / n0 + 1.0 / n1)))) AS BIGINT) AS z4
      |FROM w""".stripMargin) { (s, dir) =>
    val events = Tables.events(s, dir)
    val assign = events.select(col("user_id")).distinct()
      .withColumn("variant",
        pmod(conv(substring(md5(col("user_id").cast("string")), 1, 12),
          16, 10).cast("long"), lit(2L)))
    val converted = events.where(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(count(lit(1)).as("np"))
      .where(col("np") >= 14).select(col("user_id"), lit(1L).as("cv"))
    val st = assign.join(converted, Seq("user_id"), "left")
      .groupBy("variant")
      .agg(count(lit(1)).as("n"),
        sum(when(col("cv").isNotNull, 1L).otherwise(0L)).as("conv"))
    val p0 = col("c0").cast("double") / col("n0")
    val p1 = col("c1").cast("double") / col("n1")
    val pp = (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1"))
    st.agg(
        max(when(col("variant") === 0, col("n"))).as("n0"),
        max(when(col("variant") === 0, col("conv"))).as("c0"),
        max(when(col("variant") === 1, col("n"))).as("n1"),
        max(when(col("variant") === 1, col("conv"))).as("c1"))
      .select(col("n0"), col("c0"), col("n1"), col("c1"),
        round(lit(1e4) * p0).cast("long").as("p0_4"),
        round(lit(1e4) * p1).cast("long").as("p1_4"),
        round(lit(1e4) * ((p0 - p1) / sqrt(pp * (lit(1.0) - pp)
          * (lit(1.0) / col("n0") + lit(1.0) / col("n1")))))
          .cast("long").as("z4"))
  }

  /** Exact 80/20 Pareto point per source (see
    * [[graft.operators.Profiling.paretoPoint]]): the smallest
    * largest-first document count holding ≥ 4/5 of each source's
    * character mass — the Lorenz-curve reading q208's Gini summarizes.
    * Integer-exact including the within-cell ceiling. */
  val q228 = GQuery("q228_pareto_point",
    """WITH cells AS (
      |  SELECT source AS grp, n_chars AS v, CAST(count(*) AS BIGINT) AS m
      |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
      |cum AS (
      |  SELECT grp, v, m,
      |    CAST(sum(v * m) OVER wd AS BIGINT) AS cmass,
      |    CAST(sum(m) OVER wd AS BIGINT) AS ccnt
      |  FROM cells WINDOW wd AS (PARTITION BY grp ORDER BY v DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |tot AS (SELECT grp, CAST(sum(v * m) AS BIGINT) AS tt,
      |  CAST(sum(m) AS BIGINT) AS n FROM cells GROUP BY grp),
      |th AS (
      |  SELECT c.grp, t.n, t.tt, c.ccnt - c.m AS kb,
      |    4 * t.tt - 5 * (c.cmass - c.v * c.m) + 5 * c.v - 1 AS a,
      |    5 * c.v AS dv
      |  FROM cum c JOIN tot t USING (grp)
      |  WHERE t.tt > 0 AND 5 * c.cmass >= 4 * t.tt
      |    AND 5 * (c.cmass - c.v * c.m) < 4 * t.tt),
      |sel AS (
      |  SELECT grp, n, tt,
      |    kb + CAST((a - a % dv) / dv AS BIGINT) AS pareto_k
      |  FROM th)
      |SELECT grp AS source, n AS n_rows, tt AS total, pareto_k,
      |  CAST(round(1e4 * pareto_k / n) AS BIGINT) AS pareto_f4
      |FROM sel ORDER BY source""".stripMargin) { (s, dir) =>
    Profiling.paretoPoint(Tables.documents(s, dir), "source", "n_chars",
        num = 4, den = 5)
      .withColumnRenamed("grp", "source")
      .orderBy(col("source"))
  }

  /** k-anonymity audit (see
    * [[graft.operators.Profiling.kAnonymity]]): equivalence classes of
    * the (priority, 30-day window, price band) quasi-identifier over
    * orders, k = 5 — how many rows a linkage attacker could single
    * out. Pure integer bucketing so both engines build identical
    * classes. */
  val q238 = GQuery("q238_k_anonymity",
    """WITH cls AS (
      |  SELECT o_orderpriority AS qp,
      |    CAST(floor(CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)
      |      / 30) AS BIGINT) AS qm,
      |    CAST(floor(o_totalprice / 20000) AS BIGINT) AS qb,
      |    CAST(count(*) AS BIGINT) AS sz
      |  FROM orders GROUP BY 1, 2, 3),
      |a AS (
      |  SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
      |    count(*) AS n_classes, CAST(min(sz) AS BIGINT) AS min_class,
      |    CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_small_classes,
      |    CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
      |      AS n_risk_rows
      |  FROM cls)
      |SELECT n_rows, n_classes, min_class, n_small_classes, n_risk_rows,
      |  CAST(round(1e4 * n_risk_rows / n_rows) AS BIGINT) AS risk_frac4
      |FROM a""".stripMargin) { (s, dir) =>
    Profiling.kAnonymity(
      Tables.orders(s, dir).select(col("o_orderpriority").as("qp"),
        floor(floor(unix_timestamp(col("o_orderdate")) / 86400L)
          / lit(30)).cast("long").as("qm"),
        floor(col("o_totalprice") / 20000).cast("long").as("qb")),
      Seq("qp", "qm", "qb"), k = 5L)
  }

  /** Capstone privacy audit (q243): ONE verdict table a release gate
    * reads — total rows leaking each q236 PII pattern across event
    * payloads, and the q238 k-anonymity minimum and at-risk row count
    * over the orders quasi-identifier — each check with its threshold
    * verdict, all under one oracle (the q180/q184 fitness-report
    * shape applied to privacy). */
  val q243 = GQuery("q243_privacy_audit",
    s"""WITH base AS (
       |  SELECT props AS t FROM events WHERE props IS NOT NULL),
       |em AS (SELECT CAST(sum(CASE WHEN len(regexp_extract_all(t,
       |    '${graft.functions.TextFunctions.PiiPatterns.head._2}')) > 0
       |    THEN 1 ELSE 0 END) AS BIGINT) AS v FROM base),
       |ip AS (SELECT CAST(sum(CASE WHEN len(regexp_extract_all(t,
       |    '${graft.functions.TextFunctions.PiiPatterns(1)._2}')) > 0
       |    THEN 1 ELSE 0 END) AS BIGINT) AS v FROM base),
       |cls AS (
       |  SELECT o_orderpriority AS qp,
       |    CAST(floor(CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)
       |      / 30) AS BIGINT) AS qm,
       |    CAST(floor(o_totalprice / 20000) AS BIGINT) AS qb,
       |    CAST(count(*) AS BIGINT) AS sz
       |  FROM orders GROUP BY 1, 2, 3),
       |ka AS (
       |  SELECT CAST(min(sz) AS BIGINT) AS min_class,
       |    CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
       |      AS risk_rows
       |  FROM cls)
       |SELECT * FROM (
       |  SELECT 'pii_email_rows' AS check_name, v AS value, v = 0 AS pass
       |  FROM em
       |  UNION ALL
       |  SELECT 'pii_ip_rows', v, v = 0 FROM ip
       |  UNION ALL
       |  SELECT 'k_anon_min_class', min_class, min_class >= 5 FROM ka
       |  UNION ALL
       |  SELECT 'k_anon_risk_rows', risk_rows, risk_rows = 0 FROM ka)
       |ORDER BY check_name""".stripMargin) { (s, dir) =>
    val pii = graft.operators.TextStats.piiCensus(Tables.events(s, dir),
        "event_type", "props",
        graft.functions.TextFunctions.PiiPatterns.take(2))
      .groupBy("pattern").agg(sum(col("n_rows_with")).as("v"))
    val ka = Profiling.kAnonymity(
      Tables.orders(s, dir).select(col("o_orderpriority").as("qp"),
        floor(floor(unix_timestamp(col("o_orderdate")) / 86400L)
          / lit(30)).cast("long").as("qm"),
        floor(col("o_totalprice") / 20000).cast("long").as("qb")),
      Seq("qp", "qm", "qb"), k = 5L)
    def check(name: String, v: org.apache.spark.sql.Column,
              pass: org.apache.spark.sql.Column)(
        df: org.apache.spark.sql.DataFrame) =
      df.select(lit(name).as("check_name"), v.as("value"),
        pass.as("pass"))
    check("pii_email_rows", col("v"), col("v") === 0L)(
        pii.where(col("pattern") === "email"))
      .unionAll(check("pii_ip_rows", col("v"), col("v") === 0L)(
        pii.where(col("pattern") === "ip")))
      .unionAll(check("k_anon_min_class", col("min_class"),
        col("min_class") >= 5L)(ka))
      .unionAll(check("k_anon_risk_rows", col("n_risk_rows"),
        col("n_risk_rows") === 0L)(ka))
      .orderBy(col("check_name"))
  }

  /** Functional-dependency audit (see
    * [[graft.operators.Profiling.fdViolations]]): three candidate FDs
    * over orders — the key FD that must hold and two that measure how
    * far attribute pairs are from determinism. */
  val q249 = {
    val pairs = Seq(("o_orderkey", "o_custkey"),
      ("o_custkey", "o_orderpriority"),
      ("o_orderpriority", "o_orderstatus"))
    val branches = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS determinant, '$b' AS dependent,
         |  CAST(sum(ta) AS BIGINT) AS n_rows,
         |  CAST(sum(ta - mx) AS BIGINT) AS n_violations,
         |  sum(ta - mx) = 0 AS holds
         |FROM (
         |  SELECT av, CAST(sum(n) AS BIGINT) AS ta,
         |    CAST(max(n) AS BIGINT) AS mx
         |  FROM (SELECT $a AS av, $b AS bv, CAST(count(*) AS BIGINT) AS n
         |        FROM orders GROUP BY 1, 2)
         |  GROUP BY av)""".stripMargin
    }.mkString("\nUNION ALL\n")
    GQuery("q249_fd_audit",
      s"""SELECT * FROM (
         |$branches)
         |ORDER BY determinant, dependent""".stripMargin) { (s, dir) =>
      Profiling.fdViolations(Tables.orders(s, dir), pairs)
        .orderBy(col("determinant"), col("dependent"))
    }
  }

  /** l-diversity audit (see [[graft.operators.Profiling.lDiversity]]):
    * the q238 QI classes re-scored for sensitive-attribute homogeneity
    * with order STATUS as the sensitive value — a class can be
    * k-anonymous yet leak status wholesale when all its rows agree
    * (the homogeneity attack k misses). Oracle replays the two-level
    * census and the exposure arithmetic. */
  val q270 = GQuery("q270_l_diversity",
    """WITH cells AS (
      |  SELECT o_orderpriority AS qp,
      |    CAST(floor(CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)
      |      / 30) AS BIGINT) AS qm,
      |    CAST(floor(o_totalprice / 20000) AS BIGINT) AS qb,
      |    o_orderstatus AS sv,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM orders GROUP BY 1, 2, 3, 4),
      |cls AS (
      |  SELECT qp, qm, qb, CAST(sum(n) AS BIGINT) AS sz,
      |    CAST(count(*) AS BIGINT) AS lv
      |  FROM cells GROUP BY 1, 2, 3),
      |a AS (
      |  SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
      |    count(*) AS n_classes, CAST(min(lv) AS BIGINT) AS min_l,
      |    CAST(sum(CASE WHEN lv < 2 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_low_classes,
      |    CAST(sum(CASE WHEN lv < 2 THEN sz ELSE 0 END) AS BIGINT)
      |      AS n_exposed_rows
      |  FROM cls)
      |SELECT n_rows, n_classes, min_l, n_low_classes, n_exposed_rows,
      |  CAST(round(1e4 * n_exposed_rows / n_rows) AS BIGINT)
      |    AS exposed_frac4
      |FROM a""".stripMargin) { (s, dir) =>
    Profiling.lDiversity(
      Tables.orders(s, dir).select(col("o_orderpriority").as("qp"),
        floor(floor(unix_timestamp(col("o_orderdate")) / 86400L)
          / lit(30)).cast("long").as("qm"),
        floor(col("o_totalprice") / 20000).cast("long").as("qb"),
        col("o_orderstatus").as("sv")),
      Seq("qp", "qm", "qb"), "sv", l = 2L)
  }

  /** Empirical-Bayes shrinkage of per-user purchase rates (see
    * [[graft.operators.Profiling.ebShrinkRates]]): the Beta-prior
    * pseudo-count k from the between-user rate spread pulls few-event
    * users toward the pooled rate while heavy users keep their own —
    * the leaderboard-smoothing move that stops a 1-for-1 user from
    * "beating" a 90-for-100 one. The oracle replays the census, the
    * 128-bit variance integers, the prior fit, and the shrunk grid. */
  val q273 = GQuery("q273_eb_shrunk_rates",
    """WITH g AS (
      |  SELECT user_id AS grp, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x
      |  FROM events GROUP BY user_id),
      |gr AS (SELECT grp, n, x,
      |  CAST(floor(1e6 * x / n + 0.5) AS BIGINT) AS raw6 FROM g),
      |t AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(x) AS BIGINT) AS xx,
      |    CAST(count(*) AS BIGINT) AS gg,
      |    CAST(sum(CAST(raw6 AS HUGEINT)) AS HUGEINT) AS s1,
      |    CAST(sum(CAST(raw6 AS HUGEINT) * raw6) AS HUGEINT) AS s2
      |  FROM gr),
      |pr AS (
      |  SELECT CAST(gg AS HUGEINT) * s2 - s1 * s1 AS vv,
      |    CAST(xx AS DOUBLE) / nn AS m,
      |    CAST(CAST(gg AS HUGEINT) * s2 - s1 * s1 AS DOUBLE)
      |      / (CAST(gg AS DOUBLE) * CAST(gg AS DOUBLE) * 1e12) AS vr
      |  FROM t),
      |pk AS (
      |  SELECT vv, m,
      |    CASE WHEN vv > 0
      |      THEN greatest(m * (1.0 - m) / vr - 1.0, 0.0) ELSE 0.0 END AS k
      |  FROM pr)
      |SELECT grp AS user_id, n, x, raw6,
      |  CASE WHEN vv = 0 THEN raw6
      |    ELSE CAST(floor(1e6 * (CAST(x AS DOUBLE) + k * m)
      |      / (CAST(n AS DOUBLE) + k) + 0.5) AS BIGINT) END AS shrunk6
      |FROM gr, pk ORDER BY user_id""".stripMargin) { (s, dir) =>
    Profiling.ebShrinkRates(
        Tables.events(s, dir)
          .withColumn("conv", col("event_type") === "purchase"),
        "user_id", "conv")
      .select(col("grp").as("user_id"), col("n"), col("x"), col("raw6"),
        col("shrunk6"))
      .orderBy(col("user_id"))
  }

  /** t-closeness audit on the q270 QI scheme (see
    * [[graft.operators.Profiling.tCloseness]]): per (priority, order
    * month, price band) class, total-variation distance between the
    * class's order-status mix and the corpus mix — the skew leak
    * l-diversity cannot see. The oracle replays the census, the
    * class-window sizes, the 128-bit |c·n − g·z| sums, the
    * absent-value mass term, and both grid roundings. */
  val q274 = GQuery("q274_t_closeness",
    """WITH cells AS (
      |  SELECT o_orderpriority AS qp,
      |    CAST(floor(CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)
      |      / 30) AS BIGINT) AS qm,
      |    CAST(floor(o_totalprice / 20000) AS BIGINT) AS qb,
      |    o_orderstatus AS sv, CAST(count(*) AS BIGINT) AS cnt
      |  FROM orders GROUP BY 1, 2, 3, 4),
      |gsv AS (
      |  SELECT sv, CAST(sum(cnt) AS BIGINT) AS gv FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(sum(gv) AS BIGINT) AS nr FROM gsv),
      |wc AS (
      |  SELECT c.qp, c.qm, c.qb, c.cnt, g.gv, t.nr,
      |    CAST(sum(c.cnt) OVER (PARTITION BY c.qp, c.qm, c.qb)
      |      AS BIGINT) AS sz
      |  FROM cells c JOIN gsv g ON c.sv = g.sv CROSS JOIN tot t),
      |cls AS (
      |  SELECT qp, qm, qb, any_value(sz) AS sz, any_value(nr) AS nr,
      |    CAST(sum(abs(CAST(cnt AS HUGEINT) * nr
      |      - CAST(gv AS HUGEINT) * sz)) AS HUGEINT) AS np,
      |    CAST(sum(gv) AS BIGINT) AS gp
      |  FROM wc GROUP BY 1, 2, 3),
      |cl2 AS (
      |  SELECT sz,
      |    CAST(round(1e4 * CAST(np + CAST(sz AS HUGEINT) * (nr - gp)
      |        AS DOUBLE) / (2.0 * nr * sz)) AS BIGINT) AS tvd4
      |  FROM cls)
      |SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
      |  CAST(count(*) AS BIGINT) AS n_classes,
      |  CAST(max(tvd4) AS BIGINT) AS max_tvd4,
      |  CAST(sum(CASE WHEN tvd4 > 1500 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_far_classes,
      |  CAST(sum(CASE WHEN tvd4 > 1500 THEN sz ELSE 0 END) AS BIGINT)
      |    AS n_exposed_rows,
      |  CAST(round(1e4 * sum(CASE WHEN tvd4 > 1500 THEN sz ELSE 0 END)
      |    / sum(sz)) AS BIGINT) AS exposed_frac4
      |FROM cl2""".stripMargin) { (s, dir) =>
    Profiling.tCloseness(
      Tables.orders(s, dir).select(col("o_orderpriority").as("qp"),
        floor(floor(unix_timestamp(col("o_orderdate")) / 86400L)
          / lit(30)).cast("long").as("qm"),
        floor(col("o_totalprice") / 20000).cast("long").as("qb"),
        col("o_orderstatus").as("sv")),
      Seq("qp", "qm", "qb"), "sv", t4 = 1500L)
  }

  /** Mann–Whitney rank-sum over purchase vs click event values (see
    * [[graft.operators.Profiling.mannWhitneyU]]): the nonparametric
    * "did the distributions shift" companion to the q215 Welch t —
    * midranks doubled to stay integer, tie-corrected normal z. The
    * oracle replays the cell census, the spine cumulative, the 128-bit
    * doubled rank-sum, and the one z expression. */
  val q275 = GQuery("q275_mann_whitney",
    """WITH cells AS (
      |  SELECT CAST(round(value * 1e4) AS BIGINT) AS v4,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ca,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS cb
      |  FROM events
      |  WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
      |  GROUP BY 1),
      |sp AS (
      |  SELECT v4, ca, cb,
      |    COALESCE(CAST(sum(ca + cb) OVER (ORDER BY v4
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS BIGINT), 0) AS below,
      |    ca + cb AS e
      |  FROM cells),
      |a AS (
      |  SELECT CAST(sum(ca) AS BIGINT) AS n_a,
      |    CAST(sum(cb) AS BIGINT) AS n_b,
      |    CAST(sum(CAST(ca AS HUGEINT) * (2 * below + e + 1)) AS HUGEINT)
      |      AS r2h,
      |    CAST(sum(CAST(e AS HUGEINT) * e * e - e) AS HUGEINT) AS tie3h
      |  FROM sp),
      |b AS (
      |  SELECT n_a, n_b, r2h, tie3h,
      |    2 * CAST(n_a AS HUGEINT) * n_b
      |      + CAST(n_a AS HUGEINT) * (n_a + 1) - r2h AS u2h,
      |    n_a + n_b AS nn
      |  FROM a),
      |c AS (
      |  SELECT *, CAST(n_a AS DOUBLE) * n_b / 12.0 * ((nn + 1)
      |    - CAST(tie3h AS DOUBLE) / (CAST(nn AS DOUBLE) * (nn - 1)))
      |    AS var_u
      |  FROM b)
      |SELECT n_a, n_b, CAST(r2h AS BIGINT) AS r2_a,
      |  CAST(u2h AS BIGINT) AS u2_a, CAST(tie3h AS BIGINT) AS tie3,
      |  CASE WHEN var_u > 0 THEN CAST(round(1e4 * (CAST(u2h AS DOUBLE)
      |    - CAST(n_a AS DOUBLE) * n_b) / (2.0 * sqrt(var_u))) AS BIGINT)
      |    ELSE 0 END AS z4
      |FROM c""".stripMargin) { (s, dir) =>
    Profiling.mannWhitneyU(Tables.events(s, dir), "event_type", "value",
        "purchase", "click")
      .select(col("n_a"), col("n_b"),
        col("r2_a").cast("long").as("r2_a"),
        col("u2_a").cast("long").as("u2_a"),
        col("tie3").cast("long").as("tie3"), col("z4"))
  }

  /** Two-sample Kolmogorov–Smirnov over view vs error event values
    * (see [[graft.operators.Profiling.ksTwoSample]]): the max-ECDF-gap
    * distribution-shift readout, with the (smallest) value where the
    * gap peaks. The oracle replays the census, both inclusive
    * cumulatives, the 128-bit cross-product gap, and the argmax
    * tie-break. */
  val q276 = GQuery("q276_ks_two_sample",
    """WITH cells AS (
      |  SELECT CAST(round(value * 1e4) AS BIGINT) AS v4,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ca,
      |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS cb
      |  FROM events
      |  WHERE event_type IN ('view', 'error') AND value IS NOT NULL
      |  GROUP BY 1),
      |sp AS (
      |  SELECT v4,
      |    CAST(sum(ca) OVER (ORDER BY v4 ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS cuma,
      |    CAST(sum(cb) OVER (ORDER BY v4 ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS cumb
      |  FROM cells),
      |tot AS (
      |  SELECT CAST(max(cuma) AS BIGINT) AS n_a,
      |    CAST(max(cumb) AS BIGINT) AS n_b FROM sp),
      |gaps AS (
      |  SELECT v4, n_a, n_b,
      |    abs(CAST(cuma AS HUGEINT) * n_b - CAST(cumb AS HUGEINT) * n_a)
      |      AS gap
      |  FROM sp CROSS JOIN tot),
      |mg AS (SELECT max(gap) AS m FROM gaps)
      |SELECT n_a, n_b,
      |  CAST(round(1e6 * CAST(gap AS DOUBLE)
      |    / (CAST(n_a AS DOUBLE) * n_b)) AS BIGINT) AS d6,
      |  CAST(min(v4) AS BIGINT) AS at_v4
      |FROM gaps CROSS JOIN mg WHERE gap = m
      |GROUP BY 1, 2, gap""".stripMargin) { (s, dir) =>
    Profiling.ksTwoSample(Tables.events(s, dir), "event_type", "value",
      "view", "error")
  }

  /** Deletion-impact audit — the right-to-be-forgotten dry run: given
    * a customer delete set (here every 37th key — the synthetic stand-
    * in for an erasure request list), how many rows each table loses
    * once the cascade propagates (orders via custkey, lineitems via
    * the doomed orders). Three semi-join counts — each table is
    * touched once, the delete set and the doomed-order keys broadcast;
    * the number a deletion job quotes BEFORE it mutates anything. */
  val q269 = GQuery("q269_deletion_impact",
    """WITH del AS (SELECT c_custkey FROM customer WHERE c_custkey % 37 = 0),
      |oo AS (SELECT o_orderkey FROM orders
      |       WHERE o_custkey IN (SELECT c_custkey FROM del)),
      |imp AS (
      |  SELECT 'customer' AS tbl,
      |    CAST((SELECT count(*) FROM del) AS BIGINT) AS n_affected,
      |    CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_total
      |  UNION ALL
      |  SELECT 'lineitem',
      |    CAST((SELECT count(*) FROM lineitem
      |          WHERE l_orderkey IN (SELECT o_orderkey FROM oo)) AS BIGINT),
      |    CAST((SELECT count(*) FROM lineitem) AS BIGINT)
      |  UNION ALL
      |  SELECT 'orders',
      |    CAST((SELECT count(*) FROM oo) AS BIGINT),
      |    CAST((SELECT count(*) FROM orders) AS BIGINT))
      |SELECT tbl, n_affected, n_total,
      |  CAST(round(1e6 * n_affected / n_total) AS BIGINT) AS share6
      |FROM imp ORDER BY tbl""".stripMargin) { (s, dir) =>
    val cust = Tables.customer(s, dir)
    val orders = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    val del = cust.where(col("c_custkey") % 37 === 0)
      .select(col("c_custkey"))
    val doomed = orders.join(broadcast(del),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"))
    def row(name: String, affected: org.apache.spark.sql.DataFrame,
            total: org.apache.spark.sql.DataFrame) =
      affected.agg(count(lit(1)).as("n_affected"))
        .crossJoin(broadcast(total.agg(count(lit(1)).as("n_total"))))
        .select(lit(name).as("tbl"), col("n_affected"), col("n_total"))
    row("customer", del, cust)
      .unionByName(row("orders", doomed, orders))
      .unionByName(row("lineitem",
        li.join(broadcast(doomed), col("l_orderkey") === col("o_orderkey"),
          "left_semi"), li))
      .select(col("tbl"), col("n_affected"), col("n_total"),
        round(lit(1e6) * col("n_affected") / col("n_total")).cast("long")
          .as("share6"))
      .orderBy(col("tbl"))
  }

  /** Market-basket association rules (see
    * [[graft.operators.Itemsets.pairAssociations]]): orders are
    * baskets, part brands the items; the a-priori item prune, the
    * within-basket pair census, and support/confidence/lift on the
    * 1e-6 grid. The oracle replays the distinct pass, the relative
    * threshold (`ceil(frac·nBaskets)` on BOTH the item and pair
    * filters), and the exact integer-product lift arithmetic. Brands
    * are a 25-value vocabulary, so every pair is frequent at sf scale —
    * the prune's row-dropping face is spec-tested on a skewed fixture;
    * here the hash proves the census and rule arithmetic. */
  val q259 = GQuery("q259_basket_lift",
    """WITH d AS (
      |  SELECT DISTINCT l.l_orderkey AS b, p.p_brand AS i
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      |nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS nb,
      |  CAST(ceil(0.02 * count(DISTINCT b)) AS BIGINT) AS mn FROM d),
      |f AS (
      |  SELECT i, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY i
      |  HAVING count(*) >= (SELECT mn FROM nb)),
      |pr AS (
      |  SELECT a.i AS item_a, b.i AS item_b, a.n AS n_a, b.n AS n_b,
      |    CAST(count(*) AS BIGINT) AS pair_n
      |  FROM (SELECT d.b, d.i, f.n FROM d JOIN f USING (i)) a
      |  JOIN (SELECT d.b, d.i, f.n FROM d JOIN f USING (i)) b
      |    ON a.b = b.b AND a.i < b.i
      |  GROUP BY 1, 2, 3, 4)
      |SELECT item_a, item_b, n_a, n_b, pair_n,
      |  CAST(round(1e6 * pair_n / nb) AS BIGINT) AS support6,
      |  CAST(round(1e6 * pair_n / n_a) AS BIGINT) AS conf_a_b6,
      |  CAST(round(1e6 * CAST(pair_n * nb AS DOUBLE)
      |    / CAST(n_a * n_b AS DOUBLE)) AS BIGINT) AS lift6
      |FROM pr CROSS JOIN nb
      |WHERE pair_n >= mn
      |ORDER BY item_a, item_b""".stripMargin) { (s, dir) =>
    val baskets = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand"))
    graft.operators.Itemsets
      .pairAssociations(baskets, "l_orderkey", "p_brand",
        minSupportFrac = 0.02)
      .orderBy(col("item_a"), col("item_b"))
  }

  /** Item-based collaborative-filtering neighborhoods (see
    * [[graft.operators.Itemsets.itemCosine]]): each part's 5 most
    * similar parts by co-purchase cosine over order baskets, co ≥ 2 —
    * where q259 asks "is this pair surprising" (lift over brands),
    * this builds the per-item recommender list. The oracle replays
    * the incidence pass, the pair census, both directions, the
    * √-normalized grid cosine, and the windowed top-k with its
    * neighbor-id tie-break. */
  val q279 = GQuery("q279_item_cosine",
    """WITH d AS (
      |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
      |cnt AS (SELECT i, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
      |co AS (
      |  SELECT a.i AS ia, b.i AS ib, CAST(count(*) AS BIGINT) AS co
      |  FROM d a JOIN d b ON a.b = b.b AND a.i < b.i
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |bi AS (
      |  SELECT ia AS item, ib AS nbr, co FROM co
      |  UNION ALL SELECT ib, ia, co FROM co),
      |sc AS (
      |  SELECT item, nbr, ca.n AS n_item, cb.n AS n_nbr, co,
      |    CAST(round(1e6 * co / sqrt(CAST(ca.n AS DOUBLE) * cb.n))
      |      AS BIGINT) AS cosine6
      |  FROM bi JOIN cnt ca ON ca.i = item JOIN cnt cb ON cb.i = nbr),
      |rk AS (
      |  SELECT *, row_number() OVER (PARTITION BY item
      |    ORDER BY cosine6 DESC, nbr) AS rk
      |  FROM sc)
      |SELECT item, nbr, n_item, n_nbr, co, cosine6, CAST(rk AS BIGINT) AS rk
      |FROM rk WHERE rk <= 5 ORDER BY item, rk""".stripMargin) { (s, dir) =>
    graft.operators.Itemsets.itemCosine(Tables.lineitem(s, dir),
        "l_orderkey", "l_partkey", minCo = 2L, k = 5)
      .select(col("item"), col("nbr"), col("n_item"), col("n_nbr"),
        col("co"), col("cosine6"), col("rk"))
      .orderBy(col("item"), col("rk"))
  }

  /** Order skyline (see [[graft.operators.Profiling.skyline2d]]):
    * orders on the Pareto front of (highest total price, earliest
    * order date) — no other order is both bigger and earlier. The
    * oracle replays the cell census, the per-price minimum, the
    * descending sweep with its strict-dominance running minimum, and
    * the surviving-cell counts. */
  val q285 = GQuery("q285_order_skyline",
    """WITH cells AS (
      |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS u,
      |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS t,
      |    CAST(count(*) AS BIGINT) AS n_rows
      |  FROM orders GROUP BY 1, 2),
      |pu AS (
      |  SELECT u, t, n_rows FROM (
      |    SELECT *, min(t) OVER (PARTITION BY u) AS tm FROM cells)
      |  WHERE t = tm),
      |sw AS (
      |  SELECT u, t, n_rows,
      |    min(t) OVER (ORDER BY u DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS th
      |  FROM pu)
      |SELECT u, t, n_rows FROM sw WHERE th IS NULL OR t < th
      |ORDER BY u DESC""".stripMargin) { (s, dir) =>
    Profiling.skyline2d(
        Tables.orders(s, dir).select(
          round(col("o_totalprice") * 100).cast("long").as("u"),
          floor(unix_timestamp(col("o_orderdate")) / 86400L).as("t")),
        "u", "t")
      .orderBy(col("u").desc)
  }

  /** Wald SPRT over the purchase-vs-click trial stream (see
    * [[graft.operators.EventOps.sprtBinary]]): sequential monitoring
    * of "is the conversion rate 0.5 (H1) or 0.4 (H0)" with α = β =
    * 0.05 — the increments and bounds are 1e-6-grid constants spliced
    * into BOTH engines, so the whole walk is integer arithmetic. The
    * oracle replays the ordered cumulative, the linear LLR, the
    * first-crossing argmin, and the decision rule. */
  val q289 = {
    val A6 = math.round(1e6 * math.log(0.5 / 0.4))   // success increment
    val B6 = math.round(1e6 * math.log(0.5 / 0.6))   // failure increment
    val Up6 = math.round(1e6 * math.log(0.95 / 0.05))
    val Lo6 = -Up6
    GQuery("q289_sprt",
      s"""WITH t AS (
         |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s
         |  FROM events WHERE event_type IN ('purchase', 'click')),
         |c AS (
         |  SELECT CAST(sum(s) OVER w AS BIGINT) AS k,
         |    CAST(row_number() OVER w AS BIGINT) AS n
         |  FROM t WINDOW w AS (ORDER BY sec, event_id
         |    ROWS UNBOUNDED PRECEDING)),
         |l AS (SELECT n, k, k * $A6 + (n - k) * $B6 AS llr6 FROM c),
         |x AS (SELECT min(n) AS n_dec FROM l
         |      WHERE llr6 >= $Up6 OR llr6 <= $Lo6),
         |tot AS (
         |  SELECT CAST(max(n) AS BIGINT) AS n_total,
         |    CAST(max(k) AS BIGINT) AS k_total,
         |    CAST(arg_max(llr6, n) AS BIGINT) AS llr6_final
         |  FROM l),
         |d AS (
         |  SELECT l.n AS n_at_decision, l.llr6 AS llr6_at_decision
         |  FROM l JOIN x ON l.n = x.n_dec)
         |SELECT n_total, k_total, llr6_final, n_at_decision,
         |  CASE WHEN llr6_at_decision >= $Up6 THEN 'accept_h1'
         |       WHEN llr6_at_decision <= $Lo6 THEN 'accept_h0'
         |       ELSE 'continue' END AS decision
         |FROM tot LEFT JOIN d ON true""".stripMargin) { (s, dir) =>
      graft.operators.EventOps.sprtBinary(
        Tables.events(s, dir)
          .where(col("event_type").isin("purchase", "click")),
        "ts", "event_id", col("event_type") === "purchase",
        A6, B6, Up6, Lo6)
    }
  }

  /** Difference-in-differences on purchase value (see
    * [[graft.operators.Profiling.didEstimate]]): md5-coin arms × a
    * pre/post split at the corpus's middle day — the causal readout
    * that cancels arm level differences and the shared time trend; on
    * a hash coin it doubles as a perpetual A/A check (did4 should
    * hover near 0). The oracle replays the arm assignment, the
    * midpoint, the eight cell integers, and the one estimate
    * expression. */
  val q291 = GQuery("q291_diff_in_diff",
    """WITH a AS (
      |  SELECT user_id,
      |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
      |      AS BIGINT) % 2 AS variant
      |  FROM (SELECT DISTINCT user_id FROM events)),
      |dd AS (
      |  SELECT CAST(min(floor(epoch(ts) / 86400)) AS BIGINT) AS mn,
      |    CAST(max(floor(epoch(ts) / 86400)) AS BIGINT) AS mx
      |  FROM events),
      |m AS (
      |  SELECT a.variant,
      |    CAST(floor(epoch(e.ts) / 86400) AS BIGINT)
      |      >= CAST(floor((mn + mx + 1) / 2) AS BIGINT) AS post,
      |    CAST(round(e.value * 100) AS BIGINT) AS v2
      |  FROM events e JOIN a USING (user_id) CROSS JOIN dd
      |  WHERE e.event_type = 'purchase')
      |SELECT
      |  CAST(sum(CASE WHEN variant = 0 AND NOT post THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_c_pre,
      |  CAST(sum(CASE WHEN variant = 0 AND post THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_c_post,
      |  CAST(sum(CASE WHEN variant = 1 AND NOT post THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_t_pre,
      |  CAST(sum(CASE WHEN variant = 1 AND post THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_t_post,
      |  CAST(round(1e4 * sum(CASE WHEN variant = 0 AND NOT post THEN v2
      |      ELSE 0 END)
      |    / sum(CASE WHEN variant = 0 AND NOT post THEN 1 ELSE 0 END))
      |    AS BIGINT) AS mean_c_pre4,
      |  CAST(round(1e4 * sum(CASE WHEN variant = 0 AND post THEN v2
      |      ELSE 0 END)
      |    / sum(CASE WHEN variant = 0 AND post THEN 1 ELSE 0 END))
      |    AS BIGINT) AS mean_c_post4,
      |  CAST(round(1e4 * sum(CASE WHEN variant = 1 AND NOT post THEN v2
      |      ELSE 0 END)
      |    / sum(CASE WHEN variant = 1 AND NOT post THEN 1 ELSE 0 END))
      |    AS BIGINT) AS mean_t_pre4,
      |  CAST(round(1e4 * sum(CASE WHEN variant = 1 AND post THEN v2
      |      ELSE 0 END)
      |    / sum(CASE WHEN variant = 1 AND post THEN 1 ELSE 0 END))
      |    AS BIGINT) AS mean_t_post4,
      |  CAST(round(1e4 * ((CAST(sum(CASE WHEN variant = 1 AND post
      |        THEN v2 ELSE 0 END) AS DOUBLE)
      |      / sum(CASE WHEN variant = 1 AND post THEN 1 ELSE 0 END)
      |    - CAST(sum(CASE WHEN variant = 1 AND NOT post THEN v2 ELSE 0
      |        END) AS DOUBLE)
      |      / sum(CASE WHEN variant = 1 AND NOT post THEN 1 ELSE 0 END))
      |    - (CAST(sum(CASE WHEN variant = 0 AND post THEN v2 ELSE 0 END)
      |        AS DOUBLE)
      |      / sum(CASE WHEN variant = 0 AND post THEN 1 ELSE 0 END)
      |    - CAST(sum(CASE WHEN variant = 0 AND NOT post THEN v2 ELSE 0
      |        END) AS DOUBLE)
      |      / sum(CASE WHEN variant = 0 AND NOT post THEN 1 ELSE 0
      |        END)))) AS BIGINT) AS did4
      |FROM m""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val assign = ev.select(col("user_id")).distinct()
      .withColumn("variant",
        pmod(conv(substring(md5(col("user_id").cast("string")), 1, 12),
          16, 10).cast("long"), lit(2L)))
    val dd = ev.agg(
      min(floor(unix_timestamp(col("ts")) / 86400L)).as("mn"),
      max(floor(unix_timestamp(col("ts")) / 86400L)).as("mx"))
    val m = ev.where(col("event_type") === "purchase")
      .join(assign, "user_id")
      .crossJoin(broadcast(dd))
      .select(col("variant"),
        (floor(unix_timestamp(col("ts")) / 86400L)
          >= floor((col("mn") + col("mx") + lit(1L)) / 2L)).as("post"),
        round(col("value") * 100).cast("long").as("v2"))
    Profiling.didEstimate(m, "variant", "post", "v2")
  }

  /** CUPED-adjusted experiment readout (see
    * [[graft.operators.Profiling.cuped]]): per user, x = pre-period
    * purchase cents and y = post-period purchase cents (the q291
    * midpoint split); θ from pooled exact moments; per-variant
    * adjusted means plus the variance-reduction factor ρ². The oracle
    * replays the per-user conditional sums, the 128-bit moment
    * integers, θ, and both grid outputs. */
  val q292 = GQuery("q292_cuped",
    """WITH a AS (
      |  SELECT user_id,
      |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
      |      AS BIGINT) % 2 AS variant
      |  FROM (SELECT DISTINCT user_id FROM events)),
      |dd AS (
      |  SELECT CAST(min(floor(epoch(ts) / 86400)) AS BIGINT) AS mn,
      |    CAST(max(floor(epoch(ts) / 86400)) AS BIGINT) AS mx
      |  FROM events),
      |xy AS (
      |  SELECT a.variant,
      |    CAST(COALESCE(sum(CASE WHEN e.event_type = 'purchase'
      |      AND CAST(floor(epoch(e.ts) / 86400) AS BIGINT)
      |        < CAST(floor((mn + mx + 1) / 2) AS BIGINT)
      |      THEN CAST(round(e.value * 100) AS BIGINT) END), 0) AS BIGINT)
      |      AS x,
      |    CAST(COALESCE(sum(CASE WHEN e.event_type = 'purchase'
      |      AND CAST(floor(epoch(e.ts) / 86400) AS BIGINT)
      |        >= CAST(floor((mn + mx + 1) / 2) AS BIGINT)
      |      THEN CAST(round(e.value * 100) AS BIGINT) END), 0) AS BIGINT)
      |      AS y
      |  FROM events e JOIN a USING (user_id) CROSS JOIN dd
      |  GROUP BY e.user_id, a.variant),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      |  FROM xy),
      |gg AS (
      |  SELECT n,
      |    CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n AS covn,
      |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n AS varxn,
      |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS varyn,
      |    CAST(sx AS DOUBLE) / n AS mx
      |  FROM g),
      |v AS (
      |  SELECT variant, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS vsx, CAST(sum(y) AS BIGINT) AS vsy
      |  FROM xy GROUP BY 1)
      |SELECT v.variant, v.n,
      |  CAST(round(1e4 * CAST(vsy AS DOUBLE) / v.n) AS BIGINT)
      |    AS mean_y4,
      |  CAST(round(1e4 * (CAST(vsy AS DOUBLE) / v.n
      |    - (covn / varxn) * (CAST(vsx AS DOUBLE) / v.n - gg.mx)))
      |    AS BIGINT) AS mean_adj4,
      |  CAST(round(1e4 * covn / varxn) AS BIGINT) AS theta4,
      |  CAST(round(1e4 * covn * covn / (varxn * varyn)) AS BIGINT)
      |    AS var_reduction4
      |FROM v CROSS JOIN gg ORDER BY v.variant""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val assign = ev.select(col("user_id")).distinct()
      .withColumn("variant",
        pmod(conv(substring(md5(col("user_id").cast("string")), 1, 12),
          16, 10).cast("long"), lit(2L)))
    val dd = ev.agg(
      min(floor(unix_timestamp(col("ts")) / 86400L)).as("mn"),
      max(floor(unix_timestamp(col("ts")) / 86400L)).as("mx"))
    val xy = ev.join(assign, "user_id")
      .crossJoin(broadcast(dd))
      .withColumn("day", floor(unix_timestamp(col("ts")) / 86400L))
      .withColumn("mid", floor((col("mn") + col("mx") + lit(1L)) / 2L))
      .groupBy(col("user_id"), col("variant"))
      .agg(
        coalesce(sum(when(col("event_type") === "purchase"
          && col("day") < col("mid"),
          round(col("value") * 100).cast("long"))), lit(0L)).as("x"),
        coalesce(sum(when(col("event_type") === "purchase"
          && col("day") >= col("mid"),
          round(col("value") * 100).cast("long"))), lit(0L)).as("y"))
    Profiling.cuped(xy, "variant", "x", "y").orderBy(col("variant"))
  }

  /** Weight-of-evidence / information value of the event value as a
    * purchase predictor (see [[graft.operators.Profiling.woeIv]],
    * quartile bins): the credit-scoring univariate screen — per
    * equal-frequency value bin, how the purchase/non-purchase odds
    * shift, and the additive IV. The oracle replays the cell spine,
    * the endpoint bin rule, the add-half smoothing, and both
    * grid-snapped ln outputs. */
  val q295 = GQuery("q295_woe_iv",
    """WITH cells AS (
      |  SELECT CAST(round("value" * 1e4) AS BIGINT) AS v,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS p
      |  FROM events WHERE value IS NOT NULL GROUP BY 1),
      |cc AS (
      |  SELECT v, n, p,
      |    CAST(sum(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS hi
      |  FROM cells),
      |tot AS (SELECT CAST(max(hi) AS BIGINT) AS nn FROM cc),
      |bd AS (
      |  SELECT CAST(floor((2 * hi - n - 1) * 4 / (2 * nn)) AS BIGINT)
      |      + 1 AS bin,
      |    CAST(sum(n) AS BIGINT) AS n, CAST(sum(p) AS BIGINT) AS n_pos
      |  FROM cc CROSS JOIN tot GROUP BY 1),
      |gt AS (
      |  SELECT CAST(sum(n_pos) AS DOUBLE) + 0.5 * 4 AS gs_tot,
      |    CAST(sum(n - n_pos) AS DOUBLE) + 0.5 * 4 AS bs_tot
      |  FROM bd),
      |sh AS (
      |  SELECT bin, n, n_pos,
      |    (CAST(n_pos AS DOUBLE) + 0.5) / gs_tot AS gsh,
      |    (CAST(n - n_pos AS DOUBLE) + 0.5) / bs_tot AS bsh
      |  FROM bd CROSS JOIN gt)
      |SELECT bin, n, n_pos,
      |  CAST(round(1e4 * ln(gsh / bsh)) AS BIGINT) AS woe4,
      |  CAST(round(1e6 * (gsh - bsh) * ln(gsh / bsh)) AS BIGINT)
      |    AS iv_part6
      |FROM sh ORDER BY bin""".stripMargin) { (s, dir) =>
    Profiling.woeIv(
        Tables.events(s, dir).where(col("value").isNotNull)
          .select(round(col("value") * 1e4).cast("long").as("v"),
            (col("event_type") === "purchase").as("y")),
        "v", "y", bins = 4)
      .orderBy(col("bin"))
  }

  /** HITS hubs and authorities over the customer→supplier purchase
    * graph (see [[graft.operators.GraphOps.hits]]): broad-basket
    * customers (hubs) vs widely-bought suppliers (authorities), two
    * signals one PageRank cannot split. Every half-step renormalizes
    * by the max on the 1e-6 grid with round-half-up INTEGER division,
    * so the oracle's chained-CTE ladder replays the whole iteration
    * bit-identically. */
  val q297 = {
    val Iters = 3
    def iterCtes(i: Int): String = {
      val ph = if (i == 1) "h0" else s"h${i - 1}"
      s"""ar$i AS (
         |  SELECT e.dst AS id, CAST(sum($ph.s) AS BIGINT) AS sr
         |  FROM e JOIN $ph ON $ph.id = e.src GROUP BY e.dst),
         |am$i AS (SELECT max(sr) AS mx FROM ar$i),
         |a$i AS (
         |  SELECT id, CAST((2000000 * sr + mx) // (2 * mx) AS BIGINT)
         |    AS s
         |  FROM ar$i CROSS JOIN am$i),
         |hr$i AS (
         |  SELECT e.src AS id, CAST(sum(a$i.s) AS BIGINT) AS sr
         |  FROM e JOIN a$i ON a$i.id = e.dst GROUP BY e.src),
         |hm$i AS (SELECT max(sr) AS mx FROM hr$i),
         |h$i AS (
         |  SELECT id, CAST((2000000 * sr + mx) // (2 * mx) AS BIGINT)
         |    AS s
         |  FROM hr$i CROSS JOIN hm$i)""".stripMargin
    }
    GQuery("q297_hits",
      s"""WITH e AS (
         |  SELECT DISTINCT o.o_custkey AS src, l.l_suppkey AS dst
         |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
         |h0 AS (
         |  SELECT DISTINCT src AS id, CAST(1000000 AS BIGINT) AS s
         |  FROM e),
         |${(1 to Iters).map(iterCtes).mkString(",\n")}
         |SELECT id, kind, score6 FROM (
         |  SELECT id, 'hub' AS kind, s AS score6 FROM h$Iters
         |  UNION ALL
         |  SELECT id, 'auth', s FROM a$Iters)
         |ORDER BY kind, score6 DESC, id""".stripMargin) { (s, dir) =>
      val e = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      graft.operators.GraphOps.hits(e, iters = Iters)
        .orderBy(col("kind"), col("score6").desc, col("id"))
    }
  }

  /** Quantile normalization of document lengths across sources (see
    * [[graft.operators.Profiling.quantileNormalize]]): each doc's
    * n_chars is replaced by the CORPUS length at the equivalent
    * within-source rank, giving every source the same marginal
    * distribution — the cross-feed calibration move. The oracle
    * replays the within-source ranks, the corpus value spine with
    * cumulative bounds, the ⌈r·N/m⌉ target rank, and the range
    * lookup. */
  val q287 = GQuery("q287_quantile_normalize",
    """WITH rk AS (
      |  SELECT doc_id, source AS grp, n_chars AS v,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS BIGINT) AS r,
      |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS m
      |  FROM documents),
      |sp AS (
      |  SELECT n_chars AS sv, CAST(count(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1),
      |cm AS (
      |  SELECT sv,
      |    CAST(sum(c) OVER (ORDER BY sv ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS hi,
      |    CAST(sum(c) OVER (ORDER BY sv ROWS UNBOUNDED PRECEDING) - c
      |      AS BIGINT) AS lo
      |  FROM sp),
      |tot AS (SELECT CAST(max(hi) AS BIGINT) AS nn FROM cm)
      |SELECT doc_id, grp, v, cm.sv AS qnorm
      |FROM (
      |  SELECT doc_id, grp, v,
      |    CAST(floor((r * nn + m - 1) / m) AS BIGINT) AS rq
      |  FROM rk CROSS JOIN tot) tq
      |JOIN cm ON rq > lo AND rq <= hi
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Profiling.quantileNormalize(Tables.documents(s, dir),
        "source", "n_chars", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** Benford first-digit audit of `l_extendedprice` (see
    * [[graft.operators.Profiling.benfordDigits]]): leading-digit
    * census vs the published log10(1+1/d) masses, shares and
    * deviations on the 1e-6 grid via round-half-up integer division —
    * the fabricated-data / unit-mixup detector. Both engines compare
    * against the SAME hard-coded integer reference masses (no libm
    * log10 in the hot path on either side). */
  val q304 = GQuery("q304_benford_digits",
    """WITH d AS (
      |  SELECT substr(CAST(CAST(floor(l_extendedprice) AS BIGINT)
      |    AS VARCHAR), 1, 1) AS digit
      |  FROM lineitem
      |  WHERE l_extendedprice IS NOT NULL AND l_extendedprice >= 1),
      |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
      |e(digit, expected6) AS (VALUES
      |  ('1', CAST(301030 AS BIGINT)), ('2', 176091), ('3', 124939),
      |  ('4', 96910), ('5', 79181), ('6', 66947), ('7', 57992),
      |  ('8', 51153), ('9', 45757))
      |SELECT c.digit, c.n,
      |  CAST((2 * 1000000 * c.n + t.total) // (2 * t.total) AS BIGINT)
      |    AS share6,
      |  CAST(e.expected6 AS BIGINT) AS expected6,
      |  CAST((2 * 1000000 * c.n + t.total) // (2 * t.total)
      |    - e.expected6 AS BIGINT) AS dev6
      |FROM c JOIN e USING (digit) CROSS JOIN t
      |ORDER BY c.digit""".stripMargin) { (s, dir) =>
    Profiling.benfordDigits(Tables.lineitem(s, dir), "l_extendedprice")
      .orderBy(col("digit"))
  }

  /** Exact per-type median of purchase-cents (see
    * [[graft.operators.Profiling.exactMedian2]]): division-free
    * `median2` (odd n: 2·middle; even n: sum of the two middle
    * values) — the exact counterpart of the q38b percentile sketch,
    * expressible as one rank window in both engines. */
  val q308 = GQuery("q308_exact_median",
    """WITH v AS (
      |  SELECT event_type AS grp, CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL),
      |r AS (SELECT grp, v,
      |  row_number() OVER (PARTITION BY grp ORDER BY v) AS rn FROM v),
      |n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1)
      |SELECT r.grp, n.n,
      |  CAST(sum(r.v) * (CASE WHEN n.n % 2 = 1 THEN 2 ELSE 1 END)
      |    AS BIGINT) AS median2
      |FROM r JOIN n USING (grp)
      |WHERE (n % 2 = 1 AND rn = (n + 1) // 2)
      |   OR (n % 2 = 0 AND (rn = n // 2 OR rn = n // 2 + 1))
      |GROUP BY r.grp, n.n
      |ORDER BY r.grp""".stripMargin) { (s, dir) =>
    Profiling.exactMedian2(
        Tables.events(s, dir).where(col("value").isNotNull)
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents")),
        "event_type", "cents")
      .orderBy(col("grp"))
  }

  /** Tukey-hinge outlier census of purchase cents per event type (see
    * [[graft.operators.Profiling.tukeyOutliers]]): hinges as exact ×2
    * integers, 1.5·IQR fences compared after multiplying through by 4
    * — box-plot robustness with zero float interpolation; the oracle
    * replays the identical rank arithmetic. */
  val q310 = GQuery("q310_tukey_outliers",
    """WITH v AS (
      |  SELECT event_type AS grp, CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL),
      |r AS (SELECT grp, v,
      |  row_number() OVER (PARTITION BY grp ORDER BY v) AS rn FROM v),
      |n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
      |j AS (SELECT r.grp, r.v, r.rn, n.n, (n.n + 1) // 2 AS nl
      |  FROM r JOIN n USING (grp)),
      |lo AS (
      |  SELECT grp, CAST(sum(v) * (CASE WHEN max(nl) % 2 = 1 THEN 2
      |    ELSE 1 END) AS BIGINT) AS lo2
      |  FROM j WHERE rn <= nl
      |    AND (nl % 2 = 1 AND rn = (nl + 1) // 2
      |      OR nl % 2 = 0 AND (rn = nl // 2 OR rn = nl // 2 + 1))
      |  GROUP BY 1),
      |hi AS (
      |  SELECT grp, CAST(sum(v) * (CASE WHEN max(nl) % 2 = 1 THEN 2
      |    ELSE 1 END) AS BIGINT) AS hi2
      |  FROM (SELECT grp, v, n - rn + 1 AS hr, nl FROM j) h
      |  WHERE hr <= nl
      |    AND (nl % 2 = 1 AND hr = (nl + 1) // 2
      |      OR nl % 2 = 0 AND (hr = nl // 2 OR hr = nl // 2 + 1))
      |  GROUP BY 1)
      |SELECT j.grp, CAST(max(j.n) AS BIGINT) AS n,
      |  max(lo.lo2) AS lo_hinge2, max(hi.hi2) AS hi_hinge2,
      |  CAST(sum(CASE WHEN 4 * j.v < 5 * lo.lo2 - 3 * hi.hi2
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
      |  CAST(sum(CASE WHEN 4 * j.v > 5 * hi.hi2 - 3 * lo.lo2
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      |FROM j JOIN lo USING (grp) JOIN hi USING (grp)
      |GROUP BY j.grp
      |ORDER BY j.grp""".stripMargin) { (s, dir) =>
    Profiling.tukeyOutliers(
        Tables.events(s, dir).where(col("value").isNotNull)
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents")),
        "event_type", "cents")
      .orderBy(col("grp"))
  }

  /** 5%-trimmed mean of purchase cents per event type (see
    * [[graft.operators.Profiling.trimmedMean]]): rank-trimmed,
    * round-half-up integer mean — the robust location companion to
    * the q310 fences. */
  val q311 = GQuery("q311_trimmed_mean",
    """WITH v AS (
      |  SELECT event_type AS grp, CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL),
      |r AS (SELECT grp, v,
      |  row_number() OVER (PARTITION BY grp ORDER BY v) AS rn FROM v),
      |n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1)
      |SELECT r.grp, CAST(max(n.n) AS BIGINT) AS n,
      |  CAST(count(*) AS BIGINT) AS n_trimmed,
      |  CAST((2 * sum(r.v) + count(*)) // (2 * count(*)) AS BIGINT)
      |    AS tmean
      |FROM r JOIN n USING (grp)
      |WHERE r.rn > (n.n * 5) // 100 AND r.rn <= n.n - (n.n * 5) // 100
      |GROUP BY r.grp
      |ORDER BY r.grp""".stripMargin) { (s, dir) =>
    Profiling.trimmedMean(
        Tables.events(s, dir).where(col("value").isNotNull)
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents")),
        "event_type", "cents", pct = 5)
      .orderBy(col("grp"))
  }

  /** Referential-integrity conformance census (see
    * [[graft.operators.Profiling.fkOrphans]]): child rows, null keys,
    * and orphans for the schema's four foreign keys — the governance
    * staple every warehouse load gate runs. */
  val q314 = GQuery("q314_fk_conformance",
    """WITH f AS (
      |  SELECT 'lineitem.l_orderkey->orders' AS fk,
      |    CAST(count(*) AS BIGINT) AS n_child,
      |    CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_null,
      |    CAST(sum(CASE WHEN l_orderkey IS NOT NULL AND NOT EXISTS (
      |      SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan
      |  FROM lineitem l
      |  UNION ALL
      |  SELECT 'lineitem.l_partkey->part',
      |    CAST(count(*) AS BIGINT),
      |    CAST(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END)
      |      AS BIGINT),
      |    CAST(sum(CASE WHEN l_partkey IS NOT NULL AND NOT EXISTS (
      |      SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
      |      THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem l
      |  UNION ALL
      |  SELECT 'lineitem.l_suppkey->supplier',
      |    CAST(count(*) AS BIGINT),
      |    CAST(sum(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END)
      |      AS BIGINT),
      |    CAST(sum(CASE WHEN l_suppkey IS NOT NULL AND NOT EXISTS (
      |      SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
      |      THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem l
      |  UNION ALL
      |  SELECT 'orders.o_custkey->customer',
      |    CAST(count(*) AS BIGINT),
      |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
      |      AS BIGINT),
      |    CAST(sum(CASE WHEN o_custkey IS NOT NULL AND NOT EXISTS (
      |      SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |      THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM orders o)
      |SELECT fk, n_child, n_null, n_orphan FROM f
      |ORDER BY fk""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    Profiling.fkOrphans("lineitem.l_orderkey->orders",
        li, "l_orderkey", Tables.orders(s, dir), "o_orderkey")
      .unionByName(Profiling.fkOrphans("lineitem.l_partkey->part",
        li, "l_partkey", Tables.part(s, dir), "p_partkey"))
      .unionByName(Profiling.fkOrphans("lineitem.l_suppkey->supplier",
        li, "l_suppkey", Tables.supplier(s, dir), "s_suppkey"))
      .unionByName(Profiling.fkOrphans("orders.o_custkey->customer",
        Tables.orders(s, dir), "o_custkey",
        Tables.customer(s, dir), "c_custkey"))
      .orderBy(col("fk"))
  }

  /** Exact nearest-rank P50/P90/P99 of purchase cents per event type
    * (see [[graft.operators.Profiling.nearestRankQuantiles]]): the
    * order-statistic tail readout — always an actual observation, so
    * no interpolation convention can drift between engines. */
  val q321 = GQuery("q321_nearest_rank_quantiles",
    """WITH v AS (
      |  SELECT event_type AS grp, CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL),
      |r AS (SELECT grp, v,
      |  row_number() OVER (PARTITION BY grp ORDER BY v) AS rn FROM v),
      |n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
      |ps(p) AS (VALUES (CAST(50 AS BIGINT)), (90), (99))
      |SELECT r.grp, ps.p, n.n, r.v AS value
      |FROM r JOIN n USING (grp) CROSS JOIN ps
      |WHERE r.rn = (n.n * ps.p + 99) // 100
      |ORDER BY r.grp, ps.p""".stripMargin) { (s, dir) =>
    Profiling.nearestRankQuantiles(
        Tables.events(s, dir).where(col("value").isNotNull)
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents")),
        "event_type", "cents", Seq(50, 90, 99))
      .orderBy(col("grp"), col("p"))
  }

  /** Ship lead-time SLA percentiles per order priority: exact
    * nearest-rank P50/P90/P99 of (l_shipdate − o_orderdate) days —
    * the [[graft.operators.Profiling.nearestRankQuantiles]] readout
    * on the relational join, integer day arithmetic end to end. */
  val q326 = GQuery("q326_leadtime_quantiles",
    """WITH lt AS (
      |  SELECT o.o_orderpriority AS grp,
      |    CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
      |      AS v
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
      |r AS (SELECT grp, v,
      |  row_number() OVER (PARTITION BY grp ORDER BY v) AS rn FROM lt),
      |n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM lt GROUP BY 1),
      |ps(p) AS (VALUES (CAST(50 AS BIGINT)), (90), (99))
      |SELECT r.grp, ps.p, n.n, r.v AS value
      |FROM r JOIN n USING (grp) CROSS JOIN ps
      |WHERE r.rn = (n.n * ps.p + 99) // 100
      |ORDER BY r.grp, ps.p""".stripMargin) { (s, dir) =>
    val lt = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
          .as("days"))
    Profiling.nearestRankQuantiles(lt, "o_orderpriority", "days",
        Seq(50, 90, 99))
      .orderBy(col("grp"), col("p"))
  }

  /** Supplier-concentration (Herfindahl) band census per part: HHI on
    * the 1e-4 grid from pure integer quantity sums —
    * hhi4 = rhu(1e4·Σq²ᵢ / (Σqᵢ)²) — bucketed into 0.1-wide bands.
    * The market-structure profile of the supply base: band 10 =
    * single-sourced parts, low bands = well-diversified. */
  val q327 = GQuery("q327_supplier_hhi",
    """WITH s AS (
      |  SELECT l_partkey AS pk, l_suppkey AS sk,
      |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem GROUP BY 1, 2),
      |p AS (SELECT pk, CAST(sum(q) AS BIGINT) AS t,
      |  CAST(sum(q * q) AS BIGINT) AS sq2 FROM s GROUP BY 1),
      |h AS (SELECT pk,
      |  CAST((2 * 10000 * sq2 + t * t) // (2 * t * t) AS BIGINT)
      |    AS hhi4 FROM p)
      |SELECT hhi4 // 1000 AS band, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(min(hhi4) AS BIGINT) AS min_hhi4,
      |  CAST(max(hhi4) AS BIGINT) AS max_hhi4
      |FROM h GROUP BY 1
      |ORDER BY band""".stripMargin) { (s, dir) =>
    val sup = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(sum(round(col("l_quantity")).cast("long")).as("q"))
    sup.groupBy(col("pk"))
      .agg(sum(col("q")).as("t"), sum(col("q") * col("q")).as("sq2"))
      .select(expr("(2 * 10000 * sq2 + t * t) div (2 * t * t)")
        .as("hhi4"))
      .groupBy(expr("hhi4 div 1000").as("band"))
      .agg(count(lit(1)).as("n_parts"), min(col("hhi4")).as("min_hhi4"),
        max(col("hhi4")).as("max_hhi4"))
      .orderBy(col("band"))
  }

  /** Recursive-hierarchy rollup (VERDICT r8 #8's named gap — a plan
    * shape the registry lacked: bounded-depth iteration over
    * AGGREGATES, the org-chart/BOM workload): suppliers form a
    * parent-pointer forest by decimal prefix (parent = suppkey÷10,
    * suppkey 0 the root), and every node reports the COUNT and exact
    * cent SUM of account balances over its whole subtree — computed by
    * [[graft.operators.GraphOps.subtreeAggregate]]'s child-fold
    * iteration and replayed by the oracle as a recursive-CTE
    * transitive closure + group-by-root. */
  val q328 = GQuery("q328_subtree_rollup",
    """WITH RECURSIVE sup AS (
      |  SELECT s_suppkey AS id,
      |    CASE WHEN s_suppkey = 0 THEN NULL
      |         ELSE s_suppkey // 10 END AS parent,
      |    CAST(round(s_acctbal * 100) AS BIGINT) AS bal_c
      |  FROM supplier),
      |cl AS (
      |  SELECT id AS root, id AS node FROM sup
      |  UNION ALL
      |  SELECT cl.root, s.id FROM cl JOIN sup s ON s.parent = cl.node)
      |SELECT cl.root AS s_suppkey,
      |  CAST(count(*) AS BIGINT) AS n_subtree,
      |  CAST(sum(s.bal_c) AS BIGINT) AS subtree_bal_c
      |FROM cl JOIN sup s ON s.id = cl.node
      |GROUP BY 1
      |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    val nodes = Tables.supplier(s, dir).select(
      col("s_suppkey").as("id"),
      when(col("s_suppkey") === 0L, lit(null).cast("long"))
        .otherwise(expr("s_suppkey div 10")).as("parent"),
      round(col("s_acctbal") * 100).cast("long").as("value"))
    graft.operators.GraphOps.subtreeAggregate(nodes)
      .select(col("id").as("s_suppkey"), col("n_subtree"),
        col("subtree_sum").as("subtree_bal_c"))
      .orderBy(col("s_suppkey"))
  }

  /** Exploded bill-of-materials cost (the WEIGHTED face of q328's
    * rollup): every edge carries a quantity, and a descendant's value
    * enters its ancestor's total multiplied by the PRODUCT of the
    * quantities along the path — "3 axles per truck × 5 bolts per
    * axle" — via [[graft.operators.GraphOps.subtreeAggregate]]'s
    * `qtyCol` fold. The oracle's recursive CTE carries the running
    * multiplier down the closure, so the distributed child-fold and
    * the textbook path-product provably agree. */
  val q330 = GQuery("q330_bom_explosion",
    """WITH RECURSIVE sup AS (
      |  SELECT s_suppkey AS id,
      |    CASE WHEN s_suppkey = 0 THEN NULL
      |         ELSE s_suppkey // 10 END AS parent,
      |    s_suppkey % 3 + 1 AS qty,
      |    CAST(round(s_acctbal * 100) AS BIGINT) AS bal_c
      |  FROM supplier),
      |cl AS (
      |  SELECT id AS root, id AS node, CAST(1 AS BIGINT) AS mult
      |  FROM sup
      |  UNION ALL
      |  SELECT cl.root, s.id, cl.mult * s.qty
      |  FROM cl JOIN sup s ON s.parent = cl.node)
      |SELECT cl.root AS s_suppkey,
      |  CAST(count(*) AS BIGINT) AS n_subtree,
      |  CAST(sum(cl.mult * s.bal_c) AS BIGINT) AS exploded_cost_c
      |FROM cl JOIN sup s ON s.id = cl.node
      |GROUP BY 1
      |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    val nodes = Tables.supplier(s, dir).select(
      col("s_suppkey").as("id"),
      when(col("s_suppkey") === 0L, lit(null).cast("long"))
        .otherwise(expr("s_suppkey div 10")).as("parent"),
      expr("s_suppkey % 3 + 1").as("qty"),
      round(col("s_acctbal") * 100).cast("long").as("value"))
    graft.operators.GraphOps.subtreeAggregate(nodes, qtyCol = Some("qty"))
      .select(col("id").as("s_suppkey"), col("n_subtree"),
        col("subtree_sum").as("exploded_cost_c"))
      .orderBy(col("s_suppkey"))
  }

  /** Streaming hierarchy maintenance under reorg churn (the
    * INCREMENTAL face of q328 — [[graft.streaming.Pipelines
    * .hierarchyIngestStream]]): the supplier prefix tree streams in as
    * inserts, then three churn batches hit it — value restatements
    * (key%7=3 gains 1000), skip-a-level reparents (key%13=4 moves
    * under its grandparent, SUBTREES ride along), and combined
    * reparent+restatement events (key%11=7 moves under key/1000 with
    * value +key%5, overwriting earlier restatements) — each batch
    * propagating deltas up the post-batch ancestor chains only, never
    * re-walking the tree. The read-out must equal a from-scratch
    * recursive-CTE rollup over the FINAL pointer forest, which the
    * oracle reconstructs with the same CASE logic (later batches win). */
  val q332 = GQuery("q332_streaming_subtree_maintenance",
    """WITH RECURSIVE sup AS (
      |  SELECT s_suppkey AS id,
      |    CASE WHEN s_suppkey = 0 THEN NULL
      |         WHEN s_suppkey % 11 = 7 AND s_suppkey >= 2
      |           THEN s_suppkey // 1000
      |         WHEN s_suppkey % 13 = 4 AND s_suppkey >= 2
      |           THEN s_suppkey // 100
      |         ELSE s_suppkey // 10 END AS parent,
      |    CAST(round(s_acctbal * 100) AS BIGINT)
      |      + CASE WHEN s_suppkey % 11 = 7 AND s_suppkey >= 2
      |             THEN s_suppkey % 5
      |             WHEN s_suppkey % 7 = 3 THEN 1000
      |             ELSE 0 END AS bal_c
      |  FROM supplier),
      |cl AS (
      |  SELECT id AS root, id AS node FROM sup
      |  UNION ALL
      |  SELECT cl.root, s.id FROM cl JOIN sup s ON s.parent = cl.node)
      |SELECT cl.root AS s_suppkey,
      |  CAST(count(*) AS BIGINT) AS n_subtree,
      |  CAST(sum(s.bal_c) AS BIGINT) AS subtree_bal_c
      |FROM cl JOIN sup s ON s.id = cl.node
      |GROUP BY 1
      |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    import graft.streaming.Pipelines
    val store = java.nio.file.Files
      .createTempDirectory("q332_hier").toString
    val ingest = Pipelines.hierarchyIngestStream(store, buckets = 16)()
    val sup = Tables.supplier(s, dir).select(
      col("s_suppkey").as("id"),
      when(col("s_suppkey") === 0L, lit(null).cast("long"))
        .otherwise(expr("s_suppkey div 10")).as("parent"),
      round(col("s_acctbal") * 100).cast("long").as("value"))
    // batch 0: the whole forest as inserts
    ingest(sup, 0L)
    // batch 1: value restatements
    ingest(sup.where(expr("id % 7 = 3"))
      .select(col("id"), col("parent"),
        (col("value") + 1000L).as("value")), 1L)
    // batch 2: skip-a-level reparents (events carry the current value)
    ingest(sup.where(expr("id % 13 = 4 and id >= 2"))
      .select(col("id"), expr("id div 100").as("parent"),
        (col("value") + when(expr("id % 7 = 3"), 1000L).otherwise(0L))
          .as("value")), 2L)
    // batch 3: reparent + restatement in ONE event (latest wins)
    ingest(sup.where(expr("id % 11 = 7 and id >= 2"))
      .select(col("id"), expr("id div 1000").as("parent"),
        (col("value") + expr("id % 5")).as("value")), 3L)
    Pipelines.hierStoreAggregates(s, store)
      .select(col("id").as("s_suppkey"), col("n_subtree"),
        col("subtree_sum").as("subtree_bal_c"))
      .orderBy(col("s_suppkey"))
  }

  val all: Seq[GQuery] =
    Seq(q179, q180, q182, q183, q184, q194, q195, q196, q208, q211, q212,
      q215, q217, q221, q224, q228, q238, q243, q249, q259, q269,
      q270, q273, q274, q275, q276, q279, q285, q287, q289, q291, q292,
      q295, q297, q304, q308, q310, q311, q314, q321, q326, q327, q328,
      q330, q332)
}
