package graft.queries

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{Packing, Sampling}
import org.apache.spark.sql.functions._

/** Deterministic sampling surface — reproducible in any engine with md5
  * (the point: sampling decisions at 100 TB must be auditable and
  * re-derivable, not RNG state). */
object SamplingQueries {

  private val bkt = Sampling.hashBucketSql("doc_id", 100)

  /** ~20% deterministic sample of documents by doc_id hash. */
  val q44 = GQuery("q44_hash_sample",
    s"""SELECT doc_id, lang
       |FROM documents
       |WHERE $bkt < 20
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Sampling.deterministicSample(Tables.documents(s, dir), "doc_id", 20)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Train/test split sizes per language (90/10 by key hash). */
  val q45 = GQuery("q45_train_test_split",
    s"""SELECT lang,
       |  CASE WHEN $bkt < 10 THEN 'test' ELSE 'train' END AS split,
       |  count(*) AS n_docs
       |FROM documents
       |GROUP BY lang, split
       |ORDER BY lang, split""".stripMargin) { (s, dir) =>
    Sampling.trainTestSplit(Tables.documents(s, dir), "doc_id", 10)
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("split"))
  }

  /** Sequence packing into fixed token-budget shards via the two-phase
    * distributed prefix sum (see [[graft.operators.Packing]]); the
    * oracle recomputes it with DuckDB's sequential window — integer
    * token sums make the two bit-identical. */
  val q49 = {
    val MaxTok = 4096L
    GQuery("q49_pack_shards",
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |packed AS (
         |  SELECT doc_id, n_tokens,
         |    ${Packing.shardIdSql("doc_id", "n_tokens", MaxTok)} AS shard_id
         |  FROM toks)
         |SELECT shard_id, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  round(CAST(sum(n_tokens) AS DOUBLE) / $MaxTok, 4) AS fill_ratio
         |FROM packed GROUP BY shard_id
         |ORDER BY shard_id""".stripMargin) { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      val packed = Packing.packByTokenBudget(toks, "doc_id", "n_tokens", MaxTok)
      Packing.shardSummary(packed, "n_tokens", MaxTok)
        .orderBy(col("shard_id"))
    }
  }

  /** Weighted training mixture: per-language keep rates applied through
    * the same deterministic hash buckets (en 80%, de 40%, rest 10%). */
  val q50 = GQuery("q50_mixture_sample",
    s"""SELECT lang, count(*) AS n_docs
       |FROM documents
       |WHERE $bkt < CASE lang WHEN 'en' THEN 80 WHEN 'de' THEN 40 ELSE 10 END
       |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    Sampling.stratifiedSample(Tables.documents(s, dir), "doc_id", "lang",
        Map("en" -> 80, "de" -> 40), defaultPct = 10)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"))
  }

  /** Deterministic k-per-group sample: the md5-ordered first 20 docs of
    * every language — RNG-free group-wise subsampling (the per-stratum
    * counterpart of q50's rate-based mixture). */
  val q57 = GQuery("q57_group_sample",
    """SELECT doc_id, lang, CAST(rn AS INTEGER) AS rn FROM (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 20
      |ORDER BY lang, doc_id""".stripMargin) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), row_number().over(w).as("rn"))
      .where(col("rn") <= 20)
      .orderBy(col("lang"), col("doc_id"))
  }

  val all: Seq[GQuery] = Seq(q44, q45, q49, q50, q57)
}
