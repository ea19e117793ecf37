package graft.queries

import graft.Tables
import graft.operators.Sampling
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

  val all: Seq[GQuery] = Seq(q44, q45)
}
