package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Word-level vocabulary induction and token-id encoding — the
  * "numericalize" stage a training pipeline runs between curation and
  * packing: fix a vocabulary from the corpus census, map every token to
  * a dense integer id (0 = OOV/unk), and hand the loader integer
  * sequences instead of strings.
  *
  * Scale shape: the census is ONE shuffle on the word key with map-side
  * partial counts; the vocabulary itself is top-`vocabSize` via
  * `orderBy.limit` (TakeOrdered — per-partition heaps + driver merge,
  * no global sort) and is model-sized state exactly like the IVF
  * centroids or the BPE census, so it broadcasts back onto the token
  * stream and encoding is a pure map — the corpus never shuffles to be
  * encoded.
  */
object Vocab {

  /** Build the top-`vocabSize` vocabulary from a [[TextStats.tokenized]]
    * `(id, ws)` frame: words ranked by (count DESC, word ASC) — the same
    * contractual tie-break as the BPE census — with contiguous ids
    * 1..V assigned by that rank. Id 0 is reserved for OOV.
    *
    * The `row_number` window is partition-less but runs AFTER the
    * `limit(vocabSize)` — it orders at most `vocabSize` rows (the same
    * bounded post-limit rank-frame class as the top-k report queries),
    * never the corpus.
    */
  def buildFromTokens(toks: DataFrame, vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, "vocabSize must be >= 1")
    toks
      .select(explode(col("ws")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(vocabSize)
      .withColumn("wid",
        row_number()
          .over(Window.orderBy(col("cnt").desc, col("word").asc))
          .cast("long"))
  }

  /** Encode the token stream against `vocab` (a [[buildFromTokens]]
    * frame) and report per-document id-sequence statistics: token
    * count, OOV count, and an order-sensitive checksum
    * `sum((pos + 1) * wid)` over the encoded sequence (OOV contributes
    * 0). The checksum pins the EXACT id at the exact position — two
    * docs with permuted ids disagree — so an oracle can verify the full
    * encoding without comparing array columns.
    *
    * The vocabulary is explicitly broadcast (model-sized by
    * construction); encoding is a map-side hash-join + one per-doc
    * aggregate — the only exchange is the doc-keyed combine.
    */
  def encodeStats(toks: DataFrame, vocab: DataFrame): DataFrame = {
    val words = toks
      .where(size(col("ws")) >= 1)
      .select(col("id"), posexplode(col("ws")))
      .toDF("id", "pos", "word")
    words
      .join(broadcast(vocab.select(col("word"), col("wid"))),
        Seq("word"), "left")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("wid").isNull, 1L).otherwise(0L)).as("n_unk"),
        sum((col("pos") + lit(1)).cast("long") * coalesce(col("wid"), lit(0L)))
          .as("id_checksum"))
  }
}
