package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for training pipelines: fixed-size word windows
  * with overlap (stride = size − overlap). Pure column expressions —
  * the explode multiplies rows by ~len/stride, with no shuffle until
  * whatever consumes the chunks.
  *
  * Trailing windows that add no new words beyond the previous chunk's
  * overlap (len − start ≤ overlap) are dropped, except the first chunk.
  */
object Chunking {

  def chunkWords(df: DataFrame, idCol: String, textCol: String,
                 size: Int, overlap: Int): DataFrame = {
    require(size > overlap && overlap >= 0, "need size > overlap >= 0")
    val stride = size - overlap
    df.select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("ws"))
      .where(size_(col("ws")) > 0)
      .select(col("id"), col("ws"),
        explode(sequence(lit(0), size_(col("ws")) - 1, lit(stride))).as("start"))
      .where(col("start") === 0 || size_(col("ws")) - col("start") > overlap)
      .select(col("id"),
        (col("start") / stride).cast("int").as("chunk_id"),
        concat_ws(" ", slice(col("ws"), col("start") + 1, lit(size))).as("chunk"),
        least(lit(size), size_(col("ws")) - col("start")).cast("int").as("n_words"))
  }

  private def size_(c: org.apache.spark.sql.Column) = org.apache.spark.sql.functions.size(c)
}
