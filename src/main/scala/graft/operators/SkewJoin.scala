package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for joins whose hot keys overwhelm a single
  * shuffle partition. AQE's skew-join splitting handles sort-merge
  * cases automatically; this operator is for the planned-ahead variant —
  * e.g. a fact-fact join where one key is 1000× hotter than the median —
  * and for engines/configs where AQE can't help (broadcast-ineligible
  * dimension replicated against a salted fact).
  *
  * Technique: append a salt in [0, salts) to the skewed (left) side's
  * key; replicate each right-side row once per salt value; join on
  * (key, salt). Each hot key now spreads over `salts` partitions.
  * Cost: right side is duplicated `salts`× — use only when
  * |right| · salts ≪ |left|'s hot-key mass.
  *
  * The salt is content-derived — pmod(hash(payload) + partition id,
  * salts) — never `monotonically_increasing_id()`/`rand()`: a
  * nondeterministic salt changes row lineage between stage retries,
  * which can double- or zero-count rows when a post-shuffle stage is
  * recomputed. Identical rows within one input partition share a salt;
  * that costs a little spread on pathological constant data, nothing on
  * real data.
  */
object SkewJoin {

  /** Join types where salting is sound. Replicating the right side
    * `salts`× would emit unmatched right rows once per salt under
    * right/full-outer (and misstate right-side existence checks), so
    * only left-oriented types are accepted. */
  private val saltableJoinTypes =
    Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")

  private def saltCol(df: DataFrame, salts: Int) =
    pmod(hash((df.columns.toIndexedSeq.map(col) :+ spark_partition_id()): _*),
      lit(salts))

  def saltedEquiJoin(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val jt = joinType.toLowerCase.replace("_", "")
    require(saltableJoinTypes.map(_.replace("_", "")).contains(jt),
      s"saltedEquiJoin supports inner/left/left_semi/left_anti, got '$joinType' " +
        "(right/full outer would duplicate unmatched right rows once per salt)")
    val salted = left.withColumn("__salt_l", saltCol(left, salts))
    val replicated = right.withColumn("__salt_r",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        col("__salt_l") === col("__salt_r") &&
          col(leftKey) === col(rightKey), joinType)
      .drop("__salt_l", "__salt_r")
  }

  /** Two-phase skew-proof aggregation: partial aggregate on
    * (key, salt) — spreading hot keys — then final aggregate on key.
    * For algebraic aggregates (sum/count/min/max) this is exact. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     salts: Int): DataFrame =
    df.withColumn("__salt", saltCol(df, salts))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n_rows"))
}
