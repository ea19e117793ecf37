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
  */
object SkewJoin {

  def saltedEquiJoin(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = left.withColumn("__salt_l",
      (abs(hash(monotonically_increasing_id())) % salts).cast("int"))
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
    df.withColumn("__salt",
        (abs(hash(monotonically_increasing_id())) % salts).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n_rows"))
}
