package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-series) join — an operator Spark lacks natively.
  *
  * For each left row, attach the most recent right row with
  * `right.ts <= left.ts` and matching key (a right row at exactly
  * `left.ts` counts). The reference has no such operator (SURVEY.md
  * §2.2); this is part of the mandated analytics surface.
  *
  * Strategy: rather than a range join (O(|L|·|R|) per key before
  * pruning), union both sides and compute a running `last(_, ignoreNulls)`
  * over one (key, time) sort — a single shuffle and an O(n log n) sort
  * per key. This is the plan that survives 100 TB: the shuffle is on the
  * join key (same as any equi-join would need) and no intermediate pair
  * blow-up exists. Skewed keys are handled by AQE skew-split since the
  * window partition is the shuffle partition.
  *
  * Requirement: right must be unique per (key, ts) — pre-aggregate with
  * e.g. `max_by` if not (ties inside the right at one instant are
  * otherwise ambiguous in ANY as-of semantics, including DuckDB's).
  */
object AsOfJoin {

  /** @param rightPayload right columns to carry (must not collide with
    *                     left column names)
    * @param toleranceMs  optional max age: a right row older than this
    *                     many milliseconds before the left timestamp is
    *                     treated as no-match (payload nulled) — the
    *                     "as-of within" variant every time-series store
    *                     offers
    * @param inner        drop left rows with no as-of match instead of
    *                     keeping them with a null payload — DuckDB's
    *                     `ASOF JOIN` default (its LEFT variant is this
    *                     operator's default). A tolerance-expired match
    *                     counts as no-match here too.
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      toleranceMs: Option[Long] = None,
      inner: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightPayload.intersect(leftCols).isEmpty,
      s"right payload collides with left columns: ${rightPayload.intersect(leftCols)}")
    // Keys keep their native type (string/uuid/numeric all partition and
    // compare correctly); a silent cast would NULL out non-numeric keys
    // and collapse every row into one window partition. The two sides
    // must already agree on the key type — casting is the caller's call.
    val lkType = left.schema(leftKey).dataType
    val rkType = right.schema(rightKey).dataType
    require(lkType == rkType,
      s"as-of join key types must match: $leftKey is ${lkType.simpleString}, " +
        s"$rightKey is ${rkType.simpleString} — cast explicitly before joining")

    val payloadStruct: Column = struct(rightPayload.map(col): _*)
    val r = right.select(
      col(rightKey).as("__k"),
      col(rightTs).as("__ts"),
      payloadStruct.as("__rp"),
      lit(0).as("__side"),
      lit(null).cast(left.schema).as("__lp"))
    val rpType = r.schema("__rp").dataType
    val l = left.select(
      col(leftKey).as("__k"),
      col(leftTs).as("__ts"),
      lit(null).cast(rpType).as("__rp"),
      lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__lp"))

    // At equal timestamps the right row sorts first (side 0 < 1) so it is
    // visible to a left row at the same instant — `<=` as-of semantics.
    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // carry the matched right row's timestamp so tolerance can be applied
    val joined = r.unionByName(l)
      .withColumn("__match", last(col("__rp"), ignoreNulls = true).over(w))
      .withColumn("__match_ts",
        last(when(col("__side") === 0, col("__ts")), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    // tolerance units: milliseconds for timestamp columns, the column's
    // own units for numeric time columns
    val isTimestamp = joined.schema("__ts").dataType ==
      org.apache.spark.sql.types.TimestampType
    def asNum(c: org.apache.spark.sql.Column) =
      if (isTimestamp) c.cast("double") * 1000.0 else c.cast("double")
    val withTol = toleranceMs match {
      case Some(tol) => joined.withColumn("__match",
        when(col("__match_ts").isNotNull &&
          asNum(col("__ts")) - asNum(col("__match_ts")) <= tol.toDouble,
          col("__match")).otherwise(lit(null).cast(joined.schema("__match").dataType)))
      case None => joined
    }

    val matched = if (inner) withTol.where(col("__match").isNotNull) else withTol
    val leftOut = leftCols.map(c => col("__lp").getField(c).as(c))
    val rightOut = rightPayload.map(c => col("__match").getField(c).as(c))
    matched.select(leftOut ++ rightOut: _*)
  }
}
