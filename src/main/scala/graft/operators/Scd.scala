package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history building — the
  * warehouse-side counterpart of [[Dedup.snapshotDiff]]: instead of
  * reporting WHAT changed between two snapshots, compress a stack of
  * N snapshots into per-key validity intervals, the table every
  * point-in-time join consumes. The reference has no dimension
  * management at all (SURVEY.md §2.2 extension surface); this is the
  * standard Kimball SCD2 shape re-expressed as keyed windows.
  *
  * Scale: everything is keyed by the dimension key — one shuffle, and
  * every window partition is bounded by the number of SNAPSHOTS of one
  * key (not rows of the corpus). No global sort, no self-join; a
  * 100 TB fact table never enters this operator, only the dimension
  * snapshots do.
  */
object Scd {

  /** Compress `(key, snapTs, attrs…)` snapshot rows into SCD2 validity
    * intervals `(key, attrs…, valid_from, valid_to)`: consecutive
    * snapshots with unchanged attributes merge into one interval;
    * `valid_to` is the next change's `valid_from`, null while current.
    * Attribute comparison is null-safe (`<=>`): a null attribute equal
    * on both sides does NOT open a new interval, while the first
    * snapshot of a key always does.
    *
    * Requires one row per (key, snapTs) — same uniqueness contract as
    * [[AsOfJoin.leftAsOf]]'s right side, for the same ambiguity
    * reason. */
  def scd2Build(snaps: DataFrame, keyCol: String, snapCol: String,
                attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2Build needs at least one attribute")
    val wk = Window.partitionBy(col(keyCol)).orderBy(col(snapCol))
    // change flag: any attribute differs from the previous snapshot
    // (lag over an empty frame is null, and null <=> v is false, so the
    // first snapshot of every key starts an island)
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(wk)))
      .reduce(_ || _)
    val islands = snaps
      .withColumn("__chg", when(changed, 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__chg"))
        .over(wk.rowsBetween(Window.unboundedPreceding, 0)))
    // one interval per island: attrs are constant within it by
    // construction, so they ride the groupBy key
    val grouped = islands
      .groupBy(col(keyCol) +: col("__isl") +: attrCols.map(col): _*)
      .agg(min(col(snapCol)).as("valid_from"))
      .drop("__isl")
    val wv = Window.partitionBy(col(keyCol)).orderBy(col("valid_from"))
    grouped.withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
  }

  /** Point-in-time lookup of an SCD2 dimension built by [[scd2Build]]:
    * each fact row gets the dimension attributes valid AT its
    * timestamp. Because the intervals tile each key's timeline
    * (`valid_to` = next `valid_from`), the interval containment join
    * is exactly an as-of join on `valid_from` — so this delegates to
    * [[AsOfJoin.leftAsOf]] and inherits its single-shuffle,
    * no-pair-blowup 100 TB plan. Facts before the first snapshot get
    * null attributes (left semantics). */
  def pointInTimeJoin(facts: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String, factTs: String,
                      attrCols: Seq[String]): DataFrame =
    AsOfJoin.leftAsOf(facts, dim.drop("valid_to"), factKey, dimKey,
      factTs, "valid_from", attrCols)
}
