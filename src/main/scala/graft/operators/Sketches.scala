package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, built
  * into Spark as `hll_sketch_agg`/`hll_union_agg`): the incremental
  * corpus-statistics pattern. Sketch each partition/source/batch ONCE
  * into a few-KB binary, persist the sketches, and answer
  * corpus-wide or sliced distinct-count questions by UNIONING sketches
  * — never by re-scanning the corpus. HLL union is lossless (same
  * lgK ⇒ merging per-part sketches gives the BIT-IDENTICAL sketch of
  * the whole), so the incremental path and the full-scan path agree
  * exactly, which `SketchSpec` asserts.
  *
  * At 100 TB: the sketch table is (slices × ~KB) — a pipeline appends
  * one row per ingested batch and every report reads only that table;
  * re-slicing (per-source → global) is a sketch-side aggregate over
  * KBs, not a corpus shuffle.
  */
object Sketches {

  private val LgK = 12   // 2^12 registers ≈ ±1.6% rel. std. error, 4 KB

  /** One HLL sketch of `valueCol`'s distinct values per `keyCol` group:
    * (key, sketch binary, estimate). One hash-agg pass, map-side
    * partial sketches merged on the reduce side. */
  def distinctSketch(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.groupBy(col(keyCol).as("key"))
      .agg(hll_sketch_agg(col(valueCol), LgK).as("sketch"))
      .withColumn("estimate", hll_sketch_estimate(col("sketch")))

  /** Union a sketch table down to one row: (estimate). The
    * incremental-report path — input is the persisted sketch table,
    * never the corpus. */
  def unionEstimate(sketches: DataFrame): DataFrame =
    sketches
      .agg(hll_union_agg(col("sketch"), false).as("merged"))
      .select(hll_sketch_estimate(col("merged")).as("estimate"))

  /** Distinct-token sketch per document source — the data-card column
    * ([[TextStats]] family) computed sketch-first so per-source AND
    * corpus-wide vocabulary sizes come from the same persisted
    * sketches. Input is the shared tokenized frame joined to sources. */
  def tokenSketchBySource(toks: DataFrame, sources: DataFrame): DataFrame =
    distinctSketch(
      toks.join(sources, "id")
        .select(col("source"), explode(col("ws")).as("tok")),
      "source", "tok")
}
