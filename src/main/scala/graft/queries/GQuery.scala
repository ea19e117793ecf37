package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query with an optional DuckDB oracle.
  *
  * Contract (driver): the oracle SQL runs in DuckDB against views named
  * after the parquet tables; the driver sorts columns by name and hashes
  * values, so every computed column must carry the SAME alias on both
  * sides, floating-point aggregates are rounded on both sides, and both
  * sides ORDER BY a full deterministic key.
  */
final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object GQuery {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): GQuery =
    GQuery(name, run, Some(oracle))

  /** Query with no SQL-expressible oracle (driver does a rows-only check). */
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): GQuery =
    GQuery(name, run, None)
}
