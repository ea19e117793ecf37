package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-shared MATERIALIZED frames: memoized eager `localCheckpoint`
  * per (session, key).
  *
  * The previous sharing mechanism — `.persist` with plan-identical
  * construction — serves every consumer from one cached copy, but each
  * consumer QUERY still embeds the shared frame's full LOGICAL PLAN
  * (tokenize → explode → self-join → …): analysis, optimizer fixpoint,
  * canonicalization for the cache lookup, and AQE's per-stage
  * re-optimization all re-walk that subtree for every query that uses
  * it. Driver thread dumps during the bench showed ~half the wall in
  * exactly those Catalyst walks (TreeNode.transformUp /
  * containsPattern) on the main thread.
  *
  * An eager localCheckpoint truncates the frame to a scan-leaf
  * (LogicalRDD): consumers' plans shrink from hundreds of nodes to the
  * leaf + their own operators, and every driver-side walk gets
  * proportionally cheaper. Contents are identical — the frame is still
  * computed from the parquet inputs once per session, exactly when the
  * persist-based variant would have materialized its cache.
  *
  * At 100 TB this is the same discipline stated on the persist sites:
  * materialize the shared table once per corpus (there: a durable
  * write; here: executor-local blocks) and have every consumer read it
  * back as a scan, not re-derive it.
  */
private[queries] object Materialized {
  private val cache = new SessionCache[DataFrame]

  def apply(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cache.get(s, key)(build.localCheckpoint(true))
}
