package graft.queries

import org.apache.spark.sql.SparkSession

/** Per-(session, key) memoization for EAGER artifacts (trained indexes,
  * materialized cluster maps) that plan-identity caching cannot dedup.
  *
  * Sessions are WEAK keys: entries die with their session, so a stopped
  * session's persisted frames become collectible and a long-lived JVM
  * cycling sessions does not accumulate them — and, unlike an
  * identityHashCode string key, a live-object key cannot collide with a
  * later session reusing the same hash. Values for distinct `key`s
  * within one live session are kept for that session's lifetime (the
  * stored-index semantics the callers want). */
private[queries] final class SessionCache[V] {
  private val bySession =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, V]]()

  def get(s: SparkSession, key: String)(build: => V): V = {
    val perSession = bySession.synchronized {
      var m = bySession.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, V]()
        bySession.put(s, m)
      }
      m
    }
    perSession.computeIfAbsent(key, _ => build)
  }
}
