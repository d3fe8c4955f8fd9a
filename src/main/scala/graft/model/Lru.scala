package graft
package model

/** Size-bounded LRU memo for serve-path session caches.
  *
  * The ANN serving tier memoizes per-state derivations (query-vector
  * batches, segment centroids, exclusion states) so repeat serves
  * against an unchanged work dir re-run zero Spark jobs — but a
  * LONG-LIVED serving session crosses many distinct batches and work
  * states, and an unbounded ConcurrentHashMap accretes every batch's
  * arrays forever (r12 verdict hygiene item). This wrapper keeps the
  * memoization contract (same key → same cached value, computed once
  * in the common case) under a hard entry bound with
  * least-recently-used eviction.
  *
  * Values must be deterministic pure derivations of their key: under a
  * concurrent first-load race the loader may run twice and either
  * result is kept — never wrong, at worst one duplicate derivation
  * (the derivation COUNTERS the specs pin run over sequential repeat
  * serves, which this cannot perturb). The loader runs OUTSIDE the
  * lock so a slow Spark derivation never blocks unrelated keys.
  */
private[graft] final class LruCache[K, V](maxEntries: Int) {
  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      this.size() > maxEntries
  }

  def getOrElseUpdate(k: K)(load: => V): V = {
    synchronized {
      val hit = m.get(k)
      if (hit != null) return hit
    }
    val v = load
    synchronized {
      val hit = m.get(k)
      if (hit != null) hit
      else { m.put(k, v); v }
    }
  }

  /** Entry count — the census gauge cache-bound specs assert on. */
  def size: Int = synchronized(m.size)

  def max: Int = maxEntries

  def clear(): Unit = synchronized(m.clear())
}
