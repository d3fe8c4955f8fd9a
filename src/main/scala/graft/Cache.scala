package graft

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry of shared, persisted intermediates.
  *
  * The reference re-derives per-corpus state on every request (each CLI
  * query re-opens the store; the CI loop runs ≤30 searches each scanning
  * the corpus — `src/core/ci/doc-service.ts:231-236`). Persisting the
  * scored/vectorized corpus across a multi-query session is the single
  * biggest lever vs that design (SURVEY.md §4): at 100 TB the tokenized
  * sparse vectors are built once per job, not once per query.
  *
  * Storage level MEMORY_AND_DISK: spill instead of recompute — the
  * inputs here (sparse doc vectors, normed embeddings) are far smaller
  * than the raw text corpus.
  */
object Cache {

  private val store = mutable.Map.empty[(Int, String, String), DataFrame]

  def getOrBuild(spark: SparkSession, key: String, dir: String)(
      build: => DataFrame): DataFrame = synchronized {
    store.getOrElseUpdate((System.identityHashCode(spark), key, dir), {
      val df = build
      df.persist(StorageLevel.MEMORY_AND_DISK)
      df
    })
  }

  private val sideCaches = mutable.Buffer.empty[Int => Unit]

  /** Register a side-cache's per-session eviction (e.g. the ANN salt
    * memo) so [[clear]] drops it together with the DataFrame cache —
    * without this a process-global memo outlives every session and
    * probes that clear the cache silently reuse stale entries. */
  def registerSideCache(evict: Int => Unit): Unit = synchronized {
    sideCaches += evict
  }

  /** Drop everything owned by one session (tests). */
  def clear(spark: SparkSession): Unit = synchronized {
    val id = System.identityHashCode(spark)
    store.filterInPlace { case ((s, _, _), df) =>
      if (s == id) { df.unpersist(false); false } else true
    }
    sideCaches.foreach(_(id))
  }
}
