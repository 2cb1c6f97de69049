package graft.operators

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.storage.StorageLevel

/** Deferred cache release for persist-inside-an-operator frames.
  *
  * The dedup/index operators persist an expensive intermediate (a
  * tokenized corpus, an assigned IVF index) that several branches of ONE
  * returned plan consume. Two prior disciplines both had a cost:
  *
  *  - leak (pre-r7): persist and never release — CacheManager holds a
  *    strong reference and the disk tier is not LRU-evicted, so repeated
  *    calls accumulate executor blocks forever;
  *  - eager release (r7): materialize the small result with a dedicated
  *    `count()` and unpersist — leak-free, but the extra pass re-ran the
  *    whole candidate pipeline once per call (q_neardup_ingest doubled).
  *
  * [[persistUntil]] removes the extra pass: dependencies are persisted
  * LAZILY and a [[QueryExecutionListener]] unpersists them right after
  * the FIRST completed Dataset action whose analyzed plan contains the
  * `trigger` frame — i.e. the caller's own first consumption. The
  * caches populate during that action (each branch after the first
  * reads, not recomputes), and nothing outlives it.
  *
  * Contract for callers of operators built on this: the returned frame
  * is cheap to materialize ONCE. A second action re-runs the full
  * pipeline uncached — consumers that iterate (connected components,
  * evaluation harnesses) must persist the small result themselves
  * (Components.fromPairs already does).
  *
  * Bounds and edges:
  *  - An action that does NOT contain the trigger (e.g. the geometry
  *    metadata probe inside queryBatch) never fires the release.
  *  - RDD-level actions (`queryExecution.toRdd.count()` — Bench,
  *    QueryProf) bypass QueryExecutionListener; both harnesses already
  *    clear all caches per query, and an unfired listener costs one
  *    canonicalized-subtree check per subsequent Dataset action.
  *  - Inside `foreachBatch` the per-micro-batch sink write is a normal
  *    Dataset action, so per-batch dependencies release at batch end —
  *    the stream-executor leak the old no-persist rule guarded against
  *    cannot build up.
  *  - If the caller never runs a Dataset action the lazy entries hold no
  *    executor blocks (nothing materialized); only the driver-side plan
  *    reference lingers until `spark.catalog.clearCache()`.
  */
object CacheScope {
  /** Persist every frame in `deps` (MEMORY_AND_DISK, lazy; frames the
    * caller already persisted are left at their level) and unpersist
    * them all after the first completed Dataset action whose plan
    * contains `trigger`. */
  def persistUntil(trigger: Dataset[_], deps: Dataset[_]*): Unit = {
    val spark = trigger.sparkSession
    deps.foreach { d =>
      if (d.storageLevel == StorageLevel.NONE)
        d.persist(StorageLevel.MEMORY_AND_DISK): Unit
    }
    val needle = trigger.queryExecution.analyzed
    val fired = new AtomicBoolean(false)
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private def maybe(qe: QueryExecution): Unit = {
        val hit =
          try !fired.get() && qe.analyzed.exists(_.sameResult(needle))
          catch { case _: Throwable => false } // never break the caller's action
        if (hit && fired.compareAndSet(false, true)) {
          deps.foreach(_.unpersist(blocking = false))
          spark.listenerManager.unregister(this)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = maybe(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = maybe(qe)
    }
    spark.listenerManager.register(listener)
  }
}
