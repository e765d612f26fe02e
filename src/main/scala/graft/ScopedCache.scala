package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** One-shot scoped release for caches a returned (lazy) query plan reads.
  *
  * Several query fns persist an intermediate that the single returned plan
  * consumes more than once (x3's hashed shingles, x9's doc sets): the cache
  * is what makes one action compute the intermediate once, but the fn hands
  * back a LAZY plan, so the fn itself has no safe point to unpersist — doing
  * it before returning would re-run the lineage per consumer at the caller's
  * first action, and never doing it leaks block-manager entries across the
  * session (exactly the long-lived Verify/Bench loops the driver runs).
  *
  * The contract here: the cache lives until the NEXT action on the session
  * completes (success or failure), then is released and the listener
  * deregisters itself. Within that first action the multi-consumer plan
  * still gets the compute-once benefit (stages after the first materialize
  * read the cached blocks); re-invoking the query fn re-registers a fresh
  * cache, so repeated-trial harnesses (Bench) stay correct and each trial
  * pays its own honest materialization. If some OTHER query's action lands
  * first, the release is merely early: the plan recomputes the lineage —
  * slower, never wrong.
  */
object ScopedCache {
  def releaseAfterNextAction(spark: SparkSession, caches: Seq[Dataset[_]]): Unit = {
    if (caches.isEmpty) return
    val listener = new QueryExecutionListener { self =>
      private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def release(): Unit =
        if (done.compareAndSet(false, true)) {
          caches.foreach(_.unpersist())
          spark.listenerManager.unregister(self)
        }
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = release()
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = release()
    }
    spark.listenerManager.register(listener)
  }
}
