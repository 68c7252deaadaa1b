// In org.apache.spark.graft to reach the private[spark] block-manager
// master and shuffle-tracker APIs — the exact calls ContextCleaner
// itself makes, invoked synchronously instead of via GC weak-refs.
package org.apache.spark.graft

import org.apache.spark.SparkContext
import org.apache.spark.storage.{BlockId, BroadcastBlockId, RDDBlockId}

/** Synchronous release of DEAD storage between benchmark queries.
  *
  * Spark frees an unreferenced localCheckpoint/cache/broadcast block
  * only when (1) the JVM GCs the owning object, and (2) the async
  * ContextCleaner thread drains its reference queue. Between the two, a
  * dead block still occupies unified storage memory. In a 170-query
  * bench run those leftovers accumulate across queries — measured on
  * the round-8 harness: a prefix of ~65 queries inflates the flagship
  * doc-pipeline query (q60) from its 2.95 s solo time to ~4.3 s, the
  * full 130-query prefix to 7.6 s, regardless of WHICH queries make up
  * the prefix — the pressure is cumulative occupancy, not one culprit.
  * `cacheManager.clearCache()` + unpersisting `getPersistentRDDs` does
  * not reach them: an RDD whose object was already GC'd has left
  * `persistentRdds`, yet its BLOCKS survive until the cleaner runs.
  *
  * [[purge]] removes every RDD and broadcast block the master knows
  * about, blocking until done — safe between queries because nothing
  * alive spans them (Bench's contract: cross-query caches hold
  * driver-side values, never persisted frames). Shuffle files are left
  * to the cleaner: they live on disk, not in the storage pool, and
  * deleting them synchronously buys nothing the measurement can see. */
object BlockPurge {

  def purge(sc: SparkContext): Unit = {
    val master = sc.env.blockManager.master
    val ids: Seq[BlockId] =
      master.getMatchingBlockIds(_ => true, askStorageEndpoints = true)
    ids.collect { case RDDBlockId(rddId, _) => rddId }.distinct
      .foreach(master.removeRdd(_, blocking = true))
    ids.collect { case BroadcastBlockId(bid, _) => bid }.distinct
      .foreach(master.removeBroadcast(_, removeFromMaster = true,
        blocking = true))
  }

  /** (storage memory in use, storage memory total) across the block
    * managers — the occupancy the purge exists to drive to zero. */
  def storageInUse(sc: SparkContext): (Long, Long) = {
    val st = sc.env.blockManager.master.getMemoryStatus.values
    val total = st.map(_._1).sum
    val free = st.map(_._2).sum
    (total - free, total)
  }
}
