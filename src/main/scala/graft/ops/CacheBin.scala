package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame

/** Lifecycle registry for intermediate `.persist()` handles.
  *
  * Operators like [[Dedup.simHashPairs]] cache a small intermediate
  * (signature tables, posting lists) so a self-join does not recompute
  * the expression per side. A bare `.persist()` with no matching
  * `unpersist` accumulates storage memory across repeated invocations in
  * a long-lived session until eviction pressure degrades the whole app —
  * so every such cache is pinned HERE instead, and callers release the
  * batch's caches once the consuming action has run:
  *
  * {{{
  *   val pairs = LlmOps.simhashPairs(spark, dir)
  *   pairs.write.parquet(out)      // consuming action
  *   CacheBin.releaseAll()         // drop the operator-internal caches
  * }}}
  *
  * `releaseAll` is blocking=false: Spark drops the blocks asynchronously,
  * so release costs nothing on the query path. Verify and Bench both
  * release between queries/iterations.
  */
object CacheBin {
  private val pinned = ArrayBuffer.empty[DataFrame]

  /** Persist `df` (MEMORY_AND_DISK) and register it for release. */
  def pin(df: DataFrame): DataFrame = synchronized {
    df.persist()
    pinned += df
    df
  }

  /** Unpersist every pinned frame and clear the registry. */
  def releaseAll(): Unit = synchronized {
    pinned.foreach(_.unpersist(false))
    pinned.clear()
  }
}
