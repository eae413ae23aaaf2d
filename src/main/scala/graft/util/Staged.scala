package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lifecycle registry for construction-time materializations in query
  * paths (round 18). Round 17 materialized shared sub-plans with
  * `localCheckpoint(true)` and never released them: every invocation of
  * the intake/drop/gated builders pinned another corpus-scale copy in
  * executor storage for the JVM's lifetime — the bench invokes each
  * builder ~10× per run, so one run accumulated dozens of copies (the
  * round-17 32-core bench timeout's prime in-repo suspect). This
  * registry gives each site an explicit lifecycle instead:
  *
  *   - [[swap]]: at most ONE live cached copy per site — constructing a
  *     query again releases the previous construction's copy first.
  *   - [[track]] + [[releaseAll]]: results whose lineage is necessarily
  *     truncated (iterative operators) register here so a host that
  *     KNOWS no consumer will re-execute (the bench between reps, a
  *     session at a quiescent point) can free them.
  *
  * Storage is `persist(MEMORY_AND_DISK)` with lineage KEPT — not
  * `localCheckpoint` (guide §5): a consumer that re-executes after its
  * slot was swapped recomputes from the parquet/JSONL inputs instead of
  * dying on truncated lineage, and at cluster scale an executor loss
  * degrades to recompute instead of making the query unrecoverable
  * (Spark's own localCheckpoint warning). Unpersisting the previous
  * holder BEFORE persisting the new frame also keeps the CacheManager's
  * plan matching from serving a prior construction's cache — every
  * construction computes from the inputs, never from a memo. */
object Staged {
  private val slots =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private val tracked =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Stage `df` under a stable per-site slot key (site + data dir +
    * variant), releasing whatever a previous construction of the same
    * site staged. The persist is LAZY: the first consuming action
    * populates the cache, later consumers (other sub-plans of the same
    * query, or the gate action that runs at construction time) read it. */
  def swap(key: String, df: DataFrame): DataFrame = {
    val prev = slots.remove(key)
    if (prev != null) prev.unpersist(false)
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    slots.put(key, cached)
    cached
  }

  /** Register a lineage-truncated frame (a checkpointed iterative
    * result) for a later [[releaseAll]]. The caller keeps using the
    * frame normally; only an explicit releaseAll frees its blocks, and
    * the host calling it asserts no registered frame re-executes after. */
  def track(df: DataFrame): DataFrame = { tracked.add(df); df }

  /** Free every staged slot and tracked frame. Safe whenever no staged
    * frame's plan will be RE-executed afterwards: swap slots keep
    * lineage (late re-execution recomputes), tracked frames do not (the
    * caller owns that guarantee — the bench calls this between timed
    * reps, after each rep's action has completed). */
  def releaseAll(): Unit = {
    val keys = slots.keySet().toArray(Array.empty[String])
    keys.foreach { k =>
      val df = slots.remove(k)
      if (df != null) df.unpersist(false)
    }
    var df = tracked.poll()
    while (df != null) {
      graft.operators.ConnectedComponents.release(df)
      df = tracked.poll()
    }
  }

  /** Live staged/tracked frame count — spec observability. */
  def liveCount: Int = slots.size() + tracked.size()
}
