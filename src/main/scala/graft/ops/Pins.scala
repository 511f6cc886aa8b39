package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Tracked eager `localCheckpoint`s, so pinned blocks can be RELEASED.
  *
  * Several operators must materialize an intermediate eagerly: ScalableWindow
  * pins its slice assignment (`spark_partition_id` is not stable across plan
  * branches under AQE), incremental dedup pins its anti-join result before
  * mutating the store it read (a write invalidates cached plans on that
  * path), connected components truncates lineage per round. A
  * `localCheckpoint(true)` holds a full copy of the dataset in executor
  * storage memory until the RDD is unpersisted or the session dies — at
  * 100 TB, one forgotten pin per query is an executor-storage death spiral.
  *
  * Contract: operators pin through [[pin]], which registers the checkpoint's
  * backing RDD; the CONSUMER of the returned DataFrame calls [[releaseAll]]
  * (or [[release]] with the returned handle) after its terminal action.
  * `Verify`/`Bench` release after every query; specs assert nothing stays
  * behind. Release is the caller's job precisely because the operator cannot
  * know when the lazy result has been consumed — and a released checkpoint
  * must not be re-collected (lineage is truncated; the blocks are the only
  * copy), which is also why release is explicit rather than hooked to "the
  * first action that touches the plan".
  */
object Pins {

  private val registry =
    java.util.concurrent.ConcurrentHashMap.newKeySet[RDD[_]]()
  @volatile private var warnedNoHandle = false

  /** The RDD holding a checkpointed plan's materialized blocks, if Spark
    * exposes it (a `LogicalRDD` leaf — true on every Spark this repo
    * targets). */
  def handleOf(cp: DataFrame): Option[RDD[_]] =
    cp.queryExecution.analyzed.collectFirst { case lr: LogicalRDD => lr.rdd }

  /** Eager localCheckpoint, tracked for release. Returns the pinned frame. */
  def pin(df: DataFrame): DataFrame = pinWithHandle(df)._1

  /** Eager localCheckpoint returning both the pinned frame and the block
    * handle, for operators (connected components) that release per-round
    * rather than at end-of-query. */
  def pinWithHandle(df: DataFrame): (DataFrame, Option[RDD[_]]) = {
    val cp = df.localCheckpoint(eager = true)
    val handle = handleOf(cp)
    handle.foreach(registry.add)
    // if a Spark upgrade stops exposing the checkpoint as a LogicalRDD, the
    // unpersist path degrades to leaking pinned blocks until session death —
    // make that mode loud instead of silent
    if (handle.isEmpty && !warnedNoHandle) {
      warnedNoHandle = true
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "Pins: checkpointed plan is not a LogicalRDD; pinned blocks will " +
          "NOT be released this run")
    }
    (cp, handle)
  }

  // a pin can outlive its SparkContext (a test suite stopping its session,
  // a crashed job): its blocks died with the context, so "release" is just
  // dropping the handle — unpersisting through a dead context throws
  private def unpersistLive(r: RDD[_]): Unit =
    try { if (!r.sparkContext.isStopped) r.unpersist(blocking = false) }
    catch { case _: Exception => () }

  /** Free one pinned checkpoint's blocks. Safe to call twice. */
  def release(handle: Option[RDD[_]]): Unit = handle.foreach { r =>
    registry.remove(r)
    unpersistLive(r)
  }

  /** Free every pinned checkpoint registered since the last release — called
    * by consumers (Verify/Bench per query, specs, daemon batches) after the
    * terminal action over the operator's result. */
  def releaseAll(): Unit = {
    val it = registry.iterator()
    while (it.hasNext) { unpersistLive(it.next()); it.remove() }
    // the manifest-keyed World read memo shares this end-of-query lifecycle:
    // reuse is valuable WITHIN one query (an index lifecycle re-reads the
    // same sealed snapshot many times) but retained DataFrames keep their
    // (often per-query isolated) SparkSessions alive, and across a 291-query
    // suite that accumulation measurably slowed late-running queries —
    // clear it with the pins (r17; measured +2-6 s regressions on the
    // alphabetically-last index queries before the clear)
    graft.world.World.clearReadMemo()
  }

  /** Pinned checkpoints not yet released (spec assertion surface). */
  def retainedCount: Int = registry.size
}
