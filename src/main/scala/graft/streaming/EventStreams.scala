package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` shape (SURVEY §2.9
  * streaming row): watermarked tumbling/sliding/session windows and a
  * custom-state op via flatMapGroupsWithState. The batch equivalents (same
  * aggregations, DuckDB-checked) live in graft.queries.EventOps; these run
  * the genuinely incremental versions, exercised by StreamingSpec with a
  * file/memory source.
  */
object EventStreams {

  /** Tumbling 1-hour counts with a watermark: late events beyond the
    * watermark are dropped from the aggregation state. */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"))

  /** Sliding 2h/1h windowed sums. */
  def slidingSums(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("user_id"))
      .agg(sum(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("user_id"), col("sum_value"))

  /** Session windows (30-min gap) per user. */
  def sessionCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"))

  /** Stream-stream interval join: each click pairs with the same user's
    * errors in the `within` interval ending at the click. Both sides carry a
    * watermark so the join state is bounded (rows older than watermark +
    * interval are evicted); the time-interval condition is what makes the
    * state finite at all — an unconstrained stream-stream equi-join would
    * buffer both streams forever.
    *
    * Works on BATCH frames too (the analyzer eliminates the watermark on
    * non-streaming children), which is how the driver's `e_stream_join`
    * oracle checks the join semantics relationally.
    *
    * `clicks`: (click_id, user_id, c_ts); `errors`: (err_id, user_id, e_ts).
    */
  def clickErrorJoin(clicks: DataFrame, errors: DataFrame,
      within: String = "30 minutes", watermark: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("c_ts", watermark)
    val e = errors.withColumnRenamed("user_id", "e_user")
      .withWatermark("e_ts", watermark)
    c.join(e,
        col("user_id") === col("e_user") &&
          col("e_ts") >= col("c_ts") - expr(s"INTERVAL $within") &&
          col("e_ts") <= col("c_ts"))
      .select(col("click_id"), col("user_id"), col("err_id"),
        unix_micros(col("e_ts")).as("err_us"))
  }

  /** LEFT-OUTER stream-stream interval join: every click is emitted —
    * enriched with each same-user error in the `within` interval ending at
    * the click, or with NULL error fields once the watermark PROVES no such
    * error can still arrive (outer results surface only at watermark
    * advance; emitting them eagerly would double-emit when a late match
    * lands). State bound is the same interval + watermark horizon as the
    * inner form — the outer side adds no state, only an emit-on-eviction
    * rule. The enrich-with-optional-context shape (most clicks have no
    * error) that an inner join silently drops.
    *
    * Works on BATCH frames too (the analyzer strips watermarks on
    * non-streaming children, leaving a plain left join), which is how the
    * `e_stream_left_join` oracle checks the join semantics relationally.
    */
  def clickErrorLeftJoin(clicks: DataFrame, errors: DataFrame,
      within: String = "30 minutes", watermark: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("c_ts", watermark)
    val e = errors.withColumnRenamed("user_id", "e_user")
      .withWatermark("e_ts", watermark)
    c.join(e,
        col("user_id") === col("e_user") &&
          col("e_ts") >= col("c_ts") - expr(s"INTERVAL $within") &&
          col("e_ts") <= col("c_ts"),
        "left_outer")
      .select(col("click_id"), col("user_id"), col("err_id"),
        unix_micros(col("e_ts")).as("err_us"))
  }

  /** Stream-STATIC enrichment join: every micro-batch hash-joins the
    * dimension frame with NO state kept at all (the static side is not
    * buffered; this is the zero-state join, unlike the stream-stream forms
    * above). The dimension is captured at stream start — file-backed
    * frames keep their cached listing, so a refreshed dimension needs a
    * stream restart (or a foreachBatch sink that re-reads per batch) to be
    * seen; this is Spark's static-side contract, stated rather than
    * papered over. Left join: events with no dimension row pass through
    * NULL-padded rather than silently dropping. The dimension side
    * broadcasts (it is a dimension by assumption); at cluster scale that
    * is one broadcast per batch, no shuffle of the stream. */
  def enrichStream(events: DataFrame, dim: DataFrame,
      keyCol: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), events(keyCol) === dim(dimKey), "left")

  /** Streaming exact dedup with bounded state: duplicate event ids arriving
    * within the watermark horizon are dropped; state for ids older than the
    * watermark is evicted (an unbounded `dropDuplicates` would grow state
    * forever — this is the streaming face of the batch exact-dedup
    * operator, sized for infinite streams). */
  def dedupStream(events: DataFrame, idCol: String,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class UserRun(user_id: Long, n_errors: Long, alert: Boolean)
  final case class KeyBecameHeavy(user_id: Long, became_heavy_us: Long)

  private def micros(ts: java.sql.Timestamp): Long =
    // floorDiv, not /: getTime/1000 truncates toward zero, so for pre-1970
    // timestamps the (always-positive) nanos fraction would be ADDED to an
    // under-truncated second — ~1 s off and divergent from unix_micros
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** Streaming exact heavy hitters: each key is emitted ONCE, at the exact
    * event where its running count reaches `threshold` (the streaming face
    * of ops.HeavyHitters — "when did this key become frequent"). State is
    * one long per observed key; with `idleTimeout` set, keys that stop
    * arriving are evicted after that processing-time gap, bounding state to
    * recently-active keys on an infinite stream (the standard frequent-items
    * tradeoff: an evicted key that resumes restarts its count). Within a
    * batch, rows are ordered by (event time, event_id) so the crossing event
    * is deterministic regardless of shuffle arrival order; the per-group
    * sort is per-key-per-batch, never global.
    *
    * Operational note: with `idleTimeout` set the engine schedules batches
    * continuously so due timeouts can fire, which means the query never
    * reports "no new data" — `processAllAvailable()` will block forever by
    * design. Sequence tests/backfills via `recentProgress` or sink polling
    * instead (StreamingSpec shows the pattern).
    *
    * Batch twin (same semantics relationally, DuckDB-checked):
    * `e_heavy_hitters` in graft.queries.EventOps. */
  def heavyHitterStream(spark: SparkSession, events: Dataset[Ev],
      threshold: Long, idleTimeout: Option[String] = None): Dataset[KeyBecameHeavy] = {
    import spark.implicits._
    require(threshold >= 1, s"threshold must be positive, got $threshold")
    val conf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, KeyBecameHeavy](OutputMode.Append, conf) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toArray.sortBy(e => (micros(e.ts), e.event_id))
            var c = state.getOption.getOrElse(0L)
            var hit: Option[KeyBecameHeavy] = None
            sorted.foreach { e =>
              c += 1
              if (c == threshold) hit = Some(KeyBecameHeavy(uid, micros(e.ts)))
            }
            state.update(c)
            idleTimeout.foreach(state.setTimeoutDuration)
            hit.iterator
          }
      }
  }

  final case class FunnelDone(user_id: Long, step1_us: Long, step2_us: Long,
      step3_us: Long)

  /** Streaming twin of [[graft.ops.Funnel.earliestChain]] for a three-step
    * funnel: per-user slot state advances incrementally and ONE FunnelDone
    * row is emitted the moment the final step fills (append-mode "the user
    * just converted" signal — the thing a batch funnel can only report
    * after the fact). State is three epoch-micro longs per user (-1 =
    * unfilled), so state size is flat in event volume.
    *
    * Ordering contract: events are sorted by event time WITHIN each
    * micro-batch (per user), and slots only ever fill forward — so any
    * per-user in-order arrival across batches matches the batch twin
    * exactly, while a late event older than an already-filled predecessor
    * cannot rewrite history (slots are monotone; the batch twin re-run over
    * the full log remains the authoritative earliest chain, same as the
    * dedup family's replay contract). */
  def funnelStream(spark: SparkSession, events: Dataset[Ev],
      steps: Seq[String] = Seq("view", "click", "purchase")): Dataset[FunnelDone] = {
    import spark.implicits._
    require(steps.length == 3, s"funnelStream is the three-step face, got $steps")
    require(steps.distinct == steps, s"funnel steps must be distinct: $steps")
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Array[Long], FunnelDone](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[Array[Long]]) =>
          val slots = state.getOption.getOrElse(Array.fill(3)(-1L))
          val wasDone = slots(2) >= 0L
          val sorted = rows.toArray.sortBy(e => (micros(e.ts), e.event_id))
          sorted.foreach { e =>
            val s = steps.indexOf(e.event_type)
            if (s >= 0 && slots(s) < 0L &&
                (s == 0 || (slots(s - 1) >= 0L && micros(e.ts) > slots(s - 1))))
              slots(s) = micros(e.ts)
          }
          state.update(slots)
          if (!wasDone && slots(2) >= 0L)
            Iterator.single(FunnelDone(uid, slots(0), slots(1), slots(2)))
          else Iterator.empty
      }
  }

  /** Custom stateful op: per-user running error count with an alert once it
    * crosses `threshold` — the mapGroupsWithState pattern for state Spark's
    * built-in windows can't express. */
  def errorRunCounts(spark: SparkSession, events: Dataset[Ev],
      threshold: Long = 3): Dataset[UserRun] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, UserRun](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val errs = rows.count(_.event_type == "error")
          val now = prev + errs
          state.update(now)
          if (errs > 0) Iterator(UserRun(uid, now, now >= threshold))
          else Iterator.empty
      }
  }
}
