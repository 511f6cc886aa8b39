package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Event-time operators over the `events` table: tumbling/sliding/session
  * windows (batch equivalents of the Structured Streaming ops in
  * graft.streaming) and an as-of join. Window starts are emitted as epoch
  * microseconds (BIGINT) for engine-neutral comparison.
  */
object EventOps {
  import Tables.t

  private val dec = DecimalType(18, 2)

  private def ev(s: SparkSession, dir: String): DataFrame = t(s, dir, "events")

  val defs: Map[String, QueryDef] = Map(

    // time-series resample + forward fill: per user, an hourly grid spanning
    // their observed range (sequence + explode — each user's grid is
    // generated where their rows live, no driver loop), left-joined to the
    // hourly aggregate, gaps filled with the LAST observed hour's value
    // (last(ignoreNulls) over a running frame — the partitioned window
    // shape, spill-capable, never global). The filled value is an exact
    // decimal sum passed through as a double, so the fill is bit-exact in
    // both engines.
    "e_gap_fill" -> QueryDef(
      (s, dir) => {
        val hourly = ev(s, dir).where(col("user_id") < 40)
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg(sum(col("value").cast(dec)).cast("double").as("sv"))
        val grid = hourly.groupBy("user_id")
          .agg(min("h").as("h0"), max("h").as("h1"))
          .select(col("user_id"),
            explode(sequence(col("h0"), col("h1"),
              expr("INTERVAL 1 HOUR"))).as("h"))
        val w = Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(hourly, Seq("user_id", "h"), "left")
          .withColumn("filled", last(col("sv"), ignoreNulls = true).over(w))
          .select(col("user_id"), unix_micros(col("h")).as("h_us"),
            col("filled"))
          .orderBy("user_id", "h_us")
      },
      Some("""WITH hourly AS (
                SELECT user_id, date_trunc('hour', ts) AS h,
                  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
                FROM events WHERE user_id < 40 GROUP BY 1, 2),
              spans AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1
                        FROM hourly GROUP BY 1),
              grid AS (SELECT user_id,
                         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
                       FROM spans),
              joined AS (SELECT g.user_id, g.h, hh.sv FROM grid g
                         LEFT JOIN hourly hh
                           ON hh.user_id = g.user_id AND hh.h = g.h)
              SELECT user_id, CAST(epoch_us(h) AS BIGINT) AS h_us,
                last_value(sv IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
              FROM joined ORDER BY user_id, h_us""")
    ),

    // per-event SESSION IDS (30-min gap rule): lag + running sum of
    // session starts — the assignment face of sessionization
    // (e_session_window aggregates whole sessions; downstream pipelines
    // usually need the id ON each event to join against). Two partitioned
    // windows sharing one (ts, event_id) ordering, integer-exact.
    "e_sessionize" -> QueryDef(
      (s, dir) => {
        val wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev(s, dir).where(col("user_id") < 40)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wo))
          .withColumn("new_sess",
            (col("prev_us").isNull ||
              (unix_micros(col("ts")) - col("prev_us")) > lit(1800000000L))
              .cast("bigint"))
          .withColumn("session_seq", sum("new_sess").over(run))
          .select(col("user_id"), col("event_id"), col("session_seq"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
                CAST(SUM(new_sess) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS session_seq
              FROM (
                SELECT user_id, event_id, ts,
                  CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                               > 1800000000
                       THEN 1 ELSE 0 END AS new_sess
                FROM events WHERE user_id < 40
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
              ORDER BY user_id, event_id""")
    ),

    // rolling median (exact, interpolated) over a 5-row event-time frame
    // per user — the robust-smoothing window analytics use where rolling
    // AVG is outlier-poisoned. percentile over a bounded ROWS frame is a
    // partitioned window (spill-capable, never global); both engines
    // interpolate linearly over identical doubles, so the result is
    // bit-exact with no rounding crutch.
    "e_rolling_median" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(-4, Window.currentRow)
        ev(s, dir).where(col("user_id") < 40)
          .select(col("user_id"), col("event_id"),
            expr("percentile(value, 0.5)").over(w).as("med5"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
                quantile_cont(value, 0.5) OVER (
                  PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med5
              FROM events WHERE user_id < 40
              ORDER BY user_id, event_id""")
    ),

    "e_tumbling_window" -> QueryDef(
      (s, dir) => ev(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast("double").as("sum_value"))
        .select(unix_micros(col("w.start")).as("win_start_us"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("win_start_us", "event_type"),
      Some("""SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS win_start_us,
                event_type, COUNT(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
              FROM events GROUP BY 1, 2 ORDER BY win_start_us, event_type""")
    ),

    "e_sliding_window" -> QueryDef(
      (s, dir) => ev(s, dir)
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("w.start")).as("win_start_us"), col("event_type"), col("n"))
        .orderBy("win_start_us", "event_type"),
      Some("""WITH w AS (
                SELECT date_trunc('hour', ts) AS ws, event_type FROM events
                UNION ALL
                SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws, event_type FROM events)
              SELECT CAST(epoch_us(ws) AS BIGINT) AS win_start_us, event_type, COUNT(*) AS n
              FROM w GROUP BY 1, 2 ORDER BY win_start_us, event_type""")
    ),

    "e_session_window" -> QueryDef(
      // 30-min-gap sessions per user (batch form of session_window)
      (s, dir) => ev(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), unix_micros(col("w.start")).as("session_start_us"), col("n_events"))
        .orderBy("user_id", "session_start_us"),
      Some("""WITH x AS (
                SELECT user_id, ts,
                  CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) < INTERVAL 30 MINUTE
                       THEN 0 ELSE 1 END AS new_s
                FROM events),
              y AS (
                SELECT user_id, ts,
                  SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
                FROM x)
              SELECT user_id, CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_us,
                COUNT(*) AS n_events
              FROM y GROUP BY user_id, sid ORDER BY user_id, session_start_us""")
    ),

    // classic cohort-retention matrix: users grouped by first-seen week,
    // counted distinct in each later activity week. Week offsets are exact
    // integers (both engines truncate to ISO Monday weeks, so day diffs are
    // multiples of 7); one distinct pass + one aggregation, both on
    // (user, week)-sized keys
    "e_cohort_retention" -> QueryDef(
      (s, dir) => {
        val events = ev(s, dir).select(col("user_id"), col("ts"))
        val cohorts = events.groupBy("user_id")
          .agg(date_trunc("week", min(col("ts"))).as("cohort"))
        val active = events
          .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
          .distinct()
        active.join(cohorts, "user_id")
          .groupBy(col("cohort"), (datediff(col("wk"), col("cohort")) / 7)
            .cast("long").as("week_offset"))
          .agg(count_distinct(col("user_id")).as("n_users"))
          .select(unix_micros(col("cohort")).as("cohort_week_us"),
            col("week_offset"), col("n_users"))
          .orderBy("cohort_week_us", "week_offset")
      },
      Some("""WITH c AS (
                SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
                FROM events GROUP BY user_id),
              a AS (
                SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
                FROM events)
              SELECT CAST(epoch_us(cohort) AS BIGINT) AS cohort_week_us,
                CAST(datediff('day', cohort, wk) // 7 AS BIGINT) AS week_offset,
                CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
              FROM a JOIN c USING (user_id)
              GROUP BY 1, 2 ORDER BY 1, 2"""),
    ),

    "e_stream_join" -> QueryDef(
      // batch form of EventStreams.clickErrorJoin (the operator runs
      // genuinely incrementally in StreamingSpec; here the SAME code path is
      // checked relationally against DuckDB)
      (s, dir) => {
        val e = ev(s, dir)
        val clicks = e.where(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
        val errors = e.where(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("user_id"), col("ts").as("e_ts"))
        graft.streaming.EventStreams.clickErrorJoin(clicks, errors)
          .orderBy("click_id", "err_id")
      },
      Some("""SELECT c.event_id AS click_id, c.user_id, e.event_id AS err_id,
                CAST(epoch_us(e.ts) AS BIGINT) AS err_us
              FROM events c JOIN events e
                ON e.user_id = c.user_id AND e.event_type = 'error'
               AND e.ts >= c.ts - INTERVAL 30 MINUTE AND e.ts <= c.ts
              WHERE c.event_type = 'click'
              ORDER BY click_id, err_id""")
    ),

    // batch form of EventStreams.clickErrorLeftJoin (the LEFT-OUTER
    // stream-stream interval join: unmatched clicks surface with NULL
    // error fields once the watermark proves no match can arrive —
    // StreamingSpec drives that incremental path; here the SAME code path
    // is checked relationally against DuckDB's LEFT JOIN)
    "e_stream_left_join" -> QueryDef(
      (s, dir) => {
        val e = ev(s, dir)
        val clicks = e.where(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
        val errors = e.where(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("user_id"), col("ts").as("e_ts"))
        graft.streaming.EventStreams.clickErrorLeftJoin(clicks, errors)
          .orderBy("click_id", "err_id")
      },
      Some("""SELECT c.event_id AS click_id, c.user_id, e.event_id AS err_id,
                CAST(epoch_us(e.ts) AS BIGINT) AS err_us
              FROM events c LEFT JOIN events e
                ON e.user_id = c.user_id AND e.event_type = 'error'
               AND e.ts >= c.ts - INTERVAL 30 MINUTE AND e.ts <= c.ts
              WHERE c.event_type = 'click'
              ORDER BY click_id, err_id""")
    ),

    // robust per-entity ANOMALY detection (median ± 3·MAD): flag events
    // whose value deviates more than 3 median-absolute-deviations from
    // their user's median — the outlier rule a mean/stddev gate gets
    // wrong under the very outliers it hunts. Exact interpolated
    // percentiles (engine-identical doubles, the q_mad discipline) make
    // the flag deterministic; two keyed aggregates + one join back, all
    // on user_id — parallel across users at any scale. Zero-MAD users
    // (constant values) are excluded rather than dividing by zero.
    "e_anomaly_mad" -> QueryDef(
      (s, dir) => {
        // half slice: the gate proves the median/MAD mechanics; the
        // per-user percentile buffers price the fixture, not the operator
        val e = ev(s, dir).where(col("event_id") % 2 === 0)
        val med = e.groupBy("user_id")
          .agg(expr("percentile(value, 0.5)").as("med"))
        val st = e.join(med, "user_id").groupBy("user_id")
          .agg(first("med").as("med"),
            expr("percentile(abs(value - med), 0.5)").as("mad"))
        e.join(st, "user_id")
          .where(col("mad") > 0 &&
            abs(col("value") - col("med")) > lit(3.0) * col("mad"))
          .select("event_id", "user_id", "value")
          .orderBy("event_id")
      },
      Some("""WITH ev2 AS (
                SELECT * FROM events WHERE event_id % 2 = 0),
              m AS (
                SELECT user_id, quantile_cont(value, 0.5) AS med
                FROM ev2 GROUP BY user_id),
              d AS (
                SELECT e.user_id, ANY_VALUE(m.med) AS med,
                  quantile_cont(abs(e.value - m.med), 0.5) AS mad
                FROM ev2 e JOIN m USING (user_id) GROUP BY e.user_id)
              SELECT e.event_id, e.user_id, e.value
              FROM ev2 e JOIN d USING (user_id)
              WHERE d.mad > 0 AND abs(e.value - d.med) > 3.0 * d.mad
              ORDER BY event_id""")
    ),

    // batch twin of EventStreams.errorRunCounts (the flatMapGroupsWithState
    // custom-state op): per-user running error count with the alert flag
    // once it crosses 3. The stateful operator's semantics expressed as one
    // window over (user_id, ts) — relationally checkable the way
    // e_stream_join checks clickErrorJoin; StreamingSpec covers the
    // incremental path.
    "e_error_alert" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev(s, dir).where(col("event_type") === "error")
          .withColumn("n_err", count(lit(1)).over(w))
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("n_err"),
            (col("n_err") >= 3).as("alert"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS n_err,
                COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) >= 3 AS alert
              FROM events WHERE event_type = 'error' ORDER BY event_id""")
    ),

    // batch twin of EventStreams.heavyHitterStream: for each key that ever
    // reaches the frequency threshold, the event time at which it crossed —
    // one window partitioned by user_id (never global), the same (ts,
    // event_id) total order the streaming op applies per batch. Threshold
    // derives from a metadata-only count() like q_heavy_hitters.
    "e_heavy_hitters" -> QueryDef(
      (s, dir) => {
        val e = ev(s, dir)
        val minCount = math.ceil(e.count() * 0.008).toLong
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.withColumn("n", count(lit(1)).over(w))
          .where(col("n") === minCount)
          .select(col("user_id"), unix_micros(col("ts")).as("became_heavy_us"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS became_heavy_us
              FROM (SELECT user_id, ts,
                      COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS n
                    FROM events)
              WHERE n = CEIL(0.008 * (SELECT COUNT(*) FROM events))
              ORDER BY user_id""")
    ),

    // ordered funnel (view -> click -> purchase), strict event-time order:
    // Spark folds each user's sorted events in ONE shuffle (greedy
    // first-qualifying-event chain); the oracle derives the same chain
    // independently as iterated min-after-previous over three joins —
    // different algorithm, provably the same result (see ops.Funnel)
    "e_funnel" -> QueryDef(
      (s, dir) => graft.ops.Funnel.earliestChain(ev(s, dir),
          "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .orderBy("user_id"),
      Some("""WITH e AS (
                SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t, event_type
                FROM events
                WHERE event_type IN ('view', 'click', 'purchase')),
              u AS (SELECT DISTINCT user_id FROM e),
              s1 AS (SELECT user_id, MIN(t) AS t1 FROM e
                     WHERE event_type = 'view' GROUP BY user_id),
              s2 AS (SELECT e.user_id, MIN(e.t) AS t2 FROM e JOIN s1 USING (user_id)
                     WHERE e.event_type = 'click' AND e.t > s1.t1 GROUP BY e.user_id),
              s3 AS (SELECT e.user_id, MIN(e.t) AS t3 FROM e JOIN s2 USING (user_id)
                     WHERE e.event_type = 'purchase' AND e.t > s2.t2 GROUP BY e.user_id)
              SELECT u.user_id,
                CAST(CASE WHEN t1 IS NULL THEN 0 WHEN t2 IS NULL THEN 1
                          WHEN t3 IS NULL THEN 2 ELSE 3 END AS BIGINT) AS steps_done,
                t1 AS step1_us, t2 AS step2_us, t3 AS step3_us
              FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
                LEFT JOIN s3 USING (user_id)
              ORDER BY u.user_id"""),
    ),

    // as-of with TOLERANCE: the prior error only counts if it happened
    // within the last hour — the staleness bound every real enrichment
    // needs (an hours-old quote must not price a trade). Same single
    // shuffle as e_asof_join; the bound is one comparison against the
    // latest prior match (if the NEAREST prior is too old, all are).
    "e_asof_tolerance" -> QueryDef(
      (s, dir) => {
        val tagged = ev(s, dir)
          .where(col("event_type").isin("click", "error"))
          .select(
            when(col("event_type") === "click", col("event_id")).as("event_id"),
            col("user_id"), col("ts"),
            when(col("event_type") === "click", 0).otherwise(1).as("tag"),
            when(col("event_type") === "error", col("ts")).as("err_ts"))
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("tag"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tagged
          .withColumn("prior_us",
            unix_micros(last(col("err_ts"), ignoreNulls = true).over(w)))
          .where(col("tag") === 0)
          .select(col("event_id"), col("user_id"),
            when(unix_micros(col("ts")) - col("prior_us") <= 3600000000L,
              col("prior_us")).as("recent_error_us"))
          .orderBy("event_id")
      },
      Some("""SELECT c.event_id, c.user_id, epoch_us(MAX(e.ts)) AS recent_error_us
              FROM events c LEFT JOIN events e
                ON e.user_id = c.user_id AND e.event_type = 'error'
                AND e.ts < c.ts AND e.ts >= c.ts - INTERVAL 1 HOUR
              WHERE c.event_type = 'click'
              GROUP BY c.event_id, c.user_id ORDER BY c.event_id""")
    ),

    "e_asof_join" -> QueryDef(
      // for each click: the most recent strictly-earlier error of the same
      // user. Implemented scalably (one shuffle by user_id): tag-union +
      // last_value window — not a per-row correlated lookup.
      (s, dir) => {
        // the tag-union is a conditional PROJECTION, not a union of two
        // branches: one scan of events instead of two (the union form read
        // the fact table twice — the difference between one pass and two
        // over 100 TB of events)
        val tagged = ev(s, dir)
          .where(col("event_type").isin("click", "error"))
          .select(
            when(col("event_type") === "click", col("event_id")).as("event_id"),
            col("user_id"), col("ts"),
            when(col("event_type") === "click", 0).otherwise(1).as("tag"),
            when(col("event_type") === "error", col("ts")).as("err_ts"))
        // at equal ts the click sorts BEFORE the error -> strict "<" semantics
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("tag"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tagged
          .withColumn("prior_error_us",
            unix_micros(last(col("err_ts"), ignoreNulls = true).over(w)))
          .where(col("tag") === 0)
          .select("event_id", "user_id", "prior_error_us")
          .orderBy("event_id")
      },
      Some("""SELECT c.event_id, c.user_id, epoch_us(MAX(e.ts)) AS prior_error_us
              FROM events c LEFT JOIN events e
                ON e.user_id = c.user_id AND e.event_type = 'error' AND e.ts < c.ts
              WHERE c.event_type = 'click'
              GROUP BY c.event_id, c.user_id ORDER BY c.event_id""")
    )
  )
}
