package graft.queries

import graft.functions.TypedAggs
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Second-wave operator coverage: typed Aggregator (UDAF), explode (UDTF),
  * range-frame and ntile windows, exact percentile, and a JSON sink/source
  * roundtrip (IoHandle-pluggability analog: the engine's tables are not
  * parquet-only).
  */
object Extended {
  import Tables.t

  val defs: Map[String, QueryDef] = Map(

    // wide-to-long reshaping (UNPIVOT/melt): four measure columns of a
    // lineitem slice become (measure, val) rows — the inverse of q_pivot.
    // Narrow per-row fan-out (no shuffle); the oracle restates it as the
    // canonical UNION ALL. Value column keeps raw double bits (pass-through,
    // no summation).
    "q_unpivot" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem")
        .where(col("l_orderkey") < 400)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "val")
        .orderBy("l_orderkey", "l_linenumber", "measure"),
      Some("""SELECT l_orderkey, l_linenumber, m AS measure, v AS val FROM (
                SELECT l_orderkey, l_linenumber, 'l_quantity' AS m, l_quantity AS v
                  FROM lineitem WHERE l_orderkey < 400
                UNION ALL
                SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
                  FROM lineitem WHERE l_orderkey < 400
                UNION ALL
                SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
                  FROM lineitem WHERE l_orderkey < 400
                UNION ALL
                SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
                  FROM lineitem WHERE l_orderkey < 400)
              ORDER BY l_orderkey, l_linenumber, measure"""),
    ),

    // grouped least-squares regression + Pearson correlation, EXACTLY:
    // built-in corr()/regr_slope() sum doubles (addition-order-dependent —
    // can never hash-match across engines), so the five moment sums are
    // taken in DECIMAL (exact, order-independent), cast once to double, and
    // the closed forms are evaluated in identically-parenthesized IEEE
    // arithmetic on both sides. One partial-aggregating shuffle at any
    // scale; the moment formulation is also how a 1000-executor regression
    // actually runs (map-side partials, one combine).
    "q_corr_regr" -> QueryDef(
      (s, dir) => {
        val dec = org.apache.spark.sql.types.DecimalType(18, 2)
        val x = col("l_quantity").cast(dec)
        val y = col("l_extendedprice").cast(dec)
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum(x).cast("double").as("sx"),
            sum(y).cast("double").as("sy"),
            sum(x * y).cast("double").as("sxy"),
            sum(x * x).cast("double").as("sxx"),
            sum(y * y).cast("double").as("syy"))
          .select(col("l_returnflag"), col("n"),
            expr("(CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx)").as("slope"),
            expr("(sy - ((CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx) / CAST(n AS DOUBLE)").as("intercept"),
            expr("(CAST(n AS DOUBLE) * sxy - sx * sy) / SQRT((CAST(n AS DOUBLE) * sxx - sx * sx) * (CAST(n AS DOUBLE) * syy - sy * sy))").as("corr"))
          .orderBy("l_returnflag")
      },
      Some("""WITH s AS (
                SELECT l_returnflag, COUNT(*) AS n,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
                  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
                FROM lineitem GROUP BY l_returnflag)
              SELECT l_returnflag, n,
                (CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope,
                (sy - ((CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx) / CAST(n AS DOUBLE) AS intercept,
                (CAST(n AS DOUBLE) * sxy - sx * sy) / SQRT((CAST(n AS DOUBLE) * sxx - sx * sx) * (CAST(n AS DOUBLE) * syy - sy * sy)) AS corr
              FROM s ORDER BY l_returnflag"""),
    ),

    // typed Aggregator with mergeable buffer: exact cents sum of o_totalprice
    "q_typed_agg" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val sumCents = udaf(TypedAggs.CentsSum)
        t(s, dir, "orders").groupBy("o_orderstatus")
          .agg(sumCents(col("o_totalprice")).as("total_cents"),
            count(lit(1)).as("n"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus,
                CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
                COUNT(*) AS n
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    ),

    // bounded top-k typed Aggregator: the buffer stays k elements per group
    // regardless of group size (vs a window rank, which sorts every row) —
    // the scale-correct pattern for "top k per key" on skewed groups
    "q_topk_agg" -> QueryDef(
      (s, dir) => {
        val topk = udaf(TypedAggs.TopK(3))
        t(s, dir, "orders").groupBy("o_orderstatus")
          .agg(topk(col("o_totalprice")).as("tk"))
          .select(col("o_orderstatus"), posexplode(col("tk")).as(Seq("i", "val")))
          .select(col("o_orderstatus"), (col("i") + 1).cast("long").as("rank"), col("val"))
          .orderBy("o_orderstatus", "rank")
      },
      Some("""SELECT o_orderstatus, CAST(rn AS BIGINT) AS rank, val FROM (
                SELECT o_orderstatus, o_totalprice AS val,
                  ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS rn
                FROM orders) WHERE rn <= 3 ORDER BY o_orderstatus, rank""")
    ),

    // UDTF-style lateral explode: one row per word
    "q_explode_words" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .where(col("doc_id") < 10)
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("word"))
        .orderBy("doc_id", "word"),
      Some("""SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
              FROM documents WHERE doc_id < 10 ORDER BY doc_id, word""")
    ),

    // RANGE window frame over a numeric ordering key
    "q_window_range_frame" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("l_suppkey").orderBy(col("l_orderkey"))
          .rangeBetween(-100L, 0L)
        t(s, dir, "lineitem")
          .groupBy("l_suppkey", "l_orderkey")
          .agg(count(lit(1)).as("n_lines"))
          .withColumn("n_near", sum(col("n_lines")).over(w))
          .orderBy("l_suppkey", "l_orderkey")
      },
      Some("""WITH g AS (
                SELECT l_suppkey, l_orderkey, COUNT(*) AS n_lines
                FROM lineitem GROUP BY l_suppkey, l_orderkey)
              SELECT l_suppkey, l_orderkey, n_lines,
                CAST(SUM(n_lines) OVER (PARTITION BY l_suppkey ORDER BY l_orderkey
                  RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_near
              FROM g ORDER BY l_suppkey, l_orderkey""")
    ),

    // global NTILE + PERCENT_RANK on the scalable two-phase path (was the
    // registry's last single-reducer global window — caught by
    // RegistryScaleSpec): one range partition, closed forms from the
    // per-slice row number, oracle-pinned to the single-reducer SQL
    "q_window_ntile" -> QueryDef(
      (s, dir) => graft.ops.ScalableWindow.ntileAndPercentRank(
          t(s, dir, "customer").select("c_custkey", "c_acctbal"),
          Seq(col("c_acctbal").desc, col("c_custkey")), 4, "quartile", "pr")
        .select("c_custkey", "quartile", "pr")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
                CAST(NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS quartile,
                PERCENT_RANK() OVER (ORDER BY c_acctbal DESC, c_custkey) AS pr
              FROM customer ORDER BY c_custkey""")
    ),

    // pivot: one output column per o_orderstatus value — the relational
    // transpose. Exact decimal sums internally; DOUBLE out (decimal rule)
    "q_pivot" -> QueryDef(
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))))
        .select(col("o_orderpriority"),
          col("O").cast("double").as("s_o"),
          col("F").cast("double").as("s_f"),
          col("P").cast("double").as("s_p"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
                CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS s_o,
                CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS s_f,
                CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS s_p
              FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    ),

    // distribution + navigation window functions not covered elsewhere:
    // cume_dist, lead, first_value (unique ordering keeps all deterministic)
    "q_window_dist" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal"), col("c_custkey"))
        t(s, dir, "customer").select(
          col("c_custkey"),
          cume_dist().over(w).as("cd"),
          lead(col("c_custkey"), 1).over(w).as("next_key"),
          first(col("c_custkey")).over(w).as("first_key"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
                CUME_DIST() OVER w AS cd,
                LEAD(c_custkey, 1) OVER w AS next_key,
                FIRST_VALUE(c_custkey) OVER w AS first_key
              FROM customer
              WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
              ORDER BY c_custkey""")
    ),

    // running DISTINCT COUNT over a window: Spark has no DISTINCT window
    // aggregate, so the idiomatic form is size(collect_set()) over the
    // running frame — integer-exact, and bounded by the distinct-value
    // cardinality of the column (event types), not the frame length.
    // DuckDB supports COUNT(DISTINCT) OVER directly; same integers.
    "q_window_distinct" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events").where(col("user_id") < 40)
          .select(col("user_id"), col("event_id"),
            size(collect_set(col("event_type")).over(w)).cast("long")
              .as("n_types_seen"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
                CAST(COUNT(DISTINCT event_type) OVER (
                  PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS n_types_seen
              FROM events WHERE user_id < 40
              ORDER BY user_id, event_id""")
    ),

    // median absolute deviation per group — the robust dispersion measure
    // (stddev is outlier-poisoned exactly where robust pipelines need
    // dispersion): two exact interpolated-percentile passes, the second
    // over |x − median| with the group median attached by a broadcast-size
    // join. Both engines interpolate identically over identical doubles.
    "q_mad" -> QueryDef(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val med = li.groupBy("l_returnflag")
          .agg(expr("percentile(l_quantity, 0.5)").as("med"))
        li.join(med, "l_returnflag")
          .groupBy("l_returnflag")
          .agg(first("med").as("median_qty"),
            expr("percentile(abs(l_quantity - med), 0.5)").as("mad_qty"))
          .orderBy("l_returnflag")
      },
      Some("""WITH m AS (SELECT l_returnflag,
                quantile_cont(l_quantity, 0.5) AS med
              FROM lineitem GROUP BY l_returnflag)
              SELECT l.l_returnflag, ANY_VALUE(m.med) AS median_qty,
                quantile_cont(abs(l.l_quantity - m.med), 0.5) AS mad_qty
              FROM lineitem l JOIN m ON m.l_returnflag = l.l_returnflag
              GROUP BY l.l_returnflag ORDER BY l.l_returnflag""")
    ),

    // nth_value + percent_rank — the remaining navigation/distribution
    // window forms (unique ordering keeps both deterministic; percent_rank
    // is exact rational arithmetic rendered in double identically by both
    // engines)
    "q_window_nth" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal"), col("c_custkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val wo = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal"), col("c_custkey"))
        t(s, dir, "customer").select(
          col("c_custkey"),
          nth_value(col("c_custkey"), 3).over(w).as("third_key"),
          percent_rank().over(wo).as("pr"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
                NTH_VALUE(c_custkey, 3) OVER (
                  PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                  AS third_key,
                PERCENT_RANK() OVER (
                  PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS pr
              FROM customer ORDER BY c_custkey""")
    ),

    // exact interpolated median per group (DuckDB quantile_cont equivalent)
    "q_percentile" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                quantile_cont(l_quantity, 0.5) AS median_qty,
                quantile_cont(l_quantity, 0.9) AS p90_qty
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    ),

    // the auto-routed global window END TO END through the ORACLE GATE:
    // installs GlobalWindowRewrite + ScalableWindowStrategy via
    // spark.experimental (the runtime face of the GraftExtensions
    // registration — same mechanism World uses for its pruning rule), then
    // runs raw global-window SQL. The optimizer swaps the single-reducer
    // WindowExec for ScalableWindowExec — one owned range shuffle, totals
    // and output from the same shuffle files — and DuckDB checks the
    // values. RANK/ROW_NUMBER/running-SUM share one ORDER BY, so ONE exec
    // node computes all three; the decimal running sum exercises the ANSI
    // overflow-checked addition path. Rank emitted as BIGINT on both
    // engines (Spark's rank is int32, DuckDB's int64).
    "q_global_window_auto" -> QueryDef(
      (s, dir) => {
        // an ISOLATED session (shared context, fresh sessionState): the
        // install must not leak into the shared registry session, where it
        // would make every later query's plan depend on run order. Runtime
        // SQL confs do NOT carry across newSession — copy them so this
        // query honors the same settings as every other registry query
        val s2 = s.newSession()
        s.conf.getAll.foreach { case (k, v) =>
          try s2.conf.set(k, v) catch { case _: Exception => () } // static confs
        }
        val exp = s2.experimental
        exp.extraOptimizations = exp.extraOptimizations :+ graft.plans.GlobalWindowRewrite()
        exp.extraStrategies = exp.extraStrategies :+ graft.plans.ScalableWindowStrategy
        t(s2, dir, "orders").createOrReplaceTempView("orders")
        // the order includes the unique o_orderkey, so the aggregate's
        // default RANGE frame equals ROWS (no peers) — engine-identical
        s2.sql("""SELECT o_orderkey,
                   CAST(RANK() OVER w AS BIGINT) AS rnk,
                   CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                     AS DECIMAL(18,2)) AS DOUBLE) AS run_total
                 FROM orders
                 WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
                 ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey,
                RANK() OVER w AS rnk,
                ROW_NUMBER() OVER w AS rn,
                CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                  AS DECIMAL(18,2)) AS DOUBLE) AS run_total
              FROM orders
              WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
              ORDER BY o_orderkey""")
    ),

    // the MIN/MAX/AVG side of the auto-route, through the same oracle gate:
    // all three are prefix-decomposable (MIN/MAX are order-insensitive;
    // AVG = the SUM/COUNT pair the exec already computes), so an ad-hoc
    // `min(x) OVER (ORDER BY …)` no longer funnels through one core. The
    // running MIN/MAX take no arithmetic (both engines pick the same stored
    // value); the AVG input is integer-valued so its double prefix sums are
    // exact under any addition grouping — engine-identical without a
    // decimal detour. The order key includes unique o_orderkey, so the
    // default RANGE frame equals ROWS on both engines.
    "q_global_minmax_auto" -> QueryDef(
      (s, dir) => {
        val s2 = s.newSession()
        s.conf.getAll.foreach { case (k, v) =>
          try s2.conf.set(k, v) catch { case _: Exception => () } // static confs
        }
        val exp = s2.experimental
        exp.extraOptimizations = exp.extraOptimizations :+ graft.plans.GlobalWindowRewrite()
        exp.extraStrategies = exp.extraStrategies :+ graft.plans.ScalableWindowStrategy
        t(s2, dir, "orders").createOrReplaceTempView("orders")
        s2.sql("""SELECT o_orderkey,
                   CAST(MIN(o_totalprice) OVER w AS DOUBLE) AS run_min,
                   CAST(MAX(o_totalprice) OVER w AS DOUBLE) AS run_max,
                   AVG(CAST(o_custkey AS DOUBLE)) OVER w AS run_avg
                 FROM orders
                 WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
                 ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey,
                CAST(MIN(o_totalprice) OVER w AS DOUBLE) AS run_min,
                CAST(MAX(o_totalprice) OVER w AS DOUBLE) AS run_max,
                AVG(CAST(o_custkey AS DOUBLE)) OVER w AS run_avg
              FROM orders
              WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
              ORDER BY o_orderkey""")
    ),

    // LAG/LEAD auto-routed under the OPT-IN total-order assertion,
    // end-to-end through the oracle gate: the session sets
    // spark.graft.window.assumeTotalOrder=true and the order key ends in
    // unique o_orderkey, so the assertion holds — and the exec VERIFIES it
    // at runtime (ties anywhere would fail the query loudly rather than
    // emit donor values from a different tie permutation). Cross-slice
    // boundary rows take their values from driver-assembled slice
    // head/tail donors; the explicit-default LAG exercises the
    // out-of-range path on both engines.
    "q_global_lag_auto" -> QueryDef(
      (s, dir) => {
        val s2 = s.newSession()
        s.conf.getAll.foreach { case (k, v) =>
          try s2.conf.set(k, v) catch { case _: Exception => () } // static confs
        }
        s2.conf.set("spark.graft.window.assumeTotalOrder", "true")
        val exp = s2.experimental
        exp.extraOptimizations = exp.extraOptimizations :+ graft.plans.GlobalWindowRewrite()
        exp.extraStrategies = exp.extraStrategies :+ graft.plans.ScalableWindowStrategy
        t(s2, dir, "orders").createOrReplaceTempView("orders")
        s2.sql("""SELECT o_orderkey,
                   LAG(o_totalprice, 3) OVER w AS lag3,
                   LEAD(o_totalprice, 2) OVER w AS lead2,
                   LAG(o_totalprice, 1, -1.0) OVER w AS lag1d,
                   CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn
                 FROM orders
                 WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
                 ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey,
                LAG(o_totalprice, 3) OVER w AS lag3,
                LEAD(o_totalprice, 2) OVER w AS lead2,
                LAG(o_totalprice, 1, -1.0) OVER w AS lag1d,
                ROW_NUMBER() OVER w AS rn
              FROM orders
              WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
              ORDER BY o_orderkey""")
    ),

    // EXACT global quantiles (percentile_disc order statistics) WITHOUT a
    // global sort: ops.Quantiles rides the ScalableWindow two-phase row
    // number — one range exchange, no single-reducer stage — and keeps only
    // the rows at ranks ceil(q*N). The alternative at 100 TB is either an
    // approximation (percentile_approx) or a data-sized serialization
    // point; this is neither. DuckDB's quantile_disc has the same
    // ceil-rank semantics (probed: n=4 agrees on all boundary fractions).
    "q_exact_quantile" -> QueryDef(
      (s, dir) => graft.ops.Quantiles.exactQuantiles(
        t(s, dir, "lineitem"), col("l_extendedprice"),
        Seq(0.25, 0.5, 0.75, 0.95)).orderBy("q"),
      Some("""WITH s AS (
                SELECT quantile_disc(l_extendedprice, 0.25) AS v1,
                       quantile_disc(l_extendedprice, 0.50) AS v2,
                       quantile_disc(l_extendedprice, 0.75) AS v3,
                       quantile_disc(l_extendedprice, 0.95) AS v4
                FROM lineitem)
              SELECT CAST(0.25 AS DOUBLE) AS q, CAST(v1 AS DOUBLE) AS value FROM s
              UNION ALL SELECT CAST(0.50 AS DOUBLE), CAST(v2 AS DOUBLE) FROM s
              UNION ALL SELECT CAST(0.75 AS DOUBLE), CAST(v3 AS DOUBLE) FROM s
              UNION ALL SELECT CAST(0.95 AS DOUBLE), CAST(v4 AS DOUBLE) FROM s
              ORDER BY q""")
    ),

    // per-GROUP exact quantiles: a window PARTITIONED by the key
    // parallelizes across groups (no single-reducer stage to remove), so
    // the grouped problem needs no custom exec — one hash exchange, one
    // sort, rank-filtered to |groups| x |fractions| rows. Same
    // quantile_disc ceil-rank semantics as q_exact_quantile, per group.
    "q_group_quantile" -> QueryDef(
      (s, dir) => graft.ops.Quantiles.groupedExactQuantiles(
        t(s, dir, "lineitem"), col("l_returnflag"), col("l_extendedprice"),
        Seq(0.25, 0.5, 0.9)).orderBy("key", "q"),
      Some("""WITH s AS (
                SELECT l_returnflag AS key,
                       quantile_disc(l_extendedprice, 0.25) AS v1,
                       quantile_disc(l_extendedprice, 0.50) AS v2,
                       quantile_disc(l_extendedprice, 0.90) AS v3
                FROM lineitem GROUP BY 1)
              SELECT key, CAST(0.25 AS DOUBLE) AS q, CAST(v1 AS DOUBLE) AS value FROM s
              UNION ALL SELECT key, CAST(0.50 AS DOUBLE), CAST(v2 AS DOUBLE) FROM s
              UNION ALL SELECT key, CAST(0.90 AS DOUBLE), CAST(v3 AS DOUBLE) FROM s
              ORDER BY key, q""")
    ),

    // skew-resistant aggregation: event_type is a heavy-hitter key (a handful
    // of values over all rows); the salted two-phase plan balances the shuffle
    // and still matches the direct GROUP BY exactly (decimal sums are
    // order-independent)
    "q_skew_salted_agg" -> QueryDef(
      (s, dir) => graft.functions.Skew.saltedCountSum(
        t(s, dir, "events"), col("event_type"), "event_type",
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)), salts = 16)
        // exact decimal sum internally; final output as DOUBLE (exact
        // conversion) so both engines canonicalize identically
        .withColumn("s", col("s").cast("double"))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s
              FROM events GROUP BY event_type ORDER BY event_type""")
    ),

    // VERSION + decode(version,...) analog (reference src/lib.rs:41): old-format
    // files lack a column; mergeSchema reads both generations, old rows null
    // exact heavy hitters (users with >= 0.8% of all events) via the
    // two-phase scheme in ops.HeavyHitters: per-partition local counting
    // emits only keys above the pigeonhole floor, the exact verify recounts
    // candidates only — the long tail never shuffles, which is the whole
    // game when key cardinality rivals row count. The threshold derives
    // from a parquet metadata-only count() (no data read). Result is EXACT,
    // hence the plain GROUP BY / HAVING oracle.
    "q_heavy_hitters" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val minCount = math.ceil(ev.count() * 0.008).toLong
        graft.ops.HeavyHitters.exact(ev.select("user_id"), "user_id", minCount)
          .orderBy("user_id")
      },
      Some("""SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
              HAVING COUNT(*) >= CEIL(0.008 * (SELECT COUNT(*) FROM events))
              ORDER BY user_id""")
    ),

    // STRING-keyed exact heavy hitters — the shape the op actually meets at
    // 100 TB (URLs, domains, user-agents, tokens): frequent words across
    // the corpus, >= 3.3% of all tokens. Exercises HeavyHitters.exactString
    // (capped local map; overflow flushes evictees into the candidate set,
    // so high-cardinality keys widen candidates instead of growing memory).
    // Tokenization matches the DSIR/token queries (lower, split \s+, drop
    // empties) so the oracle unnest is engine-identical.
    "q_heavy_hitters_str" -> QueryDef(
      (s, dir) => {
        // PIN the exploded words: the threshold-from-data framing needs a
        // count of the same token stream the heavy-hitter pass scans, and
        // without the pin that meant exploding the corpus once for count()
        // and again (twice — candidates + verify) for the pass. One eager
        // materialization feeds all three reads; Verify/Bench release the
        // blocks after the query's terminal action (the Pins contract).
        val words = graft.ops.Pins.pin(t(s, dir, "documents")
          .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
          .where(col("word") =!= ""))
        val minCount = math.ceil(words.count() * 0.033).toLong
        graft.ops.HeavyHitters.exactString(words, "word", minCount)
          .orderBy("word")
      },
      Some("""WITH w AS (
                SELECT unnest(list_filter(
                  string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS word
                FROM documents)
              SELECT word, COUNT(*) AS n FROM w GROUP BY word
              HAVING COUNT(*) >= CEIL(0.033 * (SELECT COUNT(*) FROM w))
              ORDER BY word""")
    ),

    "w_schema_evolution" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val out = s"/tmp/graft_schema_ev_${dir.replaceAll("[^0-9a-zA-Z]", "_")}"
        val n = t(s, dir, "nation")
        n.select(col("n_nationkey"), col("n_name"))
          .where(col("n_nationkey") % 2 === 0)
          .write.mode("overwrite").parquet(out)
        n.select(col("n_nationkey"), col("n_name"),
            col("n_regionkey").cast("long").as("rk"))
          .where(col("n_nationkey") % 2 =!= 0)
          .write.mode("append").parquet(out)
        s.read.option("mergeSchema", "true").parquet(out).orderBy("n_nationkey")
      },
      Some("""SELECT n_nationkey, n_name,
                CASE WHEN n_nationkey % 2 <> 0 THEN CAST(n_regionkey AS BIGINT) END AS rk
              FROM nation ORDER BY n_nationkey""")
    ),

    // sink/source pluggability: world contents -> JSON lines -> read back
    // JSON functions over the REAL json column (events.props): ONE
    // schema-ful from_json per row (all needed paths in the struct schema)
    // feeding the aggregate — never a second parse path per field. Per-row
    // parse, codegen'd, shuffle only on the tiny event_type key.
    "q_json_fns" -> QueryDef(
      (s, dir) => t(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n,
                CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
                MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
              FROM events GROUP BY event_type ORDER BY event_type""")
    ),

    // nested types + higher-order functions: per-order array-of-struct
    // assembly (sorted by (line number, quantity) — line numbers repeat
    // within an order, so the tie-break must be explicit on both engines),
    // then transform / aggregate-fold /
    // element_at over it. Every EMITTED column is a scalar (nested structs
    // and arrays stay internal — the transform result is array_join'd to a
    // string, since a correctness-gate output must be sortable/hashable by
    // a generic harness). The collect_list is per-order (bounded by
    // lines-per-order, ~4), never a corpus-wide collect.
    "q_complex_types" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(struct(
          col("l_linenumber").as("ln"),
          col("l_quantity").as("q")))).as("items"))
        .select(col("l_orderkey"),
          size(col("items")).cast("long").as("n_items"),
          // DECIMAL(18,2) fixes the rounding, but a decimal OUTPUT column is
          // gate-incompatible: the driver reads Spark's parquet decimal as
          // Decimal("25.50") while DuckDB's pandas bridge renders float64
          // 25.5 — same value, different canon, hash mismatch (round-7
          // verdict). The fold is order-deterministic over the sorted array,
          // so the post-rounding double is bit-identical on both engines.
          expr("aggregate(items, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.q)")
            .cast("decimal(18,2)").cast("double").as("total_qty"),
          expr("array_join(transform(items, x -> CAST(x.ln AS STRING)), ',')")
            .as("line_numbers"),
          element_at(col("items"), 1).getField("q").as("first_qty"))
        .orderBy("l_orderkey"),
      Some("""WITH g AS (
                SELECT l_orderkey,
                  list(struct_pack(ln := l_linenumber, q := l_quantity)
                    ORDER BY l_linenumber, l_quantity) AS items
                FROM lineitem GROUP BY l_orderkey)
              SELECT l_orderkey,
                CAST(len(items) AS BIGINT) AS n_items,
                CAST(CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(items, x -> x.q)), (acc, x) -> acc + x)
                  AS DECIMAL(18,2)) AS DOUBLE) AS total_qty,
                array_to_string(list_transform(items, x -> x.ln), ',') AS line_numbers,
                items[1].q AS first_qty
              FROM g ORDER BY l_orderkey""")
    ),

    // table profiling (the ANALYZE surface): per-column row/null/distinct
    // counts and min/max, one branch per column unioned — each branch is a
    // COLUMN-PRUNED single-column scan with an ordinary two-phase
    // aggregate. (The one-scan multi-distinct alternative plans an Expand
    // that multiplies every fact row by the column count before partial
    // aggregation — more bytes read per branch avoided, but x5 the agg
    // input; measured 3x slower at sf0.1.) Stats columns are
    // bigint/varchar only so the min/max string forms are engine-neutral.
    "q_profile" -> QueryDef(
      (s, dir) => {
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
        cols.map { c =>
          t(s, dir, "orders").agg(
            count(lit(1)).as("n_rows"),
            (count(lit(1)) - count(col(c))).as("n_nulls"),
            countDistinct(col(c)).as("n_distinct"),
            min(col(c)).cast("string").as("min_s"),
            max(col(c)).cast("string").as("max_s"))
            .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
              col("n_distinct"), col("min_s"), col("max_s"))
        }.reduce(_.unionByName(_)).orderBy("col_name")
      },
      Some("""WITH s AS (
                SELECT COUNT(*) AS n_rows,
                  COUNT(o_orderkey) AS nn1, COUNT(DISTINCT o_orderkey) AS nd1,
                  CAST(MIN(o_orderkey) AS VARCHAR) AS mn1, CAST(MAX(o_orderkey) AS VARCHAR) AS mx1,
                  COUNT(o_custkey) AS nn2, COUNT(DISTINCT o_custkey) AS nd2,
                  CAST(MIN(o_custkey) AS VARCHAR) AS mn2, CAST(MAX(o_custkey) AS VARCHAR) AS mx2,
                  COUNT(o_orderstatus) AS nn3, COUNT(DISTINCT o_orderstatus) AS nd3,
                  MIN(o_orderstatus) AS mn3, MAX(o_orderstatus) AS mx3,
                  COUNT(o_orderpriority) AS nn4, COUNT(DISTINCT o_orderpriority) AS nd4,
                  MIN(o_orderpriority) AS mn4, MAX(o_orderpriority) AS mx4
                FROM orders)
              SELECT u.* FROM s, LATERAL (
                SELECT 'o_orderkey' AS col_name, n_rows, n_rows - nn1 AS n_nulls,
                  nd1 AS n_distinct, mn1 AS min_s, mx1 AS max_s
                UNION ALL SELECT 'o_custkey', n_rows, n_rows - nn2, nd2, mn2, mx2
                UNION ALL SELECT 'o_orderstatus', n_rows, n_rows - nn3, nd3, mn3, mx3
                UNION ALL SELECT 'o_orderpriority', n_rows, n_rows - nn4, nd4, mn4, mx4
              ) u ORDER BY col_name""")
    ),

    // z-order clustering key: the Morton interleave of (l_partkey,
    // l_suppkey) under a 2-dim box predicate — the layout op ZOrder.cluster
    // sorts by (see ZOrderSpec for the measured files-touched win); here the
    // KEY ITSELF is oracle-checked bit-for-bit against DuckDB re-deriving
    // the interleave arithmetically, so the curve both engines would
    // cluster by is provably the same curve.
    "w_zorder" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem")
        .where(col("l_partkey").between(100, 300) && col("l_suppkey").between(10, 40))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"),
          graft.ops.ZOrder.zvalue(col("l_partkey"), col("l_suppkey")).as("z"))
        .orderBy("z", "l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                CAST(list_sum(list_transform(range(0, 31),
                  b -> (((l_partkey >> b) & 1) << (2*b))
                     + (((l_suppkey >> b) & 1) << (2*b + 1)))) AS BIGINT) AS z
              FROM lineitem
              WHERE l_partkey BETWEEN 100 AND 300 AND l_suppkey BETWEEN 10 AND 40
              ORDER BY z, l_orderkey, l_linenumber""")
    ),

    "w_io_json_roundtrip" -> QueryDef(
      (s, dir) => {
        val out = s"/tmp/graft_json_rt_${dir.replaceAll("[^0-9a-zA-Z]", "_")}"
        t(s, dir, "nation").coalesce(1).write.mode("overwrite").json(out)
        s.read.json(out)
          .select(col("n_nationkey").cast("long").as("n_nationkey"),
            col("n_name"), col("n_regionkey").cast("long").as("n_regionkey"))
          .orderBy("n_nationkey")
      },
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
                CAST(n_regionkey AS BIGINT) AS n_regionkey
              FROM nation ORDER BY n_nationkey""")
    ),

    // sink/source pluggability, CSV face: header + explicit read schema (no
    // inference — deterministic types), doubles round-trip losslessly via
    // shortest-representation printing
    "w_io_csv_roundtrip" -> QueryDef(
      (s, dir) => {
        val out = s"/tmp/graft_csv_rt_${dir.replaceAll("[^0-9a-zA-Z]", "_")}"
        t(s, dir, "supplier").coalesce(1).write.mode("overwrite")
          .option("header", "true").csv(out)
        s.read.option("header", "true")
          .schema("s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE")
          .csv(out)
          .select(col("s_suppkey"), col("s_name"),
            col("s_nationkey").cast("long").as("s_nationkey"), col("s_acctbal"))
          .orderBy("s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey,
                s_acctbal
              FROM supplier ORDER BY s_suppkey""")
    ),

    // sink/source pluggability, ORC face: schema carried by the format
    "w_io_orc_roundtrip" -> QueryDef(
      (s, dir) => {
        val out = s"/tmp/graft_orc_rt_${dir.replaceAll("[^0-9a-zA-Z]", "_")}"
        t(s, dir, "supplier").coalesce(1).write.mode("overwrite").orc(out)
        s.read.orc(out)
          .select(col("s_suppkey"), col("s_name"),
            col("s_nationkey").cast("long").as("s_nationkey"), col("s_acctbal"))
          .orderBy("s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey,
                s_acctbal
              FROM supplier ORDER BY s_suppkey""")
    )
  )
}
