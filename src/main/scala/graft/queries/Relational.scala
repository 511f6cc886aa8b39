package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** The relational layer (SURVEY §2.9): dmds has no joins/aggs/windows/sorts/
  * set-ops/scalar functions — capability parity comes from Spark built-ins,
  * declared here with DuckDB oracles. Plans are left declarative so Catalyst
  * pushes filters/projections to the scans and picks broadcast joins for the
  * small dimension tables.
  */
object Relational {
  import Tables.t

  private val dec = DecimalType(18, 2)
  private def d(c: String) = col(c).cast(dec)

  val defs: Map[String, QueryDef] = Map(

    // ---------------------------------------------------------- aggregation
    "q1_agg" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          // decimal math stays internal (exact, order-independent); the FINAL
          // output is cast to DOUBLE on both sides — one exact conversion —
          // because the driver canonicalizes DECIMAL differently per engine
          sum(d("l_quantity")).cast("double").as("sum_qty"),
          sum(d("l_extendedprice")).cast("double").as("sum_base_price"),
          sum(d("l_extendedprice") * (lit(1).cast(dec) - d("l_discount"))).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
                COUNT(*) AS count_order
              FROM lineitem GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus""")
    ),

    "q_filter_pushdown" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem")
        .where(col("l_quantity") >= 48 && col("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
              WHERE l_quantity >= 48 AND l_discount > 0.05
              ORDER BY l_orderkey, l_linenumber""")
    ),

    // ---------------------------------------------------------------- joins
    "q3_top_revenue" -> QueryDef(
      (s, dir) => {
        val c = t(s, dir, "customer"); val o = t(s, dir, "orders"); val l = t(s, dir, "lineitem")
        // aggregate BELOW the join: the revenue sum is keyed by l_orderkey
        // alone, so pre-summing lineitem shrinks the widest input ~4x (rows
        // per order) BEFORE any join and leaves both join inputs one-row-per-
        // orderkey — trivially broadcastable under AQE. Customer contributes
        // no columns and no filter; its join is pure FK validation, expressed
        // as a semi join against the (unique-key) customer table so no
        // customer columns ever enter the plan. Result is identical to the
        // join-first form: the grouping key (o_orderkey) is unique after the
        // pre-agg, so no re-aggregation is needed above the join.
        val rev = l.groupBy(col("l_orderkey"))
          .agg(sum(d("l_extendedprice") * (lit(1).cast(dec) - d("l_discount"))).cast("double").as("revenue"))
        o.join(c, o("o_custkey") === c("c_custkey"), "left_semi")
          .join(rev, o("o_orderkey") === rev("l_orderkey"))
          .select(col("o_orderkey"), col("o_orderdate").cast("date").as("o_date"), col("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
              FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
              GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
              ORDER BY revenue DESC, o_orderkey LIMIT 10""")
    ),

    "q5_nation_revenue" -> QueryDef(
      (s, dir) => {
        // star join: broadcast the small dims (region/nation/supplier/customer)
        val r = broadcast(t(s, dir, "region")); val n = broadcast(t(s, dir, "nation"))
        val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem"); val su = broadcast(t(s, dir, "supplier"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(su, l("l_suppkey") === su("s_suppkey") && c("c_nationkey") === su("s_nationkey"))
          .join(n, su("s_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy("n_name")
          .agg(sum(d("l_extendedprice") * (lit(1).cast(dec) - d("l_discount"))).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY n_name ORDER BY revenue DESC, n_name""")
    ),

    "q_semi_join" -> QueryDef(
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem").where(col("l_quantity") > 45)
        o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
          .select("o_orderkey", "o_totalprice").orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders o
              WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
              ORDER BY o_orderkey""")
    ),

    "q_anti_join" -> QueryDef(
      (s, dir) => {
        val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
              ORDER BY c_custkey""")
    ),

    "q_left_join_agg" -> QueryDef(
      (s, dir) => {
        val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("order_cnt"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS order_cnt
              FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
              GROUP BY c_custkey ORDER BY c_custkey""")
    ),

    "q_full_outer" -> QueryDef(
      (s, dir) => {
        val c = t(s, dir, "customer").select("c_custkey", "c_name")
        val o = t(s, dir, "orders").groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
        c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
          .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            col("c_name"), coalesce(col("cnt"), lit(0L)).as("cnt"))
          .orderBy("custkey")
      },
      Some("""SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey, c.c_name AS c_name,
                COALESCE(o.cnt, 0) AS cnt
              FROM customer c FULL JOIN
                (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) o
                ON c.c_custkey = o.o_custkey
              ORDER BY custkey""")
    ),

    "q_cross_join" -> QueryDef(
      (s, dir) => t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select("r_name", "n_name").orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name""")
    ),

    "q_range_join" -> QueryDef(
      (s, dir) => {
        val s2 = s
        import s2.implicits._
        val bands = Seq(("B0", 0.0, 1000.0), ("B1", 1000.0, 1500.0),
          ("B2", 1500.0, 2000.0), ("B3", 2000.0, 1e9)).toDF("band", "lo", "hi")
        val p = t(s, dir, "part")
        p.join(broadcast(bands), p("p_retailprice") >= bands("lo") && p("p_retailprice") < bands("hi"))
          .select("p_partkey", "band").orderBy("p_partkey", "band")
      },
      Some("""SELECT p_partkey, b.band FROM part p
              JOIN (VALUES ('B0', 0.0, 1000.0), ('B1', 1000.0, 1500.0),
                           ('B2', 1500.0, 2000.0), ('B3', 2000.0, 1e9)) AS b(band, lo, hi)
                ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
              ORDER BY p_partkey, b.band""")
    ),

    // -------------------------------------------------------------- windows
    "q_window_topk" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""")
    ),

    // Window ORDER BY must be TOTAL for a running sum to be deterministic
    // across engines: the synthetic lineitem does NOT have unique
    // (l_orderkey, l_linenumber) (118k duplicate pairs at sf0.1), and one
    // sf0.1 pair ties on the full (suppkey, shipdate, orderkey, linenumber)
    // key with DIFFERENT quantities — either engine may order them either
    // way, producing two different prefix-sum multisets. Appending
    // l_quantity (and l_extendedprice) to the order makes any remaining tie
    // value-identical in every column the output reads, so the output
    // multiset is order-invariant. RegistrySpec's key-totality lint pins
    // this property for every windowed query.
    "q_window_running" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("l_suppkey")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber",
            "l_quantity", "l_extendedprice")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "lineitem")
          .withColumn("running_qty", sum(d("l_quantity")).over(w).cast("double"))
          .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
                  PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
              FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""")
    ),

    // GLOBAL running total — the no-PARTITION-BY window that would
    // serialize the whole table through one task. Runs on the two-phase
    // prefix-sum operator (ops.ScalableWindow): range-partition by the
    // order, window per slice keyed by spark_partition_id, broadcast prefix
    // offsets — identical answer, full parallelism. The oracle pins it to
    // the single-reducer SQL form.
    "q_running_total" -> QueryDef(
      (s, dir) => graft.ops.ScalableWindow.runningSum(
          t(s, dir, "orders"),
          Seq(col("o_orderdate"), col("o_orderkey")),
          d("o_totalprice"), "running_rev")
        .select(col("o_orderkey"), col("running_rev").cast("double").as("running_rev"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
              FROM orders ORDER BY o_orderkey""")
    ),

    // the running MIN/MAX/AVG faces of ops.ScalableWindow (the explicit
    // library path; the auto-routed exec twin is q_global_minmax_auto):
    // MIN/MAX combine slice-local prefixes with earlier-slice offsets via
    // least/greatest, AVG carries the SUM/COUNT pair — all three in the
    // fused one-pass face: ONE range exchange, one slice window, one
    // broadcast offsets join (the chained single faces measured 3x the
    // exchanges for the same answer). AVG input is integer-valued so its
    // double prefix sums are exact under any addition grouping.
    "q_running_minmax" -> QueryDef(
      (s, dir) => graft.ops.ScalableWindow.runningMinMaxAvg(
          t(s, dir, "orders"),
          Seq(col("o_totalprice"), col("o_orderkey")),
          col("o_totalprice"), col("o_custkey"),
          "run_min", "run_max", "run_avg")
        .select(col("o_orderkey"),
          col("run_min").cast("double").as("run_min"),
          col("run_max").cast("double").as("run_max"),
          col("run_avg"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                CAST(MIN(o_totalprice) OVER w AS DOUBLE) AS run_min,
                CAST(MAX(o_totalprice) OVER w AS DOUBLE) AS run_max,
                AVG(CAST(o_custkey AS DOUBLE)) OVER w AS run_avg
              FROM orders
              WINDOW w AS (ORDER BY o_totalprice, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              ORDER BY o_orderkey""")
    ),

    // GLOBAL rank/dense_rank with REAL ties (many orders per date) — the
    // tie-aware members of ops.ScalableWindow: equal keys land in one slice
    // under range partitioning, so tie groups never straddle a boundary and
    // the broadcast offsets are plain row counts (rank) / the slice's max
    // local dense rank (dense_rank). Oracle pins both to the single-reducer
    // SQL forms.
    "q_global_rank" -> QueryDef(
      (s, dir) => graft.ops.ScalableWindow.rankAndDenseRank(
          t(s, dir, "orders"), Seq(col("o_orderdate")), "rnk", "drnk")
        .select(col("o_orderkey"), col("rnk"), col("drnk"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                CAST(RANK() OVER (ORDER BY o_orderdate) AS BIGINT) AS rnk,
                CAST(DENSE_RANK() OVER (ORDER BY o_orderdate) AS BIGINT) AS drnk
              FROM orders ORDER BY o_orderkey""")
    ),

    // GLOBAL distribution statistics (PERCENT_RANK + CUME_DIST) without
    // the single-reducer window: closed forms over the two-phase rank and
    // peers-cumulative count; o_custkey gives real tie groups, and both
    // statistics are exact integer ratios so the doubles match the
    // single-reducer SQL bit-for-bit.
    "q_global_dist" -> QueryDef(
      (s, dir) => graft.ops.ScalableWindow.distribution(
          t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          Seq(col("o_custkey")), "pct", "cd")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey,
                PERCENT_RANK() OVER (ORDER BY o_custkey) AS pct,
                CUME_DIST() OVER (ORDER BY o_custkey) AS cd
              FROM orders ORDER BY o_orderkey""")
    ),

    // GLOBAL lag/lead over a total order: slice-local window plus a
    // broadcast donor table (slices x k rows) for the boundary handoff —
    // no data-sized exchange beyond the range partition itself.
    "q_global_lag" -> QueryDef(
      (s, dir) => graft.ops.ScalableWindow.lagAndLead(
          t(s, dir, "orders"), Seq(col("o_orderdate"), col("o_orderkey")),
          col("o_totalprice").cast("double"), 2, "prev2_price", "next2_price")
        .select(col("o_orderkey"), col("prev2_price"), col("next2_price"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                CAST(LAG(o_totalprice, 2) OVER (ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS prev2_price,
                CAST(LEAD(o_totalprice, 2) OVER (ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS next2_price
              FROM orders ORDER BY o_orderkey""")
    ),

    "q_window_lag" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        t(s, dir, "events")
          .withColumn("prev_value", lag("value", 1).over(w))
          .select("event_id", "user_id", "value", "prev_value")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, value,
                LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value
              FROM events ORDER BY event_id""")
    ),

    "q_window_rank" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc)
        t(s, dir, "part")
          .withColumn("rnk", rank().over(w))
          .withColumn("drnk", dense_rank().over(w))
          .select("p_brand", "p_partkey", "p_retailprice", "rnk", "drnk")
          .orderBy("p_brand", "p_partkey")
      },
      Some("""SELECT p_brand, p_partkey, p_retailprice,
                RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk,
                DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS drnk
              FROM part ORDER BY p_brand, p_partkey""")
    ),

    // -------------------------------------------------------- sort / limit
    "q_topn" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
              ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""")
    ),

    // -------------------------------------------------------------- set ops
    "q_set_union" -> QueryDef(
      (s, dir) => {
        val c = t(s, dir, "customer")
        c.where(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
          .union(c.where(col("c_acctbal") > 5000).select("c_custkey"))
          .distinct().orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
              UNION SELECT c_custkey FROM customer WHERE c_acctbal > 5000
              ORDER BY c_custkey""")
    ),
    "q_set_intersect" -> QueryDef(
      (s, dir) => {
        val c = t(s, dir, "customer")
        c.where(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
          .intersect(c.where(col("c_acctbal") > 5000).select("c_custkey"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
              INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 5000
              ORDER BY c_custkey""")
    ),
    // multiset (ALL) set ops — bag semantics preserve duplicate
    // multiplicities, which the distinct forms above erase; natural
    // duplicates come from lineitem part keys
    "q_set_intersect_all" -> QueryDef(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.where(col("l_quantity") > 45).select("l_partkey")
          .intersectAll(li.where(col("l_returnflag") === "R").select("l_partkey"))
          .orderBy("l_partkey")
      },
      Some("""SELECT l_partkey FROM lineitem WHERE l_quantity > 45
              INTERSECT ALL SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
              ORDER BY l_partkey""")
    ),
    "q_set_except_all" -> QueryDef(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.where(col("l_quantity") > 45).select("l_partkey")
          .exceptAll(li.where(col("l_returnflag") === "R").select("l_partkey"))
          .orderBy("l_partkey")
      },
      Some("""SELECT l_partkey FROM lineitem WHERE l_quantity > 45
              EXCEPT ALL SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
              ORDER BY l_partkey""")
    ),
    "q_set_except" -> QueryDef(
      (s, dir) => {
        val c = t(s, dir, "customer")
        c.where(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
          .except(c.where(col("c_acctbal") > 5000).select("c_custkey"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
              EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal > 5000
              ORDER BY c_custkey""")
    ),

    // ------------------------------------------------------------- distinct
    "q_distinct" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem").select("l_returnflag", "l_linestatus")
        .distinct().orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
              ORDER BY l_returnflag, l_linestatus""")
    ),
    "q_count_distinct" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
                CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    ),
    // HLL sketch — no DuckDB oracle (different sketch); driver rows-only check
    "q_approx_distinct" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
        .orderBy("l_returnflag"),
      None
    ),
    // …and its FULL-oracle gate: the sketch estimate itself can't hash-match
    // a different engine's sketch, but the exact per-group count and the
    // claim "the estimate is within the configured error bound" CAN. DuckDB
    // predicts the exact counts and `within_bound = 1`; Spark's HLL drifting
    // past 3×rsd (a catastrophic-failure margin — rsd is the σ of the
    // estimator, so 3σ holds with ~99.7% probability per group and the
    // groups here are far above the sparse-to-dense transition where HLL++
    // bias correction is exact) flips the flag and turns the row red. The
    // sketch family gets a hard driver-gate signal without hashing floats.
    "q_approx_distinct_gate" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey"), 0.05).as("__approx"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("__approx").cast("double") / col("exact_parts").cast("double")
            - lit(1.0)) <= lit(0.15)).cast("bigint").as("within_bound"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
                CAST(1 AS BIGINT) AS within_bound
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    ),

    // approximate-percentile gate in RANK space: the estimate itself is
    // engine-specific, but "the fraction of rows at or below the estimate
    // is within ε of the target fraction" is exactly computable on the
    // Spark side and predictable by DuckDB as `1`. accuracy=10000 bounds
    // the sketch's rank error at 1/10000, far inside the 0.02 gate, so a
    // red here means the sketch actually broke — the same hard-gate
    // discipline as q_approx_distinct_gate, for the quantile family.
    "q_approx_pct_gate" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("__est"),
          count(lit(1)).as("__n2"))
        .select(col("l_returnflag"), col("n"), col("__est"), col("__n2"))
        .join(t(s, dir, "lineitem").select("l_returnflag", "l_extendedprice"),
          Seq("l_returnflag"))
        .groupBy("l_returnflag")
        .agg(first("n").as("n2"),
          (abs(sum(when(col("l_extendedprice") <= col("__est"), 1L)
            .otherwise(0L)).cast("double") / first("__n2").cast("double")
            - lit(0.5)) <= lit(0.02)).cast("bigint").as("within_bound"))
        .select(col("l_returnflag"), col("n2").as("n"), col("within_bound"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(*) AS n, CAST(1 AS BIGINT) AS within_bound
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    ),

    // Count-Min sketch gate: the frequency-sketch sibling of the HLL and
    // percentile gates. One distributed `count_min_sketch` aggregate
    // (Spark merges per-partition sketches — the mergeability that makes
    // CMS usable at 100 TB) broadcasts as a scalar; a deterministic probe
    // key set is checked against its EXACT counts through the native
    // cms_estimate kernel. CMS can never under-count, and with the sketch
    // sized at eps=0.001/conf=0.999 the over-count past eps·N on this
    // fixed (data, seed) pair would mean the sketch itself broke — both
    // bounds fold into within_bound, which DuckDB predicts as 1.
    "q_cms_gate" -> QueryDef(
      // NOTE on the oracle's universal within_bound = 1: the CMS guarantee
      // `est <= exact + eps·N` is PROBABILISTIC (holds per key with
      // confidence 0.999) — it is deterministic for THIS fixture + seed 42,
      // verified across the generated scale factors, but a future fixture
      // or SF change can legitimately push a key past the bound. If this
      // query ever fails after a data regeneration, re-validate the bound
      // (or widen eps·N by a small multiple) before suspecting the engine.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val sk = li.agg(
          expr("count_min_sketch(l_partkey, 0.001d, 0.999d, 42)").as("__sk"),
          count(lit(1)).as("__n"))
        val probes = li.where(col("l_partkey") % 97 === 0)
          .groupBy("l_partkey").agg(count(lit(1)).as("exact_cnt"))
        val est = graft.functions.CmsEstimate(col("__sk"), col("l_partkey"))
        probes.crossJoin(broadcast(sk)) // scalar-aggregate broadcast
          .select(col("l_partkey"), col("exact_cnt"),
            ((est >= col("exact_cnt")) &&
              (est <= col("exact_cnt") +
                ceil(col("__n").cast("double") * lit(0.001)).cast("long")))
              .cast("bigint").as("within_bound"))
          .orderBy("l_partkey")
      },
      Some("""SELECT l_partkey, COUNT(*) AS exact_cnt,
                CAST(1 AS BIGINT) AS within_bound
              FROM lineitem WHERE l_partkey % 97 = 0
              GROUP BY l_partkey ORDER BY l_partkey""")
    ),

    // EQUI-DEPTH histogram (8 buckets): bounds are EXACT order statistics
    // from ops.Quantiles (one range exchange, rank filter — never a global
    // sort), folded into a 7-element broadcast array; each row's bucket =
    // |bounds below it| via a codegen'd array HOF. Exact at any scale —
    // the histogram every optimizer/skew-analysis wants, with none of
    // approx_percentile's engine-specific drift. Bounds are actual data
    // values (double pass-through), so both engines compare identical
    // bits.
    "q_equidepth" -> QueryDef(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val bounds = graft.ops.Quantiles
          .exactQuantiles(li, col("l_extendedprice"), (1 to 7).map(_ / 8.0))
          .agg(sort_array(collect_list(col("value"))).as("bs"))
        li.crossJoin(broadcast(bounds)) // scalar-aggregate broadcast
          .select(size(filter(col("bs"), b => col("l_extendedprice") > b))
            .cast("long").as("bucket"), col("l_extendedprice").as("x"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_rows"), min("x").as("lo"), max("x").as("hi"))
          .orderBy("bucket")
      },
      Some("""WITH b AS (SELECT [
                quantile_disc(l_extendedprice, 0.125),
                quantile_disc(l_extendedprice, 0.25),
                quantile_disc(l_extendedprice, 0.375),
                quantile_disc(l_extendedprice, 0.5),
                quantile_disc(l_extendedprice, 0.625),
                quantile_disc(l_extendedprice, 0.75),
                quantile_disc(l_extendedprice, 0.875)] AS bs FROM lineitem)
              SELECT CAST(len(list_filter(bs, x -> l.l_extendedprice > x))
                  AS BIGINT) AS bucket,
                COUNT(*) AS n_rows, MIN(l_extendedprice) AS lo,
                MAX(l_extendedprice) AS hi
              FROM lineitem l CROSS JOIN b
              GROUP BY bucket ORDER BY bucket""")
    ),

    // data-quality AUDIT (the dbt-test / expectations surface): four rule
    // classes — duplicate keys, null violations, range violations, and
    // referential orphans — evaluated in one pass each and unioned into a
    // (rule, n_violations) report. Each rule is the scale-right shape:
    // dup keys = one groupBy on the key, FK orphans = one anti-join
    // (broadcast when the parent is small), nulls/ranges = scan-local
    // predicates. The report is what gates a pipeline promotion.
    "q_data_quality" -> QueryDef(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        val dup = li.groupBy("l_orderkey", "l_linenumber")
          .agg(count(lit(1)).as("c")).where(col("c") > 1)
          .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n"))
          .select(lit("dup_keys").as("rule"), col("n").cast("long").as("n_violations"))
        val nulls = li.agg(
          sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("n"))
          .select(lit("null_shipdate").as("rule"), col("n").cast("long").as("n_violations"))
        val range = li.agg(
          sum(when(!col("l_quantity").between(1, 50), 1L).otherwise(0L)).as("n"))
          .select(lit("qty_range").as("rule"), col("n").cast("long").as("n_violations"))
        val orphans = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n"))
          .select(lit("fk_orphans").as("rule"), col("n").cast("long").as("n_violations"))
        dup.unionByName(nulls).unionByName(range).unionByName(orphans)
          .orderBy("rule")
      },
      Some("""SELECT 'dup_keys' AS rule,
                CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS n_violations
              FROM (SELECT COUNT(*) AS c FROM lineitem
                    GROUP BY l_orderkey, l_linenumber) WHERE c > 1
              UNION ALL
              SELECT 'null_shipdate',
                CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              FROM lineitem
              UNION ALL
              SELECT 'qty_range',
                CAST(SUM(CASE WHEN l_quantity NOT BETWEEN 1 AND 50
                         THEN 1 ELSE 0 END) AS BIGINT)
              FROM lineitem
              UNION ALL
              SELECT 'fk_orphans', CAST(COUNT(*) AS BIGINT)
              FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
              WHERE o.o_orderkey IS NULL
              ORDER BY rule""")
    ),

    // key-skew diagnosis report: the power-of-two histogram of per-key row
    // counts — the operational answer to "will this join/groupBy key
    // hot-spot at scale" BEFORE running it. Bucket = bit-length of the
    // key's count (integer-exact in both engines via length(bin(cnt)) —
    // a float log2 would jitter at exact powers of two); per bucket the
    // key population, count envelope, and row volume. Two bounded
    // shuffles: keys, then ≤64 buckets.
    "q_skew_report" -> QueryDef(
      (s, dir) => t(s, dir, "events")
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
        .groupBy(length(bin(col("cnt"))).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_keys"), min("cnt").as("min_cnt"),
          max("cnt").as("max_cnt"), sum("cnt").as("n_rows"))
        .orderBy("bucket"),
      Some("""WITH k AS (
                SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id)
              SELECT CAST(length(bin(cnt)) AS BIGINT) AS bucket,
                COUNT(*) AS n_keys, MIN(cnt) AS min_cnt, MAX(cnt) AS max_cnt,
                CAST(SUM(cnt) AS BIGINT) AS n_rows
              FROM k GROUP BY bucket ORDER BY bucket""")
    ),

    // null-safe equality join (`<=>` / IS NOT DISTINCT FROM): the join
    // semantics plain equality silently drops — NULL keys match each
    // other exactly once instead of vanishing. NULLs are planted
    // deterministically via nullif; the join stays a hash join on the
    // (null-safe) key at any scale.
    "q_null_safe_join" -> QueryDef(
      (s, dir) => {
        val o = t(s, dir, "orders")
        val a = o.select(expr("nullif(o_orderpriority, '1-URGENT')").as("k"))
          .groupBy("k").agg(count(lit(1)).as("na"))
        val b = o.select(expr("nullif(o_orderpriority, '2-HIGH')").as("k"))
          .groupBy("k").agg(count(lit(1)).as("nb"))
        a.join(b, a("k") <=> b("k"))
          .select(a("k").as("k"), col("na"), col("nb"))
          .orderBy("k")
      },
      Some("""WITH a AS (
                SELECT nullif(o_orderpriority, '1-URGENT') AS k, COUNT(*) AS na
                FROM orders GROUP BY 1),
              b AS (
                SELECT nullif(o_orderpriority, '2-HIGH') AS k, COUNT(*) AS nb
                FROM orders GROUP BY 1)
              SELECT a.k, a.na, b.nb FROM a JOIN b
                ON a.k IS NOT DISTINCT FROM b.k
              ORDER BY a.k""")
    ),

    // share-of-total per group in integer MICRO-UNITS: the "percent of
    // revenue" analytics staple, computed as one partial-aggregating
    // shuffle + a broadcast scalar total — never a global window. The
    // share is 1e6·group div total over exact decimal-derived cents, so
    // both engines produce identical integers.
    "q_share_of_total" -> QueryDef(
      (s, dir) => {
        val cents = sum((col("o_totalprice").cast(DecimalType(18, 2)) *
          lit(100)).cast("long")).as("cents")
        val per = t(s, dir, "orders").groupBy("o_orderpriority").agg(cents)
        val tot = t(s, dir, "orders").agg(cents.as("total_cents"))
        per.crossJoin(tot) // scalar-aggregate broadcast — bounded by design
          .select(col("o_orderpriority"),
            col("cents"),
            expr("CAST(1000000 * cents div total_cents AS BIGINT)")
              .as("share_micro"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH per AS (SELECT o_orderpriority,
                CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
              FROM orders GROUP BY o_orderpriority),
              tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total_cents FROM per)
              SELECT o_orderpriority, cents,
                CAST(1000000 * cents // total_cents AS BIGINT) AS share_micro
              FROM per, tot ORDER BY o_orderpriority""")
    ),

    // grouping()/grouping_id() over ROLLUP: the indicator functions that
    // let a consumer tell a real NULL group from a rollup subtotal — the
    // part of multi-level grouping q_rollup's value columns don't cover.
    // Integer-exact; DuckDB builds the same id from its GROUPING bits.
    "q_grouping_fn" -> QueryDef(
      (s, dir) => t(s, dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          expr("CAST(grouping(o_orderstatus) AS BIGINT)").as("g_status"),
          expr("CAST(grouping(o_orderpriority) AS BIGINT)").as("g_prio"),
          expr("CAST(grouping_id() AS BIGINT)").as("gid"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
                CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
                CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                  AS BIGINT) AS gid
              FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
              ORDER BY gid, o_orderstatus ASC NULLS FIRST,
                o_orderpriority ASC NULLS FIRST""")
    ),

    // exact per-group MODE with deterministic tie-break (smallest value
    // wins): two nested aggregations — (group, value) counts, then max-by
    // (count, -value) — both partial-aggregating shuffles on bounded keys.
    // Built-in mode() breaks ties arbitrarily in both engines, so the
    // oracle restates the explicit rank instead.
    "q_mode" -> QueryDef(
      (s, dir) => {
        val counts = t(s, dir, "orders")
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("cnt").desc, col("o_orderpriority"))
        counts.withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1)
          .select(col("o_orderstatus"), col("o_orderpriority").as("mode_prio"),
            col("cnt").as("mode_n"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH c AS (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
                         FROM orders GROUP BY 1, 2),
                   r AS (SELECT *, ROW_NUMBER() OVER (
                           PARTITION BY o_orderstatus
                           ORDER BY cnt DESC, o_orderpriority) AS rn FROM c)
              SELECT o_orderstatus, o_orderpriority AS mode_prio, cnt AS mode_n
              FROM r WHERE rn = 1 ORDER BY o_orderstatus""")
    ),

    // ordered string aggregation (LISTAGG): collect_list gives an
    // arbitrary-order array, so determinism comes from sorting INSIDE the
    // group before joining — the multiset of names per group is exact, and
    // the sorted join makes the rendered string engine-neutral. Bounded:
    // group count is the nation count, per-group payload the supplier
    // names of one nation.
    "q_string_agg" -> QueryDef(
      (s, dir) => t(s, dir, "supplier")
        .groupBy("s_nationkey")
        .agg(array_join(array_sort(collect_list(col("s_name"))), ",")
          .as("names"),
          count(lit(1)).as("n"))
        .orderBy("s_nationkey"),
      Some("""SELECT s_nationkey,
                string_agg(s_name, ',' ORDER BY s_name) AS names,
                COUNT(*) AS n
              FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""")
    ),

    // sketch MERGEABILITY — the property that makes sketches matter at
    // scale: distinct-counting 100 TB means building per-partition (here:
    // per fine-group) sketches and UNIONING them, never re-reading rows.
    // Datasketches HLL partials built per (flag, status) union per flag;
    // the merged estimate must land within the same 3σ gate as the
    // single-pass sketch (union of HLL sketches is lossless — the merged
    // state equals the directly-built state). Gate discipline identical to
    // q_approx_distinct_gate: DuckDB predicts exact counts and the flag.
    "q_hll_merge" -> QueryDef(
      (s, dir) => {
        val partials = t(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
        val merged = partials.groupBy("l_returnflag")
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("__est"))
        val exact = t(s, dir, "lineitem").groupBy("l_returnflag")
          .agg(countDistinct(col("l_partkey")).as("exact_parts"))
        exact.join(merged, Seq("l_returnflag"))
          .select(col("l_returnflag"), col("exact_parts"),
            (abs(col("__est").cast("double") / col("exact_parts").cast("double")
              - lit(1.0)) <= lit(0.15)).cast("bigint").as("within_bound"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
                CAST(1 AS BIGINT) AS within_bound
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    ),

    // ------------------------------------------------- rollup / cube / sets
    // rollup/cube/grouping-sets all pre-aggregate to the FINEST grouping
    // first: Catalyst plans multi-level groupings as Expand over every
    // input row (x levels), but sum/count are decomposable, so Expand only
    // needs to see the (flag, status) pre-aggregate — 6 rows instead of
    // the whole fact table. At any scale the fact table passes through one
    // ordinary partial-agg shuffle; the multi-level machinery runs on the
    // group cardinality. (2.2 s -> ~0.3 s at sf0.1 for the rollup.)
    "q_rollup" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(d("l_quantity")).as("s"), count(lit(1)).as("c"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum(col("s")).cast("double").as("sum_qty"), sum(col("c")).as("n"))
        .orderBy(coalesce(col("l_returnflag"), lit("~")), coalesce(col("l_linestatus"), lit("~"))),
      Some("""SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                COUNT(*) AS n
              FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
              ORDER BY COALESCE(l_returnflag, '~'), COALESCE(l_linestatus, '~')""")
    ),
    "q_cube" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("c"))
        .cube("l_returnflag", "l_linestatus")
        .agg(sum(col("c")).as("n"))
        .orderBy(coalesce(col("l_returnflag"), lit("~")), coalesce(col("l_linestatus"), lit("~"))),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n
              FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
              ORDER BY COALESCE(l_returnflag, '~'), COALESCE(l_linestatus, '~')""")
    ),
    "q_grouping_sets" -> QueryDef(
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""WITH pre AS (
                   SELECT l_returnflag, l_linestatus, COUNT(*) AS c
                   FROM lineitem GROUP BY l_returnflag, l_linestatus)
                 SELECT l_returnflag, l_linestatus, SUM(c) AS n
                 FROM pre GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
                 ORDER BY COALESCE(l_returnflag, '~'), COALESCE(l_linestatus, '~')""")
      },
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n
              FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
              ORDER BY COALESCE(l_returnflag, '~'), COALESCE(l_linestatus, '~')""")
    ),

    // ----------------------------------------------------- scalar functions
    "q_string_fns" -> QueryDef(
      (s, dir) => t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("name_u"),
        substring(col("p_type"), 1, 5).as("type5"),
        length(col("p_name")).cast("long").as("name_len"),
        concat(col("p_brand"), lit("-"), col("p_type")).as("brand_type"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, UPPER(p_name) AS name_u, SUBSTRING(p_type, 1, 5) AS type5,
                CAST(LENGTH(p_name) AS BIGINT) AS name_len,
                CONCAT(p_brand, '-', p_type) AS brand_type
              FROM part ORDER BY p_partkey""")
    ),
    "q_date_fns" -> QueryDef(
      (s, dir) => t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
                CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
                CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
              FROM orders ORDER BY o_orderkey""")
    ),
    "q_math_fns" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("dd"),
        floor(col("l_extendedprice")).as("fl"),
        ceil(col("l_quantity")).as("ce"),
        sqrt(col("l_extendedprice")).as("sq"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, ABS(l_discount - 0.05) AS dd,
                CAST(FLOOR(l_extendedprice) AS BIGINT) AS fl,
                CAST(CEIL(l_quantity) AS BIGINT) AS ce,
                SQRT(l_extendedprice) AS sq
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")
    ),
    "q_case_agg" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem").groupBy("l_linestatus")
        .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"),
          count(lit(1)).as("n"))
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
                CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
                COUNT(*) AS n
              FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")
    ),
    "q_props_regex" -> QueryDef(
      (s, dir) => t(s, dir, "events").select(
        col("event_id"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
              FROM events ORDER BY event_id""")
    )
  )
}
