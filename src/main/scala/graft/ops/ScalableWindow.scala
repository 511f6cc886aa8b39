package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Globally-ordered window aggregates WITHOUT the single-reducer
  * `WindowExec`. A window with an ORDER BY and no PARTITION BY ("global
  * running total", "global row number") makes Spark move every row to one
  * task — a cluster-wide serialization point that turns a 1000-executor job
  * into a 1-core job at the window. The classic fix is a two-phase prefix
  * aggregation:
  *
  *   1. range-partition by the order keys, so slice i holds a contiguous
  *      piece of the global order, then sort within each slice;
  *   2. run the window WITHIN each slice, keyed by `spark_partition_id()` —
  *      full parallelism, every slice is its own window group;
  *   3. reduce each slice to one row (its total / row count), prefix-sum
  *      that partition-count-sized table, and broadcast the per-slice
  *      offsets back;
  *   4. global value = local value + offset of all earlier slices.
  *
  * Results are identical to the single-reducer plan for any total `order`
  * (callers must include a unique tie-break column — with duplicate keys a
  * row frame's split across slice boundaries would be partitioning-
  * dependent, exactly as it is task-order-dependent in the single-reducer
  * plan). Cost: one extra exchange of the data plus a partition-count-sized
  * aggregate, instead of serializing the whole dataset through one task —
  * the trade every distributed prefix-sum makes. The only no-partition
  * window left is over ONE ROW PER SLICE (bounded by the partition count,
  * not the data).
  */
object ScalableWindow {

  private def prepared(df: DataFrame, order: Seq[Column]): DataFrame = {
    val np = df.sparkSession.sessionState.conf.numShufflePartitions
    // localCheckpoint PINS the slice assignment. Without it the plan below
    // this point is evaluated once per consumer (the per-slice window AND
    // the per-slice totals), and nothing guarantees the two see the same
    // `spark_partition_id()` for a row: AQE coalesces each branch's range
    // exchange independently by its own runtime stats, so a row's slice id
    // can differ between branches — offsets then belong to different slices
    // than the local values they're added to (observed at sf0.1: NTILE(4)
    // emitted a phase 5, i.e. a rank beyond N). One eager materialization
    // makes the assignment a fact instead of a replayed computation.
    df.repartitionByRange(np, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
  }

  /** For each slice, the aggregate over all EARLIER slices (null for the
    * first — callers coalesce with their zero). Input is one row per slice. */
  private def offsets(perSlice: DataFrame, aggCol: String): DataFrame = {
    val w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    perSlice.withColumn("_off", sum(col(aggCol)).over(w)).select("_pid", "_off")
  }

  /** Global running sum of `value` over the total order `order` (include a
    * unique tie-break). Adds `out`; exact for decimal inputs (the offset
    * addition is ordinary decimal +). */
  def runningSum(df: DataFrame, order: Seq[Column], value: Column, out: String): DataFrame = {
    val local = prepared(df, order)
      .withColumn("_val", value)
      .withColumn("_loc", sum(col("_val")).over(
        Window.partitionBy("_pid").orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perSlice = local.groupBy("_pid").agg(sum(col("_val")).as("_t"))
    local.join(broadcast(offsets(perSlice, "_t")), Seq("_pid"))
      .withColumn(out, col("_loc") + coalesce(col("_off"), lit(0)))
      .drop("_pid", "_val", "_loc", "_off")
  }

  /** Global 1-based row number (LongType `out`) over the total order. */
  def rowNumber(df: DataFrame, order: Seq[Column], out: String): DataFrame = {
    val local = prepared(df, order)
      .withColumn("_loc", row_number().over(
        Window.partitionBy("_pid").orderBy(order: _*)).cast("long"))
    val perSlice = local.groupBy("_pid").agg(count(lit(1)).as("_n"))
    local.join(broadcast(offsets(perSlice, "_n")), Seq("_pid"))
      .withColumn(out, col("_loc") + coalesce(col("_off"), lit(0L)))
      .drop("_pid", "_loc", "_off")
  }

  /** SQL NTILE(k) over the global order, from the scalable row number in
    * closed form: with N rows, the first N mod k tiles get floor(N/k)+1
    * rows, the rest floor(N/k). N rides along as a broadcast single-row
    * aggregate — no second data-sized window, no driver collect. */
  def ntile(df: DataFrame, order: Seq[Column], k: Int, out: String): DataFrame = {
    require(k > 0, "ntile width must be positive")
    val ranked = rowNumber(df, order, "_rk")
    val total = ranked.agg(count(lit(1)).as("_N"))
    ranked.crossJoin(broadcast(total))
      .withColumn("_q", expr(s"_N div $k"))
      .withColumn("_r", col("_N") % k)
      // rows 1..r*(q+1) fall in the r bigger tiles; the q=0 (N<k) edge never
      // reaches the else branch (cut = N there), so its div by _q=0 is dead
      .withColumn(out,
        when(col("_rk") <= col("_r") * (col("_q") + 1),
          expr("(_rk - 1) div (_q + 1) + 1"))
          .otherwise(expr("_r + (_rk - _r * (_q + 1) - 1) div _q + 1"))
          .cast("long"))
      .drop("_rk", "_N", "_q", "_r")
  }
}
