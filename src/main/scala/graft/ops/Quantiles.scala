package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT quantiles at scale — the order statistic itself, not an
  * approximation. `percentile_disc` semantics: the quantile at fraction q
  * is the element whose 1-based rank in the sorted data is ceil(q*N) (the
  * first element whose cumulative fraction reaches q — verified identical
  * to DuckDB's `quantile_disc`).
  *
  * The naive plan (global sort, walk to position k) serializes the data
  * through one task exactly like a global window; `percentile_approx`
  * avoids that but is approximate. This runs the
  * [[ScalableWindow.rowNumber]] two-phase plan instead — one range
  * exchange, slice-local numbering, a partition-count-sized offsets
  * broadcast — then keeps ONLY the rows at the target ranks (an In filter;
  * at most one row per requested quantile survives to the driver). Exact
  * at any N, no single-reducer stage, two passes over the data (the count
  * and the ranked pass).
  *
  * Duplicate values need no tie-break: rank assignment within a tie group
  * is partitioning-dependent, but every row in the group carries the same
  * value, so the VALUE at any rank is deterministic.
  */
object Quantiles {

  /** One row per requested fraction: (q, value), where value is the exact
    * q-quantile of `value` under percentile_disc semantics. NULL values are
    * excluded (as SQL quantile aggregates do). N comes from the ranked
    * data's own max row number — a pass over the pinned ranked copy, not a
    * second scan of the (possibly expensive) source frame. */
  def exactQuantiles(df: DataFrame, value: Column, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "at least one quantile fraction required")
    require(qs.forall(q => q > 0.0 && q <= 1.0),
      s"fractions must be in (0, 1], got $qs")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(value.as("_v")).where(col("_v").isNotNull)
    val ranked = ScalableWindow.rowNumber(vals, Seq(col("_v")), "_rn")
    // ceil(q*N) with an ulp-scale guard: the double product can land just
    // ABOVE an exact integer (0.07*100 = 7.000000000000001 -> ceil 8, the
    // wrong element; DuckDB returns the 7th). The guard is a CONVENTION,
    // not an exactness proof: any product within ~4e-16 RELATIVE of an
    // integer is treated as that integer (relative, not absolute, so it
    // still covers N ~ 1e12 where one ulp is ~1e-4). A q chosen
    // adversarially within that band of m/N resolves to rank m — the same
    // reading DuckDB's quantile_disc gives on every probed case — while
    // ordinary fractions are never off by one.
    val x = col("q") * col("_N")
    ranked
      .crossJoin(broadcast(ranked.agg(max(col("_rn")).as("_N"))))
      .crossJoin(broadcast(qs.distinct.toDF("q")))
      .where(col("_rn") ===
        greatest(ceil(x - x * lit(4e-16)).cast("long"), lit(1L)))
      .select(col("q"), col("_v").as("value"))
  }

  /** Per-GROUP exact quantiles: one row per (key, fraction). The global
    * problem needed [[ScalableWindow]] because Spark's ungrouped window is a
    * single-reducer funnel; the grouped one does not — a window PARTITIONED
    * by the key parallelizes across groups and spills within one, which is
    * the right plan at any group cardinality (a group so large it strains
    * one task's spill path has no exact-order-statistic shortcut short of
    * the global machinery per group). Same ulp-guarded ceil(q*N) rank and
    * null exclusion as [[exactQuantiles]]; both windows share one exchange
    * and one sort (the count frame needs only the clustering the ranked
    * sort already provides). */
  def groupedExactQuantiles(df: DataFrame, key: Column, value: Column,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "at least one quantile fraction required")
    require(qs.forall(q => q > 0.0 && q <= 1.0),
      s"fractions must be in (0, 1], got $qs")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val vals = df.select(key.as("_k"), value.as("_v")).where(col("_v").isNotNull)
    val byKey = Window.partitionBy(col("_k"))
    val ranked = vals
      .withColumn("_rn", row_number().over(byKey.orderBy(col("_v"))))
      .withColumn("_N", count(lit(1)).over(byKey))
    val x = col("q") * col("_N")
    ranked
      .crossJoin(broadcast(qs.distinct.toDF("q")))
      .where(col("_rn") ===
        greatest(ceil(x - x * lit(4e-16)).cast("long"), lit(1L)))
      .select(col("_k").as("key"), col("q"), col("_v").as("value"))
  }
}
