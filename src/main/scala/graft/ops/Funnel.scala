package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event log: for each entity, the earliest
  * event chain completing `steps` in strict time order (step i+1 must occur
  * strictly after the chosen step-i event). The greedy fold below — take the
  * first qualifying event for the lowest unfilled slot — provably yields the
  * same chain as the "iterated min-after-previous" definition (each slot
  * fills at the minimum qualifying timestamp given the previous slot, and an
  * earlier slot choice can only widen later slots' candidate sets), which is
  * what the independent multi-join DuckDB oracle computes for `e_funnel`.
  *
  * Scale shape: non-step events are filtered before the one shuffle
  * (groupBy entity); each group folds its sorted event structs with a
  * codegen'd HOF chain (`sort_array` + `aggregate` + `transform`) — no UDF,
  * no window, no second shuffle. Per-entity state is the k-slot array; the
  * collected per-entity event list is the only memory bound (the standard
  * sessionization assumption — an entity's own step events fit one task).
  * Timestamps ride as epoch-microsecond longs (the engine-neutral grain).
  */
object Funnel {

  /** Returns one row per entity that emitted at least one step-type event:
    * (entityCol, steps_done, step1_us .. stepK_us), step timestamps null
    * from the first uncompleted step on.
    */
  def earliestChain(events: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, s"funnel steps must be distinct: $steps")
    val k = steps.length
    val stepIdx = steps.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (name, i)) => when(col(typeCol) === name, lit(i)).otherwise(acc)
    }
    val relevant = events
      .select(col(entityCol), unix_micros(col(tsCol)).as("t"), stepIdx.as("s"))
      .where(col("s").isNotNull)
    // greedy fold in sorted order; try_element_at is 1-based and total (null
    // on index 0), so slot i's predecessor check is ANSI-safe for i = 0
    val folded = relevant
      .groupBy(entityCol)
      .agg(sort_array(collect_list(struct(col("t"), col("s")))).as("evs"))
      .withColumn("slots", expr(
        s"""aggregate(evs, array_repeat(CAST(NULL AS BIGINT), $k),
           |  (acc, e) -> transform(acc, (a, i) ->
           |    CASE WHEN a IS NOT NULL THEN a
           |         WHEN e.s = i AND (i = 0 OR
           |           (try_element_at(acc, i) IS NOT NULL AND
           |            e.t > try_element_at(acc, i)))
           |         THEN e.t ELSE a END))""".stripMargin))
    val stepCols = (0 until k).map(i =>
      try_element_at(col("slots"), lit(i + 1)).as(s"step${i + 1}_us"))
    folded.select(
      col(entityCol) +:
        size(filter(col("slots"), x => x.isNotNull)).cast("long").as("steps_done") +:
        stepCols: _*)
  }
}
