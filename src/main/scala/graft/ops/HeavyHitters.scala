package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed heavy hitters (frequent items with count >= T).
  *
  * The naive `GROUP BY key HAVING count >= T` shuffles one partial count
  * per (scan partition, distinct key) — fine until key cardinality rivals
  * row count (user ids, URLs, IPs at 100 TB), where the shuffle IS the
  * job. This runs the classic two-phase exact scheme instead:
  *
  *   1. candidate generation: each partition counts locally (the same
  *      hashmap Spark's own partial aggregate would build) and emits ONLY
  *      keys with local count >= ceil(T/P). Pigeonhole guarantees this is
  *      a superset of the true answer: if every one of P partitions held
  *      fewer than ceil(T/P) copies, the global total would be at most
  *      P*(ceil(T/P)-1) < T. Everything below the local floor — the long
  *      tail, which is almost everything — never leaves its partition.
  *   2. exact verify: a semi-join keeps only candidate rows (the candidate
  *      set is tiny — at most N/floor keys — so AQE broadcasts it), then
  *      an ordinary exact count + threshold filter. No approximation
  *      survives into the result.
  *
  * The pigeonhole floor is computed INSIDE each task from
  * `TaskContext.numPartitions` — the P of the very execution doing the
  * counting, so no separately-probed plan (which AQE could re-shape) can
  * drift out from under the premise, and no extra job materializes the
  * upstream plan just to read its partition count.
  */
object HeavyHitters {

  /** Keys of `keyCol` (a bigint column) occurring at least `minCount`
    * times, with their exact counts as `n`. NULL keys (and values a bigint
    * cast nulls out) are excluded — callers wanting null tallies filter or
    * encode first. */
  def exact(df: DataFrame, keyCol: String, minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be positive, got $minCount")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("long"))
      .where(col(keyCol).isNotNull).as[Long]
    val candidates = keys.mapPartitions { it =>
      val p = math.max(org.apache.spark.TaskContext.get().numPartitions(), 1)
      val localFloor = (minCount + p - 1) / p
      val counts = scala.collection.mutable.LongMap.empty[Long]
      it.foreach(k => counts(k) = counts.getOrElse(k, 0L) + 1L)
      counts.iterator.collect { case (k, c) if c >= localFloor => k }
    }.toDF(keyCol).distinct()
    df.select(col(keyCol).cast("long").as(keyCol))
      .join(candidates, Seq(keyCol), "left_semi")
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
  }
}
