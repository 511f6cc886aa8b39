package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Exact distributed heavy hitters (frequent items with count >= T).
  *
  * The naive `GROUP BY key HAVING count >= T` shuffles one partial count
  * per (scan partition, distinct key) — fine until key cardinality rivals
  * row count (user ids, URLs, IPs at 100 TB), where the shuffle IS the
  * job. This runs the classic two-phase exact scheme instead:
  *
  *   1. candidate generation: each partition counts locally and emits ONLY
  *      keys with local count >= ceil(T/P). Pigeonhole guarantees this is
  *      a superset of the true answer: if every one of P partitions held
  *      fewer than ceil(T/P) copies, the global total would be at most
  *      P*(ceil(T/P)-1) < T. Everything below the local floor — the long
  *      tail, which is almost everything — never leaves its partition.
  *   2. exact verify: a semi-join keeps only candidate rows (the candidate
  *      set is small, so AQE broadcasts it), then an ordinary exact count +
  *      threshold filter. No approximation survives into the result.
  *
  * The local map is CAPPED at `localMapCap` entries (Spark's own partial
  * aggregate spills in this regime; an unbounded per-task hashmap would be
  * the one operator here that can OOM an executor). On overflow the light
  * half of the map (entries at or below the median count) is FLUSHED — the
  * flushed keys are emitted as candidates, not dropped. That preserves the
  * exact superset unconditionally: a key whose local count reaches the
  * floor either survives every flush (so its final map count is its
  * complete local count, >= floor, and the end-of-partition sweep emits
  * it) or was removed by some flush (and that flush emitted it). Under
  * adversarial cardinality the scheme therefore degrades to a WIDER
  * candidate set — in the limit, the same volume the naive GROUP BY would
  * shuffle — never to an incorrect answer or an executor OOM. Each flush
  * frees at least half the map, so the amortized cost per input row stays
  * O(1).
  *
  * The pigeonhole floor is computed INSIDE each task from
  * `TaskContext.numPartitions` — the P of the very execution doing the
  * counting, so no separately-probed plan (which AQE could re-shape) can
  * drift out from under the premise, and no extra job materializes the
  * upstream plan just to read its partition count.
  */
object HeavyHitters {

  /** Default cap on per-task local-count map entries (~a few MB of boxed
    * entries per task; 32 tasks x that is nothing, and the guarantee does
    * not depend on the value — only candidate-set width does). */
  val DefaultLocalMapCap: Int = 1 << 16

  /** Keys of `keyCol` (a bigint column) occurring at least `minCount`
    * times, with their exact counts as `n`. NULL keys (and values a bigint
    * cast nulls out) are excluded — callers wanting null tallies filter or
    * encode first. */
  def exact(df: DataFrame, keyCol: String, minCount: Long,
            localMapCap: Int = DefaultLocalMapCap): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(keyCol).cast("long").as(keyCol))
    if (minCount <= partitionsOf(rows)) naive(rows, keyCol, minCount)
    else {
      val keys = df.select(col(keyCol).cast("long"))
        .where(col(keyCol).isNotNull).as[Long]
      verify(rows, candidates(keys, minCount, localMapCap).toDF(keyCol),
        keyCol, minCount)
    }
  }

  /** String-keyed face — the actual 100-TB shape (URLs, domains,
    * user-agents, tokens). Same exact two-phase scheme; the local map keys
    * the strings themselves (bounded by `localMapCap` entries, so a
    * high-cardinality URL stream widens candidates instead of growing the
    * map). */
  def exactString(df: DataFrame, keyCol: String, minCount: Long,
                  localMapCap: Int = DefaultLocalMapCap): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(keyCol).cast("string").as(keyCol))
    if (minCount <= partitionsOf(rows)) naive(rows, keyCol, minCount)
    else {
      val keys = df.select(col(keyCol).cast("string"))
        .where(col(keyCol).isNotNull).as[String]
      verify(rows, candidates(keys, minCount, localMapCap).toDF(keyCol),
        keyCol, minCount)
    }
  }

  /** Build-time ESTIMATE of the scan's parallelism — decides the regime at
    * query-build time. When minCount <= P the pigeonhole floor ceil(T/P)
    * is 1, phase 1 cannot prune ANYTHING, and the right plan is the plain
    * GROUP BY / HAVING: Spark's own partial aggregate shuffles one entry
    * per (partition, distinct key) and SPILLS under adversarial
    * cardinality, which a mapPartitions counting pass cannot.
    *
    * Deliberately NOT `df.rdd.getNumPartitions`: that forces physical
    * planning (and the scan's file listing) a second time at query build —
    * at a 100k-chunk grid it doubles planning latency for every
    * heavy-hitter call just to read one integer. The session's default
    * parallelism is planning-free and is what the cluster actually fans a
    * scan out to. The estimate only picks WHICH correct plan runs: the
    * true P is read in-task (`TaskContext.numPartitions`), so an
    * underestimate routes a floor-1 case into the candidates pass whose
    * in-task distinct fallback covers it, and an overestimate routes to
    * the plain GROUP BY, which spills instead of pruning. */
  private def partitionsOf(df: DataFrame): Int =
    math.max(df.sparkSession.sparkContext.defaultParallelism, 1)

  private def naive(rows: DataFrame, keyCol: String, minCount: Long): DataFrame =
    rows.where(col(keyCol).isNotNull)
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)

  private def verify(rows: DataFrame, cand: DataFrame, keyCol: String,
                     minCount: Long): DataFrame =
    rows.join(cand.distinct(), Seq(keyCol), "left_semi")
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)

  private[ops] def candidates[K: Encoder](keys: Dataset[K], minCount: Long,
                                          cap: Int): Dataset[K] = {
    require(minCount >= 1, s"minCount must be positive, got $minCount")
    require(cap >= 2, s"localMapCap must be >= 2, got $cap")
    val isLong = implicitly[Encoder[K]].clsTag.runtimeClass == classOf[Long]
    keys.mapPartitions { it =>
      val p = math.max(org.apache.spark.TaskContext.get().numPartitions(), 1)
      val localFloor = (minCount + p - 1) / p
      // floor 1 prunes NOTHING (count >= 1 is every locally-seen key), so
      // the capped count map would pay its per-row cost to emit at least
      // the per-partition distinct keys anyway. This path is normally
      // unreachable — exact/exactString route minCount <= P to the plain
      // GROUP BY up front — and only fires when AQE grew the partition
      // count past the planned estimate. The distinct pass emits each key
      // once while the seen-set fits the cap; PAST the cap unadmitted keys
      // are re-emitted per occurrence (no counts -> no median flush to
      // bound duplicates), which widens the shuffle but never the answer
      // (verify distincts). The naive plan, which spills instead, is the
      // right home for that regime — hence the up-front routing.
      if (localFloor <= 1L) {
        if (isLong)
          new LongDistinctPassIter(it.asInstanceOf[Iterator[Long]], cap)
            .asInstanceOf[Iterator[K]]
        else new DistinctPassIter(it, cap)
      }
      // primitive-specialized counting for the bigint face: the generic
      // HashMap would box every key twice per row on the hot path
      else if (isLong)
        new LongCandidateIter(it.asInstanceOf[Iterator[Long]], localFloor, cap)
          .asInstanceOf[Iterator[K]]
      else new CandidateIter(it, localFloor, cap)
    }
  }

  /** Candidate pass for the floor-1 regime: emit each locally-new key once
    * (a capped seen-set instead of a count map — no counts are needed when
    * every seen key qualifies). */
  private final class DistinctPassIter[K](input: Iterator[K], cap: Int)
      extends Iterator[K] {
    private val seen = scala.collection.mutable.HashSet.empty[K]
    private var nextVal: K = _
    private var hasVal = false

    override def hasNext: Boolean = {
      while (!hasVal && input.hasNext) {
        val k = input.next()
        if (!seen.contains(k)) {
          if (seen.size < cap) seen += k
          nextVal = k
          hasVal = true
        }
      }
      hasVal
    }

    override def next(): K = {
      if (!hasNext) throw new NoSuchElementException("empty candidate iterator")
      hasVal = false
      nextVal
    }
  }

  /** [[DistinctPassIter]] specialized on primitive longs (LongMap as a set). */
  private final class LongDistinctPassIter(input: Iterator[Long], cap: Int)
      extends Iterator[Long] {
    private val seen = scala.collection.mutable.LongMap.empty[Boolean]
    private var nextVal: Long = 0L
    private var hasVal = false

    override def hasNext: Boolean = {
      while (!hasVal && input.hasNext) {
        val k = input.next()
        if (!seen.contains(k)) {
          if (seen.size < cap) seen.update(k, true)
          nextVal = k
          hasVal = true
        }
      }
      hasVal
    }

    override def next(): Long = {
      if (!hasNext) throw new NoSuchElementException("empty candidate iterator")
      hasVal = false
      nextVal
    }
  }

  /** Streaming candidate generator: consumes the partition's rows through a
    * capped count map, interleaving flush emissions with consumption so no
    * unbounded buffer of emitted keys ever exists either. */
  private final class CandidateIter[K](input: Iterator[K], localFloor: Long,
                                       cap: Int) extends Iterator[K] {
    private val counts = scala.collection.mutable.HashMap.empty[K, Long]
    private var pending: Iterator[K] = Iterator.empty
    private var done = false

    override def hasNext: Boolean = {
      while (!pending.hasNext && !done) {
        if (!input.hasNext) {
          pending = counts.iterator.collect { case (k, c) if c >= localFloor => k }
          done = true
        } else {
          val k = input.next()
          val c = counts.getOrElse(k, 0L)
          if (c > 0L || counts.size < cap) counts.update(k, c + 1L)
          else {
            // full and k is new: flush the light half (median and below) as
            // candidates; >= half the entries sit at or below the median,
            // so each flush frees >= cap/2 slots
            val cs = counts.valuesIterator.toArray
            java.util.Arrays.sort(cs)
            val median = cs(cs.length / 2)
            val light = scala.collection.mutable.ArrayBuffer.empty[K]
            counts.foreach { case (lk, lc) => if (lc <= median) light += lk }
            light.foreach(counts.remove)
            counts.update(k, 1L)
            pending = light.iterator
          }
        }
      }
      pending.hasNext
    }

    override def next(): K = {
      if (!hasNext) throw new NoSuchElementException("empty candidate iterator")
      pending.next()
    }
  }

  /** [[CandidateIter]] specialized on primitive longs via LongMap (no
    * per-row boxing). Keep the flush logic in sync with the generic twin —
    * the shapes are identical, only the map type differs. */
  private final class LongCandidateIter(input: Iterator[Long], localFloor: Long,
                                        cap: Int) extends Iterator[Long] {
    private val counts = scala.collection.mutable.LongMap.empty[Long]
    private var pending: Iterator[Long] = Iterator.empty
    private var done = false

    override def hasNext: Boolean = {
      while (!pending.hasNext && !done) {
        if (!input.hasNext) {
          pending = counts.iterator.collect { case (k, c) if c >= localFloor => k }
          done = true
        } else {
          val k = input.next()
          val c = counts.getOrElse(k, 0L)
          if (c > 0L || counts.size < cap) counts.update(k, c + 1L)
          else {
            val cs = counts.valuesIterator.toArray
            java.util.Arrays.sort(cs)
            val median = cs(cs.length / 2)
            val light = scala.collection.mutable.ArrayBuffer.empty[Long]
            counts.foreach { case (lk, lc) => if (lc <= median) light += lk }
            light.foreach(counts.remove)
            counts.update(k, 1L)
            pending = light.iterator
          }
        }
      }
      pending.hasNext
    }

    override def next(): Long = {
      if (!hasNext) throw new NoSuchElementException("empty candidate iterator")
      pending.next()
    }
  }
}
