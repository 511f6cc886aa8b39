package graft.ops

import graft.core.DimMapping
import graft.world.World
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Incrementally-maintained aggregate MATERIALIZED VIEW over a
  * version-logged world — the commit log + change feed turned into
  * derived-state maintenance.
  *
  * The view is `SELECT groupCols, COUNT(*), SUM(micro(c))..., MIN/MAX
  * (micro(c))... GROUP BY groupCols` over the base table (AVG needs no
  * state of its own — it falls out of count + sum at read time:
  * `s_<c>_micro / n / 1e6`). Its state lives in its own World keyed
  * by a 64-bit group hash (full-u64 dim, the fingerprint-store pattern of
  * [[Dedup.incrementalDedup]]), one row per live group:
  * `(gid, groupCols..., n, s_<c>_micro...)`.
  *
  * `refresh()` never re-reads the base table: it consumes
  * [[graft.sources.GraftChanges]] between the view's recorded cursor
  * version and the base's latest commit, aggregates SIGNED per-group deltas
  * (`insert` rows count +1/+micro, `delete` rows −1/−micro — the feed's
  * delete side re-reads retained history files, so a replaced row reverses
  * with exactly the value it contributed), left-joins current state on the
  * group hash, and upserts/destroys ONLY the touched groups. At 100 TB the
  * refresh cost is the changed-cell volume plus one join against the state
  * world — the base is never rescanned. Sums are integer MICRO-UNITS
  * (`round(x * 1e6)` cast to long): associative and exactly reversible,
  * where double summation would drift by addition order and could never
  * reverse a deletion bit-exactly.
  *
  * Cursor atomicity: the cursor is a SENTINEL ROW inside the state world
  * (gid 0, group cols null, `n` = cursor version), so the cursor advances
  * in the same staged `World.insert` as the state rows it describes. The
  * remaining torn window — a crash part-way through the insert's
  * partition-scoped swap, or between the insert and the destroy of emptied
  * groups — is covered by an INTENT MARKER written before any mutation and
  * removed after: a refresh that finds the marker knows the previous
  * attempt may have half-applied and REBUILDS from the base's pinned
  * latest snapshot (exact recovery at full-build cost, always DETECTED —
  * never a silent double-count). Group-hash collisions merge two groups
  * with probability 2^-64 per pair (the dedup stores' accepted
  * discipline); hash value 0 is remapped to 1 to keep the sentinel id
  * private.
  *
  * MIN/MAX maintenance is asymmetric: inserts tighten an extreme
  * monotonically (`least`/`greatest` against the stored value — pure delta
  * math, no base access), but a DELETE may remove the row that held the
  * current extreme, and no amount of delta arithmetic recovers the runner-
  * up. The feed names exactly which groups saw deletes, so `refresh()`
  * recomputes min/max for ONLY those groups from the base's pinned target
  * snapshot (one group-restricted scan — pruned further when the group
  * columns align with the base's bucket dims); every other group stays
  * pure-delta. Count and sums remain fully incremental for all groups.
  *
  * Base-table contract: the base must stay VERSION-LOGGED (connector/
  * catalog writes). A World-level rewrite on it is a version barrier —
  * the change feed then raises a loud resolver error and the recovery is
  * `initialize()` after the next versioned commit heals the log; the view
  * can be stale across a barrier but never silently wrong.
  *
  * Reference anchor: the daemon's write-behind keeps derived chunk state
  * current as data arrives (/root/reference/src/world.rs `daemon`); this is
  * the same obligation for an AGGREGATE artifact, driven by the commit log
  * instead of a write queue.
  */
final class MaterializedAgg(
    val spark: SparkSession,
    val basePath: String,
    val mvPath: String,
    val groupCols: Seq[String],
    val sumCols: Seq[String],
    val minMaxCols: Seq[String] = Nil) {
  require(groupCols.nonEmpty, "materialized aggregate needs group columns")

  private val SentinelGid = 0L
  private def intentPath = new Path(mvPath, "_graft_mv_refresh_intent")

  /** State world: one dim over the full u64 group-hash domain, 32 chunks. */
  val world: World = World(spark, mvPath)("gid" -> DimMapping(0L, -1L, 1L << 59))

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(mvPath), spark.sparkContext.hadoopConfiguration)

  private def gidOf: Column = {
    val h = xxhash64(groupCols.map(col): _*)
    when(h === SentinelGid, lit(1L)).otherwise(h)
  }

  private def microName(c: String) = s"s_${c}_micro"
  private def minName(c: String) = s"mn_${c}_micro"
  private def maxName(c: String) = s"mx_${c}_micro"
  private def micro(c: String): Column =
    round(col(c) * lit(1000000L)).cast("long")

  private val stateCols: Seq[String] =
    "gid" +: groupCols ++: ("n" +: (sumCols.map(microName) ++
      minMaxCols.flatMap(c => Seq(minName(c), maxName(c)))))

  private def latestBaseVersion: Long = {
    val bfs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(basePath), spark.sparkContext.hadoopConfiguration)
    graft.sources.GraftVersions.latestVersion(bfs, new Path(basePath))
      .getOrElse(throw new IllegalStateException(
        s"materialized aggregate needs a version-logged base: $basePath has no commits"))
  }

  /** Exact state at a pinned base snapshot (full scan — build/rebuild only). */
  private def stateAt(version: Long): DataFrame = {
    val snap = spark.read.format("graft")
      .option("graft.snapshot", version.toString).load(basePath)
    val aggs = count(lit(1)).as("n") +:
      (sumCols.map(c => sum(micro(c)).as(microName(c))) ++
        minMaxCols.flatMap(c => Seq(
          min(micro(c)).as(minName(c)), max(micro(c)).as(maxName(c)))))
    snap.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("gid", gidOf)
      .select(stateCols.map(col): _*)
  }

  /** One sentinel row shaped like `like` (nullable-relaxed): gid 0, group
    * cols null, n = cursor version, sums 0. */
  private def sentinel(version: Long, like: StructType): DataFrame = {
    val schema = StructType(like.fields.map(_.copy(nullable = true)))
    val row = Row.fromSeq(schema.fields.map { f =>
      f.name match {
        case "gid" => SentinelGid
        case "n"   => version
        case n if sumCols.exists(microName(_) == n) => 0L
        case n if minMaxCols.exists(c => minName(c) == n || maxName(c) == n) => 0L
        case _     => null
      }
    }.toSeq)
    spark.createDataFrame(java.util.List.of(row), schema)
  }

  /** Full (re)build at the base's latest commit; records the cursor in the
    * same create. Also the recovery path for a torn refresh. */
  def initialize(): Long = {
    val v1 = latestBaseVersion
    fs.create(intentPath, true).close()
    val st = stateAt(v1)
    world.create(st.unionByName(sentinel(v1, st.schema)))
    fs.delete(intentPath, false)
    v1
  }

  /** The version the view currently reflects (sentinel row's `n`). */
  def cursor: Long = {
    val rows = world.df.where(col("gid") === SentinelGid)
      .select("n").collect()
    require(rows.nonEmpty,
      s"materialized aggregate at $mvPath not initialized (no cursor row)")
    rows.head.getLong(0)
  }

  /** Apply the commit-log delta since the recorded cursor; returns the new
    * cursor version. No-op when already current; rebuilds when a previous
    * refresh left its intent marker (possible half-applied state). */
  def refresh(): Long = {
    // virgin view (never initialized) -> full build; leftover intent marker
    // (torn previous refresh) -> exact rebuild. Auto-init makes the
    // streaming face self-starting.
    val root = new Path(mvPath)
    if (!fs.exists(root) || fs.listStatus(root).isEmpty) return initialize()
    if (fs.exists(intentPath)) return initialize()
    val v0 = cursor
    val v1 = latestBaseVersion
    if (v1 <= v0) return v0

    val isIns = col("_change_type") === "insert"
    val sign = when(isIns, lit(1L)).otherwise(lit(-1L))
    val deltaAggs = sum(sign).as("dn") +:
      (sumCols.map(c => sum(sign * micro(c)).as(s"d_$c")) ++
        minMaxCols.flatMap(c => Seq(
          min(when(isIns, micro(c))).as(s"imn_$c"),
          max(when(isIns, micro(c))).as(s"imx_$c"))) ++
        (if (minMaxCols.isEmpty) Nil
         else Seq(max(when(isIns, 0).otherwise(1)).as("has_del"))))
    val delta = graft.sources.GraftChanges.between(spark, basePath, v0, v1)
      .groupBy(groupCols.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
      .withColumn("gid", gidOf)

    // delete-side min/max recompute: only the groups the feed marks dirty,
    // from the TARGET snapshot (exact at the new cursor), group-restricted
    // by a semi-join — the rest of the base is never aggregated
    val rec: Option[DataFrame] =
      if (minMaxCols.isEmpty) None
      else Some {
        val dirty = delta.where(col("has_del") === 1)
          .select(groupCols.map(col): _*)
        val snap = spark.read.format("graft")
          .option("graft.snapshot", v1.toString).load(basePath)
        val aggs = minMaxCols.flatMap(c => Seq(
          min(micro(c)).as(s"rmn_$c"), max(micro(c)).as(s"rmx_$c")))
        snap.join(dirty, groupCols, "left_semi")
          .groupBy(groupCols.map(col): _*)
          .agg(aggs.head, aggs.tail: _*)
          .withColumn("gid", gidOf)
          .select(col("gid") +:
            minMaxCols.flatMap(c => Seq(col(s"rmn_$c"), col(s"rmx_$c"))): _*)
      }

    val joined0 = delta.alias("d")
      .join(world.df.alias("s"), Seq("gid"), "left")
    val joined = rec.fold(joined0)(r => joined0.join(r.alias("r"), Seq("gid"), "left"))
    // per min/max col: delete-dirty groups take the recomputed extreme
    // (null only when the group emptied — then n <= 0 and the row dies);
    // insert-only groups tighten monotonically (least/greatest skip nulls)
    def mnCol(c: String) = when(col("has_del") === 1, col(s"r.rmn_$c"))
      .otherwise(least(col(s"s.${minName(c)}"), col(s"imn_$c"))).as(minName(c))
    def mxCol(c: String) = when(col("has_del") === 1, col(s"r.rmx_$c"))
      .otherwise(greatest(col(s"s.${maxName(c)}"), col(s"imx_$c"))).as(maxName(c))
    val merged = joined
      .select(
        col("gid") +:
          groupCols.map(c => col(s"d.$c").as(c)) ++:
          ((coalesce(col("s.n"), lit(0L)) + col("dn")).as("n") +:
            (sumCols.map(c =>
              (coalesce(col(s"s.${microName(c)}"), lit(0L)) + col(s"d_$c"))
                .as(microName(c))) ++
              minMaxCols.flatMap(c => Seq(mnCol(c), mxCol(c))))): _*)

    // pin BEFORE mutating: both the upsert and the destroy consume this
    // plan, and it references the very store the first mutation rewrites
    // (the incrementalDedup re-read hazard)
    val (pinned, handle) = Pins.pinWithHandle(merged)
    try {
      fs.create(intentPath, true).close()
      val live = pinned.where(col("n") > 0)
      val dead = pinned.where(col("n") <= 0).select(col("gid").as("id"))
      // ONE combined rewrite (World.applyDelta): emptied groups vanish and
      // touched groups upsert in the same staged swap the cursor sentinel
      // rides — half the cell rewrites of a destroy-then-insert pair
      world.applyDelta(dead, live.unionByName(sentinel(v1, live.schema)))
      fs.delete(intentPath, false)
    } finally Pins.release(handle)
    v1
  }

  /** Live view content (sentinel excluded), micro-unit sums. */
  def df: DataFrame =
    world.df.where(col("gid") =!= SentinelGid)
      .select(stateCols.map(col): _*)
}
