package graft.queries

import graft.core._
import graft.world.{DimSpec, World}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's own query surface (SURVEY §2.1-2.4, §3) exercised over the
  * driver's `events` table as a 2-dim world: dim0 = `event_id` (the unique
  * id), dim1 = `user_id`. Every query's oracle SQL reproduces the
  * chunk-granular selection semantics with explicit integer bucket arithmetic
  * — the chunk bounds embedded in the SQL are computed by the SAME
  * [[DimMapping]] the engine uses, so the oracle checks the rounding
  * semantics, not just the data.
  */
object DmdsQueries {
  import Tables.t

  // events world config: event_id in [0, 2^20) / 512; user_id in [0, 2^14) / 16
  private val d0 = DimMapping(0L, (1L << 20) - 1, 512L)
  private val d1 = DimMapping(0L, (1L << 14) - 1, 16L)
  private def specs = Seq(DimSpec("event_id", d0), DimSpec("user_id", d1))

  /** A detached world over `events` (predicate path — no materialization). */
  private def world(spark: SparkSession): World =
    new World(spark, "/tmp/graft_world_unused", specs)

  private def events(s: SparkSession, dir: String): DataFrame = t(s, dir, "events")

  private val evCols = Seq("event_id", "user_id", "event_type", "value", "props")
  private val evColsSql = evCols.mkString(", ")

  /** Spark-side: bucketize + pruning predicate + drop bucket cols. */
  private def applySel(s: SparkSession, dir: String)(
      mk: World => graft.world.WorldSelect): DataFrame = {
    val w = world(s)
    val sel = mk(w)
    w.withBuckets(events(s, dir))
      .where(sel.pruningPredicate)
      .select(evCols.map(col): _*)
      .orderBy("event_id")
  }

  // chunk bounds used in oracle SQL — computed by the engine's own mapping
  private def cr(m: DimMapping, b: Bounds): (Long, Long) = m.chunksOf(b).get

  /** Build-once world fixture for scan-shaped queries: the world is (re)built
    * only when its ready marker is absent — these queries measure the SCAN
    * (`w_world_roundtrip` deliberately times the build; nothing else should).
    * A killed run leaves no marker and rebuilds; content is deterministic per
    * source dir. The cache key includes the source file's (name, length,
    * mtime) stamp so a REGENERATED events.parquet at the same path can never
    * be served a stale world. Returns the world path.
    */
  private def cachedEventsWorld(s: SparkSession, dir: String, tag: String,
      wspecs: Seq[DimSpec], cols: Seq[String], zorder: Boolean = false,
      bloomCols: Seq[String] = Nil): String = {
    val src = new java.io.File(s"$dir/events.parquet")
    val parts = if (src.isDirectory) src.listFiles.toSeq.sortBy(_.getName) else Seq(src)
    val stamp = java.lang.Integer.toHexString(
      parts.map(x => (x.getName, x.length, x.lastModified)).hashCode)
    val path = s"/tmp/graft_world_${tag}_${stamp}_" +
      dir.replaceAll("[^0-9a-zA-Z]", "_")
    val marker = new java.io.File(path, "_graft_ready")
    if (!marker.exists) {
      val w = new World(s, path, wspecs)
      w.create(events(s, dir).select(cols.map(col): _*),
        zorderWithinChunks = zorder, bloomColumns = bloomCols)
      marker.createNewFile()
    }
    path
  }

  /** Isolated session: conf copied (SF-wide settings apply) so per-query
    * catalog registrations and conf overrides never leak into other
    * registry queries' planning. */
  private def isolatedSession(s: SparkSession): SparkSession = {
    val s2 = s.newSession()
    s.conf.getAll.foreach { case (k, v) =>
      try s2.conf.set(k, v) catch { case _: Exception => () }
    }
    s2
  }

  /** [[isolatedSession]] with a graft catalog named `cat` over a
    * per-(tag, dir) warehouse — the shared shape of every catalog-driven
    * oracle query. */
  private def withGraftCatalog(s: SparkSession, dir: String, cat: String,
      tag: String): SparkSession = {
    val s2 = isolatedSession(s)
    s2.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s2.conf.set(s"spark.sql.catalog.$cat.warehouse",
      s"/tmp/graft_cat_${tag}_" + dir.replaceAll("[^0-9a-zA-Z]", "_"))
    s2
  }

  val defs: Map[String, QueryDef] = {
    val selRange = cr(d1, Bounds.to(100, 119)) // user chunks 6..7
    val andU = cr(d1, Bounds.to(32, 80))       // 2..5
    val andE = cr(d0, Bounds.to(1000, 4999))   // 1..9
    val plusA = cr(d1, Bounds.to(0, 15))       // 0..0
    val plusB = cr(d1, Bounds.to(128, 143))    // 8..8

    Map(
      // --- scans + selection algebra (src/world.rs:301-335, 588-644) ---
      "w_select_range" -> QueryDef(
        (s, dir) => applySel(s, dir)(_.select(1, Bounds.to(100, 119))),
        Some(s"""SELECT $evColsSql FROM events
                 WHERE ((user_id - 0) // 16) BETWEEN ${selRange._1} AND ${selRange._2}
                 ORDER BY event_id""")
      ),
      "w_select_and" -> QueryDef(
        (s, dir) => applySel(s, dir)(
          _.select(1, Bounds.to(32, 80)).and(0, Bounds.to(1000, 4999))),
        Some(s"""SELECT $evColsSql FROM events
                 WHERE ((user_id - 0) // 16) BETWEEN ${andU._1} AND ${andU._2}
                   AND ((event_id - 0) // 512) BETWEEN ${andE._1} AND ${andE._2}
                 ORDER BY event_id""")
      ),
      "w_select_plus" -> QueryDef(
        (s, dir) => applySel(s, dir)(
          _.select(1, Bounds.to(0, 15)).plus(1, Bounds.to(128, 143))),
        Some(s"""SELECT $evColsSql FROM events
                 WHERE ((user_id - 0) // 16) BETWEEN ${plusA._1} AND ${plusA._2}
                    OR ((user_id - 0) // 16) BETWEEN ${plusB._1} AND ${plusB._2}
                 ORDER BY event_id""")
      ),
      "w_select_hint" -> QueryDef(
        (s, dir) => applySel(s, dir)(_.selectAll.hints(Seq(7L, 77L, 777L, 7777L))),
        Some(s"""SELECT $evColsSql FROM events
                 WHERE event_id IN (7, 77, 777, 7777) ORDER BY event_id""")
      ),
      "w_select_all" -> QueryDef(
        (s, dir) => {
          val w = world(s)
          w.withBuckets(events(s, dir)).where(w.selectAll.pruningPredicate)
            .select((evCols :+ "ts").map(col): _*)
            .withColumn("ts_us", unix_micros(col("ts").cast("timestamp"))).drop("ts")
            .orderBy("event_id")
        },
        Some(s"""SELECT $evColsSql, CAST(epoch_us(ts) AS BIGINT) AS ts_us
                 FROM events ORDER BY event_id""")
      ),
      "w_select_empty" -> QueryDef(
        // out-of-domain range -> Shape::None -> empty scan (src/world.rs:301-329)
        (s, dir) => applySel(s, dir)(_.select(1, Bounds.to(20000, 30000)))
          .select("event_id", "user_id"),
        Some("SELECT event_id, user_id FROM events WHERE 1=0 ORDER BY event_id")
      ),
      "w_rows_exact" -> QueryDef(
        // chunk-granular scan + caller's row-exact residual filter (SURVEY §2.2)
        (s, dir) => applySel(s, dir)(_.select(1, Bounds.to(100, 119)))
          .where(col("user_id").between(100, 119)),
        Some(s"""SELECT $evColsSql FROM events
                 WHERE ((user_id - 0) // 16) BETWEEN ${selRange._1} AND ${selRange._2}
                   AND user_id BETWEEN 100 AND 119
                 ORDER BY event_id""")
      ),
      "w_dims_proj" -> QueryDef(
        // Lazy::dims projection (src/world/iter.rs:96-113)
        (s, dir) => applySel(s, dir)(_.select(1, Bounds.to(32, 80)))
          .select("event_id", "user_id"),
        Some(s"""SELECT event_id, user_id FROM events
                 WHERE ((user_id - 0) // 16) BETWEEN ${andU._1} AND ${andU._2}
                 ORDER BY event_id""")
      ),

      // --- point ops restated batch-relationally (src/world.rs:553-584 etc.) ---
      "w_upsert" -> QueryDef(
        // insert = replace-on-conflict by id: new rows win (src/world.rs:124-150)
        (s, dir) => {
          val e = events(s, dir).select("event_id", "user_id", "event_type", "value")
          val upd = e.where(col("user_id") < 8)
            .withColumn("value", col("value") + 1000)
          val unioned = upd.withColumn("__pri", lit(0))
            .unionByName(e.withColumn("__pri", lit(1)))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("event_id").orderBy("__pri")
          unioned.withColumn("__rn", row_number().over(w))
            .where(col("__rn") === 1).drop("__pri", "__rn")
            .orderBy("event_id")
        },
        Some("""SELECT event_id, user_id, event_type,
                  CASE WHEN user_id < 8 THEN value + 1000 ELSE value END AS value
                FROM events ORDER BY event_id""")
      ),
      "w_try_insert" -> QueryDef(
        // insert-if-absent: existing ids keep their rows (src/world.rs:152-178)
        (s, dir) => {
          val e = events(s, dir).select("event_id", "user_id", "event_type", "value")
          val base = e.where(col("event_id") % 3 =!= 0)
          val incoming = e.select(col("event_id"), col("user_id"),
            lit("ins").as("event_type"), lit(-1.0).as("value"))
          val fresh = incoming.join(base.select("event_id"), Seq("event_id"), "left_anti")
          base.unionByName(fresh).orderBy("event_id")
        },
        Some("""SELECT event_id, user_id, event_type, value FROM events WHERE event_id % 3 <> 0
                UNION ALL
                SELECT event_id, user_id, 'ins' AS event_type, -1.0 AS value FROM events WHERE event_id % 3 = 0
                ORDER BY event_id""")
      ),
      "w_destroy" -> QueryDef(
        // delete by id set (src/world/iter.rs:254-265)
        (s, dir) => events(s, dir).select(evCols.map(col): _*)
          .where(col("event_id") % 100 =!= 7).orderBy("event_id"),
        Some(s"""SELECT $evColsSql FROM events WHERE event_id % 100 <> 7 ORDER BY event_id""")
      ),
      "w_relocate" -> QueryDef(
        // get_mut + close: mutate dim1 -> re-bucket (src/world/iter.rs:173-252,195-211)
        (s, dir) => {
          val moved = events(s, dir)
            .withColumn("user_id",
              when(col("user_id") < 16, col("user_id") + 16).otherwise(col("user_id")))
          moved.select(col("event_id"), col("user_id"),
            DimSpec("user_id", d1).bucketExpr.as("c1")).orderBy("event_id")
        },
        Some("""SELECT event_id,
                  CASE WHEN user_id < 16 THEN user_id + 16 ELSE user_id END AS user_id,
                  ((CASE WHEN user_id < 16 THEN user_id + 16 ELSE user_id END - 0) // 16) AS c1
                FROM events ORDER BY event_id""")
      ),
      "w_quarantine" -> QueryDef(
        // ValueOutOfRange rows -> quarantine, not panic (src/range.rs:62-71)
        (s, dir) => {
          val tight = new World(s, "/tmp/graft_world_unused", Seq(
            DimSpec("event_id", d0), DimSpec("user_id", DimMapping(0L, 63L, 16L))))
          tight.outOfRange(events(s, dir)).select("event_id", "user_id").orderBy("event_id")
        },
        Some("SELECT event_id, user_id FROM events WHERE user_id > 63 ORDER BY event_id")
      ),
      // the two halves of the engine COMPOSED: documents ingested into a
      // world gridded by (doc_id, token count), a chunk-pruned selection
      // over the token dim (the reference's Select::iter), and the
      // LLM-pipeline ops (exact dedup + stopword gate) running on the
      // pruned slice. The oracle reproduces the bucket arithmetic AND the
      // pipeline semantics in one SQL — proving the world selection
      // surface and the cleaning operators agree about the same rows. At
      // scale the win is the composition itself: the dedup shuffle runs on
      // the selected chunk grid subset, never the whole corpus.
      "w_pipeline" -> QueryDef(
        (s, dir) => {
          // doc_id domain is deliberately wide (2^40): World.create DROPS
          // out-of-range rows that the oracle keeps, so an undersized
          // domain would silently diverge the pair at larger corpora
          val dId = DimMapping(0L, (1L << 40) - 1, 1L << 33)
          val dTok = DimMapping(0L, 1023L, 64L)
          val path = s"/tmp/graft_world_pipe_${dir.replaceAll("[^0-9a-zA-Z]", "_")}"
          val w = new World(s, path,
            Seq(DimSpec("doc_id", dId), DimSpec("n_tokens", dTok)))
          w.create(t(s, dir, "documents").select(col("doc_id"),
            graft.ops.Text.tokenCount(col("text")).as("n_tokens"),
            col("text"), col("source")))
          val slice = w.select(1, Bounds.to(64, 191)).iter()
          graft.ops.Dedup.exactDedup(slice, "doc_id", "text")
            .select(col("doc_id"), col("n_tokens"), col("source"),
              graft.ops.Text.stopwordHits(col("text")).as("n_stop"))
            .where(col("n_stop") >= 2)
            .orderBy("doc_id")
        },
        Some {
          val tk = cr(DimMapping(0L, 1023L, 64L), Bounds.to(64, 191))
          s"""WITH n AS (
                SELECT doc_id, text, source,
                  CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
                FROM documents),
              sel AS (
                SELECT * FROM n
                WHERE ((n_tokens - 0) // 64) BETWEEN ${tk._1} AND ${tk._2}),
              d AS (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
                  ORDER BY doc_id) AS rn
                FROM sel),
              g AS (
                SELECT doc_id, n_tokens, source,
                  CAST(len(regexp_extract_all(text, '\\b(the|and|of|to|a|in|is|it|that|for)\\b')) AS BIGINT) AS n_stop
                FROM d WHERE rn = 1)
              SELECT doc_id, n_tokens, source, n_stop
              FROM g WHERE n_stop >= 2 ORDER BY doc_id"""
        }
      ),

      "w_world_roundtrip" -> QueryDef(
        // full pipeline: create bucket-partitioned world on disk, partition-pruned
        // read. Storage chunk sizing is coarser than the predicate-path dims:
        // items_per_chunk is the reference's partition-size knob (SURVEY §4) and
        // a materialized grid must target chunk counts, not row counts — 8192x128
        // keeps the directory grid ~128x128 at any tested SF (fine-grained 512x16
        // would mean ~18k tiny directories at sf0.1).
        (s, dir) => {
          val sd0 = DimMapping(0L, (1L << 20) - 1, 8192L)
          val sd1 = DimMapping(0L, (1L << 14) - 1, 128L)
          val path = s"/tmp/graft_world_rt_${dir.replaceAll("[^0-9a-zA-Z]", "_")}"
          val w = new World(s, path,
            Seq(DimSpec("event_id", sd0), DimSpec("user_id", sd1)))
          w.create(events(s, dir).select("event_id", "user_id", "event_type", "value"))
          w.select(1, Bounds.to(100, 119)).and(0, Bounds.to(1000, 8999)).iter()
            .select("event_id", "user_id", "event_type", "value")
            .orderBy("event_id")
        },
        Some {
          val sd0 = DimMapping(0L, (1L << 20) - 1, 8192L)
          val sd1 = DimMapping(0L, (1L << 14) - 1, 128L)
          val u = cr(sd1, Bounds.to(100, 119)); val e = cr(sd0, Bounds.to(1000, 8999))
          s"""SELECT event_id, user_id, event_type, value FROM events
              WHERE ((user_id - 0) // 128) BETWEEN ${u._1} AND ${u._2}
                AND ((event_id - 0) // 8192) BETWEEN ${e._1} AND ${e._2}
              ORDER BY event_id"""
        }
      ),

      "w_spj_cells" -> QueryDef(
        // storage-partitioned join THROUGH the oracle gate: per-cell
        // summaries of two worlds sharing a grid, joined on the bucket
        // column. Both sides are pushed-aggregate scans (footer metadata
        // only), both report key-grouped partitioning, and under the
        // v2-bucketing conf the whole plan — two aggregations and the join
        // — runs with ZERO exchanges: the reference's aligned iteration of
        // two worlds over one grid, restated as Spark physical planning.
        // The conf is set in an ISOLATED session (same pattern as
        // q_global_window_auto) so partition-grouping never leaks into
        // other registry queries' plans.
        (s, dir) => {
          val s2 = isolatedSession(s)
          s2.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
          s2.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
          s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          // finer grid than the other materialized worlds: this query's cost
          // is per-cell metadata, not rows, and a ~dozen-cell world at the
          // gate's SF would make the join trivial
          val sd0 = DimMapping(0L, (1L << 20) - 1, 1024L)
          // unlike w_world_roundtrip (which deliberately TIMES the build),
          // this query measures the join of two EXISTING worlds
          val pa = cachedEventsWorld(s2, dir, "spja",
            Seq(DimSpec("event_id", sd0)), Seq("event_id", "event_type"))
          val pb = cachedEventsWorld(s2, dir, "spjb",
            Seq(DimSpec("event_id", sd0)), Seq("event_id", "value"))
          val a = s2.read.format("graft").load(pa).groupBy("c0")
            .agg(count(lit(1)).as("n_events"))
          val b = s2.read.format("graft").load(pb).groupBy("c0")
            .agg(count("value").as("n_vals"))
          a.join(b, Seq("c0")).orderBy("c0")
        },
        Some("""WITH a AS (SELECT (event_id // 1024) AS c0,
                       CAST(COUNT(*) AS BIGINT) AS n_events
                     FROM events GROUP BY 1),
                     b AS (SELECT (event_id // 1024) AS c0,
                       CAST(COUNT(value) AS BIGINT) AS n_vals
                     FROM events GROUP BY 1)
                SELECT a.c0, a.n_events, b.n_vals FROM a JOIN b ON a.c0 = b.c0
                ORDER BY a.c0""")
      ),

      "w_topn_scan" -> QueryDef(
        // top-N over the chunk grid THROUGH the connector's pushed top-N:
        // ORDER BY bucket columns LIMIT n truncates the planned chunk list
        // to the leading dirs whose footer row counts cover n (the rest of
        // the world is never planned), and the projection is bucket-only so
        // the kept files are answered from footer row counts without
        // opening a data page. Projecting ONLY the sort keys is also what
        // makes the query oracle-checkable: which physical rows fill the
        // cutoff ties is arbitrary in any engine, but the MULTISET of
        // (c0, c1) pairs of a top-n by (c0 DESC, c1 ASC) is deterministic.
        (s, dir) => {
          val sd0 = DimMapping(0L, (1L << 20) - 1, 8192L)
          val sd1 = DimMapping(0L, (1L << 14) - 1, 128L)
          val path = cachedEventsWorld(s, dir, "topn",
            Seq(DimSpec("event_id", sd0), DimSpec("user_id", sd1)),
            Seq("event_id", "user_id"))
          s.read.format("graft").load(path)
            .orderBy(col("c0").desc, col("c1"))
            .limit(500)
            .select("c0", "c1")
        },
        Some("""SELECT ((event_id - 0) // 8192) AS c0, ((user_id - 0) // 128) AS c1
                FROM events ORDER BY c0 DESC, c1 ASC LIMIT 500""")
      ),

      "w_sum_scan" -> QueryDef(
        // SUM aggregate pushdown from WRITE-TIME footer sums: the
        // connector's writer records exact integral column sums in each
        // file's key-value metadata (parquet statistics carry min/max and
        // null counts but never sums), so `SUM(x) GROUP BY bucket` is
        // answered with one footer read per surviving file — zero data
        // pages, like the COUNT/MIN/MAX pushdown it extends. The fixture
        // must be CONNECTOR-written (World.create's Spark-parquet writes
        // lack the key and would answer by per-file scan fallback — same
        // result, which GraftSumPushdownSpec pins; this row proves the
        // metadata path's arithmetic end to end).
        (s, dir) => {
          val src = new java.io.File(s"$dir/events.parquet")
          val parts = if (src.isDirectory) src.listFiles.toSeq.sortBy(_.getName)
            else Seq(src)
          val stamp = java.lang.Integer.toHexString(
            parts.map(x => (x.getName, x.length, x.lastModified)).hashCode)
          val path = s"/tmp/graft_world_sums_${stamp}_" +
            dir.replaceAll("[^0-9a-zA-Z]", "_")
          val marker = new java.io.File(path, "_graft_ready")
          if (!marker.exists) {
            events(s, dir)
              .select(col("event_id"), col("user_id"),
                expr("user_id DIV 128").as("c0"))
              .write.format("graft").mode("append").save(path)
            marker.createNewFile()
          }
          s.read.format("graft").load(path)
            .groupBy("c0")
            .agg(sum("event_id").as("sum_eid"), sum("user_id").as("sum_uid"),
              count(lit(1)).as("n"))
            .orderBy("c0")
        },
        Some("""SELECT (user_id // 128) AS c0,
                  CAST(SUM(event_id) AS BIGINT) AS sum_eid,
                  CAST(SUM(user_id) AS BIGINT) AS sum_uid,
                  COUNT(*) AS n
                FROM events GROUP BY 1 ORDER BY c0""")
      ),

      "w_bloom_scan" -> QueryDef(
        // point lookup on a NON-dim column through file-level bloom
        // skipping: the world's only dim is user_id, so an `event_id IN
        // (...)` lookup has NO bucket predicate to prune with — without
        // blooms every chunk file is planned and scheduled. With the column
        // registered in the `_graft_bloom` sidecar, planning reads each
        // candidate footer's bloom (driver-side, parallel, metadata-sized)
        // and schedules only the files that might hold one of the sought
        // ids; the readers' parquet row-group filters re-check with the
        // same blooms, and Spark's residual Filter above the scan keeps the
        // result row-exact regardless of bloom false positives — which is
        // exactly what the oracle proves (GraftBloomSpec asserts the
        // file-drop itself). The absent id exercises the all-files-refuted
        // path in the same plan.
        (s, dir) => {
          val sd1 = DimMapping(0L, (1L << 14) - 1, 128L)
          val path = cachedEventsWorld(s, dir, "bloom",
            Seq(DimSpec("user_id", sd1)),
            Seq("event_id", "user_id", "event_type", "value"),
            bloomCols = Seq("event_id"))
          s.read.format("graft").load(path)
            .where(col("event_id").isin(17L, 1023L, 4096L, 999999999L))
            .select("event_id", "user_id", "event_type", "value")
            .orderBy("event_id")
        },
        Some("""SELECT event_id, user_id, event_type, value FROM events
                WHERE event_id IN (17, 1023, 4096, 999999999)
                ORDER BY event_id""")
      ),

      "w_stats_prune" -> QueryDef(
        // manifest-carried ZONE MAPS through the oracle gate: three
        // commits land disjoint event_id terciles into the SAME chunk
        // cells (the split column is not a dim, so bucket pruning is
        // blind to it), then a range scan keys on event_id. Planning
        // tests the pushed range against each file's manifest-carried
        // min/max bounds and drops the two refuted commits' files with
        // ZERO per-file I/O — no bloom registration, no footer walk
        // (GraftStatsSpec pins the file-drop and the capture; this
        // declares the result stays row-exact through the skip). At a
        // 100k-file grid this is the difference between one manifest
        // read and 100k footer probes for every time-range query over
        // an append-ordered corpus.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wzm", "zm")
          events(s2, dir).createOrReplaceTempView("ev_src_zm")
          s2.sql("DROP TABLE IF EXISTS wzm.ev_zm")
          s2.sql("""CREATE TABLE wzm.ev_zm
                    (event_id BIGINT, user_id BIGINT, value DOUBLE, c0 BIGINT)""")
          // deterministic terciles of the id domain (event_id is dense
          // from 0): exact integer arithmetic, restated identically in
          // the oracle — an approx-quantile cut could diverge per engine
          val mx = s2.sql("SELECT max(event_id) FROM ev_src_zm").head.getLong(0)
          val (a, b) = (mx / 3, 2 * mx / 3)
          s2.sql(s"""INSERT INTO wzm.ev_zm
                     SELECT event_id, user_id, value, user_id DIV 512
                     FROM ev_src_zm WHERE event_id < $a""")
          s2.sql(s"""INSERT INTO wzm.ev_zm
                     SELECT event_id, user_id, value, user_id DIV 512
                     FROM ev_src_zm WHERE event_id >= $a AND event_id < $b""")
          s2.sql(s"""INSERT INTO wzm.ev_zm
                     SELECT event_id, user_id, value, user_id DIV 512
                     FROM ev_src_zm WHERE event_id >= $b""")
          s2.sql(s"""SELECT event_id, user_id, value FROM wzm.ev_zm
                     WHERE event_id >= $b ORDER BY event_id""")
        },
        Some("""SELECT event_id, user_id, value FROM events
                WHERE event_id >= 2 * (SELECT max(event_id) FROM events) // 3
                ORDER BY event_id""")
      ),

      "w_stats_prune_str" -> QueryDef(
        // STRING zone maps through the oracle gate: the integral twin's
        // layout (disjoint commits into the SAME cells, split on a non-dim
        // column) with the split keyed on event_type — a string. The
        // manifest carries each file's min/max as bounded 16-byte PREFIXES
        // with truncation-safe compare semantics (a cut bound can only
        // keep, never refute, a boundary value — GraftStatsSpec pins the
        // prefix algebra; this declares the end-to-end scan stays
        // row-exact through the planning-time skip). Range and equality
        // predicates on strings now prune files with zero per-file I/O,
        // exactly like the integral bounds.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wzs", "zs")
          events(s2, dir).createOrReplaceTempView("ev_src_zs")
          s2.sql("DROP TABLE IF EXISTS wzs.ev_zs")
          s2.sql("""CREATE TABLE wzs.ev_zs
                    (event_id BIGINT, event_type STRING, user_id BIGINT,
                     c0 BIGINT)""")
          // alphabet split: each commit's files cover a disjoint
          // event_type range in the same cells
          s2.sql("""INSERT INTO wzs.ev_zs
                    SELECT event_id, event_type, user_id, user_id DIV 512
                    FROM ev_src_zs WHERE event_type < 'l'""")
          s2.sql("""INSERT INTO wzs.ev_zs
                    SELECT event_id, event_type, user_id, user_id DIV 512
                    FROM ev_src_zs WHERE event_type >= 'l' AND event_type < 'r'""")
          s2.sql("""INSERT INTO wzs.ev_zs
                    SELECT event_id, event_type, user_id, user_id DIV 512
                    FROM ev_src_zs WHERE event_type >= 'r'""")
          s2.sql("""SELECT event_id, event_type, user_id FROM wzs.ev_zs
                    WHERE event_type >= 'r' ORDER BY event_id""")
        },
        Some("""SELECT event_id, event_type, user_id FROM events
                WHERE event_type >= 'r' ORDER BY event_id""")
      ),

      "w_stats_prune_ts" -> QueryDef(
        // TIMESTAMP zone maps through the oracle gate (the int/string
        // twins' layout): three commits land disjoint ts windows into the
        // SAME chunk cells, then a time-range readback keys on ts. The
        // manifest carries each file's ts bounds as int64 micros (the
        // parquet physical type), the pushed >= converts through the
        // timestamp atom, and planning drops the two refuted commits'
        // files with zero per-file I/O — the canonical "last hour over an
        // append-ordered corpus" query at 100 TB, answered from one
        // manifest read (GraftStatsSpec pins the file-drop; this declares
        // the readback row-exact through the skip).
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wzt", "zt")
          events(s2, dir).createOrReplaceTempView("ev_src_zt")
          s2.sql("DROP TABLE IF EXISTS wzt.ev_zt")
          s2.sql("""CREATE TABLE wzt.ev_zt
                    (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, c0 BIGINT)""")
          // deterministic ts terciles in exact micros arithmetic, restated
          // identically in the oracle
          val mm = s2.sql(
            "SELECT min(unix_micros(ts)), max(unix_micros(ts)) FROM ev_src_zt")
            .head
          val (lo, hi) = (mm.getLong(0), mm.getLong(1))
          val a = lo + (hi - lo) / 3
          val b = lo + 2 * ((hi - lo) / 3)
          s2.sql(s"""INSERT INTO wzt.ev_zt
                     SELECT event_id, ts, user_id, user_id DIV 512
                     FROM ev_src_zt WHERE unix_micros(ts) < $a""")
          s2.sql(s"""INSERT INTO wzt.ev_zt
                     SELECT event_id, ts, user_id, user_id DIV 512
                     FROM ev_src_zt
                     WHERE unix_micros(ts) >= $a AND unix_micros(ts) < $b""")
          s2.sql(s"""INSERT INTO wzt.ev_zt
                     SELECT event_id, ts, user_id, user_id DIV 512
                     FROM ev_src_zt WHERE unix_micros(ts) >= $b""")
          s2.sql(s"""SELECT event_id, unix_micros(ts) AS ts_us, user_id
                     FROM wzt.ev_zt
                     WHERE ts >= timestamp_micros(${b}L)
                     ORDER BY event_id""")
        },
        Some("""WITH cut AS (
                  SELECT min(CAST(epoch_us(ts) AS BIGINT))
                    + 2 * ((max(CAST(epoch_us(ts) AS BIGINT))
                            - min(CAST(epoch_us(ts) AS BIGINT))) // 3) AS b
                  FROM events)
                SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, user_id
                FROM events, cut
                WHERE CAST(epoch_us(ts) AS BIGINT) >= cut.b
                ORDER BY event_id""")
      ),

      "w_zorder_scan" -> QueryDef(
        // end-to-end over the Z-ORDERED layout: create the world with
        // zorderWithinChunks (intra-chunk rows follow the Morton curve of
        // both dims instead of the lexicographic dim sort), then run a
        // 2-dim box query — chunk-granular pruning plus the row-exact
        // residual on BOTH dims. The residual is where the z-layout pays
        // off at scale: z-sorted row groups keep every dim's min/max
        // envelope small, so the pushed residual filters skip row groups
        // inside surviving chunks no matter which dim they constrain
        // (w_zorder pins the key arithmetic; ZOrderSpec measures the
        // files-touched win; this declares the layout through the oracle
        // path). Identical results to a dim-sorted world by construction —
        // layout changes row ORDER inside files only — which is exactly
        // what the oracle must prove.
        (s, dir) => {
          val sd0 = DimMapping(0L, (1L << 20) - 1, 8192L)
          val sd1 = DimMapping(0L, (1L << 14) - 1, 128L)
          val wspecs = Seq(DimSpec("event_id", sd0), DimSpec("user_id", sd1))
          val path = cachedEventsWorld(s, dir, "z", wspecs,
            Seq("event_id", "user_id", "event_type", "value"), zorder = true)
          val w = new World(s, path, wspecs)
          w.select(0, Bounds.to(2000, 9999)).and(1, Bounds.to(64, 191)).iter()
            .where(col("event_id").between(2000, 9999) &&
              col("user_id").between(64, 191))
            .select("event_id", "user_id", "event_type", "value")
            .orderBy("event_id")
        },
        Some {
          val sd0 = DimMapping(0L, (1L << 20) - 1, 8192L)
          val sd1 = DimMapping(0L, (1L << 14) - 1, 128L)
          val e = cr(sd0, Bounds.to(2000, 9999)); val u = cr(sd1, Bounds.to(64, 191))
          s"""SELECT event_id, user_id, event_type, value FROM events
              WHERE ((event_id - 0) // 8192) BETWEEN ${e._1} AND ${e._2}
                AND ((user_id - 0) // 128) BETWEEN ${u._1} AND ${u._2}
                AND event_id BETWEEN 2000 AND 9999
                AND user_id BETWEEN 64 AND 191
              ORDER BY event_id"""
        }
      ),

      "w_catalog_dml" -> QueryDef(
        // the SQL front door through the oracle gate: a world as a CATALOG
        // table, driven purely by DDL/DML — CREATE TABLE, routed INSERT
        // INTO, then a DYNAMIC INSERT OVERWRITE that replaces exactly one
        // chunk cell (the reference's whole-chunk replace semantics,
        // tokio-fs/src/lib.rs:109-128, surfaced as ANSI SQL). The final
        // read runs through the connector's pruned scan. The oracle
        // restates the cell-replacement outcome relationally: cell-0 rows
        // (user_id//128 = 0) carry the overwritten values, every other
        // cell keeps the originals. An isolated session keeps the catalog
        // registration and partitionOverwriteMode=dynamic from leaking
        // into other registry queries' planning.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wcat", "wh")
          s2.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
          events(s2, dir).createOrReplaceTempView("ev_src")
          s2.sql("DROP TABLE IF EXISTS wcat.ev_dml")
          s2.sql("""CREATE TABLE wcat.ev_dml
                    (event_id BIGINT, user_id BIGINT, value DOUBLE, c0 BIGINT)""")
          s2.sql("""INSERT INTO wcat.ev_dml
                    SELECT event_id, user_id, value, user_id DIV 128
                    FROM ev_src""")
          s2.sql("""INSERT OVERWRITE wcat.ev_dml
                    SELECT event_id, user_id, value * 2, user_id DIV 128
                    FROM ev_src WHERE user_id DIV 128 = 0""")
          s2.sql("""SELECT event_id, user_id, value FROM wcat.ev_dml
                    ORDER BY event_id""")
        },
        Some("""SELECT event_id, user_id,
                  CASE WHEN user_id // 128 = 0 THEN value * 2 ELSE value END AS value
                FROM events ORDER BY event_id""")
      ),

      "w_default_col" -> QueryDef(
        // COLUMN DEFAULT VALUES through the oracle gate (r14): rows written
        // BEFORE a column existed read back its ADD-time EXISTENCE default
        // (served by the connector scan for files lacking the column), a
        // later SET DEFAULT changes the insert-time fill ONLY — the two
        // defaults diverge and the readback pins both, plus that the
        // footer-derived aggregate pushdown declined (a pushed COUNT over
        // the defaulted column would see pre-change files as all-null).
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wdft", "whd")
          events(s2, dir).createOrReplaceTempView("ev_dft_src")
          s2.sql("DROP TABLE IF EXISTS wdft.ev_dft")
          s2.sql("""CREATE TABLE wdft.ev_dft
                    (event_id BIGINT, user_id BIGINT, c0 BIGINT)""")
          s2.sql("""INSERT INTO wdft.ev_dft
                    SELECT event_id, user_id, user_id DIV 128
                    FROM ev_dft_src WHERE event_id % 2 = 0""")
          s2.sql("ALTER TABLE wdft.ev_dft ADD COLUMN tag STRING DEFAULT 'legacy'")
          s2.sql("ALTER TABLE wdft.ev_dft ALTER COLUMN tag SET DEFAULT 'fresh'")
          s2.sql("""INSERT INTO wdft.ev_dft (event_id, user_id, c0)
                    SELECT event_id, user_id, user_id DIV 128
                    FROM ev_dft_src WHERE event_id % 2 = 1""")
          val n = s2.sql("SELECT count(tag) FROM wdft.ev_dft")
            .collect().head.getLong(0)
          val total = s2.sql("SELECT count(*) FROM wdft.ev_dft")
            .collect().head.getLong(0)
          require(n == total,
            s"w_default_col: count(tag)=$n must cover all $total rows — " +
              "a footer-pushed aggregate treated pre-change files as null")
          s2.sql("""SELECT event_id, user_id, tag FROM wdft.ev_dft
                    ORDER BY event_id""")
        },
        Some("""SELECT event_id, user_id,
                  CASE WHEN event_id % 2 = 0 THEN 'legacy' ELSE 'fresh' END AS tag
                FROM events ORDER BY event_id""")
      ),

      "w_branch_wap" -> QueryDef(
        // write-audit-publish through the oracle gate: a base slice lands
        // on main, the remaining slices STAGE on a writable branch
        // (`option("graft.branch", ...)` appends seal branch-chain
        // manifests, invisible to main readers), an audit read checks the
        // staged state through the branch handle, and system.fast_forward
        // publishes the branch head as main's next version — pure metadata,
        // zero file moves. The readback is main AFTER publish; the oracle
        // recomputes the full union. A drifted stage, a leak of staged
        // rows into main before publish, or a lost slice at fast-forward
        // all break the hash. Abandon/divergence semantics stay pinned in
        // GraftVersionsSpec.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wwp", "wp")
          events(s2, dir).createOrReplaceTempView("ev_src_wp")
          s2.sql("DROP TABLE IF EXISTS wwp.ev_wap")
          s2.sql("""CREATE TABLE wwp.ev_wap
                    (event_id BIGINT, user_id BIGINT, value DOUBLE, c0 BIGINT)""")
          s2.sql("""INSERT INTO wwp.ev_wap
                    SELECT event_id, user_id, value, user_id DIV 128
                    FROM ev_src_wp WHERE event_id % 3 = 0""")
          s2.sql("CALL wwp.system.branch(table => 'ev_wap', name => 'stage')")
          val path = s2.conf.get("spark.sql.catalog.wwp.warehouse") + "/ev_wap"
          def stage(m: Long): Unit =
            s2.sql(s"""SELECT event_id, user_id, value, user_id DIV 128 AS c0
                       FROM ev_src_wp WHERE event_id % 3 = $m""")
              .write.format("graft").option("graft.branch", "stage")
              .mode("append").save(path)
          stage(1L); stage(2L)
          // audit: the staged head must hold the full union before publish
          val audited = s2.read.format("graft")
            .option("graft.branch", "stage").load(path).count()
          require(audited > 0, "audit read of the staged branch")
          s2.sql("CALL wwp.system.fast_forward(table => 'ev_wap', branch => 'stage')")
          s2.sql("""SELECT event_id, user_id, value FROM wwp.ev_wap
                    ORDER BY event_id""")
        },
        Some("""SELECT event_id, user_id, value FROM events ORDER BY event_id""")
      ),

      "w_wap_dml" -> QueryDef(
        // session-scoped write-audit-publish through the oracle gate:
        // `SET graft.wap.branch` routes the session's FULL DML surface —
        // UPDATE (MoR delta since r13), bucket DELETE (metadata retire), INSERT
        // (append) — through one staging branch; reads inside the session
        // audit the staged state, main stays bit-identical until
        // system.fast_forward publishes the branch head as main's next
        // version (pure metadata). The readback is main AFTER publish; the
        // oracle restates the three staged mutations relationally. A stage
        // leak to main, a lost mutation at publish, or a wrong branch-head
        // victim set in the COW all break the hash. (GraftWapSpec pins
        // isolation, refusal-on-missing-branch, and abandon semantics.)
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wwd", "wd")
          events(s2, dir).createOrReplaceTempView("ev_src_wd")
          s2.sql("DROP TABLE IF EXISTS wwd.ev_wd")
          s2.sql("""CREATE TABLE wwd.ev_wd
                    (event_id BIGINT, user_id BIGINT, value DOUBLE, c0 BIGINT)""")
          s2.sql("""INSERT INTO wwd.ev_wd
                    SELECT event_id, user_id, value, user_id DIV 256
                    FROM ev_src_wd""")
          s2.sql("CALL wwd.system.branch(table => 'ev_wd', name => 'audit')")
          s2.conf.set("graft.wap.branch", "audit")
          try {
            s2.sql("UPDATE wwd.ev_wd SET value = value * 3 WHERE c0 = 0")
            s2.sql("DELETE FROM wwd.ev_wd WHERE c0 = 1")
            s2.sql("""INSERT INTO wwd.ev_wd
                      SELECT event_id + 1000000, user_id, value, user_id DIV 256
                      FROM ev_src_wd WHERE user_id DIV 256 = 2""")
            require(s2.sql("SELECT count(*) FROM wwd.ev_wd WHERE c0 = 1")
              .head.getLong(0) == 0L, "audit: staged DELETE visible in-session")
          } finally s2.conf.unset("graft.wap.branch")
          s2.sql("CALL wwd.system.fast_forward(table => 'ev_wd', branch => 'audit')")
          s2.sql("""SELECT event_id, user_id, value FROM wwd.ev_wd
                    ORDER BY event_id, user_id""")
        },
        Some("""WITH base AS (
                  SELECT event_id, user_id,
                         CASE WHEN user_id // 256 = 0 THEN value * 3 ELSE value END AS value
                  FROM events WHERE user_id // 256 <> 1
                ), ins AS (
                  SELECT event_id + 1000000 AS event_id, user_id, value
                  FROM events WHERE user_id // 256 = 2
                )
                SELECT * FROM base UNION ALL SELECT * FROM ins
                ORDER BY event_id, user_id""")
      ),

      "w_regrid" -> QueryDef(
        // re-sharding as one SQL statement: build a table under one chunk
        // geometry, CALL system.regrid to a finer two-dim geometry (one
        // clustered rewrite job, sealed as a versioned commit that retires
        // every predecessor file in place), then a post-regrid INSERT that
        // must route by the NEW bucket columns. The readback is the whole
        // table through the connector's manifest-resolved scan; the oracle
        // recomputes both slices relationally — content must be
        // hash-identical through the geometry change. The reference pins
        // geometry at World::new forever (src/world.rs:439-447); snapshot
        // behavior across the rebuild is pinned in GraftVersionsSpec.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wrg", "rg")
          events(s2, dir).createOrReplaceTempView("ev_src_rg")
          s2.sql("DROP TABLE IF EXISTS wrg.ev_rg")
          s2.sql("""CREATE TABLE wrg.ev_rg
                    (event_id BIGINT, user_id BIGINT, value DOUBLE, c0 BIGINT)""")
          s2.sql("""INSERT INTO wrg.ev_rg
                    SELECT event_id, user_id, value, user_id DIV 128
                    FROM ev_src_rg WHERE event_id % 3 = 0""")
          s2.sql("""CALL wrg.system.regrid(table => 'ev_rg',
                    buckets => 'user_id DIV 300 AS c0, event_id % 4 AS c1')""")
          s2.sql("""INSERT INTO wrg.ev_rg
                    SELECT event_id, user_id, value, user_id DIV 300,
                           event_id % 4
                    FROM ev_src_rg WHERE event_id % 3 = 1""")
          s2.sql("""SELECT event_id, user_id, value FROM wrg.ev_rg
                    ORDER BY event_id""")
        },
        Some("""SELECT event_id, user_id, value FROM events
                WHERE event_id % 3 IN (0, 1) ORDER BY event_id""")
      ),

      "w_schema_rename" -> QueryDef(
        // schema evolution beyond ADD/DROP: column RENAME and integral
        // type-WIDENING as pure metadata (zero file rewrites) — the
        // `_graft_renames` sidecar maps the new name onto each old file's
        // spelling and readers upcast narrower physical pages, the Spark
        // restatement of the reference's decode-under-new-shape contract
        // (/root/reference/src/lib.rs:41). Two file generations: INT 'cnt'
        // files written BEFORE the rename/widen, BIGINT 'hits' files after;
        // the readback (projection, filters, and footer-resolved aggregates
        // alike) unions them under the one current name and width. The
        // oracle recomputes both generations relationally.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wrn", "rn")
          events(s2, dir).createOrReplaceTempView("ev_src_rn")
          s2.sql("DROP TABLE IF EXISTS wrn.ev_rn")
          s2.sql("""CREATE TABLE wrn.ev_rn
                    (event_id BIGINT, user_id BIGINT, cnt INT, c0 BIGINT)""")
          s2.sql("""INSERT INTO wrn.ev_rn
                    SELECT event_id, user_id, CAST(event_id % 1000 AS INT),
                           user_id DIV 128
                    FROM ev_src_rn WHERE event_id % 2 = 0""")
          s2.sql("ALTER TABLE wrn.ev_rn RENAME COLUMN cnt TO hits")
          s2.sql("ALTER TABLE wrn.ev_rn ALTER COLUMN hits TYPE BIGINT")
          s2.sql("""INSERT INTO wrn.ev_rn
                    SELECT event_id, user_id, event_id % 1000, user_id DIV 128
                    FROM ev_src_rn WHERE event_id % 2 = 1""")
          s2.sql("""SELECT event_id, user_id, hits FROM wrn.ev_rn
                    ORDER BY event_id""")
        },
        Some("""SELECT event_id, user_id, event_id % 1000 AS hits
                FROM events ORDER BY event_id""")
      ),

      "w_catalog_rowlevel" -> QueryDef(
        // row-level SQL over the grid through the oracle gate: UPDATE with a
        // row-level predicate, row-exact DELETE, then MERGE INTO (matched
        // update + not-matched insert) — the group-based copy-on-write
        // rewrite (GraftRowLevelOperation) whose replace unit is the chunk,
        // driven purely as ANSI SQL against a catalog table. The oracle
        // restates the three statements relationally (CASE for the update,
        // anti-filter for the delete, left joins for the merge). Isolated
        // session, same discipline as w_catalog_dml.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wrl", "rl")
          events(s2, dir).createOrReplaceTempView("ev_src_rl")
          s2.sql("DROP TABLE IF EXISTS wrl.ev_rl")
          s2.sql("""CREATE TABLE wrl.ev_rl
                    (event_id BIGINT, user_id BIGINT, value DOUBLE, c0 BIGINT)""")
          s2.sql("""INSERT INTO wrl.ev_rl
                    SELECT event_id, user_id, value, user_id DIV 128
                    FROM ev_src_rl WHERE event_id % 2 = 0""")
          // each statement mixes a BUCKET condition (static candidate
          // pruning bounds the copy-on-write to those cells) with a
          // row-level data predicate (what makes it a rewrite, not a
          // metadata delete) — the shape a real scoped backfill has
          s2.sql("""UPDATE wrl.ev_rl SET value = value * 3
                    WHERE c0 BETWEEN 2 AND 9 AND user_id % 97 = 5""")
          s2.sql("""DELETE FROM wrl.ev_rl
                    WHERE c0 BETWEEN 20 AND 29 AND event_id % 101 = 7""")
          s2.sql("""MERGE INTO wrl.ev_rl t
                    USING (SELECT event_id, user_id, value FROM ev_src_rl
                           WHERE event_id % 211 = 3
                             AND user_id DIV 128 BETWEEN 40 AND 49) s
                    ON t.event_id = s.event_id
                    WHEN MATCHED THEN UPDATE SET value = s.value + 100000
                    WHEN NOT MATCHED THEN INSERT (event_id, user_id, value, c0)
                      VALUES (s.event_id + 10000000, s.user_id, s.value,
                              s.user_id DIV 128)""")
          s2.sql("""SELECT event_id, user_id, value FROM wrl.ev_rl
                    ORDER BY event_id""")
        },
        Some("""WITH upd AS (
                  SELECT event_id, user_id,
                    CASE WHEN user_id // 128 BETWEEN 2 AND 9 AND user_id % 97 = 5
                         THEN value * 3 ELSE value END AS value
                  FROM events WHERE event_id % 2 = 0),
                del AS (SELECT * FROM upd
                        WHERE NOT (user_id // 128 BETWEEN 20 AND 29
                                   AND event_id % 101 = 7)),
                src AS (SELECT event_id, user_id, value FROM events
                        WHERE event_id % 211 = 3
                          AND user_id // 128 BETWEEN 40 AND 49),
                merged AS (
                  SELECT d.event_id, d.user_id,
                    CASE WHEN s.event_id IS NOT NULL THEN s.value + 100000
                         ELSE d.value END AS value
                  FROM del d LEFT JOIN src s ON d.event_id = s.event_id),
                ins AS (
                  SELECT s.event_id + 10000000 AS event_id, s.user_id, s.value
                  FROM src s LEFT JOIN del d ON d.event_id = s.event_id
                  WHERE d.event_id IS NULL)
                SELECT event_id, user_id, value FROM merged
                UNION ALL SELECT event_id, user_id, value FROM ins
                ORDER BY event_id""")
      ),

      "w_mor_delete" -> QueryDef(
        // MERGE-ON-READ row-level DELETE through the oracle gate: selective
        // data-column predicates take the DELTA path (GraftDeltaDeleteOp) —
        // per-file DELETION VECTORS of matched row positions, referenced
        // from the sealed manifest, ZERO data bytes rewritten (the query
        // itself asserts every data file of the pre-delete version is still
        // the live one, and that vectors exist) — where the same statements
        // used to COW-rewrite every candidate cell. Two DELETEs overlap on
        // files, so the second unions into fresh sidecars; the readback is
        // the live state (vectors applied at scan), plus the v1 snapshot
        // count proving time travel reads the PRE-delete rows through the
        // vector-free entries. Oracle: both filters applied relationally.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wmd", "md")
          events(s2, dir).createOrReplaceTempView("ev_src_md")
          s2.sql("DROP TABLE IF EXISTS wmd.ev_md")
          s2.sql("""CREATE TABLE wmd.ev_md
                    (event_id BIGINT, user_id BIGINT, value DOUBLE, c0 BIGINT)""")
          s2.sql("""INSERT INTO wmd.ev_md
                    SELECT event_id, user_id, value, user_id DIV 128
                    FROM ev_src_md WHERE event_id % 2 = 0""")
          val wh = s2.conf.get("spark.sql.catalog.wmd.warehouse")
          val fs = org.apache.hadoop.fs.FileSystem.get(
            new java.net.URI(s"$wh/ev_md"),
            new org.apache.hadoop.conf.Configuration())
          val root = new org.apache.hadoop.fs.Path(s"$wh/ev_md")
          val pre = graft.sources.GraftVersions.readEntries(fs, root, 1L)
            .map(e => e.rel -> e.size).toMap
          s2.sql("DELETE FROM wmd.ev_md WHERE event_id % 89 = 3")
          s2.sql("DELETE FROM wmd.ev_md WHERE user_id % 131 = 17")
          val after = graft.sources.GraftVersions.readEntries(fs, root,
            graft.sources.GraftVersions.latestVersion(fs, root).get)
          require(after.exists(_.dv.isDefined),
            "w_mor_delete must take the deletion-vector path")
          require(after.map(e => e.rel -> e.size).toMap == pre,
            "a MOR delete must keep every pre-delete data file live, unchanged")
          s2.sql("""SELECT event_id, user_id, value,
                      (SELECT count(*) FROM wmd.ev_md VERSION AS OF 1)
                        AS pre_delete_rows
                    FROM wmd.ev_md ORDER BY event_id""")
        },
        Some("""SELECT event_id, user_id, value,
                  (SELECT count(*) FROM events WHERE event_id % 2 = 0)
                    AS pre_delete_rows
                FROM events
                WHERE event_id % 2 = 0
                  AND event_id % 89 <> 3 AND user_id % 131 <> 17
                ORDER BY event_id""")
      ),

      "w_mor_update" -> QueryDef(
        // MERGE-ON-READ row-level UPDATE through the oracle gate: a
        // selective non-relocating label fix takes the DELTA path
        // (GraftDeltaUpdateOperation) — matched old images retire by
        // POSITION into deletion vectors, the new images append through
        // the routed chunk writer into their unchanged cells, one seal
        // swaps both in. ZERO pre-existing data bytes move (the query
        // asserts every pre-update file is still live at its exact size,
        // and that vectors exist) — where the COW path rewrote every
        // matched cell: at 100 TB a 1-row fix in a 1-GB cell now writes a
        // ~20-byte sidecar plus a 1-row file instead of the gigabyte. The
        // readback unions the live state with the VERSION AS OF 1
        // pre-update snapshot, so the one hash proves the update applied
        // AND the superseded positions still serve time travel.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wmu", "mu")
          events(s2, dir).createOrReplaceTempView("ev_src_mu")
          s2.sql("DROP TABLE IF EXISTS wmu.ev_mu")
          s2.sql("""CREATE TABLE wmu.ev_mu
                    (event_id BIGINT, user_id BIGINT, value DOUBLE, c0 BIGINT)""")
          s2.sql("""INSERT INTO wmu.ev_mu
                    SELECT event_id, user_id, value, user_id DIV 128
                    FROM ev_src_mu WHERE event_id % 2 = 0""")
          val wh = s2.conf.get("spark.sql.catalog.wmu.warehouse")
          val fs = org.apache.hadoop.fs.FileSystem.get(
            new java.net.URI(s"$wh/ev_mu"),
            new org.apache.hadoop.conf.Configuration())
          val root = new org.apache.hadoop.fs.Path(s"$wh/ev_mu")
          val pre = graft.sources.GraftVersions.readEntries(fs, root, 1L)
            .map(e => e.rel -> e.size).toMap
          s2.sql("""UPDATE wmu.ev_mu SET value = value + 1000000
                    WHERE event_id % 97 = 11""")
          val after = graft.sources.GraftVersions.readEntries(fs, root,
            graft.sources.GraftVersions.latestVersion(fs, root).get)
          require(after.exists(_.dv.isDefined),
            "w_mor_update must take the deletion-vector delta path")
          require(pre.forall { case (rel, sz) =>
            after.exists(e => e.rel == rel && e.size == sz) },
            "a MOR update must keep every pre-update data file live, unchanged")
          s2.sql("""SELECT 'v1' AS at, event_id, user_id, value
                    FROM wmu.ev_mu VERSION AS OF 1
                    UNION ALL
                    SELECT 'now' AS at, event_id, user_id, value FROM wmu.ev_mu
                    ORDER BY at, event_id""")
        },
        Some("""SELECT 'v1' AS at, event_id, user_id, value FROM events
                WHERE event_id % 2 = 0
                UNION ALL
                SELECT 'now' AS at, event_id, user_id,
                  CASE WHEN event_id % 97 = 11 THEN value + 1000000
                       ELSE value END AS value
                FROM events WHERE event_id % 2 = 0
                ORDER BY at, event_id""")
      ),

      "w_mor_merge" -> QueryDef(
        // MERGE-ON-READ MERGE INTO through the oracle gate: matched
        // update and delete branches retire old images by POSITION into
        // deletion vectors, not-matched source rows insert through the
        // routed chunk writer, one seal swaps both in — the query asserts
        // every pre-merge data file is still live at its exact size and
        // that vectors exist, i.e. the whole three-branch statement moved
        // ZERO pre-existing bytes (the COW path rewrote every matched
        // cell). Oracle: the three branches restated relationally.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wmg", "mg")
          events(s2, dir).createOrReplaceTempView("ev_src_mg")
          s2.sql("DROP TABLE IF EXISTS wmg.ev_mg")
          s2.sql("""CREATE TABLE wmg.ev_mg
                    (event_id BIGINT, user_id BIGINT, value DOUBLE, c0 BIGINT)""")
          s2.sql("""INSERT INTO wmg.ev_mg
                    SELECT event_id, user_id, value, user_id DIV 128
                    FROM ev_src_mg WHERE event_id % 2 = 0""")
          val wh = s2.conf.get("spark.sql.catalog.wmg.warehouse")
          val fs = org.apache.hadoop.fs.FileSystem.get(
            new java.net.URI(s"$wh/ev_mg"),
            new org.apache.hadoop.conf.Configuration())
          val root = new org.apache.hadoop.fs.Path(s"$wh/ev_mg")
          val pre = graft.sources.GraftVersions.readEntries(fs, root, 1L)
            .map(e => e.rel -> e.size).toMap
          // source: odd ids (not matched -> insert), plus a slice of even
          // ids split between an update branch and a delete branch
          s2.sql("""MERGE INTO wmg.ev_mg t
                    USING (SELECT event_id, user_id, value FROM ev_src_mg
                           WHERE event_id % 2 = 1 AND event_id % 101 = 7
                              OR event_id % 2 = 0 AND event_id % 97 = 11) s
                    ON t.event_id = s.event_id
                    WHEN MATCHED AND t.event_id % 194 = 108
                      THEN DELETE
                    WHEN MATCHED THEN UPDATE SET value = s.value + 1000000
                    WHEN NOT MATCHED THEN
                      INSERT (event_id, user_id, value, c0)
                      VALUES (s.event_id, s.user_id, s.value, s.user_id DIV 128)""")
          val after = graft.sources.GraftVersions.readEntries(fs, root,
            graft.sources.GraftVersions.latestVersion(fs, root).get)
          require(after.exists(_.dv.isDefined),
            "w_mor_merge must take the deletion-vector delta path")
          require(pre.forall { case (rel, sz) =>
            after.exists(e => e.rel == rel && e.size == sz) },
            "a MOR merge must keep every pre-merge data file live, unchanged")
          s2.sql("""SELECT event_id, user_id, value FROM wmg.ev_mg
                    ORDER BY event_id""")
        },
        Some("""WITH base AS (
                  SELECT event_id, user_id, value FROM events
                  WHERE event_id % 2 = 0),
                src AS (
                  SELECT event_id, user_id, value FROM events
                  WHERE event_id % 2 = 1 AND event_id % 101 = 7
                     OR event_id % 2 = 0 AND event_id % 97 = 11),
                merged AS (
                  SELECT b.event_id, b.user_id,
                    CASE WHEN s.event_id IS NOT NULL
                         THEN s.value + 1000000 ELSE b.value END AS value,
                    (s.event_id IS NOT NULL AND b.event_id % 194 = 108)
                      AS is_del
                  FROM base b LEFT JOIN src s ON b.event_id = s.event_id),
                ins AS (
                  SELECT s.event_id, s.user_id, s.value
                  FROM src s LEFT JOIN base b ON b.event_id = s.event_id
                  WHERE b.event_id IS NULL)
                SELECT event_id, user_id, value FROM merged WHERE NOT is_del
                UNION ALL SELECT event_id, user_id, value FROM ins
                ORDER BY event_id""")
      ),

      "w_mor_upsert" -> QueryDef(
        // MERGE-ON-READ programmatic UPSERT through the oracle gate (r14):
        // `World.insert` on a versioned world takes the delta path
        // (GraftMor) — displaced rows retire BY POSITION into deletion
        // vectors, incoming rows route-append into their cells, ONE seal
        // swaps both in. ZERO pre-existing data bytes move (the query
        // asserts every pre-upsert file is still live at its exact size,
        // and that vectors exist) — where the COW path rewrote every
        // affected cell: a 10-row CDC epoch into 10 gigabyte cells now
        // writes ~10 sidecar entries + 10 rows instead of 10 GB. This is
        // the write path every streaming upsert epoch and index/MV refresh
        // rides. The readback unions the live state (vectors applied) with
        // the VERSION AS OF 1 pre-upsert snapshot; the displaced count is
        // pinned to the reference's replace-on-conflict contract
        // (/root/reference/src/world.rs:124-150).
        (s, dir) => {
          val s2 = isolatedSession(s)
          val path = s"/tmp/graft_world_morup_${dir.replaceAll("[^0-9a-zA-Z]", "_")}"
          val fs = org.apache.hadoop.fs.FileSystem.get(
            new java.net.URI(path), new org.apache.hadoop.conf.Configuration())
          val root = new org.apache.hadoop.fs.Path(path)
          fs.delete(root, true) // stateful fixture: rebuild per run
          // coarse grid on purpose: the fixture REBUILDS every run, and a
          // fine 8192×128 grid scatters the append across ~9k tiny cells —
          // all fixture cost, no behavior (the MoR path under test is
          // grid-agnostic; the oracle carries no bucket arithmetic)
          val sd0 = DimMapping(0L, (1L << 20) - 1, 1L << 16)
          val sd1 = DimMapping(0L, (1L << 14) - 1, 2048L)
          val w = new World(s2, path,
            Seq(DimSpec("event_id", sd0), DimSpec("user_id", sd1)))
          val e = events(s2, dir).select("event_id", "user_id", "value")
          // connector append seals v1: the log is authoritative from here
          w.append(e.where(col("event_id") % 2 === 0))
          val pre = graft.sources.GraftVersions.readEntries(fs, root, 1L)
            .map(x => x.rel -> x.size).toMap
          // upsert = replace-on-conflict: a slice of existing ids with new
          // values (displaced) + a slice of odd ids (fresh inserts)
          val upd = e.where(col("event_id") % 2 === 0 && col("event_id") % 97 === 11)
            .withColumn("value", col("value") + 1000000)
          val ins = e.where(col("event_id") % 2 === 1 && col("event_id") % 101 === 7)
          val displaced = w.insert(upd.unionByName(ins))
          val expect = upd.count()
          require(displaced == expect,
            s"w_mor_upsert: displaced $displaced, expected $expect")
          val after = graft.sources.GraftVersions.readEntries(fs, root,
            graft.sources.GraftVersions.latestVersion(fs, root).get)
          require(after.exists(_.dv.isDefined),
            "w_mor_upsert must take the deletion-vector delta path")
          require(pre.forall { case (rel, sz) =>
            after.exists(x => x.rel == rel && x.size == sz) },
            "a MOR upsert must keep every pre-upsert data file live, unchanged")
          w.snapshot(1).select(lit("v1").as("at"),
              col("event_id"), col("user_id"), col("value"))
            .unionByName(w.df.select(lit("now").as("at"),
              col("event_id"), col("user_id"), col("value")))
            .orderBy("at", "event_id")
        },
        Some("""SELECT 'v1' AS at, event_id, user_id, value FROM events
                WHERE event_id % 2 = 0
                UNION ALL
                SELECT 'now' AS at, event_id, user_id,
                  CASE WHEN event_id % 97 = 11 THEN value + 1000000
                       ELSE value END AS value
                FROM events WHERE event_id % 2 = 0
                UNION ALL
                SELECT 'now' AS at, event_id, user_id, value FROM events
                WHERE event_id % 2 = 1 AND event_id % 101 = 7
                ORDER BY at, event_id""")
      ),

      "w_time_travel" -> QueryDef(
        // snapshot reads over the chunk grid through the oracle gate:
        // INSERT seals commit v1, a row-level UPDATE (merge-on-read since
        // r13 — the superseded positions retire into vectors, kept
        // addressable) seals v2 — and `VERSION AS OF 1` reads the PRE-update
        // state back out of the version log while the live table shows the
        // post-update state. The one query returns both (tagged UNION), so
        // the hash proves simultaneously that the update happened and that
        // the snapshot preserved the superseded bytes. The oracle restates
        // each side relationally. Scale shape: a snapshot read costs one
        // manifest read + per-file history probes of the SELECTED files
        // only — no data is ever copied to make a version addressable.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wtt", "tt")
          events(s2, dir).createOrReplaceTempView("ev_src_tt")
          s2.sql("DROP TABLE IF EXISTS wtt.ev_tt")
          s2.sql("""CREATE TABLE wtt.ev_tt
                    (event_id BIGINT, user_id BIGINT, value DOUBLE, c0 BIGINT)""")
          s2.sql("""INSERT INTO wtt.ev_tt
                    SELECT event_id, user_id, value, user_id DIV 128
                    FROM ev_src_tt WHERE event_id % 2 = 0""")
          s2.sql("""UPDATE wtt.ev_tt SET value = value * 7
                    WHERE c0 BETWEEN 2 AND 9 AND user_id % 89 = 3""")
          s2.sql("""SELECT 'v1' AS at, event_id, user_id, value
                    FROM wtt.ev_tt VERSION AS OF 1
                    UNION ALL
                    SELECT 'now' AS at, event_id, user_id, value FROM wtt.ev_tt
                    ORDER BY at, event_id""")
        },
        Some("""SELECT 'v1' AS at, event_id, user_id, value FROM events
                WHERE event_id % 2 = 0
                UNION ALL
                SELECT 'now' AS at, event_id, user_id,
                  CASE WHEN user_id // 128 BETWEEN 2 AND 9 AND user_id % 89 = 3
                       THEN value * 7 ELSE value END AS value
                FROM events WHERE event_id % 2 = 0
                ORDER BY at, event_id""")
      ),

      "w_rollback" -> QueryDef(
        // the undo button through the oracle gate: INSERT (v1), a bad
        // "backfill" UPDATE (v2), `CALL system.rollback(version => 1)` —
        // pure file renames restoring v1's manifest as a NEW commit — then
        // retention (`expire_versions`) pruning everything but the restored
        // state. The final read must hash-match the ORIGINAL insert: if the
        // rollback missed a cell or retention broke a live file, the gate
        // goes red. */
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wrb", "rb")
          events(s2, dir).createOrReplaceTempView("ev_src_rb")
          s2.sql("DROP TABLE IF EXISTS wrb.ev_rb")
          s2.sql("""CREATE TABLE wrb.ev_rb
                    (event_id BIGINT, user_id BIGINT, value DOUBLE, c0 BIGINT)""")
          s2.sql("""INSERT INTO wrb.ev_rb
                    SELECT event_id, user_id, value, user_id DIV 128
                    FROM ev_src_rb WHERE event_id % 2 = 0""")
          s2.sql("""UPDATE wrb.ev_rb SET value = -value
                    WHERE c0 BETWEEN 10 AND 19 AND event_id % 7 = 2""")
          s2.sql("CALL wrb.system.rollback(table => 'ev_rb', version => 1)")
          s2.sql("CALL wrb.system.expire_versions(table => 'ev_rb', keep => 1)")
          s2.sql("""SELECT event_id, user_id, value FROM wrb.ev_rb
                    ORDER BY event_id""")
        },
        Some("""SELECT event_id, user_id, value FROM events
                WHERE event_id % 2 = 0 ORDER BY event_id""")
      ),

      "w_catalog_merge2" -> QueryDef(
        // MERGE's third face through the oracle gate: WHEN NOT MATCHED BY
        // SOURCE (conditional UPDATE and DELETE branches) — the dimension-
        // table-sync shape where target rows absent from the source must be
        // touched. Spark's rewrite makes every clause one more branch of the
        // same chunk-granular copy-on-write plan GraftRowLevelOperation
        // already runs; the NMBS conditions here carry bucket predicates, so
        // candidate pruning still bounds the rewrite to those cells plus the
        // matched cells. The oracle restates the three branches with a left
        // join + CASE + anti-filter.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wm2", "m2")
          events(s2, dir).createOrReplaceTempView("ev_src_m2")
          s2.sql("DROP TABLE IF EXISTS wm2.ev_m2")
          s2.sql("""CREATE TABLE wm2.ev_m2
                    (event_id BIGINT, user_id BIGINT, value DOUBLE, c0 BIGINT)""")
          s2.sql("""INSERT INTO wm2.ev_m2
                    SELECT event_id, user_id, value, user_id DIV 128
                    FROM ev_src_m2 WHERE event_id % 2 = 0""")
          s2.sql("""MERGE INTO wm2.ev_m2 t
                    USING (SELECT event_id, value FROM ev_src_m2
                           WHERE user_id DIV 128 BETWEEN 30 AND 49
                             AND event_id % 3 = 0) s
                    ON t.event_id = s.event_id
                    WHEN MATCHED THEN UPDATE SET value = s.value + 5000
                    WHEN NOT MATCHED BY SOURCE
                      AND t.c0 BETWEEN 30 AND 39 AND t.event_id % 5 = 1
                      THEN UPDATE SET value = 0
                    WHEN NOT MATCHED BY SOURCE
                      AND t.c0 BETWEEN 40 AND 49 AND t.event_id % 5 = 2
                      THEN DELETE""")
          s2.sql("""SELECT event_id, user_id, value FROM wm2.ev_m2
                    ORDER BY event_id""")
        },
        Some("""WITH m AS (SELECT event_id FROM events
                           WHERE user_id // 128 BETWEEN 30 AND 49
                             AND event_id % 3 = 0)
                SELECT e.event_id, e.user_id,
                  CASE WHEN m.event_id IS NOT NULL THEN e.value + 5000
                       WHEN e.user_id // 128 BETWEEN 30 AND 39
                            AND e.event_id % 5 = 1 THEN 0
                       ELSE e.value END AS value
                FROM events e LEFT JOIN m ON e.event_id = m.event_id
                WHERE e.event_id % 2 = 0
                  AND NOT (m.event_id IS NULL
                           AND e.user_id // 128 BETWEEN 40 AND 49
                           AND e.event_id % 5 = 2)
                ORDER BY e.event_id""")
      ),

      "w_changes" -> QueryDef(
        // the chunk-granular CHANGE FEED through the oracle gate: INSERT
        // (v1), a scoped UPDATE (v2, MoR delta since r13), then
        // GraftChanges.between(1, 2) — rows of files only in v2 tagged
        // 'insert', rows of files only in v1 tagged 'delete', straight
        // from the manifest diff (no row-level change tracking exists or
        // is needed). The oracle restates the contract: exactly the cells
        // CONTAINING a matching row appear, with all their rows on both
        // sides — candidate narrowing to matched cells is pinned by
        // GraftCatalogSpec (runtime group filtering), so the two engines
        // agree on the cell set by construction, not by luck. The scale
        // story IS the query: an incremental consumer reads changed cells
        // only, never re-scans the table.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wch", "ch")
          events(s2, dir).createOrReplaceTempView("ev_src_ch")
          s2.sql("DROP TABLE IF EXISTS wch.ev_ch")
          s2.sql("""CREATE TABLE wch.ev_ch
                    (event_id BIGINT, user_id BIGINT, value DOUBLE, c0 BIGINT)""")
          s2.sql("""INSERT INTO wch.ev_ch
                    SELECT event_id, user_id, value, user_id DIV 128
                    FROM ev_src_ch WHERE event_id % 2 = 0""")
          s2.sql("""UPDATE wch.ev_ch SET value = value + 1
                    WHERE c0 BETWEEN 0 AND 1 AND user_id % 11 = 4""")
          val wh = s2.conf.get("spark.sql.catalog.wch.warehouse")
          graft.sources.GraftChanges.between(s2, s"$wh/ev_ch", 1L, 2L)
            .select(col("_change_type"), col("event_id"), col("user_id"),
              col("value"))
            .orderBy("_change_type", "event_id")
        },
        Some("""WITH cells AS (SELECT DISTINCT user_id // 128 AS c0 FROM events
                               WHERE user_id // 128 BETWEEN 0 AND 1
                                 AND user_id % 11 = 4 AND event_id % 2 = 0),
                scoped AS (SELECT e.* FROM events e
                           JOIN cells c ON e.user_id // 128 = c.c0
                           WHERE e.event_id % 2 = 0)
                SELECT 'delete' AS _change_type, event_id, user_id, value
                FROM scoped
                UNION ALL
                SELECT 'insert' AS _change_type, event_id, user_id,
                  CASE WHEN user_id % 11 = 4 THEN value + 1 ELSE value END AS value
                FROM scoped
                ORDER BY _change_type, event_id""")
      ),

      "w_snapshot_agg" -> QueryDef(
        // THREE features composed under one oracle: aggregate pushdown ×
        // footer sums × time travel. COUNT/SUM GROUP BY bucket, pinned to
        // the PRE-UPDATE version, must be answered from footer metadata of
        // the v1 entries — which the MoR update has since VECTORED on the
        // live head (pushdown declines there), but the v1 manifest names
        // them vector-free, so the snapshot agg reads row counts + the
        // writer's sums identically and answers yesterday's aggregate
        // without touching a data page. The oracle predicts the
        // pre-UPDATE state.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wsa", "sa")
          events(s2, dir).createOrReplaceTempView("ev_src_sa")
          s2.sql("DROP TABLE IF EXISTS wsa.ev_sa")
          s2.sql("""CREATE TABLE wsa.ev_sa
                    (event_id BIGINT, user_id BIGINT, c0 BIGINT)""")
          // half the events: the gate proves the metadata path, not the
          // fixture write price (same slimming as w_mv_refresh)
          s2.sql("""INSERT INTO wsa.ev_sa
                    SELECT event_id, user_id, user_id DIV 128
                    FROM ev_src_sa WHERE event_id % 2 = 0""")
          s2.sql("""UPDATE wsa.ev_sa SET user_id = user_id + 10000
                    WHERE c0 = 0 AND event_id % 2 = 0""")
          s2.sql("""SELECT c0, COUNT(*) AS n,
                      SUM(event_id) AS sum_eid, SUM(user_id) AS sum_uid
                    FROM wsa.ev_sa VERSION AS OF 1
                    GROUP BY c0 ORDER BY c0""")
        },
        Some("""SELECT (user_id // 128) AS c0, COUNT(*) AS n,
                  CAST(SUM(event_id) AS BIGINT) AS sum_eid,
                  CAST(SUM(user_id) AS BIGINT) AS sum_uid
                FROM events WHERE event_id % 2 = 0
                GROUP BY 1 ORDER BY c0""")
      ),

      "w_compact_scan" -> QueryDef(
        // MAINTENANCE through the oracle gate: three small INSERTs fragment
        // a cell into multiple files, `CALL system.compact` rewrites it to
        // one file per chunk — and the readback must hash-match the union
        // exactly. Compaction that drops, duplicates, or reorders-without-
        // resorting a single row breaks the gate; the files-per-cell
        // mechanics stay pinned in GraftCatalogSpec.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wcp", "cp")
          events(s2, dir).createOrReplaceTempView("ev_src_cp")
          s2.sql("DROP TABLE IF EXISTS wcp.ev_cp")
          s2.sql("""CREATE TABLE wcp.ev_cp
                    (event_id BIGINT, user_id BIGINT, c0 BIGINT)""")
          // three appends over HALF the events (fragmentation is what the
          // gate needs; fixture volume only prices the writes)
          (0 until 3).foreach(i =>
            s2.sql(s"""INSERT INTO wcp.ev_cp
                       SELECT event_id, user_id, user_id DIV 128
                       FROM ev_src_cp WHERE event_id % 6 = ${2 * i}"""))
          s2.sql("CALL wcp.system.compact(table => 'ev_cp', max_files => 1)")
          s2.sql("SELECT event_id, user_id FROM wcp.ev_cp ORDER BY event_id")
        },
        Some("""SELECT event_id, user_id FROM events
                WHERE event_id % 2 = 0 ORDER BY event_id""")
      ),

      "w_expire_scan" -> QueryDef(
        // RETENTION through the oracle gate: three versioned commits, then
        // `expire_versions(keep => 1)` prunes the history — and the LIVE
        // read must still be the exact union (retention touches only
        // superseded history files and old manifests, never live data).
        // An expire that deleted a live file or rewrote a manifest wrong
        // breaks the hash; the version-window mechanics stay pinned in
        // GraftVersionsSpec.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wex", "ex")
          events(s2, dir).createOrReplaceTempView("ev_src_ex")
          s2.sql("DROP TABLE IF EXISTS wex.ev_ex")
          s2.sql("""CREATE TABLE wex.ev_ex
                    (event_id BIGINT, user_id BIGINT, c0 BIGINT)""")
          (0 until 3).foreach(i =>
            s2.sql(s"""INSERT INTO wex.ev_ex
                       SELECT event_id, user_id, user_id DIV 128
                       FROM ev_src_ex WHERE event_id % 6 = ${2 * i}"""))
          s2.sql("CALL wex.system.expire_versions(table => 'ev_ex', keep => 1)")
          s2.sql("SELECT event_id, user_id FROM wex.ev_ex ORDER BY event_id")
        },
        Some("""SELECT event_id, user_id FROM events
                WHERE event_id % 2 = 0 ORDER BY event_id""")
      ),

      "w_index_lookup" -> QueryDef(
        // the INCREMENTALLY-MAINTAINED INVERTED INDEX through the oracle
        // gate: build the posting world from a snapshot, then an INSERT
        // (new docs) and a row-level UPDATE (doc 3's text replaced — the
        // feed's delete+insert pair) advance the base, refresh() consumes
        // ONLY the commit-log change feed, and a term lookup — a
        // chunk-stripe-pruned scan of the posting grid — must equal
        // DuckDB's recount over the final corpus. A missed before-image
        // (stale postings), a skipped insert, or a pruning bug that drops
        // the term's stripe all break the hash. Pruned-plan and
        // torn-refresh mechanics stay pinned in InvertedIndexSpec.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wix", "ix")
          t(s2, dir, "documents").createOrReplaceTempView("doc_src_ix")
          s2.sql("DROP TABLE IF EXISTS wix.docs_ix")
          s2.sql("CREATE TABLE wix.docs_ix (doc_id BIGINT, text STRING, c0 BIGINT)")
          s2.sql("""INSERT INTO wix.docs_ix
                    SELECT doc_id, text, doc_id DIV 1024 FROM doc_src_ix
                    WHERE doc_id % 10 = 0""")
          val wh = s2.conf.get("spark.sql.catalog.wix.warehouse")
          // fixture-sized grid (2 x 4 cells): the gate proves the refresh
          // and pruning MECHANICS; a production-width grid here would only
          // price per-file fixed costs into the bench
          val ix = new graft.ops.InvertedIndex(
            s2, s"$wh/docs_ix", s"${wh}__idx/docs_ix",
            pidChunks = 2, fpChunks = 4)
          ix.initialize()
          // ONE post-init commit: the row-level UPDATE exercises BOTH feed
          // sides (its cell's before-image deletes + rewritten inserts);
          // a separate INSERT commit would re-prove the same refresh path
          // at another full engine-cycle's bench price (the cycle cost
          // here is Spark action latency across five statements, not data
          // volume — at production batch sizes one refresh amortizes over
          // millions of docs)
          s2.sql("""UPDATE wix.docs_ix SET text = 'spark spark spark'
                    WHERE c0 = 0 AND doc_id = 10""")
          ix.refresh()
          ix.docsFor("spark").orderBy("doc_id")
        },
        Some("""WITH base AS (
                  SELECT doc_id,
                    CASE WHEN doc_id = 10 THEN 'spark spark spark'
                         ELSE text END AS text
                  FROM documents WHERE doc_id % 10 = 0),
                tok AS (
                  SELECT doc_id, unnest(list_filter(
                    string_split_regex(trim(lower(text)), '\s+'),
                    x -> x <> '')) AS w
                  FROM base)
                SELECT doc_id, COUNT(*) AS tf FROM tok WHERE w = 'spark'
                GROUP BY doc_id ORDER BY doc_id""")
      ),

      "w_net_changes" -> QueryDef(
        // the ROW-LEVEL NET change view through the oracle gate: the same
        // INSERT (v1) + scoped UPDATE (v2) scenario as w_changes, but
        // consumed via GraftChanges.netBetween — the multiset difference
        // of the chunk-granular feed's two sides, so ONLY the rows the
        // UPDATE actually touched surface (before-image on the delete
        // side, new value on the insert side) while the untouched rows of
        // touched cells cancel exactly. An EXCEPT ALL bug, a
        // before-image drift, or a cell-set mismatch all break the hash.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wnc", "nc")
          events(s2, dir).createOrReplaceTempView("ev_src_nc")
          s2.sql("DROP TABLE IF EXISTS wnc.ev_nc")
          s2.sql("""CREATE TABLE wnc.ev_nc
                    (event_id BIGINT, user_id BIGINT, value DOUBLE, c0 BIGINT)""")
          s2.sql("""INSERT INTO wnc.ev_nc
                    SELECT event_id, user_id, value, user_id DIV 128
                    FROM ev_src_nc WHERE event_id % 2 = 0""")
          s2.sql("""UPDATE wnc.ev_nc SET value = value + 1
                    WHERE c0 BETWEEN 0 AND 1 AND user_id % 11 = 4""")
          val wh = s2.conf.get("spark.sql.catalog.wnc.warehouse")
          graft.sources.GraftChanges.netBetween(s2, s"$wh/ev_nc", 1L, 2L)
            .select(col("_change_type"), col("event_id"), col("user_id"),
              col("value"))
            .orderBy("_change_type", "event_id")
        },
        Some("""SELECT 'delete' AS _change_type, event_id, user_id, value
                FROM events
                WHERE user_id // 128 BETWEEN 0 AND 1 AND user_id % 11 = 4
                  AND event_id % 2 = 0
                UNION ALL
                SELECT 'insert', event_id, user_id, value + 1
                FROM events
                WHERE user_id // 128 BETWEEN 0 AND 1 AND user_id % 11 = 4
                  AND event_id % 2 = 0
                ORDER BY _change_type, event_id""")
      ),

      "w_index_bm25" -> QueryDef(
        // RANKED RETRIEVAL through the index: BM25 over the posting world
        // — per query term one pruned stripe scan, N/avgdl from the length
        // stripe, never a corpus scan — after a row-level UPDATE has
        // changed one doc's text through the commit-log refresh. The
        // oracle recomputes BM25 relationally over the post-UPDATE corpus
        // (the t_bm25 arithmetic, N counted over ALL docs to match the
        // length stripe); a stale posting, a wrong df, or a length row
        // the refresh missed all break the hash.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wib", "ib")
          t(s2, dir, "documents").createOrReplaceTempView("doc_src_ib")
          s2.sql("DROP TABLE IF EXISTS wib.docs_ib")
          s2.sql("CREATE TABLE wib.docs_ib (doc_id BIGINT, text STRING, c0 BIGINT)")
          s2.sql("""INSERT INTO wib.docs_ib
                    SELECT doc_id, text, doc_id DIV 1024 FROM doc_src_ib
                    WHERE doc_id % 10 = 0""")
          val wh = s2.conf.get("spark.sql.catalog.wib.warehouse")
          val ix = new graft.ops.InvertedIndex(
            s2, s"$wh/docs_ib", s"${wh}__idx/docs_ib",
            pidChunks = 2, fpChunks = 4)
          ix.initialize()
          s2.sql("""UPDATE wib.docs_ib SET text = 'spark spark spark'
                    WHERE c0 = 0 AND doc_id = 10""")
          ix.refresh()
          ix.searchBm25(Seq("spark", "join", "fast"), 10)
        },
        Some("""WITH base AS (
                  SELECT doc_id,
                    CASE WHEN doc_id = 10 THEN 'spark spark spark'
                         ELSE text END AS text
                  FROM documents WHERE doc_id % 10 = 0),
                w AS (
                  SELECT doc_id, unnest(list_filter(
                    string_split_regex(trim(lower(text)), '\s+'),
                    x -> x <> '')) AS w
                  FROM base),
                dl AS (
                  SELECT doc_id, CAST(len(list_filter(
                    string_split_regex(trim(lower(text)), '\s+'),
                    x -> x <> '')) AS BIGINT) AS dl
                  FROM base),
                st AS (SELECT COUNT(*) AS n_docs,
                         CAST(SUM(dl) AS DOUBLE) AS tot_dl FROM dl),
                tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM w
                       WHERE w IN ('spark','join','fast') GROUP BY doc_id, w),
                dfc AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
                sc AS (
                  SELECT tf.doc_id,
                    CAST(ROUND((ln(1.0 + ((st.n_docs - dfc.df) + 0.5) / (dfc.df + 0.5))
                      * ((tf.tf * 2.2) / (tf.tf + (0.3 + 0.9 *
                          (CAST(dl.dl AS DOUBLE) / (st.tot_dl / st.n_docs))))))
                      * 1e6, 0) AS BIGINT) AS s_u
                  FROM tf JOIN dfc USING (w) JOIN dl USING (doc_id)
                  CROSS JOIN st)
                SELECT doc_id, CAST(SUM(s_u) AS BIGINT) AS score_u,
                  COUNT(*) AS n_terms
                FROM sc GROUP BY doc_id
                ORDER BY score_u DESC, doc_id LIMIT 10""")
      ),

      "w_vec_index" -> QueryDef(
        // the INCREMENTALLY-MAINTAINED VECTOR ANN INDEX through the oracle
        // gate: build the (pid, cell) index world from a snapshot (IVF
        // quantizer trained once and persisted), then a catalog INSERT
        // plants exact copies of five query vectors (feed insert side) and
        // a row-level MERGE DELETE removes one copy again (feed delete
        // side); refresh() consumes only the commit-log net feed, and a
        // stripe-probed search for each query vector must surface exactly
        // the exact matches the final corpus holds (the planted-copy
        // cannot-miss argument: an identical vector is assigned the
        // query's own probe-1 cell by the shared quantizer, and only exact
        // matches can round to simu 10000 in a corpus whose max organic
        // cosine is ~0.5). A missed insert, a stale deleted copy, a
        // quantizer drift across refreshes, or a pruning bug that drops
        // the probe stripe all break the hash.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wvx", "vx")
          t(s2, dir, "embeddings").select("vec_id", "embedding")
            .createOrReplaceTempView("emb_src_vx")
          s2.sql("DROP TABLE IF EXISTS wvx.emb_vx")
          s2.sql("""CREATE TABLE wvx.emb_vx
                    (vec_id BIGINT, embedding ARRAY<FLOAT>, c0 BIGINT)""")
          s2.sql("""INSERT INTO wvx.emb_vx
                    SELECT vec_id, embedding, vec_id DIV 256 FROM emb_src_vx""")
          val wh = s2.conf.get("spark.sql.catalog.wvx.warehouse")
          val vix = new graft.ops.VectorIndex(
            s2, s"$wh/emb_vx", s"${wh}__vix/emb_vx",
            nlist = 8, dim = 64, pidChunks = 2)
          vix.initialize()
          s2.sql("""INSERT INTO wvx.emb_vx
                    SELECT vec_id + 1000000, embedding,
                           (vec_id + 1000000) DIV 256
                    FROM emb_src_vx WHERE vec_id < 5""")
          vix.refresh()
          s2.sql("""MERGE INTO wvx.emb_vx t
                    USING (SELECT CAST(1000000 AS BIGINT) AS vec_id) s
                    ON t.vec_id = s.vec_id WHEN MATCHED THEN DELETE""")
          vix.refresh()
          // serving lookups: one bounded driver-side collect of the five
          // query vectors (5 x 64 floats — the trainer-collect class)
          val qs = t(s2, dir, "embeddings").where(col("vec_id") < 5)
            .select("vec_id", "embedding").collect()
            .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
            .sortBy(_._1)
          qs.map { case (qid, qv) =>
            vix.search(qv, k = 2).where(col("simu") === 10000L)
              .withColumn("q_id", lit(qid))
          }.reduce(_ unionAll _)
            .select(col("q_id"), col("vec_id"), col("simu"))
            .orderBy("q_id", "vec_id")
        },
        Some("""SELECT vec_id AS q_id, vec_id, CAST(10000 AS BIGINT) AS simu
                FROM embeddings WHERE vec_id < 5
                UNION ALL
                SELECT vec_id, vec_id + 1000000, 10000
                FROM embeddings WHERE vec_id >= 1 AND vec_id < 5
                ORDER BY q_id, vec_id""")
      ),

      "w_vec_index_pq" -> QueryDef(
        // the PQ-CODED maintained vector index through the oracle gate —
        // the w_vec_index engine cycle (init → INSERT plants copies →
        // MERGE DELETE → refresh × 2 → serving lookups) with the index
        // storing m codeword ints per vector instead of raw floats, ADC
        // ranking the probed stripes, and exact re-rank reading embeddings
        // back from the base. The planted cannot-miss argument composes
        // both stages (the s_ann_ivfpq_planted construction): an exact
        // copy shares the query's probe-1 cell AND holds the ADC floor
        // sum_s min_c ||q_s − c||², so neither the IVF probe nor the code
        // scan can drop it, and only exact matches round to simu 10000 in
        // a corpus whose max organic cosine is ~0.5. A missed insert,
        // codebook drift across refreshes, or a re-rank bug all break the
        // hash; a MISSED DELETE would be masked by the base-side re-rank
        // (the dropped embedding no longer joins back), so the query also
        // unions a probe of the index state itself — any stale row for
        // the deleted id becomes an extra output row the oracle lacks.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wvq", "vq")
          t(s2, dir, "embeddings").select("vec_id", "embedding")
            .createOrReplaceTempView("emb_src_vq")
          s2.sql("DROP TABLE IF EXISTS wvq.emb_vq")
          s2.sql("""CREATE TABLE wvq.emb_vq
                    (vec_id BIGINT, embedding ARRAY<FLOAT>, c0 BIGINT)""")
          s2.sql("""INSERT INTO wvq.emb_vq
                    SELECT vec_id, embedding, vec_id DIV 256 FROM emb_src_vq""")
          val wh = s2.conf.get("spark.sql.catalog.wvq.warehouse")
          val vix = new graft.ops.PqVectorIndex(
            s2, s"$wh/emb_vq", s"${wh}__vq/emb_vq",
            nlist = 8, dim = 64, m = 8, ksub = 16, pidChunks = 2)
          vix.initialize()
          s2.sql("""INSERT INTO wvq.emb_vq
                    SELECT vec_id + 1000000, embedding,
                           (vec_id + 1000000) DIV 256
                    FROM emb_src_vq WHERE vec_id < 5""")
          vix.refresh()
          s2.sql("""MERGE INTO wvq.emb_vq t
                    USING (SELECT CAST(1000000 AS BIGINT) AS vec_id) s
                    ON t.vec_id = s.vec_id WHEN MATCHED THEN DELETE""")
          vix.refresh()
          val qs = t(s2, dir, "embeddings").where(col("vec_id") < 5)
            .select("vec_id", "embedding").collect()
            .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
            .sortBy(_._1)
          val staleProbe = vix.df.where(col("vec_id") === 1000000L)
            .select(lit(-1L).as("q_id"), col("vec_id"), lit(-1L).as("simu"))
          qs.map { case (qid, qv) =>
            vix.search(qv, k = 2).where(col("simu") === 10000L)
              .withColumn("q_id", lit(qid))
              .select(col("q_id"), col("vec_id"), col("simu"))
          }.reduce(_ unionAll _)
            .unionAll(staleProbe)
            .orderBy("q_id", "vec_id")
        },
        Some("""SELECT vec_id AS q_id, vec_id, CAST(10000 AS BIGINT) AS simu
                FROM embeddings WHERE vec_id < 5
                UNION ALL
                SELECT vec_id, vec_id + 1000000, 10000
                FROM embeddings WHERE vec_id >= 1 AND vec_id < 5
                ORDER BY q_id, vec_id""")
      ),

      "w_vec_search_batch" -> QueryDef(
        // the BATCH ANN face of the maintained vector index (searchAll)
        // under a full oracle — the one substantial r9 operator that was
        // spec-only. Planted exact copies (catalog INSERT + refresh) make
        // the rank-1 answer provable: every query vector's copy shares its
        // probe-1 cell (same persisted quantizer, kernel-side on both
        // faces) and only the copy reaches cosine 1.0 in a corpus whose
        // max organic cosine is ~0.5 — so the batch face's top hit for
        // query q MUST be q+1000000. The whole retrieval runs as ONE
        // distributed plan (index joined to the broadcast query set on
        // cell), unlike the per-vector serving loop w_vec_index drives.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wvb", "vb")
          t(s2, dir, "embeddings").select("vec_id", "embedding")
            .createOrReplaceTempView("emb_src_vb")
          s2.sql("DROP TABLE IF EXISTS wvb.emb_vb")
          s2.sql("""CREATE TABLE wvb.emb_vb
                    (vec_id BIGINT, embedding ARRAY<FLOAT>, c0 BIGINT)""")
          s2.sql("""INSERT INTO wvb.emb_vb
                    SELECT vec_id, embedding, vec_id DIV 256 FROM emb_src_vb""")
          val wh = s2.conf.get("spark.sql.catalog.wvb.warehouse")
          val vix = new graft.ops.VectorIndex(
            s2, s"$wh/emb_vb", s"${wh}__vb/emb_vb",
            nlist = 8, dim = 64, pidChunks = 2)
          vix.initialize()
          s2.sql("""INSERT INTO wvb.emb_vb
                    SELECT vec_id + 1000000, embedding,
                           (vec_id + 1000000) DIV 256
                    FROM emb_src_vb WHERE vec_id < 8""")
          vix.refresh()
          val queries = t(s2, dir, "embeddings").where(col("vec_id") < 8)
            .select("vec_id", "embedding")
          vix.searchAll(queries, k = 1)
            .select(col("q_id"), col("t_id"), col("rank"))
            .orderBy("q_id")
        },
        Some("""SELECT vec_id AS q_id, vec_id + 1000000 AS t_id,
                       CAST(1 AS BIGINT) AS rank
                FROM embeddings WHERE vec_id < 8 ORDER BY q_id""")
      ),

      "w_mv_minmax" -> QueryDef(
        // MIN/MAX materialized-view maintenance — the aggregate family
        // delta arithmetic alone cannot serve: an UPDATE that LOWERS a
        // group's maximum deletes the extreme's before-image, and the
        // runner-up is unrecoverable from deltas, so refresh() recomputes
        // exactly the delete-dirty groups from the base's pinned target
        // snapshot while count/sum stay pure-delta for all groups. The
        // UPDATE here zeroes a slice of rows (including group extremes);
        // DuckDB recomputes the final MIN/MAX/COUNT/SUM from scratch — a
        // stale maximum, a recompute that missed a dirty group, or a
        // delta/recompute mixup all break the hash. AVG needs no state:
        // it falls out of n + s_micro at read time.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wmm", "mm")
          events(s2, dir).createOrReplaceTempView("ev_src_mm")
          s2.sql("DROP TABLE IF EXISTS wmm.ev_mm")
          s2.sql("""CREATE TABLE wmm.ev_mm
                    (event_id BIGINT, user_id BIGINT, value DOUBLE,
                     grp BIGINT, c0 BIGINT)""")
          s2.sql("""INSERT INTO wmm.ev_mm
                    SELECT event_id, user_id, value, user_id % 10,
                           user_id DIV 128
                    FROM ev_src_mm WHERE event_id % 4 = 0""")
          val wh = s2.conf.get("spark.sql.catalog.wmm.warehouse")
          val basePath = s"$wh/ev_mm"
          val mvPath = s"${wh}__view/ev_mm_agg"
          val fs = org.apache.hadoop.fs.FileSystem.get(
            new java.net.URI(mvPath), s2.sparkContext.hadoopConfiguration)
          fs.delete(new org.apache.hadoop.fs.Path(mvPath), true)
          val mv = new graft.ops.MaterializedAgg(s2, basePath, mvPath,
            Seq("grp"), Seq("value"), minMaxCols = Seq("value"))
          mv.initialize()
          // zero out a slice — group maxima fall, minima may fall to 0
          s2.sql("""UPDATE wmm.ev_mm SET value = 0.0
                    WHERE c0 BETWEEN 0 AND 3 AND user_id % 7 = 2""")
          s2.sql("""INSERT INTO wmm.ev_mm
                    SELECT event_id + 10000000, user_id, value + 0.25,
                           user_id % 10, user_id DIV 128
                    FROM ev_src_mm WHERE event_id % 9 = 5""")
          mv.refresh()
          mv.df.select(col("grp"), col("n"), col("s_value_micro"),
            col("mn_value_micro"), col("mx_value_micro"))
            .orderBy("grp")
        },
        Some("""WITH updated AS (
                  SELECT user_id,
                    CASE WHEN (user_id // 128) BETWEEN 0 AND 3
                              AND user_id % 7 = 2
                         THEN 0.0 ELSE value END AS value
                  FROM events WHERE event_id % 4 = 0),
                extra AS (
                  SELECT user_id, value + 0.25 AS value FROM events
                  WHERE event_id % 9 = 5),
                final AS (SELECT * FROM updated UNION ALL SELECT * FROM extra)
                SELECT user_id % 10 AS grp, COUNT(*) AS n,
                  CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT)
                    AS s_value_micro,
                  CAST(MIN(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT)
                    AS mn_value_micro,
                  CAST(MAX(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT)
                    AS mx_value_micro
                FROM final GROUP BY 1 ORDER BY grp""")
      ),

      "w_meta_tables" -> QueryDef(
        // SQL METADATA TABLES under the oracle gate: `SELECT … FROM
        // <cat>.<t>.history/.cells/.tags` — the join-able introspection
        // face of the commit log. Every number is an exact consequence of
        // the DML sequence and the engine's own write contracts: the
        // clustered write puts ONE file per touched cell, the v0 baseline
        // of a fresh table is empty, a row-level UPDATE replaces exactly
        // one cell's file, a bucket DELETE drops exactly one manifest
        // entry. A wrong file count, a missed version, a stale live set
        // after the DELETE, or a tag that doesn't resolve all break the
        // hash.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wmt", "mt")
          s2.sql("DROP TABLE IF EXISTS wmt.mt_t")
          s2.sql("CREATE TABLE wmt.mt_t (id BIGINT, v BIGINT, c0 BIGINT)")
          s2.sql("INSERT INTO wmt.mt_t VALUES (1,10,0),(11,110,1),(21,210,2)") // v1
          s2.sql("UPDATE wmt.mt_t SET v = -1 WHERE id = 11")                   // v2
          s2.sql("DELETE FROM wmt.mt_t WHERE c0 = 2")                          // v3
          s2.sql("CALL wmt.system.tag(table => 'mt_t', name => 'r1', version => 1)")
          s2.sql("""SELECT 'v' AS kind, CAST(version AS STRING) AS k, files AS n
                    FROM wmt.mt_t.history""")
            .unionByName(s2.sql(
              "SELECT 'c' AS kind, cell AS k, files AS n FROM wmt.mt_t.cells"))
            .unionByName(s2.sql(
              "SELECT 't' AS kind, name AS k, version AS n FROM wmt.mt_t.tags"))
            .orderBy("kind", "k")
        },
        Some("""SELECT * FROM (VALUES
                  ('c', 'c0=0', CAST(1 AS BIGINT)),
                  ('c', 'c0=1', 1),
                  ('t', 'r1', 1),
                  ('v', '0', 0), ('v', '1', 3), ('v', '2', 3), ('v', '3', 2))
                AS t(kind, k, n) ORDER BY kind, k""")
      ),

      "w_analyze" -> QueryDef(
        // ANALYZE FOR THE CBO under the oracle gate: `system.analyze`
        // computes per-column NDV / null count / bounds in ONE aggregate
        // job over the live table and persists them for the planner
        // (served through DSv2 columnStats into catalyst attribute
        // stats — GraftColStatsSpec pins the serving + estimation side).
        // `exact => true` makes every number a pure function of the
        // data, so DuckDB recomputes the whole statistics table from the
        // same source: a wrong distinct count, a miscounted null, or a
        // bound read from the wrong column all break the hash. The
        // default HyperLogLog++ mode is the 100-TB path (one pass, fixed
        // sketch memory per column); exactness of THAT estimate is
        // spec-bounded, not oracle-bounded, like every sketch here.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wan", "an")
          s2.sql("DROP TABLE IF EXISTS wan.an_t")
          s2.sql("CREATE TABLE wan.an_t (pk BIGINT, brand STRING, sz BIGINT, c0 BIGINT)")
          s2.read.parquet(s"$dir/part.parquet").createOrReplaceTempView("part_v")
          s2.sql("""INSERT INTO wan.an_t
                    SELECT CAST(p_partkey AS BIGINT),
                           CASE WHEN p_size % 5 = 0 THEN NULL ELSE p_brand END,
                           CAST(p_size AS BIGINT),
                           CAST(p_partkey % 4 AS BIGINT)
                    FROM part_v""")
          s2.sql("CALL wan.system.analyze(table => 'an_t', exact => true)")
          s2.sql("""SELECT col, ndv, nulls, min, max
                    FROM wan.an_t.colstats ORDER BY col""")
        },
        Some("""WITH src AS (
                  SELECT p_partkey AS pk,
                         CASE WHEN p_size % 5 = 0 THEN NULL ELSE p_brand END AS brand,
                         CAST(p_size AS BIGINT) AS sz,
                         p_partkey % 4 AS c0
                  FROM part)
                SELECT col, ndv, nulls, min, max FROM (
                  SELECT 'pk' AS col, count(DISTINCT pk) AS ndv,
                         count(*) - count(pk) AS nulls,
                         CAST(min(pk) AS VARCHAR) AS min,
                         CAST(max(pk) AS VARCHAR) AS max FROM src
                  UNION ALL
                  SELECT 'brand', count(DISTINCT brand), count(*) - count(brand),
                         NULL, NULL FROM src
                  UNION ALL
                  SELECT 'sz', count(DISTINCT sz), count(*) - count(sz),
                         CAST(min(sz) AS VARCHAR), CAST(max(sz) AS VARCHAR) FROM src
                  UNION ALL
                  SELECT 'c0', count(DISTINCT c0), count(*) - count(c0),
                         CAST(min(c0) AS VARCHAR), CAST(max(c0) AS VARCHAR) FROM src
                ) ORDER BY col""")
      ),

      "w_retention" -> QueryDef(
        // DECLARED AUTO-RETENTION under the oracle gate: set_retention(2)
        // makes every later commit self-expire the log — no maintenance
        // call — so after two COW UPDATEs only versions 2 and 3 remain
        // (the metadata table proves it), the expired versions' bytes are
        // vacuumed, and the live content reflects all the DML. A commit
        // that forgot to expire, an expire that over-pruned (dropping a
        // live version), or a vacuum that deleted live bytes all break
        // the hash.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wrt", "rt")
          s2.sql("DROP TABLE IF EXISTS wrt.rt_t")
          s2.sql("CREATE TABLE wrt.rt_t (id BIGINT, v BIGINT, c0 BIGINT)")
          s2.sql("INSERT INTO wrt.rt_t VALUES (1,10,0),(11,110,1),(21,210,2)") // v1
          s2.sql("CALL wrt.system.set_retention(table => 'rt_t', keep => 2)")
          s2.sql("UPDATE wrt.rt_t SET v = v + 1 WHERE id = 11")                // v2
          s2.sql("UPDATE wrt.rt_t SET v = v + 1 WHERE id = 21")                // v3
          s2.sql("""SELECT 'v' AS kind, CAST(version AS STRING) AS k, files AS n
                    FROM wrt.rt_t.history""")
            .unionByName(s2.sql(
              """SELECT 'r' AS kind, CAST(id AS STRING) AS k, v AS n
                 FROM wrt.rt_t"""))
            .orderBy("kind", "k")
        },
        Some("""SELECT * FROM (VALUES
                  ('r', '1', CAST(10 AS BIGINT)), ('r', '11', 111),
                  ('r', '21', 211),
                  ('v', '2', 3), ('v', '3', 3))
                AS t(kind, k, n) ORDER BY kind, k""")
      ),

      "w_auto_compact" -> QueryDef(
        // DECLARED AUTO-COMPACTION under the oracle gate: set_compaction(2)
        // makes each later append self-compact the cells it touched once
        // their live file count exceeds 2. Four single-cell appends
        // deterministically land on 2 live files (1, 2, 3→compact→1, 2 —
        // the clustered write's one-file-per-cell contract), proven
        // through the cells metadata table; the live rows prove the
        // rewrite lost nothing. A compaction that dropped rows, rewrote
        // untouched cells, or never triggered all break the hash.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wac", "ac")
          s2.sql("DROP TABLE IF EXISTS wac.ac_t")
          s2.sql("CREATE TABLE wac.ac_t (id BIGINT, v BIGINT, c0 BIGINT)")
          s2.sql("CALL wac.system.set_compaction(table => 'ac_t', max_files => 2)")
          for (i <- 1 to 4)
            s2.sql(s"INSERT INTO wac.ac_t VALUES ($i, ${i * 10}, 0)")
          s2.sql("""SELECT 'c' AS kind, cell AS k, files AS n
                    FROM wac.ac_t.cells""")
            .unionByName(s2.sql(
              "SELECT 'r' AS kind, CAST(id AS STRING) AS k, v AS n FROM wac.ac_t"))
            .orderBy("kind", "k")
        },
        Some("""SELECT * FROM (VALUES
                  ('c', 'c0=0', CAST(2 AS BIGINT)),
                  ('r', '1', 10), ('r', '2', 20), ('r', '3', 30), ('r', '4', 40))
                AS t(kind, k, n) ORDER BY kind, k""")
      ),

      "w_runtime_prune" -> QueryDef(
        // runtime (join-delivered) bloom skipping through the oracle gate:
        // a bloom-registered world joined against a selective broadcast
        // dim on the NON-bucket key — Spark's dynamic pruning materializes
        // the dim's keys into the scan's runtime filter, and the connector
        // skips files whose blooms refute every key. Correctness teeth:
        // OVER-pruning (the real hazard of probabilistic file skipping —
        // a bloom misread, a mis-hashed key type, a dictionary
        // misinterpretation) silently LOSES join rows, which is exactly
        // what the DuckDB restatement of the full join catches. The
        // plan-level skip itself is pinned in GraftBloomSpec.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wrp", "rp")
          t(s2, dir, "documents").createOrReplaceTempView("doc_src_rp")
          s2.sql("DROP TABLE IF EXISTS wrp.docs_rp")
          s2.sql("CREATE TABLE wrp.docs_rp (doc_id BIGINT, text STRING, c0 BIGINT)")
          s2.sql("CALL wrp.system.set_bloom(table => 'docs_rp', columns => 'doc_id')")
          s2.sql("""INSERT INTO wrp.docs_rp
                    SELECT doc_id, text, doc_id DIV 2048 FROM doc_src_rp""")
          val dim = s2.sql("SELECT doc_id FROM doc_src_rp WHERE doc_id % 61 = 0")
          s2.table("wrp.docs_rp").join(broadcast(dim), "doc_id")
            .select(col("doc_id"), length(col("text")).cast("long").as("len"))
            .orderBy("doc_id")
        },
        Some("""SELECT doc_id, CAST(length(text) AS BIGINT) AS len
                FROM documents WHERE doc_id % 61 = 0 ORDER BY doc_id""")
      ),

      "w_sql_mv" -> QueryDef(
        // the MATERIALIZED-VIEW lifecycle without leaving SQL: built and
        // delta-refreshed through `CALL system.mv_create/mv_refresh`, and
        // CONSUMED through plain catalog SQL — the MV world lives inside
        // the warehouse, so it IS a table (`ev_sm__mv_byg`), read here
        // through the connector with the cursor sentinel filtered
        // (`gid <> 0`). The refresh consumes a DELETE-side and an
        // INSERT-side commit in one hop; DuckDB restates the final
        // grouped count + micro-unit sum over the surviving corpus.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wsm", "sm")
          t(s2, dir, "events").createOrReplaceTempView("ev_src_sm")
          s2.sql("DROP TABLE IF EXISTS wsm.ev_sm")
          s2.sql("""CREATE TABLE wsm.ev_sm (event_id BIGINT, user_id BIGINT,
                    value DOUBLE, grp BIGINT, c0 BIGINT)""")
          s2.sql("""INSERT INTO wsm.ev_sm
                    SELECT event_id, user_id, value, user_id % 10,
                           user_id DIV 128
                    FROM ev_src_sm WHERE event_id % 5 = 0""")
          s2.sql("""CALL wsm.system.mv_create(table => 'ev_sm', name => 'byg',
                    group_cols => 'grp', sum_cols => 'value')""")
          s2.sql("""DELETE FROM wsm.ev_sm
                    WHERE c0 BETWEEN 0 AND 3 AND user_id % 7 = 2""")
          s2.sql("""INSERT INTO wsm.ev_sm
                    SELECT event_id + 10000000, user_id, value + 0.5,
                           user_id % 10, user_id DIV 128
                    FROM ev_src_sm WHERE event_id % 11 = 3""")
          s2.sql("CALL wsm.system.mv_refresh(table => 'ev_sm', name => 'byg')")
          s2.sql("""SELECT grp, n, s_value_micro
                    FROM wsm.ev_sm__mv_byg WHERE gid <> 0 ORDER BY grp""")
        },
        Some("""WITH base AS (
                  SELECT user_id, value FROM events
                  WHERE event_id % 5 = 0
                    AND NOT ((user_id // 128) BETWEEN 0 AND 3
                             AND user_id % 7 = 2)),
                extra AS (
                  SELECT user_id, value + 0.5 AS value FROM events
                  WHERE event_id % 11 = 3),
                final AS (SELECT * FROM base UNION ALL SELECT * FROM extra)
                SELECT user_id % 10 AS grp, COUNT(*) AS n,
                  CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT)
                    AS s_value_micro
                FROM final GROUP BY 1 ORDER BY grp""")
      ),

      "w_check_gate" -> QueryDef(
        // DECLARED CHECK CONSTRAINTS under the oracle gate: two checks
        // declared via CALL, then a violating INSERT (spanning two cells)
        // and a violating COW UPDATE are both attempted and MUST fail
        // atomically — the final state carries only the passing rows (a
        // NULL condition passes, ANSI). The try/catch is the gate's teeth:
        // if either statement wrongly succeeds, its rows surface in the
        // result and break the hash; if enforcement were non-atomic, the
        // passing half of the two-cell insert would surface and break it
        // too. The checks metadata table rides the same hash.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wck", "ck")
          s2.sql("DROP TABLE IF EXISTS wck.t_ck")
          s2.sql("CREATE TABLE wck.t_ck (id BIGINT, v BIGINT, s STRING, c0 BIGINT)")
          s2.sql("INSERT INTO wck.t_ck VALUES (1, 10, 'alpha', 0)")
          s2.sql("""CALL wck.system.set_check(table => 't_ck',
                    name => 'v_pos', expr => 'v > 0')""")
          s2.sql("""CALL wck.system.set_check(table => 't_ck',
                    name => 's_len', expr => 'length(s) >= 2')""")
          try s2.sql("INSERT INTO wck.t_ck VALUES (2, 20, 'ok', 0), (3, -5, 'xy', 1)")
          catch { case _: Exception => () }
          try s2.sql("UPDATE wck.t_ck SET v = -1 WHERE id = 1")
          catch { case _: Exception => () }
          s2.sql("INSERT INTO wck.t_ck VALUES (4, NULL, 'beta', 0), (5, 50, 'gamma', 1)")
          s2.sql("SELECT 'c' AS kind, name AS k, expr AS x FROM wck.t_ck.checks")
            .unionByName(s2.sql(
              """SELECT 'r' AS kind, CAST(id AS STRING) AS k,
                   concat(coalesce(CAST(v AS STRING), 'null'), ':', s) AS x
                 FROM wck.t_ck"""))
            .orderBy("kind", "k")
        },
        Some("""SELECT * FROM (VALUES
                  ('c', 's_len', 'length(s) >= 2'),
                  ('c', 'v_pos', 'v > 0'),
                  ('r', '1', '10:alpha'),
                  ('r', '4', 'null:beta'),
                  ('r', '5', '50:gamma'))
                AS t(kind, k, x) ORDER BY kind, k""")
      ),

      "w_sql_index" -> QueryDef(
        // the FULL index lifecycle WITHOUT LEAVING SQL: build, row-level
        // UPDATE, refresh, and BM25 serve all through `CALL system.*`
        // procedures — the descriptor persisted at build time is the only
        // thing connecting the calls (no programmatic handle ever
        // constructed here). Same corpus + oracle as w_index_bm25's
        // direct-API cycle, so a descriptor round-trip bug, a procedure
        // re-binding the wrong columns, or a refresh dispatch to the wrong
        // index kind all break the hash exactly where the API face stays
        // green.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wsi", "si")
          t(s2, dir, "documents").createOrReplaceTempView("doc_src_si")
          s2.sql("DROP TABLE IF EXISTS wsi.docs_si")
          s2.sql("CREATE TABLE wsi.docs_si (doc_id BIGINT, text STRING, c0 BIGINT)")
          s2.sql("""INSERT INTO wsi.docs_si
                    SELECT doc_id, text, doc_id DIV 1024 FROM doc_src_si
                    WHERE doc_id % 10 = 0""")
          s2.sql("""CALL wsi.system.index_text(table => 'docs_si',
                    name => 'ti', pid_chunks => 2, fp_chunks => 4)""")
          s2.sql("""UPDATE wsi.docs_si SET text = 'spark spark spark'
                    WHERE c0 = 0 AND doc_id = 10""")
          s2.sql("CALL wsi.system.index_refresh(table => 'docs_si', name => 'ti')")
          s2.sql("""CALL wsi.system.search_text(table => 'docs_si',
                    name => 'ti', query => 'spark join fast', k => 10)""")
        },
        Some("""WITH base AS (
                  SELECT doc_id,
                    CASE WHEN doc_id = 10 THEN 'spark spark spark'
                         ELSE text END AS text
                  FROM documents WHERE doc_id % 10 = 0),
                w AS (
                  SELECT doc_id, unnest(list_filter(
                    string_split_regex(trim(lower(text)), '\s+'),
                    x -> x <> '')) AS w
                  FROM base),
                dl AS (
                  SELECT doc_id, CAST(len(list_filter(
                    string_split_regex(trim(lower(text)), '\s+'),
                    x -> x <> '')) AS BIGINT) AS dl
                  FROM base),
                st AS (SELECT COUNT(*) AS n_docs,
                         CAST(SUM(dl) AS DOUBLE) AS tot_dl FROM dl),
                tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM w
                       WHERE w IN ('spark','join','fast') GROUP BY doc_id, w),
                dfc AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
                sc AS (
                  SELECT tf.doc_id,
                    CAST(ROUND((ln(1.0 + ((st.n_docs - dfc.df) + 0.5) / (dfc.df + 0.5))
                      * ((tf.tf * 2.2) / (tf.tf + (0.3 + 0.9 *
                          (CAST(dl.dl AS DOUBLE) / (st.tot_dl / st.n_docs))))))
                      * 1e6, 0) AS BIGINT) AS s_u
                  FROM tf JOIN dfc USING (w) JOIN dl USING (doc_id)
                  CROSS JOIN st)
                SELECT doc_id, CAST(SUM(s_u) AS BIGINT) AS score_u,
                  COUNT(*) AS n_terms
                FROM sc GROUP BY doc_id
                ORDER BY score_u DESC, doc_id LIMIT 10""")
      ),

      "w_sql_vec" -> QueryDef(
        // ANN serving through `CALL system.search_vector` under the
        // planted-copy cannot-miss gate: the index is built, extended (an
        // SQL INSERT plants an exact copy of query vector 7), and
        // refreshed entirely through procedures; the query vector enters
        // as a SQL array literal (floats are exactly representable as
        // doubles, so the copy still rounds to simu 10000 while max
        // organic cosine is ~0.5). The one driver-side collect is the
        // 64-float query literal — the established bounded
        // serving-lookup class.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wsv", "sv")
          t(s2, dir, "embeddings").select("vec_id", "embedding")
            .createOrReplaceTempView("emb_src_sv")
          s2.sql("DROP TABLE IF EXISTS wsv.v_sv")
          s2.sql("""CREATE TABLE wsv.v_sv
                    (vec_id BIGINT, embedding ARRAY<FLOAT>, c0 BIGINT)""")
          s2.sql("""INSERT INTO wsv.v_sv
                    SELECT vec_id, embedding, vec_id DIV 256 FROM emb_src_sv""")
          s2.sql("""CALL wsv.system.index_vector(table => 'v_sv',
                    name => 'ix', nlist => 8, dim => 64, pid_chunks => 2)""")
          s2.sql("""INSERT INTO wsv.v_sv
                    SELECT vec_id + 1000000, embedding, 4000
                    FROM emb_src_sv WHERE vec_id = 7""")
          s2.sql("CALL wsv.system.index_refresh(table => 'v_sv', name => 'ix')")
          val q = t(s2, dir, "embeddings").where(col("vec_id") === 7)
            .select("embedding").collect()(0).getSeq[Float](0)
          val qLit = q.map(f => s"CAST($f AS DOUBLE)")
            .mkString("array(", ",", ")")
          s2.sql(s"""CALL wsv.system.search_vector(table => 'v_sv',
                     name => 'ix', q => $qLit, k => 3, nprobe => 2)""")
            .where(col("simu") === 10000L)
            .orderBy("vec_id")
        },
        Some("""SELECT CAST(v AS BIGINT) AS vec_id,
                  CAST(10000 AS BIGINT) AS simu
                FROM (VALUES (7), (1000007)) AS t(v) ORDER BY vec_id""")
      ),

      "w_snapshot_drift" -> QueryDef(
        // THREE features composed under one oracle (the w_snapshot_agg
        // pattern): time travel × row-level DML × the KL drift monitor —
        // "did my backfill shift the token distribution" answered by
        // comparing the PRE-update snapshot (VERSION AS OF 1) against the
        // live table through ops.Text.tokenKlDrift, with the snapshot side
        // read out of retained history. A drift in the engine itself — a
        // snapshot resolving post-update bytes, a before-image miss, or a
        // KL arithmetic change — breaks the hash as surely as a real
        // distribution shift appears in it.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wkd", "kd")
          t(s2, dir, "documents").createOrReplaceTempView("doc_src_kd")
          s2.sql("DROP TABLE IF EXISTS wkd.docs_kd")
          s2.sql("CREATE TABLE wkd.docs_kd (doc_id BIGINT, text STRING, c0 BIGINT)")
          s2.sql("""INSERT INTO wkd.docs_kd
                    SELECT doc_id, text, doc_id DIV 1024 FROM doc_src_kd
                    WHERE doc_id % 10 = 0""")
          s2.sql("""UPDATE wkd.docs_kd SET text = 'drifted drifted tokens'
                    WHERE c0 BETWEEN 0 AND 9 AND doc_id % 50 = 0""")
          val v1 = s2.sql("SELECT text FROM wkd.docs_kd VERSION AS OF 1")
            .withColumn("is_left", lit(true))
          val live = s2.sql("SELECT text FROM wkd.docs_kd")
            .withColumn("is_left", lit(false))
          graft.ops.Text.tokenKlDrift(v1.unionByName(live), "text",
            col("is_left"), topK = 20)
        },
        Some("""WITH sl AS (
                  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
                d AS (
                  SELECT text, TRUE AS is_left FROM sl
                  UNION ALL
                  SELECT CASE WHEN doc_id % 50 = 0
                           THEN 'drifted drifted tokens' ELSE text END,
                    FALSE FROM sl),
                tok AS (
                  SELECT is_left,
                    unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                      x -> x <> '')) AS w
                  FROM d),
                bw AS (
                  SELECT w,
                    CAST(SUM(CASE WHEN is_left THEN 1 ELSE 0 END) AS BIGINT) AS cl,
                    CAST(SUM(CASE WHEN NOT is_left THEN 1 ELSE 0 END) AS BIGINT) AS cr
                  FROM tok GROUP BY w),
                tot AS (
                  SELECT CAST(SUM(cl) AS DOUBLE) AS tl, CAST(SUM(cr) AS DOUBLE) AS tr,
                    CAST(COUNT(*) AS DOUBLE) AS vv
                  FROM bw)
                SELECT w AS word, cl, cr,
                  CAST(ROUND(((cl + 1.0) / (tl + vv))
                    * (ln((cl + 1.0) / (tl + vv)) - ln((cr + 1.0) / (tr + vv)))
                    * 1e9, 0) AS BIGINT) AS kl_nnats
                FROM bw CROSS JOIN tot
                ORDER BY kl_nnats DESC, word LIMIT 20""")
      ),

      "w_orphan_sweep" -> QueryDef(
        // ORPHAN VACUUM through the oracle gate: INSERT (versions seal),
        // plant a manifest-unreferenced duplicate chunk file (the
        // crashed-driver leak class), `CALL system.remove_orphans` sweeps
        // it — and the readback must hash-match the original insert. A
        // sweep that deleted a LIVE file (under-sweeping is visible as the
        // returned count) breaks the gate; age-bound and refusal
        // mechanics stay pinned in GraftOrphansSpec.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wos", "os")
          events(s2, dir).createOrReplaceTempView("ev_src_os")
          s2.sql("DROP TABLE IF EXISTS wos.ev_os")
          s2.sql("""CREATE TABLE wos.ev_os
                    (event_id BIGINT, user_id BIGINT, c0 BIGINT)""")
          s2.sql("""INSERT INTO wos.ev_os
                    SELECT event_id, user_id, user_id DIV 128
                    FROM ev_src_os WHERE event_id % 4 = 1""")
          val root = new org.apache.hadoop.fs.Path(
            s2.conf.get("spark.sql.catalog.wos.warehouse") + "/ev_os")
          val fs = org.apache.hadoop.fs.FileSystem.get(
            root.toUri, s2.sparkContext.hadoopConfiguration)
          val cell = graft.sources.GraftDataSource
            .walkChunks(fs, root, Array.empty).head._1
          val src = fs.listStatus(cell)
            .map(_.getPath).find(_.getName.endsWith(".parquet")).get
          val dst = new org.apache.hadoop.fs.Path(cell, "orphan-" + src.getName)
          val in = fs.open(src)
          val bytes = try in.readAllBytes() finally in.close()
          val out = fs.create(dst, true)
          try out.write(bytes) finally out.close()
          fs.setTimes(dst, System.currentTimeMillis() - 3600000L, -1)
          s2.sql("CALL wos.system.remove_orphans(table => 'ev_os', " +
            "older_than_hours => 0)")
          s2.sql("SELECT event_id, user_id FROM wos.ev_os ORDER BY event_id")
        },
        Some("""SELECT event_id, user_id FROM events
                WHERE event_id % 4 = 1 ORDER BY event_id""")
      ),

      "w_zorder_proc" -> QueryDef(
        // DECLARED Z-ORDER through the oracle gate: INSERT, then
        // `CALL system.zorder` registers the layout and rewrites every
        // occupied cell as its Morton-sorted self through the connector's
        // dynamic overwrite (sort expression = the connector zvalue
        // function, resolved via the catalog's FunctionCatalog face). The
        // readback must hash-match the original insert exactly — a rewrite
        // that drops/duplicates a row, or a zvalue ordering that breaks
        // write routing, breaks the gate; physical file order and layout
        // persistence across later writes stay pinned in GraftZOrderSpec.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wzp", "zp")
          events(s2, dir).createOrReplaceTempView("ev_src_zp")
          s2.sql("DROP TABLE IF EXISTS wzp.ev_zp")
          s2.sql("""CREATE TABLE wzp.ev_zp
                    (event_id BIGINT, user_id BIGINT, c0 BIGINT)""")
          s2.sql("""INSERT INTO wzp.ev_zp
                    SELECT event_id, user_id, user_id DIV 128
                    FROM ev_src_zp WHERE event_id % 4 = 0""")
          s2.sql("CALL wzp.system.zorder(table => 'ev_zp', " +
            "columns => 'user_id,event_id')")
          s2.sql("SELECT event_id, user_id FROM wzp.ev_zp ORDER BY event_id")
        },
        Some("""SELECT event_id, user_id FROM events
                WHERE event_id % 4 = 0 ORDER BY event_id""")
      ),

      "w_schema_drop" -> QueryDef(
        // LAZY DROP COLUMN through the oracle gate: INSERT with the wide
        // schema, DROP a column (one sidecar write — no data touched),
        // INSERT more rows under the narrowed schema, read back. Old files
        // still hold the dropped bytes but no reader projects them
        // (name-addressed projection from the sidecar), mixed-width files
        // coexist, and the resurrect guard (`_graft_dropped`) plus
        // last-column/bucket guards stay pinned in GraftCatalogSpec. The
        // oracle restates the union without the dropped column — a reader
        // that still surfaced it, or dropped rows with it, breaks the hash.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wsd", "sd")
          events(s2, dir).createOrReplaceTempView("ev_src_sd")
          s2.sql("DROP TABLE IF EXISTS wsd.ev_sd")
          s2.sql("""CREATE TABLE wsd.ev_sd
                    (event_id BIGINT, user_id BIGINT, value DOUBLE, c0 BIGINT)""")
          s2.sql("""INSERT INTO wsd.ev_sd
                    SELECT event_id, user_id, value, user_id DIV 128
                    FROM ev_src_sd WHERE event_id % 2 = 0""")
          s2.sql("ALTER TABLE wsd.ev_sd DROP COLUMN value")
          s2.sql("""INSERT INTO wsd.ev_sd
                    SELECT event_id + 10000000, user_id, user_id DIV 128
                    FROM ev_src_sd WHERE event_id % 9 = 1""")
          s2.sql("""SELECT event_id, user_id FROM wsd.ev_sd
                    ORDER BY event_id""")
        },
        Some("""SELECT event_id, user_id FROM events
                WHERE event_id % 2 = 0
                UNION ALL
                SELECT event_id + 10000000, user_id FROM events
                WHERE event_id % 9 = 1
                ORDER BY event_id""")
      ),

      "w_clone" -> QueryDef(
        // zero-copy READ-ONLY clone through the oracle gate: INSERT (v1),
        // clone at v1 into a fresh path, then a row-exact UPDATE advances
        // the SOURCE (v2) — and the clone must still read v1's exact bytes
        // through the source's manifests+history, with not one data file
        // under the clone directory. The oracle is the plain restatement of
        // the PRE-UPDATE state: a pointer bug, a history-resolution bug, or
        // a clone that tracked the live table all break the hash.
        // Mutation/streaming refusal and retention safety (the auto-tag
        // surviving expire_versions) stay pinned in GraftCloneSpec.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wcl", "cl")
          events(s2, dir).createOrReplaceTempView("ev_src_cl")
          s2.sql("DROP TABLE IF EXISTS wcl.ev_cl")
          s2.sql("""CREATE TABLE wcl.ev_cl
                    (event_id BIGINT, user_id BIGINT, value DOUBLE, c0 BIGINT)""")
          s2.sql("""INSERT INTO wcl.ev_cl
                    SELECT event_id, user_id, value, user_id DIV 128
                    FROM ev_src_cl WHERE event_id % 2 = 0""")
          val wh = s2.conf.get("spark.sql.catalog.wcl.warehouse")
          val clonePath = s"${wh}__clones/ev_cl_v1"
          val fs = org.apache.hadoop.fs.FileSystem.get(
            new java.net.URI(clonePath), s2.sparkContext.hadoopConfiguration)
          fs.delete(new org.apache.hadoop.fs.Path(clonePath), true)
          graft.sources.GraftClone.create(s"$wh/ev_cl", clonePath, Some(1L))
          s2.sql("""UPDATE wcl.ev_cl SET value = value + 7
                    WHERE c0 BETWEEN 0 AND 1 AND user_id % 13 = 2""")
          s2.read.format("graft").load(clonePath)
            .select("event_id", "user_id", "value")
            .orderBy("event_id")
        },
        Some("""SELECT event_id, user_id, value FROM events
                WHERE event_id % 2 = 0 ORDER BY event_id""")
      ),

      "w_mv_refresh" -> QueryDef(
        // INCREMENTAL materialized-view maintenance from the commit log:
        // CREATE+INSERT (v1), initialize the aggregate view, then a
        // row-exact UPDATE (v2, MoR delta since r13) and a second INSERT (v3) — and
        // refresh() consumes ONLY the v1->v3 change feed (signed micro-unit
        // deltas; the delete side reverses replaced rows through retained
        // history before-images), never rescanning the base. The oracle
        // recomputes the final aggregate from scratch in DuckDB: a drifted
        // delta, a missed before-image, an unreversed group, or a cursor
        // bug all break the hash. Torn-refresh recovery and emptied-group
        // destruction stay pinned in MaterializedAggSpec.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wmv", "mv")
          events(s2, dir).createOrReplaceTempView("ev_src_mv")
          s2.sql("DROP TABLE IF EXISTS wmv.ev_mv")
          s2.sql("""CREATE TABLE wmv.ev_mv
                    (event_id BIGINT, user_id BIGINT, value DOUBLE,
                     grp BIGINT, c0 BIGINT)""")
          // a quarter of the events: the query proves the REFRESH path (changes
          // consumed, base never rescanned) — fixture volume only sets the
          // bench price of the three world writes around it
          s2.sql("""INSERT INTO wmv.ev_mv
                    SELECT event_id, user_id, value, user_id % 10,
                           user_id DIV 128
                    FROM ev_src_mv WHERE event_id % 4 = 0""")
          val wh = s2.conf.get("spark.sql.catalog.wmv.warehouse")
          val basePath = s"$wh/ev_mv"
          val mvPath = s"${wh}__view/ev_mv_agg"
          val fs = org.apache.hadoop.fs.FileSystem.get(
            new java.net.URI(mvPath), s2.sparkContext.hadoopConfiguration)
          fs.delete(new org.apache.hadoop.fs.Path(mvPath), true)
          val mv = new graft.ops.MaterializedAgg(s2, basePath, mvPath,
            Seq("grp"), Seq("value"))
          mv.initialize()
          s2.sql("""UPDATE wmv.ev_mv SET value = value + 1
                    WHERE c0 BETWEEN 0 AND 1 AND user_id % 11 = 4""")
          s2.sql("""INSERT INTO wmv.ev_mv
                    SELECT event_id + 10000000, user_id, value + 0.5,
                           user_id % 10, user_id DIV 128
                    FROM ev_src_mv WHERE event_id % 7 = 3""")
          mv.refresh()
          mv.df.select(col("grp"), col("n"), col("s_value_micro"))
            .orderBy("grp")
        },
        Some("""WITH updated AS (
                  SELECT user_id,
                    CASE WHEN (user_id // 128) BETWEEN 0 AND 1
                              AND user_id % 11 = 4
                         THEN value + 1 ELSE value END AS value
                  FROM events WHERE event_id % 4 = 0),
                extra AS (
                  SELECT user_id, value + 0.5 AS value FROM events
                  WHERE event_id % 7 = 3),
                final AS (SELECT * FROM updated UNION ALL SELECT * FROM extra)
                SELECT user_id % 10 AS grp, COUNT(*) AS n,
                  CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT)
                    AS s_value_micro
                FROM final GROUP BY 1 ORDER BY grp""")
      ),

      "w_stream_sink" -> QueryDef(
        // the native exactly-once streaming sink through the oracle gate: a
        // REAL `writeStream.format("graft")` job (micro-batch epochs, staged
        // per-epoch grids, `_graft_commits` markers — no foreachBatch shim)
        // drains the events table with Trigger.AvailableNow, then the world
        // is read back through the connector and must hash-match DuckDB's
        // view of the same input. maxFilesPerTrigger=1 forces one epoch per
        // source file, so multi-file SFs exercise multi-epoch accumulation;
        // a fresh checkpoint + world per run keeps reruns deterministic.
        // Replay/no-duplication behavior stays pinned in
        // GraftStreamingWriteSpec — this row proves the sink's end state.
        (s, dir) => {
          val s2 = isolatedSession(s)
          val tag = dir.replaceAll("[^0-9a-zA-Z]", "_")
          val path = s"/tmp/graft_stream_sink_$tag/world"
          val cp = s"/tmp/graft_stream_sink_cp_${tag}_" +
            java.util.UUID.randomUUID().toString.take(8)
          val fs = org.apache.hadoop.fs.FileSystem.get(
            new java.net.URI(path), s2.sparkContext.hadoopConfiguration)
          fs.delete(new org.apache.hadoop.fs.Path(s"/tmp/graft_stream_sink_$tag"), true)
          // the file-stream source needs a DIRECTORY; the driver's
          // events.parquet may be a single file — stage its file(s) into one
          val srcDir = new org.apache.hadoop.fs.Path(
            s"/tmp/graft_stream_sink_$tag/src")
          fs.mkdirs(srcDir)
          val ev = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
          val parts =
            if (fs.getFileStatus(ev).isDirectory)
              fs.listStatus(ev).toSeq.filter(_.isFile).map(_.getPath)
            else Seq(ev)
          parts.foreach(p => org.apache.hadoop.fs.FileUtil.copy(
            fs, p, fs, new org.apache.hadoop.fs.Path(srcDir, p.getName),
            false, s2.sparkContext.hadoopConfiguration))
          // schema WITHOUT ts: the raw file's TIMESTAMP(NANOS) needs the
          // batch-side conversion Tables.t does; the sink row needs no time
          val sch = org.apache.spark.sql.types.StructType(
            events(s2, dir).schema.fields.toSeq
              .filter(f => Seq("event_id", "user_id", "value").contains(f.name)))
          val q = s2.readStream.schema(sch)
            .option("maxFilesPerTrigger", "1")
            .parquet(srcDir.toString)
            .withColumn("c0", expr("user_id DIV 128"))
            .writeStream.format("graft")
            .option("checkpointLocation", cp)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start(path)
          q.awaitTermination()
          fs.delete(new org.apache.hadoop.fs.Path(cp), true)
          s2.read.format("graft").load(path)
            .select("event_id", "user_id", "value").orderBy("event_id")
        },
        Some("""SELECT event_id, user_id, value FROM events ORDER BY event_id""")
      ),

      "w_stream_changes" -> QueryDef(
        // the streaming CDC face through the oracle gate: the same
        // INSERT (v1) + scoped UPDATE (v2) table as w_changes, consumed by
        // a REAL `readStream.format("graft").option("graft.follow",
        // "changes")` job from startingVersion 2 — each batch carries the
        // rows the spanned commits added ("insert") and removed ("delete",
        // the BEFORE-IMAGES resolved out of retained history), tagged via
        // the _change_type per-partition constant. The oracle is the same
        // relational restatement of exactly the matched cells, so a
        // manifest-diff bug, a history-resolution bug, or a tag mix-up all
        // break the hash. Offsets/coalescing/guards stay pinned in
        // GraftStreamCursorSpec — this row proves the feed's content.
        (s, dir) => {
          val s2 = withGraftCatalog(s, dir, "wsc", "sc")
          events(s2, dir).createOrReplaceTempView("ev_src_sc")
          s2.sql("DROP TABLE IF EXISTS wsc.ev_sc")
          s2.sql("""CREATE TABLE wsc.ev_sc
                    (event_id BIGINT, user_id BIGINT, value DOUBLE, c0 BIGINT)""")
          s2.sql("""INSERT INTO wsc.ev_sc
                    SELECT event_id, user_id, value, user_id DIV 128
                    FROM ev_src_sc WHERE event_id % 2 = 0""")
          s2.sql("""UPDATE wsc.ev_sc SET value = value + 1
                    WHERE c0 BETWEEN 0 AND 1 AND user_id % 11 = 4""")
          val wh = s2.conf.get("spark.sql.catalog.wsc.warehouse")
          val sinkName = "w_stream_changes_" +
            java.util.UUID.randomUUID().toString.take(8)
          val q = s2.readStream.format("graft")
            .option("graft.follow", "changes")
            .option("graft.startingVersion", "2")
            .load(s"$wh/ev_sc")
            .select("_change_type", "event_id", "user_id", "value")
            .writeStream.outputMode("append").format("memory")
            .queryName(sinkName)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          s2.table(sinkName)
            .orderBy("_change_type", "event_id")
        },
        Some("""WITH cells AS (SELECT DISTINCT user_id // 128 AS c0 FROM events
                               WHERE user_id // 128 BETWEEN 0 AND 1
                                 AND user_id % 11 = 4 AND event_id % 2 = 0),
                scoped AS (SELECT e.* FROM events e
                           JOIN cells c ON e.user_id // 128 = c.c0
                           WHERE e.event_id % 2 = 0)
                SELECT 'delete' AS _change_type, event_id, user_id, value
                FROM scoped
                UNION ALL
                SELECT 'insert' AS _change_type, event_id, user_id,
                  CASE WHEN user_id % 11 = 4 THEN value + 1 ELSE value END AS value
                FROM scoped
                ORDER BY _change_type, event_id""")
      )
    )
  }
}
