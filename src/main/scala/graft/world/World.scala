package graft.world

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One dimension of a [[World]]: the source column holding the u64 dimension
  * value, plus its value→chunk bucketing. Dimension 0 is the unique id
  * (/root/reference/src/world.rs:228-229).
  */
final case class DimSpec(column: String, mapping: DimMapping) {
  /** Bucket (chunk-index) expression: unsigned `(col - start) / itemsPerChunk`
    * — exact integer arithmetic (no double rounding), via the native
    * [[graft.functions.ChunkOf]] (see its scaladoc for why this must be
    * unsigned and can't be SQL `div` under ANSI mode). Row-level twin of
    * `DimMapping.chunkOf`, so routing, the Select DSL, and
    * [[graft.plans.DimBucketPruning]] all agree on every domain, including
    * wrapping ones (endIncl = -1L = 2^64-1).
    */
  def bucketExpr: Column =
    graft.functions.ChunkOf(col(column), mapping.start, mapping.itemsPerChunk)
}

/** A dim-bucketed table — the Spark-native restatement of `World`
  * (/root/reference/src/world.rs:252-267). The reference's N-dimensional grid
  * of chunks becomes a Parquet table partitioned by computed bucket columns
  * `c0..c{n-1}` (directory layout = chunk grid, like `FsHandle::path`,
  * /root/reference/tokio-fs/src/lib.rs:109-128); its chunk-selection algebra
  * becomes partition-pruning predicates Catalyst pushes to the file index;
  * its buffer pool / flush daemon become Spark caching + the commit protocol.
  *
  * Scale notes (design target: 1000-executor cluster, ~100 TB):
  *   - all point ops are **partition-scoped copy-on-write**: only affected
  *     bucket cells are rewritten — one connector write sealed as a
  *     versioned, CAS'd, bucket-scoped commit (r11: no version barriers,
  *     no staged double-write) — so an upsert touching k buckets costs
  *     O(k · bucketSize), never O(table), and every snapshot stays
  *     addressable through it;
  *   - scans prune via partition columns — Catalyst's
  *     `PruneFileSourcePartitions` never lists unaffected directories;
  *   - choose `itemsPerChunk` so one bucket ≈ 100 MB–1 GB of Parquet
  *     (the `items_per_chunk` sizing knob of the reference).
  */
final class World(val spark: SparkSession, val path: String, val dims: Seq[DimSpec]) {
  require(dims.nonEmpty, "DIMS != 0 (/root/reference/src/world.rs:439)")

  val bucketCols: Seq[String] = dims.indices.map(i => s"c$i")
  private def idCol: String = dims.head.column

  // raw-predicate pruning (VERDICT r1 gap #1): register this world's
  // dim→bucket mapping and install the optimizer rule, so a plain
  // `df.where(dimCol.between(a, b))` — no Select DSL — prunes chunk
  // directories exactly like the reference's single query path does
  graft.plans.DimPruningRegistry.register(path, dims)
  graft.plans.DimPruningRegistry.install(spark)

  /** Add computed bucket columns (the routing step,
    * `World::chunk_pos_of_data`, /root/reference/src/world.rs:544-551). */
  def withBuckets(df: DataFrame): DataFrame =
    dims.zipWithIndex.foldLeft(df) { case (d, (spec, i)) =>
      d.withColumn(s"c$i", spec.bucketExpr)
    }

  /** Unsigned u64 compare as a Column: flipping the sign bit (XOR 2^63) maps
    * u64 order onto signed order, so `a u64< b  ⟺  (a^min) signed< (b^min)`.
    * Dim values are u64 — a signed `col <= endIncl` would reject every
    * positive value of a wrapping domain (endIncl = -1L = 2^64-1). */
  private def u64(c: Column): Column = c.bitwiseXOR(lit(Long.MinValue))

  /** Rows whose dims fall outside their configured range — the batch analog
    * of `ValueOutOfRange` (/root/reference/src/range.rs:62-71): quarantine
    * instead of panic (SURVEY §3.2). */
  def outOfRange(df: DataFrame): DataFrame = {
    val bad = dims
      .map(d => u64(col(d.column)) < lit(d.mapping.start ^ Long.MinValue) ||
        u64(col(d.column)) > lit(d.mapping.endIncl ^ Long.MinValue))
      .reduce(_ || _)
    df.where(bad)
  }

  private def validate(df: DataFrame): DataFrame = {
    val ok = dims
      .map(d => u64(col(d.column)) >= lit(d.mapping.start ^ Long.MinValue) &&
        u64(col(d.column)) <= lit(d.mapping.endIncl ^ Long.MinValue))
      .reduce(_ && _)
    df.where(ok)
  }

  /** Initial (over)write of the world from a DataFrame. Out-of-range rows are
    * dropped (use [[outOfRange]] to quarantine them first).
    *
    * `zorderWithinChunks` swaps the intra-chunk sort for the Z-curve of all
    * dims ([[graft.ops.ZOrder]]): lexicographic dim-sort gives tight
    * row-group stats on dim 0 only; the Z-sort keeps every dim's per-
    * row-group envelope small, so multi-dim residual predicates (row-exact
    * filters after chunk pruning) skip row groups inside large chunks no
    * matter which dims they constrain. A create-time clustering choice —
    * later insert/compact rewrites re-sort those partitions by dims. */
  def create(df: DataFrame, zorderWithinChunks: Boolean = false,
      bloomColumns: Seq[String] = Nil): Unit = {
    // bloom columns are a TABLE property (the `_graft_bloom` sidecar): this
    // create blooms them directly, and the post-write registration below
    // (AFTER the overwrite, which clears the directory — same reason the
    // schema sidecar writes last) makes every later write path — append,
    // insert, compact, the connector's own writer — bloom the same columns
    // (point-lookup file skipping, see sources/GraftBloom.scala)
    val allBloomCols = (graft.sources.GraftBloom.columns(fileSystem,
      new org.apache.hadoop.fs.Path(path)) ++ bloomColumns).distinct
    // cluster rows by their bucket before writing: each partition directory
    // is then written by one task -> one file per chunk instead of
    // (tasks x chunks) small files. At cluster scale this one shuffle is what
    // keeps a bucketed write from exploding the file count. Sorting by dims
    // within each task tightens parquet row-group min/max stats, so pushed
    // id hints (`Select::hint` -> In-filter) skip row groups instead of
    // scanning them.
    // the sort MUST lead with the bucket columns: partitionBy's writer
    // requires an ordering on the partition columns and silently inserts
    // its own NON-STABLE sort when the child's ordering doesn't have them
    // as a prefix — scrambling any intra-chunk sort placed below it
    // (verified empirically; the bucket prefix makes the writer reuse this
    // sort instead)
    // the z-key interleaves the CHUNK-LOCAL offset of each dim
    // (remainderUnsigned(value - start, ipc), always in [0, ipc) — the
    // wrap-safe native ChunkOffset, because raw dim values would be masked
    // to ZValue's bit budget and large-valued dims like timestamps would
    // wrap into a scrambled order, and ANSI mode throws on the plain-SQL
    // wrapping arithmetic). Exact whenever ipc fits the per-dim bit budget
    // (63/n bits), which any sane chunk sizing does.
    val intraSort =
      if (zorderWithinChunks && dims.size >= 2) {
        // loud, not silent: an ipc beyond the bit budget would be masked
        // by ZValue and the layout would come out scrambled with no error
        val budget = 63 / dims.size
        dims.foreach(d => require(
          java.lang.Long.compareUnsigned(d.mapping.itemsPerChunk, 1L << budget) <= 0,
          s"zorderWithinChunks: dim ${d.column} itemsPerChunk " +
            s"${d.mapping.itemsPerChunk} exceeds the $budget-bit z-budget " +
            s"for ${dims.size} dims; use a finer chunk grid or the dim sort"))
        Seq(graft.ops.ZOrder.zvalue(dims.map(d =>
          graft.functions.ChunkOffset(col(d.column),
            d.mapping.start, d.mapping.itemsPerChunk)): _*))
      } else dims.map(d => col(d.column))
    val bucketed = withBuckets(validate(df))
      .repartition(bucketCols.map(col): _*)
      .sortWithinPartitions(bucketCols.map(col) ++ intraSort: _*)
    bucketed.write
      .options(graft.sources.GraftBloom.writerOptions(allBloomCols))
      .partitionBy(bucketCols: _*)
      .mode("overwrite")
      .parquet(path)
    if (allBloomCols.nonEmpty)
      graft.sources.GraftBloom.register(fileSystem,
        new org.apache.hadoop.fs.Path(path), allBloomCols)
    // schema sidecar: a fully-emptied world (every chunk destroyed) must stay
    // readable — parquet schema inference has nothing to read then. Analog of
    // the reference's `NotFound -> empty scan` (src/world/iter.rs:475-479).
    val fs = fileSystem
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$path/_graft_schema.json"), true)
    out.write(bucketed.schema.json.getBytes("UTF-8"))
    out.close()
  }

  private def fileSystem: org.apache.hadoop.fs.FileSystem =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** Parquet bloom options for this world's registered bloom columns — read
    * per write (the sidecar is one small file) so rewrites keep blooming
    * columns registered after create. Empty map when none registered. */
  private def bloomWriteOpts: Map[String, String] =
    graft.sources.GraftBloom.writerOptions(
      graft.sources.GraftBloom.columns(fileSystem,
        new org.apache.hadoop.fs.Path(path)))

  /** The world as a DataFrame; bucket columns come back as partition columns
    * so predicates on them prune directories, not files. An empty world reads
    * as an empty DataFrame with the created schema.
    *
    * When the commit log is authoritative (sealed versions, no rewrite
    * barrier), the read plans from the LATEST MANIFEST's file list instead
    * of the directory listing — manifest-only retirement leaves superseded
    * files in place, so a raw listing of a versioned world would read
    * retired rows. `basePath` keeps partition-column (bucket) discovery
    * identical to the plain directory read.
    *
    * MERGE-ON-READ deletion vectors ([[graft.sources.GraftDv]]): a SQL
    * DELETE on this world's catalog face retires rows by per-file position
    * sidecars, which the raw parquet read would resurrect — so when any
    * live entry carries a vector, the deleted row ADDRESSES (bounded by
    * the table's deleted-row count) anti-join away on the parquet metadata
    * address: equi-keys (file name, row ordinal) — names carry per-writer
    * entropy, the build side broadcasts — with the full chunk-relative
    * path as a suffix residual. Vector-free worlds (the norm for
    * World-API use; the physical fallback branch is vector-free by
    * construction — barriers materialize) keep the plain read untouched. */
  def df: DataFrame = {
    val fs = fileSystem
    val root = new org.apache.hadoop.fs.Path(path)
    graft.sources.GraftVersions.liveEntries(fs, root) match {
      case Some(entries) if entries.nonEmpty => dfOver(entries)
      case Some(_) => emptyDf // every file retired: empty world, live schema
      case None =>
        try spark.read.parquet(path)
        catch {
          case e: org.apache.spark.sql.AnalysisException =>
            if (!fs.exists(new org.apache.hadoop.fs.Path(
              s"$path/_graft_schema.json"))) throw e
            emptyDf
        }
    }
  }

  /** A frame over exactly `entries` (manifest-resolved file list, deletion
    * vectors applied) — the shared read shape of [[df]]'s live branch and
    * the branch-head reads ([[insertOn]]). */
  private def dfOver(
      entries: Seq[graft.sources.GraftVersions.ManifestEntry]): DataFrame = {
    if (entries.isEmpty) return emptyDf
    // memoized per (session, path, exact entry set): a manifest-resolved
    // snapshot is IMMUTABLE — any commit produces a different entry list
    // (rels/sizes/dv names), so a signature hit can only ever reuse the
    // identical file set. What the memo saves is METADATA work repeated on
    // every read of an unchanged world — the file-listing job, the parquet
    // footer schema inference, and Catalyst re-analysis — never row data:
    // each query still scans the parquet files themselves (r17, guide §6:
    // "manifest metadata avoids directory listing" is only an advantage if
    // the read path doesn't relist per query).
    if (!World.readMemoEnabled) return dfOverUncached(entries)
    val sig = (entries.map(e => (e.rel, e.size, e.dv)), spark, path)
    World.readMemo.get(sig) match {
      case Some(cached) => return cached
      case None => ()
    }
    val built = dfOverUncached(entries)
    World.readMemo.put(sig, built)
    built
  }

  private def dfOverUncached(
      entries: Seq[graft.sources.GraftVersions.ManifestEntry]): DataFrame = {
    val fs = fileSystem
    val root = new org.apache.hadoop.fs.Path(path)
    val base = spark.read.option("basePath", path)
      .parquet(entries.map(e => s"$path/${e.rel}"): _*)
    val dvd = entries.filter(_.dv.isDefined)
    if (dvd.isEmpty) base
    else {
      import org.apache.spark.sql.functions.{broadcast, col, expr}
      val deleted = dvd.flatMap { e =>
        val name = e.rel.split('/').last
        graft.sources.GraftDv.read(fs,
            new org.apache.hadoop.fs.Path(root, e.dv.get._1))
          .map(p => (name, p, e.rel))
      }
      val del = spark.createDataFrame(deleted).toDF("__dn", "__dp", "__dr")
      base
        .withColumn("__n", expr("_metadata.file_name"))
        .withColumn("__p", expr("_metadata.row_index"))
        .withColumn("__f", expr("_metadata.file_path"))
        .join(broadcast(del),
          col("__n") === col("__dn") && col("__p") === col("__dp") &&
            expr("endswith(__f, __dr)"),
          "left_anti")
        .drop("__n", "__p", "__f")
    }
  }

  /** Live rows plus their PHYSICAL addresses (`__gf` = file, `__gp` =
    * in-file row ordinal) — the MoR victim-lookup frame, read through the
    * CONNECTOR scan: manifest-resolved files, deletion vectors applied
    * inside the reader (no per-query anti-join), bucket pruning + zone
    * maps on pushed predicates, and runtime join filters (bloom file-skip
    * on registered columns) all apply — a small upsert's displaced-id
    * lookup against a petabyte world plans as a pruned point scan, not a
    * raw tree read. `_pos` is the physical ordinal (stable under vectors),
    * the deletion-vector coordinate system. */
  private def addrDf(branch: Option[String]): DataFrame = {
    val r = spark.read.format("graft")
    branch.fold(r)(b => r.option("graft.branch", b)).load(path)
      .select(col("*"), col("_file").as("__gf"), col("_pos").as("__gp"))
  }

  /** The live manifest entries when the merge-on-read point-write path
    * applies to this world (commit log authoritative; branch head resolved
    * for branch writes): point writes then retire victim ROWS by address
    * into deletion vectors and route-append fresh rows — one seal, zero
    * pre-existing bytes moved — instead of COW-rewriting whole cells.
    * None → unversioned world or barrier window → the COW path. */
  private def morEntries(branch: Option[String])
      : Option[Seq[graft.sources.GraftVersions.ManifestEntry]] =
    if (!graft.sources.GraftMor.authoritative(path)) None
    else branch match {
      case Some(b) => Some(graft.sources.GraftVersions.branchHeadEntries(
        fileSystem, new org.apache.hadoop.fs.Path(path), b))
      case None => graft.sources.GraftVersions.liveEntries(
        fileSystem, new org.apache.hadoop.fs.Path(path))
    }

  /** Collected physical addresses of `rows` (a frame derived from
    * [[addrDf]]), GROUPED per file — the MoR victim channel. Grouping
    * before the collect matters at scale: the driver holds each file path
    * ONCE plus 8 bytes per position (the same envelope the deletion-vector
    * sidecars themselves occupy) instead of a full Row per matched row —
    * O(matched positions) remains the floor (the SQL delta writers' commit
    * messages pay it too), but the constant drops ~20×, and the per-file
    * aggregation happens executor-side with map-side combine. */
  private def collectVictims(rows: DataFrame): Array[(String, Array[Long])] =
    rows.groupBy(col("__gf"))
      .agg(collect_list(col("__gp")).as("__ps"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toArray))

  private def victimCount(vs: Array[(String, Array[Long])]): Long =
    vs.iterator.map(_._2.length.toLong).sum

  private def emptyDf: DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_graft_schema.json")
    val fs = fileSystem
    val in = fs.open(p)
    val json = new String(in.readAllBytes(), "UTF-8"); in.close()
    val schema = org.apache.spark.sql.types.DataType.fromJson(json)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** The world pinned to commit `n` of its version log — a read-only frame
    * over exactly manifest n's files ([[graft.sources.GraftVersions]]).
    * Only connector/catalog writes seal versions; this World's own
    * programmatic rewrites are version barriers (see the commit-log doc). */
  def snapshot(n: Long): DataFrame =
    spark.read.format("graft").option("graft.snapshot", n.toString).load(path)

  /** The world as a STREAMING source: chunk files appearing under the grid
    * after the stream starts are discovered incrementally by Spark's file
    * source — the read-side complement of the write-behind [[graft.streaming.Daemon]]
    * (the reference's IO loop, tokio-fs/src/lib.rs:202-235, covers only the
    * write side). Downstream transforms/windows compose as usual; partition
    * (bucket) columns are part of the schema.
    *
    * For worlds written through the CONNECTOR/CATALOG surface (sealed
    * version manifests), use `spark.readStream.format("graft")` instead:
    * this generic file stream lists the physical tree, and manifest-only
    * retirement leaves superseded files in place there — the connector
    * source plans from manifests (version-cursor offsets) and never sees
    * them. Worlds maintained purely by this class's programmatic rewrites
    * keep an exact physical tree, which is what this stream reads. */
  def stream: DataFrame =
    spark.readStream.schema(df.schema).parquet(path)

  /** Entry point of the selection algebra (`World::select`,
    * /root/reference/src/world.rs:301-329): chunk-range on `dim` from value
    * bounds, full range on all other dims; out-of-range bounds → empty. */
  def select(dim: Int, bounds: Bounds): WorldSelect = {
    val shape = dims(dim).mapping.chunksOf(bounds) match {
      case None => Shape.None_
      case Some((lo, hi)) =>
        Shape.Single(PosBox(dims.indices.map { i =>
          if (i == dim) (lo, hi) else dims(i).mapping.chunkRange
        }.toVector))
    }
    new WorldSelect(this, shape, Seq.empty)
  }

  /** Full scan (`World::select_all`, /root/reference/src/world.rs:331-335). */
  def selectAll: WorldSelect = select(0, Bounds.all)

  /** Box for `and`/`plus` composition: chunk range on one dim, full range on
    * the others (mirrors `World::select`'s box construction). */
  private[world] def boxFor(dim: Int, bounds: Bounds): Option[PosBox] =
    dims(dim).mapping.chunksOf(bounds).map { case (lo, hi) =>
      PosBox(dims.indices.map { i =>
        if (i == dim) (lo, hi) else dims(i).mapping.chunkRange
      }.toVector)
    }

  // ---------------------------------------------------------------- writes

  /** Bucket tuples of a DataFrame as a Set. Partition columns come back from
    * Parquet as IntegerType (partition-value inference) while freshly
    * computed buckets are LongType — normalize via cast before collecting. */
  private def collectBuckets(df: DataFrame): Set[Vector[Long]] =
    df.select(bucketCols.map(c => col(c).cast("long")): _*).distinct().collect()
      .map(r => bucketCols.indices.map(i => r.getLong(i)).toVector).toSet

  /** Upsert with replace-on-conflict by id (dim 0) — `World::insert`
    * (/root/reference/src/world.rs:553-567, chunk level 124-150). The
    * reference returns the displaced record; the batch-friendly restatement
    * returns the number of replaced rows (SURVEY §7 hard-part b).
    *
    * Only partitions touched by `rows` (old location of a replaced id + its
    * new location) are rewritten.
    */
  def insert(rows: DataFrame): Long = insertOn(rows, None)

  /** [[insert]] against a WAP BRANCH head: conflicts (displaced ids) are
    * resolved against the branch's staged state — fork state plus every
    * branch commit, deletion vectors applied — and the partition-scoped
    * rewrite seals on the branch's own manifest chain, invisible to main
    * readers until `system.fast_forward` publishes. This is what makes
    * per-epoch streaming upsert stage-able: each epoch's `World::insert`
    * chains on the previous epoch's branch head exactly as main epochs
    * chain on main. */
  private[graft] def insertOn(rows: DataFrame, branch: Option[String]): Long =
    morEntries(branch) match {
      case Some(entries) =>
        // MERGE-ON-READ (r14): displaced rows retire BY ADDRESS into
        // deletion vectors, incoming rows route-append into their cells,
        // one seal — a 10-row CDC epoch into 10 gigabyte cells writes ~10
        // sidecar entries + 10 rows of fresh bytes where the COW rewrite
        // moved 10 GB. The displaced-address collect is O(displaced rows),
        // the floor (the reference returns each displaced record too).
        val incoming = withBuckets(validate(rows)).cache()
        val displaced: Array[(String, Array[Long])] =
          if (entries.isEmpty) Array.empty
          else {
            val ids = incoming.select(col(idCol)).distinct()
            collectVictims(addrDf(branch)
              .join(ids, Seq(idCol), "left_semi"))
          }
        graft.sources.GraftMor.pointWrite(spark, path, branch, displaced,
          Some(incoming), "UPSERT")
        incoming.unpersist()
        victimCount(displaced)
      case None => // unversioned world / barrier window: whole-cell COW
        val incoming = withBuckets(validate(rows)).cache()
        val existing = branch match {
          case Some(b) => dfOver(graft.sources.GraftVersions.branchHeadEntries(
            fileSystem, new org.apache.hadoop.fs.Path(path), b))
          case None => df
        }
        // no broadcast hint: the id set is unbounded (a 100 TB upsert can
        // carry billions of ids) — AQE broadcasts when the build side is
        // actually small and falls back to a shuffle join otherwise
        val ids = incoming.select(col(idCol)).distinct()
        val displaced = existing.join(ids, Seq(idCol), "left_semi")
        val displacedCount = displaced.count()
        // affected partitions: old location of replaced ids + new rows' cells
        val affected = collectBuckets(displaced) ++ collectBuckets(incoming)
        val affectedPred = partitionsPred(affected)
        val keep = existing.where(affectedPred)
          .join(ids, Seq(idCol), "left_anti")
        rewritePartitions(affected, keep.unionByName(incoming), branch)
        incoming.unpersist()
        displacedCount
    }

  /** MoR insert whose incoming rows are ALREADY written as routed grid
    * files (the in-place upsert commit, r14): connector/streaming upsert
    * TASKS write their rows straight into the final cell directories —
    * invisible until a manifest references them — and the commit calls
    * this with the new files' manifest entries plus the batch's dim-0 ids.
    * Rows displaced by `ids` retire into deletion vectors and ONE seal
    * carries vectors + entries, so the epoch's bytes are written exactly
    * once, by the tasks (the staged design paid them twice: once into the
    * staging grid, once through the insert's rewrite — at 100 TB that
    * doubles the I/O of the highest-frequency write path, and on S3-class
    * stores even a rename is a copy). Routing/validation contract: the
    * files' bucket values are trusted exactly as on the connector APPEND
    * path (the caller routed them through the same chunk writer).
    * Requires an authoritative log — the in-place factory decision and
    * this gate are made from the same predicate. */
  private[graft] def insertPrewritten(ids: DataFrame,
      appended: Seq[graft.sources.GraftVersions.ManifestEntry],
      branch: Option[String]): Long = {
    val entries = morEntries(branch).getOrElse(throw new IllegalStateException(
      s"graft insertPrewritten on $path: the commit log stopped being " +
        "authoritative between the write's planning and its commit " +
        "(concurrent World rewrite?) — retry the upsert"))
    val displaced: Array[(String, Array[Long])] =
      if (entries.isEmpty) Array.empty
      else collectVictims(addrDf(branch)
        .join(ids.toDF(idCol).distinct(), Seq(idCol), "left_semi"))
    graft.sources.GraftMor.sealPrewritten(path, branch, displaced, appended,
      "UPSERT", ownsAppended = true)
    victimCount(displaced)
  }

  /** Combined delete + upsert in ONE partition-scoped rewrite: rows whose
    * id is in `removeIds` vanish, `upserts` land with replace-on-conflict
    * — the shape of the reference's chunk flush, which applies removals
    * and inserts to a chunk in a single `write_buf`
    * (/root/reference/src/world.rs:89-122). Incremental maintainers
    * (InvertedIndex, MaterializedAgg) need exactly this pair per refresh;
    * as two calls ([[destroy]] then [[insert]]) every affected cell is
    * read and rewritten TWICE — this applies both in one read-modify-
    * write, one staged swap, one version seal. Returns (removed,
    * displaced) counts. */
  def applyDelta(removeIds: DataFrame, upserts: DataFrame): (Long, Long) =
    morEntries(None) match {
      case Some(entries) => morApplyDelta(entries, removeIds, upserts)
      case None => cowApplyDelta(removeIds, upserts)
    }

  /** MERGE-ON-READ [[applyDelta]] (r14): removed + displaced rows retire by
    * address into deletion vectors, upserts route-append, ONE seal — the
    * single-flush contract at the O(delta) floor instead of O(affected
    * cells): an index/MV refresh whose delta touches k gigabyte cells
    * writes k sidecar entries + the delta's own bytes, never k GB. One
    * tagged job resolves both victim families (the COW path's one-action
    * shape, restated over addresses). */
  private def morApplyDelta(
      entries: Seq[graft.sources.GraftVersions.ManifestEntry],
      removeIds: DataFrame, upserts: DataFrame): (Long, Long) = {
    val incoming = withBuckets(validate(upserts)).cache()
    val rmIds = removeIds.withColumnRenamed(removeIds.columns.head, idCol)
    val rmKeys = rmIds.columns.toSeq
    val tagged: Array[(String, String, Array[Long])] =
      if (entries.isEmpty) Array.empty
      else {
        val addr = addrDf(None)
        val upIds = incoming.select(col(idCol)).distinct()
        addr.join(rmIds, rmKeys, "left_semi")
          .select(lit("r").as("_t"), col("__gf"), col("__gp"))
          .unionByName(addr.join(upIds, Seq(idCol), "left_semi")
            .select(lit("d").as("_t"), col("__gf"), col("__gp")))
          .groupBy(col("_t"), col("__gf"))
          .agg(collect_list(col("__gp")).as("__ps"))
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getSeq[Long](2).toArray))
      }
    // a row matched by BOTH sides retires once — pointWrite dedups per file
    val victims = tagged.map { case (_, f, ps) => (f, ps) }
    graft.sources.GraftMor.pointWrite(spark, path, None, victims,
      Some(incoming), "DELTA")
    incoming.unpersist()
    (tagged.iterator.filter(_._1 == "r").map(_._3.length.toLong).sum,
      tagged.iterator.filter(_._1 == "d").map(_._3.length.toLong).sum)
  }

  private def cowApplyDelta(removeIds: DataFrame, upserts: DataFrame): (Long, Long) = {
    val incoming = withBuckets(validate(upserts)).cache()
    val existing = df
    // removal matching: the FIRST column is the dim-0 id; any EXTRA columns
    // (named like world columns) narrow the match — a row is removed only
    // when ALL of them agree. Maintainers keyed by id = hash(payload) pass
    // (hash, payload) pairs so a hash collision can never destroy the OTHER
    // preimage's live row (delete-side aliasing is data loss; insert-side
    // aliasing is just a replaced row).
    val rmIds = removeIds.withColumnRenamed(removeIds.columns.head, idCol)
    val rmKeys = rmIds.columns.toSeq
    val upIds = incoming.select(col(idCol)).distinct()
    val removed = existing.join(rmIds, rmKeys, "left_semi")
    val displaced = existing.join(upIds, Seq(idCol), "left_semi")
    // ONE action answers everything the rewrite planning needs: tag the
    // three bucket projections, per-(tag, cell) counts → removed/displaced
    // totals + the affected cell set. The earlier shape ran FIVE driver
    // actions here (two counts + three distinct-bucket collects) whose
    // fixed per-job overhead dominated small maintenance deltas — an
    // MV/vector-index refresh is exactly one applyDelta, so those jobs
    // were most of its latency. Result cardinality is O(touched cells),
    // the same driver bound collectBuckets already had.
    def cellsOf(d: DataFrame, t: String) =
      d.select(lit(t).as("_t") +: bucketCols.map(c => col(c).cast("long")): _*)
    val cells = cellsOf(removed, "r")
      .unionByName(cellsOf(displaced, "d"))
      .unionByName(cellsOf(incoming, "i"))
      .groupBy(col("_t") +: bucketCols.map(col): _*)
      .count().collect()
    val cntIdx = bucketCols.size + 1
    val removedCount = cells.filter(_.getString(0) == "r").map(_.getLong(cntIdx)).sum
    val displacedCount = cells.filter(_.getString(0) == "d").map(_.getLong(cntIdx)).sum
    val affected: Set[Vector[Long]] = cells
      .map(r => bucketCols.indices.map(i => r.getLong(i + 1)).toVector).toSet
    val keep = existing.where(partitionsPred(affected))
      .join(rmIds, rmKeys, "left_anti")
      .join(upIds, Seq(idCol), "left_anti")
    rewritePartitions(affected, keep.unionByName(incoming))
    incoming.unpersist()
    (removedCount, displacedCount)
  }

  /** Raw append: no conflict handling, just route rows into their chunk
    * directories (the cheapest write — one clustering shuffle, no reads of
    * existing data). The building block of the daemon's high-frequency path:
    * append per batch, [[compact]] on a dirty-counter threshold. Callers
    * that need id uniqueness use [[insert]]/[[tryInsert]] instead. */
  def append(rows: DataFrame): Unit =
    // connector append: routed + clustered by the declared write layout,
    // sealed as a versioned commit (no barrier — the legacy parquet-
    // committer append invalidated snapshots and forced a walk-seal)
    withBuckets(validate(rows))
      .write.format("graft").mode("append").save(path)

  /** Insert-if-absent — `World::try_insert`
    * (/root/reference/src/world.rs:569-584): ids already present are NOT
    * replaced; returns the number of rejected rows. */
  def tryInsert(rows: DataFrame): Long = {
    val incoming = withBuckets(validate(rows)).cache()
    val existing = df
    val fresh = incoming.join(existing.select(col(idCol)), Seq(idCol), "left_anti").cache()
    val rejected = incoming.count() - fresh.count()
    // connector append (versioned, barrier-free): `fresh` reads `existing`
    // whose file list froze at df-creation — the in-place write cannot
    // feed back into its own anti-join
    fresh.write.format("graft").mode("append").save(path)
    incoming.unpersist(); fresh.unpersist()
    rejected
  }

  /** [[tryInsert]] without the rejected-rows count (r17) — for maintainers
    * that ignore it (the incremental dedup stores register fingerprints
    * per batch and never read the count): the write is the ONLY action, so
    * the two count jobs and the caches they needed disappear. Registration
    * semantics are identical — same anti-join against a file list frozen
    * at df-creation, same versioned append. */
  def tryInsertQuiet(rows: DataFrame): Unit = {
    val incoming = withBuckets(validate(rows))
    val fresh = incoming.join(df.select(col(idCol)), Seq(idCol), "left_anti")
    fresh.write.format("graft").mode("append").save(path)
  }

  /** Delete by id set — `Lazy::destroy` / `Chunk::remove`
    * (/root/reference/src/world/iter.rs:254-265, src/world.rs:77-87). Only
    * the partitions holding victims are rewritten; fully-emptied bucket
    * directories are removed. */
  def destroy(ids: Seq[Long]): Long = {
    val sp = spark
    import sp.implicits._
    destroy(ids.toDF(idCol))
  }

  /** Delete by an id *DataFrame* (single column named like dim 0) — the
    * scale-safe form: victims are found by semi-join and survivors by
    * anti-join, so the id set never materializes into the plan or the
    * driver (an `isin`/broadcast of the whole set caps out far below the
    * 100 TB design point). */
  def destroy(ids: DataFrame): Long = {
    val idDf = ids.toDF(idCol)
    morEntries(None) match {
      case Some(entries) =>
        // MERGE-ON-READ (r14): victims retire by address into deletion
        // vectors — zero data bytes move; a gutted file is caught by the
        // cutover (survivor rewrite) and a fully-emptied one simply
        // retires (both inside the one seal, see GraftDvCommit)
        if (entries.isEmpty) 0L
        else {
          val victims = collectVictims(addrDf(None)
            .join(idDf, Seq(idCol), "left_semi"))
          graft.sources.GraftMor.pointWrite(spark, path, None, victims,
            None, "DESTROY")
          victimCount(victims)
        }
      case None =>
        val existing = df
        val victims = existing.join(idDf, Seq(idCol), "left_semi").cache()
        val n = victims.count()
        if (n > 0) {
          val affected = collectBuckets(victims)
          val keep = existing.where(partitionsPred(affected))
            .join(idDf, Seq(idCol), "left_anti")
          rewritePartitions(affected, keep)
        }
        victims.unpersist()
        n
    }
  }

  /** Keyed update with automatic relocation — `Lazy::get_mut` + `Lazy::close`
    * (/root/reference/src/world/iter.rs:173-252, 195-211): apply column
    * updates to rows matching `cond`, recompute bucket columns, and rewrite
    * both the old and new partitions (re-bucketing falls out of writing with
    * recomputed `c_i`; SURVEY §2.3). Dim 0 (the id) must not change
    * ("data id should be immutable", /root/reference/src/world.rs:108).
    */
  def update(cond: Column, sets: Map[String, Column]): Long = {
    require(!sets.contains(idCol), s"dim-0 id column `$idCol` is immutable")
    // three-valued logic: cond=NULL rows must land in `keep`, not vanish —
    // `where(cond)` and `where(!cond)` BOTH drop NULL rows, so normalize the
    // condition to false-on-NULL before splitting
    val condT = coalesce(cond, lit(false))
    morEntries(None) match {
      case Some(entries) =>
        // MERGE-ON-READ (r14): old images retire by address, new images
        // (buckets recomputed — relocation falls out of routing) append
        // into their cells, one seal — the programmatic twin of the SQL
        // delta UPDATE (GraftDeltaUpdateOperation)
        if (entries.isEmpty) 0L
        else {
          val hit = addrDf(None).where(condT).cache()
          val victims = collectVictims(hit)
          if (victims.nonEmpty) {
            val mutated = withBuckets(
              sets.foldLeft(hit.drop("__gf", "__gp").drop(bucketCols: _*)) {
                case (d, (c, e)) => d.withColumn(c, e) })
            graft.sources.GraftMor.pointWrite(spark, path, None, victims,
              Some(mutated), "UPDATE")
          }
          hit.unpersist()
          victimCount(victims)
        }
      case None =>
        val existing = df
        val hit = existing.where(condT).cache()
        val n = hit.count()
        if (n > 0) {
          val mutated = withBuckets(
            sets.foldLeft(hit.drop(bucketCols: _*)) { case (d, (c, e)) => d.withColumn(c, e) }
          )
          val affected = collectBuckets(hit) ++ collectBuckets(mutated)
          val keep = existing.where(partitionsPred(affected)).where(!condT)
          rewritePartitions(affected, keep.unionByName(mutated))
        }
        hit.unpersist()
        n
    }
  }

  /** Compaction: rewrite fragmented chunk directories down to one file each.
    * Every append path (tryInsert, the graft connector's write, daemon
    * batches) adds a file per touched chunk — at 100 TB an append-heavy
    * world fragments into a small-files problem unless compacted. Only
    * directories holding more than `maxFilesPerChunk` data files are
    * rewritten (partition-scoped, like every other point op); returns the
    * number of compacted chunks. */
  def compact(maxFilesPerChunk: Int = 1): Long = {
    val fs = fileSystem
    val root = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(root)) return 0L
    // LIVE-cell fragment discovery (manifest-resolved when the commit log
    // is authoritative — retired-in-place files must not look like
    // fragmentation; pruned+PARALLEL grid walk otherwise: on a ~100k-chunk
    // grid a sequential driver-side listStatus recursion IS the cost of a
    // no-op compact).
    val frag = graft.sources.GraftDataSource.liveCells(fs, root, Array.empty)
      .filter { case (_, _, files) => files.sizeIs > maxFilesPerChunk }
    if (frag.isEmpty) 0L
    else {
      val buckets: Set[Vector[Long]] = frag.map { case (_, b, _) =>
        dims.indices.map(i => b(s"c$i")).toVector
      }.toSet
      rewritePartitions(buckets, df.where(partitionsPred(buckets)))
      buckets.size.toLong
    }
  }

  /** Re-grid: rebuild this world's contents under a DIFFERENT chunk
    * geometry (new items-per-chunk, bounds, or dimension set) at `newPath`.
    * The maintenance op the fixed-grid reference cannot express without a
    * manual dump/reload: when observed data density makes the original
    * chunk sizing wrong (too many small chunks, or hotspot chunks too
    * large), the fix is one clustered rewrite — `create` re-derives every
    * bucket column under the new mapping, so relocation falls out of the
    * same math as insert-time routing. Requires the new dims to cover the
    * same data columns (validation quarantines anything out of range,
    * exactly as on any other write path). */
  def regrid(newPath: String, newDims: Seq[DimSpec],
      zorderWithinChunks: Boolean = false): World = {
    val target = new World(spark, newPath, newDims)
    target.create(df.drop(bucketCols: _*), zorderWithinChunks)
    target
  }

  // ---------------------------------------------------------------- helpers

  /** Predicate selecting exactly the given bucket tuples. A struct `IN` —
    * one InSet over (c0..cn) — keeps the plan size flat for a 10k-bucket
    * touch where an OR-of-ANDs chain would bloat the expression tree; it
    * still references only partition columns, so Catalyst's file index
    * evaluates it per-directory (pruning, not scanning). */
  private def partitionsPred(parts: Set[Vector[Long]]): Column =
    if (parts.isEmpty) lit(false)
    else struct(bucketCols.map(c => col(c).cast("long")): _*)
      .isin(parts.toSeq.map(p => struct(p.map(lit(_)): _*)): _*)

  /** Rewrite exactly `affected` partitions with `rows` (which must carry
    * bucket columns): ONE connector write sealed as a versioned,
    * bucket-scoped overwrite (`graft.replaceCells` — the victim set is the
    * affected cells, including cells the rewrite leaves EMPTY, which a
    * dynamic overwrite would silently keep).
    *
    * This was the engine's last VERSION BARRIER: the legacy shape synced
    * the tree, staged `rows` to a scratch path, re-read it, wrote it a
    * SECOND time through Spark's parquet committer, and invalidated every
    * pre-rewrite snapshot. The connector commit writes each byte once —
    * in place when the log is authoritative — retires the victim files in
    * the manifest only (snapshots stay addressable), and is safe against
    * read-own-write by construction: `rows`' plan froze its file list at
    * df-creation, fresh files land under new unique names invisible to
    * that plan, and victim bytes never move. insert / destroy / update /
    * applyDelta — and therefore every index/MV refresh — are now ordinary
    * CAS-sealed commits, the same crash/concurrency story as SQL DML. */
  private def rewritePartitions(affected: Set[Vector[Long]], rows: DataFrame,
      branch: Option[String] = None): Unit = {
    if (affected.isEmpty) return
    val enc = affected.toSeq.sortBy(_.mkString(","))
      .map(p => bucketCols.zip(p).map { case (c, v) => s"$c=$v" }.mkString("/"))
      .mkString(";")
    val w = rows.write.format("graft")
      .option("graft.replaceCells", enc)
      .mode("append") // the option declares the overwrite; mode is unused
    branch.fold(w)(b => w.option("graft.branch", b)).save(path)
  }
}

object World {
  /** `world!` macro analog (/root/reference/src/macros.rs:19-27): the
    * reference's one-line world declaration, as a builder —
    * `World(spark, path)("id" -> DimMapping(0, 1023, 8), "x" -> ...)`.
    * Dim order is declaration order; the first pair is dim 0 (the id). */
  def apply(spark: SparkSession, path: String)(dims: (String, DimMapping)*): World =
    new World(spark, path, dims.map { case (c, m) => DimSpec(c, m) })

  /** Bounded LRU of manifest-addressed read frames (see [[World.dfOver]]):
    * key = (exact entry signature, session, path), value = the analyzed
    * DataFrame over those files. Capped small — entries are metadata-sized,
    * but each value pins its SparkSession; eviction keeps stopped test
    * sessions collectable. Synchronized: reads race with maintenance
    * writers at most per-query, never per-row. */
  /** Dev kill switch for A/B measurement: -Dgraft.world.readMemo=off. */
  private[world] def readMemoEnabled: Boolean =
    !sys.props.get("graft.world.readMemo").contains("off")

  /** Drop every memoized read frame — called by [[graft.ops.Pins.releaseAll]]
    * at end-of-query so memoized DataFrames (and the SparkSessions they
    * reference) never accumulate across a suite. */
  def clearReadMemo(): Unit = readMemo.clear()

  private[world] object readMemo {
    private val MaxEntries = 128
    private val m = new java.util.LinkedHashMap[Any, DataFrame](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Any, DataFrame]): Boolean = size() > MaxEntries
    }
    def get(k: Any): Option[DataFrame] = m.synchronized(Option(m.get(k)))
    def put(k: Any, v: DataFrame): Unit = m.synchronized { m.put(k, v); () }
    def clear(): Unit = m.synchronized(m.clear())
  }
}

/** Composable selection — `Select` (/root/reference/src/world.rs:588-644).
  * Carries a [[Shape]] over chunk positions plus id hints; materializes as a
  * partition-pruning predicate Catalyst pushes into the scan.
  */
final class WorldSelect(
    world: World,
    val shape: Shape,
    val hintIds: Seq[Long]
) {
  /** Intersect with a range on another dim (`Select::and`,
    * /root/reference/src/world.rs:598-605). Reference semantics: an
    * out-of-range inner selection (shape None) makes `and` a NO-OP — it only
    * intersects `if let Shape::Single(v)` — so the selection is left
    * unchanged, not emptied. */
  def and(dim: Int, bounds: Bounds): WorldSelect = {
    val s = world.boxFor(dim, bounds) match {
      case Some(b) => shape.intersect(b)
      case None    => shape
    }
    new WorldSelect(world, s, hintIds)
  }

  /** Union with a range on another dim (`Select::plus`,
    * /root/reference/src/world.rs:607-614). */
  def plus(dim: Int, bounds: Bounds): WorldSelect = {
    val s = world.boxFor(dim, bounds) match {
      case Some(b) => shape.add(b)
      case None    => shape
    }
    new WorldSelect(world, s, hintIds)
  }

  /** Push target ids (`Select::hint`, /root/reference/src/world.rs:616-636).
    * Reference contract (SURVEY §2.8): a pruning hint — we apply it as an
    * `isin` predicate on dim 0 (deterministic narrowing; Parquet row-group
    * stats give the skip behavior). */
  def hint(id: Long): WorldSelect = new WorldSelect(world, shape, hintIds :+ id)
  def hints(ids: Seq[Long]): WorldSelect = new WorldSelect(world, shape, hintIds ++ ids)

  /** The partition-pruning predicate over bucket columns: OR over boxes of
    * AND over dims of `c_i BETWEEN lo AND hi`. Catalyst's
    * `PruneFileSourcePartitions` turns this into directory pruning — the
    * exact analog of the reference's box algebra (SURVEY §4). */
  def pruningPredicate: Column = {
    val boxes = shape.boxes
    val boxPred =
      if (boxes.isEmpty) lit(false)
      else boxes.map { b =>
        b.ranges.zipWithIndex.map { case ((lo, hi), i) =>
          col(s"c$i") >= lit(lo) && col(s"c$i") <= lit(hi)
        }.reduce(_ && _)
      }.reduce(_ || _)
    if (hintIds.isEmpty) boxPred
    else boxPred && col(world.dims.head.column).isin(hintIds: _*)
  }

  /** Chunk-granular scan (`Select::iter`, /root/reference/src/world.rs:641-643):
    * all rows of every chunk in the selection — row-exact filtering is the
    * caller's job, matching the reference's contract (SURVEY §2.2). */
  def iter(): DataFrame = world.df.where(pruningPredicate)

  /** Dim projection of the scan (`Lazy::dims`,
    * /root/reference/src/world/iter.rs:96-113). */
  def dimsOnly(): DataFrame = iter().select(world.dims.map(d => col(d.column)): _*)
}
