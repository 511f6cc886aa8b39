package graft.ops

import graft.core.{Bounds, DimMapping}
import graft.world.World
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Incrementally-maintained VECTOR ANN INDEX over a version-logged world —
  * the vector-database face of the chunk grid, driven by the commit log the
  * same way [[InvertedIndex]] maintains postings.
  *
  * Index rows live in their own 2-dim World: one row per vector —
  * `(pid, cell, vec_id, embedding)` — where `cell` (the vector's IVF
  * coarse-quantizer assignment) is the PRUNING dimension: one cell = one
  * chunk stripe, so a search probes its `nprobe` cells' stripes and never
  * scans the index. `pid = xxhash64(vec_id)` is the unique row id (dim 0)
  * that makes upserts replace-idempotent and spreads rows uniformly inside
  * a stripe.
  *
  * The coarse quantizer is trained ONCE at [[initialize]] (the IVF
  * trainer's deterministic Lloyd contract) and PERSISTED next to the index
  * (`Double.toString` round-trips exactly, so reloads assign bit-identical
  * cells) — refreshes must place new vectors with the SAME quantizer or
  * unchanged rows would appear to move. `refresh()` never re-reads the base
  * corpus: it consumes the net commit-log feed between the recorded cursor
  * and the base's latest commit; deleted vectors arrive as before-images
  * (their pid recomputes from `vec_id`), inserted vectors assign their cell
  * and upsert — both applied in ONE combined rewrite of the affected cells
  * ([[World.applyDelta]]). Cursor + torn-refresh discipline are
  * [[MaterializedAgg]]'s: a sentinel row advances with the state, an intent
  * marker turns any half-applied refresh into a detected rebuild.
  *
  * [[search]] takes one query vector (driver-side constant, like a serving
  * lookup): its probe cells compute driver-side against the persisted
  * centroids (same strict-< tie-break as the
  * [[graft.functions.NearestCentroids]] kernel), the probed stripes scan
  * through the native [[graft.functions.CosineSim]] kernel, and the top-k
  * is a TakeOrdered — cost is the probed stripes, independent of index
  * size.
  *
  * Reference anchor: hint-driven point lookups over the grid
  * (/root/reference/src/world.rs:616-636) — here the "hint" is the coarse
  * cell and the grid stripe IS the inverted list.
  */
final class VectorIndex(
    val spark: SparkSession,
    val basePath: String,
    val idxPath: String,
    val idCol: String = "vec_id",
    val vecCol: String = "embedding",
    val nlist: Int = 16,
    val dim: Int = 64,
    // pid-axis width; cells = pidChunks x nlist. Size to the corpus: each
    // refresh is a read-modify-write of affected cells only, and each
    // search reads nprobe stripes of pidChunks files
    val pidChunks: Int = 4) {
  require(Integer.bitCount(pidChunks) == 1,
    "pidChunks must be a power of two (divides the u64 domain)")
  require(nlist > 0 && dim > 0, "nlist and dim must be positive")

  private val SentinelPid = 0L
  private def intentPath = new Path(idxPath, "_graft_vix_refresh_intent")
  // OUTSIDE the world dir: World.create stages and swaps the whole grid
  // directory, which would sweep an in-tree sidecar away with the old grid
  private def centroidsPath = new Path(idxPath + "__meta", "centroids")

  /** Index world: dim0 = pid (unique row id), dim1 = cell (the pruning
    * dim — values 0..nlist-1, one chunk per cell). */
  val world: World = World(spark, idxPath)(
    "pid" -> DimMapping(0L, -1L,
      java.lang.Long.divideUnsigned(0L - 1L, pidChunks.toLong) + 1L),
    "cell" -> DimMapping(0L, nlist - 1L, 1L))

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(idxPath), spark.sparkContext.hadoopConfiguration)

  private def nonZero(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c === lit(SentinelPid), lit(1L)).otherwise(c)

  private[ops] def persistCentroids(cents: Array[Double], k: Int): Unit = {
    val out = fs.create(centroidsPath, true)
    out.write(s"$k\n${cents.map(_.toString).mkString(",")}\n".getBytes("UTF-8"))
    out.close()
  }

  /** (centroids row-major, actual nlist). */
  def centroids: (Array[Double], Int) = {
    val in = fs.open(centroidsPath)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val Array(kLine, dLine) = text.trim.split("\n")
    (dLine.split(",").map(_.toDouble), kLine.toInt)
  }

  /** Driver-side twin of the [[graft.functions.NearestCentroids]]
    * assignment (squared L2, first-strictly-smaller wins): the `howMany`
    * nearest cell indices for a query vector. */
  def nearestCells(q: Array[Double], cents: Array[Double], k: Int,
      howMany: Int): Seq[Long] = {
    val d = cents.length / k
    val bestD = Array.fill(howMany)(Double.MaxValue)
    val bestI = Array.fill(howMany)(-1L)
    var c = 0
    while (c < k) {
      var d2 = 0.0; var i = 0
      val base = c * d
      while (i < d && i < q.length) {
        val diff = q(i) - cents(base + i); d2 += diff * diff; i += 1
      }
      var j = howMany - 1
      if (d2 < bestD(j)) {
        while (j > 0 && d2 < bestD(j - 1)) {
          bestD(j) = bestD(j - 1); bestI(j) = bestI(j - 1); j -= 1
        }
        bestD(j) = d2; bestI(j) = c.toLong
      }
      c += 1
    }
    bestI.toSeq.filter(_ >= 0)
  }

  private[ops] def latestBase: Long = {
    val bfs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(basePath), spark.sparkContext.hadoopConfiguration)
    graft.sources.GraftVersions.latestVersion(bfs, new Path(basePath))
      .getOrElse(throw new IllegalStateException(
        s"vector index needs a version-logged base: $basePath has no commits"))
  }

  /** (pid, cell, vec_id, embedding) index rows for a corpus frame, cells
    * assigned by the persisted quantizer. */
  private def indexRows(vecs: DataFrame, cents: Array[Double], k: Int): DataFrame =
    vecs.select(
      nonZero(xxhash64(col(idCol))).as("pid"),
      element_at(graft.functions.NearestCentroids(col(vecCol), cents, k, 1), 1)
        .as("cell"),
      col(idCol), col(vecCol))

  private val stateCols = Seq("pid", "cell", idCol, vecCol)

  private[ops] def sentinelRow(version: Long, like: StructType): DataFrame = {
    val schema = StructType(like.fields.map(_.copy(nullable = true)))
    val row = Row.fromSeq(schema.fields.map { f =>
      f.name match {
        case "pid" | "cell" => SentinelPid
        case `idCol`        => version
        case _              => null
      }
    }.toSeq)
    spark.createDataFrame(java.util.List.of(row), schema)
  }

  /** Full (re)build at the base's latest commit — trains AND persists the
    * quantizer; also the torn-refresh recovery path. Returns the cursor. */
  def initialize(): Long = {
    val v1 = latestBase
    fs.mkdirs(new Path(idxPath))
    fs.create(intentPath, true).close()
    val snap = spark.read.format("graft")
      .option("graft.snapshot", v1.toString).load(basePath)
      .select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    val (cents, k) = Similarity.trainCentroids(snap, nlist, dim)
    persistCentroids(cents, k)
    val st = indexRows(
      snap.select(col("vec_id").as(idCol), col("embedding").as(vecCol)),
      cents, k)
    world.create(st.unionByName(sentinelRow(v1, st.schema)))
    fs.delete(intentPath, false)
    v1
  }

  /** The base version the index currently reflects. */
  def cursor: Long = {
    val rows = world.df.where(col("pid") === SentinelPid)
      .select(idCol).collect()
    require(rows.nonEmpty,
      s"vector index at $idxPath not initialized (no cursor row)")
    rows.head.getLong(0)
  }

  /** Apply the commit-log delta since the cursor; returns the new cursor. */
  def refresh(): Long = {
    val root = new Path(idxPath)
    if (!fs.exists(root) || !fs.exists(centroidsPath)) return initialize()
    if (fs.exists(intentPath)) return initialize()
    val v0 = cursor
    val v1 = latestBase
    if (v1 <= v0) return v0
    val (cents, k) = centroids
    // the NET feed: an UPDATE surfaces its whole cell on both raw sides;
    // EXCEPT ALL cancels unchanged rows so the rewrite touches exactly the
    // vectors that changed
    val feed = graft.sources.GraftChanges.netBetween(spark, basePath, v0, v1)
    val (pinned, handle) = Pins.pinWithHandle(
      feed.select(col("_change_type"), col(idCol), col(vecCol)))
    try {
      fs.create(intentPath, true).close()
      // (pid, vec_id) PAIRS, not pid alone: applyDelta removes a row only
      // when every column matches, so a pid collision (the 2^-64 xxhash64
      // class, plus the deliberate 0→1 sentinel remap) can no longer make
      // a delete destroy the OTHER preimage's live vector — delete-side
      // aliasing is silent data loss in the index, strictly worse than the
      // shadowed-posting read-side miss the InvertedIndex doc adjudicates
      val deadIds = pinned.where(col("_change_type") === "delete")
        .select(nonZero(xxhash64(col(idCol))).as("pid"), col(idCol))
      val fresh = indexRows(
        pinned.where(col("_change_type") === "insert"), cents, k)
      world.applyDelta(deadIds,
        fresh.unionByName(sentinelRow(v1, fresh.schema)))
      fs.delete(intentPath, false)
    } finally Pins.release(handle)
    v1
  }

  /** ANN serving lookup: top-k most cosine-similar indexed vectors to `q`,
    * scanning only the `nprobe` probed cell stripes. Returns
    * (idCol, simu = round(cos·1e4) as long), similarity descending with id
    * tie-break. */
  def search(q: Array[Double], k: Int, nprobe: Int = 2): DataFrame = {
    val (cents, actual) = centroids
    val cells = nearestCells(q, cents, actual, math.min(nprobe, actual))
    val sel = cells.tail.foldLeft(world.select(1, Bounds.point(cells.head)))(
      (s, c) => s.plus(1, Bounds.point(c)))
    sel.iter()
      .where(col("pid") =!= SentinelPid)
      .select(col(idCol),
        round(graft.functions.CosineSim(typedLit(q), col(vecCol)) * 1e4, 0)
          .cast("long").as("simu"))
      .orderBy(col("simu").desc, col(idCol))
      .limit(k)
  }

  /** Live index rows (sentinel excluded). */
  def df: DataFrame =
    world.df.where(col("pid") =!= SentinelPid).select(stateCols.map(col): _*)

  /** Batch ANN face — the analytics complement of the single-vector
    * serving [[search]]: top-k for EVERY query row in one distributed
    * plan. Each query explodes to its `nprobe` probed cells (the same
    * persisted quantizer, kernel-side), the index joins the broadcast
    * query set on cell equality — candidates are the probed inverted
    * lists, never the index — and the native cosine kernel re-ranks
    * exactly. Self-matches (an indexed vector querying the index) are
    * excluded by id, matching the ANN family's `*TopK` contract. */
  def searchAll(queries: DataFrame, k: Int, nprobe: Int = 2): DataFrame = {
    val (cents, actual) = centroids
    val probes = math.min(nprobe, actual)
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_emb"),
      explode(graft.functions.NearestCentroids(col(vecCol), cents, actual, probes))
        .as("cell"))
    val t = df.select(col("cell"), col(idCol).as("t_id"), col(vecCol).as("t_emb"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(round(col("sim"), 4).desc, col("t_id"))
    t.join(broadcast(q), Seq("cell"))
      .where(col("t_id") =!= col("q_id"))
      .withColumn("sim", graft.functions.CosineSim(col("q_emb"), col("t_emb")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("t_id"), col("rank").cast("long").as("rank"))
  }
}

/** PQ-CODED incrementally-maintained vector index — [[VectorIndex]]'s
  * maintenance discipline (persisted coarse quantizer, commit-log net-feed
  * refresh, sentinel cursor + intent marker) with PRODUCT-QUANTIZED
  * storage: each indexed vector is `m` codeword indices instead of `dim`
  * raw floats, which is the MEMORY axis at index level — the raw-vector
  * index's bytes scale with corpus × dim; this one's with corpus × m ints
  * plus one `m·ksub·subDim`-double codebook trained ONCE at [[initialize]]
  * under the IVF trainer's deterministic Lloyd contract and persisted
  * beside the centroids (refreshes code new vectors with the SAME
  * codebooks, or unchanged rows would appear to move).
  *
  * [[search]] is the `ivfPqTopK` architecture ([[Similarity]]) as a
  * maintained index: probe cells compute driver-side, the probed stripes
  * ADC-scan through the native [[graft.functions.PqAdc]] kernel (no full
  * vectors touched), and only a bounded `shortlist` of candidate ids is
  * exact-cosine re-ranked against embeddings read back from the BASE table
  * (a broadcast semi-join; registering a bloom on the base's id column
  * makes that read file-skipping at scale). The planted cannot-miss
  * argument composes both halves exactly like `s_ann_ivfpq_planted`: an
  * exact copy shares the query's probe-1 cell AND holds the ADC floor
  * `sum_s min_c ||q_s − c||²`, so neither stage can drop it. */
final class PqVectorIndex(
    val spark: SparkSession,
    val basePath: String,
    val idxPath: String,
    val idCol: String = "vec_id",
    val vecCol: String = "embedding",
    val nlist: Int = 16,
    val dim: Int = 64,
    val m: Int = 8,
    val ksub: Int = 16,
    val pidChunks: Int = 4) {
  require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
  private val subDim = dim / m

  // the raw-vector index supplies the shared machinery: world geometry,
  // coarse-quantizer persistence, sentinel/cursor discipline. Its vecCol is
  // re-pointed at the CODES column so the sentinel schema matches.
  private val inner = new VectorIndex(spark, basePath, idxPath, idCol,
    vecCol = "codes", nlist = nlist, dim = dim, pidChunks = pidChunks)
  def world: World = inner.world

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(idxPath), spark.sparkContext.hadoopConfiguration)
  private def intentPath = new Path(idxPath, "_graft_vix_refresh_intent")
  private def codebookPath = new Path(idxPath + "__meta", "pqcodebooks")

  private def writeCodebooks(cb: Array[Double], actualK: Int): Unit = {
    fs.mkdirs(codebookPath.getParent)
    val out = fs.create(codebookPath, true)
    out.write(s"$m $actualK $subDim\n${cb.map(_.toString).mkString(",")}\n"
      .getBytes("UTF-8"))
    out.close()
  }

  /** (codebooks flat row-major, actual ksub). */
  def codebooks: (Array[Double], Int) = {
    val in = fs.open(codebookPath)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val Array(head, flat) = text.trim.split("\n")
    val k = head.split(" ")(1).toInt
    (flat.split(",").map(_.toDouble), k)
  }

  /** (pid, cell, vec_id, codes) rows: coarse cell by the persisted
    * quantizer, codes by one native [[graft.functions.NearestCentroids]]
    * pass per subspace over the subvector slice — shuffle-free. */
  private def codedRows(vecs: DataFrame, cents: Array[Double], k: Int,
      cb: Array[Double], actualK: Int): DataFrame = {
    val codes = (0 until m).map { s =>
      val sub = cb.slice(s * actualK * subDim, (s + 1) * actualK * subDim)
      element_at(graft.functions.NearestCentroids(
        slice(col(vecCol), s * subDim + 1, subDim), sub, actualK, 1), 1)
    }
    vecs.select(
      when(xxhash64(col(idCol)) === lit(0L), lit(1L))
        .otherwise(xxhash64(col(idCol))).as("pid"),
      element_at(graft.functions.NearestCentroids(col(vecCol), cents, k, 1), 1)
        .as("cell"),
      col(idCol), array(codes: _*).as("codes"))
  }

  /** Full (re)build at the base's latest commit — trains AND persists the
    * coarse quantizer and the PQ codebooks. Returns the cursor. */
  def initialize(): Long = {
    val v1 = inner.latestBase
    fs.mkdirs(new Path(idxPath))
    fs.create(intentPath, true).close()
    val snap = spark.read.format("graft")
      .option("graft.snapshot", v1.toString).load(basePath)
      .select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    // ONE bounded sample collect trains BOTH the coarse quantizer and the
    // PQ codebooks (identical sample by construction — r17; the second
    // TakeOrdered pass over the corpus was pure repetition)
    val sample = Similarity.collectTrainerSample(snap)
    val (cents, k) = Similarity.trainCentroidsOnSample(sample, nlist, dim)
    inner.persistCentroids(cents, k)
    val (cb, actualK) = Similarity.trainPqCodebooksOnSample(sample, m, ksub, dim)
    writeCodebooks(cb, actualK)
    val st = codedRows(
      snap.select(col("vec_id").as(idCol), col("embedding").as(vecCol)),
      cents, k, cb, actualK)
    world.create(st.unionByName(inner.sentinelRow(v1, st.schema)))
    fs.delete(intentPath, false)
    v1
  }

  /** The base version the index currently reflects. */
  def cursor: Long = inner.cursor

  /** Apply the commit-log delta since the cursor; returns the new cursor.
    * Identical discipline to [[VectorIndex.refresh]] — net feed, (pid, id)
    * paired deletes, one combined applyDelta, intent-marker recovery —
    * with fresh vectors CODED by the persisted codebooks. */
  def refresh(): Long = {
    if (!fs.exists(new Path(idxPath)) || !fs.exists(codebookPath) ||
        fs.exists(intentPath)) return initialize()
    val v0 = cursor
    val v1 = inner.latestBase
    if (v1 <= v0) return v0
    val (cents, k) = inner.centroids
    val (cb, actualK) = codebooks
    val feed = graft.sources.GraftChanges.netBetween(spark, basePath, v0, v1)
    val (pinned, handle) = Pins.pinWithHandle(
      feed.select(col("_change_type"), col(idCol), col(vecCol)))
    try {
      fs.create(intentPath, true).close()
      val deadIds = pinned.where(col("_change_type") === "delete")
        .select(when(xxhash64(col(idCol)) === lit(0L), lit(1L))
          .otherwise(xxhash64(col(idCol))).as("pid"), col(idCol))
      val fresh = codedRows(
        pinned.where(col("_change_type") === "insert"), cents, k, cb, actualK)
      world.applyDelta(deadIds,
        fresh.unionByName(inner.sentinelRow(v1, fresh.schema)))
      fs.delete(intentPath, false)
    } finally Pins.release(handle)
    v1
  }

  /** ANN serving lookup over the coded stripes: ADC-rank the `nprobe`
    * probed cells' codes (native kernel, no full vectors), exact-cosine
    * re-rank a bounded `shortlist` against embeddings read from the BASE
    * table. Returns (idCol, simu) like [[VectorIndex.search]]. */
  def search(q: Array[Double], k: Int, nprobe: Int = 2,
      shortlist: Int = 64): DataFrame = {
    val (cents, actual) = inner.centroids
    val (cb, actualK) = codebooks
    val cells = inner.nearestCells(q, cents, actual, math.min(nprobe, actual))
    val sel = cells.tail.foldLeft(world.select(1, Bounds.point(cells.head)))(
      (s, c) => s.plus(1, Bounds.point(c)))
    val qf = q.map(_.toFloat)
    val short = sel.iter()
      .where(col("pid") =!= lit(0L))
      .withColumn("adc",
        graft.functions.PqAdc(typedLit(qf), col("codes"), cb, m, actualK))
      .orderBy(col("adc").asc, col(idCol))
      .limit(shortlist)
      .select(col(idCol))
    // exact re-rank: the shortlist is bounded (<= `shortlist` ids), so it
    // broadcasts; the base-side scan skips files when a bloom is registered
    // on the id column
    spark.read.format("graft").load(basePath)
      .select(col(idCol), col(vecCol))
      .join(broadcast(short), Seq(idCol), "left_semi")
      .select(col(idCol),
        round(graft.functions.CosineSim(typedLit(q), col(vecCol)) * 1e4, 0)
          .cast("long").as("simu"))
      .orderBy(col("simu").desc, col(idCol))
      .limit(k)
  }

  /** Live index rows (sentinel excluded): (pid, cell, vec_id, codes). */
  def df: DataFrame = inner.df
}
