package graft.ops

import graft.core.{Bounds, DimMapping}
import graft.functions.WordNgrams
import graft.world.World
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Incrementally-maintained INVERTED TEXT INDEX over a version-logged
  * world — the search-engine face of the chunk grid, driven by the commit
  * log the same way [[MaterializedAgg]] maintains an aggregate.
  *
  * Postings live in their own 2-dim World: one row per (term, doc) pair —
  * `(pid, fp, doc_id, term, tf)` — where `fp = xxhash64(term)` is the
  * PRUNING dimension (a term lookup scans one chunk stripe of the grid,
  * never the index) and `pid = xxhash64(term, doc_id)` is the unique row
  * id (dim 0) that makes inserts replace-idempotent. Both dims span the
  * full u64 domain, so postings spread uniformly no matter how skewed the
  * vocabulary is.
  *
  * `refresh()` never re-reads the base corpus: it consumes the
  * [[graft.sources.GraftChanges]] feed between the recorded cursor and the
  * base's latest commit. Deleted docs arrive as BEFORE-IMAGES (text
  * included), so their posting ids are recomputed from the text itself and
  * destroyed — no doc→postings side table needed; inserted docs re-tokenize
  * into posting upserts. An UPDATE is delete(old)+insert(new) in the feed,
  * and the destroy runs first, so postings whose (term, doc) survive the
  * edit are re-inserted with their new tf. Cursor + torn-refresh discipline
  * are [[MaterializedAgg]]'s: a sentinel row advances with the state, an
  * intent marker turns any half-applied refresh into a detected rebuild.
  *
  * Row-id collisions: two (term, doc) pairs share a pid with probability
  * 2^-64; at 10^12 postings the birthday estimate is ~n²/2^65 shadowed
  * postings (≈10^-8 of the index) — acceptable for retrieval, where a
  * shadowed posting is one missed hit, not corruption. An exact-count use
  * would take the 128-bit two-seed key the span-dedup grams use.
  *
  * Reference anchor: hint-driven point lookups over the grid
  * (/root/reference/src/world.rs:616-636) — here the "hint" is a term
  * fingerprint and the grid stripe IS the posting list.
  */
final class InvertedIndex(
    val spark: SparkSession,
    val basePath: String,
    val idxPath: String,
    val idCol: String = "doc_id",
    val textCol: String = "text",
    // grid geometry: cells = pidChunks x fpChunks. Size to the corpus —
    // every refresh step (destroy + insert) is a read-modify-write of the
    // AFFECTED cells, so a grid far wider than the posting volume pays
    // per-file fixed costs for nothing (the regrid argument, SURVEY §2.6,
    // applied to the index artifact); at 100 TB widen fpChunks so a hot
    // term's stripe stays scannable and pidChunks so cells stay
    // executor-memory-sized
    val pidChunks: Int = 8,
    val fpChunks: Int = 16) {
  require(Integer.bitCount(pidChunks) == 1 && Integer.bitCount(fpChunks) == 1,
    "chunk counts must be powers of two (they divide the u64 domain)")

  private val SentinelPid = 0L
  private def intentPath = new Path(idxPath, "_graft_idx_refresh_intent")

  /** Posting world: dim0 = pid (unique row id), dim1 = fp (term
    * fingerprint, the pruning dim). */
  val world: World = World(spark, idxPath)(
    "pid" -> DimMapping(0L, -1L,
      java.lang.Long.divideUnsigned(0L - 1L, pidChunks.toLong) + 1L),
    "fp" -> DimMapping(0L, -1L,
      java.lang.Long.divideUnsigned(0L - 1L, fpChunks.toLong) + 1L))

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(idxPath), spark.sparkContext.hadoopConfiguration)

  /** Driver-side twin of `functions.xxhash64(stringCol)` (seed 42). */
  def termFp(term: String): Long = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(term)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  private def nonZero(c: Column): Column =
    when(c === lit(SentinelPid), lit(1L)).otherwise(c)

  /** The document-LENGTH pseudo-term: the empty string cannot come out of
    * the tokenizer (it drops empties), so its fp stripe holds exactly one
    * `(doc, dl)` row per document — the per-doc metadata BM25 needs,
    * maintained by the same destroy+insert refresh as every posting. */
  private val LenTerm = ""

  /** (pid, fp, doc_id, term, tf) postings of a corpus frame, plus one
    * length row per doc under [[LenTerm]]. */
  private def postings(docs: DataFrame): DataFrame = {
    val tfRows = docs
      .select(col(idCol), explode(WordNgrams(col(textCol), 1)).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
      .select(
        nonZero(xxhash64(col("term"), col(idCol))).as("pid"),
        xxhash64(col("term")).as("fp"),
        col(idCol), col("term"), col("tf"))
    val lenRows = docs.select(
      nonZero(xxhash64(lit(LenTerm), col(idCol))).as("pid"),
      xxhash64(lit(LenTerm)).as("fp"),
      col(idCol), lit(LenTerm).as("term"),
      size(WordNgrams(col(textCol), 1)).cast("long").as("tf"))
    tfRows.unionByName(lenRows)
  }

  private val stateCols = Seq("pid", "fp", idCol, "term", "tf")

  private def latestBaseVersion: Long = {
    val bfs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(basePath), spark.sparkContext.hadoopConfiguration)
    graft.sources.GraftVersions.latestVersion(bfs, new Path(basePath))
      .getOrElse(throw new IllegalStateException(
        s"inverted index needs a version-logged base: $basePath has no commits"))
  }

  private def sentinel(version: Long, like: StructType): DataFrame = {
    val schema = StructType(like.fields.map(_.copy(nullable = true)))
    val row = Row.fromSeq(schema.fields.map { f =>
      f.name match {
        case "pid" | "fp" => SentinelPid
        case "tf"         => version
        case _            => null
      }
    }.toSeq)
    spark.createDataFrame(java.util.List.of(row), schema)
  }

  /** Full (re)build at the base's latest commit — also the torn-refresh
    * recovery path. Returns the cursor version. */
  def initialize(): Long = {
    val v1 = latestBaseVersion
    fs.create(intentPath, true).close()
    val snap = spark.read.format("graft")
      .option("graft.snapshot", v1.toString).load(basePath)
    val st = postings(snap)
    world.create(st.unionByName(sentinel(v1, st.schema)))
    fs.delete(intentPath, false)
    v1
  }

  /** The base version the index currently reflects. */
  def cursor: Long = {
    val rows = world.df.where(col("pid") === SentinelPid)
      .select("tf").collect()
    require(rows.nonEmpty,
      s"inverted index at $idxPath not initialized (no cursor row)")
    rows.head.getLong(0)
  }

  /** Apply the commit-log delta since the cursor; returns the new cursor. */
  def refresh(): Long = {
    val root = new Path(idxPath)
    if (!fs.exists(root) || fs.listStatus(root).isEmpty) return initialize()
    if (fs.exists(intentPath)) return initialize()
    val v0 = cursor
    val v1 = latestBaseVersion
    if (v1 <= v0) return v0

    // the NET feed, not the raw chunk-granular one: a one-doc UPDATE
    // surfaces its whole cell on both sides of the raw feed, which would
    // re-index every unchanged doc in the cell; EXCEPT ALL cancels them
    // so the destroy+insert below touch exactly the docs that changed
    val feed = graft.sources.GraftChanges.netBetween(spark, basePath, v0, v1)
    // pin the feed ONCE: both sides read it, and the first mutation
    // rewrites state the second would otherwise re-plan against
    val (pinned, handle) = Pins.pinWithHandle(
      feed.select(col("_change_type"), col(idCol), col(textCol)))
    try {
      fs.create(intentPath, true).close()
      // ONE combined rewrite (World.applyDelta): removals from the feed's
      // delete side and upserts from its insert side land in a single
      // read-modify-write per affected cell — an updated doc's surviving
      // (term, doc) postings simply replace themselves with their fresh
      // tf, and the cursor sentinel rides the same staged swap
      val deadIds = postings(pinned.where(col("_change_type") === "delete"))
        .select(col("pid").as("id"))
      val fresh = postings(pinned.where(col("_change_type") === "insert"))
      world.applyDelta(deadIds,
        fresh.unionByName(sentinel(v1, fresh.schema)))
      fs.delete(intentPath, false)
    } finally Pins.release(handle)
    v1
  }

  /** Docs containing `term`: a chunk-stripe-pruned scan of the posting grid
    * (the `Select::hint` promise on text), then the row-exact term check.
    * Returns (idCol, tf). */
  def docsFor(term: String): DataFrame = {
    require(term.nonEmpty, "docsFor: the empty term is the length stripe")
    val fp = termFp(term)
    world.select(1, Bounds.point(fp)).iter()
      .where(col("term") === lit(term) && col("pid") =!= SentinelPid)
      .select(col(idCol), col("tf"))
  }

  /** (doc, dl) rows — one pruned scan of the length stripe. */
  def docLengths: DataFrame =
    world.select(1, Bounds.point(termFp(LenTerm))).iter()
      .where(col("term") === lit(LenTerm) && col("pid") =!= SentinelPid)
      .select(col(idCol), col("tf").as("dl"))

  /** BM25-ranked retrieval THROUGH the index (Okapi, Lucene "+1" idf;
    * k1 = 1.2, b = 0.75 pre-folded like `t_bm25`): per query term one
    * pruned posting-stripe scan, corpus stats (N, avgdl) from the length
    * stripe as a broadcast scalar, per-term scores rounded once to integer
    * micro-units and BIGINT-summed, top-k via TakeOrdered with id
    * tie-break. The corpus is never scanned — cost is the query terms'
    * posting lists plus the length stripe. */
  def searchBm25(terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && terms.forall(_.nonEmpty), "searchBm25: terms")
    val lens = docLengths
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      sum("dl").cast("double").as("tot_dl"))
    val tf = terms.map(t => docsFor(t).withColumn("term", lit(t)))
      .reduce(_ unionByName _)
    // document frequency per query term: |terms| rows, collected once so it
    // (a) feeds the idf join as a local relation (no second stripe scan)
    // and (b) gives the EXACT posting volume the broadcast decision needs —
    // a stop-word query's tf side is posting-list-sized and UNBOUNDED at a
    // 10^9-doc corpus, so pinning the broadcast unconditionally (the r10
    // shape) could OOM the driver exactly when the index is at its design
    // scale. Under the cap the pin stays (the spec's shuffle-free assert);
    // over it the hint is dropped and AQE degrades to a shuffle join of
    // posting rows — the correct plan for a hot term.
    val sess = tf.sparkSession
    val dfRows = tf.groupBy("term").agg(count(lit(1)).as("df")).collect()
    val totalPostings = dfRows.map(_.getLong(1)).sum
    val dfc = sess.createDataFrame(
      java.util.Arrays.asList(dfRows: _*), // LocalRelation, plan-friendly
      new org.apache.spark.sql.types.StructType()
        .add("term", org.apache.spark.sql.types.StringType)
        .add("df", org.apache.spark.sql.types.LongType))
    val idf = log(lit(1.0) +
      ((col("n_docs") - col("df")) + lit(0.5)) / (col("df") + lit(0.5)))
    val frac = (col("tf") * lit(2.2)) /
      (col("tf") + (lit(0.3) + lit(0.9) *
        (col("dl").cast("double") / (col("tot_dl") / col("n_docs")))))
    // the tf side is posting-list-sized; `lens` is corpus-sized (one row
    // per document). The EXPLICIT broadcast pins the join direction: at
    // serving time on a 10^9-doc index the planner's estimate for `lens`
    // comes from the connector's post-prune stats (one stripe), so leaving
    // the choice to AQE risks a full shuffle of the length stripe.
    val postings = tf.join(broadcast(dfc), "term")
    val postingSide =
      if (totalPostings <= InvertedIndex.BroadcastPostingCap) broadcast(postings)
      else postings
    lens.join(postingSide, idCol)
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        round((idf * frac) * lit(1e6), 0).cast("long").as("s_u"))
      .groupBy(idCol)
      .agg(sum("s_u").as("score_u"), count(lit(1)).as("n_terms"))
      .orderBy(col("score_u").desc, col(idCol))
      .limit(k)
  }

  /** Live posting rows (sentinel excluded). */
  def df: DataFrame =
    world.df.where(col("pid") =!= SentinelPid).select(stateCols.map(col): _*)
}

object InvertedIndex {
  /** Max total posting rows [[InvertedIndex.searchBm25]] will pin as a
    * broadcast (~100 MB at ~24 B/posting — inside executor broadcast
    * budgets). Queries over hotter terms degrade to AQE's shuffle join
    * instead of an OOM. */
  val BroadcastPostingCap = 4000000L
}
