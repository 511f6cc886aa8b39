package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for LLM-data pipelines (north-star extension).
  *
  * Scale design (the point of every choice here):
  *   - exact dedup is a hash-groupBy — one shuffle on the 16-byte digest, no
  *     text comparison;
  *   - near-dup (MinHash/SimHash) NEVER does all-pairs: candidate pairs come
  *     from equality joins on band/block keys (shuffle on short keys), the
  *     expensive verify runs only on candidates. All signature computation is
  *     pure Catalyst expressions (codegen'd, per-row, shuffle-free).
  */
object Dedup {

  /** Exact duplicate groups by content hash; keeps the smallest id. */
  def exactGroups(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(md5(text).as("h"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n"))

  /** Rows surviving exact dedup (first id per content hash wins). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** Word n-gram shingles (distinct), the unit of Jaccard similarity. */
  def shingles(text: Column, n: Int = 3): Column = {
    val words = split(lower(trim(text)), "\\s+")
    array_distinct(filter(
      transform(sequence(lit(0), greatest(size(words) - n, lit(0))),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))),
      s => s =!= ""))
  }

  /** MinHash signature: for seed j, min over shingles of XXH64(shingle, j).
    * Backed by the native codegen'd [[graft.functions.MinHashSignature]]
    * expression — the HOF formulation (`transform(sequence, j ->
    * array_min(transform(sh, xxhash64)))`) is interpreted and gets inlined
    * per consumer by Catalyst (see the pipeline note in [[minhashLshPairs]]). */
  def minhashSignature(shingleArr: Column, numHashes: Int = 64): Column =
    graft.functions.MinHashSignature(shingleArr, numHashes)

  /** LSH band keys: hash of each band of `rowsPerBand` signature entries.
    * Docs sharing any band key are candidates.
    *
    * NOTE: referencing a signature *column* from this expression is a
    * performance trap — Catalyst inlines the column's defining expression
    * into every band (HOFs are interpreted, no common-subexpression
    * elimination), multiplying the minhash work ~bands x. Prefer the
    * posexplode + groupBy formulation in [[minhashLshPairs]], which
    * evaluates the signature exactly once per row. Kept for tests/small data.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"), xxhash64(concat_ws(",",
        slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))).cast("string")).as("bh")))

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    * Returns (id_a, id_b, jaccard_pct) with id_a < id_b, jaccard as an exact
    * integer percent (engine-neutral).
    *
    * Pipeline: shingle -> signature -> explode band keys -> self-equi-join on
    * (band, bandhash) -> distinct candidate pairs -> verify exact Jaccard on
    * the two shingle sets. The only shuffles are the band join and the
    * candidate dedup; both are on compact keys.
    *
    * Default 8 bands x 8 rows targets true near-duplicates (collision
    * probability ~99% at j=0.9, ~3% at j=0.5): on a self-similar corpus wide
    * bands (16x4) collide for most pairs and the verify stage degenerates to
    * all-pairs. Raise `bands` only if you need recall at low similarity.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSh = df.select(col(idCol).as("id"), shingles(col(textCol)).as("sh"))
      .where(size(col("sh")) > 0)
    // posexplode evaluates the signature exactly once per row (a generator's
    // input is single-eval), then banding is a plain groupBy — this sidesteps
    // Catalyst inlining the 64-hash expression into every band key, which
    // multiplies the signature work ~bands x (HOFs are interpreted, no CSE).
    val sigRows = withSh.select(col("id"),
      posexplode(minhashSignature(col("sh"), numHashes)).as(Seq("j", "h")))
    val banded = sigRows
      .groupBy(col("id"), expr(s"j div $rowsPerBand").as("band"))
      .agg(xxhash64(concat_ws(",",
        transform(array_sort(collect_list(struct(col("j"), col("h")))),
          p => p.getField("h").cast("string")))).as("bh"))
    val a = banded.select(col("id").as("id_a"), col("band"), col("bh"))
    val b = banded.select(col("id").as("id_b"), col("band"), col("bh"))
    // dedup candidates on the compact (id_a, id_b) key, THEN attach the
    // shingle arrays — shuffling array payloads through the distinct would
    // dominate the job at scale
    val cand = a.join(b, Seq("band", "bh")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
    cand
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("uni") > 0 && col("inter") * 100 >= col("uni") * (threshold * 100).toInt)
      .select(col("id_a"), col("id_b"),
        (col("inter") * 100L / col("uni")).cast("long").as("jaccard_pct"))
  }

  /** 64-bit SimHash over word unigrams: sign of the per-bit sum of +-1 votes
    * from each word's xxhash64 (seed 42). Backed by the native codegen'd
    * [[graft.functions.SimHash64]] — bit-identical to the interpreted HOF
    * formulation it replaced (same hash, same vote rule), ~60x cheaper
    * (one tight loop vs words x 64 interpreted ops per row). */
  def simhash(text: Column): Column =
    graft.functions.SimHash64(split(lower(trim(text)), "\\s+"))

  /** SimHash near-dup pairs with Hamming distance <= maxDist, found by
    * pigeonhole blocking: split the 64-bit hash into (maxDist+1) blocks —
    * any pair within distance shares at least one exact block. Equality join
    * on (blockIdx, blockValue), then exact bit_count verify. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val nBlocks = maxDist + 1
    val bits = 64 / nBlocks
    val withH = df.select(col(idCol).as("id"), simhash(col(textCol)).as("h"))
    // explode a constant sequence and derive the block value ABOVE the
    // Generate: the simhash is then evaluated once per input row, not once
    // per block (same Catalyst-inlining trap as in minhashLshPairs)
    val blocked = withH
      .select(col("id"), col("h"),
        explode(sequence(lit(0), lit(nBlocks - 1))).as("bi"))
      .select(col("id"), col("h"),
        struct(col("bi"),
          call_function("shiftright", col("h"), col("bi") * bits)
            .bitwiseAND(lit((1L << bits) - 1)).as("bv")).as("blk"))
    val a = blocked.select(col("id").as("id_a"), col("h").as("h_a"), col("blk"))
    val b = blocked.select(col("id").as("id_b"), col("h").as("h_b"), col("blk"))
    a.join(b, Seq("blk")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b").distinct()
      .withColumn("dist", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .where(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("hamming"))
  }

  /** Exact n-gram Jaccard via a **PPJoin-style** set-similarity join: prefix
    * filtering + asymmetric index prefix + positional filtering + length-ratio
    * pruning, then exact verification. All filters are true upper-bound
    * prunes, so the result set is IDENTICAL to the naive all-pairs join.
    *
    *   - prefix filter: J(A,B) >= t forces a shared token among each doc's
    *     `|X| - ceil(t|X|) + 1` globally-rarest shingles;
    *   - asymmetric prefix (PPJoin): orienting each pair so the probe side is
    *     the (sz, id)-larger doc, the smaller side only needs its
    *     `|X| - ceil(2t/(1+t)|X|) + 1`-length *index* prefix — the hot tail
    *     of the inverted index shrinks by ~1/3 at t=0.5;
    *   - positional filter (PPJoin): a pair's first shared prefix token at
    *     ranks (rk_p, rk_i) bounds the overlap by
    *     `min(sz_p - rk_p, sz_i - rk_i) + 1`; J >= t needs overlap >=
    *     t/(1+t)·(sz_p+sz_i), so pairs whose every shared-token row fails the
    *     bound are pruned *inside the join task*, before the candidate
    *     shuffle — this is what keeps a hot shingle (document frequency df)
    *     from shipping O(df²) candidate pairs downstream on self-similar
    *     corpora.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val withSh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0)
    val inv = withSh.select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("s"))
    val withDf = inv.join(inv.groupBy("s").agg(count(lit(1)).as("df_")), Seq("s"))
    // rank shingles per doc rarest-first (global (df, s) order)
    val w = Window.partitionBy("id").orderBy(col("df_"), col("s"))
    val ranked = withDf.withColumn("rk", row_number().over(w))
    val probe = ranked
      .where(col("rk") <= col("sz") - ceil(col("sz") * threshold) + 1)
      .select(col("s"), col("id").as("id_p"), col("sz").as("sz_p"), col("rk").as("rk_p"))
    // index prefix: ceil(2t/(1+t) * sz) is the PPJoin indexing bound
    val idxFrac = 2 * threshold / (1 + threshold)
    val index = ranked
      .where(col("rk") <= col("sz") - ceil(col("sz") * idxFrac) + 1)
      .select(col("s"), col("id").as("id_i"), col("sz").as("sz_i"), col("rk").as("rk_i"))
    val cand = probe.join(index, Seq("s"))
      .where(
        // orient: probe doc strictly (sz, id)-larger — each unordered pair
        // is generated exactly one way, satisfying PPJoin's |index| <= |probe|
        (col("sz_p") > col("sz_i") ||
          (col("sz_p") === col("sz_i") && col("id_p") > col("id_i"))) &&
        // length-ratio pruning: t·|probe| <= |index| (probe is larger)
        col("sz_i") >= col("sz_p") * threshold &&
        // positional filter (exact for the pair's first shared token)
        (least(col("sz_p") - col("rk_p"), col("sz_i") - col("rk_i")) + 1) * (1 + threshold) >=
          (col("sz_p") + col("sz_i")) * threshold)
      .select(least(col("id_p"), col("id_i")).as("id_a"),
        greatest(col("id_p"), col("id_i")).as("id_b"))
      .distinct()
    cand.join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("uni") > 0 && col("inter") * 100 >= col("uni") * (threshold * 100).toInt)
      .select(col("id_a"), col("id_b"),
        (col("inter") * 100L / col("uni")).cast("long").as("jaccard_pct"))
  }
}
