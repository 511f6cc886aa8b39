package graft.ops

import graft.functions.SignRandomProjection
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (north-star extension).
  *
  * Scale design: the brute-force path broadcasts the (small) query set and
  * streams the corpus once — no corpus self-shuffle; the LSH path buckets the
  * corpus by random-hyperplane signs so each query probes one bucket chain
  * (candidate set ~ corpus/2^bits per table). Bucket keys come from the
  * native codegen'd [[graft.functions.SignRandomProjection]] — hyperplanes
  * are driver-side constants, embeddings are read once per row — and every
  * verify/re-rank stage scores with the native [[graft.functions.CosineSim]]
  * kernel (sequential accumulation order, deterministic).
  */
object Similarity {

  /** Cosine similarity — native codegen'd kernel
    * ([[graft.functions.CosineSim]]): one pass computing dot and both norms,
    * bit-identical accumulation order to the HOF fold it replaced (which
    * cost ~200 interpreted ops per pair and dominated every verify/re-rank
    * stage at sf0.1). */
  def cosine(a: Column, b: Column): Column = graft.functions.CosineSim(a, b)

  /** Embedding dimensionality of the driver's `embeddings` table. */
  val DefaultDim = 64

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (self excluded). Deterministic rank: similarity rounded to 4dp,
    * ties by corpus id. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val t = corpus.select(col("vec_id").as("t_id"), col("embedding").as("t_emb"))
    val w = Window.partitionBy("q_id")
      .orderBy(round(col("sim"), 4).desc, col("t_id"))
    t.join(broadcast(q), col("t_id") =!= col("q_id"))
      .withColumn("sim", cosine(col("q_emb"), col("t_emb")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("t_id"), col("rank").cast("long").as("rank"))
  }

  /** One shortlist-candidate-vs-selected-candidate row for [[mmrTopK]]'s
    * greedy stage: `a` is the candidate (with its query relevance), `b` the
    * other shortlist member, `ps` their pairwise similarity in 1e-4 units. */
  final case class MmrPair(q_id: Long, a_id: Long, a_rel: Long,
      b_id: Long, ps: Long)

  /** Maximal-marginal-relevance top-k (r17) — the retrieval DIVERSIFIER:
    * plain cosine top-k returns k near-copies of the same passage (a
    * deduplicated corpus still has paraphrase clusters); RAG context
    * assembly wants k results that are each relevant AND mutually
    * non-redundant. Greedy MMR (Carbonell & Goldstein, SIGIR'98): seed with
    * the most relevant candidate, then repeatedly add
    * `argmax λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)`.
    *
    * Scale shape: stage 1 is the brute top-`shortlist` (queries broadcast,
    * corpus streamed once through the native cosine kernel — the
    * s_cosine_topk shape; an IVF/PQ shortlist drops in identically); the
    * greedy stage then touches ONLY shortlist×shortlist pairs per query —
    * a per-query `mapGroups` over ≤ shortlist² rows, never the corpus, so
    * its cost is independent of corpus size. Determinism: relevance and
    * pairwise similarities are ONCE-ROUNDED to 1e-4 integer units
    * (`cast(round(sim * 10000) as long)` — the repo's micro-unit
    * discipline), λ carried as milli-units, every argmax tie-broken by
    * ascending id — so the greedy trajectory is integer-exact and the
    * DuckDB oracle can restate it stage by stage. */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      shortlist: Int = 8, lambdaMilli: Int = 500): DataFrame = {
    require(k >= 1 && shortlist >= k, "need 1 <= k <= shortlist")
    require(lambdaMilli >= 0 && lambdaMilli <= 1000, "lambda is milli-units")
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val t = corpus.select(col("vec_id").as("t_id"), col("embedding").as("t_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("rel").desc, col("t_id"))
    // PIN the shortlist (Pins contract — consumer releases): it fans out to
    // three plan branches (pair sides a/b + the self rows), and without the
    // pin each branch re-derives the subtree — three corpus scans where the
    // operator's whole point is that only stage 1 ever touches the corpus
    val short = Pins.pin(t.join(broadcast(q), col("t_id") =!= col("q_id"))
      .withColumn("rel",
        round(cosine(col("q_emb"), col("t_emb")) * 10000).cast("long"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= shortlist)
      .select(col("q_id"), col("t_id"), col("rel"), col("t_emb")))
    val a = short.select(col("q_id"), col("t_id").as("a_id"),
      col("rel").as("a_rel"), col("t_emb").as("a_emb"))
    val b = short.select(col("q_id"), col("t_id").as("b_id"),
      col("t_emb").as("b_emb"))
    // self rows carry relevance for single-candidate shortlists (no pair
    // rows exist there); the greedy stage never looks up a self similarity.
    // b is explicitly broadcast: it is ≤ queries × shortlist rows by
    // construction, but the pinned RDD carries no stats for the planner
    val pairs = a.join(broadcast(b), Seq("q_id")).where(col("a_id") =!= col("b_id"))
      .withColumn("ps",
        round(cosine(col("a_emb"), col("b_emb")) * 10000).cast("long"))
      .select(col("q_id"), col("a_id"), col("a_rel"), col("b_id"), col("ps"))
      .unionAll(short.select(col("q_id"), col("t_id").as("a_id"),
        col("rel").as("a_rel"), col("t_id").as("b_id"),
        lit(0L).as("ps")))
      .as[MmrPair]
    pairs.groupByKey(_.q_id).flatMapGroups { (qid, it) =>
      val rows = it.toArray
      val rel = scala.collection.mutable.Map.empty[Long, Long]
      val sim = scala.collection.mutable.Map.empty[(Long, Long), Long]
      rows.foreach { r => rel(r.a_id) = r.a_rel; sim((r.a_id, r.b_id)) = r.ps }
      val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
      // seed: pure relevance (no selected set yet), tie -> smaller id
      if (rel.nonEmpty) {
        selected += rel.toSeq.minBy { case (id, r) => (-r, id) }._1
        while (selected.size < math.min(k, rel.size)) {
          val cand = rel.keysIterator.filterNot(selected.contains).map { c =>
            val maxSim = selected.iterator.map(s => sim((c, s))).max
            val score = lambdaMilli.toLong * rel(c) -
              (1000L - lambdaMilli) * maxSim
            (c, score)
          }
          selected += cand.minBy { case (id, sc) => (-sc, id) }._1
        }
      }
      selected.iterator.zipWithIndex.map { case (id, i) =>
        (qid, id, (i + 1).toLong)
      }
    }.toDF("q_id", "t_id", "mmr_rank")
  }

  /** INT8 scalar quantization (SQ8, r16) — the ANN family's STORAGE axis
    * next to PQ's memory axis: each vector compresses 4x to per-dimension
    * byte codes under a per-vector affine map (mn + code · scale, scale =
    * (mx − mn)/255 — the faiss `SQ8` / standard uniform quantizer). At
    * 100 TB of embeddings the raw float corpus is the storage bill; SQ8
    * cuts it 4x with bounded per-dimension error (≤ scale/2), and decode
    * is a per-row affine HOF — shuffle-free, applied where the codes live.
    *
    * ENGINE-NEUTRAL arithmetic, so the codes themselves carry a full
    * DuckDB oracle: float→double widening is exact, min/max over the
    * vector is exact, `(x − mn) / scale` is the identically-parenthesized
    * IEEE sequence on both engines, and round-half-up on a nonnegative
    * double equals DuckDB's round-half-away (the q_corr_regr discipline).
    * A constant vector (scale 0) codes to all zeros and decodes to mn. */
  def sq8Encode(df: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val mn = array_min(col(vecCol)).cast("double")
    val mx = array_max(col(vecCol)).cast("double")
    df.withColumn("sq_min", mn)
      .withColumn("sq_scale", (mx - mn) / lit(255.0))
      .withColumn("sq_codes",
        when(col("sq_scale") === 0.0,
          transform(col(vecCol), _ => lit(0)))
          .otherwise(transform(col(vecCol), x =>
            round((x.cast("double") - col("sq_min")) / col("sq_scale"), 0)
              .cast("int"))))
  }

  /** Inverse of [[sq8Encode]]: reconstruct `array<double>` vectors from
    * codes + the per-vector affine params. */
  def sq8Decode(codes: Column, mn: Column, scale: Column): Column =
    transform(codes, c => mn + c.cast("double") * scale)

  /** Brute-force cosine top-k over the SQ8-RECONSTRUCTED corpus — the
    * compressed-storage serving path: queries stay full-precision, corpus
    * vectors exist only as codes. Same deterministic ranking contract as
    * [[bruteTopK]] (sim rounded to 4dp, ties by corpus id). */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val decoded = sq8Encode(corpus)
      .select(col("vec_id"),
        sq8Decode(col("sq_codes"), col("sq_min"), col("sq_scale"))
          .as("embedding"))
    bruteTopK(decoded, queries, k)
  }

  /** (tbl, key) bucket rows for each input row: one native-projection pass,
    * then posexplode (generator input is single-eval — the same
    * Catalyst-inlining guard as the MinHash pipeline). */
  private def bucketed(df: DataFrame, idAs: String, tables: Int, bits: Int,
      dim: Int, seed: Long): DataFrame =
    df.select(col("vec_id").as(idAs),
      posexplode(SignRandomProjection(col("embedding"), tables, bits, dim, seed))
        .as(Seq("tbl", "key")))

  /** Bucketed ANN: `tables` independent sign-LSH keys; candidates = corpus
    * rows sharing a (table, key) bucket with the query; exact cosine re-rank.
    * Recall grows with tables; candidate count shrinks with bits. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 8, tables: Int = 4, dim: Int = DefaultDim,
      seed: Long = 42L): DataFrame = {
    val qk = bucketed(queries, "q_id", tables, bits, dim, seed)
    val tk = bucketed(corpus, "t_id", tables, bits, dim, seed)
    // candidate ids only through the join + distinct; embeddings attach after
    val cand = tk.join(broadcast(qk), Seq("tbl", "key"))
      .where(col("t_id") =!= col("q_id"))
      .select("q_id", "t_id").distinct()
      .join(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")), Seq("q_id"))
      .join(corpus.select(col("vec_id").as("t_id"), col("embedding").as("t_emb")), Seq("t_id"))
    val w = Window.partitionBy("q_id")
      .orderBy(round(col("sim"), 4).desc, col("t_id"))
    cand.withColumn("sim", cosine(col("q_emb"), col("t_emb")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("t_id"), col("rank").cast("long").as("rank"))
  }

  /** Deterministic, UNBIASED trainer sample: the `cap` rows with the
    * smallest md5("annsample:" + vec_id) — as reproducible as
    * orderBy(id).limit, but MEMBERSHIP is uncorrelated with insertion
    * order, so a corpus whose ids track ingestion time/domain doesn't bias
    * the codebooks toward its head (the repo's established md5-bucket
    * trick). The chosen rows then come back ordered by vec_id: the Lloyd
    * evenly-spaced init indexes into that id order, which is what the
    * planted k-means oracle's one-seed-per-group argument and the
    * driver/distributed trainer parity both pin. */
  private def trainerSample(corpus: DataFrame, cap: Int): DataFrame =
    corpus
      .withColumn("_sk",
        md5(concat(lit("annsample:"), col("vec_id").cast("string")).cast("binary")))
      .orderBy(col("_sk"), col("vec_id"))
      .limit(cap)
      .orderBy(col("vec_id"))

  /** One bounded driver-side collect of [[trainerSample]] — the shared
    * input of BOTH trainers below. Callers that train a coarse quantizer
    * AND PQ codebooks over the same corpus (PqVectorIndex.initialize,
    * ivfPqTopK) collect it ONCE and pass it to the `OnSample` variants:
    * the two trainers' samples are identical by construction, and at scale
    * each extra sample is a full corpus TakeOrdered pass (r17, guide §2.4
    * — remove redundant passes outright). */
  private[ops] def collectTrainerSample(corpus: DataFrame,
      sampleCap: Int = 4096): Array[Array[Double]] =
    trainerSample(corpus, sampleCap)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))

  /** Train IVF coarse-quantizer centroids driver-side: deterministic
    * md5-membership, id-ordered sample ([[trainerSample]]), seeded
    * evenly-spaced init, a few Lloyd iterations. The collect is bounded
    * (sampleCap vectors ~1 MB) — this is index BUILD, not a per-query step;
    * at cluster scale the same loop runs as [[trainCentroidsDistributed]]
    * with the identical result contract. Returns row-major nlist*dim. */
  def trainCentroids(corpus: DataFrame, nlist: Int, dim: Int,
      iters: Int = 5, sampleCap: Int = 4096): (Array[Double], Int) =
    trainCentroidsOnSample(collectTrainerSample(corpus, sampleCap),
      nlist, dim, iters)

  /** [[trainCentroids]] over an already-collected sample (bit-identical
    * results — the Lloyd loop is untouched). */
  private[ops] def trainCentroidsOnSample(sample: Array[Array[Double]],
      nlist: Int, dim: Int, iters: Int = 5): (Array[Double], Int) = {
    require(sample.nonEmpty, "cannot train IVF centroids on an empty corpus")
    val k = math.min(nlist, sample.length)
    val step = sample.length / k
    var cents = Array.tabulate(k)(c => sample(c * step).take(dim).padTo(dim, 0.0))
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d2 = 0.0; var i = 0
          while (i < dim && i < v.length) { val d = v(i) - cents(c)(i); d2 += d * d; i += 1 }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim && i < v.length) { sums(best)(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c) // empty list keeps its centroid
        else sums(c).map(_ / counts(c))
      }
    }
    (cents.flatten, k)
  }

  /** Distributed IVF trainer — the same contract as [[trainCentroids]]
    * (sample = [[trainerSample]]'s md5-membership rows in id order, init =
    * evenly-spaced rows of that ordered sample, same Lloyd assignment rule)
    * with the per-iteration
    * summation running as `treeAggregate` over the executors instead of a
    * driver loop. The driver only ever holds k centroids (nlist × dim
    * doubles) and the k init vectors — never the sample — so `sampleCap`
    * can grow to millions of vectors on a cluster where the driver-side
    * trainer would OOM collecting them.
    *
    * Floating-point caveat: partial sums combine in partition order, not
    * row order, so centroids can differ from [[trainCentroids]] in the last
    * ulps; SimilaritySpec pins both trainers to 1e-9 agreement on a shared
    * corpus. Assignment ties break identically (first strictly-smaller
    * distance wins).
    */
  def trainCentroidsDistributed(corpus: DataFrame, nlist: Int, dim: Int,
      iters: Int = 5, sampleCap: Int = 4096): (Array[Double], Int) = {
    val sc = corpus.sparkSession.sparkContext
    // deterministic sample + positional index: sortBy fixes the same
    // vec_id total order as the driver-side trainer regardless of how the
    // sample's orderBy/limit partitioned the rows
    val vecs = trainerSample(corpus, sampleCap)
      .select(col("vec_id"), col("embedding"))
      .rdd.map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
      .sortBy(_._1).map(_._2).zipWithIndex()
      .map { case (v, i) => (i, v) }
      .cache()
    val n = vecs.count()
    require(n > 0, "cannot train IVF centroids on an empty corpus")
    val k = math.min(nlist.toLong, n).toInt
    val step = n / k
    val initPos = (0 until k).map(c => c * step).toSet
    var cents: Array[Array[Double]] = vecs
      .filter { case (i, _) => initPos(i) }
      .collect().sortBy(_._1)
      .map(_._2.take(dim).padTo(dim, 0.0))
    for (_ <- 0 until iters) {
      val bc = sc.broadcast(cents)
      val (sums, counts) = vecs.values.treeAggregate(
        (Array.fill(k)(new Array[Double](dim)), new Array[Long](k)))(
        seqOp = { case ((s, c), v) =>
          val cs = bc.value
          var best = 0; var bestD = Double.MaxValue
          var ci = 0
          while (ci < k) {
            var d2 = 0.0; var i = 0
            while (i < dim && i < v.length) { val d = v(i) - cs(ci)(i); d2 += d * d; i += 1 }
            if (d2 < bestD) { bestD = d2; best = ci }
            ci += 1
          }
          c(best) += 1
          var i = 0
          while (i < dim && i < v.length) { s(best)(i) += v(i); i += 1 }
          (s, c)
        },
        combOp = { case ((s1, c1), (s2, c2)) =>
          var ci = 0
          while (ci < k) {
            c1(ci) += c2(ci)
            var i = 0
            while (i < dim) { s1(ci)(i) += s2(ci)(i); i += 1 }
            ci += 1
          }
          (s1, c1)
        })
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c))
      }
      bc.destroy()
    }
    vecs.unpersist(blocking = false)
    (cents.flatten, k)
  }

  /** K-means clustering over an embedding column, exposed as a first-class
    * corpus operation — domain discovery, SemDeDup-style grouping, and
    * mixture balancing all start with "cluster the embeddings". Training is
    * the IVF coarse-quantizer's Lloyd loop (driver-bounded sample, or the
    * treeAggregate form when the sample would not fit the driver);
    * assignment is one codegen'd [[graft.functions.NearestCentroids]] pass
    * over the full corpus — the model ships in-expression, each row labels
    * itself, NO shuffle. Returns (vec_id, cluster, cluster_min_id):
    * `cluster` is the centroid index, `cluster_min_id` the smallest member
    * id — an init-numbering-independent label (the k-row label table
    * broadcasts). */
  def kmeansAssign(corpus: DataFrame, k: Int, dim: Int = DefaultDim,
      iters: Int = 5, sampleCap: Int = 4096,
      distributedTraining: Boolean = false): DataFrame = {
    val (cents, actual) =
      if (distributedTraining)
        trainCentroidsDistributed(corpus, k, dim, iters, sampleCap)
      else trainCentroids(corpus, k, dim, iters, sampleCap)
    val assigned = corpus.select(col("vec_id"),
      element_at(
        graft.functions.NearestCentroids(col("embedding"), cents, actual, 1), 1)
        .cast("long").as("cluster"))
    val labels = assigned.groupBy("cluster")
      .agg(min(col("vec_id")).as("cluster_min_id"))
    assigned.join(labels, Seq("cluster")) // k-row build side: broadcasts
      .select(col("vec_id"), col("cluster"), col("cluster_min_id"))
  }

  /** IVF ANN: corpus vectors are inverted-listed under their nearest
    * centroid; each query probes its `nprobe` nearest lists; exact cosine
    * re-rank. The scale path FAISS-style: candidate count ~ nprobe/nlist of
    * the corpus, centroid assignment is one native codegen'd pass
    * ([[graft.functions.NearestCentroids]]), and the shuffle key is a small
    * int — embeddings only travel for actual candidates.
    * `distributedTraining` switches index build to
    * [[trainCentroidsDistributed]] for corpora whose sample would not fit
    * the driver. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 64, nprobe: Int = 8, dim: Int = DefaultDim,
      distributedTraining: Boolean = false): DataFrame = {
    val (cents, actualLists) =
      if (distributedTraining) trainCentroidsDistributed(corpus, nlist, dim)
      else trainCentroids(corpus, nlist, dim)
    val probes = math.min(nprobe, actualLists)
    val t = corpus.select(col("vec_id").as("t_id"), col("embedding").as("t_emb"),
      element_at(graft.functions.NearestCentroids(col("embedding"), cents, actualLists, 1), 1)
        .as("cid"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      explode(graft.functions.NearestCentroids(col("embedding"), cents, actualLists, probes))
        .as("cid"))
    // corpus side has exactly one list per vector -> no duplicate pairs
    val cand = t.join(broadcast(q), Seq("cid"))
      .where(col("t_id") =!= col("q_id"))
    val w = Window.partitionBy("q_id")
      .orderBy(round(col("sim"), 4).desc, col("t_id"))
    cand.withColumn("sim", cosine(col("q_emb"), col("t_emb")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("t_id"), col("rank").cast("long").as("rank"))
  }

  /** Embedding near-duplicate pairs: cosine above threshold. Candidates from
    * sign-LSH buckets (no all-pairs); exact cosine verify. */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
      bits: Int = 12, tables: Int = 8, dim: Int = DefaultDim,
      seed: Long = 42L): DataFrame = {
    // 12 bits x 8 tables: at 50k vectors, 6-bit buckets held ~800 vectors
    // each and the candidate join fanned out ~100M pairs; 4096 buckets cut
    // that ~60x while 8 tables keep recall ~0.93 at cos 0.95
    val keyed = bucketed(df, "id", tables, bits, dim, seed)
    val vecs = df.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val a = keyed.select(col("id").as("id_a"), col("tbl"), col("key"))
    val b = keyed.select(col("id").as("id_b"), col("tbl"), col("key"))
    // candidate dedup on id pairs only; embeddings join back afterwards
    a.join(b, Seq("tbl", "key")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .join(vecs.select(col("id").as("id_a"), col("emb").as("emb_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("emb").as("emb_b")), Seq("id_b"))
      .withColumn("sim", cosine(col("emb_a"), col("emb_b")))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
  }

  /** Lloyd loop shared by the PQ codebook trainer: identical contract to
    * [[trainCentroids]] (evenly-spaced init over the ordered sample, squared
    * L2, first-strictly-smaller-distance tie-break, empty cluster keeps its
    * centroid) but over a pre-collected sample — PQ trains `m` codebooks
    * from ONE sample collect, slicing subvectors per subspace. */
  private def lloyd(sample: Array[Array[Double]], k: Int, dim: Int,
      iters: Int): Array[Array[Double]] = {
    val step = sample.length / k
    var cents = Array.tabulate(k)(c => sample(c * step).take(dim).padTo(dim, 0.0))
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d2 = 0.0; var i = 0
          while (i < dim && i < v.length) { val d = v(i) - cents(c)(i); d2 += d * d; i += 1 }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim && i < v.length) { sums(best)(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c))
      }
    }
    cents
  }

  /** Product-quantization codebooks: the embedding splits into `m`
    * contiguous subspaces of `dim/m` components; each subspace gets its own
    * `ksub`-codeword codebook trained by the IVF trainer's exact Lloyd
    * contract on the sample's subvector slices (one bounded sample collect
    * serves all `m` trainings — index BUILD, not a per-query step). Returns
    * (codebooks flat row-major `m*ksub*subDim`, actual ksub) — actual ksub
    * < requested only when the sample is smaller than `ksub`. */
  def trainPqCodebooks(corpus: DataFrame, m: Int, ksub: Int, dim: Int,
      iters: Int = 5, sampleCap: Int = 4096): (Array[Double], Int) =
    trainPqCodebooksOnSample(collectTrainerSample(corpus, sampleCap),
      m, ksub, dim, iters)

  /** [[trainPqCodebooks]] over an already-collected sample (bit-identical
    * results — the per-subspace Lloyd loop is untouched). */
  private[ops] def trainPqCodebooksOnSample(sample: Array[Array[Double]],
      m: Int, ksub: Int, dim: Int, iters: Int = 5): (Array[Double], Int) = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val subDim = dim / m
    require(sample.nonEmpty, "cannot train PQ codebooks on an empty corpus")
    val k = math.min(ksub, sample.length)
    val flat = (0 until m).flatMap { s =>
      val sub = sample.map(v => v.slice(s * subDim, (s + 1) * subDim)
        .padTo(subDim, 0.0))
      lloyd(sub, k, subDim, iters).toSeq.flatten
    }.toArray
    (flat, k)
  }

  /** Per-row PQ codes: `m` codeword indices, one native
    * [[graft.functions.NearestCentroids]] pass per subspace over the
    * subvector slice (the codebook ships in-expression; the scan stays
    * shuffle-free). At 100 TB this is the compression step that makes the
    * index memory-resident: 64 float components become `m` small ints. */
  private def pqCodes(df: DataFrame, idAs: String, cb: Array[Double],
      m: Int, ksub: Int, subDim: Int): DataFrame = {
    val codes = (0 until m).map { s =>
      val sub = cb.slice(s * ksub * subDim, (s + 1) * ksub * subDim)
      element_at(graft.functions.NearestCentroids(
        slice(col("embedding"), s * subDim + 1, subDim), sub, ksub, 1), 1)
    }
    df.select(col("vec_id").as(idAs), array(codes: _*).as("codes"))
  }

  /** PQ ANN (asymmetric-distance): the memory-bounded scale path — corpus
    * vectors live in the index as `m` codeword indices (`m*ksub*subDim`
    * codebook doubles + `m` ints per vector instead of `dim` floats), each
    * query ADC-scans the codes (approximate distance = sum over subspaces of
    * ||q_s − codeword(code_s)||², computed by HOFs against the literal
    * codebook — no UDF, no shuffle beyond the broadcast), keeps a
    * `shortlist` of best codes, and exact-cosine re-ranks only the
    * shortlist against the full vectors.
    *
    * The ADC floor property the planted oracle leans on: an exact copy of
    * the query achieves `sum_s min_c ||q_s − c||²` — the minimum the ADC
    * metric can assign to ANY code — so a planted duplicate can never miss
    * the shortlist. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, ksub: Int = 16, dim: Int = DefaultDim,
      shortlist: Int = 64): DataFrame = {
    val subDim = dim / m
    val (cb, actualK) = trainPqCodebooks(corpus, m, ksub, dim)
    val codes = pqCodes(corpus, "t_id", cb, m, actualK, subDim)
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // ADC over the codes: per subspace, squared L2 between the query's
    // subvector slice and the codeword the corpus row stored for it — one
    // native codegen'd pass ([[graft.functions.PqAdc]]), bit-identical to
    // the aggregate/zip_with HOF chain it replaced (PqAdcSpec pins it)
    val adc = graft.functions.PqAdc(col("q_emb"), col("codes"), cb, m, actualK)
    val wAdc = Window.partitionBy("q_id")
      .orderBy(col("adc").asc, col("t_id"))
    val cand = codes.join(broadcast(q), col("t_id") =!= col("q_id"))
      .withColumn("adc", adc)
      .withColumn("arank", row_number().over(wAdc))
      .where(col("arank") <= shortlist)
      .select("q_id", "t_id")
      .join(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")), Seq("q_id"))
      .join(corpus.select(col("vec_id").as("t_id"), col("embedding").as("t_emb")), Seq("t_id"))
    val w = Window.partitionBy("q_id")
      .orderBy(round(col("sim"), 4).desc, col("t_id"))
    cand.withColumn("sim", cosine(col("q_emb"), col("t_emb")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("t_id"), col("rank").cast("long").as("rank"))
  }

  /** IVFADC — the two ANN index structures composed, the billion-vector
    * architecture: the coarse quantizer restricts each query to its
    * `nprobe` inverted lists (candidate count ~ nprobe/nlist of the
    * corpus), and WITHIN the candidates the ADC code scan ranks without
    * touching full vectors (each candidate is `m` codeword ints, not `dim`
    * floats). Exact cosine re-ranks only the final shortlist. Candidate
    * pruning bounds the scan; code compression bounds the memory — at
    * 100 TB neither alone suffices.
    *
    * The planted-oracle argument composes both halves': an exact copy is
    * assigned the query's own first-probe cell (same coarse assignment
    * kernel, ties identical), so the IVF stage cannot drop it, and inside
    * the cell it holds the ADC floor, so the code scan cannot either. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 64, nprobe: Int = 8, m: Int = 8, ksub: Int = 16,
      dim: Int = DefaultDim, shortlist: Int = 64): DataFrame = {
    val subDim = dim / m
    // ONE sample pass feeds both trainers (identical sample by construction)
    val sample = collectTrainerSample(corpus)
    val (coarse, actualLists) = trainCentroidsOnSample(sample, nlist, dim)
    val (cb, actualK) = trainPqCodebooksOnSample(sample, m, ksub, dim)
    val probes = math.min(nprobe, actualLists)
    val codes = pqCodes(corpus, "t_id", cb, m, actualK, subDim)
    val tl = corpus.select(col("vec_id").as("t_id"),
      element_at(graft.functions.NearestCentroids(col("embedding"), coarse, actualLists, 1), 1)
        .as("cid"))
      .join(codes, Seq("t_id"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      explode(graft.functions.NearestCentroids(col("embedding"), coarse, actualLists, probes))
        .as("cid"))
    val adc = graft.functions.PqAdc(col("q_emb"), col("codes"), cb, m, actualK)
    val wAdc = Window.partitionBy("q_id")
      .orderBy(col("adc").asc, col("t_id"))
    // corpus side has one list per vector -> no duplicate (q,t) pairs
    val cand = tl.join(broadcast(q), Seq("cid"))
      .where(col("t_id") =!= col("q_id"))
      .withColumn("adc", adc)
      .withColumn("arank", row_number().over(wAdc))
      .where(col("arank") <= shortlist)
      .select("q_id", "t_id")
      .join(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")), Seq("q_id"))
      .join(corpus.select(col("vec_id").as("t_id"), col("embedding").as("t_emb")), Seq("t_id"))
    val w = Window.partitionBy("q_id")
      .orderBy(round(col("sim"), 4).desc, col("t_id"))
    cand.withColumn("sim", cosine(col("q_emb"), col("t_emb")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("t_id"), col("rank").cast("long").as("rank"))
  }
}
