package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class SimilaritySpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("cosine: orthogonal 0, identical 1, opposite -1") {
    import spark.implicits._
    val d = emb((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 0f)), (4L, Seq(-2f, 0f)))
    val sims = d.as("a").crossJoin(d.as("b"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        round(Similarity.cosine(col("a.embedding"), col("b.embedding")), 6).as("s"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(sims((1L, 2L)) == 0.0)
    assert(sims((1L, 3L)) == 1.0)
    assert(sims((1L, 4L)) == -1.0)
  }

  test("bruteTopK ranks by cosine desc with id tie-break, excludes self") {
    val d = emb(
      (0L, Seq(1f, 0f, 0f)),   // query
      (1L, Seq(0.9f, 0.1f, 0f)),
      (2L, Seq(0f, 1f, 0f)),
      (3L, Seq(1f, 0f, 0f)),   // identical to query
      (4L, Seq(0.5f, 0.5f, 0f)))
    val got = Similarity.bruteTopK(d, d.where(col("vec_id") === 0), k = 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toList == List((3L, 1L), (1L, 2L), (4L, 3L)))
  }

  test("lshTopK top-1 finds an exact duplicate vector (same bucket in every table)") {
    val base = Seq.tabulate(16)(i => math.sin(i * 1.7).toFloat)
    val d = emb(
      (0L, base), (1L, base), // exact dup of query
      (2L, base.map(x => -x)),
      (3L, Seq.tabulate(16)(i => math.cos(i * 3.1).toFloat)))
    val got = Similarity.lshTopK(d, d.where(col("vec_id") === 0), k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toList == List((0L, 1L, 1L)))
  }

  test("ivfTopK top-1 finds an exact duplicate vector (same inverted list)") {
    val base = Seq.tabulate(16)(i => math.sin(i * 1.7).toFloat)
    val d = emb(
      (0L, base), (1L, base), // exact dup of query
      (2L, base.map(x => -x)),
      (3L, Seq.tabulate(16)(i => math.cos(i * 3.1).toFloat)))
    // 4 vectors -> 4 lists, nprobe clamps to 4: probes everything, so the
    // dup MUST surface regardless of centroid placement
    val got = Similarity.ivfTopK(d, d.where(col("vec_id") === 0), k = 1, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toList == List((0L, 1L, 1L)))
  }

  test("ivfTopK narrows candidates: nprobe=1 probes one list per query") {
    import spark.implicits._
    // two well-separated clusters; query sits in cluster A — with nprobe=1
    // only cluster A's list is probed, and the in-cluster neighbor wins
    val clusterA = (0L until 8L).map(i => (i, Seq.tabulate(8)(j => (10f + i * 0.01f) * (if (j == 0) 1f else 0f))))
    val clusterB = (8L until 16L).map(i => (i, Seq.tabulate(8)(j => (10f + i * 0.01f) * (if (j == 1) 1f else 0f))))
    val d = (clusterA ++ clusterB).toDF("vec_id", "embedding")
    val got = Similarity.ivfTopK(d, d.where(col("vec_id") === 0), k = 3,
      nlist = 2, nprobe = 1, dim = 8)
      .collect().map(_.getLong(1)).toSet
    assert(got.nonEmpty && got.forall(_ < 8L), s"candidates must come from cluster A only: $got")
  }

  test("distributed IVF trainer matches the driver-side trainer (shared contract)") {
    import spark.implicits._
    val d = (0L until 64L)
      .map(i => (i, Seq.tabulate(8)(j => math.sin(i * 0.37 + j).toFloat)))
      .toDF("vec_id", "embedding")
      .repartition(4) // force multi-partition aggregation
    val (a, ka) = Similarity.trainCentroids(d, nlist = 8, dim = 8)
    val (b, kb) = Similarity.trainCentroidsDistributed(d, nlist = 8, dim = 8)
    assert(ka == kb && a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9, s"centroid drift: $x vs $y") }
    // and the end-to-end IVF query agrees through either trainer
    val viaDriver = Similarity.ivfTopK(d, d.where(col("vec_id") === 0), k = 3,
      nlist = 8, dim = 8).collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val viaDist = Similarity.ivfTopK(d, d.where(col("vec_id") === 0), k = 3,
      nlist = 8, dim = 8, distributedTraining = true)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(viaDriver == viaDist)
  }

  test("kmeansAssign: clustered corpus recovers its generating groups; trainers agree") {
    import spark.implicits._
    // 4 well-separated centers x 30 jittered points: the generating group
    // IS the unique optimal clustering, so assignment must recover it
    val rnd = new scala.util.Random(77L)
    val centers = Vector.tabulate(4)(c => Array.tabulate(8)(j =>
      (if (j % 4 == c) 5.0f else 0.0f) + 0.01f * rnd.nextGaussian().toFloat))
    val rows = (0 until 120).map { i =>
      val c = centers(i / 30) // ids grouped: evenly-spaced init hits each group
      (i.toLong, c.toSeq.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }
    val corpus = rows.toDF("vec_id", "embedding").repartition(4)
    val got = Similarity.kmeansAssign(corpus, k = 4, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got.size == 120)
    (0 until 120).foreach { i =>
      assert(got(i.toLong) == (i / 30) * 30L,
        s"vec $i labeled ${got(i.toLong)}, expected ${(i / 30) * 30}")
    }
    // distributed training produces the identical labeling
    val dist = Similarity.kmeansAssign(corpus, k = 4, dim = 8,
      distributedTraining = true)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(dist == got, "treeAggregate trainer must label identically")
    // no shuffle in the assignment pass: the plan's only exchange feeds the
    // k-row label aggregation/join, never the corpus-side scan
    val plan = Similarity.kmeansAssign(corpus, k = 4, dim = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop") ||
      !plan.contains("SortMergeJoin"), s"label join must broadcast:\n$plan")
  }

  test("measured recall@10 on a clustered corpus: IVF and LSH against brute-force truth") {
    import spark.implicits._
    // deterministic clustered corpus (8 centers x 40 jittered points, dim 16):
    // ANN recall is only meaningful when neighbors exist; uniform-random
    // vectors have none (max pairwise cosine in the synthetic embeddings
    // table is ~0.5, which is why s_embed_neardup's empty result is correct)
    val rnd = new scala.util.Random(1234L)
    val centers = Vector.fill(8)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val rows = (0 until 320).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.toSeq.map(x => x + 0.15f * rnd.nextGaussian().toFloat))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.where(col("vec_id") < 10)
    def topSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("q_id", "t_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val truth = topSet(Similarity.bruteTopK(corpus, queries, k = 10))
    val ivf = topSet(Similarity.ivfTopK(corpus, queries, k = 10, nlist = 16, nprobe = 4, dim = 16))
    val lsh = topSet(Similarity.lshTopK(corpus, queries, k = 10, bits = 6, tables = 8, dim = 16))
    val pq = topSet(Similarity.pqTopK(corpus, queries, k = 10, m = 4, ksub = 16, dim = 16))
    val ivfpq = topSet(Similarity.ivfPqTopK(corpus, queries, k = 10,
      nlist = 16, nprobe = 4, m = 4, ksub = 16, dim = 16))
    def recall(got: Map[Long, Set[Long]]): Double =
      truth.map { case (q, t) => got.getOrElse(q, Set.empty).count(t).toDouble / t.size }
        .sum / truth.size
    val (rIvf, rLsh, rPq) = (recall(ivf), recall(lsh), recall(pq))
    val rIvfPq = recall(ivfpq)
    // deterministic inputs -> these are fixed numbers; the floors assert the
    // index structures actually find the clusters, not just themselves
    assert(rIvf >= 0.9, s"IVF recall@10 = $rIvf")
    assert(rLsh >= 0.6, s"LSH recall@10 = $rLsh")
    assert(rPq >= 0.8, s"PQ recall@10 = $rPq")
    assert(rIvfPq >= 0.7, s"IVFADC recall@10 = $rIvfPq")
  }

  test("pqTopK: ADC floor pins a planted duplicate at rank 1; codes stay bounded") {
    import spark.implicits._
    val rnd = new scala.util.Random(77L)
    val rows = (0 until 120).map(i => (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    val base = rows.toDF("vec_id", "embedding")
    val planted = base.where(col("vec_id") < 5)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val corpus = base.unionAll(planted)
    // an exact copy achieves sum_s min_c ||q_s - c||^2 — the minimum the
    // ADC metric can assign to ANY code — so it cannot miss the shortlist,
    // and the exact re-rank pins it at cos 1.0
    val got = Similarity.pqTopK(corpus, base.where(col("vec_id") < 5), k = 1,
        m = 4, ksub = 8, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == (0L until 5L).map(q => q -> (q + 1000L)).toMap, s"got $got")
    // codebook training caps at the sample size; codes index inside it
    val (cb, actualK) = Similarity.trainPqCodebooks(corpus, m = 4, ksub = 8, dim = 16)
    assert(cb.length == 4 * actualK * 4 && actualK == 8)
  }

  test("cosineNearDupPairs finds duplicate pair and nothing else") {
    val a = Seq.tabulate(16)(i => math.sin(i * 0.9).toFloat)
    val d = emb((1L, a), (2L, a.map(x => x * 2f)), // same direction -> cos 1
      (3L, Seq.tabulate(16)(i => math.cos(i * 2.3).toFloat)))
    val got = Similarity.cosineNearDupPairs(d, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("sq8: codes in [0,255], per-dim error <= scale/2, constant vectors decode to mn") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, Array(0.1f, -0.5f, 0.9f, 0.3f)),
      (2L, Array(2.0f, 2.0f, 2.0f, 2.0f)), // constant -> scale 0
      (3L, Array(-1.0f, 1.0f, 0.0f, 0.5f)))
    val df = rows.toDF("vec_id", "embedding")
    val enc = Similarity.sq8Encode(df)
    val dec = enc.select(col("vec_id"), col("embedding"), col("sq_min"),
        col("sq_scale"),
        Similarity.sq8Decode(col("sq_codes"), col("sq_min"), col("sq_scale"))
          .as("rec"),
        col("sq_codes"))
      .collect()
    dec.foreach { r =>
      val emb = r.getSeq[Float](1)
      val mn = r.getDouble(2)
      val scale = r.getDouble(3)
      val rec = r.getSeq[Double](4)
      val codes = r.getSeq[Int](5)
      assert(codes.forall(c => c >= 0 && c <= 255))
      emb.zip(rec).foreach { case (x, xr) =>
        assert(math.abs(x.toDouble - xr) <= scale / 2 + 1e-9,
          s"vec ${r.getLong(0)}: |$x - $xr| > scale/2 ($scale)")
      }
      if (r.getLong(0) == 2L) {
        assert(scale == 0.0)
        assert(rec.forall(_ == mn))
      }
    }
    // the serving path puts an exact copy at rank 1
    val corpus = df.unionAll(Seq((1000001L, rows.head._2)).toDF("vec_id", "embedding"))
    val top = Similarity.sq8TopK(corpus, df.where(col("vec_id") === 1L), k = 1)
      .collect()
    assert(top.length == 1 && top.head.getLong(1) == 1000001L)
  }

  test("mmrTopK diversifies: one pick per cluster where plain top-k returns near-copies") {
    // two tight clusters; the query sits nearer cluster A. Plain top-2 is
    // two A members; MMR (lambda 0.5) must pick one from each cluster.
    val d = emb(
      (100L, Seq(1f, 0.02f, 0f)),      // query
      (1L, Seq(1f, 0f, 0f)),           // cluster A
      (2L, Seq(0.999f, 0.001f, 0f)),   // cluster A (near-copy of 1)
      (3L, Seq(0.998f, 0.002f, 0f)),   // cluster A (near-copy of 1)
      (4L, Seq(0.5f, 0.86f, 0f)),      // cluster B
      (5L, Seq(0.51f, 0.85f, 0f)))     // cluster B
    val corpus = d.where(col("vec_id") =!= 100L)
    val brute = Similarity.bruteTopK(corpus, d.where(col("vec_id") === 100L), k = 2)
      .collect().map(_.getLong(1)).toSet
    assert(brute.subsetOf(Set(1L, 2L, 3L)), s"plain top-2 was $brute")
    val mmr = try Similarity.mmrTopK(corpus, d.where(col("vec_id") === 100L),
        k = 2, shortlist = 5)
      .orderBy("mmr_rank").collect().map(_.getLong(1)).toSeq
      finally Pins.releaseAll()
    assert(Set(1L, 2L, 3L).contains(mmr.head), s"seed must be most relevant: $mmr")
    assert(Set(4L, 5L).contains(mmr(1)), s"second pick must leave the cluster: $mmr")
  }

  test("mmrTopK matches a sequential reference on an integer-exact fixture") {
    // axis-aligned vectors make every pairwise cosine exactly 0 or 1 in
    // micro-units, so the greedy trajectory is arithmetic, not float luck
    val d = emb(
      (50L, Seq(1f, 1f, 1f, 0f)),  // query
      (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(1f, 0f, 0f, 0f)),
      (3L, Seq(0f, 1f, 0f, 0f)), (4L, Seq(0f, 0f, 1f, 0f)),
      (5L, Seq(0f, 0f, 0f, 1f)))
    val corpus = d.where(col("vec_id") =!= 50L)
    val got = try Similarity.mmrTopK(corpus, d.where(col("vec_id") === 50L),
        k = 4, shortlist = 5)
      .orderBy("mmr_rank").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
      finally Pins.releaseAll()
    // rel(1..4) = round(cos * 1e4) = 5774 for dims present in the query,
    // rel(5) = 0. Seed: id 1 (tie with 2,3,4 on rel -> smallest id).
    // Round 2: candidates 2 (rel 5774, maxsim 10000 -> score 500*5774-500*10000 < 0),
    // 3 and 4 (rel 5774, maxsim 0 -> positive), 5 (rel 0, maxsim 0 -> 0):
    // pick 3 (tie with 4 -> smaller id). Round 3: 4. Round 4: 5 beats 2
    // (0 > 500*(5774-10000)).
    assert(got == Seq((1L, 1L), (3L, 2L), (4L, 3L), (5L, 4L)), s"got $got")
  }

  test("mmrTopK handles a single-candidate shortlist and k > candidates") {
    val d = emb((10L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)))
    val got = try Similarity.mmrTopK(d.where(col("vec_id") === 1L),
        d.where(col("vec_id") === 10L), k = 3, shortlist = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
      finally Pins.releaseAll()
    assert(got == Seq((1L, 1L)), s"got $got")
  }
}
