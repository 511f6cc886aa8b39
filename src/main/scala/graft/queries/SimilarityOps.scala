package graft.queries

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Similarity-search queries over `embeddings`. The brute-force top-k has a
  * DuckDB oracle (list_cosine_similarity over DOUBLE[]; rank is on similarity
  * rounded to 4dp with id tie-break, so last-bit float differences between
  * engines cannot flip it). The LSH/near-dup variants are hash-specific —
  * rows-only checks + SimilaritySpec assertions (LSH top-1 must agree with
  * brute force on exact duplicates etc.).
  */
object SimilarityOps {
  import Tables.t

  val defs: Map[String, QueryDef] = Map(

    // embedding-space decontamination: drop TRAIN vectors too similar to
    // any EVAL vector (cosine >= τ) — the semantic sibling of the n-gram
    // p_decontaminate, catching paraphrased eval leakage lexical overlap
    // misses. Scale shape: eval side broadcast (eval sets are small by
    // nature), train side streamed once through the native cosine kernel,
    // anti-join on the contaminated id set. 4dp-rounded threshold compare
    // on both sides keeps last-bit float differences from flipping a
    // boundary row.
    "p_embed_decontaminate" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val eval = emb.where(col("vec_id") < 20)
          .select(col("vec_id").as("e_id"), col("embedding").as("e_emb"))
        val train = emb.where(col("vec_id") >= 20)
        val contaminated = train
          .join(broadcast(eval),
            round(Similarity.cosine(col("embedding"), col("e_emb")), 4)
              >= lit(0.99))
          .select(col("vec_id")).distinct()
        train.join(contaminated, Seq("vec_id"), "left_anti")
          .select(col("vec_id"), col("label").cast("long").as("label"))
          .orderBy("vec_id")
      },
      Some("""WITH eval AS (SELECT vec_id AS e_id, embedding AS e_emb
                            FROM embeddings WHERE vec_id < 20),
                   train AS (SELECT * FROM embeddings WHERE vec_id >= 20),
                   bad AS (SELECT DISTINCT t.vec_id FROM train t JOIN eval e
                           ON ROUND(list_cosine_similarity(
                                CAST(t.embedding AS DOUBLE[]),
                                CAST(e.e_emb AS DOUBLE[])), 4) >= 0.99)
              SELECT t.vec_id, CAST(t.label AS BIGINT) AS label FROM train t
              LEFT JOIN bad b ON b.vec_id = t.vec_id
              WHERE b.vec_id IS NULL
              ORDER BY t.vec_id""")
    ),

    // hard-negative mining (contrastive training's data step): for each
    // query vector, the top-3 most-similar vectors with a DIFFERENT label —
    // near-misses the model must learn to separate. Same scale shape as
    // brute top-k (queries broadcast, corpus streamed once through the
    // native cosine kernel, bounded per-query window); the oracle rounds
    // similarity to 4dp with id tie-break so last-bit float differences
    // cannot flip ranks.
    "s_hard_negatives" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.where(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("label").as("q_label"),
            col("embedding").as("q_emb"))
        val tt = emb.select(col("vec_id").as("t_id"),
          col("label").as("t_label"), col("embedding").as("t_emb"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(round(col("sim"), 4).desc, col("t_id"))
        tt.join(broadcast(q), col("t_label") =!= col("q_label"))
          .withColumn("sim", Similarity.cosine(col("q_emb"), col("t_emb")))
          .withColumn("rank", row_number().over(w))
          .where(col("rank") <= 3)
          .select(col("q_id"), col("t_id"), col("rank").cast("long").as("rank"))
          .orderBy("q_id", "rank")
      },
      Some("""SELECT q_id, t_id, rank FROM (
                SELECT q.vec_id AS q_id, t.vec_id AS t_id,
                  ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                    ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(t.embedding AS DOUBLE[])), 4) DESC,
                    t.vec_id) AS rank
                FROM embeddings q JOIN embeddings t ON t.label <> q.label
                WHERE q.vec_id < 20)
              WHERE rank <= 3 ORDER BY q_id, rank""")
    ),

    "s_cosine_topk" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.bruteTopK(emb, emb.where(col("vec_id") < 10), k = 5)
          .orderBy("q_id", "rank")
      },
      Some("""SELECT q_id, t_id, rank FROM (
                SELECT q.vec_id AS q_id, t.vec_id AS t_id,
                  ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                    ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(t.embedding AS DOUBLE[])), 4) DESC,
                    t.vec_id) AS rank
                FROM embeddings q JOIN embeddings t ON t.vec_id <> q.vec_id
                WHERE q.vec_id < 10)
              WHERE rank <= 5 ORDER BY q_id, rank""")
    ),

    "s_ann_lsh" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.lshTopK(emb, emb.where(col("vec_id") < 10), k = 5)
          .orderBy("q_id", "rank")
      },
      None
    ),

    "s_ann_ivf" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfTopK(emb, emb.where(col("vec_id") < 10), k = 5)
          .orderBy("q_id", "rank")
      },
      None
    ),

    // the two ANN index paths under the FULL oracle gate, at the one
    // operating point where their recall is DETERMINISTIC rather than
    // probabilistic: an exact-duplicate target. Each query vector's planted
    // copy (id +1_000_000) hashes to the SAME SRP bucket in every LSH table
    // and is assigned the SAME IVF cell as the query's first probe —
    // candidate generation cannot miss it — and at round(cos,4) = 1.0 it
    // outranks every organic vector (max pairwise cosine ~0.5), so top-1 is
    // exactly the copy. A bucketing bug, probe-ordering bug, or ranking bug
    // all break the hash; the k=5 realistic operating points stay rows-only
    // with SimilaritySpec's measured recall floors (IVF >= 0.9, LSH >= 0.6).
    "s_ann_lsh_planted" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
        val planted = emb.where(col("vec_id") < 10)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
        Similarity.lshTopK(emb.unionAll(planted), emb.where(col("vec_id") < 10), k = 1)
          .orderBy("q_id")
      },
      Some("""SELECT vec_id AS q_id, vec_id + 1000000 AS t_id,
                CAST(1 AS BIGINT) AS rank
              FROM embeddings WHERE vec_id < 10 ORDER BY q_id""")
    ),

    "s_ann_ivf_planted" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
        val planted = emb.where(col("vec_id") < 10)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
        Similarity.ivfTopK(emb.unionAll(planted), emb.where(col("vec_id") < 10), k = 1)
          .orderBy("q_id")
      },
      Some("""SELECT vec_id AS q_id, vec_id + 1000000 AS t_id,
                CAST(1 AS BIGINT) AS rank
              FROM embeddings WHERE vec_id < 10 ORDER BY q_id""")
    ),

    // k-means through the FULL oracle gate, by a planted-CONVERGENCE
    // construction: 4 distinct anchor vectors, 25 identical copies each
    // (ids anchor*1000 + i). The deterministic init (evenly-spaced rows of
    // the id-ordered sample, step 100/4 = 25) seeds exactly one centroid
    // inside each identity group, and Lloyd is then a fixed point: every
    // vector sits at distance 0 from its own group's centroid and > 0 from
    // the others (organic anchors are distinct). The expected clustering is
    // therefore exactly the four groups, and labeling clusters by smallest
    // member id makes it SQL-expressible with no vector math in the oracle:
    // group_id = (vec_id // 1000) * 1000. A drifting centroid, a broken
    // assignment kernel, or an unstable init all break the hash. Real-corpus
    // quality (inertia descent, empty-list handling) stays in
    // SimilaritySpec; the planted row pins the pipeline end to end.
    "s_kmeans_planted" -> QueryDef(
      (s, dir) => {
        val anchors = t(s, dir, "embeddings").where(col("vec_id") < 4)
          .select(col("vec_id").as("anchor"), col("embedding"))
        val corpus = anchors
          .select(col("anchor"), col("embedding"),
            explode(sequence(lit(0), lit(24))).as("i"))
          .select((col("anchor") * 1000 + col("i")).as("vec_id"), col("embedding"))
        Similarity.kmeansAssign(corpus, k = 4, sampleCap = 128)
          .select(col("vec_id"), col("cluster_min_id").as("group_id"))
          .orderBy("vec_id")
      },
      Some("""SELECT a * 1000 + i AS vec_id, a * 1000 AS group_id
              FROM generate_series(0, 3) t1(a), generate_series(0, 24) t2(i)
              ORDER BY vec_id""")
    ),

    // embedding near-dup pairs under the FULL oracle gate, via the planted
    // construction d_semantic_dedup proved out: exact copies of the first
    // 50 vectors re-enter under ids +1_000_000. Every planted pair MUST
    // surface — an identical embedding lands in the same SRP bucket in
    // every table (the projections are seeded, not sampled at runtime), so
    // candidate recall at cosine 1 is exactly 1, and round(cos, 4) = 1.0 on
    // the nose — while no other pair can reach the 0.95 threshold (the
    // corpus' max pairwise cosine is ~0.5). The expected pair set is
    // therefore exactly {(i, i+1_000_000, 1.0) | i < 50}: SQL-expressible,
    // and sensitive to both a missed planted pair (LSH bucketing bug) and a
    // false positive (verify-threshold bug).
    "s_embed_neardup" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
        val planted = emb.where(col("vec_id") < 50)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
        Similarity.cosineNearDupPairs(emb.unionAll(planted), threshold = 0.95)
          .orderBy("id_a", "id_b")
      },
      Some("""SELECT vec_id AS id_a, vec_id + 1000000 AS id_b,
                CAST(1.0 AS DOUBLE) AS sim
              FROM embeddings WHERE vec_id < 50 ORDER BY id_a, id_b""")
    ),

    // Achlioptas sparse random projection (64 -> 8 dims): the
    // Johnson-Lindenstrauss reduction that makes downstream ANN /
    // clustering cheaper at 100 TB, with the Gaussian matrix replaced by
    // the database-friendly {+1, 0, -1} matrix (P[+1] = P[-1] = 1/6) whose
    // entries derive from md5(i "_" j) — so BOTH engines can rebuild the
    // exact matrix and the projection is reproducible forever (a
    // runtime-sampled matrix would be neither portable nor re-runnable).
    // Embedding floats round ONCE to integer micro-units; the projection
    // is then pure integer arithmetic — order-independent exact. The
    // matrix ships as 8 per-output-dim literal arrays inside zip_with/
    // aggregate HOFs: a shuffle-free per-row scan, no explode, no join.
    "s_rp_project" -> QueryDef(
      (s, dir) => {
        val mat: Array[Array[Long]] = Array.tabulate(8) { j =>
          Array.tabulate(64) { i =>
            val md = java.security.MessageDigest.getInstance("MD5")
              .digest(s"${i}_${j}".getBytes("UTF-8"))
            val v = md.take(4).map("%02x".format(_)).mkString
            java.lang.Long.parseLong(v, 16) % 6 match {
              case 0 => 1L
              case 1 => -1L
              case _ => 0L
            }
          }
        }
        val ys = (0 until 8).map { j =>
          aggregate(
            zip_with(col("embedding"), typedLit(mat(j)),
              (x, g) => round(x.cast("double") * lit(1e6), 0).cast("long") * g),
            lit(0L), (acc, v) => acc + v)
        }
        t(s, dir, "embeddings")
          .select(col("vec_id"), posexplode(array(ys: _*)).as(Seq("j", "y_u")))
          .select(col("vec_id"), col("j").cast("long").as("j"), col("y_u"))
          .orderBy("vec_id", "j")
      },
      Some("""WITH m AS (
                SELECT i, j,
                  CASE WHEN v % 6 = 0 THEN 1
                       WHEN v % 6 = 1 THEN -1 ELSE 0 END AS g
                FROM (SELECT i, j,
                        CAST('0x' || substr(md5(i || '_' || j), 1, 8) AS BIGINT) AS v
                      FROM generate_series(0, 63) t1(i),
                           generate_series(0, 7) t2(j))),
              e AS (
                SELECT vec_id,
                  CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
                  CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1e6, 0)
                    AS BIGINT) AS xu
                FROM embeddings)
              SELECT e.vec_id, CAST(m.j AS BIGINT) AS j,
                CAST(SUM(e.xu * m.g) AS BIGINT) AS y_u
              FROM e JOIN m USING (i)
              GROUP BY e.vec_id, m.j ORDER BY vec_id, j""")
    )
  )
}
