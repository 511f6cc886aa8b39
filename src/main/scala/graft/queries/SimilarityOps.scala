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

    // SQ8 scalar quantization (r16) — the ANN family's STORAGE axis: the
    // integer codes are engine-neutral arithmetic (exact float->double
    // widening, identically-parenthesized affine map, half-up rounding on
    // nonnegative doubles), so the quantizer itself carries a FULL oracle —
    // stronger than the planted-twin gate the candidate-pruning variants
    // need.
    "s_sq8_codes" -> QueryDef(
      (s, dir) => Similarity.sq8Encode(
          t(s, dir, "embeddings").where(col("vec_id") < 50))
        .select(col("vec_id"), col("sq_min"), col("sq_scale"),
          posexplode(col("sq_codes")).as(Seq("i", "code")))
        .select(col("vec_id"), col("sq_min"), col("sq_scale"),
          col("i").cast("long").as("i"), col("code"))
        .orderBy("vec_id", "i"),
      Some("""WITH e AS (
                SELECT vec_id,
                  CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS mn,
                  CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS mx,
                  embedding
                FROM embeddings WHERE vec_id < 50),
              sc AS (
                SELECT vec_id, mn, (mx - mn) / 255.0 AS sq_scale, embedding
                FROM e)
              SELECT vec_id, mn AS sq_min, sq_scale,
                unnest(range(0, len(embedding))) AS i,
                unnest(list_transform(embedding, x ->
                  CASE WHEN sq_scale = 0 THEN 0
                       ELSE CAST(round((CAST(x AS DOUBLE) - mn) / sq_scale)
                         AS INTEGER) END)) AS code
              FROM sc ORDER BY vec_id, i""")
    ),

    // the SQ8 serving path (queries full-precision, corpus existing only
    // as codes) under the FULL oracle gate via the planted-copy argument:
    // an exact copy quantizes identically, so its reconstruction is the
    // nearest possible corpus vector to the query (round(cos,4) = 1.0 vs
    // organic ~0.5) and top-1 is exactly the copy.
    "s_ann_sq8_planted" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
        val planted = emb.where(col("vec_id") < 10)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
        Similarity.sq8TopK(emb.unionAll(planted),
            emb.where(col("vec_id") < 10), k = 1)
          .orderBy("q_id")
      },
      Some("""SELECT vec_id AS q_id, vec_id + 1000000 AS t_id,
                CAST(1 AS BIGINT) AS rank
              FROM embeddings WHERE vec_id < 10 ORDER BY q_id""")
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

    // PQ completes the ANN family's memory axis: brute = exact, LSH/IVF =
    // candidate pruning, PQ = index COMPRESSION (corpus vectors held as m
    // codeword indices + one shared codebook — the only ANN shape whose
    // index fits in memory when the raw vectors never could). Approximate
    // at this operating point -> rows-only, with the planted full-oracle
    // twin below and SimilaritySpec's measured recall floor.
    "s_ann_pq" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.pqTopK(emb, emb.where(col("vec_id") < 10), k = 5)
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

    // PQ under the FULL oracle gate via the same planted-copy construction,
    // resting on the ADC FLOOR property: an exact copy's approximate
    // distance is sum_s min over the subspace codebook of ||q_s - c||^2 —
    // the MINIMUM the ADC metric can assign to any code — so the copy can
    // never miss the shortlist (a code tie would need another vector to
    // quantize identically in all 8 subspaces; the organic corpus, max
    // cosine ~0.5, does not), and the exact re-rank then pins it at rank 1
    // with round(cos,4) = 1.0. A codebook-training drift, a wrong
    // slice/codeword indexing, or a shortlist-ordering bug all break the
    // hash.
    "s_ann_pq_planted" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
        val planted = emb.where(col("vec_id") < 10)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
        Similarity.pqTopK(emb.unionAll(planted), emb.where(col("vec_id") < 10), k = 1)
          .orderBy("q_id")
      },
      Some("""SELECT vec_id AS q_id, vec_id + 1000000 AS t_id,
                CAST(1 AS BIGINT) AS rank
              FROM embeddings WHERE vec_id < 10 ORDER BY q_id""")
    ),

    // IVFADC — both index structures composed (the billion-vector FAISS
    // architecture: coarse lists bound the scan, PQ codes bound the
    // memory) — under the FULL oracle gate. The planted argument composes
    // both halves': the copy is assigned the query's own first-probe cell
    // (IVF cannot drop it) and holds the ADC floor within the candidates
    // (the code scan cannot either); exact re-rank pins it at cos 1.0.
    // Realistic operating points are covered by the component families'
    // rows-only queries + SimilaritySpec recall floors — a composed
    // rows-only row would re-measure the same two structures.
    "s_ann_ivfpq_planted" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
        val planted = emb.where(col("vec_id") < 10)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
        Similarity.ivfPqTopK(emb.unionAll(planted), emb.where(col("vec_id") < 10), k = 1)
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

    // HYBRID retrieval with reciprocal-rank fusion (RRF, the standard
    // lexical+vector result combiner): the BM25 ranking of documents for a
    // fixed query and the cosine ranking of embeddings against an anchor
    // vector fuse as Σ 1/(60 + rank) — rounded ONCE per side to integer
    // micro-units, so the fused score is exact. Each side reduces to its
    // top-50 via TakeOrdered BEFORE any rank window (the windows then run
    // over 50 rows, the registry's admitted already-reduced shape); ids
    // join doc i ↔ vec i. Cosine ranks on round(sim, 4) with id tie-break
    // (the s_cosine_topk float discipline).
    "s_hybrid_rrf" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // lexical side: t_bm25's arithmetic, top-50
        val words = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(graft.functions.WordNgrams(col("text"), 1)).as("w"))
        val dl = words.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val stats = dl.agg(count(lit(1)).as("n_docs"),
          sum("dl").cast("double").as("tot_dl"))
        val tf = words.where(col("w").isin("spark", "join", "fast"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        val dfc = tf.groupBy("w").agg(count(lit(1)).as("df"))
        val idf = log(lit(1.0) +
          ((col("n_docs") - col("df")) + lit(0.5)) / (col("df") + lit(0.5)))
        val frac = (col("tf") * lit(2.2)) /
          (col("tf") + (lit(0.3) + lit(0.9) *
            (col("dl").cast("double") / (col("tot_dl") / col("n_docs")))))
        val lex50 = tf.join(broadcast(dfc), "w").join(dl, "doc_id")
          .crossJoin(broadcast(stats))
          .select(col("doc_id"),
            round((idf * frac) * lit(1e6), 0).cast("long").as("s_u"))
          .groupBy("doc_id").agg(sum("s_u").as("score_u"))
          .orderBy(col("score_u").desc, col("doc_id")).limit(50)
        val lexRank = lex50.select(col("doc_id").as("id"),
          row_number().over(Window.orderBy(col("score_u").desc, col("doc_id")))
            .cast("long").as("r_lex"))
        // vector side: cosine to the anchor embedding (vec 0), top-50 via
        // the BOUNDED MinKPairs aggregator (p_weighted_sample's shape:
        // map-side-combined k-pair buffers, rank = explode index — never
        // a global window or sort); the anchor rides as a scalar
        // aggregate so the cross join has a <=1-row broadcast side. Key =
        // −round(sim·1e4): ascending (key, id) == (sim DESC 4dp, id).
        val emb = t(s, dir, "embeddings")
        val anchor = emb.where(col("vec_id") === 0)
          .agg(first("embedding").as("q_emb"))
        val topk = udaf(graft.functions.TypedAggs.MinKPairs(50))
        val simKey = (lit(0L) -
          round(graft.functions.CosineSim(col("embedding"), col("q_emb"))
            * lit(1e4), 0).cast("long")).as("key")
        val vecRank = emb.crossJoin(broadcast(anchor))
          .select(simKey, col("vec_id"))
          .agg(topk(col("key"), col("vec_id")).as("tk"))
          .select(posexplode(col("tk")).as(Seq("i", "p")))
          .select(col("p._2").as("id"),
            (col("i") + 1).cast("long").as("r_vec"))
        lexRank.join(vecRank, Seq("id"), "full_outer")
          .select(col("id"),
            (coalesce(round(lit(1e6) / (lit(60.0) + col("r_lex")), 0)
                .cast("long"), lit(0L)) +
              coalesce(round(lit(1e6) / (lit(60.0) + col("r_vec")), 0)
                .cast("long"), lit(0L))).as("fused_u"),
            col("r_lex"), col("r_vec"))
          .orderBy(col("fused_u").desc, col("id"))
          .limit(10)
      },
      Some("""WITH w AS (
                SELECT doc_id, unnest(list_filter(
                  string_split_regex(trim(lower(text)), '\s+'),
                  x -> x <> '')) AS w
                FROM documents),
              dl AS (SELECT doc_id, COUNT(*) AS dl FROM w GROUP BY doc_id),
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
                FROM tf JOIN dfc USING (w) JOIN dl USING (doc_id) CROSS JOIN st),
              lex AS (
                SELECT doc_id, CAST(SUM(s_u) AS BIGINT) AS score_u
                FROM sc GROUP BY doc_id
                ORDER BY score_u DESC, doc_id LIMIT 50),
              lexr AS (
                SELECT doc_id AS id,
                  CAST(ROW_NUMBER() OVER (ORDER BY score_u DESC, doc_id)
                    AS BIGINT) AS r_lex
                FROM lex),
              q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
              vec AS (
                SELECT vec_id,
                  ROUND(list_cosine_similarity(
                    CAST(embedding AS DOUBLE[]), CAST(q.q_emb AS DOUBLE[])), 4)
                    AS sim
                FROM embeddings CROSS JOIN q
                ORDER BY sim DESC, vec_id LIMIT 50),
              vecr AS (
                SELECT vec_id AS id,
                  CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id)
                    AS BIGINT) AS r_vec
                FROM vec)
              SELECT COALESCE(lexr.id, vecr.id) AS id,
                COALESCE(CAST(ROUND(1e6 / (60.0 + r_lex), 0) AS BIGINT), 0)
                  + COALESCE(CAST(ROUND(1e6 / (60.0 + r_vec), 0) AS BIGINT), 0)
                  AS fused_u,
                r_lex, r_vec
              FROM lexr FULL OUTER JOIN vecr ON lexr.id = vecr.id
              ORDER BY fused_u DESC, id LIMIT 10""")
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
        // one native codegen'd pass (r17): the 8 aggregate(zip_with(...))
        // chains evaluated INTERPRETED (HOFs are CodegenFallback), reading
        // the embedding 8 times per row through per-element closures —
        // IntMatProject computes the identical integer arithmetic in one
        // loop (IntMatProjectSpec pins kernel == HOF chain bit-for-bit)
        t(s, dir, "embeddings")
          .select(col("vec_id"), posexplode(
            graft.functions.IntMatProject(col("embedding"), mat.flatten, 8))
            .as(Seq("j", "y_u")))
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
    ),

    // Text-to-text k-NN with NO embedding column (r17): the hashed-trick
    // embedding ([[graft.functions.HashEmbed]]) turns raw documents into
    // 16-dim vectors, then the standard brute top-k serves text-to-text
    // retrieval — the full chain (tokenize → signed md5 hashing →
    // micro-normalize → cosine → rank) restated in DuckDB, a FULL oracle,
    // no planted twin needed. Float parity is exact by construction:
    // micro-unit components are integers ≤ 1e6, so every dot/norm partial
    // stays under 2^53 and the cosine is BIT-IDENTICAL regardless of either
    // engine's accumulation order. Scale shape: one codegen'd projection
    // per row, queries broadcast, corpus streamed once (s_cosine_topk).
    "s_text_knn" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "documents")
          .select(col("doc_id").as("vec_id"),
            transform(graft.functions.HashEmbed(col("text"), 16),
              x => x.cast("double")).as("embedding"))
          .where(exists(col("embedding"), x => x =!= lit(0.0)))
        Similarity.bruteTopK(emb, emb.where(col("vec_id") < 5), k = 3)
          .orderBy("q_id", "rank")
      },
      Some("""WITH d AS (SELECT doc_id, text FROM documents),
              w AS (SELECT doc_id,
                      unnest(string_split_regex(trim(text), '\s+')) AS tok
                    FROM d),
              h AS (SELECT doc_id,
                      CAST('0x' || substr(md5(tok), 1, 13) AS BIGINT) AS hv
                    FROM w WHERE tok <> ''),
              cell AS (SELECT doc_id, (hv // 2) % 16 AS i,
                         SUM(CASE WHEN hv % 2 = 0 THEN 1 ELSE -1 END) AS c
                       FROM h GROUP BY 1, 2),
              grid AS (SELECT d.doc_id, g.i
                       FROM d, (SELECT unnest(range(0, 16)) AS i) g),
              fc AS (SELECT grid.doc_id, grid.i, COALESCE(cell.c, 0) AS c
                     FROM grid LEFT JOIN cell
                       ON cell.doc_id = grid.doc_id AND cell.i = grid.i),
              nrm AS (SELECT doc_id, SUM(c * c) AS ssq FROM fc GROUP BY doc_id),
              vec AS (SELECT fc.doc_id,
                        list(CAST(FLOOR(1000000.0 * fc.c / sqrt(nrm.ssq) + 0.5)
                               AS DOUBLE) ORDER BY fc.i) AS v
                      FROM fc JOIN nrm ON nrm.doc_id = fc.doc_id
                      WHERE nrm.ssq > 0 GROUP BY fc.doc_id)
              SELECT q_id, t_id, rank FROM (
                SELECT q.doc_id AS q_id, t.doc_id AS t_id,
                  ROW_NUMBER() OVER (PARTITION BY q.doc_id ORDER BY
                    ROUND(list_cosine_similarity(q.v, t.v), 4) DESC,
                    t.doc_id) AS rank
                FROM vec q JOIN vec t ON t.doc_id <> q.doc_id
                WHERE q.doc_id < 5)
              WHERE rank <= 3 ORDER BY q_id, rank""")
    ),

    // Maximal-marginal-relevance re-ranking (r17): greedy MMR (λ = 0.5)
    // over a brute top-8 shortlist — the retrieval DIVERSIFIER (k results
    // relevant AND mutually non-redundant, the RAG context-assembly step).
    // Relevance and pairwise similarities are once-rounded 1e-4 integer
    // units with id tie-breaks, so the greedy trajectory is integer-exact
    // and the oracle restates it stage by stage (seed = argmax relevance;
    // each later stage = argmax 500·rel − 500·max-sim-to-selected over the
    // shortlist remainder). Scale shape: shortlist build is the broadcast
    // brute top-k; the greedy stage touches shortlist² rows per query —
    // corpus-size-independent.
    "s_mmr_rerank" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.mmrTopK(emb, emb.where(col("vec_id") < 8),
            k = 3, shortlist = 8)
          .orderBy("q_id", "mmr_rank")
      },
      Some("""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                         FROM embeddings WHERE vec_id < 8),
              c0 AS (SELECT q.q_id, t.vec_id AS t_id,
                       CAST(ROUND(list_cosine_similarity(
                              CAST(t.embedding AS DOUBLE[]),
                              CAST(q.q_emb AS DOUBLE[])) * 10000) AS BIGINT)
                         AS rel,
                       t.embedding AS t_emb
                     FROM embeddings t JOIN q ON t.vec_id <> q.q_id),
              short AS (SELECT q_id, t_id, rel, t_emb FROM (
                          SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY rel DESC, t_id) AS rn FROM c0)
                        WHERE rn <= 8),
              p AS (SELECT a.q_id, a.t_id AS a_id, b.t_id AS b_id,
                      CAST(ROUND(list_cosine_similarity(
                             CAST(a.t_emb AS DOUBLE[]),
                             CAST(b.t_emb AS DOUBLE[])) * 10000) AS BIGINT)
                        AS ps
                    FROM short a JOIN short b
                      ON a.q_id = b.q_id AND a.t_id <> b.t_id),
              s1 AS (SELECT q_id, t_id FROM (
                       SELECT q_id, t_id, ROW_NUMBER() OVER (PARTITION BY q_id
                         ORDER BY rel DESC, t_id) AS rn FROM short)
                     WHERE rn = 1),
              m2 AS (SELECT s.q_id, s.t_id, s.rel, MAX(p.ps) AS ms
                     FROM short s
                     JOIN s1 ON s1.q_id = s.q_id AND s.t_id <> s1.t_id
                     JOIN p ON p.q_id = s.q_id AND p.a_id = s.t_id
                           AND p.b_id = s1.t_id
                     GROUP BY s.q_id, s.t_id, s.rel),
              s2 AS (SELECT q_id, t_id FROM (
                       SELECT q_id, t_id, ROW_NUMBER() OVER (PARTITION BY q_id
                         ORDER BY 500 * rel - 500 * ms DESC, t_id) AS rn
                       FROM m2)
                     WHERE rn = 1),
              m3 AS (SELECT s.q_id, s.t_id, s.rel, MAX(p.ps) AS ms
                     FROM short s
                     JOIN s1 ON s1.q_id = s.q_id
                     JOIN s2 ON s2.q_id = s.q_id
                     JOIN p ON p.q_id = s.q_id AND p.a_id = s.t_id
                           AND p.b_id IN (s1.t_id, s2.t_id)
                     WHERE s.t_id <> s1.t_id AND s.t_id <> s2.t_id
                     GROUP BY s.q_id, s.t_id, s.rel),
              s3 AS (SELECT q_id, t_id FROM (
                       SELECT q_id, t_id, ROW_NUMBER() OVER (PARTITION BY q_id
                         ORDER BY 500 * rel - 500 * ms DESC, t_id) AS rn
                       FROM m3)
                     WHERE rn = 1)
              SELECT q_id, t_id, CAST(1 AS BIGINT) AS mmr_rank FROM s1
              UNION ALL SELECT q_id, t_id, CAST(2 AS BIGINT) FROM s2
              UNION ALL SELECT q_id, t_id, CAST(3 AS BIGINT) FROM s3
              ORDER BY q_id, mmr_rank""")
    )
  )
}
