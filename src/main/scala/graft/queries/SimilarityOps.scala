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

    "s_embed_neardup" -> QueryDef(
      (s, dir) => Similarity.cosineNearDupPairs(t(s, dir, "embeddings"), threshold = 0.95)
        .orderBy("id_a", "id_b"),
      None
    )
  )
}
