package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (north-star extension).
  *
  * Scale design: the brute-force path broadcasts the (small) query set and
  * streams the corpus once — no corpus self-shuffle; the LSH path buckets the
  * corpus by random-hyperplane signs so each query probes one bucket chain
  * (candidate set ~ corpus/2^bits per table). Dot products are codegen'd
  * `aggregate`/`zip_with` expressions in double — sequential fold in array
  * order, deterministic.
  */
object Similarity {

  /** Sequential-order dot product of two float-array columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

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

  /** Bucketed ANN: `tables` independent sign-LSH keys; candidates = corpus
    * rows sharing a key with the query in any table; exact cosine re-rank.
    * Recall grows with tables; candidate count shrinks with bits. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 8, tables: Int = 4): DataFrame = {
    def keyed(df: DataFrame, idAs: String, embAs: String): DataFrame = df
      .select(col("vec_id").as(idAs), col("embedding").as(embAs),
        explode(transform(sequence(lit(0), lit(tables - 1)),
          tbl => struct(tbl.as("tbl"),
            // per-table key: fold table index into the hyperplane hash
            aggregate(
              transform(sequence(lit(0), lit(bits - 1)), b =>
                when(aggregate(zip_with(col("embedding"),
                  sequence(lit(0), size(col("embedding")) - 1),
                  (x, i) => x.cast("double") *
                    (xxhash64(tbl, b, i).cast("double") / lit(Long.MaxValue.toDouble))),
                  lit(0.0), (acc, x) => acc + x) > 0,
                  call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
              lit(0L), (acc, x) => acc.bitwiseOR(x)).as("key")))).as("bk"))
    val qk = keyed(queries, "q_id", "q_emb")
    val tk = keyed(corpus, "t_id", "t_emb")
    val cand = tk.join(broadcast(qk), Seq("bk"))
      .where(col("t_id") =!= col("q_id"))
      .select("q_id", "q_emb", "t_id", "t_emb").distinct()
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
      bits: Int = 6, tables: Int = 6): DataFrame = {
    val keyed = df.select(col("vec_id").as("id"),
      explode(transform(sequence(lit(0), lit(tables - 1)),
        tbl => struct(tbl.as("tbl"),
          aggregate(
            transform(sequence(lit(0), lit(bits - 1)), b =>
              when(aggregate(zip_with(col("embedding"),
                sequence(lit(0), size(col("embedding")) - 1),
                (x, i) => x.cast("double") *
                  (xxhash64(tbl, b, i).cast("double") / lit(Long.MaxValue.toDouble))),
                lit(0.0), (acc, x) => acc + x) > 0,
                call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
            lit(0L), (acc, x) => acc.bitwiseOR(x)).as("key")))).as("bk"))
    val vecs = df.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val a = keyed.select(col("id").as("id_a"), col("bk"))
    val b = keyed.select(col("id").as("id_b"), col("bk"))
    // candidate dedup on id pairs only; embeddings join back afterwards
    a.join(b, Seq("bk")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .join(vecs.select(col("id").as("id_a"), col("emb").as("emb_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("emb").as("emb_b")), Seq("id_b"))
      .withColumn("sim", cosine(col("emb_a"), col("emb_b")))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
  }
}
