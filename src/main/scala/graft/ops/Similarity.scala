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
  * are driver-side constants, embeddings are read once per row. Dot products
  * in the verify stages are codegen'd-ish `aggregate`/`zip_with` folds in
  * double — sequential array order, deterministic.
  */
object Similarity {

  /** Sequential-order dot product of two float-array columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

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

  /** Embedding near-duplicate pairs: cosine above threshold. Candidates from
    * sign-LSH buckets (no all-pairs); exact cosine verify. */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
      bits: Int = 6, tables: Int = 6, dim: Int = DefaultDim,
      seed: Long = 42L): DataFrame = {
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
}
