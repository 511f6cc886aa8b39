package graft.queries

import graft.functions.WordNgrams
import graft.ops.Dedup
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level training-data pipeline operators beyond the per-doc Text
  * family: eval-set decontamination, repetition quality signals, TF-IDF
  * term weighting, and mixture-weighted sampling. All exact-oracle'd.
  */
object PipelineOps {
  import Tables.t

  /** Uniform 0..15 bucket from the first md5 hex digit of the id — the same
    * engine/run/partitioning-stable split key p_train_split uses (an RNG
    * split would be none of those). */
  private def md5Bucket(id: Column): Column = {
    val a = ascii(substring(md5(id.cast("string").cast("binary")), 1, 1))
    when(a >= 97, a - 87).otherwise(a - 48)
  }

  val defs: Map[String, QueryDef] = Map(

    // eval-set decontamination: flag train-split docs sharing any word
    // 4-gram with the held-out split, with the count of distinct shared
    // grams (the standard pre-training hygiene pass: drop or audit train
    // docs that leak eval text). The eval gram set is the small side by
    // construction (held-out splits are a sliver of the corpus), so AQE
    // broadcasts it; at 100 TB the join key is the gram string and the
    // only wide shuffle is the per-doc count — both scale-safe.
    // the "dataset card" aggregate every corpus release ships: one row of
    // whole-corpus facts — doc count, char/token volume, language spread,
    // dominant language (deterministic tie-break), duplicate-text rate.
    // All integer-exact; one pass + one tiny mode aggregation.
    "p_corpus_stats" -> QueryDef(
      (s, dir) => {
        val d = t(s, dir, "documents")
        val base = d.agg(
          count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("bigint").as("total_chars"),
          // CJK-aware kernel; count-identical to the oracle's whitespace
          // restatement on this non-CJK corpus by the TokenCount contract
          sum(graft.ops.Text.tokenCount(col("text"))).cast("bigint")
            .as("total_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          (count(lit(1)) - countDistinct(md5(col("text"))))
            .as("n_dup_texts"))
        val topLang = d.groupBy("lang").agg(count(lit(1)).as("ln"))
          .orderBy(col("ln").desc, col("lang")).limit(1)
          .select(col("lang").as("top_lang"), col("ln").as("top_lang_docs"))
        base.crossJoin(topLang) // two 1-row scalars — bounded by design
      },
      Some("""WITH base AS (
                SELECT COUNT(*) AS n_docs,
                  CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
                  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
                    AS total_tokens,
                  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
                  CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT)
                    AS n_dup_texts
                FROM documents),
              tl AS (SELECT lang AS top_lang, CAST(COUNT(*) AS BIGINT)
                       AS top_lang_docs
                     FROM documents GROUP BY lang
                     ORDER BY COUNT(*) DESC, lang LIMIT 1)
              SELECT * FROM base, tl""")
    ),

    "p_decontaminate" -> QueryDef(
      (s, dir) => {
        val base = t(s, dir, "documents").select(
          col("doc_id"),
          (md5Bucket(col("doc_id")) < 14).as("is_train"),
          Dedup.shingles(col("text"), 4).as("grams"))
        val trainG = base.where(col("is_train"))
          .select(col("doc_id"), explode(col("grams")).as("g"))
        val evalG = base.where(not(col("is_train")))
          .select(explode(col("grams")).as("g")).distinct()
        trainG.join(evalG, "g")
          .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (
                SELECT doc_id, text, ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) AS a
                FROM documents),
              b AS (
                SELECT doc_id, text,
                  (CASE WHEN a >= 97 THEN a - 87 ELSE a - 48 END) < 14 AS is_train
                FROM h),
              w AS (
                SELECT doc_id, is_train,
                  string_split_regex(trim(lower(text)), '\s+') AS words
                FROM b),
              sh AS (
                SELECT doc_id, is_train,
                  unnest(list_distinct(list_filter(
                    list_transform(range(0, GREATEST(len(words) - 4, 0) + 1),
                      x -> array_to_string(words[x + 1 : x + 4], ' ')),
                    s -> s <> ''))) AS g
                FROM w),
              ev AS (SELECT DISTINCT g FROM sh WHERE NOT is_train)
              SELECT sh.doc_id, COUNT(*) AS n_contaminated
              FROM sh JOIN ev USING (g) WHERE sh.is_train
              GROUP BY sh.doc_id ORDER BY sh.doc_id""")
    ),

    // Gopher-style repetition quality signals per doc: total word bigrams,
    // the most-repeated bigram (ties broken lexicographically) with its
    // count, and the fraction of bigram occurrences that are duplicates.
    // ONE native pass per row (functions.RepetitionStats): the former
    // explode→groupBy→window shape shuffled docs×word-count gram strings
    // only to regroup them by the doc they came from — per-doc stats never
    // need to leave the row. The gram-less-doc filter mirrors the oracle's
    // CTE shape (its gram table simply has no row for an empty doc).
    "t_repetition" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        // gram-less ⟺ whitespace-only text: filtering on the RAW column
        // (not st.n_grams) keeps Catalyst from pushing the predicate below
        // the projection and evaluating the kernel twice per row
        .where(length(trim(col("text"))) > 0)
        .select(col("doc_id"), graft.functions.RepetitionStats(col("text")).as("st"))
        .select(col("doc_id"), col("st.top_gram").as("top_gram"),
          col("st.max_rep").as("max_rep"), col("st.n_grams").as("n_grams"),
          col("st.n_dup").as("n_dup"),
          (col("st.n_dup").cast("double") / col("st.n_grams")).as("dup_frac"))
        .orderBy("doc_id"),
      Some("""WITH w AS (
                SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS words
                FROM documents),
              g AS (
                SELECT doc_id,
                  unnest(list_transform(range(0, GREATEST(len(words) - 2, 0) + 1),
                    x -> array_to_string(words[x + 1 : x + 2], ' '))) AS g
                FROM w),
              c AS (SELECT doc_id, g, COUNT(*) AS c FROM g WHERE g <> '' GROUP BY ALL),
              r AS (
                SELECT doc_id, g, c,
                  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rn,
                  CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n_grams,
                  CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END)
                       OVER (PARTITION BY doc_id) AS BIGINT) AS n_dup
                FROM c)
              SELECT doc_id, g AS top_gram, c AS max_rep, n_grams, n_dup,
                CAST(n_dup AS DOUBLE) / n_grams AS dup_frac
              FROM r WHERE rn = 1 ORDER BY doc_id""")
    ),

    // Gopher-style composite quality gate: token-count band + stopword
    // floor + duplicate-bigram ceiling, each signal from a shuffle-free
    // native kernel, the verdict as a boolean column (filtering is the
    // caller's choice; the gate itself is pure per-row compute).
    "t_gopher_gate" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          graft.ops.Text.tokenCount(col("text")).as("n_tokens"),
          graft.ops.Text.stopwordHits(col("text")).as("n_stop"),
          graft.functions.RepetitionStats(col("text")).as("st"))
        .select(col("doc_id"), col("n_tokens"), col("n_stop"),
          (col("st.n_dup").cast("double") / col("st.n_grams")).as("dup_frac"))
        .withColumn("pass",
          col("n_tokens") >= 30 && col("n_tokens") <= 1000 &&
            col("n_stop") >= 2 && col("dup_frac") <= 0.2)
        .orderBy("doc_id"),
      Some("""WITH w AS (
                SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS words
                FROM documents),
              g AS (
                SELECT doc_id,
                  unnest(list_transform(range(0, GREATEST(len(words) - 2, 0) + 1),
                    x -> array_to_string(words[x + 1 : x + 2], ' '))) AS g
                FROM w),
              c AS (SELECT doc_id, g, COUNT(*) AS c FROM g WHERE g <> '' GROUP BY ALL),
              r AS (
                SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
                  CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup
                FROM c GROUP BY doc_id),
              st AS (
                SELECT doc_id,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
                  CAST(len(regexp_extract_all(text, '\b(the|and|of|to|a|in|is|it|that|for)\b')) AS BIGINT) AS n_stop
                FROM documents)
              SELECT st.doc_id, st.n_tokens, st.n_stop,
                CAST(r.n_dup AS DOUBLE) / r.n_grams AS dup_frac,
                (st.n_tokens >= 30 AND st.n_tokens <= 1000 AND st.n_stop >= 2
                 AND CAST(r.n_dup AS DOUBLE) / r.n_grams <= 0.2) AS pass
              FROM st JOIN r USING (doc_id) ORDER BY st.doc_id""")
    ),

    // corpus TF-IDF: top-3 terms per doc by tf * ln(N/df), rank ties broken
    // by term. N rides along as a broadcast single-row aggregate (no
    // driver-side collect); tf and df are one shuffle each on compact keys.
    // Score rounded to 6dp so the double is engine-neutral under ranking.
    "t_tfidf" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val tf = docs
          .select(col("doc_id"), explode(WordNgrams(col("text"), 1)).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val nDf = docs.agg(count(lit(1)).cast("double").as("n_docs"))
        val scored = tf.join(dfc, "term")
          .crossJoin(broadcast(nDf))
          .withColumn("score", round(col("tf") * log(col("n_docs") / col("df")), 6))
        scored
          .withColumn("rk", row_number()
            .over(Window.partitionBy("doc_id").orderBy(col("score").desc, col("term")))
            .cast("long"))
          .where(col("rk") <= 3)
          .select("doc_id", "rk", "term", "tf", "df", "score")
          .orderBy("doc_id", "rk")
      },
      Some("""WITH w AS (
                SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS words
                FROM documents),
              tm AS (SELECT doc_id, unnest(words) AS term FROM w),
              tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tm
                     WHERE term <> '' GROUP BY ALL),
              dfc AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
              n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
              sc AS (
                SELECT tf.doc_id, tf.term, tf.tf, dfc.df,
                  ROUND(tf.tf * ln(n.n_docs / dfc.df), 6) AS score
                FROM tf JOIN dfc USING (term) CROSS JOIN n),
              r AS (
                SELECT *, ROW_NUMBER() OVER
                  (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
                FROM sc)
              SELECT doc_id, rk, term, tf, df, score
              FROM r WHERE rk <= 3 ORDER BY doc_id, rk""")
    ),

    // corpus token-length histogram (8-token buckets): the sequence-length
    // profile that sizes packing/truncation decisions. One partial-agg
    // shuffle on a small-int bucket key — scale-free.
    "p_length_hist" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(graft.ops.Text.tokenCount(col("text")).as("n_tok"))
        .groupBy((col("n_tok") / 8).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_docs"), min("n_tok").as("min_tok"),
          max("n_tok").as("max_tok"))
        .orderBy("bucket"),
      Some("""WITH n AS (
                SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
                FROM documents)
              SELECT n_tok // 8 AS bucket, COUNT(*) AS n_docs,
                MIN(n_tok) AS min_tok, MAX(n_tok) AS max_tok
              FROM n GROUP BY bucket ORDER BY bucket""")
    ),

    // curriculum ordering: docs ranked by a deterministic quality score
    // (stopword density proxy) into 4 curriculum phases. NOT the naive
    // `ntile().over(Window.orderBy(...))` — that global window serializes
    // the corpus through one task; ops.ScalableWindow computes the global
    // rank as a two-phase prefix count and NTILE in closed form from it,
    // oracle-pinned to the SQL NTILE.
    "p_curriculum" -> QueryDef(
      (s, dir) => {
        val scored = t(s, dir, "documents").select(
          col("doc_id"),
          graft.ops.Text.stopwordHits(col("text")).as("n_stop"),
          graft.ops.Text.tokenCount(col("text")).as("n_tok"))
        graft.ops.ScalableWindow.ntile(
            scored, Seq(col("n_stop").desc, col("doc_id")), 4, "phase")
          .orderBy("doc_id")
      },
      Some("""WITH sc AS (
                SELECT doc_id,
                  CAST(len(regexp_extract_all(text, '\b(the|and|of|to|a|in|is|it|that|for)\b')) AS BIGINT) AS n_stop,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
                FROM documents)
              SELECT doc_id, n_stop, n_tok,
                CAST(NTILE(4) OVER (ORDER BY n_stop DESC, doc_id) AS BIGINT) AS phase
              FROM sc ORDER BY doc_id""")
    ),

    // stratified per-domain quality selection (the FineWeb-style pass):
    // within every source, keep the top half of documents by quality score
    // (stopword density, ties by doc_id) — domain-local selection instead
    // of a global cutoff, so a low-quality-on-average domain still
    // contributes its best documents. One shuffle keyed by source; at
    // 100 TB each domain's window runs where its shuffle partition lives,
    // no global ordering anywhere. Quota = ceil(n/2) via rank <= (cnt+1)/2.
    "p_domain_topq" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("source")
          .orderBy(col("n_stop").desc, col("doc_id"))
        val cw = Window.partitionBy("source")
        t(s, dir, "documents").select(
            col("doc_id"), col("source"),
            graft.ops.Text.stopwordHits(col("text")).as("n_stop"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .withColumn("n_src", count(lit(1)).over(cw))
          .where(col("rk") <= expr("(n_src + 1) div 2"))
          .select("doc_id", "source", "n_stop", "rk")
          .orderBy("doc_id")
      },
      Some("""WITH sc AS (
                SELECT doc_id, source,
                  CAST(len(regexp_extract_all(text, '\b(the|and|of|to|a|in|is|it|that|for)\b')) AS BIGINT) AS n_stop
                FROM documents),
              r AS (
                SELECT doc_id, source, n_stop,
                  CAST(ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY n_stop DESC, doc_id) AS BIGINT) AS rk,
                  COUNT(*) OVER (PARTITION BY source) AS n_src
                FROM sc)
              SELECT doc_id, source, n_stop, rk
              FROM r WHERE rk <= (n_src + 1) // 2 ORDER BY doc_id""")
    ),

    // per-source quality z-normalization: a raw quality score is not
    // comparable ACROSS domains (Wikipedia's median would gate out every
    // web page), so pipelines standardize within source before any global
    // threshold — the FineWeb-style calibration step. Moments (n, Σq, Σq²)
    // are exact integer aggregates; z = (q·n − Σq)/√(n·Σq² − (Σq)²) is
    // evaluated in identically-parenthesized IEEE doubles (sqrt and
    // division are correctly-rounded in both engines) and rounded ONCE to
    // micro-units — the q_corr_regr moment discipline. Degenerate sources
    // (zero variance) emit NULL rather than dividing by zero. The moment
    // table is sources-sized -> broadcast; one shuffle total.
    "p_quality_znorm" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"), col("source"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("q"))
        val m = docs.groupBy("source").agg(count(lit(1)).as("n"),
          sum("q").as("sq"), sum(col("q") * col("q")).as("sqq"))
        val varN = col("n").cast("double") * col("sqq").cast("double") -
          col("sq").cast("double") * col("sq").cast("double")
        val z = (col("q").cast("double") * col("n").cast("double")
          - col("sq").cast("double")) / sqrt(varN)
        docs.join(broadcast(m), "source")
          .select(col("doc_id"), col("source"), col("q"),
            when(varN > lit(0.0), round(z * lit(1e6), 0).cast("long"))
              .otherwise(lit(null).cast("long")).as("z_micro"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
                SELECT doc_id, source,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS q
                FROM documents),
              m AS (
                SELECT source, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS sq,
                  CAST(SUM(q * q) AS BIGINT) AS sqq
                FROM d GROUP BY source)
              SELECT doc_id, d.source, q,
                CASE WHEN CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                       - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) > 0.0
                  THEN CAST(ROUND(((CAST(q AS DOUBLE) * CAST(n AS DOUBLE)
                    - CAST(sq AS DOUBLE))
                    / SQRT(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                      - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))) * 1e6, 0)
                    AS BIGINT)
                  ELSE NULL END AS z_micro
              FROM d JOIN m USING (source) ORDER BY doc_id""")
    ),

    // DSIR-style importance weights: score every train-split document by
    // how much its unigram distribution looks like the HELD-OUT (target)
    // split — sum over the doc's words of ln(p_target(w)/p_source(w)) with
    // add-one smoothing (the data-selection-with-importance-resampling
    // recipe; a pipeline keeps the top-weighted docs). The vocabulary
    // ratio table is tiny by construction (distinct words), so it
    // broadcasts into the per-doc scoring join; totals ride along as
    // broadcast single-row aggregates (t_tfidf's pattern) — the only wide
    // shuffle is the per-doc sum on doc_id. Each word's log-ratio is
    // rounded to integer micro-nats BEFORE summing, so the per-doc sum is
    // exact integer arithmetic — order-independent under any partitioning
    // (a raw double sum would hash-drift between engines and runs).
    "p_dsir_weights" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), (md5Bucket(col("doc_id")) < 14).as("is_src"),
            col("text"))
        val words = docs.select(col("doc_id"), col("is_src"),
          explode(WordNgrams(col("text"), 1)).as("w"))
        val byWord = words.groupBy("w").agg(
          sum(when(not(col("is_src")), 1L).otherwise(0L)).as("tc"),
          sum(when(col("is_src"), 1L).otherwise(0L)).as("sc"))
        val totals = byWord.agg(
          sum("tc").cast("double").as("tn"), sum("sc").cast("double").as("sn"),
          count(lit(1)).cast("double").as("v"))
        val ratios = byWord.crossJoin(broadcast(totals)).select(col("w"),
          round((log((col("tc") + 1) / (col("tn") + col("v")))
            - log((col("sc") + 1) / (col("sn") + col("v")))) * 1e6, 0)
            .cast("long").as("r_unats"))
        words.where(col("is_src"))
          .join(broadcast(ratios), "w")
          .groupBy("doc_id")
          .agg(sum("r_unats").as("w_unats"), count(lit(1)).as("n_words"))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (
                SELECT doc_id, text,
                  ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) AS a
                FROM documents),
              d AS (
                SELECT doc_id, text,
                  (CASE WHEN a >= 97 THEN a - 87 ELSE a - 48 END) < 14 AS is_src
                FROM h),
              wd AS (
                SELECT doc_id, is_src,
                  unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                    x -> x <> '')) AS w
                FROM d),
              bw AS (
                SELECT w,
                  SUM(CASE WHEN NOT is_src THEN 1 ELSE 0 END) AS tc,
                  SUM(CASE WHEN is_src THEN 1 ELSE 0 END) AS sc
                FROM wd GROUP BY w),
              tot AS (
                SELECT CAST(SUM(tc) AS DOUBLE) AS tn, CAST(SUM(sc) AS DOUBLE) AS sn,
                  CAST(COUNT(*) AS DOUBLE) AS v
                FROM bw),
              r AS (
                SELECT w, CAST(ROUND((ln((tc + 1) / (tn + v))
                  - ln((sc + 1) / (sn + v))) * 1e6, 0) AS BIGINT) AS r_unats
                FROM bw CROSS JOIN tot)
              SELECT wd.doc_id, CAST(SUM(r.r_unats) AS BIGINT) AS w_unats, COUNT(*) AS n_words
              FROM wd JOIN r USING (w) WHERE wd.is_src
              GROUP BY wd.doc_id ORDER BY wd.doc_id""")
    ),

    // the WHOLE training-data pipeline composed end to end — exact dedup →
    // quality/language gate → overlapping token-window chunking → per-shard
    // 512-token sequence packing → deterministic train/val tagging — with
    // one DuckDB oracle across the entire composition. Every stage is the
    // same operator its standalone query declares; this pins that they
    // compose (column contracts, shuffle boundaries) and stay exact.
    "p_e2e_pipeline" -> QueryDef(
      (s, dir) => {
        val cleaned = Dedup.exactDedup(t(s, dir, "documents"), "doc_id", "text")
          .withColumn("n_tokens", graft.ops.Text.tokenCount(col("text")))
          .withColumn("lang_pred", graft.ops.Text.langId(col("text")))
          .where(col("n_tokens") >= 20 && col("lang_pred") === "en")
        val chunks = cleaned.select(col("doc_id"),
            // the CJK-aware chunker (r16): byte-identical to word chunking
            // on this corpus by the TokenChunks contract, and the variant a
            // real multilingual run of this pipeline would want
            posexplode(graft.ops.Text.chunkCjk(col("text"), window = 32, stride = 24))
              .as(Seq("chunk_idx", "chunk")))
          .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
            graft.ops.Text.tokenCount(col("chunk")).as("n_tok"))
        val w = Window.partitionBy("shard").orderBy("doc_id", "chunk_idx")
        chunks.withColumn("shard", (col("doc_id") % 32).cast("long"))
          .withColumn("cum", sum(col("n_tok")).over(w))
          .withColumn("seq_id", expr("(cum - n_tok) div 512"))
          .withColumn("split",
            when(md5Bucket(col("doc_id")) < 14, lit("train")).otherwise(lit("val")))
          .select("shard", "doc_id", "chunk_idx", "n_tok", "seq_id", "split")
          .orderBy("doc_id", "chunk_idx")
      },
      Some("""WITH dedup AS (
                SELECT doc_id, text,
                  ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                FROM documents),
              cleaned AS (
                SELECT doc_id, text FROM dedup
                WHERE rn = 1
                  AND CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) >= 20
                  AND len(regexp_extract_all(text, '\b(the|and|of|to|a|in|is|it|that|for)\b')) >= 3),
              w AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
                FROM cleaned),
              k AS (
                SELECT doc_id, words,
                  GREATEST(CAST(CEIL((len(words) - 32) / 24.0) AS BIGINT) + 1, 1) AS nchunks
                FROM w),
              u AS (
                SELECT doc_id,
                  unnest(range(0, nchunks)) AS chunk_idx,
                  unnest(list_transform(range(0, nchunks),
                    x -> array_to_string(words[1 + x*24 : x*24 + 32], ' '))) AS chunk
                FROM k),
              c AS (
                SELECT doc_id, chunk_idx,
                  CAST(len(string_split_regex(trim(chunk), '\s+')) AS BIGINT) AS n_tok,
                  doc_id % 32 AS shard
                FROM u),
              sq AS (
                SELECT shard, doc_id, chunk_idx, n_tok,
                  SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id, chunk_idx) AS cum
                FROM c),
              h AS (
                SELECT doc_id, ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) AS a
                FROM documents)
              SELECT sq.shard, sq.doc_id, sq.chunk_idx, sq.n_tok,
                CAST((cum - n_tok) // 512 AS BIGINT) AS seq_id,
                CASE WHEN (CASE WHEN h.a >= 97 THEN h.a - 87 ELSE h.a - 48 END) < 14
                     THEN 'train' ELSE 'val' END AS split
              FROM sq JOIN h USING (doc_id) ORDER BY doc_id, chunk_idx""")
    ),

    // PII redaction: mask emails / phone numbers / IPv4 addresses with
    // typed placeholders, reporting per-doc match counts. The corpus has no
    // organic PII, so the query PLANTS it deterministically (doc_id-derived
    // email/phone/ip suffixes — the planted-oracle pattern d_semantic_dedup
    // uses): both engines seed identically, so the oracle proves the
    // scrubber finds and masks every planted item and nothing else. The
    // scrub itself (ops.Text.redactPii) is a per-row codegen'd
    // regexp_replace chain — shuffle-free at any corpus size.
    "p_pii_redact" -> QueryDef(
      (s, dir) => {
        val seeded = t(s, dir, "documents").select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" reach user"), col("doc_id"), lit("@example.com")))
              .otherwise(lit("")),
            when(col("doc_id") % 2 === 0,
              concat(lit(" call 555-"),
                lpad((col("doc_id") * 7919 % 10000).cast("string"), 4, "0")))
              .otherwise(lit("")),
            when(col("doc_id") % 5 === 0,
              concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
                lit("."), (col("doc_id") * 31 % 256).cast("string"), lit(".7")))
              .otherwise(lit(""))).as("text"))
        seeded.select(col("doc_id"),
          regexp_count(col("text"), lit(graft.ops.Text.EmailRe)).cast("long").as("n_emails"),
          regexp_count(col("text"), lit(graft.ops.Text.PhoneRe)).cast("long").as("n_phones"),
          regexp_count(col("text"), lit(graft.ops.Text.Ipv4Re)).cast("long").as("n_ips"),
          graft.ops.Text.redactPii(col("text")).as("redacted"))
          .orderBy("doc_id")
      },
      Some("""WITH seeded AS (
                SELECT doc_id, text ||
                  CASE WHEN doc_id % 3 = 0
                    THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com'
                    ELSE '' END ||
                  CASE WHEN doc_id % 2 = 0
                    THEN ' call 555-' || lpad(CAST(doc_id * 7919 % 10000 AS VARCHAR), 4, '0')
                    ELSE '' END ||
                  CASE WHEN doc_id % 5 = 0
                    THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.' ||
                         CAST(doc_id * 31 % 256 AS VARCHAR) || '.7'
                    ELSE '' END AS text
                FROM documents)
              SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
                CAST(len(regexp_extract_all(text, '\b555-[0-9]{4}\b')) AS BIGINT) AS n_phones,
                CAST(len(regexp_extract_all(text, '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b')) AS BIGINT) AS n_ips,
                regexp_replace(regexp_replace(regexp_replace(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  '\b555-[0-9]{4}\b', '<PHONE>', 'g'),
                  '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b', '<IP>', 'g') AS redacted
              FROM seeded ORDER BY doc_id""")
    ),

    // mixture-weighted corpus sampling: each source keeps a deterministic
    // fraction ((src# mod 4 + 1) * 4 of 16 md5 buckets -> 25/50/75/100%),
    // the way pre-training mixes re-weight domains. Hash-gated per row:
    // no RNG, no per-stratum pass, stable under re-partitioning — one
    // filtered scan at any scale.
    // reproducible global shuffle + sharding for training order: shard and
    // within-shard position derive from a seeded md5, so any run (and any
    // engine) deals the same deck. The per-shard window is the scale path —
    // nShards partitions, never a global sort
    "p_shuffle_shards" -> QueryDef(
      (s, dir) => {
        val h = md5(concat(lit("epoch1:"), col("doc_id").cast("string")).cast("binary"))
        val a = ascii(substring(col("h"), 1, 1))
        val hexVal = when(a >= 97, a - 87).otherwise(a - 48)
        t(s, dir, "documents")
          .select(col("doc_id"), h.as("h"))
          .withColumn("shard", (hexVal % 4).cast("long"))
          .withColumn("pos", row_number().over(
            Window.partitionBy("shard").orderBy(col("h"), col("doc_id"))).cast("long"))
          .select("shard", "pos", "doc_id")
          .orderBy("shard", "pos")
      },
      Some("""WITH h AS (
                SELECT doc_id, md5('epoch1:' || CAST(doc_id AS VARCHAR)) AS h
                FROM documents),
              s AS (
                SELECT doc_id, h,
                  CAST((CASE WHEN ascii(substr(h, 1, 1)) >= 97
                        THEN ascii(substr(h, 1, 1)) - 87
                        ELSE ascii(substr(h, 1, 1)) - 48 END) % 4 AS BIGINT) AS shard
                FROM h)
              SELECT shard,
                CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos,
                doc_id
              FROM s ORDER BY shard, pos""")
    ),

    // token-budget mixture sampling — "take N units of each source", the
    // pretraining-recipe primitive. Docs are taken in md5(doc_id) order
    // until the source's cumulative n_chars would exceed its budget
    // (inclusive prefix). The oracle restates the semantics as ONE global
    // per-source running-sum window — the single-reducer shape the Spark
    // side deliberately AVOIDS via ops.Mixture's two-phase bucket-prefix
    // plan (bounded bucket window + whole-bucket take + one straddling
    // bucket scanned per source), so the hash match proves the scalable
    // plan computes exactly the naive definition.
    "p_token_budget" -> QueryDef(
      (s, dir) => {
        val budget =
          ((regexp_extract(col("source"), "(\\d+)", 1).cast("long") % 3) + 1) * 2000
        graft.ops.Mixture.budgetPrefix(
          t(s, dir, "documents").select("doc_id", "source", "n_chars"),
          "source", "n_chars", budget, hexDigits = 1)
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
                SELECT doc_id, source, n_chars,
                  md5(CAST(doc_id AS VARCHAR)) AS ok,
                  (CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) % 3 + 1)
                    * 2000 AS b
                FROM documents),
              c AS (
                SELECT doc_id, source, n_chars, b,
                  SUM(n_chars) OVER (PARTITION BY source ORDER BY ok, doc_id)
                    AS cum
                FROM d)
              SELECT doc_id, source, n_chars FROM c
              WHERE cum <= b ORDER BY doc_id""")
    ),

    // temperature-flattened multi-source sampling (r15): budgets ∝ n_s^0.5
    // of one global token budget — the multilingual-pretraining recipe that
    // up-samples small sources — then the same md5-prefix deterministic
    // take as p_token_budget. α = 0.5 is the hash-exact operating point
    // (floor(sqrt(n)) is IEEE-identical on both engines, the division is
    // BIGINT); the oracle recomputes the flattened budgets and restates
    // the take as the naive per-source running sum.
    "p_temperature_mix" -> QueryDef(
      (s, dir) => graft.ops.Mixture.temperaturePrefix(
          t(s, dir, "documents").select("doc_id", "source", "n_chars"),
          "source", "n_chars", totalBudget = 30000L, alpha = 0.5,
          hexDigits = 1)
        .orderBy("doc_id"),
      Some("""WITH n AS (
                SELECT source, SUM(n_chars) AS n FROM documents GROUP BY source),
              w AS (
                SELECT source,
                  CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT) AS w
                FROM n),
              b AS (
                SELECT source, 30000 * w // (SELECT SUM(w) FROM w) AS b
                FROM w),
              d AS (
                SELECT doc_id, d.source, n_chars,
                  md5(CAST(doc_id AS VARCHAR)) AS ok, b
                FROM documents d JOIN b ON b.source = d.source),
              c AS (
                SELECT doc_id, source, n_chars, b,
                  SUM(n_chars) OVER (PARTITION BY source ORDER BY ok, doc_id)
                    AS cum
                FROM d)
              SELECT doc_id, source, n_chars FROM c
              WHERE cum <= b ORDER BY doc_id""")
    ),

    // token-budget mixing denominated in CJK-AWARE tokens (r16): the same
    // two-phase bucket-prefix take as p_token_budget, but the weight is
    // Text.tokenCount over a mixed-script corpus (CJK suffixes planted by
    // doc_id arithmetic, the t_script_mix pattern) — closing the loop the
    // r15 verdict named: budgets on a multilingual corpus are counted in
    // char-per-token CJK units, not whitespace chunks. The oracle restates
    // the planted counts arithmetically and the take as the naive global
    // running sum, so the CJK kernel's integration with the scalable
    // mixture plan is hash-gated end to end.
    "p_cjk_budget" -> QueryDef(
      (s, dir) => {
        val m = col("doc_id") % 3
        val planted = concat(col("text"),
          // 4 Han -> +4 tokens; 4 hiragana -> +4 tokens
          when(m === 1, " \u4f60\u597d\u4e16\u754c")
            .when(m === 2, " \u3072\u3089\u304c\u306a")
            .otherwise(""))
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            graft.ops.Text.tokenCount(planted).as("n_tok"))
        graft.ops.Mixture.budgetPrefix(docs, "source", "n_tok",
            lit(2000L), hexDigits = 1)
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
                SELECT doc_id, source,
                  CAST(len(string_split_regex(trim(text), '\s+')) +
                    CASE WHEN doc_id % 3 IN (1, 2) THEN 4 ELSE 0 END
                    AS BIGINT) AS n_tok,
                  md5(CAST(doc_id AS VARCHAR)) AS ok
                FROM documents),
              c AS (
                SELECT doc_id, source, n_tok,
                  SUM(n_tok) OVER (PARTITION BY source ORDER BY ok, doc_id)
                    AS cum
                FROM d)
              SELECT doc_id, source, n_tok FROM c
              WHERE cum <= 2000 ORDER BY doc_id""")
    ),

    "p_sample_mix" -> QueryDef(
      (s, dir) => {
        val rate = ((regexp_extract(col("source"), "(\\d+)", 1).cast("long") % 4) + 1) * 4
        t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            md5Bucket(col("doc_id")).cast("long").as("bucket"), rate.as("rate"))
          .where(col("bucket") < col("rate"))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (
                SELECT doc_id, source,
                  ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) AS a
                FROM documents),
              b AS (
                SELECT doc_id, source,
                  CAST(CASE WHEN a >= 97 THEN a - 87 ELSE a - 48 END AS BIGINT) AS bucket,
                  (CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) % 4 + 1) * 4 AS rate
                FROM h)
              SELECT doc_id, source, bucket, rate
              FROM b WHERE bucket < rate ORDER BY doc_id""")
    ),

    // deterministic WEIGHTED sampling (Efraimidis-Spirakis A-ES, the
    // weighted reservoir scheme, with the RNG replaced by an md5-derived
    // uniform): per doc u = (first 13 md5 hex digits + 0.5) / 2^52 — an
    // EXACT power-of-two division, so u is bit-identical on both engines —
    // and key = -ln(u)/w with w = token count; the k smallest keys per
    // source are an exact w-weighted sample without replacement. Longer
    // docs are proportionally likelier, re-running is idempotent, and the
    // selection is reproducible across engines/partitionings (an RNG
    // sample is none of those). Keys round once to integer micro-units
    // (doc_id tie-break), the registry's standard float discipline. The
    // k winners per source ride the bounded MinKPairs aggregator, NOT a
    // window: sources are few and huge, so a partitioned window would
    // sort each source in full on one task, while the k-pair buffer
    // map-side combines and shuffles k rows per source per partition.
    "p_weighted_sample" -> QueryDef(
      (s, dir) => {
        val h = conv(substring(md5(col("doc_id").cast("string").cast("binary")),
          1, 13), 16, 10).cast("long")
        val u = (h.cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
        // CJK-aware weight (count-identical to the oracle's whitespace
        // restatement on this non-CJK corpus by the TokenCount contract)
        val w = graft.ops.Text.tokenCount(col("text")).cast("double")
        val key = round(-log(u) / w * 1e6, 0).cast("long")
        val topk = udaf(graft.functions.TypedAggs.MinKPairs(10))
        t(s, dir, "documents")
          .select(col("source"), key.as("key_units"), col("doc_id"))
          .groupBy("source")
          .agg(topk(col("key_units"), col("doc_id")).as("tk"))
          .select(col("source"), posexplode(col("tk")).as(Seq("i", "p")))
          .select(col("p._2").as("doc_id"), col("source"),
            col("p._1").as("key_units"), (col("i") + 1).cast("long").as("rk"))
          .orderBy("source", "rk")
      },
      Some("""WITH k AS (
                SELECT doc_id, source,
                  CAST(ROUND(-ln((CAST(CAST('0x' ||
                      substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT)
                      AS DOUBLE) + 0.5) / 4503599627370496.0)
                    / len(string_split_regex(trim(text), '\s+')) * 1e6, 0)
                    AS BIGINT) AS key_units
                FROM documents),
              r AS (
                SELECT doc_id, source, key_units,
                  CAST(ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY key_units, doc_id) AS BIGINT) AS rk
                FROM k)
              SELECT doc_id, source, key_units, rk FROM r
              WHERE rk <= 10 ORDER BY source, rk""")
    ),

    // CCNet-style perplexity filter: bigram LM trained on the 14/16
    // md5-bucket split (the DSIR source split), held-out docs scored by
    // total NLL in integer micro-nats and gated at mean 5 nats/bigram —
    // all integer arithmetic after one per-term rounding, so the DuckDB
    // twin (same fixed model definition) matches hash-exactly. See
    // ops.Text.lmPerplexity for the model and scale-shape contract.
    "p_lm_perplexity" -> QueryDef(
      (s, dir) => graft.ops.Text.lmPerplexity(
        t(s, dir, "documents"), "doc_id", "text",
        md5Bucket(col("doc_id")) < 14)
        .orderBy("doc_id"),
      Some("""WITH h AS (
                SELECT doc_id, text,
                  ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) AS a
                FROM documents),
              d AS (
                SELECT doc_id, text,
                  (CASE WHEN a >= 97 THEN a - 87 ELSE a - 48 END) < 14 AS is_train
                FROM h),
              w AS (
                SELECT doc_id, is_train,
                  list_filter(string_split_regex(trim(lower(text)), '\s+'),
                    x -> x <> '') AS words
                FROM d),
              tok AS (SELECT is_train, unnest(words) AS u FROM w),
              c1 AS (SELECT u, COUNT(*) AS c1 FROM tok WHERE is_train GROUP BY u),
              vv AS (SELECT CAST(COUNT(*) + 1 AS DOUBLE) AS v FROM c1),
              pr AS (
                SELECT doc_id, is_train,
                  unnest(list_transform(range(1, len(words)), x -> words[x])) AS u,
                  unnest(list_transform(range(1, len(words)), x -> words[x + 1])) AS v
                FROM w WHERE len(words) >= 2),
              c2 AS (SELECT u, v, COUNT(*) AS c2 FROM pr WHERE is_train GROUP BY u, v),
              tp AS (
                SELECT p.doc_id,
                  CASE WHEN cu.u IS NULL THEN '<unk>' ELSE p.u END AS mu,
                  CASE WHEN cv.u IS NULL THEN '<unk>' ELSE p.v END AS mv
                FROM pr p
                LEFT JOIN c1 cu ON p.u = cu.u
                LEFT JOIN c1 cv ON p.v = cv.u
                WHERE NOT p.is_train),
              terms AS (
                SELECT t.doc_id,
                  CAST(ROUND(-ln((COALESCE(c2.c2, 0) + 1.0)
                    / (COALESCE(c1.c1, 0) + vv.v)) * 1e6, 0) AS BIGINT) AS t_unats
                FROM tp t
                LEFT JOIN c1 ON t.mu = c1.u
                LEFT JOIN c2 ON t.mu = c2.u AND t.mv = c2.v
                CROSS JOIN vv),
              agg AS (
                SELECT doc_id, SUM(t_unats) AS nll_unats, COUNT(*) AS n_bigrams
                FROM terms GROUP BY doc_id)
              SELECT d.doc_id,
                CAST(COALESCE(a.nll_unats, 0) AS BIGINT) AS nll_unats,
                CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                CAST(COALESCE(a.nll_unats, 0)
                  <= COALESCE(a.n_bigrams, 0) * 5000000 AS BIGINT) AS kept
              FROM d LEFT JOIN agg a USING (doc_id)
              WHERE NOT d.is_train
              ORDER BY doc_id""")
    ),

    // token-distribution drift between the two halves of the md5 split:
    // top-50 per-word contributions to KL(P_left || P_right), nano-nat
    // integers (exact after one rounding). The monitoring pass a mix shift
    // shows up in first. See ops.Text.tokenKlDrift.
    "p_kl_drift" -> QueryDef(
      (s, dir) => graft.ops.Text.tokenKlDrift(
        t(s, dir, "documents"), "text",
        md5Bucket(col("doc_id")) < 8, topK = 50),
      Some("""WITH h AS (
                SELECT doc_id, text,
                  ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) AS a
                FROM documents),
              d AS (
                SELECT text,
                  (CASE WHEN a >= 97 THEN a - 87 ELSE a - 48 END) < 8 AS is_left
                FROM h),
              tok AS (
                SELECT is_left,
                  unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                    x -> x <> '')) AS w
                FROM d),
              bw AS (
                SELECT w,
                  CAST(SUM(CASE WHEN is_left THEN 1 ELSE 0 END) AS BIGINT) AS cl,
                  CAST(SUM(CASE WHEN NOT is_left THEN 1 ELSE 0 END) AS BIGINT) AS cr
                FROM tok GROUP BY w),
              tot AS (
                SELECT CAST(SUM(cl) AS DOUBLE) AS tl, CAST(SUM(cr) AS DOUBLE) AS tr,
                  CAST(COUNT(*) AS DOUBLE) AS vv
                FROM bw)
              SELECT w AS word, cl, cr,
                CAST(ROUND(((cl + 1.0) / (tl + vv))
                  * (ln((cl + 1.0) / (tl + vv)) - ln((cr + 1.0) / (tr + vv)))
                  * 1e9, 0) AS BIGINT) AS kl_nnats
              FROM bw CROSS JOIN tot
              ORDER BY kl_nnats DESC, word
              LIMIT 50""")
    )
  )
}
