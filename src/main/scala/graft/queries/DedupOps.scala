package graft.queries

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Deduplication queries over `documents`. Exact dedup has a direct SQL
  * oracle; the near-dup families (MinHash-LSH, SimHash, n-gram Jaccard) are
  * deterministic but hash-implementation-specific, so the driver records
  * rows-only checks for them — their correctness is pinned by DedupSpec
  * (hand-computable fixtures) instead.
  */
object DedupOps {
  import Tables.t

  /** Per-invocation scratch World for the incremental-store queries: a
    * fresh dir each run (a REUSED store would change the answer — batch 1
    * would be all-duplicates on the second run), recursively deleted at
    * JVM exit so bench/verify/lint passes, which construct every declared
    * query repeatedly, cannot accumulate stores in the temp dir. */
  private val tempDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  // ONE static hook draining the queue: bench/verify/lint construct every
  // declared query repeatedly in one JVM, so a per-invocation hook would
  // accumulate a Thread (plus retained path) per call, unboundedly
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    var dir = tempDirs.poll()
    while (dir != null) {
      try {
        java.nio.file.Files.walk(dir)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
      dir = tempDirs.poll()
    }
  }))
  private def tempStore(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    tempDirs.add(dir)
    dir.toString
  }

  val defs: Map[String, QueryDef] = Map(

    // winnowing-fingerprint PARTIAL-overlap detection (r16): the use the
    // MOSS scheme exists for — pairs of documents sharing a substring,
    // not whole-document similarity. Docs are planted with a 64-char
    // shared slug per group of 8 (md5 of doc_id div 8, repeated), so the
    // winnowing guarantee (any shared span >= w+k-1 = 11 chars forces a
    // shared fingerprint) makes every in-group pair detectable. Scale
    // shape: equi-join on the fingerprint VALUE with a document-frequency
    // cap dropping boilerplate fingerprints first (the PPJoin stop-key
    // discipline) — per-key fan-out bounded, never all-pairs.
    "d_winnow_overlap" -> QueryDef(
      (s, dir) => {
        val slug = concat(col("text"), lit(" "),
          md5(expr("cast(doc_id div 8 as string)").cast("binary")),
          md5(expr("cast(doc_id div 8 as string)").cast("binary")))
        val fps = t(s, dir, "documents").where(col("doc_id") < 200)
          .select(col("doc_id"),
            explode(graft.functions.WinnowFingerprints(
              lower(regexp_replace(slug, "\\s+", "")), 8, 4)).as("fp"))
        val rare = fps.groupBy("fp").agg(count(lit(1)).as("df"))
          .where(col("df") <= 16).select("fp")
        val pruned = fps.join(rare, Seq("fp"))
        pruned.as("a").join(pruned.as("b"),
            col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .agg(count(lit(1)).as("n_shared"))
          .where(col("n_shared") >= 5)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH t AS (
                SELECT doc_id, lower(regexp_replace(
                    text || ' ' || repeat(md5(CAST(doc_id // 8 AS VARCHAR)), 2),
                    '\s+', '', 'g')) AS t
                FROM documents WHERE doc_id < 200),
              g AS (
                SELECT doc_id,
                  list_transform(range(0, GREATEST(length(t) - 8 + 1, 0)),
                    x -> CAST('0x' || substr(md5(t[x + 1 : x + 8]), 1, 13)
                      AS BIGINT)) AS h
                FROM t),
              f AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                    range(0, GREATEST(len(h) - 4 + 1, 1)),
                    j -> list_aggregate(h[j + 1 : LEAST(j + 4, len(h))], 'min')
                  ))) AS fp
                FROM g WHERE len(h) >= 1),
              rare AS (SELECT fp FROM f GROUP BY fp HAVING COUNT(*) <= 16),
              p AS (SELECT f.doc_id, f.fp FROM f JOIN rare USING (fp))
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                COUNT(*) AS n_shared
              FROM p a JOIN p b ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY 1, 2 HAVING COUNT(*) >= 5
              ORDER BY id_a, id_b""")
    ),

    "d_exact_groups" -> QueryDef(
      (s, dir) => Dedup.exactGroups(t(s, dir, "documents"), col("doc_id"), col("text"))
        .select(col("keep_id"), col("h"), col("n"))
        .orderBy("keep_id"),
      Some("""SELECT MIN(doc_id) AS keep_id, md5(text) AS h, COUNT(*) AS n
              FROM documents GROUP BY md5(text) ORDER BY keep_id""")
    ),

    // leading-prefix duplicate groups: docs sharing their first 8
    // normalized tokens (mirror-crawl and template-page artifacts that
    // diverge only later in the body — exact dedup misses them, near-dup
    // machinery is overkill). One groupBy on the prefix string; the prefix
    // is bounded so keys are small regardless of document length.
    // asymmetric CONTAINMENT near-dup (|A∩B| / |A|): catches a document
    // SUBSUMED by a larger one (quotes, excerpts, doc-in-doc) that
    // symmetric Jaccard under-scores — the containment face of the
    // shingle family. Query side bounded (doc_id < 30); candidate pairs
    // come only from the shared-gram equality join (never all pairs), the
    // intersection count rides that join's aggregation, and the score is
    // an exact integer percent (100·|∩| div |A|) — no float drift.
    "d_containment" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val grams = docs.select(col("doc_id"),
          explode(Dedup.shingles(col("text"), 4)).as("g")).distinct()
        val q = grams.where(col("doc_id") < 30)
          .select(col("doc_id").as("q_id"), col("g"))
        val nq = q.groupBy("q_id").agg(count(lit(1)).as("nq"))
        val inter = q.join(
            grams.select(col("doc_id").as("t_id"), col("g")), "g")
          .where(col("q_id") =!= col("t_id"))
          .groupBy("q_id", "t_id").agg(count(lit(1)).as("ninter"))
        inter.join(nq, "q_id")
          .select(col("q_id"), col("t_id"),
            expr("CAST(100 * ninter div nq AS BIGINT)").as("cont_pct"))
          .where(col("cont_pct") >= 50)
          .orderBy("q_id", "t_id")
      },
      Some("""WITH w AS (SELECT doc_id,
                string_split_regex(trim(lower(text)), '\s+') AS words
              FROM documents),
              g AS (SELECT doc_id,
                unnest(list_distinct(list_filter(
                  list_transform(range(0, GREATEST(len(words) - 4, 0) + 1),
                    x -> array_to_string(words[x + 1 : x + 4], ' ')),
                  s -> s <> ''))) AS g
                FROM w),
              q AS (SELECT doc_id AS q_id, g FROM g WHERE doc_id < 30),
              nq AS (SELECT q_id, COUNT(*) AS nq FROM q GROUP BY q_id),
              inter AS (SELECT q.q_id, g.doc_id AS t_id, COUNT(*) AS ninter
                FROM q JOIN g ON g.g = q.g AND g.doc_id <> q.q_id
                GROUP BY q.q_id, g.doc_id)
              SELECT i.q_id, i.t_id,
                CAST(100 * i.ninter // n.nq AS BIGINT) AS cont_pct
              FROM inter i JOIN nq n ON n.q_id = i.q_id
              WHERE 100 * i.ninter // n.nq >= 50
              ORDER BY i.q_id, i.t_id""")
    ),

    "d_prefix_dup" -> QueryDef(
      (s, dir) => {
        val pfx = array_join(
          slice(split(lower(trim(col("text"))), "\\s+"), 1, 8), " ")
        t(s, dir, "documents").select(col("doc_id"), pfx.as("prefix"))
          .groupBy("prefix")
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
          .where(col("n") > 1)
          .select("keep_id", "n").orderBy("keep_id")
      },
      Some("""WITH p AS (SELECT doc_id,
                array_to_string((string_split_regex(trim(lower(text)), '\s+'))[1:8], ' ') AS prefix
              FROM documents)
              SELECT MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n
              FROM p GROUP BY prefix HAVING COUNT(*) > 1 ORDER BY keep_id""")
    ),

    "d_exact_dedup" -> QueryDef(
      (s, dir) => Dedup.exactDedup(t(s, dir, "documents"), "doc_id", "text")
        .select("doc_id", "n_chars").orderBy("doc_id"),
      Some("""SELECT doc_id, n_chars FROM documents
              WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text))
              ORDER BY doc_id""")
    ),

    // transitive duplicate GROUPS via distributed connected components.
    // Edges are a CHAIN per fingerprint class (each doc links only to the
    // next doc id with the same fingerprint), so reaching the group minimum
    // genuinely requires transitive propagation — and the expected result is
    // still SQL-expressible (min doc_id per fingerprint), giving the
    // iterative graph algorithm a full DuckDB oracle.
    "d_neardup_groups" -> QueryDef(
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"), graft.ops.Text.fingerprint(col("text")).as("fp"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("fp").orderBy("doc_id")
        val edges = d.withColumn("nxt", lead(col("doc_id"), 1).over(w))
          .where(col("nxt").isNotNull)
          .select(col("doc_id").as("src"), col("nxt").as("dst"))
        Dedup.connectedComponents(d.select(col("doc_id").as("id")), edges)
          .orderBy("id")
      },
      Some("""SELECT doc_id AS id,
                MIN(doc_id) OVER (PARTITION BY md5(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS group_id
              FROM documents ORDER BY id""")
    ),

    // SemDedup over embeddings (cluster with the shared IVF trainer, exact
    // cosine within clusters, larger id drops). The oracle comes from a
    // PLANTED-DUPLICATE construction: exact copies of the first 50 vectors
    // re-enter under ids +1_000_000. Every planted copy MUST drop (identical
    // vector -> same cluster by determinism of the assignment, cosine 1,
    // smaller-id twin), and no original may drop (the corpus' max pairwise
    // cosine is ~0.5, far under the 0.9 threshold, and each original is the
    // SMALLER id of its planted pair) — so the expected survivor set is
    // exactly the original corpus, which IS SQL-expressible. This checks the
    // whole pipeline end to end: a missed planted dup or a false drop both
    // break the hash.
    "d_semantic_dedup" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
        val planted = emb.where(col("vec_id") < 50)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
        Dedup.semanticDedup(emb.unionAll(planted), threshold = 0.9)
          .select("vec_id").orderBy("vec_id")
      },
      Some("""SELECT vec_id FROM embeddings ORDER BY vec_id""")
    ),

    // paragraph-grain exact dedup (the CCNet pass): every later occurrence
    // of a repeated 8-token segment drops, documents are rebuilt from the
    // survivors. The full composition — segment → global first-occurrence
    // window on the content digest → positional reassembly — sits under one
    // exact oracle (DuckDB re-derives the segmentation and the window).
    "d_paragraph_dedup" -> QueryDef(
      (s, dir) => graft.ops.Clean.paragraphDedup(
        t(s, dir, "documents"), "doc_id", "text", window = 8)
        .orderBy("doc_id"),
      Some("""WITH w AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
                FROM documents),
              k AS (
                SELECT doc_id, words,
                  GREATEST(CAST(CEIL((len(words) - 8) / 8.0) AS BIGINT) + 1, 1) AS n
                FROM w),
              u AS (
                SELECT doc_id,
                  unnest(range(0, n)) AS seg_idx,
                  unnest(list_transform(range(0, n),
                    x -> array_to_string(words[1 + x*8 : x*8 + 8], ' '))) AS seg
                FROM k),
              r AS (
                SELECT doc_id, seg_idx, seg,
                  ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
                FROM u)
              SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text,
                COUNT(*) AS n_kept
              FROM r WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id""")
    ),

    // repeated-substring spans (suffix-array dedup re-expressed as shared
    // k-gram runs + gaps-and-islands; see Dedup.duplicateSpans). Fully
    // relational semantics -> full oracle: DuckDB restates the k-gram
    // marking and the island merge over gram STRINGS while Spark runs the
    // same plan over a 128-bit gram digest — a hash collision, a window
    // bug, or an off-by-one in span extension all break the hash.
    "d_span_dedup" -> QueryDef(
      (s, dir) => Dedup.duplicateSpans(t(s, dir, "documents"), "doc_id", "text",
        k = 8, minDocs = 2)
        .orderBy("doc_id", "span_start"),
      Some("""WITH toks AS (
                SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
                FROM documents),
              pos AS (
                SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 7, 0))) AS i FROM toks),
              grams AS (
                SELECT doc_id, i - 1 AS pos, array_to_string(w[i:i+7], ' ') AS g FROM pos),
              dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
              hits AS (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)),
              isl AS (SELECT doc_id, pos,
                        pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
                      FROM hits)
              SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 7 AS span_end,
                     MAX(pos) + 8 - MIN(pos) AS span_tokens
              FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start""")
    ),

    // the scrub face: duplicated-span tokens excised, documents rebuilt
    // from the survivors (fully-duplicated docs vanish — passage-level
    // dedup subsumes exact dedup). Text reassembly under the oracle pins
    // the whole composition, not just the span arithmetic.
    "d_span_scrub" -> QueryDef(
      (s, dir) => Dedup.stripDuplicateSpans(t(s, dir, "documents"), "doc_id", "text",
        k = 8, minDocs = 2)
        .orderBy("doc_id"),
      Some("""WITH toks AS (
                SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
                FROM documents),
              tok AS (
                SELECT doc_id, unnest(generate_series(1, len(w))) - 1 AS pos, w FROM toks),
              tokens AS (SELECT doc_id, pos, w[pos + 1] AS tk FROM tok),
              gpos AS (
                SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 7, 0))) AS i FROM toks),
              grams AS (
                SELECT doc_id, i - 1 AS pos, array_to_string(w[i:i+7], ' ') AS g FROM gpos),
              dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
              hits AS (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)),
              covered AS (
                SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + 7)) AS cpos FROM hits),
              kept AS (
                SELECT t.doc_id, t.pos, t.tk FROM tokens t
                LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.cpos
                WHERE c.doc_id IS NULL)
              SELECT doc_id, string_agg(tk, ' ' ORDER BY pos) AS clean_text
              FROM kept GROUP BY doc_id ORDER BY doc_id""")
    ),

    "d_minhash_lsh" -> QueryDef(
      (s, dir) => Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        numHashes = 64, bands = 8, threshold = 0.5)
        .orderBy("id_a", "id_b"),
      None
    ),

    // the MinHash-LSH pipeline under the FULL oracle gate, at the one
    // operating point where LSH recall is PROVABLY exact rather than
    // probabilistic: jaccard = 1. Exact copies of the first 50 docs
    // re-enter under ids +1_000_000; an identical shingle set yields an
    // identical signature, hence identical keys in EVERY band — candidate
    // generation cannot miss it, no pigeonhole argument needed. With the
    // verify threshold at 100%, floor(inter*100/uni) >= 100 <=> the sets
    // are EQUAL, so the expected output — planted pairs plus any organic
    // identical-shingle-set pairs — is derivable in SQL by brute-force set
    // comparison (same construction as d_ngram_jaccard's oracle, no hash
    // shared between the engines). A banding bug (missed candidate) or a
    // verify bug (false positive) both break the hash; the probabilistic
    // sub-1.0 recall curve stays covered by d_minhash_lsh + DedupSpec's
    // measured floors.
    "d_minhash_exact" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val planted = docs.where(col("doc_id") < 50)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        Dedup.minhashLshPairs(docs.unionAll(planted), "doc_id", "text",
          numHashes = 64, bands = 8, threshold = 1.0)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH all_docs AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text
                FROM documents WHERE doc_id < 50),
              w AS (
                SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS words
                FROM all_docs),
              sh AS (
                SELECT doc_id,
                  list_distinct(list_transform(range(0, GREATEST(len(words) - 2, 0)),
                    x -> words[x + 1] || ' ' || words[x + 2] || ' ' || words[x + 3])) AS s
                FROM w),
              nz AS (SELECT doc_id, list_sort(s) AS s FROM sh WHERE len(s) > 0)
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(100 AS BIGINT) AS jaccard_pct
              FROM nz a JOIN nz b ON a.doc_id < b.doc_id AND a.s = b.s
              ORDER BY id_a, id_b""")
    ),

    "d_simhash" -> QueryDef(
      (s, dir) => Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", maxDist = 3)
        .orderBy("id_a", "id_b"),
      None
    ),

    // the SimHash pipeline under the FULL oracle gate, at the operating
    // point where recall is PROVABLE rather than probabilistic: exact
    // copies of the first 50 docs re-enter under ids +1_000_000; an
    // identical text yields an identical 64-bit signature, whose blocks
    // match in EVERY pigeonhole band — candidate generation cannot miss
    // the pair, and its verified Hamming distance is exactly 0. The
    // emitted set is distance-0 pairs RESTRICTED to fingerprint-equal
    // texts (equal normalized text => equal signature, so the conjunction
    // only removes 64-bit collisions of DIFFERENT texts, which no SQL
    // oracle could predict) — derivable in DuckDB by self-joining on the
    // t_fingerprint normalization. A shift/banding bug (missed pair) or a
    // distance bug (nonzero hamming) both break the hash; the
    // probabilistic <=3-distance surface stays covered by d_simhash +
    // DedupSpec's fixtures.
    "d_simhash_exact" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val planted = docs.where(col("doc_id") < 50)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val all = docs.unionAll(planted)
        val fp = all.select(col("doc_id"),
          md5(graft.functions.NormalizeWs(col("text"))).as("fp"))
        Dedup.simhashPairs(all, "doc_id", "text", maxDist = 1)
          .where(col("hamming") === 0)
          .join(fp.select(col("doc_id").as("id_a"), col("fp").as("fp_a")), "id_a")
          .join(fp.select(col("doc_id").as("id_b"), col("fp").as("fp_b")), "id_b")
          .where(col("fp_a") === col("fp_b"))
          .select(col("id_a"), col("id_b"), col("hamming"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH all_docs AS (
                SELECT doc_id,
                  md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
                FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id,
                  md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
                FROM documents WHERE doc_id < 50)
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(0 AS BIGINT) AS hamming
              FROM all_docs a JOIN all_docs b
                ON a.doc_id < b.doc_id AND a.fp = b.fp
              ORDER BY id_a, id_b""")
    ),

    // the PPJoin's exactness claim (prefix/positional/length filters are
    // pure prunes) is verified against a BRUTE-FORCE all-pairs oracle:
    // DuckDB recomputes word 3-gram shingle sets and exact Jaccard over
    // every pair — no filter trick shared with the Spark side, so any
    // pruning bug (a dropped true pair) hash-fails
    "d_ngram_jaccard" -> QueryDef(
      (s, dir) => Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("id_a", "id_b"),
      Some("""WITH w AS (
                SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS words
                FROM documents),
              sh AS (
                SELECT doc_id,
                  list_distinct(list_transform(range(0, GREATEST(len(words) - 2, 0)),
                    x -> words[x + 1] || ' ' || words[x + 2] || ' ' || words[x + 3])) AS s
                FROM w),
              nz AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
              pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  len(list_intersect(a.s, b.s)) AS inter,
                  len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS uni
                FROM nz a JOIN nz b ON a.doc_id < b.doc_id)
              SELECT id_a, id_b, CAST(inter * 100 // uni AS BIGINT) AS jaccard_pct
              FROM pairs WHERE inter * 100 >= uni * 50
              ORDER BY id_a, id_b""")
    ),

    // MinHash ESTIMATE gate: the numeric accuracy check for the sketch the
    // LSH family is built on (HLL/percentile/CMS all have gates; this
    // closes the set). Thirty PLANTED pairs with a controlled spread of
    // known Jaccards — doc i vs (doc i ++ doc i+1), whose companion
    // shingle set is a superset, so J = |sh_i| / |sh_comp| varies with
    // document sizes — must each see the 64-component signature agreement
    // rate within 0.25 of the exact Jaccard: E[agreement] = J, 3sigma at
    // J = 0.5 is ~0.19, so 0.25 is the catastrophic-failure margin (a
    // wrong seed or an off-by-one in the signature loop blows it) while
    // the fixed (data, seed) pair keeps the flag deterministic. Pure
    // integers: |100·est − 64·J_pct| <= 1600.
    "d_minhash_gate" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val base = docs.where(col("doc_id") < 30)
          .select(col("doc_id"), col("text"))
        val nxt = docs.select((col("doc_id") - 1).as("doc_id"),
          col("text").as("text2"))
        val a = base.select(col("doc_id"),
          graft.functions.WordShingles(col("text"), 3).as("sh_a"))
        val b = base.join(nxt, "doc_id")
          .select(col("doc_id"), graft.functions.WordShingles(
            concat(col("text"), lit(" "), col("text2")), 3).as("sh_b"))
        a.join(b, "doc_id")
          .select(col("doc_id"),
            graft.functions.JaccardPct(col("sh_a"), col("sh_b"))
              .as("jaccard_pct"),
            size(filter(zip_with(
              graft.functions.MinHashSignature(col("sh_a"), 64),
              graft.functions.MinHashSignature(col("sh_b"), 64),
              (x, y) => x === y), p => p)).cast("long").as("est_cnt"))
          .select(col("doc_id"), col("jaccard_pct"),
            (abs(lit(100L) * col("est_cnt") - lit(64L) * col("jaccard_pct"))
              <= lit(1600L)).cast("bigint").as("within_bound"))
          .orderBy("doc_id")
      },
      Some("""WITH pair AS (
                SELECT d.doc_id, d.text AS ta, d.text || ' ' || n.text AS tb
                FROM documents d JOIN documents n ON n.doc_id = d.doc_id + 1
                WHERE d.doc_id < 30),
              sh AS (
                SELECT doc_id,
                  list_distinct(list_transform(
                    range(0, GREATEST(len(string_split_regex(trim(lower(ta)), '\s+')) - 2, 0)),
                    x -> string_split_regex(trim(lower(ta)), '\s+')[x + 1] || ' ' ||
                         string_split_regex(trim(lower(ta)), '\s+')[x + 2] || ' ' ||
                         string_split_regex(trim(lower(ta)), '\s+')[x + 3])) AS sa,
                  list_distinct(list_transform(
                    range(0, GREATEST(len(string_split_regex(trim(lower(tb)), '\s+')) - 2, 0)),
                    x -> string_split_regex(trim(lower(tb)), '\s+')[x + 1] || ' ' ||
                         string_split_regex(trim(lower(tb)), '\s+')[x + 2] || ' ' ||
                         string_split_regex(trim(lower(tb)), '\s+')[x + 3])) AS sb
                FROM pair)
              SELECT doc_id,
                CAST(len(list_intersect(sa, sb)) * 100 //
                  (len(sa) + len(sb) - len(list_intersect(sa, sb)))
                  AS BIGINT) AS jaccard_pct,
                CAST(1 AS BIGINT) AS within_bound
              FROM sh ORDER BY doc_id""")
    ),

    // the CROSS-RUN incremental MinHash-LSH store under the full oracle
    // gate, at the provably-exact operating point (the d_minhash_exact
    // discipline applied to the incremental face): batch 1 registers the
    // whole corpus's banded keys; batch 2 carries (a) EXACT-text copies of
    // the first 30 docs under +1M ids — identical shingle set => identical
    // signature => identical key in EVERY band, so the store join cannot
    // miss them (no probabilistic argument), all provably dropped even
    // when the original itself lost a within-batch-1 collision (losers
    // register as witnesses) — and (b) 30 synthetic docs under +2M ids
    // whose words are md5 hex strings (shingle sets disjoint from
    // everything; a spurious all-8-hash band collision is a ~2^-64
    // xxhash64-deterministic event), all kept. Fresh output = exactly the
    // synthetic ids, SQL-derivable. The probabilistic sub-1.0 recall curve
    // and the store-size/replay contracts are DedupSpec's.
    "d_minhash_inc" -> QueryDef(
      (s, dir) => {
        import graft.core.DimMapping
        import graft.world.World
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val path = tempStore("graft-minhash-inc")
        val w = World(s, path)("bk64" -> DimMapping(0L, -1L, 1L << 59))
        val copies = docs.where(col("doc_id") < 30)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val synth = docs.where(col("doc_id") < 30)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat_ws(" ", transform(sequence(lit(0), lit(39)),
              i => md5(concat(lit("inc-"), col("doc_id").cast("string"),
                lit("-"), i.cast("string")))))
              .as("text"))
        Dedup.incrementalMinHashLsh(w, docs, "doc_id", "text")
        Dedup.incrementalMinHashLsh(w, copies.unionAll(synth),
            "doc_id", "text")
          .select("doc_id").orderBy("doc_id")
      },
      Some("""SELECT doc_id + 2000000 AS doc_id
              FROM documents WHERE doc_id < 30 ORDER BY doc_id""")
    ),

    // cross-batch incremental winnow store (r16): batch 1 registers a
    // bounded corpus slice's fingerprints; batch 2 = exact COPIES of seen
    // docs (share every fingerprint -> provably dropped at minShared=1,
    // given the copy has at least one fingerprint, i.e. >= k stripped
    // chars) + synthetic DIGIT-alphabet docs (the corpus is pure letters +
    // single spaces, so no 8-gram of a digit string can ever match a
    // corpus gram -> provably kept). The oracle asserts exactly the
    // survivor id set from doc arithmetic — the d_minhash_inc pattern at
    // this operator's provably-exact operating point.
    "d_winnow_inc" -> QueryDef(
      (s, dir) => {
        import graft.core.DimMapping
        import graft.world.World
        val stripped = regexp_replace(col("text"), "\\s+", "")
        val docs = t(s, dir, "documents")
          .where(col("doc_id") < 2000)
          .select(col("doc_id"), stripped.as("t"))
        val path = tempStore("graft-winnow-inc")
        val w = World(s, path)("fp52" -> DimMapping(0L, -1L, 1L << 48))
        val copies = docs.where(col("doc_id") < 30)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("t"))
        // digit-only synth: hex md5 with its letters mapped to digits
        val synth = docs.where(col("doc_id") < 30)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            translate(md5(concat(lit("winc-"), col("doc_id").cast("string"))
              .cast("binary")), "abcdef", "012345").as("t"))
        Dedup.incrementalWinnow(w, docs, "doc_id", "t")
        Dedup.incrementalWinnow(w, copies.unionAll(synth), "doc_id", "t")
          .select("doc_id").orderBy("doc_id")
      },
      Some("""SELECT doc_id + 1000000 AS doc_id FROM documents
              WHERE doc_id < 30
                AND length(regexp_replace(text, '\s+', '', 'g')) < 8
              UNION ALL
              SELECT doc_id + 2000000 AS doc_id FROM documents
              WHERE doc_id < 30
              ORDER BY doc_id""")
    ),

    // canonical-survivor selection by QUALITY: within each exact-duplicate
    // group, keep the highest-quality copy (stopword-density proxy, doc_id
    // tie-break) instead of the arbitrary min-id — real pipelines pick the
    // copy with the best provenance/quality, and "which copy survives"
    // changes downstream mixture weights. The pick is a skew-immune
    // min(struct) AGGREGATE riding the fingerprint shuffle — never a
    // per-group window sort, so a pathological million-copy group costs
    // one combine tree, not one task.
    "d_canonical_pick" -> QueryDef(
      (s, dir) => {
        // planted mirror copies: first 50 docs re-enter with SMALLER ids
        // and a worse provenance rank (src99) — a min-id survivor rule
        // would keep the mirrors, so the oracle (original ids win) proves
        // the PRIORITY ordering is doing the work, not the id tie-break
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text"))
        val planted = docs.where(col("doc_id") < 50)
          .select((col("doc_id") - 1000000L).as("doc_id"),
            lit("src99").as("source"), col("text"))
        val scored = docs.unionAll(planted).select(col("doc_id"),
          md5(col("text")).as("fp"),
          regexp_extract(col("source"), "(\\d+)", 1).cast("long").as("prio"))
        scored.groupBy("fp").agg(
            count(lit(1)).as("n_copies"),
            min(struct(col("prio").as("prio"), col("doc_id").as("doc_id")))
              .as("pick"))
          .select(col("pick.doc_id").as("doc_id"), col("pick.prio").as("prio"),
            col("n_copies"))
          .orderBy("doc_id")
      },
      Some("""WITH ad AS (
                SELECT doc_id, source, text FROM documents
                UNION ALL
                SELECT doc_id - 1000000, 'src99', text FROM documents
                WHERE doc_id < 50),
              s AS (
                SELECT doc_id, md5(text) AS fp,
                  CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) AS prio
                FROM ad),
              r AS (
                SELECT doc_id, prio,
                  ROW_NUMBER() OVER (PARTITION BY fp ORDER BY prio, doc_id)
                    AS rk,
                  COUNT(*) OVER (PARTITION BY fp) AS n_copies
                FROM s)
              SELECT doc_id, prio, CAST(n_copies AS BIGINT) AS n_copies
              FROM r WHERE rk = 1 ORDER BY doc_id""")
    ),

    // perceptual IMAGE near-dup (r17): dHash over REAL PNG round trips +
    // the generic Hamming pigeonhole pair join. The corpus is 100 base
    // pattern images plus one planted perturbed twin each (a localized
    // bump touching only pool column 8, rows 0-1 — so at most bits 7 and
    // 15 can differ: provably within the distance-3 gate). Every pixel is
    // ARITHMETIC (Multimodal.encodePatternImage's documented formula), so
    // the oracle recomputes both hashes and ALL pairwise distances from
    // the formula alone — encode, decode, pooling, bit packing, blocking,
    // and the exact verify all sit inside the hash.
    "d_image_neardup" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ids = Tables.t(s, dir, "documents")
          .where(col("doc_id") < 100).select("doc_id").as[Long]
          .repartition(s.sparkContext.defaultParallelism)
        val rows = ids.flatMap { id => Iterator(
          graft.ops.Multimodal.ImageRow(id,
            graft.ops.Multimodal.encodePatternImage(18, 16, id), "png"),
          graft.ops.Multimodal.ImageRow(id + 100000L,
            graft.ops.Multimodal.encodePatternImage(18, 16, id,
              bump = 96, bumpMinX = 16, bumpMaxY = 4), "png")) }
        val h = graft.ops.Multimodal.dhashImages(s, rows).toDF()
          .select(col("doc_id").as("id"), col("dhash").as("h"))
        Dedup.hammingPairs(h, maxDist = 3).orderBy("id_a", "id_b")
      },
      Some("""WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 100),
              img AS (SELECT doc_id AS id, doc_id AS seed, 0 AS bump FROM d
                      UNION ALL
                      SELECT doc_id + 100000, doc_id, 96 FROM d),
              g AS (SELECT id, r.r AS r, c.c AS c,
                      (( (seed*31 + (2*c.c)*(7 + seed % 5) + (2*r.r)*13
                          + CASE WHEN 2*c.c >= 16 AND 2*r.r < 4 THEN bump ELSE 0 END) % 256)
                     + ( (seed*31 + (2*c.c+1)*(7 + seed % 5) + (2*r.r)*13
                          + CASE WHEN 2*c.c+1 >= 16 AND 2*r.r < 4 THEN bump ELSE 0 END) % 256)
                     + ( (seed*31 + (2*c.c)*(7 + seed % 5) + (2*r.r+1)*13
                          + CASE WHEN 2*c.c >= 16 AND 2*r.r+1 < 4 THEN bump ELSE 0 END) % 256)
                     + ( (seed*31 + (2*c.c+1)*(7 + seed % 5) + (2*r.r+1)*13
                          + CASE WHEN 2*c.c+1 >= 16 AND 2*r.r+1 < 4 THEN bump ELSE 0 END) % 256)
                      ) // 4 AS pool
                    FROM img, generate_series(0,7) r(r), generate_series(0,8) c(c)),
              bits AS (SELECT a.id, a.r*8 + a.c AS idx,
                         CASE WHEN a.pool < b.pool THEN 1 ELSE 0 END AS bit
                       FROM g a JOIN g b ON b.id = a.id AND b.r = a.r AND b.c = a.c + 1
                       WHERE a.c < 8),
              pairs AS (SELECT x.id AS id_a, y.id AS id_b,
                          SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS dist
                        FROM bits x JOIN bits y ON y.idx = x.idx AND x.id < y.id
                        GROUP BY x.id, y.id)
              SELECT id_a, id_b, CAST(dist AS BIGINT) AS hamming
              FROM pairs WHERE dist <= 3 ORDER BY id_a, id_b""")
    ),

    // acoustic near-dup (r17): the audio member of the perceptual-dedup
    // family — 100 base pattern WAVEs plus a planted perturbed twin each
    // (a gain bump confined to the LAST energy window, so only bit 63 can
    // differ: provably within the distance-3 gate). The oracle recomputes
    // every fingerprint and ALL pairwise distances from the PCM formula,
    // so decode, windowing, bit packing, the pigeonhole blocking, and the
    // exact verify are exhaustively gated — same construction as
    // d_image_neardup, same generic hammingPairs machinery.
    "d_audio_neardup" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ids = Tables.t(s, dir, "documents")
          .where(col("doc_id") < 100).select("doc_id").as[Long]
          .repartition(s.sparkContext.defaultParallelism)
        val rows = ids.flatMap { id => Iterator(
          graft.ops.Multimodal.MediaBytesRow(id,
            graft.ops.Multimodal.encodePatternWav(8000, 520, id)),
          graft.ops.Multimodal.MediaBytesRow(id + 100000L,
            graft.ops.Multimodal.encodePatternWav(8000, 520, id,
              bump = 400, bumpMinFrame = 512))) }
        val h = graft.ops.Multimodal.ahashAudio(s, rows).toDF()
          .select(col("doc_id").as("id"), col("dhash").as("h"))
        Dedup.hammingPairs(h, maxDist = 3).orderBy("id_a", "id_b")
      },
      Some("""WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 100),
              snd AS (SELECT doc_id AS id, doc_id AS seed, 0 AS bump FROM d
                      UNION ALL
                      SELECT doc_id + 100000, doc_id, 400 FROM d),
              e AS (SELECT id, w.w AS w,
                      SUM(ABS((seed*37 + (w.w*8 + j.j)*(11 + seed % 7))
                              % 2048 - 1024
                              + CASE WHEN w.w*8 + j.j >= 512 THEN bump
                                     ELSE 0 END)) AS energy
                    FROM snd, generate_series(0,64) w(w), generate_series(0,7) j(j)
                    GROUP BY id, w.w),
              bits AS (SELECT a.id, a.w AS idx,
                         CASE WHEN a.energy < b.energy THEN 1 ELSE 0 END AS bit
                       FROM e a JOIN e b ON b.id = a.id AND b.w = a.w + 1
                       WHERE a.w < 64),
              pairs AS (SELECT x.id AS id_a, y.id AS id_b,
                          SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS dist
                        FROM bits x JOIN bits y ON y.idx = x.idx AND x.id < y.id
                        GROUP BY x.id, y.id)
              SELECT id_a, id_b, CAST(dist AS BIGINT) AS hamming
              FROM pairs WHERE dist <= 3 ORDER BY id_a, id_b""")
    ),

    // temporal video near-dup (r17): completes the perceptual-dedup
    // modality triple (image dHash, acoustic aHash, video tHash). 100
    // base MJPEG-AVI videos plus a planted twin each whose LAST frame's
    // gray is shifted — only the final adjacent-frame comparison (bit 63)
    // can differ, provably within the distance-3 gate. The oracle
    // recomputes every fingerprint and ALL pairwise distances from the
    // per-frame gray formula (the >= 37-level margin makes JPEG error
    // irrelevant to comparisons), gating the container walk, per-frame
    // decode, blocking, and exact verify exhaustively.
    "d_video_neardup" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ids = Tables.t(s, dir, "documents")
          .where(col("doc_id") < 100).select("doc_id").as[Long]
          .repartition(s.sparkContext.defaultParallelism)
        val rows = ids.flatMap { id =>
          def g(i: Int): Int = (((id * 13L + i * 37L) % 240L) + 8L).toInt
          def gTwin(i: Int): Int =
            if (i == 64) (((id * 13L + i * 37L + 120L) % 240L) + 8L).toInt
            else g(i)
          Iterator(
            graft.ops.Multimodal.MediaBytesRow(id,
              graft.ops.Multimodal.encodeAviMjpeg(8, 8, 65, g)),
            graft.ops.Multimodal.MediaBytesRow(id + 100000L,
              graft.ops.Multimodal.encodeAviMjpeg(8, 8, 65, gTwin))) }
        val h = graft.ops.Multimodal.thashVideo(s, rows).toDF()
          .select(col("doc_id").as("id"), col("dhash").as("h"))
        Dedup.hammingPairs(h, maxDist = 3).orderBy("id_a", "id_b")
      },
      Some("""WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 100),
              vid AS (SELECT doc_id AS id, doc_id AS seed, 0 AS bump FROM d
                      UNION ALL
                      SELECT doc_id + 100000, doc_id, 120 FROM d),
              f AS (SELECT id, i.i AS i,
                      (seed*13 + i.i*37
                       + CASE WHEN i.i = 64 THEN bump ELSE 0 END) % 240 + 8 AS g
                    FROM vid, generate_series(0,64) i(i)),
              bits AS (SELECT a.id, a.i AS idx,
                         CASE WHEN a.g < b.g THEN 1 ELSE 0 END AS bit
                       FROM f a JOIN f b ON b.id = a.id AND b.i = a.i + 1
                       WHERE a.i < 64),
              pairs AS (SELECT x.id AS id_a, y.id AS id_b,
                          SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS dist
                        FROM bits x JOIN bits y ON y.idx = x.idx AND x.id < y.id
                        GROUP BY x.id, y.id)
              SELECT id_a, id_b, CAST(dist AS BIGINT) AS hamming
              FROM pairs WHERE dist <= 3 ORDER BY id_a, id_b""")
    )
  )
}
