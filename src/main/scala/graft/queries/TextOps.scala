package graft.queries

import graft.ops.{Dedup, Multimodal, QualityModel, Text}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis + multimodal-plumbing queries over `documents`. */
object TextOps {
  import Tables.t

  /** Deterministic PLANTED page for the HTML-extraction oracles: markup
    * built from the document's own words — a pure-anchor nav + footer
    * (link density 1), head/script/style/comment distractors, an entity,
    * and a link-plus-tail div whose keep/drop flips exactly at the 50%
    * density bound. The oracle never parses HTML: it constructs the
    * expected extraction directly from the same word slices
    * ([[plantedCleanSql]]), the planted-twin discipline. */
  private def plantedHtml(text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val w = split(trim(text), "\\s+")
    val h1 = concat_ws(" ", slice(w, 1, 3))
    val bodyA = concat_ws(" ", slice(w, 4, 17))
    val bodyB = concat_ws(" ", slice(w, 21, 1 << 20))
    concat(
      lit("<html><head><title>site name</title><meta charset=\"utf-8\">" +
        "</head><body><script>if(a<b){x=1;}</script><style>p{margin:0;}" +
        "</style><div class=\"nav\"><a href=\"/\">Home</a> " +
        "<a href=\"/about\">About</a> <a href=\"/contact\">Contact</a>" +
        "</div><h1>"), h1,
      lit("</h1><!-- chrome & nav markers --><p>"), bodyA,
      lit(" &amp; more</p><div><a href=\"/read\">read</a> "), bodyB,
      lit("</div><footer><a href=\"/terms\">Terms</a> " +
        "<a href=\"/privacy\">Privacy</a></footer></body></html>"))
  }

  /** DuckDB CTE producing `clean(doc_id, clean_text)` — the expected
    * [[graft.ops.Clean.extractHtml]] output over [[plantedHtml]], built
    * directly from the word slices: kept blocks are the h1, the paragraph
    * (entity decoded), and the read-link div iff its 4 anchor chars are
    * ≤ 50% of the block's non-space chars; blocks join with \n. */
  private val plantedCleanSql: String =
    """WITH w AS (
         SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
         FROM documents),
       p AS (
         SELECT doc_id,
           array_to_string(words[1:3], ' ') AS h1,
           trim(array_to_string(words[4:20], ' ') || ' & more') AS para,
           array_to_string(words[21:], ' ') AS bodyb
         FROM w),
       clean AS (
         SELECT doc_id,
           array_to_string(list_filter([
               h1,
               para,
               CASE WHEN 400 <= (4 + len(replace(bodyb, ' ', ''))) * 50
                    THEN trim('read ' || bodyb) ELSE '' END
             ], x -> len(x) > 0), chr(10)) AS clean_text
         FROM p)"""

  /** Shared planted-PDF corpus for the t_pdf_extract / p_pdf_corpus pair:
    * a two-page classic-xref PDF per doc < 200 — page 1 = words 1-4 and
    * 5-8 as two lines (the second rendered through a split TJ), page 2 =
    * words 9-14. The slice arithmetic here is what both SQL oracles
    * restate; one definition, so a fixture change cannot drift the twins
    * apart. (t_pdf_xref_stream plants its own single-page 1.5+ corpus.) */
  private def plantedPdfs(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaBytesRow] = {
    import s.implicits._
    t(s, dir, "documents")
      .where(col("doc_id") < 200)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("w"), 1, 4)).as("l1"),
        concat_ws(" ", slice(col("w"), 5, 4)).as("l2"),
        concat_ws(" ", slice(col("w"), 9, 6)).as("l3"))
      .as[(Long, String, String, String)]
      .mapPartitions(_.map { case (id, l1, l2, l3) =>
        Multimodal.MediaBytesRow(id,
          graft.ops.Pdf.encode(Seq(Seq(l1, l2), Seq(l3))))
      })
  }

  val defs: Map[String, QueryDef] = Map(

    // fuzzy record linkage: edit-distance match under a BLOCKING key — the
    // technique that makes pairwise string comparison possible at scale
    // (the quadratic join runs per block, never across the corpus) — plus
    // the classic length prefilter (|len(a)−len(b)| > k implies
    // levenshtein > k, so the cheap filter prunes before the O(n·m)
    // kernel). Both engines implement standard Levenshtein, so the pair
    // set is exact.
    "t_fuzzy_match" -> QueryDef(
      (s, dir) => {
        val p = t(s, dir, "part")
        // threshold form of the kernel: levenshtein(a, b, k) early-exits
        // (banded O(k·min(n,m)) instead of O(n·m)) and returns -1 past k —
        // at 8M candidate pairs per 100-SF the unbounded kernel is the
        // whole query cost
        val lev = levenshtein(col("a.p_name"), col("b.p_name"), 2)
        // spread the PROBE side: the build side broadcasts, so pair
        // generation parallelism is exactly the probe side's partitioning —
        // a single-file input would otherwise evaluate every candidate pair
        // in one task, and AQE would coalesce an implicit repartition right
        // back (it sizes by input bytes; the COST here is the join's pair
        // fan-out, which AQE can't see). The explicit count pins the spread;
        // at cluster scale the input arrives pre-split and the shuffle is a
        // row-id hash of a dimension-sized table — noise.
        val spread = s.conf.get("spark.sql.shuffle.partitions").toInt
        p.repartition(spread, col("p_partkey")).alias("a").join(p.alias("b"),
            col("a.p_brand") === col("b.p_brand") &&
              col("a.p_partkey") < col("b.p_partkey") &&
              abs(length(col("a.p_name")) - length(col("b.p_name"))) <= 2 &&
              lev >= 0 && lev <= 2)
          .select(col("a.p_partkey").as("k1"), col("b.p_partkey").as("k2"),
            col("a.p_name").as("name1"), col("b.p_name").as("name2"),
            levenshtein(col("a.p_name"), col("b.p_name")).cast("long").as("dist"))
          .orderBy("k1", "k2")
      },
      Some("""SELECT a.p_partkey AS k1, b.p_partkey AS k2,
                a.p_name AS name1, b.p_name AS name2,
                CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
              FROM part a JOIN part b
                ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
                AND abs(length(a.p_name) - length(b.p_name)) <= 2
                AND levenshtein(a.p_name, b.p_name) <= 2
              ORDER BY k1, k2""")
    ),

    "t_tokens" -> QueryDef(
      (s, dir) => t(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_m"),
        Text.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars_m,
                CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
              FROM documents ORDER BY doc_id""")
    ),

    // CJK-aware token counting (r16): suffixes planted by doc_id arithmetic
    // (the t_script_mix pattern) exercise every segmentation case — pure-Han
    // standalone, CJK embedded mid-word between Latin runs, and a mixed
    // Cyrillic-word + kana/Hangul chunk — and the oracle restates the
    // expected counts arithmetically (whitespace words + hand-counted CJK
    // codepoints), so the kernel's char-per-token routing is hash-gated,
    // immune to RE2-vs-JDK script-table drift.
    "t_cjk_tokens" -> QueryDef(
      (s, dir) => {
        val m = col("doc_id") % 4
        val planted = concat(col("text"),
          // 4 Han standalone -> +4 tokens
          when(m === 1, " \u4f60\u597d\u4e16\u754c")
            // abc + 2 Han + def, one ws chunk -> runs "abc","def" + 2 = +4
            .when(m === 2, " abc\u4f60\u597ddef")
            // Cyrillic word (1) + 4 hiragana + 4 katakana + 2 hangul -> +11
            .when(m === 3, " \u043f\u0440\u0438\u0432\u0435\u0442 " +
              "\u3072\u3089\u304c\u306a\u30ab\u30bf\u30ab\u30ca\ud55c\uae00")
            .otherwise(""))
        t(s, dir, "documents")
          .select(col("doc_id"), Text.tokenCount(planted).as("n_tokens"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                CAST(len(string_split_regex(trim(text), '\s+')) +
                  CASE doc_id % 4 WHEN 1 THEN 4 WHEN 2 THEN 4 WHEN 3 THEN 11
                    ELSE 0 END AS BIGINT) AS n_tokens
              FROM documents ORDER BY doc_id""")
    ),

    // CJK-aware chunking (r16): a pure-Han document of doc-arithmetic length
    // (token == codepoint, so every window boundary is a plain character
    // position) chunked by the TokenChunks kernel — the oracle restates each
    // chunk as a substring window and each chunk's token count in closed
    // form. Whitespace-word parity and mixed-script reconstruction (spaces
    // only where the source had them) are pinned by TokenCountSpec.
    "t_cjk_chunks" -> QueryDef(
      (s, dir) => {
        val hanCh = "\u597d" // processed in a single-quoted literal (2.13 keeps \u raw in triple quotes)
        val han = expr(
          s"repeat('$hanCh', cast(size(split(trim(text), '\\\\s+')) as int) + 40)")
        t(s, dir, "documents")
          .select(col("doc_id"), han.as("han"))
          .select(col("doc_id"),
            posexplode(Text.chunkCjk(col("han"), window = 32, stride = 24))
              .as(Seq("chunk_idx", "chunk")))
          .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
            col("chunk"), Text.tokenCount(col("chunk")).as("n_chunk_tokens"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some("""WITH w AS (
                SELECT doc_id,
                  repeat(chr(22909), len(string_split_regex(trim(text), '\s+')) + 40) AS han
                FROM documents),
              k AS (
                SELECT doc_id, han, length(han) AS n,
                  GREATEST(CAST(CEIL((length(han) - 32) / 24.0) AS BIGINT) + 1, 1)
                    AS nchunks
                FROM w)
              SELECT doc_id,
                unnest(range(0, nchunks)) AS chunk_idx,
                unnest(list_transform(range(0, nchunks),
                  x -> han[x*24 + 1 : LEAST(x*24 + 32, n)])) AS chunk,
                unnest(list_transform(range(0, nchunks),
                  x -> LEAST(x*24 + 32, n) - x*24)) AS n_chunk_tokens
              FROM k ORDER BY doc_id, chunk_idx""")
    ),

    "t_quality" -> QueryDef(
      (s, dir) => Text.qualitySignals(
        t(s, dir, "documents").select("doc_id", "text"), col("text"))
        .drop("text").orderBy("doc_id"),
      Some("""SELECT doc_id,
                CAST(LENGTH(text) AS BIGINT) AS n_chars_q,
                CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS BIGINT) AS n_spaces,
                CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT) AS n_punct,
                CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper,
                CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit
              FROM documents ORDER BY doc_id""")
    ),

    "t_langid" -> QueryDef(
      (s, dir) => t(s, dir, "documents").select(
        col("doc_id"), col("lang").as("lang_true"),
        Text.stopwordHits(col("text")).as("n_stop"),
        Text.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang AS lang_true,
                CAST(len(regexp_extract_all(text, '\b(the|and|of|to|a|in|is|it|that|for)\b')) AS BIGINT) AS n_stop,
                CASE WHEN len(regexp_extract_all(text, '\b(the|and|of|to|a|in|is|it|that|for)\b')) >= 3
                     THEN 'en' ELSE 'other' END AS lang_pred
              FROM documents ORDER BY doc_id""")
    ),

    // script-ROUTED language ID (r16): writing system first, stopwords only
    // within Latin. Plants make each route's dominance unconditional (one
    // more CJK/Cyrillic char than the whole base text has chars), so the
    // oracle is pure doc arithmetic + the t_langid stopword restatement.
    // winnowing document fingerprints (r16, the MOSS scheme): hash every
    // char 8-gram (13-hex md5 prefix as BIGINT, the repo's exact-unit
    // trick), slide a 4-hash window, keep each window's min, emit the
    // distinct sorted selection. The oracle restates grams, hashes,
    // clamped windows, and mins with list ops — any defect in the kernel's
    // gram walk, hash truncation, window clamp, or dedup breaks the hash.
    "t_winnow" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .where(col("doc_id") < 200)
        .select(col("doc_id"),
          explode(graft.functions.WinnowFingerprints(
            lower(regexp_replace(col("text"), "\\s+", "")), 8, 4)).as("fp"))
        .orderBy("doc_id", "fp"),
      Some("""WITH t AS (
                SELECT doc_id, lower(regexp_replace(text, '\s+', '', 'g')) AS t
                FROM documents WHERE doc_id < 200),
              g AS (
                SELECT doc_id,
                  list_transform(range(0, GREATEST(length(t) - 8 + 1, 0)),
                    x -> CAST('0x' || substr(md5(t[x + 1 : x + 8]), 1, 13)
                      AS BIGINT)) AS h
                FROM t),
              f AS (
                SELECT doc_id, unnest(list_sort(list_distinct(list_transform(
                    range(0, GREATEST(len(h) - 4 + 1, 1)),
                    j -> list_aggregate(h[j + 1 : LEAST(j + 4, len(h))], 'min')
                  )))) AS fp
                FROM g WHERE len(h) >= 1)
              SELECT doc_id, fp FROM f ORDER BY doc_id, fp""")
    ),

    "t_langid_script" -> QueryDef(
      (s, dir) => {
        val han = "\u4f60"
        val zhe = "\u0436"
        val m = col("doc_id") % 3
        val planted = concat(col("text"),
          when(m === 1, expr(s"repeat('$han', cast(length(text) as int) + 1)"))
            .when(m === 2, expr(s"repeat('$zhe', cast(length(text) as int) + 1)"))
            .otherwise(lit("")))
        Text.langIdScript(
            t(s, dir, "documents").select(col("doc_id"), col("text")), planted)
          .select(col("doc_id"), col("lang_routed"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                CASE WHEN doc_id % 3 = 1 THEN 'cjk'
                     WHEN doc_id % 3 = 2 THEN 'cyr'
                     WHEN len(regexp_extract_all(text,
                       '\b(the|and|of|to|a|in|is|it|that|for)\b')) >= 3 THEN 'en'
                     ELSE 'other' END AS lang_routed
              FROM documents ORDER BY doc_id""")
    ),

    "t_fingerprint" -> QueryDef(
      (s, dir) => t(s, dir, "documents").select(
        col("doc_id"), Text.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
              FROM documents ORDER BY doc_id""")
    ),

    // BPE-ish subword counting. Java regex and DuckDB's RE2 are both
    // leftmost-first over this alternation (verified: zero mismatches across
    // the corpus), so the tokenizer gets a full hash-checked oracle.
    "t_subwords" -> QueryDef(
      (s, dir) => t(s, dir, "documents").select(
        col("doc_id"), Text.subwordCount(col("text")).as("n_subwords"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[A-Za-z]{1,6}|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_subwords
              FROM documents ORDER BY doc_id""")
    ),

    // overlapping token-window chunking (32-token windows, stride 24): the
    // row-per-chunk fan-out every training pipeline runs before packing
    "t_chunks" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(Text.chunk(col("text"), window = 32, stride = 24))
            .as(Seq("chunk_idx", "chunk")))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          col("chunk"), Text.tokenCount(col("chunk")).as("n_chunk_tokens"))
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH w AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
                FROM documents),
              k AS (
                SELECT doc_id, words,
                  GREATEST(CAST(CEIL((len(words) - 32) / 24.0) AS BIGINT) + 1, 1) AS nchunks
                FROM w),
              u AS (
                SELECT doc_id,
                  unnest(range(0, nchunks)) AS chunk_idx,
                  unnest(list_transform(range(0, nchunks),
                    x -> array_to_string(words[1 + x*24 : x*24 + 32], ' '))) AS chunk
                FROM k)
              SELECT doc_id, chunk_idx, chunk,
                CAST(len(string_split_regex(trim(chunk), '\s+')) AS BIGINT) AS n_chunk_tokens
              FROM u ORDER BY doc_id, chunk_idx""")
    ),

    // corpus-level n-gram statistics: top-20 word bigrams by DOCUMENT
    // frequency (distinct per doc, so a bigram repeated within one document
    // counts once) — the corpus-analysis aggregation the per-doc text ops
    // don't cover. Deterministic top-k: count desc, bigram asc (unique).
    // boilerplate stripping: an 8-token segment occurring in >= 2 distinct
    // documents is chrome/footer material and ALL its occurrences drop
    // (paragraph dedup's sibling — that one keeps the first). n_removed
    // lets a pipeline gate on boilerplate fraction. Exact oracle over the
    // whole segment→count→anti-join→reassemble composition.
    "t_boilerplate" -> QueryDef(
      (s, dir) => graft.ops.Clean.stripBoilerplate(
        t(s, dir, "documents"), "doc_id", "text", window = 8, minDocs = 2)
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
              bp AS (
                SELECT seg FROM u GROUP BY seg
                HAVING COUNT(DISTINCT doc_id) >= 2),
              tot AS (SELECT doc_id, COUNT(*) AS n_total FROM u GROUP BY doc_id),
              kept AS (
                SELECT doc_id, seg_idx, seg FROM u
                WHERE seg NOT IN (SELECT seg FROM bp))
              SELECT kept.doc_id,
                string_agg(seg, ' ' ORDER BY seg_idx) AS text,
                COUNT(*) AS n_kept,
                ANY_VALUE(n_total) - COUNT(*) AS n_removed
              FROM kept JOIN tot USING (doc_id)
              GROUP BY kept.doc_id ORDER BY kept.doc_id""")
    ),

    // HTML → text EXTRACTION (r14): the markup-to-`text` step upstream of
    // the whole pipeline — tag stripping, script/style/head + comment
    // removal, entity decoding, block segmentation, and the per-block
    // LINK-DENSITY boilerplate gate, as one native codegen'd kernel
    // (per-row, shuffle-free; functions.HtmlExtract). The page is PLANTED:
    // deterministic HTML built from each document's words — a pure-anchor
    // nav bar and footer (density 1 → dropped), an <h1> + <p> of content
    // (kept, entity decoded), and a link-plus-text div whose keep/drop
    // flips EXACTLY at the 50% density bound as the doc's tail length
    // varies — so the oracle constructs the expected extraction DIRECTLY
    // from the same words (planted-twin discipline), and any extractor
    // defect (missed script body, broken entity, wrong density count,
    // lost block boundary) breaks the hash.
    "t_html_extract" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          graft.ops.Clean.extractHtml(plantedHtml(col("text"))).as("clean_text"))
        .orderBy("doc_id"),
      Some(s"""$plantedCleanSql
              SELECT doc_id, clean_text
              FROM clean ORDER BY doc_id""")
    ),

    // the FULL ingestion chain a crawl corpus actually needs (r14):
    // WARC archives → record fan-out (ops.Warc.split walks the ISO 28500
    // grammar: version line, named headers, Content-Length-addressed
    // payload) → response records → HTML extraction → text. Each doc's
    // archive is PLANTED (a warcinfo record + a response record carrying
    // the planted page), so the oracle constructs the expected output
    // directly — a wrong header parse, payload slice, record split, or
    // extraction all break the hash.
    "t_warc_extract" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val pages = t(s, dir, "documents")
          .select(col("doc_id"), plantedHtml(col("text")).as("html"))
          .as[(Long, String)]
        val archives = pages.mapPartitions(_.map { case (id, html) =>
          Multimodal.MediaBytesRow(id, graft.ops.Warc.encode(Seq(
            ("warcinfo", "", "software: graft-crawler"),
            ("response", s"https://example.org/doc/$id", html))))
        })
        graft.ops.Warc.split(s, archives).toDF()
          .where(col("rec_type") === "response")
          .select(col("doc_id"), col("target_uri"),
            graft.ops.Clean.extractHtml(col("payload")).as("clean_text"))
          .orderBy("doc_id")
      },
      Some(s"""$plantedCleanSql
              SELECT doc_id,
                'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
                  AS target_uri,
                clean_text
              FROM clean ORDER BY doc_id""")
    ),

    // PDF text extraction (r15): real pretraining corpora are HTML + PDF,
    // and this is the PDF half of the ingestion front-end. Each doc < 200
    // plants a deterministic TWO-PAGE PDF from its own word slices (page 1:
    // two lines of four words, the second line rendered through a split
    // TJ array; page 2: words 9-14 via Tj), Flate-compressed — so the
    // extractor exercises the real chain: startxref → classic xref table →
    // trailer /Root → page tree → /Contents stream → Inflater → content-
    // stream BT/Td/Tj/TJ walk with the newline-per-line-move policy. The
    // oracle restates the expected per-page text from the slice arithmetic
    // alone (the m_mp4_meta planted-container discipline) — a wrong xref
    // offset, stream slice, escape decode, or operator walk breaks the hash.
    "t_pdf_extract" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val pdfs = plantedPdfs(s, dir)
        graft.ops.Pdf.extract(s, pdfs).toDF()
          .select(col("doc_id"), col("page"), col("text"))
          .orderBy("doc_id", "page")
      },
      Some("""WITH w AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
                FROM documents WHERE doc_id < 200)
              SELECT doc_id, CAST(0 AS BIGINT) AS page,
                array_to_string(ws[1:4], ' ') || chr(10) ||
                array_to_string(ws[5:8], ' ') AS text
              FROM w
              UNION ALL
              SELECT doc_id, CAST(1 AS BIGINT) AS page,
                array_to_string(ws[9:14], ' ') AS text
              FROM w
              ORDER BY doc_id, page""")
    ),

    // WET export + re-ingest round trip (r15; r16: the shard builder is
    // the first-class ops.Warc.encodeShards operator, this query is its
    // oracle face): extracted text written back out as Common-Crawl-shaped
    // WET shards (gzipped WARC archives of `conversion` records, one per
    // (host, doc-block) — bounded by construction), then read back through
    // the same record walker. The oracle recomputes the extraction
    // directly: any defect in the gzip-member write, record framing, URI
    // round trip, payload addressing, or re-ingest breaks the per-doc
    // token counts.
    "p_wet_export" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val pages = t(s, dir, "documents")
          .where(col("doc_id") < 200)
          .select(col("doc_id"), (col("doc_id") % 7).as("host_id"),
            concat(lit("https://h"), (col("doc_id") % 7).cast("string"),
              lit(".example.org/doc/"), col("doc_id").cast("string")).as("uri"),
            graft.ops.Clean.extractHtml(plantedHtml(col("text"))).as("text"))
          .as[graft.ops.Warc.WetDoc]
        val archives = graft.ops.Warc.encodeShards(s, pages)
          .map(sh => Multimodal.MediaBytesRow(sh.host_id * 1000 + sh.block, sh.media))
        graft.ops.Warc.splitGz(s, archives).toDF()
          .where(col("rec_type") === "conversion")
          .select(
            regexp_extract(col("target_uri"), "doc/(\\d+)$", 1)
              .cast("long").as("doc_id"),
            graft.ops.Text.tokenCount(col("payload")).as("n_tokens"))
          .orderBy("doc_id")
      },
      Some(s"""$plantedCleanSql
              SELECT doc_id,
                CAST(len(string_split_regex(trim(clean_text), '\\s+'))
                  AS BIGINT) AS n_tokens
              FROM clean WHERE doc_id < 200 ORDER BY doc_id""")
    ),

    // the PDF 1.5+ cross-reference-STREAM form (r15) — the on-disk shape
    // of most post-2006 PDFs: every non-stream dict packed into a
    // Flate-compressed /ObjStm, the xref itself a /Type /XRef stream of
    // binary fixed-width rows PNG-Up-predicted per /DecodeParms, type-2
    // entries addressing the packed objects. Same planted-slice oracle
    // discipline as t_pdf_extract; a wrong /W field decode, predictor
    // inverse, /ObjStm header walk, or type-2 dispatch breaks the hash.
    "t_pdf_xref_stream" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val lines = t(s, dir, "documents")
          .where(col("doc_id") < 150)
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
          .select(col("doc_id"),
            concat_ws(" ", slice(col("w"), 1, 5)).as("l1"),
            concat_ws(" ", slice(col("w"), 6, 5)).as("l2"))
          .as[(Long, String, String)]
        val pdfs = lines.mapPartitions(_.map { case (id, l1, l2) =>
          Multimodal.MediaBytesRow(id,
            graft.ops.Pdf.encodeXrefStream(Seq(Seq(l1, l2))))
        })
        graft.ops.Pdf.extract(s, pdfs).toDF()
          .select(col("doc_id"), col("page"), col("text"))
          .orderBy("doc_id", "page")
      },
      Some("""WITH w AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
                FROM documents WHERE doc_id < 150)
              SELECT doc_id, CAST(0 AS BIGINT) AS page,
                array_to_string(ws[1:5], ' ') || chr(10) ||
                array_to_string(ws[6:10], ' ') AS text
              FROM w ORDER BY doc_id, page""")
    ),

    // the PDF path composed into the corpus pipeline (r15): PDFs → page
    // fan-out → per-doc reassembly → token-floor gate + dedup fingerprint
    // — p_html_corpus's contract over PDF ingestion. Reassembly is a
    // groupBy over a BOUNDED per-doc page list (array_sort on pages, never
    // a window over the corpus), so the only shuffle is the per-doc
    // aggregation — scale-correct at 100 TB of archives.
    "p_pdf_corpus" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val pdfs = plantedPdfs(s, dir)
        graft.ops.Pdf.extract(s, pdfs).toDF()
          .groupBy("doc_id")
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("page"), col("text")))),
            x => x.getField("text")), " ").as("doc_text"))
          .withColumn("n_tokens", Text.tokenCount(col("doc_text")))
          .where(col("n_tokens") >= 12)
          .select(col("doc_id"), col("n_tokens"),
            Text.fingerprint(col("doc_text")).as("fp"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (
                SELECT doc_id,
                  string_split_regex(trim(text), '\s+') AS ws,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nw
                FROM documents WHERE doc_id < 200)
              SELECT doc_id, LEAST(nw, 14) AS n_tokens,
                md5(lower(array_to_string(ws[1:14], ' '))) AS fp
              FROM w WHERE LEAST(nw, 14) >= 12
              ORDER BY doc_id""")
    ),

    // the crawl pipeline END-TO-END with URL-level gating (r14): GZIPPED
    // WARC archives (one gzip member per record — the Common Crawl
    // `.warc.gz` wire convention, decompressed through the JDK's
    // multi-member reader) → record fan-out → host extracted from the demuxed
    // WARC-Target-URI (proving the URI survives the record round trip) →
    // BLOCKLIST anti-join (the scale shape: a broadcast join against the
    // tiny blocklist table, never an isin literal — real blocklists are
    // row sets, not constants) → HTML extraction → token-floor gate.
    // Hosts and the blocklist are planted from doc_id arithmetic, so the
    // oracle restates the whole chain exactly.
    "p_warc_corpus" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        // pages repartitioned before the gzip encode: both codec passes
        // (member-per-record gzip encode + the multi-member decode) are
        // pure per-row CPU that otherwise inherits documents.parquet's
        // single input split and serializes through one task
        val pages = t(s, dir, "documents")
          .select(col("doc_id"), plantedHtml(col("text")).as("html"))
          .as[(Long, String)]
          .repartition(s.sparkContext.defaultParallelism)
        val archives = pages.mapPartitions(_.map { case (id, html) =>
          Multimodal.MediaBytesRow(id, graft.ops.Warc.encodeGz(Seq(
            ("warcinfo", "", "software: graft-crawler"),
            ("response", s"https://h${id % 7}.example.org/doc/$id", html))))
        })
        val blocklist = Seq("h0.example.org", "h3.example.org").toDF("host")
        graft.ops.Warc.splitGz(s, archives).toDF()
          .where(col("rec_type") === "response")
          .withColumn("host",
            regexp_extract(col("target_uri"), "^https?://([^/]+)/", 1))
          .join(broadcast(blocklist), Seq("host"), "left_anti")
          .select(col("doc_id"), col("host"),
            graft.ops.Text.tokenCount(
              graft.ops.Clean.extractHtml(col("payload"))).as("n_tokens"))
          .where(col("n_tokens") >= 24)
          .orderBy("doc_id")
      },
      Some(s"""$plantedCleanSql,
              g AS (
                SELECT doc_id,
                  'h' || CAST(doc_id % 7 AS VARCHAR) || '.example.org' AS host,
                  CAST(len(string_split_regex(trim(clean_text), '\\s+'))
                    AS BIGINT) AS n_tokens
                FROM clean)
              SELECT doc_id, host, n_tokens FROM g
              WHERE doc_id % 7 NOT IN (0, 3) AND n_tokens >= 24
              ORDER BY doc_id""")
    ),

    // the EXTRACTION composed into the cleaning pipeline (the p_clean_corpus
    // stages running on extractHtml's output instead of a ready-made text
    // column — markup in, gated clean corpus out, one plan, all relational)
    "p_html_corpus" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          graft.ops.Clean.extractHtml(plantedHtml(col("text"))).as("clean_text"))
        .withColumn("n_tokens", Text.tokenCount(col("clean_text")))
        .withColumn("lang_pred", Text.langId(col("clean_text")))
        .withColumn("fp", Text.fingerprint(col("clean_text")))
        .where(col("n_tokens") >= 24 && col("lang_pred") === "en")
        .select("doc_id", "n_tokens", "fp")
        .orderBy("doc_id"),
      Some(s"""$plantedCleanSql,
              scored AS (
                SELECT doc_id,
                  CAST(len(string_split_regex(trim(clean_text), '\\s+')) AS BIGINT) AS n_tokens,
                  CASE WHEN len(regexp_extract_all(clean_text, '\\b(the|and|of|to|a|in|is|it|that|for)\\b')) >= 3
                       THEN 'en' ELSE 'other' END AS lang_pred,
                  md5(lower(regexp_replace(clean_text, '\\s+', ' ', 'g'))) AS fp
                FROM clean)
              SELECT doc_id, n_tokens, fp FROM scored
              WHERE n_tokens >= 24 AND lang_pred = 'en'
              ORDER BY doc_id""")
    ),

    // tokenizer vocabulary induction, step zero: the corpus-wide adjacent
    // character-pair frequency table (the statistic the first BPE merge is
    // chosen from). Pair extraction is per-row; the count shuffles tiny
    // keys (2-char strings, charset^2-bounded cardinality) with map-side
    // combine, and the top-10 sort runs on that bounded table — scale-free
    // regardless of corpus size.
    "t_bpe_merges" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(explode(graft.functions.WordNgrams(col("text"), 1)).as("w"))
        .where(length(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(10),
      Some("""WITH wd AS (
                SELECT unnest(list_filter(
                  string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS w
                FROM documents),
              p AS (
                SELECT unnest(list_transform(range(1, len(w)), i -> w[i:i+1])) AS pair
                FROM wd WHERE len(w) >= 2)
              SELECT pair, COUNT(*) AS n FROM p
              GROUP BY pair ORDER BY n DESC, pair LIMIT 10""")
    ),

    // full BPE vocabulary-induction loop (count -> argmax -> merge, x3)
    // under the exact oracle gate: the canonical `||t1||t2||` tokenization
    // string makes the merge step a literal replace() with identical
    // greedy left-to-right semantics in Spark and DuckDB, so DuckDB can
    // replay the whole training loop as three unrolled CTE rounds
    "t_bpe_train" -> QueryDef(
      (s, dir) => graft.ops.Text.bpeTrain(t(s, dir, "documents"), "text", 3)
        .orderBy("step"),
      Some("""WITH w AS (
                SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
                  SELECT unnest(list_filter(
                    string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS w
                  FROM documents) GROUP BY w),
              t0 AS (
                SELECT freq, '||' || array_to_string(
                  list_transform(range(1, len(w) + 1), i -> substr(w, i, 1)), '||')
                  || '||' AS toks
                FROM w),
              p1 AS (
                SELECT p['l'] AS lhs, p['r'] AS rhs, CAST(SUM(freq) AS BIGINT) AS cnt
                FROM (SELECT freq, unnest(list_transform(range(1, len(a)),
                        i -> {'l': a[i], 'r': a[i + 1]})) AS p
                      FROM (SELECT freq, list_filter(string_split(toks, '||'),
                              x -> x <> '') AS a FROM t0))
                GROUP BY 1, 2),
              m1 AS (SELECT lhs, rhs, cnt FROM p1 ORDER BY cnt DESC, lhs, rhs LIMIT 1),
              t1 AS (
                SELECT freq, replace(toks, '|' || m1.lhs || '||' || m1.rhs || '|',
                  '|' || m1.lhs || m1.rhs || '|') AS toks
                FROM t0, m1),
              p2 AS (
                SELECT p['l'] AS lhs, p['r'] AS rhs, CAST(SUM(freq) AS BIGINT) AS cnt
                FROM (SELECT freq, unnest(list_transform(range(1, len(a)),
                        i -> {'l': a[i], 'r': a[i + 1]})) AS p
                      FROM (SELECT freq, list_filter(string_split(toks, '||'),
                              x -> x <> '') AS a FROM t1))
                GROUP BY 1, 2),
              m2 AS (SELECT lhs, rhs, cnt FROM p2 ORDER BY cnt DESC, lhs, rhs LIMIT 1),
              t2 AS (
                SELECT freq, replace(toks, '|' || m2.lhs || '||' || m2.rhs || '|',
                  '|' || m2.lhs || m2.rhs || '|') AS toks
                FROM t1, m2),
              p3 AS (
                SELECT p['l'] AS lhs, p['r'] AS rhs, CAST(SUM(freq) AS BIGINT) AS cnt
                FROM (SELECT freq, unnest(list_transform(range(1, len(a)),
                        i -> {'l': a[i], 'r': a[i + 1]})) AS p
                      FROM (SELECT freq, list_filter(string_split(toks, '||'),
                              x -> x <> '') AS a FROM t2))
                GROUP BY 1, 2),
              m3 AS (SELECT lhs, rhs, cnt FROM p3 ORDER BY cnt DESC, lhs, rhs LIMIT 1)
              SELECT CAST(1 AS BIGINT) AS step, lhs, rhs, cnt FROM m1
              UNION ALL SELECT CAST(2 AS BIGINT), lhs, rhs, cnt FROM m2
              UNION ALL SELECT CAST(3 AS BIGINT), lhs, rhs, cnt FROM m3
              ORDER BY step""")
    ),

    // the APPLY half of the tokenizer loop: encode every document with the
    // corpus's trained merges (ops.Text.bpeEncode — memoizing native
    // kernel). The merges are trained INSIDE the query on every run (one
    // bounded 3-row collect): no cross-run artifact is consumed in the
    // timed region. The oracle re-runs the same 3 unrolled training steps
    // as t_bpe_train's and applies them as an unrolled replace chain, so a
    // drift in EITHER training or application breaks the hash. (Both
    // sides assume >= 3 merges exist in the corpus — t_bpe_train's
    // standing assumption at every driver SF.)
    "t_bpe_encode" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val merges = (try graft.ops.Text.bpeTrain(t(s, dir, "documents"), "text", 3)
            .orderBy("step").collect()
            .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
            finally graft.ops.Pins.releaseAll())
          .toSeq.toDF("step", "lhs", "rhs")
        graft.ops.Text.bpeEncode(t(s, dir, "documents"), "doc_id", "text",
          merges).orderBy("doc_id")
      },
      Some("""WITH w AS (
                SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
                  SELECT unnest(list_filter(
                    string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS w
                  FROM documents) GROUP BY w),
              t0 AS (
                SELECT freq, '||' || array_to_string(
                  list_transform(range(1, len(w) + 1), i -> substr(w, i, 1)), '||')
                  || '||' AS toks
                FROM w),
              p1 AS (
                SELECT p['l'] AS lhs, p['r'] AS rhs, CAST(SUM(freq) AS BIGINT) AS cnt
                FROM (SELECT freq, unnest(list_transform(range(1, len(a)),
                        i -> {'l': a[i], 'r': a[i + 1]})) AS p
                      FROM (SELECT freq, list_filter(string_split(toks, '||'),
                              x -> x <> '') AS a FROM t0))
                GROUP BY 1, 2),
              m1 AS (SELECT lhs, rhs FROM p1 ORDER BY cnt DESC, lhs, rhs LIMIT 1),
              t1 AS (
                SELECT freq, replace(toks, '|' || m1.lhs || '||' || m1.rhs || '|',
                  '|' || m1.lhs || m1.rhs || '|') AS toks
                FROM t0, m1),
              p2 AS (
                SELECT p['l'] AS lhs, p['r'] AS rhs, CAST(SUM(freq) AS BIGINT) AS cnt
                FROM (SELECT freq, unnest(list_transform(range(1, len(a)),
                        i -> {'l': a[i], 'r': a[i + 1]})) AS p
                      FROM (SELECT freq, list_filter(string_split(toks, '||'),
                              x -> x <> '') AS a FROM t1))
                GROUP BY 1, 2),
              m2 AS (SELECT lhs, rhs FROM p2 ORDER BY cnt DESC, lhs, rhs LIMIT 1),
              t2 AS (
                SELECT freq, replace(toks, '|' || m2.lhs || '||' || m2.rhs || '|',
                  '|' || m2.lhs || m2.rhs || '|') AS toks
                FROM t1, m2),
              p3 AS (
                SELECT p['l'] AS lhs, p['r'] AS rhs, CAST(SUM(freq) AS BIGINT) AS cnt
                FROM (SELECT freq, unnest(list_transform(range(1, len(a)),
                        i -> {'l': a[i], 'r': a[i + 1]})) AS p
                      FROM (SELECT freq, list_filter(string_split(toks, '||'),
                              x -> x <> '') AS a FROM t2))
                GROUP BY 1, 2),
              m3 AS (SELECT lhs, rhs FROM p3 ORDER BY cnt DESC, lhs, rhs LIMIT 1),
              d AS (SELECT doc_id, list_filter(
                     string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS words
                   FROM documents),
              e AS (SELECT doc_id, flatten(list_transform(words, w ->
                     list_filter(string_split(
                       replace(replace(replace(
                         '||' || array_to_string(list_transform(range(1, len(w) + 1),
                           i -> substr(w, i, 1)), '||') || '||',
                         '|' || m1.lhs || '||' || m1.rhs || '|',
                         '|' || m1.lhs || m1.rhs || '|'),
                         '|' || m2.lhs || '||' || m2.rhs || '|',
                         '|' || m2.lhs || m2.rhs || '|'),
                         '|' || m3.lhs || '||' || m3.rhs || '|',
                         '|' || m3.lhs || m3.rhs || '|'),
                       '||'), x -> x <> ''))) AS sub
                   FROM d, m1, m2, m3)
              SELECT doc_id, CAST(len(sub) AS BIGINT) AS n_subwords,
                array_to_string(sub, ' ') AS subwords
              FROM e ORDER BY doc_id""")
    ),

    // tokenizer-design statistic: cumulative corpus coverage of the top-k
    // vocabulary (what OOV rate a size-k vocab buys). Exact integer basis
    // points. The rank and running sum ride ScalableWindow's two-phase
    // plan over the total order (cnt DESC, w) — a real vocabulary is
    // millions of rows, so even the "already aggregated" frame deserves
    // the sliced form rather than the single-reducer window exemption
    // (which also logged WindowExec's no-partition WARN every run).
    "t_vocab_coverage" -> QueryDef(
      (s, dir) => {
        val words = t(s, dir, "documents")
          .select(explode(graft.functions.WordNgrams(col("text"), 1)).as("w"))
          .groupBy("w").agg(count(lit(1)).as("cnt"))
        val tot = words.agg(sum("cnt").as("tot"))
        val order = Seq(col("cnt").desc, col("w"))
        val ranked = graft.ops.ScalableWindow.rowNumber(
          words.crossJoin(broadcast(tot)), order, "rk")
        graft.ops.ScalableWindow.runningSum(ranked, order, col("cnt"), "cum")
          .select(col("rk"), col("w"), col("cnt"),
            expr("CAST(cum * 10000 DIV tot AS BIGINT)").as("cov_bps"))
          .orderBy("rk")
      },
      Some("""WITH wd AS (
                SELECT unnest(list_filter(
                  string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS w
                FROM documents),
              c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM wd GROUP BY w),
              t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM c)
              SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS BIGINT) AS rk,
                w, cnt,
                CAST(SUM(cnt) OVER (ORDER BY cnt DESC, w ROWS UNBOUNDED PRECEDING)
                  * 10000 // tot AS BIGINT) AS cov_bps
              FROM c, t ORDER BY rk""")
    ),

    "t_ngram_freq" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(explode(Dedup.shingles(col("text"), 2)).as("ngram"))
        .groupBy("ngram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ngram")).limit(20),
      Some("""WITH w AS (
                SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS words
                FROM documents),
              sh AS (
                SELECT doc_id,
                  unnest(list_distinct(list_transform(range(0, GREATEST(len(words) - 1, 0)),
                    x -> words[x + 1] || ' ' || words[x + 2]))) AS ngram
                FROM w)
              SELECT ngram, COUNT(*) AS n FROM sh
              GROUP BY ngram ORDER BY n DESC, ngram LIMIT 20""")
    ),

    // deterministic hash-derived train/val split: the bucket comes from the
    // md5 of the id (stable across engines, runs, and partitionings — an
    // RNG-based split would be none of those), ~94% train via hex-digit
    // bucketing. ascii(first md5 hex char) is engine-neutral arithmetic.
    "p_train_split" -> QueryDef(
      (s, dir) => {
        // first md5 hex digit decoded to its uniform 0..15 value
        val a = ascii(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1))
        val bucket = when(a >= 97, a - 87).otherwise(a - 48)
        t(s, dir, "documents")
          .select(col("doc_id"), bucket.cast("long").as("bucket"))
          .withColumn("split", when(col("bucket") < 14, lit("train")).otherwise(lit("val")))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (
                SELECT doc_id, ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) AS a
                FROM documents),
              b AS (
                SELECT doc_id,
                  CAST(CASE WHEN a >= 97 THEN a - 87 ELSE a - 48 END AS BIGINT) AS bucket
                FROM h)
              SELECT doc_id, bucket,
                CASE WHEN bucket < 14 THEN 'train' ELSE 'val' END AS split
              FROM b ORDER BY doc_id""")
    ),

    // LEAKAGE-SAFE split: the per-doc hash split above puts two near-
    // duplicate documents on opposite sides of the train/val boundary
    // with probability 2·p·(1−p) — which is exactly how eval sets get
    // contaminated. The group-aware split hashes the near-dup GROUP
    // (connected-component root over fingerprint-equality edges, the
    // d_neardup_groups machinery) instead of the doc, so every member of
    // a group lands in the same split by construction. Scale shape: the
    // pointer-jumping CC bounds rounds at log(diameter); the split
    // decision is then a per-row hash of the group id — no extra shuffle
    // beyond the CC itself. DuckDB restates groups as a window MIN over
    // the normalized-text digest and re-derives the same hash decision.
    "p_group_split" -> QueryDef(
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"), graft.ops.Text.fingerprint(col("text")).as("fp"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("fp").orderBy("doc_id")
        val edges = d.withColumn("nxt", lead(col("doc_id"), 1).over(w))
          .where(col("nxt").isNotNull)
          .select(col("doc_id").as("src"), col("nxt").as("dst"))
        val cc = Dedup.connectedComponents(d.select(col("doc_id").as("id")), edges)
        val a = ascii(substring(
          md5(col("group_id").cast("string").cast("binary")), 1, 1))
        val bucket = when(a >= 97, a - 87).otherwise(a - 48)
        cc.select(col("id").as("doc_id"), col("group_id"))
          .withColumn("split",
            when(bucket.cast("long") < 14, lit("train")).otherwise(lit("val")))
          .orderBy("doc_id")
      },
      Some("""WITH g AS (
                SELECT doc_id,
                  MIN(doc_id) OVER (
                    PARTITION BY md5(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS group_id
                FROM documents),
              h AS (
                SELECT doc_id, group_id,
                  ascii(substr(md5(CAST(group_id AS VARCHAR)), 1, 1)) AS a
                FROM g)
              SELECT doc_id, group_id,
                CASE WHEN (CASE WHEN a >= 97 THEN a - 87 ELSE a - 48 END) < 14
                     THEN 'train' ELSE 'val' END AS split
              FROM h ORDER BY doc_id""")
    ),

    // training-sequence packing: token chunks fill fixed 512-token
    // sequences contiguously WITHIN a shard (doc_id mod 32) — per-shard
    // running token totals assign each chunk its sequence id. Sharding
    // keeps the window partitioned: a single global pack order would
    // serialize the whole corpus through one task at scale, and real
    // packers pack per shard/worker anyway.
    "p_pack_chunks" -> QueryDef(
      (s, dir) => {
        val chunks = t(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(Text.chunk(col("text"), window = 32, stride = 24))
              .as(Seq("chunk_idx", "chunk")))
          .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
            Text.tokenCount(col("chunk")).as("n_tok"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("doc_id", "chunk_idx")
        chunks.withColumn("shard", (col("doc_id") % 32).cast("long"))
          .withColumn("cum", sum(col("n_tok")).over(w))
          .withColumn("seq_id", expr("(cum - n_tok) div 512"))
          .select("shard", "doc_id", "chunk_idx", "n_tok", "seq_id")
          .orderBy("doc_id", "chunk_idx")
      },
      Some("""WITH w AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
                FROM documents),
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
                FROM c)
              SELECT shard, doc_id, chunk_idx, n_tok,
                CAST((cum - n_tok) // 512 AS BIGINT) AS seq_id
              FROM sq ORDER BY doc_id, chunk_idx""")
    ),

    // end-to-end training-data cleaning pipeline: exact dedup -> token/
    // language scoring -> quality gate -> fingerprint. Composes the dedup +
    // text operators the way a real corpus pipeline chains them, and every
    // stage is relational, so the WHOLE pipeline gets a DuckDB oracle.
    "p_clean_corpus" -> QueryDef(
      (s, dir) => {
        val deduped = Dedup.exactDedup(t(s, dir, "documents"), "doc_id", "text")
        deduped
          .withColumn("n_tokens", Text.tokenCount(col("text")))
          .withColumn("lang_pred", Text.langId(col("text")))
          .withColumn("fp", Text.fingerprint(col("text")))
          .where(col("n_tokens") >= 20 && col("lang_pred") === "en")
          .select("doc_id", "n_tokens", "fp")
          .orderBy("doc_id")
      },
      Some("""WITH dedup AS (
                SELECT doc_id, text,
                  ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                FROM documents),
              scored AS (
                SELECT doc_id,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
                  CASE WHEN len(regexp_extract_all(text, '\b(the|and|of|to|a|in|is|it|that|for)\b')) >= 3
                       THEN 'en' ELSE 'other' END AS lang_pred,
                  md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
                FROM dedup WHERE rn = 1)
              SELECT doc_id, n_tokens, fp FROM scored
              WHERE n_tokens >= 20 AND lang_pred = 'en'
              ORDER BY doc_id""")
    ),

    // multimodal: binary column + metadata extraction (octet length)
    "m_binary_meta" -> QueryDef(
      (s, dir) => Multimodal.attachBinary(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), octet_length(col("media")).cast("long").as("n_bytes"),
          col("media_type"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                'text/plain' AS media_type
              FROM documents ORDER BY doc_id""")
    ),

    // multimodal: frame sampling — one row per sampled fixed-size "frame" of
    // the binary payload (stubbed demuxer, real fan-out shape). The stub's
    // byte-histogram math is SQL-expressible, so the whole mapPartitions
    // fan-out gets an exact DuckDB oracle: frames of 64 bytes, stride 2,
    // f0/f1 = counts of bytes in [0,31]/[32,63]. The oracle slices by CHAR
    // where Spark slices by BYTE — equivalent because the corpus is pure
    // ASCII (enforced by the f0 column itself: any multi-byte char would
    // shift every downstream count).
    "m_frame_sample" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val media = Multimodal.attachBinary(t(s, dir, "documents"), "doc_id", "text")
          .as[Multimodal.MediaRow]
        Multimodal.fakeFrameSample(s, media).toDF()
          .select(col("doc_id"), col("frame_idx"), col("n_bytes"),
            col("features")(0).cast("long").as("f0"),
            col("features")(1).cast("long").as("f1"))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""WITH f AS (
                SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT) AS n,
                  GREATEST(CAST(CEIL(octet_length(encode(text)) / 64.0) AS BIGINT), 1) AS nframes
                FROM documents),
              u AS (
                SELECT doc_id, text, n, unnest(range(0, nframes)) AS fi FROM f),
              fr AS (
                SELECT doc_id, fi AS frame_idx,
                  LEAST((fi + 1) * 64, n) - fi * 64 AS n_bytes,
                  substr(text, CAST(fi * 64 + 1 AS INTEGER), 64) AS frame
                FROM u WHERE fi % 2 = 0)
              SELECT doc_id, frame_idx, n_bytes,
                CAST(len(regexp_extract_all(frame, '[\x00-\x1f]')) AS BIGINT) AS f0,
                CAST(len(regexp_extract_all(frame, '[\x20-\x3f]')) AS BIGINT) AS f1
              FROM fr ORDER BY doc_id, frame_idx""")
    ),

    // multimodal resize analog: average-pool the 64-dim embedding to 8
    // buckets (image-resize-shaped math, declarative so it fuses into the
    // scan); each bucket emitted as its own DOUBLE column for an exact oracle
    "m_resize" -> QueryDef(
      (s, dir) => {
        val pooled = Multimodal.poolFeatures(col("embedding"), 64, 8)
        t(s, dir, "embeddings").select(
          col("vec_id") +: (0 until 8).map(i => pooled(i).as(s"p$i")): _*)
          .orderBy("vec_id")
      },
      Some {
        val cols = (0 until 8).map { b =>
          s"CAST(list_sum(CAST(embedding[${b * 8 + 1}:${b * 8 + 8}] AS DOUBLE[])) / 8 AS DOUBLE) AS p$b"
        }.mkString(", ")
        s"SELECT vec_id, $cols FROM embeddings ORDER BY vec_id"
      }
    ),

    // multimodal: per-partition (stubbed) decode + feature extraction — the
    // deterministic byte histogram is SQL-expressible, so the mapPartitions
    // pipeline is hash-checked end to end: f1/f2/f3 = counts of bytes in
    // [32,63]/[64,95]/[96,127] (the discriminating buckets for ASCII text;
    // same char=byte equivalence note as m_frame_sample)
    "m_decode_features" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val media = Multimodal.attachBinary(t(s, dir, "documents"), "doc_id", "text")
          .as[Multimodal.MediaRow]
        Multimodal.fakeDecodeFeatures(s, media).toDF()
          .select(col("doc_id"), col("n_bytes"),
            col("features")(1).cast("long").as("f1"),
            col("features")(2).cast("long").as("f2"),
            col("features")(3).cast("long").as("f3"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                CAST(len(regexp_extract_all(text, '[\x20-\x3f]')) AS BIGINT) AS f1,
                CAST(len(regexp_extract_all(text, '[\x40-\x5f]')) AS BIGINT) AS f2,
                CAST(len(regexp_extract_all(text, '[\x60-\x7f]')) AS BIGINT) AS f3
              FROM documents ORDER BY doc_id""")
    ),

    // TRAINED quality classifier gate (r13): MLlib logistic regression
    // fit DISTRIBUTED on a labeled 80% split, then the full corpus scored
    // DECLARATIVELY — the fitted coefficients come back to the driver (3
    // doubles) and the scoring plan is a codegen'd dot product + sigmoid,
    // no model object or UDF near the corpus scan. The labels are PLANTED
    // from an exact integer linear rule over two real text features
    // (2·n_chars − 11·n_tokens > 0, a chars-per-token threshold), with a
    // margin gate |z| ≥ 4 excluding boundary docs — linearly separable
    // WITH MARGIN, so the fit must recover the rule and every
    // (train or held-out) prediction must equal the label: the oracle
    // restates rule and label arithmetic and asserts pred = label, making
    // the entire train→extract→score composition hash-checked (the same
    // planted-gate discipline as the ANN/sketch families). Scale shape:
    // training touches only the labeled subset; scoring is one projected
    // expression per corpus row.
    "p_lr_quality" -> QueryDef(
      (s, dir) => {
        val feats = t(s, dir, "documents").select(
          col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          Text.tokenCount(col("text")).as("n_tokens"))
          .withColumn("z", lit(2L) * col("n_chars") - lit(11L) * col("n_tokens"))
          .where(abs(col("z")) >= 4)
          .withColumn("label", (col("z") > 0).cast("long"))
        val model = QualityModel.train(
          feats.where(col("doc_id") % 5 =!= 0),
          Seq("n_chars", "n_tokens"), "label")
        feats.select(col("doc_id"), col("n_chars"), col("n_tokens"),
            col("label"), QualityModel.predict(model).as("pred"),
            (col("doc_id") % 5 === 0).cast("long").as("held_out"))
          .orderBy("doc_id")
      },
      Some("""WITH f AS (
                SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                    AS n_tokens
                FROM documents),
              g AS (
                SELECT doc_id, n_chars, n_tokens,
                  2 * n_chars - 11 * n_tokens AS z FROM f)
              SELECT doc_id, n_chars, n_tokens,
                CASE WHEN z > 0 THEN 1 ELSE 0 END AS label,
                CASE WHEN z > 0 THEN 1 ELSE 0 END AS pred,
                CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS held_out
              FROM g WHERE abs(z) >= 4 ORDER BY doc_id""")
    ),

    // fastText-shape TEXT classifier gate (r14): features are hashed word
    // BIGRAMS — functions.FeatureHash maps each doc to a fixed 16-dim
    // count vector in one codegen'd pass (no vocabulary, no UDF) — the LR
    // fit runs distributed on the held-in subset and scoring is a Column
    // fold over the k dims (k=16, margin 6: probed exact at every SF with
    // headroom — k=64/margin-3 left held-out points near the band
    // misclassified). The PLANTED rule lives on the hashed-feature
    // SUM (Σⱼ x[j] = the doc's bigram count — hash-invariant, so the
    // oracle restates it exactly while the model must recover it IN the
    // hashed space): the rule is linear there (the all-ones hyperplane),
    // a margin excludes the boundary band, and the oracle asserts
    // pred = label on every row INCLUDING the held-out fold — a wrong
    // hash kernel, broken assembly, or diverged fit all break the hash.
    "p_lr_text_quality" -> QueryDef(
      (s, dir) => {
        val feats = t(s, dir, "documents").select(col("doc_id"),
            graft.functions.FeatureHash(col("text"), 2, 16).as("fv"))
          .withColumn("n_grams",
            aggregate(col("fv"), lit(0L), (a, x) => a + x))
          .where(abs(col("n_grams") - 54) >= 6)
          .withColumn("label", (col("n_grams") > 54).cast("long"))
        val model = QualityModel.trainHashed(
          feats.where(col("doc_id") % 5 =!= 0), "fv", "label")
        feats.select(col("doc_id"), col("n_grams"), col("label"),
            QualityModel.predictHashed(model, col("fv")).as("pred"),
            (col("doc_id") % 5 === 0).cast("long").as("held_out"))
          .orderBy("doc_id")
      },
      Some("""WITH f AS (
                SELECT doc_id,
                  GREATEST(CAST(len(string_split_regex(trim(lower(text)), '\s+'))
                    AS BIGINT) - 1, 1) AS n_grams
                FROM documents)
              SELECT doc_id, n_grams,
                CASE WHEN n_grams > 54 THEN 1 ELSE 0 END AS label,
                CASE WHEN n_grams > 54 THEN 1 ELSE 0 END AS pred,
                CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS held_out
              FROM f WHERE abs(n_grams - 54) >= 6 ORDER BY doc_id""")
    ),

    // multimodal: REAL image decode via the JDK's own codecs (r13) — each
    // doc gets a deterministic constant-gray raster encoded as genuine
    // PNG or JPEG bytes (javax.imageio), and the pipeline decodes them
    // back per partition: dimensions for both formats (lossless in the
    // container grammar), exact mean gray for PNG (JPEG's quantization
    // makes it non-derivable → −1 by contract). The oracle restates the
    // generation arithmetic relationally, so the hash proves a true
    // byte-level encode→decode round trip — the metadata/feature half of
    // an image pipeline with zero external dependencies. Only frame
    // DECODE for non-JDK codecs (H.264/VP9/webp/opus) remains stubbed
    // (r14: mp4/webm METADATA demux is real — m_mp4_meta/m_webm_meta).
    "m_image_decode" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val rows = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .mapPartitions { it =>
            it.map { id =>
              val fmt = if (id % 2 == 0) "png" else "jpeg"
              val w = 1 + (id % 32).toInt
              val h = 1 + (id % 17).toInt
              Multimodal.ImageRow(id,
                Multimodal.encodeImage(w, h, (id % 256).toInt, fmt), fmt)
            }
          }
        Multimodal.decodeImages(s, rows).toDF()
          .select(col("doc_id"), col("format"), col("width"), col("height"),
            col("mean_gray"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
                1 + doc_id % 32 AS width,
                1 + doc_id % 17 AS height,
                CASE WHEN doc_id % 2 = 0 THEN doc_id % 256 ELSE -1 END
                  AS mean_gray
              FROM documents ORDER BY doc_id""")
    ),

    // multimodal: REAL audio decode via javax.sound.sampled (r13) — each
    // doc gets constant-amplitude 16-bit PCM encoded as a genuine
    // RIFF/WAVE file, and the pipeline parses the headers back (rate,
    // channels, frame count → duration) and scans the PCM body for the
    // peak amplitude — the feature-extraction shape of an audio-quality
    // gate, exact because PCM is lossless. Same oracle discipline as the
    // image twin: the hash proves the byte-level round trip.
    "m_audio_decode" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val rows = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .mapPartitions { it =>
            it.map { id =>
              val rate = 8000 * (1 + (id % 3)).toInt
              val ch = 1 + (id % 2).toInt
              val frames = 160 + (id % 100).toInt
              Multimodal.MediaBytesRow(id,
                Multimodal.encodeWav(rate, ch, frames, (id % 1000).toShort))
            }
          }
        Multimodal.decodeAudio(s, rows).toDF()
          .select(col("doc_id"), col("sample_rate"), col("channels"),
            col("n_frames"), col("duration_us"), col("peak"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                8000 * (1 + doc_id % 3) AS sample_rate,
                1 + doc_id % 2 AS channels,
                160 + doc_id % 100 AS n_frames,
                (160 + doc_id % 100) * 1000000 // (8000 * (1 + doc_id % 3))
                  AS duration_us,
                doc_id % 1000 AS peak
              FROM documents ORDER BY doc_id""")
    ),

    // multimodal: REAL video frame sampling (r13) — each doc gets a
    // structurally valid MJPEG-in-AVI file (RIFF container grammar, one
    // genuine JPEG per frame), and the pipeline DEMUXES it by walking the
    // movi chunk list and DECODES every 2nd frame through the JDK JPEG
    // reader — honest container parsing + real codec work per sampled
    // frame, one row fanning out via an iterator. Dimensions are lossless
    // through JPEG, so the oracle restates the generation arithmetic
    // (frame count, stride, dims) exactly; only the per-frame byte size
    // is codec-determined and emitted as a positivity flag. Non-RIFF
    // containers demux for METADATA too (r14: m_mp4_meta/m_webm_meta);
    // only their frame DECODE stays with the marked stub (no JDK codec).
    "m_video_frames" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        // fanned out across the cores: safe AND profitable only since the
        // ImageIO plugin lookups moved to thread-cached readers/writers
        // (Multimodal.cachedReader) — with per-call ImageIO.read/write the
        // JVM-global synchronized registry made 32 concurrent decode tasks
        // SLOWER than one (measured: warm 8-10 s fanned vs 5 s single,
        // then 2.6 s single and sub-second fanned once the registry scans
        // were hoisted). The shuffle is bare longs.
        val rows = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .repartition(s.sparkContext.defaultParallelism)
          .mapPartitions { it =>
            it.map { id =>
              val w = 4 + (id % 12).toInt
              val h = 3 + (id % 7).toInt
              val n = 3 + (id % 6).toInt
              Multimodal.MediaBytesRow(id, Multimodal.encodeAviMjpeg(
                w, h, n, fi => ((id + 37L * fi) % 256).toInt))
            }
          }
        Multimodal.sampleAviFrames(s, rows, stride = 2).toDF()
          .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
            (col("n_bytes") > 0).cast("long").as("decoded"))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""WITH d AS (
                SELECT doc_id, 3 + doc_id % 6 AS nframes FROM documents),
              u AS (
                SELECT doc_id, unnest(range(0, nframes)) AS frame_idx FROM d)
              SELECT doc_id, frame_idx,
                4 + doc_id % 12 AS width, 3 + doc_id % 7 AS height,
                1 AS decoded
              FROM u WHERE frame_idx % 2 = 0
              ORDER BY doc_id, frame_idx""")
    ),

    // multimodal: REAL mp4 (ISO-BMFF) METADATA demux (r14) — each doc gets
    // a structurally valid single-track mp4 (ftyp/moov/mvhd/trak/tkhd/
    // mdia/mdhd/hdlr/stbl/stsd/stsz/mdat) whose dimensions, duration,
    // codec fourcc and sample count derive from the doc, and the pipeline
    // walks the box tree back out — duration converted through the media
    // timescale, dimensions from tkhd's 16.16 fixed point. NO codec is
    // involved (that's the point: resolution/duration gates are container
    // arithmetic); frame decode for non-JDK codecs stays the marked stub.
    "m_mp4_meta" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val rows = t(s, dir, "documents")
          .select(col("doc_id"), Text.tokenCount(col("text")).as("nt"))
          .as[(Long, Long)]
          .mapPartitions { it =>
            it.map { case (id, nt) =>
              Multimodal.MediaBytesRow(id, Multimodal.encodeMp4(
                width = 16 * (1 + (id % 4)).toInt,
                height = 16 * (1 + (id % 3)).toInt,
                timescale = 1000, durationUnits = (nt * 40L).toInt,
                nSamples = nt.toInt))
            }
          }
        Multimodal.demuxMp4Meta(s, rows).toDF().orderBy("doc_id")
      },
      Some("""SELECT doc_id, 'avc1' AS codec,
                16 * (1 + doc_id % 4) AS width,
                16 * (1 + doc_id % 3) AS height,
                CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                  AS n_samples,
                CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                  * 40 * 1000 AS duration_us
              FROM documents ORDER BY doc_id""")
    ),

    // multimodal: REAL webm (EBML/Matroska) METADATA demux (r14) — each
    // doc gets a structurally valid webm skeleton (EBML header + Segment(
    // Info(TimestampScale, Duration) + Tracks(TrackEntry(CodecID,
    // Video(PixelWidth, PixelHeight))))) and the pipeline walks the
    // variable-length elements back out with a general vint reader — the
    // same no-codec container-arithmetic discipline as the mp4 twin.
    "m_webm_meta" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val rows = t(s, dir, "documents")
          .select(col("doc_id"), Text.tokenCount(col("text")).as("nt"))
          .as[(Long, Long)]
          .mapPartitions { it =>
            it.map { case (id, nt) =>
              Multimodal.MediaBytesRow(id, Multimodal.encodeWebm(
                width = 160 + (id % 32).toInt, height = 90 + (id % 18).toInt,
                durationTs = nt * 40L))
            }
          }
        Multimodal.demuxWebmMeta(s, rows).toDF().orderBy("doc_id")
      },
      Some("""SELECT doc_id, 'V_VP9' AS codec,
                160 + doc_id % 32 AS width,
                90 + doc_id % 18 AS height,
                CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                  * 40 AS duration_ts,
                CAST(1000000 AS BIGINT) AS timescale_ns
              FROM documents ORDER BY doc_id""")
    ),

    // Okapi BM25 ranking (the Lucene "+1" idf variant) of the corpus
    // against a fixed 3-term query — the retrieval scorer a RAG pipeline
    // runs over its candidate set. Per-term scores are rounded ONCE to
    // integer micro-units and summed as BIGINT (the p_dsir_weights
    // discipline — order-independent exact under any partitioning);
    // corpus stats (N, avgdl) ride as a broadcast single-row aggregate
    // and the per-term df table is |Q| rows, so the only wide shuffles
    // are the per-doc length and query-term tf groupBys — the tf input is
    // pre-filtered to query terms, term-posting-list sized, never corpus
    // sized. Top-10 is TakeOrdered (never a global sort); ties broken by
    // doc_id so LIMIT is deterministic.
    "t_bm25" -> QueryDef(
      (s, dir) => {
        val words = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(graft.functions.WordNgrams(col("text"), 1)).as("w"))
        val dl = words.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val stats = dl.agg(count(lit(1)).as("n_docs"),
          sum("dl").cast("double").as("tot_dl"))
        val tf = words.where(col("w").isin("spark", "join", "fast"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        val dfc = tf.groupBy("w").agg(count(lit(1)).as("df"))
        // k1 = 1.2, b = 0.75 pre-folded: k1+1 = 2.2, k1(1-b) = 0.3,
        // k1*b = 0.9; expression tree parenthesized identically in the
        // oracle so the doubles match bit-for-bit before the one rounding
        val idf = log(lit(1.0) +
          ((col("n_docs") - col("df")) + lit(0.5)) / (col("df") + lit(0.5)))
        val frac = (col("tf") * lit(2.2)) /
          (col("tf") + (lit(0.3) + lit(0.9) *
            (col("dl").cast("double") / (col("tot_dl") / col("n_docs")))))
        tf.join(broadcast(dfc), "w")
          .join(dl, "doc_id")
          .crossJoin(broadcast(stats))
          .select(col("doc_id"),
            round((idf * frac) * lit(1e6), 0).cast("long").as("s_u"))
          .groupBy("doc_id")
          .agg(sum("s_u").as("score_u"), count(lit(1)).as("n_terms"))
          .orderBy(col("score_u").desc, col("doc_id"))
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
                FROM tf JOIN dfc USING (w) JOIN dl USING (doc_id) CROSS JOIN st)
              SELECT doc_id, CAST(SUM(s_u) AS BIGINT) AS score_u,
                COUNT(*) AS n_terms
              FROM sc GROUP BY doc_id
              ORDER BY score_u DESC, doc_id LIMIT 10""")
    ),

    // Zipf-law fit of the vocabulary (slope of ln(freq) on ln(rank) over
    // the top-100 words): natural corpora sit near slope −1 — a corpus
    // whose fit drifts far off is synthetic, templated, or broken, making
    // this a one-number corpus-health diagnostic. Each log rounds ONCE to
    // integer micro-nats, the regression moments are then exact BIGINT
    // sums (a raw double Σln would be addition-order-dependent and could
    // never hash-match), and the closed-form slope/intercept evaluate in
    // identically-parenthesized doubles rounded once. The rank window
    // runs over the TakeOrdered top-100 — the admitted reduced shape.
    "t_zipf_fit" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val top = t(s, dir, "documents")
          .select(explode(graft.functions.WordNgrams(col("text"), 1)).as("w"))
          .groupBy("w").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("w")).limit(100)
        val xy = top
          .select(row_number()
            .over(Window.orderBy(col("cnt").desc, col("w")))
            .cast("long").as("rank"), col("cnt"))
          .select(
            round(log(col("rank").cast("double")) * lit(1e6), 0)
              .cast("long").as("xu"),
            round(log(col("cnt").cast("double")) * lit(1e6), 0)
              .cast("long").as("yu"))
        xy.agg(count(lit(1)).as("n"),
            sum("xu").as("sx"), sum("yu").as("sy"),
            sum(col("xu") * col("yu")).as("sxy"),
            sum(col("xu") * col("xu")).as("sxx"))
          .select(col("n"),
            round(expr("(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)") * lit(1e6), 0)
              .cast("long").as("slope_micro"),
            round(expr("(CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * sx) / CAST(n AS DOUBLE)"), 0)
              .cast("long").as("intercept_unats"))
      },
      Some("""WITH w AS (
                SELECT unnest(list_filter(
                  string_split_regex(trim(lower(text)), '\s+'),
                  x -> x <> '')) AS w
                FROM documents),
              top AS (
                SELECT w, COUNT(*) AS cnt FROM w GROUP BY w
                ORDER BY cnt DESC, w LIMIT 100),
              r AS (
                SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, w)
                    AS BIGINT) AS rank, cnt
                FROM top),
              xy AS (
                SELECT
                  CAST(ROUND(ln(CAST(rank AS DOUBLE)) * 1e6, 0) AS BIGINT) AS xu,
                  CAST(ROUND(ln(CAST(cnt AS DOUBLE)) * 1e6, 0) AS BIGINT) AS yu
                FROM r),
              m AS (
                SELECT COUNT(*) AS n, CAST(SUM(xu) AS BIGINT) AS sx,
                  CAST(SUM(yu) AS BIGINT) AS sy,
                  CAST(SUM(xu * yu) AS BIGINT) AS sxy,
                  CAST(SUM(xu * xu) AS BIGINT) AS sxx
                FROM xy)
              SELECT n,
                CAST(ROUND(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * 1e6, 0) AS BIGINT) AS slope_micro,
                CAST(ROUND((CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * sx) / CAST(n AS DOUBLE), 0) AS BIGINT) AS intercept_unats
              FROM m""")
    ),

    // language-ID CONFUSION MATRIX: the heuristic classifier's predictions
    // against the corpus's ground-truth lang column — the eval every
    // classifier in a pipeline needs before its output gates data. One
    // groupBy on a (truth, prediction) pair of tiny cardinality.
    "t_lang_confusion" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .groupBy(col("lang"), graft.ops.Text.langId(col("text")).as("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred"),
      Some("""SELECT lang,
                CASE WHEN len(regexp_extract_all(text,
                    '\b(the|and|of|to|a|in|is|it|that|for)\b')) >= 3
                  THEN 'en' ELSE 'other' END AS pred,
                COUNT(*) AS n
              FROM documents GROUP BY lang, pred ORDER BY lang, pred""")
    ),

    // per-document token ENTROPY (micro-nats): the gibberish/boilerplate
    // quality signal repetition counts alone miss — low entropy flags
    // keyword-stuffed or template docs, high entropy flags random noise.
    // H = ln(n) - (Σ c_w·ln(c_w))/n with the Σ term rounded ONCE per word
    // to integer micro-nats before the BIGINT sum (order-independent
    // exact, the KL/DSIR discipline); two bounded shuffles, (doc, word)
    // then doc.
    "t_entropy" -> QueryDef(
      (s, dir) => {
        val counts = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(graft.functions.WordNgrams(col("text"), 1)).as("w"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        counts.groupBy("doc_id").agg(
            sum("c").as("n_tok"),
            sum(round((col("c").cast("double") *
                log(col("c").cast("double"))) * lit(1e6), 0).cast("long"))
              .as("s_unats"))
          .select(col("doc_id"), col("n_tok"),
            (round(log(col("n_tok").cast("double")) * lit(1e6), 0).cast("long")
              - round(col("s_unats").cast("double") / col("n_tok"), 0)
                .cast("long")).as("h_unats"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (
                SELECT doc_id, unnest(list_filter(
                  string_split_regex(trim(lower(text)), '\s+'),
                  x -> x <> '')) AS w
                FROM documents),
              c AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY doc_id, w),
              d AS (
                SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
                  CAST(SUM(CAST(ROUND((CAST(c AS DOUBLE) *
                    ln(CAST(c AS DOUBLE))) * 1e6, 0) AS BIGINT)) AS BIGINT)
                    AS s_unats
                FROM c GROUP BY doc_id)
              SELECT doc_id, n_tok,
                CAST(ROUND(ln(CAST(n_tok AS DOUBLE)) * 1e6, 0) AS BIGINT)
                  - CAST(ROUND(CAST(s_unats AS DOUBLE) / n_tok, 0) AS BIGINT)
                  AS h_unats
              FROM d ORDER BY doc_id""")
    ),

    // positional inverted index + phrase query: postings are
    // (word, doc_id, pos) rows — the index build every search system runs
    // over a corpus — and a 3-word phrase match is two positional
    // self-intersections (pos+1, pos+2). Each join input is restricted to
    // ONE phrase word before joining, so the intersections are
    // posting-list sized, never corpus sized, and they key on
    // (doc_id, pos) — a join Catalyst plans as one hash join per word at
    // any corpus scale. Positions are raw 1-based split slots, identical
    // in both engines by construction.
    "t_phrase_search" -> QueryDef(
      (s, dir) => {
        val post = t(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("p0", "w")))
          .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("w"))
        val p1 = post.where(col("w") === "fast").select("doc_id", "pos")
        val p2 = post.where(col("w") === "key")
          .select(col("doc_id"), (col("pos") - 1).as("pos"))
        val p3 = post.where(col("w") === "scan")
          .select(col("doc_id"), (col("pos") - 2).as("pos"))
        p1.join(p2, Seq("doc_id", "pos")).join(p3, Seq("doc_id", "pos"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_hits"), min("pos").as("first_pos"))
          .orderBy("doc_id")
      },
      Some("""WITH p0 AS (
                SELECT doc_id,
                  string_split_regex(trim(lower(text)), '\s+') AS a
                FROM documents),
              post AS (
                SELECT doc_id, unnest(a) AS w,
                  CAST(generate_subscripts(a, 1) AS BIGINT) AS pos
                FROM p0),
              p1 AS (SELECT doc_id, pos FROM post WHERE w = 'fast'),
              p2 AS (SELECT doc_id, pos - 1 AS pos FROM post WHERE w = 'key'),
              p3 AS (SELECT doc_id, pos - 2 AS pos FROM post WHERE w = 'scan')
              SELECT doc_id, COUNT(*) AS n_hits, MIN(pos) AS first_pos
              FROM p1 JOIN p2 USING (doc_id, pos) JOIN p3 USING (doc_id, pos)
              GROUP BY doc_id ORDER BY doc_id""")
    ),

    // Hashing-trick dense text embedding (r17): a fixed 16-dim L2-normalized
    // vector from raw text with NO trained model — signed md5 feature
    // hashing in the repo's exact-unit form, so the FULL embedding carries
    // a DuckDB oracle (tokens, 13-hex md5 prefix, signed cell counts, and
    // floor(x+0.5) micro-normalization all restated; Σc² is exact integer,
    // sqrt and one division are single correctly-rounded IEEE ops). This is
    // the kernel that makes the vector stack (cosine top-k, ANN, semantic
    // dedup, the maintained index) reachable from corpora that arrive as
    // text with no embedding column. One codegen'd projection per row.
    "t_hash_embed" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(graft.functions.HashEmbed(col("text"), 16))
            .as(Seq("i", "u")))
        .select(col("doc_id"), col("i").cast("long").as("i"), col("u"))
        .orderBy("doc_id", "i"),
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
              nrm AS (SELECT doc_id, SUM(c * c) AS ssq FROM fc GROUP BY doc_id)
              SELECT fc.doc_id, fc.i,
                CASE WHEN nrm.ssq = 0 THEN CAST(0 AS BIGINT)
                     ELSE CAST(FLOOR(1000000.0 * fc.c / sqrt(nrm.ssq) + 0.5)
                            AS BIGINT) END AS u
              FROM fc JOIN nrm ON nrm.doc_id = fc.doc_id
              ORDER BY fc.doc_id, fc.i""")
    ),

    // Compression-ratio quality gate (r17): DEFLATE per-mille ratio as the
    // one-number repetition/boilerplate signal (the CCNet/RedPajama-family
    // filter). DuckDB cannot deflate, so the gate is oracle-checked on
    // PLANTED classes built from doc arithmetic: one 32-char md5 block
    // repeated 24x (back-references collapse it, ratio well under 100
    // per-mille) vs 24 DISTINCT md5 blocks (random hex, ~500 per-mille) —
    // the 250 threshold sits >2x from both classes, and DEFLATE of a fixed
    // string is a constant, so the verdict is deterministic. A wrong
    // deflate call, ratio arithmetic, or threshold comparison flips rows.
    "t_compress_ratio" -> QueryDef(
      (s, dir) => {
        val distinct24 = expr(
          """array_join(transform(sequence(0, 23), j ->
             md5(cast(concat('cr-', cast(doc_id as string), '-',
                             cast(j as string)) as binary))), '')""")
        val repeated24 = expr(
          """repeat(md5(cast(concat('cr-', cast(doc_id as string))
                        as binary)), 24)""")
        val synth = when(col("doc_id") % 3 === 0, repeated24)
          .otherwise(distinct24)
        t(s, dir, "documents")
          .select(col("doc_id"),
            (graft.functions.DeflateRatio(synth) < 250L).as("compressible"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, (doc_id % 3 = 0) AS compressible
              FROM documents ORDER BY doc_id""")
    ),

    // perceptual dHash over a REAL PNG round trip (r17): every pixel of
    // the generated image is arithmetic (encodePatternImage's documented
    // formula), so the oracle recomputes the 9x8 integer pooling and all
    // 64 adjacent-pool comparison bits from the formula alone — a defect
    // anywhere in PNG encode, ImageIO decode, pooling, the comparison
    // convention, or bit packing flips bits and breaks the hash. Emitted
    // bit-exploded (idx = r*8+c, bit at packed position 63-idx).
    "m_image_dhash" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val rows = t(s, dir, "documents").select("doc_id").as[Long]
          .repartition(s.sparkContext.defaultParallelism)
          .map(id => Multimodal.ImageRow(id,
            Multimodal.encodePatternImage(18, 16, id), "png"))
        Multimodal.dhashImages(s, rows).toDF()
          .select(col("doc_id"), col("dhash"),
            explode(sequence(lit(0), lit(63))).as("idx"))
          .select(col("doc_id"), col("idx").cast("long").as("idx"),
            call_function("shiftright", col("dhash"), lit(63) - col("idx"))
              .bitwiseAND(lit(1L)).as("bit"))
          .orderBy("doc_id", "idx")
      },
      Some("""WITH d AS (SELECT doc_id FROM documents),
              g AS (SELECT doc_id, r.r AS r, c.c AS c,
                      (( (doc_id*31 + (2*c.c)*(7 + doc_id % 5) + (2*r.r)*13) % 256)
                     + ( (doc_id*31 + (2*c.c+1)*(7 + doc_id % 5) + (2*r.r)*13) % 256)
                     + ( (doc_id*31 + (2*c.c)*(7 + doc_id % 5) + (2*r.r+1)*13) % 256)
                     + ( (doc_id*31 + (2*c.c+1)*(7 + doc_id % 5) + (2*r.r+1)*13) % 256)
                      ) // 4 AS pool
                    FROM d, generate_series(0,7) r(r), generate_series(0,8) c(c))
              SELECT a.doc_id, CAST(a.r*8 + a.c AS BIGINT) AS idx,
                CAST(CASE WHEN a.pool < b.pool THEN 1 ELSE 0 END AS BIGINT) AS bit
              FROM g a JOIN g b ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
              WHERE a.c < 8
              ORDER BY a.doc_id, idx""")
    ),

    // acoustic difference hash over a REAL WAVE round trip (r17): the
    // audio member of the perceptual-dedup family. Every PCM sample of
    // the generated file is arithmetic (encodePatternWav's documented
    // formula), so the oracle recomputes the 65 window energies and all
    // 64 adjacent-window comparison bits from the formula alone — a
    // defect in WAVE encode, javax.sound decode, sample sign handling,
    // windowing, or bit packing breaks the hash.
    "m_audio_ahash" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val rows = t(s, dir, "documents").where(col("doc_id") < 1000)
          .select("doc_id").as[Long]
          .repartition(s.sparkContext.defaultParallelism)
          .map(id => Multimodal.MediaBytesRow(id,
            Multimodal.encodePatternWav(8000, 520, id)))
        Multimodal.ahashAudio(s, rows).toDF()
          .select(col("doc_id"), col("dhash"),
            explode(sequence(lit(0), lit(63))).as("idx"))
          .select(col("doc_id"), col("idx").cast("long").as("idx"),
            call_function("shiftright", col("dhash"), lit(63) - col("idx"))
              .bitwiseAND(lit(1L)).as("bit"))
          .orderBy("doc_id", "idx")
      },
      Some("""WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 1000),
              e AS (SELECT doc_id, w.w AS w,
                      SUM(ABS((doc_id*37 + (w.w*8 + j.j)*(11 + doc_id % 7))
                              % 2048 - 1024)) AS energy
                    FROM d, generate_series(0,64) w(w), generate_series(0,7) j(j)
                    GROUP BY doc_id, w.w)
              SELECT a.doc_id, CAST(a.w AS BIGINT) AS idx,
                CAST(CASE WHEN a.energy < b.energy THEN 1 ELSE 0 END AS BIGINT) AS bit
              FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.w = a.w + 1
              WHERE a.w < 64
              ORDER BY a.doc_id, idx""")
    ),

    // temporal video hash over a REAL MJPEG-AVI round trip (r17): 65
    // constant-gray JPEG frames whose grays follow a documented formula
    // with >= 37-level inter-frame gaps — JPEG's flat-field error (a few
    // DC-quantization levels) can never flip an adjacent-frame MEAN
    // comparison, so the oracle restates every bit from the gray formula
    // alone while Spark walks the real container and decodes every frame.
    // A defect in the RIFF walk, JPEG decode, mean arithmetic, or bit
    // packing breaks the hash.
    "m_video_thash" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        // 250 docs x 65 frames: the fixture's 16k JPEG encodes+decodes are
        // the cost, not the hash; the bit-level gate is as strong at 250
        val rows = t(s, dir, "documents").where(col("doc_id") < 250)
          .select("doc_id").as[Long]
          .repartition(s.sparkContext.defaultParallelism)
          .map(id => Multimodal.MediaBytesRow(id,
            Multimodal.encodeAviMjpeg(8, 8, 65,
              i => (((id * 13L + i * 37L) % 240L) + 8L).toInt)))
        Multimodal.thashVideo(s, rows).toDF()
          .select(col("doc_id"), col("dhash"),
            explode(sequence(lit(0), lit(63))).as("idx"))
          .select(col("doc_id"), col("idx").cast("long").as("idx"),
            call_function("shiftright", col("dhash"), lit(63) - col("idx"))
              .bitwiseAND(lit(1L)).as("bit"))
          .orderBy("doc_id", "idx")
      },
      Some("""WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 250),
              f AS (SELECT doc_id, i.i AS i,
                      (doc_id*13 + i.i*37) % 240 + 8 AS g
                    FROM d, generate_series(0,64) i(i))
              SELECT a.doc_id, CAST(a.i AS BIGINT) AS idx,
                CAST(CASE WHEN a.g < b.g THEN 1 ELSE 0 END AS BIGINT) AS bit
              FROM f a JOIN f b ON b.doc_id = a.doc_id AND b.i = a.i + 1
              WHERE a.i < 64
              ORDER BY a.doc_id, idx""")
    )
  )
}
