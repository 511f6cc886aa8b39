package graft.queries

import graft.functions.{NfcNormalize, UrlCanonical}
import graft.ops.Robots
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Crawl-side gating + text-normalization queries (r14): the stages a
  * pretraining corpus passes BEFORE content ever reaches the cleaning
  * pipeline \u2014 URL canonicalization and dedup (the frontier's key),
  * robots.txt politeness gating, Unicode NFC normalization (equality's
  * prerequisite), sentence segmentation, and code-vs-prose detection.
  * All planted-twin oracled: inputs are built deterministically from
  * `documents`, so DuckDB constructs the EXPECTED output from the same
  * pieces and any parse/normalize/gate defect breaks the hash. */
object CrawlOps {
  import Tables.t

  private def k: Column = (col("doc_id") % 7).cast("string")
  private def id: Column = col("doc_id").cast("string")

  /** Four planted URL spellings cycling on doc_id % 4 \u2014 each exercises a
    * distinct canonicalization clause (case+default port+tracking+fragment;
    * empty path; non-default port + all-tracking query; param sort). */
  private def plantedUrl: Column = {
    val m = col("doc_id") % 4
    when(m === 0, concat(lit("HTTP://U@WWW.h"), k, lit(".Example.COM:80/Doc/"),
        id, lit("?utm_source=feed&z=1&a=2#top")))
      .when(m === 1, concat(lit("https://h"), k, lit(".Example.ORG")))
      .when(m === 2, concat(lit("https://h"), k, lit(".example.org:8080/x/"),
        id, lit("?gclid=abc&utm_campaign=c")))
      .otherwise(concat(lit("HtTpS://h"), k, lit(".EXAMPLE.org:443/doc/"),
        id, lit("?b=2&a=1&fbclid=zz")))
  }

  /** Planted page for the outlink oracles: three REAL anchors per doc
    * (root-relative next-doc link, absolute cross-host link in uppercase
    * markup, unquoted-attribute link) among distractors the extractor
    * must ignore (scripted anchor, hrefless anchor, link/area tags). */
  private def plantedLinkHtml: Column = {
    val k1 = ((col("doc_id") + 1) % 7).cast("string")
    concat(
      lit("<html><head><title>t</title><link href=\"/css\"></head><body>" +
        "<script>var a='<a href=\"/fake\">';</script><a href=\"/doc/"),
      (col("doc_id") + 1).cast("string"),
      lit("\">next</a> <A HREF='https://h"), k1, lit(".example.org/doc/"),
      (col("doc_id") * 2).cast("string"),
      lit("'>abs</A><a name=\"x\">no link</a><p>body</p><a href=/rel/"),
      id, lit(" class=c>unquoted</a></body></html>"))
  }

  val defs: Map[String, QueryDef] = Map(

    // outlink extraction \u2014 the fetched page's <a href> values in document
    // order (the link graph's raw edges). The planted page mixes quoting
    // styles and distractor tags; posexplode pins ORDER as well as set.
    "t_outlinks" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(graft.functions.HtmlLinks(plantedLinkHtml))
            .as(Seq("ord", "href")))
        .select(col("doc_id"), col("ord").cast("long").as("ord"), col("href"))
        .orderBy("doc_id", "ord"),
      Some("""SELECT doc_id, ord, href FROM (
                SELECT doc_id, CAST(0 AS BIGINT) AS ord,
                  '/doc/' || (doc_id + 1) AS href FROM documents
                UNION ALL SELECT doc_id, 1,
                  'https://h' || ((doc_id + 1) % 7) || '.example.org/doc/'
                  || (doc_id * 2) FROM documents
                UNION ALL SELECT doc_id, 2, '/rel/' || doc_id FROM documents)
              ORDER BY doc_id, ord""")
    ),

    // host-level link graph \u2014 outlinks RESOLVED against their page's own
    // host (root-relative -> same host; absolute -> demuxed target host)
    // and aggregated into weighted edges: one groupBy keyed (src, dst),
    // exactly the shuffle a 100 TB web graph builds. Self-edges weight 2
    // (two relative links per page), cross-host edges weight 1.
    "g_linkgraph" -> QueryDef(
      (s, dir) => {
        val src = concat(lit("h"), k, lit(".example.org"))
        t(s, dir, "documents")
          .select(col("doc_id"), src.as("src_host"),
            explode(graft.functions.HtmlLinks(plantedLinkHtml)).as("href"))
          .withColumn("dst_host",
            when(col("href").startsWith("https://") ||
                 col("href").startsWith("http://"),
              regexp_extract(col("href"), "^https?://([^/]+)", 1))
              .otherwise(col("src_host")))
          .groupBy("src_host", "dst_host")
          .agg(count(lit(1)).as("n_links"))
          .orderBy("src_host", "dst_host")
      },
      Some("""SELECT src_host, dst_host, COUNT(*) AS n_links FROM (
                SELECT 'h' || (doc_id % 7) || '.example.org' AS src_host,
                       'h' || (doc_id % 7) || '.example.org' AS dst_host
                FROM documents
                UNION ALL
                SELECT 'h' || (doc_id % 7) || '.example.org',
                       'h' || (doc_id % 7) || '.example.org' FROM documents
                UNION ALL
                SELECT 'h' || (doc_id % 7) || '.example.org',
                       'h' || ((doc_id + 1) % 7) || '.example.org'
                FROM documents)
              GROUP BY src_host, dst_host
              ORDER BY src_host, dst_host""")
    ),

    // URL canonicalization \u2014 the crawl frontier's dedup key, pinned
    // clause-by-clause: scheme/host case folding, userinfo preserved
    // verbatim, default-port strip (:80/http, :443/https) with a
    // non-default port KEPT, path case preserved, empty path -> '/',
    // tracking params dropped (utm_*, gclid, fbclid), survivors sorted,
    // all-dropped query loses its '?', fragment dropped. Per-row native
    // kernel, shuffle-free.
    "t_url_canonical" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), UrlCanonical(plantedUrl).as("url_canon"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
                CASE doc_id % 4
                  WHEN 0 THEN 'http://U@www.h' || (doc_id % 7)
                              || '.example.com/Doc/' || doc_id || '?a=2&z=1'
                  WHEN 1 THEN 'https://h' || (doc_id % 7) || '.example.org/'
                  WHEN 2 THEN 'https://h' || (doc_id % 7)
                              || '.example.org:8080/x/' || doc_id
                  ELSE 'https://h' || (doc_id % 7) || '.example.org/doc/'
                       || doc_id || '?a=1&b=2'
                END AS url_canon
              FROM documents ORDER BY doc_id""")
    ),

    // URL dedup \u2014 two raw spellings per document (www-case + tracking +
    // fragment vs :443 + clean query) that MUST unify under the canonical
    // key; the group count pins the unification, the min-variant pick is
    // the frontier's keep-one rule. groupBy on the canonical = one hash
    // shuffle keyed exactly like a 100 TB frontier would be.
    "d_url_dedup" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          explode(array(
            concat(lit("https://WWW.example.org/p/"), id,
              lit("?utm_source=x&a=1#f")),
            concat(lit("https://www.example.org:443/p/"), id, lit("?a=1"))))
            .as("raw"))
        .groupBy(UrlCanonical(col("raw")).as("url_canon"))
        .agg(count(lit(1)).as("dup_cnt"))
        .orderBy("url_canon"),
      Some("""SELECT 'https://www.example.org/p/' || doc_id || '?a=1' AS url_canon,
                CAST(2 AS BIGINT) AS dup_cnt
              FROM documents ORDER BY url_canon""")
    ),

    // robots.txt politeness gate \u2014 per-host planted policies (even hosts:
    // path-scoped disallow with a longer allow carve-out; odd hosts:
    // disallow-all with an allow carve-out), URLs cycling over four paths.
    // Pins the whole REP chain: comment strip, CRLF bodies, case-folded
    // keys, multi-agent group headers, non-star groups IGNORED (evilbot
    // disallows / everywhere \u2014 obeying it would zero the corpus), unknown
    // keys skipped, longest-prefix winner, allow-beats-disallow at ties,
    // no-match -> allowed. Scale shape: rules \u22c8 urls hash join on host +
    // one bounded groupBy \u2014 the fetch-frontier plan.
    "p_robots_gate" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val bodies = s.range(0, 7).map { hk =>
          val body =
            if (hk % 2 == 0)
              "# crawler policy\r\nUser-agent: evilbot\r\nDisallow: /\r\n\r\n" +
                "User-Agent: googlebot\r\nUser-agent: *\r\nDisallow: /private\r\n" +
                "Allow: /private/ok\r\ndisallow: /tmp\r\nCrawl-delay: 10\r\n"
            else
              "User-agent: *\nDisallow: /\nAllow: /public\n" +
                "Sitemap: https://example.org/map.xml\n\n" +
                "User-agent: otherbot\nDisallow:\n"
          Robots.RobotsTxt(s"h$hk.example.org", body)
        }
        val rules = Robots.parse(s, bodies).toDF()
        val m = col("doc_id") % 4
        val urls = t(s, dir, "documents").select(
          col("doc_id"),
          concat(lit("h"), k, lit(".example.org")).as("host"),
          concat(
            when(m === 0, "/private/x").when(m === 1, "/private/ok/x")
              .when(m === 2, "/public/x").otherwise("/tmp/x"),
            id).as("path"))
        Robots.gate(urls, rules)
          .select(col("doc_id"), col("host"), col("path"),
            col("allowed").cast("int").as("allowed"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                'h' || (doc_id % 7) || '.example.org' AS host,
                CASE doc_id % 4 WHEN 0 THEN '/private/x' WHEN 1 THEN '/private/ok/x'
                  WHEN 2 THEN '/public/x' ELSE '/tmp/x' END || doc_id AS path,
                CAST(CASE WHEN (doc_id % 7) % 2 = 0
                     THEN (doc_id % 4) IN (1, 2)
                     ELSE doc_id % 4 = 2 END AS INTEGER) AS allowed
              FROM documents ORDER BY doc_id""")
    ),

    // the crawl frontier END-TO-END: two raw spellings per page ->
    // canonical unification (groupBy, keeps one) -> host/path demux from
    // the canonical -> robots gate -> blocklist anti-join -> fetchable
    // frontier. One plan, each stage the operator the standalone queries
    // pin; the row set is the intersection of all three gates.
    "p_crawl_frontier" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val bodies = s.range(0, 7).map { hk =>
          val body =
            if (hk % 2 == 0)
              "User-agent: *\nDisallow: /private\nAllow: /private/ok\nDisallow: /tmp\n"
            else "User-agent: *\nDisallow: /\nAllow: /public\n"
          Robots.RobotsTxt(s"h$hk.example.org", body)
        }
        val rules = Robots.parse(s, bodies).toDF()
        val m = col("doc_id") % 4
        val pathC = concat(
          when(m === 0, "/private/x").when(m === 1, "/private/ok/x")
            .when(m === 2, "/public/x").otherwise("/tmp/x"),
          id)
        val raws = t(s, dir, "documents").select(col("doc_id"),
          explode(array(
            concat(lit("HTTPS://h"), k, lit(".EXAMPLE.ORG:443"), pathC,
              lit("?utm_source=x#frag")),
            concat(lit("https://h"), k, lit(".example.org"), pathC))).as("raw"))
        val frontier = raws
          .groupBy(UrlCanonical(col("raw")).as("url_canon"))
          .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_cnt"))
          .withColumn("host",
            regexp_extract(col("url_canon"), "^https?://([^/]+)/", 1))
          .withColumn("path",
            regexp_extract(col("url_canon"), "^https?://[^/]+([^?#]*)", 1))
        val blocklist = Seq("h0.example.org", "h3.example.org").toDF("bhost")
        Robots.gate(frontier, rules)
          .where(col("allowed"))
          .join(broadcast(blocklist), col("host") === col("bhost"), "left_anti")
          .select(col("doc_id"), col("url_canon"), col("dup_cnt"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                'https://h' || (doc_id % 7) || '.example.org'
                  || (CASE doc_id % 4 WHEN 0 THEN '/private/x'
                      WHEN 1 THEN '/private/ok/x'
                      WHEN 2 THEN '/public/x' ELSE '/tmp/x' END)
                  || doc_id AS url_canon,
                CAST(2 AS BIGINT) AS dup_cnt
              FROM documents
              WHERE (CASE WHEN (doc_id % 7) % 2 = 0
                     THEN (doc_id % 4) IN (1, 2)
                     ELSE doc_id % 4 = 2 END)
                AND doc_id % 7 NOT IN (0, 3)
              ORDER BY doc_id""")
    ),

    // sitemap ingestion (r15) \u2014 the frontier-SEEDING half of the crawl
    // protocol next to robots.txt gating: each doc < 200 plants a
    // sitemaps.org urlset (two <url> blocks: one fully-annotated with an
    // XML-entity query string, lastmod, and a single-decimal priority;
    // one bare loc), parsed by the one-pass grammar walk in ops.Sitemap.
    // The oracle reconstructs every field from doc_id arithmetic \u2014 a
    // wrong block scan, entity decode, priority integerization, or
    // absent-field default breaks the hash. (The <sitemapindex> recursion
    // edge and loud malformed failures are SitemapSpec's.)
    "t_sitemap" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val host = concat(lit("https://h"), (col("doc_id") % 7).cast("string"),
          lit(".example.org/doc/"), col("doc_id").cast("string"))
        val xml = t(s, dir, "documents").where(col("doc_id") < 200)
          .select(col("doc_id"), concat(
            lit("<?xml version=\"1.0\"?><urlset>"),
            lit("<url><loc>"), host, lit("?a=1&amp;b=2</loc><lastmod>2024-01-"),
            lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"),
            lit("</lastmod><priority>0."), (col("doc_id") % 10).cast("string"),
            lit("</priority></url>"),
            lit("<url><loc>"), host, lit("/about</loc></url></urlset>"))
            .as("xml"))
          .as[(Long, String)]
        graft.ops.Sitemap.split(s, xml).toDF()
          .select("doc_id", "kind", "url", "lastmod", "priority_x10")
          .orderBy("doc_id", "url")
      },
      Some("""WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
              u AS (
                SELECT doc_id, 'url' AS kind,
                  'https://h' || CAST(doc_id % 7 AS VARCHAR) ||
                    '.example.org/doc/' || CAST(doc_id AS VARCHAR) ||
                    '?a=1&b=2' AS url,
                  '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                    AS lastmod,
                  doc_id % 10 AS priority_x10
                FROM d
                UNION ALL
                SELECT doc_id, 'url' AS kind,
                  'https://h' || CAST(doc_id % 7 AS VARCHAR) ||
                    '.example.org/doc/' || CAST(doc_id AS VARCHAR) ||
                    '/about' AS url,
                  '' AS lastmod, CAST(-1 AS BIGINT) AS priority_x10
                FROM d)
              SELECT doc_id, kind, url, lastmod, priority_x10 FROM u
              ORDER BY doc_id, url""")
    ),

    // Unicode NFC normalization \u2014 three planted spellings cycling on
    // doc_id % 3: decomposed combining marks (e+0301, i+0308 -> composed),
    // already-precomposed (the isNormalized no-op path), and pure ASCII
    // (the zero-copy byte-scan fast path). The oracle CONSTRUCTS the
    // composed form (chr(233)/chr(239)), so a wrong composition, a missed
    // fast-path, or a mangled re-encode all break the hash.
    "t_nfc_normalize" -> QueryDef(
      (s, dir) => {
        val first4 = concat_ws(" ", slice(split(trim(col("text")), "\\s+"), 1, 4))
        val m = col("doc_id") % 3
        val planted =
          when(m === 0, concat(lit("Cafe\u0301 nai\u0308ve "), first4))
            .when(m === 1, concat(lit("Caf\u00e9 na\u00efve "), first4))
            .otherwise(concat(lit("Cafe naive "), first4))
        t(s, dir, "documents")
          .select(col("doc_id"), NfcNormalize(planted).as("norm"))
          .withColumn("n_chars", length(col("norm")).cast("long"))
          .orderBy("doc_id")
      },
      Some("""WITH p AS (
                SELECT doc_id,
                  CASE doc_id % 3
                    WHEN 2 THEN 'Cafe naive '
                    ELSE 'Caf' || chr(233) || ' na' || chr(239) || 've '
                  END || array_to_string(
                    (string_split_regex(trim(text), '\s+'))[1:4], ' ') AS norm
                FROM documents)
              SELECT doc_id, norm, CAST(len(norm) AS BIGINT) AS n_chars
              FROM p ORDER BY doc_id""")
    ),

    // sentence segmentation \u2014 planted three-sentence prose from the
    // document's own word slices (the third sentence exists only for
    // docs long enough, so the count VARIES); the Spark side runs the
    // real splitter over the assembled text (strip trailing terminators,
    // split on [.!?]+\s+, drop empty segments, count words per segment)
    // while the oracle derives the expected stats from the slice
    // arithmetic alone: >10 words \u2192 3 sentences, 5..10 \u2192 2, and \u22644 \u2192 1
    // (both planted continuation sentences empty, so the trailing-
    // terminator strip leaves a single segment \u2014 the oracle must cover
    // that band even though the current fixture has no <5-word docs).
    // Per-row, shuffle-free.
    "t_sentences" -> QueryDef(
      (s, dir) => {
        val w = split(trim(col("text")), "\\s+")
        val sent = concat(
          concat_ws(" ", slice(w, 1, 4)), lit(". "),
          concat_ws(" ", slice(w, 5, 6)), lit("! "),
          concat_ws(" ", slice(w, 11, 1 << 20)), lit("?"))
        val segs = filter(
          split(regexp_replace(sent, "[\\s.!?]+$", ""), "[.!?]+\\s+"),
          x => length(trim(x)) > 0)
        t(s, dir, "documents")
          .select(col("doc_id"), segs.as("segs"))
          .select(col("doc_id"),
            size(col("segs")).cast("long").as("n_sentences"),
            aggregate(col("segs"), lit(0L),
              (acc, x) => acc + size(split(trim(x), "\\s+"))).as("n_words"))
          .withColumn("mean_words_x100",
            expr("n_words * 100 DIV n_sentences"))
          .orderBy("doc_id")
      },
      Some("""WITH p AS (
                SELECT doc_id,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nw
                FROM documents)
              SELECT doc_id,
                CAST(CASE WHEN nw > 10 THEN 3 WHEN nw > 4 THEN 2 ELSE 1 END
                  AS BIGINT) AS n_sentences,
                nw AS n_words,
                CAST(nw * 100 //
                  (CASE WHEN nw > 10 THEN 3 WHEN nw > 4 THEN 2 ELSE 1 END)
                  AS BIGINT) AS mean_words_x100
              FROM p ORDER BY doc_id""")
    ),

    // Unicode script mix \u2014 the corpus-routing signal before any
    // per-language model: codepoints counted by writing system (Latin /
    // Cyrillic / CJK / other) in one native pass. Planted suffixes cycle
    // known Cyrillic and CJK strings (incl. the space bookkeeping), so
    // the oracle derives every count from pure arithmetic over the ASCII
    // base text: a misclassified script, a double-counted surrogate, or
    // a missed space all break the hash.
    "t_script_mix" -> QueryDef(
      (s, dir) => {
        val m = col("doc_id") % 4
        val planted = concat(col("text"),
          when(m === 1, " \u043f\u0440\u0438\u0432\u0435\u0442")
            .when(m === 2, " \u4f60\u597d\u4e16\u754c")
            .when(m === 3,
              " \u043f\u0440\u0438\u0432\u0435\u0442 \u4f60\u597d")
            .otherwise(""))
        t(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.ScriptCounts(planted).as("sc"))
          .select(col("doc_id"), col("sc.latin").as("latin"),
            col("sc.cyrillic").as("cyrillic"), col("sc.cjk").as("cjk"),
            col("sc.other").as("other"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
                SELECT doc_id,
                  CAST(len(text) AS BIGINT) AS l,
                  CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS nw
                FROM documents)
              SELECT doc_id,
                l - (nw - 1) AS latin,
                CAST(CASE WHEN doc_id % 4 IN (1, 3) THEN 6 ELSE 0 END
                  AS BIGINT) AS cyrillic,
                CAST(CASE doc_id % 4 WHEN 2 THEN 4 WHEN 3 THEN 2 ELSE 0 END
                  AS BIGINT) AS cjk,
                (nw - 1) + CAST(CASE doc_id % 4 WHEN 0 THEN 0 WHEN 3 THEN 2
                  ELSE 1 END AS BIGINT) AS other
              FROM d ORDER BY doc_id""")
    ),

    // code-vs-prose detection \u2014 the symbol-density gate a pretraining mix
    // uses to route code out of the prose corpus. A third of the docs get
    // a planted code tail; the score is integer symbol-per-mille
    // (translate-and-diff, exact on both engines), the gate a fixed
    // threshold. Per-row arithmetic, shuffle-free.
    "t_code_detect" -> QueryDef(
      (s, dir) => {
        val snippet = " if (x > 0) { y[i] = f(a, b); } else { z[j] = g(c); }"
        val text2 = when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(snippet))).otherwise(col("text"))
        t(s, dir, "documents")
          .select(col("doc_id"), text2.as("t2"))
          .select(col("doc_id"),
            ((length(col("t2")) - length(translate(col("t2"), "{}()[];=<>", "")))
              * 1000L / length(col("t2"))).cast("long").as("sym_x1000"))
          .withColumn("is_code", (col("sym_x1000") >= 20L).cast("int"))
          .orderBy("doc_id")
      },
      Some("""WITH p AS (
                SELECT doc_id,
                  CASE WHEN doc_id % 3 = 0 THEN text ||
                    ' if (x > 0) { y[i] = f(a, b); } else { z[j] = g(c); }'
                  ELSE text END AS t2
                FROM documents),
              sc AS (
                SELECT doc_id,
                  CAST((len(t2) - len(translate(t2, '{}()[];=<>', ''))) * 1000
                    // len(t2) AS BIGINT) AS sym_x1000
                FROM p)
              SELECT doc_id, sym_x1000,
                CAST(sym_x1000 >= 20 AS INTEGER) AS is_code
              FROM sc ORDER BY doc_id""")
    ),

    // per-host politeness scheduling (r17): Crawl-delay parsing + fetch
    // shaping — the step between the gated frontier and the fetcher
    // fleet. Seven planted robots bodies exercise every parser clause
    // (integer and decimal delays, max across applicable groups,
    // agent-specific group ignored, unparsable value ignored, truncation
    // past ms precision, comments); the oracle restates the expected
    // per-host delay arithmetically and recomputes rank/wave/schedule in
    // plain SQL — a parse defect, wrong group boundary, or off-by-one in
    // the wave arithmetic shifts rows and breaks the hash.
    "p_politeness" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val bodies = s.range(0, 7).map { hk =>
          val body = hk.toInt match {
            case 0 => "User-agent: *\r\nCrawl-delay: 2 # seconds\r\nDisallow: /private\r\n"
            case 1 => "User-agent: *\nCrawl-delay: 0.5\n"
            case 2 => "User-agent: *\nDisallow: /tmp\n" // no directive -> default
            case 3 => "User-agent: *\nCrawl-delay: 1\n\n" +
              "User-agent: otherbot\nUser-agent: *\nCrawl-delay: 3.25\n" // max wins
            case 4 => "User-agent: specialbot\nCrawl-delay: 9\n" // not applicable
            case 5 => "User-agent: *\nCrawl-delay: soon\n" // unparsable -> ignored
            case _ => "User-agent: *\nCRAWL-DELAY: 1.2345\n" // truncates to ms
          }
          Robots.RobotsTxt(s"h$hk.example.org", body)
        }
        val delays = Robots.parseDelays(s, bodies).toDF()
        val urls = t(s, dir, "documents").select(
          col("doc_id"),
          concat(lit("h"), k, lit(".example.org")).as("host"))
        Robots.schedule(urls, delays, orderCol = "doc_id", burst = 4)
          .select(col("doc_id"), col("host"), col("wave"),
            col("scheduled_ms"))
          .orderBy("doc_id")
      },
      Some("""WITH u AS (
                SELECT doc_id, 'h' || (doc_id % 7) || '.example.org' AS host,
                  CASE doc_id % 7 WHEN 0 THEN 2000 WHEN 1 THEN 500
                    WHEN 3 THEN 3250 WHEN 6 THEN 1234 ELSE 1000 END AS delay_ms,
                  ROW_NUMBER() OVER (PARTITION BY doc_id % 7
                    ORDER BY doc_id) AS rn
                FROM documents)
              SELECT doc_id, host,
                CAST((rn - 1) // 4 AS BIGINT) AS wave,
                CAST(((rn - 1) // 4) * delay_ms AS BIGINT) AS scheduled_ms
              FROM u ORDER BY doc_id""")
    )
  )
}
