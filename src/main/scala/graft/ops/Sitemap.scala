package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}

/** Sitemap ingestion (r15) — the OTHER half of the crawl-frontier protocol
  * next to [[Robots]]: sites publish sitemaps.org XML listing their URLs
  * (plus freshness hints), and a crawler seeds/refreshes its frontier from
  * them. This parses the protocol's two document kinds in one forward
  * scan, the [[Warc]] honest-grammar discipline:
  *
  *   - `<urlset>` leaves: one entry per `<url>` block — `<loc>` (required;
  *     XML entities decoded), optional `<lastmod>` (kept verbatim — W3C
  *     datetime) and `<priority>` (parsed to an exact x10 integer, the
  *     engine-neutral form of the spec's 0.0–1.0 decimal);
  *   - `<sitemapindex>` internal nodes: one entry per `<sitemap>` block —
  *     the `<loc>` of a child sitemap to fetch (kind = "sitemap", how the
  *     frontier loop recurses).
  *
  * Malformed documents (unclosed loc, url block without loc, priority out
  * of form) fail LOUDLY naming the doc. Per-partition flatMap, iterator
  * fan-out, zero shuffles; [[Multimodal.fanned]]'s `fanOut` lever applies.
  * Out of honest scope: gzip sitemaps arrive via [[Warc]]'s gz plumbing or
  * storage-layer decompression; text/plain url-list sitemaps are `split`
  * by lines upstream.
  */
object Sitemap {

  /** `kind` = "url" (a frontier candidate) | "sitemap" (a child sitemap to
    * fetch). `priority_x10` = the spec's 0.0–1.0 priority as an exact
    * integer in [0, 10]; −1 = absent (the spec's default is 0.5 but a
    * pipeline should see "absent" distinctly). `lastmod` = verbatim W3C
    * datetime, empty if absent. */
  final case class SitemapEntry(doc_id: Long, kind: String, url: String,
      lastmod: String, priority_x10: Long)

  private def decodeEntities(s: String, docId: Long): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        require(semi > i,
          s"doc $docId: unterminated XML entity at offset $i")
        val name = s.substring(i + 1, semi)
        sb.append(name match {
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case n if n.startsWith("#") =>
            // numeric character reference — through Character.toChars, so
            // supplementary-plane code points become their surrogate PAIR
            // (Int.toChar would silently truncate to 16 bits), and an
            // out-of-range/garbage reference fails naming the doc
            val cp =
              try {
                if (n.length > 2 && (n.charAt(1) == 'x' || n.charAt(1) == 'X'))
                  Integer.parseInt(n.substring(2), 16)
                else Integer.parseInt(n.substring(1))
              } catch {
                case e: NumberFormatException =>
                  throw new IllegalArgumentException(
                    s"doc $docId: malformed numeric character reference &$n;", e)
              }
            require(Character.isValidCodePoint(cp),
              s"doc $docId: numeric character reference &$n; is not a " +
                "valid code point")
            new String(Character.toChars(cp))
          case other => throw new IllegalArgumentException(
            s"doc $docId: unknown XML entity &$other;")
        })
        i = semi + 1
      }
    }
    sb.toString
  }

  private def isXmlWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  /** Index of the next `<tag` open whose name ends at a PROPER boundary
    * ('>', '/', or XML whitespace — `<loc>` must not match `<location>`),
    * or -1. */
  private def findOpen(s: String, tag: String, from: Int): Int = {
    var i = from
    val probe = s"<$tag"
    while (true) {
      val o = s.indexOf(probe, i)
      if (o < 0) return -1
      val after = o + probe.length
      if (after >= s.length) return -1
      val c = s.charAt(after)
      if (c == '>' || c == '/' || isXmlWs(c)) return o
      i = o + 1
    }
    -1
  }

  /** One forward scan over the XML text. Tolerates arbitrary attributes
    * and XML whitespace inside open tags, CDATA-wrapped field text, and
    * both kinds in either order (a conforming file has one root kind; the
    * parser keys on the block tags so a concatenated fixture also
    * parses). */
  private[ops] def parse(docId: Long, xml: String): Iterator[SitemapEntry] = {
    // block = <url>...</url> or <sitemap>...</sitemap>
    def tagText(block: String, tag: String): Option[String] = {
      val open = findOpen(block, tag, 0)
      if (open < 0) return None
      val gt = block.indexOf('>', open)
      require(gt > 0, s"doc $docId: unclosed <$tag> tag")
      val close = block.indexOf(s"</$tag>", gt)
      require(close >= 0, s"doc $docId: <$tag> without </$tag>")
      val raw = block.substring(gt + 1, close).trim
      // CDATA section (real-world sitemap generators emit it around loc):
      // verbatim content, never entity-decoded - that is CDATA's point
      if (raw.startsWith("<![CDATA[") && raw.endsWith("]]>")) {
        val inner = raw.substring(9, raw.length - 3)
        // the wrapper must be ONE section: interior ]]> / <![CDATA[ means a
        // multi-CDATA shape whose markers would leak into the URL verbatim
        // (XML itself forbids ]]> inside CDATA content)
        require(!inner.contains("]]>") && !inner.contains("<![CDATA["),
          s"doc $docId: malformed CDATA section inside <$tag>")
        Some(inner.trim)
      } else {
        // a CDATA marker that is NOT the sole well-formed wrapper (e.g.
        // `<![CDATA[u]]>tail`) must fail loudly like every other malformed
        // shape — falling through to entity decoding would pass the literal
        // wrapper text through as the URL
        require(!raw.contains("<![CDATA["),
          s"doc $docId: malformed CDATA section inside <$tag>")
        Some(decodeEntities(raw, docId))
      }
    }
    def blocks(tag: String): Iterator[String] = new Iterator[String] {
      private var from = 0
      private var nextB: String = advance()
      private def advance(): String = {
        val o = findOpen(xml, tag, from)
        if (o < 0) return null
        val close = xml.indexOf(s"</$tag>", o)
        require(close >= 0, s"doc $docId: <$tag> block without </$tag>")
        from = close + tag.length + 3
        xml.substring(o, close)
      }
      override def hasNext: Boolean = nextB != null
      override def next(): String = { val b = nextB; nextB = advance(); b }
    }
    def entryOf(kind: String)(block: String): SitemapEntry = {
      val loc = tagText(block, "loc").getOrElse(throw
        new IllegalArgumentException(
          s"doc $docId: <$kind> block without a <loc>"))
      require(loc.nonEmpty, s"doc $docId: empty <loc> in a <$kind> block")
      val lastmod = tagText(block, "lastmod").getOrElse("")
      val prio = tagText(block, "priority") match {
        case None => -1L
        case Some(p) =>
          // EXACT decimal arithmetic (the x10 contract): BigDecimal
          // half-up at one decimal — FP would round 0.15 down and 0.35
          // up through representation error; the spec allows any
          // precision in [0.0, 1.0]
          val v =
            try new java.math.BigDecimal(p)
            catch {
              case e: NumberFormatException =>
                throw new IllegalArgumentException(
                  s"doc $docId: malformed <priority> '$p'", e)
            }
          require(v.signum >= 0 && v.compareTo(java.math.BigDecimal.ONE) <= 0,
            s"doc $docId: <priority> $p outside [0, 1]")
          v.setScale(1, java.math.RoundingMode.HALF_UP)
            .unscaledValue.longValueExact
      }
      SitemapEntry(docId, kind, loc, lastmod, prio)
    }
    blocks("url").map(entryOf("url")) ++
      blocks("sitemap").map(entryOf("sitemap"))
  }

  /** Fan sitemap documents out to their entries: (doc_id, xml) rows in,
    * one row per url/child-sitemap out — per-partition, shuffle-free. */
  def split(spark: SparkSession, rows: Dataset[(Long, String)],
      fanOut: Int = 0): Dataset[SitemapEntry] = {
    import spark.implicits._
    Multimodal.fanned(rows, fanOut).mapPartitions { it =>
      it.flatMap { case (id, xml) => parse(id, xml) }
    }
  }
}
