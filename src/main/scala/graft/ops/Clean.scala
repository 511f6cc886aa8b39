package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Segment-level corpus cleaning (north-star extension): the CCNet-style
  * passes that work BELOW document grain — paragraph-level exact dedup and
  * boilerplate stripping. Document-level dedup misses the dominant
  * contamination mode of web corpora: distinct pages sharing navigation
  * chrome, license footers, and quoted passages. These operators segment
  * each document, make the keep/drop decision per segment across the WHOLE
  * corpus, and reassemble the surviving text in original order.
  *
  * Scale design: a segment row is `(doc_id, seg_idx, seg)` — the only thing
  * that ever shuffles. Paragraph dedup is one shuffle keyed by the segment
  * content digest (first-occurrence decision) plus one by doc_id
  * (reassembly). Boilerplate stripping aggregates segment→distinct-doc
  * counts (partial-agg combines per-partition repeats before the shuffle);
  * the resulting boilerplate set is tiny relative to the corpus by
  * definition — real chrome/footer segments are few and frequent — so AQE
  * broadcasts the anti-join build side. Neither op ever compares documents
  * pairwise or holds more than a partition of segments in memory.
  *
  * The corpus has no newlines, so "paragraph" is a fixed window of
  * `window` whitespace tokens (non-overlapping [[Text.chunk]] with
  * stride == window); with real documents, pass a newline-split exploder
  * instead — every decision below is segmentation-agnostic.
  */
object Clean {

  /** HTML/markup → visible text (r14): tag stripping, script/style/head and
    * comment removal, entity decoding, BLOCK segmentation at block-level
    * tags, and a per-block LINK-DENSITY boilerplate gate (nav/footer chrome
    * is near-pure anchors) — the extraction step that turns a crawled page
    * into the `text` column every operator below consumes. Per-row,
    * shuffle-free, codegen'd ([[graft.functions.HtmlExtract]]); surviving
    * blocks join with `\n`, so the segment-level passes below compose
    * directly on real paragraph boundaries. */
  def extractHtml(html: org.apache.spark.sql.Column, maxLinkPct: Int = 50)
      : org.apache.spark.sql.Column =
    graft.functions.HtmlExtract(html, maxLinkPct)

  /** One row per non-overlapping `window`-token segment, tagged with its
    * position so the survivors can be reassembled in document order. */
  private def segments(df: DataFrame, idCol: String, textCol: String,
      window: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(Text.chunk(col(textCol), window, window))
          .as(Seq("seg_idx", "seg")))
      .withColumn("seg_idx", col("seg_idx").cast("long"))

  /** Reassemble surviving segments: original order via the position tag,
    * never a per-doc sort of anything wider than (idx, seg). */
  private def reassemble(kept: DataFrame): DataFrame =
    kept.groupBy("doc_id")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
            s => s.getField("seg")),
          " ").as("text"),
        count(lit(1)).as("n_kept"))

  /** Paragraph-grain exact dedup: the first occurrence of each distinct
    * segment in (doc_id, seg_idx) order survives, every later repeat is
    * dropped, and documents are rebuilt from their surviving segments.
    * A document whose every segment already appeared elsewhere vanishes —
    * the paragraph-level analog of [[Dedup.exactDedup]]'s loser rows.
    *
    * The first-occurrence decision is a commutative `min(struct(doc_id,
    * seg_idx))` AGGREGATE on the segment's 16-byte md5, not a row_number
    * window: partial aggregation collapses a hot segment's repeats
    * map-side, so a boilerplate segment with 10^8 occurrences shuffles one
    * row per input partition instead of feeding every occurrence through a
    * single reducer's sort — windows have no partial phase, and segment
    * frequency is exactly the distribution where that bites. The
    * winners-to-segments join is keyed by the digest and AQE-splittable.
    */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
      window: Int = 8): DataFrame = {
    val segs = segments(df, idCol, textCol, window)
      .withColumn("__h", md5(col("seg")))
    val winners = segs.groupBy("__h")
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("__w"))
      .select(col("__h"), col("__w.doc_id").as("doc_id"),
        col("__w.seg_idx").as("seg_idx"))
    reassemble(segs.join(winners, Seq("__h", "doc_id", "seg_idx"), "left_semi")
      .drop("__h"))
  }

  /** Boilerplate stripping: a segment that occurs in at least `minDocs`
    * DISTINCT documents is chrome/footer material, and ALL its occurrences
    * are removed (unlike [[paragraphDedup]], which keeps the first). Emits
    * the rebuilt text plus `n_kept`/`n_removed` so a pipeline can gate on
    * how much of a document was boilerplate.
    *
    * `n_removed` comes from a second pass over the raw column computing
    * only `size(chunks)` per row — cheaper than carrying a per-doc total
    * through the segment shuffle (which would cost a window or an extra
    * aggregate on the wide segment rows).
    */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
      window: Int = 8, minDocs: Int = 2): DataFrame = {
    // all segment-keyed shuffles (the count AND the anti-join) run on the
    // 16-byte digest, not the segment text — paragraphDedup's treatment
    val segs = segments(df, idCol, textCol, window)
      .withColumn("__h", md5(col("seg")))
    val boiler = segs.groupBy("__h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") >= minDocs)
      .select("__h")
    val totals = df.select(col(idCol).as("doc_id"),
      size(Text.chunk(col(textCol), window, window)).cast("long").as("n_total"))
    reassemble(segs.join(boiler, Seq("__h"), "left_anti").drop("__h"))
      .join(totals, "doc_id")
      .withColumn("n_removed", col("n_total") - col("n_kept"))
      .drop("n_total")
  }
}
