package graft.plans

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The library's `SparkSessionExtensions` entry point — idiomatic packaging
  * for a Spark-native engine: users opt in with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `withExtensions(new GraftExtensions)`) and get
  *
  *   - the [[DimBucketPruning]] optimizer rule (raw dim-range predicates on
  *     registered worlds prune chunk directories without the Select DSL);
  *   - the native expressions as SQL functions, so pure-SQL users can write
  *     `SELECT simhash64(split(lower(text), '\\s+'))`, `word_shingles(text, 3)`,
  *     `cosine_sim(a, b)`, `jaccard_pct(a, b)`, `minhash_signature(sh, 64)`,
  *     `minhash_band_keys(sh, 64, 8)` — the same codegen'd kernels the
  *     DataFrame operators use.
  *
  * (Worlds constructed programmatically also self-install the rule via
  * `spark.experimental`, so the extension is additive, not required.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "misc_funcs", "", "", "internal")

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => DimBucketPruning())
    // global rank-family / running-aggregate windows auto-route onto the
    // ScalableWindowExec physical operator (the discipline
    // RegistryScaleSpec enforces statically for the library's own queries,
    // applied to ad-hoc user SQL)
    ext.injectOptimizerRule(_ => GlobalWindowRewrite())
    ext.injectPlannerStrategy(_ => ScalableWindowStrategy)

    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit simhash"),
      (args: Seq[Expression]) => SimHash64(args.head)))

    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n) - distinct word n-grams"),
      (args: Seq[Expression]) =>
        WordShingles(args.head, intLit(args(1), "shingle width"))))

    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of float/double arrays"),
      (args: Seq[Expression]) => CosineSim(args.head, args(1))))

    ext.injectFunction((FunctionIdentifier("jaccard_pct"),
      info("jaccard_pct", "jaccard_pct(a, b) - exact Jaccard integer percent of string arrays"),
      (args: Seq[Expression]) => JaccardPct(args.head, args(1))))

    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(sh, numHashes) - minhash signature"),
      (args: Seq[Expression]) =>
        MinHashSignature(args.head, intLit(args(1), "numHashes"))))

    ext.injectFunction((FunctionIdentifier("minhash_band_keys"),
      info("minhash_band_keys", "minhash_band_keys(sh, numHashes, bands) - LSH band keys"),
      (args: Seq[Expression]) => MinHashBandKeys(args.head,
        intLit(args(1), "numHashes"), intLit(args(2), "bands"))))

    ext.injectFunction((FunctionIdentifier("word_chunks"),
      info("word_chunks", "word_chunks(text, window, stride) - overlapping token-window chunks"),
      (args: Seq[Expression]) => WordChunks(args.head,
        intLit(args(1), "window"), intLit(args(2), "stride"))))

    ext.injectFunction((FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints",
        "winnow_fingerprints(text, k, w) - MOSS winnowing: distinct sorted window-min k-gram hashes"),
      (args: Seq[Expression]) => graft.functions.WinnowFingerprints(args.head,
        intLit(args(1), "k"), intLit(args(2), "w"))))

    ext.injectFunction((FunctionIdentifier("token_chunks"),
      info("token_chunks",
        "token_chunks(text, window, stride) - CJK-aware overlapping token-window chunks"),
      (args: Seq[Expression]) => graft.functions.TokenChunks(args.head,
        intLit(args(1), "window"), intLit(args(2), "stride"))))

    ext.injectFunction((FunctionIdentifier("token_count"),
      info("token_count",
        "token_count(text) - CJK-aware token count (whitespace words + one token per CJK codepoint)"),
      (args: Seq[Expression]) => graft.functions.TokenCount(args.head)))

    ext.injectFunction((FunctionIdentifier("word_ngrams"),
      info("word_ngrams", "word_ngrams(text, n) - word n-grams with duplicates"),
      (args: Seq[Expression]) => WordNgrams(args.head, intLit(args(1), "n"))))

    ext.injectFunction((FunctionIdentifier("repetition_stats"),
      info("repetition_stats",
        "repetition_stats(text) - struct(n_grams, max_rep, top_gram, n_dup) bigram repetition signals"),
      (args: Seq[Expression]) => RepetitionStats(args.head)))

    ext.injectFunction((FunctionIdentifier("cms_estimate"),
      info("cms_estimate",
        "cms_estimate(sketch, key) - frequency estimate of bigint key from a count_min_sketch binary"),
      (args: Seq[Expression]) => CmsEstimate(args(0), args(1))))

    // the r14 crawl/text kernels as SQL faces — ad-hoc `spark.sql` users
    // get the same codegen'd one-pass scans the DataFrame API composes
    ext.injectFunction((FunctionIdentifier("url_canonical"),
      info("url_canonical",
        "url_canonical(url) - crawl-frontier canonical form (case/port/tracking/fragment rules)"),
      (args: Seq[Expression]) => graft.functions.UrlCanonical(args.head)))

    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "nfc_normalize(text) - Unicode NFC with an ASCII zero-copy fast path"),
      (args: Seq[Expression]) => graft.functions.NfcNormalize(args.head)))

    ext.injectFunction((FunctionIdentifier("html_extract"),
      info("html_extract",
        "html_extract(html) - visible text, block-segmented, link-density boilerplate gated"),
      (args: Seq[Expression]) => graft.functions.HtmlExtract(args.head)))

    ext.injectFunction((FunctionIdentifier("html_links"),
      info("html_links",
        "html_links(html) - every <a href> value in document order"),
      (args: Seq[Expression]) => graft.functions.HtmlLinks(args.head)))

    ext.injectFunction((FunctionIdentifier("script_counts"),
      info("script_counts",
        "script_counts(text) - struct(latin, cyrillic, cjk, other) codepoint counts by script"),
      (args: Seq[Expression]) => graft.functions.ScriptCounts(args.head)))

    ext.injectFunction((FunctionIdentifier("hash_embed"),
      info("hash_embed",
        "hash_embed(text, dim) - signed-md5 hashing-trick embedding, micro-unit L2-normalized bigints"),
      (args: Seq[Expression]) => graft.functions.HashEmbed(args.head,
        intLit(args(1), "dim"))))

    ext.injectFunction((FunctionIdentifier("deflate_ratio"),
      info("deflate_ratio",
        "deflate_ratio(text) - DEFLATE per-mille compression ratio (repetition/boilerplate signal)"),
      (args: Seq[Expression]) => graft.functions.DeflateRatio(args.head)))
  }
}
