package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (north-star extension;
  * BASELINE.json). All are pure Catalyst expressions (whole-stage codegen'd,
  * no UDFs) so they stream through a 100 TB scan at full width — each is
  * per-row, shuffle-free, and column-pruned to `text` + the id.
  */
object Text {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+")).cast("long")

  /** BPE-ish subword count: word chunks + digits + punctuation as separate
    * tokens (a regex approximation of byte-pair tokenizers' pre-tokenizer). */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]{1,6}|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Quality-signal columns: length, whitespace, sentence punctuation,
    * uppercase letters, digit count. Ratios are left to the caller (exact
    * integer counts compare engine-neutrally). */
  def qualitySignals(df: DataFrame, text: Column): DataFrame = df
    .withColumn("n_chars_q", length(text).cast("long"))
    .withColumn("n_spaces", (length(text) - length(regexp_replace(text, " ", ""))).cast("long"))
    .withColumn("n_punct", size(regexp_extract_all(text, lit("[.!?]"), lit(0))).cast("long"))
    .withColumn("n_upper", size(regexp_extract_all(text, lit("[A-Z]"), lit(0))).cast("long"))
    .withColumn("n_digit", size(regexp_extract_all(text, lit("[0-9]"), lit(0))).cast("long"))

  /** English stopword hits — the n-gram-heuristic language-ID signal. */
  def stopwordHits(text: Column): Column =
    size(regexp_extract_all(text, lit("\\b(the|and|of|to|a|in|is|it|that|for)\\b"), lit(0))).cast("long")

  /** Heuristic language ID: enough English stopwords -> 'en'. */
  def langId(text: Column, minHits: Int = 3): Column =
    when(stopwordHits(text) >= minHits, lit("en")).otherwise(lit("other"))

  /** Document fingerprint: md5 over whitespace-normalized lowercase text
    * (stable under reflow — the exact-dedup key for near-identical docs).
    * The normalizer is the native [[graft.functions.NormalizeWs]] kernel,
    * byte-identical-pinned to `lower(regexp_replace(text, "\s+", " "))` —
    * the java.util.regex pass was most of t_fingerprint's scan cost. */
  def fingerprint(text: Column): Column =
    md5(graft.functions.NormalizeWs(text))

  /** Overlapping token-window chunks — the sequence-packing prerequisite of
    * a training pipeline: windows of `window` tokens advancing by `stride`
    * (`window - stride` tokens of overlap), the last window clamped at the
    * document end; a doc shorter than one window yields itself. Returns an
    * array of chunk strings (explode for one row per chunk); per-row and
    * shuffle-free like the rest of the Text family. */
  def chunk(text: Column, window: Int, stride: Int): Column =
    graft.functions.WordChunks(text, window, stride)

  /** PII patterns shared by the scrubber and its counting columns. Written
    * to the common subset of java.util.regex (Spark) and RE2 (DuckDB, and
    * most non-JVM consumers): character classes, bounded repeats, ASCII
    * `\b` — no backrefs or lookaround, so the oracle and any sibling
    * implementation match byte-for-byte. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b555-[0-9]{4}\\b"
  val Ipv4Re = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"

  /** PII redaction: masks emails, phone numbers (NANP 555 test block), and
    * IPv4 addresses with typed placeholders. Order matters and is fixed —
    * emails first (their domains contain dots and digits an IP pass could
    * chew on), then phones, then IPs. Pure per-row regexp_replace chain:
    * codegen'd, shuffle-free, streams through a full-corpus scan. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Trains `numMerges` byte-pair-encoding merges over the corpus and
    * returns the merge table `(step, lhs, rhs, cnt)` in merge order — the
    * vocabulary-induction loop real BPE tokenizers run (count adjacent
    * token pairs weighted by word frequency, merge the most frequent pair
    * everywhere, repeat), not just one pair-frequency pass.
    *
    * Scale shape: the corpus text is scanned ONCE into a distinct-word
    * frequency table; every iteration runs over that (vastly smaller)
    * table — a map-side re-tokenization plus one shuffle on pair keys —
    * and only the single argmax row ever reaches the driver (ties broken
    * (cnt desc, lhs, rhs), so training is deterministic). The word table
    * is pinned per iteration ([[Pins]], released round-over-round like
    * [[Dedup.connectedComponents]]) so iteration k never re-runs the k-1
    * merges before it; the caller releases the last pin via
    * `Pins.releaseAll` after consuming the result.
    *
    * Tokenizations ride in one canonical string `||t1||t2||...||` per word.
    * Merging pair (l, r) is `replace(toks, "|l||r|", "|lr|")`: the pattern
    * keeps one `|` of each flanking double-separator, so a matched merge
    * leaves the boundary a neighbor match needs, and left-to-right
    * non-overlapping `replace` — the shared semantics of Spark and DuckDB —
    * reproduces BPE's greedy within-word merge order exactly (on `a a a`,
    * pattern `|a||a|` consumes `||a||a|`-minus-first-char, leaving `|a||`:
    * first two merge, the third survives). Tokens must not contain `|`.
    */
  def bpeTrain(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
    var (toks, toksHandle) = Pins.pinWithHandle(words.select(col("freq"),
      concat(lit("||"),
        array_join(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"), "||"),
        lit("||")).as("toks")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    for (step <- 1 to numMerges if !exhausted) {
      val top = toks
        .select(col("freq"), expr("filter(split(toks, '[|][|]'), x -> x != '')").as("a"))
        .where(size(col("a")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(a) - 1), i -> struct(a[i-1] AS lhs, a[i] AS rhs))")).as("p"))
        .groupBy(col("p.lhs"), col("p.rhs")).agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step.toLong, l, r, c))
        val (next, nextHandle) = Pins.pinWithHandle(toks.withColumn("toks",
          replace(col("toks"), lit(s"|$l||$r|"), lit(s"|$l$r|"))))
        Pins.release(toksHandle)
        toks = next; toksHandle = nextHandle
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("step", "lhs", "rhs", "cnt")
  }

  /** The interpreted HOF chain `chunk` replaced — kept ONLY as the parity
    * reference for WordChunksSpec's byte-identical pin (HigherOrderFunctions
    * don't participate in whole-stage codegen; the chain cost ~4 s at sf0.1
    * re-slicing the same word array per window). */
  private[graft] def chunkHof(text: Column, window: Int, stride: Int): Column = {
    require(window > 0 && stride > 0 && stride <= window, "need 0 < stride <= window")
    val words = split(trim(text), "\\s+")
    val n = size(words)
    val nChunks = greatest(
      (ceil((n - lit(window)).cast("double") / stride) + 1).cast("int"), lit(1))
    transform(sequence(lit(0), nChunks - 1),
      i => concat_ws(" ", slice(words, i * stride + 1, lit(window))))
  }
}
