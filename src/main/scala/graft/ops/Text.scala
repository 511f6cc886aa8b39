package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (north-star extension;
  * BASELINE.json). All are pure Catalyst expressions (whole-stage codegen'd,
  * no UDFs) so they stream through a 100 TB scan at full width — each is
  * per-row, shuffle-free, and column-pruned to `text` + the id.
  */
object Text {

  /** CJK-aware token count: whitespace words, plus one token per CJK
    * codepoint (Han/kana/Hangul/Bopomofo — [[graft.functions.ScriptCounts]]'s
    * routing class), so every token-denominated gate downstream (Gopher
    * band, token budgets, packing) is right on the multilingual slice.
    * Count-identical to `size(split(trim(text), "\s+"))` on all non-CJK
    * input — see [[graft.functions.TokenCount]] for the exact definition. */
  def tokenCount(text: Column): Column =
    graft.functions.TokenCount(text)

  /** The whitespace-split count [[tokenCount]] generalizes — kept ONLY as
    * the parity reference for TextSpec's pin that the kernel is
    * count-identical on non-CJK input. */
  private[graft] def tokenCountWs(text: Column): Column =
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

  /** Script-ROUTED language ID (r16) — the corpus router
    * [[graft.functions.ScriptCounts]] exists for: writing system decides
    * first (a CJK-dominant document routes to the CJK path no matter how
    * few English stopwords it happens to contain; likewise Cyrillic), and
    * only Latin-dominant text falls through to the stopword heuristic.
    * Adds `lang_routed` to `df`. The struct lands in its own projection so
    * the kernel runs ONCE per row (CollapseProject keeps multiply-
    * referenced non-trivial aliases separate — the bpeEncode discipline). */
  def langIdScript(df: DataFrame, text: Column, minHits: Int = 3): DataFrame = {
    require(!df.columns.contains("_sc"),
      "graft text: input must not carry a column named _sc")
    df.withColumn("_sc", graft.functions.ScriptCounts(text))
      .withColumn("lang_routed",
        when(col("_sc.cjk") > col("_sc.latin"), lit("cjk"))
          .when(col("_sc.cyrillic") > col("_sc.latin"), lit("cyr"))
          .otherwise(langId(text, minHits)))
      .drop("_sc")
  }

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

  /** CJK-aware [[chunk]]: windows counted in [[tokenCount]]'s units (each
    * CJK codepoint = one token), so packing actually splits a Chinese
    * document instead of carrying it as one giant "word" chunk. On non-CJK
    * input it is byte-identical to [[chunk]] (TokenCountSpec pins it);
    * chunk text preserves CJK adjacency (no invented spaces). */
  def chunkCjk(text: Column, window: Int, stride: Int): Column =
    graft.functions.TokenChunks(text, window, stride)

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

  /** Applies a trained BPE merge table ([[bpeTrain]]'s output) to tokenize
    * documents — the APPLY half of the tokenizer loop: per word, start from
    * the character sequence in the same `||t1||t2||` canonical string the
    * trainer uses and fold the merges in step order (each application is
    * the same left-to-right non-overlapping `replace` the trainer performs,
    * so encode reproduces training's greedy semantics exactly).
    *
    * Scale shape: the merge table is a model artifact (|merges| rows,
    * driver-bounded by construction) collapsed into ONE broadcast row
    * holding a step-sorted array; encoding is then a single per-row
    * codegen-free HOF chain (`transform` over words, `aggregate` over
    * merges) — shuffle-free, streams through a 100 TB scan. No UDF: the
    * fold is Catalyst `aggregate`, the merge application is `replace`.
    */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      merges: DataFrame): DataFrame = {
    // the merge table is a model artifact, |merges| rows by construction
    // (bpeTrain already assembled it on the driver) — the same bounded-
    // collect class as Similarity's k-centroid index; it ships to tasks
    // inside the expression, not as a join side
    val ms = merges.orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    docs.select(col(idCol).as("doc_id"),
        graft.functions.BpeApply(col(textCol), ms).as("subwords"))
      // two-step so the kernel runs once per row (CollapseProject keeps
      // multiply-referenced non-trivial aliases in their own projection)
      .select(col("doc_id"),
        when(col("subwords") === "", 0L)
          .otherwise(size(split(col("subwords"), " ")).cast("long")).as("n_subwords"),
        col("subwords"))
  }

  /** The interpreted HOF fold `bpeEncode` replaced — kept ONLY as the
    * parity reference for TextSpec's byte-identical pin (the per-occurrence
    * re-fold cost 5.0 s at sf0.1; [[graft.functions.BpeApply]] memoizes
    * per-word encodings instead). */
  private[graft] def bpeEncodeHof(docs: DataFrame, idCol: String,
      textCol: String, merges: DataFrame): DataFrame = {
    val ms = merges.agg(array_sort(
      collect_list(struct(col("step"), col("lhs"), col("rhs")))).as("ms"))
    docs.select(col(idCol).as("doc_id"), col(textCol).as("txt"))
      .crossJoin(broadcast(ms))
      .withColumn("words", expr("filter(split(lower(trim(txt)), '\\\\s+'), x -> x != '')"))
      .withColumn("sub", expr(
        """flatten(transform(words, w ->
             filter(split(
               aggregate(ms,
                 concat('||', array_join(transform(sequence(1, length(w)),
                   i -> substring(w, i, 1)), '||'), '||'),
                 (acc, m) -> replace(acc,
                   concat('|', m.lhs, '||', m.rhs, '|'),
                   concat('|', m.lhs, m.rhs, '|'))),
               '[|][|]'), x -> x != '')))"""))
      .select(col("doc_id"), size(col("sub")).cast("long").as("n_subwords"),
        array_join(col("sub"), " ").as("subwords"))
  }

  /** CCNet-style LM quality filtering: train an add-one-smoothed bigram
    * language model on the `isTrain` split of the corpus, score every
    * held-out document by its total negative log-likelihood, and gate on
    * mean NLL per bigram — the perplexity filter real pre-training
    * pipelines run between dedup and mixing (wiki-trained LM, drop the
    * high-perplexity tail).
    *
    * Exactness: every per-bigram term is rounded ONCE to integer
    * micro-nats (`round(-ln(p)·1e6)`), and per-document totals are BIGINT
    * sums of those integers — order-independent and engine-neutral, the
    * same discipline as the DSIR weights. The gate compares
    * `nll_unats <= n_bigrams · thresholdUnats` in integer arithmetic (no
    * float division ever happens), so `kept` is exact too.
    *
    * Model definition (fixed, both engines): tokens are
    * lower/trim/`\s+`-split; vocab = distinct train tokens, V = |vocab|+1
    * (one slot for `<unk>`); held-out tokens outside the vocab map to
    * `<unk>`; P(v|u) = (c2(u,v)+1)/(c1(u)+V) with c1 = train unigram
    * count (0 for `<unk>`), c2 = train bigram count. Documents with < 2
    * tokens score 0/0 and are kept.
    *
    * Scale shape: token/bigram extraction is per-row and shuffle-free;
    * c1/c2 are map-side-combined word-key aggregations; the held-out
    * scoring joins are key-partitioned hash joins on word / word-pair
    * (AQE broadcasts them when the LM is small, and when it isn't — a
    * 100 TB corpus' bigram table — a shuffle join on the pair key is the
    * right plan); the single scalar (V) rides a broadcast cross join.
    * Nothing ever collects to the driver.
    */
  def lmPerplexity(docs: DataFrame, idCol: String, textCol: String,
      isTrain: Column, thresholdUnats: Long = 5000000L): DataFrame = {
    val tagged = docs.select(col(idCol), isTrain.as("is_train"), col(textCol))
    lmScore(trainLm(tagged.where(col("is_train")), textCol),
      tagged.where(not(col("is_train"))), idCol, textCol, thresholdUnats)
  }

  /** The bigram LM as a first-class model artifact: unigram counts, bigram
    * counts, and the smoothing denominator scalar — all DataFrames, so a
    * model trains once (possibly persisted as a World / parquet tables) and
    * scores many corpora or stream batches. */
  final case class LmModel(c1: DataFrame, c2: DataFrame, vTot: DataFrame)

  private def lmBase(docs: DataFrame, idCols: Seq[Column], textCol: String): DataFrame =
    docs.select(idCols :+ col(textCol).as("txt"): _*)
      .withColumn("w", expr("filter(split(lower(trim(txt)), '\\\\s+'), x -> x != '')"))

  private def lmPairs(base: DataFrame, idCols: Seq[Column]): DataFrame = base
    .where(size(col("w")) >= 2)
    .select(idCols :+ explode(arrays_zip(
      slice(col("w"), lit(1), size(col("w")) - 1),
      slice(col("w"), lit(2), size(col("w")) - 1))).as("p"): _*)
    .select(idCols :+ col("p").getField("0").as("u") :+ col("p").getField("1").as("v"): _*)

  /** Trains the add-one-smoothed bigram LM of [[lmPerplexity]]'s model
    * definition over `docs` (two map-side-combined word-key aggregations;
    * nothing collects). */
  def trainLm(docs: DataFrame, textCol: String): LmModel = {
    val base = lmBase(docs, Seq.empty, textCol)
    val c1 = base.select(explode(col("w")).as("u"))
      .groupBy("u").agg(count(lit(1)).as("c1"))
    val c2 = lmPairs(base.withColumn("doc_id", lit(0L)), Seq(col("doc_id")))
      .groupBy("u", "v").agg(count(lit(1)).as("c2"))
    val vTot = c1.agg((count(lit(1)) + 1L).cast("double").as("v")) // +1: <unk>
    LmModel(c1, c2, vTot)
  }

  /** Incrementally train the bigram LM: add one batch's token/bigram counts
    * into persisted count-store Worlds (dim 0 = xxhash64 of the word /
    * bigram; payload = the key string(s) + running count). Counts merge by
    * read-add-replace through the store's partition-scoped insert, so only
    * touched cells rewrite. A 64-bit key collision merges two keys' counts
    * — the same documented trade as the fingerprint dedup store, vanishing
    * at any real vocabulary size.
    *
    * `commitId` (the streaming daemon passes its batch id) makes replay
    * exactly-once: counts are ADDITIVE, so unlike the idempotent dedup
    * stores a blind replay would inflate them. Each store seals its OWN
    * per-commit marker immediately after its insert: a replay skips every
    * store whose marker exists and re-runs only the one(s) that never
    * applied, so a crash BETWEEN the two inserts can no longer double c1 —
    * the replay converges to exactly the offline-training counts
    * (StreamingSpec pins this with the `faultAfterC1` injection hook). The
    * remaining window is each store's own insert-to-marker gap, the same
    * torn-commit class the native streaming sink documents. */
  def updateLmCounts(c1Store: graft.world.World, c2Store: graft.world.World,
      batch: DataFrame, textCol: String, commitId: Option[Long] = None,
      // test seam: injected between the c1 seal and the c2 insert to pin
      // the crash-between-inserts replay contract; never set in production
      faultAfterC1: () => Unit = () => ()): Unit = {
    val spark = batch.sparkSession
    def markerOf(store: graft.world.World) = commitId.map(id =>
      new org.apache.hadoop.fs.Path(s"${store.path}/_lm_commits/$id"))
    def sealed_(store: graft.world.World): Boolean = markerOf(store).exists { m =>
      org.apache.hadoop.fs.FileSystem.get(new java.net.URI(store.path),
        spark.sparkContext.hadoopConfiguration).exists(m)
    }
    def seal(store: graft.world.World): Unit = markerOf(store).foreach { m =>
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(store.path),
        spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(m.getParent); fs.create(m, true).close()
    }
    if (sealed_(c1Store) && sealed_(c2Store)) return
    val base = lmBase(batch, Seq.empty, textCol)
    if (!sealed_(c1Store)) {
      val c1d = base.select(explode(col("w")).as("u"))
        .groupBy("u").agg(count(lit(1)).as("delta"))
        .withColumn(c1Store.dims.head.column, xxhash64(col("u")))
      addCounts(c1Store, c1d, Seq("u"), "c1")
      seal(c1Store)
    }
    faultAfterC1()
    if (!sealed_(c2Store)) {
      val c2d = lmPairs(base.withColumn("doc_id", lit(0L)), Seq(col("doc_id")))
        .groupBy("u", "v").agg(count(lit(1)).as("delta"))
        .withColumn(c2Store.dims.head.column,
          xxhash64(concat_ws(" ", col("u"), col("v"))))
      addCounts(c2Store, c2d, Seq("u", "v"), "c2")
      seal(c2Store)
    }
  }

  /** Rebuild an [[LmModel]] from persisted count stores — scoring needs no
    * retraining pass, just the two reads. */
  def loadLm(c1Store: graft.world.World, c2Store: graft.world.World): LmModel = {
    val c1 = c1Store.df.select(col("u"), col("c1"))
    LmModel(c1, c2Store.df.select("u", "v", "c2"),
      c1.agg((count(lit(1)) + 1L).cast("double").as("v")))
  }

  /** Read-add-replace of one count store: join the batch deltas against the
    * stored counts, insert the summed rows (replace-by-hash rewrites only
    * touched cells). The join result is pinned before the store mutates —
    * the same lazy-reread hazard incremental dedup documents. */
  private def addCounts(store: graft.world.World, delta: DataFrame,
      keyCols: Seq[String], cntCol: String): Unit = {
    val dimCol = store.dims.head.column
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(store.path),
      delta.sparkSession.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(store.path)
    val virgin = !fs.exists(root) || fs.listStatus(root).isEmpty
    val outCols = col(dimCol) +: keyCols.map(col)
    if (virgin)
      store.create(delta.select(outCols :+ col("delta").as(cntCol): _*))
    else {
      val merged = graft.ops.Pins.pin(delta
        .join(store.df.select(col(dimCol), col(cntCol).as("__old")),
          Seq(dimCol), "left_outer")
        .select(outCols :+
          (col("delta") + coalesce(col("__old"), lit(0L))).as(cntCol): _*))
      store.insert(merged)
      ()
    }
  }

  /** Scores `docs` against a trained [[LmModel]] — the held-out half of
    * [[lmPerplexity]], reusable against any corpus or stream batch. */
  def lmScore(model: LmModel, docs: DataFrame, idCol: String, textCol: String,
      thresholdUnats: Long = 5000000L): DataFrame = {
    val base = lmBase(docs, Seq(col(idCol).as("doc_id")), textCol)
    // bigrams -> <unk>-mapped (vocab membership via the c1 table itself; a
    // null c1 after the left join IS the out-of-vocab signal)
    val mapped = lmPairs(base, Seq(col("doc_id")))
      .join(model.c1.select(col("u"), lit(1).as("in_u")), Seq("u"), "left_outer")
      .join(model.c1.select(col("u").as("v"), lit(1).as("in_v")), Seq("v"), "left_outer")
      .select(col("doc_id"),
        when(col("in_u").isNotNull, col("u")).otherwise(lit("<unk>")).as("mu"),
        when(col("in_v").isNotNull, col("v")).otherwise(lit("<unk>")).as("mv"))
    val scored = mapped
      .join(model.c1.select(col("u").as("mu"), col("c1")), Seq("mu"), "left_outer")
      .join(model.c2.select(col("u").as("mu"), col("v").as("mv"), col("c2")),
        Seq("mu", "mv"), "left_outer")
      .crossJoin(broadcast(model.vTot))
      .select(col("doc_id"),
        round(-log((coalesce(col("c2"), lit(0L)) + lit(1.0)) /
          (coalesce(col("c1"), lit(0L)) + col("v"))) * 1e6, 0)
          .cast("long").as("t_unats"))
      .groupBy("doc_id")
      .agg(sum("t_unats").as("nll_unats"), count(lit(1)).as("n_bigrams"))
    base.select("doc_id")
      .join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("nll_unats"), lit(0L)).as("nll_unats"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
      .withColumn("kept",
        (col("nll_unats") <= col("n_bigrams") * lit(thresholdUnats)).cast("long"))
  }

  /** Token-distribution drift between two corpus splits: per-word
    * contribution to KL(P_left ‖ P_right) over add-one-smoothed unigram
    * distributions, top `topK` contributors — the monitoring pass that
    * catches a data-mix shift (a crawl snapshot gone weird, a source
    * suddenly over-represented) before it trains into a model.
    *
    * Each contribution `P·ln(P/Q)` is computed from exact integer counts
    * and rounded ONCE to nano-nats (1e-9), so rows are engine-neutral;
    * the sum of the full (un-limited) column is the total divergence.
    * Scale shape: one map-side-combined groupBy on the word key, a scalar
    * broadcast for the totals, and a TakeOrdered top-k — no global sort.
    */
  def tokenKlDrift(docs: DataFrame, textCol: String, isLeft: Column,
      topK: Int = 50): DataFrame = {
    val toks = docs
      .select(isLeft.as("is_left"), col(textCol).as("txt"))
      .select(col("is_left"),
        explode(expr("filter(split(lower(trim(txt)), '\\\\s+'), x -> x != '')")).as("w"))
    val byWord = toks.groupBy("w").agg(
      sum(when(col("is_left"), 1L).otherwise(0L)).as("cl"),
      sum(when(not(col("is_left")), 1L).otherwise(0L)).as("cr"))
    val totals = byWord.agg(
      sum("cl").cast("double").as("tl"), sum("cr").cast("double").as("tr"),
      count(lit(1)).cast("double").as("vv"))
    val p = (col("cl") + lit(1.0)) / (col("tl") + col("vv"))
    val q = (col("cr") + lit(1.0)) / (col("tr") + col("vv"))
    byWord.crossJoin(broadcast(totals))
      .select(col("w").as("word"), col("cl"), col("cr"),
        round(p * (log(p) - log(q)) * 1e9, 0).cast("long").as("kl_nnats"))
      .orderBy(col("kl_nnats").desc, col("word"))
      .limit(topK)
  }
}
