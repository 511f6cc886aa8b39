package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget mixture sampling (r14): "take N tokens from each source" —
  * the data-mixing primitive behind every pretraining recipe (so-many
  * tokens of web, so-many of books, …). Deterministic: docs are taken in
  * md5(doc_id) order (re-running is idempotent, the sample is reproducible
  * across engines and partitionings) until the source's cumulative weight
  * would exceed its budget (inclusive prefix: a doc is in iff the running
  * sum THROUGH it is ≤ budget).
  *
  * Scale shape — the naive form is a running sum over a
  * `PARTITION BY source ORDER BY md5` window, which sorts EACH SOURCE ON
  * ONE TASK (sources are few and huge: the exact single-reducer shape the
  * registry bans). This is the two-phase restatement:
  *   1. bucket each doc by an md5 PREFIX (the bucket is a prefix of the
  *      order key, so bucket order == key order); per-(source, bucket)
  *      weight sums aggregate map-side — the only full-data shuffle is
  *      by (source, bucket), fanned out `buckets`-wide;
  *   2. a bounded window (≤ `buckets` rows per source) turns bucket sums
  *      into [start, end) prefix ranges: buckets ending ≤ budget are
  *      taken WHOLE (no per-row work at all), buckets starting ≥ budget
  *      drop whole, and only the ONE straddling bucket per source scans
  *      its rows with an intra-bucket running sum — a window over
  *      1/`buckets` of one source, after a filter that keeps only those
  *      rows.
  * At 100 TB: raise `hexDigits` so the straddling bucket fits a task
  * (16^h buckets); phase-2's window input is budget-bounded, not
  * corpus-bounded.
  */
object Mixture {

  /** @param df        input; must carry a unique bigint `doc_id`
    * @param sourceCol grouping column (the mixture component)
    * @param weightCol per-doc weight (tokens, chars, bytes — any
    *                  NON-NEGATIVE bigint; a negative weight makes the
    *                  running sum non-monotone, so prefix semantics are
    *                  undefined — it fails loudly row-by-row. NULL weights
    *                  pass through untouched: sums skip them, so a NULL
    *                  behaves as weight 0, the pre-guard behavior)
    * @param budget    per-source budget; must be a pure function of
    *                  `sourceCol` (constant within a source — the prefix
    *                  ranges compare against one budget per source)
    * @param hexDigits md5-prefix width: 16^hexDigits buckets per source */
  def budgetPrefix(df: DataFrame, sourceCol: String, weightCol: String,
      budget: Column, hexDigits: Int = 2): DataFrame = {
    require(hexDigits >= 1 && hexDigits <= 8, "hexDigits in [1,8]")
    // fail fast on working-column collisions: withColumn would silently
    // REPLACE a caller's same-named column and return hashes in its place
    Seq("_ok", "_bk", "_budget", "_bw", "_cumEnd", "_cumStart", "_cum")
      .foreach(c => require(!df.columns.contains(c),
        s"graft mixture: input must not carry a column named $c"))
    val outCols = df.columns.map(col).toSeq
    val d = df
      // the non-negativity contract, ENFORCED (a scaladoc alone let w<0
      // through to silently-undefined prefix semantics): the guard rides
      // the weight expression itself so the optimizer can never prune it,
      // and it codegens to one branch per row — free on the scan
      .withColumn(weightCol,
        when(col(weightCol) >= 0 || col(weightCol).isNull, col(weightCol))
          .otherwise(raise_error(
            concat(lit(s"graft mixture: negative $weightCol for doc_id "),
              col("doc_id").cast("string")))))
      .withColumn("_ok", md5(col("doc_id").cast("string")))
      .withColumn("_bk", conv(substring(col("_ok"), 1, hexDigits), 16, 10).cast("long"))
      .withColumn("_budget", budget)
    val bucketSums = d.groupBy(col(sourceCol), col("_bk"))
      .agg(sum(col(weightCol)).as("_bw"))
    // bounded: <= 16^hexDigits rows per source
    val perSource = Window.partitionBy(sourceCol).orderBy("_bk")
    val ranges = bucketSums
      .withColumn("_cumEnd", sum(col("_bw")).over(perSource))
      .withColumn("_cumStart", col("_cumEnd") - col("_bw"))
      .select(col(sourceCol), col("_bk"), col("_cumStart"), col("_cumEnd"))
    val joined = d.join(ranges, Seq(sourceCol, "_bk"))
    val whole = joined.where(col("_cumEnd") <= col("_budget"))
    // the straddling bucket: the ONLY rows that need a per-row running sum.
    // _cumStart <= budget (not <): a bucket STARTING exactly at the budget
    // can still contribute its leading ZERO-weight docs (cum == budget is
    // inside the inclusive prefix); with all-positive weights the extra
    // bucket scans and keeps nothing — same answer, one more bounded task
    val intra = Window.partitionBy(col(sourceCol), col("_bk"))
      .orderBy(col("_ok"), col("doc_id"))
    val straddle = joined
      .where(col("_cumStart") <= col("_budget") && col("_cumEnd") > col("_budget"))
      .withColumn("_cum", col("_cumStart") + sum(col(weightCol)).over(intra))
      .where(col("_cum") <= col("_budget"))
    whole.select(outCols: _*).unionByName(straddle.select(outCols: _*))
  }

  /** Temperature-flattened per-source budgets — the multi-source sampling
    * recipe behind multilingual/multi-domain pretraining mixes: source `s`
    * receives budget ∝ n_s^α of `totalBudget`, where n_s is its total
    * weight. α = 1 is proportional (no flattening); α → 0 approaches
    * uniform; α = 0.5 is the common square-root flattening that up-samples
    * small sources without letting any source dominate.
    *
    * Returns one row per source: (source, _n = Σ weight, _sw = the
    * flattened integer weight, _sbudget = totalBudget·_sw div Σ_sw).
    *
    * ENGINE-NEUTRAL at the reproducible operating points: α = 1 uses the
    * integer weight itself, α = 0.5 uses floor(sqrt(n)) — IEEE sqrt is
    * correctly ROUNDED, so every engine computes the identical double and
    * the identical floor — and all downstream arithmetic is BIGINT
    * (requires totalBudget · max(_sw) < 2^63, comfortable for token
    * budgets). Any other α goes through java.lang.Math.pow, whose last
    * ulp is NOT portable across engines — fine for production sampling,
    * excluded from hash-exact oracles.
    *
    * Scale shape: one map-side-combined groupBy on the (tiny) source key;
    * the global total rides a window OVER THE AGGREGATE (rows = source
    * count, never the corpus — the bounded-global-window pattern the scale
    * lint admits).
    */
  def temperatureBudgets(df: DataFrame, sourceCol: String, weightCol: String,
      totalBudget: Long, alpha: Double = 0.5): DataFrame = {
    require(totalBudget >= 0, s"totalBudget must be >= 0, got $totalBudget")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val n = df.groupBy(sourceCol).agg(sum(col(weightCol)).as("_n"))
    val flat =
      if (alpha == 1.0) col("_n")
      else if (alpha == 0.5) floor(sqrt(col("_n").cast("double"))).cast("long")
      else floor(pow(col("_n").cast("double"), lit(alpha))).cast("long")
    val w = Window.partitionBy() // over the source-count-bounded aggregate
    n.withColumn("_sw", flat)
      .withColumn("_swsum", sum(col("_sw")).over(w))
      // an all-zero-weight corpus (every _sw = 0) gets budget 0 everywhere
      // — the budget-0 "take nothing" semantics budgetPrefix already has —
      // instead of an ANSI DIVIDE_BY_ZERO from deep inside the plan
      .withColumn("_sbudget",
        when(col("_swsum") === 0, lit(0L))
          .otherwise(expr(s"${totalBudget}L * _sw DIV _swsum")))
      .drop("_swsum")
  }

  /** [[temperatureBudgets]] composed with [[budgetPrefix]]: one call from
    * corpus to temperature-sampled corpus. The per-source budget table is
    * BROADCAST back onto the rows (it is source-count-sized), so the only
    * full-data shuffle remains budgetPrefix's (source, bucket) hash. */
  def temperaturePrefix(df: DataFrame, sourceCol: String, weightCol: String,
      totalBudget: Long, alpha: Double = 0.5, hexDigits: Int = 2): DataFrame = {
    require(!df.columns.contains("_sbudget"),
      "graft mixture: input must not carry a column named _sbudget")
    val budgets = temperatureBudgets(df, sourceCol, weightCol, totalBudget, alpha)
      .select(col(sourceCol), col("_sbudget"))
    val joined = df.join(broadcast(budgets), Seq(sourceCol))
    budgetPrefix(joined, sourceCol, weightCol, col("_sbudget"), hexDigits)
      .drop("_sbudget")
  }
}
