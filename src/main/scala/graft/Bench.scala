package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

object Bench {
  /** Timed action: iterate the physical plan's output rows with the full
    * output schema. `.count()` lets Catalyst prune unreferenced projections,
    * billing expression-heavy queries at scan cost; `toRdd` keeps every
    * output column in the produced UnsafeRows, so the real expression work
    * is measured. */
  private def materialize(df: DataFrame): Long =
    df.queryExecution.toRdd.mapPartitions { it =>
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      Iterator.single(n)
    }.fold(0L)(_ + _)

  /** The registry's two admitted global windows (rank over a LIMIT-reduced
    * top-k — t_zipf_fit, s_hybrid_rrf's lexical side; ≤ 100 rows by
    * construction, statically admitted by RegistryScaleSpec) make
    * WindowExec WARN "No Partition Defined … serious performance
    * degradation" on every harness run — alarm noise over a non-problem
    * that would page someone at 3am. Scope the suppression to exactly that
    * one logger so real hazards elsewhere still surface; queries that
    * would ACTUALLY single-reduce are caught structurally by
    * RegistryScaleSpec, not by grepping logs. */
  def silenceBoundedWindowWarn(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    silenceBoundedWindowWarn()
    // untimed warmup: session/codegen/JIT init and first-touch of every
    // table's read path should not be billed to whichever query happens to
    // run first (alphabetical order made d_exact_dedup absorb it)
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    // fixed CPU-bound canary, timed before and after the suite: best-of-2 +
    // the spread tie-breaker catch a stall that hits SOME runs, but a host
    // that is UNIFORMLY degraded (cpu-starved VM, billed steal time) slows
    // every sample equally and the record looks self-consistent — round 5's
    // driver record was exactly that. The canary is data-independent
    // (spark.range -> sum, no I/O), so its healthy time is a property of the
    // machine, not the code under test: a degraded-host record identifies
    // itself (canary seconds far above the ~0.1-0.3 s a healthy 32-core host
    // shows) without needing a second host to compare against.
    def canary(): Double = {
      val t0 = System.nanoTime()
      spark.range(500000000L).selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // r14 lesson: the host degraded BETWEEN healthy bookend canaries and the
    // record looked clean while a trivial groupBy billed 58 s. The canary
    // now INTERLEAVES every `canaryEvery` queries, each query is tagged with
    // its bracketing canary window, and queries whose window was degraded
    // get one extra run at the end if the host has recovered — so a
    // poisoned sample is visible in the JSON and, when possible, replaced
    // by a healthy one rather than silently distorting the headline.
    val canaryEvery = 20
    val canaries = scala.collection.mutable.ArrayBuffer[Double](canary())
    // dev-only: SPARK_GRAFT_BENCH_ONLY=q1_agg,d_simhash narrows the run for
    // iteration; the driver leaves it unset (full suite)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // (name, [run seconds...], error) — failures are recorded, never silently
    // ignored. Each query is timed as the BEST of 2 consecutive
    // materializations: a single sample let one environmental stall bill
    // 31 s to a 1.7 s query in round 2 and distort the round headline 2x.
    // The second run reuses warmed state (JIT, page cache, codegen'd
    // classes), so best-of-2 measures the code, not the machine's mood;
    // both raw samples are emitted for auditability.
    // per run: (seconds, error). A query's best time is the min over
    // SUCCESSFUL runs only (a fast failure must not masquerade as a fast
    // result), and it is reported as errored only when BOTH runs fail — a
    // transient one-run failure surfaces in "raw"/"flaky", not "errors".
    val windowOf = scala.collection.mutable.Map.empty[String, Int]
    val results0 = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .zipWithIndex.map { case ((name, fn), qi) =>
      if (qi > 0 && qi % canaryEvery == 0) canaries += canary()
      windowOf(name) = canaries.size - 1
      def run(): (Double, Option[String]) = {
        val t0 = System.nanoTime()
        val err =
          try { materialize(fn(spark, sfDir)); None }
          catch { case e: Throwable =>
            Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
          }
          // each run builds the query fresh, so any checkpoint it pinned is
          // dead weight once materialized — free it inside the timed window
          // (the release IS part of the operator's cost)
          finally ops.Pins.releaseAll()
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val two = Seq(run(), run())
      // tie-breaker third run ONLY when the two samples can't speak for the
      // code: a >3x spread between successful runs means an environmental
      // stall hit one of them (observed: an idle-host pause billed 87 s to a
      // 2.6 s query — BOTH samples of a pair can be hit), and a 1-of-2
      // failure needs a deciding vote for the flaky-vs-broken call. Bounded:
      // at most one extra run per outlier query, zero for stable ones.
      // 2.5x, not 3: an observed double stall (4.0s/11.6s on a 0.8s query)
      // sat at 2.9x spread and kept its distorted best-of-2
      val ok = two.collect { case (t, None) => t }
      val runs =
        if ((ok.size == 2 && ok.max / ok.min > 2.5) || ok.size == 1) two :+ run()
        else two
      (name, (fn, runs))
    }
    canaries += canary() // closes the last window (window w = canaries(w)..(w+1))
    // a canary is healthy if it's within noise of the run's MEDIAN canary —
    // the median, not the min: one exceptionally fast sample must not drag
    // the threshold under the host's normal spread (observed: minC 0.09 s
    // flagging ordinary 0.3-0.45 s samples), and one degraded window must
    // not inflate it (the mean would). A uniformly-degraded host shows as
    // a high median itself, flagged separately below.
    val medC = canaries.sorted.apply(canaries.size / 2)
    def healthyC(c: Double): Boolean = c <= math.max(3.0 * medC, medC + 0.5)
    def windowHealthy(w: Int): Boolean =
      healthyC(canaries(w)) && healthyC(canaries(w + 1))
    val degraded = results0.collect {
      case (name, _) if !windowHealthy(windowOf(name)) => name
    }.toSet
    // recovery pass: degraded-window queries get ONE extra run each, taken
    // only while the host is demonstrably healthy again (canary-bracketed,
    // re-checked every `canaryEvery` retries) — best-of then prefers the
    // healthy sample naturally via min-over-successes
    val retryRuns = scala.collection.mutable.Map.empty[String, (Double, Option[String])]
    if (degraded.nonEmpty) {
      var c = canary(); canaries += c
      var i = 0
      for ((name, (fn, _)) <- results0 if degraded(name) && healthyC(c)) {
        val t0 = System.nanoTime()
        val err =
          try { materialize(fn(spark, sfDir)); None }
          catch { case e: Throwable =>
            Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
          } finally ops.Pins.releaseAll()
        retryRuns(name) = ((System.nanoTime() - t0) / 1e9, err)
        i += 1
        if (i % canaryEvery == 0) { c = canary(); canaries += c }
      }
    }
    val results = results0.map { case (name, (_, runs)) =>
      (name, runs ++ retryRuns.get(name).toSeq)
    }
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", " ") + "\""
    def best(runs: Seq[(Double, Option[String])]): Double = {
      val ok = runs.collect { case (t, None) => t }
      if (ok.nonEmpty) ok.min else runs.map(_._1).min
    }
    val qs = results.map { case (k, v) => s"${jstr(k)}:${best(v)}" }.mkString("{", ",", "}")
    val raw = results.map { case (k, v) => s"${jstr(k)}:${v.map(_._1).mkString("[", ",", "]")}" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, v) if v.forall(_._2.isDefined) =>
      s"${jstr(k)}:${jstr(v.head._2.get)}" }.mkString("{", ",", "}")
    val flaky = results.collect { case (k, v) if v.exists(_._2.isDefined) && v.exists(_._2.isEmpty) =>
      s"${jstr(k)}:${jstr(v.collectFirst { case (_, Some(e)) => e }.get)}" }.mkString("{", ",", "}")
    val total = results.map { case (_, v) => best(v) }.sum
    // run1 total: what a SINGLE cold pass costs — directly comparable to the
    // r1/r2 single-run headline; "value" (min-of-2) is the steady-state
    // number and ~25-30% lower by methodology, not by code speedup
    val totalRun1 = results.map(_._2.head._1).sum
    val canaryJson = canaries.map(c => f"$c%.3f").mkString("[", ",", "]")
    val winJson = results.map { case (k, _) =>
      val w = windowOf(k)
      s"${jstr(k)}:[${f"${canaries(w)}%.3f"},${f"${canaries(w + 1)}%.3f"}]"
    }.mkString("{", ",", "}")
    // per-window spikes OR a uniformly slow host (high median itself —
    // relative checks cannot see uniform degradation, the r5/r14 trap)
    val hostDegraded = canaries.exists(c => !healthyC(c)) || medC > 1.0
    val retriedJson = degraded.toSeq.sorted.map(jstr).mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","value_run1":$totalRun1,"canary_before_sec":${canaries.head},"canary_after_sec":${canaries.last},"canaries":$canaryJson,"canary_every":$canaryEvery,"host_degraded":$hostDegraded,"degraded_window_queries":$retriedJson,"query_window_canaries":$winJson,"canary":"range(5e8).sum, data-independent, interleaved every $canaryEvery queries; healthy 32-core host ~0.1-0.3 s - a canary >max(3x median, median+0.5s) marks its bracketed window degraded, a median >1s marks the whole record; degraded-window queries get one extra healthy-host run","timing":"per-query best of 2 runs, +1 tie-breaker run on >2.5x spread between successes or a 1-of-2 failure, +1 recovery run for degraded-window queries; value_run1 sums first runs (single-run comparable)","queries":$qs,"raw":$raw,"errors":$errs,"flaky":$flaky,"sf":"$sfDir"}"""
    // file copy first (survives log interleaving), then the line alone on
    // stdout after Spark is quiet
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_result.json"),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
    System.out.println(line)
    System.out.flush()
  }
}
