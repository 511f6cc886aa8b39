package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt gating (r14) — the crawl pipeline's politeness filter.
  * A fetch frontier joins every candidate URL against its host's parsed
  * robots rules BEFORE fetching; at crawl scale that is a URLs ⋈ rules
  * join on host (rules are bounded by the host count — orders of
  * magnitude below the URL count — so the join is hash-on-host with the
  * rule side the build side; AQE broadcasts it whenever a crawl shard's
  * host set is small enough).
  *
  * Parsing semantics (deterministic subset of REP / RFC 9309, documented
  * so oracles can restate decisions exactly):
  *   - `#` starts a comment (to end of line); keys are case-insensitive
  *     (`User-agent:`, `disallow:`, `ALLOW:` all parse); values trim;
  *     lines split on LF, a trailing CR strips (CRLF bodies parse);
  *   - consecutive `user-agent` lines accumulate into one group header;
  *     the first rule line closes it; the group's rules apply to us iff
  *     one of its agents is `*` (this engine takes the generic-agent
  *     view — per-product agent matching is a config away, not a new
  *     parser);
  *   - `disallow:` / `allow:` with a NON-empty value add a prefix rule;
  *     an empty `disallow:` adds nothing (the spec's "allow all" form);
  *     unknown keys (`crawl-delay`, `sitemap`) are ignored;
  *   - decision for (host, path): among the host's rules whose prefix
  *     prefixes the path, the LONGEST prefix wins; at equal length
  *     `allow` beats `disallow` (the REP tiebreak); NO matching rule —
  *     including a host with no robots at all — means allowed.
  */
object Robots {

  final case class RobotsTxt(host: String, body: String)
  final case class RobotsRule(host: String, allow: Boolean, prefix: String)
  final case class HostDelay(host: String, delay_ms: Long)

  /** One forward pass per body, shuffle-free iterator fan-out (a body
    * with R rules emits R rows, nothing materialized per host). */
  def parse(spark: SparkSession, robots: Dataset[RobotsTxt]): Dataset[RobotsRule] = {
    import spark.implicits._
    robots.flatMap { r =>
      val out = scala.collection.mutable.ArrayBuffer.empty[RobotsRule]
      var agents = List.empty[String]
      var collecting = true // accumulating user-agent lines for a new group
      var applies = false
      r.body.split("\n", -1).foreach { raw =>
        val noCr = if (raw.endsWith("\r")) raw.dropRight(1) else raw
        val hash = noCr.indexOf('#')
        val line = (if (hash >= 0) noCr.substring(0, hash) else noCr).trim
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (!collecting) { agents = Nil; collecting = true }
              agents ::= value
              applies = agents.contains("*")
            case "disallow" | "allow" =>
              collecting = false
              if (applies && value.nonEmpty)
                out += RobotsRule(r.host, key == "allow", value)
            case _ => collecting = false // crawl-delay, sitemap, unknown
          }
        }
      }
      out
    }
  }

  /** Crawl-delay extraction (r17): parse `Crawl-delay: <seconds>` out of
    * the generic-agent (`*`) groups — the directive [[parse]] deliberately
    * skips. Same grammar walk as [[parse]] (comments, CRLF, case-folded
    * keys, consecutive user-agent accumulation; crawl-delay is itself a
    * rule-ish line, so it closes an open agent header exactly like
    * disallow does — the two parsers see identical group boundaries).
    * Values are nonnegative decimal seconds kept to millisecond precision
    * (extra fractional digits truncate) in exact integer arithmetic;
    * unparsable values are ignored — a malformed directive must not shape
    * the schedule. When several applicable groups carry delays the MAXIMUM
    * wins (the conservative politeness reading). Hosts with no applicable
    * directive emit nothing — the scheduler supplies the default. */
  def parseDelays(spark: SparkSession,
      robots: Dataset[RobotsTxt]): Dataset[HostDelay] = {
    import spark.implicits._
    robots.flatMap { r =>
      var best = -1L
      var agents = List.empty[String]
      var collecting = true
      var applies = false
      r.body.split("\n", -1).foreach { raw =>
        val noCr = if (raw.endsWith("\r")) raw.dropRight(1) else raw
        val hash = noCr.indexOf('#')
        val line = (if (hash >= 0) noCr.substring(0, hash) else noCr).trim
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (!collecting) { agents = Nil; collecting = true }
              agents ::= value
              applies = agents.contains("*")
            case "crawl-delay" =>
              collecting = false
              if (applies) delayMsOf(value).foreach(ms => best = math.max(best, ms))
            case _ => collecting = false
          }
        }
      }
      if (best >= 0) Some(HostDelay(r.host, best)) else None
    }
  }

  private val DelayPattern = "^(\\d{1,7})(?:\\.(\\d*))?$".r

  /** Decimal seconds → milliseconds, exact integer arithmetic, truncating
    * past the third fractional digit; None for anything else. */
  private[graft] def delayMsOf(value: String): Option[Long] = value match {
    case DelayPattern(ip, fp) =>
      val frac = Option(fp).getOrElse("").padTo(3, '0').take(3)
      Some(ip.toLong * 1000L + frac.toLong)
    case _ => None
  }

  /** Per-host politeness schedule (r17): the fetch-shaping step between
    * the gated frontier and the fetcher fleet. Each URL gets its
    * discovery-order rank within its host's queue, a fetch `wave`
    * (`(rank-1) div burst` — at most `burst` parallel fetches per host
    * per wave), and `scheduled_ms = wave × crawl-delay(host)` (the host's
    * [[parseDelays]] directive, `defaultDelayMs` otherwise).
    *
    * Scale shape: ONE window partitioned by host — a host's queue is
    * sequential by the politeness contract itself, so per-host ranking is
    * the semantics, not a bottleneck (hosts parallelize; no global
    * window) — and one join against the delay side, which is bounded by
    * the HOST count and explicitly broadcast. */
  def schedule(urls: DataFrame, delays: DataFrame, orderCol: String,
      burst: Int, defaultDelayMs: Long = 1000L): DataFrame = {
    require(burst >= 1, s"burst must be >= 1, got $burst")
    Seq("delay_ms", "wave", "scheduled_ms").foreach { c =>
      require(!urls.columns.contains(c),
        s"graft politeness schedule: input must not carry a column named '$c'")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy(col(orderCol))
    urls
      .join(broadcast(delays), Seq("host"), "left_outer")
      .withColumn("delay_ms", coalesce(col("delay_ms"), lit(defaultDelayMs)))
      .withColumn("wave",
        floor((row_number().over(w) - 1) / lit(burst)).cast("long"))
      .withColumn("scheduled_ms", col("wave") * col("delay_ms"))
  }

  /** One frontier URL with its host's delay resolved — [[scheduleStream]]'s
    * group-input row. */
  final case class UrlAt(host: String, ord: Long, delay_ms: Long)

  /** Per-host cumulative fetch count — [[scheduleStream]]'s keyed state. */
  final case class HostCount(n: Long)

  /** STREAMING face of [[schedule]] (r17): a continuously-discovered
    * frontier gets per-host fetch waves that CONTINUE across micro-batches
    * — the per-host queue position is keyed `flatMapGroupsWithState` state
    * (one Long per host ever seen), so batch boundaries never reset the
    * politeness clock. The delay side joins STREAM-STATIC before grouping
    * (stateless, any host count — nothing driver-resident), rows order by
    * `orderCol` within a batch's host group (the discovery order
    * [[schedule]] ranks by), and replay is exact by Structured Streaming's
    * own state versioning. Emits (host, ord, wave, scheduled_ms); callers
    * join back on (host, ord) for their payload columns. */
  def scheduleStream(urls: DataFrame, delays: DataFrame, orderCol: String,
      burst: Int, defaultDelayMs: Long = 1000L): DataFrame = {
    require(burst >= 1, s"burst must be >= 1, got $burst")
    val spark = urls.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    urls.select(col("host"), col(orderCol).cast("long").as("ord"))
      .join(delays, Seq("host"), "left_outer")
      .withColumn("delay_ms", coalesce(col("delay_ms"), lit(defaultDelayMs)))
      .select("host", "ord", "delay_ms").as[UrlAt]
      .groupByKey(_.host)
      .flatMapGroupsWithState[HostCount, (String, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (host, it, state) =>
          val rows = it.toArray.sortBy(_.ord)
          val start = if (state.exists) state.get.n else 0L
          state.update(HostCount(start + rows.length))
          rows.iterator.zipWithIndex.map { case (u, i) =>
            val wave = (start + i) / burst
            (host, u.ord, wave, wave * u.delay_ms)
          }
      }
      .toDF("host", "ord", "wave", "scheduled_ms")
  }

  /** URLs (any frame with `host` and `path` columns) → the same frame
    * plus a boolean `allowed`. One join on host, one bounded groupBy
    * (groups = URL × matching rules, bounded by a host's rule count).
    * Row-exact: each INPUT ROW gets its own flag (a per-row id is the
    * group key, so duplicate URL rows keep their multiplicity), and the
    * rule side's columns are referenced through the rules frame so caller
    * columns named `prefix`/`allow` can never collide. */
  def gate(urls: DataFrame, rules: DataFrame): DataFrame = {
    val rid = "_graft_gate_rid"
    val win = "_graft_gate_win"
    require(!urls.columns.contains(rid) && !urls.columns.contains(win),
      s"graft robots gate: input must not carry $rid/$win")
    require(!urls.columns.contains("allowed"),
      "graft robots gate: input must not carry a column named 'allowed' — " +
        "it would be silently replaced by the gate's own decision")
    val withId = urls.withColumn(rid, monotonically_increasing_id())
    val keyCols = urls.columns.map(withId(_)).toSeq
    withId
      .join(rules, withId("host") === rules("host") &&
        startswith(withId("path"), rules("prefix")), "left_outer")
      // REP winner: longest matching prefix, allow beats disallow at ties.
      // max over struct(len, allow) implements exactly that order; a URL
      // with no matching rule aggregates max(NULL) -> NULL -> allowed.
      .groupBy(withId(rid))
      // every non-key input column is constant within its rid group
      .agg(first(keyCols.head).as(urls.columns.head),
        keyCols.tail.zip(urls.columns.tail)
          .map { case (c, n) => first(c).as(n) } ++ Seq(
          max(when(rules("prefix").isNotNull,
            struct(length(rules("prefix")).as("l"), rules("allow").as("a"))))
            .as(win)): _*)
      .withColumn("allowed", coalesce(col(s"$win.a"), lit(true)))
      .drop(win, rid)
  }
}
