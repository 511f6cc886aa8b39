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
