package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class RobotsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def parse(host: String, body: String): Set[(Boolean, String)] = {
    import spark.implicits._
    Robots.parse(spark, Seq(Robots.RobotsTxt(host, body)).toDS())
      .collect().map(r => (r.allow, r.prefix)).toSet
  }

  test("star group parses; comments, CRLF, case-folded keys") {
    val rules = parse("a.com",
      "# policy\r\nUser-Agent: *\r\nDisallow: /private # inline comment\r\n" +
        "ALLOW: /private/ok\r\ndisallow: /tmp\r\n")
    assert(rules == Set((false, "/private"), (true, "/private/ok"), (false, "/tmp")))
  }

  test("non-star groups are ignored; multi-agent headers accumulate") {
    val rules = parse("a.com",
      "User-agent: evilbot\nDisallow: /\n\n" +
        "User-agent: googlebot\nUser-agent: *\nDisallow: /x\n\n" +
        "User-agent: otherbot\nDisallow: /y\n")
    assert(rules == Set((false, "/x")))
  }

  test("empty Disallow adds nothing; unknown keys close the agent header") {
    assert(parse("a.com", "User-agent: *\nDisallow:\n").isEmpty)
    // crawl-delay between agent lines and rules: group still applies, but a
    // LATER user-agent line after it starts a NEW group (header was closed)
    val rules = parse("a.com",
      "User-agent: *\nCrawl-delay: 10\nDisallow: /a\n" +
        "User-agent: bot\nDisallow: /b\n")
    assert(rules == Set((false, "/a")))
  }

  test("no-robots host allows everything; longest prefix wins; allow beats disallow at ties") {
    import spark.implicits._
    val rules = Robots.parse(spark, Seq(
      Robots.RobotsTxt("a.com",
        "User-agent: *\nDisallow: /p\nAllow: /p/ok\nDisallow: /p/ok\nAllow: /q\n")
    ).toDS()).toDF()
    val urls = Seq(
      (1L, "a.com", "/p/x"),      // matches /p only -> disallowed
      (2L, "a.com", "/p/ok/x"),   // /p/ok allow and /p/ok disallow tie -> allow
      (3L, "a.com", "/q/x"),      // allow rule
      (4L, "a.com", "/other"),    // no match -> allowed
      (5L, "b.com", "/p/x")       // no robots for host -> allowed
    ).toDF("doc_id", "host", "path")
    val out = Robots.gate(urls, rules)
      .select("doc_id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true, 5L -> true))
  }

  test("gate is row-exact: duplicate input rows keep their multiplicity") {
    import spark.implicits._
    val rules = Robots.parse(spark,
      Seq(Robots.RobotsTxt("a.com", "User-agent: *\nDisallow: /p\n")).toDS()).toDF()
    val urls = Seq((1L, "a.com", "/p/x"), (1L, "a.com", "/p/x"),
      (2L, "a.com", "/q")).toDF("doc_id", "host", "path")
    val out = Robots.gate(urls, rules)
    assert(out.count() == 3, "duplicates must not collapse")
    assert(out.where(col("allowed")).count() == 1)
  }

  test("caller columns named prefix/allow survive the gate untouched") {
    import spark.implicits._
    val rules = Robots.parse(spark,
      Seq(Robots.RobotsTxt("a.com", "User-agent: *\nDisallow: /p\n")).toDS()).toDF()
    val urls = Seq((1L, "a.com", "/p/x", "keep-me", true))
      .toDF("doc_id", "host", "path", "prefix", "allow")
    val out = Robots.gate(urls, rules)
    assert(out.columns.toSeq ==
      Seq("doc_id", "host", "path", "prefix", "allow", "allowed"))
    val r = out.collect().head
    assert(r.getString(3) == "keep-me" && r.getBoolean(4) &&
      !r.getBoolean(5), "caller columns intact, decision from the rules")
  }

  test("gate preserves row count and input columns") {
    import spark.implicits._
    val rules = Robots.parse(spark,
      Seq(Robots.RobotsTxt("a.com", "User-agent: *\nDisallow: /\n")).toDS()).toDF()
    val urls = (1L to 20L).map(i => (i, "a.com", s"/p$i", s"extra$i"))
      .toDF("doc_id", "host", "path", "payload")
    val out = Robots.gate(urls, rules)
    assert(out.count() == 20)
    assert(out.columns.toSeq == Seq("doc_id", "host", "path", "payload", "allowed"))
    assert(out.where(col("allowed")).count() == 0)
  }

  private def delays(host: String, body: String): Option[Long] = {
    import spark.implicits._
    Robots.parseDelays(spark, Seq(Robots.RobotsTxt(host, body)).toDS())
      .collect().headOption.map(_.delay_ms)
  }

  test("crawl-delay: decimal seconds to exact ms, truncating past ms precision") {
    assert(Robots.delayMsOf("2") == Some(2000L))
    assert(Robots.delayMsOf("0.5") == Some(500L))
    assert(Robots.delayMsOf("1.2345") == Some(1234L))
    assert(Robots.delayMsOf("1.") == Some(1000L))
    assert(Robots.delayMsOf("soon").isEmpty)
    assert(Robots.delayMsOf("-1").isEmpty)
    assert(Robots.delayMsOf("").isEmpty)
  }

  test("crawl-delay: star groups only, max across groups, comments/CRLF, unparsable ignored") {
    assert(delays("a.com",
      "User-agent: *\r\nCrawl-delay: 2 # be nice\r\n") == Some(2000L))
    // two applicable groups -> the conservative maximum
    assert(delays("a.com",
      "User-agent: *\nCrawl-delay: 1\n\n" +
        "User-agent: x\nUser-agent: *\nCrawl-delay: 3.25\n") == Some(3250L))
    // agent-specific directive is not ours
    assert(delays("a.com", "User-agent: specialbot\nCrawl-delay: 9\n").isEmpty)
    // unparsable value contributes nothing
    assert(delays("a.com", "User-agent: *\nCrawl-delay: soon\n").isEmpty)
    // crawl-delay closes the agent header exactly like a rule line: the
    // second user-agent starts a NEW group that does not include *
    assert(delays("a.com",
      "User-agent: *\nCrawl-delay: 1\nUser-agent: y\nCrawl-delay: 7\n")
      == Some(1000L))
  }

  test("schedule: per-host waves, delay join, default for directive-less hosts") {
    import spark.implicits._
    val urls = ((1L to 9L).map(i => (i, "a.com")) ++ Seq((10L, "b.com")))
      .toDF("doc_id", "host")
    val d = Seq(Robots.HostDelay("a.com", 2000L)).toDS().toDF()
    val out = Robots.schedule(urls, d, orderCol = "doc_id", burst = 4)
      .select("doc_id", "wave", "scheduled_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // a.com: ranks 1..9 -> waves 0,0,0,0,1,1,1,1,2 at 2000 ms each
    assert(out.take(9).map(_._2).toSeq == Seq(0L, 0L, 0L, 0L, 1L, 1L, 1L, 1L, 2L))
    assert(out.take(9).map(_._3).toSeq == Seq(0L, 0L, 0L, 0L, 2000L, 2000L, 2000L, 2000L, 4000L))
    // b.com has no directive: default 1000 ms, single URL -> wave 0
    assert(out.last == (10L, 0L, 0L))
    // name-collision guard
    val bad = urls.withColumn("wave", lit(1))
    intercept[IllegalArgumentException] {
      Robots.schedule(bad, d, orderCol = "doc_id", burst = 4)
    }
  }
}
