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
}
