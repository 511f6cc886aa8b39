package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class UrlCanonicalSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def canon(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("u").select(UrlCanonical(col("u")).as("c"))
      .as[String].collect().head
  }

  test("scheme and host lowercase; path case preserved") {
    assert(canon("HTTPS://WWW.Example.ORG/Some/Path") ==
      "https://www.example.org/Some/Path")
  }

  test("default ports strip; non-default ports stay") {
    assert(canon("http://a.com:80/x") == "http://a.com/x")
    assert(canon("https://a.com:443/x") == "https://a.com/x")
    assert(canon("https://a.com:8443/x") == "https://a.com:8443/x")
    // :80 is only default under http, :443 only under https
    assert(canon("https://a.com:80/x") == "https://a.com:80/x")
    assert(canon("http://a.com:443/x") == "http://a.com:443/x")
  }

  test("empty path becomes /") {
    assert(canon("https://a.com") == "https://a.com/")
    assert(canon("https://a.com?b=1") == "https://a.com/?b=1")
    assert(canon("https://a.com#frag") == "https://a.com/")
  }

  test("userinfo kept verbatim, host after it lowercases") {
    assert(canon("https://User:PW@Host.COM/x") == "https://User:PW@host.com/x")
  }

  test("fragment drops") {
    assert(canon("https://a.com/x#section-2") == "https://a.com/x")
    assert(canon("https://a.com/x?a=1#f") == "https://a.com/x?a=1")
  }

  test("tracking params drop; survivors sort; empty query drops the ?") {
    assert(canon("https://a.com/x?utm_source=s&z=2&UTM_Medium=m&a=1") ==
      "https://a.com/x?a=1&z=2")
    assert(canon("https://a.com/x?gclid=g&fbclid=f&msclkid=m&yclid=y&mc_eid=e") ==
      "https://a.com/x")
    // a bare key with no '=' still matches the tracking set
    assert(canon("https://a.com/x?fbclid&a=1") == "https://a.com/x?a=1")
    // empty params (&&) drop; duplicates keep (they are server-significant)
    assert(canon("https://a.com/x?b=2&&a=1&a=1") == "https://a.com/x?a=1&a=1&b=2")
  }

  test("query sorts by full param text (key then value)") {
    assert(canon("https://a.com/x?k=2&k=10&j=9") == "https://a.com/x?j=9&k=10&k=2")
  }

  test("fragment before query-mark: everything after # is fragment") {
    assert(canon("https://a.com/x#f?notquery=1") == "https://a.com/x")
  }

  test("malformed URLs pass through verbatim") {
    assert(canon("not a url") == "not a url")
    assert(canon("mailto:a@b.com") == "mailto:a@b.com")
    assert(canon("://nohost") == "://nohost")
  }

  test("null stays null") {
    import spark.implicits._
    val out = Seq[(Integer, String)]((1, null)).toDF("i", "u")
      .select(UrlCanonical(col("u")).as("c")).collect().head
    assert(out.isNullAt(0))
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val urls = Seq(
      "HTTP://U@A.COM:80/P?utm_source=1&b=2&a=3#x",
      "https://a.com", "junk", "https://a.com:9090/?z=1&y=2")
    val df = urls.toDF("u")
    def run(mode: String): Seq[String] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(UrlCanonical(col("u")).as("c")).as[String].collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") == run("NO_CODEGEN"))
  }
}
