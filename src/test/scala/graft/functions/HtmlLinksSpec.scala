package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class HtmlLinksSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def links(html: String): Seq[String] = {
    val arr = HtmlLinks.compute(UTF8String.fromString(html))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("hrefs extract in document order; duplicates kept") {
    val html = """<div><a href="/one">1</a><p><a href="/two">2</a></p>
                 |<a href="/one">again</a></div>""".stripMargin
    assert(links(html) == Seq("/one", "/two", "/one"))
  }

  test("case-insensitive tags and attributes; single quotes and unquoted values") {
    assert(links("""<A HREF="/up">x</A>""") == Seq("/up"))
    assert(links("<a href='/sq'>x</a>") == Seq("/sq"))
    assert(links("<a href=/uq>x</a>") == Seq("/uq"))
    assert(links("<a href=/uq class=z>x</a>") == Seq("/uq"))
  }

  test("script, style, and comment bodies contribute nothing") {
    val html = """<script>var s = '<a href="/fake1">';</script>
                 |<style>a[href="/fake2"] { color: red }</style>
                 |<!-- <a href="/fake3"> --><a href="/real">r</a>""".stripMargin
    assert(links(html) == Seq("/real"))
  }

  test("quoted '>' inside an attribute does not close the tag") {
    assert(links("""<a title="a > b" href="/t">x</a>""") == Seq("/t"))
    assert(links("""<img alt="x > y"><a href="/after">x</a>""") == Seq("/after"))
  }

  test("first non-empty href wins; empty or missing href adds nothing") {
    assert(links("""<a href="/first" href="/second">x</a>""") == Seq("/first"))
    assert(links("""<a href="" href="/fallback">x</a>""") == Seq("/fallback"))
    assert(links("""<a name="anchor">x</a>""") == Seq.empty)
    assert(links("""<a href="">x</a>""") == Seq.empty)
  }

  test("non-anchor hrefs are ignored; close tags never extract") {
    assert(links("""<link href="/css"><area href="/map"><base href="/b">""") ==
      Seq.empty)
    assert(links("""</a href="/ghost">""") == Seq.empty)
  }

  test("malformed markup degrades, never throws") {
    assert(links("a < b and c > d") == Seq.empty)
    assert(links("<a href=\"/unterminated") == Seq.empty)
    assert(links("<script>never closed <a href='/x'>") == Seq.empty)
    assert(links("<a href='/ok'>fine</a><!-- unterminated") == Seq("/ok"))
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq(
      """<a href="/x">1</a><A HREF=/y>2</A>""",
      "<script><a href='/no'></script>",
      "plain text", "").toDF("h")
    def run(mode: String): Seq[Seq[String]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(HtmlLinks(col("h")).as("l")).as[Seq[String]].collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") == run("NO_CODEGEN"))
  }
}
