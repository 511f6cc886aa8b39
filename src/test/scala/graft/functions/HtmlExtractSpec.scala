package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level pins for the HTML extractor — every rule the planted oracle
  * (t_html_extract) relies on, exercised directly, plus the malformed-input
  * degradation contract the oracle can't plant. */
class HtmlExtractSpec extends AnyFunSuite {
  private def x(html: String, maxPct: Int = 50): String =
    HtmlExtract.compute(UTF8String.fromString(html), maxPct).toString

  test("tags strip, blocks split at block tags, inline tags don't split") {
    assert(x("<p>hello world</p><div>second block</div>") ==
      "hello world\nsecond block")
    assert(x("<p>one <b>bold</b> and <em>em</em> word</p>") ==
      "one bold and em word")
  }

  test("script/style/head bodies are skipped raw (markup-ish content inside)") {
    assert(x("<head><title>nope</title><meta x=\"1\"></head><p>yes</p>") == "yes")
    assert(x("<script>if(a<b){x=1;}</script><p>kept</p>") == "kept")
    assert(x("<style>p{margin:0;}</style><p>kept</p>") == "kept")
    // case-insensitive close, attribute on the open tag
    assert(x("<SCRIPT type=\"text/javascript\">var a = '<p>';</SCRIPT><p>ok</p>") == "ok")
  }

  test("comments skip; unterminated comment/script/tag run to end, never throw") {
    assert(x("<p>a</p><!-- <p>ghost</p> --><p>b</p>") == "a\nb")
    assert(x("<p>a</p><!-- never closed <p>ghost") == "a")
    assert(x("<script>never closed <p>ghost") == "")
    assert(x("<p>a</p><div unterminated") == "a")
  }

  test("entities decode; unmatched ampersand stays literal") {
    assert(x("<p>a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos; &#39;f&#39;</p>") ==
      "a & b <c> \"d\" 'e' 'f'")
    assert(x("<p>fish & chips &unknown; &toolongentity; x</p>") ==
      "fish & chips &unknown; &toolongentity; x")
    assert(x("<p>a&nbsp;b</p>") == "a b")
  }

  test("literal '<' with no tag name is text") {
    assert(x("<p>1 < 2 and 2 <= 3</p>") == "1 < 2 and 2 <= 3")
  }

  test("whitespace collapses per block; empty blocks drop") {
    assert(x("<p>  a \t b\n\nc  </p><div>   </div><p>d</p>") == "a b c\nd")
  }

  test("link-density gate: pure-anchor blocks drop, text-dominant keep, exact boundary kept") {
    assert(x("<div><a href=\"/\">Home</a> <a href=\"/b\">About</a></div><p>body</p>") ==
      "body")
    // 4 linked + 4 plain non-space chars = exactly 50% -> kept (<=)
    assert(x("<div><a href=\"/\">read</a> text</div>") == "read text")
    // 5 linked vs 4 plain -> 55% > 50% -> dropped
    assert(x("<div><a href=\"/\">reads</a> text</div>") == "")
    // threshold is a parameter
    assert(x("<div><a href=\"/\">read</a> text</div>", maxPct = 40) == "")
    // anchors reset at block boundaries (close never leaks density across)
    assert(x("<div><a href=\"/\">all link</a></div><p>plain prose here</p>") ==
      "plain prose here")
  }

  test("parity with the planted-oracle construction (t_html_extract shape)") {
    val words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi").split(" ")
    val h1 = words.take(3).mkString(" ")
    val bodyA = words.slice(3, 20).mkString(" ")
    val bodyB = words.drop(20).mkString(" ") // "phi chi psi" -> 9 nonspace chars
    val html = "<html><head><title>site name</title><meta charset=\"utf-8\">" +
      "</head><body><script>if(a<b){x=1;}</script><style>p{margin:0;}" +
      "</style><div class=\"nav\"><a href=\"/\">Home</a> " +
      "<a href=\"/about\">About</a> <a href=\"/contact\">Contact</a>" +
      "</div><h1>" + h1 + "</h1><!-- chrome & nav markers --><p>" + bodyA +
      " &amp; more</p><div><a href=\"/read\">read</a> " + bodyB +
      "</div><footer><a href=\"/terms\">Terms</a> " +
      "<a href=\"/privacy\">Privacy</a></footer></body></html>"
    assert(x(html) == s"$h1\n$bodyA & more\nread $bodyB")
  }

  test("expression integrates in a plan (codegen path) and handles null") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val got = Seq("<p>a &amp; b</p>", null)
      .toDF("h")
      .select(graft.ops.Clean.extractHtml(org.apache.spark.sql.functions.col("h"))
        .as("t"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("a & b"), None))
  }
}
