package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native outlink extraction (r14): every `<a href>` value in document
  * order — the step that turns a fetched crawl into a LINK GRAPH (the
  * frontier's next-hop source and PageRank's edge list). One forward pass
  * per row, shuffle-free, codegen'd; the companion to [[HtmlExtract]]
  * (which keeps anchor TEXT and drops the URLs — this keeps the URLs).
  *
  * Semantics (exact, deterministic — oracles construct expected output):
  *   - `<script>`/`<style>` bodies are skipped raw (an `<a href>` inside
  *     generated JS is not a document link); `<!-- … -->` comments skip;
  *   - tag names are case-insensitive (`<A HREF=…>` extracts); the first
  *     NON-EMPTY `href` attribute of a tag counts, later ones are ignored;
  *   - attribute values quote with `"` or `'` (a quoted value may contain
  *     `>`), or run unquoted to whitespace/`>`; an empty or missing href
  *     adds nothing;
  *   - duplicates are KEPT in document order (multiplicity is real signal:
  *     the caller decides distinct-vs-weighted edges);
  *   - malformed markup degrades, never throws: `<` with no tag name is a
  *     literal, an unterminated tag/comment/script runs to the end.
  */
case class HtmlLinks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"html_links requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    HtmlLinks.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = HtmlLinks.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlLinks =
    copy(child = newChild)

  override def prettyName: String = "html_links"
}

object HtmlLinks {

  def apply(html: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      HtmlLinks(org.apache.spark.sql.GraftColumnBridge.expression(html)))

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
  @inline private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '_' || c == ':'
  @inline private def lower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** index just past the case-insensitive needle, or n if absent. */
  private def skipPast(s: String, from: Int, needle: String): Int = {
    val n = s.length
    var i = from
    while (i + needle.length <= n) {
      var j = 0
      while (j < needle.length && lower(s.charAt(i + j)) == needle.charAt(j)) j += 1
      if (j == needle.length) return i + needle.length
      i += 1
    }
    n
  }

  /** Static kernel shared by eval and the generated call. */
  def compute(html: UTF8String): GenericArrayData = {
    val s = html.toString
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      if (s.charAt(i) != '<') { i += 1 }
      else if (s.startsWith("<!--", i)) i = skipPast(s, i + 4, "-->")
      else {
        // read the tag name (empty for </close>, <!doctype>, stray '<')
        var j = i + 1
        if (j < n && (s.charAt(j) == '/' || s.charAt(j) == '!')) j += 1
        val nameStart = j
        while (j < n && isNameChar(s.charAt(j))) j += 1
        if (j == nameStart) { i += 1 } // '<' followed by nothing tag-like: literal
        else {
          val name = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
          val isClose = s.charAt(i + 1) == '/'
          if (!isClose && name == "script") i = skipPast(s, j, "</script")
          else if (!isClose && name == "style") i = skipPast(s, j, "</style")
          else {
            // walk attributes honoring quoted values (a quoted '>' does
            // not close the tag); harvest the first href of an <a>
            var href: String = null
            var k = j
            var done = false
            while (k < n && !done) {
              val c = s.charAt(k)
              if (c == '>') { done = true; k += 1 }
              else if (isWs(c) || c == '/') k += 1
              else if (isNameChar(c)) {
                val aStart = k
                while (k < n && isNameChar(s.charAt(k))) k += 1
                val attr = s.substring(aStart, k).toLowerCase(java.util.Locale.ROOT)
                while (k < n && isWs(s.charAt(k))) k += 1
                var value: String = null
                if (k < n && s.charAt(k) == '=') {
                  k += 1
                  while (k < n && isWs(s.charAt(k))) k += 1
                  if (k < n && (s.charAt(k) == '"' || s.charAt(k) == '\'')) {
                    val q = s.charAt(k); k += 1
                    val vStart = k
                    while (k < n && s.charAt(k) != q) k += 1
                    value = s.substring(vStart, k)
                    if (k < n) k += 1 // past the closing quote
                  } else {
                    val vStart = k
                    while (k < n && !isWs(s.charAt(k)) && s.charAt(k) != '>') k += 1
                    value = s.substring(vStart, k)
                  }
                }
                if (attr == "href" && href == null && value != null && value.nonEmpty)
                  href = value
              } else k += 1 // stray char inside the tag: step over it
            }
            // emit only from a CLOSED <a> tag: an unterminated tag at a
            // truncated document tail would carry a truncated URL
            if (done && !isClose && name == "a" && href != null)
              out += UTF8String.fromString(href)
            i = k
          }
        }
      }
    }
    new GenericArrayData(out.toArray)
  }
}
