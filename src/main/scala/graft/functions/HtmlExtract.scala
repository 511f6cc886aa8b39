package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native HTML → text extraction (the trafilatura/jusText shape, r14):
  * one pass over the markup producing the visible text, segmented into
  * BLOCKS at block-level tag boundaries, each block gated by its LINK
  * DENSITY — the fraction of its non-whitespace characters that sit inside
  * `<a>` elements. Navigation bars, footers, and related-links chrome are
  * near-pure anchors (density → 1) while article prose is near-zero, so
  * the one local signal removes the dominant boilerplate class without any
  * corpus-global state. Surviving blocks join with `\n`.
  *
  * Semantics (exact, deterministic — the oracle constructs expected output
  * directly from the planted pieces):
  *   - `<head>…</head>` is skipped whole (title/meta are not content);
  *     `<script>`/`<style>` bodies are skipped raw (their text may contain
  *     `<`/`>` that are NOT markup); `<!-- … -->` comments are skipped;
  *   - a tag in the INLINE set (`a b i u em strong span code small sub sup
  *     abbr mark cite q s samp kbd var time wbr`) does not break the block;
  *     every other tag (open or close) finalizes the current block;
  *   - entities `&amp; &lt; &gt; &quot; &apos; &#39; &nbsp;` decode; an
  *     unmatched `&` stays literal;
  *   - block finalize: whitespace runs collapse to one space, trim; empty
  *     blocks drop; a block whose link density exceeds `maxLinkPct`/100
  *     drops (integer test: `linkChars*100 > totalChars*maxLinkPct`);
  *   - malformed markup degrades, never throws: `<` with no tag name is a
  *     literal char, an unterminated tag/comment/script runs to the end.
  *
  * Scale shape: per-row, shuffle-free, O(len) with no allocation beyond the
  * output — the WordChunks kernel discipline (static helper shared by eval
  * and the generated call, so the scan stays inside whole-stage codegen).
  */
case class HtmlExtract(child: Expression, maxLinkPct: Int = 50)
    extends UnaryExpression {
  require(maxLinkPct >= 0 && maxLinkPct <= 100, "maxLinkPct in [0,100]")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"html_extract requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    HtmlExtract.compute(input.asInstanceOf[UTF8String], maxLinkPct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = HtmlExtract.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c, $maxLinkPct);")
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlExtract =
    copy(child = newChild)

  override def prettyName: String = "html_extract"
}

object HtmlExtract {
  private val Inline: java.util.Set[String] = java.util.Set.of(
    "a", "b", "i", "u", "em", "strong", "span", "code", "small", "sub",
    "sup", "abbr", "mark", "cite", "q", "s", "samp", "kbd", "var", "time",
    "wbr")

  /** Case-insensitive indexOf of an ASCII-lowercase needle. */
  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length; val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        if (Character.toLowerCase(s.charAt(i + j)) != needle.charAt(j)) ok = false
        j += 1
      }
      if (ok) return i
      i += 1
    }
    -1
  }

  /** Static kernel shared by eval and generated code. */
  def compute(html: UTF8String, maxLinkPct: Int): UTF8String = {
    val s = html.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n / 2)
    val cur = new java.lang.StringBuilder(128)
    var linkN = 0L // non-whitespace chars inside <a> in the current block
    var totN = 0L  // non-whitespace chars in the current block
    var anchor = 0
    var wroteBlock = false

    def finalizeBlock(): Unit = {
      // collapse whitespace runs + trim in place of a regex pass
      var i = 0
      var pendingSpace = false
      var started = false
      val b = new java.lang.StringBuilder(cur.length)
      while (i < cur.length) {
        val c = cur.charAt(i)
        if (Character.isWhitespace(c)) { if (started) pendingSpace = true }
        else {
          if (pendingSpace) { b.append(' '); pendingSpace = false }
          b.append(c); started = true
        }
        i += 1
      }
      if (b.length > 0 && linkN * 100L <= totN * maxLinkPct.toLong) {
        if (wroteBlock) out.append('\n')
        out.append(b)
        wroteBlock = true
      }
      cur.setLength(0); linkN = 0L; totN = 0L; anchor = 0
    }

    def addChar(c: Char): Unit = {
      cur.append(c)
      if (!Character.isWhitespace(c)) {
        totN += 1L
        if (anchor > 0) linkN += 1L
      }
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          var j = i + 1
          val closing = j < n && s.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && (Character.isLetterOrDigit(s.charAt(j)))) j += 1
          if (j == nameStart) { addChar('<'); i += 1 } // literal '<'
          else {
            val name = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
            val gt = s.indexOf('>', j)
            val tagEnd = if (gt < 0) n else gt + 1
            if (!closing && (name == "script" || name == "style" || name == "head")) {
              // raw-content containers: skip to the matching close tag
              val close = indexOfIgnoreCase(s, "</" + name, tagEnd)
              if (close < 0) i = n
              else {
                val cgt = s.indexOf('>', close)
                i = if (cgt < 0) n else cgt + 1
              }
            } else if (Inline.contains(name)) {
              if (name == "a") {
                if (closing) anchor = math.max(anchor - 1, 0) else anchor += 1
              }
              i = tagEnd
            } else {
              finalizeBlock()
              i = tagEnd
            }
          }
        }
      } else if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val decoded: Int =
          if (semi < 0 || semi - i > 6) -1
          else s.substring(i + 1, semi) match {
            case "amp"          => '&'
            case "lt"           => '<'
            case "gt"           => '>'
            case "quot"         => '"'
            case "apos" | "#39" => '\''
            case "nbsp"         => ' '
            case _              => -1
          }
        if (decoded >= 0) { addChar(decoded.toChar); i = semi + 1 }
        else { addChar('&'); i += 1 }
      } else {
        addChar(c)
        i += 1
      }
    }
    finalizeBlock()
    UTF8String.fromString(out.toString)
  }

  /** Column API (default threshold lives on [[graft.ops.Clean.extractHtml]]). */
  def apply(html: Column, maxLinkPct: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      HtmlExtract(org.apache.spark.sql.GraftColumnBridge.expression(html), maxLinkPct))
}
