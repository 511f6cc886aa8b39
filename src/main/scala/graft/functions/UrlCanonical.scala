package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native URL canonicalization (r14) — the crawl frontier's dedup key.
  * A crawl sees the same page under many spellings (case-shifted hosts,
  * default ports, tracking params, shuffled query order, fragments); URL
  * dedup has to run BEFORE fetch and BEFORE content dedup, so the
  * canonical form must be a cheap, deterministic, per-row pure function —
  * this kernel is one forward pass, shuffle-free, codegen'd.
  *
  * Semantics (exact, deterministic — oracles construct expected output):
  *   - scheme (before `://`) lowercases; no `://` → the input is returned
  *     verbatim (malformed degrades, never throws — a crawl wants the
  *     oddball URL surfaced downstream, not an exception in the scan);
  *   - authority (up to the first `/`, `?` or `#`): the host[:port] part
  *     after the last `@` lowercases (userinfo is case-significant and
  *     kept verbatim); the default port strips (`:80` under http, `:443`
  *     under https); non-default ports stay;
  *   - empty path → `/` (so `https://a.com` and `https://a.com/` unify);
  *     otherwise the path is kept VERBATIM — case and escapes are
  *     server-significant there;
  *   - query: params split on `&`, empty params drop, tracking params
  *     drop (key lowercased startsWith `utm_`, or is one of
  *     `fbclid gclid msclkid yclid mc_eid`), survivors SORT
  *     lexicographically by the full `k=v` text (Java String order —
  *     order-insensitive key), rejoin with `&`;
  *     nothing left → the `?` drops too;
  *   - the `#fragment` drops (client-side only, never reaches the server).
  */
case class UrlCanonical(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"url_canonical requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    UrlCanonical.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = UrlCanonical.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): UrlCanonical =
    copy(child = newChild)

  override def prettyName: String = "url_canonical"
}

object UrlCanonical {

  def apply(url: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      UrlCanonical(org.apache.spark.sql.GraftColumnBridge.expression(url)))

  private val TrackingKeys =
    Set("fbclid", "gclid", "msclkid", "yclid", "mc_eid")

  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val key = (if (eq >= 0) param.substring(0, eq) else param)
      .toLowerCase(java.util.Locale.ROOT)
    key.startsWith("utm_") || TrackingKeys.contains(key)
  }

  /** Static kernel shared by eval and the generated call. */
  def compute(url: UTF8String): UTF8String = {
    val s = url.toString
    val schemeEnd = s.indexOf("://")
    if (schemeEnd <= 0) return url // malformed: pass through verbatim

    val scheme = s.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)
    val rest = s.substring(schemeEnd + 3)

    // authority runs to the first of / ? #
    var authEnd = rest.length
    var i = 0
    while (i < authEnd) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == '#') authEnd = i else i += 1
    }
    val authority = rest.substring(0, authEnd)
    val at = authority.lastIndexOf('@')
    val userinfo = if (at >= 0) authority.substring(0, at + 1) else ""
    var hostPort = authority.substring(at + 1).toLowerCase(java.util.Locale.ROOT)
    if (scheme == "http" && hostPort.endsWith(":80"))
      hostPort = hostPort.substring(0, hostPort.length - 3)
    else if (scheme == "https" && hostPort.endsWith(":443"))
      hostPort = hostPort.substring(0, hostPort.length - 4)

    // path runs from authEnd to the first of ? #
    val afterAuth = rest.substring(authEnd)
    val qIdx = afterAuth.indexOf('?')
    val hIdx = afterAuth.indexOf('#')
    val pathEnd =
      if (qIdx < 0 && hIdx < 0) afterAuth.length
      else if (qIdx < 0) hIdx
      else if (hIdx < 0) qIdx
      else math.min(qIdx, hIdx)
    val path0 = afterAuth.substring(0, pathEnd)
    val path = if (path0.isEmpty) "/" else path0

    // query runs from ? to # (absent if # comes first)
    val query =
      if (qIdx < 0 || (hIdx >= 0 && hIdx < qIdx)) ""
      else {
        val rawEnd = if (hIdx > qIdx) hIdx else afterAuth.length
        afterAuth.substring(qIdx + 1, rawEnd)
      }
    val kept = query.split("&", -1).filter(p => p.nonEmpty && !isTracking(p))
    java.util.Arrays.sort(kept.asInstanceOf[Array[Object]])
    val queryPart = if (kept.isEmpty) "" else "?" + kept.mkString("&")

    UTF8String.fromString(
      scheme + "://" + userinfo + hostPort + path + queryPart)
  }
}
