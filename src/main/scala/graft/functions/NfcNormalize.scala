package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (r14) — the text pipeline's step zero.
  * Web text arrives with the same grapheme spelled many ways (`é` as one
  * codepoint or as `e` + combining acute); every downstream equality —
  * exact dedup, shingles, fingerprints, BPE merges — silently fragments
  * unless composition is canonicalized first. NFC (canonical composition)
  * is the conservative form: it never changes what the text MEANS
  * (unlike NFKC's compatibility folding, which rewrites ligatures and
  * width variants), so it is safe as a default ingestion step.
  *
  * Scale shape: the kernel's fast path is an ASCII scan — a byte-level
  * `< 0x80` sweep that returns the INPUT UTF8String untouched (zero copy,
  * zero decode). ASCII is NFC-invariant by construction, and the
  * overwhelming share of a web corpus's bytes are ASCII, so the expensive
  * `java.text.Normalizer` call (decode to UTF-16, normalize, re-encode)
  * runs only on rows that can possibly change. Per-row, shuffle-free,
  * stays inside whole-stage codegen (static helper, the WordChunks
  * discipline).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  def apply(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NfcNormalize(org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** Static kernel shared by eval and the generated call. */
  def compute(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    var i = 0
    val n = bytes.length
    while (i < n && bytes(i) >= 0) i += 1 // signed byte >= 0 <=> < 0x80
    if (i == n) return text // pure ASCII: NFC-invariant, zero copy
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
