package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode SCRIPT mix (r14) — the corpus-routing signal language-ID alone
  * cannot give: a multilingual crawl is split by writing system before any
  * per-language model runs (Latin-script text goes to the fastText-shape
  * classifier, CJK to a segmenter, mixed-script spam to the reject pile).
  * One pass per row counting codepoints by `Character.UnicodeScript`,
  * folded into four buckets: LATIN, CYRILLIC, CJK (Han + Hiragana +
  * Katakana + Hangul + Bopomofo), and OTHER (everything else, including
  * COMMON — spaces, digits, punctuation). Surrogate pairs decode to one
  * codepoint (astral-plane CJK counts once, never twice).
  *
  * Scale shape: per-row, shuffle-free, codegen'd (static kernel, the
  * WordChunks discipline); output is a 4-long struct, so the downstream
  * gate is plain column arithmetic.
  */
case class ScriptCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ScriptCounts.Out

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"script_counts requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    ScriptCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ScriptCounts.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ScriptCounts =
    copy(child = newChild)

  override def prettyName: String = "script_counts"
}

object ScriptCounts {

  val Out: StructType = StructType(Seq(
    StructField("latin", LongType, nullable = false),
    StructField("cyrillic", LongType, nullable = false),
    StructField("cjk", LongType, nullable = false),
    StructField("other", LongType, nullable = false)))

  def apply(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ScriptCounts(org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** THE CJK class — the single routing definition every script-routed
    * kernel shares ([[ScriptCounts]]'s `cjk` bucket, [[TokenCount]]'s
    * char-per-token segmentation): Han + Hiragana + Katakana + Hangul +
    * Bopomofo by `Character.UnicodeScript`, with an ASCII short-circuit. */
  def isCjk(cp: Int): Boolean =
    cp >= 0x80 && (Character.UnicodeScript.of(cp) match {
      case Character.UnicodeScript.HAN | Character.UnicodeScript.HIRAGANA |
           Character.UnicodeScript.KATAKANA | Character.UnicodeScript.HANGUL |
           Character.UnicodeScript.BOPOMOFO => true
      case _ => false
    })

  /** Static kernel shared by eval and the generated call. */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    var latin = 0L
    var cyr = 0L
    var cjk = 0L
    var other = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      // ASCII fast path: letters are Latin, the rest Common -> other
      if (cp < 0x80) {
        if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) latin += 1
        else other += 1
      } else if (isCjk(cp)) cjk += 1
      else Character.UnicodeScript.of(cp) match {
        case Character.UnicodeScript.LATIN => latin += 1
        case Character.UnicodeScript.CYRILLIC => cyr += 1
        case _ => other += 1
      }
      i += Character.charCount(cp)
    }
    InternalRow(latin, cyr, cjk, other)
  }
}
