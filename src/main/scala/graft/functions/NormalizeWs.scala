package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace-normalized lowercase text — the exact semantics of
  * `lower(regexp_replace(text, "\s+", " "))` (the fingerprint normalizer)
  * without the per-row java.util.regex machinery: every maximal run of
  * Java-`\s` characters (tab, LF, VT, FF, CR, space — ASCII-only, exactly
  * the default `\s` class) becomes one space, then the same
  * UTF8String.toLowerCase `lower()` calls. Byte-level scan is UTF-8-safe:
  * continuation bytes are ≥ 0x80 and never match the ASCII whitespace set.
  * NormalizeWsSpec pins byte-identity against the regex chain, including
  * multibyte and leading/trailing-run inputs.
  */
case class NormalizeWs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"normalize_ws requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NormalizeWs.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = NormalizeWs.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeWs =
    copy(child = newChild)

  override def prettyName: String = "normalize_ws"
}

object NormalizeWs {
  @inline private def isWs(b: Byte): Boolean = b == 32 || (b >= 9 && b <= 13)

  /** Static kernel shared by eval and generated code. */
  def compute(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    val n = bytes.length
    val out = new Array[Byte](n)
    var i = 0
    var j = 0
    while (i < n) {
      if (isWs(bytes(i))) {
        out(j) = 32
        j += 1
        while (i < n && isWs(bytes(i))) i += 1
      } else {
        out(j) = bytes(i)
        j += 1
        i += 1
      }
    }
    UTF8String.fromBytes(out, 0, j).toLowerCase
  }

  /** Column API. */
  def apply(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NormalizeWs(org.apache.spark.sql.GraftColumnBridge.expression(text)))
}
