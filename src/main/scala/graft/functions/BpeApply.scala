package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE application: encodes a whole document against a fixed,
  * step-ordered merge table and returns the space-joined subword string.
  * Exact semantics of the HOF fold it replaces ([[graft.ops.Text.bpeEncodeHof]],
  * parity-pinned by TextSpec): words are `lower(trim(text))` split on `\s+`
  * (empties dropped), each word starts as its code-point sequence, and each
  * merge `(l, r)` rewrites the token list left-to-right non-overlapping — a
  * merged token never serves as the LEFT side of another match in the same
  * pass, exactly what the trainer's `replace` on the `||t1||t2||` string
  * form does (and what the DuckDB oracle replays).
  *
  * Why native: the HOF chain (`transform` over words, `aggregate` over
  * merges, per-char `substring`) is interpreted — HigherOrderFunctions sit
  * outside whole-stage codegen — and re-folds every OCCURRENCE of a word
  * (measured 5.0 s at sf0.1). This kernel is codegen'd and memoizes
  * per-word encodings in a per-task cache (vocabulary-bounded, capped at
  * 2^16 entries — an adversarial unbounded vocabulary degrades to cache
  * misses, never to memory growth), the same trick real tokenizers ship.
  * Same medicine WordChunks/NormalizeWs got.
  *
  * Tokens must not contain `|` (the trainer's documented contract — parity
  * with the string-form `replace` semantics, not a kernel limitation).
  */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_apply requires string, got $other")
    }

  @transient private lazy val mergeArr: Array[Array[String]] =
    merges.map { case (l, r) => Array(l, r) }.toArray

  // per-task (expression instances deserialize per task); ConcurrentHashMap
  // only for safety under plan reuse, not for cross-task sharing
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Instance kernel: codegen references `this` so eval and generated code
    * share the merge table and the memo cache. */
  def encodeDoc(text: UTF8String): UTF8String =
    UTF8String.fromString(BpeApply.encode(text.toString, mergeArr, cache))

  override def nullSafeEval(input: Any): Any =
    encodeDoc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApply", this, classOf[BpeApply].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encodeDoc($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)

  override def prettyName: String = "bpe_apply"
}

object BpeApply {
  private final val CacheCap = 1 << 16

  /** Whole-document encode on java Strings (the corpus is UTF-8 text; word
    * iteration is by CODE POINT to match `substring`'s indexing). */
  def encode(text: String, merges: Array[Array[String]],
      cache: java.util.concurrent.ConcurrentHashMap[String, String]): String = {
    // no java .trim here: String.trim strips ALL chars <= U+0020 (controls
    // included) while the pinned HOF reference's SQL trim() strips spaces
    // only — split("\\s+") + the nonEmpty filter below discard edge empties
    // identically, keeping byte-parity on control-char inputs
    val words = text.toLowerCase.split("\\s+")
    val sb = new java.lang.StringBuilder(text.length * 2)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        var enc = cache.get(w)
        if (enc == null) {
          enc = encodeWord(w, merges)
          if (cache.size < CacheCap) cache.put(w, enc)
        }
        if (sb.length > 0) sb.append(' ')
        sb.append(enc)
      }
      i += 1
    }
    sb.toString
  }

  /** One word: code-point tokens, then each merge left-to-right
    * non-overlapping (a merged token is never the LEFT of a later match in
    * the same pass — String.replace semantics on the `||`-separated form). */
  private def encodeWord(w: String, merges: Array[Array[String]]): String = {
    var toks = new Array[String](w.codePointCount(0, w.length))
    var off = 0
    var n = 0
    while (off < w.length) {
      val next = w.offsetByCodePoints(off, 1)
      toks(n) = w.substring(off, next)
      n += 1
      off = next
    }
    var m = 0
    while (m < merges.length && n > 1) {
      val l = merges(m)(0)
      val r = merges(m)(1)
      val out = new Array[String](n)
      var i = 0
      var k = 0
      while (i < n) {
        if (i + 1 < n && toks(i) == l && toks(i + 1) == r) {
          out(k) = l + r
          i += 2
        } else {
          out(k) = toks(i)
          i += 1
        }
        k += 1
      }
      toks = out
      n = k
      m += 1
    }
    val sb = new java.lang.StringBuilder(w.length + n)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(toks(i))
      i += 1
    }
    sb.toString
  }

  /** Column API. */
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BpeApply(org.apache.spark.sql.GraftColumnBridge.expression(text), merges))
}
