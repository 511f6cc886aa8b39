package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (r16) — the MOSS scheme (Schleimer,
  * Wilkerson, Aiken: "Winnowing: Local Algorithms for Document
  * Fingerprinting", SIGMOD 2003): hash every character k-gram, slide a
  * w-hash window, keep each window's MINIMUM hash, return the document's
  * distinct selected hashes sorted. The winnowing guarantee makes it the
  * standard plagiarism / fuzzy-containment primitive: any shared substring
  * of at least w + k - 1 characters forces at least one shared fingerprint,
  * while the fingerprint density stays ~2/(w+1) of the grams — a compact
  * sketch MinHash (whole-doc similarity) cannot substitute for, because
  * winnowing localizes PARTIAL overlap.
  *
  * Engine-neutral definition (the DuckDB oracle restates it exactly):
  *   - gram hash = the first 13 md5 hex digits of the gram's UTF-8 bytes
  *     as a BIGINT (52 bits — the repo's standard md5-unit trick; a cheap
  *     rolling hash would be faster but no two engines agree on one);
  *   - windows j = 0 .. n-w over the n = len-k+1 gram hashes; when
  *     0 < n < w the whole gram list is one clamped window;
  *   - ties inside a window are value-ties, so the emitted SET is
  *     position-rule-independent;
  *   - len < k yields an empty array (the caller's explode drops the doc).
  *
  * Normalization (lowercase, whitespace strip) is the CALLER's projection —
  * kept outside so the kernel composes with any cleaning pipeline and the
  * oracle restatement stays a plain `lower(regexp_replace(...))`.
  *
  * Scale shape: per-row, shuffle-free, one MessageDigest reused across all
  * grams of a row; downstream overlap detection is an equi-join on the
  * fingerprint value with a document-frequency cap (the PPJoin stop-key
  * discipline) — never all-pairs.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0 && w > 0, "need k > 0 and w > 0")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fingerprints requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = WinnowFingerprints.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c, $k, $w);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}

object WinnowFingerprints {

  /** Static kernel shared by eval and the generated call. Grams are k
    * CODEPOINTS, not UTF-16 code units — the oracle's `length`/`substr`
    * count codepoints, and a code-unit walk would split surrogate pairs
    * into unpaired halves that UTF-8-encode as '?' and collide across
    * distinct texts (spurious shared fingerprints in a dedup gate). */
  def compute(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    // r17 (guide §1.2 per-task work): the original path did
    // `s.substring(gram).getBytes(UTF_8)` per gram — a String + byte[]
    // allocation and a UTF-16→UTF-8 re-encode for EVERY gram of every
    // document, dominating the md5 itself. The input is already UTF-8:
    // walk codepoint BYTE offsets once and feed md5 straight from the one
    // byte array (digest into a reused buffer, no per-gram allocation).
    // Identical output: md5 over the same bytes. A malformed byte sequence
    // (impossible for Spark-produced strings, defensively handled anyway)
    // falls back to the original String walk, whose replacement-char
    // behavior the r16 kernel defined. The validity scan is STRICT
    // (r18, the r17 verdict's gap): surrogate-range encodings
    // (ED A0..BF ..), overlong forms (C0/C1, E0 80..9F, F0 80..8F) and
    // beyond-U+10FFFF (F4 90.., F5..) are rejected too — the String walk
    // re-encodes exactly those as '?', so hashing their raw bytes would
    // have silently changed fingerprints for WTF-8-ish parquet input.
    val bytes = text.getBytes
    val len = bytes.length
    var total = 0
    var bi = 0
    var valid = true
    while (bi < len && valid) {
      val b0 = bytes(bi) & 0xff
      val cl =
        if (b0 < 0x80) 1
        else if (b0 >= 0xc2 && b0 <= 0xdf) 2
        else if ((b0 & 0xf0) == 0xe0) 3
        else if (b0 >= 0xf0 && b0 <= 0xf4) 4
        else { valid = false; 1 } // 0x80..0xc1 (stray continuation /
                                  // overlong 2-byte), 0xf5..0xff
      if (bi + cl > len) valid = false
      else if (valid) {
        // second-byte range is start-byte-dependent (surrogates, overlongs,
        // > U+10FFFF); remaining bytes are plain continuations
        val b1 = if (cl > 1) bytes(bi + 1) & 0xff else 0
        val b1ok = cl match {
          case 1 => true
          case 2 => (b1 & 0xc0) == 0x80
          case 3 =>
            if (b0 == 0xe0) b1 >= 0xa0 && b1 <= 0xbf       // reject overlong
            else if (b0 == 0xed) b1 >= 0x80 && b1 <= 0x9f  // reject surrogates
            else (b1 & 0xc0) == 0x80
          case _ =>
            if (b0 == 0xf0) b1 >= 0x90 && b1 <= 0xbf       // reject overlong
            else if (b0 == 0xf4) b1 >= 0x80 && b1 <= 0x8f  // reject > U+10FFFF
            else (b1 & 0xc0) == 0x80
        }
        if (!b1ok) valid = false
        var q = bi + 2
        while (q < bi + cl && valid) {
          if ((bytes(q) & 0xc0) != 0x80) valid = false
          q += 1
        }
      }
      bi += cl
      total += 1
    }
    if (!valid) return computeViaString(text.toString, k, w)
    val n = total - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    // codepoint byte-start offsets, one pass (starts(total) closes the
    // last gram)
    val starts = new Array[Int](total + 1)
    bi = 0
    var cc = 0
    while (bi < len) {
      starts(cc) = bi
      val b0 = bytes(bi) & 0xff
      bi += (if (b0 < 0x80) 1 else if ((b0 & 0xe0) == 0xc0) 2
             else if ((b0 & 0xf0) == 0xe0) 3 else 4)
      cc += 1
    }
    starts(total) = len
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = new Array[Byte](16)
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.update(bytes, starts(i), starts(i + k) - starts(i))
      md.digest(dig, 0, 16)
      // first 13 hex digits = top 52 bits: take 7 big-endian bytes (56
      // bits), drop the low nibble — identical to BIGINT('0x' || the 13
      // leading hex chars) on the oracle side
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (dig(b) & 0xff); b += 1 }
      h(i) = v >>> 4
      i += 1
    }
    winnowSelect(h, n, w)
  }

  /** Original String-walk form — the fallback for malformed UTF-8 input,
    * byte-identical to the r16 kernel (replacement-char semantics). */
  private def computeViaString(s: String, k: Int, w: Int): GenericArrayData = {
    val total = s.codePointCount(0, s.length)
    val n = total - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](total + 1)
    var ci = 0
    var cc = 0
    while (ci < s.length) {
      starts(cc) = ci
      ci += Character.charCount(s.codePointAt(ci))
      cc += 1
    }
    starts(total) = s.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      val d = md.digest(s.substring(starts(i), starts(i + k)).getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xff); b += 1 }
      h(i) = v >>> 4
      i += 1
    }
    winnowSelect(h, n, w)
  }

  /** Shared winnow-window selection over the gram hashes. */
  private def winnowSelect(h: Array[Long], n: Int, w: Int): GenericArrayData = {
    val sel = new java.util.TreeSet[java.lang.Long]()
    val nWin = math.max(n - w + 1, 1)
    var j = 0
    while (j < nWin) {
      var m = Long.MaxValue
      var q = j
      val hi = math.min(j + w, n) // clamped when 0 < n < w
      while (q < hi) { if (h(q) < m) m = h(q); q += 1 }
      sel.add(m)
      j += 1
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  /** Column API. */
  def apply(text: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      WinnowFingerprints(org.apache.spark.sql.GraftColumnBridge.expression(text), k, w))
}
