package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashing-trick DENSE text embedding (r17): map raw text to a fixed
  * `dim`-dimensional L2-normalized vector with NO trained model — signed
  * feature hashing (Weinberger et al., ICML'09), the classical baseline
  * that makes the whole vector stack (cosine top-k, IVF/PQ ANN, semantic
  * dedup, the maintained vector index) usable on corpora that arrive as
  * TEXT with no embedding column. One codegen'd projection per row turns
  * a 100 TB text scan into ANN-ready vectors; nothing driver-resident.
  *
  * Definition (engine-neutral by construction — every step restatable in
  * the DuckDB oracle):
  *   - tokens = `\s+` split of `trim(text)`, empties dropped (the repo's
  *     pinned tokenization; no lowercasing — Unicode case folding differs
  *     between engines);
  *   - per token: `hv` = first 13 hex chars of md5(token-UTF-8) as a
  *     52-bit nonnegative BIGINT (the repo's exact-unit hash trick —
  *     DuckDB: `CAST('0x' || substr(md5(tok),1,13) AS BIGINT)`);
  *   - cell `idx = (hv >> 1) % dim`, sign = `hv & 1` (0 → +1, 1 → −1);
  *     signed counts accumulate per cell — E[collision noise] = 0, the
  *     property that makes hashed embeddings behave like projections;
  *   - normalize to MICRO-UNITS: `u_i = floor(1e6 * c_i / sqrt(Σ c_j²)
  *     + 0.5)` — `Σ c_j²` is exact integer arithmetic, `sqrt`/division
  *     are single correctly-rounded IEEE ops, and `floor(x + 0.5)` is
  *     exactly `Math.round` on BOTH engines (DuckDB's ROUND() rounds
  *     half away from zero, which differs on negative halves — floor+0.5
  *     does not). All-zero counts (empty text, or full sign cancellation)
  *     emit the zero vector rather than dividing by zero.
  *
  * Cosine between two such vectors is scale-invariant, so the raw signed
  * counts and the micro-units rank identically; the micro form exists so
  * the ORACLE can hash-match the embedding itself, not just a downstream
  * verdict. Per-row, shuffle-free, whole-stage-codegen'd.
  */
case class HashEmbed(child: Expression, dim: Int) extends UnaryExpression {
  require(dim > 0, "embedding dimension must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hash_embed requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    HashEmbed.compute(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = HashEmbed.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)

  override def prettyName: String = "hash_embed"
}

object HashEmbed {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 52 bits of md5(token UTF-8) read big-endian — numerically equal
    * to parsing the first 13 lowercase-hex chars of the digest. */
  def tokenHash(tok: String): Long = {
    val md = digests.get()
    md.reset()
    val dig = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var hv = 0L
    var b = 0
    while (b < 7) { hv = (hv << 8) | (dig(b) & 0xffL); b += 1 }
    hv >>> 4 // 14 nibbles read, the 13-hex-char prefix is the top 52 bits
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || (c >= 0x09 && c <= 0x0D)

  /** Static kernel shared by eval and the generated call. */
  def compute(text: UTF8String, dim: Int): GenericArrayData = {
    val s = text.toString
    val counts = new Array[Long](dim)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) {
        val hv = tokenHash(s.substring(start, i))
        val idx = ((hv >>> 1) % dim).toInt
        if ((hv & 1L) == 0L) counts(idx) += 1L else counts(idx) -= 1L
      }
    }
    var ssq = 0L
    var j = 0
    while (j < dim) { ssq += counts(j) * counts(j); j += 1 }
    val out = new Array[Long](dim)
    if (ssq > 0L) {
      val norm = math.sqrt(ssq.toDouble)
      j = 0
      while (j < dim) {
        out(j) = Math.round(1e6 * counts(j) / norm)
        j += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Column API. */
  def apply(text: Column, dim: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      HashEmbed(org.apache.spark.sql.GraftColumnBridge.expression(text), dim))
}
