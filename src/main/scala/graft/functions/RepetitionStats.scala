package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document bigram repetition statistics in ONE pass — the shuffle-free
  * form of `explode(word_ngrams(text,2)) → groupBy(doc,gram) → window`:
  * those per-document counts never needed to leave the row, and at corpus
  * scale the exploded gram table (docs × ~word-count rows, string keys) is
  * a shuffle whose only purpose is to come straight back together again.
  *
  * Returns struct(n_grams, max_rep, top_gram, n_dup):
  *   - n_grams: total (non-empty) bigram occurrences;
  *   - max_rep: the highest count of any single bigram;
  *   - top_gram: lexicographically-smallest bigram among those with
  *     max_rep (binary UTF8 order — identical to Spark's and DuckDB's
  *     string ordering);
  *   - n_dup: occurrences belonging to bigrams seen more than once
  *     (the Gopher duplicate-fraction numerator).
  *
  * Null/empty text yields the empty-document row (0, 0, null, 0).
  * RepetitionStatsSpec pins equality against the relational formulation and
  * codegen==interpreted parity.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"repetition_stats requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = RepetitionStats.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("max_rep", LongType, nullable = false),
    StructField("top_gram", StringType, nullable = true),
    StructField("n_dup", LongType, nullable = false)))

  private val WS: UTF8String = UTF8String.fromString("\\s+")
  private val SPACE: UTF8String = UTF8String.fromString(" ")

  /** Static kernel shared by eval and generated code. */
  def compute(text: UTF8String): InternalRow = {
    val words: Array[UTF8String] = text.trim().toLowerCase().split(WS, -1)
    val len = words.length
    val hi = math.max(len - 2, 0) // same positions as WordNgrams(n=2)
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    var total = 0L
    var i = 0
    while (i <= hi) {
      val end = math.min(i + 2, len) // clamped last gram
      val g =
        if (end - i == 1) words(i)
        else UTF8String.concatWs(SPACE, words(i), words(i + 1))
      if (g.numBytes > 0) {
        total += 1
        val slot = counts.get(g)
        if (slot == null) counts.put(g, Array(1L)) else slot(0) += 1
      }
      i += 1
    }
    var maxRep = 0L
    var top: UTF8String = null
    var nDup = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c > 1) nDup += c
      if (c > maxRep || (c == maxRep && top != null && e.getKey.compareTo(top) < 0)) {
        maxRep = c
        top = e.getKey
      }
    }
    InternalRow(total, maxRep, top, nDup)
  }

  /** Column API. */
  def apply(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      RepetitionStats(org.apache.spark.sql.GraftColumnBridge.expression(text)))
}
