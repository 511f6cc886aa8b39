package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Hand-computed pins for [[Text.bpeTrain]] — the oracle query (t_bpe_train)
  * proves engine parity at corpus scale; these fixtures pin the BPE
  * semantics themselves (merge order, tie-breaks, greedy within-word
  * overlap, early exhaustion) where the expected values are derivable by
  * hand.
  */
class TextSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def corpus(texts: String*) = {
    import spark.implicits._
    texts.toDF("text")
  }

  private def train(df: org.apache.spark.sql.DataFrame, k: Int) =
    try Text.bpeTrain(df, "text", k)
      .orderBy("step")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    finally Pins.releaseAll()

  test("bpeTrain: the classic low/lower fixture merges in frequency-then-lex order") {
    // words: low (freq 2), lower (freq 1)
    // round 1 pairs: (l,o)=3, (o,w)=3, (w,e)=1, (e,r)=1 -> tie -> (l,o)
    // round 2: (lo,w)=3, (w,e)=1, (e,r)=1 -> (lo,w)
    // round 3: (low,e)=1, (e,r)=1 -> tie -> (e,r)
    val got = train(corpus("low low", "lower"), 3)
    assert(got == Seq((1L, "l", "o", 3L), (2L, "lo", "w", 3L), (3L, "e", "r", 1L)))
  }

  test("bpeTrain: within-word overlapping pairs merge greedily left-to-right") {
    // 'aaa' x2: round 1 counts (a,a) once per adjacent slot = 4; the merge
    // must produce aa+a (greedy), NOT a+aa, so round 2 is (aa,a)=2; then
    // no pairs remain -> numMerges=3 exhausts after 2 rows
    val got = train(corpus("aaa aaa"), 3)
    assert(got == Seq((1L, "a", "a", 4L), (2L, "aa", "a", 2L)))
  }

  test("bpeTrain: merged tokens are atomic in later rounds") {
    // abab: round 1 (a,b)=2 (slots ab|ab) ... careful: pairs of 'abab' are
    // (a,b),(b,a),(a,b) -> (a,b)=2, (b,a)=1 -> merge (a,b) -> ab|ab
    // round 2: (ab,ab)=1 -> merge -> single token, round 3 exhausts
    val got = train(corpus("abab"), 3)
    assert(got == Seq((1L, "a", "b", 2L), (2L, "ab", "ab", 1L)))
  }

  test("bpeTrain: releases every per-round pin it takes") {
    train(corpus("low lower lowest"), 2)
    assert(Pins.retainedCount == 0)
  }
}
