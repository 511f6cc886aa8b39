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

  test("bpeEncode: applies merges in step order with the trainer's greedy semantics") {
    import spark.implicits._
    // merges from the 'aaa' fixture: (a,a) then (aa,a)
    val merges = Seq((1L, "a", "a"), (2L, "aa", "a")).toDF("step", "lhs", "rhs")
    val docs = Seq((1L, "aaa aa a"), (2L, "aaaa"), (3L, "b aab")).toDF("doc_id", "text")
    val got = Text.bpeEncode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // aaa: a|a|a -(a,a greedy left)-> aa|a -(aa,a)-> aaa; aa -> aa; a -> a
    assert(got(1L) == ((3L, "aaa aa a")))
    // aaaa: -(a,a)-> aa|aa (two non-overlapping); (aa,a) no |aa||a| match
    assert(got(2L) == ((2L, "aa aa")))
    // b untouched; aab: -(a,a)-> aa|b, (aa,a) no match -> aa b
    assert(got(3L) == ((3L, "b aa b")))
  }

  test("bpeEncode: native kernel is byte-identical to the HOF fold it replaced") {
    import spark.implicits._
    val merges = Seq((1L, "l", "o"), (2L, "lo", "w"), (3L, "e", "r")).toDF("step", "lhs", "rhs")
    val docs = Seq(
      (1L, "low lower lowest slow"),
      (2L, "  Mixed CASE  and   spacing "),
      (3L, "héllo ünïcode éé"), // multi-byte code points
      (4L, ""), (5L, "x")).toDF("doc_id", "text")
    val native = Text.bpeEncode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    val hof = Text.bpeEncodeHof(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(native == hof)
  }

  test("bpeEncode: empty merge table yields character tokens") {
    import spark.implicits._
    val merges = Seq.empty[(Long, String, String)].toDF("step", "lhs", "rhs")
    val docs = Seq((1L, "ab c")).toDF("doc_id", "text")
    val got = Text.bpeEncode(docs, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(got.head == ((3L, "a b c")))
  }

  // ---- lmPerplexity: hand-computed bigram-LM fixtures. The oracle query
  // (p_lm_perplexity) proves engine parity at corpus scale but its corpus
  // has a closed vocabulary, so the <unk> path only executes HERE.
  // Model: c1(a)=3 c1(b)=2 c1(c)=1 from train "a b","a b","a c"; V=4.
  private def lmScores(heldout: String*): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    val train = Seq((1L, true, "a b"), (2L, true, "a b"), (3L, true, "a c"))
    val test = heldout.zipWithIndex.map { case (t, i) => (100L + i, false, t) }
    val df = (train ++ test).toDF("doc_id", "is_train", "text")
    Text.lmPerplexity(df, "doc_id", "text", org.apache.spark.sql.functions.col("is_train"),
        thresholdUnats = 1000000L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("lmPerplexity: in-vocab bigram scores -ln((c2+1)/(c1+V)) in micro-nats") {
    // "a b": c2(a,b)=2, c1(a)=3 -> -ln(3/7) = 0.847297860... -> 847298
    val got = lmScores("a b")
    assert(got(100L) == ((847298L, 1L, 1L))) // kept: 847298 <= 1*1e6
  }

  test("lmPerplexity: out-of-vocab second word maps to <unk> (c2=0, c1(u) kept)") {
    // "a z": (a,<unk>) -> -ln((0+1)/(3+4)) = ln 7 = 1.945910... -> 1945910
    val got = lmScores("a z")
    assert(got(100L) == ((1945910L, 1L, 0L))) // dropped at 1 nat/bigram
  }

  test("lmPerplexity: fully-OOV context scores against c1(<unk>)=0") {
    // "z q a": (<unk>,<unk>) and (<unk>,a), both -ln(1/4) -> 1386294 each
    val got = lmScores("z q a")
    assert(got(100L) == ((2772588L, 2L, 0L))) // 2772588 > 2*1e6 -> dropped
  }

  test("lmPerplexity: sub-bigram docs score 0/0 and are kept") {
    val got = lmScores("z", "")
    assert(got(100L) == ((0L, 0L, 1L)))
    assert(got(101L) == ((0L, 0L, 1L)))
  }

  test("lmPerplexity: seeded fuzz against an independent brute-force scorer") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xD1CE)
    val alphabet = Vector("a", "b", "c", "d", "e", "zz")
    for (_ <- 1 to 5) {
      val docs = (0L until 40L).map { id =>
        val n = 1 + rnd.nextInt(6)
        (id, rnd.nextBoolean(), Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
      }
      // brute force straight from the model definition
      val toks = docs.map { case (id, tr, t) =>
        (id, tr, t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq) }
      val trainToks = toks.filter(_._2).flatMap(_._3)
      val c1 = trainToks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val c2 = toks.filter(_._2).flatMap { case (_, _, w) => w.zip(w.drop(1)) }
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val v = c1.size + 1.0
      def m(w: String) = if (c1.contains(w)) w else "<unk>"
      val expected = toks.filterNot(_._2).map { case (id, _, w) =>
        val terms = w.zip(w.drop(1)).map { case (x, y) =>
          val (mu, mv) = (m(x), m(y))
          math.round(-math.log((c2.getOrElse((mu, mv), 0L) + 1.0) /
            (c1.getOrElse(mu, 0L) + v)) * 1e6)
        }
        id -> ((terms.sum, terms.size.toLong))
      }.toMap
      val got = Text.lmPerplexity(docs.toDF("doc_id", "is_train", "text"),
          "doc_id", "text", org.apache.spark.sql.functions.col("is_train"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == expected)
    }
  }

  // ---- tokenKlDrift: left "a a b" vs right "a c"; V=3, tl=3, tr=2.
  test("tokenKlDrift: per-word KL contributions in nano-nats, ordered desc") {
    import spark.implicits._
    val df = Seq((true, "a a b"), (false, "a c")).toDF("is_left", "text")
    val got = Text.tokenKlDrift(df, "text", org.apache.spark.sql.functions.col("is_left"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // b: (1/3)*ln((1/3)/(1/5)) = .170275208 -> 170275208
    // a: (1/2)*ln(.5/.4)       = .111571776 -> 111571776
    // c: (1/6)*ln((1/6)/(2/5)) = -.145911456 -> -145911456
    assert(got == Seq(
      ("b", 1L, 0L, 170275208L),
      ("a", 2L, 1L, 111571776L),
      ("c", 0L, 1L, -145911456L)))
  }
}
