package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Hand-computable fixtures for the segment-level cleaning ops: paragraph
  * dedup keeps the globally-first occurrence, boilerplate stripping drops
  * every occurrence; both reassemble the survivors in document order.
  * (The full corpus composition is exact-oracle'd by d_paragraph_dedup /
  * t_boilerplate; these pin the semantics on fixtures small enough to
  * verify by eye, including the doc-vanishes edge.)
  */
class CleanSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // window = 2 tokens; segments annotated per doc:
  //   1: [a b] [c d]
  //   2: [a b] [x y]     -- [a b] repeats doc 1's first segment
  //   3: [c d] [a b]     -- both segments already seen
  //   4: [p q]
  private val corpus = docs(
    (1L, "a b c d"),
    (2L, "a b x y"),
    (3L, "c d a b"),
    (4L, "p q"))

  test("paragraphDedup keeps the first occurrence in (doc_id, seg_idx) order") {
    val got = Clean.paragraphDedup(corpus, "doc_id", "text", window = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // doc 3 contributes nothing (both segments first appeared in doc 1);
    // it must vanish, not survive as an empty row
    assert(got == Set(
      (1L, "a b c d", 2L),
      (2L, "x y", 1L),
      (4L, "p q", 1L)))
  }

  test("paragraphDedup first-occurrence tie-break is positional within a doc") {
    // [m n] repeats INSIDE doc 7: the seg_idx order break means the first
    // copy survives and the second drops, even with no second document
    val got = Clean.paragraphDedup(docs((7L, "m n m n")), "doc_id", "text", window = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((7L, "m n", 1L)))
  }

  test("stripBoilerplate drops ALL occurrences of segments in >= minDocs docs") {
    val got = Clean.stripBoilerplate(corpus, "doc_id", "text", window = 2, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    // [a b] is in docs 1,2,3 and [c d] in docs 1,3 -> both boilerplate;
    // doc 1 vanishes entirely, docs 2 and 4 keep their unique segments
    assert(got == Set(
      (2L, "x y", 1L, 1L),
      (4L, "p q", 1L, 0L)))
  }

  test("stripBoilerplate counts distinct DOCS, not occurrences") {
    // [z z] appears twice but only inside doc 9 -> NOT boilerplate at
    // minDocs = 2 (intra-doc repetition is paragraphDedup's business)
    val got = Clean.stripBoilerplate(docs((9L, "z z z z")), "doc_id", "text",
        window = 2, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set((9L, "z z z z", 2L, 0L)))
  }
}
