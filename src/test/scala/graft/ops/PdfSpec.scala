package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class PdfSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def extract(bytes: Array[Byte], id: Long = 1L): Seq[(Long, String)] = {
    import spark.implicits._
    Pdf.extract(spark, Seq(Multimodal.MediaBytesRow(id, bytes)).toDS())
      .collect().toSeq.sortBy(_.page).map(p => (p.page, p.text))
  }

  test("encode/extract round trip: multi-page, multi-line, Flate-compressed") {
    val bytes = Pdf.encode(Seq(
      Seq("alpha beta gamma", "delta epsilon"),
      Seq("second page line")))
    assert(extract(bytes) == Seq(
      (0L, "alpha beta gamma\ndelta epsilon"),
      (1L, "second page line")))
  }

  test("uncompressed streams parse identically (the /Filter branch is real)") {
    val pages = Seq(Seq("one two", "three four"))
    assert(extract(Pdf.encode(pages, flate = false)) ==
      extract(Pdf.encode(pages, flate = true)))
  }

  test("string escapes round trip: parens, backslash, octal survive the literal syntax") {
    val tricky = "paren (pair) back\\slash end"
    val bytes = Pdf.encode(Seq(Seq(tricky)))
    assert(extract(bytes) == Seq((0L, tricky)))
  }

  test("content-stream walk: TJ kerning numbers ignored, ' shows on a new line, hex strings decode") {
    val content = ("BT /F1 12 Tf 72 720 Td [(Hel) -120 (lo)] TJ " +
      "(world) ' 0 -14 Td <4142> Tj ET").getBytes("ISO-8859-1")
    assert(Pdf.extractText(content, 9L) == "Hello\nworld\nAB")
  }

  test("text outside BT/ET never leaks; graphics operators pass through") {
    val content = ("(ghost) Tj BT 1 0 0 1 10 10 Tm /F1 9 Tf " +
      "72 720 Td (real) Tj ET q Q (ghost2) Tj").getBytes("ISO-8859-1")
    assert(Pdf.extractText(content, 9L) == "real")
  }

  test("xref STREAM form (PDF 1.5+): /ObjStm-packed dicts + PNG-Up-predicted binary xref rows") {
    val pages = Seq(
      Seq("alpha beta gamma", "delta epsilon"),
      Seq("second page line"))
    // the modern on-disk form must extract identically to the classic one
    assert(extract(Pdf.encodeXrefStream(pages)) == extract(Pdf.encode(pages)))
    // and the predictor is a real layer: unpredicted xref rows parse too
    assert(extract(Pdf.encodeXrefStream(pages, predictor = false)) ==
      extract(Pdf.encode(pages)))
  }

  test("/Prev chain: an incremental-update trailer resolves through the prior xref") {
    val base = Pdf.encode(Seq(Seq("incrementally updated")))
    val s = new String(base, "ISO-8859-1")
    val oldXref = s.substring(s.lastIndexOf("startxref") + 9).trim
      .takeWhile(_.isDigit)
    val sizeN = s.substring(s.indexOf("/Size ") + 6).takeWhile(_.isDigit)
    // append an EMPTY update section whose trailer defers via /Prev — the
    // whole object map must come from the chained prior table
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(base)
    val newOff = bos.size()
    bos.write((s"xref\n0 0\ntrailer << /Size $sizeN /Root 1 0 R " +
      s"/Prev $oldXref >>\nstartxref\n$newOff\n%%EOF\n").getBytes("ISO-8859-1"))
    assert(extract(bos.toByteArray) == Seq((0L, "incrementally updated")))
  }

  test("the \" operator (spacing + next-line show) extracts its text") {
    val content = ("BT /F1 12 Tf 72 720 Td (first) Tj " +
      "2 1 (quoted line) \" ET").getBytes("ISO-8859-1")
    assert(Pdf.extractText(content, 9L) == "first\nquoted line")
  }

  test("a truncated stream fails loudly instead of zero-padding to empty text") {
    val good = Pdf.encode(Seq(Seq("some page text here")))
    // cut the file mid-content-stream: /Length now overruns the buffer.
    // (the xref tail is gone too, so rebuild a minimal tail pointing at the
    // intact xref offset — the truncation target is the STREAM payload)
    val s = new String(good, "ISO-8859-1")
    val streamAt = s.indexOf("stream\n") + 7
    val cut = java.util.Arrays.copyOf(good, streamAt + 3) // 3 payload bytes
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(cut)
    // borrow the original xref+trailer so the parse reaches the stream read
    bos.write(good, s.indexOf("xref\n0"),
      good.length - s.indexOf("xref\n0"))
    // the xref offsets still address the original layout; object loads that
    // land inside the copied region parse, and the payload read must FAIL
    // loudly (never silently zero-pad into empty page text)
    val e = intercept[Exception](extract(bos.toByteArray, 12L))
    assert(e.getMessage.contains("doc 12"), e.getMessage.take(200))
  }

  test("a freed object in a newer update shadows the old offset (no resurrection)") {
    val base = Pdf.encode(Seq(Seq("soon to be deleted")))
    val s = new String(base, "ISO-8859-1")
    val oldXref = s.substring(s.lastIndexOf("startxref") + 9).trim
      .takeWhile(_.isDigit)
    val sizeN = s.substring(s.indexOf("/Size ") + 6).takeWhile(_.isDigit)
    // incremental update FREES object 4 (the page's content stream)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(base)
    val newOff = bos.size()
    bos.write((s"xref\n4 1\n0000000000 65535 f \ntrailer << /Size $sizeN " +
      s"/Root 1 0 R /Prev $oldXref >>\nstartxref\n$newOff\n%%EOF\n")
      .getBytes("ISO-8859-1"))
    val e = intercept[Exception](extract(bos.toByteArray, 13L))
    assert(e.getMessage.contains("FREED"),
      s"freed object must not resolve to its stale bytes: ${e.getMessage.take(200)}")
  }

  test("malformed PDFs fail LOUDLY naming the doc (never a silent skip)") {
    val good = Pdf.encode(Seq(Seq("hello there")))
    // no startxref
    val e1 = intercept[Exception](
      extract("%PDF-1.4 garbage with no trailer".getBytes("ISO-8859-1"), 7L))
    assert(e1.getMessage.contains("doc 7") && e1.getMessage.contains("startxref"))
    // startxref pointing into an xref STREAM / garbage
    val broken = java.util.Arrays.copyOf(good, good.length)
    val xi = new String(good, "ISO-8859-1").indexOf("xref")
    broken(xi) = 'y'
    val e2 = intercept[Exception](extract(broken, 8L))
    assert(e2.getMessage.contains("doc 8"))
  }

  test("fanOut makes page extraction input-split-independent") {
    import spark.implicits._
    val rows = (0 until 6).map(i =>
      Multimodal.MediaBytesRow(i.toLong, Pdf.encode(Seq(Seq(s"doc number $i")))))
    val one = spark.createDataset(rows).coalesce(1)
    assert(Pdf.extract(spark, one).rdd.getNumPartitions == 1)
    assert(Pdf.extract(spark, one, fanOut = 3).rdd.getNumPartitions == 3)
    assert(Pdf.extract(spark, one, fanOut = 3).collect().map(_.doc_id).sorted.toSeq ==
      (0L until 6L))
  }
}
