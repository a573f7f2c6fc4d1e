package graft.core

import graft.core.extract.Extractor
import graft.core.pdf.PdfLayout
import org.scalatest.funsuite.AnyFunSuite

class PdfLayoutSpec extends AnyFunSuite {

  test("reading order restored from shuffled y coordinates") {
    // emitted bottom line first, then top, then middle
    val stream =
      """BT
        |1 0 0 1 72 100 Tm (bottom line) Tj
        |1 0 0 1 72 700 Tm (top line) Tj
        |1 0 0 1 72 400 Tm (middle line) Tj
        |ET""".stripMargin
    assert(PdfLayout.extract(stream).text == "top line\nmiddle line\nbottom line")
  }

  test("runs on same line sorted by x and joined with a space") {
    val stream =
      "BT 300 700 Td (world) Tj 1 0 0 1 72 700 Tm (hello) Tj ET"
    assert(PdfLayout.extract(stream).text == "hello world")
  }

  test("y tolerance clusters near-equal baselines") {
    val stream =
      "BT 1 0 0 1 72 500 Tm (a) Tj 1 0 0 1 200 501.5 Tm (b) Tj " +
        "1 0 0 1 72 490 Tm (next) Tj ET"
    assert(PdfLayout.extract(stream).text == "a b\nnext")
  }

  test("Td/TD/T*/TL line advances") {
    val stream =
      """BT /F1 12 Tf 14 TL 72 720 Td (line one) Tj
        |T* (line two) Tj
        |0 -14 Td (line three) Tj
        |ET""".stripMargin
    assert(PdfLayout.extract(stream).text == "line one\nline two\nline three")
  }

  test("TJ array with kerning: big negative gap becomes word space") {
    val stream = "BT 72 700 Td [(Hel) 10 (lo) -250 (world)] TJ ET"
    assert(PdfLayout.extract(stream).text == "Hello world")
  }

  test("escapes in literal strings") {
    val stream = "BT 72 700 Td (a\\(b\\)c \\\\ \\101 line\\nbreak) Tj ET"
    assert(PdfLayout.extract(stream).text == "a(b)c \\ A line\nbreak")
  }

  test("hex strings decode") {
    val stream = "BT 72 700 Td <48656C6C6F> Tj ET"
    assert(PdfLayout.extract(stream).text == "Hello")
  }

  test("quote operators advance line then show") {
    val stream = "BT 12 TL 72 720 Td (first) Tj (second) ' ET"
    assert(PdfLayout.extract(stream).text == "first\nsecond")
  }

  test("spans index the raw stream string literals") {
    val stream = "BT 72 700 Td (hello) Tj ET"
    val got = PdfLayout.extract(stream)
    val sp = got.spans.head
    assert(stream.substring(sp.start, sp.end) == "(hello)")
  }

  test("malformed streams degrade, never throw") {
    assert(PdfLayout.extract("(unclosed").text == "")     // string outside BT shown? no op -> empty
    assert(PdfLayout.extract("garbage % nothing").text == "")
    assert(PdfLayout.extract("BT (dangling ET").text == "")
    assert(PdfLayout.extract("<< /Type /Page >> BT 0 0 Td (x) Tj ET").text == "x")
    assert(PdfLayout.extract("").text == "")
  }

  test("dispatch via Extractor") {
    val got = Extractor.extract("pdf", "BT 10 10 Td (via dispatch) Tj ET")
    assert(got.text == "via dispatch")
  }

  test("determinism across runs") {
    val stream = "BT 1 0 0 1 5 5 Tm (z) Tj 1 0 0 1 5 600 Tm (a) Tj ET"
    val first = PdfLayout.extract(stream)
    (1 to 50).foreach(_ => assert(PdfLayout.extract(stream) == first))
  }
}
