package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.extract.Extractor

/** Fuzz invariants for the extraction kernels — at 10^12 turns every
  * malformed payload that CAN occur WILL occur, so the kernels must never
  * throw, always produce in-bounds ordered spans, and be deterministic on
  * arbitrary garbage, not just on the synthetic corpus. */
class ExtractorFuzzSpec extends AnyFunSuite {

  private val tools = Gen.oneOf("html", "pdf", "", "tool", "weird")

  // strings biased toward markup/PDF metacharacters plus unicode whitespace
  private val payloadGen: Gen[String] = {
    val meta = Gen.oneOf(
      "<", ">", "</", "/>", "<div", "<p>", "&", "&amp;", "&#x", "\"", "'",
      "=", "Tj", "TJ", "Tm", "BT", "ET", "(", ")", "[", "]", "\\", "-250",
      "1 0 0 1", "72", "\n", " ", "\t", " ", " ", "",
      "é", "ß", "中")
    val word = Gen.alphaNumStr.map(_.take(8))
    Gen.listOf(Gen.frequency(3 -> meta, 2 -> word))
      .map(_.mkString)
      .map(_.take(4000))
  }

  private def check(minTests: Int)(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  test("safeExtract never throws; spans in-bounds; html/passthrough ordered") {
    check(300)(Prop.forAll(tools, payloadGen) { (tool: String, payload: String) =>
      val (ex, _) = Extractor.safeExtract(tool, payload)
      var prevEnd = 0
      var ok = ex.text != null
      ex.spans.foreach { s =>
        ok &&= s.start >= 0 && s.end <= payload.length && s.start <= s.end
        // pdf spans follow READING order and may legitimately regress in raw
        // offset (shuffled emission order); html blocks and passthrough are
        // document-ordered and disjoint
        if (tool != "pdf") { ok &&= s.start >= prevEnd; prevEnd = s.end }
      }
      ok
    })
  }

  test("deterministic on arbitrary input") {
    check(100)(Prop.forAll(tools, payloadGen) { (tool: String, payload: String) =>
      Extractor.safeExtract(tool, payload) == Extractor.safeExtract(tool, payload)
    })
  }

  test("truncated/degenerate payloads") {
    val cases = Seq(
      "html" -> "<", "html" -> "<div", "html" -> "</", "html" -> "&#", "html" -> "<!--",
      "html" -> "<script>unclosed", "html" -> ("<p>" * 1000),
      "pdf" -> "BT", "pdf" -> "(", "pdf" -> "(unclosed string", "pdf" -> "1 0 0 1 Tm",
      "pdf" -> (")" * 100), "pdf" -> "[(a) -250", "" -> " ")
    cases.foreach { case (tool, p) =>
      val (ex, err) = Extractor.safeExtract(tool, p)
      assert(ex.text != null, s"($tool, $p)")
      assert(!err || ex.text.isEmpty, s"error must imply empty text for ($tool, $p)")
    }
  }
}
