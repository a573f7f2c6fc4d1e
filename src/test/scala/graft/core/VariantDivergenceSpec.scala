package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.seg.Demarcator
import graft.core.seg.Demarcator.Doc

/** Adversarial vectors at the exact points where the reference's test-dir
  * VARIANTS (`test/test1.py:71-79`, `test/test2.py:30,63,136`) deliberately
  * diverge from the active implementation (`ocr_processor.py:319-437`).
  * Every case is constructed so canonical and variant semantics give
  * DIFFERENT answers, and asserts the canonical one — proving the port
  * matches `ocr_processor.py`, not the variants (SURVEY §2.4).
  */
class VariantDivergenceSpec extends AnyFunSuite {

  test("Plus1 is the PRIMARY search key, not a fallback (vs test1.py:71-79)") {
    // start_id matches page 2, plus1 matches page 4. test1.py searches
    // start_id first and SUBTRACTS the offset (2 - 1 = 1, clamped to >= 1);
    // ocr_processor.py:334-354 ignores start_id entirely when plus1 is
    // present and ADDS the offset to the plus1 hit: 4 + 1 = 5.
    val doc = new Doc(Vector("filler", "alpha marker", "filler", "beta marker", "filler", "x"))
    val got = Demarcator.findFirstPage(doc, "alpha marker", "beta marker",
      occurrence = 1, startOffset = 1, claimed = Nil)
    assert(got == 5, "must follow the plus1-primary + added-offset branch")
    assert(got != 1, "test1.py's fallback/subtraction answer must NOT appear")
  }

  test("Plus1 branch tests demarcation on the TARGET page (vs test1.py:64,76 search-page check)") {
    // plus1 matches page 2 with offset 1 → potential page 3, already
    // claimed. ocr_processor.py:340-342 skips by the POTENTIAL page and
    // keeps scanning (next hit page 4 → potential 5). test1.py checks the
    // search page (i + 1 = 2, unclaimed) and would accept the first hit.
    val doc = new Doc(Vector("x", "beta marker", "x", "beta marker", "x", "x"))
    val got = Demarcator.findFirstPage(doc, "", "beta marker",
      occurrence = 1, startOffset = 1, claimed = List((3, 3)))
    assert(got == 5)
  }

  test("ExactMatch compares the whitespace-NORMALIZED page (vs test2.py:30 newline-only cleaning)") {
    // The page has a TAB between words. ocr_processor.py:285-287 receives
    // the normalize_text'd page ("alpha beta") so the comparison matches;
    // test2.py:30 strips only \n and \r, leaving the tab intact, and would
    // NOT match.
    val doc = new Doc(Vector("alpha\tbeta"))
    val got = Demarcator.findFirstPage(doc, "ExactMatch: alpha beta", "",
      occurrence = 1, startOffset = 0, claimed = Nil)
    assert(got == 1)
  }

  test("Plus1 start offset is applied as-is, never clamped to >= 2 (vs test2.py:63)") {
    // offset 0: canonical returns the hit page itself (3); test2.py forces
    // starting_plus_n = max(2, starting_plus_n) and would shift the answer.
    val doc = new Doc(Vector("x", "x", "beta marker", "x"))
    val got = Demarcator.findFirstPage(doc, "", "beta marker",
      occurrence = 1, startOffset = 0, claimed = Nil)
    assert(got == 3)
  }

  test("Ending offset subtracts exactly EndingMinusN (vs test2.py:136 max(0, n-1))") {
    // minus1 matches page 5 with end_offset 1: canonical last page is
    // 5 - 1 = 4 (ocr_processor.py:409-414); test2.py first reduces the
    // offset by one and would return 5.
    val doc = new Doc(Vector("a", "b", "c", "d", "omega end", "f"))
    val got = Demarcator.findLastPage(doc, firstPage = 2, endId = "",
      endIdMinus1 = "omega end", endOffset = 1)
    assert(got == 4)
  }
}
