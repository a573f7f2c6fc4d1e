package graft.core

import graft.core.text.PyText
import org.scalatest.funsuite.AnyFunSuite

/** CPython-parity kernels vs goldens frozen from the exact reference
  * functions (ocr_processor.py:273-293) executing under python3. */
class PyTextSpec extends AnyFunSuite {
  private val vec = GoldenJson.load("kernel_vectors.json")

  test("normalize matches Python re.sub(\\s+) + strip on golden vectors") {
    GoldenJson.iter(vec.get("normalize")).foreach { c =>
      assert(PyText.normalize(c.get("in").asText()) == c.get("out").asText(),
        s"input=${c.get("in").asText().map(_.toInt.toHexString)}")
    }
  }

  test("pyLower matches str.lower() on golden vectors") {
    GoldenJson.iter(vec.get("lower")).foreach { c =>
      assert(PyText.pyLower(c.get("in").asText()) == c.get("out").asText())
    }
  }

  test("pyStrip matches str.strip() on golden vectors") {
    GoldenJson.iter(vec.get("strip")).foreach { c =>
      assert(PyText.pyStrip(c.get("in").asText()) == c.get("out").asText())
    }
  }

  test("countOccurrences matches re.findall(escape, IGNORECASE) on goldens") {
    GoldenJson.iter(vec.get("count")).foreach { c =>
      val got = PyText.countOccurrences(c.get("page").asText(), c.get("id").asText())
      assert(got == c.get("n").asInt(),
        s"page=${c.get("page").asText()} id=${c.get("id").asText()}")
    }
  }

  test("ciContains matches id.lower() in page.lower() on goldens") {
    GoldenJson.iter(vec.get("contains")).foreach { c =>
      val got = PyText.ciContains(c.get("page").asText(), c.get("id").asText())
      assert(got == c.get("r").asBoolean(),
        s"page=${c.get("page").asText()} id=${c.get("id").asText()}")
    }
  }

  test("isExactMatch / cleanExactMatch match reference helpers on goldens") {
    GoldenJson.iter(vec.get("is_exact")).foreach { c =>
      assert(PyText.isExactMatch(c.get("in").asText()) == c.get("r").asBoolean())
    }
    GoldenJson.iter(vec.get("clean_exact")).foreach { c =>
      assert(PyText.cleanExactMatch(c.get("in").asText()) == c.get("out").asText())
    }
  }

  test("parseIntish mirrors int(s.strip() or 0)") {
    assert(PyText.parseIntish("") == 0)
    assert(PyText.parseIntish(" ") == 0)
    assert(PyText.parseIntish(" ") == 0) // NBSP is Python whitespace
    assert(PyText.parseIntish("3") == 3)
    assert(PyText.parseIntish(" -12 ") == -12)
    assert(PyText.parseIntish("+7") == 7)
    assert(PyText.parseIntish("1_0") == 10)
    // CPython accepts any Unicode DECIMAL digit (Nd), mixing scripts —
    // probed in-sandbox: int("٣")==3, int("١2")==12, int("۴۲")==42,
    // int("1_٢")==12; superscript ³ (No) and roman Ⅻ (Nl) raise
    assert(PyText.parseIntish("٣") == 3) // U+0663 ARABIC-INDIC THREE
    assert(PyText.parseIntish("١2") == 12) // mixed-script
    assert(PyText.parseIntish("۴۲") == 42) // EXTENDED ARABIC-INDIC
    assert(PyText.parseIntish("-٣") == -3)
    assert(PyText.parseIntish("1_٢") == 12)
    assert(PyText.parseIntish(new String(Character.toChars(0x104A1))) == 1) // OSMANYA (supplementary Nd)
    intercept[NumberFormatException](PyText.parseIntish("³")) // superscript
    intercept[NumberFormatException](PyText.parseIntish("Ⅻ")) // roman Ⅻ
    // 32-bit boundary (the documented divergence from CPython's bignum):
    // Int.MinValue is representable and accepted; one past either end throws
    assert(PyText.parseIntish("-2147483648") == Int.MinValue)
    assert(PyText.parseIntish("2147483647") == Int.MaxValue)
    intercept[NumberFormatException](PyText.parseIntish("2147483648"))
    intercept[NumberFormatException](PyText.parseIntish("-2147483649"))
    intercept[NumberFormatException](PyText.parseIntish("x"))
    intercept[NumberFormatException](PyText.parseIntish("1.5"))
    intercept[NumberFormatException](PyText.parseIntish("-"))
  }

  // ---- seeded property-style checks ----
  private val weird: Array[String] = Array(" ", "\t", "\n", "\u00a0",
    "\u2009", "\u001c", "\u200b", "K", "\u212a", "\u00df", "\u0130",
    "\u0131", "\u03a3", "\u03c3", "\u03c2", "a", "Z", "|", "0",
    new String(Character.toChars(0x1F600)) /* astral */)

  private def randStrings(seed: Long, n: Int): Iterator[String] = {
    val rng = new scala.util.Random(seed)
    Iterator.fill(n)(
      Seq.fill(rng.nextInt(20))(weird(rng.nextInt(weird.length))).mkString)
  }

  test("normalize is idempotent and run/edge free") {
    randStrings(1L, 500).foreach { s =>
      val n = PyText.normalize(s)
      assert(PyText.normalize(n) == n)
      assert(!n.startsWith(" ") && !n.endsWith(" ") && !n.contains("  "))
    }
  }

  test("countOccurrences of self is at least 1 for nonempty") {
    randStrings(2L, 500).foreach { s =>
      if (s.nonEmpty) assert(PyText.countOccurrences(s, s) >= 1)
    }
  }
}
