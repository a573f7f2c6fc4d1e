package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.text.TrigramLangId

class TrigramLangIdSpec extends AnyFunSuite {

  test("classifies clear-cut sentences in each supported language") {
    val samples = Map(
      "en" -> "this is what they wanted to know about the things that were done",
      "de" -> "das ist was sie wissen wollten ueber die dinge die getan wurden",
      "es" -> "esto es lo que querian saber sobre las cosas que se hicieron",
      "fr" -> "ceci est ce que ils voulaient savoir sur les choses qui ont ete faites")
    samples.foreach { case (lang, s) =>
      assert(TrigramLangId.classify(s)._1 == lang, s"for '$s'")
    }
  }

  test("empty / letterless text predicts und") {
    assert(TrigramLangId.classify("")._1 == "und")
    assert(TrigramLangId.classify("12345 !!! 678")._1 == "und")
  }

  test("deterministic: same input, same profile and distances") {
    val s = "the quick brown fox and some more words of english text here"
    val a = TrigramLangId.classify(s)
    val b = TrigramLangId.classify(s)
    assert(a == b)
    assert(a._2.length == TrigramLangId.Langs.length)
  }

  test("trigram padding: word boundaries marked") {
    val ts = TrigramLangId.trigrams("ab the").toVector
    assert(ts.contains("_ab") && ts.contains("ab_"))
    assert(ts.contains("_th") && ts.contains("the") && ts.contains("he_"))
  }

  test("profile rank ties break lexicographically (pure function of text)") {
    // "ab cd" -> trigrams _ab, ab_, _cd, cd_ each once; ranks must follow
    // lexicographic order among equal counts
    val p = TrigramLangId.profile("ab cd")
    assert(p("_ab") < p("_cd"))
    assert(p.values.toVector.sorted == p.values.toVector.sorted.distinct)
  }
}
