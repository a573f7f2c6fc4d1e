package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DocTextOps

/** Pins the composed pretraining downselect (DocTextOps.downselect):
  * stage flags are monotone (sampled ⇒ canonical ⇒ quality), dedup keeps
  * the minimum-id copy among QUALITY survivors only, and a quality-failing
  * duplicate never claims canonicality from a passing one. */
class DownselectSpec extends AnyFunSuite with SparkFixture {

  private val good =
    "the quick brown fox jumps over a lazy dog while many other animals watch of the great race today"

  test("stage flags compose: canonical-per-hash among quality survivors") {
    import spark.implicits._
    val df = Seq(
      (1L, good, "en"),                 // passes quality; dup of 2
      (2L, good, "en"),                 // passes quality; canonical = min id 1
      (3L, "too short", "en"),          // fails quality
      (4L, good + " and nothing else matters here", "de") // unique, passes
    ).toDF("doc_id", "text", "lang")
    val rows = DocTextOps.downselect(df).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))).toMap

    assert(rows(1L)._1 && rows(1L)._2, "doc 1 passes quality and is canonical")
    assert(rows(2L)._1 && !rows(2L)._2, "doc 2 passes quality but loses dedup to doc 1")
    assert(rows(3L) === ((false, false, false)), "doc 3 fails at the quality stage")
    assert(rows(4L)._1 && rows(4L)._2, "doc 4 is its own canonical")

    // monotone: sampled ⇒ canonical ⇒ q_keep
    for ((id, (q, c, s)) <- rows) {
      assert(!s || c, s"doc $id sampled without being canonical")
      assert(!c || q, s"doc $id canonical without passing quality")
    }
  }

  test("a failing duplicate does not steal canonicality from a passing one") {
    import spark.implicits._
    // doc 5 (lower id, FAILS quality via length) shares no hash with good;
    // doc 6 passes — even if 5 < 6, 6 must be canonical of its own hash
    val df = Seq(
      (5L, "short stub", "en"),
      (6L, good, "en")
    ).toDF("doc_id", "text", "lang")
    val rows = DocTextOps.downselect(df).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(!rows(5L) && rows(6L))
  }
}
