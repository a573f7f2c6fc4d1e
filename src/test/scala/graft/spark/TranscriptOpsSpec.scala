package graft.spark

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TranscriptOps

/** Pins echo detection (TranscriptOps.echoDetect) to hand-computed overlap
  * values: most-recent-user pairing across intervening tool turns, set
  * semantics on both sides, integer ppm arithmetic, exclusion of assistant
  * turns with no preceding user turn, and partition invariance. */
class TranscriptOpsSpec extends AnyFunSuite with SparkFixture {

  private def turns(rows: (String, Int, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("conv_id", "turn_idx", "role", "text")
  }

  private val corpus = turns(
    ("c1", 1, "user", "a b c"),
    ("c1", 2, "tool", "zzz"),
    ("c1", 3, "assistant", "a b x y"), // {a,b,x,y} ∩ {a,b,c} = 2/4
    ("c1", 4, "assistant", "a b c c"), // {a,b,c} ∩ {a,b,c} = 3/3 (dup token collapses)
    ("c1", 5, "user", "x"),
    ("c1", 6, "assistant", "x"), //       {x} ∩ {x} = 1/1 — pairing moved to t5
    ("c2", 1, "assistant", "a b"), //     no preceding user → excluded
    ("c2", 2, "user", "q"),
    ("c2", 3, "assistant", "r s t u v"), // 0/5
    ("c2", 4, "assistant", "")) //        split("") = [""] → 0/1

  test("echoDetect: hand-computed overlaps, tool turns don't reset the pairing") {
    val got = TranscriptOps.echoDetect(corpus).collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.size === 5) // c2 turn 1 excluded: no user turn before it
    assert(got(("c1", 3)) === ((4L, 500000L, false)))
    assert(got(("c1", 4)) === ((3L, 1000000L, true)))
    assert(got(("c1", 6)) === ((1L, 1000000L, true)))
    assert(got(("c2", 3)) === ((5L, 0L, false)))
    assert(got(("c2", 4)) === ((1L, 0L, false)))
  }

  test("echoDetect: partition-invariant and threshold boundary is >=") {
    val base = TranscriptOps.echoDetect(corpus).collect().toSeq
    val reparted = TranscriptOps.echoDetect(corpus.repartition(7)).collect().toSeq
    assert(reparted === base)
    // exactly-at-threshold is an echo: 1/2 tokens at threshold 500000
    val at = TranscriptOps.echoDetect(
      turns(("c9", 1, "user", "a"), ("c9", 2, "assistant", "a z")),
      thresholdPpm = 500000L).collect()
    assert(at.length === 1 && at(0).getLong(3) === 500000L && at(0).getBoolean(4))
  }
}
