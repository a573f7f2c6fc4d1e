package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DocTextOps

/** Pins the BPE-ish regex pre-tokenizer (DocTextOps.tokenBpe) to
  * hand-verified token counts that exercise every alternation branch:
  * contraction suffixes, optional-space letter runs, digit runs,
  * punctuation runs, residual space runs, empty input. The same vectors
  * were probed byte-identical under DuckDB's RE2 (the oracle engine). */
class TokenBpeSpec extends AnyFunSuite with SparkFixture {

  test("hand-verified counts across every alternation branch") {
    import spark.implicits._
    val df = Seq(
      (1L, "the fast key order it's 42nd-place! don't stop  x9  --  'hello' world's end..."),
      (2L, "a  b   c!!!  12.5% won't 'em 'll 'd q'q"),
      (3L, "leading space test"),
      (4L, " trailing  "),
      (5L, ""),
      (6L, "42"),
      (7L, "!?!")
    ).toDF("doc_id", "text")
    val rows = DocTextOps.tokenBpe(df).collect()
    val counts = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(1L -> 27L, 2L -> 22L, 3L -> 3L, 4L -> 2L, 5L -> 0L, 6L -> 1L, 7L -> 1L))

    val r1 = rows.find(_.getLong(0) == 1L).get
    assert(r1.getAs[Long]("n_bpe_distinct") === 23L) // dups: '  '×3, "'"×2, "'s"×2
    assert(r1.getAs[Long]("max_token_len") === 6L)   // " order" / " world"

    // empty text: zero tokens, null max
    val r5 = rows.find(_.getLong(0) == 5L).get
    assert(r5.getAs[Long]("n_bpe_tokens") === 0L)
    assert(r5.isNullAt(r5.fieldIndex("max_token_len")))

    // spice suffix " it's 42nd-place!  --  don't" adds exactly 12 tokens
    // after a letter-final text (no boundary merge)
    val r3 = rows.find(_.getLong(0) == 3L).get
    assert(r3.getAs[Long]("n_bpe_tokens_spiced") === 3L + 12L)
  }
}
