package graft.spark

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EnvelopeOps

/** Envelope synthesis + validation edge cases the DuckDB gate can't reach
  * (the frozen corpora carry no JSON metacharacters in `source`). */
class EnvelopeSpec extends AnyFunSuite with SparkFixture {

  test("synthesizeEnvelopes escapes quotes/backslashes; validation round-trips them") {
    import spark.implicits._
    // doc_ids avoiding the planted-defect moduli (7/11) so ClientFileName
    // is present and non-empty
    val d = Seq(
      (1L, "body", """say "hi"""", "en"),
      (2L, "body", """c:\tmp\x""", "en"),
      (4L, "body", """both \" tricks""", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val env = EnvelopeOps.synthesizeEnvelopes(d)
    // every synthesized envelope must be PARSEABLE JSON (un-escaped, Spark
    // silently NULLs the field and the quarantine verdict flips)
    val got = EnvelopeOps.validateEnvelope(env).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(5)))).toMap
    assert(got(1L) === (("""say "hi"""", true)))
    assert(got(2L) === (("""c:\tmp\x""", true)))
    assert(got(4L) === (("""both \" tricks""", true)))
  }
}
