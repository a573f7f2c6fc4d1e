package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DocTextOps

/** Pins TF-IDF keyword extraction (DocTextOps.tfidfTopTerms) to a
  * hand-computed corpus: integer score arithmetic, rank tie-breaks on term,
  * and the df denominator counting documents (not occurrences). */
class TfidfSpec extends AnyFunSuite with SparkFixture {

  test("hand-computed scores, ranks and tie-breaks on a 3-doc corpus") {
    import spark.implicits._
    // N = 3 docs. df: the→3, cat→2, sat→2, mat→1, dog→1, ran→1, far→1
    val df = Seq(
      (1L, "the cat sat the cat"), // tf: the→2 cat→2 sat→1
      (2L, "the dog ran far"),
      (3L, "the cat sat mat")
    ).toDF("doc_id", "text")
    val rows = DocTextOps.tfidfTopTerms(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))

    // doc 1: cat = 2*1e6*3/2 = 3_000_000; sat = 1*1e6*3/2 = 1_500_000;
    //        the = 2*1e6*3/3 = 2_000_000  → cat, the, sat
    assert(rows.filter(_._1 == 1L).toSeq === Seq(
      (1L, 1L, "cat", 2L, 2L, 3000000L),
      (1L, 2L, "the", 2L, 3L, 2000000L),
      (1L, 3L, "sat", 1L, 2L, 1500000L)))

    // doc 2: dog/far/ran all 1*1e6*3/1 = 3_000_000 — tie broken by term asc
    assert(rows.filter(_._1 == 2L).toSeq === Seq(
      (2L, 1L, "dog", 1L, 1L, 3000000L),
      (2L, 2L, "far", 1L, 1L, 3000000L),
      (2L, 3L, "ran", 1L, 1L, 3000000L)))

    // doc 3: mat (df=1) 3_000_000 beats cat/sat (df=2) 1_500_000;
    //        cat before sat by term; the (1_000_000) drops out of top-3
    assert(rows.filter(_._1 == 3L).toSeq === Seq(
      (3L, 1L, "mat", 1L, 1L, 3000000L),
      (3L, 2L, "cat", 1L, 2L, 1500000L),
      (3L, 3L, "sat", 1L, 2L, 1500000L)))
  }
}
