package graft.spark

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DocTextOps, FixedLog}

/** Pins PMI collocation mining (DocTextOps.collocations) to hand-computed
  * FixedLog scores: marginal counts from multi-token documents only, the
  * minCount floor, top-k tie-breaks on (x, y), and a randomized JVM-twin
  * replay of the per-term log2 arithmetic. */
class CollocationsSpec extends AnyFunSuite with SparkFixture {

  test("hand-computed PMI on a 4-doc corpus; 1-token docs and rare pairs excluded") {
    import spark.implicits._
    val df = Seq(
      (1L, "new york new york new york"), // (new,york)x3 (york,new)x2
      (2L, "a b a b a"), //                  (a,b)x2 (b,a)x2
      (3L, "solo"), //                       1 token → contributes nothing
      (4L, "p q") //                         (p,q)x1 → floored at minCount=2
    ).toDF("doc_id", "text")
    // n_uni = 6+5+2 = 13 tokens; n_bi = 5+4+1 = 10 bigrams
    // lp: 2→64 3→96 10→208 13→232; 2·lp(13)−lp(10) = 256
    val got = DocTextOps.collocations(df, minCount = 2L, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      ("a", "b", 2L, 3L, 2L, 64L - 96L - 64L + 256L), //       160; ties
      ("b", "a", 2L, 2L, 3L, 160L), //                         sort by (x, y)
      ("new", "york", 3L, 3L, 3L, 160L),
      ("york", "new", 2L, 3L, 3L, 64L - 96L - 96L + 256L))) // 128
  }

  test("randomized corpus equals a JVM-twin replay of counts and FixedLog PMI") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val words = Array("a", "b", "c", "d", "e", "f")
    val rows = (0L until 60L).map { i =>
      val n = 2 + rnd.nextInt(9)
      (i, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val minCount = 3L
    val k = 12
    val got = DocTextOps.collocations(rows.toDF("doc_id", "text"), minCount, k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // twin
    val toks = rows.map(_._2.split(" ").toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = toks.flatMap(ws => ws.zip(ws.tail)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap.filter(_._2 >= minCount)
    val nUni = toks.map(_.size.toLong).sum
    val nBi = toks.map(_.size.toLong - 1).sum
    val expect = bi.toSeq.map { case ((x, y), cxy) =>
      val pmi = FixedLog.lp(cxy) - FixedLog.lp(uni(x)) - FixedLog.lp(uni(y)) +
        2 * FixedLog.lp(nUni) - FixedLog.lp(nBi)
      (x, y, cxy, uni(x), uni(y), pmi)
    }.sortBy { case (x, y, _, _, _, pmi) => (-pmi, x, y) }.take(k)
    assert(got.toSeq === expect)
    // non-vacuous: the floor bites and scores genuinely vary
    assert(bi.size < toks.flatMap(ws => ws.zip(ws.tail)).distinct.size)
    assert(expect.map(_._6).distinct.size > 1)
  }
}
