package graft.spark

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Similarity}

/** The scale guards must FAIL LOUDLY, not degrade silently — these tests
  * drive each guard to its trip point. */
class OpsGuardSpec extends AnyFunSuite with SparkFixture {

  test("dedupClusters refuses to return silently split components past maxIters") {
    import spark.implicits._
    // a 6-doc chain: doc i near-dups doc i+1 only → component diameter 5.
    // Min-label propagation moves the min id one hop per round, so
    // maxIters = 2 cannot converge and must throw, not return split labels.
    val texts = (0 to 6).map { i =>
      // 19 tokens, 14 shared with each neighbor → shingle Jaccard ≈ 0.55;
      // docs two hops apart share only ≈ 0.26 → edges form a pure chain
      (i.toLong, (i * 5 until i * 5 + 19).map(k => s"w$k").mkString(" "))
    }
    val docs = texts.toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupClusters(docs, thresholdPpm = 300000L, maxIters = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // with enough rounds the same chain converges to ONE component
    val ok = Dedup.dedupClusters(docs, thresholdPpm = 300000L, maxIters = 20)
      .select("component").distinct().collect()
    assert(ok.length == 1)
  }

  test("annLsh fails loudly on embeddings wider than the precomputed hyperplanes") {
    import spark.implicits._
    val wide = (0L until 5L).map(i => (i, Array.fill(300)(0.5f), "a"))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[Exception] {
      Similarity.annLsh(wide).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("exceeds the 256-dim precomputed hyperplanes")), e.toString)
  }
}
