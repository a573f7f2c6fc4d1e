package graft.spark

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{GraphOps, Similarity}

/** Lloyd k-means and integer PageRank against sequential reference
  * implementations (the DuckDB oracle replays them over the full synthetic
  * tables; these pin the iteration semantics on small inputs). */
class IterativeOpsSpec extends AnyFunSuite with SparkFixture {

  test("kmeans separates two well-spread groups and reports exact members/inertia") {
    import spark.implicits._
    // group A near (1,0,...), group B near (0,1,...); seeds 0 (A) and 1 (B)
    val vecs = (0L until 20L).map { i =>
      val a = i % 2 == 0
      val eps = (i % 5).toFloat / 100f
      val v = Array.fill(4)(0f)
      v(if (a) 0 else 1) = 1f - eps
      v(2) = eps
      (i, v, if (a) "a" else "b")
    }
    val df = vecs.toDF("vec_id", "embedding", "label")
    val got = Similarity.kmeans(df, k = 2, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // cluster 0 = evens (min id 0), cluster 1 = odds (min id 1)
    assert(got.map(t => (t._1, t._2, t._3)) == List((0L, 10L, 0L), (1L, 10L, 1L)))
  }

  test("pagerank matches a sequential integer reference on the derived citation graph") {
    import spark.implicits._
    val n = 30
    val docs = (0L until n.toLong).map(i => (i, s"doc $i text", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // sequential reference: same graph, same ppb integer arithmetic
    val edges = (0L until n.toLong).flatMap { d =>
      Seq(d / 2, d / 3, (d * 131 + 17) % n).filter(_ != d).distinct.map(d -> _)
    }
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var rank = Map((0L until n.toLong).map(_ -> 1000000000L / n): _*)
    for (_ <- 1 to 3) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / outdeg(src) }.sum
      }
      rank = rank.map { case (id, _) =>
        id -> (150000000L / n + 85L * contrib.getOrElse(id, 0L) / 100L)
      }
    }
    val want = rank.toSeq.sortBy { case (id, r) => (-r, id) }.take(20)
    val got = GraphOps.pagerank(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want, s"got ${got.take(5)}... want ${want.take(5)}...")
  }
}
