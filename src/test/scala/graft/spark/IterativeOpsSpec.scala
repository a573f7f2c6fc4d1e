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

  test("semanticDedup keeps the min id of a duplicate group, spares the orthogonal vector") {
    import spark.implicits._
    // k=1: one cluster, pure pairwise semantics. id2 ~ id0 (cos ~ 1) is
    // dropped; id1 and id3 are (near-)orthogonal to everything and survive.
    val df = Seq(
      (0L, Array(1f, 0f, 0f, 0f), "x"),
      (1L, Array(0f, 1f, 0f, 0f), "x"),
      (2L, Array(0.999f, 0.001f, 0f, 0f), "x"),
      (3L, Array(0f, 0f, 1f, 0f), "x")
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.semanticDedup(df, k = 1, iters = 3, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toList
    assert(got == List((0L, 0L, true), (1L, 0L, true), (2L, 0L, false), (3L, 0L, true)))
  }

  test("semanticDedup matches a sequential Lloyd + within-cluster-pairs reference") {
    import spark.implicits._
    // deterministic pseudo-random corpus (md5-derived floats)
    def comp(i: Long, d: Int): Float = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"sem-$i-$d".getBytes("UTF-8")).take(4)
        .map(b => f"${b & 0xff}%02x").mkString
      (java.lang.Long.parseLong(h, 16) / 4294967296.0).toFloat
    }
    val n = 60; val dim = 6; val k = 3; val iters = 3; val t = 0.96
    val vecs = (0L until n.toLong).map(i => (i, Array.tabulate(dim)(d => comp(i, d)), "x"))
    val df = vecs.toDF("vec_id", "embedding", "label")

    // sequential reference: identical integer-grid Lloyd + pair rule
    val xs = vecs.map { case (id, v, _) => id -> v.map(f => math.floor(f.toDouble * 1048576).toLong) }
    def nearest(cents: Seq[(Long, Array[Long])], x: Array[Long]): Long =
      cents.map { case (cl, m) =>
        (m.zip(x).map { case (a, b) => val q = b - a; q * q }.sum, cl)
      }.min._2
    var cents: Seq[(Long, Array[Long])] = xs.take(k).map { case (id, x) => (id, x) }
    for (_ <- 1 until iters) {
      val byCl = xs.groupBy { case (_, x) => nearest(cents, x) }
      cents = byCl.toSeq.sortBy(_._1).map { case (cl, ms) =>
        (cl, Array.tabulate(dim)(d => ms.map(_._2(d)).sum / ms.size))
      }
    }
    val asg = xs.map { case (id, x) => id -> nearest(cents, x) }.toMap
    val vd = vecs.map { case (id, v, _) => id -> v.map(_.toDouble) }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((acc, i) => acc + x(i) * y(i))
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val want = (0L until n.toLong).map { id =>
      val dropped = (0L until id).exists(j => asg(j) == asg(id) && cos(vd(j), vd(id)) >= t)
      (id, asg(id), !dropped)
    }.toList
    assert(want.exists(!_._3), "fixture must actually drop something")
    assert(want.count(!_._3) < n / 2, "fixture must actually keep a majority")

    val got = Similarity.semanticDedup(df, k = k, iters = iters, threshold = t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toList
    assert(got == want)
  }
}
