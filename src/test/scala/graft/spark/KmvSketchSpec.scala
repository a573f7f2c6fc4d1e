package graft.spark

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** Pins the KMV sketch aggregate (graft.functions.KmvKthSmallest): exact
  * k-th-smallest-distinct semantics, the below-k null contract, dedup of
  * repeated values, merge correctness across partitions, and the
  * partial-aggregation plan shape (map-side combine — the property that
  * makes the sketch shuffle ≤k longs per partition at any input size). */
class KmvSketchSpec extends AnyFunSuite with SparkFixture {

  test("exact k-th smallest distinct, dedup, partition merges, below-k null") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // 3000 rows, 997 distinct values, every value repeated ~3x, scrambled
    val distinctVals = (0 until 997).map(i => (i * 1103515245L) % 2654435761L)
    val rows = (0 until 3000).map(i => distinctVals(i % 997))
    val df = rows.toDF("h").repartition(7) // force partial + final merge

    val expected64 = distinctVals.sorted.apply(63) // k-th smallest (k=64)
    val got = df.selectExpr("kmv_kth(h, 64) AS hk").collect().head
    assert(got.getLong(0) === expected64)

    // fewer than k distinct values → null (caller falls back to exact)
    val small = df.selectExpr("kmv_kth(h, 2000) AS hk").collect().head
    assert(small.isNullAt(0))

    // k=1 degenerates to min
    val m1 = df.selectExpr("kmv_kth(h, 1) AS hk", "min(h) AS mn").collect().head
    assert(m1.getLong(0) === m1.getLong(1))

    // plan shape: partial (map-side) aggregation before the exchange
    val p = df.selectExpr("kmv_kth(h, 64)")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("partial_kmv_kth"), p)

    // k as a FOLDABLE constant expression (function resolution precedes
    // constant folding, so these are not bare literals at build time)
    assert(df.selectExpr("kmv_kth(h, 60 + 4) AS hk").collect().head.getLong(0)
      === expected64)
    assert(df.selectExpr("kmv_kth(h, CAST(64 AS INT)) AS hk").collect().head.getLong(0)
      === expected64)
    // misuse still fails cleanly at analysis: zero, negative, non-constant
    intercept[Exception](df.selectExpr("kmv_kth(h, 0)").collect())
    intercept[Exception](df.selectExpr("kmv_kth(h, 3 - 5)").collect())
    intercept[Exception](df.selectExpr("kmv_kth(h, h)").collect())
  }

  test("grouped sketch estimate tracks exact distinct within KMV error") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // two groups with known distinct cardinalities ~2000 and ~300
    val data =
      (0 until 6000).map(i => ("a", ((i % 2000) * 2654435761L) % 4294967296L)) ++
      (0 until 900).map(i => ("b", ((i % 300) * 1103515245L) % 4294967296L))
    val df = data.toDF("g", "h").repartition(5)
    val rows = df.groupBy("g")
      .agg(org.apache.spark.sql.functions.expr("kmv_kth(h, 64)").as("hk"),
        org.apache.spark.sql.functions.count_distinct($"h").as("n_exact"))
      .selectExpr("g", "n_exact", "63 * 4294967296L DIV hk AS n_est")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // KMV stderr at k=64 is ~1/sqrt(62) ≈ 12.7%; allow 4 sigma
    for ((_, (exact, est)) <- rows)
      assert(math.abs(est - exact).toDouble / exact < 0.51,
        s"estimate $est too far from exact $exact")
  }

  /** Sequential JVM twin of [[graft.ops.DocTextOps.hllDistinct]] over raw
    * shingle strings — registers, scaled harmonic sum, both estimator
    * branches — used to pin the SQL formulation field-for-field. */
  private def hllTwin(shingles: Set[String]): (Long, Long, Long, Long, Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val m = 16
    val regs = new Array[Long](m) // 0 = never hit
    // the SUT counts distinct 32-bit HASHES, not distinct strings — the
    // twin must match (an h32 collision would otherwise diverge n_exact)
    val hashes = shingles.map(s =>
      graft.ops.Shingles.sliceU32(md.digest(s.getBytes("UTF-8")), 0))
    hashes.foreach { h =>
      val reg = (h >> 28).toInt
      val w = h & ((1L << 28) - 1)
      val rho = if (w == 0) 29L else 29L - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(reg)) regs(reg) = rho
    }
    val nSet = regs.count(_ > 0).toLong
    val vZero = m - nSet
    val sScaled = regs.map(mj => 1L << (29 - mj)).sum
    val estRaw = graft.ops.DocTextOps.HllAlpha16Ppm * m * m * (1L << 29) / sScaled / 1000000L
    val nEst =
      if (estRaw <= 40 && vZero > 0)
        m * (graft.ops.FixedLog.lp(m) - graft.ops.FixedLog.lp(vZero)) *
          graft.ops.DocTextOps.Ln2Ppm / 64000000L
      else estRaw
    (nSet, vZero, sScaled, hashes.size.toLong, estRaw, nEst)
  }

  test("hllDistinct: field-for-field vs a sequential JVM twin, both estimator branches") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // 'en': ~250 docs of wide vocab (raw-estimator branch); 'zz': tiny
    // vocab so linear counting fires (est_raw <= 40, empty registers)
    val rows = (0L until 250L).map { id =>
      val toks = Seq.fill(8)("w" + rnd.nextInt(500))
      (id, toks.mkString(" "), "en", "s0")
    } ++ (250L until 260L).map { id =>
      (id, "p q r s p q", "zz", "s1")
    }
    val d = rows.toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source", "CAST(length(text) AS BIGINT) AS n_chars")
      .repartition(6)
    val got = graft.ops.DocTextOps.hllDistinct(d).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    def shinglesOf(lang: String): Set[String] = rows.filter(_._3 == lang).flatMap {
      case (_, text, _, _) =>
        val ws = text.split(" ", -1)
        (0 to ws.length - 3).map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}")
    }.toSet
    for (lang <- Seq("en", "zz")) {
      val (nSet, vZero, sScaled, nExact, estRaw, nEst) = hllTwin(shinglesOf(lang))
      val errPpm = math.abs(nEst - nExact) * 1000000L / nExact
      assert(got(lang) === ((nSet, vZero, sScaled, nExact, estRaw, nEst, errPpm)), lang)
    }
    // branch coverage: zz must take linear counting, en the raw estimator
    val (_, zzV, _, _, zzRaw, _) = hllTwin(shinglesOf("zz"))
    assert(zzRaw <= 40 && zzV > 0, "zz must take the linear-counting branch")
    val (_, enV, _, enExact, enRaw, enEst) = hllTwin(shinglesOf("en"))
    assert(enRaw > 40 || enV == 0, "en must take the raw-estimator branch")
    // HLL sigma at m=16 is ~26%; the seeded corpus should land within 3 sigma
    assert(math.abs(enEst - enExact).toDouble / enExact < 0.78,
      s"est $enEst vs exact $enExact")
  }
}
