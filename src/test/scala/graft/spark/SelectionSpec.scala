package graft.spark

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DocTextOps, FixedLog, Selection}

class SelectionSpec extends AnyFunSuite with SparkFixture {

  private def docs(rows: (Long, String, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
  }

  // ---- FixedLog -----------------------------------------------------------

  test("FixedLog.lp: exact at powers of two, ≤0.102-bit interpolation error, monotone") {
    assert(FixedLog.lp(1) === 0L)
    var k = 0
    while (k < 40) { assert(FixedLog.lp(1L << k) === 64L * k); k += 1 }
    val rnd = new scala.util.Random(42)
    var prevV = 1L
    var prevLp = 0L
    (1 to 5000).foreach { _ =>
      val v = 1L + rnd.nextInt(1 << 20)
      val err = FixedLog.lp(v) / 64.0 - math.log(v.toDouble) / math.log(2.0)
      // analytic interpolation max ~0.0861 bits + up to 1/64 DIV truncation
      assert(math.abs(err) <= 0.102, s"v=$v err=$err")
      if (v >= prevV) assert(FixedLog.lp(v) >= prevLp)
      prevV = v; prevLp = FixedLog.lp(v)
    }
  }

  test("FixedLog: the Spark SQL fragment equals the JVM twin") {
    import spark.implicits._
    val vs = (1L to 300L) ++ Seq(1023L, 1024L, 1025L, (1L << 40) - 1, 1L << 40)
    val got = vs.toDF("v").selectExpr("v", s"${FixedLog.spark("v")} AS lp")
      .as[(Long, Long)].collect().toMap
    vs.foreach(v => assert(got(v) === FixedLog.lp(v), s"v=$v"))
  }

  // ---- lmScore ------------------------------------------------------------

  test("lmScore: hand-computed add-one bigram familiarity") {
    // ref slice (en): doc 1 bigrams "a b"(x2), "b a"(x1)
    val d = docs(
      (1L, "a b a b", "en", "s0"),
      (2L, "a b x", "fr", "s1"))
    val r = Selection.lmScore(d).collect().map(r =>
      (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: lp(3)+lp(2)+lp(3) = 96+64+96 = 256 over 3 bigrams
    assert(r(1L) === ((3L, 256L, 85L)))
    // doc 2: "a b" seen twice in ref -> lp(3)=96; "b x" unseen -> lp(1)=0
    assert(r(2L) === ((2L, 96L, 48L)))
  }

  // ---- dsirWeights --------------------------------------------------------

  test("dsirWeights: target docs score 0, off-target docs positive, never negative") {
    // en and fr share no bigrams; if their hash buckets happen to collide the
    // en weights would only move UP, so the ≥0 invariant is unconditional
    val d = docs(
      (1L, "a b a b a b", "en", "s0"),
      (2L, "a b a b", "en", "s0"),
      (3L, "u v w u v", "fr", "s1"))
    val r = Selection.dsirWeights(d).collect().map(r =>
      (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(r.values.forall(_._2 >= 0L), "neg log ratio must be non-negative")
    // doc 3's buckets hold no en bigrams: every gram pays lp(r+1) > 0
    assert(r(3L)._2 > 0L)
    // docs 1+2 are the whole en slice; their buckets are pure-target unless
    // an fr bigram collides — verify no collision, then expect exactly 0
    val b = d.where("size(split(text, ' ')) >= 2")
      .selectExpr("lang", s"${graft.ops.Shingles.ws} AS ws")
      .selectExpr("lang", s"explode(${graft.ops.Shingles.grams(2, distinct = false)}) AS g")
      .selectExpr("lang", s"${graft.ops.Shingles.h32("g")} % ${Selection.DefaultDsirBuckets} AS bk")
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val en = b.filter(_._1 == "en").map(_._2).toSet
    val fr = b.filter(_._1 == "fr").map(_._2).toSet
    if ((en & fr).isEmpty) { assert(r(1L)._2 === 0L); assert(r(2L)._2 === 0L) }
  }

  // ---- bloomDecontaminate -------------------------------------------------

  test("bloomDecontaminate: no false negatives, exact path == decontaminate") {
    // doc 0 is the benchmark slice (0 % 97 == 0)
    val d = docs(
      (0L, "w1 w2 w3 w4 w5", "en", "s0"),
      (1L, "w1 w2 w3 w4 x y z", "en", "s0"),
      (2L, "q r s t u", "fr", "s1"),
      (3L, "w2 w3 w4 w5 q", "de", "s2"))
    val r = DocTextOps.bloomDecontaminate(d).collect().map(r =>
      (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    r.values.foreach { case (_, bloom, exact, fp, flagged) =>
      assert(bloom >= exact, "a Bloom filter must not produce false negatives")
      assert(fp === bloom - exact)
      assert(flagged === (bloom > 0L))
    }
    assert(r(1L)._3 === 1L) // "w1 w2 w3 w4"
    assert(r(3L)._3 === 1L) // "w2 w3 w4 w5"
    val ex = DocTextOps.decontaminate(d).collect().map(r =>
      (r.getLong(0), r.getLong(1))).toMap
    r.foreach { case (id, (_, _, exact, _, _)) => assert(exact === ex(id), s"doc $id") }
  }

  test("bloomDecontaminate: a deliberately tiny filter shows measured false positives") {
    // 300 random 6-token docs against a 64-bit filter: bench grams saturate
    // the bits, so clean docs must collide somewhere (seeded => reproducible)
    val rnd = new scala.util.Random(7)
    val rows = (0L until 300L).map { id =>
      val toks = Seq.fill(6)("t" + rnd.nextInt(900))
      (id, toks.mkString(" "), "en", "s0")
    }
    val out = DocTextOps.bloomDecontaminate(docs(rows: _*), mBits = 64).collect()
    out.foreach(r => assert(r.getLong(2) >= r.getLong(3)))
    assert(out.map(_.getLong(4)).sum > 0L, "expected measurable false positives at 64 bits")
  }

  // ---- sourceCap ----------------------------------------------------------

  test("sourceCap: two-stage top-k equals the row_number window on a skewed corpus") {
    val rnd = new scala.util.Random(11)
    // one hot source with 200 docs, several cool ones; duplicate diversity
    // values force the doc_id tie-break
    val rows = (0L until 260L).map { id =>
      val src = if (id < 200) "hot" else "s" + (id % 5)
      val toks = Seq.fill(4 + rnd.nextInt(4))("w" + rnd.nextInt(6))
      (id, toks.mkString(" "), "en", src)
    }
    val d = docs(rows: _*).repartition(7)
    val got = Selection.sourceCap(d, cap = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val want = d.selectExpr("doc_id", "source",
        "(CAST(size(array_distinct(split(text, ' '))) AS BIGINT) * 1000000) DIV size(split(text, ' ')) AS dv")
      .selectExpr("doc_id", "source", "dv",
        "row_number() OVER (PARTITION BY source ORDER BY dv DESC, doc_id) AS rk")
      .where("rk <= 3").orderBy("source", "rk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3).toLong))
    assert(got.toSeq === want.toSeq)
    assert(got.count(_._2 == "hot") === 3)
  }

  test("sourceCap: null text/source rows are excluded, not NPEd") {
    import spark.implicits._
    val d = Seq((1L, "a b c", "en", "s0"), (2L, null, "en", "s0"), (3L, "d e", "en", null))
      .toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source", "CAST(0 AS BIGINT) AS n_chars")
    val got = Selection.sourceCap(d, cap = 5).collect()
    assert(got.map(_.getLong(0)).toSet === Set(1L))
  }
}
