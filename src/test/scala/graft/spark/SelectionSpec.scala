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

  // ---- pplBuckets ---------------------------------------------------------

  test("pplBuckets: per-language value terciles of the LM score, ties share a bucket") {
    val rnd = new scala.util.Random(7)
    val words = Array("a", "b", "c", "d", "e", "f", "g")
    val rows = (0L until 60L).map { i =>
      val lang = Seq("en", "de", "fr")((i % 3).toInt)
      val n = 3 + rnd.nextInt(10)
      (i, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" "), lang, s"s${i % 4}")
    }
    val d = docs(rows: _*)
    val got = Selection.pplBuckets(d).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getString(3))))
    // JVM replay: per-lang cumulative-above counts over score VALUES
    val avg = Selection.lmScore(d).collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val langOf = rows.map(r => r._1 -> r._3).toMap
    val expect = avg.toSeq.groupBy { case (id, _) => langOf(id) }.flatMap { case (_, xs) =>
      val n = xs.size
      val scoreCounts = xs.groupBy(_._2).view.mapValues(_.size).toSeq.sortBy(-_._1)
      val cumAbove = scoreCounts.scanLeft(0)((acc, sc) => acc + sc._2)
      val bucketOf = scoreCounts.zip(cumAbove).map { case ((s, _), cAbove) =>
        s -> (if (3 * cAbove < n) "head" else if (3 * cAbove < 2 * n) "middle" else "tail")
      }.toMap
      xs.map { case (id, s) => id -> bucketOf(s) }
    }
    assert(got.length === avg.size)
    got.foreach { case (id, (l, s, b)) =>
      assert(l === langOf(id))
      assert(s === avg(id))
      assert(b === expect(id), s"doc $id")
    }
    // non-vacuous: every language realizes all three buckets on this corpus
    got.groupBy(_._2._1).foreach { case (l, g) =>
      assert(g.map(_._2._3).toSet === Set("head", "middle", "tail"), l)
    }
    // equal scores never straddle a bucket boundary
    got.groupBy(g => (g._2._1, g._2._2)).values
      .foreach(g => assert(g.map(_._2._3).toSet.size === 1))
  }

  // ---- tokenBudget --------------------------------------------------------

  test("annealPlan: budgets split main/anneal, head groups train hotter") {
    val rnd = new scala.util.Random(11)
    val words = Array("a", "b", "c", "d", "e", "f", "g")
    val rows = (0L until 60L).map { i =>
      val lang = Seq("en", "de", "fr")((i % 3).toInt)
      val n = 3 + rnd.nextInt(10)
      (i, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" "), lang, s"s${i % 4}")
    }
    val d = docs(rows: _*)
    val got = Selection.annealPlan(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got.keySet.map(_._1) === Set("en", "de", "fr"))
    val corpus = got.values.map(_._2).sum
    val budget = corpus / 1000 * 2000 + corpus % 1000 * 2000 / 1000
    val annealBudget = budget / 1000 * 100 + budget % 1000 * 100 / 1000
    // anneal allocation lands ONLY on head groups and nearly exhausts its
    // budget (floor rounding drops < 1 token per group)
    got.foreach { case ((_, bucket), (_, _, _, anneal, _, _)) =>
      if (bucket == "head") assert(anneal > 0L) else assert(anneal === 0L)
    }
    val annealSum = got.values.map(_._4).sum
    assert(annealSum <= annealBudget && annealSum >= annealBudget - got.size)
    // main allocation nearly exhausts the main budget
    val mainSum = got.values.map(_._3).sum
    assert(mainSum <= budget - annealBudget && mainSum >= budget - annealBudget - got.size)
    // head groups of each language train strictly hotter than their
    // middle/tail siblings (they absorb the anneal budget on top)
    got.groupBy(_._1._1).foreach { case (_, g) =>
      val byBucket = g.map { case ((_, b), v) => b -> v._6 }
      for (other <- Seq("middle", "tail") if byBucket.contains(other))
        assert(byBucket("head") > byBucket(other))
    }
    assert(Selection.annealPlan(d.repartition(7)).collect().toSeq ===
      Selection.annealPlan(d).collect().toSeq)
    intercept[IllegalArgumentException](Selection.annealPlan(d, annealFracPermille = 1001L))
  }

  test("tokenBudget: hand-computed greedy prefix, straddling bin split per-doc") {
    val d = docs(
      (1L, "a b c d", "en", "s"), //  4 tokens, score 1000000, cum  4 keep
      (2L, "a b c c", "en", "s"), //  4 tokens, score  750000, cum  8 keep
      (3L, "x y z z", "en", "s"), //  4 tokens, score  750000, cum 12 drop (boundary bin)
      (4L, "p q r r", "en", "s"), //  4 tokens, score  750000, cum 16 drop
      (5L, "a a a b", "en", "s"), //  score  500000 — whole bin past the line
      (6L, "a a a a a", "en", "s")) // score 200000
    val got = Selection.tokenBudget(d, budget = 10L).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L) === ((4L, 1000000L, true)))
    assert(got(2L) === ((4L, 750000L, true)))
    assert(got(3L) === ((4L, 750000L, false)))
    assert(got(4L) === ((4L, 750000L, false)))
    assert(!got(5L)._3 && !got(6L)._3)
  }

  test("tokenBudget: equals the naive global running-sum prefix on a random corpus") {
    val rnd = new scala.util.Random(11)
    val words = Array("a", "b", "c", "d", "e")
    val rows = (0L until 80L).map { i =>
      val n = 1 + rnd.nextInt(12)
      (i, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" "), "en", "s")
    }
    val budget = 250L
    val got = Selection.tokenBudget(docs(rows: _*), budget).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val naive = rows.map { case (id, txt, _, _) =>
      val ws = txt.split(" ")
      (id, ws.length.toLong, ws.distinct.length.toLong * 1000000L / ws.length)
    }.sortBy { case (id, _, s) => (-s, id) }
    var cum = 0L
    naive.foreach { case (id, n, _) =>
      cum += n
      assert(got(id) === (cum <= budget), s"doc $id cum=$cum")
    }
    // the budget line lands strictly inside the corpus (both verdicts real)
    assert(got.values.exists(identity) && got.values.exists(!_))
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

  // ---- stupidBackoff ------------------------------------------------------

  test("stupidBackoff: hand-computed three-level backoff scores") {
    // ref slice (en): doc 1 "a b a" -> N=3, uni a:2 b:1, bigrams "a b":1 "b a":1
    val d = docs(
      (1L, "a b a", "en", "s0"),
      (2L, "a b x", "fr", "s1"),
      (3L, "z z", "fr", "s1"),
      (4L, "b b", "fr", "s1"))
    val r = Selection.stupidBackoff(d).collect().map(r =>
      (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val a = Selection.BackoffAlphaLog2X64
    // doc 1: (a,b) seen lp(1)-lp(2) = -64; (b,a) seen lp(1)-lp(1) = 0
    assert(r(1L) === ((2L, 0L, 0L, -64L, -32L)))
    // doc 2: (a,b) seen -> -64; (b,x): x OOV -> 2a - lp(3) = -170 - 96
    assert(r(2L) === ((2L, 0L, 1L, -64L + 2 * a - 96L, (-64L + 2 * a - 96L) / 2)))
    // doc 3: (z,z) OOV
    assert(r(3L) === ((1L, 0L, 1L, 2 * a - 96L, 2 * a - 96L)))
    // doc 4: (b,b) unseen bigram, b in vocab -> backoff: a + lp(1) - lp(3)
    assert(r(4L) === ((1L, 1L, 0L, a - 96L, a - 96L)))
  }

  test("stupidBackoff: reference-language docs never back off; scores are MLE-consistent") {
    val rnd = new scala.util.Random(23)
    val rows = (0L until 120L).map { id =>
      val lang = if (id % 3 == 0) "en" else "fr"
      val toks = Seq.fill(5 + rnd.nextInt(6))(lang + rnd.nextInt(12))
      (id, toks.mkString(" "), lang, "s0")
    }
    val out = Selection.stupidBackoff(docs(rows: _*)).collect()
    out.foreach { r =>
      val (id, nb, nBack, nOov) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      if (id % 3 == 0) {
        // en doc bigrams are by construction IN the model
        assert(nBack === 0L && nOov === 0L, s"doc $id")
      } else {
        // fr tokens never appear in the en slice: every position is OOV
        assert(nOov === nb, s"doc $id")
      }
    }
  }

  // ---- perceptron ---------------------------------------------------------

  test("perceptron: hand-computed passes on a bucket-disjoint separable corpus") {
    // md5-h32 buckets: 'aa' -> 10, 'bb' -> 216 (disjoint; pinned below);
    // sample order by (h32(id.toString), id) is doc 1, 2, 3 (hashes
    // 3301589560 < 3357438605 < 3972778110)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(t: String): Long =
      graft.ops.Shingles.sliceU32(md.digest(t.getBytes("UTF-8")), 0)
    assert(h32("aa") % Selection.ClfBuckets !== h32("bb") % Selection.ClfBuckets)
    assert(Seq("1", "2", "3").map(h32) === Seq("1", "2", "3").map(h32).sorted)
    val d = docs(
      (1L, "aa aa", "en", "s0"),
      (2L, "bb", "fr", "s1"),
      (3L, "bb bb bb", "fr", "s1"))
    val hist = Selection.perceptronTrain(d).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // pass 1: d1 margin 0 -> update (w[aa]=2, b=1); d2 margin y·(1)=-1 ->
    // update (w[bb]=-1, b=0); d3 margin y·(-3)=3 -> ok. Passes 2-3 clean:
    // separable corpus converges and stays converged.
    assert(hist.toSeq === Seq(
      (1L, 3L, 2L, 0L, 3L),
      (2L, 3L, 0L, 0L, 3L),
      (3L, 3L, 0L, 0L, 3L)))
    // averaging accumulators after 9 steps: wsum[aa]=18, wsum[bb]=-8,
    // bsum=1 -> margins 1+18·2=37, 1-8·1=-7, 1-8·3=-23
    val score = Selection.perceptronScore(d).collect().map(r =>
      (r.getLong(0), (r.getLong(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))))
    assert(score.toSeq === Seq(
      (1L, (37L, true, true, true)),
      (2L, (-7L, false, false, true)),
      (3L, (-23L, false, false, true))))
  }

  test("perceptron: partition-invariant, bounded sample, score consistency") {
    val rnd = new scala.util.Random(31)
    val rows = (0L until 150L).map { id =>
      val lang = if (rnd.nextBoolean()) "en" else "fr"
      val toks = Seq.fill(4 + rnd.nextInt(8))(lang.take(1) + rnd.nextInt(40))
      (id, toks.mkString(" "), lang, "s0")
    }
    val d5 = docs(rows: _*).repartition(5)
    val train = Selection.perceptronTrain(d5).collect()
    assert(train.length === Selection.ClfPasses)
    train.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === i + 1L)
      assert(r.getLong(1) === 150L) // corpus < ClfTrainN: whole corpus trains
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 150L)
    }
    // disjoint per-lang vocab ('e…' vs 'f…' tokens): separable unless the
    // 256-bucket hash collides a pair, so training must make SOME progress
    assert(train.last.getLong(2) < train.head.getLong(2) || train.head.getLong(2) === 0L)
    val score = Selection.perceptronScore(d5).collect()
    assert(score.length === 150)
    score.foreach { r =>
      assert(r.getBoolean(4) === (r.getBoolean(2) == r.getBoolean(3)))
      assert(r.getBoolean(2) === (r.getLong(1) > 0L))
    }
    // sequential training visits the sample in (hash, id) order, so the
    // result must not depend on how the input was partitioned
    val d9 = docs(rows: _*).repartition(9)
    assert(Selection.perceptronTrain(d9).collect().toSeq === train.toSeq)
    assert(Selection.perceptronScore(d9).collect().toSeq === score.toSeq)
    // bounded training set: trainN caps the sample, scoring still covers all
    val trainCapped = Selection.perceptronTrain(d5, trainN = 16)
    assert(trainCapped.collect().forall(_.getLong(1) === 16L))
    assert(Selection.perceptronScore(d5, trainN = 16).collect().length === 150)
  }

  // ---- ccnetPipeline ------------------------------------------------------

  test("ccnetPipeline: equals the composition of its public stages; every branch realizes") {
    import org.apache.spark.sql.functions.col
    // Natural-language sentences so the trigram stage genuinely splits the
    // corpus; two near-identical docs so keep-best dedup genuinely drops;
    // a one-token doc (unscorable survivor) and a letterless doc ('und').
    val en = Vector(
      "this is what they wanted to know about the things that were done",
      "the people said that they would come to the house in the morning",
      "there was nothing more to say about the state of the world today",
      "what they found in the house was not what they had hoped to find",
      "it was the best of times and it was the worst of times for them",
      "she walked to the market in the morning to buy bread and butter")
    val de = Vector(
      "das ist was sie wissen wollten ueber die dinge die getan wurden",
      "die leute sagten dass sie am morgen zu dem haus kommen wuerden",
      "es gab nichts mehr zu sagen ueber den zustand der welt von heute",
      "was sie in dem haus fanden war nicht das was sie erhofft hatten",
      "es war die beste der zeiten und es war die schlechteste der zeiten",
      "sie ging am morgen zu dem markt um brot und butter zu kaufen")
    val dupA = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    val dupB = dupA + " again" // near-dup of dupA -> one of the pair is dropped
    val rows =
      en.zipWithIndex.map { case (t, i) => (100L + i, t, "en", "s0") } ++
      de.zipWithIndex.map { case (t, i) => (200L + i, t, "de", "s1") } ++
      Seq((300L, dupA, "en", "s2"), (301L, dupB, "en", "s2"),
          (302L, "hello", "en", "s3"),          // 1 token: survives, unscorable
          (303L, "12345 999 777 999", "en", "s3")) // letterless -> lang_pred 'und'
    val d = docs(rows: _*)

    // Replay the documented composition through the PUBLIC stage operators.
    val keep = graft.ops.Dedup.dedupKeepBest(d).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val survIds = rows.map(_._1).filter(keep.getOrElse(_, false)).toSet
    val surv = d.where(col("doc_id").isInCollection(survIds))
    val pred = DocTextOps.langIdTrigram(surv).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val avg = Selection.lmScore(surv).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap // only >=2-token docs
    val scored = avg.keySet
    val bucketOf = scored.groupBy(pred).flatMap { case (_, ids) =>
      val n = ids.size
      val scoreCounts = ids.groupBy(avg).view.mapValues(_.size).toSeq.sortBy(-_._1)
      val cumAbove = scoreCounts.scanLeft(0)((acc, sc) => acc + sc._2)
      val byScore = scoreCounts.zip(cumAbove).map { case ((s, _), cAbove) =>
        s -> (if (3 * cAbove < n) "head" else if (3 * cAbove < 2 * n) "middle" else "tail")
      }.toMap
      ids.map(id => id -> byScore(avg(id)))
    }

    val got = Selection.ccnetPipeline(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), Option(r.getString(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          Option(r.getString(4)), r.getBoolean(5)))).toMap
    assert(got.keySet === rows.map(_._1).toSet) // one lineage row per input
    rows.map(_._1).foreach { id =>
      val (dk, lp, a, b, sel) = got(id)
      assert(dk === keep.getOrElse(id, false), s"doc $id dedup_keep")
      if (scored(id)) {
        assert(lp === Some(pred(id)), s"doc $id lang_pred")
        assert(a === Some(avg(id)), s"doc $id avg")
        assert(b === Some(bucketOf(id)), s"doc $id bucket")
        assert(sel === Set("head", "middle").contains(bucketOf(id)), s"doc $id selected")
      } else {
        // dedup-dropped or unscorable survivor: NULL trail, never selected
        assert(lp.isEmpty && a.isEmpty && b.isEmpty && !sel, s"doc $id null trail")
      }
    }
    // non-vacuous: both dedup verdicts, an unscorable survivor, an 'und'
    // prediction, all three buckets, both selected verdicts
    assert(got.values.map(_._1).toSet === Set(true, false))
    assert(got(302L)._1 && got(302L)._4.isEmpty)
    assert(got(303L)._2 === Some("und"))
    assert(got.values.flatMap(_._4).toSet === Set("head", "middle", "tail"))
    assert(got.values.map(_._5).toSet === Set(true, false))
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
