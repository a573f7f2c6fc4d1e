package graft.spark

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DocTextOps

/** Decontamination, repetition signals, and the count-min sketch on
  * hand-computed corpora (the DuckDB oracle covers the full synthetic
  * table; these pin the semantics on minimal cases). */
class CorpusHygieneSpec extends AnyFunSuite with SparkFixture {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
  }

  test("langIdStopword over the langTwinSql splice recovers each declared lang") {
    import spark.implicits._
    // one shared-vocab sentence per lang label (the natural-corpus shape:
    // indistinguishable by stopwords) — the twin plants the difference
    val rows = Seq((1L, "en"), (2L, "de"), (3L, "es"), (4L, "fr"), (5L, "zh"))
      .toDF("doc_id", "lang")
      .selectExpr("doc_id", "lang",
        "'the table of and join fast query' AS text")
    val twin = rows.selectExpr("doc_id", "lang",
      s"${graft.ops.DocTextOps.langTwinSql} AS text")
    val got = graft.ops.DocTextOps.langIdStopword(twin).collect()
      .map(r => r.getLong(0) -> r.getString(6)).toMap
    // planted langs win their own argmax (9+ planted hits beat the 3
    // natural en hits); en and unplanted zh keep 'the/of/and' -> 'en'
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr", 5L -> "en"))
    // plant count varies with doc_id so the score columns are non-constant
    val scores = graft.ops.DocTextOps.langIdStopword(twin).collect()
      .map(r => r.getLong(3)).toSet // score_de over all docs
    assert(scores.size > 1)
  }

  test("bpeTrain merges greedily left-to-right: 'x x x' merges ONCE per round") {
    // the real-BPE greedy rule the space-doubled replace encodes: three
    // adjacent identical tokens yield one merge, the survivor untouched
    val d = docs((1L, "x x x"), (2L, "a b a b"))
    val r = DocTextOps.bpeTrain(d, merges = 1).collect()
    assert(r.length === 1)
    val row = r.head
    // pair counts: "x x" appears 2x (overlapping!), "a b" 2x; tie-break
    // (count DESC, pair ASC) picks "a b"
    assert(row.getString(1) === "a b" && row.getString(2) === "a@@b")
    assert(row.getLong(3) === 2L)
    // both "a b" occurrences merged (disjoint), so tokens: (x x x)=3 +
    // (a@@b a@@b)=2
    assert(row.getLong(4) === 5L)

    val r2 = DocTextOps.bpeTrain(docs((1L, "x x x")), merges = 1).collect().head
    assert(r2.getString(1) === "x x")
    // greedy: ONE merge happens, the third x survives -> 2 tokens
    assert(r2.getLong(4) === 2L)
  }

  test("bpeTrain stops early when every document is fully merged") {
    val d = docs((1L, "a b"), (2L, "a b"))
    // round 1 merges both docs to a single token; round 2 has no pairs
    val r = DocTextOps.bpeTrain(d, merges = 4).collect()
    assert(r.length === 1)
    assert(r.head.getString(2) === "a@@b" && r.head.getLong(4) === 2L)
    // malformed whitespace is rejected, not silently mis-merged
    intercept[IllegalArgumentException](DocTextOps.bpeTrain(docs((1L, "a  b"))))
  }

  test("bpeEncode emits per-doc token stats under the learned merges") {
    // round 1 merges "a b" (tie-break), round 2 merges "x x" greedily once
    val d = docs((1L, "x x x"), (2L, "a b a b"))
    val got = DocTextOps.bpeEncode(d, merges = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got == List((1L, 2L, 1L), (2L, 2L, 2L)))
  }

  test("chunk and mixCorpus reject invalid parameters loudly") {
    val d = docs((1L, "a b c"))
    intercept[IllegalArgumentException](DocTextOps.chunk(d, window = 4, stride = 8))
    intercept[IllegalArgumentException](DocTextOps.chunk(d, window = 0, stride = 0))
    intercept[IllegalArgumentException](
      DocTextOps.mixCorpus(d, Map("s" -> 2000000L))) // share > 1e6 ppm
  }

  test("epochAllocation: budget slices, epoch counts, repeat cap on a hand corpus") {
    import spark.implicits._
    // sA: 10 tokens over 2 docs; sB: 10 tokens. budget = 10× corpus = 200.
    val d = Seq((1L, "a b c d e", "sA"), (2L, "f g h i j", "sA"),
      (3L, "k l m n o p q r s t", "sB")).toDF("doc_id", "text", "source")
    val got = DocTextOps.epochAllocation(d, Map("sA" -> 500000L),
        budgetPermille = 10000L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))).toMap
    // sA: alloc = 50% of 200 = 100 → 10 epochs of its 10 tokens, capped at 40
    assert(got("sA") === ((2L, 10L, 500000L, 100L, 10000L, 40L, true)))
    // sB: unlisted → share 0, zero-epoch row still present
    assert(got("sB") === ((1L, 10L, 0L, 0L, 0L, 0L, false)))
    intercept[IllegalArgumentException](
      DocTextOps.epochAllocation(d, Map("sA" -> 2000000L)))
    intercept[IllegalArgumentException](
      DocTextOps.epochAllocation(d, repeatCapEpochs = 0L))
  }

  test("fimTransform: PSM rendering reconstructs the document; cuts on the char grid") {
    val d = docs((0 to 60).map(i => (i.toLong, s"doc $i body tok$i end")): _*)
    val rows = DocTextOps.fimTransform(d).collect()
    assert(rows.length === 61)
    val byId = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val modes = rows.map(_.getString(1)).toSet
    assert(modes === Set("psm", "ar")) // both modes realize at rate 900‰
    rows.foreach { r =>
      val (id, mode, n, ft) = (r.getLong(0), r.getString(1), r.getLong(4), r.getString(5))
      val text = byId(id)
      assert(n === text.length.toLong)
      if (mode == "ar") {
        assert(r.isNullAt(2) && r.isNullAt(3) && ft === text)
      } else {
        val (lo, hi) = (r.getLong(2), r.getLong(3))
        assert(0L <= lo && lo <= hi && hi <= n)
        // parse the sentinel rendering back into (prefix, suffix, middle)
        val pat = "(?s)<\\|fim_prefix\\|>(.*)<\\|fim_suffix\\|>(.*)<\\|fim_middle\\|>(.*)".r
        ft match {
          case pat(p, s, m) =>
            assert(p === text.substring(0, lo.toInt))
            assert(m === text.substring(lo.toInt, hi.toInt))
            assert(s === text.substring(hi.toInt))
          case _ => fail(s"doc $id: unparseable PSM rendering: $ft")
        }
      }
    }
    // deterministic + partition-invariant; rate 0 = pure passthrough
    assert(DocTextOps.fimTransform(d.repartition(7)).collect().toSeq === rows.toSeq)
    val ar = DocTextOps.fimTransform(d, ratePerMille = 0L).collect()
    assert(ar.forall(r => r.getString(1) == "ar"))
    intercept[IllegalArgumentException](DocTextOps.fimTransform(d, ratePerMille = 1001L))
  }

  test("decontaminate flags docs sharing a 4-gram with the benchmark slice") {
    // doc 0 is the benchmark (0 % 97 = 0); doc 1 repeats one of its
    // 4-grams verbatim, doc 2 shares only shorter overlaps
    val d = docs(
      0L -> "alpha beta gamma delta epsilon",
      1L -> "x alpha beta gamma delta y",
      2L -> "alpha beta zeta gamma delta")
    val got = DocTextOps.decontaminate(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toList
    assert(got == List((1L, 1L, true), (2L, 0L, false)))
    val plan = DocTextOps.decontaminate(d).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark join must broadcast, got:\n$plan")
  }

  test("contamOverlap grades contamination as an exact n-gram fraction") {
    // doc 0 is the benchmark (0 % 97 = 0); doc 1 shares 1 of its 3
    // distinct 4-grams (333333 ppm >= DefaultContamPpm = 20000 -> drop),
    // doc 2 shares nothing, doc 3 is too short to produce a 4-gram
    val d = docs(
      0L -> "alpha beta gamma delta epsilon",
      1L -> "x alpha beta gamma delta y",
      2L -> "alpha beta zeta gamma delta",
      3L -> "a b c")
    val got = DocTextOps.contamOverlap(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toList
    assert(got == List((1L, 3L, 1L, 333333L, true), (2L, 2L, 0L, 0L, false)))
    val plan = DocTextOps.contamOverlap(d).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark join must broadcast, got:\n$plan")
  }

  test("selectionPipeline composes quality, keep-best dedup, decon and split with per-stage lineage") {
    val benchText = "alpha beta gamma the delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma"                   // 19 tokens, has 'the'
    val passText = "the quick brown fox jumps over lazy dogs while many other " +
      "animals watch quietly from distant green hills today"   // 19 tokens, has 'the'
    val d = docs(
      0L -> benchText,                  // 0 % 97 = 0: the held-out benchmark
      1L -> "too short",                // fails the quality gate
      2L -> passText,                   // near-dup pair {2,3}: tie-break keeps 2
      3L -> (passText + " extra"),
      4L -> (benchText + " unique tail words here now"), // heavy 4-gram overlap -> contam
      5L -> ("a completely separate clean document about weather patterns and " +
        "ocean currents that keeps drifting toward warmer shores every season"))
    val got = DocTextOps.selectionPipeline(d).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getBoolean(3), r.getBoolean(5),
        r.getBoolean(7), if (r.isNullAt(8)) null else r.getString(8), r.getBoolean(9))))
      .toMap
    // (is_bench, q_keep, keep_best, contam_drop, split, selected)
    assert(got(0L)._1 && !got(0L)._6, "benchmark doc is never selected")
    assert(got(0L)._5 == null, "bench doc is outside the pool: no split")
    assert(!got(1L)._2 && got(1L)._5 == null && !got(1L)._6, "quality reject")
    assert(got(2L) == ((false, true, true, false, got(2L)._5, true)))
    assert(got(3L) == ((false, true, false, false, got(3L)._5, false)),
      "near-dup loser survives every other stage but is not selected")
    assert(got(2L)._5 == got(3L)._5 && got(2L)._5 != null,
      "cluster members share one split")
    assert(got(4L)._2 && got(4L)._3 && got(4L)._4 && !got(4L)._6,
      "contaminated doc passes quality+dedup but is dropped by decon")
    assert(got(5L) == ((false, true, true, false, got(5L)._5, true)))
  }

  test("qualityRules: every rule realizes a first-failure; boundary values inclusive") {
    val d = docs(
      // 20 words, 95 token chars (114 with spaces), 2 stopword tokens,
      // all-distinct, avg word len 4.75 → every rule passes
      1L -> ("the of mango apple bread chair plane train globe stone river " +
        "cloud field grass heart light money night ocean power"),
      2L -> "the of cat", //                        10 chars → min_chars first
      // 94 chars but 10 tokens → min_tokens is the FIRST failure
      3L -> ("the of waterfalls basketball helicopter dictionary watermelon " +
        "strawberry playground lighthouse"),
      // doc 1's shape with 'cat dog' for 'the of': avg 4.8 exactly (upper
      // bound inclusive) and ZERO stopword tokens → stopwords first
      4L -> ("cat dog mango apple bread chair plane train globe stone river " +
        "cloud field grass heart light money night ocean power"),
      // 'the of' + 18×'tree': diversity 3/20 → diversity fires BEFORE the
      // (also-failing) word_length rule
      5L -> ("the of tree tree tree tree tree tree tree tree tree tree tree " +
        "tree tree tree tree tree tree tree"),
      // 21 distinct short words, 82 chars: only word_length fails (avg 2.95)
      6L -> ("the of cat dog bat rat hen fox owl ant bee cow pig ram ewe elk " +
        "jay koi eel fly gnu"))
    val got = DocTextOps.qualityRules(d).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getString(11), r.getBoolean(12)))).toMap
    assert(got(1L) === ((114L, 20L, 2L, 1000000L, 4750000L, "", true)))
    assert(got(2L)._6 === "min_chars")
    assert(got(3L) === ((94L, 10L, 2L, 1000000L, 8500000L, "min_tokens", false)))
    assert(got(4L)._5 === 4800000L, "upper word-length bound is inclusive")
    assert(got(4L)._6 === "stopwords")
    assert(got(5L) === ((96L, 20L, 2L, 150000L, 3850000L, "diversity", false)))
    assert(got(6L) === ((82L, 21L, 2L, 1000000L, 2952380L, "word_length", false)))
    // rule-level flags agree with the lineage: doc 6 fails ONLY word_length
    val f6 = DocTextOps.qualityRules(d).where("doc_id = 6").collect()(0)
    assert((6 to 10).map(f6.getBoolean) === Seq(true, true, true, true, false))
  }

  test("repetitionSignals computes top-bigram and duplicated-trigram char shares") {
    // "a b a b a b": bigrams a·b ×3, b·a ×2 → top ("a b", 3);
    // trigrams "a b a" ×2, "b a b" ×2 → dup chars = 2*5 + 2*5 = 20
    val d = docs(5L -> "a b a b a b")
    val r = DocTextOps.repetitionSignals(d).collect().head
    assert(r.getLong(1) == 3L && r.getString(2) == "a b")
    assert(r.getLong(3) == 3L * 3 * 1000000L / 11) // top covers 9 of 11 chars
    assert(r.getLong(4) == 20L)
    assert(r.getLong(5) == 20L * 1000000L / 11)
  }

  test("repetitionSignals tie-breaks the top bigram to the lexicographically largest") {
    val r = DocTextOps.repetitionSignals(docs(7L -> "p q r s")).collect().head
    // all bigrams occur once -> max struct picks "r s"
    assert(r.getLong(1) == 1L && r.getString(2) == "r s")
  }

  test("cmsFreq estimates are exact counts when the width has no collisions, and never under") {
    val d = docs(
      0L -> "cat dog cat bird cat",
      1L -> "dog bird fish dog cat")
    // width 1024 >> 4 tokens -> no collisions: est == exact for all probes
    val wide = DocTextOps.cmsFreq(d, width = 1024, k = 4).collect()
    assert(wide.length == 4)
    wide.foreach(r => assert(r.getLong(1) == r.getLong(2) && r.getLong(3) == 0L, r.toString))
    assert(wide.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("cat" -> 4L, "dog" -> 3L, "bird" -> 2L, "fish" -> 1L))
    // width 1 -> every token lands in one cell: est = total tokens, never under
    val tight = DocTextOps.cmsFreq(d, width = 1, k = 4).collect()
    tight.foreach(r => assert(r.getLong(2) == 10L && r.getLong(2) >= r.getLong(1)))
  }

  test("invertedIndex emits sorted capped postings with uncapped df") {
    val d = docs(
      2L -> "apple banana apple",
      0L -> "banana cherry",
      1L -> "apple cherry cherry")
    val got = DocTextOps.invertedIndex(d, maxPostings = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toList
    // df counts ALL docs; postings capped at 2 lowest ids; repeats within a
    // doc collapse via array_distinct
    assert(got == List(
      ("apple", 2L, "1,2"),
      ("banana", 2L, "0,2"),
      ("cherry", 2L, "0,1")))
  }

  test("substrDedup merges overlapping duplicated windows into maximal spans") {
    import graft.ops.Dedup
    // docs 1 and 2 share their first 10 tokens -> duplicated 8-windows at
    // starts 0,1,2 in each -> ONE merged span [0, 10) of 3 windows
    val shared = "a b c d e f g h i j"
    val d = docs(
      1L -> s"$shared k l",
      2L -> s"$shared x y",
      3L -> "totally unrelated words with no duplicated runs at all here")
    val got = Dedup.substrDedup(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(got == List((1L, 0L, 10L, 3L), (2L, 0L, 10L, 3L)))
  }

  test("substrDedup finds WITHIN-document repeats and keeps gapped spans separate") {
    import graft.ops.Dedup
    // the 8-token run repeats at starts 0 and 9: gap 9 > w=8 -> two spans
    val run = "p q r s t u v w"
    val d = docs(4L -> s"$run Z $run")
    val got = Dedup.substrDedup(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(got == List((4L, 0L, 8L, 1L), (4L, 9L, 17L, 1L)))

    // two identical 16-token docs: all 9 windows duplicated, adjacency
    // (gap == w included) fuses them into one full-cover span [0, 16)
    val full = "a b c d e f g h i j k l m n o p"
    val got2 = Dedup.substrDedup(docs(5L -> full, 6L -> full)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(got2 == List((5L, 0L, 16L, 9L), (6L, 0L, 16L, 9L)))

    // docs shorter than the window (or null text) emit nothing, loudly not wrongly
    assert(Dedup.substrDedup(docs(7L -> "too short")).collect().isEmpty)
  }

  test("substrCut removes exactly the spans; untouched docs round-trip byte-for-byte") {
    import graft.ops.Dedup
    val shared = "a b c d e f g h i j"
    val clean = "totally unrelated words with no duplicated runs at all here"
    val d = docs(
      1L -> s"$shared k l",
      2L -> s"$shared x y",
      3L -> clean,
      7L -> "too short")
    val got = Dedup.substrCut(d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    def md5(s: String) = spark.sql(s"SELECT md5('$s')").head().getString(0)
    // docs 1/2: span [0,10) cut, survivors are the 2 trailing tokens
    assert(got(1L) === ((12L, 2L, 10L, md5("k l"))))
    assert(got(2L) === ((12L, 2L, 10L, md5("x y"))))
    // untouched docs: split-then-join is the identity
    assert(got(3L) === ((10L, 10L, 0L, md5(clean))))
    assert(got(7L) === ((2L, 2L, 0L, md5("too short"))))
    // a fully-duplicated doc cuts to the empty string
    val full = "a b c d e f g h i j k l m n o p"
    val wiped = Dedup.substrCut(docs(5L -> full, 6L -> full)).collect()
    wiped.foreach { r =>
      assert(r.getLong(2) === 0L)
      assert(r.getString(4) === md5(""))
    }
  }

  test("winnowPairs matches a sequential winnowing reference on random corpora") {
    import graft.ops.Dedup
    def h32(g: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    def fingerprints(text: String, k: Int, w: Int): Set[Long] = {
      val ws = text.split(" ", -1)
      if (ws.length < k + w - 1) return Set.empty
      val hs = (0 to ws.length - k).map(i => h32(ws.slice(i, i + k).mkString(" ")))
      (0 to hs.length - w).map { i =>
        var best = i
        for (j <- i + 1 until i + w) if (hs(j) <= hs(best)) best = j // rightmost min
        hs(best)
      }.toSet
    }
    // 5-token vocab: repeated grams force equal hashes, exercising the
    // rightmost tie rule; the dfCap=2 case makes the cap genuinely BIND
    // (hot grams hit df up to 40 docs), pinning that set sizes — like the
    // intersections — are counted over the df-FILTERED universe
    for ((seed, dfCap) <- Seq((5, Dedup.DefaultDfCap), (41, Dedup.DefaultDfCap), (41, 2L))) {
      val rnd = new scala.util.Random(seed)
      val corpus = (0L until 40L).map { id =>
        id -> Seq.fill(6 + rnd.nextInt(10))("w" + rnd.nextInt(5)).mkString(" ")
      }
      val fp = corpus.map { case (id, t) =>
        id -> fingerprints(t, Dedup.WinnowK, Dedup.WinnowW)
      }.toMap
      val df = fp.toSeq.flatMap { case (id, s) => s.map(h => (h, id)) }
        .groupBy(_._1).view.mapValues(_.size).toMap
      val okH = df.filter(_._2 <= dfCap).keySet
      if (dfCap == 2L)
        assert(okH.size < df.size, "dfCap=2 case must actually drop hot prints")
      val fpf = fp.view.mapValues(_ & okH).toMap // the df-filtered universe
      val ids = corpus.map(_._1)
      val want = (for {
        a <- ids; b <- ids if a < b
        sh = (fpf(a) & fpf(b)).size
        if sh >= Dedup.WinnowMinShared
      } yield (a, b, sh.toLong, fpf(a).size.toLong, fpf(b).size.toLong,
        sh.toLong * 1000000L / math.min(fpf(a).size, fpf(b).size)))
        .sortBy(t => (t._1, t._2))
      val got = Dedup.winnowPairs(docs(corpus: _*), dfCap = dfCap).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSeq
      assert(got == want, s"seed=$seed dfCap=$dfCap")
    }
  }

  test("exact dedup excludes null-text docs instead of collapsing them into one cluster") {
    import graft.ops.Dedup
    import spark.implicits._
    val d = Seq((1L, "same text"), (2L, "same text"), (3L, null), (4L, null))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(coalesce(length(text), 0) AS BIGINT) AS n_chars")
    val got = Dedup.exact(d).collect()
    // one real cluster; the two null-text docs contribute NO rows (they are
    // not duplicates of each other — there is no content to compare)
    assert(got.length === 1)
    assert(got.head.getLong(1) === 2L && got.head.getLong(2) === 1L)
    val tw = Dedup.streamDedupTwin(d.selectExpr("doc_id", "text", "doc_id AS epoch")).collect()
    assert(tw.map(_.getLong(0)).toSet === Set(1L))
  }

  test("incrementalMinhash: a shingle-less (short) delta doc surfaces as admitted") {
    import graft.ops.Dedup
    // deltaMod default: doc_id % mod = mod-1 marks delta. Doc 2 is delta
    // with only 2 tokens -> no 3-shingles -> no candidates -> admitted
    val mod = Dedup.DefaultDeltaMod
    val shortId = mod - 1 // smallest delta id
    val d = docs(
      0L -> "a b c d e f g",
      1L -> "h i j k l m n",
      shortId -> "x y")
    val got = Dedup.incrementalMinhash(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(got.contains(shortId), "short delta doc must not vanish from the verdicts")
    assert(got(shortId) === ((0L, 0L, true)))
  }

  test("stopword counting is token-exact: adjacent repeats all count") {
    // the padded-replace trick counted 'the the the' as 2 (matches share
    // the padding space); the token filter counts 3
    val d = docs(1L -> "the the the", 2L -> "a the a of", 3L -> "xtheyx athe thea")
    val got = DocTextOps.qualityScore(d).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(1L -> 3L, 2L -> 4L, 3L -> 0L))
  }

  test("winnowing guarantee: a shared k+w-1 token run yields a shared fingerprint") {
    import graft.ops.Dedup
    // run of exactly k+w-1 = 6 tokens; everything else disjoint
    val d = docs(
      1L -> "a1 a2 s1 s2 s3 s4 s5 s6",
      2L -> "s1 s2 s3 s4 s5 s6 b1 b2 b3")
    val got = Dedup.winnowPairs(d, minShared = 1L).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
    // identical documents: every fingerprint shared, containment exactly 1e6
    val same = "p q r s t u v w x y z"
    val eq = Dedup.winnowPairs(docs(5L -> same, 6L -> same), minShared = 1L).collect()
    assert(eq.length === 1)
    assert(eq.head.getLong(2) === eq.head.getLong(3)) // shared == a_prints
    assert(eq.head.getLong(5) === 1000000L)
  }

  test("substrDedup matches a brute-force sequential reference on dense random corpora") {
    import graft.ops.Dedup
    // 3-word vocab + w=4 forces heavy window repetition within and across
    // docs — the stress case for the gaps-and-islands merge
    val w = 4
    for (seed <- Seq(11, 97, 3023)) {
      val rnd = new scala.util.Random(seed)
      val corpus = (0L until 12L).map { id =>
        id -> Seq.fill(3 + rnd.nextInt(20))(Seq("a", "b", "c")(rnd.nextInt(3))).mkString(" ")
      }
      // sequential reference: count every w-window, merge duplicated starts
      val wins = corpus.flatMap { case (id, t) =>
        val ws = t.split(" ", -1)
        (0 to ws.length - w).map(s => (id, s.toLong, ws.slice(s, s + w).mkString(" ")))
      }
      val dupTexts = wins.groupBy(_._3).filter(_._2.size >= 2).keySet
      val want = wins.filter(p => dupTexts(p._3)).groupBy(_._1).toSeq.flatMap { case (id, ps) =>
        val starts = ps.map(_._2).sorted
        val spans = starts.foldLeft(List.empty[(Long, Long, Long)]) {
          case ((s0, e0, n0) :: rest, s) if s <= e0 => (s0, math.max(e0, s + w), n0 + 1) :: rest
          case (acc, s) => (s, s + w, 1L) :: acc
        }.reverse
        spans.map { case (s, e, n) => (id, s, e, n) }
      }.sortBy(p => (p._1, p._2))
      val got = Dedup.substrDedup(docs(corpus: _*), w).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
      assert(got == want.toList, s"seed $seed")
      assert(got.nonEmpty, s"seed $seed must exercise the merge")
    }
  }

  test("shardCorpus: deterministic pack permutation, dense per-shard ranks, hash order") {
    // 40 docs of 1..5 tokens → 15 packs at budget 8, spread over 4 shards
    val d = docs((0L until 40L).map(i =>
      (i, Seq.fill((i % 5 + 1).toInt)("w").mkString(" "))): _*)
    def run() = DocTextOps.shardCorpus(d, budget = 8L, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val got = run()
    // a permutation of the packs: nothing lost, nothing duplicated
    val packs = DocTextOps.packSequences(d, 8L).select("pack_id")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet === packs && got.length === packs.size)
    // every doc and token is conserved through the pack grouping
    assert(got.map(_._4).sum === 40L)
    assert(got.map(_._5).sum === 120L)
    // within each shard the read order is dense 1..n
    got.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq,
        s"shard $sh ranks not dense")
    }
    // the layout is a pure function of the ids: a re-run is identical
    assert(run().toSeq === got.toSeq)
    // and the within-shard order genuinely decorrelates from pack order
    // (deterministic data, so this either always holds or never does)
    assert(got.groupBy(_._2).values.exists { rows =>
      rows.sortBy(_._3).map(_._1).toSeq != rows.map(_._1).sorted.toSeq
    }, "hash order degenerated to ascending pack ids in every shard")
    intercept[IllegalArgumentException](DocTextOps.shardCorpus(d, nShards = 0))
  }
}
