package graft.spark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.extract.Extractor
import graft.core.seg.Demarcator
import graft.gen.SyntheticTranscripts
import graft.pipeline.Pipeline
import graft.schema._

/** Every distributed route × several CORPUS SEEDS against the sequential
  * oracle: PipelineSpec proves route equality on the canonical seed-42
  * corpus; this spec re-derives the invariant on fresh corpus shapes so a
  * route bug that happens to be invisible under one rule/page distribution
  * (e.g. an ordering assumption only violated by a specific Sequence mix)
  * still fails. All four routes — broadcast-fused, cogroup-fused,
  * two-stage salted, whole-operator Catalyst — must agree field for field,
  * with shuffled input. */
class RouteEquivalenceSpec extends AnyFunSuite with SparkFixture {

  private def oracle(seed: Long, nConvs: Long): Seq[ConvSegment] =
    (0L until nConvs).flatMap(SegmentOracle.segments(seed, _))
      .sortBy(s => (s.conv_id, s.Sequence.toInt))

  for (seed <- Seq(7L, 1234L, 98765L, 13L, 271828L, 314159L, 5550123L, 86400L)) {
    test(s"all four routes equal the sequential oracle (corpus seed $seed)") {
      import spark.implicits._
      val nConvs = 40L
      val want = oracle(seed, nConvs)
      assert(want.nonEmpty)
      val turns = SyntheticTranscripts.turns(spark, nConvs, seed)
        .orderBy(hash($"text")).as[Turn] // shuffled input on every route
      val rules = SyntheticTranscripts.rules(spark, nConvs, seed)
      val ruleMap = (0L until nConvs).map { ci =>
        SyntheticTranscripts.convId(ci) ->
          SyntheticTranscripts.rulesFor(seed, ci).map(Pipeline.toCoreRule)
      }.toMap
      val bc = spark.sparkContext.broadcast(ruleMap)
      def norm(xs: Array[ConvSegment]): Seq[ConvSegment] =
        xs.sortBy(s => (s.conv_id, s.Sequence.toInt)).toSeq
      assert(norm(Pipeline.segmentFused(turns, bc).collect()) == want, "broadcast-fused")
      assert(norm(Pipeline.segmentFusedCogroup(turns, rules).collect()) == want, "cogroup-fused")
      assert(norm(Pipeline.segmentCogroup(Pipeline.extract(turns), rules).collect()) == want,
        "two-stage salted")
      val viaCatalyst = graft.plans.SegmentPlans.segmentJoin(turns, rules, None)
        .as[ConvSegment].collect()
      assert(norm(viaCatalyst) == want, "whole-operator catalyst")
    }
  }

  import RouteEquivalenceSpec.mutate

  for (seed <- Seq(31L, 4242L, 161803L, 2718L, 777L, 424243L)) {
    test(s"all four routes equal the sequential fold on an ADVERSARIAL rule corpus (seed $seed)") {
      import spark.implicits._
      val nConvs = 25L
      val turns = SyntheticTranscripts.turns(spark, nConvs, seed)
        .orderBy(hash($"text")).as[Turn]
      val rules = SyntheticTranscripts.rules(spark, nConvs, seed).map(mutate)
      val ruleMap = (0L until nConvs).map { ci =>
        SyntheticTranscripts.convId(ci) ->
          SyntheticTranscripts.rulesFor(seed, ci).map(r => Pipeline.toCoreRule(mutate(r)))
      }.toMap
      val bc = spark.sparkContext.broadcast(ruleMap)
      // sequential fold over the SAME mutated rules; demarcateIsolated,
      // because mutation case 4 plants a non-integer StartingMinusN —
      // int("x") raises in the reference too (ocr_processor.py:457) and
      // must quarantine that conversation identically on every route
      val want = (0L until nConvs).flatMap { ci =>
        val cid = SyntheticTranscripts.convId(ci)
        val pages = SyntheticTranscripts.turnsFor(seed, ci).sortBy(_.turn_idx)
          .map(t => Extractor.safeExtract(t.tool, t.text)._1.text)
        Demarcator.demarcateIsolated(pages.toVector, ruleMap(cid))._1.map { r =>
          ConvSegment(cid, r.DocReceivedId.getOrElse(0L), r.FromPageNumber,
            r.ToPageNumber, r.FileNumber.getOrElse(""), r.DocumentTypeId.getOrElse(""),
            r.UploadDataSheetId.getOrElse(0L), r.TotalNumberOfpages, r.NoOfPages,
            r.Sequence.getOrElse(""), r.SessionId.getOrElse(""))
        }
      }.sortBy(s => (s.conv_id, s.Sequence.toInt))
      assert(want.nonEmpty)
      def norm(xs: Array[ConvSegment]): Seq[ConvSegment] =
        xs.sortBy(s => (s.conv_id, s.Sequence.toInt)).toSeq
      assert(norm(Pipeline.segmentFused(turns, bc).collect()) == want, "broadcast-fused")
      assert(norm(Pipeline.segmentFusedCogroup(turns, rules).collect()) == want, "cogroup-fused")
      assert(norm(Pipeline.segmentCogroup(Pipeline.extract(turns), rules).collect()) == want,
        "two-stage salted")
      assert(norm(graft.plans.SegmentPlans.segmentJoin(turns, rules, None)
        .as[ConvSegment].collect()) == want, "whole-operator catalyst")
    }
  }

  test("poisoned rule decode quarantines ONE conversation identically on all four routes") {
    import spark.implicits._
    val (seed, nConvs) = (7L, 12L)
    // conv-0's rules get Sequence="" (the reference's int("") ValueError),
    // conv-1's get a non-integer — both must quarantine (zero segments,
    // job completes); every other conversation must be untouched
    val poisonedIds = Set(SyntheticTranscripts.convId(0L), SyntheticTranscripts.convId(1L))
    def poison(r: ConvRule): ConvRule =
      if (r.conv_id == SyntheticTranscripts.convId(0L)) r.copy(Sequence = "")
      else if (r.conv_id == SyntheticTranscripts.convId(1L)) r.copy(Sequence = "not-a-number")
      else r
    val turns = SyntheticTranscripts.turns(spark, nConvs, seed)
      .orderBy(hash($"text")).as[Turn]
    val rules = SyntheticTranscripts.rules(spark, nConvs, seed).map(poison)
    val ruleMap = (0L until nConvs).map { ci =>
      SyntheticTranscripts.convId(ci) ->
        SyntheticTranscripts.rulesFor(seed, ci).map(r => Pipeline.toCoreRule(poison(r)))
    }.toMap
    val bc = spark.sparkContext.broadcast(ruleMap)
    val want = oracle(seed, nConvs).filterNot(s => poisonedIds.contains(s.conv_id))
    assert(want.nonEmpty)
    def norm(xs: Array[ConvSegment]): Seq[ConvSegment] =
      xs.sortBy(s => (s.conv_id, s.Sequence.toInt)).toSeq
    def check(got: Array[ConvSegment], route: String): Unit = {
      assert(got.count(s => poisonedIds.contains(s.conv_id)) == 0,
        s"$route: poisoned conversations must emit zero segments")
      assert(norm(got) == want, s"$route: unpoisoned conversations diverged")
    }
    check(Pipeline.segmentFused(turns, bc).collect(), "broadcast-fused")
    check(Pipeline.segmentFusedCogroup(turns, rules).collect(), "cogroup-fused")
    check(Pipeline.segmentCogroup(Pipeline.extract(turns), rules).collect(), "two-stage salted")
    check(graft.plans.SegmentPlans.segmentJoin(turns, rules, None)
      .as[ConvSegment].collect(), "whole-operator catalyst")
    // the stats-carrying routes also surface the quarantine in lineage:
    // the two poisoned conversations PLUS the corpus's planted U+FFFD
    // extraction corruptions tick the error counter, nothing else
    val corruptTurns = (0L until nConvs).map(ci => SyntheticTranscripts.turnsFor(seed, ci)
      .count(_.text.indexOf(Extractor.CorruptMarker) >= 0)).sum
    val acc = new graft.pipeline.PartitionStatsAcc
    spark.sparkContext.register(acc, "poisoned_route_stats")
    Pipeline.segmentFusedCogroup(turns, rules, stats = Some(acc)).collect()
    assert(acc.value.values.map(_._3).sum == 2L + corruptTurns,
      s"lineage must count 2 rule quarantines + $corruptTurns extraction " +
        s"corruptions, got ${acc.value}")
  }
}

/** Companion holding the closure-safe mutation (a suite method would drag
  * the non-serializable ScalaTest engine into the Spark closure). */
object RouteEquivalenceSpec {
  /** Deterministic ADVERSARIAL rule mutation — fat identifiers, missing
    * fields, unicode whitespace, degenerate pipe-alternatives, non-integer
    * offsets — applied identically to the distributed rules and the
    * sequential oracle, so the four-route equivalence is exercised on rule
    * shapes the generator never draws. */
  def mutate(r: ConvRule): ConvRule = {
    val h = (r.conv_id + "|" + r.Sequence).hashCode & 0x7fffffff
    (h % 8: @unchecked) match {
      case 0 => r.copy(StartingIdentifier =
        r.StartingIdentifier + " " + Seq.fill(400)("pad").mkString(" "))
      case 1 => r.copy(EndingIdentifier = "", EndingIdentifierMinus1 = "")
      case 2 => r.copy(StartingIdentifier =
        "  " + r.StartingIdentifier + "\t ")
      case 3 => r.copy(StartingIdentifier = r.StartingIdentifier + "||  | ",
        EndingIdentifier = " |" + r.EndingIdentifier)
      case 4 => r.copy(StartingMinusN = "x", EndingMinusN = "", DocumentTypeID = "")
      case 5 => r.copy(Occurence = 0, NoOfPages = 3)
      // UNICODE whitespace around identifiers: NBSP / ideographic space /
      // paragraph separator are whitespace under CPython str.strip() (the
      // T1 semantics the PyText layer implements) but NOT under Java's
      // String.trim (which stops at \u0020) - the exact divergence class
      // route equivalence must hold through
      case 6 => r.copy(StartingIdentifier =
        "\u00a0" + r.StartingIdentifier + "\u3000",
        EndingIdentifier = "\u2029" + r.EndingIdentifier + "\u00a0")
      case 7 => r.copy(Sequence = "0" + r.Sequence, // stringly-int: int("07") = 7
        StartingIdentifier = r.StartingIdentifier + "\r\n")
    }
  }
}
