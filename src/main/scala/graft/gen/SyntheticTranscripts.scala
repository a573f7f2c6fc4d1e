package graft.gen

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.schema.{ConvRule, Turn}

/** Deterministic pseudo-random stream (SplitMix64). Pure function of its
  * seed — generation is identical regardless of partitioning, executor
  * count, or evaluation order, which is what makes the synthetic corpus a
  * valid fixed point for correctness and scaling runs.
  */
final class SplitMix(seed0: Long) {
  private var state = seed0
  def nextLong(): Long = {
    state += 0x9e3779b97f4a7c15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def nextInt(bound: Int): Int = (((nextLong() >>> 1) % bound).toInt)
  def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  def pick[A](xs: IndexedSeq[A]): A = xs(nextInt(xs.length))
  def shuffle[A](xs: Seq[A]): Vector[A] = {
    val buf = xs.toBuffer
    var i = buf.length - 1
    while (i > 0) { val j = nextInt(i + 1); val t = buf(i); buf(i) = buf(j); buf(j) = t; i -= 1 }
    buf.toVector
  }
}

/** Deterministic synthetic transcript corpus at the `input_hint` schema
  * `(conv_id, turn_idx, role, text, tool, ts)` — payloads are raw HTML (with
  * nav/footer/aside boilerplate), PDF content-stream dumps (shuffled emission
  * order), or tool output, so the extraction layer has real work to do. Rule
  * shapes mirror the reference's payload corpus
  * (`/root/reference/test/payload/Input_Sample{1..10}.json`): pipe
  * alternatives, `StartingIdentifierPlus1` as primary, `EndingIdentifierMinus1`,
  * fixed `NoOfPages`, `Occurence` thresholds, stringly `" "` offsets,
  * `ExactMatch:` (synthetic — absent from the corpus, flagged in SURVEY §5.1).
  *
  * Everything is a pure function of `(corpusSeed, convIdx)`; no external data.
  */
object SyntheticTranscripts {

  val BaseEpochMs: Long = 1767225600000L // 2026-01-01T00:00:00Z, fixed

  private val vocab: IndexedSeq[String] = Vector(
    "ledger", "quarterly", "statement", "account", "balance", "transfer",
    "pursuant", "agreement", "hereby", "disclosure", "schedule", "exhibit",
    "holder", "custodian", "settlement", "maturity", "coupon", "principal",
    "interest", "portfolio", "valuation", "audit", "fiscal", "revenue",
    "expense", "liability", "equity", "dividend", "issuer", "tranche")

  private val roles = Vector("user", "assistant", "tool")

  /** Marker phrases planted for demarcation rules — a vocabulary disjoint
    * from `vocab` so identifier hits are never accidental. */
  private def marker(convIdx: Long, k: Int, kind: String): String =
    s"zqmark$k$kind c$convIdx"

  // ---------- conversation shape ----------

  final case class ConvPlan(
      convIdx: Long,
      convId: String,
      nTurns: Int,
      // turn_idx (1-based) -> phrases to plant in that turn's content
      plants: Map[Int, Vector[String]],
      // turn_idx that must be an exact-match page: whole payload == phrase
      exactPages: Map[Int, String],
      rules: Vector[ConvRule]
  )

  def convId(idx: Long): String = f"conv-$idx%08d"

  /** Hot-conversation skew: every 97th conversation is ~12× longer — the
    * "one 10^6-turn conversation must not straggle the job" probe
    * (SURVEY §7.4.5). */
  def plan(corpusSeed: Long, convIdx: Long, hotFactor: Int = 12): ConvPlan = {
    val rnd = new SplitMix(corpusSeed * 0x9e3779b97f4a7c15L + convIdx * 0xc2b2ae3d27d4eb4fL + 17)
    val hot = convIdx % 97 == 0
    val base = 8 + rnd.nextInt(17) // 8..24 turns
    val nTurns = if (hot) base * hotFactor else base
    val cid = convId(convIdx)

    val nRules = 2 + rnd.nextInt(4) // 2..5
    val seqOrder = rnd.shuffle(1 to nRules)
    var plants = Map.empty[Int, Vector[String]].withDefaultValue(Vector.empty)
    var exactPages = Map.empty[Int, String]
    def plant(page: Int, phrase: String): Unit =
      plants = plants.updated(page, plants(page) :+ phrase)

    val rules = Vector.tabulate(nRules) { rIdx =>
      val docType = s"DT${100 + rIdx}"
      val shape = rnd.nextInt(100)
      var startId = ""
      var plus1 = ""
      var endId = ""
      var minus1 = ""
      var noOfPages = 0
      var occ = 0
      var startMinusN = " "
      var endMinusN = " "

      if (shape < 45) {
        // plain start/end phrase pair, sometimes pipe alternatives
        val s = marker(convIdx, rIdx, "start")
        val e = marker(convIdx, rIdx, "end")
        val p0 = 1 + rnd.nextInt(nTurns)
        val p1 = math.min(nTurns, p0 + rnd.nextInt(4))
        plant(p0, s); plant(p1, e)
        startId = if (rnd.nextInt(3) == 0) s"decoy never present|$s" else s
        endId = e
        occ = if (rnd.nextInt(4) == 0) 2 else 0 // 0 coerced to 1 by the fold
        if (occ == 2) plant(p0, s) // second hit on the same page
      } else if (shape < 60) {
        // fixed NoOfPages, start only
        val s = marker(convIdx, rIdx, "fix")
        val p0 = 1 + rnd.nextInt(nTurns)
        plant(p0, s)
        startId = s
        noOfPages = 1 + rnd.nextInt(4)
      } else if (shape < 72) {
        // StartingIdentifierPlus1 primary with +1 page offset
        val s = marker(convIdx, rIdx, "plus")
        val e = marker(convIdx, rIdx, "pend")
        val p0 = 1 + rnd.nextInt(math.max(1, nTurns - 3))
        plant(p0, s); plant(math.min(nTurns, p0 + 2), e)
        plus1 = s
        startId = "ignored when plus1 set"
        startMinusN = "1"
        endId = e
      } else if (shape < 82) {
        // EndingIdentifierMinus1 primary with -1 offset
        val s = marker(convIdx, rIdx, "mstart")
        val e = marker(convIdx, rIdx, "mend")
        val p0 = 1 + rnd.nextInt(math.max(1, nTurns - 3))
        val p1 = math.min(nTurns, p0 + 2 + rnd.nextInt(2))
        plant(p0, s); plant(p1, e)
        startId = s
        minus1 = e
        endMinusN = "1"
        endId = "unused fallback"
      } else if (shape < 88) {
        // ExactMatch whole-page rule on a passthrough page
        val phrase = s"zqexact$rIdx conv $convIdx cover sheet"
        val p0 = 1 + rnd.nextInt(nTurns)
        exactPages = exactPages.updated(p0, phrase)
        startId = s"ExactMatch:$phrase"
        noOfPages = 1
      } else if (shape < 94) {
        // no start identifiers at all -> first page (ocr_processor.py:463-465)
        endId = marker(convIdx, rIdx, "open")
        plant(1 + rnd.nextInt(nTurns), endId)
      } else {
        // unfindable -> zeroed output row
        startId = s"zqnowhere$rIdx never occurs"
        endId = "also never occurs"
      }

      ConvRule(
        conv_id = cid,
        DocumentTypeID = docType,
        DocumentTypeName = s"TYPE_$docType",
        StartingIdentifier = startId,
        StartingIdentifierPlus1 = plus1,
        EndingIdentifier = endId,
        EndingIdentifierMinus1 = minus1,
        NoOfPages = noOfPages,
        Occurence = occ,
        StartingMinusN = startMinusN,
        EndingMinusN = endMinusN,
        Sequence = seqOrder(rIdx).toString,
        DocReceivedId = 100000L + convIdx,
        FirmFile = s"FIRM-${convIdx % 50}",
        UploadDatasheetid = 500000L + convIdx,
        SessionId = s"sess-$convIdx"
      )
    }
    ConvPlan(convIdx, cid, nTurns, plants, exactPages, rules)
  }

  // ---------- payload builders ----------

  private def sentence(rnd: SplitMix, words: Int): String =
    (0 until words).map(_ => rnd.pick(vocab)).mkString(" ")

  /** HTML page: boilerplate nav/aside/footer around long content paragraphs;
    * planted phrases go inside content so the boilerplate classifier keeps
    * them. Occasional entities and unclosed tags exercise tolerance. */
  private def htmlPayload(rnd: SplitMix, plants: Vector[String]): String = {
    val sb = new StringBuilder(2048)
    sb ++= "<html><head><title>" ++= sentence(rnd, 3) ++= "</title>"
    sb ++= "<style>.x{color:red}</style></head><body>"
    sb ++= "<nav><a href=\"/\">Home</a> <a href=\"/a\">Prev</a> <a href=\"/b\">Next</a></nav>"
    if (rnd.nextInt(3) == 0) sb ++= "<aside>" ++= sentence(rnd, 4) ++= " &amp; more</aside>"
    sb ++= "<div class=\"content\">"
    val nParas = 2 + rnd.nextInt(3)
    val plantPara = rnd.nextInt(nParas)
    for (p <- 0 until nParas) {
      sb ++= "<p>" ++= sentence(rnd, 25 + rnd.nextInt(30))
      if (p == plantPara && plants.nonEmpty)
        plants.foreach(ph => sb ++= " " ++= ph ++= " " ++= sentence(rnd, 6))
      sb ++= (if (rnd.nextInt(5) == 0) "<br>" else "</p>")
    }
    sb ++= "</div><footer>copyright 2026 corp | <a href=\"/t\">terms</a></footer></body></html>"
    sb.toString
  }

  /** PDF text-stream dump: per-line `Td`/`Tj` runs emitted in a shuffled
    * order; the layout parser must recover top-to-bottom reading order. */
  private def pdfPayload(rnd: SplitMix, plants: Vector[String]): String = {
    val nLines = 6 + rnd.nextInt(8)
    val plantLine = rnd.nextInt(nLines)
    val lines = (0 until nLines).map { i =>
      val base = sentence(rnd, 5 + rnd.nextInt(7))
      val txt = if (i == plantLine && plants.nonEmpty) plants.mkString(" ") + " " + base else base
      (720.0 - 14.0 * i, txt)
    }
    val emitted = rnd.shuffle(lines)
    val sb = new StringBuilder(1024)
    sb ++= "BT /F1 10 Tf\n"
    emitted.foreach { case (y, txt) =>
      val escaped = txt.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
      if (rnd.nextInt(4) == 0) {
        // split the line into two runs with a TJ kern array
        val cut = escaped.length / 2
        val at = escaped.lastIndexOf(' ', cut).max(1)
        sb ++= f"1 0 0 1 72 $y%.1f Tm [(${escaped.substring(0, at)}) -250 (${escaped.substring(at + 1)})] TJ%n"
      } else
        sb ++= f"1 0 0 1 72 $y%.1f Tm ($escaped) Tj%n"
    }
    sb ++= "ET"
    sb.toString
  }

  private def toolPayload(rnd: SplitMix, plants: Vector[String]): String = {
    val body = sentence(rnd, 12 + rnd.nextInt(20))
    if (plants.isEmpty) s"result: $body" else s"result: $body ${plants.mkString(" ")}"
  }

  /** Decode-corruption rule: which parser-bound turns carry an upstream
    * U+FFFD mojibake sentinel (see [[corruptTurn]]). Pure arithmetic in the
    * turn coordinates so specs can recompute the expected quarantine count
    * without replaying generation. ~1/23 of html/pdf turns — enough that
    * every fixture size (5-conv spec corpora through the sf0.01 driver
    * gate) realizes both values of the `error` column. */
  def isCorruptTurn(convIdx: Long, idx: Int): Boolean =
    (convIdx * 7 + idx) % 23 == 5

  /** Replace one mid-payload char with U+FFFD — the shape a lossy decoder
    * actually produces. Only parser-bound (html/pdf) turns are eligible:
    * passthrough turns must stay marker-free so identity extraction (and
    * the DuckDB oracle that replays it from the `_raw_turns` dump) holds. */
  private def corruptTurn(text: String): String =
    if (text.isEmpty) text
    else text.updated(text.length / 2, graft.core.extract.Extractor.CorruptMarker)

  /** All turns of one conversation — pure in `(corpusSeed, convIdx)`. */
  def turnsFor(corpusSeed: Long, convIdx: Long): Seq[Turn] = {
    val pl = plan(corpusSeed, convIdx)
    (1 to pl.nTurns).map { idx =>
      val rnd = new SplitMix(corpusSeed * 31 + convIdx * 1000003L + idx * 7919L)
      val plants = pl.plants(idx)
      val (tool, text) = pl.exactPages.get(idx) match {
        case Some(phrase) => ("", phrase) // passthrough page == phrase exactly
        case None =>
          rnd.nextInt(10) match {
            case n if n < 4 =>
              val p = htmlPayload(rnd, plants)
              ("html", if (isCorruptTurn(convIdx, idx)) corruptTurn(p) else p)
            case n if n < 7 =>
              val p = pdfPayload(rnd, plants)
              ("pdf", if (isCorruptTurn(convIdx, idx)) corruptTurn(p) else p)
            case _ => ("", toolPayload(rnd, plants))
          }
      }
      Turn(
        conv_id = pl.convId,
        turn_idx = idx,
        role = roles(idx % roles.length),
        text = text,
        tool = tool,
        ts = new Timestamp(BaseEpochMs + convIdx * 3600000L + idx * 60000L)
      )
    }
  }

  def rulesFor(corpusSeed: Long, convIdx: Long): Seq[ConvRule] =
    plan(corpusSeed, convIdx).rules

  // ---------- distributed generation ----------

  /** Distributed generator: `spark.range` over conversation indices,
    * flatMap'ed to turns — rows are produced where they will be consumed
    * (no driver materialization, no collect). */
  def turns(spark: SparkSession, nConvs: Long, corpusSeed: Long = 42L,
            parallelism: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val par = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, par).flatMap(i => turnsFor(corpusSeed, i))
  }

  def rules(spark: SparkSession, nConvs: Long, corpusSeed: Long = 42L,
            parallelism: Int = 0): Dataset[ConvRule] = {
    import spark.implicits._
    val par = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, par).flatMap(i => rulesFor(corpusSeed, i))
  }

  /** Conversation count per testdata scale dir — keeps Verify/Bench input
    * sizes proportional to the driver's sf ladder. */
  def convsForSfDir(sfDir: String): Long =
    if (sfDir.contains("sf0.1")) 2000L
    else if (sfDir.contains("sf0.01")) 200L
    else 50L
}
