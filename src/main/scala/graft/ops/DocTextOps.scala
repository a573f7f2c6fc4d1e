package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators over a `documents(doc_id, text, lang, source,
  * n_chars)` table — the training-data-pipeline layer (token counting,
  * quality scoring, language ID, fingerprinting). Every function is pure
  * column algebra: whole-stage-codegen'd, no UDFs, no shuffles except the
  * declared aggregations — so filters and projections push down to the scan.
  *
  * Arithmetic is integer or left-fold double so the DuckDB oracle can
  * reproduce results bit-for-bit (see `SparkEntry.oracleSql`).
  */
object DocTextOps {

  /** Escape a string for interpolation into a Spark SQL literal:
    * backslashes FIRST (Spark string literals process backslash escapes —
    * quote-only escaping silently corrupts patterns containing `\`),
    * then single quotes. */
  private[ops] def sqlLit(x: String): String =
    x.replace("\\", "\\\\").replace("'", "''")

  /** Exact occurrence count of token `word` over the whitespace split —
    * identical semantics in any SQL engine, no regex dialect risk. (The
    * earlier padded-`replace` trick undercounted ADJACENT repeats of the
    * same word: consecutive occurrences share the padding space the next
    * non-overlapping match needs, so 'die die die' counted 2, not 3.) */
  private def cnt(textCol: String, word: String): String = {
    val w = sqlLit(word)
    s"CAST(size(filter(split($textCol, ' '), t -> t = '$w')) AS BIGINT)"
  }

  /** Per-document token statistics. */
  def tokenStats(documents: DataFrame): DataFrame =
    documents.selectExpr(
      "doc_id",
      "CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens",
      "CAST(size(array_distinct(split(text, ' '))) AS BIGINT) AS n_distinct_tokens",
      "CAST(length(text) AS BIGINT) AS n_chars_actual",
      // BPE-ish subword proxy: tokens plus extra units for words > 6 chars
      "aggregate(split(text, ' '), CAST(0 AS BIGINT), (acc, w) -> acc + 1 + length(w) DIV 6) AS n_subwords"
    ).orderBy("doc_id")

  /** GPT-2-style BPE pre-tokenizer pattern, lookahead-free so it means the
    * same thing under Java regex (Spark) and RE2 (DuckDB): contraction
    * suffixes, optional-space letter runs, digit runs, punctuation runs,
    * residual space runs. Leftmost-first alternation — probed identical
    * across both engines on contraction/digit/punctuation/multi-space
    * vectors (TokenBpeSpec pins the counts). */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"

  /** Regex-based BPE-ish token counting — the pre-tokenization pass every
    * BPE vocabulary trainer runs before merges; pure codegen'd column
    * algebra, one scan, no shuffle. The synthetic corpus is single-space
    * lowercase ASCII, so alongside the honest per-document counts the query
    * also tokenizes a spiced twin (text + a fixed suffix with contractions,
    * digits, punctuation runs, multi-space) so the cross-engine oracle
    * exercises EVERY alternation branch, not just the word path. */
  def tokenBpe(documents: DataFrame): DataFrame = {
    val pat = "'" + BpePattern.replace("'", "''") + "'"
    val spice = "' it''s 42nd-place!  --  don''t'"
    documents
      .selectExpr("doc_id",
        s"regexp_extract_all(text, $pat, 0) AS toks",
        s"regexp_extract_all(concat(text, $spice), $pat, 0) AS toks_spiced")
      .selectExpr(
        "doc_id",
        "CAST(size(toks) AS BIGINT) AS n_bpe_tokens",
        "CAST(size(array_distinct(toks)) AS BIGINT) AS n_bpe_distinct",
        "CAST(array_max(transform(toks, x -> length(x))) AS BIGINT) AS max_token_len",
        "CAST(size(toks_spiced) AS BIGINT) AS n_bpe_tokens_spiced")
      .orderBy("doc_id")
  }

  /** Quality signals: length, stopword ratio, lexical diversity, mean word
    * length — the standard pretraining quality-filter features. */
  def qualityScore(documents: DataFrame): DataFrame = {
    documents.selectExpr(
      "doc_id",
      "CAST(length(text) AS BIGINT) AS n_chars_actual",
      "CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens",
      s"${cnt("text", "the")} + ${cnt("text", "a")} + ${cnt("text", "of")} AS stopword_hits",
      // integer micro-ratios: exact in any engine, no float division drift
      "(CAST(size(array_distinct(split(text, ' '))) AS BIGINT) * 1000000) DIV size(split(text, ' ')) AS diversity_ppm",
      "(CAST(length(text) - size(split(text, ' ')) + 1 AS BIGINT) * 1000000) DIV size(split(text, ' ')) AS mean_word_len_ppm"
    ).orderBy("doc_id")
  }

  private[graft] val langStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and"),
    "de" -> Seq("der", "und", "die"),
    "es" -> Seq("el", "de", "la"),
    "fr" -> Seq("le", "de", "et"))

  /** Stopword-planting twin rule for the registered `d_langid_sep` gate:
    * the shared testdata documents draw ONE vocabulary for every lang
    * label (the same by-design property the separable-classifier twin
    * d_clf_sep works around), so on the natural corpus
    * [[langIdStopword]]'s non-en scores are constant 0 and `lang_pred` is
    * constant 'en' — a vacuous gate (found by tools/sweep_constants.py).
    * Docs whose lang has a [[langStops]] list (≠ en) get that list
    * appended `doc_id % 3 + 3` times — 9–15 hits, strictly above the
    * corpus's maximum natural en-stopword count (8 across sf0.1's ≤100
    * token docs), so planted docs WIN their argmax while the count still
    * varies — and every branch (each language winning, en's natural hits,
    * zh's unplanted text) is driver-visible. Shared with the DuckDB
    * oracle — `repeat` and the INT cast parse identically in both
    * engines. */
  private[graft] def langTwinSql: String = {
    val cases = langStops.filter(_._1 != "en").map { case (l, ws) =>
      s"WHEN lang = '$l' THEN concat(text, repeat(' ${ws.mkString(" ")}', CAST(doc_id % 3 + 3 AS INT)))"
    }.mkString(" ")
    s"CASE $cases ELSE text END"
  }

  /** Stopword-profile language ID: per-language hit counts, argmax with a
    * fixed tie-break order. A deliberately SQL-expressible heuristic — the
    * richer character-trigram model lives in [[graft.core.text.TrigramLangId]].
    */
  def langIdStopword(documents: DataFrame): DataFrame = {
    val scores = langStops.map { case (l, ws) =>
      ws.map(w => cnt("text", w)).mkString(" + ") + s" AS score_$l"
    }
    val ordered = langStops.map(_._1)
    val best = ordered
      .map(l => s"score_$l")
      .reduceLeft((a, b) => s"greatest($a, $b)")
    val pred = ordered.reverse
      .foldLeft("'und'")((acc, l) => s"IF(score_$l = best, '$l', $acc)")
    documents
      .selectExpr(Seq("doc_id", "lang AS lang_declared") ++ scores: _*)
      .withColumn("best", expr(best))
      .withColumn("lang_pred", expr(pred))
      .select("doc_id", "lang_declared", "score_en", "score_de", "score_es", "score_fr", "lang_pred")
      .orderBy("doc_id")
  }

  /** Composite keep/drop quality filter — the pretraining downselect step:
    * combines length, stopword evidence, lexical diversity, and mean word
    * length into one boolean with explicit integer thresholds (every signal
    * engine-exact, so the filter is reproducible anywhere). */
  def qualityFilter(documents: DataFrame): DataFrame =
    qualityScore(documents)
      .selectExpr("doc_id", "n_chars_actual", "n_tokens", "stopword_hits",
        "diversity_ppm", "mean_word_len_ppm",
        "(n_chars_actual >= 80 AND n_tokens >= 16 AND stopword_hits >= 1 AND " +
          "diversity_ppm >= 300000 AND mean_word_len_ppm BETWEEN 2000000 AND 12000000) AS keep")
      .orderBy("doc_id")

  /** Rule table for [[qualityRules]] — (name, predicate over the signal
    * columns), in evaluation order, shared with the DuckDB oracle (the
    * predicates are engine-portable SQL). Thresholds are set where every
    * rule realizes BOTH verdicts on the sf0.01 corpus (chars 479/500,
    * tokens 457/500, stopwords 388/500, diversity 492/500, word-length
    * ~90% — checked against the generator's distributions), so no branch
    * is invisible to the driver gate. */
  private[graft] val QualityRuleTable: Seq[(String, String)] = Seq(
    "min_chars" -> "n_chars >= 80",
    "min_tokens" -> "n_tokens >= 20",
    "stopwords" -> "stopword_tokens >= 2",
    "diversity" -> "diversity_ppm >= 300000",
    "word_length" -> "mean_word_len_ppm BETWEEN 4000000 AND 4800000")

  /** The five quality SIGNALS rendered for either engine from ONE template
    * (the [[FixedLog]] convention): [[qualityRules]] and its
    * `d_quality_rules` DuckDB oracle both interpolate these, so a stopword
    * or formula change cannot desynchronize the driver gate. Dialect
    * differences are confined to function names — `split`/`size`/`filter`/
    * `array_distinct`/`DIV` vs `string_split`/`len`/`list_filter`/
    * `list_distinct`/`//` — the arithmetic is byte-identical. */
  private[graft] object QualitySignals {
    val stopwords: Seq[String] = Seq("the", "a", "of")
    private def render(split: String, len: String, fil: String,
                       dis: String, div: String): Seq[String] = {
      val sw = stopwords.map(s => s"'$s'").mkString(", ")
      Seq(
        "CAST(length(text) AS BIGINT) AS n_chars",
        s"CAST($len($split) AS BIGINT) AS n_tokens",
        s"CAST($len($fil($split, w -> w IN ($sw))) AS BIGINT) AS stopword_tokens",
        s"(CAST($len($dis($split)) AS BIGINT) * 1000000) $div $len($split) AS diversity_ppm",
        s"(CAST(length(text) - $len($split) + 1 AS BIGINT) * 1000000) $div $len($split) AS mean_word_len_ppm")
    }
    def spark: Seq[String] =
      render("split(text, ' ')", "size", "filter", "array_distinct", "DIV")
    def duck: Seq[String] =
      render("string_split(text, ' ')", "len", "list_filter", "list_distinct", "//")
  }

  /** Gopher-style QUALITY RULE LINEAGE (Rae et al. 2021 Table A1's rule
    * battery, adapted to the synthetic corpus's signal ranges): per-document
    * pass flags for EVERY rule plus the first failing rule's name — the
    * rule-level kill-rate report a production filter emits, because "37% of
    * the crawl died on min_tokens" is the number that drives threshold
    * tuning, and a single fused boolean ([[qualityFilter]]) can't provide
    * it. Unlike the substring heuristic in [[qualityScore]], stopwords are
    * counted at TOKEN level (a substring count matches inside words and
    * never fails). `keep` = all rules pass; `first_failed` = '' when kept.
    *
    * Shape at 100 TB: pure per-row column algebra — one projection, no
    * shuffle beyond the deterministic output ordering, whole-stage
    * codegen'd; rule verdicts and the CASE lineage fold are computed once
    * per document on the scan. */
  def qualityRules(documents: DataFrame): DataFrame = {
    val flags = QualityRuleTable.map { case (n, p) => s"($p) AS pass_$n" }
    val firstFailed = QualityRuleTable
      .map { case (n, _) => s"WHEN NOT pass_$n THEN '$n'" }
      .mkString("CASE ", " ", " ELSE '' END AS first_failed")
    val keep = QualityRuleTable.map { case (n, _) => s"pass_$n" }.mkString(" AND ")
    documents
      // NULL text would yield Spark size(split(NULL))=-1 vs DuckDB NULL
      // signals — excluded identically on both sides (as tokenBudget does)
      .where("text IS NOT NULL")
      .selectExpr("doc_id" +: QualitySignals.spark: _*)
      .selectExpr(Seq("doc_id", "n_chars", "n_tokens", "stopword_tokens",
        "diversity_ppm", "mean_word_len_ppm") ++ flags: _*)
      .selectExpr(Seq("doc_id", "n_chars", "n_tokens", "stopword_tokens",
        "diversity_ppm", "mean_word_len_ppm") ++
        QualityRuleTable.map { case (n, _) => s"pass_$n" } ++
        Seq(firstFailed, s"($keep) AS keep"): _*)
      .orderBy("doc_id")
  }

  /** Default per-language percent keep rates (and the everything-else
    * fallback) for [[stratifiedSample]] and [[downselect]] — ONE table
    * shared by both operators and interpolated into the `d_sample` /
    * `d_downselect` oracles, so a rate change cannot leave a stale copy. */
  private[graft] val DefaultSampleRates: Seq[(String, Int)] =
    Seq("en" -> 50, "de" -> 80, "es" -> 80, "fr" -> 80)
  private[graft] val DefaultSampleRateElse = 10

  private def rateExpr(rates: Seq[(String, Int)]): String =
    rates.foldLeft(DefaultSampleRateElse.toString) { case (acc, (l, r)) =>
      s"IF(lang = '${sqlLit(l)}', $r, $acc)"
    }

  /** Deterministic stratified sampling: md5-hash each doc_id into [0,100)
    * and keep it if under its language's per-mille... percent rate — the
    * downsampling primitive for rebalancing a 100 TB corpus by stratum.
    * Hash-based (not rand()): reproducible across runs, engines, and
    * partitionings, and any doc's membership is decidable in isolation. */
  def stratifiedSample(documents: DataFrame,
                       rates: Seq[(String, Int)] = DefaultSampleRates): DataFrame = {
    documents
      .selectExpr("doc_id", "lang",
        s"${Shingles.h32("CAST(doc_id AS STRING)")} % 100 AS bucket",
        s"CAST(${rateExpr(rates)} AS BIGINT) AS rate")
      .where("bucket < rate")
      .select("doc_id", "lang", "bucket", "rate")
      .orderBy("doc_id")
  }

  /** The composed pretraining downselect — the pipeline a corpus actually
    * runs end-to-end, as ONE dataflow: quality filter → exact dedup (keep
    * the minimum-id canonical per content hash AMONG quality survivors) →
    * deterministic stratified sample. Emits one row per input document
    * with each stage's verdict, so the oracle checks the whole composition,
    * not just the stages in isolation (and lineage of WHY a doc dropped is
    * free: the first false flag names the stage).
    *
    * Shape at 100 TB: quality flags are scan-parallel column algebra; the
    * canonical choice is one hash aggregation on the content digest joined
    * back on the same key (both sides partitioned by content_hash — the
    * join rides the aggregation's exchange); sampling is hash arithmetic.
    * No windows, no driver-side state. */
  def downselect(documents: DataFrame): DataFrame = {
    val q = qualityFilter(documents).select(col("doc_id"), col("keep").as("q_keep"))
    val flags = documents.join(q, "doc_id")
      .selectExpr("doc_id", "lang", "q_keep", "md5(text) AS content_hash",
        s"${Shingles.h32("CAST(doc_id AS STRING)")} % 100 AS bucket",
        s"CAST(${rateExpr(DefaultSampleRates)} AS BIGINT) AS rate")
    val canon = flags.where("q_keep")
      .groupBy("content_hash").agg(min("doc_id").as("keep_doc_id"))
    flags.join(canon, Seq("content_hash"), "left")
      .selectExpr("doc_id", "lang", "q_keep",
        "q_keep AND doc_id = keep_doc_id AS is_canonical",
        "(q_keep AND doc_id = keep_doc_id) AND bucket < rate AS sampled")
      .orderBy("doc_id")
  }

  /** Character-trigram language ID (Cavnar–Trenkle rank distance) as a
    * per-row kernel over `mapPartitions` — the richer, non-SQL-expressible
    * companion to [[langIdStopword]] (rows-only checked; its unit oracle is
    * the sequential core implementation, see TrigramLangIdSpec). */
  def langIdTrigram(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select("doc_id", "lang", "text").as[(Long, String, String)]
      .mapPartitions(_.map { case (id, lang, text) =>
        val (pred, ds) = graft.core.text.TrigramLangId.classify(text)
        (id, lang, pred, ds(0), ds(1), ds(2), ds(3))
      })
      .toDF("doc_id", "lang_declared", "lang_pred", "dist_de", "dist_en", "dist_es", "dist_fr")
      .orderBy("doc_id")
  }

  /** TF-IDF keyword extraction: top-k terms per document, scored by term
    * frequency × a linear inverse document frequency (`tf · N / df`, scaled
    * to ppm and kept in exact integer arithmetic so the DuckDB oracle
    * reproduces every score bit-for-bit — a log-idf would ride on libm and
    * differ in the last ulp across engines; the RANKING the two idf shapes
    * induce is the same monotone order in df for fixed tf).
    *
    * Shape at 100 TB: tf is one hash aggregation keyed (doc_id, term); df
    * reuses tf's output with a second aggregation keyed term (vocabulary
    * sized — too big to broadcast, so the score join is a plain equi-join
    * on term); the corpus size N is a 1-row broadcast. Top-k restores
    * doc_id partitioning with a row_number window over a HIGH-cardinality
    * key (bounded rows per partition = terms per doc), never a global sort.
    * Ties break on term ascending — fully deterministic. */
  def tfidfTopTerms(documents: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = documents.selectExpr("doc_id", s"explode(${Shingles.ws}) AS term")
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfTbl = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).as("n_docs"))
    tf.join(dfTbl, "term")
      .crossJoin(broadcast(n))
      // exact integer score; overflows Long only past ~10^7 docs × 10^5 tf —
      // at real corpus scale switch the literal to log-idf doubles (ranking
      // unchanged; only the cross-engine-exact test contract needs integers)
      .selectExpr("doc_id", "term", "tf", "df",
        "tf * 1000000L * n_docs DIV df AS score_ppm")
      .withColumn("rank",
        row_number().over(Window.partitionBy("doc_id")
          .orderBy(col("score_ppm").desc, col("term"))))
      .where(s"rank <= $k")
      .selectExpr("doc_id", "CAST(rank AS BIGINT) AS rank", "term", "tf", "df", "score_ppm")
      .orderBy("doc_id", "rank")
  }

  /** Count floor and result size for [[collocations]] — shared with the
    * DuckDB oracle (Manning & Schütze's standard guard: PMI is unstable on
    * rare pairs, so collocation miners floor the pair count first). */
  val DefaultCollocMinCount = 5L
  val DefaultCollocTopK = 50

  /** COLLOCATION MINING — top-k adjacent word pairs by pointwise mutual
    * information, the phrase-extraction pass a tokenizer/vocab-building
    * pipeline runs to promote multiword units ("new york") before BPE
    * training. PMI on the [[FixedLog]] fixed-point log2 grid:
    *
    *   pmi_x64 = lp(c_xy) − lp(c_x) − lp(c_y) + 2·lp(n_uni) − lp(n_bi)
    *
    * i.e. log2( p(xy) / (p(x)·p(y)) ) with every log taken per-TERM, so no
    * intermediate product can overflow (each argument is a plain count ≤
    * the corpus token total; a fused `lp(c_xy·n_uni²)` form would overflow
    * Long past ~10^9 tokens). Engine-exact: the DuckDB oracle replays every
    * term on the same grid. Only documents with ≥2 tokens contribute (a
    * 1-token document has no bigram — excluding it from BOTH count tables
    * keeps the marginals consistent).
    *
    * Shape at 100 TB: two hash aggregations (unigram + bigram counts), both
    * with map-side partials absorbing hot pairs; the `minCount` floor prunes
    * the bigram table BEFORE the marginal joins; the unigram-count joins are
    * vocabulary-sized equi-joins AQE broadcasts while the vocab fits; totals
    * are 1-row broadcast aggregates over the already-aggregated tables; the
    * final top-k is a TakeOrderedAndProject over the floored pair table,
    * never a global sort of the corpus. */
  def collocations(documents: DataFrame,
                   minCount: Long = DefaultCollocMinCount,
                   k: Int = DefaultCollocTopK): DataFrame = {
    require(minCount >= 1, s"collocations: minCount must be >= 1, got $minCount")
    require(k >= 1, s"collocations: k must be >= 1, got $k")
    val toks = documents.where(s"size(${Shingles.ws}) >= 2")
      .selectExpr(s"${Shingles.ws} AS ws")
    val uni = toks.selectExpr("explode(ws) AS x")
      .groupBy("x").agg(count(lit(1)).as("c_x"))
    val bi = toks
      .selectExpr("explode(transform(sequence(0, size(ws) - 2)," +
        " i -> struct(ws[i] AS x, ws[i+1] AS y))) AS g")
      .selectExpr("g.x AS x", "g.y AS y")
      .groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
      .where(s"c_xy >= $minCount")
    val totU = uni.agg(sum("c_x").as("n_uni"))
    val totB = toks.selectExpr("CAST(size(ws) - 1 AS BIGINT) AS nb")
      .agg(sum("nb").as("n_bi"))
    bi.join(uni, "x")
      .join(uni.selectExpr("x AS y", "c_x AS c_y"), "y")
      .crossJoin(broadcast(totU))
      .crossJoin(broadcast(totB))
      .selectExpr("x", "y", "c_xy", "c_x", "c_y",
        s"${FixedLog.spark("c_xy")} - ${FixedLog.spark("c_x")} - ${FixedLog.spark("c_y")}" +
          s" + 2 * ${FixedLog.spark("n_uni")} - ${FixedLog.spark("n_bi")} AS pmi_x64")
      .orderBy(col("pmi_x64").desc, col("x"), col("y"))
      .limit(k)
  }

  /** PII patterns shared by the Spark query and the DuckDB oracle. Kept
    * RE2-safe (no lookaround, no backrefs) so Java regex (Spark) and RE2
    * (DuckDB) agree; all-ASCII classes so word semantics can't diverge. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
  val IpRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII splice, ONE string shared verbatim by [[piiRedact]] and the
    * `d_redact` DuckDB oracle (the [[QualitySignals]] convention — the two
    * engines can never drift on what was planted). Every doc gets the base
    * fragment (two emails, one phone, one IPv4); `doc_id % 3 = 0` adds an
    * email + IP, `doc_id % 5 = 0` a phone — so the per-category counts
    * VARY across the dump (2–3 / 1–2 / 1–2) and a regex that merely
    * hard-coded the corpus-wide constant would fail the gate (sweep
    * finding: all three counts were single-valued). `concat` + `CASE`
    * parse identically in both engines; no fragment contains a quote. */
  private[graft] def piiSpliceSql: String = {
    val base = " contact bob.smith+spam@mail-host.example.com or ADMIN@site.org, call 555-123-4567 ext 9, host 10.0.255.1 end"
    val extraB = " cc team-lead@dev.example.net node 192.168.7.42"
    val extraC = " fax 800-555-0100 now"
    s"concat(text, '$base', CASE WHEN doc_id % 3 = 0 THEN '$extraB' ELSE '' END," +
      s" CASE WHEN doc_id % 5 = 0 THEN '$extraC' ELSE '' END)"
  }

  /** PII scrub — the privacy pass a pretraining pipeline runs before any
    * text ships: redact emails, phone numbers, and IPv4 literals, count
    * each category. Pure per-row `regexp_replace` column algebra: no
    * shuffle, whole-stage codegen'd, scales linearly with scan bandwidth.
    *
    * The synthetic corpus is PII-free, so alongside the honest counts the
    * query also scrubs a spiced twin ([[piiSpliceSql]]) and pins the
    * redacted result by md5 — the cross-engine oracle then exercises every
    * pattern, not just the no-match path. Redaction order is email → ip →
    * phone in both engines (replacement tokens contain no digits, so later
    * passes can't match inside earlier redactions). */
  def piiRedact(documents: DataFrame): DataFrame = {
    documents
      .select(col("doc_id"), expr(piiSpliceSql).as("t"))
      .withColumn("n_emails", size(regexp_extract_all(col("t"), lit(EmailRe), lit(0))).cast("long"))
      .withColumn("n_phones", size(regexp_extract_all(col("t"), lit(PhoneRe), lit(0))).cast("long"))
      .withColumn("n_ips", size(regexp_extract_all(col("t"), lit(IpRe), lit(0))).cast("long"))
      .withColumn("red",
        regexp_replace(
          regexp_replace(
            regexp_replace(col("t"), EmailRe, "<EMAIL>"),
            IpRe, "<IP>"),
          PhoneRe, "<PHONE>"))
      .selectExpr("doc_id", "n_emails", "n_phones", "n_ips",
        "CAST(length(red) AS BIGINT) AS redacted_len", "md5(red) AS redacted_md5")
      .orderBy("doc_id")
  }

  /** Approximate distinct-shingle counting per language via the KMV
    * (k-minimum-values) sketch — the cardinality-estimation primitive for
    * corpus statistics at 100 TB, where exact `count(DISTINCT ...)` over
    * 10^12 shingles is a full shuffle of the universe. The sketch state
    * (k-th smallest distinct hash, [[graft.functions.KmvKthSmallest]])
    * aggregates partially map-side: ≤k longs per partition cross the
    * shuffle, independent of input size.
    *
    * Like `e_ann_recall`, this is a self-validating query: it carries the
    * EXACT distinct count next to the estimate and reports the error in
    * ppm — and because KMV (unlike HLL++) is deterministic given the hash,
    * the DuckDB oracle reproduces estimate, sketch state, and error
    * bit-for-bit. Estimator: `(k-1) · 2^32 / h_k` [Bar-Yossef et al. 2002];
    * fewer than k distinct values → the sketch holds them all, fall back
    * to its exact size (= n_exact). */
  def kmvDistinct(documents: DataFrame, k: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents
      .where("size(split(text, ' ')) >= 3")
      .selectExpr("lang", s"${Shingles.ws} AS ws")
      .selectExpr("lang", s"explode(transform(${Shingles.shingles}, s -> ${Shingles.h32("s")})) AS h")
      .groupBy("lang")
      .agg(
        count_distinct(col("h")).as("n_exact"),
        expr(s"kmv_kth(h, $k)").as("hk"))
      .selectExpr("lang", "CAST(n_exact AS BIGINT) AS n_exact", "hk",
        s"IF(hk IS NULL, n_exact, ($k - 1) * 4294967296L DIV hk) AS n_est")
      .selectExpr("lang", "n_exact", "hk", "n_est",
        "abs(n_est - n_exact) * 1000000 DIV n_exact AS err_ppm")
      .orderBy("lang")
  }

  /** HLL register-index width (p bits → m = 2^p registers); m = 16 keeps
    * the register file readable in the dump; production runs p = 12–14. */
  val HllP = 4

  /** Bias constant α_m in ppm (Flajolet et al. 2007, Fig. 3: α₁₆ = 0.673,
    * α₃₂ = 0.697, α₆₄ = 0.709, then α_m = 0.7213/(1 + 1.079/m)) — the
    * p = [[HllP]] value is shared with the DuckDB oracle so the two cannot
    * drift. */
  def hllAlphaPpm(p: Int): Long = p match {
    case 4 => 673000L
    case 5 => 697000L
    case 6 => 709000L
    case _ => // m >= 128: 721300·m/(m + 1.079) to the nearest ppm
      val m = 1L << p
      (721300L * m * 1000L + (m * 1000L + 1079L) / 2) / (m * 1000L + 1079L)
  }

  /** The p = [[HllP]] alpha, interpolated into the `d_hll_distinct` oracle. */
  val HllAlpha16Ppm = hllAlphaPpm(HllP)
  /** ln 2 in ppm — the log2→ln bridge for the linear-counting branch. */
  val Ln2Ppm = 693147L

  /** Approximate distinct-shingle counting per language via HYPERLOGLOG
    * (Flajolet, Fusy, Gandouet, Meunier 2007) — the OTHER classic mergeable
    * cardinality sketch next to [[kmvDistinct]], and the one production
    * engines actually ship (Spark's own `approx_count_distinct` is HLL++):
    * where KMV keeps the k smallest hashes, HLL keeps m = 2^p one-byte
    * registers — max leading-zero rank per hash bucket — so the sketch is
    * m bytes FLAT regardless of k or cardinality, and merging is a
    * register-wise max.
    *
    * Layout on the unsigned-32-bit [[Shingles.h32]] hash: top p bits pick
    * the register, the remaining 28 bits give ρ = leading-zero count + 1
    * (∈ [1, 29], via the binary digit count both engines compute
    * identically). Estimate in EXACT integer math: the raw harmonic-mean
    * estimator scaled by 2^29 (α₁₆·m²·2^29 // Σⱼ 2^(29−Mⱼ) // 10^6), with
    * the paper's small-range LINEAR-COUNTING branch (est ≤ 5m/2 and empty
    * registers exist → m·ln(m/V), taken on the [[FixedLog]] log2 grid ×
    * [[Ln2Ppm]]). Both branches replay bit-for-bit in the DuckDB oracle —
    * unlike Spark's HLL++ whose bias tables make it engine-private.
    *
    * Self-validating like [[kmvDistinct]]: carries the exact distinct
    * count and the error in ppm, so the sketch's accuracy (σ ≈ 1.04/√m =
    * 26% at m = 16) is visible in the output, never silent. Shape at
    * 100 TB: one explode + a (lang, register) max aggregation — map-side
    * partials absorb everything, m rows per group cross the shuffle. */
  def hllDistinct(documents: DataFrame, p: Int = HllP): DataFrame = {
    // upper bound 10 keeps alpha_ppm · m² · 2^(33-p) = ~7.2e5 · 2^(33+p)
    // inside BIGINT (2^63) for the raw-estimator numerator
    require(p >= 4 && p <= 10, s"hllDistinct: p must be in [4,10], got $p")
    val m = 1 << p
    val wBits = 32 - p // remaining hash bits feeding rho
    val maxRho = wBits + 1
    val alphaPpm = hllAlphaPpm(p)
    val hashed = documents
      .where("size(split(text, ' ')) >= 3")
      .selectExpr("lang", s"${Shingles.ws} AS ws")
      .selectExpr("lang", s"explode(transform(${Shingles.shingles}, s -> ${Shingles.h32("s")})) AS h")
    val regs = hashed
      .selectExpr("lang", s"h DIV ${1L << wBits} AS reg", s"h % ${1L << wBits} AS w")
      .selectExpr("lang", "reg",
        s"IF(w = 0, $maxRho, $maxRho - length(bin(w))) AS rho")
      .groupBy("lang", "reg")
      .agg(max("rho").as("mj"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_regs_set"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRho - mj)")).as("s_set"))
    val exact = hashed.groupBy("lang")
      .agg(count_distinct(col("h")).cast("long").as("n_exact"))
    regs.join(exact, Seq("lang"))
      .selectExpr("lang", "n_regs_set", s"$m - n_regs_set AS v_zero",
        s"s_set + ($m - n_regs_set) * ${1L << maxRho} AS s_scaled", "n_exact")
      // CAST-first keeps every product in BIGINT (the bare literals would
      // multiply as 32-bit ints and wrap silently)
      .selectExpr("lang", "n_regs_set", "v_zero", "s_scaled", "n_exact",
        s"CAST($alphaPpm AS BIGINT) * $m * $m * ${1L << maxRho} DIV s_scaled DIV 1000000 AS est_raw")
      .selectExpr("lang", "n_regs_set", "v_zero", "s_scaled", "n_exact", "est_raw",
        s"""IF(est_raw <= ${5 * m / 2} AND v_zero > 0,
           |   CAST($m AS BIGINT) * (${FixedLog.spark(m.toString)} - ${FixedLog.spark("v_zero")}) * $Ln2Ppm
           |     DIV ${64L * 1000000L},
           |   est_raw) AS n_est""".stripMargin)
      .selectExpr("lang", "n_regs_set", "v_zero", "s_scaled", "n_exact", "est_raw", "n_est",
        "abs(n_est - n_exact) * 1000000 DIV n_exact AS err_ppm")
      .orderBy("lang")
  }

  /** Benchmark decontamination — the eval-integrity pass every pretraining
    * corpus needs: flag any training document sharing a token n-gram with
    * the held-out benchmark set, so eval questions can't leak into the
    * training mix. The benchmark here is a deterministic slice of the
    * corpus itself (`doc_id % benchMod = 0` — no external data in this
    * sandbox); in production it is the actual eval suites.
    *
    * Shape at 100 TB: benchmark n-gram sets are MB-scale (eval suites,
    * not corpora) → broadcast hash join against the exploded training
    * n-grams, so the corpus is never shuffled; the only aggregation is
    * the per-document hit count, which rides the scan partitioning after
    * the map-side join. Width 4 mirrors real decon pipelines' 8–13-gram
    * windows scaled to this corpus's 10–99-token documents. */
  def decontaminate(documents: DataFrame, n: Int = 4, benchMod: Long = 97L): DataFrame = {
    val grams = documents.where(s"size(split(text, ' ')) >= $n")
      .selectExpr("doc_id", s"${Shingles.ws} AS ws")
      .selectExpr("doc_id", s"explode(${Shingles.grams(n)}) AS g")
    val bench = grams.where(s"doc_id % $benchMod = 0")
      .select("g").distinct().withColumn("hit", lit(1L))
    grams.where(s"doc_id % $benchMod != 0")
      .join(broadcast(bench), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_contaminated_ngrams"))
      .selectExpr("doc_id", "n_contaminated_ngrams",
        "n_contaminated_ngrams > 0 AS contaminated")
      .orderBy("doc_id")
  }

  /** Default contamination-fraction threshold for [[contamOverlap]]
    * (ppm of a document's distinct n-grams found in the benchmark set).
    * Shared with the DuckDB oracle. 2% is deliberately tight against the
    * synthetic corpora's natural 4-gram overlap (which peaks ~3.4% at
    * sf0.01) so BOTH verdict branches are visible in the correctness
    * gate — a threshold the data never reaches would make `drop_doc` a
    * vacuous constant. Production corpora with real benchmark leakage
    * tune this up via the `thresholdPpm` parameter. */
  val DefaultContamPpm = 20000L

  /** FRACTION-based decontamination — the graded companion to
    * [[decontaminate]]'s any-hit flag, and the rule large decon runs
    * actually apply (PaLM / Llama-style: drop a document only when a
    * substantial FRACTION of its n-grams overlap the benchmark, so a
    * single idiomatic phrase shared with an eval question doesn't cost a
    * whole document). Per training document: its distinct n-gram count,
    * how many of those appear in the benchmark set, the overlap as an
    * exact integer ppm ratio, and the drop verdict at `thresholdPpm`.
    *
    * Same shape at 100 TB as [[decontaminate]]: the benchmark n-gram set
    * is MB-scale → broadcast hash join against the exploded training
    * n-grams (corpus never shuffles); the per-document count/sum pair
    * rides the scan partitioning through one map-side-partial
    * aggregation. All-integer arithmetic, so the DuckDB oracle replays
    * the ratio bit-for-bit. */
  def contamOverlap(documents: DataFrame, n: Int = 4, benchMod: Long = 97L,
                    thresholdPpm: Long = DefaultContamPpm): DataFrame = {
    require(thresholdPpm >= 0 && thresholdPpm <= 1000000,
      s"contamOverlap: thresholdPpm must be in [0, 1000000], got $thresholdPpm")
    val grams = documents.where(s"size(split(text, ' ')) >= $n")
      .selectExpr("doc_id", s"${Shingles.ws} AS ws")
      .selectExpr("doc_id", s"explode(${Shingles.grams(n)}) AS g")
    val bench = grams.where(s"doc_id % $benchMod = 0")
      .select("g").distinct().withColumn("hit", lit(1L))
    grams.where(s"doc_id % $benchMod != 0")
      .join(broadcast(bench), Seq("g"), "left")
      .groupBy("doc_id")
      // the exploded grams are per-doc DISTINCT (Shingles.grams), so
      // count(*) is the distinct-gram denominator the fraction needs
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .selectExpr("doc_id", "n_grams", "n_hit",
        "n_hit * 1000000 DIV n_grams AS overlap_ppm")
      .selectExpr("doc_id", "n_grams", "n_hit", "overlap_ppm",
        s"overlap_ppm >= $thresholdPpm AS drop_doc")
      .orderBy("doc_id")
  }

  /** The composed MODERN selection pipeline — the FineWeb/RefinedWeb
    * recipe as ONE dataflow, the flagship companion to [[downselect]]
    * (which composes the simpler quality → exact-dedup → sample chain):
    *
    *   1. benchmark carve-out: `doc_id % benchMod = 0` is the held-out
    *      eval slice — reference material, never trainable;
    *   2. quality gate ([[qualityFilter]]'s thresholds; NULL text fails);
    *   3. near-dup dedup with best-member selection over the surviving
    *      pool only ([[graft.ops.Dedup.dedupKeepBest]] — clustering
    *      after filtering, the order real pipelines use: quality drops
    *      are cheap scans, clustering is the expensive stage);
    *   4. fraction-based decontamination against the benchmark slice's
    *      distinct 4-grams ([[contamOverlap]]'s rule);
    *   5. leakage-safe cluster-atomic split assignment
    *      ([[graft.ops.Dedup.splitAssign]]'s salted component hash).
    *
    * One row per input document with EVERY stage's verdict — the lineage
    * of why a document dropped is the first false flag — plus the final
    * `selected` decision and the `split` for pool members. Shape at
    * 100 TB: each stage keeps its own documented shape (scan-parallel
    * flags, O(log n) CC + component window, broadcast gram probe,
    * map-only hash split); the composition adds only the doc_id joins,
    * which AQE broadcasts while the verdict tables stay thin. */
  def selectionPipeline(documents: DataFrame, benchMod: Long = 97L,
                        contamPpm: Long = DefaultContamPpm,
                        nearDupPpm: Long = 800000L): DataFrame = {
    val q = qualityFilter(documents)
      .selectExpr("doc_id", "coalesce(keep, false) AS q_keep")
    // base feeds the pool AND the final lineage join, and through the pool
    // it is re-instantiated by every consumer inside dedupKeepBest (the CC
    // clustering input plus the per-doc quality scan) — 3+ plan copies of
    // the scan + quality join. One cached copy serves them all (the
    // ccnetPipeline precedent, 581009d); reclaimed by the ContextCleaner
    // with the plan. Measured 5.3 s → 4.2 s warm at sf0.1 (the remaining
    // cost is the pool's CC clustering itself, which is the contract).
    val base = documents.join(q, "doc_id")
      .selectExpr("doc_id", "lang", "text",
        s"doc_id % $benchMod = 0 AS is_bench", "q_keep")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pool = base.where("NOT is_bench AND q_keep").select("doc_id", "text")
    val kb = graft.ops.Dedup.dedupKeepBest(pool, nearDupPpm)
      .selectExpr("doc_id", "component", "keep AS keep_best")
    // the contamination stage IS the standalone operator — not a re-spelled
    // copy, so a rule change (gram width, benchmark slice, threshold) can
    // never diverge the pipeline's verdicts from d_contam_overlap's
    val overlap = contamOverlap(documents, 4, benchMod, contamPpm)
      .select("doc_id", "overlap_ppm", "drop_doc")
    base.join(kb, Seq("doc_id"), "left")
      .join(overlap, Seq("doc_id"), "left")
      .selectExpr("doc_id", "lang", "is_bench", "q_keep", "component",
        "coalesce(keep_best, false) AS keep_best",
        "CAST(coalesce(overlap_ppm, 0) AS BIGINT) AS overlap_ppm",
        "coalesce(drop_doc, false) AS contam_drop")
      .selectExpr("doc_id", "lang", "is_bench", "q_keep", "component",
        "keep_best", "overlap_ppm", "contam_drop",
        // splitAssign's own bucket + CASE, NULL for docs outside the pool
        s"CASE WHEN component IS NULL THEN CAST(NULL AS STRING) " +
          s"ELSE ${graft.ops.Dedup.splitCaseSql(graft.ops.Dedup.splitBucketExpr)} END AS split")
      .selectExpr("doc_id", "lang", "is_bench", "q_keep", "component",
        "keep_best", "overlap_ppm", "contam_drop", "split",
        "NOT is_bench AND q_keep AND keep_best AND NOT contam_drop AS selected")
      .orderBy("doc_id")
  }

  /** Bloom-filter width (bits) for [[bloomDecontaminate]] — shared with the
    * DuckDB oracle. 4096 bits is deliberately tight against these corpora's
    * few-hundred benchmark n-grams so false positives actually occur and
    * get pinned by the oracle (the same why-so-small rationale as
    * [[cmsFreq]]'s width); real decon filters run 2^30+ bits. */
  val DefaultBloomBits = 4096

  /** Bloom-filter DECONTAMINATION — the broadcast-membership formulation of
    * [[decontaminate]], and the shape that survives when the benchmark
    * n-gram SET itself outgrows a broadcast hash join (Dolma/RedPajama-scale
    * decon runs exactly this: a bits-only filter over eval n-grams): build
    * an `mBits`-bit Bloom filter over the benchmark n-grams (4 hash rows =
    * the [[Shingles.sliceU32]] disjoint md5 slices), then probe each
    * training document's n-grams with a MAP-ONLY scan against the broadcast
    * bits — the corpus is never shuffled and the driver holds mBits/8 bytes
    * regardless of benchmark size.
    *
    * Self-validating like [[cmsFreq]]/[[kmvDistinct]]: the exact semi-join
    * verdict is computed alongside, so the output exposes the filter's ONE
    * permitted error mode — `n_bloom_hits ≥ n_exact_hits` always (a Bloom
    * filter has no false negatives; SelectionSpec asserts it) and `fp_grams`
    * measures the false-positive surplus at this width. Building the filter
    * is one bitset per PARTITION OR-folded together, so what crosses to the
    * driver is `partitions × mBits/8` bytes, never n-gram rows. */
  def bloomDecontaminate(documents: DataFrame, n: Int = 4, benchMod: Long = 97L,
                         mBits: Int = DefaultBloomBits): DataFrame = {
    require(mBits % 64 == 0, s"bloomDecontaminate: mBits must be a multiple of 64, got $mBits")
    val spark = documents.sparkSession
    import spark.implicits._
    val words = mBits / 64
    val m = mBits.toLong
    val grams = documents.where(s"size(split(text, ' ')) >= $n")
      .selectExpr("doc_id", s"${Shingles.ws} AS ws")
      .selectExpr("doc_id", s"explode(${Shingles.grams(n)}) AS g")
    val bench = grams.where(s"doc_id % $benchMod = 0").select("g").distinct()
    val filter = bench.as[String].rdd
      .mapPartitions { it =>
        val bits = new Array[Long](words)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.foreach { g =>
          val dig = md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var r = 0
          while (r < 4) {
            val pos = (Shingles.sliceU32(dig, r) % m).toInt
            bits(pos >>> 6) |= 1L << (pos & 63)
            r += 1
          }
        }
        Iterator.single(bits)
      }
      .fold(new Array[Long](words)) { (a, b) =>
        val out = a.clone() // never mutate fold's zero/partials in place
        var i = 0
        while (i < words) { out(i) |= b(i); i += 1 }
        out
      }
    val bc = spark.sparkContext.broadcast(filter)
    // NOT destroyed: the probe plan below is lazy and may re-execute
    val bloomHits = grams.where(s"doc_id % $benchMod != 0")
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val bits = bc.value
        it.map { case (id, g) =>
          val dig = md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var hit = true
          var r = 0
          while (r < 4 && hit) {
            val pos = (Shingles.sliceU32(dig, r) % m).toInt
            if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) hit = false
            r += 1
          }
          (id, if (hit) 1L else 0L)
        }
      }
      .toDF("doc_id", "hit")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), sum("hit").as("n_bloom_hits"))
    val exact = grams.where(s"doc_id % $benchMod != 0")
      .join(broadcast(bench.withColumn("ehit", lit(1L))), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("ehit"), lit(0L))).as("n_exact_hits"))
    bloomHits.join(exact, Seq("doc_id"))
      .selectExpr("doc_id", "n_grams", "n_bloom_hits", "n_exact_hits",
        "n_bloom_hits - n_exact_hits AS fp_grams",
        "n_bloom_hits > 0 AS flagged")
      .orderBy("doc_id")
  }

  /** Gopher-style repetition quality signals: the character share of the
    * single most frequent bigram, and of all duplicated trigrams — the
    * standard signals for machine-generated/boilerplate text. Both gram
    * widths ride ONE explode + one aggregation keyed (doc_id, width, gram)
    * — high-cardinality keys, bounded rows per doc, no windows. Tie-break
    * for the top bigram is the (count, gram) struct max: largest count,
    * then lexicographically largest gram — deterministic in any engine.
    * Integer ppm arithmetic end-to-end. */
  def repetitionSignals(documents: DataFrame): DataFrame = {
    val g = documents.where("size(split(text, ' ')) >= 3")
      .selectExpr("doc_id", "CAST(length(text) AS BIGINT) AS nc", s"${Shingles.ws} AS ws")
      .selectExpr("doc_id", "nc",
        s"""explode(concat(
           |  transform(${Shingles.grams(2, distinct = false)}, x -> struct(2 AS w, x AS g)),
           |  transform(${Shingles.grams(3, distinct = false)}, x -> struct(3 AS w, x AS g)))) AS t""".stripMargin)
      .selectExpr("doc_id", "nc", "t.w AS w", "t.g AS g")
      .groupBy("doc_id", "nc", "w", "g").agg(count(lit(1)).as("c"))
    g.groupBy("doc_id", "nc")
      .agg(
        max(when(col("w") === 2, struct(col("c"), col("g")))).as("m2"),
        sum(when(col("w") === 3 && col("c") >= 2, col("c") * length(col("g"))))
          .as("dup3"))
      .selectExpr("doc_id",
        "m2.c AS top_bigram_cnt", "m2.g AS top_bigram",
        "m2.c * length(m2.g) * 1000000 DIV nc AS top_bigram_char_ppm",
        "CAST(coalesce(dup3, 0) AS BIGINT) AS dup_trigram_chars",
        "CAST(coalesce(dup3, 0) AS BIGINT) * 1000000 DIV nc AS dup_trigram_char_ppm")
      .orderBy("doc_id")
  }

  /** Count-min-sketch token frequency — the OTHER mergeable sketch next to
    * [[kmvDistinct]]: a depth×width counter matrix whose cells are plain
    * sums, so partial aggregation is map-side and only `depth·width`
    * counters ever cross the shuffle, independent of corpus size. Point
    * estimate = min over the depth rows; always ≥ the true count.
    *
    * Self-validating like `e_ann_recall`/`d_kmv_distinct`: probes are the
    * top-k exact tokens (deterministic tie-break), reported next to the
    * sketch estimate with the overestimate in ppm. The default width (32)
    * is deliberately near this corpus's vocabulary so hash collisions —
    * the whole point of the min-over-rows — actually occur and are pinned
    * by the oracle; at real scale width is 2^20+. Deterministic given the
    * md5 cell hash, so DuckDB reproduces every cell bit-for-bit. */
  def cmsFreq(documents: DataFrame, depth: Int = 4, width: Int = 32, k: Int = 8): DataFrame = {
    require(depth <= 4, "cmsFreq: the 4 disjoint md5 slices cover depth <= 4")
    val spark = documents.sparkSession
    import spark.implicits._
    // the depth hash rows are DISJOINT 8-hex-char slices of ONE md5 per
    // token (md5 bytes are effectively independent), not depth separate
    // digests — and each task accumulates its own depth×width counter
    // array, emitting ≤ depth·width rows per PARTITION: the true
    // mergeable-sketch shape (what crosses the shuffle is sketches, never
    // token rows). The same slice rule feeds the probe join below and the
    // DuckDB oracle.
    val (d0, w0) = (depth, width)
    val cells = documents.select("text").as[String]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val acc = Array.ofDim[Long](d0, w0)
        it.foreach { t =>
          if (t != null) {
            val ws = t.split(" ", -1)
            var i = 0
            while (i < ws.length) {
              val dig = md.digest(ws(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
              var r = 0
              while (r < d0) {
                acc(r)((Shingles.sliceU32(dig, r) % w0).toInt) += 1
                r += 1
              }
              i += 1
            }
          }
        }
        for (r <- (0 until d0).iterator; c <- (0 until w0).iterator if acc(r)(c) > 0L)
          yield (r, c, acc(r)(c))
      }
      .toDF("r", "c", "pv")
      .groupBy("r", "c").agg(sum("pv").as("v"))
    val cellSql = (0 until depth).map { r =>
      s"named_struct('r', $r, 'c', CAST(conv(substring(md5(w), ${8 * r + 1}, 8), 16, 10) AS BIGINT) % $width)"
    }.mkString("array(", ",", ")")
    val toks = documents.selectExpr(s"explode(${Shingles.ws}) AS w")
    val probes = toks.groupBy("w").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("w")).limit(k)
    probes
      .selectExpr("w", "n_exact", s"explode($cellSql) AS rc")
      .selectExpr("w", "n_exact", "rc.r AS r", "rc.c AS c")
      .join(cells, Seq("r", "c"))
      .groupBy("w", "n_exact").agg(min("v").as("n_est"))
      .selectExpr("w AS term", "CAST(n_exact AS BIGINT) AS n_exact",
        "CAST(n_est AS BIGINT) AS n_est",
        "(n_est - n_exact) * 1000000 DIV n_exact AS overest_ppm")
      .orderBy(col("n_exact").desc, col("term"))
  }

  /** Inverted-index build — the search-side workload over the corpus: one
    * posting list (sorted doc ids) per term plus document frequency. The
    * shape is one distinct-terms explode, a per-term doc_id rank, and one
    * aggregation keyed by term; posting lists are CAPPED at `maxPostings`
    * ids per term (df is emitted uncapped, so truncation is visible, never
    * silent) because an unbounded `collect_list` on a stopword-frequency
    * term at 10^12 docs is a single-row OOM — a production index shards
    * hot terms into posting blocks instead. The cap is enforced BEFORE the
    * aggregation buffer fills (row_number over the term partition — a
    * spillable sort, then `collect_list` sees ≤ maxPostings non-null ids),
    * not by slicing an already-materialized full list; the window and the
    * aggregation ride ONE hashpartitioning(term) exchange. Postings
    * surface as a comma-joined string: engine-neutral, and the sort makes
    * it deterministic. */
  def invertedIndex(documents: DataFrame, maxPostings: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    documents
      .selectExpr(s"explode(array_distinct(${Shingles.ws})) AS term", "doc_id")
      .withColumn("rn",
        row_number().over(Window.partitionBy("term").orderBy("doc_id")))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        collect_list(when(col("rn") <= maxPostings, col("doc_id"))).as("ids"))
      .selectExpr("term", "CAST(df AS BIGINT) AS df",
        "concat_ws(',', array_sort(ids)) AS postings")
      .orderBy("term")
  }

  /** Document fingerprints: full-text polynomial rolling hash plus min/max
    * 3-token shingle hashes (a 3-value sketch). Fold is left-to-right with
    * explicit zero seed → engine-independent. */
  def fingerprint(documents: DataFrame): DataFrame =
    documents
      .where("size(split(text, ' ')) >= 3")
      .selectExpr("doc_id", "text", s"${Shingles.ws} AS ws")
      .selectExpr("doc_id", "text",
        s"transform(${Shingles.shingles}, s -> ${Shingles.h32("s")}) AS hh")
      .selectExpr(
        "doc_id",
        "aggregate(transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT)), CAST(0 AS BIGINT), (a, b) -> (a * 31 + b) % 1000000007) AS fp_text",
        "array_min(hh) AS fp_shingle_min",
        "array_max(hh) AS fp_shingle_max"
      ).orderBy("doc_id")

  /** Fixed-token-window chunking with overlap — the retrieval/pretraining
    * prep step that splits long documents into `window`-token pieces every
    * `stride` tokens, each carrying its provenance span (token offsets
    * into the source doc). Pure per-row explode arithmetic: no shuffle at
    * all beyond the deterministic output ordering — chunking 100 TB is a
    * map-only pass. Short docs yield exactly one chunk; the last chunk is
    * truncated, never padded (`tok_end` marks the real extent). */
  def chunk(documents: DataFrame, window: Int = 16, stride: Int = 12): DataFrame = {
    require(stride >= 1 && window >= stride,
      s"chunk: need window >= stride >= 1, got window=$window stride=$stride")
    documents
      .where("size(split(text, ' ')) >= 1")
      .selectExpr("doc_id", s"${Shingles.ws} AS ws")
      .selectExpr("doc_id", "ws", "CAST(size(ws) AS BIGINT) AS t")
      .selectExpr("doc_id", "ws", "t",
        s"IF(t <= $window, CAST(1 AS BIGINT), (t - $window + $stride - 1) DIV $stride + 1) AS n_chunks")
      .selectExpr("doc_id", "ws", "t", "n_chunks",
        "explode(sequence(CAST(0 AS BIGINT), n_chunks - 1)) AS chunk_idx")
      .selectExpr("doc_id", "chunk_idx", "n_chunks",
        s"chunk_idx * $stride AS tok_start",
        s"least(t, chunk_idx * $stride + $window) AS tok_end",
        s"concat_ws(' ', slice(ws, CAST(chunk_idx * $stride + 1 AS INT), " +
          s"CAST(least(t, chunk_idx * $stride + $window) - chunk_idx * $stride AS INT))) AS chunk_text")
      .orderBy("doc_id", "chunk_idx")
  }

  /** FIM rate in per-mille: the fraction of documents that get the
    * fill-in-middle transform (the rest pass through autoregressive).
    * 900‰ is the published default (Bavarian et al. 2022 train at FIM
    * rate 0.9 with no AR-loss degradation). Shared with the oracle. */
  val FimRatePerMille = 900L

  /** FILL-IN-THE-MIDDLE transform (Bavarian et al. 2022, "Efficient
    * Training of Language Models to Fill in the Middle") — the data-level
    * infilling augmentation code-model pipelines run over the corpus: a
    * deterministic `ratePerMille` fraction of documents is split at two
    * uniform character positions into (prefix, middle, suffix) and
    * re-rendered in PSM order with sentinel tokens,
    *
    *   `<|fim_prefix|>` prefix `<|fim_suffix|>` suffix `<|fim_middle|>` middle
    *
    * so the model learns to generate the middle conditioned on both sides;
    * the remaining documents pass through unchanged (`mode = 'ar'`). All
    * randomness is hash-derived (doc-id-salted [[Shingles.h32]] draws for
    * the selection coin and both cut points — the corpus re-renders
    * identically on every run and in every engine), cuts live on the
    * CHARACTER grid `0 ≤ lo ≤ hi ≤ n_chars` (the paper's character-level
    * splitting — token-boundary splitting weakens the learned infilling),
    * and the output carries `(mode, cut_lo, cut_hi, n_chars, fim_text)`
    * so a trainer can reconstruct spans without re-deriving the draws.
    *
    * Shape at 100 TB: map-only — no shuffle, no window, no state; the
    * transform composes with [[chunk]]/[[packSequences]] downstream. */
  def fimTransform(documents: DataFrame, ratePerMille: Long = FimRatePerMille): DataFrame = {
    require(ratePerMille >= 0 && ratePerMille <= 1000,
      s"fimTransform: ratePerMille must be in [0, 1000], got $ratePerMille")
    def draw(salt: String) = Shingles.h32(s"concat(CAST(doc_id AS STRING), '$salt')")
    documents.where("text IS NOT NULL")
      .selectExpr("doc_id", "text", "CAST(length(text) AS BIGINT) AS n_chars")
      .selectExpr("doc_id", "text", "n_chars",
        s"${draw(":fim")} % 1000 < $ratePerMille AS sel",
        s"least(${draw(":a")} % (n_chars + 1), ${draw(":b")} % (n_chars + 1)) AS lo",
        s"greatest(${draw(":a")} % (n_chars + 1), ${draw(":b")} % (n_chars + 1)) AS hi")
      .selectExpr("doc_id",
        "CASE WHEN sel THEN 'psm' ELSE 'ar' END AS mode",
        "CASE WHEN sel THEN lo END AS cut_lo",
        "CASE WHEN sel THEN hi END AS cut_hi",
        "n_chars",
        """CASE WHEN sel THEN concat(
          |  '<|fim_prefix|>', substring(text, 1, CAST(lo AS INT)),
          |  '<|fim_suffix|>', substring(text, CAST(hi + 1 AS INT)),
          |  '<|fim_middle|>', substring(text, CAST(lo + 1 AS INT), CAST(hi - lo AS INT)))
          |ELSE text END AS fim_text""".stripMargin)
      .orderBy("doc_id")
  }

  /** Sequence PACKING — assign documents to fixed-token-budget training
    * sequences by a deterministic shelf rule: docs sorted by
    * (n_tokens DESC, doc_id), running token total, pack = the `budget`
    * shelf the doc's first token lands on. The interesting part at scale
    * is the RUNNING TOTAL: a global window is one task at 10^12 docs, so
    * it runs as a DISTRIBUTED PREFIX SUM — range-repartition + in-partition
    * sort (a parallel sort), one tiny job for per-partition token totals
    * (P values to the driver), then each partition streams its rows adding
    * its broadcast offset. Same two-pass shape as `q13_quantiles`' rank;
    * the DuckDB oracle replays it as the plain cumulative window it is
    * semantically.
    *
    * Both passes run over ONE materialized RDD instance: RangePartitioner
    * seeds its reservoir sample from rdd.id, so two separate plan
    * executions could draw different range bounds (rows near a boundary
    * would land in partitions the offsets weren't computed for). Sharing
    * the instance makes the result pass reuse the offsets pass's shuffle
    * output — identical partitions by construction, and the sort is paid
    * once. NULL text packs as 0 tokens. */
  def packSequences(documents: DataFrame, budget: Long = DefaultPackBudget): DataFrame =
    packByTokens(documents
      .selectExpr("CAST(coalesce(size(split(text, ' ')), 0) AS BIGINT) AS n_tokens",
        "CAST(doc_id AS BIGINT) AS doc_id"), budget)
      .orderBy("doc_id")

  /** The shelf-rule core of [[packSequences]] over PRECOMPUTED token
    * counts — `(n_tokens BIGINT, doc_id BIGINT)` in, one
    * `(doc_id, n_tokens, pack_id, pack_offset)` row out per input row —
    * shared with [[graft.ops.TranscriptOps.packMasked]] (which packs
    * whole rendered conversations) so the two packers ride one
    * implementation of the distributed prefix sum and cannot drift. */
  def packByTokens(rows: DataFrame, budget: Long = DefaultPackBudget): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val p = spark.sessionState.conf.numShufflePartitions
    val parts = rows
      .selectExpr("CAST(n_tokens AS BIGINT) AS n_tokens",
        "CAST(doc_id AS BIGINT) AS doc_id")
      .repartitionByRange(p, col("n_tokens").desc, col("doc_id").asc)
      .sortWithinPartitions(col("n_tokens").desc, col("doc_id").asc)
      .rdd // single instance: both jobs below share its shuffle dependency
    val partSums = parts
      .mapPartitionsWithIndex((pid, it) => Iterator((pid, it.map(_.getLong(0)).sum)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // offsets(pid) = tokens before pid
    val packed = parts.mapPartitionsWithIndex { (pid, it) =>
      var running = offsets(pid)
      it.map { r =>
        val t = r.getLong(0)
        val before = running
        running += t
        (r.getLong(1), t, before / budget, before % budget)
      }
    }
    spark.createDataset(packed)
      .toDF("doc_id", "n_tokens", "pack_id", "pack_offset")
  }

  /** Default token budget per packed sequence for [[packSequences]] /
    * [[shardCorpus]] — shared with the DuckDB oracles (via the packCtes
    * builder) so the engines cannot drift. */
  val DefaultPackBudget = 2048L

  /** Default shard count for [[shardCorpus]] — shared with the DuckDB
    * oracle so the two cannot drift. Real corpora pick the output file
    * count (10^3–10^4); 8 keeps every shard populated on the small
    * synthetic corpora. */
  val DefaultShards = 8

  /** SHARD + DETERMINISTIC SHUFFLE — the step a pretraining pipeline runs
    * LAST, after [[packSequences]]: distribute the packed sequences over
    * `nShards` output shards and fix a pseudo-random READ ORDER inside
    * each, so training consumes the corpus decorrelated from document /
    * crawl order without any runtime shuffle buffer (the "preshuffled
    * shards" layout). Both decisions are pure functions of the pack id —
    * shard = h32(pack_id) mod nShards, within-shard order = (h32, pack_id)
    * — so every re-run, task retry, or engine reproduces the identical
    * layout (the oracle replays it verbatim), unlike an RNG-seeded
    * shuffle whose order depends on partition enumeration.
    *
    * Scale shape: packs number corpus_tokens/budget — 5·10^8 at 10^12
    * tokens — and only (pack_id, counts) rows ever move: one keyed
    * aggregation riding [[packSequences]]'s output, a map-only hash
    * assignment, then ONE shuffle into `nShards` groups for the
    * within-shard rank. The window partition count is nShards — a number
    * the operator's caller CHOOSES (it is the output file count), so
    * per-task volume is corpus/nShards by construction; a corpus too big
    * for that invariant wants more shards, not a different plan. */
  def shardCorpus(documents: DataFrame, budget: Long = DefaultPackBudget,
                  nShards: Int = DefaultShards): DataFrame = {
    require(nShards >= 1, s"shardCorpus: nShards must be >= 1, got $nShards")
    import org.apache.spark.sql.expressions.Window
    packSequences(documents, budget)
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("pack_tokens"))
      .selectExpr("pack_id", "n_docs", "pack_tokens",
        s"${Shingles.h32("CAST(pack_id AS STRING)")} AS h")
      .withColumn("shard", expr(s"h % $nShards"))
      .withColumn("seq_idx", row_number().over(
        Window.partitionBy("shard").orderBy("h", "pack_id")).cast("long"))
      .select("pack_id", "shard", "seq_idx", "n_docs", "pack_tokens")
      .orderBy("shard", "seq_idx")
  }

  /** END-TO-END CORPUS BUILD — the composition a pretraining data pipeline
    * actually runs, as ONE dataflow over the registered operators:
    * [[downselect]] (quality gate → exact-dedup canonicalization →
    * hash-bucket sampling) keeps the survivors, [[chunk]] windows them into
    * fixed-token pieces, [[packSequences]] shelves the chunks into
    * fixed-budget training sequences. Each stage is individually oracled
    * elsewhere; this query proves they COMPOSE (the DuckDB oracle replays
    * chunk+pack over the d_downselect dump).
    *
    * Chunk identity for packing is the composite `doc_id·10^6 + chunk_idx`
    * (a single BIGINT — packSequences' sort key): loudly guarded per row,
    * so a monster document beyond 10^6 chunks fails with raise_error
    * instead of aliasing another document's chunks. Scale shape: the
    * composition adds NO shuffle beyond its stages' own (downselect's two
    * aggregations, chunking map-only, packing's range sort). */
  def corpusBuild(documents: DataFrame, window: Int = 16, stride: Int = 12,
                  budget: Long = 256L): DataFrame = {
    val kept = downselect(documents).where("sampled").select("doc_id")
    val survivors = documents.join(kept, "doc_id").select("doc_id", "text")
    val chunks = chunk(survivors, window, stride)
      .selectExpr(
        "IF(chunk_idx < 1000000, CAST(doc_id AS BIGINT) * 1000000 + chunk_idx, " +
          "CAST(raise_error('corpusBuild: document exceeds 10^6 chunks — widen the chunk-key multiplier') AS BIGINT)) AS doc_id",
        "chunk_text AS text")
    packSequences(chunks, budget)
      .selectExpr(
        "doc_id AS chunk_key",
        "CAST(doc_id DIV 1000000 AS BIGINT) AS src_doc_id",
        "CAST(doc_id % 1000000 AS BIGINT) AS chunk_idx",
        "n_tokens", "pack_id", "pack_offset")
      .orderBy("chunk_key")
  }

  /** Default merge-round count — referenced by the `d_bpe_train` oracle
    * so the two cannot drift. */
  val DefaultBpeMerges = 5

  /** BPE VOCABULARY TRAINING — the iterative text operator every tokenizer
    * build runs: repeat k times { count adjacent token pairs corpus-wide,
    * merge the most frequent pair everywhere }. Each round is ONE
    * explode + keyed aggregation (map-side partial counts — the classic
    * shape) plus one scan applying the merge; the only driver-side state
    * is the single winning pair per round (the algorithm's inherent sync
    * point, exactly like k-means centroids). Tie-break (count DESC, pair
    * ASC) and the merge-application rule are engine-exact, so the DuckDB
    * oracle replays every round:
    *
    *  - merge application doubles the inter-token spaces first so each
    *    token owns exclusive padding, then a single non-overlapping
    *    left-to-right `replace` of ` a  b ` — byte-identical greedy-merge
    *    semantics in any engine (`x x x` merges once, like real BPE);
    *  - the merged token joins with `@@`, absent from the corpus.
    *
    * At 100 TB real trainers run on a sample; the per-round cost here is
    * the honest full-corpus shape. */
  def bpeTrain(documents: DataFrame, merges: Int = DefaultBpeMerges): DataFrame =
    bpeTrainImpl(documents, merges)._1

  /** BPE ENCODING — apply the [[bpeTrain]]-learned merge vocabulary to the
    * corpus and emit per-document token stats: the "tokenize with the real
    * learned vocab" pass that follows training in every tokenizer build.
    * The encoded corpus IS the trainer's lazily-stacked replace chain (one
    * codegen'd scan re-running the k merges — no second implementation to
    * drift), so `n_merges` counts applied `@@` joints exactly and the md5
    * pins the full encoded text cross-engine. Null-text rows encode to
    * nothing and are excluded, mirroring the trainer's pair scan. */
  def bpeEncode(documents: DataFrame, merges: Int = DefaultBpeMerges): DataFrame =
    bpeTrainImpl(documents, merges)._2
      .where("txt IS NOT NULL")
      .selectExpr("doc_id",
        "CAST(size(split(txt, ' ')) AS BIGINT) AS n_tokens",
        "CAST((length(txt) - length(replace(txt, '@@', ''))) DIV 2 AS BIGINT) AS n_merges",
        "md5(txt) AS encoded_md5")
      .orderBy("doc_id")

  private def bpeTrainImpl(documents: DataFrame, merges: Int): (DataFrame, DataFrame) = {
    val spark = documents.sparkSession
    import spark.implicits._
    var txt = documents.selectExpr("doc_id", "text AS txt")
    val out = Vector.newBuilder[(Int, String, String, Long, Long)]
    // afterCounts(i) = corpus tokens after round i+1's merge
    val afterCounts = Vector.newBuilder[Long]
    var nRounds = 0
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      // round `step`'s pair-count scan also OBSERVES the current token
      // total — which IS round step-1's post-merge count — so no round
      // pays a second corpus job; only a completed final round needs the
      // one extra aggregation below. Round 1's observation additionally
      // validates the single-spaced/no-'@@' preconditions (runs of spaces
      // would tokenize as EMPTY tokens; a pre-existing '@@' would collide
      // with merge markers) — piggybacked, zero extra jobs.
      val obs = new org.apache.spark.sql.Observation(s"bpe_toks_$step")
      // pair generation runs as a JIT'd typed flatMap (the interpreted
      // transform/concat lambda was the round's dominant cost); the
      // CollectMetrics node stays upstream of the typed boundary so the
      // piggybacked observation still fires on the same scan
      val win = txt
        .observe(obs,
          sum(expr("CAST(size(split(txt, ' ')) AS BIGINT)")).as("toks"),
          sum(expr("CAST(IF(txt LIKE '%  %' OR txt LIKE ' %' OR txt LIKE '% ' " +
            "OR txt LIKE '%@@%', 1, 0) AS BIGINT)")).as("bad"))
        .select("txt").as[String]
        .mapPartitions(_.flatMap { t =>
          // null text yields no pairs — the SQL form's split->size(ws)>=2
          // chain excluded it too. Spark split(txt,' ') = split(regex, -1)
          if (t == null) Iterator.empty
          else {
            val ws = t.split(" ", -1)
            if (ws.length < 2) Iterator.empty
            else (0 until ws.length - 1).iterator.map(i => ws(i) + " " + ws(i + 1))
          }
        })
        .toDF("pr")
        .groupBy("pr").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("pr").asc).limit(1)
        .collect().headOption
      // bounded, thread-leak-free read: the collect() above already
      // finished the action, so the metrics are either present now or will
      // never fire (CollectMetrics optimized away on tiny local-relation
      // corpora) — Observation.getOrEmpty waits ≤100ms and returns {} in
      // that case, letting the explicit-aggregation fallback below take
      // over. It is private[spark] at the Scala level but JVM-public, so
      // it's invoked reflectively; the old Await(Future(obs.get)) leaked
      // one permanently-blocked global-pool thread per timeout.
      val metrics: Map[String, Any] = try {
        obs.getClass.getMethod("getOrEmpty").invoke(obs)
          .asInstanceOf[Map[String, Any]]
      } catch { case _: Exception => Map.empty }
      def toksNow: Long = metrics.get("toks") match {
        case Some(l: java.lang.Long) => l.longValue()
        case _ => txt.selectExpr("CAST(size(split(txt, ' ')) AS BIGINT) AS n")
          .agg(sum("n")).head().getLong(0)
      }
      if (step == 1) {
        val bad = metrics.get("bad") match {
          case Some(l: java.lang.Long) => l.longValue()
          case _ => documents.where(
            "text LIKE '%  %' OR text LIKE ' %' OR text LIKE '% ' OR text LIKE '%@@%'").count()
        }
        require(bad == 0,
          "bpeTrain: input must be single-spaced, untrimmed-space-free, and free of '@@'")
      }
      if (step >= 2) afterCounts += toksNow
      win match {
        case None => exhausted = true // every doc fully merged: stop early
        case Some(row) =>
          val pair = row.getString(0)
          val cnt = row.getLong(1)
          val merged = pair.replace(" ", "@@")
          // after space-doubling the inter-token gap is TWO spaces, so
          // the search pattern carries the doubled gap
          val q = sqlLit(pair.replace(" ", "  "))
          val m = sqlLit(merged)
          // the merge stays a LAZY projection stacked on the chain: round
          // i re-runs i cheap codegen'd replaces over the scan instead of
          // pinning k corpus copies in executor memory (probed in round 4:
          // checkpointing rounds bought nothing — the pair-count explode,
          // not the replace chain, dominates; a production trainer still
          // materializes rounds to its working table at real k)
          txt = txt.selectExpr("doc_id",
            s"trim(replace(replace(concat(' ', replace(txt, ' ', '  '), ' '), ' $q ', ' $m '), '  ', ' ')) AS txt")
          out += ((step, pair, merged, cnt, -1L)) // token count patched below
          nRounds += 1
          step += 1
      }
    }
    // a completed final round's post-merge count was never observed (an
    // exhausted probe round observed it already): one extra aggregation
    if (nRounds > 0 && !exhausted)
      afterCounts += txt.selectExpr("CAST(size(split(txt, ' ')) AS BIGINT) AS n")
        .agg(sum("n")).head().getLong(0)
    val toks = afterCounts.result()
    val summary = out.result().zipWithIndex
      .map { case ((st, pair, merged, cnt, _), i) => (st, pair, merged, cnt, toks(i)) }
      .toDF("step", "pair", "merged", "pair_count", "corpus_tokens_after")
      .selectExpr("CAST(step AS BIGINT) AS step", "pair", "merged",
        "pair_count", "corpus_tokens_after")
      .orderBy("step")
    (summary, txt)
  }

  /** Corpus MIXING — the data-mixture step of a pretraining build: given
    * target token SHARES per source (ppm, summing to ≤ 1e6), compute each
    * source's deterministic downsampling rate so the sampled mixture hits
    * the target proportions, capped at keeping everything (a source short
    * of its target is taken whole — this op never upsamples; epoch
    * weighting handles deficits downstream).
    *
    * rate_ppm(source) = min(1e6, target_ppm · T / tokens(source)), where
    * T is the largest total such that no source exceeds its supply — here
    * the standard one-step approximation T = corpus total, with the cap
    * making it safe. Membership is the same hash-bucket rule as
    * [[stratifiedSample]]: `h32(doc_id) % 1e6 < rate_ppm` — reproducible
    * in isolation for any doc, any engine, any partitioning. Shape: one
    * aggregation per source (a handful of rows), broadcast back over the
    * scan — the corpus itself is never shuffled.
    *
    * The default targets deliberately mix a SATURATED source (rate capped
    * at 1e6 — taken whole) with genuinely fractional rates, so the
    * oracle exercises the fractional membership rule, not just the cap. */
  val DefaultMixTargets: Map[String, Long] = Map(
    "src0" -> 300000L, "src1" -> 40000L, "src2" -> 25000L,
    "src3" -> 10000L, "src4" -> 2500L)

  /** Training token budget for [[epochAllocation]], in PER-MILLE of the
    * corpus's own token count (2000 = train on 2× the corpus — the
    * data-constrained regime where repetition planning matters at all). */
  val DefaultEpochBudgetPermille = 2000L

  /** Repeat-value cap in epochs: tokens repeated beyond ~4 epochs carry
    * rapidly diminishing value (Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models" — returns decay to near zero well
    * before their R* ≈ 15; 4 is the planning knob, not the paper fit). */
  val DefaultRepeatCapEpochs = 4L

  /** EPOCH ALLOCATION under a token budget — the data-constrained
    * planning step (Muennighoff et al. 2023) a pretraining build runs
    * BEFORE sampling: given target mixture shares and a total training
    * token budget, how many epochs does each source repeat for, and how
    * much of the budget lands beyond the repeat-value cap? Per source:
    *
    *   alloc_tokens  = share_ppm · budget DIV 1e6   (its budget slice)
    *   epochs_pm     = alloc_tokens · 1000 DIV source_tokens
    *   effective     = min(alloc, cap · source_tokens)  (value-bearing part)
    *   over_cap      = alloc_tokens > cap · source_tokens
    *
    * The budget is expressed in per-mille of the corpus's own token count
    * so the over/under-cap branches realize identically at every scale
    * factor (an absolute budget would flip branches between sf0.001 and
    * sf0.1). Every product is divmod-factored so nothing crosses 2^63 at
    * any corpus size (the [[mixCorpus]] discipline). Unlisted sources
    * carry share 0 — visible as zero-epoch rows, by design: the report
    * must show what the mixture EXCLUDES, not only what it repeats.
    *
    * Shape at 100 TB: one per-source aggregation (map-side partials, a
    * handful of rows), one 1-row corpus total broadcast — the corpus is
    * never reshuffled; this is a planning table, not a data pass. */
  def epochAllocation(documents: DataFrame,
                      targetPpm: Map[String, Long] = DefaultMixTargets,
                      budgetPermille: Long = DefaultEpochBudgetPermille,
                      repeatCapEpochs: Long = DefaultRepeatCapEpochs): DataFrame = {
    require(targetPpm.values.forall(t => t >= 0 && t <= 1000000L),
      "epochAllocation: target shares must be in [0, 1e6] ppm")
    require(budgetPermille >= 0 && repeatCapEpochs >= 1,
      s"epochAllocation: need budgetPermille >= 0 and repeatCapEpochs >= 1, " +
        s"got $budgetPermille / $repeatCapEpochs")
    val bySource = documents
      .selectExpr("source",
        "CAST(coalesce(size(split(text, ' ')), 0) AS BIGINT) AS n_tokens")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("source_tokens"))
    val shareExpr = targetPpm.foldLeft("CAST(0 AS BIGINT)") {
      case (acc, (src, t)) => s"IF(source = '${sqlLit(src)}', CAST($t AS BIGINT), $acc)"
    }
    // corpus total via a single-partition window over the ≤sources-row
    // rollup (the histQuantiles pattern) — a crossJoin(broadcast(agg))
    // would re-run the per-source aggregation, i.e. a SECOND corpus scan
    bySource
      .withColumn("corpus_tokens", sum("source_tokens")
        .over(org.apache.spark.sql.expressions.Window.partitionBy(lit(0))))
      .withColumn("share_ppm", expr(shareExpr))
      .withColumn("budget_tokens", expr(
        s"corpus_tokens DIV 1000 * $budgetPermille" +
          s" + corpus_tokens % 1000 * $budgetPermille DIV 1000"))
      .withColumn("alloc_tokens", expr(
        "share_ppm * (budget_tokens DIV 1000000)" +
          " + share_ppm * (budget_tokens % 1000000) DIV 1000000"))
      .withColumn("epochs_pm", expr(
        """alloc_tokens DIV greatest(source_tokens, 1) * 1000
          |  + alloc_tokens % greatest(source_tokens, 1) * 1000
          |      DIV greatest(source_tokens, 1)""".stripMargin))
      .selectExpr("source", "n_docs", "source_tokens", "share_ppm",
        "alloc_tokens", "epochs_pm",
        s"least(alloc_tokens, $repeatCapEpochs * source_tokens) AS effective_tokens",
        // tested on the EXACT token comparison, not the floored epochs_pm
        // (a source clipped by <0.1% would otherwise read over_cap=false
        // while effective_tokens shows the clip)
        s"alloc_tokens > $repeatCapEpochs * source_tokens AS over_cap")
      .orderBy("source")
  }

  def mixCorpus(documents: DataFrame,
                targetPpm: Map[String, Long] = DefaultMixTargets): DataFrame = {
    require(targetPpm.values.forall(t => t >= 0 && t <= 1000000L),
      "mixCorpus: target shares must be in [0, 1e6] ppm")
    val toks = documents.selectExpr("doc_id", "source",
      "CAST(coalesce(size(split(text, ' ')), 0) AS BIGINT) AS n_tokens")
    val bySource = toks.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens_total"))
    val targetExpr = targetPpm.foldLeft("CAST(0 AS BIGINT)") {
      case (acc, (src, t)) =>
        s"IF(source = '${sqlLit(src)}', CAST($t AS BIGINT), $acc)"
    }
    val total = bySource.agg(sum("tokens_total").as("corpus_tokens"))
    val rates = bySource.crossJoin(broadcast(total))
      .withColumn("target_ppm", expr(targetExpr))
      // floor(t·C/T) by divmod so no product crosses 2^63 under ANSI mode:
      // the quotient is CLAMPED at 1e6 (beyond it the rate saturates
      // anyway) and the remainder term's product is ≤ 1e6·T — exact for
      // per-source corpora up to ~9.2e12 tokens (~40 TB of text PER
      // SOURCE; larger single sources need the decimal variant)
      .withColumn("rate_ppm", expr(
        """least(CAST(1000000 AS BIGINT),
          |  target_ppm * least(corpus_tokens DIV greatest(tokens_total, 1), 1000000)
          |  + target_ppm * (corpus_tokens % greatest(tokens_total, 1))
          |      DIV greatest(tokens_total, 1))""".stripMargin))
    val sampled = toks
      .join(broadcast(rates.select("source", "rate_ppm")), "source")
      .where(expr(s"${Shingles.h32("CAST(doc_id AS STRING)")} % 1000000 < rate_ppm"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs_sampled"), sum("n_tokens").as("tokens_sampled"))
    rates
      .join(sampled, Seq("source"), "left")
      .withColumn("ts", expr("coalesce(tokens_sampled, 0)"))
      .withColumn("ts_all", expr("greatest(sum(ts) OVER (), 1)"))
      .selectExpr("source", "n_docs", "tokens_total", "target_ppm", "rate_ppm",
        "CAST(coalesce(n_docs_sampled, 0) AS BIGINT) AS n_docs_sampled",
        "CAST(ts AS BIGINT) AS tokens_sampled",
        // achieved share of the SAMPLED mixture (same divmod overflow
        // guard: ts ≤ ts_all so the quotient term is 0 or 1)
        "(ts DIV ts_all) * 1000000 + (ts % ts_all) * 1000000 DIV ts_all AS achieved_ppm")
      .orderBy("source")
  }

  /** One-pass MERGEABLE histogram quantile sketch over `n_chars` — the
    * approximate counterpart to the exact two-pass rank in `q13_quantiles`,
    * and the third mergeable sketch next to [[kmvDistinct]] (distincts) and
    * [[cmsFreq]] (frequencies): fixed-width value bins whose counts are
    * plain sums, so partial aggregation is map-side and only
    * `valueRange/binWidth` counters ever cross the shuffle, independent of
    * row count. The quantile estimate interpolates inside the target bin
    * with pure integer arithmetic, so DuckDB replays it bit-for-bit.
    *
    * Self-validating like `d_cms_freq`: next to each estimate the TRUE
    * quantile at the same rank is computed scale-safely — the histogram
    * itself locates the one bin containing the target rank, and only that
    * bin's rows are ranked (a per-bin window whose partition is bounded by
    * the largest single bin, never the table; binWidth is the knob that
    * bounds it). The cumulative pass windows over the BIN AGGREGATE, whose
    * cardinality is a function of the value range, not the data size. */
  def histQuantiles(documents: DataFrame, binWidth: Long = 64L,
                    qPpm: Seq[Long] = Seq(250000L, 500000L, 750000L, 900000L, 990000L)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = documents.sparkSession
    import spark.implicits._
    require(binWidth >= 1, s"histQuantiles: binWidth must be >= 1, got $binWidth " +
      "(use derivedBinWidth to size it from the observed value range)")
    val bins = documents
      .selectExpr(s"n_chars DIV $binWidth AS bin")
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    val cum = bins
      .withColumn("cum", sum("cnt").over(
        Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_before", col("cum") - col("cnt"))
    val total = bins.agg(sum("cnt").as("n_total"))
    val pick = qPpm.toDF("q_ppm")
      .crossJoin(broadcast(total))
      .withColumn("target", expr("(q_ppm * n_total + 999999) DIV 1000000"))
      .join(broadcast(cum.select("bin", "cum")), col("cum") >= col("target"))
      .groupBy("q_ppm", "n_total", "target")
      .agg(min("bin").as("bin"))
      .join(broadcast(cum.drop("cum")), "bin")
      .withColumn("rank_in", col("target") - col("cum_before"))
      .withColumn("est", expr(s"bin * $binWidth + (rank_in - 1) * $binWidth DIV cnt"))
    // exact value at the same global rank: ties share a bin (bin is a
    // function of the value), so rank-within-picked-bin == global rank −
    // bin's cumulative start; only the ≤|qPpm| picked bins are ever sorted
    val ranked = documents
      .selectExpr(s"n_chars DIV $binWidth AS rbin", "n_chars", "doc_id")
      .join(broadcast(pick.select(col("bin").as("rbin")).distinct()), "rbin")
      .withColumn("rn", row_number().over(
        Window.partitionBy("rbin").orderBy("n_chars", "doc_id")))
    pick.join(ranked, pick("bin") === ranked("rbin") && pick("rank_in") === ranked("rn"))
      .selectExpr("q_ppm", "n_total", s"bin * $binWidth AS bin_lo", "cnt AS bin_cnt",
        "est", "CAST(n_chars AS BIGINT) AS exact", "abs(est - n_chars) AS abs_err")
      .orderBy("q_ppm")
  }

  /** Data-derived bin width for [[histQuantiles]]: the smallest power of
    * two keeping the bin count at or under `maxBins`, from ONE cheap
    * min/max aggregation over the value column. This keeps the cumulative
    * pass's single-partition window (cardinality = range / binWidth) at
    * ≤ maxBins rows on ANY corpus — a 256M-char doc ceiling derives
    * binWidth 4096 instead of pushing ~4M bins through one task at the
    * fixed default — without the operator needing hand tuning. Power of
    * two so the derivation is exact integer arithmetic any engine
    * replays; deterministic given the data. */
  def derivedBinWidth(documents: DataFrame, maxBins: Long = 1L << 16): Long = {
    require(maxBins >= 1, s"derivedBinWidth: maxBins must be >= 1, got $maxBins")
    val r = documents
      .selectExpr("CAST(min(n_chars) AS BIGINT) AS mn", "CAST(max(n_chars) AS BIGINT) AS mx")
      .head()
    if (r.isNullAt(0)) 1L
    else {
      val range = r.getLong(1) - r.getLong(0) + 1L
      val needed = (range + maxBins - 1L) / maxBins // ceil(range / maxBins)
      // smallest power of two >= needed
      var bw = 1L
      while (bw < needed) bw <<= 1
      bw
    }
  }
}

/** Shared shingle/hash expression fragments (Spark SQL dialect); the DuckDB
  * oracle mirrors each with 1-based list comprehensions.
  *
  * All shingle fragments read a pre-split `ws` array column (project
  * [[Shingles.ws]] once per row first). Building shingles directly from
  * `split(text,' ')[i]` would re-split the whole text for every element
  * access inside the lambda — O(tokens²·len) per document; the optimizer
  * keeps the `ws` alias because it is referenced more than once. */
object Shingles {
  /** Token array — project exactly once, then feed the fragments below. */
  val ws: String = "split(text, ' ')"

  /** Width-`n` token n-grams over the pre-split `ws` column; `distinct`
    * controls whether repeats survive (counting wants them, set semantics
    * don't). Requires `size(ws) >= n`. */
  def grams(n: Int, distinct: Boolean = true): String = {
    val parts = (0 until n)
      .map(j => if (j == 0) "ws[i]" else s"ws[i+$j]").mkString(", ")
    val t = s"transform(sequence(0, size(ws) - $n), i -> concat_ws(' ', $parts))"
    if (distinct) s"array_distinct($t)" else t
  }

  /** Distinct 3-token shingles over an arbitrary token-array column. */
  def shinglesOf(c: String): String =
    s"array_distinct(transform(sequence(0, size($c) - 3), i -> concat_ws(' ', $c[i], $c[i+1], $c[i+2])))"

  /** Distinct 3-token shingles over the pre-split `ws` column (≥3 tokens). */
  val shingles: String = shinglesOf("ws")

  /** 32-bit integer hash of a shingle string via md5 hex — identical in any
    * engine with md5: first 8 hex chars as unsigned int. */
  def h32(col: String): String = s"CAST(conv(substring(md5($col), 1, 8), 16, 10) AS BIGINT)"

  /** Unsigned 32-bit value from md5 digest bytes `[4r, 4r+4)` — the
    * disjoint-slice rule (one digest, up to 4 independent-enough hash rows)
    * shared by [[DocTextOps.cmsFreq]], [[DocTextOps.bloomDecontaminate]]
    * and their DuckDB oracles (`substr(md5(x), 1 + 8*r, 8)` hex-decoded). */
  def sliceU32(dig: Array[Byte], r: Int): Long =
    ((dig(4 * r) & 0xffL) << 24) | ((dig(4 * r + 1) & 0xffL) << 16) |
      ((dig(4 * r + 2) & 0xffL) << 8) | (dig(4 * r + 3) & 0xffL)

  /** 60-bit hash: first 15 md5 hex chars — the widest md5 prefix that is
    * still non-negative in a SIGNED 64-bit int in every engine. */
  def h60(col: String): String = s"CAST(conv(substring(md5($col), 1, 15), 16, 10) AS BIGINT)"

  val minShingleHash: String = s"array_min(transform($shingles, s -> ${h32("s")}))"
  val maxShingleHash: String = s"array_max(transform($shingles, s -> ${h32("s")}))"
}
