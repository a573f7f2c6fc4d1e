package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-integer fixed-point log2, shared by the selection operators and
  * their DuckDB oracles. For `v >= 1`:
  *
  *   lp(v) = 64·⌊log2 v⌋ + (64·v DIV 2^⌊log2 v⌋) − 64
  *
  * i.e. log2 in 1/64 units with linear interpolation between powers of two
  * (max error ~0.086 bits analytic + 1/64 truncation, property-tested).
  * ⌊log2 v⌋ comes from the binary
  * digit count — `length(bin(v)) - 1` — which both Spark and DuckDB compute
  * identically on positive BIGINTs, so the score is engine-exact where a
  * float `ln()` could drift in the last ulp and flip a hash. */
object FixedLog {
  /** Spark SQL fragment; `v` must evaluate to a positive BIGINT. */
  def spark(v: String): String =
    s"(64 * (length(bin($v)) - 1) + (($v) * 64) DIV shiftleft(CAST(1 AS BIGINT), length(bin($v)) - 1) - 64)"

  /** DuckDB fragment with identical semantics (`//` and Spark `DIV` both
    * truncate toward zero — verified on negative operands too). */
  def duck(v: String): String =
    s"(64 * (length(bin($v)) - 1) + (($v) * 64) // (1::BIGINT << (length(bin($v)) - 1)) - 64)"

  /** JVM twin for specs. */
  def lp(v: Long): Long = {
    require(v >= 1, s"FixedLog.lp: v must be positive, got $v")
    val f = 63 - java.lang.Long.numberOfLeadingZeros(v)
    64L * f + (v * 64L) / (1L << f) - 64L
  }
}

/** Corpus SELECTION operators — the "which documents feed the training mix,
  * and with what weight" layer that sits between hygiene (dedup /
  * decontamination, [[Dedup]] / [[DocTextOps]]) and assembly (chunk / pack /
  * mix). All scores are fixed-point integers ([[FixedLog]]) so every verdict
  * replays bit-for-bit in the DuckDB oracle. */
object Selection {

  /** Reference/target language slice standing in for the trusted corpus
    * (CCNet's Wikipedia, DSIR's target set) — shared with the oracles. */
  val DefaultRefLang = "en"

  private def bigrams(documents: DataFrame) =
    documents.where("size(split(text, ' ')) >= 2")
      .selectExpr("doc_id", "lang", s"${Shingles.ws} AS ws")
      .selectExpr("doc_id", "lang",
        s"explode(${Shingles.grams(2, distinct = false)}) AS g")

  /** Reference-model FLUENCY scoring, after CCNet (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): score each document by how familiar its word bigrams are to a
    * language model trained on a trusted reference corpus (CCNet uses a
    * Wikipedia KenLM; here the model is the corpus's own `lang = refLang`
    * slice — no external data in this sandbox — and the LM is add-one
    * bigram counts on a fixed-point log2 scale instead of Kneser–Ney
    * floats, so the score is engine-exact).
    *
    * Higher `avg_log2_x64` = more high-frequency reference bigrams = more
    * fluent under the reference model; unseen bigrams contribute lp(1)=0.
    * Shape at 100 TB: the reference model is eval-suite/wiki-scale, not
    * corpus-scale — broadcast-joined against the exploded corpus bigrams
    * (real pipelines also prune the vocab to top-M first), then one
    * per-document aggregation that rides the scan partitioning. */
  def lmScore(documents: DataFrame, refLang: String = DefaultRefLang): DataFrame = {
    val big = bigrams(documents)
    val ref = big.where(s"lang = '$refLang'").groupBy("g").agg(count(lit(1)).as("c"))
    big.join(broadcast(ref), Seq("g"), "left")
      .selectExpr("doc_id", s"${FixedLog.spark("coalesce(c, CAST(0 AS BIGINT)) + 1")} AS lp")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp").as("lm_log2_x64"))
      .selectExpr("doc_id", "n_bigrams", "lm_log2_x64",
        "lm_log2_x64 DIV n_bigrams AS avg_log2_x64")
      .orderBy("doc_id")
  }

  /** Hashed-feature bucket count for [[dsirWeights]] — shared with the
    * DuckDB oracle so the two cannot drift. Real DSIR uses 10k buckets;
    * 256 keeps every bucket populated on the small synthetic corpora. */
  val DefaultDsirBuckets = 256

  /** DSIR importance scores (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): featurize each document as hashed
    * bigram buckets, fit unigram bucket models for the TARGET distribution
    * (the `lang = targetLang` slice) and the RAW distribution (the whole
    * corpus), and score log p_target(doc) − p_raw(doc) under them. Both
    * models are add-one bucket counts on the fixed-point log2 scale.
    *
    * Since the target slice is a subset of raw, every per-bigram ratio is
    * ≤ 0; we report the NEGATED log-ratio (`neg_log2_x64 ≥ 0`, smaller =
    * more target-like; the resampling weight is 2^(−neg/64)) so ranking
    * reads ascending. Shape at 100 TB: the bucket table is `buckets` rows
    * — a broadcast — built in one pass (conditional + total count in the
    * same aggregation), and scoring is a map-side join + one per-document
    * aggregation; nothing scales beyond the corpus scan. */
  def dsirWeights(documents: DataFrame, targetLang: String = DefaultRefLang,
                  buckets: Int = DefaultDsirBuckets): DataFrame = {
    val bx = bigrams(documents)
      .selectExpr("doc_id", "lang", s"${Shingles.h32("g")} % $buckets AS b")
    val tbl = bx.groupBy("b").agg(
      sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("t"),
      count(lit(1)).as("r"))
    bx.join(broadcast(tbl), Seq("b"))
      .selectExpr("doc_id",
        s"${FixedLog.spark("r + 1")} - ${FixedLog.spark("t + 1")} AS w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("w").as("neg_log2_x64"))
      .selectExpr("doc_id", "n_bigrams", "neg_log2_x64",
        "neg_log2_x64 DIV n_bigrams AS avg_neg_log2_x64")
      .orderBy("doc_id")
  }

  /** Per-source keep budget for [[sourceCap]] — shared with the oracle. */
  val DefaultSourceCap = 10

  /** Per-SOURCE document cap — the per-domain budget every crawl pipeline
    * applies so one boilerplate-heavy domain cannot dominate the mix
    * (RefinedWeb/C4 keep fixed per-domain budgets): keep the top `cap`
    * documents of each source by (lexical diversity DESC, doc_id ASC) —
    * the [[DocTextOps.qualityScore]] diversity signal, integer-exact.
    *
    * Deliberately NOT a row_number window: a window partitioned by source
    * pins every document of a hot domain into ONE task — the exact skew
    * this operator exists to police. Instead the classic two-stage exact
    * top-k: stage 1 keeps a bounded `cap`-slot heap per source per
    * PARTITION (map-only, memory ≤ sources·cap slots per task), so at most
    * cap·partitions rows per source reach the stage-2 shuffle regardless
    * of how hot the domain is. */
  def sourceCap(documents: DataFrame, cap: Int = DefaultSourceCap): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    // null text/source rows cannot rank (and would NPE the typed encoder);
    // mirrored by the oracle's WHERE
    val scored = documents.where("text IS NOT NULL AND source IS NOT NULL")
      .selectExpr("doc_id", "source",
        "(CAST(size(array_distinct(split(text, ' '))) AS BIGINT) * 1000000)" +
          " DIV size(split(text, ' ')) AS diversity_ppm")
      .as[(Long, String, Long)]
    // strictly better under (diversity DESC, doc_id ASC); total given distinct ids
    def better(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    // dequeue() must pop the WORST entry: under lt = better, max = worst
    val worstOnTop = Ordering.fromLessThan[(Long, Long)](better)
    val partial = scored.mapPartitions { it =>
      val heaps = scala.collection.mutable.HashMap
        .empty[String, scala.collection.mutable.PriorityQueue[(Long, Long)]]
      it.foreach { case (id, src, div) =>
        val pq = heaps.getOrElseUpdate(src,
          scala.collection.mutable.PriorityQueue.empty(worstOnTop))
        pq.enqueue((div, id))
        if (pq.size > cap) pq.dequeue()
      }
      heaps.iterator.flatMap { case (src, pq) =>
        pq.iterator.map { case (div, id) => (id, src, div) }
      }
    }
    partial.groupByKey(_._2).flatMapGroups { (src, it) =>
      val top = it.toArray.sortBy { case (id, _, div) => (-div, id) }.take(cap)
      top.iterator.zipWithIndex.map { case ((id, _, div), i) =>
        (id, src, div, (i + 1).toLong)
      }
    }
      .toDF("doc_id", "source", "diversity_ppm", "rk")
      .orderBy("source", "rk")
  }
}
