package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation-level QUALITY signals over the flagship transcript table
  * (`BASELINE.json` `input_hint` schema: conv_id, turn_idx, role, text,
  * tool, ts) — the transcript-native analogs of the document hygiene layer:
  * chat-data pipelines filter assistant turns the way web pipelines filter
  * documents, and the first signal they compute is "did the model just
  * parrot the user?".
  */
object TranscriptOps {

  /** Echo verdict threshold (ppm of the assistant turn's distinct tokens
    * that also appear in the preceding user turn) — shared with the DuckDB
    * oracle. 60% splits the synthetic corpus near its median (sf0.01:
    * 530 echo / 556 clean), so both verdicts stay driver-gate-visible. */
  val DefaultEchoThresholdPpm = 600000L

  /** ECHO DETECTION — flag assistant turns that substantially repeat the
    * most recent preceding user turn (copy/parrot filtering, the assistant-
    * turn quality gate chat-data pipelines run before training on agent
    * transcripts). For each assistant turn, the signal is the distinct-token
    * overlap with the last user turn before it in the same conversation:
    *
    *   overlap_ppm = |tokens(assistant) ∩ tokens(user)| · 10^6 DIV |tokens(assistant)|
    *
    * in exact integer arithmetic (set semantics on both sides), `is_echo`
    * iff `overlap_ppm >= thresholdPpm`. Assistant turns with no preceding
    * user turn are out of scope (no row). Tool turns between the user turn
    * and the assistant reply don't reset the pairing — the reply is judged
    * against what the USER last said, which is the parroting definition.
    *
    * Shape at 100 TB: the only shuffle is the conv_id-clustered window
    * (running `last` of the user text over turn_idx order) — the same
    * `ClusteredDistribution(conv_id)` the segmentation fold declares, so a
    * conv_id-bucketed table runs this with ZERO exchanges, and window state
    * is one string per partition row, bounded by the conversation. The
    * overlap itself is per-row column algebra after the window. */
  def echoDetect(turns: DataFrame,
                 thresholdPpm: Long = DefaultEchoThresholdPpm): DataFrame = {
    require(thresholdPpm >= 0, s"echoDetect: thresholdPpm must be >= 0, got $thresholdPpm")
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    turns
      .withColumn("prev_user",
        last(when(col("role") === "user", col("text")), ignoreNulls = true).over(w))
      .where("role = 'assistant' AND prev_user IS NOT NULL AND text IS NOT NULL")
      .selectExpr("conv_id", "turn_idx",
        "array_distinct(split(text, ' ')) AS toks",
        "array_distinct(split(prev_user, ' ')) AS utoks")
      .selectExpr("conv_id", "turn_idx",
        "CAST(size(toks) AS BIGINT) AS n_distinct_tokens",
        "CAST(size(array_intersect(toks, utoks)) AS BIGINT) * 1000000" +
          " DIV size(toks) AS overlap_ppm")
      .selectExpr("conv_id", "turn_idx", "n_distinct_tokens", "overlap_ppm",
        s"overlap_ppm >= $thresholdPpm AS is_echo")
      .orderBy("conv_id", "turn_idx")
  }
}
