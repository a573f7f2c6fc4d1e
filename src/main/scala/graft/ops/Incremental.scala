package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance — the aggregate-table analog
  * of the reference's artifact consolidation (`test/consolidate.py:6-41`
  * re-reads every artifact each run; at 10^12 rows a view refresh must cost
  * O(delta), not O(table)).
  *
  * The view state is kept in MERGEABLE partial form (counts and sums per
  * group, plus how many batches contributed): each refresh aggregates ONLY
  * the newly appended batch and folds the resulting G-row partial into the
  * G-row state with one keyed aggregation. Prior batches are never re-read
  * — exactly the shape of an Iceberg incremental scan feeding a summary
  * table. The classic MV-consistency invariant (incremental fold ==
  * full recompute) is enforced two ways: the registered `d_incr_view`
  * query's DuckDB oracle is the FULL recompute, and IncrementalViewSpec
  * replays the fold over real [[graft.io.SnapshotStore]] snapshot range
  * reads.
  */
object Incremental {

  /** Partial aggregate of one batch, in mergeable form. `n_batches_seen`
    * starts at 1: after merging it counts the refreshes that actually
    * contained the group — surfacing the fold order so the oracle equality
    * can't be satisfied by a single-pass recompute that ignores batching. */
  def partial(batch: DataFrame): DataFrame =
    batch.groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("n_chars_sum"),
        lit(1L).as("n_batches_seen"))

  /** Fold one new partial into the view state: one keyed aggregation over
    * state ∪ delta — 2·G rows in, G rows out, independent of table size. */
  def merge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta)
      .groupBy("lang", "source")
      .agg(
        sum("n_docs").as("n_docs"),
        sum("n_chars_sum").as("n_chars_sum"),
        sum("n_batches_seen").as("n_batches_seen"))

  /** The oracled query: three deterministic batches (`doc_id % 3` — stand-ins
    * for three successive snapshot appends) maintained incrementally; the
    * DuckDB oracle computes the same view as ONE full recompute. */
  def incrementalView(documents: DataFrame, nBatches: Int = 3): DataFrame = {
    val state = (1 until nBatches).foldLeft(
      partial(documents.where(col("doc_id") % nBatches === 0))) { (st, b) =>
        merge(st, partial(documents.where(col("doc_id") % nBatches === b)))
      }
    state.orderBy("lang", "source")
  }
}
