package graft.spark

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.io.SnapshotStore
import graft.ops.Incremental

/** Incremental materialized-view maintenance over REAL SnapshotStore
  * snapshots: each append is folded into the view state via ONE keyed
  * partial-merge (never re-reading prior snapshots), and the resulting
  * state is field-for-field equal to a full recompute over the whole
  * table — the MV-consistency invariant the `d_incr_view` oracle also
  * pins cross-engine. */
class IncrementalViewSpec extends AnyFunSuite with SparkFixture {

  private def docsBatch(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map { i =>
      val lang = Seq("en", "de", "fr")((i % 3).toInt)
      val source = Seq("web", "chat")((i % 2).toInt)
      (i, lang, source, 10L + i % 90)
    }.toDF("doc_id", "lang", "source", "n_chars")
  }

  private def sortedRows(df: DataFrame): Seq[(String, String, Long, Long, Long)] =
    df.select("lang", "source", "n_docs", "n_chars_sum", "n_batches_seen")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sortBy(t => (t._1, t._2))

  test("snapshot-fed incremental fold equals full recompute") {
    val store = new SnapshotStore(
      Files.createTempDirectory("graft-incrview").toString)
    val batches = Seq(0L until 40L, 40L until 70L, 70L until 100L)
    var state: Option[DataFrame] = None
    var checkpoint = 0L
    for (b <- batches) {
      val id = store.append(docsBatch(b))
      // the refresh reads ONLY the new snapshot range — O(delta)
      val delta = Incremental.partial(store.readRange(spark, checkpoint, id))
      state = Some(state.fold(delta)(st => Incremental.merge(st, delta)))
      checkpoint = id
    }
    val full = Incremental.partial(
      store.readRange(spark, 0L, store.latest.get))
    // a single full-table partial sees each group once → fix its
    // n_batches_seen to the true per-batch presence count for comparison
    val expected = {
      import org.apache.spark.sql.functions._
      store.readRange(spark, 0L, store.latest.get)
        .withColumn("batch", when(col("doc_id") < 40, 0)
          .when(col("doc_id") < 70, 1).otherwise(2))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars_sum"),
          countDistinct("batch").as("n_batches_seen"))
    }
    assert(sortedRows(state.get) === sortedRows(expected))
    // and the aggregate totals agree with the plain full recompute
    assert(
      state.get.selectExpr("sum(n_docs)").head().getLong(0) ===
        full.selectExpr("sum(n_docs)").head().getLong(0))
  }

  test("a group absent from later batches keeps its state and batch count") {
    import spark.implicits._
    val b0 = Seq((1L, "en", "web", 10L), (2L, "xx", "rare", 5L))
      .toDF("doc_id", "lang", "source", "n_chars")
    val b1 = Seq((3L, "en", "web", 20L)).toDF("doc_id", "lang", "source", "n_chars")
    val st = Incremental.merge(Incremental.partial(b0), Incremental.partial(b1))
    val rows = sortedRows(st)
    assert(rows === Seq(
      ("en", "web", 2L, 30L, 2L),
      ("xx", "rare", 1L, 5L, 1L)))
  }
}
