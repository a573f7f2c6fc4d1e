package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.io.SnapshotStore
import graft.streaming.StreamIngest

/** Exactly-once streaming ingestion (StreamIngest + appendExactlyOnce):
  * each micro-batch lands as one snapshot, a replayed batchId is a no-op,
  * and the dedup high-water mark survives compaction. */
class StreamIngestSpec extends AnyFunSuite with SparkFixture {

  private def freshStore(tag: String) =
    new SnapshotStore(Files.createTempDirectory(s"graft-ingest-$tag").toString)

  private def allIds(store: SnapshotStore): Seq[Long] =
    store.readRange(spark, 0L, store.latest.get)
      .select("id").collect().map(_.getLong(0)).toSeq.sorted

  test("micro-batches land as snapshots; every row exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = freshStore("basic")
    val input = MemoryStream[Long]
    val ckpt = Files.createTempDirectory("graft-ingest-ckpt").toString
    val q = StreamIngest.start(
      input.toDS().toDF("id"), store, appId = "ingest-a",
      checkpointDir = ckpt, statsCol = Some("id"))
    input.addData(1L, 2L, 3L)
    q.processAllAvailable()
    input.addData(4L, 5L)
    q.processAllAvailable()
    q.stop()
    assert(allIds(store) === Seq(1L, 2L, 3L, 4L, 5L))
    assert(store.snapshots.size >= 2) // one snapshot per non-empty epoch
    assert(store.txnLastBatch("ingest-a").nonEmpty)
    // landed snapshots carry stats -> prunable
    assert(store.snapshots.forall(id => store.snapshotStats(id).isDefined))
  }

  test("a replayed batchId is skipped, not duplicated") {
    import spark.implicits._
    val store = freshStore("replay")
    val b0 = Seq(10L, 11L).toDF("id")
    val b1 = Seq(12L).toDF("id")
    assert(store.appendExactlyOnce(b0, "app", 0L).nonEmpty)
    assert(store.appendExactlyOnce(b1, "app", 1L).nonEmpty)
    // crash-replay of the last epoch: same batchId arrives again
    assert(store.appendExactlyOnce(b1, "app", 1L).isEmpty)
    // late replay of an OLDER epoch (ids are monotone per app)
    assert(store.appendExactlyOnce(b0, "app", 0L).isEmpty)
    // an independent app has its own ledger
    assert(store.appendExactlyOnce(Seq(99L).toDF("id"), "other", 0L).nonEmpty)
    assert(allIds(store) === Seq(10L, 11L, 12L, 99L))
  }

  test("the dedup mark survives compaction and upsert") {
    import spark.implicits._
    val store = freshStore("compact")
    assert(store.appendExactlyOnce(Seq(1L).toDF("id"), "app", 0L).nonEmpty)
    assert(store.appendExactlyOnce(Seq(2L).toDF("id"), "app", 1L).nonEmpty)
    store.compact(spark, upToInclusive = store.latest.get)
    // the replaced manifests are physically gone; the carried mark dedups
    assert(store.appendExactlyOnce(Seq(2L).toDF("id"), "app", 1L).isEmpty)
    assert(store.txnLastBatch("app") === Some(1L))
    // an upsert rewrite also carries the mark forward
    store.upsert(spark, Seq(2L).toDF("id"), keyCol = "id")
    assert(store.appendExactlyOnce(Seq(1L).toDF("id"), "app", 0L).isEmpty)
    assert(store.appendExactlyOnce(Seq(3L).toDF("id"), "app", 2L).nonEmpty)
    assert(allIds(store) === Seq(1L, 2L, 3L))
  }
}
