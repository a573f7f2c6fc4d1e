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

  test("racing writers: distinct ids, no clobber; same epoch commits exactly once") {
    import spark.implicits._
    import java.util.concurrent.{Callable, CountDownLatch, Executors}
    val store = freshStore("race")
    val pool = Executors.newFixedThreadPool(2)
    def task[T](body: => T): Callable[T] = new Callable[T] { def call(): T = body }
    try {
      // two concurrent plain appends with different content: both must
      // commit, under different ids, with both contents readable
      val start = new CountDownLatch(1)
      val fa = pool.submit(task { start.await(); store.append(Seq(1L, 2L).toDF("id")) })
      val fb = pool.submit(task { start.await(); store.append(Seq(3L).toDF("id")) })
      start.countDown()
      val (ida, idb) = (fa.get(), fb.get())
      assert(ida != idb)
      assert(allIds(store) === Seq(1L, 2L, 3L))

      // split-brain: two drivers replaying the SAME (appId, batchId) —
      // exactly one publishes, whatever the interleaving
      val start2 = new CountDownLatch(1)
      val g1 = pool.submit(task { start2.await()
        store.appendExactlyOnce(Seq(10L).toDF("id"), "app", 5L) })
      val g2 = pool.submit(task { start2.await()
        store.appendExactlyOnce(Seq(10L).toDF("id"), "app", 5L) })
      start2.countDown()
      val results = Seq(g1.get(), g2.get())
      assert(results.count(_.nonEmpty) === 1, results.toString)
      assert(allIds(store).count(_ == 10L) === 1)
      // no orphaned stage dirs from the losing writer
      val stages = java.nio.file.Files.list(java.nio.file.Paths.get(store.root, "data"))
        .iterator()
      var stageCount = 0
      while (stages.hasNext) {
        if (stages.next().getFileName.toString.startsWith("stage-")) stageCount += 1
      }
      // three committed snapshots -> three live stage dirs, none extra
      assert(stageCount === store.snapshots.size, s"stageCount=$stageCount")
    } finally pool.shutdown()
  }

  test("a partial compact cannot shadow a newer ledger mark") {
    import spark.implicits._
    val store = freshStore("shadow")
    assert(store.appendExactlyOnce(Seq(1L).toDF("id"), "app", 1L).nonEmpty) // snap 1
    store.append(Seq(2L).toDF("id")) // snap 2
    assert(store.appendExactlyOnce(Seq(3L).toDF("id"), "app", 5L).nonEmpty) // snap 3
    // compact only the {1,2} prefix: its replacement manifest is now the
    // NEWEST manifest, and must carry app's GLOBAL max (5), not the max of
    // its own inputs (1) — otherwise a replay of batch 5 would readmit
    store.compact(spark, upToInclusive = 2L)
    assert(store.txnLastBatch("app") === Some(5L))
    assert(store.appendExactlyOnce(Seq(3L).toDF("id"), "app", 5L).isEmpty)
    assert(allIds(store) === Seq(1L, 2L, 3L))
  }

  test("orphaned stage dirs are reclaimed by the age-guarded GC") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    val store = freshStore("orphan")
    store.append(Seq(1L).toDF("id"))
    // a crashed writer's leftover: staged, never committed, old mtime
    val orphan = Paths.get(store.root, "data", "stage-dead-writer")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 8000000L))
    // a FRESH unreferenced stage simulates an in-flight writer: kept
    val inflight = Paths.get(store.root, "data", "stage-in-flight")
    Files.createDirectories(inflight)
    intercept[IllegalArgumentException](store.expireOrphanStages(olderThanMs = 50000))
    assert(store.expireOrphanStages(olderThanMs = 3600000L) === 1)
    assert(!Files.exists(orphan))
    assert(Files.exists(inflight))
    assert(Files.exists(store.dataLocation(1L))) // committed data untouched
    assert(allIds(store) === Seq(1L))
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
