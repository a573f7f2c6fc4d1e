package graft.spark

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.io.SnapshotStore

/** Snapshot compaction (SnapshotStore.compact) — the small-files
  * maintenance action: table content is preserved, retired snapshots
  * disappear from the live set, incremental checkpoints inside the
  * rewritten range fail LOUDLY (never silently duplicate), and a crash
  * between the manifest commit and physical cleanup leaves a fully
  * consistent reader view (cleanup is a separate idempotent step). */
class CompactionSpec extends AnyFunSuite with SparkFixture {

  private def freshStore(tag: String): SnapshotStore = {
    val dir = Files.createTempDirectory(s"graft-compact-$tag").toString
    new SnapshotStore(dir)
  }

  private def rows(store: SnapshotStore, from: Long = 0L): Seq[Long] = {
    val to = store.latest.get
    store.readRange(spark, from, to).select("id").collect().map(_.getLong(0)).toSeq.sorted
  }

  test("compaction preserves content, shrinks the live set, removes retired files") {
    import spark.implicits._
    val store = freshStore("basic")
    store.append(Seq(1L, 2L).toDF("id"))
    store.append(Seq(3L).toDF("id"))
    store.append(Seq(4L, 5L).toDF("id"))
    assert(store.snapshots === Seq(1L, 2L, 3L))
    val before = rows(store)

    val oldData = (1L to 3L).map(store.dataLocation)
    val cid = store.compact(spark, upToInclusive = 3L)
    assert(cid === 4L)
    assert(store.snapshots === Seq(4L))
    assert(store.compactionWatermark === 4L)
    assert(rows(store) === before)
    // retired data + manifests physically gone after cleanup
    for (old <- 1L to 3L) {
      assert(!Files.exists(oldData((old - 1).toInt)))
      assert(!Files.exists(Paths.get(store.root, "_manifests", s"$old.json")))
    }
    // appends continue above the compacted id
    store.append(Seq(6L).toDF("id"))
    assert(store.snapshots === Seq(4L, 5L))
    assert(rows(store) === (before :+ 6L))
  }

  test("checkpoints: full read and >= watermark serve; below watermark fails loudly") {
    import spark.implicits._
    val store = freshStore("ckpt")
    store.append(Seq(1L).toDF("id"))
    store.append(Seq(2L).toDF("id"))
    store.append(Seq(3L).toDF("id"))
    // partial compaction of the first two snapshots only
    val cid = store.compact(spark, upToInclusive = 2L)
    assert(cid === 4L && store.snapshots === Seq(3L, 4L))

    // full read: complete, no duplicates
    assert(rows(store) === Seq(1L, 2L, 3L))
    // a checkpoint BETWEEN the compacted inputs and the compacted id would
    // re-see rewritten rows (snapshot 4 holds rows 1,2 the reader already
    // processed at checkpoint 3) — rejected, not silently duplicated
    val e = intercept[IllegalArgumentException](store.readRange(spark, 3L, 4L))
    assert(e.getMessage.contains("compaction watermark"))
    // at/above the watermark: exact incremental reads resume
    store.append(Seq(9L).toDF("id"))
    assert(store.readRange(spark, 4L, 5L).collect().map(_.getLong(0)).toSeq === Seq(9L))
  }

  test("manifest stats prune whole snapshots; stats-less snapshots stay conservative") {
    import spark.implicits._
    val store = freshStore("stats")
    store.append(Seq(1L, 5L).toDF("id"), statsCol = Some("id"))    // [1,5]
    store.append(Seq(10L, 20L).toDF("id"), statsCol = Some("id"))  // [10,20]
    store.append(Seq(100L).toDF("id"), statsCol = Some("id"))      // [100,100]
    store.append(Seq(7L).toDF("id"))                               // no stats

    assert(store.snapshotStats(1L) === Some(("id", 1L, 5L)))
    assert(store.snapshotStats(4L) === None)

    // predicate [6,30]: snapshot 2 matches, 1 and 3 prune away, 4 has no
    // stats → conservatively kept (and then filtered by the residual)
    val (kept, skipped) = store.pruneSnapshots(0L, 4L, "id", 6L, 30L)
    assert(kept === Seq(2L, 4L) && skipped === Seq(1L, 3L))
    assert(store.readRangePruned(spark, 0L, 4L, "id", 6L, 30L)
      .collect().map(_.getLong(0)).toSeq.sorted === Seq(7L, 10L, 20L))

    // all snapshots pruned → empty result, schema intact
    val none = store.readRangePruned(spark, 0L, 4L, "id", 1000L, 2000L)
    assert(none.columns.toSeq === Seq("id") && none.count() === 0L)

    // compaction merges the stats range when every input carries them
    val store2 = freshStore("stats2")
    store2.append(Seq(1L, 5L).toDF("id"), statsCol = Some("id"))
    store2.append(Seq(10L, 20L).toDF("id"), statsCol = Some("id"))
    val cid = store2.compact(spark, upToInclusive = 2L)
    assert(store2.snapshotStats(cid) === Some(("id", 1L, 20L)))
  }

  test("crash window between commit and cleanup: consistent view, cleanup idempotent") {
    import spark.implicits._
    val store = freshStore("crash")
    store.append(Seq(1L, 2L).toDF("id"))
    store.append(Seq(3L).toDF("id"))
    val snap1Data = store.dataLocation(1L)
    // simulate the crash: manifest committed, physical cleanup never ran
    store.compact(spark, upToInclusive = 2L, cleanup = false)
    // stale files still on disk...
    assert(Files.exists(snap1Data))
    // ...but invisible to every reader: the compacted snapshot (id 3,
    // replacing 1 and 2) is the only live prefix — no duplicates
    assert(store.snapshots === Seq(3L))
    assert(rows(store) === Seq(1L, 2L, 3L))
    // recovery cleanup is idempotent
    store.expireRetired()
    store.expireRetired()
    assert(!Files.exists(snap1Data))
    assert(rows(store) === Seq(1L, 2L, 3L))
  }
}
