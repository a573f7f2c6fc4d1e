package graft.spark

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.io.SnapshotStore

/** Copy-on-write MERGE (SnapshotStore.upsert): matched keys are replaced,
  * new keys inserted, and ONLY the snapshots containing a matched key are
  * rewritten — untouched snapshots keep their files; stats-pruned probing;
  * loud contracts (duplicate source keys rejected; pre-upsert incremental
  * checkpoints refuse to serve). */
class UpsertSpec extends AnyFunSuite with SparkFixture {

  private def freshStore(tag: String): SnapshotStore = {
    val dir = Files.createTempDirectory(s"graft-upsert-$tag").toString
    new SnapshotStore(dir)
  }

  private def table(store: SnapshotStore): Map[Long, String] =
    store.readRange(spark, 0L, store.latest.get)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("upsert replaces matched keys, inserts new ones, rewrites only touched snapshots") {
    import spark.implicits._
    val store = freshStore("basic")
    store.append(Seq((0L, "a0"), (1L, "a1")).toDF("k", "v"), statsCol = Some("k"))
    store.append(Seq((10L, "b0"), (11L, "b1")).toDF("k", "v"), statsCol = Some("k"))
    store.append(Seq((20L, "c0"), (21L, "c1")).toDF("k", "v"), statsCol = Some("k"))
    val snap2Data = store.dataLocation(2L)
    val snap2File = Files.list(snap2Data).count()

    // touches keys 10 (in snap 2) and 99 (new): snap 1 is stats-pruned
    // (range [0,1] can't intersect [10,99]); snap 3's range [20,21] does
    // intersect, so it is PROBED and cleared by the semi-join
    val uid = store.upsert(spark, Seq((10L, "B0"), (99L, "new")).toDF("k", "v"),
      keyCol = "k", statsCol = Some("k"))
    assert(uid === 4L)
    assert(store.snapshots === Seq(1L, 3L, 4L), "only snapshot 2 retired")
    assert(table(store) === Map(0L -> "a0", 1L -> "a1", 10L -> "B0", 11L -> "b1",
      20L -> "c0", 21L -> "c1", 99L -> "new"))
    // untouched snapshots keep their files byte-for-byte (same file count,
    // dirs still present); the rewritten one is physically gone
    assert(Files.list(store.dataLocation(1L)).count() > 0)
    assert(!Files.exists(snap2Data))
    assert(Files.list(store.dataLocation(3L)).count() > 0)
    assert(snap2File > 0) // sanity: it did exist before

    // merged snapshot carries fresh stats: [10, 99]
    assert(store.snapshotStats(4L) === Some(("k", 10L, 99L)))
  }

  test("pure-insert upsert appends; empty store appends") {
    import spark.implicits._
    val store = freshStore("insert")
    val first = store.upsert(spark, Seq((1L, "x")).toDF("k", "v"), "k")
    assert(first === 1L && store.compactionWatermark === 0L)
    store.append(Seq((2L, "y")).toDF("k", "v"))
    val ins = store.upsert(spark, Seq((5L, "z")).toDF("k", "v"), "k")
    assert(ins === 3L)
    assert(store.snapshots === Seq(1L, 2L, 3L), "no snapshot retired on pure insert")
    assert(store.compactionWatermark === 0L, "pure insert must not invalidate checkpoints")
    assert(table(store) === Map(1L -> "x", 2L -> "y", 5L -> "z"))
  }

  test("upsert advances the watermark: pre-upsert incremental checkpoints fail loudly") {
    import spark.implicits._
    val store = freshStore("wm")
    store.append(Seq((1L, "x")).toDF("k", "v"))
    store.append(Seq((2L, "y")).toDF("k", "v"))
    val uid = store.upsert(spark, Seq((1L, "X")).toDF("k", "v"), "k")
    assert(store.compactionWatermark === uid)
    val e = intercept[IllegalArgumentException] {
      store.readRange(spark, fromExclusive = 1L, toInclusive = uid)
    }
    assert(e.getMessage.contains("compaction watermark"))
    // full read and at-watermark checkpoints still serve
    assert(table(store) === Map(1L -> "X", 2L -> "y"))
  }

  test("duplicate source keys are rejected, not last-writer-wins") {
    import spark.implicits._
    val store = freshStore("dup")
    store.append(Seq((1L, "x")).toDF("k", "v"))
    val e = intercept[IllegalArgumentException] {
      store.upsert(spark, Seq((1L, "a"), (1L, "b")).toDF("k", "v"), "k")
    }
    assert(e.getMessage.contains("duplicate"))
  }
}
