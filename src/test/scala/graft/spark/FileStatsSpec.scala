package graft.spark

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.io.SnapshotStore

/** Per-file manifest stats (the Iceberg manifest-entry granularity below
  * the snapshot-level range): a range-sorted snapshot answers a slice
  * query opening a fraction of its data files, an unsorted one still
  * answers correctly with every file kept. */
class FileStatsSpec extends AnyFunSuite with SparkFixture {

  private def freshStore(tag: String) =
    new SnapshotStore(Files.createTempDirectory(s"graft-fstats-$tag").toString)

  test("range-sorted snapshot prunes to the matching files") {
    val store = freshStore("sorted")
    val df = spark.range(0L, 8000L).toDF("id")
      .repartitionByRange(8, col("id"))
      .sortWithinPartitions("id")
    val id = store.append(df, statsCol = Some("id"))

    val fs = store.fileStats(id, "id").get
    assert(fs.size === 8)
    // file ranges are disjoint and cover [0, 7999]
    assert(fs.map(_._2).min === 0L && fs.map(_._3).max === 7999L)

    val Some((kept, skipped)) = store.pruneFiles(id, "id", 2100L, 2300L)
    assert(kept.size <= 2, s"kept $kept")
    assert(skipped >= 6)

    val got = store.readRangePruned(spark, 0L, id, "id", 2100L, 2300L)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === (2100L to 2300L))
    // stats for an unrelated column: no file pruning, conservative read
    assert(store.pruneFiles(id, "other", 0L, 1L).isEmpty)
  }

  test("unsorted snapshot keeps all files and still answers correctly") {
    val store = freshStore("unsorted")
    // round-robin partitioning: every file spans ~the full value range
    val df = spark.range(0L, 4000L).toDF("id").repartition(4)
    val id = store.append(df, statsCol = Some("id"))
    val Some((kept, skipped)) = store.pruneFiles(id, "id", 100L, 199L)
    assert(skipped === 0 && kept.size === 4)
    val got = store.readRangePruned(spark, 0L, id, "id", 100L, 199L)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === (100L to 199L))
  }

  test("file pruning composes with snapshot pruning across appends") {
    val store = freshStore("multi")
    for (base <- Seq(0L, 10000L, 20000L)) {
      val df = spark.range(base, base + 8000L).toDF("id")
        .repartitionByRange(4, col("id")).sortWithinPartitions("id")
      store.append(df, statsCol = Some("id"))
    }
    val last = store.latest.get
    // one snapshot kept, then ~1 of its 4 files
    val (keptSnaps, prunedSnaps) = store.pruneSnapshots(0L, last, "id", 12000L, 12500L)
    assert(keptSnaps.size === 1 && prunedSnaps.size === 2)
    val got = store.readRangePruned(spark, 0L, last, "id", 12000L, 12500L)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === (12000L to 12500L))
    val Some((keptFiles, _)) = store.pruneFiles(keptSnaps.head, "id", 12000L, 12500L)
    assert(keptFiles.size <= 2)
  }
}
