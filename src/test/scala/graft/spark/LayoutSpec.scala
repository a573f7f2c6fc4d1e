package graft.spark

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.io.SnapshotStore
import graft.ops.Layout

/** Z-order layout (ops.Layout) — curve correctness and the end-to-end
  * pruning payoff on real SnapshotStore snapshots: a z-sorted table with
  * single-column `zval` manifest stats answers BOTH user-sliced and
  * time-sliced queries opening a fraction of the snapshots, while a
  * time-sorted table can only prune its own dimension. */
class LayoutSpec extends AnyFunSuite with SparkFixture {

  private def zOf(x: Long, y: Long): Long = {
    import spark.implicits._
    Seq((x, y)).toDF("x", "y")
      .selectExpr(s"${Layout.zValueExpr("x", "y", 8, "DIV")} AS z")
      .head().getLong(0)
  }

  test("morton interleave places bits at even/odd positions") {
    // x=3 (11b) -> bits at 2^0, 2^2; y=5 (101b) -> bits at 2^1, 2^5
    assert(zOf(3L, 5L) === (1L + 4L + 2L + 32L))
    assert(zOf(0L, 0L) === 0L)
    assert(zOf(255L, 0L) === (0 until 8).map(i => 1L << (2 * i)).sum)
    assert(zOf(0L, 255L) === (0 until 8).map(i => 1L << (2 * i + 1)).sum)
  }

  test("an aligned 16x16 tile is one contiguous z interval") {
    import spark.implicits._
    val grid = spark.range(0L, 256L * 256L)
      .selectExpr("id % 256 AS x", "id DIV 256 AS y")
      .selectExpr("x", "y", s"${Layout.zValueExpr("x", "y", 8, "DIV")} AS z")
    val zLo = zOf(32L, 16L)
    val zHi = zOf(47L, 31L)
    val inInterval = grid.where(col("z").between(zLo, zHi))
    // exactly the tile's 256 points, nothing outside it
    assert(inInterval.count() === 256L)
    assert(inInterval
      .where(col("x") < 32 || col("x") > 47 || col("y") < 16 || col("y") > 31)
      .count() === 0L)
  }

  /** 64×64 point grid written as 8 snapshots under the given sort key;
    * stats recorded on `statsCol`. */
  private def buildStore(sortKey: String, statsCol: String): SnapshotStore = {
    val store = new SnapshotStore(Files.createTempDirectory(s"graft-z-$sortKey").toString)
    val pts = spark.range(0L, 64L * 64L)
      .selectExpr("id % 64 AS x", "id DIV 64 AS y")
      .selectExpr("x", "y", s"${Layout.zValueExpr("x", "y", 6, "DIV")} AS zval")
    val keyed = pts.withColumn("chunk", expr(s"$sortKey DIV 512"))
    for (c <- 0L until 8L)
      store.append(keyed.where(col("chunk") === c).drop("chunk"),
        statsCol = Some(statsCol))
    store
  }

  private def brute(store: SnapshotStore, cond: String): Set[(Long, Long)] =
    store.readRange(spark, 0L, store.latest.get).where(cond)
      .select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("z-sorted store prunes an aligned tile query to <=2 of 8 snapshots") {
    val zStore = buildStore(sortKey = "zval", statsCol = "zval")
    val (zLo, zHi) = (zOf(16L, 32L), zOf(31L, 47L))
    val (kept, pruned) = zStore.pruneSnapshots(0L, zStore.latest.get, "zval", zLo, zHi)
    assert(kept.size <= 2, s"kept $kept")
    assert(pruned.size >= 6)
    val got = zStore.readRangePruned(spark, 0L, zStore.latest.get, "zval", zLo, zHi)
      .select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute(zStore, "x BETWEEN 16 AND 31 AND y BETWEEN 32 AND 47"))
  }

  test("x-only slice: z store decomposes to few snapshots; y-sorted store reads all") {
    // x in [16,31], y unconstrained — decompose into one z interval per
    // aligned 16-wide y tile (4 intervals over the 64-point y domain)
    val zStore = buildStore(sortKey = "zval", statsCol = "zval")
    val keptUnion = (0L until 4L).flatMap { t =>
      val (lo, hi) = (zOf(16L, t * 16L), zOf(31L, t * 16L + 15L))
      zStore.pruneSnapshots(0L, zStore.latest.get, "zval", lo, hi)._1
    }.toSet
    assert(keptUnion.size < 8, s"z store opened every snapshot: $keptUnion")
    val zRows = (0L until 4L).map { t =>
      val (lo, hi) = (zOf(16L, t * 16L), zOf(31L, t * 16L + 15L))
      zStore.readRangePruned(spark, 0L, zStore.latest.get, "zval", lo, hi)
        .select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }.reduce(_ ++ _)
    assert(zRows === brute(zStore, "x BETWEEN 16 AND 31"))

    // the y-sorted store's stats column is its own sort key; an x
    // predicate finds no usable stats -> every snapshot stays kept
    val yStore = buildStore(sortKey = "y * 64", statsCol = "y")
    val (keptY, _) = yStore.pruneSnapshots(0L, yStore.latest.get, "x", 16L, 31L)
    assert(keptY.size === 8)
  }
}
