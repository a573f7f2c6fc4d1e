package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.SnapshotStore

/** Model-based randomized exercise of the SnapshotStore op surface: a
  * seeded sequence of append / add-column append / dropColumn / renameColumn /
  * compact /
  * upsert is replayed against an in-memory model, asserting after every
  * few ops that `readRange(0, latest)` returns exactly the model's rows
  * (missing columns as NULL, dropped columns absent) — the whole-store
  * consistency invariant no single-path spec can cover. */
class StorePropertySpec extends AnyFunSuite with SparkFixture {

  /** model row: key -> (col -> value); absent col = null on read */
  private type Model = scala.collection.mutable.LinkedHashMap[Long, Map[String, Long]]

  private def writeDf(rows: Seq[(Long, Map[String, Long])], cols: Seq[String]) = {
    val schema = StructType(StructField("k", LongType, nullable = false) +:
      cols.map(c => StructField(c, LongType, nullable = true)))
    val data = rows.map { case (k, m) =>
      Row.fromSeq(k +: cols.map(c => m.get(c).map(Long.box).orNull))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), schema)
  }

  private def check(store: SnapshotStore, model: Model, dropped: Set[String],
                    allCols: Seq[String], tag: String,
                    rng: scala.util.Random): Unit = {
    val visible = allCols.filterNot(dropped.contains)
    val got = store.readRange(spark, 0L, store.latest.get)
    assert(got.columns.sorted.toSeq == ("k" +: visible).sorted,
      s"[$tag] schema mismatch: ${got.columns.sorted.toSeq}")
    val gotRows = got.collect().map { r =>
      r.getLong(r.fieldIndex("k")) -> visible.flatMap { c =>
        val i = r.fieldIndex(c)
        if (r.isNullAt(i)) None else Some(c -> r.getLong(i))
      }.toMap
    }.toMap
    val want = model.map { case (k, m) =>
      k -> m.filter { case (c, _) => !dropped.contains(c) }
    }.toMap
    assert(gotRows == want, s"[$tag] contents diverged from model")
    // stats-pruned read over a random key slice must agree with the model
    // (snapshots/files outside [lo, hi] are skipped via manifest stats;
    // pruning must accelerate, never decide, membership)
    if (model.nonEmpty) {
      val keys = model.keys.toVector.sorted
      val lo = keys(rng.nextInt(keys.size))
      val hi = lo + rng.nextInt(6)
      val pruned = store.readRangePruned(spark, 0L, store.latest.get, "k", lo, hi)
        .select("k").collect().map(_.getLong(0)).sorted.toSeq
      val wantKeys = keys.filter(k => k >= lo && k <= hi)
      assert(pruned == wantKeys, s"[$tag] pruned read [$lo,$hi] diverged: $pruned vs $wantKeys")
    }
  }

  for (seed <- Seq(11L, 23L)) test(s"random op sequence matches the model (seed $seed)") {
    val rng = new scala.util.Random(seed)
    val store = new SnapshotStore(
      Files.createTempDirectory(s"graft-storeprop-$seed").toString)
    val model: Model = scala.collection.mutable.LinkedHashMap.empty
    var allCols = Vector("a", "b")
    var dropped = Set.empty[String]
    var nextKey = 0L
    var nextCol = 0

    def freshRows(n: Int, cols: Seq[String]): Seq[(Long, Map[String, Long])] =
      (0 until n).map { _ =>
        val k = nextKey; nextKey += 1
        k -> cols.map(c => c -> (k * 31 + c.hashCode % 97)).toMap
      }

    // first snapshot so every later op has something to act on
    val init = freshRows(4, allCols)
    store.append(writeDf(init, allCols), statsCol = Some("k"))
    init.foreach { case (k, m) => model(k) = m }
    var batchMark = 0L // exactly-once ledger model for app "prop"

    for (op <- 1 to 24) {
      rng.nextInt(7) match {
        case 0 => // plain append over the current visible schema
          val cols = allCols.filterNot(dropped.contains)
          val rows = freshRows(1 + rng.nextInt(3), cols)
          store.append(writeDf(rows, cols), statsCol = Some("k"))
          rows.foreach { case (k, m) => model(k) = m }
        case 5 => // exactly-once append: a replayed batch must be a no-op
          val cols = allCols.filterNot(dropped.contains)
          if (rng.nextBoolean() && batchMark > 0) {
            // replay an already-committed batch id: rows must NOT land
            val rows = freshRows(1, cols)
            val r = store.appendExactlyOnce(writeDf(rows, cols), "prop",
              batchId = rng.nextInt(batchMark.toInt).toLong, statsCol = Some("k"))
            assert(r.isEmpty, s"replayed batch committed at op $op")
            nextKey -= 1 // the row never landed; reuse its key
          } else {
            batchMark += 1
            val rows = freshRows(1 + rng.nextInt(2), cols)
            val r = store.appendExactlyOnce(writeDf(rows, cols), "prop",
              batchId = batchMark, statsCol = Some("k"))
            assert(r.isDefined, s"fresh batch $batchMark refused at op $op")
            rows.foreach { case (k, m) => model(k) = m }
          }
        case 1 => // ADD-COLUMN append: a brand-new column appears
          val c = s"x$nextCol"; nextCol += 1
          allCols = allCols :+ c
          val cols = allCols.filterNot(dropped.contains)
          val rows = freshRows(1 + rng.nextInt(2), cols)
          store.append(writeDf(rows, cols))
          rows.foreach { case (k, m) => model(k) = m }
        case 2 => // DROP-COLUMN (keep at least one non-key column visible)
          val candidates = allCols.filterNot(dropped.contains)
          if (candidates.size > 1) {
            val c = candidates(rng.nextInt(candidates.size))
            store.dropColumn(spark, c)
            dropped += c
            // re-adding the dropped name must be rejected loudly
            intercept[IllegalArgumentException] {
              store.append(writeDf(freshRows(1, Seq(c)), Seq(c)))
            }
            nextKey -= 1 // the rejected row never landed; reuse its key
          }
        case 3 => // compact everything so far
          if (store.snapshots.size >= 2)
            store.compact(spark, upToInclusive = store.latest.get)
        case 6 => // RENAME-COLUMN: old rows must surface under the new name
          val candidates = allCols.filterNot(dropped.contains)
          if (candidates.nonEmpty) {
            val c = candidates(rng.nextInt(candidates.size))
            val c2 = s"r$nextCol"; nextCol += 1
            store.renameColumn(spark, c, c2)
            allCols = allCols.map(x => if (x == c) c2 else x)
            model.foreach { case (k, m) =>
              if (m.contains(c)) model(k) = m - c + (c2 -> m(c))
            }
            // the retired source name must be rejected loudly
            intercept[IllegalArgumentException] {
              store.append(writeDf(freshRows(1, Seq(c)), Seq(c)))
            }
            nextKey -= 1 // the rejected row never landed; reuse its key
          }
        case 4 => // upsert: update some existing keys + insert a new one
          val cols = allCols.filterNot(dropped.contains)
          val keys = model.keys.toVector
          val updKeys = rng.shuffle(keys).take(1 + rng.nextInt(2))
          val ins = freshRows(1, cols)
          val upd = updKeys.map(k => k -> cols.map(c => c -> (k * 7 + op)).toMap)
          store.upsert(spark, writeDf(upd ++ ins, cols), "k", statsCol = Some("k"))
          (upd ++ ins).foreach { case (k, m) => model(k) = m }
      }
      if (op % 5 == 0 || op == 24)
        check(store, model, dropped, allCols, s"seed=$seed op=$op", rng)
    }
  }
}
