package graft.spark

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.io.SnapshotStore

/** ADD-COLUMN schema evolution across snapshots: rows written before a
  * column existed surface it as NULL on read, and the evolved schema
  * survives compaction and upsert — the Iceberg evolution contract. */
class SchemaEvolutionSpec extends AnyFunSuite with SparkFixture {

  private def freshStore(tag: String): SnapshotStore =
    new SnapshotStore(Files.createTempDirectory(s"graft-evolve-$tag").toString)

  test("readRange merges evolved schemas; old rows carry NULL for new columns") {
    import spark.implicits._
    val store = freshStore("read")
    store.append(Seq((1L, "x")).toDF("k", "v"))
    store.append(Seq((2L, "y", "extra2")).toDF("k", "v", "w"))
    val got = store.readRange(spark, 0L, 2L)
    assert(got.columns.sorted.toSeq === Seq("k", "v", "w"))
    val byK = got.collect().map(r => r.getLong(0) -> Option(r.getAs[String]("w"))).toMap
    assert(byK === Map(1L -> None, 2L -> Some("extra2")))
  }

  test("compaction and upsert preserve the evolved superset schema") {
    import spark.implicits._
    val store = freshStore("compact")
    store.append(Seq((1L, "x")).toDF("k", "v"))
    store.append(Seq((2L, "y", "w2")).toDF("k", "v", "w"))
    val cid = store.compact(spark, upToInclusive = 2L)
    val afterCompact = store.read(spark, cid)
    assert(afterCompact.columns.sorted.toSeq === Seq("k", "v", "w"))

    val uid = store.upsert(spark,
      Seq((1L, "X", "w1"), (3L, "z", "w3")).toDF("k", "v", "w"), "k")
    val all = store.readRange(spark, 0L, uid).collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.getAs[String]("w")))).toMap
    assert(all === Map(
      1L -> ("X", Some("w1")), 2L -> ("y", Some("w2")), 3L -> ("z", Some("w3"))))
  }

  test("dropColumn: manifest-only, projected on read, time travel intact") {
    import spark.implicits._
    val store = freshStore("drop")
    val s1 = store.append(Seq((1L, "x", 10L)).toDF("k", "v", "legacy"))
    val s2 = store.append(Seq((2L, "y", 20L)).toDF("k", "v", "legacy"))
    val dropId = store.dropColumn(spark, "legacy")
    assert(store.isSchemaOnly(dropId))
    // data files untouched (manifest-only op): the physical dir still has
    // the column; reads project it away
    assert(spark.read.parquet(store.dataLocation(s1).toString)
      .columns.contains("legacy"))
    assert(store.readRange(spark, 0L, dropId).columns.sorted.toSeq === Seq("k", "v"))
    // time travel below the drop still sees the column
    assert(store.read(spark, s2).columns.sorted.toSeq === Seq("k", "legacy", "v"))
    // dropped name cannot be re-added
    val e = intercept[IllegalArgumentException](
      store.append(Seq((3L, "z", 30L)).toDF("k", "v", "legacy")))
    assert(e.getMessage.contains("legacy"))
    // dropping a column that is not in the schema fails loudly
    intercept[IllegalArgumentException](store.dropColumn(spark, "nope"))
  }

  test("drop survives compaction and upsert; compaction removes it physically") {
    import spark.implicits._
    val store = freshStore("dropcompact")
    store.append(Seq((1L, "x", 10L)).toDF("k", "v", "legacy"))
    store.append(Seq((2L, "y", 20L)).toDF("k", "v", "legacy"))
    val dropId = store.dropColumn(spark, "legacy")
    val cid = store.compact(spark, upToInclusive = dropId)
    // physically gone from the compacted files AND still projected
    assert(spark.read.parquet(store.dataLocation(cid).toString)
      .columns.sorted.toSeq === Seq("k", "v"))
    // the drop set is carried by the replacement manifest (the drop
    // manifest itself was retired + expired by the compaction cleanup)
    assert(store.droppedColumns() === Set("legacy"))
    intercept[IllegalArgumentException](
      store.append(Seq((3L, "z", 30L)).toDF("k", "v", "legacy")))
    // upsert over the evolved store keeps the contract
    val uid = store.upsert(spark, Seq((2L, "Y"), (4L, "w")).toDF("k", "v"), "k")
    assert(store.droppedColumns() === Set("legacy"))
    val all = store.readRange(spark, 0L, uid).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all === Map(1L -> "x", 2L -> "Y", 4L -> "w"))
    intercept[IllegalArgumentException](
      store.upsert(spark, Seq((5L, "q", 50L)).toDF("k", "v", "legacy"), "k"))
  }

  test("upsert: new columns land as evolution; omitting a live column is rejected") {
    import spark.implicits._
    val store = freshStore("partial")
    store.append(Seq((1L, "x", "w1")).toDF("k", "v", "w"))
    store.append(Seq((2L, "y", "w2")).toDF("k", "v", "w"))
    // a partial update would silently NULL 'w' in the rewritten rows —
    // rejected loudly (CoW replaces whole rows, no partial updates)
    val e = intercept[IllegalArgumentException](
      store.upsert(spark, Seq((1L, "X")).toDF("k", "v"), "k"))
    assert(e.getMessage.contains("omit live column"))
    // the REVERSE direction is evolution: a brand-new update column lands,
    // survivors surface it as NULL
    val uid = store.upsert(spark,
      Seq((1L, "X", "w1b", 9L)).toDF("k", "v", "w", "z"), "k")
    val rows = store.readRange(spark, 0L, uid).collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.getAs[java.lang.Long]("z")))).toMap
    assert(rows === Map(1L -> ("X", Some(9L)), 2L -> ("y", None)))
  }
}
