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
}
