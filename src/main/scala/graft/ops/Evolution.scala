package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.SnapshotStore

/** Schema evolution exercised END TO END through a real [[SnapshotStore]] —
  * the table-format analog of the reference's schema-on-read tolerance
  * (`main.py:94-110` reads fields with defaults; an Iceberg-style table
  * declares them and evolves them instead).
  *
  * The registered `d_schema_evolve` query drives the full lifecycle —
  * append → ADD-COLUMN append → DROP-COLUMN (metadata-only commit) →
  * compaction (carries the drop set, removes the column physically) →
  * WIDEN-COLUMN (int → bigint; the compacted narrow-int files and the
  * final wide append must union exactly, values past 2^31 included) →
  * RENAME-COLUMN (metadata-only; compacted files keep the old physical
  * name and must surface the new one) → post-rename append — and returns
  * the final read. The DuckDB oracle recomputes the expected relation
  * directly from `documents`, so a store that leaks the dropped column
  * (schema mismatch), loses the added column, resurrects pre-drop values,
  * mis-merges the renamed column across file eras, or fails to up-cast
  * the widened one (schema OR value mismatch) fails the driver gate, not
  * just a unit test. */
object Evolution {

  /** Deterministic evolved-store round trip over the documents table.
    * Batches split by `doc_id % 3`; `extra` exists only for batches 1 and 2
    * (added after batch 0 — NULL there); `legacy` is dropped before the
    * last append and must be absent from the final schema; `nb` is written
    * as INT by batches 0/1, widened to BIGINT after the compaction, and
    * written wide (beyond int range) by batch 2. */
  def schemaEvolveRoundTrip(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    val dir = Files.createTempDirectory("graft-evolve-query")
    val store = new SnapshotStore(dir.toString)
    try {
      val base = documents.selectExpr(
        "CAST(doc_id AS BIGINT) AS doc_id",
        "CAST(doc_id * 3 + 1 AS BIGINT) AS v1",
        "CAST(doc_id % 7 AS BIGINT) AS legacy",
        "CAST(doc_id % 100 AS INT) AS nb")
      store.append(base.where("doc_id % 3 = 0"))
      store.append(base.where("doc_id % 3 = 1")
        .withColumn("extra", expr("CAST(doc_id * 2 AS BIGINT)")))
      val dropId = store.dropColumn(spark, "legacy")
      // compaction folds the drop into the data files and carries the set
      store.compact(spark, upToInclusive = dropId)
      // WIDEN after compaction: the compacted files stay physically INT
      // and must up-cast on every later read; batch 2 writes BIGINT values
      // an int cannot hold
      store.widenColumn(spark, "nb", "long")
      // RENAME after compaction: the old files (physical `v1`) must surface
      // the value under `val1`, and the post-rename append writes `val1`
      store.renameColumn(spark, "v1", "val1")
      store.append(base.where("doc_id % 3 = 2").drop("legacy")
        .withColumnRenamed("v1", "val1")
        .withColumn("nb", expr("CAST(doc_id % 100 + 3000000000 AS BIGINT)"))
        .withColumn("extra", expr("CAST(doc_id * 2 AS BIGINT)")))
      // materialize before the temp store is deleted (the table is a
      // per-source-doc projection — small by construction); the sort goes
      // ON TOP of the checkpoint so the returned plan still guarantees it
      store.readRange(spark, 0L, store.latest.get)
        .select("doc_id", "val1", "extra", "nb")
        .localCheckpoint(true)
        .orderBy("doc_id")
    } finally {
      // the store is query-scoped scratch: never leak it into /tmp
      graft.io.SnapshotStore.deleteRecursively(dir)
    }
  }
}
