package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link analysis over the document corpus. Companion to the connected-
  * components clustering in [[Dedup.connectedComponentsFromEdges]] — that
  * one contracts an undirected similarity graph; this one iterates rank
  * flow over a directed citation graph. */
object GraphOps {

  /** PageRank in exact integer arithmetic (ranks in parts-per-billion,
    * damping 85/100): contributions are `rank DIV outdeg`, updates are
    * `150_000_000 DIV n + 85·Σcontrib DIV 100` — no floating point, so
    * every iteration is bit-identical in any engine and the DuckDB oracle
    * replays all rounds and hash-matches (float PageRank would differ in
    * the last ulp with every summation order).
    *
    * The corpus carries no hyperlink column, so the graph is a
    * deterministic citation-style overlay derived from doc ids: every doc
    * cites `id DIV 2`, `id DIV 3` (early docs accumulate citations — the
    * skewed in-degree a real citation graph has) plus one hash link
    * `(id·131 + 17) mod n`; self-loops dropped, outdegree 1–3. Swap in a
    * real `(src, dst)` edge table and nothing else changes.
    *
    * Shape at 100 TB: the edge table is built once, joined with outdegrees,
    * and persisted — each iteration is then one equi-join of ranks onto
    * edges keyed `src` followed by one aggregation keyed `dst` (the classic
    * rank-flow shuffle pair); ranks never leave the cluster and the driver
    * holds nothing. The returned top-20 plans as TakeOrderedAndProject,
    * not a global sort. For iteration counts beyond a handful, checkpoint
    * every ~5 rounds to cut lineage (the [[Dedup.dedupClusters]] pattern). */
  def pagerank(documents: DataFrame, iters: Int = 3, topK: Int = 20): DataFrame = {
    // n computed ONCE as a driver literal (one count job): as a broadcast
    // subplan it was re-evaluated by every iteration's plan — 2·iters + 2
    // redundant corpus scans at 100 TB. nodes likewise persisted: every
    // iteration's left join re-derives it from the source otherwise.
    val n = documents.count()
    require(n > 0, "pagerank: empty corpus")
    val nodes = documents.select(col("doc_id").as("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = documents.selectExpr("doc_id AS src", "doc_id DIV 2 AS dst")
      .unionAll(documents.selectExpr("doc_id", "doc_id DIV 3"))
      .unionAll(documents.selectExpr("doc_id", s"(doc_id * 131 + 17) % $n"))
      .where("src != dst").distinct()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val ej = edges.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var r = nodes.selectExpr("id", s"CAST(1000000000 AS BIGINT) DIV $n AS r")
    for (_ <- 1 to iters) {
      val c = ej.alias("e").join(r.alias("x"), expr("e.src = x.id"))
        .selectExpr("e.dst AS id", "x.r DIV e.outdeg AS c")
        .groupBy("id").agg(sum("c").as("s"))
      r = nodes.join(c, Seq("id"), "left")
        .selectExpr("id",
          s"CAST(150000000 AS BIGINT) DIV $n + 85 * coalesce(s, CAST(0 AS BIGINT)) DIV 100 AS r")
    }
    val out = r.orderBy(col("r").desc, col("id")).limit(topK)
      .selectExpr("id AS doc_id", "r AS rank_ppb")
      .localCheckpoint(true)
    ej.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }
}
