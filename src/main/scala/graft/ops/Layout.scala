package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * story for a 100 TB table: snapshot/file-level min-max stats prune on ONE
  * sort dimension only, so a table sorted by time answers user-sliced
  * queries by opening every file, and vice versa. Interleaving the bits of
  * both dimensions into one sort key bounds EVERY file's bounding box in
  * BOTH dimensions at once, so the same single-column stats machinery
  * ([[graft.io.SnapshotStore.readRangePruned]] over `zval` stats) prunes
  * for either predicate. LayoutSpec drives that end-to-end on real store
  * snapshots; the registered `ev_zorder` query measures the layout effect
  * itself, engine-neutrally.
  *
  * Everything is plain integer arithmetic (`DIV`/`%`/`*`) so the DuckDB
  * oracle replays the curve bit-for-bit — no bit-ops dialect risk.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative integer
    * expressions: bit i of `x` lands at position 2i, bit i of `y` at 2i+1.
    * `div` is the integer-division token — `"DIV"` (Spark) or `"//"`
    * (DuckDB); everything else is dialect-shared. */
  def zValueExpr(x: String, y: String, bits: Int, div: String): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($x) $div ${1L << i}) % 2) * ${1L << (2 * i)}",
          s"((($y) $div ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
    }.mkString(" + ")

  /** Compact the two event dimensions into the 8-bit-each curve domain:
    * `x` = user, `y` = day. The `% 256` is the sandbox stand-in for the
    * rank/range quantization a production writer computes by sampling. */
  val xExpr = "CAST(user_id % 256 AS BIGINT)"
  def yExpr(epochExpr: String, div: String): String =
    s"(($epochExpr) $div 86400) % 256"

  /** Layout comparison: the same events under three physical orders —
    * time-major, user-major, z-order — cut into equal-width key cells
    * (files). Per layout: how many cells a 16-wide USER slice and a 16-day
    * TIME slice each touch (a cell is touched when its min-max bounding
    * box intersects the slice — exactly the stats-pruning decision). The
    * single-dimension layouts ace their own dimension and read ~every cell
    * for the other; z-order bounds both. Deterministic integers only. */
  def zorderCompare(events: DataFrame): DataFrame = {
    val base = events.selectExpr(
      s"$xExpr AS x",
      yExpr("CAST(unix_timestamp(ts) AS BIGINT)", "DIV") + " AS y")
    val keyed = base.selectExpr("x", "y",
      s"(${zValueExpr("x", "y", 8, "DIV")}) DIV 256 AS zcell",
      "y AS tcell", "x AS ucell")
    def cells(cellCol: String, name: String) =
      keyed.groupBy(col(cellCol).as("cell"))
        .agg(count(lit(1)).as("cnt"),
          min("x").as("min_x"), max("x").as("max_x"),
          min("y").as("min_y"), max("y").as("max_y"))
        .agg(count(lit(1)).as("n_cells"), sum("cnt").as("n_rows"),
          sum(when(col("min_x") <= 47 && col("max_x") >= 32, 1L).otherwise(0L))
            .as("cells_user_slice"),
          sum(when(col("min_y") <= 31 && col("max_y") >= 16, 1L).otherwise(0L))
            .as("cells_time_slice"))
        .withColumn("layout", lit(name))
    cells("zcell", "zorder")
      .unionByName(cells("tcell", "time_major"))
      .unionByName(cells("ucell", "user_major"))
      .selectExpr("layout", "n_cells", "n_rows",
        "cells_user_slice", "cells_time_slice",
        "greatest(cells_user_slice, cells_time_slice) AS worst_slice_cells")
      .orderBy("layout")
  }
}
