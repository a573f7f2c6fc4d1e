package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface over the TPC-H-ish star schema — the
  * checklist operators (SURVEY §2.5): scan+filter+project with pushdown,
  * broadcast joins, semi/anti joins, aggregation, rollup, window functions,
  * sort/limit, set ops. Money sums run through DECIMAL (order-independent,
  * engine-exact) and surface as DOUBLE.
  *
  * Plan-shape rules: dims are broadcast (no shuffle of the fact side beyond
  * the aggregate), projections are narrow before joins so the parquet scan
  * prunes columns, every filter is a `Column` expression (pushdown-eligible).
  */
object Relational {

  /** High-value order cutoff for [[q6SemiAnti]]'s semi/anti probe — both
    * branches realize at every test scale (inactive customers: 8 at
    * sf0.001, 68 at sf0.01, 762 at sf0.1 — measured, not assumed).
    * Shared with the DuckDB oracle. */
  val HighValueOrder = 350000.0

  def tbl(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  private def decSum(c: String): org.apache.spark.sql.Column =
    expr(s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)")

  /** Pricing-summary aggregate (TPC-H Q1 shape): one hash aggregate with
    * map-side partials; scan reads only 7 of 11 lineitem columns. */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    tbl(spark, sfDir, "lineitem")
      .where(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        decSum("l_quantity").as("sum_qty"),
        decSum("l_extendedprice").as("sum_base_price"),
        expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)")
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Fact-to-dim join + aggregate: revenue by market segment. The dim is
    * NOT force-broadcast: customer is SF-proportional (2.5·10^10 rows at
    * the 10^12-row scale this file designs for), so the broadcast decision
    * belongs to the size-based planner/AQE — under the threshold at test
    * SF it still broadcasts, beyond it the hint would OOM the driver.
    * Fixed-size dims (nation, 25 rows) keep the explicit hint. */
  def q2JoinAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = tbl(spark, sfDir, "orders").select("o_custkey", "o_totalprice")
    val customer = tbl(spark, sfDir, "customer").select("c_custkey", "c_mktsegment")
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), decSum("o_totalprice").as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** Sort + limit (top-k): driver-safe, per-partition top-k then merge. */
  def q3TopK(spark: SparkSession, sfDir: String): DataFrame =
    tbl(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Window functions: per-customer order sequence (row_number) + running
    * order count over the unbounded-preceding frame. */
  def q4Window(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    tbl(spark, sfDir, "orders")
      .where(col("o_custkey") < 100)
      .select("o_custkey", "o_orderkey", "o_orderdate")
      .withColumn("order_seq", row_number().over(w).cast("long"))
      .withColumn("orders_so_far", count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("order_seq"), col("orders_so_far"))
      .orderBy("o_custkey", "order_seq")
  }

  /** Set operations: customers with orders but no high-priority order
    * (EXCEPT), plus an INTERSECT branch. */
  def q5SetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = tbl(spark, sfDir, "orders")
    val withOrders = orders.select(col("o_custkey").as("custkey")).distinct()
    val urgent = orders.where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey")).distinct()
    val bigSpenders = orders.where(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("custkey")).distinct()
    withOrders.except(urgent).intersect(bigSpenders).orderBy("custkey")
  }

  /** Semi + anti joins: per-nation count of customers with ≥1 HIGH-VALUE
    * order (o_totalprice > [[HighValueOrder]]) and with none. Dims
    * broadcast. The probe is the high-value subset, not all orders,
    * because the synthetic corpus gives every customer at least one order
    * — an all-orders anti side would be structurally empty at every scale
    * and an anti join that always returns nothing would pass the gate. */
  def q6SemiAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = tbl(spark, sfDir, "customer").select("c_custkey", "c_nationkey")
    val nation = tbl(spark, sfDir, "nation")
    val orderKeys = tbl(spark, sfDir, "orders")
      .where(col("o_totalprice") > HighValueOrder).select("o_custkey")
    val active = customer.join(orderKeys, customer("c_custkey") === orderKeys("o_custkey"), "left_semi")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_active"))
    val inactive = customer.join(orderKeys, customer("c_custkey") === orderKeys("o_custkey"), "left_anti")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_inactive"))
    nation.select(col("n_nationkey"), col("n_name"))
      .join(broadcast(active), col("n_nationkey") === active("c_nationkey"), "left")
      .drop("c_nationkey")
      .join(broadcast(inactive), col("n_nationkey") === inactive("c_nationkey"), "left")
      .select(col("n_nationkey"), col("n_name"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_inactive"), lit(0L)).as("n_inactive"))
      .orderBy("n_nationkey")
  }

  /** Grouping sets via ROLLUP with engine-neutral null markers. */
  def q7Rollup(spark: SparkSession, sfDir: String): DataFrame =
    tbl(spark, sfDir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), decSum("l_quantity").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("<all>")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("<all>")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  /** Selective filter + narrow projection — the pushdown/pruning probe
    * (`.explain` must show PushedFilters + a 4-column ReadSchema). */
  def q8Pushdown(spark: SparkSession, sfDir: String): DataFrame =
    tbl(spark, sfDir, "lineitem")
      .where(col("l_shipdate") >= lit("1994-01-01") && col("l_shipdate") < lit("1995-01-01")
        && col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
      .agg(
        expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)")
          .as("revenue"),
        count(lit(1)).as("n"))

  /** Three-way join with two broadcast dims: top parts by shipped quantity. */
  def q9MultiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val li = tbl(spark, sfDir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    val part = tbl(spark, sfDir, "part").select("p_partkey", "p_name")
    val supp = tbl(spark, sfDir, "supplier").select("s_suppkey", "s_nationkey")
    // part/supplier are SF-proportional — broadcast is the PLANNER's call
    // (size threshold / AQE), not a hint that OOMs at the 100 TB scale
    // (see q2JoinAgg); at test SF both still plan as broadcast joins
    li.join(part, li("l_partkey") === part("p_partkey"))
      .join(supp, li("l_suppkey") === supp("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_lineitems"), decSum("l_quantity").as("total_qty"),
        countDistinct("p_partkey").as("n_parts"))
      .orderBy("s_nationkey")
  }

  /** CUBE grouping sets over two dimensions with engine-neutral null
    * markers — all four grouping combinations in one pass. */
  def q12Cube(spark: SparkSession, sfDir: String): DataFrame =
    tbl(spark, sfDir, "orders")
      .cube("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"), decSum("o_totalprice").as("revenue"))
      .select(
        coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
        coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
        col("n"), col("revenue"))
      .orderBy("priority", "status")

  /** Pivot (wide conditional aggregation): quantity by return flag spread
    * across line-status columns — the `groupBy().pivot()` API surface.
    * Pivot values are EXPLICIT, so no extra distinct-values job runs before
    * planning (the implicit form collects the value set to the driver —
    * wrong at 100 TB) and the schema is static. Plans as ONE hash aggregate
    * with map-side partials, same cost shape as q1. */
  def q15Pivot(spark: SparkSession, sfDir: String): DataFrame =
    tbl(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(decSum("l_quantity"))
      .selectExpr("l_returnflag", "`F` AS qty_f", "`O` AS qty_o")
      .orderBy("l_returnflag")

  /** Exact rank-based quantiles (p50/p90) per group — quantile_disc
    * semantics (the reported values are actual data elements, engine-exact).
    *
    * Scale shape: the group key has ~5 values, so a window partitioned by it
    * would sort each group's entire slice in ONE task — a straggler at 100×.
    * Instead: range-repartition + sort by (group, value, key) — a PARALLEL
    * sort across all partitions — then `zipWithIndex` for global positions
    * (its internal per-partition count job runs over the persisted sorted
    * result, so both passes see identical partitions), and per-group rank =
    * global position − group start, where group starts come from a tiny
    * G-row broadcast aggregate. No task ever holds more than one partition
    * of one group's slice. */
  def q13Quantiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = spark.sessionState.conf.numShufflePartitions
    val parts = tbl(spark, sfDir, "orders")
      .select(col("o_orderpriority"),
        col("o_totalprice").cast("double").as("o_totalprice"),
        col("o_orderkey").cast("long").as("o_orderkey"))
      .repartitionByRange(p, col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .sortWithinPartitions("o_orderpriority", "o_totalprice", "o_orderkey")
      .persist()
    try {
      val idx = parts.rdd.zipWithIndex.map { case (r, i) => (r.getString(0), r.getDouble(1), i) }
      val idxDF = spark.createDataset(idx).toDF("o_orderpriority", "price", "gidx")
      val stats = idxDF.groupBy("o_orderpriority")
        .agg(min("gidx").as("start"), count(lit(1)).as("n"))
      val res = idxDF.join(broadcast(stats), "o_orderpriority")
        .withColumn("rn", col("gidx") - col("start") + 1)
        .where(col("rn") === expr("(n + 1) DIV 2") || col("rn") === expr("(n * 9 + 9) DIV 10"))
        .groupBy("o_orderpriority")
        .agg(
          max(when(col("rn") === expr("(n + 1) DIV 2"), col("price"))).as("p50"),
          max(when(col("rn") === expr("(n * 9 + 9) DIV 10"), col("price"))).as("p90"),
          max("n").as("n"))
        .orderBy("o_orderpriority")
      // materialize the G-row result so the cached sort can be RELEASED
      // here (repeated calls would otherwise accumulate cached copies for
      // the session lifetime); G ≈ #groups, a handful of rows
      val rows = res.collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), res.schema)
    } finally parts.unpersist(blocking = false)
  }

  /** Correlated-style aggregate: orders above their customer's average
    * (expressed as join against a pre-aggregate — the decorrelated plan). */
  def q10AboveAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = tbl(spark, sfDir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    val avgPrice = orders.groupBy("o_custkey")
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1)").as("avg_price"),
        count(lit(1)).as("cnt"))
      .where(col("cnt") >= 2)
    orders.join(avgPrice.drop("cnt"), "o_custkey")
      .where(col("o_totalprice") > col("avg_price") * 1.5)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_above"))
      .orderBy("o_custkey")
  }
}
