package graft.spark

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** Pins the KMV sketch aggregate (graft.functions.KmvKthSmallest): exact
  * k-th-smallest-distinct semantics, the below-k null contract, dedup of
  * repeated values, merge correctness across partitions, and the
  * partial-aggregation plan shape (map-side combine — the property that
  * makes the sketch shuffle ≤k longs per partition at any input size). */
class KmvSketchSpec extends AnyFunSuite with SparkFixture {

  test("exact k-th smallest distinct, dedup, partition merges, below-k null") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // 3000 rows, 997 distinct values, every value repeated ~3x, scrambled
    val distinctVals = (0 until 997).map(i => (i * 1103515245L) % 2654435761L)
    val rows = (0 until 3000).map(i => distinctVals(i % 997))
    val df = rows.toDF("h").repartition(7) // force partial + final merge

    val expected64 = distinctVals.sorted.apply(63) // k-th smallest (k=64)
    val got = df.selectExpr("kmv_kth(h, 64) AS hk").collect().head
    assert(got.getLong(0) === expected64)

    // fewer than k distinct values → null (caller falls back to exact)
    val small = df.selectExpr("kmv_kth(h, 2000) AS hk").collect().head
    assert(small.isNullAt(0))

    // k=1 degenerates to min
    val m1 = df.selectExpr("kmv_kth(h, 1) AS hk", "min(h) AS mn").collect().head
    assert(m1.getLong(0) === m1.getLong(1))

    // plan shape: partial (map-side) aggregation before the exchange
    val p = df.selectExpr("kmv_kth(h, 64)")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("partial_kmv_kth"), p)
  }

  test("grouped sketch estimate tracks exact distinct within KMV error") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // two groups with known distinct cardinalities ~2000 and ~300
    val data =
      (0 until 6000).map(i => ("a", ((i % 2000) * 2654435761L) % 4294967296L)) ++
      (0 until 900).map(i => ("b", ((i % 300) * 1103515245L) % 4294967296L))
    val df = data.toDF("g", "h").repartition(5)
    val rows = df.groupBy("g")
      .agg(org.apache.spark.sql.functions.expr("kmv_kth(h, 64)").as("hk"),
        org.apache.spark.sql.functions.count_distinct($"h").as("n_exact"))
      .selectExpr("g", "n_exact", "63 * 4294967296L DIV hk AS n_est")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // KMV stderr at k=64 is ~1/sqrt(62) ≈ 12.7%; allow 4 sigma
    for ((_, (exact, est)) <- rows)
      assert(math.abs(est - exact).toDouble / exact < 0.51,
        s"estimate $est too far from exact $exact")
  }
}
