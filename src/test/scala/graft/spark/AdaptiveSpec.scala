package graft.spark

import org.scalatest.funsuite.AnyFunSuite

/** AQE runtime re-planning — the brief's "AQE for runtime re-plan" lever,
  * demonstrated with driver-visible evidence: a skewed shuffle join gets
  * its hot partition SPLIT at runtime, and a small post-shuffle stage gets
  * its partitions COALESCED — both decisions taken from actual shuffle
  * statistics, not estimates. The production pipeline keeps its EXPLICIT
  * skew handling (salting — AQE can't see inside `flatMapGroups`), but
  * every relational query in the suite runs under AQE on a real cluster;
  * this spec pins that the mechanism actually engages on this build. */
class AdaptiveSpec extends AnyFunSuite with SparkFixture {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import spark.implicits._
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // one hot key carries ~100x the rows of the others
      val fact = spark.range(0L, 20000L)
        .selectExpr("IF(id < 18000, 0L, id % 40) AS k", "md5(CAST(id AS STRING)) AS pad")
      val dim = spark.range(0L, 40L).selectExpr("id AS k", "CAST(id AS STRING) AS v")
      val joined = fact.join(dim, "k")
      // execute THIS query execution (count() would plan a separate one),
      // then read the final adaptive plan
      assert(joined.collect().length === 20000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true") || finalPlan.contains("skewed"),
        s"AQE did not mark the skew join:\n$finalPlan")
    }
  }

  test("AQE coalesces small post-shuffle partitions") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64MB") {
      // tiny aggregate over 7 shuffle partitions: runtime stats coalesce it
      val agg = spark.range(0L, 1000L).selectExpr("id % 5 AS k")
        .groupBy("k").count()
      assert(agg.collect().length === 5)
      val finalPlan = agg.queryExecution.executedPlan.toString
      assert(finalPlan.contains("AQEShuffleRead coalesced") ||
        finalPlan.contains("CoalescedShuffleRead") ||
        finalPlan.contains("coalesced"),
        s"AQE did not coalesce:\n$finalPlan")
    }
  }
}
