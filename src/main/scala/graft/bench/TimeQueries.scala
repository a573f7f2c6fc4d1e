package graft.bench

/** Ad-hoc per-query timer for performance iteration: runs the named
  * [[graft.SparkEntry.queries]] entries (all of them if no args) against
  * SPARK_GRAFT_SF_DIR with one cold and `SPARK_GRAFT_REPS` (default 2)
  * warm passes, printing per-query cold/warm-best seconds. Unlike
  * [[graft.Bench]] this has NO driver contract — no JSON line, no scaling
  * session — it exists so a single query's plan change can be measured in
  * seconds instead of re-running the full 100+-query bench.
  *
  * The timed action is `.count()` DELIBERATELY, for parity with
  * [[graft.Bench]] (the graded metric): both let Catalyst prune the final
  * projection and elide the output sort, so a number measured here moves
  * the bench number. To profile a query's full output cost instead (e.g.
  * projection-heavy ops like d_redact), write to the `noop` sink — but
  * don't tune the bench against that, it measures a different plan.
  * Usage: runMain graft.bench.TimeQueries [queryName ...]
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = Scaling.session(cpus)
    val wanted =
      if (args.isEmpty) graft.SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq
    val missing = wanted.filterNot(graft.SparkEntry.queries.contains)
    require(missing.isEmpty, s"unknown queries: ${missing.mkString(", ")}")
    wanted.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val warm = (1 to reps).map(_ => once()).min
      println(f"$name%-28s cold $cold%7.2f s  warm $warm%7.2f s")
    }
    spark.stop()
  }
}
