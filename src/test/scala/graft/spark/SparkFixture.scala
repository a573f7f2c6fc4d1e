package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.{BeforeAndAfterAll, Suite}

/** Shared local SparkSession for specs — one per suite, local[4] keeps the
  * suite fast while still exercising real shuffles across partitions. */
trait SparkFixture extends BeforeAndAfterAll { self: Suite =>
  @transient lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName(suiteName)
    .config("spark.sql.shuffle.partitions", 7) // deliberately odd, non-aligned
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = {
    // session is shared process-wide; don't stop between suites
    super.afterAll()
  }
}
