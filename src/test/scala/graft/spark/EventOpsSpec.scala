package graft.spark

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventOps

class EventOpsSpec extends AnyFunSuite with SparkFixture {

  test("retention buckets users by first-activity week and counts survivors per offset") {
    import spark.implicits._
    val week = 604800L * 1000L
    // epoch week boundary: t0 is an exact multiple of 604800s
    val t0 = 1767225600L / 604800L * 604800L * 1000L
    def ts(w: Long, off: Long = 1000L) = new Timestamp(t0 + w * week + off)
    // user 0: weeks 0,1,3 (cohort 0); user 1: weeks 0,1 (cohort 0);
    // user 2: weeks 1,1 (dup within week — must count once; cohort 1)
    val events = Seq(
      (0L, ts(0), 0L), (1L, ts(1), 0L), (2L, ts(3), 0L),
      (3L, ts(0), 1L), (4L, ts(1), 1L),
      (5L, ts(1), 2L), (6L, ts(1, 2000L), 2L)
    ).map { case (id, t, u) => (id, t, u, "view", "1.0", "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val base = t0 / 1000L / 604800L
    val rows = EventOps.retention(events).collect()
      .map(r => (r.getLong(0) - base, r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((0L, 0L, 2L), (0L, 1L, 2L), (0L, 3L, 1L), (1L, 0L, 1L)), s"got $rows")
  }

  test("hoppingCounts puts each event in exactly window/hop overlapping windows") {
    import spark.implicits._
    val t0 = 1767225600L // multiple of 3600
    val events = Seq(
      (0L, new Timestamp((t0 + 100) * 1000L), 0L, "view", "1.0", "{}"),
      (1L, new Timestamp((t0 + 1900) * 1000L), 0L, "view", "1.0", "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.hoppingCounts(events).collect()
      .map(r => (r.getLong(0) - t0, r.getLong(2))).toSet
    // event@+100 -> windows starting -1800, 0; event@+1900 -> 0, +1800
    assert(got == Set((-1800L, 1L), (0L, 2L), (1800L, 1L)), s"got $got")
  }

  test("saltedJoin equals the plain join and spreads the key over salt partitions") {
    import spark.implicits._
    val fact = (0L until 100L).map(i => (i, i % 3, s"v$i")).toDF("event_id", "user_id", "payload")
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("user_id", "tag")
    val salted = EventOps.saltedJoin(fact, dim, "user_id", "event_id", salts = 4)
    val plain = fact.join(dim, "user_id")
    assert(salted.count() == 100L)
    assert(salted.select("event_id", "tag").except(plain.select("event_id", "tag")).isEmpty)
    assert(plain.select("event_id", "tag").except(salted.select("event_id", "tag")).isEmpty)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), s"salt must ride the join key:\n$plan")
    // the internal salt column must not silently destroy a caller's column
    intercept[IllegalArgumentException](
      EventOps.saltedJoin(fact.withColumn("__graft_salt", $"user_id"),
        dim, "user_id", "event_id"))
  }

  test("eventAnomaly flags the spike day via exact integer z-scores") {
    import spark.implicits._
    val day = 86400L
    val t0 = 1767225600L // exact multiple of 86400
    def ts(d: Long, off: Long = 1L) = new Timestamp((t0 + d * day + off) * 1000L)
    // type a: days 0..4 at 2 events, day 5 spikes to 6
    //   D=6 S=16 Q=56 -> var2 = 6*56-256 = 80
    //   quiet day: dev=(12-16)=-4 -> z2_ppm = 16e6/80 = 200000, no flag
    //   spike day: dev=(36-16)=20 -> z2_ppm = 400e6/80 = 5000000 >= 4 -> flag
    // type b: constant 1/day -> zero variance -> z2_ppm 0, never flags
    // null ts rows are excluded before counting
    val rows =
      (0L until 5L).flatMap(d => Seq(ts(d), ts(d, 2L)).map(("a", _))) ++
      (0L until 6L).map(i => ("a", ts(5L, i + 1L))) ++
      (0L until 3L).map(d => ("b", ts(d))) ++
      Seq(("a", null.asInstanceOf[Timestamp]))
    val events = rows.zipWithIndex
      .map { case ((et, t), i) => (i.toLong, t, i.toLong, et, "1.0", "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.eventAnomaly(events).collect()
      .map(r => (r.getString(0), r.getLong(1) - t0 / day, r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    val want =
      (0L until 5L).map(d => ("a", d, 2L, 200000L, false)).toSet ++
      Set(("a", 5L, 6L, 5000000L, true)) ++
      (0L until 3L).map(d => ("b", d, 1L, 0L, false)).toSet
    assert(got == want, s"got $got")
  }

  test("approx_count_distinct (the countDistinct scale swap) tracks the exact count") {
    import spark.implicits._
    // the documented swap for tumblingCounts' n_users at 100 TB — exercised
    // here because its engine-private HLL++ cannot replay in the oracle
    val events = (0L until 5000L).map(i => (i, i % 137)).toDF("event_id", "user_id")
    val (approx, exact) = events
      .agg(org.apache.spark.sql.functions.approx_count_distinct("user_id"),
        org.apache.spark.sql.functions.countDistinct("user_id"))
      .as[(Long, Long)].head()
    assert(exact === 137L)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx $approx vs exact $exact")
  }
}
