package graft.spark

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{ResumableJob, SnapshotStore}

/** Snapshot-store atomicity + checkpoint-resume: a crashed run must leave
  * only committed chunks visible; the re-run completes exactly the missing
  * work with no duplicates or gaps. */
class ResumeSpec extends AnyFunSuite with SparkFixture {

  test("snapshot store: atomic append, snapshot identity, range reads") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapstore").toString
    val store = new SnapshotStore(root)
    assert(store.snapshots.isEmpty)
    val id1 = store.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    val id2 = store.append(Seq((3, "c")).toDF("k", "v"))
    assert(store.snapshots == Seq(id1, id2) && id2 == id1 + 1)
    assert(store.read(spark, id1).count() == 2)
    assert(store.readRange(spark, 0, id2).count() == 3)
    assert(store.readRange(spark, id1, id2).count() == 1) // incremental slice
    intercept[IllegalArgumentException](store.read(spark, 99))
  }

  test("resumable job: crash mid-run, resume completes without dupes") {
    val nConvs = 20L
    val buckets = 5
    val crashRoot = Files.createTempDirectory("resume_crash").toString
    val cleanRoot = Files.createTempDirectory("resume_clean").toString

    // reference run, no failures
    ResumableJob.run(spark, nConvs, cleanRoot, buckets)
    val want = ResumableJob.readSegments(spark, cleanRoot)
      .collect().map(_.toString).sorted

    // crash after 2 chunks
    intercept[RuntimeException] {
      ResumableJob.run(spark, nConvs, crashRoot, buckets, failAfter = Some(2))
    }
    val afterCrash = ResumableJob.completedBuckets(crashRoot, buckets)
    assert(afterCrash.size == 2, s"expected 2 committed chunks, got $afterCrash")

    // resume: only the remaining chunks run
    val resumed = ResumableJob.run(spark, nConvs, crashRoot, buckets)
    assert(resumed.completed.size == buckets - 2 && resumed.allSucceeded)
    assert(ResumableJob.completedBuckets(crashRoot, buckets).size == buckets)

    val got = ResumableJob.readSegments(spark, crashRoot)
      .collect().map(_.toString).sorted
    assert(got.toSeq == want.toSeq, "resumed output differs from clean run")
  }

  test("poisoned bucket: retried per run, quarantined after maxAttempts, rest completes") {
    val nConvs = 20L
    val buckets = 5
    val root = Files.createTempDirectory("resume_poison").toString

    // run 1: bucket 2 fails (attempt 1) and is REPORTED as retryable —
    // callers can tell this partial run from a complete one
    val run1 = ResumableJob.run(spark, nConvs, root, buckets, poisonBuckets = Set(2))
    assert(run1.completed == Seq(0, 1, 3, 4))
    assert(run1.failed.map(_._1) == Seq(2) && run1.failed.head._2.contains("poisoned"))
    assert(run1.quarantinedNow.isEmpty && !run1.allSucceeded)
    assert(ResumableJob.attempts(root, 2) == 1)
    assert(ResumableJob.quarantinedBuckets(root, buckets).isEmpty)

    // runs 2..3: retries — the redelivery analog — then quarantine at maxAttempts
    val run2 = ResumableJob.run(spark, nConvs, root, buckets, poisonBuckets = Set(2))
    assert(run2.completed.isEmpty && run2.failed.map(_._1) == Seq(2))
    val run3 = ResumableJob.run(spark, nConvs, root, buckets, poisonBuckets = Set(2))
    assert(run3.completed.isEmpty && run3.failed.isEmpty && run3.quarantinedNow == Seq(2))
    assert(ResumableJob.attempts(root, 2) == 3)
    assert(ResumableJob.quarantinedBuckets(root, buckets) == Set(2))
    val q = ResumableJob.readQuarantine(root, buckets)
    assert(q.size == 1 && q.head._1 == 2 && q.head._2.contains("poisoned conversation"))

    // run 4: quarantined bucket is skipped — no exception, no new attempts,
    // even when the poison hook is gone (the decision is durable)
    val run4 = ResumableJob.run(spark, nConvs, root, buckets)
    assert(run4.completed.isEmpty && run4.allSucceeded)
    assert(ResumableJob.attempts(root, 2) == 3)
    assert(ResumableJob.completedBuckets(root, buckets) == Set(0, 1, 3, 4))

    // output covers exactly the non-quarantined buckets
    val cleanRoot = Files.createTempDirectory("resume_poison_clean").toString
    ResumableJob.run(spark, nConvs, cleanRoot, buckets)
    val wantFull = ResumableJob.readSegments(spark, cleanRoot)
      .collect().map(_.toString).sorted
    val got = ResumableJob.readSegments(spark, root).collect().map(_.toString).sorted
    assert(got.nonEmpty && got.length < wantFull.length,
      "quarantined bucket's segments must be absent")
    assert(got.toSet.subsetOf(wantFull.toSet))
  }
}
