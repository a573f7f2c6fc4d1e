package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal snapshot-versioned parquet table — the in-sandbox stand-in for an
  * Iceberg table (no Iceberg runtime jar ships with this image; see SURVEY
  * §7). Gives the two properties the north rule actually needs:
  *
  *  - **atomic append**: data files land first, then a manifest JSON is
  *    published via temp-file + atomic rename; a snapshot is visible iff its
  *    manifest exists, so readers never see partial writes;
  *  - **snapshot identity / ranges**: monotonically increasing ids enable
  *    incremental (from, to] reads — the batch analog of the reference's
  *    queue offsets.
  *
  * On a real cluster the binding swaps to Iceberg (`writeTo(...).append()`,
  * `VERSION AS OF`) with no pipeline-API change.
  */
final class SnapshotStore(val root: String) {

  private def dataDir(id: Long): Path = Paths.get(root, "data", s"snap=$id")
  private def manifestDir: Path = Paths.get(root, "_manifests")

  def snapshots: Seq[Long] = {
    val d = manifestDir
    if (!Files.exists(d)) Nil
    else {
      val it = Files.list(d).iterator()
      val out = Vector.newBuilder[Long]
      while (it.hasNext) {
        val name = it.next().getFileName.toString
        if (name.endsWith(".json")) out += name.stripSuffix(".json").toLong
      }
      out.result().sorted
    }
  }

  def latest: Option[Long] = snapshots.lastOption

  /** Append `df` as the next snapshot; returns its id. Visible only after
    * the manifest rename commits. */
  def append(df: DataFrame, meta: Map[String, String] = Map.empty): Long = {
    val id = latest.getOrElse(0L) + 1L
    df.write.mode("overwrite").parquet(dataDir(id).toString)
    Files.createDirectories(manifestDir)
    val json = {
      val kv = (meta ++ Map("snapshot_id" -> id.toString, "rows" -> "")).map {
        case (k, v) => s""""$k": "${v.replace("\"", "\\\"")}""""
      }
      kv.mkString("{", ", ", "}")
    }
    val tmp = manifestDir.resolve(s".$id.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestDir.resolve(s"$id.json"),
      StandardCopyOption.ATOMIC_MOVE)
    id
  }

  /** Read one snapshot. */
  def read(spark: SparkSession, id: Long): DataFrame = {
    require(snapshots.contains(id), s"snapshot $id not committed")
    spark.read.parquet(dataDir(id).toString)
  }

  /** Incremental read of snapshots in (fromExclusive, toInclusive]. */
  def readRange(spark: SparkSession, fromExclusive: Long, toInclusive: Long): DataFrame = {
    val ids = snapshots.filter(id => id > fromExclusive && id <= toInclusive)
    require(ids.nonEmpty, s"no snapshots in ($fromExclusive, $toInclusive]")
    ids.map(id => spark.read.parquet(dataDir(id).toString)).reduce(_ unionAll _)
  }
}

/** Checkpoint-resumable run of the extraction+segmentation pipeline:
  * conversations are processed in `buckets` id-range chunks; each completed
  * chunk commits its output and a done-marker atomically-enough (marker
  * rename after data write), so a crashed run re-executes only unfinished
  * chunks and never duplicates output — reproducing the reference's
  * redelivery semantics (undeleted queue messages reappear,
  * `main.py:396-397`) in batch form.
  *
  * Poison handling: a bucket whose processing throws is left incomplete
  * (retried by the next run — the redelivery analog) with its attempt count
  * persisted; once attempts reach `maxAttempts` the bucket is QUARANTINED —
  * recorded with its error in a quarantine table and skipped by later runs —
  * so a deterministically-crashing conversation can never wedge the job
  * forever (the batch analog of the reference deleting poison messages,
  * `main.py:399-402`).
  */
object ResumableJob {

  /** Outcome of one [[run]]: `completed` chunks committed this run,
    * `failed` chunks that threw but remain retryable (bucket → error —
    * callers CAN distinguish a complete run from a partial one), and
    * `quarantinedNow` chunks whose failure this run reached `maxAttempts`
    * and were durably quarantined. A fully-successful run over `n` pending
    * buckets has `completed.size == n` and the other two empty. */
  final case class RunReport(
      completed: Seq[Int],
      failed: Seq[(Int, String)],
      quarantinedNow: Seq[Int]) {
    def allSucceeded: Boolean = failed.isEmpty && quarantinedNow.isEmpty
  }

  private def markerPath(workRoot: String, bucket: Int): Path =
    Paths.get(workRoot, "_done", s"bucket-$bucket.done")

  private def attemptsPath(workRoot: String, bucket: Int): Path =
    Paths.get(workRoot, "_attempts", s"bucket-$bucket.count")

  private def quarantinePath(workRoot: String, bucket: Int): Path =
    Paths.get(workRoot, "_quarantine", s"bucket-$bucket.json")

  def completedBuckets(workRoot: String, buckets: Int): Set[Int] =
    (0 until buckets).filter(b => Files.exists(markerPath(workRoot, b))).toSet

  def quarantinedBuckets(workRoot: String, buckets: Int): Set[Int] =
    (0 until buckets).filter(b => Files.exists(quarantinePath(workRoot, b))).toSet

  def attempts(workRoot: String, bucket: Int): Int = {
    val p = attemptsPath(workRoot, bucket)
    if (Files.exists(p)) new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toInt
    else 0
  }

  /** Quarantine table: (bucket, error) rows for every quarantined chunk. */
  def readQuarantine(workRoot: String, buckets: Int): Seq[(Int, String)] =
    (0 until buckets).flatMap { b =>
      val p = quarantinePath(workRoot, b)
      if (Files.exists(p)) Some(b -> new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      else None
    }

  private def atomicWrite(p: Path, content: String): Unit = {
    Files.createDirectories(p.getParent)
    val tmp = p.getParent.resolve("." + p.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Runs the pipeline over `nConvs` synthetic conversations in `buckets`
    * chunks; `failAfter` aborts after that many newly-completed chunks (test
    * hook simulating a mid-job crash); `poisonBuckets` makes those buckets
    * throw deterministically (test hook simulating an unparseable
    * conversation). Returns a [[RunReport]] — failed-but-retryable buckets
    * are surfaced, not swallowed, so a caller (or operator) can distinguish
    * a partial run from a complete one and can reset the attempt counter of
    * a bucket whose failures were transient infrastructure rather than a
    * poison conversation. */
  def run(
      spark: SparkSession,
      nConvs: Long,
      workRoot: String,
      buckets: Int,
      corpusSeed: Long = 42L,
      failAfter: Option[Int] = None,
      poisonBuckets: Set[Int] = Set.empty,
      maxAttempts: Int = 3
  ): RunReport = {
    import graft.gen.SyntheticTranscripts
    import graft.pipeline.Pipeline
    val done = completedBuckets(workRoot, buckets)
    val quarantined = quarantinedBuckets(workRoot, buckets)
    val completedNow = Vector.newBuilder[Int]
    val failedNow = Vector.newBuilder[(Int, String)]
    val quarantinedNow = Vector.newBuilder[Int]
    var newlyDone = 0
    val per = math.max(1L, (nConvs + buckets - 1) / buckets)
    for (b <- 0 until buckets if !done.contains(b) && !quarantined.contains(b)) {
      if (failAfter.exists(newlyDone >= _))
        throw new RuntimeException(s"injected failure before bucket $b")
      val lo = b * per
      val hi = math.min(nConvs, lo + per)
      try {
        if (lo < hi) {
          import spark.implicits._
          if (poisonBuckets.contains(b))
            throw new RuntimeException(s"poisoned conversation in bucket $b")
          val turns = spark.range(lo, hi, 1, spark.sparkContext.defaultParallelism)
            .flatMap(i => SyntheticTranscripts.turnsFor(corpusSeed, i))
          val ruleMap = (lo until hi).map { i =>
            SyntheticTranscripts.convId(i) ->
              SyntheticTranscripts.rulesFor(corpusSeed, i).map(Pipeline.toCoreRule)
          }.toMap
          val bc = spark.sparkContext.broadcast(ruleMap)
          val segs = Pipeline.segment(Pipeline.extract(turns), bc)
          segs.write.mode("overwrite").parquet(s"$workRoot/segments/bucket=$b")
        }
        atomicWrite(markerPath(workRoot, b), s"""{"bucket": $b, "convs": [$lo, $hi)}""")
        completedNow += b
        newlyDone += 1
      } catch {
        case e: Exception =>
          val n = attempts(workRoot, b) + 1
          atomicWrite(attemptsPath(workRoot, b), n.toString)
          if (n >= maxAttempts) {
            // full JSON string escape: Spark exception messages routinely
            // span lines — a raw newline would corrupt the quarantine record
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName).flatMap {
              case '"' => "\\\""
              case '\\' => "\\\\"
              case c if c < ' ' => f"\\u${c.toInt}%04x"
              case c => c.toString
            }
            atomicWrite(quarantinePath(workRoot, b),
              s"""{"bucket": $b, "convs": [$lo, $hi), "attempts": $n, "error": "$msg"}""")
            quarantinedNow += b
          } else
            // incomplete, not quarantined → the next run retries it
            failedNow += (b -> Option(e.getMessage).getOrElse(e.getClass.getName))
      }
    }
    RunReport(completedNow.result(), failedNow.result(), quarantinedNow.result())
  }

  def readSegments(spark: SparkSession, workRoot: String): DataFrame =
    spark.read.parquet(s"$workRoot/segments")
}
