package graft

import org.apache.spark.sql.SparkSession

import graft.gen.SyntheticTranscripts
import graft.io.SnapshotStore
import graft.pipeline.Pipeline
import graft.schema.{ConvRule, Turn}

/** spark-submit entry point — the production shape of the north rule:
  *
  * {{{
  * spark-submit --class graft.SubmitMain \
  *   --conf spark.sql.extensions=graft.functions.GraftExtensions \
  *   ocrspark.jar \
  *   --turns /data/transcripts.parquet --rules /data/rules.parquet \
  *   --out /data/segments_store --buckets 4096 [--two-stage]
  * }}}
  *
  * Or with the deterministic synthetic corpus (no external data):
  * `--synthetic-convs 100000 [--seed 42]`.
  *
  * Reads the turns table, segments per conversation, and commits TWO
  * snapshots to the output [[SnapshotStore]]: the segment rows and the
  * per-partition lineage/metrics rows. The default is the fused
  * single-shuffle path, with rules broadcast at or below
  * `--broadcast-rule-limit` rules (default 1e6) and shuffle-cogrouped above
  * it (`Pipeline.segmentAuto`); `--two-stage` selects the salted
  * extraction + regroup path for monster-conversation corpora (a single
  * conversation big enough to straggle one fused task). The lineage
  * snapshot always derives from a salted extraction pass. Master/executors
  * come from spark-submit; nothing here assumes local mode.
  */
object SubmitMain {

  private def parseArgs(args: Array[String]): Map[String, String] = {
    val m = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    while (i < args.length) {
      val k = args(i)
      require(k.startsWith("--"), s"unexpected argument $k")
      if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
        m(k.drop(2)) = args(i + 1); i += 2
      } else { m(k.drop(2)) = "true"; i += 1 }
    }
    m.toMap
  }

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val out = opts.getOrElse("out",
      sys.error("--out <snapshot store dir> is required"))
    val seed = opts.getOrElse("seed", "42").toLong
    // master normally comes from spark-submit; --master is the sandbox path
    val builder = SparkSession.builder()
    opts.get("master").foreach(builder.master)
    val spark = builder.getOrCreate()
    import spark.implicits._

    val (turns, rules): (org.apache.spark.sql.Dataset[Turn], org.apache.spark.sql.Dataset[ConvRule]) =
      (opts.get("turns"), opts.get("synthetic-convs")) match {
        case (Some(path), _) =>
          val r = opts.getOrElse("rules", sys.error("--rules required with --turns"))
          (spark.read.parquet(path).as[Turn], spark.read.parquet(r).as[ConvRule])
        case (None, Some(n)) =>
          (SyntheticTranscripts.turns(spark, n.toLong, seed),
            SyntheticTranscripts.rules(spark, n.toLong, seed))
        case _ => sys.error("need --turns+--rules or --synthetic-convs")
      }

    val buckets = opts.get("buckets").map(_.toInt).getOrElse(0)
    val ruleLimit = opts.get("broadcast-rule-limit").map(_.toLong).getOrElse(1000000L)
    val extracted = Pipeline.extract(turns, partitions = buckets)
    val segments =
      if (opts.contains("two-stage"))
        // salted per-turn extraction, then regroup — monster-conv regime
        Pipeline.segmentCogroup(extracted, rules)
      else
        // fused single-shuffle; broadcast vs cogroup by rule-corpus size
        Pipeline.segmentAuto(turns, rules, buckets, ruleLimit)

    val store = new SnapshotStore(out)
    val segSnap = store.append(segments.toDF(), Map("table" -> "segments"))
    val linSnap = store.append(
      Pipeline.extractionLineage(extracted, snapshotId = segSnap).toDF(),
      Map("table" -> "lineage", "segments_snapshot" -> segSnap.toString))
    val nSegs = store.read(spark, segSnap).count()
    println(s"""{"segments_snapshot":$segSnap,"lineage_snapshot":$linSnap,"segments":$nSegs}""")
  }
}
