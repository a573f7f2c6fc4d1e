package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Fixture dumps written alongside the query dumps (underscore prefix =
    * not a query): inputs the oracles need that exist only as deterministic
    * in-JVM generator output. `_raw_turns` is the synthetic transcript
    * input itself — it lets DuckDB verify the passthrough subset of the
    * extraction output (text identity + full-payload span) that it cannot
    * re-derive any other way. ContractSpec pins oracle dump references to
    * this set ∪ the registered queries. */
  def fixtureDumps: Set[String] = Set("_raw_turns")

  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query subset, for fast local
    // iteration on one oracle (the driver always passes exactly two)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // the _raw_turns fixture: same generator, same conv count as t_extract
    graft.gen.SyntheticTranscripts
      .turns(spark, graft.gen.SyntheticTranscripts.convsForSfDir(sfDir))
      .toDF().select("conv_id", "turn_idx", "role", "tool", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_raw_turns")
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Oracles over OTHER queries' dumps (t_consolidate vs the t_extract
    // parquet, t_xml vs t_segment, …) carry a __VERIFY_OUT__ placeholder —
    // resolved here to the absolute dump dir, since only Verify knows it.
    // Golden-parquet oracles carry __REPO__ (the checkout root holding
    // golden/): resolved to GRAFT_REPO_ROOT if set, else the nearest
    // ancestor of the cwd containing build.sbt, else the cwd — never a
    // hardcoded absolute path. All dumps complete above before the driver
    // runs any oracle SQL.
    val outAbs = new java.io.File(outDir).getAbsolutePath
    val repoAbs = RepoRoot.resolve().getAbsolutePath
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace("__VERIFY_OUT__", outAbs).replace("__REPO__", repoAbs))}"
      }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
