package graft.spark

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

import graft.core.text.PyText
import graft.functions.GraftFunctions

/** The custom-Catalyst-Expression surface: CPython-parity kernels exposed as
  * codegen'd SQL functions (SURVEY §2.5 UDx row — the `Expression` path
  * that beats a Scala UDF). Checked for value parity with the core kernels
  * and for staying inside whole-stage codegen. */
class FunctionsSpec extends AnyFunSuite with SparkFixture {

  private lazy val registered: Unit = GraftFunctions.register(spark)

  // vectors that expose CPython-vs-Java divergence: NBSP, THIN SPACE,
  // U+001C, İ (U+0130), ß, Kelvin sign
  private val vectors = Seq(
    "  a  bc  ",
    "İstanbul STRASSE groß",
    "page with KELVIN K mark",
    "", " ", "plain ascii words")

  test("py_normalize_text / py_lower match the core kernels over SQL") {
    registered
    import spark.implicits._
    val df = vectors.toDF("s")
    df.createOrReplaceTempView("v_funcs")
    val got = spark.sql(
      "SELECT s, py_normalize_text(s) AS n, py_lower(s) AS l FROM v_funcs").collect()
    got.foreach { r =>
      assert(r.getString(1) == PyText.normalize(r.getString(0)))
      assert(r.getString(2) == PyText.pyLower(r.getString(0)))
    }
  }

  test("py_count_occurrences matches the core kernel incl. case folding") {
    registered
    import spark.implicits._
    val rows = Seq(
      ("the kelvin K and k again", "k"),
      ("aaaa", "aa"), // non-overlapping: 2, not 3
      ("Foo FOO foo", "foo"),
      ("nothing here", "zzz"))
    rows.toDF("page", "id").createOrReplaceTempView("v_cnt")
    val got = spark.sql("SELECT page, id, py_count_occurrences(page, id) FROM v_cnt").collect()
    got.foreach { r =>
      assert(r.getInt(2) == PyText.countOccurrences(r.getString(0), r.getString(1)),
        s"for (${r.getString(0)}, ${r.getString(1)})")
    }
  }

  test("expressions run inside whole-stage codegen") {
    registered
    import spark.implicits._
    val df = spark.range(100).selectExpr("CAST(id AS STRING) AS s")
      .selectExpr("py_normalize_text(s) AS n", "py_count_occurrences(s, '1') AS c")
      .where("c >= 0")
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // formatted mode marks whole-stage-codegen'd nodes with [codegen id : N];
    // every Project/Filter carrying our expressions must be inside one
    assert(plan.contains("[codegen id :"), plan)
    val projectLines = plan.linesIterator.filter(l => l.contains("Project") || l.contains("Filter"))
    assert(projectLines.forall(l => !l.trim.startsWith("(") || l.contains("codegen id")), plan)
    assert(df.count() == 100)
  }

  test("py_contains parity and the count>0 strength-reduction rewrite") {
    registered
    import spark.implicits._
    val rows = Seq(
      ("the kelvin K and k again", "k"),
      ("aaaa", "aa"),
      ("Foo FOO foo", "foo"),
      ("İstanbul", "i̇stanbul"),
      ("nothing here", "zzz"),
      ("", "x"), ("x", ""))
    // RDD-backed (not a LocalRelation): otherwise ConvertToLocalRelation
    // folds the whole filter away before the rewrite is observable
    val df = spark.sparkContext.parallelize(rows, 2).toDF("page", "id")
    df.createOrReplaceTempView("v_contains")
    // value parity: py_contains == (core count > 0)
    spark.sql("SELECT page, id, py_contains(page, id) AS c FROM v_contains")
      .collect().foreach { r =>
        assert(r.getBoolean(2) == (PyText.countOccurrences(r.getString(0), r.getString(1)) > 0),
          s"for (${r.getString(0)}, ${r.getString(1)})")
      }
    // the optimizer rewrites every count-as-existence shape to py_contains
    val fired = Seq(
      "py_count_occurrences(page, id) > 0",
      "py_count_occurrences(page, id) >= 1",
      "0 < py_count_occurrences(page, id)",
      "py_count_occurrences(page, id) = 0")
    fired.foreach { pred =>
      val q = spark.sql(s"SELECT page FROM v_contains WHERE $pred")
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("py_contains") && !opt.contains("py_count_occurrences"),
        s"rule did not fire for [$pred]:\n$opt")
      // rewritten result == unoptimized semantics recomputed row-by-row
      val want = rows.filter { case (p, i) =>
        val c = PyText.countOccurrences(p, i)
        if (pred.endsWith("= 0")) c == 0 else c > 0
      }.map(_._1).sorted
      assert(q.collect().map(_.getString(0)).sorted.toSeq === want)
    }
    // a non-existence use of the count is NOT rewritten
    val kept = spark.sql("SELECT page FROM v_contains WHERE py_count_occurrences(page, id) > 1")
    assert(kept.queryExecution.optimizedPlan.toString.contains("py_count_occurrences"))
  }

  test("null propagation") {
    registered
    val r = spark.sql(
      "SELECT py_normalize_text(CAST(NULL AS STRING)), py_count_occurrences('a', CAST(NULL AS STRING))").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
