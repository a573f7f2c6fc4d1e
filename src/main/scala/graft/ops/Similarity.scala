package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over an `embeddings(vec_id, embedding float[], label)`
  * table. Cosine is computed as an explicit left-to-right fold over doubles
  * (`aggregate(zip_with(...))`) with a zero seed — deterministic and
  * reproducible bit-for-bit by any engine that folds the same order, which
  * is what lets the DuckDB oracle hash-match double outputs.
  *
  * Scale shapes:
  *  - brute-force top-k: broadcast the (small) query set against the big
  *    side — one pass, no shuffle of the corpus, per-partition top-k via
  *    window rank on (query, sim).
  *  - LSH-bucketed ANN: deterministic md5-derived random hyperplanes →
  *    sign-bit bucket key → equi-join on bucket (shuffle on bucket id,
  *    never all-pairs) → exact rerank inside buckets.
  */
object Similarity {

  /** `a · b / (|a| |b|)` as exact fold expressions over DOUBLE arrays. */
  private def cosineExpr(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"aggregate(zip_with($x, $y, (p, q) -> p * q), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
  }

  private def asDouble(col: String): String = s"transform($col, x -> CAST(x AS DOUBLE))"

  /** Brute-force cosine top-k: the first `nQueries` vectors (by vec_id) are
    * the query set, broadcast against the full corpus. Output:
    * (query_id, rank, neighbor_id, sim). */
  def knnBruteForce(embeddings: DataFrame, nQueries: Int = 20, k: Int = 5): DataFrame = {
    val base = embeddings.selectExpr("vec_id", s"${asDouble("embedding")} AS v")
    val queries = base.where(s"vec_id < $nQueries")
      .selectExpr("vec_id AS query_id", "v AS qv")
    val scored = base
      .join(broadcast(queries), expr("vec_id != query_id"))
      .selectExpr("query_id", "vec_id AS neighbor_id", s"${cosineExpr("qv", "v")} AS sim")
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id")
          .orderBy(col("sim").desc, col("neighbor_id"))).cast("long"))
      .where(s"rank <= $k")
      .select("query_id", "rank", "neighbor_id", "sim")
      .orderBy("query_id", "rank")
  }

  /** All pairs with cosine ≥ threshold (exact, symmetric dedup by id order).
    * The honest baseline the ANN path is measured against. */
  def nearDupPairs(embeddings: DataFrame, threshold: Double = 0.4): DataFrame = {
    val base = embeddings.selectExpr("vec_id", s"${asDouble("embedding")} AS v")
    base.as("a").join(base.as("b"), expr("a.vec_id < b.vec_id"))
      .selectExpr("a.vec_id AS vec_a", "b.vec_id AS vec_b", s"${cosineExpr("a.v", "b.v")} AS sim")
      .where(s"sim >= $threshold")
      .orderBy("vec_a", "vec_b")
  }

  val AnnPlanes = 8

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * md5-derived 32-bit uniform mapped into [-1, 1). Any engine reproduces
    * it from the same string key. */
  private def planeComponent(p: Int, d: String): String =
    s"CAST(conv(substring(md5(concat('plane-', $p, '-', $d)), 1, 8), 16, 10) AS BIGINT) / 2147483648.0 - 1.0"

  /** Sign-bit LSH bucket key over AnnPlanes hyperplanes. */
  private def bucketExpr(v: String): String = {
    val bits = (0 until AnnPlanes).map { p =>
      val dot =
        s"aggregate(zip_with($v, sequence(0, size($v) - 1), (x, d) -> x * (${planeComponent(p, "d")})), CAST(0.0 AS DOUBLE), (acc, y) -> acc + y)"
      s"IF($dot >= 0, ${1 << p}, 0)"
    }
    bits.mkString(" + ")
  }

  /** LSH-bucketed approximate nearest neighbors: bucket by hyperplane sign
    * bits, exact cosine rerank within each bucket, top-k per query. Same
    * output schema as [[knnBruteForce]] (plus bucket id) so recall is
    * directly measurable. */
  def annLsh(embeddings: DataFrame, nQueries: Int = 20, k: Int = 5): DataFrame = {
    val base = embeddings
      .selectExpr("vec_id", s"${asDouble("embedding")} AS v")
      .selectExpr("vec_id", "v", s"CAST(${bucketExpr("v")} AS BIGINT) AS bucket")
    val queries = base.where(s"vec_id < $nQueries")
      .selectExpr("vec_id AS query_id", "v AS qv", "bucket")
    base
      .join(queries, Seq("bucket"))
      .where("vec_id != query_id")
      .selectExpr("query_id", "bucket", "vec_id AS neighbor_id", s"${cosineExpr("qv", "v")} AS sim")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id")
          .orderBy(col("sim").desc, col("neighbor_id"))).cast("long"))
      .where(s"rank <= $k")
      .select("query_id", "rank", "neighbor_id", "bucket", "sim")
      .orderBy("query_id", "rank")
  }
}
