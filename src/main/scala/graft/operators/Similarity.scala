package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over the `embeddings` fixture (`Array[Float]`, 64-dim):
  * brute-force cosine top-k (the correctness baseline), random-hyperplane
  * LSH bucketed ANN (the scale path), and embedding-cosine near-dup pairs.
  *
  * Determinism/oracle design: all dot products are left folds in index
  * order over doubles (`aggregate(zip_with(...))` in Spark ≡ `list_reduce`
  * of a list comprehension in DuckDB), floats cast to double before any
  * arithmetic, cosine written as `dot / (sqrt(na) * sqrt(nb))` in exactly
  * that shape on both sides — results are bit-identical, so even the
  * floating-point scores hash-match.
  *
  * LSH hyperplane weights come from a C-standard LCG over integer
  * arithmetic (`(1103515245·k + 12345) mod 2³¹`), not a PRNG object, so
  * both engines derive identical planes.
  *
  * Scale story: brute-force top-k is O(n²·d) and exists to validate the
  * ANN path; the LSH variant joins on a bucket id (16 buckets here;
  * #planes is a knob), so comparisons scale with bucket occupancy.
  * At 100 TB you'd add an IVF-style repartition on bucket + per-partition
  * top-k; the bucket join here already has that shuffle shape (hash
  * partition on bucket, AQE handles occupancy skew).
  */
object Similarity {

  private def sorted(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(col).toSeq: _*)

  private val dvec: Column =
    transform(col("embedding"), x => x.cast("double"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  private def cosine(av: Column, bv: Column): Column =
    dot(av, bv) / (sqrt(dot(av, av)) * sqrt(dot(bv, bv)))

  /** DuckDB fragments mirroring the Spark folds (1-based indices). */
  private def sqlDot(a: String, b: String): String =
    s"list_reduce([$a[i] * $b[i] for i in range(1, len($a) + 1)], (x, y) -> x + y)"

  private def sqlCos(a: String, b: String): String =
    s"${sqlDot(a, b)} / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)}))"

  private val vCte =
    """v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
      |      FROM embeddings)""".stripMargin

  // --- brute-force cosine top-k --------------------------------------------

  private val TopK = 5

  /** Exact cosine top-k neighbors per vector — O(n²·d) baseline. */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.embeddings(spark, dir).select(col("vec_id"), dvec.as("ev"))
    val a = v.select(col("vec_id").as("vec_id"), col("ev").as("a_ev"))
    val b = v.select(col("vec_id").as("neighbor_id"), col("ev").as("b_ev"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    sorted(a.join(b, col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id"),
        cosine(col("a_ev"), col("b_ev")).as("cosine"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= TopK)
      .select(col("vec_id"), col("neighbor_id"), col("rnk"), col("cosine")))
  }

  val cosineTopKOracle: String =
    s"""WITH $vCte,
       |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |             ${sqlCos("a.ev", "b.ev")} AS cosine
       |      FROM v a JOIN v b ON a.vec_id <> b.vec_id),
       |r AS (SELECT vec_id, neighbor_id, cosine,
       |             row_number() OVER (PARTITION BY vec_id
       |                                ORDER BY cosine DESC, neighbor_id) AS rnk
       |      FROM p)
       |SELECT vec_id, neighbor_id, rnk, cosine FROM r WHERE rnk <= $TopK
       |ORDER BY 1, 2, 3, 4""".stripMargin

  // --- embedding-cosine near-dup pairs -------------------------------------

  /** embeddings ∪ perturbed copies (first 8 dims +0.1) of every 20th
    * vector at vec_id+100000 — cosine(orig, copy) ≈ 0.99 on unit-scale
    * random vectors, every other pair < 0.55. */
  private def withNearDupVecs(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val base = e.select(col("vec_id"), dvec.as("ev"))
    val pert = transform(dvec, (x, i) => when(i < 8, x + lit(0.1)).otherwise(x))
    base.unionAll(e.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), pert.as("ev")))
  }

  private val nearDupVecsCte: String =
    s"""v0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
       |       FROM embeddings),
       |v AS (SELECT vec_id, ev FROM v0
       |      UNION ALL
       |      SELECT vec_id + 100000 AS vec_id,
       |             [CASE WHEN i <= 8 THEN ev[i] + 0.1 ELSE ev[i] END
       |              for i in range(1, len(ev) + 1)] AS ev
       |      FROM v0 WHERE vec_id % 20 = 0)""".stripMargin

  /** Embedding-cosine near-duplicate pairs (cosine ≥ 0.9). */
  def cosineNearDup(spark: SparkSession, dir: String): DataFrame = {
    val v = withNearDupVecs(spark, dir)
    val a = v.select(col("vec_id").as("a_id"), col("ev").as("a_ev"))
    val b = v.select(col("vec_id").as("b_id"), col("ev").as("b_ev"))
    sorted(a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        cosine(col("a_ev"), col("b_ev")).as("cosine"))
      .filter(col("cosine") >= 0.9))
  }

  val cosineNearDupOracle: String =
    s"""WITH $nearDupVecsCte
       |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |       ${sqlCos("a.ev", "b.ev")} AS cosine
       |FROM v a JOIN v b ON a.vec_id < b.vec_id
       |WHERE ${sqlCos("a.ev", "b.ev")} >= 0.9
       |ORDER BY 1, 2, 3""".stripMargin

  // --- random-hyperplane LSH ANN -------------------------------------------

  private val NumPlanes = 4 // 16 buckets
  private val Dim = 64
  private val AnnK = 3

  /** Deterministic hyperplane weights from the C-standard LCG — pure
    * integer arithmetic both engines reproduce exactly. */
  private def lcgWeight(k: Long): Double =
    ((1103515245L * k + 12345L) % 2147483648L).toDouble / 2147483648.0 - 0.5

  private def planeWeights(p: Int): Seq[Double] =
    (0 until Dim).map(i => lcgWeight(p.toLong * Dim + i))

  private def bucketExpr(v: Column): Column =
    (0 until NumPlanes).map { p =>
      when(dot(v, typedlit(planeWeights(p))) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN top-k via random-hyperplane LSH: vectors meet only within their
    * sign-pattern bucket. The oracle runs the identical algorithm (same
    * planes, same folds), so this hash-matches even though ANN-vs-exact
    * recall is approximate by construction. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.embeddings(spark, dir)
      .select(col("vec_id"), dvec.as("ev"))
      .withColumn("bucket", bucketExpr(col("ev")))
    val a = v.select(col("vec_id"), col("ev").as("a_ev"), col("bucket"))
    val b = v.select(col("vec_id").as("neighbor_id"), col("ev").as("b_ev"),
      col("bucket").as("b_bucket"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    sorted(a.join(b, col("bucket") === col("b_bucket") &&
        col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id"), col("bucket"),
        cosine(col("a_ev"), col("b_ev")).as("cosine"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= AnnK)
      .select(col("vec_id"), col("neighbor_id"), col("bucket"),
        col("rnk"), col("cosine")))
  }

  val annLshOracle: String =
    s"""WITH $vCte,
       |pw AS (SELECT p,
       |          [CAST((1103515245 * (p * $Dim + i - 1) + 12345) % 2147483648 AS DOUBLE)
       |             / 2147483648.0 - 0.5
       |           for i in range(1, $Dim + 1)] AS w
       |       FROM range(0, $NumPlanes) t(p)),
       |vb AS (SELECT v.vec_id,
       |              CAST(sum(CASE WHEN ${sqlDot("v.ev", "pw.w")} > 0
       |                            THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
       |       FROM v CROSS JOIN pw GROUP BY v.vec_id),
       |vv AS (SELECT v.vec_id, v.ev, vb.bucket
       |       FROM v JOIN vb ON v.vec_id = vb.vec_id),
       |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, a.bucket,
       |             ${sqlCos("a.ev", "b.ev")} AS cosine
       |      FROM vv a JOIN vv b
       |        ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       |r AS (SELECT vec_id, neighbor_id, bucket, cosine,
       |             row_number() OVER (PARTITION BY vec_id
       |                                ORDER BY cosine DESC, neighbor_id) AS rnk
       |      FROM p)
       |SELECT vec_id, neighbor_id, bucket, rnk, cosine FROM r WHERE rnk <= $AnnK
       |ORDER BY 1, 2, 3, 4, 5""".stripMargin

  // --- registry ------------------------------------------------------------

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_cosine_topk" -> (cosineTopK _),
    "sim_cosine_neardup" -> (cosineNearDup _),
    "sim_ann_lsh" -> (annLsh _))

  val oracles: Map[String, String] = Map(
    "sim_cosine_topk" -> cosineTopKOracle,
    "sim_cosine_neardup" -> cosineNearDupOracle,
    "sim_ann_lsh" -> annLshOracle)
}
