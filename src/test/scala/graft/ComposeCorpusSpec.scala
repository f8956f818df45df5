package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the ONE scaled-corpus entry point ([[StressScale.composeCorpus]])
  * the bench pool launcher and the frontier harness share: per-table row
  * counts (synthesized tables at exactly N×, relational tables at 1×),
  * layout idempotence, and the 1× identity. */
class ComposeCorpusSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = TestSpark.sfDir

  test("composeCorpus emits exactly-N× synthesized tables over 1× relational links") {
    val outRoot = java.nio.file.Files
      .createTempDirectory("graft_compose").toString
    try {
      val composed = StressScale.composeCorpus(spark, sfDir, outRoot, 2)
      assert(composed == s"$outRoot/bench_x2")
      def rows(dir: String, t: String): Long =
        spark.read.parquet(s"$dir/$t.parquet").count()
      for (t <- Seq("documents", "embeddings", "events"))
        assert(rows(composed, t) == 2 * rows(sfDir, t),
          s"$t must be synthesized at exactly 2x the fixture rows")
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem")) {
        assert(rows(composed, t) == rows(sfDir, t),
          s"$t must be the 1x fixture itself")
        assert(java.nio.file.Files.isSymbolicLink(
          java.nio.file.Paths.get(composed, s"$t.parquet")),
          s"$t must be a link, not a copy")
      }
      // determinism + idempotence: a second call reuses the synthesized
      // parquet (same bytes on disk) and re-creates the links in place
      val before = spark.read.parquet(s"$composed/documents.parquet")
        .selectExpr("sum(hash(doc_id, text, lang, source, n_chars))")
        .head().getLong(0)
      val again = StressScale.composeCorpus(spark, sfDir, outRoot, 2)
      assert(again == composed)
      val after = spark.read.parquet(s"$composed/documents.parquet")
        .selectExpr("sum(hash(doc_id, text, lang, source, n_chars))")
        .head().getLong(0)
      assert(before == after, "re-composition must not regenerate rows")
    } finally graft.streaming.StreamingStaging.deleteRecursively(
      java.nio.file.Paths.get(outRoot))
  }

  test("composeCorpus: 1x isotropic is the fixture; clustered swaps only the embedding shape") {
    val outRoot = java.nio.file.Files
      .createTempDirectory("graft_compose_clu").toString
    try {
      assert(StressScale.composeCorpus(spark, sfDir, outRoot, 1) == sfDir,
        "the fixture IS the 1x isotropic layout")
      val clu = StressScale.composeCorpus(spark, sfDir, outRoot, 1,
        clustered = true)
      assert(clu == s"$outRoot/bench_clu_x1")
      def rows(dir: String, t: String): Long =
        spark.read.parquet(s"$dir/$t.parquet").count()
      for (t <- Seq("documents", "embeddings", "events"))
        assert(rows(clu, t) == rows(sfDir, t),
          s"clustered 1x must keep the fixture's $t row count")
      // the clustered shape is REAL (not the fixture's isotropic table):
      // planted neighbor groups of 4 put each vector's group mates at
      // cosine ≈ 0.99 — far above anything an isotropic corpus produces
      import org.apache.spark.sql.functions._
      val e = spark.read.parquet(s"$clu/embeddings.parquet")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("ev"))
      val a = e.withColumn("g", floor(col("vec_id") / 4))
      val b = e.select(floor(col("vec_id") / 4).as("g"),
        col("vec_id").as("b_id"), col("ev").as("b_ev"))
      val mates = a.join(b, "g").filter(col("vec_id") < col("b_id"))
        .select(graft.operators.Similarity.cosine(col("ev"), col("b_ev"))
          .as("cos"))
        .agg(avg(col("cos"))).head().getDouble(0)
      assert(mates > 0.9,
        f"planted neighbor groups must cohere (mean group cosine $mates%.3f)")
    } finally graft.streaming.StreamingStaging.deleteRecursively(
      java.nio.file.Paths.get(outRoot))
  }
}
