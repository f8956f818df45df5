package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The SQL surface of the native functions: every builder registered by
  * [[GraftFunctions.registerAll]] (the same table
  * [[GraftExtensions]] injects via `spark.sql.extensions`) must produce
  * the identical result through `spark.sql` as through the Column API. */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    GraftFunctions.registerAll(s)
    graft.sources.Tables.documents(s, TestSpark.sfDir)
      .createOrReplaceTempView("docs_ext")
    graft.sources.Tables.embeddings(s, TestSpark.sfDir)
      .createOrReplaceTempView("emb_ext")
    s
  }

  test("poly_hash and word_shingles work from SQL and match the Column API") {
    val sql = spark.sql(
      """SELECT doc_id, poly_hash(text) AS ph,
        |       word_shingles(split(text, ' '), 3) AS sh
        |FROM docs_ext""".stripMargin)
    val api = graft.sources.Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"),
        StringFunctions.poly_hash(col("text")).as("ph"),
        StringFunctions.word_shingles(split(col("text"), " "), 3).as("sh"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }

  test("cosine_similarity and dot_product work from SQL and match the Column API") {
    val sql = spark.sql(
      """SELECT vec_id,
        |       cosine_similarity(ev, ev) AS c,
        |       dot_product(ev, ev) AS d
        |FROM (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |      FROM emb_ext)""".stripMargin)
    val api = graft.sources.Tables.embeddings(spark, TestSpark.sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("ev"))
      .select(col("vec_id"),
        VectorFunctions.cosine_similarity(col("ev"), col("ev")).as("c"),
        VectorFunctions.dot_product(col("ev"), col("ev")).as("d"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }

  test("sketch aggregates work from SQL and match the Column API") {
    val sql = spark.sql(
      """SELECT minhash_sketch(xxhash64(text), 16) AS mh,
        |       simhash_sketch(poly_hash(text)) AS sh
        |FROM docs_ext""".stripMargin).collect()(0)
    val api = graft.sources.Tables.documents(spark, TestSpark.sfDir)
      .agg(SketchFunctions.minhash_sketch(xxhash64(col("text")), 16).as("mh"),
        SketchFunctions.simhash_sketch(
          StringFunctions.poly_hash(col("text"))).as("sh"))
      .collect()(0)
    assert(sql.getSeq[Long](0) == api.getSeq[Long](0))
    assert(sql.getSeq[Long](1) == api.getSeq[Long](1))
  }

  test("scalar band sketches and vector_sum work from SQL and match the Column API") {
    val sql = spark.sql(
      """SELECT doc_id,
        |       minhash_bands_of(word_shingles(split(text, ' '), 3), 64, 16) AS mb,
        |       simhash_bands_of(word_shingles(split(text, ' '), 3)) AS sb
        |FROM docs_ext""".stripMargin)
    val sh = StringFunctions.word_shingles(split(col("text"), " "), 3)
    val api = graft.sources.Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"),
        SketchScalarFunctions.minhash_bands_of(sh, 64, 16).as("mb"),
        SketchScalarFunctions.simhash_bands_of(sh).as("sb"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)

    val sqlSum = spark.sql(
      """SELECT vector_sum(transform(embedding, x -> CAST(x AS DOUBLE)), 64) AS s
        |FROM emb_ext""".stripMargin).head().getSeq[Double](0)
    val apiSum = graft.sources.Tables.embeddings(spark, TestSpark.sfDir)
      .agg(SketchFunctions.vector_sum(
        transform(col("embedding"), x => x.cast("double")), 64).as("s"))
      .head().getSeq[Double](0)
    // accumulation order is partition order in both paths, but the single
    // local partition makes them identical here
    assert(sqlSum == apiSum)
  }

  test("winnow_fingerprints works from SQL and matches the Column API") {
    val sql = spark.sql(
      """SELECT doc_id,
        |       winnow_fingerprints(split(text, ' '), 3, 4) AS fp
        |FROM docs_ext""".stripMargin)
    val api = graft.sources.Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"),
        StringFunctions.winnow_fingerprints(
          split(col("text"), " "), 3, 4).as("fp"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }

  test("wrong arity raises a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT poly_hash('a', 'b')").collect()
    }
    assert(e.getMessage.contains("poly_hash"))
  }
}
