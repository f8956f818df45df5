package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The PII mask bundle: every default pattern masks its shape (including
  * the separator-tolerant phone variants), ordering prevents the bare
  * digit-run catch-all from swallowing structured shapes, custom bundles
  * slot in, and the registry query's planted corpus exercises all four
  * patterns end-to-end. */
class TextPiiSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("each default pattern masks its shape; order keeps shapes intact") {
    import spark.implicits._
    val rows = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org today"),
      (2L, "ssn is 123-45-6789 ok"),
      (3L, "call (415) 555-0199 or 415-555-0199 or 415.555.0199 or 415 555 0199"),
      (4L, "account 123456789012 end"),
      (5L, "short 1234567 stays"),
      (6L, "id42 no pii here"))
    val out = TextAnalysis.piiMaskOn(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L)._1 == "reach me at <EMAIL> today")
    assert(out(2L)._1 == "ssn is <SSN> ok")
    assert(out(3L)._1 == "call <PHONE> or <PHONE> or <PHONE> or <PHONE>")
    assert(out(4L)._1 == "account <NUM> end")
    assert(out(5L)._1 == "short 1234567 stays") // 7 digits: below the run floor
    assert(out(6L)._1 == "id42 no pii here")
    assert(out(1L)._2 > 0 && out(5L)._2 == 0 && out(6L)._2 == 0)
  }

  test("custom bundles apply in order") {
    import spark.implicits._
    val bundle = Seq(
      "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+" -> "<IP>",
      "[0-9]{8,}" -> "<NUM>")
    val out = TextAnalysis.piiMaskOn(
        Seq((1L, "from 10.0.20.31 with id 987654321")).toDF("doc_id", "text"),
        bundle)
      .head().getString(1)
    assert(out == "from <IP> with id <NUM>")
  }

  test("registry query plants and masks every pattern at fixture scale") {
    val masked = TextAnalysis.piiMask(spark, TestSpark.sfDir)
      .collect().map(_.getString(1))
    for (tag <- Seq("<EMAIL>", "<SSN>", "<PHONE>", "<NUM>"))
      assert(masked.exists(_.contains(tag)), s"$tag never produced")
    // nothing planted may survive the mask
    for (leak <- Seq("@example.com", "123-45-6789", "(415) 555-", "12345678901"))
      assert(!masked.exists(_.contains(leak)), s"unmasked remnant: $leak")
  }
}
