package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Interchange-format round trips: a corpus written to JSONL / CSV and
  * read back with an explicit schema must reproduce the parquet source
  * exactly — documents carry free text (commas, quotes, unicode), which
  * is precisely what breaks naive CSV handling. */
class InterchangeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def docs() = Tables.documents(spark, dir)

  test("documents round-trip through JSONL losslessly") {
    val out = Files.createTempDirectory("graft_jsonl").resolve("docs").toString
    docs().write.mode("overwrite").json(out)
    val back = spark.read.schema(docs().schema).json(out)
    assert(back.count() == docs().count())
    assert(back.exceptAll(docs()).isEmpty && docs().exceptAll(back).isEmpty)
  }

  test("documents round-trip through quoted CSV losslessly") {
    val out = Files.createTempDirectory("graft_csv").resolve("docs").toString
    docs().write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .csv(out)
    val back = spark.read.schema(docs().schema)
      .option("header", "true").option("escape", "\"")
      .csv(out)
    assert(back.count() == docs().count())
    assert(back.exceptAll(docs()).isEmpty && docs().exceptAll(back).isEmpty)
  }

  test("events timestamps survive a JSONL round trip at microsecond precision") {
    val out = Files.createTempDirectory("graft_jsonl_ev").resolve("events").toString
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    ev.write.mode("overwrite")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").json(out)
    val back = spark.read.schema(ev.schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").json(out)
    assert(back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty)
  }
}
