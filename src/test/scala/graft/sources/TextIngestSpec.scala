package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** JSONL ingest: schema-enforced parse, corrupt-line quarantine, and a
  * lossless parquet→jsonl→parquet round-trip of the real fixture. */
class TextIngestSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("corrupt lines are quarantined, not dropped or fatal") {
    val dir = Files.createTempDirectory("graft_jsonl")
    val file = dir.resolve("part-0.jsonl")
    Files.writeString(file,
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}
        |{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "n_chars": 7}
        |this line is not json at all
        |{"doc_id": 3, "text": "unterminated
        |{"doc_id": 4, "text": "ok", "lang": "de", "source": "web", "n_chars": 2}
        |""".stripMargin)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    val ingest = TextIngest.readJsonl(spark, dir.toString)
    val rows = ingest.good.orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    assert(rows.head.getString(1) == "hello world")
    val bad = ingest.quarantine.collect().map(_.getString(0))
    assert(bad.length == 2)
    assert(bad.exists(_.contains("not json")))
    assert(bad.exists(_.contains("unterminated")))
    // release drops the shared parse cache (no cached corpus left behind)
    ingest.release()
    assert(spark.sparkContext.getPersistentRDDs.size == cachedBefore)
  }

  test("parquet corpus round-trips through jsonl losslessly") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val out = Files.createTempDirectory("graft_jsonl_rt").toString
    TextIngest.writeJsonl(docs, out)
    val ingest = TextIngest.readJsonl(spark, out)
    val back = ingest.good
    assert(ingest.quarantine.count() == 0)
    assert(back.count() == docs.count())
    // column-order-normalized row sets must match exactly
    val cols = docs.columns.sorted.toIndexedSeq.map(col)
    val a = docs.select(cols: _*).collect().map(_.toSeq).toSet
    val b = back.select(cols: _*).collect().map(_.toSeq).toSet
    assert(a == b)
    ingest.release()
  }

  test("ingested corpora run the operator library unchanged") {
    // stage the fixture as jsonl, ingest, and run a text operator over it
    val out = Files.createTempDirectory("graft_jsonl_ops").toString
    TextIngest.writeJsonl(Tables.documents(spark, TestSpark.sfDir), out)
    val ingest = TextIngest.readJsonl(spark, out)
    val masked = graft.operators.TextAnalysis.piiMaskOn(
      ingest.good.select(col("doc_id"), col("text")))
    assert(masked.count() == ingest.good.count())
    ingest.release()
  }

  test("CSV: quoted delimiters survive, malformed rows quarantine, round-trip") {
    val dir = Files.createTempDirectory("graft_csv")
    Files.writeString(dir.resolve("part-0.csv"),
      """doc_id,text,lang,source,n_chars
        |1,"hello, world",en,web,12
        |2,plain text,fr,web,10
        |not_a_long,busted row,xx,web,0
        |3,"embedded ""quotes"" fine",de,web,22
        |""".stripMargin)
    val ingest = TextIngest.readCsv(spark, dir.toString)
    val rows = ingest.good.orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.head.getString(1) == "hello, world") // quoted comma intact
    assert(rows(2).getString(1) == "embedded \"quotes\" fine")
    assert(ingest.quarantine.count() == 1)
    ingest.release()
    // and the fixture corpus round-trips parquet -> csv -> parquet
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val out = Files.createTempDirectory("graft_csv_rt").toString
    TextIngest.writeCsv(docs, out)
    val back = TextIngest.readCsv(spark, out)
    assert(back.quarantine.count() == 0)
    val cols = docs.columns.sorted.toIndexedSeq.map(col)
    assert(back.good.select(cols: _*).collect().map(_.toSeq).toSet ==
      docs.select(cols: _*).collect().map(_.toSeq).toSet)
    back.release()
  }
}
