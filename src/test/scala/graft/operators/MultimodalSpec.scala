package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The mapPartitions decode plumbing must agree with the expression-based
  * feature path (same byte histogram, normalized), proving a real codec
  * can slot into [[Multimodal.decodeFeatures]] without touching the
  * Spark-side shape. */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("mapPartitions decode equals the expression histogram (normalized)") {
    val viaExpr = Multimodal.features(spark, dir).collect()
      .map { r =>
        val total = (1 to 16).map(r.getLong).sum.toFloat
        r.getLong(0) -> (1 to 16).map(i => r.getLong(i) / total).toVector
      }.toMap
    val viaPartitions = Multimodal.decodeFeatures(spark, dir).collect()
      .map { r =>
        r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble.toFloat).toVector
      }.toMap
    assert(viaExpr.nonEmpty)
    assert(viaPartitions.keySet == viaExpr.keySet)
    viaExpr.foreach { case (id, expected) =>
      val actual = viaPartitions(id)
      expected.zip(actual).foreach { case (e, a) =>
        assert(math.abs(e - a) < 1e-6f, s"doc $id: $expected vs $actual")
      }
    }
  }

  test("payload metadata carries byte-accurate sizes") {
    val rows = Multimodal.metadata(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(1) == "utf8"))
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("resize fingerprints are stable across runs (fixed 64-sample frame)") {
    val a = Multimodal.resize(spark, dir).collect().toSeq
    val b = Multimodal.resize(spark, dir).collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
