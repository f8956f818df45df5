package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Recall and scaling specs for the similarity operators. */
class SimilaritySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("planes grow logarithmically with corpus size (bucket occupancy ~50)") {
    assert(Similarity.planesFor(100L) == 4) //  16 buckets
    assert(Similarity.planesFor(500L) == 4)
    assert(Similarity.planesFor(2500L) == 6) //  64 buckets
    assert(Similarity.planesFor(25000L) == 9) // 512 buckets
    assert(Similarity.planesFor(1000000L) == 15)
    assert(Similarity.planesFor(Long.MaxValue / 4) == 20) // capped
  }

  test("LSH near-dup recalls the exact cosine pair set (recall 1.0 on fixtures)") {
    val exact = Similarity.cosineNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.nearDupLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh == exact)
  }

  test("ANN neighbors within a bucket are exact-cosine ranked") {
    val rows = Similarity.annLsh(spark, dir).collect()
    assert(rows.nonEmpty)
    // per vec_id: ranks are 1..k and cosine non-increasing with rank
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq == (1L to byRank.length))
      val cos = byRank.map(_.getDouble(4)).toSeq
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }
}
