package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Direct specs for the TypedImperativeAggregate sketches: the MinHash
  * min-property, partition invariance (exercising partial/merge/serde
  * paths), and SimHash vote packing. */
class SketchAggregatesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def features(n: Int) = {
    import spark.implicits._
    (0 until n).flatMap(d => Seq.tabulate(20)(i => (d.toLong, s"w${d}_$i")))
      .toDF("id", "w").withColumn("h", xxhash64(col("w")))
  }

  test("minhash signature is the element-wise min over feature signatures") {
    val df = features(1)
    val groupSig = df.groupBy("id")
      .agg(SketchFunctions.minhash_sketch(col("h"), 64).as("sig"))
      .head().getSeq[Long](1)
    // per-feature signatures (each feature alone in its group)
    val perFeature = df.withColumn("id", monotonically_increasing_id())
      .groupBy("id")
      .agg(SketchFunctions.minhash_sketch(col("h"), 64).as("sig"))
      .collect().map(_.getSeq[Long](1)).toSeq
    val expected = perFeature.transpose.map(_.min)
    assert(groupSig == expected)
  }

  test("sketches are invariant to input partitioning (merge/serde paths)") {
    val df = features(16)
    def sigs(parts: Int) = df.repartition(parts)
      .groupBy("id")
      .agg(SketchFunctions.minhash_sketch(col("h"), 64).as("sig"),
        SketchFunctions.simhash_sketch(pmod(col("h"), lit(1000000007L))).as("b4"),
        SketchFunctions.hll_registers(col("h"), 64, 57).as("regs"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getSeq[Long](1), r.getSeq[Long](2), r.getSeq[Byte](3))))
      .toMap
    assert(sigs(1) == sigs(7))
  }

  test("minhash band hashes collide exactly when signature slices agree") {
    // two docs sharing 19 of 20 features agree on most signature slots;
    // band hashes must be equal exactly on the bands whose 4-slot slices
    // are equal — the property the LSH self-join keys on
    import spark.implicits._
    val base = Seq.tabulate(20)(i => s"w$i")
    val df = (base.map(w => (1L, w)) ++ (base.take(19) :+ "other").map(w => (2L, w)))
      .toDF("id", "w").withColumn("h", xxhash64(col("w")))
    val out = df.groupBy("id")
      .agg(SketchFunctions.minhash_sketch(col("h"), 64).as("sig"),
        SketchFunctions.minhash_bands(col("h"), 64, 16).as("bands"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Long](1), r.getSeq[Long](2)))).toMap
    val (sig1, bands1) = out(1L)
    val (sig2, bands2) = out(2L)
    assert(bands1.length == 16 && bands2.length == 16)
    val sliceEq = (0 until 16).map(b =>
      sig1.slice(b * 4, b * 4 + 4) == sig2.slice(b * 4, b * 4 + 4))
    val bandEq = (0 until 16).map(b => bands1(b) == bands2(b))
    assert(bandEq == sliceEq)
    assert(sliceEq.exists(identity) && sliceEq.exists(!_),
      "fixture should produce both agreeing and disagreeing bands")
  }

  test("scalar band expressions equal the aggregate sketch paths") {
    import spark.implicits._
    // same shingle sets through both forms: the per-row scalar fold and
    // the explode -> hash -> TypedImperativeAggregate detour must agree
    // exactly (they share SketchHashing; the per-feature hashes must
    // match too — xxhash64(seed 42) vs the scalar's XXH64 call)
    val df = (0 until 8).map(d =>
      (d.toLong, Seq.tabulate(12)(i => s"w${d}_$i w${d}_${i + 1} w${d}_${i + 2}")))
      .toDF("id", "sh")
    val scalar = df.select(col("id"),
      SketchScalarFunctions.minhash_bands_of(col("sh"), 64, 16).as("mb"),
      SketchScalarFunctions.simhash_bands_of(col("sh")).as("sb"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Long](1), r.getSeq[Long](2)))).toMap
    val agg = df.select(col("id"), explode(col("sh")).as("w"))
      .withColumn("h", xxhash64(col("w")))
      .withColumn("p", StringFunctions.poly_hash(col("w")))
      .groupBy("id")
      .agg(SketchFunctions.minhash_bands(col("h"), 64, 16).as("mb"),
        SketchFunctions.simhash_sketch(col("p")).as("sb"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Long](1), r.getSeq[Long](2)))).toMap
    assert(scalar == agg)
  }

  test("simhash packs vote signs into four 16-bit bands") {
    import spark.implicits._
    // one feature with known poly hash p: every bit vote is decided by
    // (A_i*p + B_i) % M >= (M+1)/2 — recompute expected bands in Scala
    val p = 123456789L
    val df = Seq((1L, p)).toDF("id", "p")
    val bands = df.groupBy("id")
      .agg(SketchFunctions.simhash_sketch(col("p")).as("b4"))
      .head().getSeq[Long](1)
    val M = 1000000007L
    val expected = (0 until 4).map { k =>
      (0 until 16).foldLeft(0L) { (acc, j) =>
        val i = 16 * k + j
        val a = (1103515245L * i + 12345L) % M
        val b = (1103515245L * (i + 64) + 12345L) % M
        if ((p * a + b) % M >= (M + 1) / 2) acc | (1L << j) else acc
      }
    }
    assert(bands == expected)
    assert(bands.forall(b => b >= 0 && b < (1L << 16)))
  }
}
