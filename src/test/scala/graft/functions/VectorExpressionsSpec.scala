package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The native cosine expression must be bit-identical to the composable
  * HOF form (same fold order), in both the interpreted and the
  * whole-stage-codegen path, across the real embedding fixtures. */
class VectorExpressionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def pairs = {
    val v = graft.sources.Tables.embeddings(spark, TestSpark.sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("ev"))
      .limit(80)
    v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        col("a.ev").as("x"), col("b.ev").as("y"))
  }

  test("native cosine is bit-identical to the HOF fold (codegen path)") {
    val both = pairs.select(
      graft.operators.Similarity.cosineHof(col("x"), col("y")).as("hof"),
      VectorFunctions.cosine_similarity(col("x"), col("y")).as("native"))
    val rows = both.collect()
    assert(rows.length > 1000)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("native cosine is bit-identical in the interpreted path") {
    val both = spark.conf.get("spark.sql.codegen.wholeStage") match {
      case _ =>
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        try pairs.select(
          graft.operators.Similarity.cosineHof(col("x"), col("y")).as("hof"),
          VectorFunctions.cosine_similarity(col("x"), col("y")).as("native"))
          .collect()
        finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("native dot product is bit-identical to the HOF fold") {
    val hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)
    val both = pairs.select(
      hofDot(col("x"), col("y")).as("hof"),
      VectorFunctions.dot_product(col("x"), col("y")).as("native"))
    val rows = both.collect()
    assert(rows.length > 1000)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("degenerate inputs match the HOF form: null, not truncation") {
    import spark.implicits._
    // (matched, mismatched-length, null-element) pairs — the HOF form
    // yields null for the last two; the native expressions must agree
    // in both execution paths
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (2L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)),
      (3L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)))
      .toDF("id", "x", "y")
    def check(): Unit = {
      val hofDot = aggregate(zip_with(col("x"), col("y"), _ * _), lit(0.0), _ + _)
      val rows = df.select(col("id"),
        VectorFunctions.dot_product(col("x"), col("y")).as("dot"),
        VectorFunctions.cosine_similarity(col("x"), col("y")).as("cos"),
        hofDot.as("hof"))
        .collect().map(r => r.getLong(0) ->
          (r.isNullAt(1), r.isNullAt(2), r.isNullAt(3))).toMap
      assert(rows(1L) == ((false, false, false)))
      assert(rows(2L) == ((true, true, true)), "length mismatch must be null")
      assert(rows(3L) == ((true, true, true)), "null element must be null")
    }
    check() // codegen path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try check() finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("native squared L2 is bit-identical to the HOF fold") {
    val hofL2 = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)
    val both = pairs.select(
      hofL2(col("x"), col("y")).as("hof"),
      VectorFunctions.squared_l2(col("x"), col("y")).as("native"))
    val rows = both.collect()
    assert(rows.length > 1000)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("pq_assign: codes/err/decode on a hand-built codebook; degenerate rows null") {
    import spark.implicits._
    // 2 subspaces x 2 centroids, subDim 2. Row 1 sits nearest centroid 1
    // then centroid 0; row 2 is equidistant in subspace 0 (tie -> smallest
    // code); row 3 has the wrong dimension count; row 4 a null element.
    val cb: Array[Array[Array[Double]]] = Array(
      Array(Array(0.0, 0.0), Array(10.0, 10.0)),
      Array(Array(0.0, 0.0), Array(10.0, 10.0)))
    val df = Seq(
      (1L, Seq[java.lang.Float](9f, 9f, 1f, 1f)),
      (2L, Seq[java.lang.Float](5f, 5f, 0f, 0f)),
      (3L, Seq[java.lang.Float](1f, 2f, 3f)),
      (4L, Seq[java.lang.Float](1f, null, 3f, 4f)),
      (5L, Seq[java.lang.Float](Float.NaN, 1f, 2f, 3f)),
      (6L, Seq[java.lang.Float](Float.PositiveInfinity,
        Float.PositiveInfinity, 0f, 0f)))
      .toDF("id", "embedding")
    def check(): Unit = {
      val rows = df.select(col("id"),
        VectorFunctions.pq_assign(col("embedding"), cb, 2).as("pq"))
        .select(col("id"), col("pq.codes"), col("pq.max_err"), col("pq.qv"),
          col("pq.packed"))
        .collect().map(r => r.getLong(0) -> r).toMap
      assert(rows(1L).getString(1) == "1,0")
      assert(rows(1L).getDouble(2) == 1.0)
      assert(rows(1L).getSeq[Double](3) == Seq(10.0, 10.0, 0.0, 0.0))
      // codes "1,0" pack 4 bits per subspace: 1 | (0 << 4) = 1
      assert(rows(1L).getLong(4) == 1L)
      assert(rows(2L).getString(1) == "0,0", "equidistant tie -> smallest code")
      assert(rows(2L).getLong(4) == 0L)
      assert(rows(3L).isNullAt(1), "wrong dims must be null, not an exception")
      assert(rows(4L).isNullAt(1), "null element must be null, not garbage")
      // NaN / all-Infinity distances compare false against every bound —
      // no argmin exists; must be null, not an AIOOBE on cells(-1)
      assert(rows(5L).isNullAt(1), "NaN element must be null, not a crash")
      assert(rows(6L).isNullAt(1), "all-Inf subvector must be null, not a crash")
    }
    check() // codegen path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try check() finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("pq_packed_cosine equals cosine over the decoded vectors bit-for-bit") {
    import spark.implicits._
    // deterministic random codebook + codes; equivalence target is the
    // decoded-then-cosine formulation the expression replaces
    val rng = new scala.util.Random(42)
    val PqM = 16; val PqK = 16; val PqS = 4
    val cb: Array[Array[Array[Double]]] = Array.fill(PqM)(
      Array.fill(PqK)(Array.fill(PqS)(rng.nextGaussian())))
    def pack(codes: Array[Int]): Long =
      codes.zipWithIndex.map { case (c, m) => c.toLong << (4 * m) }
        .foldLeft(0L)(_ | _)
    def decode(packed: Long): Seq[Double] =
      (0 until PqM).flatMap(m => cb(m)(((packed >>> (4 * m)) & 15L).toInt))
    val pairs = (1 to 500).map { i =>
      val a = pack(Array.fill(PqM)(rng.nextInt(PqK)))
      val b = pack(Array.fill(PqM)(rng.nextInt(PqK)))
      (i.toLong, a, b)
    }
    val df = pairs.toDF("id", "a", "b")
    def check(): Unit = {
      val got = df.select(col("id"),
        VectorFunctions.pq_packed_cosine(col("a"), col("b"), cb).as("c"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      pairs.foreach { case (id, a, b) =>
        val av = decode(a); val bv = decode(b)
        var dot = 0.0; var na = 0.0; var nb = 0.0
        (0 until PqM * PqS).foreach { i =>
          dot += av(i) * bv(i); na += av(i) * av(i); nb += bv(i) * bv(i)
        }
        val want = dot / (math.sqrt(na) * math.sqrt(nb))
        assert(java.lang.Double.doubleToLongBits(got(id)) ==
          java.lang.Double.doubleToLongBits(want), s"pair $id")
      }
    }
    check() // codegen path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try check() finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // a nibble addressing a missing centroid -> null, not an AIOOBE
    val ragged: Array[Array[Array[Double]]] = Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val bad = Seq((1L, 5L, 0L)).toDF("id", "a", "b")
      .select(VectorFunctions.pq_packed_cosine(col("a"), col("b"), ragged))
      .collect()
    assert(bad.head.isNullAt(0), "out-of-range code must be null")
  }

  test("pq_asymmetric_cosine equals cosine(vec, decoded) bit-for-bit") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val PqM = 16; val PqK = 16; val PqS = 4
    val cb: Array[Array[Array[Double]]] = Array.fill(PqM)(
      Array.fill(PqK)(Array.fill(PqS)(rng.nextGaussian())))
    val rows = (1 to 300).map { i =>
      val vec = Seq.fill(PqM * PqS)(rng.nextGaussian())
      val code = (0 until PqM).map(m => rng.nextInt(PqK).toLong << (4 * m))
        .foldLeft(0L)(_ | _)
      (i.toLong, vec, code)
    }
    val df = rows.toDF("id", "vec", "code")
    def check(): Unit = {
      val got = df.select(col("id"),
        VectorFunctions.pq_asymmetric_cosine(col("vec"), col("code"), cb, PqS)
          .as("c"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      rows.foreach { case (id, vec, code) =>
        val dec = (0 until PqM).flatMap(m =>
          cb(m)(((code >>> (4 * m)) & 15L).toInt))
        var dot = 0.0; var na = 0.0; var nb = 0.0
        (0 until PqM * PqS).foreach { i =>
          dot += vec(i) * dec(i); na += vec(i) * vec(i); nb += dec(i) * dec(i)
        }
        val want = dot / (math.sqrt(na) * math.sqrt(nb))
        assert(java.lang.Double.doubleToLongBits(got(id)) ==
          java.lang.Double.doubleToLongBits(want), s"row $id")
      }
    }
    check() // codegen path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try check() finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // dimension mismatch -> null, not garbage
    val bad = Seq((1L, Seq(1.0, 2.0), 0L)).toDF("id", "vec", "code")
      .select(VectorFunctions.pq_asymmetric_cosine(col("vec"), col("code"), cb, PqS))
      .collect()
    assert(bad.head.isNullAt(0), "wrong dims must be null")
  }

  test("PQ expressions compare codebooks by value (subexpression reuse)") {
    // ADVICE r9: case-class equality on an Array field is reference
    // equality, so two semantically identical expression instances never
    // compared equal — defeating Catalyst subexpression elimination.
    // Build two DEEP COPIES of a codebook and assert equals + hashCode
    // agree (and disagree once a value differs).
    def cbCopy(): Array[Array[Array[Double]]] =
      Array.tabulate(2, 2, 2)((m, c, d) => m * 4.0 + c * 2.0 + d)
    val a = org.apache.spark.sql.catalyst.expressions.BoundReference(
      0, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType), nullable = true)
    val code = org.apache.spark.sql.catalyst.expressions.BoundReference(
      1, org.apache.spark.sql.types.LongType, nullable = true)
    val x = PqAsymmetricCosine(a, code, cbCopy(), 2)
    val y = PqAsymmetricCosine(a, code, cbCopy(), 2)
    assert(x == y && x.hashCode == y.hashCode)
    val zCb = cbCopy(); zCb(1)(1)(1) = 99.0
    assert(x != PqAsymmetricCosine(a, code, zCb, 2))
    val p = PqPackedCosine(code, code, cbCopy())
    val q = PqPackedCosine(code, code, cbCopy())
    assert(p == q && p.hashCode == q.hashCode)
    val fa = org.apache.spark.sql.catalyst.expressions.BoundReference(
      0, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType), nullable = true)
    val u = PqAssign(fa, cbCopy(), 2)
    val v = PqAssign(fa, cbCopy(), 2)
    assert(u == v && u.hashCode == v.hashCode)
    assert(u != PqAssign(fa, cbCopy(), 1))
  }

  test("type checking rejects non-array-of-double inputs") {
    assertThrows[org.apache.spark.sql.AnalysisException] {
      // Dataset analysis is eager — the type-check fires at select()
      graft.sources.Tables.part(spark, TestSpark.sfDir)
        .select(VectorFunctions.cosine_similarity(col("p_name"), col("p_name")))
        .collect()
    }
  }
}
