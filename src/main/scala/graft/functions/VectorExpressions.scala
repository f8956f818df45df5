package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns — the hot inner loop of the similarity
  * operators (SURVEY §7.5). The composable form
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)` three times over) is
  * semantically identical but materializes an intermediate array per
  * product and walks each input three times; this expression fuses dot,
  * |a|² and |b|² into ONE pass with no allocation, in both the
  * interpreted and the generated-code path.
  *
  * Numerical contract: accumulation is the same left fold in index order
  * as the HOF form (and as the DuckDB oracles' `list_reduce`), and the
  * final expression keeps the exact `dot / (sqrt(na) * sqrt(nb))` shape —
  * results are bit-identical, so swapping it into oracle-gated queries
  * changes no hashes (asserted by `VectorExpressionsSpec`).
  *
  * Degenerate-input contract (ADVICE round 5): the HOF form yields NULL
  * on mismatched lengths (`zip_with` pads with null) and on any null
  * element — these expressions do the same, instead of silently
  * truncating to the shorter vector or reading garbage. The null-element
  * guard compiles away when both inputs' array types carry
  * `containsNull = false` (the hot path: parquet-read embeddings), so
  * the tight loop is unchanged where it matters.
  */
abstract class VectorFoldExpression extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  // mismatched lengths / null elements yield null even for non-null inputs
  override def nullable: Boolean = true

  /** Do the input array TYPES admit null elements? When false the
    * per-element guards are skipped (eval) / not emitted (codegen). */
  protected lazy val elementsNullable: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    }
  }

  protected def hasNullElement(x: ArrayData, y: ArrayData, n: Int): Boolean = {
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Shared codegen prologue: null out on length mismatch, then (only if
    * the types admit it) on any null element. */
  protected def guardCode(ctx: CodegenContext, ev: ExprCode,
      a: String, b: String, n: String): String = {
    val i = ctx.freshName("gi")
    val elemGuard = if (elementsNullable)
      s"""
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) ${ev.isNull} = true;
         |}
       """.stripMargin
    else ""
    s"""
       |int $n = $a.numElements();
       |if ($n != $b.numElements()) ${ev.isNull} = true;
       |$elemGuard
     """.stripMargin
  }
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorFoldExpression {

  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    if (elementsNullable && hasNullElement(x, y, n)) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |${guardCode(ctx, ev, a, b, n)}
         |if (!${ev.isNull}) {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Native dot product over two `array<double>` columns — same left fold
  * in index order as `aggregate(zip_with(a, b, _*_), 0.0, _+_)` and the
  * DuckDB oracles' `list_reduce`, with no intermediate array. Used for the
  * LSH hyperplane projections, where the HOF form would run interpreted
  * once per (vector, plane) — at 10⁹ vectors × 20 planes that is the
  * bucket-assignment hot loop. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorFoldExpression {

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    if (elementsNullable && hasNullElement(x, y, n)) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |${guardCode(ctx, ev, a, b, n)}
         |if (!${ev.isNull}) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance — PQ's subspace metric, the same left fold in
  * index order as the HOF form `aggregate(zip_with(a, b,
  * (x,y)=>(x-y)*(x-y)), 0.0, _+_)` and DuckDB's `list_reduce`, so
  * swapping it in changes no oracle hashes. */
case class SquaredL2(left: Expression, right: Expression)
    extends VectorFoldExpression {

  override def prettyName: String = "squared_l2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    if (elementsNullable && hasNullElement(x, y, n)) return null
    var d = 0.0
    var i = 0
    while (i < n) {
      val t = x.getDouble(i) - y.getDouble(i)
      d += t * t
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      s"""
         |${guardCode(ctx, ev, a, b, n)}
         |if (!${ev.isNull}) {
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $t = $a.getDouble($i) - $b.getDouble($i);
         |    $d += $t * $t;
         |  }
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredL2 =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-API entry point for [[CosineSimilarity]]. */
  def cosine_similarity(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-API entry point for [[SquaredL2]]. */
  def squared_l2(a: Column, b: Column): Column =
    ColumnBridge.column(SquaredL2(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-API entry point for [[DotProduct]]. */
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-API entry point for [[PqAssign]]. */
  def pq_assign(embedding: Column,
      codebook: Array[Array[Array[Double]]], subDim: Int): Column =
    ColumnBridge.column(PqAssign(
      ColumnBridge.expression(embedding), codebook, subDim))

  def pq_packed_cosine(aCode: Column, bCode: Column,
      codebook: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqPackedCosine(
      ColumnBridge.expression(aCode), ColumnBridge.expression(bCode),
      codebook))

  def pq_asymmetric_cosine(vec: Column, bCode: Column,
      codebook: Array[Array[Array[Double]]], subDim: Int): Column =
    ColumnBridge.column(PqAsymmetricCosine(
      ColumnBridge.expression(vec), ColumnBridge.expression(bCode),
      codebook, subDim))

  /** Column-API entry point for [[SqAsymmetricCosine]]. */
  def sq_asymmetric_cosine(vec: Column, bCodes: Column,
      lo: Array[Double], hi: Array[Double]): Column =
    ColumnBridge.column(SqAsymmetricCosine(
      ColumnBridge.expression(vec), ColumnBridge.expression(bCodes), lo, hi))
}

/** Product-quantization assignment of a raw `array<float>` embedding
  * against trained per-subspace codebooks — the scan-side hot loop of
  * `sim_quantize_pq`/`sim_ann_ivfpq`'s PRODUCTION forms as ONE native
  * expression instead of ~1000 interpreted HOF lambda evaluations per
  * row (the same interpreted-lambda trap `graft.functions`' other
  * expressions exist for; the HOF formulation cost ~0.6 ms/row).
  *
  * Emits `struct(codes string, max_err double, qv array<double>,
  * packed bigint)`: the comma-joined per-subspace centroid indices, the
  * max per-dimension reconstruction error, the decoded
  * (concatenated-centroid) approximation, and the codes packed 4 bits
  * per subspace into one long (subspace m in bits [4m, 4m+4) — exact
  * for the ≤16-subspace / ≤16-centroid geometry; wider configs wrap and
  * must use `codes`). `packed` is the 8-byte candidate payload the
  * LSH/IVF ANN joins ship instead of a 512 B embedding.
  * Arithmetic is BIT-IDENTICAL to the HOF/oracle form:
  * floats cast to double, squared-L2 left-folded from 0.0 in dimension
  * order, first-minimum tie-break (strict `<`) = the oracle's smallest
  * code. The codebook rides into codegen as one reference object
  * (≤ 8 KiB), like [[BloomShingleFilter]]'s bitmask.
  *
  * Degenerate-input contract (same as [[VectorFoldExpression]]): a
  * wrong-dimension embedding or one with null elements yields NULL
  * rather than throwing or reading garbage — on a 100 TB scan one
  * malformed row must not kill the stage. The null-element scan is
  * skipped when the array type carries `containsNull = false` (the
  * parquet-read hot path). */
case class PqAssign(child: Expression,
    codebook: Array[Array[Array[Double]]], subDim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${other.simpleString}")
    }
  override def dataType: DataType = PqAssign.Out
  override def prettyName: String = "pq_assign"
  // wrong dims / null elements yield null even for a non-null input
  override def nullable: Boolean = true

  private lazy val elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def nullSafeEval(input: Any): Any =
    PqAssign.compute(input.asInstanceOf[ArrayData], codebook, subDim,
      elementsNullable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} =
         |  graft.functions.PqAssign.compute($a, $cbRef, $subDim, $elementsNullable);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqAssign =
    copy(child = newChild)

  // case-class equality on the Array codebook is reference equality,
  // which would defeat Catalyst subexpression elimination / plan-level
  // reuse between two semantically identical instances (ADVICE r9) —
  // compare and hash the codebook by VALUE
  override def equals(other: Any): Boolean = other match {
    case o: PqAssign => child == o.child && subDim == o.subDim &&
      java.util.Arrays.deepEquals(
        codebook.asInstanceOf[Array[AnyRef]], o.codebook.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode + subDim) +
      java.util.Arrays.deepHashCode(codebook.asInstanceOf[Array[AnyRef]])
}

object PqAssign {
  import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

  val Out: StructType = StructType(Seq(
    StructField("codes", StringType, nullable = false),
    StructField("max_err", DoubleType, nullable = false),
    StructField("qv", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("packed", LongType, nullable = false)))

  /** Static so generated code can call it; one tight pass. Returns
    * null (→ SQL NULL) on dimension mismatch or (when `checkNulls`)
    * any null element. */
  def compute(arr: ArrayData,
      cb: Array[Array[Array[Double]]], s: Int,
      checkNulls: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    val m = cb.length
    val dims = m * s
    if (arr.numElements() != dims) return null
    if (checkNulls) {
      var i = 0
      while (i < dims) {
        if (arr.isNullAt(i)) return null
        i += 1
      }
    }
    val codes = new java.lang.StringBuilder(m * 3)
    val qv = new Array[Double](m * s)
    var packed = 0L
    var maxErr = 0.0
    var mi = 0
    while (mi < m) {
      val cells = cb(mi)
      var best = -1
      var bestD = Double.PositiveInfinity
      var ki = 0
      while (ki < cells.length) {
        val cv = cells(ki)
        var d = 0.0
        var si = 0
        while (si < s) {
          val t = arr.getFloat(mi * s + si).toDouble - cv(si)
          d += t * t
          si += 1
        }
        if (d < bestD) { bestD = d; best = ki } // first min = smallest code
        ki += 1
      }
      // NaN (or all-Infinity) distances compare false against every bound,
      // leaving best = -1 — a non-finite embedding is a degenerate input
      // and yields NULL like the other malformed shapes, not an AIOOBE
      if (best < 0) return null
      if (mi > 0) codes.append(',')
      codes.append(best)
      packed |= best.toLong << (4 * mi)
      val cv = cells(best)
      var si = 0
      while (si < s) {
        val e = math.abs(arr.getFloat(mi * s + si).toDouble - cv(si))
        if (e > maxErr) maxErr = e
        qv(mi * s + si) = cv(si)
        si += 1
      }
      mi += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(codes.toString),
      maxErr,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(qv),
      packed)
  }
}

/** Symmetric-PQ approximate cosine straight from two 8-byte packed code
  * words — the prefilter metric of the near-dup confirm join
  * (`sim_neardup_lsh` / `dedup_semantic`). Semantically identical to
  * `cosine_similarity(decode(a), decode(b))` with the flat-codebook
  * decode, but with NO per-row array materialization: the first
  * formulation builds two 64-double arrays per candidate row (two
  * `flatten(array(element_at…))` chains) before the cosine pass — at
  * 10⁸ candidate rows that allocation churn dominated the whole query
  * (measured round 9: the decode-per-row prefilter ran SLOWER than the
  * unpruned confirm it replaced). This expression walks the codebook
  * reference object directly: per subspace, unpack the two 4-bit codes
  * and fold the centroid products into (dot, |a|², |b|²) in
  * concatenated-dimension order — the SAME left fold as
  * [[CosineSimilarity]] over the decoded arrays, so results are
  * bit-identical and the DuckDB oracle's decoded-cosine replay is
  * unchanged (asserted by `VectorExpressionsSpec`).
  *
  * Null contract: a code nibble addressing a non-existent centroid
  * (possible only on hostile/corrupt input — assignment emits dense
  * codes) yields NULL, not an AIOOBE. */
case class PqPackedCosine(left: Expression, right: Expression,
    codebook: Array[Array[Array[Double]]])
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint code words, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_packed_cosine"

  override def nullSafeEval(a: Any, b: Any): Any =
    PqPackedCosine.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("pqc")
      s"""
         |java.lang.Double $boxed =
         |  graft.functions.PqPackedCosine.compute($a, $b, $cbRef);
         |${ev.isNull} = $boxed == null;
         |if (!${ev.isNull}) ${ev.value} = $boxed.doubleValue();
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqPackedCosine =
    copy(left = newLeft, right = newRight)

  // value-based codebook equality/hash — see the PqAssign note (ADVICE r9)
  override def equals(other: Any): Boolean = other match {
    case o: PqPackedCosine => left == o.left && right == o.right &&
      java.util.Arrays.deepEquals(
        codebook.asInstanceOf[Array[AnyRef]], o.codebook.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * left.hashCode + right.hashCode) +
      java.util.Arrays.deepHashCode(codebook.asInstanceOf[Array[AnyRef]])
}

object PqPackedCosine {
  /** Static so generated code can call it; one tight pass, no
    * allocation. Accumulation order = concatenated-dimension left fold
    * (subspace-major, dimension-minor) — bit-identical to
    * [[CosineSimilarity]] over the decoded vectors. */
  def compute(a: Long, b: Long,
      cb: Array[Array[Array[Double]]]): java.lang.Double = {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var m = 0
    while (m < cb.length) {
      val cells = cb(m)
      val ai = ((a >>> (4 * m)) & 15L).toInt
      val bi = ((b >>> (4 * m)) & 15L).toInt
      if (ai >= cells.length || bi >= cells.length) return null
      val va = cells(ai)
      val vb = cells(bi)
      var si = 0
      while (si < va.length) {
        val xi = va(si)
        val yi = vb(si)
        dot += xi * yi
        na += xi * xi
        nb += yi * yi
        si += 1
      }
      m += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}

/** Asymmetric-PQ approximate cosine: full-precision query vector against
  * a neighbor's 8-byte packed code word — the preselect metric of the
  * LSH ANN candidate ranking (`sim_ann_lsh`). Semantically identical to
  * `cosine_similarity(a_ev, decode(b_code))` with the flat-codebook
  * decode, but walks the codebook reference object directly instead of
  * materializing a 64-double array per candidate row (the
  * `flatten(element_at…)` decode chain measured ~2.6× the whole query's
  * round-8 wall at fixture scale once the prune landed). Accumulation is
  * the concatenated-dimension left fold of [[CosineSimilarity]] — bit-
  * identical results, so the DuckDB oracle's decoded-cosine replay is
  * unchanged (`VectorExpressionsSpec`).
  *
  * Null contract: dimension mismatch, a null element (when the array
  * type admits one), or a code nibble addressing a missing centroid
  * yields NULL, never an exception. */
case class PqAsymmetricCosine(left: Expression, right: Expression,
    codebook: Array[Array[Array[Double]]], subDim: Int)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), org.apache.spark.sql.types.LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, bigint), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_asymmetric_cosine"

  private lazy val elementsNullable: Boolean = left.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    PqAsymmetricCosine.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Long], codebook, subDim, elementsNullable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("pqac")
      s"""
         |java.lang.Double $boxed =
         |  graft.functions.PqAsymmetricCosine.compute(
         |    $a, $b, $cbRef, $subDim, $elementsNullable);
         |${ev.isNull} = $boxed == null;
         |if (!${ev.isNull}) ${ev.value} = $boxed.doubleValue();
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAsymmetricCosine =
    copy(left = newLeft, right = newRight)

  // value-based codebook equality/hash — see the PqAssign note (ADVICE r9)
  override def equals(other: Any): Boolean = other match {
    case o: PqAsymmetricCosine => left == o.left && right == o.right &&
      subDim == o.subDim &&
      java.util.Arrays.deepEquals(
        codebook.asInstanceOf[Array[AnyRef]], o.codebook.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * (31 * left.hashCode + right.hashCode) + subDim) +
      java.util.Arrays.deepHashCode(codebook.asInstanceOf[Array[AnyRef]])
}

object PqAsymmetricCosine {
  /** Static so generated code can call it; one tight pass, no
    * allocation. */
  def compute(arr: ArrayData, code: Long, cb: Array[Array[Array[Double]]],
      s: Int, checkNulls: Boolean): java.lang.Double = {
    val dims = cb.length * s
    if (arr.numElements() != dims) return null
    if (checkNulls) {
      var i = 0
      while (i < dims) {
        if (arr.isNullAt(i)) return null
        i += 1
      }
    }
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var m = 0
    while (m < cb.length) {
      val cells = cb(m)
      val bi = ((code >>> (4 * m)) & 15L).toInt
      if (bi >= cells.length) return null
      val vb = cells(bi)
      var si = 0
      while (si < s) {
        val xi = arr.getDouble(m * s + si)
        val yi = vb(si)
        dot += xi * yi
        na += xi * xi
        nb += yi * yi
        si += 1
      }
      m += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}

/** Asymmetric-SQ approximate cosine: a decoded query approximation
  * against a neighbor's int8 CODE vector (array<tinyint>, codes shifted
  * by −128 into the byte range) — the preselect metric of the IVF-SQ
  * candidate ranking (`sim_ann_ivf_sq`). Semantically identical to
  * `cosine_similarity(a_qv, decode(b_codes))`, but the decode
  * (`lo[i] + ((c+128) + 0.5)/256 · (hi[i]−lo[i])` — exact integer
  * un-shift, then the same double ops in the same order as the HOF
  * decode) runs inside ONE fused codegen loop instead of materializing
  * a 64-double array per candidate row through interpreted nested
  * zip_with lambdas (which measured ~10× the whole query's wall at
  * sf0.1 when the round-10 code-shipping rewrite first landed — the
  * same interpreted-lambda trap [[PqAsymmetricCosine]] exists for).
  * Accumulation is [[CosineSimilarity]]'s single-pass fold — bit-
  * identical scores, so the DuckDB decoded-cosine replay is unchanged.
  *
  * Null contract: dimension mismatch against the stats arrays or a null
  * element yields NULL, never an exception. */
case class SqAsymmetricCosine(left: Expression, right: Expression,
    lo: Array[Double], hi: Array[Double])
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
          ArrayType(org.apache.spark.sql.types.ByteType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, array<tinyint>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_asymmetric_cosine"

  private lazy val elementsNullable: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, a), ArrayType(_, b)) => a || b
    case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SqAsymmetricCosine.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], lo, hi, elementsNullable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("sqLo", lo, "double[]")
    val hiRef = ctx.addReferenceObj("sqHi", hi, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("sqac")
      s"""
         |java.lang.Double $boxed =
         |  graft.functions.SqAsymmetricCosine.compute(
         |    $a, $b, $loRef, $hiRef, $elementsNullable);
         |${ev.isNull} = $boxed == null;
         |if (!${ev.isNull}) ${ev.value} = $boxed.doubleValue();
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SqAsymmetricCosine =
    copy(left = newLeft, right = newRight)

  // value-based stats equality/hash — see the PqAssign note (ADVICE r9)
  override def equals(other: Any): Boolean = other match {
    case o: SqAsymmetricCosine => left == o.left && right == o.right &&
      java.util.Arrays.equals(lo, o.lo) && java.util.Arrays.equals(hi, o.hi)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * (31 * left.hashCode + right.hashCode) +
      java.util.Arrays.hashCode(lo)) + java.util.Arrays.hashCode(hi)
}

object SqAsymmetricCosine {
  /** Static so generated code can call it; one tight pass, no
    * allocation. */
  def compute(a: ArrayData, b: ArrayData, lo: Array[Double],
      hi: Array[Double], checkNulls: Boolean): java.lang.Double = {
    val n = lo.length
    if (a.numElements() != n || b.numElements() != n) return null
    if (checkNulls) {
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        i += 1
      }
    }
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = a.getDouble(i)
      val l = lo(i)
      val h = hi(i)
      val yi = l + ((b.getByte(i) + 128).toDouble + 0.5) / 256.0 * (h - l)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}
