package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Scalar (per-row) forms of the MinHash / SimHash sketches.
  *
  * A document's signature depends ONLY on its own shingle set — there is
  * no cross-row state — so the dedup pipeline does not need the
  * explode → shuffle → aggregate detour at all: these expressions fold
  * the band hashes in one tight JVM pass over the row's shingle array,
  * turning the signature build into a narrow scan-side projection
  * (embarrassingly parallel at 100 TB; the only remaining shuffle in the
  * LSH dedups is the banded candidate self-join). The
  * `TypedImperativeAggregate` forms ([[MinHashSketch]]/[[SimHashSketch]])
  * remain for genuinely grouped shapes (features arriving as rows — e.g.
  * a streaming accumulation) and the SQL function surface; both paths
  * share the same hashing internals ([[SketchHashing]]), and
  * `SketchAggregatesSpec` pins scalar ≡ aggregate on the same input.
  */

/** Shared hash internals: the splitmix64-style per-slot mixer and band
  * fold of the MinHash sketch, and the Carter–Wegman bit hashes + band
  * packing of SimHash (the latter replayed by the DuckDB oracle). */
object SketchHashing {
  /** Per-slot MinHash family: splitmix64 finalizer over
    * `h XOR (golden-ratio · (slot+1))` — public-domain constants. */
  def mix(slot: Int, h: Long): Long = {
    var x = h ^ (0x9E3779B97F4A7C15L * (slot + 1))
    x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
    x ^= x >>> 27; x *= 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Fold a signature's band hashes: band b covers slots
    * [b·r, (b+1)·r), r = numHashes/numBands, folded through the same
    * finalizer seeded by the band index. */
  def bandHashes(sig: Array[Long], numHashes: Int, numBands: Int): Array[Long] = {
    val r = numHashes / numBands
    val bands = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var h = 0x9E3779B97F4A7C15L * (b + 1)
      var j = 0
      while (j < r) {
        var x = h ^ sig(b * r + j)
        x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
        x ^= x >>> 27; x *= 0x94D049BB133111EBL
        h = x ^ (x >>> 31)
        j += 1
      }
      bands(b) = h
      b += 1
    }
    bands
  }

  // Carter–Wegman affine family over the Karp–Rabin polynomial hash —
  // identical constants to the DuckDB oracle's replay.
  val M = 1000000007L
  val HalfM: Long = (M + 1) / 2
  val SimA: Array[Long] = Array.tabulate(64)(i => (1103515245L * i + 12345L) % M)
  val SimB: Array[Long] = Array.tabulate(64)(i => (1103515245L * (i + 64) + 12345L) % M)

  /** Accumulate one feature's 64 ±1 votes. */
  def simVote(votes: Array[Int], p: Long): Unit = {
    var i = 0
    while (i < 64) {
      if ((p * SimA(i) + SimB(i)) % M >= HalfM) votes(i) += 1 else votes(i) -= 1
      i += 1
    }
  }

  /** Pack sign bits into four 16-bit bands (bit j of band k = sign of
    * vote 16k+j). */
  def packBands(votes: Array[Int]): Array[Long] = {
    val bands = new Array[Long](4)
    var k = 0
    while (k < 4) {
      var v = 0L
      var j = 0
      while (j < 16) {
        if (votes(16 * k + j) > 0) v |= (1L << j)
        j += 1
      }
      bands(k) = v
      k += 1
    }
    bands
  }
}

/** Per-row MinHash LSH band hashes of a shingle array: `numBands` longs,
  * equal between two rows exactly when the underlying signature slices
  * agree (the property the banded self-join keys on). The per-shingle
  * feature hash is xxHash64 of the string bytes (seed 42, Spark's
  * default) — the family is not oracle-visible; correctness gates on the
  * final pair set matching the brute-force Jaccard oracle. */
case class MinHashBandsOf(child: Expression, numHashes: Int, numBands: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands_of"

  override def nullSafeEval(input: Any): Any =
    MinHashBandsOf.compute(input.asInstanceOf[ArrayData], numHashes, numBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashBandsOf.compute($a, $numHashes, $numBands);")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsOf =
    copy(child = newChild)
}

object MinHashBandsOf {
  /** Static so generated code can call it: one pass over the shingles,
    * 64 mins updated per shingle, then the band fold. */
  def compute(arr: ArrayData, numHashes: Int, numBands: Int): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      var s = 0
      while (s < numHashes) {
        val m = SketchHashing.mix(s, h)
        if (m < sig(s)) sig(s) = m
        s += 1
      }
      i += 1
    }
    new GenericArrayData(SketchHashing.bandHashes(sig, numHashes, numBands))
  }
}

/** Per-row SimHash bands of a shingle array: the Karp–Rabin polynomial
  * hash of each shingle feeds the same Carter–Wegman bit hashes the
  * DuckDB oracle replays; the 64 vote signs pack into four 16-bit bands
  * — identical output to routing the shingles through
  * [[SimHashSketch]]. */
case class SimHashBandsOf(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_bands_of"

  override def nullSafeEval(input: Any): Any =
    SimHashBandsOf.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHashBandsOf.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHashBandsOf =
    copy(child = newChild)
}

object SimHashBandsOf {
  def compute(arr: ArrayData): ArrayData = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      SketchHashing.simVote(votes, PolyHash.compute(arr.getUTF8String(i)))
      i += 1
    }
    new GenericArrayData(SketchHashing.packBands(votes))
  }
}

object SketchScalarFunctions {
  /** Column-API entry point for [[MinHashBandsOf]]. */
  def minhash_bands_of(shingles: Column, numHashes: Int, numBands: Int): Column =
    ColumnBridge.column(MinHashBandsOf(
      ColumnBridge.expression(shingles), numHashes, numBands))

  /** Column-API entry point for [[SimHashBandsOf]]. */
  def simhash_bands_of(shingles: Column): Column =
    ColumnBridge.column(SimHashBandsOf(ColumnBridge.expression(shingles)))
}
