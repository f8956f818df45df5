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

/** Bloom-filter hashing shared by the BUILD side ([[BloomPositions]])
  * and the PROBE side ([[BloomShingleFilter]]) — one definition, so the
  * two can never drift. ONE 64-bit xxHash64 draw per shingle, split into
  * the two double-hashing bases (Kirsch–Mitzenmacher: position i =
  * (h1 + i·h2) mod m); `h2 | 1` keeps the stride nonzero. Replaces the
  * previous TWO whole-string xxhash64 evaluations per probe — at sf0.1
  * the second hash alone was ~0.2 s of corpus scan. The family is not
  * oracle-visible: the bloom only prunes, exactness comes from the
  * confirm join. */
object BloomHashing {
  /** Filter size in bits (2²⁰ = 128 KiB of bitmask) and probe count.
    * Sized for ~50 k test shingles at k=5 → false-positive rate ≈ 5·10⁻⁴;
    * at a larger benchmark suite, grow bits — the broadcast stays
    * kilobytes while the exact shingle set it replaces is gigabytes. */
  val Bits = 1L << 20
  val K = 5
  val Words: Int = (Bits >> 6).toInt

  private def h1h2(s: org.apache.spark.unsafe.types.UTF8String): (Long, Long) = {
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
    (java.lang.Math.floorMod(h, Bits),
      java.lang.Math.floorMod(h >>> 21, Bits) | 1L)
  }

  /** The k bit positions of one shingle (build side). */
  def positions(s: org.apache.spark.unsafe.types.UTF8String): Array[Long] = {
    val (h1, h2) = h1h2(s)
    Array.tabulate(K)(i => (h1 + i * h2) % Bits)
  }

  /** k O(1) probes against the dense bitmask, short-circuiting on the
    * first clear bit (probe side). */
  def contains(words: Array[Long], s: org.apache.spark.unsafe.types.UTF8String): Boolean = {
    val (h1, h2) = h1h2(s)
    var i = 0
    while (i < K) {
      val p = (h1 + i * h2) % Bits
      if (((words((p >>> 6).toInt) >>> (p & 63L).toInt) & 1L) == 0L) return false
      i += 1
    }
    true
  }
}

/** Build-side positions of one shingle: k longs. */
case class BloomPositions(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_positions"

  override def nullSafeEval(input: Any): Any =
    BloomPositions.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BloomPositions.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): BloomPositions =
    copy(child = newChild)
}

object BloomPositions {
  def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData =
    new GenericArrayData(BloomHashing.positions(s))
}

/** Probe side: filter a shingle ARRAY through the bloom bitmask in one
  * JVM loop per row — the elements the filter cannot rule out (true
  * members + the ≈5·10⁻⁴ false-positive residue). Operating on the
  * array BEFORE the explode is the point: the Generate then emits only
  * survivors (∝ contamination) instead of every corpus shingle, and the
  * bitmask rides into codegen as ONE reference object (128 KiB) instead
  * of per-row literal plumbing. */
case class BloomShingleFilter(child: Expression, words: Array[Long])
    extends UnaryExpression {

  require(words.length == BloomHashing.Words,
    s"bitmask must be ${BloomHashing.Words} words, got ${words.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bloom_shingle_filter"

  override def nullSafeEval(input: Any): Any =
    BloomShingleFilter.compute(input.asInstanceOf[ArrayData], words)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BloomShingleFilter.compute($a, $wordsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomShingleFilter =
    copy(child = newChild)
}

object BloomShingleFilter {
  def compute(arr: ArrayData, words: Array[Long]): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[AnyRef](8)
    var i = 0
    while (i < n) {
      // the declared input type admits null elements; a null shingle is
      // in no set, so it is skipped rather than NPE'ing the task
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (BloomHashing.contains(words, s)) out.add(s)
      }
      i += 1
    }
    new GenericArrayData(
      out.toArray(Array.empty[AnyRef]).asInstanceOf[Array[Any]])
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

  /** Column-API entry point for [[BloomPositions]]. */
  def bloom_positions(shingle: Column): Column =
    ColumnBridge.column(BloomPositions(ColumnBridge.expression(shingle)))

  /** Column-API entry point for [[BloomShingleFilter]]. */
  def bloom_shingle_filter(shingles: Column, words: Array[Long]): Column =
    ColumnBridge.column(BloomShingleFilter(
      ColumnBridge.expression(shingles), words))
}
