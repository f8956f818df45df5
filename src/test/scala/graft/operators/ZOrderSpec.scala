package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The Z-order key must actually buy multi-dimensional clustering: in a
  * layout of range-partitioned files sorted by zval, a selective filter
  * on EITHER dimension touches a strict subset of files, whereas a
  * ts-sorted layout spreads every user over every file. File-touch
  * counts (via input_file_name on matching rows) are the proxy for the
  * footer-stats pruning a real reader performs. */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("z-ordered layout clusters both dimensions; minute-sorted does not") {
    val NFiles = 16
    val z = Events.zorderKey(spark, dir) // event_id, user_id, minute, zval
    val base = Files.createTempDirectory("graft_zorder")
    val zPath = base.resolve("by_z").toString
    val tPath = base.resolve("by_minute").toString
    z.repartitionByRange(NFiles, col("zval")).sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(zPath)
    z.repartitionByRange(NFiles, col("minute")).sortWithinPartitions(col("minute"))
      .write.mode("overwrite").parquet(tPath)

    def filesTouched(path: String, cond: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(cond)
        .select(input_file_name()).distinct().count()

    // a selective USER predicate: one user's rows
    val someUser = z.select(col("user_id")).head().getLong(0)
    val zUser = filesTouched(zPath, col("user_id") === someUser)
    val tUser = filesTouched(tPath, col("user_id") === someUser)
    // minute-sorted spreads a user across (nearly) all files; z-order
    // confines it to the user's z-stripes
    assert(zUser < tUser,
      s"z-order should touch fewer files for a user filter: z=$zUser t=$tUser")
    assert(tUser >= NFiles / 2, s"minute sort unexpectedly clustered users: $tUser")

    // and a narrow MINUTE band stays clustered under z-order too (not as
    // tight as the dedicated minute sort, but far below all files)
    val (mLo, mHi) = {
      val r = z.agg(min("minute"), max("minute")).head()
      (r.getLong(0), r.getLong(1))
    }
    val band = (mHi - mLo) / 32 max 1L
    val cond = col("minute").between(mLo, mLo + band)
    val zMin = filesTouched(zPath, cond)
    assert(zMin < NFiles,
      s"z-order should confine a narrow minute band: touched $zMin of $NFiles")
  }

  test("property: interleave is a bijection on edge + pseudorandom 16-bit pairs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edge = Seq(0L, 1L, 2L, 0x5555L, 0xaaaaL, 0x7fffL, 0x8000L, 0xffffL)
    val gen = Gen.zip(Gen.chooseNum(0L, 0xffffL), Gen.chooseNum(0L, 0xffffL))
    val rand = (0 until 400).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    val pairs = (for (u <- edge; t <- edge) yield (u, t)) ++ rand
    import spark.implicits._
    val out = pairs.toDF("u", "t")
      .select(col("u"), col("t"),
        Events.zInterleave(col("u"), col("t")).as("z"))
      .collect()
    assert(out.length == pairs.length)
    for (r <- out) {
      val (u, t, zv) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var uBack = 0L; var tBack = 0L
      for (i <- 0 until 16) {
        uBack |= ((zv >> (2 * i + 1)) & 1L) << i
        tBack |= ((zv >> (2 * i)) & 1L) << i
      }
      assert(uBack == u && tBack == t, s"round-trip failed at ($u, $t) -> $zv")
    }
    // distinct inputs → distinct keys (injectivity over the full domain)
    assert(out.map(_.getLong(2)).distinct.length == pairs.distinct.length)
  }

  test("zval round-trips to its two dimensions (interleave is a bijection)") {
    val rows = Events.zorderKey(spark, dir)
      .select(col("user_id"), col("minute"), col("zval"))
      .limit(500).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (u, m, zv) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var uBack = 0L; var mBack = 0L
      for (i <- 0 until 16) {
        uBack |= ((zv >> (2 * i + 1)) & 1L) << i
        mBack |= ((zv >> (2 * i)) & 1L) << i
      }
      assert(uBack == (u & 0xffffL), s"user bits mismatch at z=$zv")
      assert(mBack == (m & 0xffffL), s"minute bits mismatch at z=$zv")
    }
  }
}
