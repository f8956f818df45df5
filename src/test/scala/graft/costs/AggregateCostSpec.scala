package graft.costs

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Parity + property suite for the Map/Shuffle/Reduce aggregate cost
  * decomposition — ports the reference's `tests/test_aggregate.py`
  * assertions and pins the exact BASELINE.md numbers (Q6 2.8349 sharded /
  * 25.1867 unsharded, Q7 879.2746), golden doubles captured from a live
  * reference run this session. */
class AggregateCostSpec extends AnyFunSuite {

  /** Deterministic property sweep: 200 samples from a fixed-seed Gen. */
  private def forAllSamples[A](gen: Gen[A])(check: A => Unit): Unit =
    (0 until 200).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  // reference `tests/test_aggregate.py:17-27` — Stock stats from STATS
  private val stockStats = DocCollectionStats(
    nbDocuments = HomeworkSim.Stats.NProd * HomeworkSim.Stats.AvgStockPerProd,
    shardingKeyCardinality = Map("IDP" -> HomeworkSim.Stats.NProd),
    fieldCardinality = Map("IDP" -> HomeworkSim.Stats.NProd),
    shardingKey = Some("IDP"))
  private val stock = DocCollectionModel("Stock", RefSchemas.db1Stock, stockStats)

  // reference `tests/test_aggregate.py:46-53`
  private val orderStats = DocCollectionStats(
    nbDocuments = HomeworkSim.Stats.NOl,
    shardingKeyCardinality = Map("IDC" -> HomeworkSim.Stats.NCl),
    fieldCardinality = Map("date" -> 365L),
    shardingKey = Some("IDC"))
  private val orders = DocCollectionModel("OrderLine", RefSchemas.db1OrderLine, orderStats)

  test("Q6 with sharding: shuffle avoided, exact BASELINE numbers") {
    val r = AggregateSim.aggregateWithSharding(stock,
      Seq("IDP"), Seq("IDP", "total_quantity"))
    assert(r.totalCost.timeCost == 2.8349459171295166)
    assert(r.totalCost.carbonCost == 1.4174729585647583)
    assert(r.totalCost.priceCost == 0.28349459171295166)
    assert(r.outputDocuments == 100000L)
    assert(r.outputSizeGb == 0.003725290298461914)
    assert(r.mapCost.timeCost == 2.8312206268310547)
    assert(r.shuffleCost.timeCost == 0.0)
    assert(r.reduceCost.timeCost == 0.003725290298461914)
  }

  test("Q6 without sharding: shuffle = card × shards × partial size") {
    val r = AggregateSim.aggregateWithoutSharding(stock,
      Seq("IDP"), Seq("IDP", "total_quantity"))
    assert(r.totalCost.timeCost == 25.186687707901)
    assert(r.totalCost.carbonCost == 12.5933438539505)
    assert(r.totalCost.priceCost == 2.5186687707901)
    assert(r.mapCost.timeCost == 2.8312206268310547)
    assert(r.shuffleCost.timeCost == 18.62645149230957)
    assert(r.reduceCost.timeCost == 3.729015588760376)
  }

  test("Q7 group-by-date without sharding: 365 groups, exact total") {
    val r = AggregateSim.aggregateWithoutSharding(orders,
      Seq("date"), Seq("date", "total_quantity"))
    assert(r.outputDocuments == 365L)
    assert(r.totalCost.timeCost == 879.2745871283114)
    assert(r.shuffleCost.dataScannedGb == 0.017676502466201782)
    assert(r.mapCost.timeCost == 879.1685104370117)
    assert(r.shuffleCost.timeCost == 0.08838251233100891)
    assert(r.reduceCost.timeCost == 0.017694178968667984)
  }

  // reference `tests/test_aggregate.py:38-43` assertions, ported verbatim
  test("sharded shuffle never exceeds unsharded shuffle (reference invariant)") {
    val withShard = AggregateSim.aggregateWithSharding(stock,
      Seq("IDP"), Seq("IDP", "total_quantity"))
    val withoutShard = AggregateSim.aggregateWithoutSharding(stock,
      Seq("IDP"), Seq("IDP", "total_quantity"))
    assert(withShard.outputDocuments > 0)
    assert(withShard.outputSizeGb >= 0.0)
    assert(withShard.totalCost.timeCost >= 0.0)
    assert(withShard.shuffleCost.dataScannedGb <= withoutShard.shuffleCost.dataScannedGb)
  }

  test("unknown output fields are sized as 8B primitives with a note") {
    val r = AggregateSim.aggregateWithSharding(stock,
      Seq("IDP"), Seq("IDP", "total_quantity"))
    assert(r.notes.exists(_.contains("total_quantity")))
  }

  test("missing grouping-key cardinality is an error, empty keys are an error") {
    assertThrows[IllegalArgumentException] {
      AggregateSim.aggregateWithSharding(stock, Seq("nope"), Seq("nope"))
    }
    assertThrows[IllegalArgumentException] {
      AggregateSim.aggregateWithSharding(stock, Nil, Nil)
    }
  }

  // --- ScalaCheck properties mirroring `aggregate.py:45-59,110-125` --------

  test("property: group cardinality is capped by input docs and ≥ 0") {
    forAllSamples(Gen.zip(Gen.choose(1L, 1000000L), Gen.choose(1L, 100000000L))) {
      case (card, docs) =>
        val stats = DocCollectionStats(nbDocuments = docs,
          fieldCardinality = Map("k" -> card))
        val g = AggregateSim.estimateGroupCardinality(stats, Seq("k"), docs)
        assert(g <= docs && g >= 0 && g <= card)
    }
  }

  test("property: shuffle volume is monotone in cardinality, shards and size") {
    forAllSamples(Gen.zip(Gen.choose(1L, 100000L), Gen.choose(1L, 1000L),
        Gen.choose(1L, 10000L))) { case (card, shards, size) =>
      val base = AggregateSim.estimateShuffleVolumeGb(card, size, shards, false)
      assert(AggregateSim.estimateShuffleVolumeGb(card + 1, size, shards, false) >= base)
      assert(AggregateSim.estimateShuffleVolumeGb(card, size + 1, shards, false) >= base)
      assert(AggregateSim.estimateShuffleVolumeGb(card, size, shards + 1, false) >= base)
      assert(AggregateSim.estimateShuffleVolumeGb(card, size, shards, true) == 0.0)
    }
  }

  test("property: reduce volume = shuffle + output") {
    forAllSamples(Gen.zip(Gen.choose(0.0, 1e6), Gen.choose(0.0, 1e6))) {
      case (s, o) => assert(AggregateSim.estimateReduceVolumeGb(s, o) == s + o)
    }
  }
}
