package graft.costs

/** The reference's deterministic IO/network cost core, shared by all three
  * of its engines (reference `query_simulator/costs.py:17-57`,
  * `challenge/costs.py:11-37`): three metrics (time, carbon, price)
  * proportional to GB scanned, with a ×5 multiplier on anything that
  * crosses the network.
  *
  * This layer is deliberately plain Scala arithmetic, not DataFrames — the
  * parity target is bit-exact doubles against the reference's published
  * numbers (BASELINE.md), so every formula keeps the reference's exact
  * operation order and integer-truncation points.
  */
object CostConstants {
  // reference `query_simulator/config.py:44-48`, `challenge/config.py:5-22`
  val BytesPerGb: Double = 1024.0 * 1024.0 * 1024.0
  val BaseIoTimeUnit = 1.0
  val BaseIoCarbonUnit = 0.5
  val BaseIoPriceUnit = 0.1
  val NetworkMultiplier = 5.0
  val ShardingAccessFraction = 0.1
  val KeyOverheadBytes = 12
  val DefaultUnknownFieldSizeBytes = 8
  val WeightTime = 1.0
  val WeightCarbon = 1.0
  val WeightPrice = 1.0
}

/** One cost measurement (reference `query_simulator/models.py:33-43`,
  * `challenge/models.py:131-138`). */
final case class CostBreakdown(
    label: String,
    dataScannedGb: Double,
    timeCost: Double,
    carbonCost: Double,
    priceCost: Double,
    notes: List[String] = Nil)

/** Cost model applying IO-based time/carbon/price units (reference
  * `query_simulator/costs.py:17-57`, `challenge/costs.py:11-37`). */
final case class CostModel(
    baseTimeUnit: Double = CostConstants.BaseIoTimeUnit,
    baseCarbonUnit: Double = CostConstants.BaseIoCarbonUnit,
    basePriceUnit: Double = CostConstants.BaseIoPriceUnit,
    networkMultiplier: Double = CostConstants.NetworkMultiplier) {

  def ioCost(label: String, dataGb: Double, useNetwork: Boolean = false,
      notes: List[String] = Nil): CostBreakdown = {
    val multiplier = if (useNetwork) networkMultiplier else 1.0
    val noteList =
      if (useNetwork && networkMultiplier != 1.0)
        notes :+ s"Network multiplier x$networkMultiplier"
      else notes
    CostBreakdown(
      label = label,
      dataScannedGb = dataGb,
      timeCost = dataGb * baseTimeUnit * multiplier,
      carbonCost = dataGb * baseCarbonUnit * multiplier,
      priceCost = dataGb * basePriceUnit * multiplier,
      notes = noteList)
  }

  /** Left-fold sums in part order — same accumulation order as Python's
    * `sum(...)`, so repeated totals are bit-identical. */
  def aggregate(label: String, parts: Seq[CostBreakdown]): CostBreakdown =
    CostBreakdown(
      label = label,
      dataScannedGb = parts.foldLeft(0.0)(_ + _.dataScannedGb),
      timeCost = parts.foldLeft(0.0)(_ + _.timeCost),
      carbonCost = parts.foldLeft(0.0)(_ + _.carbonCost),
      priceCost = parts.foldLeft(0.0)(_ + _.priceCost),
      notes = parts.toList.flatMap(_.notes))

  def scale(cost: CostBreakdown, factor: Double): CostBreakdown =
    CostBreakdown(
      label = s"${cost.label}*$factor",
      dataScannedGb = cost.dataScannedGb * factor,
      timeCost = cost.timeCost * factor,
      carbonCost = cost.carbonCost * factor,
      priceCost = cost.priceCost * factor,
      notes = cost.notes)
}
