package graft.costs

/** Port of the reference's Map/Shuffle/Reduce aggregate cost decomposition
  * (`query_simulator/aggregate.py`). The executable analog lives in
  * `graft.operators.Relational` (q6/q7 — Spark's partial/final
  * HashAggregate pair ≙ map/reduce, the Exchange ≙ shuffle, elided when
  * grouping aligns with the layout); this layer reproduces the *numbers*
  * (BASELINE.md: Q6 2.8349 sharded / 25.1867 unsharded, Q7 879.2746).
  *
  * Truncation parity notes: every `int(...)` in the reference floors
  * toward zero on a positive value — ported as `.toLong` on the same
  * expression shape, with doc/byte counts kept in Long (the reference's
  * 4e9-row OrderLine overflows Int).
  */
object AggregateSim {

  final case class AggregateResult(
      label: String,
      collection: String,
      groupingKeys: List[String],
      outputFields: List[String],
      filteredKey: Option[String],
      outputDocuments: Long,
      outputSizeGb: Double,
      mapCost: CostBreakdown,
      shuffleCost: CostBreakdown,
      reduceCost: CostBreakdown,
      totalCost: CostBreakdown,
      notes: List[String])

  /** reference `aggregate.py:24-33` */
  def estimateFilterSelectivity(stats: DocCollectionStats,
      filteredKey: Option[String]): Double = filteredKey match {
    case None => 1.0
    case Some(key) =>
      stats.fieldSelectivity.get(key) match {
        case Some(sel) => sel
        case None =>
          val card = estimateKeyCardinality(stats, key)
          if (card <= 0)
            throw new IllegalArgumentException(s"Invalid cardinality for filtered key: $key")
          1.0 / card.toDouble
      }
  }

  /** reference `aggregate.py:36-42` */
  def estimateKeyCardinality(stats: DocCollectionStats, key: String): Long =
    stats.fieldCardinality.get(key)
      .orElse(stats.shardingKeyCardinality.get(key))
      .getOrElse(throw new IllegalArgumentException(s"Missing cardinality for key: $key"))

  /** reference `aggregate.py:45-59` — product of key cardinalities with an
    * early break once it reaches the input count, capped by input docs. */
  def estimateGroupCardinality(stats: DocCollectionStats,
      groupingKeys: Seq[String], inputDocuments: Long): Long = {
    if (groupingKeys.isEmpty)
      throw new IllegalArgumentException("Grouping keys are required for aggregation.")
    var total = 1L
    val it = groupingKeys.iterator
    var break = false
    while (it.hasNext && !break) {
      total *= estimateKeyCardinality(stats, it.next())
      if (total >= inputDocuments) break = true
    }
    math.max(math.min(total, inputDocuments), 0L)
  }

  final case class OutputSizing(outputDocSizeBytes: Long, missingFields: List[String])

  /** reference `aggregate.py:89-107` — 12 B key overhead per output field;
    * unknown fields sized as 8 B and flagged. */
  def estimateOutputDocSizeBytes(schema: SchemaNode, stats: DocCollectionStats,
      outputFields: Seq[String]): OutputSizing = {
    var total = 0L
    var missing = List.empty[String]
    outputFields.foreach { field =>
      val (size, isMissing) = DocSchema.fieldSizeBytes(schema, stats, field)
      total += CostConstants.KeyOverheadBytes + size
      if (isMissing) missing = missing :+ field
    }
    OutputSizing(total, missing)
  }

  /** reference `aggregate.py:110-120` — zero when grouping aligns with the
    * sharding key, else `group_card × shards_touched × partial_size`. */
  def estimateShuffleVolumeGb(groupCardinality: Long, partialDocSizeBytes: Long,
      shardsTouched: Long, alignedWithSharding: Boolean): Double =
    if (alignedWithSharding) 0.0
    else (groupCardinality * shardsTouched * partialDocSizeBytes).toDouble /
      CostConstants.BytesPerGb

  /** reference `aggregate.py:123-125` */
  def estimateReduceVolumeGb(shuffleGb: Double, outputGb: Double): Double =
    shuffleGb + outputGb

  def aggregateWithSharding(collection: DocCollectionModel,
      groupingKeys: Seq[String], outputFields: Seq[String],
      filteredKey: Option[String] = None, model: CostModel = CostModel(),
      label: String = "aggregate_with_sharding"): AggregateResult =
    aggregateImpl(collection, groupingKeys, outputFields, filteredKey, model,
      label, useSharding = true)

  def aggregateWithoutSharding(collection: DocCollectionModel,
      groupingKeys: Seq[String], outputFields: Seq[String],
      filteredKey: Option[String] = None, model: CostModel = CostModel(),
      label: String = "aggregate_without_sharding"): AggregateResult =
    aggregateImpl(collection, groupingKeys, outputFields, filteredKey, model,
      label, useSharding = false)

  /** reference `aggregate.py:166-274` */
  def aggregateImpl(collection: DocCollectionModel, groupingKeys: Seq[String],
      outputFields: Seq[String], filteredKey: Option[String],
      model: CostModel, label: String, useSharding: Boolean): AggregateResult = {
    val stats = collection.stats
    var notes = List.empty[String]
    val fraction = CostConstants.ShardingAccessFraction

    val filterSelectivity = estimateFilterSelectivity(stats, filteredKey)
    filteredKey.foreach { key =>
      notes = notes :+ f"Filter on $key (selectivity $filterSelectivity%.6f)"
    }

    val baseDocs = stats.nbDocuments
    val inputDocs =
      if (baseDocs <= 0 || filterSelectivity <= 0) 0L
      else math.max(1L, (baseDocs * filterSelectivity).toLong)

    val groupCardinality = estimateGroupCardinality(stats, groupingKeys, inputDocs)
    val outputDocuments = math.min(groupCardinality, inputDocs)

    val outputFieldsList =
      if (outputFields.nonEmpty) outputFields.toList else groupingKeys.toList
    val sizing = estimateOutputDocSizeBytes(collection.schema, stats, outputFieldsList)
    val outputDocSizeBytes = sizing.outputDocSizeBytes
    val outputSizeGb =
      (outputDocuments * outputDocSizeBytes).toDouble / CostConstants.BytesPerGb

    if (sizing.missingFields.nonEmpty)
      notes = notes :+ ("Unknown output fields sized as 8B primitives: " +
        sizing.missingFields.mkString(", "))

    val targetedShard = useSharding && stats.shardingKey.nonEmpty &&
      filteredKey == stats.shardingKey
    if (targetedShard)
      notes = notes :+ f"Targeted shard access (x$fraction%.3f of cluster)"

    var scanFraction = filterSelectivity
    if (targetedShard) scanFraction *= fraction
    val mapScanGb = collection.sizeGb * scanFraction

    val alignedWithSharding = useSharding && stats.shardingKey.nonEmpty &&
      groupingKeys.toSet == stats.shardingKey.toSet
    if (alignedWithSharding)
      notes = notes :+ "Grouping aligns with sharding key; shuffle avoided."

    val shardCount = HomeworkSim.Stats.NServers
    val shardsTouched =
      if (targetedShard) math.max(1L, (shardCount * fraction).toLong)
      else shardCount

    val shuffleGb = estimateShuffleVolumeGb(
      groupCardinality = outputDocuments,
      partialDocSizeBytes = outputDocSizeBytes,
      shardsTouched = shardsTouched,
      alignedWithSharding = alignedWithSharding)

    val reduceGb = estimateReduceVolumeGb(shuffleGb, outputSizeGb)

    val mapCost = model.ioCost(s"$label:map", mapScanGb,
      notes = List("Map scan + local grouping"))
    val shuffleCost = model.ioCost(s"$label:shuffle", shuffleGb,
      useNetwork = shuffleGb > 0, notes = List("Shuffle partial aggregates"))
    val reduceCost = model.ioCost(s"$label:reduce", reduceGb,
      notes = List("Reduce + final output write"))
    val totalCost =
      model.aggregate(s"$label:total", Seq(mapCost, shuffleCost, reduceCost))

    AggregateResult(label, collection.name, groupingKeys.toList,
      outputFieldsList, filteredKey, outputDocuments, outputSizeGb,
      mapCost, shuffleCost, reduceCost, totalCost, notes)
  }
}
