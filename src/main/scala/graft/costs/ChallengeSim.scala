package graft.costs

import ChallengeModel._

/** Port of the reference's challenge-engine simulator
  * (`challenge/simulator.py`): per-operator scanned/output/shuffled
  * docs+bytes and IO costs, dispatched over the planner's operator types.
  * Every `int(...)` truncation and ≥1-doc clamp is preserved (reference
  * `challenge/simulator.py:53-54,96-99,214-216`).
  */
object ChallengeSim {

  /** reference `challenge/simulator.py:19-25` */
  def selectivity(collection: CollectionModel, field: String): Double =
    collection.stats.fieldSelectivity.get(field) match {
      case Some(sel) => sel
      case None =>
        collection.stats.distinctValues.get(field) match {
          case Some(d) if d > 0 => 1.0 / d.toDouble
          case _ => 1.0
        }
    }

  /** reference `challenge/simulator.py:28-39` */
  def outputDocSize(collection: CollectionModel, outputFields: List[String]): Long =
    if (outputFields.isEmpty) collection.documentSizeBytes
    else outputFields.foldLeft(0L) { (acc, field) =>
      acc + CostConstants.KeyOverheadBytes +
        collection.schema.fieldSizeBytes(field, collection.stats.avgArrayLengths)
    }

  /** reference `challenge/simulator.py:42-88` */
  def filterMetrics(operator: PlanOperator, collection: CollectionModel,
      cluster: ClusterConfig, model: CostModel): OperatorMetrics = {
    var sel = 1.0
    operator.filters.foreach(p => sel *= selectivity(collection, p.field))

    val baseDocs = collection.stats.nbDocuments
    var outputDocs = math.max(0L, (baseDocs * sel).toLong)
    if (baseDocs > 0 && sel > 0 && outputDocs == 0) outputDocs = 1L

    val shardingFraction =
      if (operator.scanStrategy.contains("shard")) cluster.shardingAccessFraction
      else 1.0
    val scannedDocs =
      if (operator.scanStrategy.contains("index")) outputDocs
      else {
        val s = math.max(0L, (baseDocs * shardingFraction).toLong)
        if (s == 0 && baseDocs > 0) 1L else s
      }

    val docSize = collection.documentSizeBytes
    val scannedBytes = scannedDocs * docSize
    val outDocSize = outputDocSize(collection, operator.outputFields)
    val outputBytes = outputDocs * outDocSize

    val dataGb = scannedBytes.toDouble / CostConstants.BytesPerGb
    val cost = model.ioCost(s"${operator.name}:filter", dataGb)

    OperatorMetrics(operator, scannedDocs, outputDocs, scannedBytes,
      outputBytes, 0L, outDocSize, cost, List(cost))
  }

  /** reference `challenge/simulator.py:91-118` */
  private def resolveOutputField(field: String, left: CollectionModel,
      right: CollectionModel): (CollectionModel, String) =
    if (field.contains('.')) {
      val Array(collection, name) = field.split("\\.", 2)
      if (collection == left.schema.name) (left, name)
      else if (collection == right.schema.name) (right, name)
      else (left, field)
    } else (left, field)

  def joinOutputSize(fields: List[String], left: CollectionModel,
      right: CollectionModel): Long =
    if (fields.isEmpty) left.documentSizeBytes + right.documentSizeBytes
    else fields.foldLeft(0L) { (acc, field) =>
      val (target, name) = resolveOutputField(field, left, right)
      acc + CostConstants.KeyOverheadBytes +
        target.schema.fieldSizeBytes(name, target.stats.avgArrayLengths)
    }

  /** reference `challenge/simulator.py:121-125` */
  def estimateJoinSelectivity(left: CollectionModel, right: CollectionModel,
      join: JoinPredicate): Double = {
    val leftCard = left.stats.distinctValues.getOrElse(join.leftField, 0L)
    val rightCard = right.stats.distinctValues.getOrElse(join.rightField, 0L)
    1.0 / math.max(math.max(leftCard, rightCard), 1L).toDouble
  }

  /** reference `challenge/simulator.py:128-141` */
  def estimateGroupCardinality(collection: CollectionModel,
      groupingKeys: List[String], inputDocs: Long): Long = {
    var total = 1L
    val it = groupingKeys.iterator
    var break = false
    while (it.hasNext && !break) {
      val key = it.next()
      val card = collection.stats.distinctValues.get(key).filter(_ > 0)
        .getOrElse(inputDocs)
      total *= card
      if (total >= inputDocs) break = true
    }
    math.max(1L, math.min(total, inputDocs))
  }

  /** reference `challenge/simulator.py:144-199` */
  def aggregateMetrics(operator: PlanOperator, collection: CollectionModel,
      cluster: ClusterConfig, model: CostModel): OperatorMetrics = {
    if (operator.groupingKeys.isEmpty)
      throw new IllegalArgumentException("Aggregate operator requires grouping keys.")

    var filterSelectivity = 1.0
    operator.filters.foreach(p => filterSelectivity *= selectivity(collection, p.field))

    val baseDocs = collection.stats.nbDocuments
    val inputDocs =
      if (baseDocs > 0) math.max(1L, (baseDocs * filterSelectivity).toLong) else 0L
    val outputDocs = estimateGroupCardinality(collection, operator.groupingKeys, inputDocs)

    val outDocSize = outputDocSize(collection,
      if (operator.outputFields.nonEmpty) operator.outputFields
      else operator.groupingKeys)
    val outputBytes = outputDocs * outDocSize

    val aligned = operator.useSharding &&
      operator.groupingKeys.contains(collection.config.shardingKey)
    val shardingFraction =
      if (aligned) cluster.shardingAccessFraction else 1.0
    val scanBytes =
      (collection.documentSizeBytes * inputDocs * shardingFraction).toLong

    val shuffleBytes = if (!aligned) outputBytes * cluster.nbServers else 0L

    val mapCost = model.ioCost(s"${operator.name}:map",
      scanBytes.toDouble / CostConstants.BytesPerGb)
    val shuffleCost = model.ioCost(s"${operator.name}:shuffle",
      shuffleBytes.toDouble / CostConstants.BytesPerGb, useNetwork = shuffleBytes > 0)
    val reduceCost = model.ioCost(s"${operator.name}:reduce",
      (shuffleBytes + outputBytes).toDouble / CostConstants.BytesPerGb)
    val total = model.aggregate(s"${operator.name}:aggregate_total",
      Seq(mapCost, shuffleCost, reduceCost))

    OperatorMetrics(operator, inputDocs, outputDocs, scanBytes + shuffleBytes,
      outputBytes, shuffleBytes, outDocSize, total,
      List(mapCost, shuffleCost, reduceCost))
  }

  /** reference `challenge/simulator.py:202-247` */
  def joinMetrics(operator: PlanOperator, leftMetrics: Option[OperatorMetrics],
      rightMetrics: Option[OperatorMetrics], left: CollectionModel,
      right: CollectionModel, model: CostModel): OperatorMetrics = {
    val leftDocs = leftMetrics.map(_.outputDocs).getOrElse(left.stats.nbDocuments)
    val rightDocs = rightMetrics.map(_.outputDocs).getOrElse(right.stats.nbDocuments)

    val joinSel = estimateJoinSelectivity(left, right, operator.join.get)
    var outputDocs = math.max(0L, (math.min(leftDocs, rightDocs) * joinSel).toLong)
    if (outputDocs == 0 && leftDocs > 0 && rightDocs > 0) outputDocs = 1L

    val leftBytes = leftMetrics.map(_.outputBytes)
      .getOrElse(leftDocs * left.documentSizeBytes)
    val rightBytes = rightMetrics.map(_.outputBytes)
      .getOrElse(rightDocs * right.documentSizeBytes)
    val scanBytes = leftBytes + rightBytes

    val shuffleBytes =
      if (operator.operatorType == "nested_loop_without_sharding") scanBytes else 0L

    val outDocSize = joinOutputSize(operator.outputFields, left, right)
    val outputBytes = outputDocs * outDocSize

    val scanCost = model.ioCost(s"${operator.name}:join_scan",
      scanBytes.toDouble / CostConstants.BytesPerGb)
    val shuffleCost = model.ioCost(s"${operator.name}:join_shuffle",
      shuffleBytes.toDouble / CostConstants.BytesPerGb, useNetwork = shuffleBytes > 0)
    val total =
      model.aggregate(s"${operator.name}:join_total", Seq(scanCost, shuffleCost))

    OperatorMetrics(operator, leftDocs + rightDocs, outputDocs,
      scanBytes + shuffleBytes, outputBytes, shuffleBytes, outDocSize, total,
      List(scanCost, shuffleCost))
  }

  /** reference `challenge/simulator.py:250-313` — join steps look up their
    * sides' filter outputs by the `{qid}_filter_{collection}` naming
    * convention. */
  def simulatePlan(plan: QueryPlan, collections: Map[String, CollectionModel],
      cluster: ClusterConfig, model: CostModel = CostModel()): QueryResult = {
    var outputs = Map.empty[String, OperatorMetrics]
    var results = List.empty[OperatorMetrics]

    plan.operators.foreach { operator =>
      val metrics =
        if (operator.operatorType.startsWith("filter"))
          filterMetrics(operator, collections(operator.targetCollection.get),
            cluster, model)
        else if (operator.operatorType.startsWith("nested_loop")) {
          val left = collections(operator.leftCollection.get)
          val right = collections(operator.rightCollection.get)
          joinMetrics(operator,
            outputs.get(s"${plan.query.id}_filter_${left.schema.name}"),
            outputs.get(s"${plan.query.id}_filter_${right.schema.name}"),
            left, right, model)
        } else if (operator.operatorType.startsWith("aggregate"))
          aggregateMetrics(operator, collections(operator.targetCollection.get),
            cluster, model)
        else
          throw new IllegalArgumentException(
            s"Unsupported operator type: ${operator.operatorType}")
      outputs += operator.name -> metrics
      results = results :+ metrics
    }

    if (results.nonEmpty)
      QueryResult(plan, results,
        model.aggregate(s"${plan.query.id}:total", results.map(_.cost)),
        results.map(_.scannedDocs).sum,
        results.last.outputDocs,
        results.map(_.scannedBytes).sum,
        results.last.outputBytes,
        results.map(_.shuffledBytes).sum)
    else
      QueryResult(plan, Nil, model.ioCost(s"${plan.query.id}:total", 0.0),
        0L, 0L, 0L, 0L, 0L)
  }
}
