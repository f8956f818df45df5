package graft.costs

/** Port of the reference's chapter5 engine (`chapter5/`): named-step
  * dataflow plans (filter / join / aggregate over prior step outputs) over
  * JSON-Schema collections, with the Movie/Review/User dataset. The
  * executable analogs are `graft.operators.Relational.ch5Q1..Q5`; this
  * layer reproduces the cost numbers (BASELINE.md: DB1 4.2549 / DB2
  * 11.1095 freq-weighted totals).
  */
object Chapter5Sim {

  /** reference `chapter5/models.py:12-39` */
  final case class PlanQuerySpec(name: String, description: String,
      frequency: Double = 1.0)

  final case class PlanStep(
      name: String,
      operatorType: String, // filter | join | aggregate
      targetCollection: Option[String] = None,
      inputRef: Option[String] = None,
      leftRef: Option[String] = None,
      rightRef: Option[String] = None,
      filterKey: Option[String] = None,
      selectivity: Option[Double] = None,
      joinKey: Option[String] = None,
      joinSelectivity: Option[Double] = None,
      groupingKeys: List[String] = Nil,
      outputFields: List[String] = Nil,
      useSharding: Boolean = true)

  final case class QueryPlan(query: PlanQuerySpec, steps: List[PlanStep])

  final case class StepResult(
      step: PlanStep,
      outputDocuments: Long,
      outputDocSizeBytes: Long,
      outputSizeGb: Double,
      cost: CostBreakdown,
      details: List[CostBreakdown],
      fieldSizes: Map[String, Long],
      notes: List[String],
      shardingKey: Option[String])

  final case class PlanResult(plan: QueryPlan, steps: List[StepResult],
      totalCost: CostBreakdown, outputDocuments: Long, outputSizeGb: Double)

  /** Either a base collection or a prior step's output. */
  private type Input = Either[DocCollectionModel, StepResult]

  /** reference `chapter5/simulator.py:96-99` */
  private def scaleDocs(count: Long, selectivity: Double): Long =
    if (count <= 0 || selectivity <= 0) 0L
    else math.max(1L, (count * selectivity).toLong)

  private def outputDocSizeBytes(fieldSizes: Seq[(String, Long)]): Long =
    fieldSizes.foldLeft(0L)((acc, fs) => acc + CostConstants.KeyOverheadBytes + fs._2)

  private def fieldSizesFromSchema(c: DocCollectionModel,
      fields: Seq[String]): (Seq[(String, Long)], List[String]) = {
    var missing = List.empty[String]
    val sizes = fields.map { f =>
      val (size, isMissing) = DocSchema.fieldSizeBytes(c.schema, c.stats, f)
      if (isMissing) missing = missing :+ f
      f -> size
    }
    (sizes, missing)
  }

  private def fieldSizesFromStep(s: StepResult,
      fields: Seq[String]): (Seq[(String, Long)], List[String]) = {
    var missing = List.empty[String]
    val sizes = fields.map { f =>
      s.fieldSizes.get(f) match {
        case Some(size) => f -> size
        case None =>
          missing = missing :+ f
          f -> CostConstants.DefaultUnknownFieldSizeBytes.toLong
      }
    }
    (sizes, missing)
  }

  /** reference `chapter5/simulator.py:61-93` — `left.` / `right.` prefixed
    * fields resolve against the corresponding join side. */
  private def resolveOutputFields(fields: Seq[String], left: Input,
      right: Option[Input]): (Seq[(String, Long)], List[String]) = {
    var missing = List.empty[String]
    val sizes = fields.map { field =>
      val (source, name) =
        if (field.startsWith("right.") && right.nonEmpty)
          (right.get, field.stripPrefix("right."))
        else if (field.startsWith("left.")) (left, field.stripPrefix("left."))
        else (left, field)
      val size = source match {
        case Left(c) =>
          val (s, isMissing) = DocSchema.fieldSizeBytes(c.schema, c.stats, name)
          if (isMissing) missing = missing :+ field
          s
        case Right(st) =>
          st.fieldSizes.get(name) match {
            case Some(s) => s
            case None =>
              missing = missing :+ field
              CostConstants.DefaultUnknownFieldSizeBytes.toLong
          }
      }
      field -> size
    }
    (sizes, missing)
  }

  /** reference `chapter5/simulator.py:102-174` */
  private def simulateFilter(step: PlanStep, input: Input,
      model: CostModel): StepResult = {
    var notes = List.empty[String]
    val fraction = CostConstants.ShardingAccessFraction
    val (baseDocs, baseSizeGb, stats) = input match {
      case Left(c) => (c.stats.nbDocuments, c.sizeGb, Some(c.stats))
      case Right(s) => (s.outputDocuments, s.outputSizeGb, None)
    }
    val selectivity = step.selectivity.getOrElse {
      stats match {
        case Some(st) => AggregateSim.estimateFilterSelectivity(st, step.filterKey)
        case None => throw new IllegalArgumentException(
          s"Filter step '${step.name}' needs explicit selectivity for intermediate input.")
      }
    }
    val targetedShard = step.useSharding && stats.nonEmpty &&
      step.filterKey.nonEmpty && step.filterKey == stats.get.shardingKey
    if (targetedShard) notes = notes :+ f"Targeted shard access x$fraction%.3f"

    val scanFraction = selectivity * (if (targetedShard) fraction else 1.0)
    val dataGb = baseSizeGb * scanFraction
    val cost = model.ioCost(s"${step.name}:filter", dataGb, notes = notes)
    val outputDocs = scaleDocs(baseDocs, selectivity)

    val (fieldSizes, missing) =
      if (step.outputFields.nonEmpty) input match {
        case Left(c) => fieldSizesFromSchema(c, step.outputFields)
        case Right(s) => fieldSizesFromStep(s, step.outputFields)
      } else (Seq.empty[(String, Long)], Nil)
    if (missing.nonEmpty)
      notes = notes :+ ("Unknown fields sized as 8B: " +
        missing.distinct.sorted.mkString(", "))
    val docSizeBytes =
      if (fieldSizes.nonEmpty) outputDocSizeBytes(fieldSizes)
      else ((baseSizeGb * CostConstants.BytesPerGb) / math.max(baseDocs, 1L)).toLong
    val outputSizeGb =
      (outputDocs * docSizeBytes).toDouble / CostConstants.BytesPerGb

    StepResult(step, outputDocs, docSizeBytes, outputSizeGb, cost, List(cost),
      fieldSizes.toMap, notes,
      if (targetedShard) step.filterKey else None)
  }

  /** reference `chapter5/simulator.py:177-240` — shuffle avoided iff the
    * join key equals both sides' sharding keys. */
  private def simulateJoin(step: PlanStep, left: Input, right: Input,
      model: CostModel): StepResult = {
    var notes = List.empty[String]
    def side(in: Input): (Long, Double, Option[String]) = in match {
      case Left(c) => (c.stats.nbDocuments, c.sizeGb, c.stats.shardingKey)
      case Right(s) => (s.outputDocuments, s.outputSizeGb, s.shardingKey)
    }
    val (leftDocs, leftSizeGb, leftShard) = side(left)
    val (rightDocs, rightSizeGb, rightShard) = side(right)

    val joinSelectivity = step.joinSelectivity.getOrElse(1.0)
    val outputDocs = scaleDocs(math.min(leftDocs, rightDocs), joinSelectivity)

    val baseScanGb = leftSizeGb + rightSizeGb
    val scanLeft = model.ioCost(s"${step.name}:scan_left", leftSizeGb)
    val scanRight = model.ioCost(s"${step.name}:scan_right", rightSizeGb)

    val aligned = step.useSharding && step.joinKey.nonEmpty &&
      step.joinKey == leftShard && step.joinKey == rightShard
    val shuffleGb = if (aligned) 0.0 else baseScanGb
    if (aligned) notes = notes :+ "Join key aligned with sharding; shuffle avoided."

    val shuffle =
      model.ioCost(s"${step.name}:shuffle", shuffleGb, useNetwork = shuffleGb > 0)
    val total = model.aggregate(s"${step.name}:total", Seq(scanLeft, scanRight, shuffle))

    val (fieldSizes, missing) =
      resolveOutputFields(step.outputFields, left, Some(right))
    if (missing.nonEmpty)
      notes = notes :+ ("Unknown fields sized as 8B: " +
        missing.distinct.sorted.mkString(", "))
    val docSizeBytes = outputDocSizeBytes(fieldSizes)
    val outputSizeGb =
      (outputDocs * docSizeBytes).toDouble / CostConstants.BytesPerGb

    StepResult(step, outputDocs, docSizeBytes, outputSizeGb, total,
      List(scanLeft, scanRight, shuffle), fieldSizes.toMap, notes,
      if (aligned) step.joinKey else None)
  }

  /** reference `chapter5/simulator.py:243-287` — delegates to the
    * homework aggregate decomposition. */
  private def simulateAggregate(step: PlanStep, collection: DocCollectionModel,
      model: CostModel): StepResult = {
    val result =
      if (step.useSharding)
        AggregateSim.aggregateWithSharding(collection, step.groupingKeys,
          step.outputFields, step.filterKey, model, step.name)
      else
        AggregateSim.aggregateWithoutSharding(collection, step.groupingKeys,
          step.outputFields, step.filterKey, model, step.name)

    val (fieldSizes, missing) = fieldSizesFromSchema(collection, result.outputFields)
    var notes = result.notes
    if (missing.nonEmpty)
      notes = notes :+ ("Unknown fields sized as 8B: " +
        missing.distinct.sorted.mkString(", "))
    val docSizeBytes =
      if (result.outputDocuments > 0)
        (result.outputSizeGb * CostConstants.BytesPerGb / result.outputDocuments).toLong
      else 0L

    StepResult(step, result.outputDocuments, docSizeBytes, result.outputSizeGb,
      result.totalCost, List(result.mapCost, result.shuffleCost, result.reduceCost),
      fieldSizes.toMap, notes,
      if (step.groupingKeys.length == 1) Some(step.groupingKeys.head) else None)
  }

  /** reference `chapter5/simulator.py:290-347` — sequential step loop;
    * results stored by name so later steps consume prior outputs. */
  def simulatePlan(plan: QueryPlan, db: Map[String, DocCollectionModel],
      model: CostModel = CostModel()): PlanResult = {
    var stepResults = Map.empty[String, StepResult]
    var results = List.empty[StepResult]

    def resolve(ref: String): Input =
      stepResults.get(ref).map(Right(_))
        .orElse(db.get(ref).map(Left(_)))
        .getOrElse(throw new IllegalArgumentException(s"Unknown input reference: $ref"))

    plan.steps.foreach { step =>
      val result = step.operatorType match {
        case "filter" =>
          val ref = step.inputRef.orElse(step.targetCollection).getOrElse(
            throw new IllegalArgumentException(s"Filter step '${step.name}' missing input reference."))
          simulateFilter(step, resolve(ref), model)
        case "join" =>
          val l = step.leftRef.getOrElse(
            throw new IllegalArgumentException(s"Join step '${step.name}' missing inputs."))
          val r = step.rightRef.getOrElse(
            throw new IllegalArgumentException(s"Join step '${step.name}' missing inputs."))
          simulateJoin(step, resolve(l), resolve(r), model)
        case "aggregate" =>
          val ref = step.inputRef.orElse(step.targetCollection).getOrElse(
            throw new IllegalArgumentException(s"Aggregate step '${step.name}' missing input reference."))
          resolve(ref) match {
            case Left(c) => simulateAggregate(step, c, model)
            case Right(_) => throw new IllegalArgumentException(
              s"Aggregate step '${step.name}' only supports base collections.")
          }
        case other =>
          throw new IllegalArgumentException(s"Unsupported operator: $other")
      }
      stepResults += step.name -> result
      results = results :+ result
    }

    val total =
      if (results.nonEmpty)
        model.aggregate(s"${plan.query.name}:total", results.map(_.cost))
      else model.ioCost(s"${plan.query.name}:total", 0.0)
    PlanResult(plan, results, total,
      results.lastOption.map(_.outputDocuments).getOrElse(0L),
      results.lastOption.map(_.outputSizeGb).getOrElse(0.0))
  }

  // --- the five hardcoded planners (reference `chapter5/planner.py:8-96`) --

  def buildPlan(spec: PlanQuerySpec): QueryPlan = spec.name match {
    case "Q1_movies_by_genre" => QueryPlan(spec, List(PlanStep(
      "filter_movies_by_genre", "filter", targetCollection = Some("Movie"),
      filterKey = Some("genre"),
      outputFields = List("movieId", "title", "genre"))))
    case "Q2_reviews_for_movie" => QueryPlan(spec, List(PlanStep(
      "filter_reviews_by_movie", "filter", targetCollection = Some("Review"),
      filterKey = Some("movieId"),
      outputFields = List("movieId", "userId", "rating"))))
    case "Q3_movie_review_join" => QueryPlan(spec, List(PlanStep(
      "join_movies_reviews", "join", leftRef = Some("Movie"),
      rightRef = Some("Review"), joinKey = Some("movieId"),
      joinSelectivity = Some(1.0),
      outputFields = List("left.movieId", "left.title", "right.rating"))))
    case "Q4_avg_rating_by_movie" => QueryPlan(spec, List(PlanStep(
      "aggregate_reviews_by_movie", "aggregate",
      targetCollection = Some("Review"), groupingKeys = List("movieId"),
      outputFields = List("movieId", "avg_rating"))))
    case "Q5_top_movies_with_titles" => QueryPlan(spec, List(
      PlanStep("aggregate_reviews_for_titles", "aggregate",
        targetCollection = Some("Review"), groupingKeys = List("movieId"),
        outputFields = List("movieId", "avg_rating")),
      PlanStep("join_ratings_with_titles", "join",
        leftRef = Some("aggregate_reviews_for_titles"), rightRef = Some("Movie"),
        joinKey = Some("movieId"), joinSelectivity = Some(1.0),
        outputFields = List("left.movieId", "left.avg_rating", "right.title"))))
    case other =>
      throw new IllegalArgumentException(s"No planner available for query: $other")
  }

  /** `data/chapter5/queries.json` */
  val defaultSpecs: List[PlanQuerySpec] = List(
    PlanQuerySpec("Q1_movies_by_genre", "Filter movies by a specific genre.", 5.0),
    PlanQuerySpec("Q2_reviews_for_movie", "Fetch reviews for a target movie.", 10.0),
    PlanQuerySpec("Q3_movie_review_join", "Join movies with their reviews.", 2.0),
    PlanQuerySpec("Q4_avg_rating_by_movie", "Aggregate average rating per movie.", 1.0),
    PlanQuerySpec("Q5_top_movies_with_titles",
      "Aggregate ratings then join with movie titles.", 1.0))

  /** Frequency-weighted per-DB total (reference `chapter5/run.py:23-36,
    * 80-110`). Returns (per-query results, weighted total). */
  def runDb(db: String, model: CostModel = CostModel())
      : (List[(String, PlanResult)], CostBreakdown) = {
    val dbModel = RefSchemas.chapter5Db(db)
    val perQuery = defaultSpecs.map { spec =>
      spec.name -> simulatePlan(buildPlan(spec), dbModel, model)
    }
    val weighted = perQuery.map { case (_, r) =>
      model.scale(r.totalCost, r.plan.query.frequency)
    }
    (perQuery, model.aggregate(s"$db:total", weighted))
  }
}
