package graft.costs

/** Text report sinks for the chapter5 engine — the reference CLI's full
  * stdout (`python -m chapter5 --dbs DB1 DB2`), byte-compatible with a
  * live run (golden-tested). Ports `chapter5/reporting.py:11-88` and the
  * run loop's print sequence (`chapter5/run.py:80-110`). */
object Chapter5Report {

  import Chapter5Sim._

  /** reference `chapter5/reporting.py:12-17` */
  def formatCollectionSizes(dbName: String,
      db: Seq[(String, DocCollectionModel)]): String =
    (s"Database $dbName collections:" +:
      db.map { case (name, c) => f"  - $name: ${c.sizeGb}%.4f GB" })
      .mkString("\n")

  /** reference `chapter5/reporting.py:20-36` */
  def formatPlan(plan: QueryPlan): String =
    (s"Plan for ${plan.query.name}: ${plan.query.description}" +:
      plan.steps.map { step =>
        step.operatorType match {
          case "filter" =>
            s"  - ${step.name}: filter ${step.targetCollection.getOrElse("")} on ${step.filterKey.getOrElse("")}"
          case "join" =>
            s"  - ${step.name}: join ${step.leftRef.getOrElse("")} x ${step.rightRef.getOrElse("")} on ${step.joinKey.getOrElse("")}"
          case "aggregate" =>
            s"  - ${step.name}: aggregate ${step.targetCollection.getOrElse("")} by [${step.groupingKeys.mkString(", ")}]"
          case _ => s"  - ${step.name}"
        }
      }).mkString("\n")

  /** reference `chapter5/reporting.py:39-44` */
  def formatCost(cost: CostBreakdown, indent: String = ""): String =
    f"$indent${cost.label}: data=${cost.dataScannedGb}%.4f GB, " +
      f"time=${cost.timeCost}%.4f, carbon=${cost.carbonCost}%.4f, " +
      f"price=${cost.priceCost}%.4f"

  /** reference `chapter5/reporting.py:47-58` */
  def formatPlanResult(result: PlanResult): String = {
    val lines = List(
      f"Result for ${result.plan.query.name}: docs=${result.outputDocuments}, " +
        f"size=${result.outputSizeGb}%.4f GB",
      formatCost(result.totalCost, indent = "  "),
      "  steps:") ++
      result.steps.flatMap { step =>
        formatCost(step.cost, indent = "    ") +:
          step.details.map(formatCost(_, indent = "      "))
      }
    lines.mkString("\n")
  }

  /** reference `chapter5/reporting.py:61-71` */
  def formatLeaderboard(totals: Map[String, CostBreakdown],
      ordering: List[String]): String =
    ("Leaderboard (lower is better):" +:
      ordering.zipWithIndex.map { case (db, i) =>
        val t = totals(db)
        f"  ${i + 1}. $db: time=${t.timeCost}%.4f, " +
          f"carbon=${t.carbonCost}%.4f, price=${t.priceCost}%.4f"
      }).mkString("\n")

  /** reference `chapter5/reporting.py:74-88` */
  def comparePerQuery(perQuery: Seq[(String, Seq[(String, CostBreakdown)])],
      dbNames: Seq[String]): String =
    ("Per-query costs (time/carbon/price):" +:
      perQuery.flatMap { case (queryName, dbCosts) =>
        s"  $queryName:" +: dbNames.flatMap(db =>
          dbCosts.collectFirst { case (`db`, cost) =>
            f"    - $db: ${cost.timeCost}%.4f / " +
              f"${cost.carbonCost}%.4f / ${cost.priceCost}%.4f"
          })
      }).mkString("\n")

  /** The full CLI run over the given signatures — print sequence exactly
    * as `chapter5/run.py:80-110`. */
  def fullReport(dbs: Seq[String] = Seq("DB1", "DB2")): String = {
    val model = CostModel()
    val out = new StringBuilder
    var totals = Map.empty[String, CostBreakdown]
    var perQuery = Seq.empty[(String, Seq[(String, CostBreakdown)])]

    dbs.foreach { db =>
      // preserve the collection declaration order of the schema files
      val dbModel = Seq("Movie", "Review", "User")
        .map(c => c -> RefSchemas.chapter5Db(db)(c))
      out ++= formatCollectionSizes(db, dbModel) += '\n' += '\n'
      val weighted = defaultSpecs.map { spec =>
        val plan = buildPlan(spec)
        out ++= formatPlan(plan) += '\n'
        val result = simulatePlan(plan, dbModel.toMap, model)
        out ++= formatPlanResult(result) += '\n' += '\n'
        perQuery = perQuery.filter(_._1 != spec.name) :+ (spec.name ->
          (perQuery.collectFirst { case (n, cs) if n == spec.name => cs }
            .getOrElse(Seq.empty) :+ (db -> result.totalCost)))
        model.scale(result.totalCost, spec.frequency)
      }
      totals += db -> model.aggregate(s"$db:total", weighted)
    }

    val ordering = totals.keys.toList.sortBy(db =>
      (totals(db).priceCost, totals(db).carbonCost, totals(db).timeCost))
    out ++= comparePerQuery(perQuery, dbs) += '\n' += '\n'
    out ++= formatLeaderboard(totals, ordering) += '\n'
    out.result()
  }
}
