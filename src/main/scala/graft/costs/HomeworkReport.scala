package graft.costs

import PyFormat._

/** Report sinks for the homework engine — the reference CLI's text and
  * `--json` outputs (reference `query_simulator/runner.py:23-96`),
  * byte-compatible with a live run of `main.py --db DB1` /
  * `main.py --db DB1 --json` (golden-tested). */
object HomeworkReport {

  /** reference `runner.py:23-29` */
  def formatCost(cost: CostBreakdown, indent: String = ""): String = {
    val notes = if (cost.notes.nonEmpty) s" | ${cost.notes.mkString("; ")}" else ""
    f"$indent${cost.label}: data=${cost.dataScannedGb}%.4f GB, " +
      f"time=${cost.timeCost}%.4f, carbon=${cost.carbonCost}%.4f, " +
      f"price=${cost.priceCost}%.4f$notes"
  }

  /** reference `runner.py:32-44` */
  def formatCostResults(results: Seq[HomeworkSim.QueryCostResult]): String = {
    val lines = results.flatMap { result =>
      Seq(s"${result.query.name} — ${result.query.description}",
        formatCost(result.total, indent = "  "),
        "  components:") ++
        result.componentCosts.map { case (_, cost) =>
          formatCost(cost, indent = "    ")
        } ++
        result.joinOverhead.toSeq.flatMap(jo =>
          Seq("  join overhead:", formatCost(jo, indent = "    "))) ++
        Seq("")
    }
    lines.mkString("\n").replaceAll("\\s+$", "") // Python str.rstrip()
  }

  /** reference `runner.py:47-56` */
  def costToJson(cost: CostBreakdown): PyJson = PyObj(Seq(
    "label" -> PyStr(cost.label),
    "data_scanned_gb" -> PyNum(cost.dataScannedGb),
    "time_cost" -> PyNum(cost.timeCost),
    "carbon_cost" -> PyNum(cost.carbonCost),
    "price_cost" -> PyNum(cost.priceCost),
    "notes" -> PyArr(cost.notes.map(PyStr.apply))))

  /** reference `runner.py:59-71` */
  def resultToJson(result: HomeworkSim.QueryCostResult): PyJson = PyObj(Seq(
    "query" -> PyObj(Seq(
      "name" -> PyStr(result.query.name),
      "kind" -> PyStr(result.query.kind),
      "description" -> PyStr(result.query.description),
      "join_selectivity" ->
        result.query.joinSelectivity.map(PyNum.apply).getOrElse(PyNull))),
    "total" -> costToJson(result.total),
    "components" -> PyObj(result.componentCosts.map { case (name, cost) =>
      name -> costToJson(cost)
    }),
    "join_overhead" ->
      result.joinOverhead.map(costToJson).getOrElse(PyNull)))

  /** The `--json` output: a pretty-printed array over all queries. */
  def jsonReport(results: Seq[HomeworkSim.QueryCostResult]): String =
    dumps(PyArr(results.map(resultToJson)))

  /** Text report for a run against the given DB signature. */
  def textReport(dbSignature: String = HomeworkSim.DefaultDbSignature): String =
    formatCostResults(HomeworkSim.simulateQueries(dbSignature = dbSignature))
}
