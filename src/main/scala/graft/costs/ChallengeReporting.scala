package graft.costs

import java.nio.file.{Files, Paths}

import ChallengeModel._

/** Port of the reference's reporting sinks (`challenge/reporting.py`,
  * `challenge/run.py:30-119`): leaderboard markdown, results CSV, and
  * per-query plan JSON. `leaderboardMd` is byte-compatible with the
  * reference's output (same `%.6f` formatting, same ranking key
  * price→carbon→time); the CSV keeps the reference's column order and
  * CRLF line endings.
  */
object ChallengeReporting {

  final case class ResultRow(
      denormId: String,
      queryId: String,
      operatorPlanSummary: String,
      time: Double,
      carbon: Double,
      price: Double,
      scannedDocs: Long,
      outputDocs: Long,
      scannedBytes: Long,
      returnedBytes: Long)

  final case class Totals(time: Double, carbon: Double, price: Double) {
    def weighted: Double =
      time * CostConstants.WeightTime + carbon * CostConstants.WeightCarbon +
        price * CostConstants.WeightPrice
  }

  /** reference `challenge/models.py:154-155` */
  def planSummary(operators: Seq[PlanOperator]): String =
    operators.map(_.operatorType).mkString(" -> ")

  /** reference `challenge/run.py:104-111` — rank by (price, carbon, time). */
  def ordering(totals: Map[String, Totals]): List[String] =
    totals.keys.toList.sortBy(id =>
      (totals(id).price, totals(id).carbon, totals(id).time))

  /** reference `challenge/reporting.py:25-47` */
  def leaderboardMd(totals: Map[String, Totals], order: List[String]): String = {
    val rows = order.zipWithIndex.map { case (id, i) =>
      val t = totals(id)
      f"| ${i + 1} | $id | ${t.time}%.6f | ${t.carbon}%.6f | ${t.price}%.6f | ${t.weighted}%.6f |"
    }
    (List("# Denormalization Leaderboard", "",
      "| Rank | Denorm | Time | Carbon | Price | Weighted |",
      "| --- | --- | ---: | ---: | ---: | ---: |") ++ rows ++
      List("", "Weights:",
        s"- time: ${CostConstants.WeightTime}",
        s"- carbon: ${CostConstants.WeightCarbon}",
        s"- price: ${CostConstants.WeightPrice}")).mkString("\n")
  }

  /** Python-`repr`-style shortest-round-trip double rendering so the CSV
    * numbers parse back to the identical doubles (Java's `toString` uses a
    * different exponent style; values are compared numerically in tests). */
  private[costs] def pyFloat(d: Double): String = {
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e16) {
      val l = d.toLong
      return s"$l.0"
    }
    java.lang.Double.toString(d)
  }

  /** reference `challenge/reporting.py:11-22` + `challenge/run.py:79-92`:
    * header + one row per (denorm, query), CRLF line endings. */
  def resultsCsv(rows: Seq[ResultRow]): String = {
    val header = "denorm_id,query_id,operator_plan_summary,time,carbon,price," +
      "scanned_docs,output_docs,scanned_bytes,returned_bytes"
    val lines = rows.map { r =>
      val summary =
        if (r.operatorPlanSummary.contains(",")) s"\"${r.operatorPlanSummary}\""
        else r.operatorPlanSummary
      List(r.denormId, r.queryId, summary, pyFloat(r.time), pyFloat(r.carbon),
        pyFloat(r.price), r.scannedDocs.toString, r.outputDocs.toString,
        r.scannedBytes.toString, r.returnedBytes.toString).mkString(",")
    }
    (header +: lines).map(_ + "\r\n").mkString
  }

  /** reference `challenge/reporting.py:58-98` — per-denorm plan JSON. */
  def planJson(queryId: String,
      perDenorm: Seq[(String, QueryResult)]): String = {
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    def jarr(items: Seq[String]): String = items.mkString("[", ", ", "]")
    def opJson(op: PlanOperator): String = {
      val filters = jarr(op.filters.map(p =>
        s"""{"field": ${jstr(p.field)}, "value": ${p.value.json}}"""))
      val join = op.join match {
        case None => "null"
        case Some(j) =>
          s"""{"left": ${jstr(j.leftField)}, "right": ${jstr(j.rightField)}}"""
      }
      def optStr(o: Option[String]): String = o.map(jstr).getOrElse("null")
      s"""{"name": ${jstr(op.name)}, "type": ${jstr(op.operatorType)}, """ +
        s""""target_collection": ${optStr(op.targetCollection)}, """ +
        s""""left_collection": ${optStr(op.leftCollection)}, """ +
        s""""right_collection": ${optStr(op.rightCollection)}, """ +
        s""""filters": $filters, "join": $join, """ +
        s""""grouping_keys": ${jarr(op.groupingKeys.map(jstr))}, """ +
        s""""output_fields": ${jarr(op.outputFields.map(jstr))}, """ +
        s""""scan_strategy": ${optStr(op.scanStrategy)}, """ +
        s""""indexes_used": ${jarr(op.indexesUsed.map(jstr))}}"""
    }
    def denormJson(result: QueryResult): String = {
      // required indexes per target collection, first-use order preserved
      var reqOrder = List.empty[String]
      var req = Map.empty[String, List[String]]
      result.operators.foreach { om =>
        val op = om.operator
        (op.targetCollection, op.indexesUsed) match {
          case (Some(t), idx) if idx.nonEmpty =>
            if (!req.contains(t)) { reqOrder = reqOrder :+ t; req += t -> Nil }
            idx.foreach { i =>
              if (!req(t).contains(i)) req += t -> (req(t) :+ i)
            }
          case _ => ()
        }
      }
      val reqJson = reqOrder.map(t =>
        s"${jstr(t)}: ${jarr(req(t).map(jstr))}").mkString("{", ", ", "}")
      s"""{"query_id": ${jstr(result.plan.query.id)}, """ +
        s""""sql": ${jstr(result.plan.query.sql)}, """ +
        s""""involved_collections": ${jarr(result.plan.involvedCollections.map(jstr))}, """ +
        s""""required_indexes": $reqJson, """ +
        s""""operators": ${jarr(result.operators.map(om => opJson(om.operator)))}}"""
    }
    val per = perDenorm.map { case (id, r) => s"${jstr(id)}: ${denormJson(r)}" }
      .mkString("{", ", ", "}")
    s"""{"query_id": ${jstr(queryId)}, "per_denorm": $per}"""
  }

  /** Full challenge run over the inline reference dataset — plans every
    * query under every denormalization, simulates, and returns
    * (result rows, per-denorm totals, per-query plan JSON)
    * (reference `challenge/run.py:52-119`). */
  def runAll(): (List[ResultRow], Map[String, Totals],
      Map[String, List[(String, QueryResult)]]) =
    runAll(ChallengeModel.refStats)

  /** [[runAll]] parameterized by the STATISTICS source — the closed
    * optimizer loop's last mile: the same planner + simulator + ranking
    * can be driven either by the reference's hand-written stats JSON
    * ([[ChallengeModel.refStats]]) or by statistics PROFILED from live
    * data ([[StatsCollector.profileChallenge]]), producing the full
    * leaderboard (weighted totals, ranking) from whichever source a
    * deployment has. `LiveStatsLeaderboardSpec` pins identical rankings
    * from both sources and profiled totals within tolerance of the
    * reference-stat totals. */
  def runAll(stats: Map[String, ChallengeModel.CollectionStats])
      : (List[ResultRow], Map[String, Totals],
        Map[String, List[(String, QueryResult)]]) = {
    val model = CostModel()
    var rows = List.empty[ResultRow]
    var totals = Map.empty[String, Totals]
    var plans = Map.empty[String, List[(String, QueryResult)]]
    ChallengeModel.refDenorms.foreach { denorm =>
      val models = ChallengeModel.buildDatabaseModels(
        ChallengeModel.refSchemas, stats, denorm)
      val embeds = ChallengeModel.collectEmbedPaths(denorm)
      ChallengeModel.refQueries.foreach { query =>
        val plan = ChallengePlanner.planQuery(query, models, embeds)
        val result = ChallengeSim.simulatePlan(plan, models,
          ChallengeModel.refCluster, model)
        plans += query.id ->
          (plans.getOrElse(query.id, Nil) :+ (denorm.id -> result))
        val prev = totals.getOrElse(denorm.id, Totals(0.0, 0.0, 0.0))
        totals += denorm.id -> Totals(
          prev.time + result.totalCost.timeCost * query.frequency,
          prev.carbon + result.totalCost.carbonCost * query.frequency,
          prev.price + result.totalCost.priceCost * query.frequency)
        rows = rows :+ ResultRow(denorm.id, query.id,
          planSummary(result.operators.map(_.operator)),
          result.totalCost.timeCost, result.totalCost.carbonCost,
          result.totalCost.priceCost, result.scannedDocs, result.outputDocs,
          result.scannedBytes, result.outputBytes)
      }
    }
    (rows, totals, plans)
  }

  /** Artifact writer main: `runMain graft.costs.ChallengeRun <outDir>`
    * writes leaderboard.md, results.csv and plans/<q>.plan.json —
    * the reference's `python -m challenge.run --out` surface. */
  def writeArtifacts(outDir: String): Unit = {
    val (rows, totals, plans) = runAll()
    val out = Paths.get(outDir)
    Files.createDirectories(out.resolve("plans"))
    Files.writeString(out.resolve("leaderboard.md"),
      leaderboardMd(totals, ordering(totals)))
    Files.writeString(out.resolve("results.csv"), resultsCsv(rows))
    plans.foreach { case (queryId, perDenorm) =>
      val stub =
        if (queryId.toUpperCase.startsWith("Q") && queryId.drop(1).forall(_.isDigit))
          s"query${queryId.drop(1)}"
        else queryId.toLowerCase
      Files.writeString(out.resolve(s"plans/$stub.plan.json"),
        planJson(queryId, perDenorm))
    }
  }
}

object ChallengeRun {
  def main(args: Array[String]): Unit =
    ChallengeReporting.writeArtifacts(
      args.headOption.getOrElse("target/challenge_out"))
}

/** `runMain graft.costs.HomeworkRun [--db SIG] [--json]` — the reference's
  * `main.py --db DB1 [--json]` stdout surface (argparse at
  * `query_simulator/runner.py:74-96`: `--db` defaults to DB1 and accepts
  * any string — DB1–DB5 share one sizing table, an unknown signature
  * falls back to 0-GB collections with a warning note in every row). */
object HomeworkRun {
  def main(args: Array[String]): Unit = {
    val db = args.sliding(2).collectFirst {
      case Array("--db", sig) => sig
    }.getOrElse(HomeworkSim.DefaultDbSignature)
    if (args.contains("--json"))
      println(HomeworkReport.jsonReport(
        HomeworkSim.simulateQueries(dbSignature = db)))
    else println(HomeworkReport.textReport(db))
  }
}

/** `runMain graft.costs.Chapter5Run [DB…]` — the reference's
  * `python -m chapter5 --dbs DB1 DB2` stdout surface. */
object Chapter5Run {
  def main(args: Array[String]): Unit =
    print(Chapter5Report.fullReport(
      if (args.nonEmpty) args.toSeq else Seq("DB1", "DB2")))
}
