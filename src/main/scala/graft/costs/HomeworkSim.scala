package graft.costs

/** Port of the reference's homework engine (`query_simulator/`): Q1–Q5
  * query cost estimation from hand-declared specs over constant collection
  * sizes. Every constant and formula is cited; the parity spec asserts the
  * exact doubles the reference CLI prints (BASELINE.md).
  */
object HomeworkSim {

  /** reference `query_simulator/config.py:18-33` */
  object Stats {
    val NServers = 1000L
    val NCl: Long = 10000000L // Clients
    val NProd: Long = 100000L // Products
    val NOl: Long = 4000000000L // Order Lines
    val NWa = 200L // Warehouses
    val NBrands = 5000L
    val AvgCatPerProd = 2L
    val AvgStockPerProd = 200L
    val SelQ1Stock: Double = 1.0 / (100000L * 200L).toDouble
    val SelQ2Brand: Double = 50.0 / 100000L.toDouble
    val SelQ3Date: Double = 1.0 / 365.0
  }

  /** reference `query_simulator/config.py:36-45` */
  val docSizesBytes: Map[String, Long] = Map(
    "Product" -> 800L, "Stock" -> 300L, "OrderLine" -> 500L,
    "Client" -> 700L, "Warehouse" -> 400L, "Supplier" -> 600L,
    "Category" -> 200L)

  /** reference `query_simulator/config.py:66-77` */
  val collectionCounts: Map[String, Long] = Map(
    "Product" -> Stats.NProd,
    "Stock" -> Stats.NProd * Stats.AvgStockPerProd,
    "OrderLine" -> Stats.NOl,
    "Client" -> Stats.NCl,
    "Warehouse" -> Stats.NWa,
    "Supplier" -> Stats.NWa,
    "Category" -> Stats.NProd * Stats.AvgCatPerProd)

  /** reference `query_simulator/config.py:52-53` */
  val dbSignatures: Seq[String] = Seq("DB1", "DB2", "DB3", "DB4", "DB5")
  val DefaultDbSignature: String = "DB1"

  /** GB sizes, identical for DB1–DB5; an unknown signature falls back to
    * 0.0 per collection, exactly like the reference's
    * `COLLECTION_SIZES_GB.get(db_signature, {})` (reference
    * `query_simulator/config.py:80-105`) — the report then carries the
    * "collection size not found" warning note. */
  def collectionSizeGb(collection: String,
      dbSignature: String = DefaultDbSignature): Double =
    if (!dbSignatures.contains(dbSignature)) 0.0
    else (for {
      size <- docSizesBytes.get(collection)
      count <- collectionCounts.get(collection)
    } yield (size * count).toDouble / CostConstants.BytesPerGb).getOrElse(0.0)

  /** reference `query_simulator/models.py:11-31` */
  final case class QueryComponent(
      name: String,
      collection: String,
      selectivity: Double,
      description: String,
      targetedShard: Boolean = false,
      requiresNetwork: Boolean = false)

  final case class QuerySpec(
      name: String,
      kind: String, // "filter" | "join"
      description: String,
      components: List[QueryComponent],
      joinSelectivity: Option[Double] = None)

  final case class QueryCostResult(
      query: QuerySpec,
      total: CostBreakdown,
      componentCosts: Seq[(String, CostBreakdown)],
      joinOverhead: Option[CostBreakdown] = None)

  val shardingAccessFraction: Double = CostConstants.ShardingAccessFraction

  /** reference `query_simulator/costs.py:59-80` */
  def estimateComponent(model: CostModel, component: QueryComponent,
      dbSignature: String = DefaultDbSignature): CostBreakdown = {
    val baseSizeGb = collectionSizeGb(component.collection, dbSignature)
    var dataGb = baseSizeGb * component.selectivity
    var notes = List(component.description)
    if (component.targetedShard) {
      dataGb *= shardingAccessFraction
      notes = notes :+ s"Targeted shard access: x$shardingAccessFraction of the cluster"
    }
    if (baseSizeGb == 0)
      notes = notes :+ "Warning: collection size not found, using 0 GB"
    model.ioCost(component.name, dataGb, useNetwork = component.requiresNetwork,
      notes = notes)
  }

  /** reference `query_simulator/costs.py:82-121` — join queries add a
    * network overhead equal to the total scanned GB shipped across the
    * cluster. */
  def estimateQuery(query: QuerySpec,
      model: CostModel = CostModel(),
      dbSignature: String = DefaultDbSignature): QueryCostResult = {
    val componentCosts =
      query.components.map(c => c.name -> estimateComponent(model, c, dbSignature))
    query.kind match {
      case "filter" =>
        val total = model.aggregate(s"${query.name}:total", componentCosts.map(_._2))
        QueryCostResult(query, total, componentCosts)
      case "join" =>
        val baseTotal =
          model.aggregate(s"${query.name}:components", componentCosts.map(_._2))
        val joinOverhead = model.ioCost(s"${query.name}:join_network",
          baseTotal.dataScannedGb, useNetwork = true,
          notes = List("Network shuffle for join"))
        val grandTotal0 =
          model.aggregate(s"${query.name}:total", Seq(baseTotal, joinOverhead))
        // reference `costs.py:110-113` — annotate the total with the join
        // selectivity when declared
        val grandTotal = query.joinSelectivity match {
          case Some(js) => grandTotal0.copy(notes = grandTotal0.notes :+
            f"Join selectivity (result fraction): $js%.4f")
          case None => grandTotal0
        }
        QueryCostResult(query, grandTotal, componentCosts, Some(joinOverhead))
      case other => throw new IllegalArgumentException(s"Unsupported query kind: $other")
    }
  }

  /** The declared Q1–Q5 specs (reference `query_simulator/queries.py:
    * 9-125`; names/descriptions verbatim so the report sinks are
    * byte-comparable with the reference CLI's output). */
  def defaultQueries: List[QuerySpec] = List(
    QuerySpec("Q1_stock_lookup", "filter",
      "Check stock for one product in one warehouse.",
      List(QueryComponent("Stock filter", "Stock", Stats.SelQ1Stock,
        "Product + warehouse filter on stock", targetedShard = true))),
    QuerySpec("Q2_brand_filter", "filter",
      "Find Apple products by brand.",
      List(QueryComponent("Product brand filter", "Product", Stats.SelQ2Brand,
        "Brand = Apple (50 products)", requiresNetwork = true))),
    QuerySpec("Q3_orders_by_date", "filter",
      "Fetch order lines placed on a specific date.",
      List(QueryComponent("OrderLine date filter", "OrderLine", Stats.SelQ3Date,
        "Order date = target day", requiresNetwork = true))),
    QuerySpec("Q4_brand_stock_join", "join",
      "Join Apple products with their per-warehouse stock.",
      List(
        QueryComponent("Product brand filter", "Product", Stats.SelQ2Brand,
          "Brand = Apple", requiresNetwork = true),
        QueryComponent("Stock by product", "Stock", Stats.SelQ2Brand,
          "Stock entries for Apple products", targetedShard = true)),
      joinSelectivity = Some(Stats.SelQ2Brand)),
    QuerySpec("Q5_orders_brand_client_join", "join",
      "Orders on a target date joined with Apple products and client info " +
        "for downstream personalization/analytics.",
      List(
        QueryComponent("OrderLine date filter", "OrderLine", Stats.SelQ3Date,
          "Order date = target day", requiresNetwork = true),
        QueryComponent("Product brand filter", "Product", Stats.SelQ2Brand,
          "Brand = Apple", requiresNetwork = true),
        QueryComponent("Client lookup", "Client", 1.0 / Stats.NCl.toDouble,
          "Join to one client record per matching order", targetedShard = true)),
      joinSelectivity = Some(Stats.SelQ2Brand * Stats.SelQ3Date)))

  /** reference `query_simulator/runner.py:12-20` */
  def simulateQueries(model: CostModel = CostModel(),
      dbSignature: String = DefaultDbSignature): List[QueryCostResult] =
    defaultQueries.map(q => estimateQuery(q, model, dbSignature))
}
