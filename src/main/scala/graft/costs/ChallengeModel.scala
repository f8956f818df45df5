package graft.costs

/** Port of the reference's challenge-engine data model and loader
  * (`challenge/models.py`, `challenge/loader.py`): flat field-spec
  * collection schemas, statistics, cluster config, and denormalization
  * specs whose embeds extend a target schema with `path.field` copies of
  * the source's fields (× the array length when cardinality=many).
  */
object ChallengeModel {

  /** reference `challenge/models.py:7-11` */
  final case class FieldSpec(name: String, avgSize: Long,
      arrayPath: Option[String] = None)

  /** reference `challenge/models.py:14-36` — field order preserved so doc
    * sizing iterates like the Python dict. */
  final case class CollectionSchema(name: String, primaryKey: String,
      fields: Seq[(String, FieldSpec)]) {

    def fieldSizeBytes(fieldPath: String, avgArrayLengths: Map[String, Double]): Long =
      fields.collectFirst { case (n, spec) if n == fieldPath => spec } match {
        case None => 0L
        case Some(spec) =>
          val multiplier =
            spec.arrayPath.map(p => avgArrayLengths.getOrElse(p, 1.0)).getOrElse(1.0)
          (spec.avgSize * multiplier).toLong
      }

    def documentSizeBytes(avgArrayLengths: Map[String, Double]): Long =
      fields.foldLeft(0L) { case (acc, (_, spec)) =>
        val multiplier =
          spec.arrayPath.map(p => avgArrayLengths.getOrElse(p, 1.0)).getOrElse(1.0)
        acc + (spec.avgSize * multiplier).toLong
      }
  }

  /** reference `challenge/models.py:39-44` */
  final case class CollectionStats(
      nbDocuments: Long,
      distinctValues: Map[String, Long] = Map.empty,
      avgArrayLengths: Map[String, Double] = Map.empty,
      fieldSelectivity: Map[String, Double] = Map.empty)

  /** reference `challenge/models.py:47-50` */
  final case class CollectionConfig(shardingKey: String,
      indexes: List[String] = Nil)

  /** reference `challenge/models.py:53-60` */
  final case class CollectionModel(schema: CollectionSchema,
      stats: CollectionStats, config: CollectionConfig) {
    def documentSizeBytes: Long = schema.documentSizeBytes(stats.avgArrayLengths)
  }

  /** reference `challenge/models.py:63-66` */
  final case class ClusterConfig(nbServers: Long, shardingAccessFraction: Double)

  /** reference `challenge/models.py:69-83` */
  final case class EmbedSpec(source: String, target: String, path: String,
      cardinality: String)
  final case class DenormalizationSpec(id: String, description: String,
      collections: Seq[(String, CollectionConfig)], embeds: List[EmbedSpec])

  /** Predicate literal values — quoted strings parse as strings, else int,
    * else float, else raw (reference `challenge/planner.py:36-46`). */
  sealed trait SqlValue { def json: String }
  final case class StrV(v: String) extends SqlValue {
    def json: String = "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
  }
  final case class IntV(v: Long) extends SqlValue { def json: String = v.toString }
  final case class NumV(v: Double) extends SqlValue { def json: String = v.toString }

  /** reference `challenge/models.py:86-104` */
  final case class QuerySpec(id: String, sql: String, frequency: Double = 1.0)
  final case class FilterPredicate(collection: String, field: String, value: SqlValue)
  final case class JoinPredicate(leftCollection: String, leftField: String,
      rightCollection: String, rightField: String)

  /** reference `challenge/models.py:107-127` */
  final case class PlanOperator(
      name: String,
      operatorType: String,
      targetCollection: Option[String] = None,
      leftCollection: Option[String] = None,
      rightCollection: Option[String] = None,
      filters: List[FilterPredicate] = Nil,
      join: Option[JoinPredicate] = None,
      groupingKeys: List[String] = Nil,
      outputFields: List[String] = Nil,
      scanStrategy: Option[String] = None,
      indexesUsed: List[String] = Nil,
      useSharding: Boolean = true)

  final case class QueryPlan(query: QuerySpec, operators: List[PlanOperator],
      involvedCollections: List[String])

  /** reference `challenge/models.py:140-151` */
  final case class OperatorMetrics(
      operator: PlanOperator,
      scannedDocs: Long,
      outputDocs: Long,
      scannedBytes: Long,
      outputBytes: Long,
      shuffledBytes: Long,
      outputDocSizeBytes: Long,
      cost: CostBreakdown,
      details: List[CostBreakdown] = Nil)

  final case class QueryResult(plan: QueryPlan, operators: List[OperatorMetrics],
      totalCost: CostBreakdown, scannedDocs: Long, outputDocs: Long,
      scannedBytes: Long, outputBytes: Long, shuffledBytes: Long)

  /** Extend a schema with an embed's fields under `path.field`
    * (reference `challenge/loader.py:110-128`). */
  def extendSchemaForEmbed(base: CollectionSchema, embed: CollectionSchema,
      path: String, cardinality: String): CollectionSchema = {
    val arrayPath = if (cardinality == "many") Some(path) else None
    val embedded = embed.fields.map { case (n, spec) =>
      val name = s"$path.$n"
      name -> FieldSpec(name, spec.avgSize, arrayPath)
    }
    CollectionSchema(base.name, base.primaryKey, base.fields ++ embedded)
  }

  /** reference `challenge/loader.py:131-146` */
  def extendStatsForEmbed(base: CollectionStats, embed: CollectionStats,
      path: String): CollectionStats =
    base.copy(
      distinctValues = base.distinctValues ++
        embed.distinctValues.map { case (k, v) => s"$path.$k" -> v },
      fieldSelectivity = base.fieldSelectivity ++
        embed.fieldSelectivity.map { case (k, v) => s"$path.$k" -> v })

  /** reference `challenge/loader.py:149-182` */
  def buildDatabaseModels(schemas: Map[String, CollectionSchema],
      stats: Map[String, CollectionStats],
      denorm: DenormalizationSpec): Map[String, CollectionModel] = {
    var models = denorm.collections.map { case (name, config) =>
      val schema = schemas.getOrElse(name,
        throw new IllegalArgumentException(s"Unknown collection in denormalization: $name"))
      val st = stats.getOrElse(name,
        throw new IllegalArgumentException(s"Missing stats for collection: $name"))
      val shardingKey =
        if (config.shardingKey.nonEmpty) config.shardingKey else schema.primaryKey
      name -> CollectionModel(schema, st,
        CollectionConfig(shardingKey, config.indexes))
    }.toMap
    denorm.embeds.foreach { embed =>
      models.get(embed.target).foreach { target =>
        val srcSchema = schemas.getOrElse(embed.source,
          throw new IllegalArgumentException(s"Embed source missing from schema/stats: ${embed.source}"))
        val srcStats = stats.getOrElse(embed.source,
          throw new IllegalArgumentException(s"Embed source missing from schema/stats: ${embed.source}"))
        models += embed.target -> CollectionModel(
          extendSchemaForEmbed(target.schema, srcSchema, embed.path, embed.cardinality),
          extendStatsForEmbed(target.stats, srcStats, embed.path),
          target.config)
      }
    }
    models
  }

  def collectEmbedPaths(denorm: DenormalizationSpec): Map[(String, String), EmbedSpec] =
    denorm.embeds.map(e => (e.source, e.target) -> e).toMap

  // --- the challenge dataset, transcribed from the reference's JSON --------

  /** `challenge/schema.json` */
  val refSchemas: Map[String, CollectionSchema] = Map(
    "Product" -> CollectionSchema("Product", "IDP", Seq(
      "IDP" -> FieldSpec("IDP", 8),
      "brand" -> FieldSpec("brand", 40),
      "categorie" -> FieldSpec("categorie", 40),
      "description" -> FieldSpec("description", 200),
      "price" -> FieldSpec("price", 8))),
    "OrderLine" -> CollectionSchema("OrderLine", "IDL", Seq(
      "IDL" -> FieldSpec("IDL", 8),
      "IDP" -> FieldSpec("IDP", 8),
      "IDC" -> FieldSpec("IDC", 8),
      "quantity" -> FieldSpec("quantity", 8))))

  /** `challenge/stats.json` */
  val refCluster: ClusterConfig = ClusterConfig(1000L, 0.1)
  val refStats: Map[String, CollectionStats] = Map(
    "Product" -> CollectionStats(100000L,
      distinctValues = Map("IDP" -> 100000L, "brand" -> 5000L, "categorie" -> 100L),
      avgArrayLengths = Map("orderLines" -> 40.0)),
    "OrderLine" -> CollectionStats(4000000L,
      distinctValues = Map("IDP" -> 100000L, "IDC" -> 1000000L)))

  /** `challenge/denormalizations.json` */
  val refDenorms: List[DenormalizationSpec] = List(
    DenormalizationSpec("D1", "Normalized: Product + OrderLine",
      Seq(
        "Product" -> CollectionConfig("IDP", List("brand", "categorie")),
        "OrderLine" -> CollectionConfig("IDP", List("IDC"))),
      Nil),
    DenormalizationSpec("D2", "OrderLine embeds Product",
      Seq("OrderLine" -> CollectionConfig("IDP", List("IDC", "product.brand"))),
      List(EmbedSpec("Product", "OrderLine", "product", "one"))),
    DenormalizationSpec("D3", "Product embeds OrderLine array",
      Seq("Product" -> CollectionConfig("IDP", List("brand", "categorie"))),
      List(EmbedSpec("OrderLine", "Product", "orderLines", "many"))),
    DenormalizationSpec("D4",
      "Redundant: Product embeds OrderLine and OrderLine remains",
      Seq(
        "Product" -> CollectionConfig("IDP", List("brand", "categorie")),
        "OrderLine" -> CollectionConfig("IDP", List("IDC"))),
      List(EmbedSpec("OrderLine", "Product", "orderLines", "many"))))

  /** `challenge/queries.json` */
  val refQueries: List[QuerySpec] = List(
    QuerySpec("Q1",
      "SELECT description FROM Product WHERE categorie = 'smartphone';", 1000.0),
    QuerySpec("Q2",
      "SELECT ol.quantity, p.price FROM OrderLine ol JOIN Product p ON ol.IDP = p.IDP WHERE p.brand = 'apple' AND ol.IDC = 125;",
      100.0))
}
