package graft.costs

/** Document-schema sizing layer — port of the reference's JSON-Schema
  * walker (`main.py:42-133`): a collection is statistics plus a schema
  * tree, and a document's size is the recursive sum of its fields with a
  * 12-byte key overhead per object property.
  *
  * The schemas the parity tests need (homework `schemas/db1.json`,
  * chapter5 `data/chapter5/schemas/DB1.json`/`DB2.json`) are plain
  * object trees, so the ADT stays minimal: object / array / primitive.
  */
sealed trait SchemaNode
final case class ObjNode(properties: Seq[(String, SchemaNode)]) extends SchemaNode
final case class ArrNode(items: SchemaNode) extends SchemaNode
/** `tpe` ∈ integer | number | string | boolean | null; `format` "date"
  * shrinks strings to 20 B (reference `main.py:42-52`). */
final case class PrimNode(tpe: String, format: Option[String] = None) extends SchemaNode

/** Homework-engine collection statistics (reference `main.py:22-35`). */
final case class DocCollectionStats(
    nbDocuments: Long,
    avgArrayLengths: Map[String, Long] = Map.empty,
    shardingKeyCardinality: Map[String, Long] = Map.empty,
    fieldCardinality: Map[String, Long] = Map.empty,
    fieldSelectivity: Map[String, Double] = Map.empty,
    shardingKey: Option[String] = None)

object DocSchema {

  /** reference `main.py:42-52` */
  def primitiveValueSize(tpe: String, format: Option[String]): Long =
    tpe.toLowerCase match {
      case "integer" | "number" => 8L
      case "string" => if (format.contains("date")) 20L else 80L
      case "boolean" | "null" => 8L
      case _ => 0L
    }

  /** reference `main.py:56-100` — 12 B key overhead per object property;
    * arrays multiply the element size by `avg_array_lengths[path]`
    * (default 1). */
  def documentSizeBytes(schema: SchemaNode, stats: DocCollectionStats,
      prefix: String = ""): Long = schema match {
    case ObjNode(props) =>
      props.foldLeft(0L) { case (acc, (name, node)) =>
        acc + 12L + documentSizeBytes(node, stats, s"$prefix$name.")
      }
    case ArrNode(items) =>
      val key = prefix.stripSuffix(".")
      val avgLen = stats.avgArrayLengths.getOrElse(key, 1L)
      avgLen * documentSizeBytes(items, stats, prefix)
    case PrimNode(tpe, format) => primitiveValueSize(tpe, format)
  }

  def collectionSizeGb(schema: SchemaNode, stats: DocCollectionStats): Double =
    (documentSizeBytes(schema, stats) * stats.nbDocuments).toDouble /
      CostConstants.BytesPerGb

  /** Resolve a dotted field path into the schema tree (reference
    * `query_simulator/aggregate.py:62-73` — arrays are stepped through
    * transparently). */
  def resolveFieldSchema(schema: SchemaNode, fieldPath: String): Option[SchemaNode] =
    fieldPath.split('.').foldLeft(Option(schema)) { (cur, part) =>
      cur.flatMap {
        case ArrNode(items) => stepInto(items, part)
        case other => stepInto(other, part)
      }
    }

  private def stepInto(node: SchemaNode, part: String): Option[SchemaNode] =
    node match {
      case ObjNode(props) => props.collectFirst { case (n, s) if n == part => s }
      case _ => None
    }

  /** Field size from schema; `(size, missing)` — unknown fields degrade to
    * 8 B with a missing flag (reference `query_simulator/aggregate.py:
    * 76-86`). */
  def fieldSizeBytes(schema: SchemaNode, stats: DocCollectionStats,
      fieldPath: String): (Long, Boolean) =
    resolveFieldSchema(schema, fieldPath) match {
      case None => (CostConstants.DefaultUnknownFieldSizeBytes.toLong, true)
      case Some(node) =>
        (documentSizeBytes(node, stats, prefix = s"$fieldPath."), false)
    }
}

/** reference `main.py:114-123` */
final case class DocCollectionModel(name: String, schema: SchemaNode,
    stats: DocCollectionStats) {
  def documentSizeBytes: Long = DocSchema.documentSizeBytes(schema, stats)
  def sizeGb: Double = DocSchema.collectionSizeGb(schema, stats)
}

/** The concrete schema trees the parity suite sizes — transcribed from the
  * reference's JSON Schema files (cited per value). */
object RefSchemas {
  private def obj(props: (String, SchemaNode)*) = ObjNode(props)
  private val int = PrimNode("integer")
  private val str = PrimNode("string")
  private val date = PrimNode("string", Some("date"))

  /** `schemas/db1.json` Stock */
  val db1Stock: SchemaNode = obj(
    "IDW" -> int, "IDP" -> int, "quantity" -> int, "location" -> str)

  /** `schemas/db1.json` OrderLine */
  val db1OrderLine: SchemaNode = obj(
    "IDC" -> int, "IDP" -> int, "date" -> date, "quantity" -> int,
    "deliveryDate" -> date, "comment" -> str, "grade" -> int)

  /** `data/chapter5/schemas/DB1.json` (shared by DB2 except Review) */
  val ch5Movie: SchemaNode = obj(
    "movieId" -> int, "title" -> str, "genre" -> str, "releaseDate" -> date)
  val ch5Review: SchemaNode = obj(
    "reviewId" -> int, "movieId" -> int, "userId" -> int, "rating" -> int,
    "reviewDate" -> date)
  val ch5User: SchemaNode = obj(
    "userId" -> int, "country" -> str, "signupDate" -> date)

  /** `data/chapter5/schemas/DB2.json` Review — denormalized with embedded
    * movie title/genre. */
  val ch5ReviewDb2: SchemaNode = obj(
    "reviewId" -> int, "movieId" -> int, "userId" -> int, "rating" -> int,
    "reviewDate" -> date, "movieTitle" -> str, "movieGenre" -> str)

  /** `data/chapter5/stats.json` */
  val ch5Cluster: (Long, Double) = (1000L, 0.1)
  val ch5MovieStats: DocCollectionStats = DocCollectionStats(
    nbDocuments = 100000L,
    avgArrayLengths = Map("genres" -> 2L, "reviews" -> 50L),
    shardingKeyCardinality = Map("movieId" -> 100000L),
    fieldCardinality = Map("movieId" -> 100000L, "genre" -> 20L),
    fieldSelectivity = Map("genre" -> 0.05),
    shardingKey = Some("movieId"))
  val ch5ReviewStats: DocCollectionStats = DocCollectionStats(
    nbDocuments = 10000000L,
    shardingKeyCardinality = Map("movieId" -> 100000L),
    fieldCardinality =
      Map("movieId" -> 100000L, "userId" -> 1000000L, "rating" -> 10L),
    shardingKey = Some("movieId"))
  val ch5UserStats: DocCollectionStats = DocCollectionStats(
    nbDocuments = 1000000L,
    shardingKeyCardinality = Map("userId" -> 1000000L),
    fieldCardinality = Map("userId" -> 1000000L, "country" -> 50L),
    fieldSelectivity = Map("country" -> 0.02),
    shardingKey = Some("userId"))

  /** Chapter5 database signatures → collection models. */
  def chapter5Db(db: String): Map[String, DocCollectionModel] = {
    val review = if (db == "DB2") ch5ReviewDb2 else ch5Review
    Map(
      "Movie" -> DocCollectionModel("Movie", ch5Movie, ch5MovieStats),
      "Review" -> DocCollectionModel("Review", review, ch5ReviewStats),
      "User" -> DocCollectionModel("User", ch5User, ch5UserStats))
  }
}
