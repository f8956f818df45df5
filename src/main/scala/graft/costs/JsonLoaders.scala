package graft.costs

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import ChallengeModel._

/** JSON config loaders for the reference's on-disk formats (SURVEY §2.2
  * S1/S2) — a user of the reference can point this engine at their
  * existing `schema.json` / `stats.json` / `denormalizations.json` /
  * `queries.json` and JSON-Schema files unchanged.
  *
  * Format fidelity is tested against the reference's own files
  * (`JsonLoadersSpec` loads them and asserts equality with the inline
  * datasets used by the parity suite).
  *
  * Ported loaders: `challenge/loader.py:35-107` (flat field-spec schema,
  * stats, denormalizations, queries), `chapter5/loader.py:17-68` +
  * `main.py:12-15` (JSON Schema sets with top-level `$ref` resolution,
  * including `file.json#/Fragment` refs).
  */
object JsonLoaders {

  private val mapper = new ObjectMapper()

  private def parse(path: Path): JsonNode =
    mapper.readTree(Files.readString(path))

  // --- challenge engine (flat field specs) ---------------------------------

  /** reference `challenge/loader.py:22-32` */
  private def fieldSize(raw: JsonNode): Long =
    if (raw.has("avg_size")) raw.get("avg_size").asLong
    else raw.path("type").asText("string") match {
      case "integer" | "number" | "boolean" => 8L
      case _ => 80L
    }

  /** reference `challenge/loader.py:35-50` */
  def loadChallengeSchema(path: Path): Map[String, CollectionSchema] =
    parse(path).path("collections").properties().asScala.map { e =>
      val fields = e.getValue.path("fields").properties().asScala.map { f =>
        f.getKey -> FieldSpec(f.getKey, fieldSize(f.getValue))
      }.toSeq
      e.getKey -> CollectionSchema(e.getKey,
        e.getValue.get("primary_key").asText, fields)
    }.toMap

  /** reference `challenge/loader.py:53-77` — returns (cluster, stats,
    * query frequencies). */
  def loadChallengeStats(path: Path)
      : (ClusterConfig, Map[String, CollectionStats], Map[String, Double]) = {
    val root = parse(path)
    val cluster = ClusterConfig(
      root.path("cluster").path("nb_servers").asLong(1000L),
      root.path("cluster").path("sharding_access_fraction").asDouble(0.1))
    val stats = root.path("collections").properties().asScala.map { e =>
      val n = e.getValue
      def longMap(field: String): Map[String, Long] =
        n.path(field).properties().asScala
          .map(p => p.getKey -> p.getValue.asLong).toMap
      def doubleMap(field: String): Map[String, Double] =
        n.path(field).properties().asScala
          .map(p => p.getKey -> p.getValue.asDouble).toMap
      e.getKey -> CollectionStats(
        nbDocuments = n.get("nb_documents").asLong,
        distinctValues = longMap("distinct_values"),
        avgArrayLengths = doubleMap("avg_array_lengths"),
        fieldSelectivity = doubleMap("field_selectivity"))
    }.toMap
    val freqs = root.path("query_frequencies").properties().asScala
      .map(p => p.getKey -> p.getValue.asDouble).toMap
    (cluster, stats, freqs)
  }

  /** reference `challenge/loader.py:80-107` */
  def loadDenormalizations(path: Path): List[DenormalizationSpec] =
    parse(path).path("denormalizations").elements().asScala.map { raw =>
      val collections = raw.path("collections").properties().asScala.map { e =>
        e.getKey -> CollectionConfig(
          e.getValue.path("sharding_key").asText(""),
          e.getValue.path("indexes").elements().asScala.map(_.asText).toList)
      }.toSeq
      val embeds = raw.path("embeds").elements().asScala.map { e =>
        EmbedSpec(e.get("from").asText, e.get("to").asText,
          e.get("path").asText, e.path("cardinality").asText("one"))
      }.toList
      DenormalizationSpec(raw.get("id").asText,
        raw.path("description").asText(""), collections, embeds)
    }.toList

  /** reference `challenge/run.py:23-28` — frequency falls back to the
    * stats file's `query_frequencies`, then 1.0. */
  def loadChallengeQueries(path: Path,
      freqDefaults: Map[String, Double] = Map.empty): List[QuerySpec] =
    parse(path).path("queries").elements().asScala.map { raw =>
      val id = raw.get("id").asText
      val freq =
        if (raw.has("frequency")) raw.get("frequency").asDouble
        else freqDefaults.getOrElse(id, 1.0)
      QuerySpec(id, raw.get("sql").asText, freq)
    }.toList

  // --- JSON Schema sets (homework / chapter5) ------------------------------

  /** Parse a JSON Schema fragment into the sizing ADT. Nodes without a
    * recognized `type` (inner `$ref`, `allOf`, …) degrade to a default
    * string primitive — the same behavior as the reference's walker
    * (`main.py:56-100` treats unknown shapes as `type: "string"`). */
  def toSchemaNode(node: JsonNode): SchemaNode =
    node.path("type").asText("") match {
      case "object" =>
        ObjNode(node.path("properties").properties().asScala
          .map(e => e.getKey -> toSchemaNode(e.getValue)).toSeq)
      case "array" => ArrNode(toSchemaNode(node.path("items")))
      case "" => PrimNode("string", None)
      case tpe =>
        PrimNode(tpe,
          if (node.has("format")) Some(node.get("format").asText) else None)
    }

  /** Resolve a `$ref` of the form `file.json` or `file.json#/Fragment`
    * relative to `baseDir` (reference `chapter5/loader.py:17-23`,
    * `schemas/db2.json`-style fragment refs). */
  private def resolveRef(baseDir: Path, ref: String): JsonNode = {
    val (file, fragment) = ref.split("#", 2) match {
      case Array(f) => (f, None)
      case Array(f, frag) => (f, Some(frag))
    }
    val node = parse(baseDir.resolve(file))
    fragment match {
      case None => node
      case Some(frag) =>
        frag.stripPrefix("/").split('/').filter(_.nonEmpty)
          .foldLeft(node)((n, part) => n.path(part))
    }
  }

  /** Load a per-DB schema set `{collection: schema | {"$ref": …}}` with
    * top-level `$ref` resolution (reference `chapter5/loader.py:26-33`;
    * also the shape of the homework `schemas/db1.json`). */
  def loadSchemaSet(path: Path): Map[String, SchemaNode] = {
    val baseDir = path.getParent
    parse(path).properties().asScala.map { e =>
      val resolved =
        if (e.getValue.has("$ref")) resolveRef(baseDir, e.getValue.get("$ref").asText)
        else e.getValue
      e.getKey -> toSchemaNode(resolved)
    }.toMap
  }

  /** reference `chapter5/loader.py:36-60` */
  def loadChapter5Stats(path: Path)
      : ((Long, Double), Map[String, DocCollectionStats]) = {
    val root = parse(path)
    val cluster = (
      root.path("cluster").path("nb_servers").asLong(1000L),
      root.path("cluster").path("sharding_access_fraction").asDouble(0.1))
    val stats = root.path("collections").properties().asScala.map { e =>
      val n = e.getValue
      def longMap(field: String): Map[String, Long] =
        n.path(field).properties().asScala
          .map(p => p.getKey -> p.getValue.asLong).toMap
      e.getKey -> DocCollectionStats(
        nbDocuments = n.get("nb_documents").asLong,
        avgArrayLengths = longMap("avg_array_lengths"),
        shardingKeyCardinality = longMap("sharding_key_cardinality"),
        fieldCardinality = longMap("field_cardinality"),
        fieldSelectivity = n.path("field_selectivity").properties().asScala
          .map(p => p.getKey -> p.getValue.asDouble).toMap,
        shardingKey =
          if (n.has("sharding_key")) Some(n.get("sharding_key").asText) else None)
    }.toMap
    (cluster, stats)
  }

  def loadSchemaSet(path: String): Map[String, SchemaNode] =
    loadSchemaSet(Paths.get(path))
}
