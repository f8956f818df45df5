package graft.costs

import scala.util.matching.Regex

import ChallengeModel._

/** Port of the reference's mini-SQL parser and denormalization-aware
  * planner (`challenge/planner.py`). Grammar (SURVEY §2.3):
  * `SELECT f1, f2 FROM A [a] [JOIN B [b] ON a.x = b.y] [WHERE p [AND p]*]`
  * with equality-only predicates; anything else raises. The planner emits
  * filter/join operators, choosing a shard/index/full scan strategy per
  * filter, and rewrites a join into a single-collection filter whenever a
  * denormalization embed covers the joined collection (O11).
  */
object ChallengePlanner {

  final case class ParsedQuery(
      selectFields: List[String],
      aliasEntries: Seq[(String, String)], // insertion-ordered alias → collection
      join: Option[JoinPredicate],
      filters: List[FilterPredicate])

  private val whitespace: Regex = "\\s+".r

  /** reference `challenge/planner.py:19-22` */
  private def normalizeSql(sql: String): String =
    whitespace.replaceAllIn(sql.trim.stripSuffix(";"), " ")

  /** reference `challenge/planner.py:36-46` */
  private def parseValue(raw: String): SqlValue = {
    val v = raw.trim
    if (v.startsWith("'") && v.endsWith("'")) StrV(v.stripPrefix("'").stripSuffix("'"))
    else v.toLongOption.map(IntV.apply)
      .orElse(v.toDoubleOption.map(NumV.apply))
      .getOrElse(StrV(v))
  }

  private val filterRe: Regex = "(?:(\\w+)\\.)?(\\w+)\\s*=\\s*(.+)$".r
  private val joinRe: Regex =
    ("(?i)\\sJOIN\\s+(\\w+)(?:\\s+(\\w+))?\\s+ON\\s+" +
      "(\\w+)\\.(\\w+)\\s*=\\s*(\\w+)\\.(\\w+)").r
  private val selectRe: Regex = "(?i)SELECT\\s+(.+?)\\s+FROM\\s+(.+)".r
  private val whereRe: Regex = "(?i)\\sWHERE\\s+(.+)$".r

  /** reference `challenge/planner.py:29-49` */
  private def parseWhere(whereClause: String,
      aliasMap: Map[String, String]): List[FilterPredicate] =
    whereClause.split("(?i)\\s+AND\\s+").toList.flatMap { raw =>
      filterRe.findFirstMatchIn(raw.trim).map { m =>
        val alias = Option(m.group(1))
        val collection = alias.flatMap(aliasMap.get)
          .orElse(aliasMap.get(""))
          .getOrElse("")
        FilterPredicate(collection, m.group(2), parseValue(m.group(3)))
      }
    }

  /** reference `challenge/planner.py:71-112` */
  def parseSql(sql: String): ParsedQuery = {
    val normalized = normalizeSql(sql)
    val m = selectRe.findFirstMatchIn(normalized).filter(_.start == 0)
      .getOrElse(throw new IllegalArgumentException(s"Unsupported SQL: $sql"))
    val selectFields =
      m.group(1).split(',').toList.map(_.trim).filter(_.nonEmpty)
    var remainder = m.group(2)

    val whereClause = whereRe.findFirstMatchIn(remainder) match {
      case Some(w) =>
        remainder = remainder.substring(0, w.start)
        Some(w.group(1))
      case None => None
    }

    val joinM = joinRe.findFirstMatchIn(remainder)
    val (aliasEntries, join) = joinM match {
      case Some(j) =>
        // reference splits on the literal "JOIN" (case-sensitive) to take
        // the left side — preserved verbatim.
        val leftPart = remainder.split("JOIN", 2)(0).trim
        val leftTokens = leftPart.split(' ')
        val leftCollection = leftTokens(0)
        val leftAlias = if (leftTokens.length > 1) leftTokens(1) else leftCollection
        val rightCollection = j.group(1)
        val rightAlias = Option(j.group(2)).getOrElse(rightCollection)
        (Seq(leftAlias -> leftCollection, rightAlias -> rightCollection),
          Some(JoinPredicate(leftCollection, j.group(4), rightCollection, j.group(6))))
      case None =>
        val tokens = remainder.trim.split(' ')
        val collection = tokens(0)
        val alias = if (tokens.length > 1) tokens(1) else ""
        (Seq(alias -> collection, "" -> collection), None)
    }

    val aliasMap = aliasEntries.toMap
    val filters = whereClause.map(parseWhere(_, aliasMap)).getOrElse(Nil)
    ParsedQuery(selectFields, aliasEntries, join, filters)
  }

  /** reference `challenge/planner.py:115-124` */
  def chooseScanStrategy(filterField: Option[String], shardingKey: String,
      indexes: List[String]): String = filterField match {
    case Some(f) if f == shardingKey => "shard"
    case Some(f) if indexes.contains(f) => "index"
    case _ => "full"
  }

  private def operatorTypeForFilter(strategy: String): String =
    if (strategy == "shard") "filter_with_sharding" else "filter_without_sharding"

  private def operatorTypeForJoin(aligned: Boolean): String =
    if (aligned) "nested_loop_with_sharding" else "nested_loop_without_sharding"

  /** reference `challenge/planner.py:140-149` */
  private def normalizeSelectFields(selectFields: List[String],
      aliasMap: Map[String, String]): List[String] =
    selectFields.map { field =>
      if (field.contains('.')) {
        val Array(alias, name) = field.split("\\.", 2)
        aliasMap.get(alias).filter(_.nonEmpty) match {
          case Some(collection) => s"$collection.$name"
          case None => name
        }
      } else field
    }

  /** reference `challenge/planner.py:152-311` — the O11 join-elimination
    * rewrite: when an embed covers one side of the join, the query becomes
    * a single-collection filter with predicates and select fields
    * re-prefixed onto the embed path. */
  def planQuery(query: QuerySpec, collections: Map[String, CollectionModel],
      embeds: Map[(String, String), EmbedSpec]): QueryPlan = {
    val parsed = parseSql(query.sql)
    val aliasMap = parsed.aliasEntries.toMap
    val selectFields = normalizeSelectFields(parsed.selectFields, aliasMap)
    var filters = parsed.filters

    parsed.join match {
      case Some(join) =>
        val involved = List(join.leftCollection, join.rightCollection).sorted
        val embedLeft = embeds.get((join.leftCollection, join.rightCollection))
        val embedRight = embeds.get((join.rightCollection, join.leftCollection))

        if (embedLeft.nonEmpty || embedRight.nonEmpty) {
          val (baseCollection, prefix, prefixOwner) = embedLeft match {
            case Some(e) => (join.rightCollection, e.path, join.leftCollection)
            case None =>
              (join.leftCollection, embedRight.get.path, join.rightCollection)
          }
          val rewrittenFilters = filters.map { pred =>
            val fieldName =
              if (pred.collection == prefixOwner) s"$prefix.${pred.field}"
              else pred.field
            pred.copy(collection = baseCollection, field = fieldName)
          }
          val rewrittenSelect = selectFields.map { field =>
            if (field.startsWith(s"$prefixOwner."))
              s"$prefix.${field.split("\\.", 2)(1)}"
            else if (field.contains('.')) field.split("\\.", 2)(1)
            else field
          }
          val config = collections(baseCollection).config
          val filterField = rewrittenFilters.headOption.map(_.field)
          val strategy =
            chooseScanStrategy(filterField, config.shardingKey, config.indexes)
          val op = PlanOperator(
            name = s"${query.id}_filter",
            operatorType = operatorTypeForFilter(strategy),
            targetCollection = Some(baseCollection),
            filters = rewrittenFilters,
            outputFields = rewrittenSelect,
            scanStrategy = Some(strategy),
            indexesUsed =
              if (strategy == "index") filterField.toList else Nil,
            useSharding = strategy == "shard")
          return QueryPlan(query, List(op), List(baseCollection))
        }

        val leftFilters = filters.filter(_.collection == join.leftCollection)
        val rightFilters = filters.filter(_.collection == join.rightCollection)
        var operators = List.empty[PlanOperator]
        Seq(join.leftCollection -> leftFilters,
            join.rightCollection -> rightFilters).foreach {
          case (_, Nil) => ()
          case (name, collectionFilters) =>
            val config = collections(name).config
            val filterField = collectionFilters.head.field
            val strategy = chooseScanStrategy(Some(filterField),
              config.shardingKey, config.indexes)
            operators = operators :+ PlanOperator(
              name = s"${query.id}_filter_$name",
              operatorType = operatorTypeForFilter(strategy),
              targetCollection = Some(name),
              filters = collectionFilters,
              scanStrategy = Some(strategy),
              indexesUsed = if (strategy == "index") List(filterField) else Nil,
              useSharding = strategy == "shard")
        }
        val leftConfig = collections(join.leftCollection).config
        val rightConfig = collections(join.rightCollection).config
        val aligned = join.leftField == leftConfig.shardingKey &&
          join.rightField == rightConfig.shardingKey
        operators = operators :+ PlanOperator(
          name = s"${query.id}_join",
          operatorType = operatorTypeForJoin(aligned),
          leftCollection = Some(join.leftCollection),
          rightCollection = Some(join.rightCollection),
          join = Some(join),
          outputFields = selectFields,
          useSharding = aligned)
        QueryPlan(query, operators, involved)

      case None =>
        val involvedFromFilters =
          filters.map(_.collection).filter(_.nonEmpty).distinct.sorted
        var collectionName = involvedFromFilters.headOption
          .getOrElse(parsed.aliasEntries.head._2)
        var rewrittenSelect = selectFields
        if (!collections.contains(collectionName)) {
          // filter on an embedded-away collection: rewrite onto the target
          // (reference `challenge/planner.py:271-291`)
          embeds.find { case ((source, target), _) =>
            source == collectionName && collections.contains(target)
          }.foreach { case ((source, target), embed) =>
            filters = filters.map(pred =>
              pred.copy(collection = target, field = s"${embed.path}.${pred.field}"))
            rewrittenSelect = selectFields.map { field =>
              if (field.startsWith(s"$source."))
                s"${embed.path}.${field.split("\\.", 2)(1)}"
              else if (field.contains('.')) field.split("\\.", 2)(1)
              else field
            }
            collectionName = target
          }
        }
        val config = collections(collectionName).config
        val filterField = filters.headOption.map(_.field)
        val strategy =
          chooseScanStrategy(filterField, config.shardingKey, config.indexes)
        val op = PlanOperator(
          name = s"${query.id}_filter",
          operatorType = operatorTypeForFilter(strategy),
          targetCollection = Some(collectionName),
          filters = filters,
          outputFields = rewrittenSelect.map(f => f.split("\\.", 2).last),
          scanStrategy = Some(strategy),
          indexesUsed = if (strategy == "index") filterField.toList else Nil,
          useSharding = strategy == "shard")
        QueryPlan(query, List(op), List(collectionName))
    }
  }
}
