package graft.ast

/** The query language AST — a faithful model of the reference's JSON query
  * surface (reference: libakumuli/query_processing/queryparser.h:13-21 query
  * kinds; queryparser.cpp:934-985 clause whitelist).
  */
sealed trait OrderBy
object OrderBy {
  case object Time   extends OrderBy // ts-major, series tiebreak (default)
  case object Series extends OrderBy // series-major, ts within series
}

sealed trait GroupOp
object GroupOp {
  case object Pivot extends GroupOp // pivot-by-tag: keep listed tags
  case object Group extends GroupOp // group-by-tag: drop listed tags
}

/** Half-open time range; `from > to` means a backward scan over `(to, from]`
  * (reference: storage_engine/operators/operator.h:77-104). */
final case class TimeRange(from: Long, to: Long) {
  def backward: Boolean = from > to
  def lo: Long = math.min(from, to)
  def hi: Long = math.max(from, to)
}

/** Value predicate `gt/ge/lt/le` (reference:
  * queryprocessor_framework.h:108-126 `Filter`). */
final case class ValueFilter(
    gt: Option[Double] = None,
    ge: Option[Double] = None,
    lt: Option[Double] = None,
    le: Option[Double] = None)

/** `filter` clause. Keys are metric names (select/join) or aggregation
  * function names (group-aggregate); `requireAll` is the `"=":{"require":..}`
  * combiner (reference: queryparser.cpp:758-870). */
final case class FilterClause(
    byKey: Map[String, ValueFilter],
    requireAll: Boolean = true)

sealed trait Where
object Where {
  /** `{"tag": ["v1","v2"], ...}` — OR within one tag, AND across tags. */
  final case class TagMap(tags: Map[String, Seq[String]]) extends Where
  /** `[{"tag1":"a"}, {"tag1":"b","tag2":"c"}]` — OR of exact tag combos. */
  final case class Enumerate(rows: Seq[Map[String, String]]) extends Where
  case object All extends Where
}

final case class GroupByTag(op: GroupOp, tags: Seq[String])

/** One `apply` pipeline step, e.g. `{"name":"sma","window":10}`
  * (reference: queryparser.cpp:2079-2113; registry
  * queryprocessor_framework.cpp:9-42). Params hold the raw JSON scalars. */
final case class Apply(name: String, params: Map[String, Any] = Map.empty)

sealed trait QueryKind
object QueryKind {
  /** `select` — range-scan one metric. */
  final case class Select(metric: String) extends QueryKind
  /** `select-events` — scan an event (`!`-prefixed) series, optional body
    * regex (reference: queryparser.cpp:1357-1445). */
  final case class SelectEvents(metric: String, regex: Option[String])
      extends QueryKind
  /** `aggregate` — whole-range aggregate(s); (metric, func) pairs
    * (reference: queryparser.cpp:1474-1586). */
  final case class Aggregate(funcs: Seq[(String, String)]) extends QueryKind
  /** `group-aggregate` — time-bucketed aggregates
    * (reference: queryparser.cpp:1666-1777). */
  final case class GroupAggregate(
      metrics: Seq[String], step: Long, funcs: Seq[String]) extends QueryKind
  /** `join` — align metrics on exact timestamp within equal tag-sets
    * (reference: queryparser.cpp:1935-2022). */
  final case class Join(metrics: Seq[String]) extends QueryKind
  /** `group-aggregate-join` (reference: queryparser.cpp:1819-1933). */
  final case class GroupAggregateJoin(
      metrics: Seq[String], step: Long, func: String) extends QueryKind
  /** `select` with metric `meta:names` — series-name listing
    * (reference: queryparser.cpp:987-1022). */
  final case class MetaNames(pattern: Option[String]) extends QueryKind
}

final case class Query(
    kind: QueryKind,
    range: Option[TimeRange],
    where: Where = Where.All,
    filter: Option[FilterClause] = None,
    groupBy: Option[GroupByTag] = None,
    orderBy: OrderBy = OrderBy.Time,
    limit: Option[Long] = None,
    offset: Option[Long] = None,
    pipeline: Seq[Apply] = Nil) {
  def backward: Boolean = range.exists(_.backward)
}
