package graft.ast

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.model.AkuTime

/** JSON reader for the query language. Mirrors the reference's dispatch
  * (`QueryParser::get_query_kind`, queryparser.cpp:901-932) and clause
  * validation (`validate_query`, queryparser.cpp:934-985).
  */
object QueryJson {

  final case class QueryParseException(msg: String)
      extends IllegalArgumentException(msg)

  private val kindFields =
    Seq("select", "aggregate", "join", "group-aggregate",
        "group-aggregate-join", "select-events")

  /** validate_query's ALLOWED_STMTS, queryparser.cpp:943-962. */
  private val AllowedStmts = kindFields.toSet ++ Set(
    "output", "order-by", "group-by", "group-by-tag", "pivot-by-tag",
    "limit", "offset", "range", "where", "apply", "eval", "filter",
    "sample") // legacy alias for "apply" (functests/test_sax.py drives
              // sax through it; the modern reference parser dropped it)

  /** Any malformed byte sequence — truncated JSON, empty input, 10k
    * nested braces — surfaces as the normalized QueryParseException
    * (reference: query_parsing error_repr), never a raw Jackson
    * exception; the HTTP error-line contract needs one failure type
    * (fuzz-verified, PropertySpec). */
  def parse(json: String): Query = {
    val root =
      try JsonMethods.parse(json)
      catch { case e: Exception =>
        throw QueryParseException(
          s"invalid JSON: ${Option(e.getMessage).getOrElse("unparseable")
            .takeWhile(_ != '\n')}")
      }
    fromJValue(root)
  }

  def fromJValue(root: JValue): Query = {
    val obj = root match {
      case o: JObject => o
      case _          => fail("query must be a JSON object")
    }
    val fields = obj.obj.map(_._1).toSet
    // validate_query's ALLOWED_STMTS (queryparser.cpp:943-985): unknown
    // top-level keywords are rejected. "eval" is whitelisted there but
    // never consumed (only the apply-node token exists), so like the
    // reference we accept and ignore it.
    fields.find(!AllowedStmts.contains(_))
      .foreach(k => fail(s"unknown statement '$k'"))
    val present = kindFields.filter(fields.contains)
    if (present.isEmpty) fail(s"query kind not found (one of ${kindFields.mkString(", ")})")
    if (present.size > 1)
      fail(s"conflicting query kinds: ${present.mkString(", ")}")

    val kind = present.head match {
      case "select" =>
        str(obj \ "select") match {
          case "meta:names" => QueryKind.MetaNames(None)
          case s if s.startsWith("meta:names:") =>
            QueryKind.MetaNames(Some(s.stripPrefix("meta:names:")))
          case m if m.startsWith("!") =>
            fail("use select-events to query event series")
          case m => QueryKind.Select(m)
        }
      case "select-events" =>
        val m = str(obj \ "select-events")
        if (!m.startsWith("!")) fail("select-events metric must start with '!'")
        QueryKind.SelectEvents(m, (obj \ "filter") match {
          case JString(re)            => Some(re)
          case JNothing               => None
          // an OBJECT filter on select-events is silently ignored, like
          // the reference (parse_select_events_filter_field returns ""
          // for any non-leaf node, queryparser.cpp:338-353)
          case o: JObject             => None
          case _                      => fail("bad event filter")
        })
      case "aggregate" =>
        (obj \ "aggregate") match {
          case JObject(kvs) if kvs.nonEmpty =>
            val pairs = kvs.flatMap {
              case (m, JString(f)) => Seq(m -> f)
              case (m, JArray(fs)) if fs.nonEmpty => fs.map(f => m -> str(f))
              // an empty func array would silently drop the metric (or
              // reach the planner as zero aggregations and crash it)
              case (m, JArray(_)) => fail(s"empty func list for metric '$m'")
              case _              => fail("bad aggregate clause")
            }
            QueryKind.Aggregate(pairs)
          case _ => fail("aggregate clause must be a non-empty object")
        }
      case "group-aggregate" =>
        val g = obj \ "group-aggregate"
        QueryKind.GroupAggregate(strList(g \ "metric"), dur(g \ "step"),
          strList(g \ "func"))
      case "group-aggregate-join" =>
        val g = obj \ "group-aggregate-join"
        QueryKind.GroupAggregateJoin(strList(g \ "metric"), dur(g \ "step"),
          str(g \ "func"))
      case "join" =>
        QueryKind.Join(strList(obj \ "join"))
    }

    val range = (obj \ "range") match {
      case JNothing => None
      case r =>
        Some(TimeRange(ts(r \ "from", "range.from"), ts(r \ "to", "range.to")))
    }
    // Empty range is only legal for whole-history `aggregate`
    // (reference: queryparser.cpp:1474-1520).
    if (range.isEmpty && !kind.isInstanceOf[QueryKind.Aggregate] &&
        !kind.isInstanceOf[QueryKind.MetaNames])
      fail("range is required for this query kind")

    val where = parseWhere(obj \ "where")

    val filter = (obj \ "filter") match {
      case o: JObject if present.head != "select-events" => Some(parseFilter(o, kind))
      case _                                             => None
    }

    val groupBy = {
      // Deprecated "group-by" behaves like pivot-by-tag
      // (reference: queryparser.cpp:586-619).
      val pivot = Seq("pivot-by-tag", "group-by").map(f => obj \ f)
        .collectFirst { case v if v != JNothing => GroupByTag(GroupOp.Pivot, strList(v)) }
      val group = (obj \ "group-by-tag") match {
        case JNothing => None
        case v        => Some(GroupByTag(GroupOp.Group, strList(v)))
      }
      pivot.orElse(group)
    }

    val orderBy = (obj \ "order-by") match {
      case JString("time")   => OrderBy.Time
      case JString("series") => OrderBy.Series
      case JNothing          => OrderBy.Time
      case JString(s)        => fail(s"unexpected order-by value '$s'")
      case _                 => fail("bad order-by clause")
    }
    // order-by on aggregate is ACCEPTED and ignored, matching the
    // reference: validate_query whitelists order-by for every query kind
    // and parse_aggregate_query simply never reads it, always emitting
    // series order (queryparser.cpp:1569). The aggregate frame has no ts
    // column, so the planner's finish() sorts by sname regardless.

    val limit  = (obj \ "limit")  match { case JNothing => None; case v => Some(num(v).toLong) }
    val offset = (obj \ "offset") match { case JNothing => None; case v => Some(num(v).toLong) }

    // "sample" is the deprecated spelling of "apply" (the reference's
    // old parser; functests/test_sax.py still sends it). "apply" wins
    // when both are present.
    val pipelineJson = (obj \ "apply") match {
      case JNothing => obj \ "sample"
      case v        => v
    }
    val pipeline = pipelineJson match {
      case JNothing => Nil
      case JArray(steps) => steps.map {
        case JObject(kvs) =>
          val m = kvs.toMap
          val name = m.get("name").map(str).getOrElse(fail("apply step without name"))
          Apply(name, (m - "name").map { case (k, v) => k -> jAny(v) })
        case _ => fail("bad apply step")
      }
      case _ => fail("apply must be a list")
    }

    Query(kind, range, where, filter, groupBy, orderBy, limit, offset, pipeline)
  }

  /** Tag predicate clause (shared with `/api/search`, reference:
    * queryparser.cpp:692-750). */
  def parseWhere(v: JValue): Where = v match {
    case JNothing => Where.All
    case JObject(kvs) =>
      Where.TagMap(kvs.map {
        case (t, JArray(vs)) => t -> vs.map(jScalar)
        case (t, w)          => t -> Seq(jScalar(w))
      }.toMap)
    case JArray(rows) =>
      Where.Enumerate(rows.map {
        case JObject(kvs) => kvs.map { case (k, w) => k -> jScalar(w) }.toMap
        case _            => fail("bad where list entry")
      })
    case _ => fail("bad where clause")
  }

  /** `{"gt":1}` (single key), or `{"metric-or-func":{"gt":1}, "=":{"require":"all"}}`. */
  private def parseFilter(o: JObject, kind: QueryKind): FilterClause = {
    val fields = o.obj.toMap
    def vf(v: JValue): ValueFilter = v match {
      case JObject(kvs) =>
        val m = kvs.toMap
        val known = Set("gt", "ge", "lt", "le")
        m.keys.find(!known.contains(_)).foreach(k => fail(s"unknown filter op '$k'"))
        ValueFilter(m.get("gt").map(num), m.get("ge").map(num),
          m.get("lt").map(num), m.get("le").map(num))
      case _ => fail("bad filter clause")
    }
    val isFlat = fields.keys.forall(Set("gt", "ge", "lt", "le").contains)
    if (isFlat) {
      val key = kind match {
        case QueryKind.Select(m) => m
        case _                   => fail("flat filter requires a select query")
      }
      FilterClause(Map(key -> vf(o)), requireAll = true)
    } else {
      val requireAll = (fields.get("=") match {
        case Some(JObject(kvs)) => kvs.toMap.get("require").map(str)
        case _                  => None
      }).forall(_ == "all")
      FilterClause(
        (fields - "=").map { case (k, v) => k -> vf(v) }, requireAll)
    }
  }

  private def fail(msg: String): Nothing = throw QueryParseException(msg)

  private def str(v: JValue): String = v match {
    case JString(s) => s
    case _          => fail(s"expected string, got $v")
  }
  private def jScalar(v: JValue): String = v match {
    case JString(s)  => s
    case JInt(i)     => i.toString
    case JLong(i)    => i.toString
    case JDouble(d)  => d.toString
    case JDecimal(d) => d.toString
    case JBool(b)    => b.toString
    case _           => fail(s"expected scalar, got $v")
  }
  private def jAny(v: JValue): Any = v match {
    case JString(s)  => s
    case JInt(i)     => i.toLong
    case JLong(i)    => i
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case JBool(b)    => b
    case JArray(xs)  => xs.map(jAny)
    case other       => other
  }
  private def num(v: JValue): Double = v match {
    case JInt(i)     => i.toDouble
    case JLong(i)    => i.toDouble
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case JString(s)  => s.toDouble
    case _           => fail(s"expected number, got $v")
  }
  private def ts(v: JValue, what: String): Long = v match {
    case JString(s)  => AkuTime.parseTs(s)
    case JInt(i)     => i.toLong
    case JLong(i)    => i
    case JNothing    => fail(s"$what is missing")
    case _           => fail(s"bad $what")
  }
  private def dur(v: JValue): Long = v match {
    case JString(s) => AkuTime.parseDuration(s)
    case JInt(i)    => i.toLong
    case JLong(i)   => i
    case _          => fail("bad step")
  }
  private def strList(v: JValue): Seq[String] = v match {
    case JString(s) => Seq(s)
    case JArray(xs) => xs.map(str)
    case _          => fail(s"expected string or list, got $v")
  }
}
