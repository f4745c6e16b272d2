package graft.serve

import org.apache.spark.sql.{DataFrame, Dataset}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.ast.QueryJson
import graft.plan.{Frame, Meta, Planner, TsStore}

/** The single serving entry point — the library analogue of the
  * reference's HTTP endpoints (reference: akumulid/httpserver.cpp:43-52:
  * `/api/query`, `/api/search`, `/api/suggest`, `/api/stats`,
  * `/api/function-names`). A server runtime would wrap these in routes;
  * everything below is transport-agnostic.
  *
  * `query` honors the `output` clause (reference:
  * query_results_pooler.cpp:31-380): `{"output":{"format":"csv"|"resp",
  * "timestamp":"iso"|"raw"}}` -> formatted lines; without it, the raw
  * DataFrame is returned for programmatic use.
  */
object Api {

  sealed trait QueryResult
  final case class Rows(df: DataFrame) extends QueryResult
  final case class Lines(ds: Dataset[String]) extends QueryResult

  /** A data query whose series resolution is empty — the reference's
    * `AKU_ENOT_FOUND` (`-not found` line, HTTP 404). */
  final case class NotFoundException(msg: String = "not found")
      extends RuntimeException(msg)

  /** The reference returns `-not found` when the FIRST select column
    * resolves to zero series (storage2.cpp:1449-1452: checks
    * `columns.at(0).ids.empty()`), while an existing series with an empty
    * time range streams an empty result. Metadata queries bypass the check
    * (SELECT_META branch, storage2.cpp:1407-1424). Resolution = first
    * metric + where-clause against the series index (the inverted-matcher
    * lookup, queryparser.cpp:86-140) — here a `limit(1)` probe on the
    * series dimension. */
  private def requireSeries(store: TsStore, q: graft.ast.Query): Unit = {
    import graft.ast.QueryKind._
    val firstMetric = q.kind match {
      case Select(m)                      => Some(m)
      case SelectEvents(m, _)             => Some(m)
      case Aggregate(pairs)               => pairs.headOption.map(_._1)
      case GroupAggregate(ms, _, _)       => ms.headOption
      case Join(ms)                       => ms.headOption
      case GroupAggregateJoin(ms, _, _)   => ms.headOption
      case MetaNames(_)                   => None
    }
    for (m <- firstMetric) {
      // probe the maintained dimension when attached; otherwise probe the
      // FACT table directly — metric lands in PartitionFilters and
      // CollectLimit(1) stops at the first matching row. The derived
      // `store.series` view would put a whole-corpus dropDuplicates
      // shuffle in front of EVERY request just to answer "exists?".
      val base = store.seriesDim.getOrElse(store.samples)
      val matched = base
        .filter(org.apache.spark.sql.functions.col(TsStore.Metric) === m &&
          Planner.wherePred(q.where))
        .limit(1).count()
      if (matched == 0L) throw NotFoundException()
    }
  }

  /** One request path for both entry points: parse, existence probe,
    * plan. A new validation step added here reaches the library AND the
    * HTTP shapes. */
  private def planRequest(store: TsStore, json: String): (JValue, Frame) = {
    val root = JsonMethods.parse(json)
    val q = QueryJson.fromJValue(root)
    requireSeries(store, q)
    (root, Planner.plan(q, store))
  }

  /** `/api/query` with optional output formatting. */
  def query(store: TsStore, json: String): QueryResult = {
    val (root, frame) = planRequest(store, json)
    outputSpec(root) match {
      case None             => Rows(frame.df)
      case Some((fmt, iso)) => Lines(format(frame, fmt, iso))
    }
  }

  /** `/api/query` as formatted wire lines — the HTTP serving shape. The
    * reference's default output format is RESP
    * (query_results_pooler.cpp:367-380). */
  def queryLines(store: TsStore, json: String): Dataset[String] = {
    val (root, frame) = planRequest(store, json)
    val (fmt, iso) = outputSpec(root).getOrElse(("resp", true))
    format(frame, fmt, iso)
  }

  private def format(frame: Frame, fmt: String, iso: Boolean): Dataset[String] =
    fmt match {
      case "csv"  => OutputFormat.csv(frame, iso)
      case "resp" => OutputFormat.resp(frame, iso)
      case other  =>
        throw QueryJson.QueryParseException(s"bad output.format '$other'")
    }

  private def outputSpec(root: JValue): Option[(String, Boolean)] =
    (root \ "output") match {
      case JNothing => None
      case o =>
        val fmt = (o \ "format") match {
          case JString(f)   => f
          case JNothing     => "csv"
          case _            => throw QueryJson.QueryParseException("bad output.format")
        }
        val iso = (o \ "timestamp") match {
          case JString("iso") | JNothing => true
          case JString("raw")            => false
          case JString(other) =>
            throw QueryJson.QueryParseException(s"bad output.timestamp '$other'")
          case _ => throw QueryJson.QueryParseException("bad output.timestamp")
        }
        Some((fmt, iso))
    }

  /** `/api/suggest`. */
  def suggest(store: TsStore, json: String): DataFrame = Meta.suggest(store, json)

  /** `/api/search`. */
  def search(store: TsStore, json: String): DataFrame = Meta.searchJson(store, json)

  /** `/api/stats`. */
  def stats(store: TsStore): DataFrame = Meta.stats(store)

  /** `/api/function-names`. */
  def functionNames: Seq[String] = Meta.functionNames
}
