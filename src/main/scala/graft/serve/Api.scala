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

  /** `/api/query` with optional output formatting. */
  def query(store: TsStore, json: String): QueryResult = {
    val root = JsonMethods.parse(json)
    val frame = Planner.plan(QueryJson.fromJValue(root), store)
    outputSpec(root) match {
      case None             => Rows(frame.df)
      case Some((fmt, iso)) => Lines(format(frame, fmt, iso))
    }
  }

  /** `/api/query` as formatted wire lines — the HTTP serving shape. The
    * reference's default output format is RESP
    * (query_results_pooler.cpp:367-380). */
  def queryLines(store: TsStore, json: String): Dataset[String] = {
    val root = JsonMethods.parse(json)
    val frame = Planner.plan(QueryJson.fromJValue(root), store)
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
