package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ast._

/** JSON query validation (reference: validate_query
  * queryparser.cpp:934-985 and kind dispatch :901-932). */
class QueryJsonSpec extends AnyFunSuite {

  test("kind dispatch and mutual exclusion") {
    assert(QueryJson.parse("""{"select":"cpu","range":{"from":0,"to":1}}""")
      .kind == QueryKind.Select("cpu"))
    val e = intercept[IllegalArgumentException](QueryJson.parse(
      """{"select":"cpu","join":["a","b"],"range":{"from":0,"to":1}}"""))
    assert(e.getMessage.contains("conflicting"))
    intercept[IllegalArgumentException](QueryJson.parse("""{"range":{"from":0,"to":1}}"""))
  }

  test("legacy 'sample' clause is an alias for 'apply'") {
    // functests/test_sax.py shape: string-typed params, sample key
    val q = QueryJson.parse(
      """{"select":"test","range":{"from":0,"to":1},
        |"sample":[{"name":"sax","alphabet_size":"5","window_width":"10"}]}"""
        .stripMargin)
    assert(q.pipeline.map(_.name) == Seq("sax"))
    assert(q.pipeline.head.params("alphabet_size") == "5")
    // "apply" wins when both are present (the modern parser's key)
    val both = QueryJson.parse(
      """{"select":"test","range":{"from":0,"to":1},
        |"apply":[{"name":"abs"}],"sample":[{"name":"sax"}]}""".stripMargin)
    assert(both.pipeline.map(_.name) == Seq("abs"))
  }

  test("range required except aggregate/meta") {
    intercept[IllegalArgumentException](QueryJson.parse("""{"select":"cpu"}"""))
    assert(QueryJson.parse("""{"aggregate":{"cpu":"max"}}""").range.isEmpty)
    assert(QueryJson.parse("""{"select":"meta:names"}""").kind ==
      QueryKind.MetaNames(None))
  }

  test("select-events requires ! prefix; select rejects it") {
    assert(QueryJson.parse(
      """{"select-events":"!ev","range":{"from":0,"to":1}}""").kind ==
      QueryKind.SelectEvents("!ev", None))
    intercept[IllegalArgumentException](QueryJson.parse(
      """{"select-events":"ev","range":{"from":0,"to":1}}"""))
    intercept[IllegalArgumentException](QueryJson.parse(
      """{"select":"!ev","range":{"from":0,"to":1}}"""))
  }

  test("where forms parse") {
    val q = QueryJson.parse(
      """{"select":"m","range":{"from":0,"to":1},"where":{"h":["a","b"],"z":"c"}}""")
    assert(q.where == Where.TagMap(Map("h" -> Seq("a", "b"), "z" -> Seq("c"))))
    val q2 = QueryJson.parse(
      """{"select":"m","range":{"from":0,"to":1},"where":[{"h":"a"},{"h":"b","z":"c"}]}""")
    assert(q2.where == Where.Enumerate(Seq(Map("h" -> "a"), Map("h" -> "b", "z" -> "c"))))
  }

  test("filter forms: flat, multi-key, require combiner") {
    val q = QueryJson.parse(
      """{"select":"m","range":{"from":0,"to":1},"filter":{"gt":1,"le":5}}""")
    assert(q.filter.get.byKey("m") == ValueFilter(gt = Some(1), le = Some(5)))
    val q2 = QueryJson.parse(
      """{"join":["a","b"],"range":{"from":0,"to":1},
        |"filter":{"a":{"gt":1},"b":{"lt":2},"=":{"require":"any"}}}""".stripMargin)
    assert(!q2.filter.get.requireAll)
    intercept[IllegalArgumentException](QueryJson.parse(
      """{"select":"m","range":{"from":0,"to":1},"filter":{"gte":1}}"""))
  }

  test("order-by validation") {
    intercept[IllegalArgumentException](QueryJson.parse(
      """{"select":"m","range":{"from":0,"to":1},"order-by":"sideways"}"""))
    // order-by on aggregate is accepted and ignored like the reference
    // (validate_query whitelists it; parse_aggregate_query never reads it)
    val q = QueryJson.parse("""{"aggregate":{"m":"max"},"order-by":"time"}""")
    assert(q.kind.isInstanceOf[graft.ast.QueryKind.Aggregate])
  }

  test("backward range flag and ISO timestamps") {
    val q = QueryJson.parse(
      """{"select":"m","range":{"from":"20240102T000000","to":"20240101T000000"}}""")
    assert(q.backward)
    assert(q.range.get.from - q.range.get.to == 86400L * 1000000000L)
  }

  test("group-by legacy alias means pivot-by-tag") {
    val q = QueryJson.parse(
      """{"select":"m","range":{"from":0,"to":1},"group-by":["h"]}""")
    assert(q.groupBy.contains(GroupByTag(GroupOp.Pivot, Seq("h"))))
  }

  test("unknown top-level statements rejected; whitelisted eval ignored") {
    // validate_query rejects keywords outside ALLOWED_STMTS
    val e = intercept[QueryJson.QueryParseException](QueryJson.parse(
      """{"select":"m","range":{"from":0,"to":1},"bogus":1}"""))
    assert(e.getMessage.contains("unknown statement"))
    // "eval" is whitelisted but never consumed -> accepted and ignored
    val q = QueryJson.parse(
      """{"select":"m","range":{"from":0,"to":1},"eval":{"expr":"m+1"}}""")
    assert(q.kind.isInstanceOf[graft.ast.QueryKind.Select])
  }
}
