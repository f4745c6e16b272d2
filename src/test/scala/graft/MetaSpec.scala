package graft

import graft.plan.Meta

/** /api/suggest and /api/search behaviors
  * (reference: functests/test_search_api.py). */
class MetaSpec extends SparkFunSuite {
  import SparkSpec._

  private val st = store(Seq(
    ("cpu.user", Map("host" -> "web1", "dc" -> "east"), 100L, 1.0),
    ("cpu.user", Map("host" -> "web2", "dc" -> "west"), 100L, 1.0),
    ("cpu.syst", Map("host" -> "web1", "dc" -> "east"), 100L, 1.0),
    ("mem.free", Map("host" -> "db1"), 100L, 1.0)))

  test("suggest metric-names with and without prefix") {
    assert(Meta.suggest(st, """{"select":"metric-names"}""")
      .collect().map(_.getString(0)).toSeq ==
      Seq("cpu.syst", "cpu.user", "mem.free"))
    assert(Meta.suggest(st, """{"select":"metric-names","starts-with":"cpu."}""")
      .collect().map(_.getString(0)).toSeq == Seq("cpu.syst", "cpu.user"))
  }

  test("suggest tag-names scoped to metric") {
    assert(Meta.suggest(st, """{"select":"tag-names","metric":"cpu.user"}""")
      .collect().map(_.getString(0)).toSeq == Seq("dc", "host"))
    assert(Meta.suggest(st, """{"select":"tag-names","metric":"mem.free"}""")
      .collect().map(_.getString(0)).toSeq == Seq("host"))
  }

  test("suggest tag-values scoped to metric+tag with prefix") {
    assert(Meta.suggest(st,
      """{"select":"tag-values","metric":"cpu.user","tag":"host","starts-with":"web"}""")
      .collect().map(_.getString(0)).toSeq == Seq("web1", "web2"))
    assert(Meta.suggest(st,
      """{"select":"tag-values","metric":"cpu.user","tag":"dc","starts-with":"e"}""")
      .collect().map(_.getString(0)).toSeq == Seq("east"))
  }

  test("search: metric + where filters series names") {
    assert(Meta.searchJson(st, """{"select":"cpu.user","where":{"dc":"east"}}""")
      .collect().map(_.getString(0)).toSeq ==
      Seq("cpu.user dc=east host=web1"))
    assert(Meta.searchJson(st, """{"select":"cpu.user"}""")
      .collect().map(_.getString(0)).toSeq ==
      Seq("cpu.user dc=east host=web1", "cpu.user dc=west host=web2"))
  }

  test("search: regex over canonical names (PlainSeriesMatcher::regex_match)") {
    // matches any cpu.* series on host web1, like the reference's
    // regex_match over the flat series-name table
    assert(Meta.searchRegex(st, "cpu\\..* host=web1.*")
      .collect().map(_.getString(0)).toSeq ==
      Seq("cpu.syst dc=east host=web1", "cpu.user dc=east host=web1"))
    // via the /api/search JSON surface
    assert(Meta.searchJson(st, """{"regex":"mem\\.free.*"}""")
      .collect().map(_.getString(0)).toSeq == Seq("mem.free host=db1"))
    // anchored non-match
    assert(Meta.searchRegex(st, "^nothing$").collect().isEmpty)
    // invalid pattern fails fast, driver-side
    intercept[IllegalArgumentException](Meta.searchRegex(st, "cpu.["))
  }

  test("tag-values on a tag the metric's series lack returns empty") {
    assert(Meta.suggest(st,
      """{"select":"tag-values","metric":"mem.free","tag":"dc"}""")
      .collect().isEmpty)
  }

  test("suggest errors mirror the reference") {
    intercept[IllegalArgumentException](Meta.suggest(st, """{"select":"tag-names"}"""))
    intercept[IllegalArgumentException](Meta.suggest(st,
      """{"select":"tag-values","metric":"cpu.user"}"""))
    intercept[IllegalArgumentException](Meta.suggest(st, """{"no-select":1}"""))
  }
}
