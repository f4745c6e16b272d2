package graft

import graft.ast.QueryJson
import graft.plan.Planner
import graft.serve.OutputFormat

/** Output formatting (reference: query_results_pooler.cpp:31-380;
  * datetime.cpp:150). Golden strings checked against C printf behavior. */
class OutputFormatSpec extends SparkFunSuite {
  import SparkSpec._

  test("formatG17 matches C %.17g") {
    assert(OutputFormat.formatG17(5.0) == "5")
    assert(OutputFormat.formatG17(0.0) == "0")
    assert(OutputFormat.formatG17(-0.0) == "-0")
    assert(OutputFormat.formatG17(25.1) == "25.100000000000001")
    assert(OutputFormat.formatG17(10.56) == "10.56")
    assert(OutputFormat.formatG17(1.0 / 3.0) == "0.33333333333333331")
    assert(OutputFormat.formatG17(1e20) == "1e+20")
    assert(OutputFormat.formatG17(1.5e-7) == "1.4999999999999999e-07")
    assert(OutputFormat.formatG17(0.0001) == "0.0001")
    assert(OutputFormat.formatG17(Double.NaN) == "nan")
    assert(OutputFormat.formatG17(Double.PositiveInfinity) == "inf")
  }

  test("isoBasic prints ns-precision basic format") {
    assert(OutputFormat.isoBasic(0L) == "19700101T000000.000000000")
    assert(OutputFormat.isoBasic(1500000000L) == "19700101T000001.500000000")
  }

  test("csv: scalar rows are sname,ts,value") {
    val st = store(Seq(("m", Map("h" -> "X"), 1500000000L, 2.5)))
    val f = Planner.plan(QueryJson.parse(
      """{"select":"m","range":{"from":0,"to":10000000000}}"""), st)
    assert(OutputFormat.csv(f).collect().toSeq ==
      Seq("m h=X,19700101T000001.500000000,2.5"))
    assert(OutputFormat.csv(f, isoTimestamps = false).collect().toSeq ==
      Seq("m h=X,1500000000,2.5"))
  }

  test("csv: missing tuple cells print as empty fields") {
    val st = store(Seq(
      ("a", Map("h" -> "X"), 1000000000L, 1.0),
      ("b", Map("h" -> "X"), 2000000000L, 2.0)))
    val f = Planner.plan(QueryJson.parse(
      """{"join":["a","b"],"range":{"from":0,"to":10000000000}}"""), st)
    assert(OutputFormat.csv(f).collect().toSeq == Seq(
      "a|b h=X,19700101T000001.000000000,1,",
      "a|b h=X,19700101T000002.000000000,,2"))
  }

  test("resp: values as +lines, raw ts as :int") {
    val st = store(Seq(("m", Map("h" -> "X"), 1500000000L, 2.5)))
    val f = Planner.plan(QueryJson.parse(
      """{"select":"m","range":{"from":0,"to":10000000000}}"""), st)
    assert(OutputFormat.resp(f, isoTimestamps = false).collect().toSeq ==
      Seq("+m h=X\r\n:1500000000\r\n+2.5"))
  }
}
