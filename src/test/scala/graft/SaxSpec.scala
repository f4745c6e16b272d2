package graft

import graft.ast.QueryJson
import graft.functions.Sax
import graft.plan.Planner

/** SAX encoding (reference: saxencoder.cpp saxify + SAXEncoder;
  * functests/test_sax.py). */
class SaxSpec extends SparkFunSuite {
  import SparkSpec._

  test("cutpoints match the published Gaussian quantile table") {
    def close(a: Array[Double], b: Seq[Double]) =
      a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-9 }
    assert(close(Sax.cutpoints(2), Seq(0.0)))
    assert(close(Sax.cutpoints(4), Seq(-0.674489750196082, 0.0, 0.674489750196082)))
    assert(close(Sax.cutpoints(10), Seq(-1.2815515655446, -0.841621233572914,
      -0.524400512708041, -0.2533471031358, 0.0, 0.2533471031358,
      0.524400512708041, 0.841621233572914, 1.2815515655446)))
  }

  test("saxify z-normalizes then buckets (alphabet 4)") {
    // window [0,1,2,3]: mean 1.5, sample stddev ~1.29099
    // z = [-1.162, -0.387, 0.387, 1.162] vs cuts [-0.674, 0, 0.674] -> adcd?
    // -1.162 < -0.674 -> 'a'; -0.387 in [-0.674,0) -> 'b'; 0.387 -> 'c'; 1.162 -> 'd'
    assert(Sax.saxify(Array(0.0, 1.0, 2.0, 3.0), Sax.cutpoints(4)) == "abcd")
    // constant window: stddev < threshold -> mean-centered only, all mid bucket
    assert(Sax.saxify(Array(5.0, 5.0, 5.0, 5.0), Sax.cutpoints(4)) == "cccc")
  }

  test("sax node emits per point once window fills, with numerosity reduction") {
    val rows = (0 until 8).map(i =>
      ("m", Map("h" -> "X"), 1000000000L * i, i.toDouble))
    val st = store(rows)
    val df = Planner.plan(QueryJson.parse(
      """{"select":"m","range":{"from":0,"to":100000000000},
        |"apply":[{"name":"sax","alphabet_size":4,"window_width":4}]}""".stripMargin), st).df
    val got = df.collect().map(r => (r.getLong(1), r.getString(2))).toSeq
    // every window of a strictly increasing ramp z-norms identically ->
    // one word at the 4th sample, the rest suppressed
    assert(got == Seq((3000000000L, "abcd")))
  }

  test("NaN z-values take the LAST alphabet letter like the reference") {
    // reference to_char: NaN falls through every cutpoint
    // (saxencoder.cpp:135-142) -> ALPHABET[cuts.size()]
    val cuts = Sax.cutpoints(5)
    val word = Sax.saxify(Array(1.0, 2.0, Double.NaN, 3.0), cuts)
    assert(word.length == 4)
    assert(word(2) == 'e') // alphabet_size 5 -> last letter 'e'
    // all-NaN window: NaN stddev -> subtraction keeps NaN -> all last
    assert(Sax.saxify(Array(Double.NaN, Double.NaN), cuts) == "ee")
    // alphabet size capped at the node-level 20
    intercept[IllegalArgumentException](Sax.cutpoints(21))
  }

  test("sax node emits a new word when shape changes") {
    val vals = Seq(0.0, 1.0, 2.0, 3.0, 0.0) // last window [1,2,3,0] differs
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("m", Map("h" -> "X"), 1000000000L * i, v) }
    val st = store(rows)
    val df = Planner.plan(QueryJson.parse(
      """{"select":"m","range":{"from":0,"to":100000000000},
        |"apply":[{"name":"sax","alphabet_size":4,"window_width":4}]}""".stripMargin), st).df
    val got = df.collect().map(_.getString(2)).toSeq
    assert(got.size == 2 && got.head == "abcd" && got(1) != "abcd")
  }

  test("sax via the legacy 'sample' clause with string params (test_sax.py)") {
    // the functest's exact query shape: sample key, quoted numbers
    val rows = (0 until 6).map(i =>
      ("m", Map("h" -> "X"), 1000000000L * i, i.toDouble))
    val st = store(rows)
    val df = Planner.plan(QueryJson.parse(
      """{"select":"m","range":{"from":0,"to":100000000000},
        |"sample":[{"name":"sax","alphabet_size":"4","window_width":"4"}]}"""
        .stripMargin), st).df
    // a linear ramp: every window is the same shape -> one word
    assert(df.collect().map(_.getString(2)).toSeq == Seq("abcd"))
  }
}
