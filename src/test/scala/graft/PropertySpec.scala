package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{AkuTime, SeriesKey}
import graft.serve.OutputFormat

/** Property-based invariants for the codec layer (raw scalacheck —
  * the scalatest bridge artifact isn't on the offline classpath). */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val tagKey = Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
  private val tagVal = Gen.alphaNumStr.map(_.take(8)).suchThat(_.nonEmpty)

  test("series canonical form is idempotent and order-insensitive") {
    check("canonical", Prop.forAll(
      Gen.mapOf(Gen.zip(tagKey, tagVal)).suchThat(_.nonEmpty),
      Gen.identifier.suchThat(_.nonEmpty)) { (tags, metric) =>
      val k = SeriesKey(metric.take(12), tags.take(8))
      val parsed = SeriesKey.parse(k.canonical)
      val shuffled = SeriesKey(k.metric, k.tags.toSeq.reverse.toMap)
      parsed.map(_.canonical) == Right(k.canonical) &&
        shuffled.canonical == k.canonical
    })
  }

  test("timestamp format/parse round-trips on the ns domain") {
    check("ts-roundtrip", Prop.forAll(
      Gen.chooseNum(0L, 7258118400L * 1000000000L - 1)) { ns =>
      AkuTime.parseTs(AkuTime.formatIso(ns)) == ns &&
        OutputFormat.isoBasic(ns) == AkuTime.formatIso(ns)
    })
  }

  test("formatG17 round-trips doubles exactly (17 sig digits suffice)") {
    check("g17", Prop.forAll(
      Gen.chooseNum(Double.MinValue, Double.MaxValue)) { x =>
      x.isNaN || x.isInfinite || OutputFormat.formatG17(x).toDouble == x
    }, n = 500)
  }

  test("durations compose: parse(n unit) = n * parse(1 unit)") {
    check("durations", Prop.forAll(
      Gen.chooseNum(1L, 100000L),
      Gen.oneOf("n", "us", "ms", "s", "m", "h", "d")) { (n, u) =>
      AkuTime.parseDuration(s"$n$u") == n * AkuTime.parseDuration(s"1$u")
    })
  }

  test("eval compiler: random arithmetic trees evaluate like Scala") {
    // generate (expr string, expected value) pairs over literals
    val leaf: Gen[(String, Double)] =
      Gen.chooseNum(0, 999).map(i => (i.toString, i.toDouble))
    def tree(depth: Int): Gen[(String, Double)] =
      if (depth == 0) leaf
      else Gen.oneOf(
        leaf,
        for {
          (ls, lv) <- tree(depth - 1)
          (rs, rv) <- tree(depth - 1)
          op <- Gen.oneOf("+", "-", "*")
        } yield (s"($ls $op $rs)", op match {
          case "+" => lv + rv
          case "-" => lv - rv
          case "*" => lv * rv
        }))
    val sp = SparkSpec.spark
    check("eval", Prop.forAll(tree(4)) { case (s, want) =>
      val c = graft.functions.EvalExpr.compile(s, Map.empty)
      val got = sp.range(1).select(c.as("v")).head().getDouble(0)
      got == want
    }, n = 60)
  }

  test("resumable RESP cursor: any chunking parses like the whole string") {
    import graft.io.LineProtocol
    // random sessions: dictionary prelude, data points, row-protocol
    // entries, events — the cursor must suspend/resume at EVERY line
    // boundary without dropping, duplicating, or re-applying anything
    val session: Gen[String] = for {
      nDict <- Gen.chooseNum(0, 3)
      nPts <- Gen.chooseNum(1, 20)
      useRow <- Gen.oneOf(true, false)
    } yield {
      val sb = new StringBuilder
      if (nDict > 0) {
        sb.append(s"*${nDict * 2}\r\n")
        for (i <- 0 until nDict)
          sb.append(s"+m$i host=h$i\r\n:$i\r\n")
      }
      for (p <- 0 until nPts) {
        val ts = 1000000000L * (p + 1)
        if (nDict > 0 && p % 2 == 0) sb.append(s":${p % nDict}\r\n")
        else if (useRow && p % 3 == 0)
          sb.append(s"+a$p|b$p x=1\r\n") // compound name, row protocol
        else sb.append(s"+c$p tag=v\r\n")
        sb.append(s":$ts\r\n")
        if (useRow && p % 3 == 0 && !(nDict > 0 && p % 2 == 0))
          sb.append(s"*2\r\n:$p\r\n:${p + 1}\r\n")
        else sb.append(s"+$p.5\r\n")
      }
      sb.toString
    }
    val chunked = for {
      s <- session
      // cut points at random LINE boundaries
      cuts <- Gen.someOf(s.indices.filter(i => s.charAt(i) == '\n').init)
    } yield (s, cuts.toSeq.sorted)
    check("cursor-chunking", Prop.forAll(chunked) { case (s, cuts) =>
      def mk = (k: graft.model.SeriesKey, ts: Long, v: Double, ev: String) =>
        (k.canonical, ts, v, ev)
      val whole = LineProtocol.parseRespWith(s, mk).toList
      val cursor = new LineProtocol.RespCursor(mk)
      val bounds = (-1L +: cuts.map(_.toLong) :+ (s.length - 1).toLong)
      val out = scala.collection.mutable.ListBuffer[(String, Long, Double, String)]()
      bounds.sliding(2).foreach { case Seq(a, b) =>
        cursor.append(s.substring(a.toInt + 1, b.toInt + 1))
        while (cursor.step()) while (cursor.hasQueued) out += cursor.poll()
      }
      cursor.finish()
      while (cursor.step()) ()
      while (cursor.hasQueued) out += cursor.poll()
      out.toList == whole
    }, n = 150)
  }
}
