package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{AkuTime, SeriesKey}

/** Series-name and timestamp codecs (reference: seriesparser.cpp:389,
  * datetime.cpp:60,150,173). */
class ModelSpec extends AnyFunSuite {

  test("series canonical form sorts tags, single-space separated") {
    assert(SeriesKey("cpu", Map("zone" -> "b", "host" -> "a")).canonical ==
      "cpu host=a zone=b")
  }

  test("series parse rejects malformed input like the reference") {
    assert(SeriesKey.parse("cpu host=a zone=b").map(_.canonical) ==
      Right("cpu host=a zone=b"))
    assert(SeriesKey.parse("cpu").isLeft)            // no tags
    assert(SeriesKey.parse("cpu host=").isLeft)      // empty value
    assert(SeriesKey.parse("cpu =a").isLeft)         // empty key
    assert(SeriesKey.parse("cpu h=1 h=2").isLeft)    // duplicate tag
  }

  test("ISO basic timestamps parse to ns") {
    assert(AkuTime.parseTs("19700101T000000") == 0L)
    assert(AkuTime.parseTs("19700101T000001.5") == 1500000000L)
    assert(AkuTime.parseTs("20240105T000000") ==
      AkuTime.parseTs("20240105") )
    assert(AkuTime.parseTs("123456789") == 123456789L) // raw ns
    intercept[IllegalArgumentException](AkuTime.parseTs("not-a-time"))
    // out-of-range time-of-day is a bad timestamp, not 99 silent hours
    intercept[IllegalArgumentException](AkuTime.parseTs("20200101T990000"))
    intercept[IllegalArgumentException](AkuTime.parseTs("20200101T006100"))
    intercept[IllegalArgumentException](AkuTime.parseTs("20200101T000061"))
  }

  test("durations parse with reference units") {
    assert(AkuTime.parseDuration("10s") == 10L * 1000000000L)
    assert(AkuTime.parseDuration("1m") == 60L * 1000000000L)
    assert(AkuTime.parseDuration("100ms") == 100000000L)
    assert(AkuTime.parseDuration("1d") == 86400L * 1000000000L)
    assert(AkuTime.parseDuration("5") == 5L) // bare ns
    intercept[IllegalArgumentException](AkuTime.parseDuration("10 parsecs"))
  }

  test("format round-trips") {
    val ns = AkuTime.parseTs("20240105T123456.123456789")
    assert(AkuTime.formatIso(ns) == "20240105T123456.123456789")
  }
}
