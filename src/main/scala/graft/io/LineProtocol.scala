package graft.io

import graft.model.{AkuTime, SeriesKey}

/** Wire-format line parsers for the two ingestion protocols
  * (reference: akumulid/protocolparser.h:133-268 RESP data-point/row
  * protocols + session dictionary; :296-336 OpenTSDB telnet `put`;
  * compound-series expansion libakumuli/storage2.cpp:265-360).
  *
  * Parsers are pure `Iterator[String] -> Iterator[ParsedSample]`
  * functions: one RESP session (dictionary scope) is one sequential
  * stream, so the Spark entry points in [[Ingest]] parallelize across
  * sessions/files, never within one.
  */
object LineProtocol {

  /** One parsed point. `event` is set for `!`-prefixed series. */
  final case class ParsedSample(
      metric: String, tags: Map[String, String], ts: Long,
      value: Double, event: String)

  final case class ProtocolParseException(msg: String)
      extends IllegalArgumentException(msg)
  private def fail(msg: String): Nothing = throw ProtocolParseException(msg)

  val MaxRowWidth = 58 // reference: AKU_LIMITS_MAX_ROW_WIDTH

  /** Expand a (possibly compound `m1|m2|m3 tags`) series name into
    * per-metric keys (reference: storage2.cpp:265-360). */
  private def expand(series: String): Seq[SeriesKey] = {
    val sp = series.indexOf(' ')
    if (sp < 0) fail(s"at least one tag required: '$series'")
    val metrics = series.substring(0, sp).split('|').toSeq
    if (metrics.isEmpty || metrics.size > MaxRowWidth)
      fail(s"bad compound series width: '$series'")
    val tagPart = series.substring(sp + 1)
    metrics.map { m =>
      SeriesKey.parse(s"$m $tagPart").fold(fail, identity)
    }
  }

  // --- RESP ---------------------------------------------------------------

  /** Parse one RESP session. Supports the data-point protocol, the row
    * protocol (`*N` value arrays against compound names), and the session
    * dictionary (leading `*N` arrays of name/:id pairs; `:id` then
    * substitutes for a series name). */
  def parseResp(lines: Iterator[String]): Iterator[ParsedSample] = {
    val it = lines.buffered
    val dict = scala.collection.mutable.Map[Long, Seq[SeriesKey]]()
    var inPrelude = true // dictionary arrays legal only before data

    def respStr(l: String): String =
      if (l.startsWith("+")) l.substring(1).trim
      else fail(s"expected RESP string, got '$l'")

    def nextNonEmpty(): String = {
      while (it.hasNext && it.head.trim.isEmpty) it.next()
      if (!it.hasNext) fail("unexpected end of stream")
      it.next().trim
    }

    def parseValueToken(l: String, keys: Seq[SeriesKey], ts: Long): Seq[ParsedSample] = {
      if (keys.size != 1) fail("scalar value against compound series")
      sampleOf(keys.head, ts, l)
    }

    def sampleOf(k: SeriesKey, ts: Long, tok: String): Seq[ParsedSample] = {
      if (k.isEvent)
        Seq(ParsedSample(k.metric, k.tags, ts, Double.NaN, respStr(tok)))
      else if (tok.startsWith(":"))
        Seq(ParsedSample(k.metric, k.tags, ts, tok.substring(1).trim.toDouble, null))
      else
        Seq(ParsedSample(k.metric, k.tags, ts, respStr(tok).toDouble, null))
    }

    new Iterator[Iterator[ParsedSample]] {
      def hasNext: Boolean = {
        while (it.hasNext && it.head.trim.isEmpty) it.next()
        it.hasNext
      }
      def next(): Iterator[ParsedSample] = {
        val first = nextNonEmpty()
        if (first.startsWith("*") && inPrelude) {
          // dictionary array: N elements = N/2 (name, id) pairs
          val n = first.substring(1).trim.toInt
          if (n % 2 != 0) fail("dictionary array length must be even")
          (0 until n / 2).foreach { _ =>
            val name = respStr(nextNonEmpty())
            val idTok = nextNonEmpty()
            if (!idTok.startsWith(":")) fail(s"dictionary id must be integer, got '$idTok'")
            val id = idTok.substring(1).trim.toLong
            val keys = expand(name)
            if (dict.contains(id)) fail(s"dictionary id clash: $id")
            dict(id) = keys
          }
          Iterator.empty
        } else {
          inPrelude = false
          // series: +name or :dict-id
          val keys =
            if (first.startsWith(":"))
              dict.getOrElse(first.substring(1).trim.toLong,
                fail(s"unknown dictionary id '$first'"))
            else expand(respStr(first))
          // timestamp: +ISO or :ns
          val tsTok = nextNonEmpty()
          val ts =
            if (tsTok.startsWith(":")) tsTok.substring(1).trim.toLong
            else AkuTime.parseTs(respStr(tsTok))
          // value(s): scalar token or *N array (row protocol)
          val vTok = nextNonEmpty()
          if (vTok.startsWith("*")) {
            val n = vTok.substring(1).trim.toInt
            if (n != keys.size)
              fail(s"row width ${keys.size} != value count $n")
            keys.iterator.map { k =>
              sampleOf(k, ts, nextNonEmpty()).head
            }
          } else parseValueToken(vTok, keys, ts).iterator
        }
      }
    }.flatten
  }

  // --- OpenTSDB telnet ----------------------------------------------------

  /** `put metric ts value tag=v ...` — one command per line; stateless,
    * so it distributes as a flatMap. Timestamps: ISO basic, or integer
    * (< 2^32 -> unix seconds, else ns — reference
    * protocolparser.cpp:880-898). */
  def parseOpenTsdb(line: String): Seq[ParsedSample] = {
    val t = line.trim
    if (t.isEmpty) return Nil
    val parts = t.split("\\s+").toSeq
    if (parts.head != "put") fail(s"unknown OpenTSDB command: '${parts.head}'")
    if (parts.size < 5)
      fail(s"put: illegal argument: not enough arguments (need least 4, got ${parts.size - 1})")
    val metric = parts(1)
    val ts = {
      val tok = parts(2)
      if (tok.forall(_.isDigit)) {
        val v = tok.toLong
        if (v < 0xFFFFFFFFL) v * AkuTime.NsPerSec else v
      } else AkuTime.parseTs(tok)
    }
    val value = parts(3).toDouble
    val key = SeriesKey.parse((metric +: parts.drop(4)).mkString(" "))
      .fold(fail, identity)
    Seq(ParsedSample(key.metric, key.tags, ts, value, null))
  }
}
