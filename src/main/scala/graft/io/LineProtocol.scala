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

  /** Parse one RESP session from pre-split lines (delegates to
    * [[parseRespText]]; the cursor scanner is the single implementation). */
  def parseResp(lines: Iterator[String]): Iterator[ParsedSample] =
    parseRespText(lines.mkString("\n"))

  /** Parse one RESP session. Supports the data-point protocol, the row
    * protocol (`*N` value arrays against compound names), and the session
    * dictionary (leading `*N` arrays of name/:id pairs; `:id` then
    * substitutes for a series name).
    *
    * Single-pass cursor scanner over the raw text: no per-line Strings, no
    * tokenizer allocations — the only allocations on the data-point hot
    * path are the emitted [[ParsedSample]] and (for non-integer values)
    * one substring handed to `Double.parseDouble`, which is kept for
    * bit-exact IEEE parsing. This is what lets the Spark ingest path match
    * the reference's multi-million-samples/s wire parse
    * (akumulid/protocolparser.cpp:1-977, perftests/perf_respstream.cpp).
    */
  def parseRespText(content: String): Iterator[ParsedSample] =
    parseRespWith(content,
      (k, ts, v, ev) => ParsedSample(k.metric, k.tags, ts, v, ev))

  /** [[parseRespText]] with a caller-supplied sample factory. A factory
    * that caches per-[[SeriesKey]] derived state (canonical name, flattened
    * tag values) pays the derivation once per series, not once per sample —
    * dictionary-protocol sessions reuse one `SeriesKey` instance for every
    * point of a series, so an identity map suffices. */
  def parseRespWith[T](content: String,
                       mk: (SeriesKey, Long, Double, String) => T): Iterator[T] =
    new scala.collection.AbstractIterator[T] {
      private val len = content.length
      private var pos = 0
      private val dict = new java.util.HashMap[java.lang.Long, Seq[SeriesKey]]()
      private var inPrelude = true // dictionary arrays legal only before data
      private val queue = new java.util.ArrayDeque[T](MaxRowWidth)

      // bounds of the current (trimmed, non-empty) line
      private var lStart = 0
      private var lEnd = 0

      private def readLine(): Boolean = {
        while (pos < len) {
          var s = pos
          var e = s
          while (e < len && content.charAt(e) != '\n') e += 1
          pos = e + 1
          while (s < e && content.charAt(s) <= ' ') s += 1
          // right-trim CONTROL chars only (the CRLF '\r'): a string body
          // runs verbatim to the line break in the reference's RESP reader,
          // so a trailing SPACE inside an event payload must survive
          // (protocolparser.cpp read_string semantics)
          while (e > s && content.charAt(e - 1) < ' ') e -= 1
          if (e > s) { lStart = s; lEnd = e; return true }
        }
        false
      }
      private def requireLine(): Unit =
        if (!readLine()) fail("unexpected end of stream")

      private def first: Char = content.charAt(lStart)
      private def lineStr: String = content.substring(lStart, lEnd)
      /** Body after the one-char type prefix, left-trimmed. */
      private def bodyStr: String = {
        var s = lStart + 1
        while (s < lEnd && content.charAt(s) <= ' ') s += 1
        content.substring(s, lEnd)
      }

      /** In-place integer parse of the body (no substring). */
      private def parseLongBody(): Long = {
        var i = lStart + 1
        while (i < lEnd && content.charAt(i) <= ' ') i += 1
        var neg = false
        if (i < lEnd && (content.charAt(i) == '-' || content.charAt(i) == '+')) {
          neg = content.charAt(i) == '-'; i += 1
        }
        if (i >= lEnd) fail(s"bad integer '$lineStr'")
        var v = 0L
        while (i < lEnd) {
          val c = content.charAt(i)
          if (c < '0' || c > '9') fail(s"bad integer '$lineStr'")
          v = v * 10 + (c - '0')
          i += 1
        }
        if (neg) -v else v
      }

      /** Double parse of the body: pure-digit bodies (the common `:123`
        * integer value) parse in place; anything else — signs, `.`,
        * exponents — goes through `Double.parseDouble` on one substring so
        * rounding is bit-identical to the JDK. */
      private def parseDoubleBody(): Double = {
        var i = lStart + 1
        while (i < lEnd && content.charAt(i) <= ' ') i += 1
        val s0 = i
        var v = 0L
        var ok = i < lEnd
        while (ok && i < lEnd) {
          val c = content.charAt(i)
          if (c >= '0' && c <= '9' && v <= 922337203685477579L) {
            v = v * 10 + (c - '0'); i += 1
          } else ok = false
        }
        if (ok) v.toDouble
        else {
          if (s0 >= lEnd) fail(s"bad value '$lineStr'")
          java.lang.Double.parseDouble(content.substring(s0, lEnd))
        }
      }

      private def oneSample(k: SeriesKey, ts: Long): T =
        if (k.isEvent) {
          if (first != '+') fail(s"expected RESP string, got '$lineStr'")
          mk(k, ts, Double.NaN, bodyStr)
        } else if (first == ':' || first == '+')
          mk(k, ts, parseDoubleBody(), null)
        else fail(s"expected RESP string, got '$lineStr'")

      private def fillQueue(): Unit =
        while (queue.isEmpty && readLine()) {
          val c = first
          if (c == '*' && inPrelude) {
            // dictionary array: N elements = N/2 (name, id) pairs
            val n = parseLongBody().toInt
            if (n % 2 != 0) fail("dictionary array length must be even")
            var k = 0
            while (k < n / 2) {
              requireLine()
              if (first != '+') fail(s"expected RESP string, got '$lineStr'")
              val name = bodyStr
              requireLine()
              if (first != ':')
                fail(s"dictionary id must be integer, got '$lineStr'")
              val id = parseLongBody()
              val keys = expand(name)
              if (dict.containsKey(id)) fail(s"dictionary id clash: $id")
              dict.put(id, keys)
              k += 1
            }
          } else {
            inPrelude = false
            // series: +name or :dict-id
            val keys: Seq[SeriesKey] =
              if (c == ':') {
                val ks = dict.get(parseLongBody())
                if (ks == null) fail(s"unknown dictionary id '$lineStr'")
                ks
              } else if (c == '+') expand(bodyStr)
              else fail(s"expected RESP string, got '$lineStr'")
            // timestamp: +ISO or :ns
            requireLine()
            val ts =
              if (first == ':') parseLongBody()
              else if (first == '+') AkuTime.parseTs(bodyStr)
              else fail(s"expected RESP string, got '$lineStr'")
            // value(s): scalar token or *N array (row protocol)
            requireLine()
            if (first == '*') {
              val nv = parseLongBody().toInt
              if (nv != keys.size)
                fail(s"row width ${keys.size} != value count $nv")
              var k = 0
              while (k < nv) {
                requireLine()
                queue.add(oneSample(keys(k), ts))
                k += 1
              }
            } else {
              if (keys.size != 1) fail("scalar value against compound series")
              queue.add(oneSample(keys.head, ts))
            }
          }
        }

      def hasNext: Boolean = { if (queue.isEmpty) fillQueue(); !queue.isEmpty }
      def next(): T = {
        if (!hasNext) throw new NoSuchElementException("end of RESP stream")
        queue.poll()
      }
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
