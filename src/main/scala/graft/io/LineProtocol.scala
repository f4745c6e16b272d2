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

  /** Upper bound on text a wire session may hold SUSPENDED mid-entry
    * (and on a single unterminated line in the transports). Far above
    * any legal entry — names cap at 4096 (AKU_LIMITS_MAX_SNAME), events
    * at 4096, rows at 58 values — so only a hostile or broken client
    * hits it; without the bound a newline-less stream or a drip-fed
    * giant dictionary array accumulates heap without limit (and the
    * carry-compaction copy turns quadratic). */
  val MaxCarryBytes: Int = 1 << 20

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
      private val cur = new RespCursor[T](mk)
      cur.append(content)
      cur.finish()
      def hasNext: Boolean = {
        while (!cur.hasQueued && cur.step()) {}
        cur.hasQueued
      }
      def next(): T = {
        if (!hasNext) throw new NoSuchElementException("end of RESP stream")
        cur.poll()
      }
    }

  private object NeedMore extends scala.util.control.ControlThrowable

  /** Resumable RESP session parser: the single implementation behind both
    * the batch/file path ([[parseRespWith]] — whole session appended, then
    * [[finish]]) and the wire transports, which [[append]] line-bounded
    * chunks as they arrive and [[step]] after each one. An entry left
    * incomplete at the end of the appended text suspends — the cursor
    * rewinds to the entry start and `step` returns false until more text
    * arrives (after [[finish]], a dangling entry is the reference's
    * "unexpected end of stream" error instead). Dictionary inserts and
    * row-protocol samples are staged per entry and committed only when the
    * entry completes, so a replay after suspension cannot double-apply.
    *
    * `strict` mirrors the reference's wire behavior where an EMPTY line is
    * a protocol error (akumulid issue #94; the file path keeps tolerating
    * blank separator lines, which the UDP spool writer emits).
    */
  final class RespCursor[T](mk: (SeriesKey, Long, Double, String) => T,
                            strict: Boolean = false) {
    private var content: String = ""
    private var len = 0
    private var pos = 0
    private var eof = false
    private val dict = new java.util.HashMap[java.lang.Long, Seq[SeriesKey]]()
    private var inPrelude = true // dictionary arrays legal only before data
    private val queue = new java.util.ArrayDeque[T](MaxRowWidth)
    private val staged = new java.util.ArrayList[T](MaxRowWidth)

    /** Append a chunk of session text. Wire callers must cut chunks at a
      * line boundary ('\n' is ASCII, so the cut is UTF-8 safe). */
    def append(chunk: String): Unit = {
      require(!eof, "append after finish")
      // a suspended entry's carry is bounded: batch callers append a
      // whole session in ONE call (carry 0 — no bound applies); a wire
      // session that keeps an entry suspended past MaxCarryBytes is a
      // protocol error, not a heap hazard
      if (len - pos > MaxCarryBytes)
        fail(s"suspended entry exceeds $MaxCarryBytes bytes")
      content = if (pos == 0) {
        if (content.isEmpty) chunk else content + chunk
      } else content.substring(pos) + chunk // drop consumed prefix
      pos = 0
      len = content.length
    }

    /** No more input: a suspended entry now fails instead of waiting. */
    def finish(): Unit = eof = true

    /** Unconsumed tail (the suspended entry's text, if any). */
    def pending: String = content.substring(pos)

    def hasQueued: Boolean = !queue.isEmpty
    def poll(): T = queue.poll()

    // bounds of the current (trimmed, non-empty) line
    private var lStart = 0
    private var lEnd = 0

    private def readLine(): Boolean = {
      while (pos < len) {
        var s = pos
        var e = s
        while (e < len && content.charAt(e) != '\n') e += 1
        if (e == len && !eof) return false // partial line: wait for more
        pos = e + 1
        while (s < e && content.charAt(s) <= ' ') s += 1
        // right-trim CONTROL chars only (the CRLF '\r'): a string body
        // runs verbatim to the line break in the reference's RESP reader,
        // so a trailing SPACE inside an event payload must survive
        // (protocolparser.cpp read_string semantics)
        while (e > s && content.charAt(e - 1) < ' ') e -= 1
        if (e > s) { lStart = s; lEnd = e; return true }
        if (strict) fail("empty line in stream") // akumulid issue #94
      }
      false
    }
    private def requireLine(): Unit =
      if (!readLine()) {
        if (eof) fail("unexpected end of stream") else throw NeedMore
      }

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
        // overflow is a protocol error, not a silent wrap: `:1844...615`
        // (u64 max) must answer -PARSER, not become ts = -1
        if (v > (Long.MaxValue - (c - '0')) / 10) fail(s"integer overflow '$lineStr'")
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
        try java.lang.Double.parseDouble(content.substring(s0, lEnd))
        catch { // NFE must not escape the -PARSER contract (wire fuzz)
          case _: NumberFormatException => fail(s"bad value '$lineStr'")
        }
      }
    }

    private def oneSample(k: SeriesKey, ts: Long): T =
      if (k.isEvent) {
        if (first != '+') fail(s"expected RESP string, got '$lineStr'")
        mk(k, ts, Double.NaN, bodyStr)
      } else if (first == ':' || first == '+')
        mk(k, ts, parseDoubleBody(), null)
      else fail(s"expected RESP string, got '$lineStr'")

    /** Parse ONE protocol entry (dictionary array, data point, or row)
      * into the queue. Returns false when no complete entry is available
      * — end of the appended text, or a suspended partial entry. Throws
      * [[ProtocolParseException]] on a protocol error. */
    def step(): Boolean = {
      val entryStart = pos
      try {
        if (!readLine()) { pos = entryStart; return false }
        val c = first
        if (c == '*' && inPrelude) {
          // dictionary array: N elements = N/2 (name, id) pairs, staged
          // and committed only once the whole array parsed
          val n64 = parseLongBody()
          if (n64 < 0) fail("dictionary array length must be non-negative")
          if (n64 > Int.MaxValue) fail("dictionary array too large")
          val n = n64.toInt // checked above: a `*8589934592` header must
          // not truncate to 0 and leak the entries into the data section
          if (n % 2 != 0) fail("dictionary array length must be even")
          // capacity hint bounded: a hostile `*2000000000` header must
          // not pre-allocate gigabytes before the missing entries fail
          val cap = math.min(n / 2, 1024)
          val ids = new java.util.ArrayList[java.lang.Long](cap)
          val keyss = new java.util.ArrayList[Seq[SeriesKey]](cap)
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
            if (dict.containsKey(id) || ids.contains(id))
              fail(s"dictionary id clash: $id")
            ids.add(id); keyss.add(keys)
            k += 1
          }
          k = 0
          while (k < ids.size) { dict.put(ids.get(k), keyss.get(k)); k += 1 }
        } else {
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
            else if (first == '+')
              // parseTs raises IllegalArgument / DateTimeException on
              // garbage (bad month, overflow): normalize to the protocol
              // error so wire callers keep the -PARSER contract
              try AkuTime.parseTs(bodyStr)
              catch {
                case e if !e.isInstanceOf[ProtocolParseException] &&
                          scala.util.control.NonFatal(e) =>
                  fail(s"bad timestamp '$lineStr'")
              }
            else fail(s"expected RESP string, got '$lineStr'")
          // value(s): scalar token or *N array (row protocol)
          requireLine()
          if (first == '*') {
            val nv = parseLongBody() // compared as Long: a 2^33+2 header
            // must not truncate into a matching width
            if (nv != keys.size.toLong)
              fail(s"row width ${keys.size} != value count $nv")
            staged.clear()
            var k = 0
            while (k < nv) {
              requireLine()
              staged.add(oneSample(keys(k), ts))
              k += 1
            }
            queue.addAll(staged)
            staged.clear()
          } else {
            if (keys.size != 1) fail("scalar value against compound series")
            queue.add(oneSample(keys.head, ts))
          }
          inPrelude = false
        }
        true
      } catch {
        case NeedMore => pos = entryStart; false
        case e: ProtocolParseException =>
          // rewind so `pending` reports the text FROM the bad entry:
          // callers spool/keep exactly the validated prefix
          pos = entryStart
          throw e
      }
    }
  }

  // --- OpenTSDB telnet ----------------------------------------------------

  /** Telnet commands the reference recognizes but does not ingest:
    * rollup/histogram/help/dropcaches fall through the dispatch switch
    * ("just ignore"), stats/version get canned responses at the
    * TRANSPORT layer (protocolparser.cpp:690-742, 942-951). */
  val OpenTsdbIgnoredCommands: Set[String] =
    Set("rollup", "histogram", "help", "dropcaches", "stats", "version")

  /** `put metric ts value tag=v ...` — one command per line; stateless,
    * so it distributes as a flatMap. Timestamps: ISO basic, or integer
    * (< 2^32 -> unix seconds, else ns — reference
    * protocolparser.cpp:880-898). Non-put known commands yield no
    * samples; unknown commands error like the reference's UNKNOWN case
    * (protocolparser.cpp:953-958). */
  def parseOpenTsdb(line: String): Seq[ParsedSample] = {
    val t = line.trim
    if (t.isEmpty) return Nil
    val parts = t.split("\\s+").toSeq
    if (parts.head != "put") {
      if (OpenTsdbIgnoredCommands(parts.head)) return Nil
      fail(s"unknown command: ${parts.head}.  Try `help'.")
    }
    if (parts.size < 5)
      fail(s"put: illegal argument: not enough arguments (need least 4, got ${parts.size - 1})")
    val metric = parts(1)
    val ts =
      try {
        val tok = parts(2)
        if (tok.forall(_.isDigit)) {
          val v = tok.toLong
          if (v < 0xFFFFFFFFL) v * AkuTime.NsPerSec else v
        } else AkuTime.parseTs(tok)
      } catch { // keep telnet's `error:` contract on garbage timestamps
        case e if !e.isInstanceOf[ProtocolParseException] &&
                  scala.util.control.NonFatal(e) =>
          fail(s"put: illegal argument: invalid timestamp '${parts(2)}'")
      }
    val value =
      try parts(3).toDouble
      catch {
        case _: NumberFormatException =>
          fail(s"put: illegal argument: invalid value '${parts(3)}'")
      }
    val key = SeriesKey.parse((metric +: parts.drop(4)).mkString(" "))
      .fold(fail, identity)
    Seq(ParsedSample(key.metric, key.tags, ts, value, null))
  }
}
