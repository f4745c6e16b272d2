package graft

import org.apache.spark.sql.functions._

import graft.ast.QueryJson
import graft.plan.{Planner, TsStore}

/** Giant-series skew (SURVEY §7.4 risk 5): per-series pipeline nodes
  * partition by sname, so ONE series with millions of points serializes
  * into one task. These tests document that the single-task path stays
  * LINEAR and spill-safe — window nodes use bounded running frames
  * (UnsafeExternalSorter spills past the buffer threshold) and the
  * stateful/sax nodes are one-pass iterators with O(1)/O(width) state —
  * rather than degrading quadratically or OOMing. Timings land on
  * stderr for the record; the assertion is a generous linearity bound,
  * not a microbenchmark. */
class SkewSpec extends SparkFunSuite {

  private val N = 10000000L // one 10M-point series, ts = i seconds, v = i
  private val T0 = 1700000000000000000L

  private lazy val store: TsStore = {
    val sp = spark
    val giant = sp.range(N).select(
      lit("giant").as("metric"),
      map(lit("host"), lit("g0")).as("tags"),
      (lit(T0) + col("id") * 1000000000L).as("ts"),
      col("id").cast("double").as("value"))
    new TsStore(giant)
  }

  private def q(json: String) =
    Planner.plan(QueryJson.parse(json), store).df

  private def timed[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    Console.err.println(
      f"SKEW $label%-12s ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  private val range = s""""range":{"from":$T0,"to":${T0 + N * 1000000000L}}"""

  test("10M-point single series: windowed rate stays linear") {
    val df = q(s"""{"select":"giant",$range,
                  |"apply":[{"name":"rate"}]}""".stripMargin)
    // dx/dt = 1.0 for every step after the first (ts step 1s, value step 1)
    val agg = timed("rate") {
      df.agg(count(lit(1)), sum(when(col("value") === 1.0, 1).otherwise(0)))
        .head()
    }
    assert(agg.getLong(0) == N)
    assert(agg.getLong(1) == N - 1)
  }

  test("10M-point single series: sma window stays linear") {
    val df = q(s"""{"select":"giant",$range,
                  |"apply":[{"name":"sma","window-width":10}]}""".stripMargin)
    // trailing-10 mean of a ramp is i - 4.5 once the window fills
    val agg = timed("sma") {
      df.filter(col("ts") >= T0 + 9L * 1000000000L)
        .agg(count(lit(1)),
          sum(when(col("value") === (col("ts") - T0) / 1e9 - 4.5, 1)
            .otherwise(0)))
        .head()
    }
    assert(agg.getLong(0) == N - 9)
    assert(agg.getLong(1) == N - 9)
  }

  test("10M-point single series: stateful ewma stays one-pass") {
    val df = q(s"""{"select":"giant",$range,
                  |"apply":[{"name":"ewma","decay":0.9}]}""".stripMargin)
    val n = timed("ewma")(df.count())
    assert(n == N)
  }

  test("10M-point single series: sax encodes one-pass with tiny output") {
    val df = q(s"""{"select":"giant",$range,
                  |"apply":[{"name":"sax","alphabet_size":5,"window_width":8}]}""".stripMargin)
    // every window of the ramp z-normalizes identically -> numerosity
    // reduction collapses the whole series to ONE word
    val rows = timed("sax")(df.collect())
    assert(rows.length == 1)
  }

  // ---- giant-DOCUMENT skew ------------------------------------------------
  // The text twin of the giant-series risk: one multi-MB document's
  // shingle set is a multi-million-element hash array inside ONE row
  // (single-task signature work, row-size pressure on every shuffle
  // carrying it). The reference engine refuses the regime outright
  // (4096-byte event-payload cap, include/akumuli_def.h:120); we accept
  // unbounded text, so these cases prove (a) the uncapped path stays
  // LINEAR on a ~7 MB doc, (b) the maxDocChars valve bounds a ~55 MB
  // doc to prefix-scale work without losing its dup pair, (c) capped
  // and uncapped results are IDENTICAL when no doc exceeds the cap, and
  // (d) the span-trim explode survives a 2M-token doc.

  import graft.llm.Dedup

  /** Deterministic pseudo-random word stream (~7 bytes/token): an
    * independent 30000-word vocabulary draw per salt, so docs with
    * different salts share essentially no trigram shingles (an
    * arithmetic progression mod vocab would alias every doc onto the
    * SAME 30000 trigrams and pair everything with everything). */
  private def words(n: Int, salt: Long = 0L): String = {
    val rnd = new java.util.SplittableRandom(salt)
    val sb = new StringBuilder(n * 7)
    var i = 0
    while (i < n) {
      sb.append('w').append(rnd.nextInt(30000))
      sb.append(' ')
      i += 1
    }
    sb.result()
  }

  test("7MB single document: uncapped minhash dedup stays linear") {
    val sp = spark
    import sp.implicits._
    val base = words(1000000) // ~7 MB, 1M tokens
    val nearDup = base.substring(0, (base.length * 0.9).toInt) +
      words(100000, salt = 99) // 90% shared prefix -> jaccard ~0.8
    val docs = (Seq((1L, base), (2L, nearDup)) ++
      (10L until 30L).map(i => (i, words(200, salt = i)))).toDF("doc_id", "text")
    // bands*rowsPerBand = 16 signature hashes: 16 passes over a
    // 1M-element hash array per giant doc — linear, one task each
    val pairs = timed("giant-lsh") {
      Dedup.minhashLsh(docs, n = 3, bands = 8, rowsPerBand = 2,
        threshold = 0.5).select("a", "b").as[(Long, Long)].collect().toSet
    }
    assert(pairs.contains((1L, 2L)),
      s"giant near-dup pair must survive the uncapped path: $pairs")
  }

  test("55MB single document: maxDocChars valve bounds signature work") {
    val sp = spark
    import sp.implicits._
    val base = words(8000000) // ~55 MB, 8M tokens
    val nearDup = base + words(1000, salt = 7) // shared 55MB prefix
    val docs = (Seq((1L, base), (2L, nearDup)) ++
      (10L until 30L).map(i => (i, words(200, salt = i)))).toDF("doc_id", "text")
    val pairs = timed("giant-capped") {
      Dedup.minhashLsh(docs, n = 3, bands = 8, rowsPerBand = 2,
        threshold = 0.5, maxDocChars = 200000)
        .select("a", "b").as[(Long, Long)].collect().toSet
    }
    // prefix fingerprinting: identical within the cap => found at j=1.0
    assert(pairs.contains((1L, 2L)),
      s"prefix-identical giants must pair under the cap: $pairs")
  }

  test("capped == uncapped when no document exceeds the cap") {
    val sp = spark
    import sp.implicits._
    val docs = (0L until 200L).map { i =>
      // 40 dup families of 5 members: member 0 exact base, others with
      // a distinct short suffix -> organic near-dup structure
      val fam = i % 40
      (i, words(300, salt = fam) + words(10, salt = 1000 + i))
    }.toDF("doc_id", "text")
    def run(cap: Int) =
      Dedup.minhashLsh(docs, n = 3, bands = 16, rowsPerBand = 2,
        threshold = 0.5, maxDocChars = cap)
        .select("a", "b", "jaccard").as[(Long, Long, Double)]
        .collect().toSet
    val uncapped = run(Int.MaxValue)
    val capped = timed("cap-equiv")(run(100000)) // every doc < 100k chars
    assert(uncapped.nonEmpty, "corpus must produce organic pairs")
    assert(capped == uncapped,
      "valve must be a no-op when every doc fits under the cap")
  }

  test("2M-token single document: span-trim explode stays linear") {
    val sp = spark
    import sp.implicits._
    val span = words(1000, salt = 5)
    // the same 1000-token span planted at both ends of a 2M-token doc:
    // the second occurrence's windows must be cut, first kept
    val giant = span + words(2000000, salt = 3) + span
    val docs = Seq((1L, giant)).toDF("doc_id", "text")
    val out = timed("giant-trim") {
      Dedup.trimDuplicateSpans(docs, k = 8).select("n_removed")
        .as[Int].head()
    }
    // every window of the trailing copy is a duplicate of the leading
    // copy's window at the same offset -> the full 1000-token tail goes
    assert(out >= 1000, s"trailing planted span must be trimmed: $out")
  }
}
