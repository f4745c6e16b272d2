package graft

import org.apache.spark.sql.functions._

import graft.llm.{Embed, Text}

/** Round-5 curation additions: character entropy, perplexity bucketing,
  * signed random projection, and the k-NN graph (brute + IVF-celled). */
class CurationSpec extends SparkFunSuite {

  private lazy val sp = spark
  import sp.implicits._

  test("encodingNoise: each damage class counted once, C1 follower " +
      "never double-counted as mojibake") {
    val docs = Seq(
      (1L, "clean text here"),
      (2L, "bad \uFFFD char \uFFFD"),
      (3L, "cafÃ© ole"),        // Ã© -> mojibake
      (4L, "x\u0085y"),                   // NEL -> C1
      (5L, "stra\u00C3\u009Fe"))          // Ã + C1 follower: c1 only
      .toDF("doc_id", "text")
    val r = Text.encodingNoise(docs).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r(1L) == ((0L, 0L, 0L)))
    assert(r(2L) == ((2L, 0L, 0L)))
    assert(r(3L) == ((0L, 0L, 1L)))
    assert(r(4L) == ((0L, 1L, 0L)))
    assert(r(5L) == ((0L, 1L, 0L)))
    val rate = Text.encodingNoise(docs).filter($"doc_id" === 4)
      .head().getDouble(5)
    assert(rate == math.rint(1.0 / 3.0 * 1e6) / 1e6 ||
      math.abs(rate - 0.333333) < 1e-9)
  }

  test("calibrationReport: hand-computed confusion + ratios, empty sides") {
    // scores .1 .4 .6 .9 / labels F T F T
    val scored = Seq((0.1, false), (0.4, true), (0.6, false), (0.9, true))
      .toDF("score", "label")
    val r = Text.calibrationReport(scored, "label",
      thresholds = Seq(0.5, 0.95))
      .collect().map(x => x.getDouble(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getDouble(5), x.getDouble(6), x.getDouble(7)))).toMap
    // t=0.5: pred {.6,.9} -> tp=1 fp=1 fn=1 tn=1; p=r=f1=0.5
    assert(r(0.5) == ((1L, 1L, 1L, 1L, 0.5, 0.5, 0.5)))
    // t=0.95: nothing predicted -> tp=fp=0, fn=2, tn=2; p=0 r=0 f1=0
    assert(r(0.95) == ((0L, 0L, 2L, 2L, 0.0, 0.0, 0.0)))
  }

  test("interleave: vt density follows rates; missing strata dropped; " +
      "deterministic") {
    val sp2 = sp
    val docs = (0 until 3000).map(i =>
      (i.toLong, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("doc_id", "stratum")
    val r = graft.llm.Sample.interleave(docs, "stratum",
      Map("a" -> 4.0, "b" -> 1.0), seed = "s")
    val rows = r.orderBy($"vt", $"doc_id").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getDouble(2)))
    assert(!rows.exists(_._2 == "c")) // unknown stratum dropped
    assert(rows.length == 2000)
    // the first chunk of the schedule should be ~4:1 a-to-b
    val head = rows.take(500)
    val aShare = head.count(_._2 == "a").toDouble / head.length
    assert(aShare > 0.7 && aShare < 0.9, s"a share $aShare")
    // deterministic: same seed -> same vt per id
    val again = graft.llm.Sample.interleave(docs, "stratum",
      Map("a" -> 4.0, "b" -> 1.0), seed = "s")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    rows.foreach { case (id, _, vt) => assert(again(id) == vt) }
  }

  test("charEntropy: hand-computed values, code points, empty/null") {
    val df = Seq(
      (1L, "aaaa"),         // one symbol -> 0 bits
      (2L, "abab"),         // two equiprobable -> 1 bit
      (3L, "abcd"),         // four equiprobable -> 2 bits
      (4L, ""),             // empty -> 0
      (5L, "aéaé"), // 2-byte code points count once each
      (6L, "😀😀ab")) // surrogate pair = ONE symbol
      .toDF("doc_id", "text")
    val r = Text.charEntropyReport(df).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) == 0.0 && r(4L) == 0.0)
    assert(math.abs(r(2L) - 1.0) < 1e-9)
    assert(math.abs(r(3L) - 2.0) < 1e-9)
    assert(math.abs(r(5L) - 1.0) < 1e-9)
    // emoji emoji a b = {2,1,1}/4 -> 1.5 bits (code-point counting; a
    // UTF-16-unit count would see 6 symbols and get this wrong)
    assert(math.abs(r(6L) - 1.5) < 1e-9)
    // null text -> null entropy (not 0)
    val withNull = Seq((9L, null: String)).toDF("doc_id", "text")
    assert(Text.charEntropyReport(withNull).collect().head.isNullAt(1))
  }

  test("perplexityBuckets: per-group terciles, deterministic tie-break") {
    // 9 docs in one group: clean text scores low perplexity under the
    // corpus-trained bigram LM, junk scores high
    val docs = (0 until 6).map(i => (i.toLong, "g", "the quick brown fox " * 3)) ++
      Seq((6L, "g", "zq xv jk wp"), (7L, "g", "qqq zzz xxx"),
        (8L, "g", "aaaa bbbb cccc"))
    val df = docs.toDF("doc_id", "source", "text")
    val r = Text.perplexityBuckets(df, Seq("source"), nBuckets = 3)
      .collect().map(x => (x.getLong(0), x.getInt(3))).toMap
    assert(r.values.toSeq.sorted == Seq(1, 1, 1, 2, 2, 2, 3, 3, 3))
    // the 6 identical clean docs tie on perplexity; ntile's doc-id
    // tie-break puts the LOWEST ids in bucket 1 deterministically
    val again = Text.perplexityBuckets(df, Seq("source"), nBuckets = 3)
      .collect().map(x => (x.getLong(0), x.getInt(3))).toMap
    assert(r == again)
    // junk docs land in the tail bucket
    assert(r(6L) == 3 || r(7L) == 3)
  }

  test("Rank.ntileBucket == SQL ntile window for every group size, " +
      "ties included, across many shuffle partitions") {
    // group sizes straddle the bucket count (N < n, N == n, N ≫ n) and
    // values collide heavily so the id tie-break is load-bearing; the
    // frame spans all 32 shuffle partitions so the per-(pid, group)
    // offset arithmetic is exercised across real partition boundaries
    val rnd = new scala.util.Random(7)
    val rows = (Seq.tabulate(2)(i => (i.toLong, "tiny", rnd.nextInt(3))) ++
      Seq.tabulate(4)(i => (100L + i, "exact", rnd.nextInt(2))) ++
      Seq.tabulate(997)(i => (1000L + i, "big", rnd.nextInt(5))) ++
      Seq.tabulate(503)(i => (10000L + i, "odd", rnd.nextInt(4))))
    val df = rows.toDF("id", "grp", "v").repartition(32)
    for (n <- Seq(2, 3, 4, 7)) {
      val got = graft.llm.Rank
        .ntileBucket(df, Seq("grp"), Seq(col("v"), col("id")), n, "b")
        .select("id", "b").as[(Long, Int)].collect().toMap
      val want = df.select(col("id"), ntile(n).over(
          org.apache.spark.sql.expressions.Window.partitionBy("grp")
            .orderBy(col("v"), col("id"))).as("b"))
        .as[(Long, Int)].collect().toMap
      assert(got == want, s"ntile($n) mismatch")
    }
  }

  test("Rank.stagedTopN == plain window top-n: constant and per-group " +
      "bounds, heavy skew, rank values, salts straddling group sizes") {
    // one group holds ~80% of the frame (the hot-domain shape the
    // staging exists for); values collide so the id tie-break is
    // load-bearing; spans all 32 shuffle partitions
    val rnd = new scala.util.Random(11)
    val rows = (Seq.tabulate(800)(i => (i.toLong, "hot", rnd.nextInt(4))) ++
      Seq.tabulate(150)(i => (2000L + i, "warm", rnd.nextInt(4))) ++
      Seq.tabulate(3)(i => (5000L + i, "tiny", rnd.nextInt(2))))
    val df = rows.toDF("id", "grp", "v").repartition(32)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("grp")
      .orderBy(col("v"), col("id"))
    for (n <- Seq(1, 5, 37); salts <- Seq(1, 8, 64)) {
      val got = graft.llm.Rank.stagedTopN(df, Seq(col("grp")),
          Seq(col("v"), col("id")), lit(n), saltKey = col("id"),
          rankCol = Some("rk"), salts = salts)
        .select("id", "rk").as[(Long, Long)].collect().toMap
      val want = df.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= n)
        .select("id", "rk").as[(Long, Long)].collect().toMap
      assert(got == want, s"stagedTopN(n=$n, salts=$salts) mismatch")
    }
    // per-group bound expression (the takeExact shape): hot capped at 3,
    // tiny uncapped via the default arm
    val nMap = map(lit("hot"), lit(3), lit("warm"), lit(10))
    val nExpr = coalesce(try_element_at(nMap, col("grp")),
      lit(Int.MaxValue))
    val got2 = graft.llm.Rank.stagedTopN(df, Seq(col("grp")),
        Seq(col("v"), col("id")), nExpr, saltKey = col("id"))
      .select("id").as[Long].collect().sorted.toSeq
    val want2 = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= nExpr)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got2 == want2, "per-group-bound stagedTopN mismatch")
    assert(got2.size == 3 + 10 + 3, "expected hot=3, warm=10, tiny=all")
  }

  test("randomProjectSigned: matches a driver-side ±1 matrix multiply") {
    val rnd = new scala.util.Random(3)
    val vecs = (0 until 20).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val planes = Embed.signedProjection(16, 4)
    assert(planes.flatten.forall(x => x == 1.0 || x == -1.0))
    // the parity matrix is balanced-ish (md5 uniformity), not constant
    val plus = planes.flatten.count(_ == 1.0)
    assert(plus > 16 && plus < 48, s"suspicious sign balance: $plus/64")
    val got = Embed.randomProjectSigned(df, outDim = 4, vecCol = "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    vecs.foreach { case (id, v) =>
      val want = planes.map(p =>
        p.zip(v).map { case (r, x) => r * x.toDouble }.sum)
      got(id).zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-9, s"vec $id") }
    }
    // deterministic across invocations (no RNG state anywhere)
    assert(Embed.signedProjection(16, 4) == planes)
  }

  test("powerComponent: converges to the dominant axis; bounded state") {
    // balanced ±1 second coordinate -> X^T X = diag(36, 4): top
    // right-singular direction is exactly (1, 0) with eigenvalue
    // estimate |X^T X v| / n = 36 / 4 = 9
    val df = Seq(
      (1L, Seq(3.0f, 1.0f)),
      (2L, Seq(3.0f, -1.0f)),
      (3L, Seq(3.0f, 1.0f)),
      (4L, Seq(3.0f, -1.0f)),
      (5L, Seq(0.0f, 0.0f))) // zero vector: excluded
      .toDF("vec_id", "embedding")
    val r = Embed.powerComponent(df, iters = 8).orderBy("dim").collect()
      .map(x => (x.getInt(0), x.getDouble(1), x.getDouble(2)))
    assert(r.length == 2)
    assert(math.abs(r(0)._2 - 1.0) < 1e-3, s"w0 ${r(0)._2}")
    assert(math.abs(r(1)._2) < 1e-3, s"w1 ${r(1)._2}")
    assert(math.abs(r(0)._3 - 9.0) < 0.2, s"eigenvalue ${r(0)._3}")
    // deterministic: rounded per-iteration state leaves nothing to
    // summation-order luck
    val again = Embed.powerComponent(df, iters = 8).orderBy("dim")
      .collect().map(x => (x.getInt(0), x.getDouble(1), x.getDouble(2)))
    assert(r.toSeq == again.toSeq)
  }

  test("knnGraph: exact top-k, self excluded, zero vectors dropped") {
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)),
      (4L, Seq(-1.0f, 0.0f)),
      (5L, Seq(0.0f, 0.0f))) // zero norm: excluded entirely
    val df = rows.toDF("vec_id", "embedding")
    val r = Embed.knnGraph(df, k = 2).collect()
      .map(x => ((x.getLong(0), x.getLong(3)), x.getLong(1))).toMap
    assert(!r.keys.exists(_._1 == 5L) && !r.values.exists(_ == 5L))
    assert(r((1L, 1L)) == 2L)         // nearest to (1,0) is (0.9,0.1)
    assert(r((1L, 2L)) == 3L)         // then the orthogonal one
    assert(r((4L, 1L)) == 3L)         // (-1,0): orthogonal beats opposite
    // every query gets exactly k neighbors
    assert(r.keys.groupBy(_._1).forall(_._2.size == 2))
  }

  test("vadAudio: real WAV silence/tone segmentation; fake and bad paths") {
    import org.apache.spark.sql.Row
    import graft.llm.Multimodal
    import javax.sound.sampled._
    // 8000 Hz mono WAV: 0.5s silence, 1s tone, 0.5s silence, 0.5s tone
    val rate = 8000
    val seg = Seq((0.0, 4000), (0.5, 8000), (0.0, 4000), (0.5, 4000))
    val pcm = new java.io.ByteArrayOutputStream()
    seg.foreach { case (amp, n) =>
      (0 until n).foreach { i =>
        val s = math.round(math.sin(2 * math.Pi * 440 * i / rate)
          * amp * 32767).toInt
        pcm.write(s & 0xff); pcm.write((s >> 8) & 0xff)
      }
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm.toByteArray), fmt,
      (pcm.size() / 2).toLong), AudioFileFormat.Type.WAVE, bos)
    val corrupt = "RIFF0000WAVE".getBytes("UTF-8") ++
      Array.fill[Byte](8)(0x7f)
    val rows = Seq(
      Row(1L, "audio", bos.toByteArray, "audio/wav", null, null, 0L, "w"),
      Row(2L, "audio", corrupt, "audio/wav", null, null, 0L, "bad"),
      Row(3L, "audio", Array.fill[Byte](40)(100), "fake", null, null, 0L, "f"))
    val media = sp.createDataFrame(
      sp.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    // frame = 400 samples (50ms): 20000 samples = 50 frames, 30 toned
    val r = Multimodal.vadAudio(media, frame = 400, thresholdFrac = 0.5)
      .collect().map(x => x.getLong(0) -> x).toMap
    val w = r(1L)
    assert(w.getBoolean(5))
    assert(w.getInt(1) == 50)
    // tone frames voiced, silence frames not: 20 + 10 voiced, longest
    // run = the 1s tone block = 20 frames
    assert(w.getInt(2) == 30, s"n_voiced ${w.getInt(2)}")
    assert(w.getInt(4) == 20, s"max_run ${w.getInt(4)}")
    assert(math.abs(w.getDouble(3) - 0.6) < 1e-9)
    // corrupt WAV: decode failure, not a fake fallback
    assert(!r(2L).getBoolean(5) && r(2L).isNullAt(1))
    // 40 fake bytes < one 400-sample frame: too short -> vad_ok=false
    assert(!r(3L).getBoolean(5))
    // rerun with frame=8: 5 full frames of CONSTANT bytes -> every frame
    // rms equals the global rms (> 0.5x threshold) -> all voiced
    val f8 = Multimodal.vadAudio(media, frame = 8, thresholdFrac = 0.5)
      .collect().map(x => x.getLong(0) -> x).toMap
    val f = f8(3L)
    assert(f.getBoolean(5) && f.getInt(1) == 5 && f.getInt(2) == 5 &&
      f.getInt(4) == 5)
  }

  test("annRecall: probing every cell gives recall 1; fewer probes less") {
    val rnd = new scala.util.Random(13)
    val vecs = (0 until 40).map { i =>
      val base = Array.fill(8)(rnd.nextFloat() * 0.2f)
      base(i % 4) = 1.0f // four clusters on four axes
      (i.toLong, base.toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val cents = (0 until 4).map(a =>
      Seq.tabulate(8)(j => if (j == a) 1.0 else 0.0))
    val full = Embed.annRecall(df, k = 3, cents, probes = 4,
      queryIds = (0L until 10L).toSeq).collect().head
    assert(full.getDouble(4) == 1.0, s"full-probe recall ${full.getDouble(4)}")
    assert(full.getLong(0) == 10L && full.getLong(2) == 30L)
    val one = Embed.annRecall(df, k = 3, cents, probes = 1,
      queryIds = (0L until 10L).toSeq).collect().head
    assert(one.getDouble(4) <= 1.0 && one.getDouble(4) > 0.3)
  }

  test("vocabGrowth: first batch is all-new, repeats are not new") {
    import graft.llm.Text
    // batch 0 (ids 0,1): two docs, disjoint vocab; batch 1 (ids 2,3):
    // doc 2 repeats doc 0's text, doc 3 brings one new shingle
    val df = Seq(
      (0L, "a b c d"),           // shingles: "a b c", "b c d"
      (1L, "x y z w"),           // "x y z", "y z w"
      (2L, "a b c d"),           // all seen
      (3L, "q r s"))             // "q r s" (new)
      .toDF("doc_id", "text")
    val r = Text.vocabGrowth(df, n = 3, batch = 2L)
      .orderBy("batch").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq((0L, 4L, 4L, 1.0), (2L, 3L, 1L, 0.333333)))
  }

  test("embedOutliers: only vectors far from every centroid") {
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),   // on centroid 0
      (2L, Seq(0.0f, 1.0f, 0.0f)),   // on centroid 1
      (3L, Seq(0.0f, 0.0f, 1.0f)),   // orthogonal to both -> outlier
      (4L, Seq(0.7f, 0.7f, 0.0f)))   // between, but cos ~0.7 to each
    val cents = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0))
    val r = Embed.embedOutliers(rows.toDF("vec_id", "embedding"), cents,
        threshold = 0.5)
      .collect().map(x => (x.getLong(0), x.getDouble(2)))
    assert(r.map(_._1).toSeq == Seq(3L))
    assert(r.head._2 == 0.0)
  }

  test("clusterStats: per-cell member counts and cosine spread") {
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.8f, 0.6f)),  // cell 0 members
      (3L, Seq(0.0f, 1.0f)),                          // cell 1
      (4L, Seq(0.0f, 0.0f)))                          // zero: excluded
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val r = Embed.clusterStats(rows.toDF("vec_id", "embedding"), cents)
      .orderBy("cell").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getDouble(2),
        x.getDouble(3), x.getDouble(4)))
    assert(r.length == 2)
    assert(r(0)._1 == 0 && r(0)._2 == 2L)
    assert(r(0)._4 == 0.8 && r(0)._5 == 1.0)   // min/max member cosine
    assert(math.abs(r(0)._3 - 0.9) < 1e-9)     // mean of {1.0, 0.8}
    assert(r(1) == ((1, 1L, 1.0, 1.0, 1.0)))
  }

  test("normalizeScores: per-group percent rank and z; flat group null z") {
    import graft.llm.Sample
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 7.0), (5L, "b", 7.0)) // constant group
      .toDF("doc_id", "source", "s")
    val r = Sample.normalizeScores(df, Seq("source"), col("s"))
      .collect().map(x => x.getLong(0) ->
        (x.getDouble(3), if (x.isNullAt(4)) None else Some(x.getDouble(4))))
      .toMap
    assert(r(1L)._1 == 0.0 && r(2L)._1 == 0.5 && r(3L)._1 == 1.0)
    assert(math.abs(r(2L)._2.get) < 1e-9)        // the mean has z 0
    assert(math.abs(r(3L)._2.get - 1.0) < 1e-9)  // +1 sd
    // constant group: percent_rank still ranks (id tie-break), z null
    assert(r(4L)._1 == 0.0 && r(5L)._1 == 1.0)
    assert(r(4L)._2.isEmpty && r(5L)._2.isEmpty)
  }

  test("crossDupPairs: only cross-side pairs, A-side always first") {
    import graft.llm.Dedup
    val base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    val a = Seq((1L, base), (2L, "totally different words here now ok " * 4))
      .toDF("doc_id", "text")
    val b2 = Seq((10L, base), (11L, base + "extra trailing tokens"))
      .toDF("doc_id", "text")
    val r = Dedup.crossDupPairs(a, b2, threshold = 0.5)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r.contains((1L, 10L)))
    assert(r.forall { case (ia, ib) => ia < 10L && ib >= 10L })
    assert(!r.exists(_._1 == 2L))
  }

  test("dupMatrix: normalized source-pair cells with counts") {
    import graft.llm.Dedup
    val base = "one two three four five six seven eight nine ten " * 3
    val docs = Seq(
      (1L, "sA", base), (2L, "sB", base),           // cross A-B pair
      (3L, "sB", base + "tail"), (4L, "sC", "a b c d e f g h i j " * 3))
      .toDF("doc_id", "source", "text")
    val r = Dedup.dupMatrix(docs, "source", threshold = 0.5)
      .orderBy("src_a", "src_b").collect()
      .map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
    // pairs: (1,2) A-B, (1,3) A-B, (2,3) B-B; doc 4 shares nothing
    assert(r(("sA", "sB")) == 2L)
    assert(r(("sB", "sB")) == 1L)
    assert(!r.keys.exists(k => k._1 == "sC" || k._2 == "sC"))
  }

  test("dedupKeepBest: one survivor per cluster, singletons untouched") {
    import graft.llm.Dedup
    val docs = Seq(
      (1L, "short", 5.0), (2L, "longer copy", 11.0), (3L, "other", 9.0),
      (4L, "tie a", 7.0), (5L, "tie b", 7.0),   // equal quality: min id
      (9L, "unique", 3.0))
      .toDF("doc_id", "text", "q")
    val clusters = Seq((1L, 1L), (2L, 1L), (4L, 4L), (5L, 4L))
      .toDF("node", "component")
    val kept = Dedup.dedupKeepBest(docs, clusters, col("q"))
      .select("doc_id").as[Long].collect().toSet
    // cluster {1,2}: 2 wins on quality; cluster {4,5}: tie -> 4;
    // 3 and 9 were never clustered -> kept
    assert(kept == Set(2L, 4L, 3L, 9L))
  }

  test("knnClusters: mutual edges only; hub cannot chain clusters") {
    // two tight clusters + a "hub" vector equidistant from both: the
    // hub lists members of both clusters in its top-k, but no member
    // reciprocates past its own cluster, so components stay separate
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)), (2L, Seq(0.99f, 0.01f, 0.0f)),
      (3L, Seq(0.98f, 0.02f, 0.0f)),
      (10L, Seq(0.0f, 1.0f, 0.0f)), (11L, Seq(0.01f, 0.99f, 0.0f)),
      (12L, Seq(0.02f, 0.98f, 0.0f)),
      (99L, Seq(0.7f, 0.7f, 0.1f))) // hub between the clusters
    val g = Embed.knnGraph(rows.toDF("vec_id", "embedding"), k = 2)
    val c = Embed.knnClusters(g).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c(1L) == 1L && c(2L) == 1L && c(3L) == 1L)
    assert(c(10L) == 10L && c(11L) == 10L && c(12L) == 10L)
    // the hub reciprocates with nobody's top-2 -> absent (singleton)
    assert(!c.contains(99L))
  }

  test("knnGraphCells: equals brute force when every cell is probed") {
    val rnd = new scala.util.Random(11)
    // two well-separated clusters around (1,0,...) and (0,1,...)
    val vecs = (0 until 30).map { i =>
      val base = Array.fill(8)(rnd.nextFloat() * 0.1f)
      base(i % 2) = 1.0f
      (i.toLong, base.toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val cents = Seq(
      Seq(1.0, 0, 0, 0, 0, 0, 0, 0),
      Seq(0.0, 1, 0, 0, 0, 0, 0, 0))
    val brute = Embed.knnGraph(df, k = 3).collect()
      .map(x => (x.getLong(0), x.getLong(3)) -> x.getLong(1)).toMap
    val celled = Embed.knnGraphCells(df, k = 3, cents, probes = 2)
      .collect().map(x => (x.getLong(0), x.getLong(3)) -> x.getLong(1)).toMap
    assert(celled == brute) // probes = nCells -> no recall loss
    // probes=1 restricts candidates to the query's own cell
    val own = Embed.knnGraphCells(df, k = 3, cents, probes = 1)
      .collect().map(x => (x.getLong(0) % 2, x.getLong(1) % 2))
    assert(own.forall { case (q, n) => q == n },
      "a 1-probe neighbor escaped the query's cluster cell")
  }
}
