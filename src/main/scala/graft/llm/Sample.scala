package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling and mixing for training-data pipelines.
  *
  * `rand()`-based sampling is non-reproducible across retries, task
  * re-execution, and cluster sizes — a poisoned property for dataset
  * curation, where the sample IS the artifact. Everything here derives
  * the keep/drop decision from a hash of the row's own id, so:
  *  - the same (corpus, seed, rate) always selects the same rows, on
  *    any cluster, after any retry — safe under speculative execution;
  *  - sampling is a narrow per-row filter (no shuffle, no state) that
  *    pushes down like any predicate;
  *  - the oracle can replicate the exact selection in SQL (md5-based
  *    fraction, the doc_simhash hash-twin pattern).
  */
object Sample {

  /** Uniform [0, 1) fraction from the md5 of `id` (+ seed): the first 15
    * hex chars as a 60-bit integer over 2^60. ANSI-safe (stays under 63
    * bits), identical in DuckDB via the hex-digit rebuild. */
  def hashFrac(id: Column, seed: String = ""): Column =
    conv(substring(md5(concat(id.cast("string"), lit(seed))), 1, 15), 16, 10)
      .cast("long").cast("double") / lit(1152921504606846976.0) // 2^60

  /** Deterministic Bernoulli sample: keep each row iff
    * hashFrac(id) < rate. */
  def bernoulli(df: DataFrame, rate: Double, idCol: String = "doc_id",
                seed: String = ""): DataFrame =
    df.filter(hashFrac(col(idCol), seed) < lit(rate))

  /** Per-stratum cap ("domain balancing"): keep at most `cap` rows per
    * stratum, chosen by the deterministic seeded-hash order
    * (hashFrac asc, id asc — the same total order [[takeExact]] uses),
    * so re-runs keep the SAME rows. This is the per-domain quota every
    * crawl-curation pipeline applies so one giant domain can't dominate
    * the corpus.
    *
    * Shape at scale (r14, closing the skew note this scaladoc used to
    * carry): the rank is [[Rank.stagedTopN]]'s per-salt pre-prune — a
    * hot stratum's RAW rows spread over the salt slices in the one
    * full-corpus shuffle, and the exact final rank runs over ≤
    * salts·cap survivors per stratum, corpus-independent. A plain
    * `Window.partitionBy(stratum)` would sort one giant domain's whole
    * row set in a single task at 100 TB. */
  def capPerStratum(df: DataFrame, stratum: Column, cap: Int,
                    idCol: String = "doc_id",
                    seed: String = "cap1"): DataFrame = {
    require(cap > 0, "cap must be positive")
    Rank.stagedTopN(df.withColumn("stratum", stratum),
      Seq(col("stratum")),
      Seq(hashFrac(col(idCol), seed).asc, col(idCol).asc),
      lit(cap), saltKey = col(idCol))
  }

  /** Corpus mixing: per-stratum sampling rates in one pass. `stratum` is
    * any string-valued Column (language, quality bucket, source); rows
    * keep iff hashFrac < rates(stratum), `defaultRate` for strata not in
    * the map. The standard "mix languages/sources at target proportions"
    * curation step, as a single narrow filter.
    *
    * OUTPUT CONTRACT: the result carries the evaluated stratum as a
    * `stratum` column, REPLACING any existing column of that name
    * (same for [[takeExact]]). */
  def mix(df: DataFrame, stratum: Column, rates: Map[String, Double],
          defaultRate: Double = 1.0, idCol: String = "doc_id",
          seed: String = ""): DataFrame = {
    val rateMap = map(rates.toSeq.flatMap { case (k, v) =>
      Seq(lit(k), lit(v)) }: _*)
    df.withColumn("stratum", stratum)
      .filter(hashFrac(col(idCol), seed) <
        coalesce(try_element_at(rateMap, col("stratum")), lit(defaultRate)))
  }

  /** Epoch upsampling: per-stratum rates MAY exceed 1 — rate 2.3 yields
    * two full copies of every row plus a deterministic 30% subset as a
    * third, each tagged with an `epoch` index (0-based). This is the
    * "repeat high-quality sources for n.m epochs" curation step
    * (training-mixture weighting), with [[mix]]'s reproducibility
    * contract: the fractional epoch's membership derives from
    * hashFrac(id), so the same rows get the extra epoch on any cluster,
    * after any retry. A narrow per-row explode — output size is
    * Σ rate(stratum)·|stratum| rows, no shuffle.
    *
    * OUTPUT CONTRACT: adds `stratum` AND `epoch` columns (replacing
    * existing ones of those names). Rates <= 0 drop the stratum. */
  def upsample(df: DataFrame, stratum: Column, rates: Map[String, Double],
               defaultRate: Double = 1.0, idCol: String = "doc_id",
               seed: String = ""): DataFrame = {
    val rateMap = map(rates.toSeq.flatMap { case (k, v) =>
      Seq(lit(k), lit(v)) }: _*)
    df.withColumn("stratum", stratum)
      .withColumn("__rate",
        coalesce(try_element_at(rateMap, col("stratum")), lit(defaultRate)))
      // sequence(0, n) counts DOWN when n < 0 — guard non-positive rates
      .withColumn("epoch", explode(when(col("__rate") <= 0,
          array().cast("array<int>"))
        .otherwise(sequence(lit(0), ceil(col("__rate")).cast("int") - 1))))
      .filter(col("epoch") < floor(col("__rate")) ||
        hashFrac(col(idCol), seed) < col("__rate") - floor(col("__rate")))
      .drop("__rate")
  }

  /** Exactly-n-per-stratum deterministic sample: rows rank within their
    * stratum by (hashFrac, id) — a seeded total order — and the first
    * `counts(stratum)` survive (`defaultN` otherwise). Same
    * reproducibility contract as [[mix]], but with exact output sizes
    * ("take 10k docs per language").
    *
    * Scale note (r14): the rank is [[Rank.stagedTopN]]'s per-salt
    * pre-prune, so a hot stratum's raw rows never sort in one task —
    * the exact final rank sees ≤ salts·n survivors per stratum. The
    * exception is a stratum whose requested n is itself corpus-scale
    * (`defaultN` left at MaxValue means "keep all", which prunes
    * nothing for that stratum — by construction); when one KEPT-WHOLE
    * stratum is most of a 100 TB corpus, use the rate-based [[mix]]
    * (a narrow filter) instead. */
  def takeExact(df: DataFrame, stratum: Column, counts: Map[String, Int],
                defaultN: Int = Int.MaxValue, idCol: String = "doc_id",
                seed: String = ""): DataFrame = {
    val nMap = map(counts.toSeq.flatMap { case (k, v) =>
      Seq(lit(k), lit(v)) }: _*)
    Rank.stagedTopN(df.withColumn("stratum", stratum),
      Seq(col("stratum")),
      Seq(hashFrac(col(idCol), seed), col(idCol)),
      coalesce(try_element_at(nMap, col("stratum")), lit(defaultN)),
      saltKey = col(idCol))
  }

  /** Temperature-flattened corpus mixing (the multilingual-LM sampling
    * rule: target probability ∝ countᵅ, α < 1 boosting small strata).
    * Realized as per-stratum Bernoulli keep rates
    * `(count / min_count)^(α-1)` — the smallest stratum keeps
    * everything (rate 1) and a stratum m× larger keeps `m^(α-1)` of its
    * rows, which is exactly the countᵅ-proportional target. Stratum
    * counts are one tiny aggregate (strata are bounded: languages,
    * sources); selection itself is [[mix]]'s narrow hash filter with
    * its full reproducibility contract. Returns the sampled frame and
    * the realized rate map (for logging / the oracle). */
  def temperatureMix(df: DataFrame, stratum: Column, alpha: Double,
                     idCol: String = "doc_id", seed: String = "")
      : (DataFrame, Map[String, Double]) = {
    val counts = df.withColumn("stratum", stratum)
      .groupBy(col("stratum")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val cMin = counts.values.min.toDouble
    val rates = counts.map { case (k, c) =>
      (k, math.pow(c / cMin, alpha - 1.0)) }
    (mix(df, stratum, rates, defaultRate = 1.0, idCol, seed), rates)
  }

  /** Deterministic dataset split: every row gets a `split` label from
    * its hash fraction — `weights` like `Seq("train" -> 0.98,
    * "val" -> 0.01, "test" -> 0.01)` partition [0,1) into consecutive
    * intervals (normalized, so any positive weights work). The
    * train/val/test assignment is a pure function of (id, seed): stable
    * across cluster sizes, retries, and re-runs, and a narrow per-row
    * projection — the properties an eval holdout must have. */
  def split(df: DataFrame, weights: Seq[(String, Double)],
            idCol: String = "doc_id", seed: String = ""): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val total = weights.map(_._2).sum
    // cumulate then divide once: integer-valued weights yield exact
    // double bounds (8,1,1 -> 0.8, 0.9), which the oracle can state as
    // plain literals
    val bounds = weights.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    val frac = hashFrac(col(idCol), seed)
    // the last branch is the otherwise-arm: frac < 1.0 always, and
    // float accumulation must not leave a sliver above the last bound
    val label = weights.init.zip(bounds.init)
      .foldRight(lit(weights.last._1): Column) { case (((name, _), b), rest) =>
        when(frac < b, name).otherwise(rest)
      }
    df.withColumn("split", label)
  }

  /** Water-filling mix rates: given target SHARES per stratum (language,
    * source), the per-stratum sampling rates that hit the target
    * composition exactly while keeping the most data — the planning
    * step before [[corpusMix]] (which takes rates, not shares). The
    * binding stratum is the one that runs out first: total
    * `T = min_s(n_s / share_s)`, each stratum takes
    * `floor(share_s · T)` docs, rate = take/n. Strata absent from
    * `targets` are excluded (rate 0 by omission); a target stratum
    * absent from the data pins T to 0 — loudly empty, not silently
    * skewed.
    *
    * One stratum-scale aggregate joined to the broadcast target list;
    * the global min is an aggregate over |targets| rows. All derived
    * doubles divide exact longs by literal shares — engine-portable
    * after round 6.
    *
    * Output: stratum, `n`, `share`, `take_n`, `rate` (rounded 6). */
  def mixRates(df: DataFrame, stratumCol: String,
               targets: Seq[(String, Double)]): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      "target shares must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val tgt = broadcast(targets.toDF("stratum", "share"))
    val counts = df.select(col(stratumCol).as("stratum"))
      .groupBy(col("stratum")).agg(count(lit(1)).as("n"))
    val joined = tgt.join(counts, Seq("stratum"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val t = joined.agg(min(col("n") / col("share")).as("__t"))
    joined.crossJoin(broadcast(t))
      .withColumn("take_n", floor(col("share") * col("__t")).cast("long"))
      .withColumn("rate", when(col("n") > 0,
        round(col("take_n").cast("double") / col("n"), 6))
        .otherwise(lit(0.0)))
      .select(col("stratum"), col("n"), col("share"), col("take_n"),
        col("rate"))
  }

  /** Per-group score calibration: percent rank and z-score of a score
    * within each group — the normalization step before thresholding a
    * quality score ACROSS heterogeneous sources (a raw LM score cut
    * keeps whatever source happens to score high; calibrated ranks cut
    * each source at its own distribution). Deterministic: the rank
    * orders by (score, id) — unique keys, so rank == row_number and
    * this reproduces `percent_rank()` exactly; a zero-variance group
    * gets null z (not NaN/throw — the ANSI + cross-engine convention
    * used throughout).
    *
    * Shape at scale: a single `Window.partitionBy(group)` would put a
    * dominant source (a web crawl is routinely >80% of docs) on ONE
    * task. Instead, [[takeBudget]]'s bucketed two-pass rank: score
    * buckets from a global quantile sketch (boundaries only balance
    * work — any score-monotone split is correct, since equal scores
    * always share a bucket and (bucket, score, id) order equals
    * (score, id) order), per-(group, bucket) counts rolled into
    * per-group prefix offsets by a window over the TINY counts frame
    * (`buckets` rows per group), then a within-(group, bucket)
    * row_number plus the bucket's offset. Rows carry only (id, group,
    * score); group moments come from one hash aggregate; both small
    * frames join back AQE-sized (no forced broadcast — group
    * cardinality is unbounded). No driver-side state beyond the
    * `buckets-1` boundary doubles.
    *
    * Output: id, group cols, score, `prank` (0..1), `z` (both
    * rounded 6). */
  def normalizeScores(df: DataFrame, groupCols: Seq[String],
                      score: Column, idCol: String = "doc_id",
                      buckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 1, "buckets must be >= 1")
    val gc = groupCols.map(col)
    val base = df.select((col(idCol) +: gc :+ score.as("__s")): _*)
    val stats = base.groupBy(gc: _*)
      .agg(count(lit(1)).as("__n"), avg(col("__s")).as("__mu"),
        stddev_samp(col("__s")).as("__sd"))
    val bounds =
      if (buckets <= 1) Seq.empty[Double]
      else base.stat
        .approxQuantile("__s",
          (1 until buckets).map(_.toDouble / buckets).toArray, 0.01)
        .distinct.sorted.toSeq
    val bucket =
      if (bounds.isEmpty) lit(0)
      else bounds.map(b => when(col("__s") >= b, 1).otherwise(0))
        .reduce(_ + _)
    val t = base.withColumn("__b", bucket)
      .repartition((gc :+ col("__b")): _*)
    // offsets: rows BEFORE this bucket within the group — a window over
    // the counts frame only (<= `buckets` rows per group)
    val off = t.groupBy((gc :+ col("__b")): _*)
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__off", coalesce(
        sum(col("__bn")).over(Window.partitionBy(gc: _*)
          .orderBy(col("__b").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((gc :+ col("__b") :+ col("__off")): _*)
    val wB = Window.partitionBy((gc :+ col("__b")): _*)
      .orderBy(col("__s").asc, col(idCol).asc)
    // null-safe join keys: a null group value is a group of its own
    // (exactly as Window.partitionBy treats it), so <=> not =
    def nsJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               keep: Seq[String]): DataFrame = {
      val l = left.as("l"); val r = right.as("r")
      val cond = keys.map(k => col("l." + k) <=> col("r." + k))
        .reduce(_ && _)
      l.join(r, cond)
        .select((left.columns.map(c => col("l." + c)) ++
          keep.map(c => col("r." + c))).toIndexedSeq: _*)
    }
    val ranked = nsJoin(t, off, groupCols :+ "__b", Seq("__off"))
      .withColumn("__rank", col("__off") + row_number().over(wB))
    nsJoin(ranked, stats, groupCols, Seq("__n", "__mu", "__sd"))
      .select((col(idCol) +: gc :+ col("__s").as("score") :+
        round(when(col("__n") > 1,
            (col("__rank") - 1).cast("double") / (col("__n") - 1))
          .otherwise(0.0), 6).as("prank") :+
        when(col("__sd") > 0,
          round((col("__s") - col("__mu")) / col("__sd"), 6)).as("z")): _*)
  }

  /** Gumbel top-k importance resampling — the selection step of DSIR
    * ([[Text.dsirWeights]]) and of any weighted-sampling-without-
    * replacement curation: sampling k rows with probability ∝ exp(w) is
    * exactly taking the k largest `w + Gumbel(0,1)` keys. The noise
    * derives from the row's own hash fraction (`-ln(-ln u)`), so the
    * draw is reproducible on any cluster and the oracle replays it.
    * One narrow projection + one global top-k (rank via max-k sort,
    * no full sort materialized at the driver). */
  def gumbelTopK(df: DataFrame, weight: Column, k: Int,
                 idCol: String = "doc_id", seed: String = ""): DataFrame = {
    val key = weight + (-log(-log(hashFrac(col(idCol), seed))))
    df.withColumn("gumbel_key", round(key, 6))
      .orderBy(col("gumbel_key").desc, col(idCol).asc)
      .limit(k)
  }

  /** Per-bucket cumulative base offsets WITHOUT a driver collect: one
    * totals aggregate over the bucket column (<= `buckets` rows), a
    * TWO-LEVEL prefix sum over that tiny frame, and a broadcast join
    * back onto the facts. Replaces the old collect-to-driver +
    * literal-map scheme: driver state is zero, and the bucket count can
    * scale with the corpus instead of being capped by a driver map.
    * `desc` accumulates from the TOP bucket down (takeBudget's regime).
    *
    * The prefix sum is chunked so NO single task is linear in
    * `buckets` (the round-8 advice bound): level 1 runs per-chunk
    * exclusive prefixes (~√buckets chunks in parallel, ~√buckets rows
    * each), level 2 prefixes the ≤√buckets chunk TOTALS; a bucket's
    * base = its chunk-local prefix + its chunk's base. Buckets can now
    * grow with the corpus — the per-task bound stays √buckets. */
  private def withBucketBase(t: DataFrame, cnt: Column,
                             desc: Boolean, buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val width = math.max(1L, math.ceil(math.sqrt(buckets.toDouble)).toLong)
    val ordB = if (desc) col("__b").desc else col("__b").asc
    val ordC = if (desc) col("__chunk").desc else col("__chunk").asc
    val bt = t.groupBy(col("__b")).agg(sum(cnt).as("__bt"))
      .withColumn("__chunk", floor(col("__b") / lit(width)).cast("long"))
    val wIn = Window.partitionBy(col("__chunk")).orderBy(ordB)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bt.withColumn("__local",
      coalesce(sum(col("__bt")).over(wIn), lit(0L)))
    val wCh = Window.orderBy(ordC)
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunkBases = bt.groupBy(col("__chunk"))
      .agg(sum(col("__bt")).as("__ct"))
      .withColumn("__cbase", coalesce(sum(col("__ct")).over(wCh), lit(0L)))
      .select(col("__chunk"), col("__cbase"))
    val bases = local.join(broadcast(chunkBases), Seq("__chunk"))
      .select(col("__b"), (col("__local") + col("__cbase")).as("__base"))
    t.join(broadcast(bases), Seq("__b"))
  }

  /** Token-budget selection: walk the corpus in priority order (highest
    * `priority` first, ties broken by id ascending) and keep rows while
    * the running `cost` total — INCLUDING the current row — stays within
    * `budget`. This is the "fill a 1T-token training budget from the
    * best documents" curation step, as a deterministic, distributed
    * operator: the kept set is a pure function of (corpus, budget).
    *
    * Shape at scale: [[pack]]'s two-pass prefix sum, but ordered by a
    * VALUE column rather than a uniform hash — so bucket boundaries come
    * from an approx-quantile sketch of the priority (any boundaries
    * yield the same result; they only balance the per-bucket windows).
    * Pass 1 is one B-row cost total per bucket; pass 2 one within-bucket
    * running-sum window plus the bucket's base offset. No global window,
    * no driver-side sort. `cost` must be non-negative. */
  def takeBudget(df: DataFrame, cost: Column, priority: Column,
                 budget: Long, buckets: Int = 64,
                 idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 0, "budget must be non-negative")
    val t0 = df.withColumn("__p", priority.cast("double"))
      .withColumn("__c", cost.cast("long"))
    // Bucket boundaries from a cheap quantile sketch. Correctness does
    // not depend on them (the global order is (__p desc, id asc) either
    // way); duplicates collapse, and an empty/constant column degrades
    // to one bucket — still correct, just serial.
    val bounds =
      if (buckets <= 1) Seq.empty[Double] // approxQuantile NPEs on 0 probes
      else t0.stat
        .approxQuantile("__p",
          (1 until buckets).map(_.toDouble / buckets).toArray, 0.01)
        .distinct.sorted.toSeq
    val bucket =
      if (bounds.isEmpty) lit(0)
      else bounds.map(b => when(col("__p") >= b, 1).otherwise(0))
        .reduce(_ + _)
    val t = withBucketBase(t0.withColumn("__b", bucket), col("__c"),
      desc = true, buckets = buckets)
    // Pass 2: inclusive running sum within the bucket, highest first,
    // plus the bucket's base offset (all buckets above it).
    val cum = sum(col("__c")).over(
      Window.partitionBy(col("__b"))
        .orderBy(col("__p").desc, col(idCol).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)) +
      col("__base")
    t.withColumn("__cum", cum)
      .filter(col("__cum") <= budget)
      .drop("__p", "__c", "__b", "__base", "__cum")
  }

  /** Sequence packing ("concat-and-chunk"): lay every document's tokens
    * end to end in a deterministic shuffled order — (hashFrac(id), id),
    * the same seeded total order as [[takeExact]] — and cut the stream
    * into fixed `seqLen`-token training sequences. Emits one row per
    * (document, sequence) overlap: `seq_id`, the document, the token
    * range of the document that lands in that sequence. This is the
    * packing step every LM training pipeline runs after curation; doing
    * it in the engine makes the doc→sequence assignment a queryable,
    * reproducible artifact instead of a side effect of a writer job.
    *
    * Scale shape: a global prefix sum over the token counts, computed
    * WITHOUT a global window. The seeded key is a uniform [0,1)
    * fraction, so `floor(key·B)` yields `B` balanced, deterministic,
    * ORDER-ALIGNED buckets (bucket boundaries are fixed numbers, not
    * sampled splits — no repartitionByRange nondeterminism). Pass 1
    * aggregates one token total per bucket (B rows to the driver);
    * pass 2 adds the bucket's base offset to a within-bucket running
    * sum (one window per bucket, corpus/B rows each). `buckets` is the
    * parallelism knob — size it so a bucket's rows fit one task.
    * The explode is narrow; output has one extra row per sequence
    * boundary crossing. `nTokens` is any per-row token-count Column
    * (e.g. `Text.tokenCount(col("text"))`); zero/negative-count rows
    * pack nowhere and are dropped. */
  /** Deterministic global shuffle order: assigns every row its 0-based
    * position `shuffle_pos` in the seeded total order
    * `(hashFrac(id), id)` — the same order [[pack]] and [[takeExact]]
    * use. Training pipelines need the corpus in a reproducible shuffled
    * order (epoch order is part of the experiment); `rand()`/
    * `repartition` orders change under retries and cluster size, this
    * one never does.
    *
    * Shape at scale: [[pack]]'s windowless prefix sum with unit counts —
    * `floor(key·B)` gives order-aligned buckets, pass 1 is one B-row
    * count aggregate (B values to the driver), pass 2 one within-bucket
    * row_number window over corpus/B rows. No global window, no
    * zipWithIndex RDD round-trip. */
  /** Deterministic weighted interleave of strata — the training-order
    * schedule ("sample domains according to their weights, in a fixed
    * order"): every row gets a virtual time `vt = hashFrac(id, seed) /
    * rate(stratum)`, and reading the corpus in vt order serves strata
    * proportionally to their rates at every prefix (hash fractions are
    * uniform, so stratum s's rows land at density rate_s per unit vt
    * — the hash-uniform analogue of weighted fair queueing). Pure
    * narrow map: no window, no shuffle, no per-stratum state — the
    * 100 TB-safe way to emit a global training order (an exact-rank
    * contiguous position would need the bucketed prefix sum of
    * [[shuffleOrder]]). Rows of strata missing from `rates` are
    * dropped, like [[mix]]. Output: input columns + `vt` (rounded 9 —
    * an ordering key, not a measure). */
  def interleave(df: DataFrame, stratumCol: String,
                 rates: Map[String, Double], idCol: String = "doc_id",
                 seed: String = ""): DataFrame = {
    require(rates.nonEmpty && rates.values.forall(_ > 0),
      "every stratum rate must be positive")
    val rate = rates.foldLeft(lit(null).cast("double")) {
      case (acc, (s, r)) =>
        when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    df.withColumn("vt", round(hashFrac(col(idCol), seed) / rate, 9))
      .filter(col("vt").isNotNull)
  }

  def shuffleOrder(df: DataFrame, buckets: Int = 65536,
                   idCol: String = "doc_id",
                   seed: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = hashFrac(col(idCol), seed)
    val t = withBucketBase(
      df.withColumn("__key", key)
        .withColumn("__b", floor(col("__key") * buckets).cast("int")),
      lit(1L), desc = false, buckets = buckets)
    t.withColumn("shuffle_pos",
        row_number().over(Window.partitionBy(col("__b"))
          .orderBy(col("__key"), col(idCol))).cast("long") - 1L +
          col("__base"))
      .drop("__key", "__b", "__base")
  }

  def pack(df: DataFrame, nTokens: Column, seqLen: Long,
           buckets: Int = 65536, idCol: String = "doc_id",
           seed: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(seqLen > 0, "seqLen must be positive")
    val key = hashFrac(col(idCol), seed)
    // pass 1: one total per bucket -> prefix-summed base offsets,
    // broadcast-joined back (withBucketBase: zero driver state, so the
    // default bucket count is 65536 — a 1e11-row corpus puts ~1.5M rows
    // in each within-bucket window task instead of 1/256th of it)
    val t = withBucketBase(
      df.select(col(idCol), nTokens.cast("long").as("__n"),
          key.as("__key"),
          floor(key * buckets).cast("int").as("__b"))
        .filter(col("__n") > 0),
      col("__n"), desc = false, buckets = buckets)
    // pass 2: within-bucket running sum + bucket base = global offset
    val off = coalesce(sum(col("__n")).over(
        Window.partitionBy(col("__b")).orderBy(col("__key"), col(idCol))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) +
      col("__base")
    t.withColumn("__off", off)
      // `div`, not `/` (Spark's / on longs is double division, which
      // loses exactness past 2^53 total tokens)
      .withColumn("seq_id", explode(sequence(
        expr(s"__off div ${seqLen}L"),
        expr(s"(__off + __n - 1) div ${seqLen}L"))))
      .select(col("seq_id"), col(idCol),
        (greatest(col("seq_id") * seqLen, col("__off")) - col("__off"))
          .as("doc_from"),
        (least((col("seq_id") + 1) * seqLen, col("__off") + col("__n")) -
          greatest(col("seq_id") * seqLen, col("__off"))).as("len"))
  }
}
