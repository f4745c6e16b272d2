package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * around a single shuffle key so the plan scales linearly:
  *
  *  - exact:        groupBy(content hash) — one shuffle, no pairs
  *  - n-gram Jaccard: exact near-dup via shared-shingle candidate buckets
  *  - MinHash LSH:  probabilistic near-dup, groupBy(band hash) — never
  *                  an all-pairs join
  *  - SimHash:      64-bit sketch + banded Hamming candidates
  *
  * All candidate generation is bucket-local (`groupBy`-shaped); only
  * verification touches pairs, and only pairs that share a bucket.
  */
object Dedup {

  // --- exact ---------------------------------------------------------------

  /** Exact duplicate groups by normalized-content fingerprint. Output:
    * one row per distinct content (fingerprint, n_docs, keep_doc_id) —
    * the `keep` is the smallest doc_id (deterministic survivor policy).
    * One hash-shuffle; at 100 TB this is the cheapest possible dedup. */
  def exact(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame =
    docs
      .select(Text.fingerprint(col(textCol)).as("fingerprint"), col(idCol))
      .groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_doc_id"))

  /** URL-level deduplication — the crawl-pipeline step BEFORE any
    * content hashing (most crawl duplicates are one page fetched under
    * cosmetically different URLs: tracking params, fragments, www/case
    * variants, trailing slashes). Groups by
    * [[graft.llm.Text.canonicalUrl]] and keeps the best fetch per
    * canonical form: longest text (`lenCol`, crawl heuristic — the
    * fullest render wins), ties to the smallest id. Output: one row per
    * canonical URL (canonical_url, n_docs, keep_doc_id). One
    * hash-shuffle on the canonical string, survivor state is a single
    * value per key — the same 100 TB shape as [[exact]]. The (len desc,
    * id asc) preference rides `min_by` over a (-len, id) struct —
    * exact for the FULL int64 domain of both columns (the previous
    * composite BIGINT key `id - len·1e9` silently picked wrong
    * survivors for snowflake-scale ids ≥ 1e9; the oracle twin emulates
    * the struct order with a row_number window). */
  def urlDedup(docs: DataFrame, urlCol: String = "url",
               lenCol: String = "n_chars",
               idCol: String = "doc_id"): DataFrame =
    docs
      .select(Text.canonicalUrl(col(urlCol)).as("canonical_url"),
        col(lenCol), col(idCol))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_docs"),
        min_by(col(idCol),
          struct((-col(lenCol).cast("long")).as("nl"),
            col(idCol).cast("long").as("i")))
          .as("keep_doc_id"))

  /** Incremental (cross-snapshot) exact dedup: drop every new document
    * whose normalized-content fingerprint already exists in the `seen`
    * corpus — the "dedup this crawl against everything already
    * ingested" step that makes corpus curation append-only. Exact
    * fingerprints only ride the join (never text), the seen side
    * reduces to DISTINCT fingerprints first, and the anti-join shuffles
    * hashes — at 100 TB the seen side is a materialized fingerprint
    * table you keep between snapshots, not a rescan. Within-batch
    * duplicates are kept (dedup the batch itself with [[deduplicate]]
    * before or after). */
  def dedupAgainst(newDocs: DataFrame, seen: DataFrame,
                   textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val seenFps = seen
      .select(Text.fingerprint(col(textCol)).as("__fp")).distinct()
    newDocs
      .withColumn("__fp", Text.fingerprint(col(textCol)))
      .join(seenFps, Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Bloom-filter incremental dedup: drop every new document whose
    * content fingerprint is (probably) already in the `seen` corpus,
    * with the membership side compressed to `mBits` bits instead of a
    * fingerprint table. This is the 100 TB shape for "dedup this crawl
    * against everything ever ingested" when even the DISTINCT
    * fingerprint table is too big to ship to a join: the filter build is
    * one aggregation bounded by `mBits` rows, the bitset rides to every
    * task with the plan (no shuffle on the candidate side at all), and
    * the membership test is pure codegen'd column arithmetic.
    *
    * Standard Bloom semantics: a kept document is DEFINITELY new; a
    * dropped one is in `seen` up to the false-positive rate
    * `(1 - e^(-k*n/m))^k` (size `mBits` ≈ 10 bits/doc for ~1% FP at
    * k=4). Deterministic: positions are md5-derived
    * (`p_j = md5_60(md5_60(text) || '#' || j) mod m`), so an external
    * oracle replays the exact same filter — unlike Spark's builtin
    * `bloom_filter_agg`, whose bit layout is engine-private.
    *
    * `mBits` is bounded by what comfortably rides the serialized plan
    * (~2^24); beyond that, shard the filter by a fingerprint prefix and
    * union the per-shard results. */
  def dedupBloom(newDocs: DataFrame, seen: DataFrame,
                 textCol: String = "text", idCol: String = "doc_id",
                 mBits: Int = 1 << 16, kHashes: Int = 4): DataFrame = {
    require(mBits >= 64, "mBits too small to be a Bloom filter")
    require(kHashes >= 1 && kHashes <= 16, "kHashes out of range")
    def positions(key: Column): Seq[Column] =
      (0 until kHashes).map { j =>
        pmod(md5Hash60(concat(key.cast("string"), lit("#" + j))),
          lit(mBits.toLong))
      }
    val setPos = seen
      .select(explode(array(positions(md5Hash60(col(textCol))): _*)).as("p"))
      .distinct()
      .collect().map(_.getLong(0).toInt) // bounded: <= mBits rows
    // pack to one long per 64 bits: the literal serializes as a primitive
    // long array (65536 bits = 8 KB in the plan; a boolean-array literal
    // boxes per element and cost ~3 MB of task binary at the same m)
    val words = new Array[Long]((mBits + 63) / 64)
    setPos.foreach(p => words(p >>> 6) |= 1L << (p & 63))
    val wordsLit = typedlit(words.toSeq)
    val allSet = positions(md5Hash60(col(textCol)))
      .map { p =>
        // bitwiseAND, not `% 2`: a zero shift leaves a negative word
        // intact and `-1 % 2 == -1` would read a SET bit as clear
        call_function("shiftrightunsigned",
          element_at(wordsLit, (p / 64 + 1).cast("int")),
          (p % 64).cast("int")).bitwiseAND(lit(1L)) === 1
      }
      .reduce(_ && _)
    newDocs.filter(!allSet)
  }

  /** Return the deduplicated corpus: exact duplicates collapse to the
    * smallest doc_id; when `nearDupThreshold` is set, near-duplicate
    * pairs (MinHash-LSH) additionally drop the larger id of each pair —
    * the standard greedy survivor policy (lower id wins; a broadcast
    * anti-join, no driver-side clustering).
    *
    * `maxBucket` is [[minhashLsh]]'s heavy-bucket valve: near-dup
    * families whose banding buckets exceed it contribute NO pairs, so
    * their members all survive this greedy pass. That is the deliberate
    * scale posture (one boilerplate page mirrored across 10⁶ sites must
    * not cost 10¹² pair rows), not a silent default to rely on — when a
    * corpus is expected to carry over-cap families, either raise
    * `maxBucket` deliberately, or dedup by cluster instead:
    * [[deduplicateClustered]] over [[minhashLshStar]] edges handles
    * arbitrarily large families in Θ(d) without any cap.
    * [[lshOverCapBuckets]] with the same parameters is the runtime
    * signal: it names every bucket this pass dropped (empty output =
    * the cap changed nothing on this corpus). */
  def deduplicate(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id",
                  nearDupThreshold: Option[Double] = None,
                  maxBucket: Int = 1000,
                  maxDocChars: Int = Int.MaxValue): DataFrame = {
    val survivors = exact(docs, textCol, idCol)
      .select(col("keep_doc_id").as(idCol))
    var kept = docs.join(survivors, idCol)
    for (t <- nearDupThreshold) {
      val losers = minhashLsh(kept, threshold = t,
        textCol = textCol, idCol = idCol, maxBucket = maxBucket,
        maxDocChars = maxDocChars)
        .select(col("b").as(idCol)).distinct()
      kept = kept.join(broadcast(losers), Seq(idCol), "left_anti")
    }
    kept
  }

  // --- word shingles -------------------------------------------------------

  /** Giant-document valve shared by the SIGNATURE ops ([[minhashLsh]],
    * [[minhashLshStar]], [[simhashNearDup]], [[lshOverCapBuckets]]):
    * fingerprints are computed over at most the first `maxDocChars`
    * characters of the text. A 100 MB document otherwise becomes a
    * ~25M-element hash array inside ONE row (single-task signature
    * work, row-size pressure on every shuffle that carries it); the
    * reference engine's analogue is its hard 4096-byte event-payload
    * cap (include/akumuli_def.h:120). Semantics under the cap are
    * PREFIX fingerprinting: documents identical within the first
    * `maxDocChars` chars are indistinguishable, and similarity is
    * measured over the prefix only — the standard crawl-dedup posture
    * (dup families share prefixes). `Int.MaxValue` (the default)
    * disables the valve and keeps the exact whole-document semantics;
    * the plan is unchanged when disabled. */
  private def capText(text: Column, maxDocChars: Int): Column = {
    require(maxDocChars > 0, s"maxDocChars must be positive: $maxDocChars")
    if (maxDocChars == Int.MaxValue) text
    else substring(text, 1, maxDocChars)
  }

  /** Distinct word n-gram shingles of the normalized text. The token
    * array is let-bound ([[Text.bindOnce]]) so the slice lambda reads a
    * variable instead of re-tokenizing the document per gram index —
    * without the binding this expression is O(tokens²) per row. */
  def wordShingles(text: Column, n: Int): Column =
    Text.bindOnce(Text.tokens(lower(text))) { toks =>
      array_distinct(
        filter(
          transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
            i => when(size(toks) >= n,
              array_join(slice(toks, i + 1, lit(n)), " "))),
          x => x.isNotNull))
    }

  /** 64-bit hashes of the distinct word n-gram shingles — the ONE shingle
    * identity every candidate-generation path keys on (Jaccard buckets,
    * MinHash base hashes, decontamination sets); the collision analyses
    * and oracles all assume this exact xxhash64-over-wordShingles form. */
  def hashedShingles(text: Column, n: Int): Column =
    transform(wordShingles(text, n), s => xxhash64(s))

  // --- exact n-gram Jaccard near-dup --------------------------------------

  /** EXACT near-duplicate pairs with word-`n`-gram Jaccard >= `threshold`.
    *
    * Candidate pairs are pairs sharing >= 1 shingle (any pair with
    * Jaccard > 0 shares one, so recall is exactly 1 — this is not a
    * sketch). Shape: explode(shingle) -> self-join per shingle bucket ->
    * distinct pair -> verify. `maxBucket` caps pathological shingle
    * frequencies (boilerplate): buckets above the cap are dropped, and
    * set sizes are computed over the SAME retained universe as the
    * intersection, so the reported score is the exact Jaccard over
    * non-boilerplate shingles (when the cap never triggers — any corpus
    * with < maxBucket docs sharing a shingle — it is the plain Jaccard).
    * Pairs whose evidence is entirely heavy-carried drop out; at scale,
    * raise `n` instead. Output: (a, b, jaccard) with a < b. */
  def ngramJaccard(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
                   textCol: String = "text", idCol: String = "doc_id",
                   maxBucket: Int = 1000): DataFrame =
    shinglePairCounts(docs, n, textCol, idCol, maxBucket)
      .withColumn("jaccard",
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))

  /** Sub-document duplication: pairs with n-gram CONTAINMENT
    * `|A ∩ B| / min(|A|, |B|)` >= `threshold`. Jaccard misses a short
    * document wholly embedded in a long one (the union term swamps the
    * overlap); containment is the standard asymmetric complement (the
    * Broder resemblance/containment pair) used to catch quote-and-extend
    * duplication. Same exact shared-shingle machinery as
    * [[ngramJaccard]], recall 1 by construction. */
  def ngramContainment(docs: DataFrame, n: Int = 3,
                       threshold: Double = 0.8,
                       textCol: String = "text", idCol: String = "doc_id",
                       maxBucket: Int = 1000): DataFrame =
    shinglePairCounts(docs, n, textCol, idCol, maxBucket)
      .withColumn("containment",
        round(col("inter") / least(col("na"), col("nb")), 6))
      .filter(col("containment") >= threshold)
      .select(col("a"), col("b"), col("containment"))

  /** Shared machinery of the exact pair scorers: for every pair sharing
    * >= 1 retained shingle, the intersection size and both retained set
    * sizes — `(a, b, inter, na, nb)` with a < b.
    *
    * Candidate pairs are pairs sharing >= 1 shingle (any pair with
    * overlap > 0 shares one, so recall is exactly 1 — this is not a
    * sketch). Shape: explode(shingle) -> self-join per shingle bucket ->
    * one groupBy(pair).count. `maxBucket` caps pathological shingle
    * frequencies (boilerplate): buckets above the cap are dropped, and
    * set sizes are computed over the SAME retained universe as the
    * intersection, so scores are exact over non-boilerplate shingles
    * (when the cap never triggers — any corpus with < maxBucket docs
    * sharing a shingle — they are the plain scores). Pairs whose
    * evidence is entirely heavy-carried drop out; at scale, raise `n`
    * instead. */
  private def shinglePairCounts(docs: DataFrame, n: Int,
                                textCol: String, idCol: String,
                                maxBucket: Int): DataFrame = {
    // repartition first: a single-file parquet scan would otherwise run
    // the whole shingle stage on one core. Shingles become 64-bit hashes
    // immediately — 8-byte shuffle keys instead of n-word strings; a hash
    // collision would need ~2^32 distinct shingles per bucket to matter.
    // LAZY lineage cut on the PER-DOC hash-array frame (r15): the
    // exploded frame is consumed by the heavy-bucket count, the size
    // aggregate and both pair-join sides, so uncut the scan + tokenize
    // + shingle + hash pipeline re-executed per consumer (4 corpus
    // tokenize passes; the r13 A/B that kept recompute-per-consumer
    // only priced storing the EXPLODED per-shingle rows — one row per
    // doc through the block store is the minhashBandCandidates trade,
    // already measured cheap there).
    val sh = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism * 2)
      .select(col(idCol).as("id"),
        hashedShingles(col(textCol), n).as("sh"))
      .localCheckpoint(false)
    // Shingles are distinct per doc, so |A ∩ B| = the number of buckets a
    // pair co-occurs in — one groupBy(pair).count, no array payloads ever
    // cross the shuffle. Sizes join back as two small int columns.
    val ex = sh.select(col("id"), explode(col("sh")).as("g"))
    // Heavy-shingle exclusion: the over-cap key set is tiny (boilerplate
    // n-grams), broadcast anti-join. Set sizes count the RETAINED
    // shingles (post anti-join), keeping numerator and denominator over
    // one universe — sizing on the raw sets would bias every score low
    // whenever part of a pair's overlap is heavy-carried.
    // LAZY lineage cut on the (boilerplate-scale) over-cap key set:
    // `bucketed` feeds the size aggregate and BOTH pair-join sides, so
    // uncut, the heavy-agg's full corpus pass re-analyzes and
    // re-EXECUTES per consumer (3x). Cutting `heavy` stores only the
    // tiny key set and halves the plan tree. The exploded frame itself
    // is deliberately NOT materialized: an A/B at the factor-10 corpus
    // put storing it at 1.5x the wall of recomputing it (per-shingle
    // rows through the block store vs a cheap re-scan+hash), and at
    // 100 TB its executor-storage footprint is corpus-proportional —
    // the exact pair scorer's shape is recompute-per-consumer by
    // design.
    val heavy = ex.groupBy(col("g")).count().filter(col("count") > maxBucket)
      .select(col("g"))
      .localCheckpoint(false)
    val bucketed = ex.join(broadcast(heavy), Seq("g"), "left_anti")
    val sizes = bucketed.groupBy(col("id")).agg(count(lit(1)).as("nsh"))
    val inter = bucketed.alias("l")
      .join(bucketed.alias("r"), col("l.g") === col("r.g") &&
        col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("a"), col("r.id").as("b"))
      .agg(count(lit(1)).cast("double").as("inter"))
    inter
      .join(sizes.select(col("id").as("a"), col("nsh").as("na")), "a")
      .join(sizes.select(col("id").as("b"), col("nsh").as("nb")), "b")
  }

  /** Per-document novelty: the fraction of a document's distinct word
    * n-gram shingles that occur in at least one OTHER document
    * (`dup_shingle_frac`; RefinedWeb-style "how much of this page is
    * text seen elsewhere" — high fraction = syndicated/templated
    * content even when no single pair crosses a near-dup threshold).
    *
    * Shape at scale: explode to (doc, shingle-hash) rows, one
    * groupBy(hash) distinct-doc count, join back on the same key
    * (shuffle reuse), one groupBy(doc) average. Documents too short to
    * have a shingle report 0 shingles / 0.0 frac. */
  def noveltyStats(docs: DataFrame, n: Int = 3,
                   textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    // LAZY lineage cut on the per-doc hash-array frame (r15): `ex`
    // feeds the per-shingle doc count AND the join side, so uncut the
    // tokenize + shingle + hash pass ran twice.
    val arr = docs
      .select(col(idCol), hashedShingles(col(textCol), n).as("sh"))
      .localCheckpoint(false)
    val ex = arr.select(col(idCol), explode(col("sh")).as("g"))
    // shingles are distinct per doc, so count(*) = distinct docs
    val cnt = ex.groupBy(col("g")).agg(count(lit(1)).as("__docs"))
    val perDoc = ex.join(cnt, "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        round(avg((col("__docs") > 1).cast("double")), 6)
          .as("dup_shingle_frac"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("dup_shingle_frac"), lit(0.0)).as("dup_shingle_frac"))
  }

  /** Span-level duplicate detection: pairs of documents sharing at least
    * `minShared` winnowing fingerprints — the scalable form of exact
    * substring dedup (deduplicating long repeated spans across a corpus,
    * the Lee et al. '22 cleaning step). Winnowing guarantees every
    * shared token run of >= w+k-1 tokens yields a shared fingerprint
    * (~2/(w+1) selection rate), so `minShared` thresholds the amount of
    * verbatim-shared text, not whole-document similarity — two documents
    * that each embed the same long quotation are caught even when
    * everything else differs.
    *
    * Shape: same fingerprint-bucket join as [[ngramJaccard]] — (id, fp)
    * rows only, heavy fingerprints (> maxBucket docs: boilerplate)
    * anti-joined out via broadcast, one groupBy(pair) count. Output
    * (a, b, shared_fps) with a < b. */
  def sharedSpanPairs(docs: DataFrame, minShared: Int,
                      k: Int = 5, w: Int = 4,
                      textCol: String = "text", idCol: String = "doc_id",
                      maxBucket: Int = 1000,
                      hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                        c => org.apache.spark.sql.functions.xxhash64(c)): DataFrame = {
    // LAZY lineage cut on the per-doc fingerprint-array frame (r15):
    // `fps` feeds the heavy-bucket count and BOTH pair-join sides, so
    // uncut the tokenize + winnow pass re-executed per consumer (3
    // corpus passes). One array row per doc rides the block store; the
    // exploded rows stay recompute-per-consumer like shinglePairCounts.
    val arr = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism * 2)
      .select(col(idCol).as("id"),
        Text.winnow(col(textCol), k, w, hashFn).as("__fps"))
      .localCheckpoint(false)
    val fps = arr.select(col("id"), explode(col("__fps")).as("fp"))
    val heavy = fps.groupBy(col("fp")).count()
      .filter(col("count") > maxBucket).select(col("fp"))
    val kept = fps.join(broadcast(heavy), Seq("fp"), "left_anti")
    kept.alias("l")
      .join(kept.alias("r"), col("l.fp") === col("r.fp") &&
        col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("a"), col("r.id").as("b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
      .select(col("a"), col("b"), col("shared_fps"))
  }

  /** Exact substring dedup, the REMOVAL side (Lee et al. '22,
    * "Deduplicating Training Data Makes Language Models Better" — their
    * ExactSubstr step; [[sharedSpanPairs]] is the detection side): every
    * k-token window that occurs more than once ANYWHERE in the corpus
    * keeps only its first occurrence (min (doc, start) order); every
    * other occurrence's tokens are cut from their documents, and the
    * survivors are re-joined with single spaces. Unlike document-level
    * dedup this removes boilerplate/quotation spans embedded in
    * otherwise-unique documents.
    *
    * Scale shape: windows ride as (id, start, xxhash64(k-gram)) rows —
    * one explode, one groupBy(hash) for the global first-occurrence
    * owner, one join back, one groupBy(id) collecting duplicated starts
    * (bounded by the doc's own token count — doc-scale state, same as
    * holding the doc), then a narrow array rebuild. Never all-pairs,
    * never a driver collect. The k-gram key is joined with a 
    * separator so token boundaries stay unambiguous.
    *
    * Output: (idCol, textCol rewritten, n_removed tokens), one row per
    * input document (short docs with < k tokens pass through whole,
    * modulo whitespace normalization — reassembly is single-space). */
  def trimDuplicateSpans(docs: DataFrame, k: Int = 10,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    require(k >= 2, s"window must span tokens, got k=$k")
    val (base, wins) = spanWindows(docs, k, textCol, idCol)
    val owners = wins.groupBy(col("wh"))
      .agg(min(struct(col("id"), col("start"))).as("own"),
        count(lit(1)).as("n"))
    val cuts = wins.join(owners, "wh")
      .filter(col("n") > 1 &&
        !(col("id") === col("own.id") && col("start") === col("own.start")))
      .select(col("id"), col("start"))
    rebuildTrimmed(base, cuts, k, textCol, idCol)
  }

  /** (tokenized base, (id, start, window-hash) rows) of a corpus — the
    * shared front half of the span-dedup family. */
  private def spanWindows(docs: DataFrame, k: Int, textCol: String,
                          idCol: String): (DataFrame, DataFrame) = {
    // NOT lineage-cut (r15 measured rejection): a per-doc
    // (toks, window-hash array) frame through the block store was A/B'd
    // and LOST — doc_substring_dedup 0.97 → 1.17 s, incremental flat.
    // The wins consumers key identical subtrees on `wh`, so Spark's
    // ReusedExchange already shares the heavy pass; the checkpoint only
    // added a block-store write of corpus-scale token arrays.
    val base = docs
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
    val wins = base
      .repartition(docs.sparkSession.sparkContext.defaultParallelism * 2)
      .filter(size(col("toks")) >= k)
      .select(col("id"), posexplode(transform(
        sequence(lit(0), size(col("toks")) - k),
        i => xxhash64(concat_ws("\u0001", slice(col("toks"), i + 1, lit(k)))))))
      .toDF("id", "start", "wh")
    (base, wins)
  }

  /** Rebuild documents with the tokens under `cuts` (id, start) window
    * occurrences removed — the shared back half of the span-dedup
    * family. Per-doc cut state is bounded by the doc's own token count
    * (doc-scale, same as holding the doc). */
  private def rebuildTrimmed(base: DataFrame, cuts: DataFrame, k: Int,
                             textCol: String, idCol: String): DataFrame = {
    val dupStarts = cuts
      .groupBy(col("id")).agg(collect_set(col("start")).as("cuts"))
    base.join(dupStarts, Seq("id"), "left")
      .select(col("id").as(idCol),
        when(col("cuts").isNull, concat_ws(" ", col("toks")))
          .otherwise(concat_ws(" ", filter(col("toks"), (_, p) =>
            !exists(col("cuts"), s => p >= s && p < s + k))))
          .as(textCol),
        when(col("cuts").isNull, lit(0))
          .otherwise(size(col("toks")) - size(filter(col("toks"), (_, p) =>
            !exists(col("cuts"), s => p >= s && p < s + k))))
          .cast("int").as("n_removed"))
  }

  private def spanMetaFile(path: String) = s"$path/_span_meta.txt"

  /** Persist the corpus's duplicated-span state as a reusable index:
    * the DISTINCT k-token window hashes, plus k pinned in meta. Enough
    * for incremental trimming — any indexed occurrence outranks every
    * future batch occurrence, so membership alone decides a cut; owner
    * positions never need to leave the original pass. */
  def writeSpanIndex(docs: DataFrame, path: String, k: Int = 10,
                     textCol: String = "text",
                     idCol: String = "doc_id"): Unit = {
    require(k >= 2, s"window must span tokens, got k=$k")
    val (_, wins) = spanWindows(docs, k, textCol, idCol)
    wins.select(col("wh")).distinct()
      .write.mode("overwrite").parquet(s"$path/wh")
    Embed.writeTextFile(docs.sparkSession, spanMetaFile(path), k.toString)
  }

  /** Fold a batch's window hashes into a [[writeSpanIndex]] layout —
    * append-only, existing files untouched (probes tolerate duplicate
    * hashes across files: membership is idempotent, so even a
    * double-appended batch cannot change [[trimAgainstIndex]] RESULTS —
    * only index size). `batchId` still gives exactly-once landing
    * ([[IdempotentBatch]]) so replayed batches don't bloat the hash set
    * on disk; None is a plain append. */
  def appendSpanIndex(newDocs: DataFrame, path: String,
                      textCol: String = "text",
                      idCol: String = "doc_id",
                      batchId: Option[String] = None): Unit = {
    val spark = newDocs.sparkSession
    val k = Embed.readTextFile(spark, spanMetaFile(path)).trim.toInt
    val (_, wins) = spanWindows(newDocs, k, textCol, idCol)
    val wh = wins.select(col("wh")).distinct()
    batchId match {
      case None => wh.write.mode("append").parquet(s"$path/wh")
      case Some(b) => IdempotentBatch.land(spark, s"$path/wh", b)(
        dir => wh.write.mode("overwrite").parquet(dir))
    }
  }

  /** Incremental exact substring dedup: trim a NEW batch against a
    * [[writeSpanIndex]] layout WITHOUT re-tokenizing the indexed
    * corpus. A batch window occurrence is cut when its hash exists in
    * the index (the surviving copy lives in the indexed corpus) or when
    * an earlier batch occurrence owns it (within-batch first-copy-wins,
    * exactly [[trimDuplicateSpans]] restricted to the batch). One
    * hash-join of batch windows against the stored hash set plus one
    * batch-local owner groupBy — per-batch cost at 100 TB is
    * batch-windows-scale, never corpus-scale. Output: the batch rows as
    * (idCol, trimmed textCol, n_removed). */
  def trimAgainstIndex(newDocs: DataFrame, path: String,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val spark = newDocs.sparkSession
    val k = Embed.readTextFile(spark, spanMetaFile(path)).trim.toInt
    val (base, wins) = spanWindows(newDocs, k, textCol, idCol)
    val stored = spark.read.parquet(s"$path/wh").distinct()
    val fromIndex = wins.join(stored, Seq("wh"), "left_semi")
      .select(col("id"), col("start"))
    val owners = wins.groupBy(col("wh"))
      .agg(min(struct(col("id"), col("start"))).as("own"),
        count(lit(1)).as("n"))
    val withinBatch = wins.join(owners, "wh")
      .filter(col("n") > 1 &&
        !(col("id") === col("own.id") && col("start") === col("own.start")))
      .select(col("id"), col("start"))
    rebuildTrimmed(base, fromIndex.unionByName(withinBatch).distinct(),
      k, textCol, idCol)
  }

  // --- benchmark decontamination -------------------------------------------

  /** Benchmark decontamination: per corpus document, how many word
    * n-gram shingles it shares with ANY benchmark document, and a
    * contamination flag at `minHits`. The standard pre-training step that
    * removes evaluation data from the training corpus.
    *
    * Scale shape (the benchmark is an eval set — MBs against TBs of
    * corpus): the benchmark reduces to a distinct shingle-HASH set that
    * is broadcast; the corpus is scanned and shingled exactly ONCE —
    * n_shingles rides through the explode, the broadcast left-join marks
    * hits in the same stage, and map-side partial aggregation compacts
    * the shuffle to one short row per document.
    *
    * Output: (idCol, n_shingles, hits, contaminated), one row per corpus
    * document. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 3,
                    minHits: Int = 1, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val benchSh = benchmark
      .select(explode(hashedShingles(col(textCol), n)).as("g"))
      .distinct()
      .withColumn("hit", lit(1))
    corpus
      .select(col(idCol),
        hashedShingles(col(textCol), n).as("sh"))
      // explode_outer keeps shingle-less docs as a null-gram row (which
      // can never match a bench key), so every corpus doc gets a row out
      .select(col(idCol), size(col("sh")).as("n_shingles"),
        explode_outer(col("sh")).as("g"))
      .join(broadcast(benchSh), Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(first(col("n_shingles")).as("n_shingles"),
        count(col("hit")).cast("int").as("hits"))
      .select(col(idCol), col("n_shingles"), col("hits"),
        (col("hits") >= minHits).as("contaminated"))
  }

  /** Contamination attribution report — [[decontaminate]] tells you
    * which CORPUS docs to drop; this tells you which BENCHMARK items
    * leaked and from WHERE: per benchmark doc with any shingle overlap,
    * the corpus doc sharing the most distinct shingles, plus the
    * fraction of the benchmark item it covers (the evidence row an eval
    * audit needs — "GSM8K item 412 appears verbatim in crawl doc X").
    *
    * Same one-universe heavy-shingle valve as [[shinglePairCounts]]:
    * over-owned shingles (boilerplate) drop from BOTH sides before
    * sizing, so the overlap fraction never mixes universes. Candidates
    * form only on shared-shingle buckets; the top-1 window runs over the
    * (bench, corpus-candidate) pair frame — its per-`bench_id` partition
    * is BOUNDED by (bench item's shingles) × `maxBucket` candidate rows
    * (the valve caps every surviving bucket), corpus-independent, so
    * this window is exempt from the r14 low-cardinality-window
    * restructures by arithmetic rather than by staging.
    *
    * Output: `bench_id`, `corpus_id` (strongest source), `n_shared`
    * (distinct shared shingles), `overlap` (share of the bench item's
    * retained shingles, rounded 6). */
  def contaminationReport(corpus: DataFrame, benchmark: DataFrame,
                          n: Int = 3, maxBucket: Int = 1000,
                          textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // LAZY lineage cuts on the per-doc hash-array frames (r15): the
    // corpus side feeds the heavy-bucket count AND the pair join, the
    // bench side feeds the size aggregate AND the pair join — uncut,
    // each side's tokenize + shingle + hash pass ran twice.
    val bArr = benchmark.select(col(idCol).as("bench_id"),
        hashedShingles(col(textCol), n).as("sh"))
      .localCheckpoint(false)
    val bs0 = bArr.select(col("bench_id"), explode(col("sh")).as("g"))
    val cArr = corpus.select(col(idCol).as("corpus_id"),
        hashedShingles(col(textCol), n).as("sh"))
      .localCheckpoint(false)
    val cs0 = cArr.select(col("corpus_id"), explode(col("sh")).as("g"))
    val heavy = cs0.groupBy(col("g")).count()
      .filter(col("count") > maxBucket).select(col("g"))
    val cs = cs0.join(broadcast(heavy), Seq("g"), "left_anti")
    val bs = bs0.join(broadcast(heavy), Seq("g"), "left_anti")
    val nb = bs.groupBy(col("bench_id")).agg(count(lit(1)).as("__nb"))
    val pairs = bs.join(cs, "g")
      .groupBy(col("bench_id"), col("corpus_id"))
      .agg(count(lit(1)).as("n_shared"))
    pairs.join(nb, "bench_id")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("bench_id"))
          .orderBy(col("n_shared").desc, col("corpus_id").asc)))
      .filter(col("__rn") === 1)
      .select(col("bench_id"), col("corpus_id"), col("n_shared"),
        round(col("n_shared").cast("double") / col("__nb"), 6)
          .as("overlap"))
  }

  // --- MinHash + LSH -------------------------------------------------------

  /** `numHashes` MinHash signature of the shingle set — standard MinHash
    * (Broder '97), computed per row with no shuffle. Each shingle string
    * is hashed ONCE; the family is derived by seeded long-hashing (see
    * [[minhashFromHashes]]), so the per-shingle cost is one string hash
    * plus numHashes integer hashes. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    minhashFromHashes(transform(shingles, s => xxhash64(s)), numHashes)

  /** Signature from pre-hashed shingles. Callers should materialize the
    * base-hash array in its own projection so the string hashing runs
    * once, not once per family member. The family is a splitmix64
    * finalizer per permutation index, fused into ONE codegen pass over
    * the hash array ([[org.apache.spark.sql.graftio.VecMath.MinHashMins]]
    * — the higher-order formulation evaluated interpreted with numHashes
    * intermediate arrays per document and dominated the LSH query). */
  def minhashFromHashes(baseHashes: Column, numHashes: Int): Column =
    graft.functions.VecMath.minhashMins(baseHashes, numHashes)

  /** MinHash-LSH near-duplicate candidates: signature split into `bands`
    * bands of `rowsPerBand`, docs grouped by (band index, band hash) —
    * ONLY a groupBy shuffle, no all-pairs join. Pairs sharing a band are
    * verified with exact shingle Jaccard.
    *
    * With b=32, r=3 the detection probability at J=0.8 is
    * 1-(1-0.8^3)^32 ≈ 1-1e-10 — effectively exact for near-dups while
    * J=0.2 pairs almost never collide.
    *
    * `maxBucket` is the heavy-bucket valve (same pattern as
    * [[ngramJaccard]]): the banded self-join emits Θ(d²) candidate rows
    * for a d-member (band, bandhash) bucket, so one boilerplate page
    * mirrored across 10⁶ sites would otherwise cost 10¹² pair rows per
    * colliding band. Buckets over the cap are dropped before the
    * self-join (the over-cap key set is boilerplate-scale, broadcast
    * anti-join). A pair is lost ONLY if every one of its colliding
    * buckets is over the cap — any corpus whose duplicate families stay
    * under `maxBucket` members gets the identical pair list. When
    * families larger than the cap are expected AND the product is
    * clusters, use [[minhashLshStar]] (Θ(d) by construction, no cap
    * needed for output size); when the product is the scored pair list
    * itself, an over-cap family's Θ(d²) pairs are intrinsic to the ask —
    * raise `maxBucket` deliberately and budget for the output.
    * [[lshOverCapBuckets]] audits what a given cap drops at the cost of
    * one extra count aggregate — run it whenever the cap is active on
    * an unfamiliar corpus. `maxDocChars` is the giant-document valve
    * (see [[capText]]): signatures cover at most the first
    * `maxDocChars` characters — prefix fingerprinting, default off.
    * Output: (a, b, jaccard) with a < b, jaccard >= threshold. */
  def minhashLsh(docs: DataFrame, n: Int = 3, bands: Int = 32,
                 rowsPerBand: Int = 3, threshold: Double = 0.5,
                 textCol: String = "text", idCol: String = "doc_id",
                 maxBucket: Int = 1000,
                 maxDocChars: Int = Int.MaxValue): DataFrame = {
    val (sh, candidates) = minhashBandCandidates(docs, n, bands,
      rowsPerBand, textCol, idCol, maxBucket, maxDocChars)
    // shingle arrays join back only for the (few) candidate pairs
    val sets = sh.select(col("id"), col("sh"), size(col("sh")).as("nsh"))
    candidates
      .join(sets.select(col("id").as("a"), col("sh").as("sha"),
        col("nsh").as("na")), "a")
      .join(sets.select(col("id").as("b"), col("sh").as("shb"),
        col("nsh").as("nb")), "b")
      .withColumn("inter",
        size(array_intersect(col("sha"), col("shb"))).cast("double"))
      .withColumn("jaccard",
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** The banding front half of [[minhashLsh]]: the per-doc hashed
    * shingle+signature frame `sh` (id, sh, sig; lineage-cut) and the
    * DEDUPLICATED candidate pair list from the banded self-join, BEFORE
    * exact verification. Factored out (r14) so consumers that do not
    * score pairs — [[lshTuningReport]]'s threshold-0 candidate set,
    * whose verification filter could never drop a row — skip the two
    * shingle-set joins and the per-pair intersection entirely. */
  private[llm] def minhashBandCandidates(docs: DataFrame, n: Int,
      bands: Int, rowsPerBand: Int, textCol: String, idCol: String,
      maxBucket: Int, maxDocChars: Int): (DataFrame, DataFrame) = {
    val numHashes = bands * rowsPerBand
    // string-hash each shingle exactly once; everything downstream
    // (signature, bands, verification intersection) works on the 64-bit
    // hashes — identical results barring ~2^-64 collisions
    val sh = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism * 2)
      .select(col(idCol).as("id"),
        hashedShingles(capText(col(textCol), maxDocChars), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), col("sh"),
        minhashFromHashes(col("sh"), numHashes).as("sig"))
      // LAZY lineage cut: `sh` feeds the band explode AND both
      // verification sides, so without the cut the 128-permutation
      // signature pass is re-analyzed AND re-executed per consumer
      // (A/B at the factor-10 corpus: 14.7 s vs 18.1 s for
      // doc_minhash_lsh, 17.6 s vs 24.2 s for the star pipeline).
      // One row per DOC rides the block store — cheap next to two
      // extra minhash passes. eager=false: no job at dataframe-
      // construction time (the plan audit builds every gate without
      // running a corpus pass).
      .localCheckpoint(false)
    val bandArr = array((0 until bands).map(b =>
      xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))): _*)
    // banded rows carry ONLY (id, band, bandhash) — exploding the shingle
    // arrays across all bands would multiply shuffle volume by `bands`
    val banded = sh.select(col("id"), posexplode(bandArr))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bandhash")
    // heavy-bucket valve: drop over-cap buckets before the quadratic
    // self-join; the over-cap key set is boilerplate-scale — broadcast.
    // Int.MaxValue is a true disable sentinel: no bucket could ever
    // exceed it, so skip the bucket-count aggregation + anti-join and
    // keep the original two-exchange plan
    val kept =
      if (maxBucket == Int.MaxValue) banded
      else {
        val heavy = banded.groupBy(col("band"), col("bandhash")).count()
          .filter(col("count") > maxBucket)
          .select(col("band"), col("bandhash"))
        banded.join(broadcast(heavy), Seq("band", "bandhash"), "left_anti")
      }
    val candidates = kept.alias("l")
      .join(kept.alias("r"),
        col("l.band") === col("r.band") &&
          col("l.bandhash") === col("r.bandhash") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"))
      .dropDuplicates("a", "b")
    (sh, candidates)
  }

  /** Runtime observability for the `maxBucket` valve: the (band,
    * bandhash) buckets whose member count exceeds `maxBucket` — exactly
    * the buckets [[minhashLsh]] (and every wrapper forwarding
    * `maxBucket`) drops before the quadratic self-join. Empty output
    * proves the valve changed nothing on this corpus: the capped pair
    * list is identical to the uncapped one. Non-empty output is the
    * audit trail for the silent-survivor review the valve otherwise
    * hides — an over-cap family contributes no pairs, so its members
    * all survive a greedy dedup pass invisibly. Each reported bucket is
    * an action item: cluster the affected ids via [[minhashLshStar]]
    * (Θ(d), capless) or re-run them through [[minhashLsh]] with a
    * deliberately raised cap. Cost: the same shingle+band pass as the
    * LSH call it audits plus ONE count aggregate — no self-join, and
    * the output is boilerplate-scale by construction.
    * Output: (band, bandhash, n_members) with n_members > maxBucket. */
  def lshOverCapBuckets(docs: DataFrame, n: Int = 3, bands: Int = 32,
                        rowsPerBand: Int = 3, textCol: String = "text",
                        idCol: String = "doc_id",
                        maxBucket: Int = 1000,
                        maxDocChars: Int = Int.MaxValue): DataFrame =
    docs
      .select(col(idCol).as("id"),
        hashedShingles(capText(col(textCol), maxDocChars), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), posexplode(bandHashArr(
        minhashFromHashes(col("sh"), bands * rowsPerBand),
        bands, rowsPerBand)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bandhash")
      .groupBy(col("band"), col("bandhash"))
      .agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") > maxBucket)

  /** MinHash-LSH near-dup edges in STAR form — the connected-components
    * feeder for densely-duplicated corpora. [[minhashLsh]] emits every
    * colliding pair, so a d-fold duplicate family (the common crawl
    * regime: one boilerplate page mirrored across d sites) costs
    * Θ(d²) pair rows PER BAND before dedup and Θ(d²) verified output
    * pairs — at a 100x corpus scale test this one shape dominated the
    * whole dedup pipeline. For clustering, the clique is redundant:
    * connectivity only needs a spanning star. Here each (band, bucket)
    * emits edges from its minimum id (the hub) to the other members —
    * Θ(|bucket|) rows — and each edge is verified with exact shingle
    * Jaccard like every other candidate path.
    *
    * Contract: output edges are a VERIFIED SUBSET of [[minhashLsh]]'s
    * pairs (same threshold semantics per edge; `a` < `b` because the hub
    * is the bucket min). Feeding [[connectedComponents]], the clusters
    * equal the clique-edge clusters whenever every true near-dup pair is
    * hub-connected in at least one of its colliding buckets — with
    * b bands a pair at Jaccard J collides in ~b·J^r buckets (b=64, r=2,
    * J=0.5: ~16), and losing ALL of them requires an unverifiable hub in
    * every one, so divergence needs adversarial corpora, not crawl dups.
    * [[minhashLshStarRejected]] is the runtime signal for that regime:
    * it returns the hub edges that FAILED exact verification — a large
    * rejected fraction means many bucket members hang off an
    * unverifiable hub and the under-merge risk is live (raise `bands`,
    * or score the affected ids through [[minhashLsh]]).
    *
    * `hubSalt` is the degenerate-mega-bucket valve: the hub window
    * partitions on (band, bandhash), so one 10⁹-member boilerplate
    * bucket would buffer — and serialize — in a single WindowExec task.
    * With `hubSalt` = S > 0 the window partitions on (band, bandhash,
    * id-hash mod S) — each salt cell buffers ≤ ~d/S rows and elects a
    * sub-hub — and a second, CELL-scale window (≤ S rows per bucket)
    * links sub-hubs to the bucket minimum. Exactly members−1 edges per
    * bucket either way, connectivity identical pre-verification; the
    * default 0 keeps the single-window plan (one shuffle — optimal for
    * crawl-shaped buckets, and the salted form adds two cell-scale
    * shuffles that are pure overhead when no bucket is degenerate).
    *
    * The salted/unsalted equivalence is a PRE-verification claim only:
    * with `hubSalt` > 0 a member is exact-verified against its
    * salt-cell SUB-hub instead of the bucket hub, so when similarity is
    * non-transitive a borderline member can verify against one hub and
    * not the other — VERIFIED edges (and hence clusters) may differ
    * from the `hubSalt = 0` output. Crawl-shaped dup families (every
    * member near the hub) verify identically either way; a corpus where
    * that margin matters should compare [[minhashLshStarRejected]]
    * between the two settings before trusting the salted clusters.
    * Use it when the product is CLUSTERS (dedup survivors); use
    * [[minhashLsh]] when the product is the scored pair list itself. */
  def minhashLshStar(docs: DataFrame, n: Int = 3, bands: Int = 32,
                     rowsPerBand: Int = 3, threshold: Double = 0.5,
                     textCol: String = "text",
                     idCol: String = "doc_id",
                     hubSalt: Int = 0,
                     maxDocChars: Int = Int.MaxValue): DataFrame =
    starEdgesScored(docs, n, bands, rowsPerBand, textCol, idCol, hubSalt,
      maxDocChars)
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))

  /** Under-merge diagnostic for [[minhashLshStar]]: the hub edges that
    * failed exact verification (jaccard < `threshold`), i.e. bucket
    * members whose only link to their bucket's hub was a false LSH
    * collision. A handful is normal (LSH buckets always admit some
    * false positives — the clique path drops the same pairs); a LARGE
    * fraction relative to the accepted edges flags the regime where the
    * star form can under-merge versus the clique (a true near-dup pair
    * survives only if SOME colliding bucket gives it a verifiable hub
    * path). Same pipeline, same cost as the star call it diagnoses. */
  def minhashLshStarRejected(docs: DataFrame, n: Int = 3, bands: Int = 32,
                             rowsPerBand: Int = 3, threshold: Double = 0.5,
                             textCol: String = "text",
                             idCol: String = "doc_id",
                             hubSalt: Int = 0,
                             maxDocChars: Int = Int.MaxValue): DataFrame =
    starEdgesScored(docs, n, bands, rowsPerBand, textCol, idCol, hubSalt,
      maxDocChars)
      .filter(col("jaccard") < threshold)
      .select(col("a"), col("b"), col("jaccard"))

  /** Star edges over a bucketed frame — the shared Θ(d)-per-bucket
    * candidate stage behind [[minhashLshStar]] (text bands) and
    * [[graft.llm.Embed.nearDupLshStar]] (hyperplane tables). `banded`
    * must carry an `id` column plus `bucketCols`; output is distinct
    * (a, b) hub→member edges.
    *
    * hubSalt <= 0: bucket hub via an un-ordered window min — ONE hash
    * shuffle on the bucket key, no self-join; the candidate stage is
    * linear in rows. hubSalt = S > 0: salted two-level star — each salt
    * cell buffers ≤ ~d/S rows (bounded WindowExec partitions even for a
    * degenerate mega-bucket), sub-hubs link to the bucket min on a
    * cell-scale frame; members−1 edges per bucket and identical
    * pre-verification connectivity either way. */
  private[llm] def starEdges(banded: DataFrame, bucketCols: Seq[String],
                             hubSalt: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucket = bucketCols.map(col)
    (if (hubSalt <= 0) {
      banded.withColumn("a",
        min(col("id")).over(Window.partitionBy(bucket: _*)))
        .filter(col("id") =!= col("a"))
        .select(col("a"), col("id").as("b"))
    } else {
      val salted = banded.withColumn("salt",
        pmod(xxhash64(col("id")), lit(hubSalt.toLong)))
      val subbed = salted.withColumn("subhub",
        min(col("id")).over(
          Window.partitionBy(bucket :+ col("salt"): _*)))
      val memberEdges = subbed.filter(col("id") =!= col("subhub"))
        .select(col("subhub").as("a"), col("id").as("b"))
      val cells = subbed.select(bucket :+ col("subhub"): _*).distinct()
      val linked = cells.withColumn("hub",
        min(col("subhub")).over(Window.partitionBy(bucket: _*)))
      val linkEdges = linked.filter(col("subhub") =!= col("hub"))
        .select(col("hub").as("a"), col("subhub").as("b"))
      memberEdges.unionAll(linkEdges)
    }).dropDuplicates("a", "b")
  }

  /** Shared star machinery: every (hub, member) candidate edge with its
    * exact verified jaccard, UN-thresholded. */
  private def starEdgesScored(docs: DataFrame, n: Int, bands: Int,
                              rowsPerBand: Int, textCol: String,
                              idCol: String, hubSalt: Int,
                              maxDocChars: Int = Int.MaxValue): DataFrame = {
    val numHashes = bands * rowsPerBand
    // same lazy lineage cut as minhashLsh's `sh`: the band explode and
    // both verification sides otherwise re-analyze AND re-execute the
    // shingle+minhash pass per consumer
    val sh = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism * 2)
      .select(col(idCol).as("id"),
        hashedShingles(capText(col(textCol), maxDocChars), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), col("sh"),
        minhashFromHashes(col("sh"), numHashes).as("sig"))
      .localCheckpoint(false)
    val banded = sh.select(col("id"),
        posexplode(bandHashArr(col("sig"), bands, rowsPerBand)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bandhash")
    val edges = starEdges(banded, Seq("band", "bandhash"), hubSalt)
    val sets = sh.select(col("id"), col("sh"), size(col("sh")).as("nsh"))
    edges
      .join(sets.select(col("id").as("a"), col("sh").as("sha"),
        col("nsh").as("na")), "a")
      .join(sets.select(col("id").as("b"), col("sh").as("shb"),
        col("nsh").as("nb")), "b")
      .withColumn("inter",
        size(array_intersect(col("sha"), col("shb"))).cast("double"))
      .withColumn("jaccard",
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
  }

  // --- persisted LSH index + incremental near-dup --------------------------

  private def lshMetaFile(path: String) = s"$path/_lsh_meta.txt"

  private def bandHashArr(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      xxhash64(slice(sig, b * rowsPerBand + 1, rowsPerBand))): _*)

  /** Persist the corpus's LSH state as a reusable on-disk index:
    * `path/sets` = (id, sh, nsh) hashed shingle sets, `path/bands` =
    * (id, band, bandhash) band table, plus the `(n, bands, rowsPerBand)`
    * meta so a later batch can never band with different parameters.
    * The text is shingled ONCE (bands are derived from the stored sets);
    * incremental near-dup ([[neardupAgainstIndex]]) then never touches
    * corpus text again — the production shape for a growing 100 TB
    * corpus, where re-shingling the history per batch is the thing that
    * does not scale. */
  def writeLshIndex(docs: DataFrame, path: String, n: Int = 3,
                    bands: Int = 64, rowsPerBand: Int = 2,
                    textCol: String = "text",
                    idCol: String = "doc_id"): Unit = {
    val spark = docs.sparkSession
    docs
      .select(col(idCol).as("id"), hashedShingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), col("sh"), size(col("sh")).as("nsh"))
      .write.mode("overwrite").parquet(s"$path/sets")
    spark.read.parquet(s"$path/sets")
      .select(col("id"),
        minhashFromHashes(col("sh"), bands * rowsPerBand).as("sig"))
      .select(col("id"), posexplode(bandHashArr(col("sig"), bands, rowsPerBand)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bandhash")
      .write.mode("overwrite").parquet(s"$path/bands")
    Embed.writeTextFile(spark, lshMetaFile(path), s"$n,$bands,$rowsPerBand")
  }

  /** Fold a new batch into a [[writeLshIndex]] layout: shingle + band the
    * batch with the layout's persisted parameters and parquet-append to
    * `sets`/`bands`. Like [[graft.llm.Embed.ivfUpdate]], append-only
    * maintenance — existing index files are never rewritten.
    *
    * `batchId` is the retry-idempotence handle ([[IdempotentBatch]]):
    * with a stable batch name (crawl snapshot id, ingestion date), a
    * driver-level RE-RUN of a failed append lands the batch exactly
    * once — the replay clears its own earlier files before landing.
    * Without it (None), the write is a plain parquet append and the
    * caller owns at-most-once execution per batch. */
  def appendLshIndex(newDocs: DataFrame, path: String,
                     textCol: String = "text",
                     idCol: String = "doc_id",
                     batchId: Option[String] = None): Unit = {
    val spark = newDocs.sparkSession
    val Array(n, bands, rowsPerBand) =
      Embed.readTextFile(spark, lshMetaFile(path)).split(",").map(_.toInt)
    val sets = newDocs
      .select(col(idCol).as("id"), hashedShingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), col("sh"), size(col("sh")).as("nsh"))
    val banded = sets
      .select(col("id"),
        minhashFromHashes(col("sh"), bands * rowsPerBand).as("sig"))
      .select(col("id"), posexplode(bandHashArr(col("sig"), bands, rowsPerBand)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bandhash")
    batchId match {
      case None =>
        sets.write.mode("append").parquet(s"$path/sets")
        banded.write.mode("append").parquet(s"$path/bands")
      case Some(b) =>
        IdempotentBatch.land(spark, s"$path/sets", b)(
          dir => sets.write.mode("overwrite").parquet(dir))
        IdempotentBatch.land(spark, s"$path/bands", b)(
          dir => banded.write.mode("overwrite").parquet(dir))
    }
  }

  /** Incremental near-dup probe in STAR form — the dedup-DECISION twin
    * of [[neardupAgainstIndex]], Θ(batch × bands) instead of quadratic
    * in dup-family size. The pair form enumerates every batch×index
    * pair inside each colliding bucket: with d-member dup families
    * split i/b between index and batch, that is i·b pairs per family
    * per band BEFORE dedup — at a 1000-replica family (750 indexed,
    * 250 new) ≈ 187k final pairs and ~12M raw band candidates per
    * family, tens of billions corpus-wide. Here each (band, bandhash)
    * bucket of the STORED band table elects one hub (min id — no
    * re-shingling of history), and a new doc verifies against only the
    * hubs of buckets it collides with: per new doc at most `bands`
    * verified edges, whatever the family size.
    *
    * Product: "which NEW docs duplicate the stored corpus, with a
    * verified witness" — (id, hub, jaccard), one row per colliding
    * (new doc, hub) with jaccard >= threshold. Use the pair form when
    * the full pair list is the ask. Batch-INTERNAL duplicates are out
    * of scope by design (run [[minhashLshStar]] on the batch — also
    * Θ(batch)); mixing batch hubs in here would make "who gets flagged"
    * depend on batch composition. Recall caveat mirrors
    * [[minhashLshStar]]: a true near-dup of SOME family member is
    * flagged only if it verifies against a colliding bucket's hub —
    * exact for crawl-tight families, conservative when similarity is
    * non-transitive. */
  def neardupAgainstIndexStar(newDocs: DataFrame, path: String,
                              threshold: Double = 0.5,
                              textCol: String = "text",
                              idCol: String = "doc_id"): DataFrame = {
    val spark = newDocs.sparkSession
    val Array(n, bands, rowsPerBand) =
      Embed.readTextFile(spark, lshMetaFile(path)).split(",").map(_.toInt)
    // LAZY lineage cut (r15): `newSh` feeds the band table and the
    // verification sets — uncut, the batch tokenize + shingle + minhash
    // pass ran once per consumer.
    val newSh = newDocs
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .select(col(idCol).as("id"), hashedShingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint(false)
    val newBanded = newSh
      .select(col("id"),
        minhashFromHashes(col("sh"), bands * rowsPerBand).as("sig"))
      .select(col("id"),
        posexplode(bandHashArr(col("sig"), bands, rowsPerBand)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bandhash")
    // one hub per stored bucket: a bucket-count-sized aggregate of the
    // persisted band table — history is never re-shingled
    val hubs = spark.read.parquet(s"$path/bands")
      .groupBy(col("band"), col("bandhash"))
      .agg(min(col("id")).as("hub"))
    val edges = newBanded.join(hubs, Seq("band", "bandhash"))
      .filter(col("id") =!= col("hub"))
      .select(col("id"), col("hub"))
      .dropDuplicates("id", "hub")
    val newSets = newSh.select(col("id"), col("sh"),
      size(col("sh")).as("nsh"))
    val hubSets = spark.read.parquet(s"$path/sets")
    edges
      .join(newSets.select(col("id"), col("sh").as("sha"),
        col("nsh").as("na")), "id")
      .join(hubSets.select(col("id").as("hub"), col("sh").as("shb"),
        col("nsh").as("nb")), "hub")
      .withColumn("inter",
        size(array_intersect(col("sha"), col("shb"))).cast("double"))
      .withColumn("jaccard",
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id"), col("hub"), col("jaccard"))
  }

  /** Incremental near-dup: pairs of a NEW batch against a
    * [[writeLshIndex]] layout (plus new-vs-new pairs within the batch),
    * WITHOUT re-shingling the indexed corpus. The batch's bands join the
    * stored band table (band, bandhash) — bucket-local, never all-pairs —
    * and candidates are verified with exact shingle Jaccard from stored +
    * batch sets. Corpus-vs-corpus pairs are by construction absent: they
    * were reported when their batches arrived. Ids must be disjoint
    * between index and batch. Output: (a, b, jaccard) with a < b, at
    * least one side new, jaccard >= threshold. */
  def neardupAgainstIndex(newDocs: DataFrame, path: String,
                          threshold: Double = 0.5,
                          textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame = {
    val spark = newDocs.sparkSession
    val Array(n, bands, rowsPerBand) =
      Embed.readTextFile(spark, lshMetaFile(path)).split(",").map(_.toInt)
    // LAZY lineage cut (r15, the minhashBandCandidates trade): `newSh`
    // feeds the band table (consumed by BOTH candidate joins) and the
    // verification sets (joined on both pair sides), so uncut the batch
    // tokenize + shingle + 128-permutation minhash re-executed up to 5x.
    val newSh = newDocs
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .select(col(idCol).as("id"), hashedShingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint(false)
    val newSets = newSh
      .select(col("id"), col("sh"), size(col("sh")).as("nsh"))
    val newBanded = newSh
      .select(col("id"),
        minhashFromHashes(col("sh"), bands * rowsPerBand).as("sig"))
      .select(col("id"), posexplode(bandHashArr(col("sig"), bands, rowsPerBand)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bandhash")
      .localCheckpoint(false)
    val storedBanded = spark.read.parquet(s"$path/bands")
    // corpus-vs-new (either id order — normalize to a < b) …
    val cx = storedBanded.alias("l")
      .join(newBanded.alias("r"),
        col("l.band") === col("r.band") &&
          col("l.bandhash") === col("r.bandhash") &&
          col("l.id") =!= col("r.id"))
      .select(least(col("l.id"), col("r.id")).as("a"),
        greatest(col("l.id"), col("r.id")).as("b"))
    // … plus new-vs-new within the batch
    val nn = newBanded.alias("l")
      .join(newBanded.alias("r"),
        col("l.band") === col("r.band") &&
          col("l.bandhash") === col("r.bandhash") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"))
    val candidates = cx.unionByName(nn).dropDuplicates("a", "b")
    val allSets = spark.read.parquet(s"$path/sets").unionByName(newSets)
    candidates
      .join(allSets.select(col("id").as("a"), col("sh").as("sha"),
        col("nsh").as("na")), "a")
      .join(allSets.select(col("id").as("b"), col("sh").as("shb"),
        col("nsh").as("nb")), "b")
      .withColumn("inter",
        size(array_intersect(col("sha"), col("shb"))).cast("double"))
      .withColumn("jaccard",
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** LSH banding tuning report — "measure, don't guess" for the
    * (bands, rowsPerBand) trade (the [[graft.llm.Embed.annRecall]] of
    * the text-dedup path): exact [[ngramJaccard]] truth vs the banding
    * CANDIDATE set ([[minhashLsh]] at threshold 0, i.e. verification
    * disabled), reporting recall of true pairs and how many candidate
    * verifications the banding cost. More bands → recall up, candidate
    * (verification) volume up; this report is how you pick.
    *
    * Driver state: four counts. Output (one row): `n_true`,
    * `n_candidates`, `n_hits`, `recall` (rounded 6; null when no true
    * pairs exist). `n_candidates` depends on the banding hash function
    * and is reported for tuning, not oracle-checked.
    *
    * `maxDocs > 0` bounds the exact-truth side to a DETERMINISTIC
    * md5-ordered document sample (the shard-membership hash order, so
    * any engine replays the identical subset) — the valve that makes
    * this O(n²)-truth diagnostic runnable on a 100 TB corpus: recall is
    * then estimated over the sampled sub-corpus (truth AND banding both
    * restricted to it, so the ratio stays an unbiased banding-recall
    * estimate; pair counts scale ~(maxDocs/N)²). 0 = full corpus. */
  def lshTuningReport(docs: DataFrame, n: Int = 3, bands: Int = 32,
                      rowsPerBand: Int = 3, threshold: Double = 0.5,
                      textCol: String = "text",
                      idCol: String = "doc_id",
                      maxDocs: Int = 0,
                      maxBucket: Int = 1000): DataFrame = {
    // maxBucket is passed to the banding side so the reported recall
    // measures the SAME valve regime the production minhashLsh run
    // uses — with the default cap, an over-cap family's misses show up
    // here as lost recall (which is the honest reading: those pairs
    // really are dropped in production). Pass Int.MaxValue to measure
    // the uncapped banding itself.
    val spark = docs.sparkSession
    val sampled =
      if (maxDocs <= 0) docs
      else docs.orderBy(md5(col(idCol).cast("string")), col(idCol))
        .limit(maxDocs) // TakeOrderedAndProject: top-k, no global sort
    val truth = ngramJaccard(sampled, n, threshold, textCol, idCol)
      .select(col("a"), col("b")).localCheckpoint()
    // the candidate set IS the pre-verification banding product, taken
    // directly and UNSCORED (r14) — the old threshold-0 minhashLsh call
    // paid two shingle-set joins + an exact intersection per candidate
    // pair for a jaccard >= 0 filter that can never drop a row
    val cands = minhashBandCandidates(sampled, n, bands, rowsPerBand,
      textCol, idCol, maxBucket, Int.MaxValue)._2
      .localCheckpoint()
    val nTrue = truth.count()
    val nCand = cands.count()
    val nHits = cands.join(truth, Seq("a", "b"), "left_semi").count()
    import spark.implicits._
    Seq((nTrue, nCand, nHits)).toDF("n_true", "n_candidates", "n_hits")
      .withColumn("recall", when(col("n_true") > 0,
        round(col("n_hits").cast("double") / col("n_true"), 6)))
  }

  // --- near-dup clustering -------------------------------------------------

  /** Connected components of a near-dup pair graph: `(node, component)`
    * with `component` = the smallest id reachable from the node over the
    * pair edges. The step a training-data pipeline runs after pair
    * generation: a transitive family of near-dups collapses to ONE
    * cluster, not a tangle of pairwise drops.
    *
    * Long-id graphs (every production caller) run alternating
    * large-star/small-star contraction (Kiveris et al., SoCC'14) on
    * co-partitioned RDDs — rounds grow with log of the component
    * structure, NOT its diameter. The r14 neighbor-min + pointer-jump
    * loop was measured needing rounds ∝ diameter under random id
    * labeling (585–927 simulated rounds on a 2,000-node random-id path;
    * the real sf0.1 mutual-kNN graph used 29 of maxIter=30) — a silent
    * wrong answer waiting at 100 TB. Star contraction converges in ~10
    * rounds on the same graphs, and BOTH paths now THROW on
    * non-convergence instead of returning split components.
    * State per round is only (Long, Long) edge pairs on a fixed
    * HashPartitioner — no driver-side graph, no unbounded collect; the
    * generic-id DataFrame fallback keeps
    * [[graft.functions.Lineage.barrier]] to cut iterative lineage and
    * origin statistics. Nodes appearing in no pair are absent (their
    * component is themselves). */
  def connectedComponents(pairs: DataFrame, aCol: String = "a",
                          bCol: String = "b", maxIter: Int = 50): DataFrame = {
    import org.apache.spark.sql.types.LongType
    // id-typed dispatch (r14): Long ids (every production caller:
    // doc_id / vec_id graphs) run the co-partitioned RDD star loop —
    // 2 narrow-row shuffles and ONE action per round, no Catalyst
    // re-planning, no stats-barrier round-trip, and (r15) rounds that
    // scale with log of the structure instead of its diameter.
    // Non-long id graphs keep the DataFrame label-propagation loop
    // below (generic comparison/min semantics), which now fails loudly
    // if its diameter-bound rounds run out.
    if (pairs.schema(aCol).dataType == LongType &&
        pairs.schema(bCol).dataType == LongType)
      ccLong(pairs, aCol, bCol, maxIter)
    else ccDataFrame(pairs, aCol, bCol, maxIter)
  }

  /** Round count of the most recent [[ccLong]]/[[ccDataFrame]] call —
    * spec observability for the convergence-rate contract (the
    * pathological-diameter spec pins star contraction's round count). */
  private[graft] val lastCcRounds =
    new java.util.concurrent.atomic.AtomicInteger(-1)

  /** Long-id connected components by alternating LARGE-STAR/SMALL-STAR
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14) on co-partitioned RDDs. Same fixpoint as
    * [[ccDataFrame]]: `component` = the smallest reachable id over the
    * pair edges, one row per node appearing in any pair.
    *
    * Why stars and not label propagation: neighbor-min + pointer-jump
    * (the r14 shape) needs rounds ∝ effective diameter under random id
    * labeling — measured 585–927 simulated rounds on a 2,000-node
    * random-id path, and 29/30 rounds on the real sf0.1 mutual-kNN
    * graph. Star contraction RESTRUCTURES the graph each round
    * (large-star hangs every bigger neighbor off u's minimum, small-star
    * collapses the smaller neighborhood onto it), which halves long
    * paths like pointer doubling but without keeping per-node label
    * state — measured ~10 rounds on the same pathological graphs.
    *
    * Shape per phase: a narrow `reduceByKey` min + narrow join against
    * the co-partitioned edge set, then ONE (Long, Long) shuffle to
    * re-key the emitted star edges, deduped per partition (exactly —
    * a dropped distinct edge could split a component). Two phases per
    * round, signature-fixpoint after small-star. Non-convergence within
    * `maxIter` THROWS — a split component must never return silently.
    * Skew note: a star center's degree approaches its component size;
    * the per-partition dedup bounds the edge multiset, and at sf scales
    * the hot partition holds the component — the 100 TB mitigation
    * (high-degree node splitting) is documented in the paper and not
    * needed at gate scale. */
  private def ccLong(pairs: DataFrame, aCol: String, bCol: String,
                     maxIter: Int): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    // raw undirected pairs, materialized ONCE (the upstream pair
    // lineage — LSH banding, cosine verification — must not re-run).
    // Null ids carry no connectivity and are dropped (the r14 encoder
    // path threw on them instead; no declared gate emits null ids).
    val raw = pairs.select(col(aCol), col(bCol)).rdd.flatMap { r =>
      if (r.isNullAt(0) || r.isNullAt(1)) Iterator.empty
      else Iterator((r.getLong(0), r.getLong(1)))
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // partition count derived from the edge count, not the core count:
    // RDD shuffles have no AQE coalescing, so a fixed
    // defaultParallelism-wide partitioner makes every round pay wide
    // near-empty stages (r14 measurement). ~500k edge rows per
    // partition keeps tasks meaningful at every factor; the cap keeps
    // a 100 TB run from over-splitting.
    val nRaw = raw.count()
    val p = new org.apache.spark.HashPartitioner(
      math.max(1, math.min(2 * nRaw / 500000L + 1,
        sc.defaultParallelism.toLong * 2)).toInt)
    // re-key by the emitted first element and dedup EXACTLY within the
    // partition (all copies of a pair share the key, so per-partition
    // dedup is global for the pair; a hash-compressed set could drop a
    // distinct edge on collision and split a component)
    def dedupP(rdd: org.apache.spark.rdd.RDD[(Long, Long)])
        : org.apache.spark.rdd.RDD[(Long, Long)] =
      rdd.partitionBy(p).mapPartitions({ it =>
        val seen = scala.collection.mutable.HashSet[(Long, Long)]()
        it.filter(seen.add)
      }, preservesPartitioning = true)
    // full node set (including self-loop-only nodes): the output
    // contract is one row per node appearing in ANY pair
    val nodes = dedupP(raw.flatMap { case (a, b) =>
      Iterator((a, a), (b, b)) })
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // symmetric, self-loop-free working edge set
    var edges = dedupP(raw.flatMap { case (a, b) =>
      if (a == b) Iterator.empty else Iterator((a, b), (b, a)) })
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // large-star(u): hang every neighbor v > u off m = min(N(u) ∪ {u});
    // each undirected edge is processed from its smaller endpoint
    def largeStar(e: org.apache.spark.rdd.RDD[(Long, Long)]) = {
      val m = e.reduceByKey(p, (x: Long, y: Long) => math.min(x, y))
        .mapPartitions(_.map { case (u, mn) => (u, math.min(u, mn)) },
          preservesPartitioning = true)
      dedupP(e.join(m).flatMap { case (u, (v, mu)) =>
        if (v > u) Iterator((v, mu), (mu, v)) else Iterator.empty })
    }
    // small-star(u): collapse the SMALLER neighborhood (and u itself)
    // onto its minimum; each undirected edge is processed from its
    // bigger endpoint — between them the phases cover every edge
    def smallStar(e: org.apache.spark.rdd.RDD[(Long, Long)]) = {
      val sm = e.filter { case (u, v) => v < u }
      val m = sm.reduceByKey(p, (x: Long, y: Long) => math.min(x, y))
      dedupP(sm.join(m).flatMap { case (u, (v, mu)) =>
        if (v == mu) Iterator((u, mu), (mu, u))
        else Iterator((v, mu), (mu, v)) })
    }
    var prevSig: Option[(Long, Long)] = None
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val next = smallStar(largeStar(edges))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // fixpoint when the deduped edge set's (count, xor-hash)
      // signature repeats — at the fixpoint both phases map a star to
      // itself, so the signature is stationary exactly at convergence.
      // Computed in the single per-round action that materializes
      // `next`.
      val sig = next.mapPartitions { it =>
        var n = 0L; var h = 0L
        it.foreach { case (u, v) =>
          n += 1
          h ^= scala.util.hashing.byteswap64(u * 0x9e3779b97f4a7c15L + v)
        }
        Iterator((n, h))
      }.fold((0L, 0L)) { case ((a, b), (c, d)) => (a + c, b ^ d) }
      if (iter == 0) raw.unpersist(blocking = false)
      edges.unpersist(blocking = false)
      done = prevSig.contains(sig)
      prevSig = Some(sig)
      edges = next
      iter += 1
    }
    lastCcRounds.set(iter)
    if (!done) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter star rounds — " +
        "the component structure is beyond the configured bound; raise " +
        "maxIter rather than accept silently split components")
    // fixpoint edges are stars centered on component minima: the
    // big→small orientation reads (node → component); centers and
    // isolated (self-loop-only) nodes label themselves
    val star = edges.filter { case (u, v) => v < u }
      .reduceByKey(p, (x: Long, y: Long) => math.min(x, y))
    val labels = nodes.leftOuterJoin(star)
      .map { case (n, (_, m)) => (n, m.getOrElse(n)) }
    // materialize the output ONCE, then drop every loop persist: the
    // r14 shape returned the final labels RDD still persisted with no
    // unpersist path — 11 CC call sites each pinned executor storage
    // for the session's lifetime (VERDICT r14 #3)
    val out = labels.toDF("node", "component").localCheckpoint()
    nodes.unpersist(blocking = false)
    edges.unpersist(blocking = false)
    out
  }

  /** DataFrame connected-components loop — the generic-id path (and the
    * shape [[ccLong]] mirrors). r14: the neighbor-min is FUSED with the
    * self-label merge — the old shape joined labels against a separate
    * per-neighbor min frame (edges⋈labels → groupBy(u) → labels⋈prop,
    * two joins + one agg); unioning the node's own label into the
    * message stream computes the same min(l(u), min over v in N(u) of
    * l(v)) with ONE join and ONE aggregation (OptProbe interleaved A/B
    * at sf0.1: ~15-20% per-round wall cut, identical signatures and
    * round counts on both gate graph shapes). A double pointer jump per
    * round was tried and REJECTED: without a materialization between
    * jumps the round subtree executes 4x (self-joins do not share
    * un-materialized subtrees) and measured walls roughly doubled. */
  private def ccDataFrame(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int): DataFrame = {
    import graft.functions.Lineage.barrier
    val sym = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
    val edges = barrier(sym)
    var labels = barrier(edges.groupBy(col("u"))
      .agg(min(col("v")).as("mn"))
      .select(col("u").as("node"), least(col("u"), col("mn")).as("label")))
    var prevSig: Option[(Long, Long)] = None
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val msgs = edges
        .join(labels.withColumnRenamed("node", "v"), "v")
        .select(col("u"), col("label"))
        .union(labels.select(col("node").as("u"), col("label")))
      val merged = msgs.groupBy(col("u")).agg(min(col("label")).as("label"))
        .withColumnRenamed("u", "node")
      // pointer jump: l(u) <- l(l(u)) (labels are node ids, so the label
      // table joins against itself keyed by label)
      def jump(df: DataFrame): DataFrame =
        df.join(df.select(col("node").as("label"), col("label").as("ll")),
            Seq("label"), "left")
          .select(col("node"),
            least(col("label"), coalesce(col("ll"), col("label"))).as("label"))
      val jumped = barrier(jump(merged))
      // fixpoint when the (count, content-hash) signature repeats —
      // bit_xor: order-independent and immune to ANSI long overflow
      val sig = jumped
        .agg(count(lit(1)), bit_xor(xxhash64(col("node"), col("label")))).head()
      val cur = (sig.getLong(0), if (sig.isNullAt(1)) 0L else sig.getLong(1))
      done = prevSig.contains(cur)
      prevSig = Some(cur)
      labels = jumped
      iter += 1
    }
    lastCcRounds.set(iter)
    if (!done) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter label rounds — " +
        "label propagation needs rounds ∝ diameter; a split-component " +
        "result must never return silently")
    labels.withColumnRenamed("label", "component")
  }

  /** Corpus dedup with CLUSTER survivors: ONE document kept per
    * connected component of the near-dup pair graph (the smallest id),
    * plus every document in no pair. Unlike [[deduplicate]]'s greedy
    * per-pair policy (drop the larger side of each pair), the survivor
    * set is closed under transitivity: a's dup b and b's dup c collapse
    * to {a}, never {a, c}. */
  def deduplicateClustered(docs: DataFrame, pairs: DataFrame,
                           idCol: String = "doc_id"): DataFrame = {
    val losers = connectedComponents(pairs)
      .filter(col("node") =!= col("component"))
      .select(col("node").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  // --- SimHash -------------------------------------------------------------

  /** 64-bit SimHash of the token multiset (Charikar '02): each feature
    * votes its hash bits ±1, the sketch is the sign vector. Computed as a
    * per-row aggregate over the token array — no shuffle. */
  def simhash64(text: Column): Column =
    simhashFromHashes(transform(Text.tokens(lower(text)), t => xxhash64(t)))

  /** Oracle-replicable 60-bit feature hash: the first 15 hex chars of the
    * md5 digest as a long. xxhash64 (the default feature hash) has no
    * DuckDB twin; md5 does, so gates run the full SimHash pipeline under
    * this hash and the oracle rebuilds it bit for bit. 60 bits keep the
    * ANSI-safe long cast; the top 4 sketch bits are constant zero on both
    * sides, which shifts no Hamming distance. */
  val md5Hash60: Column => Column =
    c => conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** SimHash from pre-hashed features — the 64 bit-votes fused into one
    * codegen pass ([[org.apache.spark.sql.graftio.VecMath.SimHashVote]];
    * the per-bit Column-aggregate formulation ran 64 interpreted passes
    * over the hash array per document). Callers should materialize the
    * hash array in its own projection (one string hash per token). */
  def simhashFromHashes(hashes: Column): Column =
    graft.functions.VecMath.simhashVote(hashes)

  /** SimHash near-dup pairs with Hamming distance <= maxDist. Candidates
    * via the standard banded-permutation trick: split 64 bits into
    * `maxDist+1` bands — any pair within `maxDist` shares at least one
    * exact band (pigeonhole), so candidates form by groupBy(band value),
    * never all-pairs. Output: (a, b, hamming). */
  def simhashNearDup(docs: DataFrame, maxDist: Int = 3,
                     textCol: String = "text", idCol: String = "doc_id",
                     hashFn: Column => Column = c => xxhash64(c),
                     maxDocChars: Int = Int.MaxValue): DataFrame = {
    val sh = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism * 2)
      .select(col(idCol).as("id"),
        transform(Text.tokens(lower(capText(col(textCol), maxDocChars))),
          t => hashFn(t)).as("th"))
      .select(col("id"), simhashFromHashes(col("th")).as("h"))
    hammingNearDup(sh, maxDist)
  }

  /** All pairs within Hamming distance `maxDist` of any 64-bit sketch
    * column — the shared engine under [[simhashNearDup]] and
    * [[Multimodal.imageNearDup]]'s perceptual hashes. EXACT despite the
    * bucketing: splitting 64 bits into `maxDist+1` bands means any pair
    * within `maxDist` shares at least one whole band (pigeonhole), so
    * candidates form by equi-join on (band, value) — never all-pairs —
    * and the bit_count verification drops nothing that should survive.
    * Input: (`idCol`, `hashCol`) rows. Output: (a, b, hamming). */
  def hammingNearDup(hashed: DataFrame, maxDist: Int = 3,
                     hashCol: String = "h", idCol: String = "id"): DataFrame = {
    require(maxDist >= 0 && maxDist < 64, "maxDist must be in [0, 64)")
    val nBands = maxDist + 1
    val width = 64 / nBands
    val sh = hashed.select(col(idCol).as("id"), col(hashCol).as("h"))
    // band b: bits [b*width, (b+1)*width) (last band takes the rest)
    val bandKeys = array((0 until nBands).map { b =>
      if (b == nBands - 1) shiftrightunsigned(col("h"), b * width)
      else shiftrightunsigned(col("h"), b * width)
        .bitwiseAND(lit((1L << width) - 1))
    }: _*)
    val banded = sh.select(col("id"), col("h"), posexplode(bandKeys))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    val candidates = banded.alias("l")
      .join(banded.alias("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        col("l.h").as("ha"), col("r.h").as("hb"))
      .dropDuplicates("a", "b")
    candidates
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxDist)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** Cross-corpus near-duplicate pairs: docs in `corpusA` whose word
    * n-gram Jaccard with a doc in `corpusB` crosses the threshold —
    * the "did our crawl duplicate the licensed set" question, distinct
    * from in-corpus dedup ([[minhashLsh]]) and from containment-style
    * decontamination ([[decontaminate]]: any shared shingle window).
    * Ids must be globally unique across the two inputs.
    *
    * Shape: ONE banding pass over the tagged union (same cost as
    * in-corpus LSH on |A|+|B|), then same-side candidate pairs drop
    * before verification. Output: `id_a` (always the A-side doc),
    * `id_b`, `jaccard`. */
  def crossDupPairs(corpusA: DataFrame, corpusB: DataFrame,
                    n: Int = 3, bands: Int = 64, rowsPerBand: Int = 2,
                    threshold: Double = 0.5, textCol: String = "text",
                    idCol: String = "doc_id",
                    maxBucket: Int = Int.MaxValue,
                    maxDocChars: Int = Int.MaxValue): DataFrame = {
    // maxBucket (minhashLsh's heavy-bucket valve) defaults to DISABLED
    // here: this is a compliance product — an over-cap family silently
    // reporting NO cross-corpus pairs is worse than the pair volume.
    // At crawl scale set the cap deliberately and audit what it drops
    // with lshOverCapBuckets over the tagged union.
    def side(df: DataFrame, s: Int) =
      df.select(col(idCol), col(textCol)).withColumn("__side", lit(s))
    val tagged = side(corpusA, 0).unionByName(side(corpusB, 1))
    val pairs = minhashLsh(tagged, n, bands, rowsPerBand, threshold,
      textCol, idCol, maxBucket, maxDocChars)
    val sides = tagged.select(col(idCol).as("__sid"), col("__side"))
    pairs
      .join(sides.select(col("__sid").as("a"), col("__side").as("__sa")), "a")
      .join(sides.select(col("__sid").as("b"), col("__side").as("__sb")), "b")
      .filter(col("__sa") =!= col("__sb"))
      .select(
        when(col("__sa") === 0, col("a")).otherwise(col("b")).as("id_a"),
        when(col("__sa") === 0, col("b")).otherwise(col("a")).as("id_b"),
        col("jaccard"))
  }

  /** Duplicate-rate matrix: near-dup pair counts and mean similarity
    * per (stratum, stratum) cell — "which sources copy which" at a
    * glance (a hot diagonal cell = an internally-duplicated source, a
    * hot off-diagonal = syndication between two). One [[minhashLsh]]
    * pass; strata join back onto the (few) verified pairs and the cell
    * key is order-normalized so each unordered source pair is one row.
    *
    * Output: `src_a` <= `src_b` (lexicographic), `n_pairs`,
    * `mean_jaccard` (rounded 6). */
  def dupMatrix(docs: DataFrame, stratumCol: String, n: Int = 3,
                bands: Int = 64, rowsPerBand: Int = 2,
                threshold: Double = 0.5, textCol: String = "text",
                idCol: String = "doc_id",
                maxBucket: Int = Int.MaxValue,
                maxDocChars: Int = Int.MaxValue): DataFrame = {
    // maxBucket (minhashLsh's heavy-bucket valve) defaults to DISABLED:
    // the matrix is a which-source-copies-which report, and an over-cap
    // family vanishing from its cells inverts the report's conclusion
    // (the MOST duplicated source reads as clean). A capped run should
    // pair with lshOverCapBuckets so the dropped families are named.
    val pairs = minhashLsh(docs, n, bands, rowsPerBand, threshold,
      textCol, idCol, maxBucket, maxDocChars)
    val s = docs.select(col(idCol).as("__sid"),
      col(stratumCol).cast("string").as("__str"))
    pairs
      .join(s.select(col("__sid").as("a"), col("__str").as("__sa")), "a")
      .join(s.select(col("__sid").as("b"), col("__str").as("__sb")), "b")
      .groupBy(least(col("__sa"), col("__sb")).as("src_a"),
        greatest(col("__sa"), col("__sb")).as("src_b"))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(col("jaccard")), 6).as("mean_jaccard"))
  }

  /** The final step of a near-dup pipeline: given the corpus, the
    * cluster assignment ([[connectedComponents]] output — `node`,
    * `component`), and a quality expression, keep exactly ONE doc per
    * near-dup cluster (highest quality, ties to the smallest id) plus
    * every unclustered doc. This is "dedup by cluster, keep the best
    * copy" — dropping by pairwise edges alone either over-deletes (both
    * ends) or keeps transitive dup families.
    *
    * Shape: the cluster frame is pair-graph-sized (only docs with an
    * edge), so the top-1 rank runs on the small frame — via
    * [[graft.llm.Rank.stagedTopN]], because a single duplicate FAMILY
    * is unbounded (star dedup of an identical-replica corpus puts the
    * whole corpus in one component; a plain per-component window would
    * sort that family in one task). The corpus is touched by one anti +
    * one semi membership join on the id — AQE broadcasts them when the
    * clustered-id set is small enough and falls back to a shuffle join
    * when a dup-heavy corpus makes it large. Output: the kept rows of
    * `docs`, unchanged. */
  def dedupKeepBest(docs: DataFrame, clusters: DataFrame, quality: Column,
                    idCol: String = "doc_id"): DataFrame = {
    val q = docs.select(col(idCol).as("__id"), quality.as("__q"))
    val best = Rank.stagedTopN(
        clusters.join(q, col("node") === col("__id")),
        Seq(col("component")),
        Seq(col("__q").desc, col("node").asc), lit(1),
        saltKey = col("node"))
      .select(col("node"))
    val members = clusters.select(col("node"))
    docs.join(members, col(idCol) === col("node"), "left_anti")
      .unionByName(
        docs.join(best, col(idCol) === col("node"), "left_semi"))
  }

  /** Soft deduplication weights (SoftDeDup): instead of DROPPING
    * near-duplicates, every document gets a training weight
    * `1 / |its near-dup cluster|` — the whole cluster still contributes
    * one document's worth of gradient, but no single arbitrary survivor
    * decides WHICH phrasing the model sees. Documents in no cluster
    * weigh 1. Feed [[connectedComponents]] over any pair source
    * (MinHash, SimHash, embedding) as `clusters`.
    *
    * Shape: cluster sizes are one hash aggregate over the (node,
    * component) frame — cluster-scale, not corpus-scale — and both
    * joins back to the id frame are AQE-sized. The weight divides two
    * exact longs, so the double replays across engines.
    *
    * Output: id col, `cluster` (component id; the doc's own id when
    * unclustered), `weight` (rounded 6). */
  def softDedupWeights(docs: DataFrame, clusters: DataFrame,
                       idCol: String = "doc_id"): DataFrame = {
    val sizes = clusters.groupBy(col("component"))
      .agg(count(lit(1)).as("__sz"))
    docs.select(col(idCol))
      .join(clusters.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .join(sizes, Seq("component"), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("cluster"),
        round(lit(1.0) / coalesce(col("__sz"), lit(1L)), 6).as("weight"))
  }
}
