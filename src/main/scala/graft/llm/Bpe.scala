package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016,
  * arXiv:1508.07909) — the "train the tokenizer on the corpus you just
  * curated" step of an LLM data pipeline, run where the data lives.
  *
  * Classic BPE operates on the WORD-FREQUENCY table, not the raw
  * corpus: the corpus collapses to (word, freq) once (one shuffle —
  * at 100 TB the vocab is millions of rows, not billions), then every
  * merge round is (a) one pair-count aggregate over the vocab and
  * (b) one narrow per-row symbol-array rewrite. Rounds are genuinely
  * sequential (each merge depends on the last), so training cost is
  * `merges` small Spark jobs over a bounded table — the right shape,
  * matching the reference implementations' vocab-level loop.
  *
  * Merge semantics are the standard greedy non-overlapping
  * left-to-right pass per word (`learn_bpe`'s regex with non-consuming
  * boundaries): in a run of back-to-back matches only every other one
  * merges. Merges never cross word boundaries; no end-of-word marker
  * (the GPT-2-style convention).
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Word-frequency vocabulary: ONE corpus pass + one shuffle.
    * `normalize` lowercases and strips non-[a-z0-9] (dropping words
    * that normalize to nothing) — the plain-ASCII regime the gates run
    * under; pass false to train on raw whitespace tokens. */
  def wordVocab(docs: DataFrame, normalize: Boolean = true,
                textCol: String = "text"): DataFrame = {
    val raw = docs.select(explode(Text.tokens(col(textCol))).as("word"))
    val words =
      if (!normalize) raw
      else raw.select(
          regexp_replace(lower(col("word")), "[^a-z0-9]", "").as("word"))
        .filter(length(col("word")) > 0)
    words.groupBy(col("word")).agg(count(lit(1)).as("freq"))
  }

  /** One greedy merge pass of the pair (a, b) over a symbol array,
    * as a pure fold: append each symbol, but when the accumulator ends
    * with `a` and the next symbol is `b`, replace the tail with the
    * merged symbol. Back-to-back matches merge every other occurrence
    * (after a merge the tail is `a+b`, which can't equal `a`), exactly
    * the reference regex semantics. */
  private[llm] def mergeOnce(s: Column, a: String, b: String): Column =
    aggregate(s, array().cast("array<string>"), (acc, x) =>
      when(try_element_at(acc, lit(-1)) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** The initial symbol array: one single-character symbol per char. */
  private[llm] def charSymbols(word: Column): Column = split(word, "")

  /** Adjacent-pair counts over a symbol-array vocab, weighted by word
    * frequency — the per-round aggregate both trainers share. */
  private def pairCounts(v: DataFrame): DataFrame = v
    .select(col("freq"), explode(when(size(col("s")) >= 2,
        transform(sequence(lit(1), size(col("s")) - 1),
          i => struct(element_at(col("s"), i).as("l"),
            element_at(col("s"), i + 1).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>")))
      .as("p"))
    .groupBy(col("p.l").as("l"), col("p.r").as("r"))
    .agg(sum(col("freq")).as("cnt"))

  /** Train `k` merges over a (word, freq) vocabulary — the serial
    * reference trainer: one pair-count aggregate + one vocab rewrite
    * per merge (ties: lexicographically smallest pair — fully
    * deterministic). The vocab is `localCheckpoint`ed per round:
    * lineage stays O(1) deep instead of accumulating k nested folds.
    * Returns the ordered merge table — the trained tokenizer artifact
    * (k rows on the driver). For production vocab sizes use
    * [[trainBatched]], which emits the IDENTICAL merge list in far
    * fewer Spark rounds. */
  def train(vocab: DataFrame, k: Int): Seq[Merge] = {
    var v = vocab
      .select(col("word"), charSymbols(col("word")).as("s"), col("freq"))
      .localCheckpoint()
    val out = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= k && !done) {
      val best = pairCounts(v)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += Merge(rank, l, r, cnt)
        val prev = v
        v = v.withColumn("s", mergeOnce(col("s"), l, r)).localCheckpoint()
        prev.unpersist()
        rank += 1
      }
    }
    out.result()
  }

  /** Batched trainer: emits the same merge list as [[train]] — proven
    * by BpeSpec on adversarial vocabs — in rounds of non-interacting
    * merges, so a 50k-merge production run costs hundreds of Spark
    * rounds instead of 50k.
    *
    * Per round the top-`maxBatch` pairs are collected once and a PREFIX
    * of them (in the global (cnt desc, l, r) order) is accepted while
    * provably serial-equivalent:
    *  - prefix, never skip: a rejected pair's count may only DECREASE
    *    under earlier merges, but skipping it could reorder ties;
    *  - pairwise symbol-disjoint (incl. each merged symbol's string — a
    *    merge product can collide with an existing symbol's spelling):
    *    disjoint pairs' counts are invariant under each other's merges;
    *  - strictly above the new-pair ceiling: a merge of (a,b) creates
    *    pairs (x,a+b) with <= max_x cnt(x,a) occurrences and (a+b,y)
    *    with <= max_y cnt(b,y); when the spelling `a+b` collides with
    *    an existing symbol those land ON TOP of the existing (x,"a+b")
    *    counts, so the ceiling for (a,b) is
    *    max(maxRight(a) + maxRight(a+b), maxLeft(b) + maxLeft(a+b))
    *    and any next accepted pair must strictly beat the running max —
    *    otherwise a freshly created-or-boosted pair could out-rank it
    *    in the serial order.
    * The ceilings come from two symbol-level max aggregates restricted
    * to the <= 3·maxBatch candidate symbols — driver state stays
    * O(maxBatch), never the full pair table.
    *
    * Returns (merges, rounds). */
  def trainBatched(vocab: DataFrame, k: Int,
                   maxBatch: Int = 64): (Seq[Merge], Int) = {
    var v = vocab
      .select(col("word"), charSymbols(col("word")).as("s"), col("freq"))
      .localCheckpoint()
    val out = Seq.newBuilder[Merge]
    var rank = 1
    var rounds = 0
    var done = false
    while (rank <= k && !done) {
      val pc = pairCounts(v).localCheckpoint() // reused 3x this round
      val top = pc
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(math.min(k - rank + 1, maxBatch)).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) done = true
      else {
        val syms = top.flatMap(t => Seq(t._1, t._2, t._1 + t._2))
          .toSet.toSeq
        val maxLeft = pc.filter(col("l").isInCollection(syms))
          .groupBy(col("l")).agg(max(col("cnt")).as("m")).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val maxRight = pc.filter(col("r").isInCollection(syms))
          .groupBy(col("r")).agg(max(col("cnt")).as("m")).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        var used = Set.empty[String]
        var ceiling = -1L
        val batch = Seq.newBuilder[Merge]
        var n = 0
        var stop = false
        for ((l, r, cnt) <- top if !stop) {
          if ((used(l) || used(r)) || (n > 0 && cnt <= ceiling)) stop = true
          else {
            batch += Merge(rank + n, l, r, cnt)
            used ++= Seq(l, r, l + r)
            ceiling = math.max(ceiling, math.max(
              maxRight.getOrElse(l, 0L) + maxRight.getOrElse(l + r, 0L),
              maxLeft.getOrElse(r, 0L) + maxLeft.getOrElse(l + r, 0L)))
            n += 1
          }
        }
        val accepted = batch.result()
        val prev = v
        v = v.withColumn("s", accepted.foldLeft(col("s")) { (s, m) =>
            mergeOnce(s, m.left, m.right)
          }).localCheckpoint()
        prev.unpersist()
        pc.unpersist()
        out ++= accepted
        rank += accepted.size
        rounds += 1
      }
    }
    (out.result(), rounds)
  }

  /** Apply a learned merge list to a symbol array, in rank order —
    * k nested folds. Fine for the k ≈ tens regime; for a production
    * 50k-merge tokenizer, encode via [[encode]]'s dictionary join
    * against a vocab trained with the same merges. */
  def applyMerges(word: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(charSymbols(word)) { (s, m) =>
      mergeOnce(s, m.left, m.right)
    }

  /** BPE-encode a corpus: per-document subword-token count under a
    * learned merge list. The expensive fold runs once per DISTINCT
    * word (the dictionary), which then broadcast-joins back onto the
    * word stream — the classic dictionary-encode shape: corpus cost is
    * one explode + one broadcast join + one groupBy, independent of
    * `merges` size. `normalize` must match the training run. */
  def encode(docs: DataFrame, merges: Seq[Merge], normalize: Boolean = true,
             textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val wordCol =
      if (!normalize) col("word")
      else regexp_replace(lower(col("word")), "[^a-z0-9]", "").as("word")
    val words = docs
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("word"))
      .select(col(idCol), wordCol)
      .filter(length(col("word")) > 0)
    // r15: reduce the token stream to per-doc word COUNTS first and
    // derive the dictionary from that frame (lazily cut) — the old
    // shape consumed `words` twice (dict distinct + join side), paying
    // the corpus tokenize + explode pass per consumer, and shuffled one
    // row per TOKEN into the join instead of one per (doc, word).
    val wc = words.groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(false)
    val dict = wc.select(col("word")).distinct()
      .select(col("word"), size(applyMerges(col("word"), merges)).as("__n"))
    wc.join(broadcast(dict), Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("__c") * col("__n")).as("n_bpe_tokens"))
  }

  /** The merge table as a DataFrame (for gates / persistence). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }
}
