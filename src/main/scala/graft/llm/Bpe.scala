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

  /** Train `k` merges over a (word, freq) vocabulary. Each round
    * counts adjacent symbol pairs weighted by word frequency, picks the
    * most frequent (ties: lexicographically smallest pair — fully
    * deterministic), and rewrites the vocab. The vocab is
    * `localCheckpoint`ed per round: lineage stays O(1) deep instead of
    * accumulating k nested folds. Returns the ordered merge table —
    * the trained tokenizer artifact (k rows on the driver). */
  def train(vocab: DataFrame, k: Int): Seq[Merge] = {
    var v = vocab
      .select(col("word"), charSymbols(col("word")).as("s"), col("freq"))
      .localCheckpoint()
    val out = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= k && !done) {
      val best = v
        .select(col("freq"), explode(when(size(col("s")) >= 2,
            transform(sequence(lit(1), size(col("s")) - 1),
              i => struct(element_at(col("s"), i).as("l"),
                element_at(col("s"), i + 1).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>")))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
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
    val dict = words.select(col("word")).distinct()
      .select(col("word"), size(applyMerges(col("word"), merges)).as("__n"))
    words.join(broadcast(dict), Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("__n")).as("n_bpe_tokens"))
  }

  /** The merge table as a DataFrame (for gates / persistence). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }
}
