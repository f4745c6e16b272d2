package graft

import graft.llm.Bpe

/** trainBatched must emit the IDENTICAL merge list to the serial
  * trainer — including on vocabs engineered to break naive batching:
  * tiny alphabets (every merge interacts), self-pairs (aa), ties, and
  * merge products whose spelling collides with existing symbols. */
class BpeBatchSpec extends SparkFunSuite {

  private def vocabDf(words: Seq[(String, Long)]) = {
    val sp = spark; import sp.implicits._
    words.toDF("word", "freq")
  }

  private def check(words: Seq[(String, Long)], k: Int,
                    maxBatch: Int = 64): Int = {
    val serial = Bpe.train(vocabDf(words), k)
    val (batched, rounds) = Bpe.trainBatched(vocabDf(words), k, maxBatch)
    assert(batched == serial,
      s"batched != serial for k=$k maxBatch=$maxBatch words=$words")
    rounds
  }

  test("identical merges on an English-like vocab, in far fewer rounds") {
    val words = Seq(
      "the" -> 100L, "then" -> 40L, "there" -> 30L, "these" -> 25L,
      "quick" -> 20L, "brown" -> 18L, "fox" -> 15L, "jumps" -> 12L,
      "over" -> 30L, "lazy" -> 10L, "dog" -> 22L, "lowest" -> 8L,
      "newest" -> 14L, "widest" -> 9L, "wider" -> 7L, "low" -> 28L,
      "new" -> 35L, "wide" -> 11L, "est" -> 5L, "ingest" -> 6L,
      "running" -> 13L, "runner" -> 17L, "walked" -> 8L, "walking" -> 9L)
    val k = 20
    val rounds = check(words, k)
    assert(rounds < k, s"expected batching to win: $rounds rounds for $k merges")
  }

  test("identical merges on a 2-letter alphabet (maximal interaction)") {
    // every symbol appears everywhere: spelling collisions ("ab" merged
    // while "ab" adjacencies re-form), self-pairs (aa), chained products
    val words = Seq(
      "abab" -> 50L, "aabb" -> 40L, "abba" -> 30L, "aaaa" -> 25L,
      "bbbb" -> 20L, "ababab" -> 15L, "baba" -> 35L, "aab" -> 45L,
      "abb" -> 28L, "ba" -> 60L, "ab" -> 55L, "aaab" -> 18L)
    check(words, 12)
  }

  test("identical merges under ties and across maxBatch settings") {
    // exact count ties: tie-break is (cnt desc, l asc, r asc); the batch
    // rule must preserve it at every batch boundary
    val words = Seq(
      "xy" -> 10L, "uv" -> 10L, "pq" -> 10L, "mn" -> 10L,
      "xyuv" -> 5L, "pqmn" -> 5L, "uvxy" -> 5L, "mnpq" -> 5L)
    for (mb <- Seq(1, 2, 3, 64)) check(words, 8, maxBatch = mb)
  }

  test("identical merges on seeded random small-alphabet vocabs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val alpha = "abc".take(2 + trial % 2)
      val words = (0 until 30).map { _ =>
        val len = 2 + rnd.nextInt(6)
        val w = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length)))
          .mkString
        w -> (1L + rnd.nextInt(50))
      }.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }.toSeq
      check(words, 10)
    }
  }

  test("batched trainer stops when no pairs remain, like the serial one") {
    val words = Seq("ab" -> 3L, "cd" -> 2L)
    // only 2 possible merges exist; asking for 10 must return 2
    val serial = Bpe.train(vocabDf(words), 10)
    val (batched, _) = Bpe.trainBatched(vocabDf(words), 10)
    assert(batched == serial && batched.size < 10)
  }
}
