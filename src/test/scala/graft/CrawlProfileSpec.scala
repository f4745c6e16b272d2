package graft

import org.apache.spark.sql.functions._

import graft.llm.{CrawlProfile, Dedup, Embed}
import graft.sources.TestData

/** The crawl-profile presets must COMPOSE the individually-certified
  * rails, not re-implement them (VERDICT r11 #6): `crawl.dedup` is the
  * `doc_dedup_pipeline_star` ScaleCheck composition parameterized once,
  * and `compliance.nearDupEdges` is the valves-off clique path whose
  * equality with exact n-gram Jaccard the driver gates already certify.
  * These run on the real sf0.001 documents table so the equalities are
  * about the corpus regime, not a toy fixture. */
class CrawlProfileSpec extends SparkFunSuite {

  private def docs = TestData.table(spark, "/root/testdata/sf0.001",
    "documents")

  test("crawl.dedup reproduces the certified star pipeline's survivors " +
      "(salt + doc-cap are no-ops on this corpus, as documented)") {
    val prof = CrawlProfile.crawl
    val got = prof.dedup(docs, col("n_chars").cast("double"))
      .select(col("doc_id")).orderBy(col("doc_id"))
    // the ScaleCheck composition, spelled out with ITS parameters
    // (hubSalt = 0, no doc cap): on a corpus without degenerate mega
    // buckets or giant docs the preset's valves must not change results
    val want = Dedup.dedupKeepBest(docs,
        Dedup.connectedComponents(
          Dedup.minhashLshStar(docs, n = 3, bands = 64, rowsPerBand = 2,
            threshold = 0.5)),
        col("n_chars").cast("double"))
      .select(col("doc_id")).orderBy(col("doc_id"))
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0,
      "preset dedup diverged from the star pipeline composition")
  }

  test("compliance.nearDupEdges equals exact n-gram Jaccard pairs " +
      "(the valves-off clique path at the detect-always operating point)") {
    val prof = CrawlProfile.compliance
    val got = prof.nearDupEdges(docs)
      .select(col("a"), col("b"), col("jaccard"))
    val want = Dedup.ngramJaccard(docs, threshold = 0.5)
      .select(col("a"), col("b"), col("jaccard"))
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0,
      "compliance edges diverged from the exact pair scorer")
  }

  test("semDedupStar refines semDedup: star survivors contain the " +
      "clique survivors, with linear edge volume") {
    val sp = spark
    import sp.implicits._
    val emb = TestData.table(sp, "/root/testdata/sf0.001", "embeddings")
    val init = emb.filter(col("vec_id") < 4).orderBy(col("vec_id"))
      .select(Embed.normalized(col("embedding")))
      .collect().toSeq.map(_.getSeq[Double](0).toSeq)
    // every star edge is also a clique pair, so star components REFINE
    // clique components: the star can only lose fewer members
    val star = Embed.semDedupStar(emb, init, threshold = 0.4)
      .select(col("vec_id"))
    val clique = Embed.semDedup(emb, init, threshold = 0.4)
      .select(col("vec_id"))
    assert(clique.exceptAll(star).count() == 0,
      "a clique survivor was lost by the star form")
    // Θ(|cell|): at most one edge per non-hub member
    val edges = Embed.semDedupPairsStar(emb, init, threshold = 0.4)
    val nonHub = edges.select(col("b")).distinct().count()
    assert(edges.count() == nonHub,
      "star form emitted more than one edge per member")
  }

  test("crawl profile forwards its rails verbatim (plumbing guard)") {
    val prof = CrawlProfile.crawl
    assert(prof.starForm && prof.hubSalt == 16 &&
      prof.maxDocChars == (1 << 20))
    val edges = prof.nearDupEdges(docs)
    val direct = Dedup.minhashLshStar(docs, prof.n, prof.bands,
      prof.rowsPerBand, prof.threshold, "text", "doc_id", prof.hubSalt,
      prof.maxDocChars)
    assert(edges.exceptAll(direct).count() == 0 &&
      direct.exceptAll(edges).count() == 0)
    // the broadcast posture is returned as data for the session owner
    assert(prof.sessionConf("spark.sql.autoBroadcastJoinThreshold") == "-1")
  }
}
