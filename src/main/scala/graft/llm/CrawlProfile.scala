package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One documented bundle of the scale rails the ScaleCheck graduations
  * discovered, so a 100 TB crawl deployment composes them instead of
  * re-deriving each from the per-operator scaladoc (VERDICT r11 #6).
  * Every field is a valve or posture that exists as an individual
  * parameter on the dedup/embedding operators; the profile only fixes a
  * coherent combination and forwards it.
  *
  *  - `n`/`bands`/`rowsPerBand`/`threshold`: the LSH operating point.
  *    (64, 2) at J=0.5 detects a true pair with p ≈ 1 − 1e-8 — exact in
  *    practice — which is what lets star edges stand in for cliques.
  *  - `starForm`: emit Θ(d) hub edges per bucket ([[Dedup.minhashLshStar]])
  *    instead of the Θ(d²) clique ([[Dedup.minhashLsh]]). The 1000x
  *    ScaleCheck showed a 1000-member replica family costs ~187k pairs
  *    and ~12M raw band candidates per family in clique form; star form
  *    is the only shape that graduated to that factor.
  *  - `maxBucket`: the clique path's heavy-bucket valve. IRRELEVANT in
  *    star form (star cost is linear in bucket size, no cap needed) —
  *    kept so `overCapAudit` can report what a clique-form run at this
  *    operating point would have dropped.
  *  - `maxDocChars`: giant-document prefix fingerprinting
  *    ([[Dedup.capText]]) — a 2 GB pathological doc otherwise makes its
  *    task the straggler of every signature stage.
  *  - `hubSalt`: splits a degenerate mega-bucket's hub window into
  *    `hubSalt` shards (see [[Dedup.minhashLshStar]]'s scaladoc for the
  *    recall caveat and the [[Dedup.minhashLshStarRejected]] audit).
  *  - `sessionConf`: the broadcast posture for stats-unreliable
  *    corpora — disable estimate-driven static broadcasts, let AQE
  *    promote joins from RUNTIME shuffle sizes (the factor-1000
  *    ScaleCheck regime; a wrong static estimate broadcast a multi-GB
  *    join side and killed the driver before this posture existed).
  */
final case class CrawlProfile(n: Int, bands: Int, rowsPerBand: Int,
                              threshold: Double, starForm: Boolean,
                              maxBucket: Int, maxDocChars: Int,
                              hubSalt: Int) {

  /** Session settings to apply at builder time for corpora whose size
    * statistics cannot be trusted (freshly-exploded frames, external
    * tables without ANALYZE). Returned as data, not applied silently:
    * broadcast posture belongs to the session owner. */
  def sessionConf: Map[String, String] = Map(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10485760")

  /** Verified near-dup edges under this profile's rails: star form when
    * `starForm` (the crawl default), clique form otherwise. Output
    * (a, b, jaccard), threshold applied. */
  def nearDupEdges(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    if (starForm)
      Dedup.minhashLshStar(docs, n, bands, rowsPerBand, threshold,
        textCol, idCol, hubSalt, maxDocChars)
    else
      Dedup.minhashLsh(docs, n, bands, rowsPerBand, threshold,
        textCol, idCol, maxBucket, maxDocChars)

  /** The profile's dedup pass: near-dup components from
    * [[nearDupEdges]], one survivor per component by `quality`
    * (largest wins, ties to the smaller id), rows in no component
    * untouched — exactly the `doc_dedup_pipeline_star` ScaleCheck
    * composition, parameterized once. */
  def dedup(docs: DataFrame, quality: Column,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    Dedup.dedupKeepBest(docs,
      Dedup.connectedComponents(nearDupEdges(docs, textCol, idCol)),
      quality, idCol)

  /** What the CLIQUE path's `maxBucket` valve would drop at this
    * operating point ([[Dedup.lshOverCapBuckets]]): run it before
    * trusting a clique-form result on an unfamiliar corpus, or to size
    * `hubSalt` for the star form (every reported bucket is a hub
    * window the salt would shard). */
  def overCapAudit(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    Dedup.lshOverCapBuckets(docs, n, bands, rowsPerBand, textCol, idCol,
      maxBucket, maxDocChars)
}

object CrawlProfile {

  /** The 100 TB web-crawl shape: dense duplication (boilerplate pages
    * mirrored across thousands of sites), occasional pathological
    * documents, unreliable size stats. Star-form edges, 1 MiB doc
    * fingerprint prefix, 16-way hub salt, AQE broadcast posture.
    * The LSH operating point matches every star ScaleCheck graduation
    * (n=3, 64 bands x 2 rows, J >= 0.5). */
  val crawl: CrawlProfile = CrawlProfile(
    n = 3, bands = 64, rowsPerBand = 2, threshold = 0.5,
    starForm = true, maxBucket = 1000, maxDocChars = 1 << 20,
    hubSalt = 16)

  /** Compliance/report shape (cross-corpus contamination, dup
    * matrices): valves OFF so no family can silently vanish from a
    * result that inverts when it does — the posture
    * [[Dedup.crossCorpusContamination]] and [[Dedup.dupMatrix]]
    * default to. Clique form: reports need the pair list, not just
    * connectivity. Pay the Θ(d²) where the corpus demands it, or cap
    * deliberately AND run the profile's `overCapAudit` alongside. */
  val compliance: CrawlProfile = CrawlProfile(
    n = 3, bands = 64, rowsPerBand = 2, threshold = 0.5,
    starForm = false, maxBucket = Int.MaxValue,
    maxDocChars = Int.MaxValue, hubSalt = 0)
}
