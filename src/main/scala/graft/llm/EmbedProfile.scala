package graft.llm

import org.apache.spark.sql.DataFrame

/** The embedding-side sibling of [[CrawlProfile]] (VERDICT r12 #6): one
  * documented bundle of the embedding rails the ScaleCheck graduations
  * certified, so a 100 TB deployment composes them instead of
  * re-assembling hier-index knobs, star-form semantic dedup and the IVF
  * layout/append posture per operator. Every field exists as an
  * individual parameter on the [[Embed]] operators; the profile only
  * fixes a coherent combination and forwards it.
  *
  *  - `hierAbove`: the centroid count past which every assignment
  *    consumer routes through the two-level index
  *    ([[Embed.buildCentroidIndex]] → `HierCentroidTopCells`,
  *    O(√k·dim)/row). Flat assignment is O(k·dim)/row and was the
  *    measured 1000x scale-killer (r11: 42x wall for 10x data at
  *    k=1600; the two-level re-run landed at 11.6x). 256 matches the
  *    published ScaleCheck switch point: a trained IVF deployment grows
  *    cells with the corpus, so any corpus big enough to need >256
  *    cells is big enough for the routed kernel's approximation to be
  *    the standard two-level-IVF trade.
  *  - `nCoarse`/`coarseProbes`: the routing shape. 0 means the kernel
  *    defaults — ~√k coarse groups, 4 probes (the two-level-IVF
  *    regime). `coarseProbes == nCoarse` IS flat assignment,
  *    bit-identical (HierCentroidSpec) — the exactness escape hatch.
  *  - `graphProbes`: IVF probes per row for the kNN graph / batch
  *    serving paths — bounded probe cost per row is what graduated
  *    `embed_knn_graph_ivf` (each row scores only its probed cells).
  *  - `rounded`: assign layout cells on the 6-decimal-rounded cosine so
  *    cell membership replays bit-stably in an external engine (the
  *    oracle-gated layouts' convention).
  *  - Semantic dedup is STAR-FORM only ([[Embed.semDedupStar]]): the
  *    clique form emits Θ(|cell|²) verified pairs per duplicate family
  *    and filled the disk at factor 1000 (~4B pairs); the star form's
  *    Θ(|cell|) hub edges are the only shape that graduated. Recall
  *    trade documented on the operator: a pair both ≥ threshold from
  *    the hub is not connected through it (star survivors ⊇ clique
  *    survivors).
  *  - `sessionConf`: the same stats-unreliable-corpus broadcast posture
  *    as [[CrawlProfile.sessionConf]] — disable estimate-driven static
  *    broadcasts, let AQE promote from runtime shuffle sizes.
  */
final case class EmbedProfile(hierAbove: Int, nCoarse: Int,
                              coarseProbes: Int, graphProbes: Int,
                              kmeansIters: Int, rounded: Boolean) {

  /** See [[CrawlProfile.sessionConf]] — returned as data, not applied
    * silently: broadcast posture belongs to the session owner. */
  def sessionConf: Map[String, String] = Map(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10485760")

  /** The profile's routing decision for a centroid set: a two-level
    * index past `hierAbove` fine centroids, flat below. Deterministic
    * from the centroid values alone, so any holder of the centroids —
    * an appender, an external oracle — reconstructs identical routing. */
  def centroidIndex(centroids: Seq[Seq[Double]])
      : Option[Embed.CentroidIndex] =
    if (centroids.size > hierAbove)
      Some(Embed.buildCentroidIndex(centroids, nCoarse, coarseProbes))
    else None

  /** Train k centroids under the profile's assignment routing:
    * hierarchical Lloyd iterations past `hierAbove` (each iteration
    * rebuilds the routing index over that iteration's centroids —
    * driver-side k·dim work), exact flat k-means below. */
  def trainCentroids(corpus: DataFrame, k: Int,
                     init: Option[Seq[Seq[Double]]] = None,
                     vecCol: String = "embedding",
                     idCol: String = "vec_id"): Seq[Seq[Double]] =
    Embed.kmeansCentroids(corpus, k, kmeansIters, init, vecCol, idCol,
      hierarchical = k > hierAbove, nCoarse = nCoarse,
      coarseProbes = coarseProbes)

  /** Star-form semantic dedup survivors under the profile's routing —
    * the certified `embed_semdedup_star` composition parameterized
    * once. Θ(|cell|) hub edges; nothing quadratic, no valve needed. */
  def semDedup(corpus: DataFrame, centroids: Seq[Seq[Double]],
               threshold: Double, vecCol: String = "embedding",
               idCol: String = "vec_id"): DataFrame =
    Embed.semDedupStar(corpus, centroids, threshold, vecCol, idCol,
      hier = centroidIndex(centroids))

  /** Cell-probed kNN graph under the profile's routing — each row
    * scores only its `graphProbes` probed cells (the shape that
    * graduated `embed_knn_graph_ivf`). Output: qid, neighbor_id,
    * score, rnk. */
  def knnGraph(corpus: DataFrame, k: Int, centroids: Seq[Seq[Double]],
               vecCol: String = "embedding",
               idCol: String = "vec_id"): DataFrame =
    Embed.knnGraphCells(corpus, k, centroids, graphProbes, vecCol, idCol,
      hier = centroidIndex(centroids))

  /** Mutual-kNN connected components over [[knnGraph]] — the certified
    * `embed_knn_clusters` composition. */
  def knnClusters(corpus: DataFrame, k: Int, centroids: Seq[Seq[Double]],
                  vecCol: String = "embedding",
                  idCol: String = "vec_id"): DataFrame =
    Embed.knnClusters(knnGraph(corpus, k, centroids, vecCol, idCol))

  /** Cluster-size skew report under the profile's routing. */
  def clusterBalance(corpus: DataFrame, centroids: Seq[Seq[Double]],
                     vecCol: String = "embedding"): DataFrame =
    Embed.clusterBalance(corpus, centroids, vecCol,
      hier = centroidIndex(centroids))

  /** Persist the IVF serving layout under the profile's posture: cells
    * partition-prune probes, the centroid matrix and the routing knobs
    * live in the layout's sidecars, and `rounded` makes membership
    * externally replayable. */
  def writeLayout(corpus: DataFrame, path: String, nCentroids: Int,
                  centroids: Option[Seq[Seq[Double]]] = None,
                  vecCol: String = "embedding",
                  idCol: String = "vec_id"): Unit =
    Embed.writeIvf(corpus, path, nCentroids, vecCol, idCol, centroids,
      rounded = rounded, hierAssign = nCentroids > hierAbove,
      // forward the profile's routing shape (r13 ADVICE): without these
      // the layout is assigned with kernel-default routing even when the
      // profile's own consumers ([[semDedup]]/[[knnGraph]]/
      // [[trainCentroids]] via [[centroidIndex]]) route differently —
      // e.g. the coarseProbes == nCoarse exactness escape hatch would
      // persist a default-√k/4-probe layout
      nCoarse = nCoarse, coarseProbes = coarseProbes)

  /** Idempotent append to a layout written by [[writeLayout]] — the
    * persisted sidecar knobs, not this profile, drive the assignment,
    * so an append can never route differently than the build did. */
  def append(newVecs: DataFrame, path: String, batchId: Option[String],
             vecCol: String = "embedding",
             idCol: String = "vec_id"): Unit =
    Embed.ivfUpdate(newVecs, path, vecCol, idCol, batchId)
}

object EmbedProfile {

  /** The 100 TB serving/curation shape: two-level assignment past 256
    * fine cells with the kernel's default routing (~√k coarse groups,
    * 4 probes), 2-probe kNN graph (every celled gate's operating
    * point), 5 Lloyd iterations, bit-replayable rounded layouts.
    *
    * 256 is this profile's own deployment heuristic, not a published
    * measurement boundary: the ScaleCheck suite gates hier assignment
    * by scale FACTOR (>100), so its published factor-100 numbers (e.g.
    * `embed_topk_batch_ivf` at 640 cells) stay on the flat path — on a
    * corpus with 256 < cells <= ~640 this profile routes hier where
    * the suite's flat numbers were measured. The trade is the standard
    * two-level-IVF one (O(√k·dim) vs O(k·dim) per row; the flat path
    * was the measured r11 1000x scale-killer at k=1600), and
    * HierCentroidSpec pins the routed kernel's semantics. */
  val serving: EmbedProfile = EmbedProfile(
    hierAbove = 256, nCoarse = 0, coarseProbes = 0, graphProbes = 2,
    kmeansIters = 5, rounded = true)

  /** Exactness shape for audits and small corpora: flat assignment
    * regardless of cell count (`hierAbove = MaxValue`) — every result
    * bit-identical to the published flat-path gates; raw (unrounded)
    * cosine for layouts consumed only by this engine. */
  val exact: EmbedProfile = EmbedProfile(
    hierAbove = Int.MaxValue, nCoarse = 0, coarseProbes = 0,
    graphProbes = 2, kmeansIters = 5, rounded = false)
}
