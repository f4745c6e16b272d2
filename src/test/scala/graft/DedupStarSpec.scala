package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup
import graft.sources.TestData

/** `minhashLshStar` — the Θ(d) star-edge feeder for connected components
  * on d-fold duplicate families (vs `minhashLsh`'s Θ(d²) clique). Its
  * contract has three testable parts: edges are a verified subset of the
  * clique pairs, components match the clique components on real data at
  * the gate parameters, and the edge count is linear (not quadratic) in
  * the size of a duplicate family. */
class DedupStarSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  private def cc(pairs: org.apache.spark.sql.DataFrame) =
    Dedup.connectedComponents(pairs)
      .select(col("node"), col("component"))

  test("star edges are a verified subset of the clique pairs") {
    val sp = SparkSpec.spark
    val docs = TestData.table(sp, sf, "documents")
    val star = Dedup.minhashLshStar(docs, n = 3, bands = 64,
      rowsPerBand = 2, threshold = 0.5)
    val clique = Dedup.minhashLsh(docs, n = 3, bands = 64,
      rowsPerBand = 2, threshold = 0.5)
    val extra = star.join(clique, Seq("a", "b"), "left_anti").count()
    assert(extra == 0, "star produced an edge the clique pair set lacks")
    assert(star.count() <= clique.count())
  }

  test("star components equal clique components on the gate corpus") {
    val sp = SparkSpec.spark
    val docs = TestData.table(sp, sf, "documents")
    val star = cc(Dedup.minhashLshStar(docs, n = 3, bands = 64,
      rowsPerBand = 2, threshold = 0.5))
    val clique = cc(Dedup.minhashLsh(docs, n = 3, bands = 64,
      rowsPerBand = 2, threshold = 0.5))
    assert(star.exceptAll(clique).count() == 0 &&
      clique.exceptAll(star).count() == 0,
      "star connectivity diverged from clique connectivity")
  }

  test("embedding star edges: dup-family regime matches clique clusters") {
    // star is a DUP-FAMILY feeder, not a loose-similarity-graph one: at
    // a loose threshold (0.4) hub verification legitimately breaks
    // bucket connectivity (cos isn't transitive), and the spec pins the
    // supported regime instead — a high threshold where components are
    // exact-duplicate families (the sparse gate's construction: planted
    // clones of vec_id < 10; no organic pair reaches 0.9)
    val sp = SparkSpec.spark
    val emb = TestData.table(sp, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val clones = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val both = emb.unionAll(clones)
    val star = graft.llm.Embed.nearDupLshStar(both, threshold = 0.9,
      nPlanes = 16, tables = 8)
    val clique = graft.llm.Embed.nearDupLsh(both, threshold = 0.9,
      nPlanes = 16, tables = 8)
    assert(star.join(clique, Seq("a", "b"), "left_anti").count() == 0)
    assert(clique.count() > 0, "fixture produced no dup pairs")
    val starCc = cc(star.select("a", "b"))
    val cliqueCc = cc(clique.select("a", "b"))
    assert(starCc.exceptAll(cliqueCc).count() == 0 &&
      cliqueCc.exceptAll(starCc).count() == 0,
      "embedding star connectivity diverged from clique connectivity")
  }

  test("a d-fold duplicate family costs d-1 star edges, not d(d-1)/2") {
    val sp = SparkSpec.spark
    import sp.implicits._
    val d = 40
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val fam = (0 until d).map(i => (i.toLong, base)) // identical replicas
    val lone = Seq((1000L, "completely unrelated text about spark plans " * 8))
    val docs = (fam ++ lone).toDF("doc_id", "text")
    val star = Dedup.minhashLshStar(docs, n = 3, bands = 64,
      rowsPerBand = 2, threshold = 0.5)
    val clique = Dedup.minhashLsh(docs, n = 3, bands = 64,
      rowsPerBand = 2, threshold = 0.5)
    // identical docs share every band -> one bucket per band, hub = 0:
    // exactly d-1 distinct verified edges; the clique path pays the full
    // quadratic pair set
    assert(star.count() == (d - 1).toLong)
    assert(clique.count() == d.toLong * (d - 1) / 2)
    // and the clusters they induce are identical
    assert(cc(star.select("a", "b")).exceptAll(
      cc(clique.select("a", "b"))).count() == 0)
  }
}
