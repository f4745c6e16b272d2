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

  test("clique maxBucket valve: capped == uncapped on the gate corpus") {
    val sp = SparkSpec.spark
    val docs = TestData.table(sp, sf, "documents")
    val capped = Dedup.minhashLsh(docs, n = 3, bands = 64,
      rowsPerBand = 2, threshold = 0.5) // default maxBucket = 1000
    val uncapped = Dedup.minhashLsh(docs, n = 3, bands = 64,
      rowsPerBand = 2, threshold = 0.5, maxBucket = Int.MaxValue)
    assert(capped.exceptAll(uncapped).count() == 0 &&
      uncapped.exceptAll(capped).count() == 0,
      "the default cap changed the gate-corpus pair list (it must never trigger there)")
  }

  test("clique maxBucket valve drops only over-cap families") {
    val sp = SparkSpec.spark
    import sp.implicits._
    val boiler = "one boilerplate page mirrored across many sites " * 8
    val small = "a small duplicate family with its own words " * 8
    val mega = (0 until 40).map(i => (i.toLong, boiler))
    val fam = (100L until 105L).map(i => (i, small))
    val docs = (mega ++ fam).toDF("doc_id", "text")
    val capped = Dedup.minhashLsh(docs, n = 3, bands = 64,
      rowsPerBand = 2, threshold = 0.5, maxBucket = 10)
    // the 40-member family is over the cap in EVERY band (identical docs
    // share every bucket) -> all its pairs drop; the 5-member family is
    // untouched
    assert(capped.count() == 5L * 4 / 2)
    assert(capped.filter(col("a") < 100).count() == 0)
    // and the star path still clusters the mega family in Θ(d)
    val star = Dedup.minhashLshStar(docs, n = 3, bands = 64,
      rowsPerBand = 2, threshold = 0.5)
    assert(star.filter(col("a") < 100).count() == 39)
  }

  test("lshOverCapBuckets names exactly the buckets the valve drops") {
    val sp = SparkSpec.spark
    import sp.implicits._
    val boiler = "one boilerplate page mirrored across many sites " * 8
    val small = "a small duplicate family with its own words " * 8
    val mega = (0 until 40).map(i => (i.toLong, boiler))
    val fam = (100L until 105L).map(i => (i, small))
    val docs = (mega ++ fam).toDF("doc_id", "text")
    // the 40-member family owns one over-cap bucket in each of the 64
    // bands (identical docs share every band hash); the 5-member family
    // never crosses the cap
    val over = Dedup.lshOverCapBuckets(docs, n = 3, bands = 64,
      rowsPerBand = 2, maxBucket = 10).collect()
    assert(over.length == 64)
    assert(over.forall(_.getLong(2) == 40L))
    // raising the cap above the biggest family empties the report — the
    // observable proof that a capped run equals the uncapped one
    assert(Dedup.lshOverCapBuckets(docs, n = 3, bands = 64,
      rowsPerBand = 2, maxBucket = 40).count() == 0)
  }

  test("star hubSalt valve: salted == unsalted clusters, d-1 edges per family") {
    val sp = SparkSpec.spark
    import sp.implicits._
    val d = 400 // the planted mega-bucket: one family dominating its buckets
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val docs = ((0 until d).map(i => (i.toLong, base)) :+
      ((1000L, "completely unrelated text about spark plans " * 8)))
      .toDF("doc_id", "text")
    val salted = Dedup.minhashLshStar(docs, n = 3, bands = 64,
      rowsPerBand = 2, threshold = 0.5, hubSalt = 8)
    val plain = Dedup.minhashLshStar(docs, n = 3, bands = 64,
      rowsPerBand = 2, threshold = 0.5)
    // two-level star keeps the edge count linear: exactly members-1
    // (identical docs verify at jaccard 1.0, so nothing is rejected)
    assert(salted.count() == (d - 1).toLong)
    assert(plain.count() == (d - 1).toLong)
    assert(cc(salted.select("a", "b")).exceptAll(
      cc(plain.select("a", "b"))).count() == 0,
      "salted star connectivity diverged from the single-window star")
  }

  test("star hubSalt valve: salted components equal clique components on the gate corpus") {
    val sp = SparkSpec.spark
    val docs = TestData.table(sp, sf, "documents")
    val salted = cc(Dedup.minhashLshStar(docs, n = 3, bands = 64,
      rowsPerBand = 2, threshold = 0.5, hubSalt = 4))
    val clique = cc(Dedup.minhashLsh(docs, n = 3, bands = 64,
      rowsPerBand = 2, threshold = 0.5))
    assert(salted.exceptAll(clique).count() == 0 &&
      clique.exceptAll(salted).count() == 0,
      "salted star connectivity diverged from clique connectivity")
  }

  test("minhashLshStarRejected partitions the candidate edges with the accepted set") {
    val sp = SparkSpec.spark
    val docs = TestData.table(sp, sf, "documents")
    val acc = Dedup.minhashLshStar(docs, n = 3, bands = 64,
      rowsPerBand = 2, threshold = 0.5)
    val rej = Dedup.minhashLshStarRejected(docs, n = 3, bands = 64,
      rowsPerBand = 2, threshold = 0.5)
    // disjoint by construction (>= t vs < t on the same scored frame)
    assert(acc.join(rej, Seq("a", "b")).count() == 0)
    // an impossible threshold rejects EVERY candidate edge: the union
    // above is the full hub-edge candidate set
    val all = Dedup.minhashLshStarRejected(docs, n = 3, bands = 64,
      rowsPerBand = 2, threshold = 1.1)
    assert(all.count() == acc.count() + rej.count())
  }

  test("embedding star hubSalt valve matches the unsalted clusters") {
    val sp = SparkSpec.spark
    val emb = TestData.table(sp, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val clones = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val both = emb.unionAll(clones)
    val salted = graft.llm.Embed.nearDupLshStar(both, threshold = 0.9,
      nPlanes = 16, tables = 8, hubSalt = 4)
    val plain = graft.llm.Embed.nearDupLshStar(both, threshold = 0.9,
      nPlanes = 16, tables = 8)
    assert(salted.count() > 0)
    assert(cc(salted.select("a", "b")).exceptAll(
      cc(plain.select("a", "b"))).count() == 0,
      "salted embedding star connectivity diverged")
  }
}
