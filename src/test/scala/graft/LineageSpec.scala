package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Lineage
import graft.llm.Dedup

/** Guards for the round-7 Catalyst stats explosion: iterative self-join
  * loops whose checkpoints preserve origin sizeInBytes make the estimate
  * ~square per round — 20+ rounds put Catalyst into multi-minute
  * BigInteger planning and finally "BigInteger would overflow supported
  * range" (observed on embed_knn_clusters at sf0.1). These tests would
  * hang/fail on the pre-fix code; with Lineage.barrier they are fast. */
class LineageSpec extends AnyFunSuite {

  test("barrier keeps join-size estimates bounded over 25 self-join rounds") {
    val sp = SparkSpec.spark
    import sp.implicits._
    var df = (0L until 100L).map(i => (i, i)).toDF("k", "x")
    val t0 = System.nanoTime()
    for (_ <- 0 until 25) {
      df = Lineage.barrier(
        df.join(df.select(col("k"), col("x").as("y")), Seq("k"))
          .select(col("k"), col("x")))
    }
    // force one more planned join over the final frame: with origin stats
    // preserved this is where the estimator would grind a ~2^25-factor
    // BigInteger product; with the barrier it is instant
    val joined = df.join(df.select(col("k"), col("x").as("y")), Seq("k"))
    assert(joined.count() == 100)
    val secs = (System.nanoTime() - t0) / 1e9
    // bounded = one join of two default-size leaves (~(2^63)^2), NOT the
    // compounding regime (2^(63·2^25), a ~10^7-digit number). Anything
    // under 2^200 proves the per-round reset.
    assert(joined.queryExecution.optimizedPlan.stats.sizeInBytes <
      BigInt(2).pow(200),
      "stats must stay bounded after an iterative loop")
    assert(secs < 120.0, f"25 barrier rounds took $secs%.1f s — planning blowup")
  }

  test("connectedComponents: 2^20-node chain (≥20 pointer-jump rounds) " +
      "converges with bounded planning time") {
    val sp = SparkSpec.spark
    import sp.implicits._
    // a path graph of 2^20 nodes: diameter 2^20-1, so pointer jumping
    // needs ~20 rounds — the regime where round 7's preserved-stats
    // checkpoints spent 20+ minutes in BigInteger.multiplyToomCook3
    val n = 1L << 20
    val chain = sp.range(n - 1).select(col("id").as("a"),
      (col("id") + 1).as("b"))
    val t0 = System.nanoTime()
    val comp = Dedup.connectedComponents(chain)
      .agg(count(lit(1)), max(col("component"))).head()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(comp.getLong(0) == n && comp.getLong(1) == 0L,
      "every node of the chain must label to component 0")
    assert(secs < 300.0, f"chain CC took $secs%.1f s — planning blowup")
  }
}
