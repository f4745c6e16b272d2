package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Guards `EventOps.funnel` against the round-7 stats-explosion class:
  * its per-step loop re-joins the checkpointed user frame, the exact
  * pattern where a bare `localCheckpoint` preserves origin sizeInBytes
  * and compounds it per step (see `Lineage.barrier`). A realistic funnel
  * is 3-5 steps; this drives ~20 to prove the barrier keeps planning
  * bounded far past that (mirrors LineageSpec's shape). */
class FunnelSpec extends AnyFunSuite {

  test("funnel: 20 steps keep planning bounded and count correctly") {
    val sp = SparkSpec.spark
    import sp.implicits._
    val steps = (0 until 20).map(i => s"s$i")
    // 50 users; user u completes the first (u % 21) steps in order,
    // 1s apart — so step k retains exactly the users with u % 21 > k
    val rows = for {
      u <- 0 until 50
      k <- 0 until (u % 21)
    } yield (s"u$u", k.toLong * 1000000000L, s"s$k")
    val df = rows.toDF("u", "ts", "k")
    val t0 = System.nanoTime()
    val r = graft.plan.EventOps.funnel(df, "u", "ts", "k", steps,
      windowNs = 3600L * 1000000000L)
      .orderBy("step_idx").collect()
    val secs = (System.nanoTime() - t0) / 1e9
    val want = (0 until 20).map(k => (0 until 50).count(_ % 21 > k).toLong)
    assert(r.map(_.getLong(2)).toSeq == want)
    // pre-barrier, preserved stats compound per step: by step ~15 the
    // estimator is multiplying astronomically-sized BigIntegers and the
    // loop takes minutes. Barriered, 20 steps of tiny joins are fast.
    assert(secs < 120.0, f"20-step funnel took $secs%.1f s — planning blowup")
  }
}
