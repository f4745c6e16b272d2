package graft.functions

import org.apache.spark.sql.DataFrame

/** Lineage AND stats barrier for iterative plans.
  *
  * `Dataset.localCheckpoint` cuts the *lineage* but Spark 4 preserves the
  * ORIGIN plan's statistics on the resulting `LogicalRDD` (so AQE/broadcast
  * decisions downstream of a checkpoint still see real sizes). In an
  * iterative self-join loop that preservation is fatal: every round's
  * size-in-bytes estimate is the *product* of the previous round's (the
  * `SizeInBytesOnlyStatsPlanVisitor` join default), so the estimate
  * ~squares per round — after ~15 rounds the BigInteger has ~1e8 digits,
  * Catalyst spends minutes inside `BigInteger.multiplyToomCook3` doing
  * pure planning, and finally dies with "BigInteger would overflow
  * supported range" (observed on `Dedup.connectedComponents` at sf0.1,
  * round 7).
  *
  * `barrier` materializes the frame via `localCheckpoint`, then rebuilds
  * it from the checkpointed RDD with `createDataFrame`, producing a fresh
  * `LogicalRDD` with NO origin stats — the default leaf estimate is
  * bounded, so per-round join estimates stay small and planning stays
  * O(plan size) regardless of iteration count. The row round-trip
  * (InternalRow → Row → InternalRow) is a per-row map over the already
  * materialized checkpoint blocks — linear, no extra shuffle or job.
  *
  * Use it instead of bare `localCheckpoint` whenever the checkpointed
  * frame re-enters a join INSIDE a loop. Outside loops, prefer
  * `localCheckpoint` — there the preserved stats are a feature. */
object Lineage {
  def barrier(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }
}
