package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass "last two samples per key" aggregate — the state behind
  * Prometheus-style `irate` (reference query semantics: the rate between
  * the final two samples of each series).
  *
  * The naive plan ranks every sample with a `row_number` window, which
  * range-shuffles and SORTS the whole fact table to keep two rows per
  * series — the one sort-everything plan a 100 TB panel refresh cannot
  * afford. This aggregator keeps a constant 2-sample buffer per group,
  * reduces map-side (each task emits one 40-byte buffer per series it
  * saw), and merges associatively — one hash aggregate, no sort, no
  * window, same output.
  *
  * Duplicate-instant semantics match the dedup-then-rank formulation:
  * samples sharing a timestamp collapse to the MAX value (insert merges
  * on equal `t`), so `(t1,v1)` is the last distinct instant's max value
  * and `(t2,v2)` the second-last's. `n` counts distinct instants held
  * (0/1/2); callers gate on `n == 2`. */
final class LastTwoAgg
    extends Aggregator[LastTwoAgg.In, LastTwoAgg.Buf, LastTwoAgg.Buf] {
  import LastTwoAgg._
  def zero: Buf = Buf(Long.MinValue, 0.0, Long.MinValue, 0.0, 0)
  def reduce(b: Buf, a: In): Buf = insert(b, a.t, a.v)
  def merge(x: Buf, y: Buf): Buf = {
    var r = x
    if (y.n >= 1) r = insert(r, y.t1, y.v1)
    if (y.n >= 2) r = insert(r, y.t2, y.v2)
    r
  }
  def finish(b: Buf): Buf = b
  def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  def outputEncoder: Encoder[Buf] = Encoders.product[Buf]

  private def insert(b: Buf, t: Long, v: Double): Buf =
    if (b.n == 0) Buf(t, v, Long.MinValue, 0.0, 1)
    else if (t == b.t1) { if (v > b.v1) b.copy(v1 = v) else b }
    else if (t > b.t1) Buf(t, v, b.t1, b.v1, 2)
    else if (b.n == 1) Buf(b.t1, b.v1, t, v, 2)
    else if (t == b.t2) { if (v > b.v2) b.copy(v2 = v) else b }
    else if (t > b.t2) Buf(b.t1, b.v1, t, v, 2)
    else b
}

object LastTwoAgg {
  final case class In(t: Long, v: Double)
  /** (t1,v1) = last distinct instant (max value there); (t2,v2) =
    * second-last; n = distinct instants held, capped at 2. */
  final case class Buf(t1: Long, v1: Double, t2: Long, v2: Double, n: Int)
}
