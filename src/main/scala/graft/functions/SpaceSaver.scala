package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory SpaceSaver summary (Metwally et al.; reference:
  * libakumuli/query_processing/spacesaver.h:1-153): at most `m` counters;
  * an unseen key evicts the minimum counter, inherits its count as both
  * seed and error bound (`spacesaver.h:120-137`). Guarantees
  * `count - error <= true frequency <= count`, exact whenever the sketch
  * never overflows (`m >= cardinality` — the reference's own exactness
  * condition, since `M = ceil(1/error)`).
  *
  * Distribution: one sketch per partition (map-side), combined with the
  * mergeable-summaries rule (Agarwal et al., PODS 2012): for keys the
  * other side lacks, its eviction floor (min counter of a FULL sketch,
  * zero otherwise) is added to both count and error; the union is then
  * pruned back to the `m` largest counts. Both bounds survive the merge,
  * and an exact (never-overflowed) input stays exact.
  */
final class SpaceSaverSketch(val m: Int, val backward: Boolean)
    extends Serializable {
  import SpaceSaverSketch.Item

  val counters = new java.util.HashMap[String, Item]()
  var n: Double = 0.0

  /** First-seen timestamp in scan order: the scan is time-ordered in the
    * reference; across unordered partitions the global min (max for
    * backward scans) is the same value. */
  private def better(a: Long, b: Long): Long =
    if (backward) math.max(a, b) else math.min(a, b)

  def put(key: String, ts: Long, weight: Double): Unit = {
    val existing = counters.get(key)
    if (existing != null) {
      existing.count += weight
      existing.time = better(existing.time, ts)
    } else {
      var count = weight
      var error = 0.0
      if (counters.size >= m) {
        // evict the min-count entry; its count seeds the newcomer and
        // becomes its error bound (spacesaver.h:124-137)
        var minKey: String = null
        var minCount = Double.MaxValue
        val it = counters.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.count < minCount) {
            minCount = e.getValue.count; minKey = e.getKey
          }
        }
        counters.remove(minKey)
        count += minCount
        error = minCount
      }
      counters.put(key, new Item(count, error, ts))
    }
    n += weight
  }

  private def minCountValue: Double = {
    var mc = Double.MaxValue
    val it = counters.values().iterator()
    while (it.hasNext) { val c = it.next().count; if (c < mc) mc = c }
    if (mc == Double.MaxValue) 0.0 else mc
  }

  def merge(o: SpaceSaverSketch): SpaceSaverSketch = {
    val selfFloor = if (counters.size >= m) minCountValue else 0.0
    val otherFloor = if (o.counters.size >= o.m) o.minCountValue else 0.0
    val it = counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val ov = o.counters.get(e.getKey)
      if (ov != null) {
        e.getValue.count += ov.count
        e.getValue.error += ov.error
        e.getValue.time = better(e.getValue.time, ov.time)
      } else if (otherFloor > 0) {
        e.getValue.count += otherFloor
        e.getValue.error += otherFloor
      }
    }
    val oit = o.counters.entrySet().iterator()
    while (oit.hasNext) {
      val e = oit.next()
      if (!counters.containsKey(e.getKey)) {
        val add = selfFloor
        counters.put(e.getKey,
          new Item(e.getValue.count + add, e.getValue.error + add,
            e.getValue.time))
      }
    }
    n += o.n
    if (counters.size > m) {
      // prune to capacity: keep the m largest counts
      val arr = new java.util.ArrayList(counters.entrySet())
      arr.sort((a: java.util.Map.Entry[String, Item],
                b: java.util.Map.Entry[String, Item]) =>
        java.lang.Double.compare(b.getValue.count, a.getValue.count))
      var i = m
      while (i < arr.size()) { counters.remove(arr.get(i).getKey); i += 1 }
    }
    this
  }

  /** Survivors per the reference's `count()` (spacesaver.h:65-94):
    * `support = N * P`, emit when `support < count - error`, reporting the
    * raw count, ordered count desc (sname asc as the deterministic
    * tiebreak). */
  def result(portion: Double): Seq[(String, Long, Double)] = {
    val support = n * portion
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double)]
    val it = counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (support < e.getValue.count - e.getValue.error)
        buf += ((e.getKey, e.getValue.time, e.getValue.count))
    }
    buf.sortBy(t => (-t._3, t._1)).toSeq
  }
}

object SpaceSaverSketch {
  final class Item(var count: Double, var error: Double, var time: Long)
      extends Serializable
}

/** The SpaceSaver sketch as a Spark typed aggregate: partial sketches are
  * built map-side per partition and merged, so the pipeline node runs with
  * O(M) memory per task regardless of series cardinality — the property
  * the reference buys with the same sketch on its single node. */
final class SpaceSaverAgg(m: Int, portion: Double, backward: Boolean)
    extends Aggregator[SpaceSaverAgg.In, SpaceSaverSketch,
      Seq[SpaceSaverAgg.Out]] {
  import SpaceSaverAgg._
  def zero: SpaceSaverSketch = new SpaceSaverSketch(m, backward)
  def reduce(b: SpaceSaverSketch, a: In): SpaceSaverSketch = {
    b.put(a.sname, a.ts, a.w); b
  }
  def merge(x: SpaceSaverSketch, y: SpaceSaverSketch): SpaceSaverSketch =
    x.merge(y)
  def finish(b: SpaceSaverSketch): Seq[Out] =
    b.result(portion).map { case (s, t, c) => Out(s, t, c) }
  def bufferEncoder: Encoder[SpaceSaverSketch] =
    Encoders.javaSerialization[SpaceSaverSketch]
  def outputEncoder: Encoder[Seq[Out]] = ExpressionEncoder[Seq[Out]]()
}

object SpaceSaverAgg {
  final case class In(sname: String, ts: Long, w: Double)
  final case class Out(sname: String, ts: Long, value: Double)
}
