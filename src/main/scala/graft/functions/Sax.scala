package graft.functions

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.plan.{Frame, TsStore}

/** SAX (Symbolic Aggregate approXimation) encoding — the Spark analogue of
  * the reference's per-series streaming encoder (reference:
  * libakumuli/query_processing/sax.cpp:1-91, saxencoder.cpp:24-210,
  * saxencoder.h:204-230; exercised by functests/test_sax.py).
  *
  * Per series, in scan order: keep a sliding window of `width` samples;
  * once full, z-normalize the window (sample stddev; if stddev < 1e-10 only
  * the mean is subtracted), bucket each value through the Gaussian
  * cutpoints into `alphabet` letters, and emit the word — with numerosity
  * reduction (consecutive identical words emit once). Output rows replace
  * `value` with the `sax` word; emission starts at the width-th sample.
  *
  * Distribution: repartition by series + sort within partitions — state
  * never leaves the executor, giant series stay single-pass sequential
  * (same shape as Pipe.stateful).
  */
object Sax {

  private val ZnormThreshold = 1e-10
  private val Alphabet = "abcdefghijklmnopqrstu"

  /** Gaussian equiprobable cutpoints per alphabet size (public normal-
    * distribution quantiles; reference table saxencoder.cpp:60-131). */
  private[functions] def cutpoints(n: Int): Array[Double] = {
    require(n >= 1 && n <= 21, "invalid alphabet size")
    // quantiles at k/n for k = 1..n-1 of N(0,1), via inverse erf
    Array.tabulate(n - 1)(k => normInv((k + 1).toDouble / n))
  }

  /** Inverse standard-normal CDF (Acklam's algorithm, public domain). */
  private def normInv(p: Double): Double = {
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pl = 0.02425
    val x =
      if (p < pl) {
        val q = math.sqrt(-2 * math.log(p))
        (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
      } else if (p <= 1 - pl) {
        val q = p - 0.5; val r = q * q
        (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
          (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
      } else {
        val q = math.sqrt(-2 * math.log(1 - p))
        -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
      }
    // one Halley refinement step for full double accuracy
    val e = 0.5 * erfc(-x / math.sqrt(2)) - p
    val u = e * math.sqrt(2 * math.Pi) * math.exp(x * x / 2)
    x - u / (1 + x * u / 2)
  }

  private def erfc(x: Double): Double = {
    val z = math.abs(x)
    val t = 1.0 / (1.0 + 0.5 * z)
    val ans = t * math.exp(-z * z - 1.26551223 + t * (1.00002368 +
      t * (0.37409196 + t * (0.09678418 + t * (-0.18628806 +
      t * (0.27886807 + t * (-1.13520398 + t * (1.48851587 +
      t * (-0.82215223 + t * 0.17087277)))))))))
    if (x >= 0) ans else 2.0 - ans
  }

  /** Encode one full window to a word (reference: saxencoder.cpp
    * `saxify`). */
  private[functions] def saxify(
      window: Array[Double], cuts: Array[Double]): String = {
    val n = window.length
    var sum = 0.0; var sqr = 0.0
    var i = 0
    while (i < n) { sum += window(i); sqr += window(i) * window(i); i += 1 }
    val mean = sum / n
    val stddev =
      if (n > 1) math.sqrt((n * sqr - sum * sum) / (n.toDouble * (n - 1)))
      else Double.NaN
    val sb = new StringBuilder(n)
    i = 0
    while (i < n) {
      val v =
        if (stddev < ZnormThreshold) window(i) - mean // incl. NaN stddev
        else (window(i) - mean) / stddev
      var j = 0
      while (j < cuts.length && v >= cuts(j)) j += 1
      sb.append(Alphabet(j))
      i += 1
    }
    sb.toString
  }

  /** The pipeline node: (sname, ts, value, ...) -> (sname, ts, sax). */
  def node(frame: Frame, alphabet: Int, width: Int): Frame = {
    import TsStore.{Sname, Ts}
    val vc = frame.valueCols.head
    val df = frame.df
    val schema = df.schema
    val nameIdx = schema.fieldIndex(Sname)
    val tsIdx = schema.fieldIndex(Ts)
    val vIdx = schema.fieldIndex(vc)
    val tsOrd = if (frame.backward) col(Ts).desc else col(Ts).asc
    val outSchema = StructType(Seq(
      StructField(Sname, StringType),
      schema(tsIdx),
      StructField("sax", StringType)))
    val cuts = cutpoints(alphabet)
    val sorted = df.repartition(col(Sname))
      .sortWithinPartitions(col(Sname), tsOrd)
    val out = sorted.mapPartitions { it =>
      var cur: String = null
      var buf: Array[Double] = null
      var fill = 0
      var last: String = null
      it.flatMap { row =>
        val s = row.getString(nameIdx)
        if (s != cur) { cur = s; buf = new Array[Double](width); fill = 0; last = null }
        if (row.isNullAt(vIdx)) Iterator.empty // missing data not supported
        else {
          // circular-buffer push
          if (fill < width) { buf(fill) = row.getDouble(vIdx); fill += 1 }
          else {
            System.arraycopy(buf, 1, buf, 0, width - 1)
            buf(width - 1) = row.getDouble(vIdx)
          }
          if (fill == width) {
            val word = saxify(buf, cuts)
            if (word != last) {
              last = word
              Iterator.single(Row(s, row.get(tsIdx), word))
            } else Iterator.empty
          } else Iterator.empty
        }
      }
    }(Encoders.row(outSchema))
    frame.copy(df = out, valueCols = Seq("sax"))
  }
}
