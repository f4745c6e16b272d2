package graft.plan

import org.apache.spark.sql.DataFrame

/** A materialized query stream: `sname` (canonical series name), `ts`
  * (ns long) and one or more value columns — the Spark analogue of the
  * reference's sample/tuple stream
  * (reference: libakumuli/queryprocessor_framework.h:180-214
  * `MutableSample`, tuples of up to 58 doubles with a presence bitmap;
  * nullable columns subsume the bitmap).
  *
  * @param valueCols value column names; one (`value`) for scalar streams,
  *                  one per joined metric / aggregation function for tuples
  * @param backward  scan direction (`range.from > range.to`)
  * @param ordered   true when a terminal pipeline node (e.g. `top`) already
  *                  defined the output order; the planner skips its final
  *                  order-by in that case
  * @param seriesOrder   force series-major output regardless of order-by —
  *                      `aggregate` emits one row per (series, func) in
  *                      series order and the reference ignores any explicit
  *                      order-by there (queryparser.cpp parse_aggregate_query)
  * @param omitNullValue render a null value cell as NO field at all (the
  *                      reference's payload-NONE samples from
  *                      first_timestamp/last_timestamp,
  *                      operators/aggregate.cpp:341-347) instead of the
  *                      tuple empty-field form
  */
final case class Frame(
    df: DataFrame,
    valueCols: Seq[String],
    backward: Boolean,
    ordered: Boolean = false,
    seriesOrder: Boolean = false,
    omitNullValue: Boolean = false)
