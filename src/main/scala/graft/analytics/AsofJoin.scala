package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the LATEST right row of the same key
  * with right.time <= left.time (inclusive; DuckDB `ASOF LEFT JOIN ...
  * ON l.k = r.k AND l.t >= r.t` semantics).
  *
  * Spark has no as-of join operator; the naive formulation (inner join
  * on key + `r.t <= l.t`, then max per left row) explodes to the full
  * per-key cross product before pruning. This is the MERGE formulation
  * instead, composed from built-ins (brief's preference (a) — no custom
  * strategy needed):
  *
  *   1. tag both sides and union them by name (right payload boxed into
  *      one struct column, so the union schema is left ∪ {__r});
  *   2. one shuffle partitions by key; within each partition sort by
  *      (time, side) — right rows sort BEFORE left rows at equal
  *      timestamps, making the match inclusive;
  *   3. `last(__r, ignoreNulls)` over rows-unbounded-preceding carries
  *      the latest right payload forward to each left row;
  *   4. keep left rows, unbox the payload.
  *
  * Cost: ONE hash shuffle + ONE in-partition sort over |L|+|R| rows —
  * the same wire cost as a sort-merge equi-join, with nothing
  * proportional to the number of (l, r) time pairs. At 100 TB both
  * inputs pre-partitioned/bucketed by key make the shuffle vanish.
  *
  * Contract: `right` must be unique per (key, time) — pre-aggregate ties
  * (e.g. keep max surrogate id) or the carried payload among equal
  * timestamps is unspecified. Left rows with no preceding right row get
  * a null payload (left-outer semantics).
  *
  * Reference analog: none (verified absence — the reference has no
  * temporal joins); north-star surface, brief §custom-operators list.
  */
object AsofJoin {

  /** `left` joined as-of against `right` on `key`/`time` (both sides
    * must use these column names; `right`'s other columns become the
    * payload, null when unmatched). */
  def asofLast(left: DataFrame, right: DataFrame,
               key: String, time: String): DataFrame = {
    val payloadCols = right.columns.toSeq.filterNot(c => c == key || c == time)
    require(payloadCols.nonEmpty, "right side needs at least one payload column")
    val r = right.select(col(key), col(time),
      struct(payloadCols.map(col): _*).as("__r")).withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toSeq.map(col) ++
        payloadCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}
