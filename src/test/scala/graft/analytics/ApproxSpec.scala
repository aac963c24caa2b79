package graft.analytics

import graft.SparkSuite

/** Sketch-aggregate accuracy: the approx percentile (a13, the 100 TB
  * path) must bracket the exact interpolated percentile (a7, the
  * correctness baseline) within sketch error. */
class ApproxSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("approx profiler (p1b) tracks the exact profile: HLL distincts within 5%, rest identical") {
    def byCol(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    val exact = byCol(InsightQueries.p1Profile(spark, dir).collect())
    val approx = byCol(InsightQueries.p1bProfileApprox(spark, dir).collect())
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (c, (nulls, distinct, mn, mx)) =>
      val (aNulls, aDistinct, aMn, aMx) = approx(c)
      assert(aNulls == nulls && aMn == mn && aMx == mx, s"$c non-sketch stats drifted")
      assert(math.abs(aDistinct - distinct).toDouble / math.max(1L, distinct) <= 0.05,
        s"$c: approx distinct $aDistinct vs exact $distinct")
    }
  }

  test("approx_percentile tracks exact percentiles within 5%") {
    // a7 reports floor-of-cents BIGINTs (tie-free rendering) — scale
    // back to currency units for the relative-error compare
    val exact = AdvancedQueries.a7Percentile(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1) / 100.0, r.getLong(2) / 100.0)).toMap
    val approx = AdvancedQueries.a13ApproxPercentile(spark, dir).collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val (e50, e95) = exact(r.getString(0))
      assert(math.abs(r.getDouble(1) - e50) / e50 <= 0.05,
        s"${r.getString(0)} p50: ${r.getDouble(1)} vs exact $e50")
      assert(math.abs(r.getDouble(2) - e95) / e95 <= 0.05,
        s"${r.getString(0)} p95: ${r.getDouble(2)} vs exact $e95")
    }
  }
}
