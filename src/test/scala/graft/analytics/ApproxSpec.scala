package graft.analytics

import graft.SparkSuite

/** Sketch-aggregate accuracy: the approx percentile (a13, the 100 TB
  * path) must bracket the exact interpolated percentile (a7, the
  * correctness baseline) within sketch error. */
class ApproxSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("approx_percentile tracks exact percentiles within 5%") {
    val exact = AdvancedQueries.a7Percentile(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
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
