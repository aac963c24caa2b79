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

  test("a13: exact floor-cents percentiles agree with a7's; the sketch " +
      "bracket flags hold (estimate inside the exact ±0.01 rank window)") {
    // a13 (r10 shape) hashes the EXACT percentiles and carries the
    // approx_percentile sketch as engine-computed in-tolerance flags —
    // this spec pins both halves against a7's independent rendering
    val exact = AdvancedQueries.a7Percentile(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val a13 = AdvancedQueries.a13ApproxPercentile(spark, dir).collect()
    assert(a13.length == exact.size)
    a13.foreach { r =>
      val (e50, e95) = exact(r.getString(0))
      assert(r.getLong(1) == e50 && r.getLong(2) == e95,
        s"${r.getString(0)} exact cents drifted: " +
          s"(${r.getLong(1)}, ${r.getLong(2)}) vs ($e50, $e95)")
      assert(r.getBoolean(3) && r.getBoolean(4),
        s"${r.getString(0)} sketch left its rank-tolerance bracket")
    }
  }

  test("a5: HLL distinct estimate stays inside the hashed ±15% bracket " +
      "and the exact counts are really exact") {
    val rows = AdvancedQueries.a5ApproxDistinct(spark, dir).collect()
    assert(rows.nonEmpty)
    val brute = graft.core.Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_partkey").distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == brute(r.getString(0)),
        s"${r.getString(0)} exact distinct drifted")
      assert(r.getBoolean(2),
        s"${r.getString(0)} HLL estimate left the ±15% bracket")
    }
  }
}
