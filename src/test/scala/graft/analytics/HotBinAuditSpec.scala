package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Hot-key audit for the time-binned joins (e7 as-of, e8 band join):
  * what ONE pathological bin/user costs, analytically and in the plan.
  *
  * e8's candidate volume is Σ over (user, bin) of o(b)·(o(b)+o(b+1)) —
  * quadratic IN THE BIN, linear across bins for bounded event rate. A
  * hot bin is therefore a genuine skew hazard: the spec pins (a) the
  * candidate count matches the analytic bound exactly (the equi-join
  * generates near pairs only — no silent cross-product regression), and
  * (b) AQE's skew-join splits the hot partition when the hot (user,bin)
  * dominates (plan evidence: SortMergeJoin(skew=true)).
  *
  * e7's as-of is the merge formulation — no join node exists, so a hot
  * user costs one partition's sort of its |L|+|R| rows, never a pair
  * volume; pinned by plan shape + correctness on hot data. */
class HotBinAuditSpec extends SparkSuite {

  private val bandUs = EventQueries.BandSeconds * 1000000L

  /** K events for one hot user inside a single 30-min bin, plus `spread`
    * normal users with a few events each, as an events-shaped DF. */
  private def hotData(k: Int, spread: Int): DataFrame = {
    import spark.implicits._
    val base = 1700000000000000L // µs, far from any bin edge
    val hot = (1 to k).map(i =>
      (i.toLong, 999999L, base + i * 1000L)) // 1 ms apart: one bin
    val normal = (1 to spread).flatMap(u => (0 until 3).map(j =>
      ((100000 + u * 10 + j).toLong, u.toLong,
        base + u * 7200L * 1000000L + j * 60L * 1000000L)))
    (hot ++ normal).toDF("event_id", "user_id", "t_us")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("t_us")).as("ts"))
  }

  test("e8 candidate volume equals the analytic Σ o(b)·(o(b)+o(b+1)) bound") {
    val ev = hotData(k = 200, spread = 20)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t"))
      .withColumn("bin", expr(s"t DIV $bandUs"))
    // the raw equi-join e8 performs, BEFORE the band/order predicates
    val probe = ev.withColumn("bin",
      explode(array(col("bin"), col("bin") + 1L)))
      .toDF("a_id", "user_id", "a_t", "bin")
    val candidates = probe
      .join(ev.toDF("b_id", "user_id", "b_t", "bin"), Seq("user_id", "bin"))
      .count()
    // analytic bound from bin occupancies
    val occ = ev.groupBy(col("user_id"), col("bin"))
      .agg(count(lit(1)).as("o")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val analytic = occ.map { case ((u, b), o) =>
      o * (o + occ.getOrElse((u, b + 1), 0L))
    }.sum
    assert(candidates == analytic,
      s"equi-join generated $candidates candidates, analytic $analytic")
    // the hot bin dominates: its o² term is ≥ 90% of all candidates —
    // exactly the shape AQE must split below
    assert(200L * 200 >= analytic * 9 / 10)
  }

  test("e8 hot bin: AQE skew join engages (plan evidence) and result is exact") {
    val conf = Seq(
      // force the sort-merge path (the hot side must not broadcast) and
      // let the default-256MB skew threshold trigger on test-sized data
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0")
    val prev = conf.map { case (key, _) => key -> spark.conf.getOption(key) }
    conf.foreach { case (key, v) => spark.conf.set(key, v) }
    try {
      val data = hotData(k = 2000, spread = 50)
      val out = EventQueries.e8BandJoinOn(data)
      val rows = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // hot user: 2000 events, 1 ms apart, all within one band of each
      // other → every ordered pair qualifies: k·(k−1)/2
      assert(rows(999999L) == 2000L * 1999 / 2)
      // normal users: 3 events 1 min apart → 3 ordered pairs each
      assert((1 to 50).forall(u => rows(u.toLong) == 3L))
      val plan = (out.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case o => o
      }).toString
      assert(plan.contains("skew=true"),
        s"AQE skew join did not engage:\n${plan.take(2000)}")
    } finally prev.foreach {
      case (key, Some(v)) => spark.conf.set(key, v)
      case (key, None) => spark.conf.unset(key)
    }
  }

  test("e7 as-of merge: hot user is linear — no join node, one shuffle, exact") {
    val data = hotData(k = 1000, spread = 10)
    // errors = odd event ids, clicks = even — interleaved 1 ms apart so
    // every error's answer is the immediately preceding even event
    val errs = data.filter(col("event_id") % 2 === 1)
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = data.filter(col("event_id") % 2 === 0)
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val joined = AsofJoin.asofLast(errs, clicks, "user_id", "ts")
    val got = joined.select("event_id", "click_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    // hot user: error 2i+1 at t+... precedes click 2i+... events are
    // 1,2,…,k in time order; error id e matches click e−1 (except e=1)
    assert(got(1L) == -1L)
    (3 to 999 by 2).foreach(e => assert(got(e.toLong) == e - 1L))
    val plan = (joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case o => o
    }).toString
    assert(!plan.contains("Join"), "as-of must stay join-free")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      "as-of must shuffle exactly once")
    assert(plan.contains("Window"), "merge formulation lost its window")
  }
}
