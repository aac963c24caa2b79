package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Event-time query semantics that need more than the oracle hash —
  * cross-formulation agreement between independent spellings of the
  * same operator. */
class EventQueriesSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("e9 native session windows agree with e2 manual sessionization") {
    // same gap, two formulations: session_window (native interval merge)
    // vs lag+flag (manual). Per-user session counts must coincide (the
    // testdata has no exact-boundary gap, where > vs >= would differ).
    val native = EventQueries.e9SessionWindow(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"))
      .orderBy(col("user_id")).collect().toSeq
    val manual = EventQueries.e2Sessionization(spark, dir).collect().toSeq
    assert(native == manual)
  }

  test("session_window boundary: exact-gap event MERGES; strictly-greater splits") {
    // pins the boundary by a RUNNING case (the testdata has no
    // exact-boundary gap): session_window gives each event the interval
    // [ts, ts+gap] and merges TOUCHING intervals, so an event at exactly
    // last+gap continues the session; one microsecond past it splits.
    // Writing this test exposed that the e9 oracle originally encoded
    // `>=` (split at exact gap) — wrong vs the engine, latent because
    // the testdata never hits the boundary; the oracle now pins strict
    // `>`, same boundary as e2's manual lag formulation.
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2026-01-01 00:00:00")),
      (1L, ts("2026-01-01 00:30:00")),          // exactly gap later: merges
      (2L, ts("2026-01-01 00:00:00")),
      (2L, ts("2026-01-01 00:30:00.000001"))    // 1 µs past the gap: splits
    ).toDF("user_id", "ts")
    val sessions = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("start"),
        col("n_events"))
      .orderBy(col("user_id"), col("start")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSeq
    assert(sessions == Seq(
      (1L, ts("2026-01-01 00:00:00"), 2L),
      (2L, ts("2026-01-01 00:00:00"), 1L),
      (2L, ts("2026-01-01 00:30:00.000001"), 1L)))
  }
}
