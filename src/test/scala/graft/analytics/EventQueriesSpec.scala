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
}
