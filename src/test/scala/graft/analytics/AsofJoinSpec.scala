package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** AsofJoin.asofLast semantics pinned on hand-built cases; the e7 oracle
  * (DuckDB native ASOF LEFT JOIN) pins them end-to-end on real data. */
class AsofJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  private val right = Seq(
    (1L, ts(10), 100L), (1L, ts(20), 101L), (2L, ts(15), 200L))
    .toDF("k", "t", "rid")

  private def join(left: Seq[(Long, Timestamp, Long)]) =
    AsofJoin.asofLast(left.toDF("k", "t", "lid"), right, "k", "t")
      .select("lid", "rid").collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

  test("latest right row at-or-before each left row wins") {
    val m = join(Seq((1L, ts(12), 1L), (1L, ts(25), 2L)))
    assert(m(1L) == 100L) // t=12 → right t=10
    assert(m(2L) == 101L) // t=25 → right t=20
  }

  test("equal timestamps match (inclusive as-of)") {
    val m = join(Seq((1L, ts(20), 1L)))
    assert(m(1L) == 101L)
  }

  test("no preceding right row → null payload (left outer)") {
    val m = join(Seq((1L, ts(5), 1L), (3L, ts(30), 2L)))
    assert(m(1L) == -1L) // before first right row
    assert(m(2L) == -1L) // key never on right
  }

  test("keys are isolated — a user never sees another user's rows") {
    val m = join(Seq((2L, ts(30), 1L)))
    assert(m(1L) == 200L) // k=2 matches its own t=15, not k=1's t=20
  }

  test("left row count is preserved exactly") {
    val left = (1 to 100).map(i => (1L + i % 3, ts(i), i.toLong))
    val out = AsofJoin.asofLast(left.toDF("k", "t", "lid"), right, "k", "t")
    assert(out.count() == 100)
    assert(out.select(countDistinct(col("lid"))).head.getLong(0) == 100)
  }
}
