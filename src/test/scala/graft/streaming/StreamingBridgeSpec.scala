package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftstream.StreamingBridge.{checkpointFresh, unpersistCheckpoint}

import graft.SparkSuite

/** Lifecycle of the iteration checkpoint (ADVICE r14 #1):
  * [[org.apache.spark.sql.graftstream.StreamingBridge.checkpointFresh]]
  * rebinds the localCheckpoint under a DERIVED leaf RDD, so a naive
  * `leaf.unpersist()` released nothing — the persisted ancestor sits
  * below a projection/metrics map. `unpersistCheckpoint` must walk the
  * dependency chain and free the actual blocks, or every round of an
  * iterative algorithm (BPE training, pointer-jumping CC) pins another
  * round's storage for the session's lifetime. */
class StreamingBridgeSpec extends SparkSuite {

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("unpersistCheckpoint releases the checkpoint's storage blocks " +
      "(the leaf RDD is derived — the walk must reach the ancestor)") {
    val before = persistedIds
    val df = checkpointFresh(
      spark.range(0, 1000).toDF("id").withColumn("v", col("id") * 2))
    assert(df.count() == 1000)
    val added = persistedIds -- before
    assert(added.nonEmpty,
      "staging bug: localCheckpoint registered no persisted RDD")
    unpersistCheckpoint(df)
    val after = persistedIds
    assert(added.forall(!after.contains(_)),
      s"checkpoint blocks ${added.intersect(after)} survived " +
        "unpersistCheckpoint — the r14 no-op regressed")
  }

  test("iterative checkpoint cadence: round k-1's blocks die with " +
      "round k — persisted-RDD count stays flat across rounds") {
    val base = persistedIds
    var stream = checkpointFresh(spark.range(0, 500).toDF("id"))
    stream.count()
    (1 to 6).foreach { _ =>
      val prev = stream
      stream = checkpointFresh(stream.withColumn("id", col("id") + 1))
      stream.count()
      unpersistCheckpoint(prev)
      val live = (persistedIds -- base).size
      assert(live <= 1,
        s"$live checkpoints pinned at once — eager release regressed")
    }
    unpersistCheckpoint(stream)
    assert((persistedIds -- base).isEmpty)
  }
}
